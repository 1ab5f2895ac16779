"""Fuzzy matching + deterministic embeddings for entity linking.

Replicates the reference's alias machinery without fuzzywuzzy /
fuzzysearch (not installed): the alias dictionaries and the
length-bucketed Levenshtein budget follow
``features/highlights.py:13-47`` and ``:96-106``; matching is a banded
Levenshtein distance; the bi-encoder rerank of the north star is stood
in for by a deterministic char-trigram hashing embedder (same contract:
vectors + cosine; swap for a real encoder in production).
"""

from __future__ import annotations

import zlib
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import numpy as np

# features/highlights.py:13-41
ESTADOS: Dict[str, str] = {
    "AC": "Acre", "AL": "Alagoas", "AP": "Amapá", "AM": "Amazonas",
    "BA": "Bahia", "CE": "Ceará", "DF": "Distrito Federal",
    "ES": "Espírito Santo", "GO": "Goiás", "MA": "Maranhão",
    "MT": "Mato Grosso", "MS": "Mato Grosso do Sul", "MG": "Minas Gerais",
    "PA": "Pará", "PB": "Paraíba", "PR": "Paraná", "PE": "Pernambuco",
    "PI": "Piauí", "RJ": "Rio de Janeiro", "RN": "Rio Grande do Norte",
    "RS": "Rio Grande do Sul", "RO": "Rondônia", "RR": "Roraima",
    "SC": "Santa Catarina", "SP": "São Paulo", "SE": "Sergipe",
    "TO": "Tocantins",
}

# features/highlights.py:43-47
AREA: Dict[str, List[str]] = {
    "metro_quadrado": ["m²", "m2", "metros quadrados"],
    "hectare": ["has", "hectares"],
    "alq_paulista": ["alqueires paulistas", "alqueires"],
}


def include_variations(query: str) -> List[str]:
    """highlights.py:50-58 — canonical form -> surface variants."""
    if query in ESTADOS:
        return [ESTADOS[query]]
    if query in AREA:
        return AREA[query]
    return []


def get_levenshtein_dist(
    query: str, dist_dict: Optional[Dict[int, int]] = None
) -> int:
    """highlights.py:96-106 — max edit distance by query length."""
    if dist_dict is None:
        dist_dict = OrderedDict({3: 0, 10: 1, 20: 3, 30: 5})
    for size, dist in dist_dict.items():
        if len(query) < size:
            return dist
    return list(dist_dict.values())[-1]


def levenshtein(a: str, b: str, max_dist: Optional[int] = None) -> int:
    """Banded edit distance; returns max_dist+1 when the band is exceeded."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if max_dist is not None and abs(la - lb) > max_dist:
        return max_dist + 1
    prev = np.arange(lb + 1)
    cur = np.empty(lb + 1, dtype=np.int64)
    for i, ca in enumerate(a, 1):
        cur[0] = i
        bchars = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
        cost = (bchars != ord(ca)).astype(np.int64)
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost[j - 1])
        prev, cur = cur, prev
        if max_dist is not None and prev.min() > max_dist:
            return max_dist + 1
    return int(prev[lb])


def char_ngram_embedding(text: str, dim: int = 64, n: int = 3) -> np.ndarray:
    """Deterministic hashing embedder (bi-encoder stand-in): l2-normalized
    bag of hashed char n-grams."""
    v = np.zeros(dim, dtype=np.float32)
    t = f"^{text.lower()}$"
    for i in range(max(1, len(t) - n + 1)):
        g = t[i : i + n]
        h = zlib.crc32(g.encode())
        v[h % dim] += 1.0 if (h >> 16) % 2 else -1.0
    norm = np.linalg.norm(v)
    return v / norm if norm > 0 else v


def cosine_top1(
    query_vec: np.ndarray, matrix: np.ndarray
) -> Tuple[int, float]:
    sims = matrix @ query_vec
    idx = int(np.argmax(sims))
    return idx, float(sims[idx])
