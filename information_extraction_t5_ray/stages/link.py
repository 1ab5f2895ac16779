"""Stage 5: mention detection + entity-link scoring (north-star stage 3).

Broadcast alias dictionary + deterministic embedding rerank, as an
actor-pool ``map_batches`` stage: the alias index (normalized surface
-> canonical id, plus the embedding matrix for rerank) is built ONCE
per actor in ``__init__`` from a ``ray.put`` handle or a plain dict —
the small side of a broadcast join, never a shuffle (SURVEY.md §2.4).

Reference analog: ``features/highlights.py`` (alias dicts + dynamic
Levenshtein budget + best-match-by-min-distance); extended per the
north star with a cosine rerank over candidate aliases when the fuzzy
budget admits more than one.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

from ..functions.fuzzy import (
    ESTADOS,
    char_ngram_embedding,
    get_levenshtein_dist,
    levenshtein,
)
from ..functions.textnorm import normalize_answer

# preds whose object is a federative-unit entity
UF_PRED_LEAVES = {"estado", "doc_id_uf"}


class EntityLinker:
    """obj surface form -> canonical entity id.

    For UF-domain predicates: exact normalized alias hit, else fuzzy
    candidates within the length-bucketed Levenshtein budget, reranked
    by embedding cosine; below-threshold stays as-is (surface form is
    its own entity).  Other predicates pass through unchanged.
    """

    def __init__(self, alias_dict: Optional[Dict[str, str]] = None, dim: int = 64):
        if alias_dict is None:
            alias_dict = dict(ESTADOS)
        # ray.put handle support (broadcast once, fetch per actor)
        try:
            import ray

            if isinstance(alias_dict, ray.ObjectRef):
                alias_dict = ray.get(alias_dict)
        except ImportError:  # pragma: no cover
            pass
        # normalized surface -> canonical code (both the code itself and
        # its long-name variations, highlights.py:50-58 reversed)
        self.surface_to_id: Dict[str, str] = {}
        surfaces: List[str] = []
        for code, name in alias_dict.items():
            for surface in (code, name):
                key = normalize_answer(surface)
                self.surface_to_id.setdefault(key, code)
                surfaces.append(key)
        self.surfaces = surfaces
        self.matrix = np.stack([char_ngram_embedding(s, dim) for s in surfaces])
        self.dim = dim

    def link_one(self, pred_leaf: str, value: str) -> str:
        if pred_leaf not in UF_PRED_LEAVES or not value:
            return value
        key = normalize_answer(value)
        hit = self.surface_to_id.get(key)
        if hit is not None:
            return hit
        # fuzzy candidates within the dynamic budget
        budget = get_levenshtein_dist(key)
        cands = [
            i
            for i, s in enumerate(self.surfaces)
            if levenshtein(key, s, budget) <= budget
        ]
        if not cands:
            return value
        if len(cands) == 1:
            return self.surface_to_id[self.surfaces[cands[0]]]
        # embedding rerank among admitted candidates
        qv = char_ngram_embedding(key, self.dim)
        sims = self.matrix[cands] @ qv
        return self.surface_to_id[self.surfaces[cands[int(np.argmax(sims))]]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = batch["pred"].to_pylist()
        objs = batch["obj_surface"].to_pylist()
        linked = [
            self.link_one(p.rsplit(".", 1)[-1], v) for p, v in zip(preds, objs)
        ]
        return batch.append_column("obj_linked", pa.array(linked, pa.string()))


def link_stage(
    triples_ds,
    alias_dict=None,
    concurrency=None,
    batch_size: int | None = None,
):
    kwargs = dict(batch_format="pyarrow")
    if batch_size:
        kwargs["batch_size"] = batch_size
    if concurrency is not None:
        return triples_ds.map_batches(
            EntityLinker,
            fn_constructor_kwargs={"alias_dict": alias_dict},
            concurrency=concurrency,
            **kwargs,
        )
    return triples_ds.map_batches(EntityLinker(alias_dict), **kwargs)
