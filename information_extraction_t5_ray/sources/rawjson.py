"""Raw-JSON document source (reference R1,
``data/file_handling.py:8-51`` + README.md:190-192 contract: one JSON
object mapping doc_id -> fields, key ``"text"`` mandatory, other keys
are field values; one-level nested dicts are compound fields).

``read_raw_json`` yields a Ray Dataset with the document text plus the
annotation fields flattened to dotted-leaf keys and carried as ONE JSON
string column (``fields_json``) — annotations ride with the row, so
the E1 qa-generation stage needs no side lookup at any scale.
"""

from __future__ import annotations

import json
import tarfile
import tempfile
from pathlib import Path
from typing import Dict, List, Optional, Tuple


def maybe_decompress(path: str) -> str:
    """``.tar``/``.tar.gz`` -> newest ``*json`` member, extracted to a
    temp dir (reference decompress, file_handling.py:8-28); plain paths
    pass through."""
    if not (path.endswith(".tar") or path.endswith(".tar.gz")):
        return path
    out = tempfile.mkdtemp(prefix="rawjson_")
    with tarfile.open(path) as tf:
        tf.extractall(out, filter="data")
    candidates = sorted(
        Path(out).rglob("*json"), key=lambda p: p.stat().st_mtime
    )
    if not candidates:
        raise FileNotFoundError(f"no *json member inside {path}")
    return str(candidates[-1])


def flatten_fields(doc: Dict) -> Dict[str, str]:
    """Field values at dotted-leaf keys; ``text`` excluded."""
    flat: Dict[str, str] = {}
    for key, value in doc.items():
        if key in ("text", "texto", "uuid"):
            continue
        if isinstance(value, dict):
            for sub, v in value.items():
                if isinstance(v, str):
                    flat[f"{key}.{sub}"] = v
        elif isinstance(value, str):
            flat[key] = value
    return flat


def load_raw_data(path: str) -> List[Tuple[str, Dict]]:
    """Driver-side loader: ``[(doc_id, document), ...]`` in file order
    (reference load_raw_data, file_handling.py:31-51)."""
    with open(maybe_decompress(path)) as f:
        data = json.load(f)
    return list(data.items())


def read_raw_json(path: str, override_num_blocks: Optional[int] = None):
    """Raw JSON dataset -> Ray Dataset (url, text, fields_json).

    The corpus file itself is read once on the driver (it is a single
    JSON object — not splittable); rows then scatter across blocks for
    the heavy downstream work, mirroring how a sharded JSONL corpus
    would arrive at scale."""
    import ray.data as rd

    items = load_raw_data(path)
    rows = {
        "url": [doc_id for doc_id, _ in items],
        "text": [
            (doc.get("text") if "text" in doc else doc.get("texto")) or ""
            for _, doc in items
        ],
        "fields_json": [
            json.dumps(flatten_fields(doc), ensure_ascii=False, sort_keys=True)
            for _, doc in items
        ],
    }
    ds = rd.from_items(
        [dict(zip(rows, vals)) for vals in zip(*rows.values())]
    )
    if override_num_blocks:
        ds = ds.repartition(override_num_blocks)
    return ds
