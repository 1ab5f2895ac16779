"""Stage-boundary checkpointing with per-partition lineage manifests.

Re-expresses the reference's coarse file caches (converted-dataset
cache ``data/qa_data.py:24-42``, prediction cache + the
``use_cached_predictions`` flag ``models/qa_model.py:79-85,204-211``)
as the scale-correct version: every stage boundary materializes to
partitioned Parquet next to a ``_MANIFEST.json`` that records

* the stage's input fingerprint (config + upstream fingerprint chain),
* per-file row counts and byte sizes (partition-granular lineage),
* the output schema.

Resume = fingerprint match -> the stage is SKIPPED and its Parquet is
read back; any upstream change flows through the fingerprint chain and
invalidates exactly the stages after it.  Manifest writes are atomic
(tmp + rename) so a crash mid-write never yields a valid-looking but
incomplete checkpoint.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from pathlib import Path
from typing import Callable, Optional

MANIFEST_NAME = "_MANIFEST.json"
FORMAT_VERSION = 1


def fingerprint(*parts: str) -> str:
    """Stable fingerprint of a stage: hash of config/id strings plus the
    upstream fingerprint(s)."""
    h = hashlib.sha256()
    for p in parts:
        h.update(p.encode("utf-8"))
        h.update(b"\x00")
    return h.hexdigest()[:32]


def _scan_partitions(out_dir: Path) -> list:
    """Per-file lineage rows (metadata-only reads)."""
    import pyarrow.parquet as pq

    entries = []
    for f in sorted(out_dir.rglob("*.parquet")):
        md = pq.read_metadata(f)
        entries.append(
            {
                "file": str(f.relative_to(out_dir)),
                "rows": md.num_rows,
                "bytes": f.stat().st_size,
                "row_groups": md.num_row_groups,
            }
        )
    return entries


def load_manifest(out_dir: str) -> Optional[dict]:
    p = Path(out_dir) / MANIFEST_NAME
    if not p.exists():
        return None
    try:
        m = json.loads(p.read_text())
    except (json.JSONDecodeError, OSError):
        return None
    if m.get("format_version") != FORMAT_VERSION:
        return None
    return m


def write_manifest(
    out_dir: str,
    stage: str,
    fp: str,
    schema_str: str,
    wall_sec: Optional[float] = None,
) -> dict:
    import time

    out = Path(out_dir)
    files = _scan_partitions(out)
    n_rows = sum(e["rows"] for e in files)
    manifest = {
        "format_version": FORMAT_VERSION,
        "stage": stage,
        "fingerprint": fp,
        "schema": schema_str,
        "num_files": len(files),
        "num_rows": n_rows,
        "files": files,
        # runtime metrics: what the partition cost to produce, so a
        # resume report can show where a failed run spent its time
        "metrics": {
            "wall_sec": round(wall_sec, 3) if wall_sec is not None else None,
            "rows_per_sec": (
                round(n_rows / wall_sec, 1) if wall_sec else None
            ),
            "bytes": sum(e["bytes"] for e in files),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        },
    }
    fd, tmp = tempfile.mkstemp(dir=str(out), suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, out / MANIFEST_NAME)
    return manifest


def is_complete(out_dir: str, fp: str) -> bool:
    m = load_manifest(out_dir)
    return bool(m and m["fingerprint"] == fp)


def checkpointed(
    ds_factory: Callable[[], "object"],
    out_dir: str,
    stage: str,
    fp: str,
    partition_col: Optional[str] = None,
):
    """Run ``ds_factory()`` and materialize to ``out_dir`` — unless a
    valid manifest with the same fingerprint already exists, in which
    case the stage is skipped entirely and its Parquet is read back.

    Returns (dataset, skipped: bool)."""
    from ..stages.common import read_parquet_clean

    out = Path(out_dir)
    if is_complete(out_dir, fp):
        return read_parquet_clean(str(out)), True

    # stale/partial output from a previous failed attempt: clear it so
    # the rewrite is clean (write_parquet appends new files otherwise)
    if out.exists():
        import shutil

        shutil.rmtree(out)
    out.mkdir(parents=True, exist_ok=True)

    import time

    t0 = time.perf_counter()
    ds = ds_factory()
    # per-file row floor: without it every block x partition-value pair
    # becomes its own file — small-file explosion at checkpoint scale
    if partition_col is not None:
        ds.write_parquet(
            str(out), partition_cols=[partition_col], min_rows_per_file=100_000
        )
    else:
        ds.write_parquet(str(out), min_rows_per_file=100_000)
    wall = time.perf_counter() - t0
    schema_str = ""
    try:
        schema_str = str(read_parquet_clean(str(out)).schema())
    except Exception:
        pass
    write_manifest(out_dir, stage, fp, schema_str, wall_sec=wall)
    return read_parquet_clean(str(out)), False
