"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or anywhere in the library.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def entry() -> Any:
    """Flagship KG pipeline on /root/testdata/sf0.001 (pages derived from
    documents.parquet -> canonical (subj, pred, obj) triples)."""
    from information_extraction_t5_ray.pipelines.kg import run_kg

    return run_kg("/root/testdata/sf0.001")


def _q_kg_triples(sf_dir: str):
    from information_extraction_t5_ray.pipelines.kg import run_kg

    return run_kg(sf_dir).select_columns(["subj", "pred", "obj"])


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "kg_triples": _q_kg_triples,
    }


def oracle_sql() -> dict[str, str]:
    from information_extraction_t5_ray.sources.oracle import oracle_triples_sql

    return {
        "kg_triples": oracle_triples_sql(),
    }
