"""Stage 1: HTML->text extraction + byte-identical cleaning.

Stateless ``map_batches`` over zero-copy Arrow (north-star stage 1).
Drops the heavy ``html``/``text`` columns immediately so only
``clean_text`` flows downstream (SURVEY.md §7.4 'wide rows').
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.textnorm import clean_chunked_array, html_to_text_array


def extract_and_clean(batch: pa.Table) -> pa.Table:
    """pages -> (url, lang, clean_text).

    ``clean_text`` is computed from ``html`` when present (falling back
    to the ``text`` column), then normalized with the reference chain —
    per-row byte-identical to ``clean_text(text)`` by the invariant
    tested in tests/test_pipeline.py.
    """
    names = batch.schema.names
    if "html" in names:
        raw = html_to_text_array(batch["html"])
    else:
        raw = batch["text"]
    cleaned = clean_chunked_array(raw)
    cols = {"url": batch["url"], "clean_text": cleaned}
    for passthrough in ("lang", "fields_json"):
        if passthrough in names:
            cols[passthrough] = batch[passthrough]
    return pa.table(cols)


def clean_stage(ds, batch_size: int | None = None):
    """Attach the extract+clean stage to a pages Dataset.

    Default whole-block batches: an explicit batch_size is counted in
    the fused chain's INPUT rows by the bundler and coalesces upstream
    blocks, capping the parallelism of every fused downstream stage."""
    kw = {"batch_size": batch_size} if batch_size else {}
    return ds.map_batches(extract_and_clean, batch_format="pyarrow", **kw)
