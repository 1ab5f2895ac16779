"""Multi-snapshot crawl derivation of the pages corpus.

Real web pipelines see the same URL many times (recrawls across WARC
snapshots); the deduplication / recency / per-domain operators in
``stages/crawl.py`` need that shape.  This source derives it
deterministically from ``documents.parquet`` (the same sanctioned
pattern as ``synth.read_pages``): every generated value is closed-form
in ``doc_id`` so a DuckDB oracle can rebuild the exact table from the
``documents`` view (``sources/oracle_crawl.py``).

Per document ``d`` with source ``s``:

* ``n_snaps(d) = 1 + d % 3`` snapshot rows (revisions ``r``)
* ``url      = https://{s}.example.org/p/{d:08d}`` — one HOST per
  documents.source, so per-domain operators have real key skew to chew
* ``warc_ts  = 2020-01-01 + d minutes + r days`` (later rev = later ts)
* ``content_id = d*16 + (r if d % 5 == 0 else 0)`` — every 5th page
  changes content on each recrawl, the rest are byte-stable
* ``n_bytes  = n_chars + 7*r``

Columns: ``(url, warc_ts, content_id, n_bytes, lang)`` — the host is
NOT a column; operators must parse it from the url (that is the
operator under test).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

CRAWL_BASE_TS = np.datetime64("2020-01-01", "us")
CRAWL_HOST_SUFFIX = ".example.org"
SNAPSHOT_MOD = 3  # n_snaps(d) = 1 + d % SNAPSHOT_MOD
CONTENT_CHANGE_MOD = 5  # d % 5 == 0 -> content changes per revision

CRAWL_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("content_id", pa.int64()),
        ("n_bytes", pa.int64()),
        ("lang", pa.string()),
    ]
)


def documents_to_crawl(batch: pa.Table) -> pa.Table:
    """Vectorized explosion: one row per (document, revision)."""
    d = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), np.int64)
    src = pd.Series(batch["source"].to_pandas(), dtype=str)
    lang = pd.Series(batch["lang"].to_pandas(), dtype=str)
    n_chars = np.asarray(
        batch["n_chars"].to_numpy(zero_copy_only=False), np.int64
    )

    reps = 1 + (d % SNAPSHOT_MOD)
    idx = np.repeat(np.arange(len(d)), reps)
    # revision index within each document: 0..reps-1
    ends = np.cumsum(reps)
    rev = np.arange(ends[-1]) - np.repeat(ends - reps, reps)

    dd = d[idx]
    urls = (
        "https://"
        + src.iloc[idx].reset_index(drop=True)
        + CRAWL_HOST_SUFFIX
        + "/p/"
        + pd.Series(dd).astype(str).str.zfill(8)
    )
    ts = (
        CRAWL_BASE_TS
        + (dd * 60).astype("timedelta64[s]")
        + (rev * 86_400).astype("timedelta64[s]")
    )
    content = dd * 16 + np.where(dd % CONTENT_CHANGE_MOD == 0, rev, 0)
    return pa.table(
        {
            "url": pa.array(urls.tolist(), pa.string()),
            "warc_ts": pa.array(ts),
            "content_id": pa.array(content, pa.int64()),
            "n_bytes": pa.array(n_chars[idx] + 7 * rev, pa.int64()),
            "lang": pa.array(lang.iloc[idx].tolist(), pa.string()),
        },
        schema=CRAWL_SCHEMA,
    )


def read_crawl(sf_dir: str, repeat: int = 1):
    """Ray Dataset of crawl snapshot rows derived from documents.parquet
    (column-pruned read; explosion happens inside the read tasks).

    ``repeat > 1`` replicates every document with doc_ids shifted by
    ``r * REPEAT_STRIDE`` (the read_pages convention): distinct urls,
    identical snapshot/change profile — a deterministic work multiplier
    for stress/scaling runs only."""
    from ..stages.common import read_parquet_clean
    from .synth import replicate_doc_ids

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "lang", "n_chars"],
    )
    # same load-bearing widen as read_pages: a 1-file read is a single
    # block; repartition so the explosion + downstream stages fan out
    ds = ds.repartition(16)
    ds = replicate_doc_ids(ds, repeat)
    return ds.map_batches(documents_to_crawl, batch_format="pyarrow")


def messy_urls(batch: pa.Table) -> pa.Table:
    """Deterministic 'dirty surface form' decoration of the crawl urls
    — the fixture side of URL canonicalization (real crawls see the
    same page under tracking params, fragments, mixed-case hosts and
    dangling separators).  Closed-form per row so the DuckDB oracle
    rebuilds it exactly: with ``d = content_id // 16`` and
    ``r = (seconds(warc_ts) - d*60) // 86400`` (the generator's
    revision index), variant ``m = (d + r) % 4``::

        m == 0 -> url + '?utm_source=feed&utm_campaign=c{d%7}'
        m == 1 -> url + '#sec{d%5}'
        m == 2 -> scheme+host UPPERCASED
        m == 3 -> url + '?'

    Only the url column changes; canonicalization must merge all
    variants of a page back onto one key."""
    url = pd.Series(batch["url"].to_pandas(), dtype=str)
    d = np.asarray(batch["content_id"].to_numpy(zero_copy_only=False),
                   np.int64) // 16
    secs = batch["warc_ts"].cast(pa.int64()).to_numpy() // 1_000_000
    base = (CRAWL_BASE_TS - np.datetime64(0, "us")).astype(
        "timedelta64[us]"
    ).astype(np.int64) // 1_000_000
    r = (secs - base - d * 60) // 86_400
    m = (d + r) % 4
    utm = "?utm_source=feed&utm_campaign=c" + pd.Series(d % 7).astype(str)
    frag = "#sec" + pd.Series(d % 5).astype(str)
    upper = url.str.replace(
        r"^([A-Za-z]+://[^/]*)", lambda mt: mt.group(1).upper(), regex=True
    )
    out = url.copy()
    out[m == 0] = (url + utm)[m == 0]
    out[m == 1] = (url + frag)[m == 1]
    out[m == 2] = upper[m == 2]
    out[m == 3] = (url + "?")[m == 3]
    cols = {c: batch[c] for c in batch.column_names}
    cols["url"] = pa.array(out.tolist(), pa.string())
    return pa.table(cols)
