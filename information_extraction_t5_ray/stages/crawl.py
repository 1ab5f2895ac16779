"""Crawl-recency / per-domain operators over multi-snapshot page sets.

The web-scale pipeline sees each URL many times (recrawls); these are
the standard curation steps between "raw WARC listing" and "corpus the
extractor reads": keep the newest snapshot per URL, per-domain
inventory stats, broadcast blocklist gating, recrawl change detection,
and per-host crawl-budget quotas.

All stages follow the repo's two-phase pattern: vectorized per-batch
partials (one row per (batch, key) on the wire), then a bucketed merge
whose width follows ``resolve_parallelism``.  Group-wise steps bucket
by key hash and run ONE pandas groupby per bucket (C-speed) — never a
Python call per key.  The host parse is Arrow ``split_pattern`` on the
zero-copy url column.

Reference analog: none (the reference starts from a ready corpus);
the operators implement the north rule's "Common-Crawl-style web
pages" intake stage.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .common import arrowed, bucket_of, resolve_parallelism


def _host_array(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized host extraction: 'https://HOST/path' -> HOST."""
    parts = pc.split_pattern(urls, pattern="/")
    return pc.list_element(parts, 2)


def latest_snapshot(crawl_ds, num_buckets: Optional[int] = None):
    """Newest snapshot per url: (url, warc_ts, content_id, n_bytes).

    Two-phase argmax: per-batch pandas groupby tail(1) on
    (url, warc_ts, content_id, n_bytes)-sorted rows — the trailing
    columns are a DETERMINISTIC tiebreak for equal-timestamp snapshots
    (otherwise the winner would follow partition arrival order) — then
    the same merge per url bucket; one candidate row per (batch, url)
    crosses the wire, never the full snapshot stream.
    """
    num_buckets = resolve_parallelism(num_buckets)
    cols = ["url", "warc_ts", "content_id", "n_bytes"]

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(cols).to_pandas()
        df = df.sort_values(cols, kind="stable")
        top = df.groupby("url", sort=False).tail(1).copy()
        top["_bucket"] = bucket_of(top["url"], num_buckets)
        return top

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(cols, kind="stable")
        return df.groupby("url", sort=False).tail(1)[cols]

    return (
        crawl_ds.map_batches(arrowed(partial), batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(arrowed(merge), batch_format="pandas")
    )


def domain_stats(crawl_ds, num_buckets: Optional[int] = None):
    """Per-domain inventory: (host, n_urls, n_pages, last_crawl).

    ``n_urls`` is an EXACT distinct count, so the reduction runs in two
    exchanges: (1) distinct (host, url) with additive page counts,
    bucketed BY URL (the unbounded key — hosts are skewed, urls are
    not); (2) a per-host rollup whose partial rows are one per
    (batch, host): the host vocabulary is web-domain-sized, far
    smaller than the url space, so the final merge is tiny.
    """
    num_buckets = resolve_parallelism(num_buckets)

    def url_partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "host": _host_array(batch["url"]).to_pandas().astype(str),
                "url": batch["url"].to_pandas().astype(str),
                "warc_ts": batch["warc_ts"].to_pandas(),
            }
        )
        g = df.groupby(["host", "url"], sort=False).agg(
            n_pages=("url", "size"), last_crawl=("warc_ts", "max")
        ).reset_index()
        g["n_pages"] = g["n_pages"].astype(np.int64)
        g["_bucket"] = bucket_of(g["url"], num_buckets)
        return g

    def url_merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["host", "url"], sort=False).agg(
            n_pages=("n_pages", "sum"), last_crawl=("last_crawl", "max")
        ).reset_index()
        # per-bucket host partial: one row per host per bucket
        h = g.groupby("host", sort=False).agg(
            n_urls=("url", "size"),
            n_pages=("n_pages", "sum"),
            last_crawl=("last_crawl", "max"),
        ).reset_index()
        h["n_urls"] = h["n_urls"].astype(np.int64)
        h["n_pages"] = h["n_pages"].astype(np.int64)
        h["_bucket2"] = bucket_of(h["host"], 16)
        return h

    def host_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("host", sort=False).agg(
            n_urls=("n_urls", "sum"),
            n_pages=("n_pages", "sum"),
            last_crawl=("last_crawl", "max"),
        ).reset_index()
        g["n_urls"] = g["n_urls"].astype(np.int64)
        g["n_pages"] = g["n_pages"].astype(np.int64)
        return g[["host", "n_urls", "n_pages", "last_crawl"]]

    return (
        crawl_ds.map_batches(arrowed(url_partial), batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(arrowed(url_merge), batch_format="pandas")
        .groupby("_bucket2")
        .map_groups(arrowed(host_final), batch_format="pandas")
    )


def blocklist_filter(crawl_ds, blocked_hosts: Iterable[str]):
    """Drop snapshots whose url host is on the (broadcast) blocklist.

    The blocklist is a closure constant — shipped once per task via the
    plan, never re-read per batch; the filter itself is a zero-copy
    Arrow mask (shuffle-free, embarrassingly parallel).
    Output: (url, warc_ts, content_id, lang) survivors.
    """
    blocked = pa.array(sorted(set(blocked_hosts)), pa.string())

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(_host_array(batch["url"]), value_set=blocked))
        return batch.filter(mask).select(
            ["url", "warc_ts", "content_id", "lang"]
        )

    return crawl_ds.map_batches(keep, batch_format="pyarrow")


def recrawl_changes(crawl_ds, num_buckets: Optional[int] = None):
    """Per-url recrawl diffing: (url, n_snapshots, n_changes) where a
    change is a content_id differing from the PREVIOUS snapshot in
    warc_ts order.

    Needs each url's snapshots co-located + ordered, so: ONE bucketed
    exchange on url hash, then a single vectorized pandas pass per
    bucket (sort by (url, warc_ts); a change is a row whose url equals
    the previous row's AND content differs — no Python per-url loop).
    """
    num_buckets = resolve_parallelism(num_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch["url"].to_pandas().astype(str), num_buckets)
        return batch.select(["url", "warc_ts", "content_id"]).append_column(
            "_bucket", pa.array(b, pa.int32())
        )

    def diff(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "warc_ts"], kind="stable")
        url = df["url"].to_numpy(dtype=object)
        content = df["content_id"].to_numpy(np.int64)
        same_url = np.empty(len(df), dtype=bool)
        same_url[0] = False
        same_url[1:] = url[1:] == url[:-1]
        changed = np.empty(len(df), dtype=bool)
        changed[0] = False
        changed[1:] = content[1:] != content[:-1]
        g = pd.DataFrame(
            {"url": url, "chg": (same_url & changed).astype(np.int64)}
        ).groupby("url", sort=False)
        out = g.agg(n_snapshots=("chg", "size"), n_changes=("chg", "sum"))
        out = out.reset_index()
        out["n_snapshots"] = out["n_snapshots"].astype(np.int64)
        out["n_changes"] = out["n_changes"].astype(np.int64)
        return out

    return (
        crawl_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(arrowed(diff), batch_format="pandas")
    )


def snapshot_intervals(crawl_ds, num_buckets: Optional[int] = None):
    """Temporal compaction (SCD-2 style): collapse each url's
    consecutive equal-content snapshots into validity intervals
    ``(url, content_id, valid_from, valid_to, n_snaps)`` — the
    KG-temporal primitive ("this page version was observed over
    [valid_from, valid_to]").

    A gaps-and-islands windowed aggregate: one bucketed exchange on
    url hash co-locates + orders each url's snapshots, then a single
    vectorized pass per bucket detects run boundaries (first row of a
    url OR content differing from the previous row) and reduces each
    run with one pandas groupby — no Python per-url loop.
    """
    num_buckets = resolve_parallelism(num_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch["url"].to_pandas().astype(str), num_buckets)
        return batch.select(["url", "warc_ts", "content_id"]).append_column(
            "_bucket", pa.array(b, pa.int32())
        )

    def compact(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "warc_ts"], kind="stable")
        url = df["url"].to_numpy(dtype=object)
        content = df["content_id"].to_numpy(np.int64)
        new_run = np.ones(len(df), dtype=bool)
        new_run[1:] = (url[1:] != url[:-1]) | (content[1:] != content[:-1])
        run_id = np.cumsum(new_run)
        g = pd.DataFrame(
            {
                "url": url,
                "content_id": content,
                "warc_ts": df["warc_ts"].to_numpy(),
                "_run": run_id,
            }
        ).groupby("_run", sort=False)
        out = g.agg(
            url=("url", "first"),
            content_id=("content_id", "first"),
            valid_from=("warc_ts", "min"),
            valid_to=("warc_ts", "max"),
            n_snaps=("warc_ts", "size"),
        ).reset_index(drop=True)
        out["n_snaps"] = out["n_snaps"].astype(np.int64)
        return out[["url", "content_id", "valid_from", "valid_to", "n_snaps"]]

    return (
        crawl_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(arrowed(compact), batch_format="pandas")
    )


def latest_intervals(crawl_ds, num_buckets: Optional[int] = None):
    """Per-url LATEST content-validity interval
    ``(url, valid_from, valid_to)`` — :func:`snapshot_intervals`'s
    gaps-and-islands compaction FUSED with the tail-1 argmax on
    ``valid_to`` in the same bucket pass: the interval exchange already
    co-locates each url's snapshots, so selecting the newest run there
    costs nothing extra, where composing the two stages would pay a
    second all-to-all over the interval stream.  (Temporal-KG
    provenance input, pipelines/kg.kg_temporal_join.)
    """
    num_buckets = resolve_parallelism(num_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch["url"].to_pandas().astype(str), num_buckets)
        return batch.select(["url", "warc_ts", "content_id"]).append_column(
            "_bucket", pa.array(b, pa.int32())
        )

    def compact_latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "warc_ts"], kind="stable")
        url = df["url"].to_numpy(dtype=object)
        content = df["content_id"].to_numpy(np.int64)
        new_run = np.ones(len(df), dtype=bool)
        new_run[1:] = (url[1:] != url[:-1]) | (content[1:] != content[:-1])
        run_id = np.cumsum(new_run)
        g = pd.DataFrame(
            {
                "url": url,
                "warc_ts": df["warc_ts"].to_numpy(),
                "_run": run_id,
            }
        ).groupby("_run", sort=False)
        iv = g.agg(
            url=("url", "first"),
            valid_from=("warc_ts", "min"),
            valid_to=("warc_ts", "max"),
        ).reset_index(drop=True)
        # rows are url-major and time-ordered, so each url's LAST run
        # is its latest interval
        return iv.groupby("url", sort=False).tail(1)[
            ["url", "valid_from", "valid_to"]
        ]

    return (
        crawl_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(arrowed(compact_latest), batch_format="pandas")
    )


def url_frontier(
    crawl_ds,
    k: int = 10,
    num_buckets: Optional[int] = None,
):
    """Recrawl-frontier scheduling: rank each host's urls by observed
    change rate (descending) then staleness (oldest ``last_crawl``
    first) and keep the top ``k`` per host — the crawl-budget
    allocation step that decides what to fetch next.
    Output: ``(host, url, n_changes, last_crawl)``.

    Two exchanges, both bounded: (1) per-url change/recency rollup
    bucketed on url hash (same vectorized diff pass as
    ``recrawl_changes``); (2) per-host top-k where each bucket's
    partial already holds ≤ k rows per (bucket, host), so the merge
    re-ranks only candidates.
    """
    num_buckets = resolve_parallelism(num_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch["url"].to_pandas().astype(str), num_buckets)
        return batch.select(["url", "warc_ts", "content_id"]).append_column(
            "_bucket", pa.array(b, pa.int32())
        )

    def url_rollup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["url", "warc_ts"], kind="stable")
        url = df["url"].to_numpy(dtype=object)
        content = df["content_id"].to_numpy(np.int64)
        same_url = np.empty(len(df), dtype=bool)
        same_url[0] = False
        same_url[1:] = url[1:] == url[:-1]
        changed = np.empty(len(df), dtype=bool)
        changed[0] = False
        changed[1:] = content[1:] != content[:-1]
        g = pd.DataFrame(
            {
                "url": url,
                "chg": (same_url & changed).astype(np.int64),
                "warc_ts": df["warc_ts"].to_numpy(),
            }
        ).groupby("url", sort=False)
        out = g.agg(
            n_changes=("chg", "sum"), last_crawl=("warc_ts", "max")
        ).reset_index()
        out["n_changes"] = out["n_changes"].astype(np.int64)
        out["host"] = (
            out["url"].str.split("/", n=3).str[2].astype(str)
        )
        # per-bucket per-host head-k partial: each url appears in
        # exactly one url bucket, so this keeps every global candidate
        out = out.sort_values(
            ["host", "n_changes", "last_crawl", "url"],
            ascending=[True, False, True, True],
            kind="stable",
        )
        top = out.groupby("host", sort=False).head(k).copy()
        top["_bucket2"] = bucket_of(top["host"], 16)
        return top[["host", "url", "n_changes", "last_crawl", "_bucket2"]]

    def host_merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["host", "n_changes", "last_crawl", "url"],
            ascending=[True, False, True, True],
            kind="stable",
        )
        return df.groupby("host", sort=False).head(k)[
            ["host", "url", "n_changes", "last_crawl"]
        ]

    return (
        crawl_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(arrowed(url_rollup), batch_format="pandas")
        .groupby("_bucket2")
        .map_groups(arrowed(host_merge), batch_format="pandas")
    )


def host_quota(
    latest_ds,
    k: int = 10,
    num_buckets: Optional[int] = None,
):
    """Per-host crawl-budget cap (politeness quota): over the LATEST
    snapshot set, keep each host's first ``k`` urls by (warc_ts, url).
    Output: (host, url, warc_ts).

    Grouped head-k is reduction-friendly: each batch's per-host top-k
    is a superset of its contribution to the global top-k, so the
    partial keeps ≤ k rows per (batch, host) and the bucketed merge
    re-ranks only candidates.
    """
    num_buckets = resolve_parallelism(num_buckets)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "host": _host_array(batch["url"]).to_pandas().astype(str),
                "url": batch["url"].to_pandas().astype(str),
                "warc_ts": batch["warc_ts"].to_pandas(),
            }
        )
        df = df.sort_values(["host", "warc_ts", "url"], kind="stable")
        top = df.groupby("host", sort=False).head(k).copy()
        top["_bucket"] = bucket_of(top["host"], num_buckets)
        return top

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["host", "warc_ts", "url"], kind="stable")
        return df.groupby("host", sort=False).head(k)[
            ["host", "url", "warc_ts"]
        ]

    return (
        latest_ds.map_batches(arrowed(partial), batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(arrowed(merge), batch_format="pandas")
    )


def run_crawl_checkpointed(sf_dir: str, ckpt_dir: str, quota_k: int = 10):
    """Checkpointed crawl-intake funnel: raw snapshots -> latest
    snapshot per url -> per-host quota, each boundary materialized to
    ``{ckpt_dir}/{stage}/`` with a lineage manifest (fingerprint chain
    over inputs + parameters).  A rerun with the same inputs SKIPS
    completed stages; a killed run resumes from the last complete
    boundary — the intake analog of ``pipelines.kg.run_kg_checkpointed``
    and ``pipelines.corpus.run_curate_checkpointed``.

    Returns ``(quota_ds, {stage: skipped})``.
    """
    from ..sources.crawl import (
        CONTENT_CHANGE_MOD,
        SNAPSHOT_MOD,
        read_crawl,
    )
    from ..state import manifest as mf

    # the latest boundary's lineage covers the snapshot-derivation
    # constants (they change the content); the quota boundary chains on
    # it plus its own k
    fp_latest = mf.fingerprint(
        "crawl-latest", sf_dir, str(SNAPSHOT_MOD), str(CONTENT_CHANGE_MOD)
    )
    fp_quota = mf.fingerprint("crawl-quota", fp_latest, str(quota_k))
    skipped = {}
    latest, skipped["latest"] = mf.checkpointed(
        lambda: latest_snapshot(read_crawl(sf_dir)),
        f"{ckpt_dir}/latest",
        "latest",
        fp_latest,
    )
    quota, skipped["quota"] = mf.checkpointed(
        lambda: host_quota(latest, k=quota_k),
        f"{ckpt_dir}/quota",
        "quota",
        fp_quota,
    )
    return quota, skipped


# URL canonicalization chain — ORDER IS THE CONTRACT, and every pattern
# is RE2-compatible so the DuckDB oracle runs the same chain verbatim:
#   1. strip the fragment            (#.*$        -> '')
#   2. strip utm_* tracking params   ([?&]utm_[^&#]* -> '', global)
#   3. strip dangling separators     ([?&]+$      -> '')
#   4. lowercase scheme + host       (prefix ^[A-Za-z]+://[^/]*)
CANON_FRAGMENT_RE = r"#.*$"
CANON_UTM_RE = r"[?&]utm_[^&#]*"
CANON_DANGLING_RE = r"[?&]+$"
CANON_PREFIX_RE = r"^[A-Za-z]+://[^/]*"


def canonicalize_url_series(url: pd.Series) -> pd.Series:
    """Vectorized canonical chain over a string Series (pandas .str
    ops are the Python mirror of the oracle's regexp_replace chain)."""
    u = url.str.replace(CANON_FRAGMENT_RE, "", regex=True)
    u = u.str.replace(CANON_UTM_RE, "", regex=True)
    u = u.str.replace(CANON_DANGLING_RE, "", regex=True)
    return u.str.replace(
        CANON_PREFIX_RE, lambda m: m.group(0).lower(), regex=True
    )


def canonical_latest(crawl_ds, num_buckets: Optional[int] = None):
    """Newest snapshot per CANONICAL url over dirty surface forms:
    ``(canon_url, url, warc_ts, content_id)`` — url dedup under
    tracking params / fragments / host case / dangling separators,
    the intake step ahead of latest_snapshot when the frontier feeds
    raw WARC listings.

    Same two-phase argmax as :func:`latest_snapshot`, keyed on the
    canonical form computed map-side (no extra exchange: canonical-
    ization rides the partial pass); the surviving row carries the
    winning DIRTY url for provenance."""
    num_buckets = resolve_parallelism(num_buckets)
    cols = ["canon_url", "warc_ts", "content_id", "n_bytes", "url"]

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(
            ["url", "warc_ts", "content_id", "n_bytes"]
        ).to_pandas()
        df["canon_url"] = canonicalize_url_series(df["url"].astype(str))
        df = df.sort_values(cols, kind="stable")
        top = df.groupby("canon_url", sort=False).tail(1).copy()
        top["_bucket"] = bucket_of(top["canon_url"], num_buckets)
        return top[cols + ["_bucket"]]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(cols, kind="stable")
        top = df.groupby("canon_url", sort=False).tail(1)
        return top[["canon_url", "url", "warc_ts", "content_id"]]

    return (
        crawl_ds.map_batches(arrowed(partial), batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(arrowed(merge), batch_format="pandas")
    )
