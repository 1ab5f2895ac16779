"""Crawl-intake operators (stages/crawl.py): kernel edge cases.
End-to-end oracle parity runs in tests/test_oracle.py (crawl_latest /
domain_stats / blocklist_filter / recrawl_changes / host_quota)."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from information_extraction_t5_ray.sources import crawl as C
from information_extraction_t5_ray.stages import crawl as S


def _crawl_ds(rows, blocks=1):
    """rows: (url, ts_sec, content_id, n_bytes, lang); split into
    ``blocks`` single-batch datasets unioned so per-batch partials see
    DIFFERENT batches (the reduction-correctness edge)."""
    import ray.data as rd

    def tbl(chunk):
        return pa.table(
            {
                "url": pa.array([r[0] for r in chunk], pa.string()),
                "warc_ts": pa.array(
                    np.array([r[1] for r in chunk], "datetime64[s]").astype(
                        "datetime64[us]"
                    )
                ),
                "content_id": pa.array([r[2] for r in chunk], pa.int64()),
                "n_bytes": pa.array([r[3] for r in chunk], pa.int64()),
                "lang": pa.array([r[4] for r in chunk], pa.string()),
            }
        )

    per = max(1, len(rows) // blocks)
    chunks = [rows[i : i + per] for i in range(0, len(rows), per)]
    ds = rd.from_arrow(tbl(chunks[0]))
    for ch in chunks[1:]:
        ds = ds.union(rd.from_arrow(tbl(ch)))
    return ds


U1 = "https://a.example.org/p/1"
U2 = "https://b.example.org/p/2"


def test_documents_to_crawl_explosion_counts():
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 5], pa.int64()),
            "source": pa.array(["s"] * 5, pa.string()),
            "lang": pa.array(["pt"] * 5, pa.string()),
            "n_chars": pa.array([10] * 5, pa.int64()),
        }
    )
    out = C.documents_to_crawl(batch)
    # snapshots = 1 + d % 3 -> 1+2+3+1+3 = 10
    assert out.num_rows == 10
    df = out.to_pandas()
    # content changes per revision only for d % 5 == 0
    d0 = df[df["url"].str.endswith("00000000")]
    assert list(d0["content_id"]) == [0]  # one snapshot, rev 0
    d5 = df[df["url"].str.endswith("00000005")]
    assert list(d5["content_id"]) == [80, 81, 82]
    d2 = df[df["url"].str.endswith("00000002")]
    assert list(d2["content_id"]) == [32, 32, 32]  # stable content
    # later revision -> strictly later timestamp
    assert d5["warc_ts"].is_monotonic_increasing


def test_latest_snapshot_across_batches(ray_session):
    """The url's newest row lives in a DIFFERENT batch than its older
    rows — the per-batch partial must not discard the global winner."""
    rows = [
        (U1, 100, 1, 10, "pt"),
        (U2, 50, 7, 20, "pt"),
        (U1, 500, 2, 11, "pt"),  # newest for U1, second batch
        (U2, 40, 8, 21, "pt"),
    ]
    got = (
        S.latest_snapshot(_crawl_ds(rows, blocks=2))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(got["content_id"]) == [2, 7]
    assert got["warc_ts"].dt.second.tolist() == [20, 50]  # 500s, 50s


def test_blocklist_filter_parses_host(ray_session):
    rows = [(U1, 1, 1, 1, "pt"), (U2, 2, 2, 2, "en")]
    got = S.blocklist_filter(
        _crawl_ds(rows), ["a.example.org"]
    ).to_pandas()
    assert list(got["url"]) == [U2]
    assert list(got.columns) == ["url", "warc_ts", "content_id", "lang"]


def test_recrawl_changes_boundary_between_urls(ray_session):
    """Consecutive rows from DIFFERENT urls must not count as a change
    even when their content differs (the same_url mask edge)."""
    rows = [
        (U1, 10, 1, 0, "pt"),
        (U1, 20, 1, 0, "pt"),  # same content: no change
        (U1, 30, 9, 0, "pt"),  # changed
        (U2, 40, 777, 0, "pt"),  # different url, different content
    ]
    got = (
        S.recrawl_changes(_crawl_ds(rows))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(got["n_snapshots"]) == [3, 1]
    assert list(got["n_changes"]) == [1, 0]
    assert got["n_changes"].dtype == np.int64


def test_snapshot_intervals_runs_and_batch_split(ray_session):
    """Runs must survive the url's snapshots being split across batches
    (the bucketed exchange re-co-locates them), and a content value
    reappearing later must open a NEW interval, not extend the old."""
    rows = [
        (U1, 10, 1, 0, "pt"),
        (U1, 20, 1, 0, "pt"),  # same run as ts=10
        (U1, 30, 2, 0, "pt"),  # new run
        (U1, 40, 1, 0, "pt"),  # content 1 reappears -> THIRD run
        (U2, 50, 9, 0, "pt"),
    ]
    got = (
        S.snapshot_intervals(_crawl_ds(rows, blocks=3))
        .to_pandas()
        .sort_values(["url", "valid_from"])
        .reset_index(drop=True)
    )
    assert len(got) == 4
    u1 = got[got["url"] == U1]
    assert list(u1["content_id"]) == [1, 2, 1]
    assert list(u1["n_snaps"]) == [2, 1, 1]
    assert u1.iloc[0]["valid_from"].second == 10
    assert u1.iloc[0]["valid_to"].second == 20
    assert got["n_snaps"].dtype == np.int64


def test_url_frontier_rank_and_cap(ray_session):
    """Changers outrank stable urls; staleness breaks ties; k caps."""
    rows = [
        # u_a: 2 changes, last crawl t=30
        ("https://h.example.org/p/a", 10, 1, 0, "pt"),
        ("https://h.example.org/p/a", 20, 2, 0, "pt"),
        ("https://h.example.org/p/a", 30, 3, 0, "pt"),
        # u_b: 1 change, last crawl t=25
        ("https://h.example.org/p/b", 15, 7, 0, "pt"),
        ("https://h.example.org/p/b", 25, 8, 0, "pt"),
        # u_c: 0 changes, stale (t=5)  |  u_d: 0 changes, fresh (t=99)
        ("https://h.example.org/p/c", 5, 4, 0, "pt"),
        ("https://h.example.org/p/d", 99, 6, 0, "pt"),
    ]
    got = S.url_frontier(_crawl_ds(rows, blocks=2), k=3).to_pandas()
    assert list(got["url"].str[-1]) == ["a", "b", "c"]
    assert list(got["n_changes"]) == [2, 1, 0]
    assert got["n_changes"].dtype == np.int64


def test_host_quota_order_and_cap(ray_session):
    rows = [
        (f"https://h.example.org/p/{i}", 1000 - i, i, 0, "pt")
        for i in range(5)
    ]
    got = S.host_quota(_crawl_ds(rows), k=3).to_pandas()
    # first 3 by warc_ts asc = the LAST generated urls (ts = 1000-i)
    assert len(got) == 3
    assert got["warc_ts"].is_monotonic_increasing
    assert list(got["url"]) == [
        "https://h.example.org/p/4",
        "https://h.example.org/p/3",
        "https://h.example.org/p/2",
    ]


def test_kg_temporal_latest_interval_semantics(ray_session):
    """Every triple carries exactly ONE interval (the per-url join is
    1:1 by construction), and the interval is the LATEST content run:
    a content-changing doc (doc_id % 5 == 0 with >1 snapshot) gets the
    single-snapshot final run, a stable multi-snapshot doc gets the
    full observed range."""
    import numpy as np

    from information_extraction_t5_ray.pipelines.kg import kg_temporal, run_kg
    from information_extraction_t5_ray.sources.synth import URL_PREFIX

    sf = "/root/testdata/sf0.001"
    got = kg_temporal(sf).to_pandas()
    n_triples = run_kg(sf).count()
    assert len(got) == n_triples  # 1:1 interval per subject url
    assert (got["valid_from"] <= got["valid_to"]).all()

    base = np.datetime64("2020-01-01", "us")
    day = np.timedelta64(1, "D")
    minute = np.timedelta64(1, "m")
    per_subj = got.drop_duplicates("subj").set_index("subj")

    # doc 10: snapshots r=0,1 and content changes per revision -> the
    # latest run is the r=1 snapshot alone (valid_from == valid_to)
    s10 = per_subj.loc[f"{URL_PREFIX}{10:08d}"]
    assert s10["valid_from"] == s10["valid_to"] == base + 10 * minute + day

    # doc 4: snapshots r=0,1 with CONSTANT content -> one run spanning
    # the full observed range
    s4 = per_subj.loc[f"{URL_PREFIX}{4:08d}"]
    assert s4["valid_from"] == base + 4 * minute
    assert s4["valid_to"] == base + 4 * minute + day


def test_latest_intervals_matches_composed(ray_session):
    """The fused compaction+argmax must equal snapshot_intervals
    followed by a per-url tail-1 on valid_to."""
    from information_extraction_t5_ray.sources.crawl import read_crawl
    from information_extraction_t5_ray.stages.crawl import (
        latest_intervals,
        snapshot_intervals,
    )

    sf = "/root/testdata/sf0.001"
    fused = (
        latest_intervals(read_crawl(sf))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    composed = (
        snapshot_intervals(read_crawl(sf))
        .to_pandas()
        .sort_values(["url", "valid_to"], kind="stable")
        .groupby("url", sort=False)
        .tail(1)[["url", "valid_from", "valid_to"]]
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fused, composed)


def test_canonicalize_url_chain_semantics():
    import pandas as pd

    from information_extraction_t5_ray.stages.crawl import (
        canonicalize_url_series,
    )

    u = pd.Series(
        [
            "https://a.example.org/p/1?utm_source=x&utm_campaign=y",
            "https://a.example.org/p/1#sec2",
            "HTTPS://A.EXAMPLE.ORG/p/1",
            "https://a.example.org/p/1?",
            "https://a.example.org/p/1?q=keep&utm_medium=z#frag",
        ]
    )
    got = canonicalize_url_series(u).tolist()
    assert got[:4] == ["https://a.example.org/p/1"] * 4
    # non-utm params survive; fragment and utm do not
    assert got[4] == "https://a.example.org/p/1?q=keep"


def test_canonical_latest_merges_dirty_variants(ray_session):
    """All dirty variants of a page must collapse onto ONE canonical
    row, and the winner must be the newest snapshot."""
    from information_extraction_t5_ray.sources.crawl import (
        messy_urls,
        read_crawl,
    )
    from information_extraction_t5_ray.stages.crawl import (
        canonical_latest,
        latest_snapshot,
    )

    sf = "/root/testdata/sf0.001"
    dirty = read_crawl(sf).map_batches(messy_urls, batch_format="pyarrow")
    canon = canonical_latest(dirty).to_pandas()
    clean_latest = latest_snapshot(read_crawl(sf)).to_pandas()
    # one row per page, same key space as the clean-url latest
    assert sorted(canon["canon_url"]) == sorted(clean_latest["url"])
    # winners are the same snapshots (newest per page)
    a = canon.sort_values("canon_url")["content_id"].tolist()
    b = clean_latest.sort_values("url")["content_id"].tolist()
    assert a == b
