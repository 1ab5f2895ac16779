"""Seeded randomized differential tests: the distributed join/temporal
operators vs DuckDB on the same in-memory frames.  Ties, boundaries,
negative values, empty keys — the edge cases one fixture query can't
cover."""

import datetime as dt
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from information_extraction_t5_ray.stages.joins import asof_join, range_join
from information_extraction_t5_ray.stages.temporal import sessionize


def _rd(df):
    import ray.data as rd

    return rd.from_pandas(df)


def _sorted(df, cols):
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_join_matches_duckdb(ray_session, seed):
    rng = np.random.RandomState(seed)
    t0 = dt.datetime(2024, 1, 1)
    n_l, n_r = 300, 200
    left = pd.DataFrame(
        {
            "lid": np.arange(n_l),
            "k": rng.randint(0, 12, n_l),
            "ts": [t0 + dt.timedelta(seconds=int(s)) for s in
                   rng.choice(100_000, n_l, replace=False)],
        }
    )
    right = pd.DataFrame(
        {
            "rid": np.arange(n_r),
            "k": rng.randint(0, 15, n_r),  # some keys absent on the left
            "ts": [t0 + dt.timedelta(seconds=int(s)) for s in
                   rng.choice(100_000, n_r, replace=False)],
        }
    )
    got = asof_join(_rd(left), _rd(right), on="k", ts_col="ts").to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute(
        """SELECT l.lid, r.rid FROM l ASOF JOIN r
           ON l.k = r.k AND l.ts >= r.ts"""
    ).df()
    g = _sorted(got.rename(columns={"rid_r": "rid"})[["lid", "rid"]], ["lid", "rid"])
    w = _sorted(want, ["lid", "rid"]).astype({c: g[c].dtype for c in g.columns})
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


@pytest.mark.parametrize("seed", [0, 1])
def test_range_join_matches_duckdb(ray_session, seed):
    rng = np.random.RandomState(seed)
    n_l, n_r = 400, 60
    left = pd.DataFrame(
        {
            "lid": np.arange(n_l),
            "v": np.round(rng.uniform(-500, 500, n_l), 3),
        }
    )
    lo = np.round(rng.uniform(-500, 500, n_r), 3)
    right = pd.DataFrame(
        {
            "rid": np.arange(n_r),
            "lo": lo,
            "hi": np.round(lo + rng.uniform(0, 80, n_r), 3),
        }
    )
    got = range_join(
        _rd(left), _rd(right), left_col="v", right_lo="lo", right_hi="hi",
        bin_width=37.0,  # deliberately unaligned with the span distribution
    ).to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute(
        "SELECT l.lid, r.rid FROM l JOIN r ON l.v BETWEEN r.lo AND r.hi"
    ).df()
    g = _sorted(got[["lid", "rid"]], ["lid", "rid"])
    w = _sorted(want, ["lid", "rid"]).astype({c: g[c].dtype for c in g.columns})
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


@pytest.mark.parametrize("seed", [0, 1])
def test_sessionize_matches_duckdb(ray_session, seed):
    rng = np.random.RandomState(seed)
    t0 = dt.datetime(2024, 1, 1)
    n = 500
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.randint(0, 20, n),
            "ts": [t0 + dt.timedelta(seconds=int(s)) for s in
                   rng.choice(500_000, n, replace=False)],
        }
    )
    got = sessionize(
        _rd(ev), key="user_id", ts_col="ts", gap=dt.timedelta(minutes=17),
        id_col="event_id",
    ).to_pandas()
    con = duckdb.connect()
    con.register("ev", ev)
    want = con.execute(
        """WITH g AS (
  SELECT event_id, user_id, ts,
    CASE WHEN ts - lag(ts) OVER w > INTERVAL 17 MINUTE THEN 1 ELSE 0 END AS brk
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id,
  sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
FROM g"""
    ).df()
    cols = ["event_id", "user_id", "session_id"]
    g = _sorted(got[cols].astype(np.int64), cols)
    w = _sorted(want, cols).astype(np.int64)
    pd.testing.assert_frame_equal(g, w)


def test_sessionize_string_keys_matches_duckdb(ray_session):
    """String keys exercise the crc32 bucket path (int keys take the
    modulo path); result must be identical to DuckDB regardless."""
    rng = np.random.RandomState(7)
    t0 = dt.datetime(2024, 1, 1)
    n = 300
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user": [f"user-{u}" for u in rng.randint(0, 15, n)],
            "ts": [t0 + dt.timedelta(seconds=int(s)) for s in
                   rng.choice(300_000, n, replace=False)],
        }
    )
    got = sessionize(
        _rd(ev), key="user", ts_col="ts", gap=dt.timedelta(minutes=20),
        id_col="event_id",
    ).to_pandas()
    con = duckdb.connect()
    con.register("ev", ev)
    want = con.execute(
        """WITH g AS (
  SELECT event_id, "user", ts,
    CASE WHEN ts - lag(ts) OVER w > INTERVAL 20 MINUTE THEN 1 ELSE 0 END AS brk
  FROM ev WINDOW w AS (PARTITION BY "user" ORDER BY ts, event_id)
)
SELECT event_id, "user",
  sum(brk) OVER (PARTITION BY "user" ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
FROM g"""
    ).df()
    cols = ["event_id", "user", "session_id"]
    g = _sorted(got[cols], cols)
    g["session_id"] = g["session_id"].astype(np.int64)
    w = _sorted(want, cols)
    w["session_id"] = w["session_id"].astype(np.int64)
    pd.testing.assert_frame_equal(g, w)


def test_pivot_string_keys(ray_session):
    from information_extraction_t5_ray.stages.temporal import pivot_counts

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "site": [f"s{u}.example" for u in rng.randint(0, 9, 400)],
            "kind": rng.choice(["a", "b", "c"], 400),
        }
    )
    got = pivot_counts(
        _rd(df), key="site", pivot_col="kind", categories=["a", "b", "c"]
    ).to_pandas()
    want = (
        pd.get_dummies(df["kind"], dtype=np.int64)
        .assign(site=df["site"])
        .groupby("site")
        .sum()
        .reset_index()
    )
    cols = ["site", "a", "b", "c"]
    pd.testing.assert_frame_equal(
        _sorted(got[cols], ["site"]), _sorted(want[cols], ["site"]),
        check_dtype=False,
    )
