"""Join strategy operators: broadcast vs hash-shuffle semantics."""

import sys
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from information_extraction_t5_ray.stages.joins import broadcast_hash_join, hash_join


@pytest.fixture()
def sides(ray_session):
    import ray.data as rd

    left = rd.from_items(
        [{"k": i % 4, "v": i} for i in range(20)]
    )
    small = pa.table({"k": [0, 1, 2], "name": ["a", "b", "c"]})
    return left, small


def test_broadcast_inner(sides):
    left, small = sides
    df = broadcast_hash_join(left, small, on="k").to_pandas()
    # k==3 rows drop (no match); every other row carries its name
    assert len(df) == 15
    assert set(df["k"]) == {0, 1, 2}
    assert (df[df.k == 1]["name"] == "b").all()


def test_broadcast_left(sides):
    left, small = sides
    df = broadcast_hash_join(left, small, on="k", how="left").to_pandas()
    assert len(df) == 20
    assert df[df.k == 3]["name"].isna().all()


def test_broadcast_rejects_outer(sides):
    left, small = sides
    with pytest.raises(ValueError, match="hash_join"):
        broadcast_hash_join(left, small, on="k", how="full_outer")


def test_hash_join_inner_and_anti(ray_session):
    import ray.data as rd

    left = rd.from_items([{"k": i, "v": i * 10} for i in range(10)])
    right = rd.from_items([{"k": i, "w": -i} for i in range(0, 10, 2)])
    inner = hash_join(left, right, on="k", num_partitions=4).to_pandas()
    assert sorted(inner["k"]) == [0, 2, 4, 6, 8]
    assert (inner["w"] == -inner["k"]).all()
    anti = hash_join(left, right, on="k", how="left_anti", num_partitions=4).to_pandas()
    assert sorted(anti["k"]) == [1, 3, 5, 7, 9]


def test_asof_join_backward_inner_and_left(ray_session):
    import ray.data as rd
    import datetime as dt

    from information_extraction_t5_ray.stages.joins import asof_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    left = rd.from_items(
        [
            {"k": 1, "ts": ts(10), "lv": "a"},
            {"k": 1, "ts": ts(30), "lv": "b"},
            {"k": 2, "ts": ts(5), "lv": "c"},   # before any right row
            {"k": 3, "ts": ts(50), "lv": "d"},  # key with no right rows
        ]
    )
    right = rd.from_items(
        [
            {"k": 1, "ts": ts(8), "rv": 100},
            {"k": 1, "ts": ts(25), "rv": 200},
            {"k": 2, "ts": ts(40), "rv": 300},
        ]
    )
    inner = asof_join(left, right, on="k", ts_col="ts").to_pandas()
    got = {(r.k, r.lv): r.rv for r in inner.itertuples()}
    assert got == {(1, "a"): 100, (1, "b"): 200}

    left_j = asof_join(left, right, on="k", ts_col="ts", how="left").to_pandas()
    assert len(left_j) == 4
    unmatched = left_j[left_j["lv"].isin(["c", "d"])]
    assert unmatched["rv"].isna().all()


def test_asof_join_forward(ray_session):
    import ray.data as rd
    import datetime as dt

    from information_extraction_t5_ray.stages.joins import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = rd.from_items([{"k": 1, "ts": t0, "lv": 1}])
    right = rd.from_items(
        [
            {"k": 1, "ts": t0 + dt.timedelta(minutes=m), "rv": m}
            for m in (5, 9)
        ]
    )
    fwd = asof_join(left, right, on="k", ts_col="ts", direction="forward").to_pandas()
    assert list(fwd["rv"]) == [5]  # smallest right ts >= left ts


def test_sessionize_segments_and_resets(ray_session):
    import datetime as dt

    import ray.data as rd

    from information_extraction_t5_ray.stages.temporal import sessionize

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    # user 1: 3 sessions (gaps 40, 61); user 65: cumsum reset check —
    # same bucket as user 1 under num_buckets=64
    rows = [
        {"event_id": 1, "user_id": 1, "ts": ts(0)},
        {"event_id": 2, "user_id": 1, "ts": ts(10)},
        {"event_id": 3, "user_id": 1, "ts": ts(50)},
        {"event_id": 4, "user_id": 1, "ts": ts(111)},
        {"event_id": 5, "user_id": 65, "ts": ts(0)},
        {"event_id": 6, "user_id": 65, "ts": ts(200)},
    ]
    out = sessionize(
        rd.from_items(rows), key="user_id", ts_col="ts",
        gap=dt.timedelta(minutes=30), id_col="event_id",
    ).to_pandas()
    sess = dict(zip(out["event_id"], out["session_id"]))
    assert sess == {1: 0, 2: 0, 3: 1, 4: 2, 5: 0, 6: 1}


def test_range_join_boundaries_and_replication(ray_session):
    import ray.data as rd

    from information_extraction_t5_ray.stages.joins import range_join

    left = rd.from_items(
        [{"id": i, "v": float(x)} for i, x in enumerate([0.0, 9.9, 10.0, 25.0, 99.0])]
    )
    # interval spanning multiple bins + boundary-inclusive endpoints
    right = rd.from_items(
        [
            {"rid": 1, "lo": 0.0, "hi": 10.0},   # spans bins 0-1 (width 7)
            {"rid": 2, "lo": 25.0, "hi": 25.0},  # degenerate point interval
            {"rid": 3, "lo": 90.0, "hi": 95.0},  # matches nothing
        ]
    )
    out = range_join(
        left, right, left_col="v", right_lo="lo", right_hi="hi", bin_width=7.0
    ).to_pandas()
    pairs = sorted(zip(out["id"].astype(int), out["rid"].astype(int)))
    # v=0, 9.9, 10.0 all inside [0,10] inclusive; v=25 matches the point;
    # each match exactly once despite rid=1 replicating across bins
    assert pairs == [(0, 1), (1, 1), (2, 1), (3, 2)]


def test_bloom_filter_contract():
    import numpy as np

    from information_extraction_t5_ray.stages.joins import bloom_contains, build_bloom

    members = np.arange(0, 100_000, 7, dtype=np.int64)
    bits = build_bloom(members)
    # no false negatives, ever
    assert bloom_contains(bits, members).all()
    # false-positive rate on non-members stays small (1 MiB, 5 hashes)
    non = np.arange(1, 100_000, 7, dtype=np.int64)
    fp = bloom_contains(bits, non).mean()
    assert fp < 0.02, fp


def test_bloom_string_keys():
    import numpy as np

    from information_extraction_t5_ray.stages.joins import bloom_contains, build_bloom

    members = np.array([f"url-{i}" for i in range(0, 5000, 3)], dtype=object)
    bits = build_bloom(members)
    assert bloom_contains(bits, members).all()
    non = np.array([f"url-{i}" for i in range(1, 5000, 3)], dtype=object)
    assert bloom_contains(bits, non).mean() < 0.02


def test_asof_join_tz_aware(ray_session):
    import datetime as dt

    import pandas as pd
    import ray.data as rd

    from information_extraction_t5_ray.stages.joins import asof_join

    t0 = pd.Timestamp("2024-01-01", tz="UTC")
    left = rd.from_pandas(pd.DataFrame(
        {"k": [1], "ts": [t0 + pd.Timedelta(minutes=10)],
         "seen_at": [t0 + pd.Timedelta(minutes=11)]}  # tz-aware value col
    ))
    right = rd.from_pandas(pd.DataFrame(
        {"k": [1], "ts": [t0], "rv": [7]}
    ))
    out = asof_join(left, right, on="k", ts_col="ts").to_pandas()
    assert list(out["rv"]) == [7]
    # tz-aware values survive (dtype may degrade to object through the
    # pandas-block union — Ray can't describe tz dtypes in its schema —
    # but must never raise or lose the zone)
    assert out["seen_at"].iloc[0] == t0 + pd.Timedelta(minutes=11)


def test_rolling_sum_preserves_floats(ray_session):
    import datetime as dt

    import ray.data as rd

    from information_extraction_t5_ray.stages.temporal import rolling_window_sum

    t0 = dt.datetime(2024, 1, 1)
    ev = rd.from_items(
        [{"id": i, "k": 1, "ts": t0 + dt.timedelta(minutes=i), "v": 0.5}
         for i in range(4)]
    )
    out = rolling_window_sum(
        ev, key="k", ts_col="ts", val_col="v", window=2, id_col="id",
        out_col="rs",
    ).to_pandas().sort_values("id")
    # floats are NOT truncated: windows of two 0.5s sum to 1.0
    assert list(out["rs"]) == [0.5, 1.0, 1.0, 1.0]


def test_bloom_semi_join_string_keys(ray_session):
    import ray.data as rd

    from information_extraction_t5_ray.stages.joins import bloom_semi_join

    big = rd.from_items(
        [{"url": f"https://site-{i % 7}.example/p{i}", "host": f"site-{i % 7}", "n": i}
         for i in range(50)]
    )
    keys = rd.from_items([{"host": "site-2"}, {"host": "site-5"}])
    out = bloom_semi_join(big, keys, on="host", num_partitions=4).to_pandas()
    assert len(out) > 0
    assert set(out["host"]) == {"site-2", "site-5"}
    assert len(out) == sum(1 for i in range(50) if i % 7 in (2, 5))
