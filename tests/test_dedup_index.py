"""Online sharded dedup index: admission semantics across successive
ingest calls, within-batch duplicates, shard routing, and count
determinism (arrival order decides WHICH row survives; exactly one
survives per content either way)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from information_extraction_t5_ray.state.dedup_index import (
    ShardedDedupIndex,
    content_keys,
)


def _ds(rows):
    import ray.data as rd

    return rd.from_items(rows).repartition(3)


def test_online_dedup_across_ingest_calls(ray_session):
    idx = ShardedDedupIndex(num_shards=4)
    first = idx.filter_new(
        _ds(
            [
                {"doc_id": 1, "text": "alpha"},
                {"doc_id": 2, "text": "beta"},
                {"doc_id": 3, "text": "alpha"},  # in-call dup
            ]
        )
    ).to_pandas()
    # exactly one row per distinct content survives (which doc_id wins
    # the in-call race is arrival order — count is the contract)
    assert sorted(first["text"]) == ["alpha", "beta"]
    assert idx.size() == 2

    second = idx.filter_new(
        _ds(
            [
                {"doc_id": 10, "text": "alpha"},  # seen in call 1
                {"doc_id": 11, "text": "gamma"},  # new
                {"doc_id": 12, "text": "beta"},  # seen
            ]
        )
    ).to_pandas()
    assert second["text"].tolist() == ["gamma"]
    assert idx.size() == 3


def test_online_dedup_admits_each_content_exactly_once_under_parallelism(
    ray_session,
):
    # 60 distinct contents, each duplicated 5x across many blocks: the
    # racing batches must admit each exactly once
    rows = [
        {"doc_id": i, "text": f"content {i % 60}"} for i in range(300)
    ]
    idx = ShardedDedupIndex(num_shards=4)
    out = idx.filter_new(_ds(rows), batch_size=16).to_pandas()
    assert len(out) == 60
    assert sorted(out["text"].unique()) == sorted(
        {f"content {k}" for k in range(60)}
    )
    assert idx.size() == 60


def test_content_keys_stable_and_distinct():
    a = content_keys(["x", "y", "x"])
    assert a[0] == a[2] != a[1]
    assert a.dtype == np.uint64
    # process-stable (md5, not hash())
    assert int(a[0]) == int(content_keys(["x"])[0])


def test_index_save_load_roundtrip_and_resharding(ray_session, tmp_path):
    idx = ShardedDedupIndex(num_shards=3)
    idx.filter_new(
        _ds([{"doc_id": i, "text": f"doc {i}"} for i in range(50)])
    ).materialize()
    assert idx.size() == 50
    path = idx.save(str(tmp_path / "idx"))

    # reload WIDER (3 -> 5 shards): keys re-route by hash
    idx2 = ShardedDedupIndex.load(path, num_shards=5)
    assert idx2.size() == 50
    out = idx2.filter_new(
        _ds(
            [{"doc_id": 100, "text": "doc 7"},   # admitted last run
             {"doc_id": 101, "text": "doc new"}]
        )
    ).to_pandas()
    assert out["text"].tolist() == ["doc new"]
    assert idx2.size() == 51
