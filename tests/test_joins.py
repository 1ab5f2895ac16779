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
