"""Distributed order statistics.

``grouped_median_counting`` — EXACT per-group median for
bounded-cardinality value domains (quantities, ratings, bucketed
lengths): the shuffle carries (group, value, count) partials — a
counting sort — so no group ever needs its raw rows co-located.  This
is the scale path for exact quantiles whenever the value domain is
small; for unbounded continuous domains swap in a sketch (t-digest) and
accept approximation.  Median definition: LOWER median — the smallest
value whose cumulative count reaches ceil(n/2) — chosen because it is
integral and byte-stable (no interpolation, no float).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def grouped_median_counting(
    ds,
    group_col: str,
    val_col: str,
    out_col: str = "median",
    num_buckets: int = 64,
):
    import zlib

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby([group_col, val_col], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        g["_bucket"] = g[group_col].map(
            lambda s: zlib.crc32(str(s).encode()) % num_buckets
        ).astype(np.int32)
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        counts = (
            df.groupby([group_col, val_col], sort=False)["cnt"].sum().reset_index()
        )
        out_g, out_v = [], []
        for key, g in counts.groupby(group_col, sort=False):
            g = g.sort_values(val_col, kind="stable")
            c = g["cnt"].to_numpy()
            pos = (c.sum() + 1) // 2  # lower median rank
            idx = int(np.searchsorted(np.cumsum(c), pos))
            out_g.append(key)
            out_v.append(g[val_col].iloc[idx])
        return pd.DataFrame({group_col: out_g, out_col: out_v})

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby("_bucket").map_groups(final, batch_format="pandas")
