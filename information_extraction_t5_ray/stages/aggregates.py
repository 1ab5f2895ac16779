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

from .common import arrowed, bucket_of, resolve_parallelism


def grouped_median_counting(
    ds,
    group_col: str,
    val_col: str,
    out_col: str = "median",
    num_buckets: int | None = None,
):
    num_buckets = resolve_parallelism(num_buckets)
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby([group_col, val_col], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        g["_bucket"] = bucket_of(g[group_col], num_buckets)
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

    partials = ds.map_batches(arrowed(partial), batch_format="pandas")
    return partials.groupby("_bucket").map_groups(arrowed(final), batch_format="pandas")


def grouped_quantiles_counting(
    ds,
    group_col: str,
    val_col: str,
    qs: dict,
    num_buckets: int | None = None,
):
    """EXACT per-group discrete quantiles for bounded-cardinality value
    domains — the same counting-sort shuffle as
    :func:`grouped_median_counting` (the wire carries (group, value,
    count) partials, never raw rows), generalized to any quantile set.

    ``qs`` maps output column name -> quantile in (0, 1].  Quantile
    definition matches DuckDB's ``quantile_disc`` exactly: the value at
    1-based rank ``ceil(q * n)`` with q taken as the EXACT DECIMAL the
    SQL literal denotes (DuckDB parses '0.28' as DECIMAL, so 0.28*25 is
    exactly 7 — float64 ceil would round UP to rank 8 whenever q*n is
    mathematically integral but inexact in binary; probed against ~2700
    (q, n) pairs).  Ranks are therefore computed with
    ``Fraction(repr(q))`` — integral selection, no interpolation,
    byte-stable."""
    import math
    from fractions import Fraction

    num_buckets = resolve_parallelism(num_buckets)
    q_exact = {name: Fraction(repr(float(q))) for name, q in qs.items()}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby([group_col, val_col], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        g["_bucket"] = bucket_of(g[group_col], num_buckets)
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        counts = (
            df.groupby([group_col, val_col], sort=False)["cnt"].sum().reset_index()
        )
        rows = []
        for key, g in counts.groupby(group_col, sort=False):
            g = g.sort_values(val_col, kind="stable")
            cum = np.cumsum(g["cnt"].to_numpy())
            n = cum[-1]
            row = {group_col: key}
            for name, q in q_exact.items():
                rank = max(1, math.ceil(q * int(n)))
                idx = int(np.searchsorted(cum, rank))
                row[name] = g[val_col].iloc[idx]
            rows.append(row)
        return pd.DataFrame(rows, columns=[group_col, *qs.keys()])

    partials = ds.map_batches(arrowed(partial), batch_format="pandas")
    return partials.groupby("_bucket").map_groups(arrowed(final), batch_format="pandas")


# ---------------------------------------------------------------------------
# HyperLogLog approximate distinct count
# ---------------------------------------------------------------------------

_HLL_P = 12  # 4096 registers -> ~1.6% standard error
_HLL_M = 1 << _HLL_P


def _hll_mix(x: np.ndarray) -> np.ndarray:
    """64-bit avalanche (splitmix64 finalizer) over int64/uint64 keys."""
    z = x.astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))

def hll_register_batch(keys: np.ndarray) -> np.ndarray:
    """Batch of keys -> dense register array (length 4096, uint8)."""
    h = _hll_mix(keys)
    idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = (h << np.uint64(_HLL_P)) | np.uint64((1 << _HLL_P) - 1)
    # rank = leading zeros of the remaining bits + 1, via float64 log2
    # of the top-bit position (low bits are floored by the OR mask)
    bits = np.full(len(h), 64 - _HLL_P, dtype=np.int64)
    nz = rest != 0
    bits[nz] = 63 - np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
    rank = (bits + 1).clip(1, 64 - _HLL_P + 1).astype(np.uint8)
    regs = np.zeros(_HLL_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Flajolet et al. '07 estimator with small-range correction."""
    m = float(_HLL_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)
    return float(e)


def approx_distinct(ds, key_col: str, batch_size: int = 8192) -> float:
    """Approximate COUNT(DISTINCT key) with one tiny exchange: each
    batch folds to a 4 KiB register array; register arrays merge by
    elementwise max on the driver (they are order- and
    partition-insensitive).  ~1.6% standard error at p=12.

    At cluster scale the merge is a tree reduce of 4 KiB payloads —
    constant shuffle volume regardless of input size, the reason HLL
    (not exact distinct) is the 100 TB cardinality tool.
    """

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy()
        regs = hll_register_batch(keys)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def merge_level(batch: pa.Table) -> pa.Table:
        arrs = [
            np.frombuffer(b, dtype=np.uint8)
            for b in batch["regs"].to_pylist()
        ]
        merged = (
            np.maximum.reduce(arrs)
            if arrs
            else np.zeros(_HLL_M, dtype=np.uint8)
        )
        return pa.table({"regs": pa.array([merged.tobytes()], pa.binary())})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )
    # shuffle-free TREE reduce: two fold levels, each task max-merging
    # up to 1024 register rows into one (merge is associative and
    # partition-insensitive) — 1024^2 batch partials collapse before
    # the driver sees a row, so driver work stays O(1) at any corpus
    # size instead of O(n_batches) take_all
    for _ in range(2):
        parts = parts.map_batches(
            merge_level, batch_format="pyarrow", batch_size=1024
        )
    merged = np.zeros(_HLL_M, dtype=np.uint8)
    for row in parts.take_all():
        merged = np.maximum(merged, np.frombuffer(row["regs"], dtype=np.uint8))
    return hll_estimate(merged)


def grouped_approx_distinct(
    ds,
    group_col: str,
    key_col: str,
    out_col: str = "approx_distinct",
    num_buckets: int | None = None,
    batch_size: int = 8192,
):
    """Per-group approximate COUNT(DISTINCT key): one HLL register array
    per (group, batch) partial, max-merged in a bucketed groupby — the
    grouped generalization of :func:`approx_distinct`.  Exchange volume
    is O(groups x batches x 4 KiB), independent of row count; registers
    are order- and partition-insensitive, so the estimate is
    deterministic for a given batching.  Returns (group, approx_distinct
    float64); rows-only at the driver gate (the estimator is
    approximate by construction), accuracy pytest-checked at 3 sigma."""
    num_buckets = resolve_parallelism(num_buckets)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            rows.append(
                {
                    group_col: g,
                    "regs": hll_register_batch(
                        sub[key_col].to_numpy()
                    ).tobytes(),
                }
            )
        out = pd.DataFrame(rows, columns=[group_col, "regs"])
        out["_bucket"] = bucket_of(out[group_col], num_buckets)
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            merged = np.zeros(_HLL_M, dtype=np.uint8)
            for b in sub["regs"]:
                merged = np.maximum(
                    merged, np.frombuffer(b, dtype=np.uint8)
                )
            rows.append({group_col: g, out_col: hll_estimate(merged)})
        return pd.DataFrame(rows, columns=[group_col, out_col])

    partials = ds.map_batches(
        partial, batch_format="pandas", batch_size=batch_size
    )
    return partials.groupby("_bucket").map_groups(
        final, batch_format="pandas"
    )


def grouped_topk(
    ds,
    group_col: str,
    order_col: str,
    k: int,
    tie_col: str,
    ascending: bool = False,
    num_buckets: int | None = None,
):
    """Top-k rows per group by ``order_col`` (ties broken by ascending
    ``tie_col`` — deterministic under any partitioning).  Two-phase: each
    batch keeps at most k rows per group before the shuffle, the bucketed
    final fold re-selects — the grouped generalization of the
    highest-probability-window argmax (k=1), reference
    ``features/postprocess.py:249-288``.
    """
    num_buckets = resolve_parallelism(num_buckets)
    def select(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(
            [group_col, order_col, tie_col],
            ascending=[True, ascending, True],
            kind="stable",
        )
        return out.groupby(group_col, sort=False).head(k)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = select(df)
        return out.assign(_bucket=bucket_of(out[group_col], num_buckets))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return select(df).drop(columns=["_bucket"])

    partials = ds.map_batches(arrowed(partial), batch_format="pandas")
    return partials.groupby("_bucket").map_groups(arrowed(final), batch_format="pandas")
