"""Join strategies, named and scale-annotated.

The reference's joins are in-memory pandas merges (balance outer-join
``features/balance.py``-style, registry lookups); at corpus scale a join
is a *strategy decision*:

* ``broadcast_hash_join`` — the small side is ``ray.put`` ONCE and every
  map task merges against it; the big side never shuffles.  Right
  whenever one side fits comfortably in a worker heap (dimension
  tables, registries, alias dictionaries).  O(big) work, zero exchange.
* ``hash_join``           — both sides hash-partition on the key
  (Ray's hash-shuffle join operator).  The only choice when both sides
  are large; one full exchange of each side.  Supports inner / outer /
  semi / anti.

Skew note: a hash join's hot key lands every matching row in one
aggregator — pre-aggregate the skewed side first (partial combine on
the join key) or salt (append key%k to both sides, k copies of the
small side) before calling ``hash_join``; ``broadcast_hash_join`` is
immune (no exchange).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import pandas as pd
import pyarrow as pa

from .common import bucket_of, resolve_parallelism


def broadcast_hash_join(
    big_ds,
    small: Union[pa.Table, pd.DataFrame],
    on: Union[str, Sequence[str]],
    how: str = "inner",
    suffix: str = "_r",
    batch_size: Optional[int] = None,
):
    """Join a Dataset against a driver-resident small side.

    ``small`` ships to the object store once; each batch does a pandas
    hash merge against the shared copy (zero-copy reads of the
    broadcast, no re-ship per batch).  ``how``: inner or left (the big
    side's row set is preserved or filtered; right/outer would need the
    small side's unmatched rows emitted exactly once across tasks —
    use ``hash_join`` for those).
    """
    import ray

    if how not in ("inner", "left"):
        raise ValueError(
            f"broadcast_hash_join supports inner/left, not {how!r}; "
            "use hash_join for right/full outer"
        )
    keys = [on] if isinstance(on, str) else list(on)
    small_df = small.to_pandas() if isinstance(small, pa.Table) else small
    ref = ray.put(small_df)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(ref)
        return batch.merge(rhs, on=keys, how=how, suffixes=("", suffix))

    kw = {"batch_size": batch_size} if batch_size else {}
    return big_ds.map_batches(merge, batch_format="pandas", **kw)


def hash_join(
    left_ds,
    right_ds,
    on: Union[str, Sequence[str]],
    how: str = "inner",
    num_partitions: int | None = None,
    right_on: Optional[Union[str, Sequence[str]]] = None,
):
    """Large-large join: both sides hash-partition on the key.

    Thin naming wrapper over ``Dataset.join`` so pipelines state the
    strategy explicitly; ``how`` accepts inner / left_outer /
    right_outer / full_outer / left_semi / right_semi / left_anti /
    right_anti.  ``num_partitions`` is the exchange width — size it to
    cluster cores, and salt skewed keys upstream (module docstring).

    Known Ray 2.49 issue: a LEFT hash partition that receives zero rows
    makes the aggregator raise ArrowInvalid ("No match ... for key field
    reference") — keep ``num_partitions`` below the expected
    distinct-key count of the left side (or use bloom_semi_join's
    broadcast-exact path for semi-joins against small key sets).
    """
    num_partitions = resolve_parallelism(num_partitions)
    keys: Tuple[str, ...] = (on,) if isinstance(on, str) else tuple(on)
    rkeys = None
    if right_on is not None:
        rkeys = (right_on,) if isinstance(right_on, str) else tuple(right_on)
    return left_ds.join(
        right_ds,
        how,
        num_partitions=num_partitions,
        on=keys,
        right_on=rkeys,
        right_suffix="_r",
    )


def _nullable_dtype(arrow_type) -> str:
    """pandas dtype that holds this arrow type WITH nulls.  One-sided
    columns in a tagged union must use it on BOTH sides — None-filled
    object columns (or int64 on one side, Int64 on the other) make
    shuffled blocks dtype-mismatched and pickled instead of columnar."""
    import numpy as np  # noqa: F401

    if arrow_type is None:
        # Ray's pandas-block schema reports None for dtypes it can't map
        # to Arrow (e.g. tz-aware datetime64) — leave such columns alone
        return None
    try:
        if pa.types.is_integer(arrow_type):
            return "Int64"
        if pa.types.is_floating(arrow_type):
            return "float64"
        if pa.types.is_timestamp(arrow_type):
            # preserve the zone — astype tz-aware -> naive raises in
            # pandas 2.x, so the plan must carry it
            tz = getattr(arrow_type, "tz", None)
            return f"datetime64[ns, {tz}]" if tz else "datetime64[ns]"
        if pa.types.is_boolean(arrow_type):
            return "boolean"
    except (TypeError, AttributeError):
        pass
    return "object"


def _apply_dtype_plan(out: pd.DataFrame, plan: dict, n: int) -> pd.DataFrame:
    """Add missing plan columns as typed nulls; cast present ones."""
    import numpy as np

    for c, dt in plan.items():
        if dt is None:
            # un-introspectable dtype: fill missing with object nulls,
            # never cast an existing column
            if c not in out.columns:
                out[c] = np.full(n, None, dtype=object)
            continue
        if c not in out.columns:
            if dt == "float64":
                out[c] = np.full(n, np.nan)
            elif dt.startswith("datetime64"):
                # pd.array, not Series: a Series would align on index
                out[c] = pd.array([pd.NaT] * n, dtype=dt)
            elif dt == "object":
                out[c] = np.full(n, None, dtype=object)
            else:  # Int64 / boolean extension dtypes
                # pd.array, not Series: Series assignment aligns on the
                # target index (duplicated after iloc[idx] replication)
                out[c] = pd.array([pd.NA] * n, dtype=dt)
        else:
            out[c] = out[c].astype(dt, copy=False)
    return out


def asof_join(
    left_ds,
    right_ds,
    on: str,
    ts_col: str,
    direction: str = "backward",
    how: str = "inner",
    suffix: str = "_r",
    num_buckets: int | None = None,
):
    """Distributed as-of join: each left row matches the right row with
    the greatest ``ts_col`` <= its own (direction='backward'; 'forward'
    = smallest >=) within the same ``on`` key — DuckDB ``ASOF JOIN``
    semantics (ties on exact-equal right timestamps are resolved to the
    last row in sorted order; deterministic when (key, ts) is unique on
    the right, which callers should ensure).

    Ray Data has no native as-of join; the composition is the
    partitioning insight: both sides co-hash on the KEY (bucketed
    union), so every key's full left+right history lands in one
    ``map_groups`` call, where a vectorized ``pandas.merge_asof``
    (sorted by ts, ``by=key``) does the actual matching.  One exchange
    of each side, no broadcast, skew-bounded by the hottest single key.

    ``how``: 'inner' drops unmatched left rows; 'left' keeps them with
    null right columns.  Key and ts must be non-null on both sides.
    """
    num_buckets = resolve_parallelism(num_buckets)
    import zlib

    import numpy as np

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, not {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner/left, not {how!r}")

    # .schema() on a transformed Dataset executes a limit-1 probe —
    # one per side, paid once per join build (pass pre-read datasets
    # with parquet sources to make it metadata-only)
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    left_cols = list(left_schema.names)
    reserved = {"_side", "_bucket", "__matched"} & set(
        left_cols + list(right_schema.names)
    )
    if reserved:
        raise ValueError(f"asof_join reserves column names {sorted(reserved)}")
    left_dtypes = dict(zip(left_schema.names, left_schema.types))
    rename = {
        c: (c + suffix if (c in left_cols and c not in (on, ts_col)) else c)
        for c in right_schema.names
        if c not in (on, ts_col)
    }
    right_dtypes = {
        rename[c]: t
        for c, t in zip(right_schema.names, right_schema.types)
        if c in rename
    }
    right_value_cols = [rename[c] for c in rename]
    all_cols = left_cols + right_value_cols

    # every column present on only one side gets a fixed nullable dtype
    dtype_plan = {
        c: _nullable_dtype(right_dtypes.get(c)) for c in right_value_cols
    }
    dtype_plan.update(
        {
            c: _nullable_dtype(left_dtypes.get(c))
            for c in left_cols
            if c not in (on, ts_col)
        }
    )

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = _apply_dtype_plan(df.copy(), dtype_plan, len(df))
        out["_side"] = np.int8(0)
        out["_bucket"] = bucket_of(df[on], num_buckets)
        return out[all_cols + ["_side", "_bucket"]]

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = _apply_dtype_plan(df.rename(columns=rename).copy(), dtype_plan, len(df))
        out["_side"] = np.int8(1)
        out["_bucket"] = bucket_of(out[on], num_buckets)
        return out[all_cols + ["_side", "_bucket"]]

    # no repartition before the groupby: the union already carries the
    # read's block fan-out, and groupby shuffles on _bucket itself — an
    # extra repartition would double the exchange volume
    tagged = left_ds.map_batches(tag_left, batch_format="pandas").union(
        right_ds.map_batches(tag_right, batch_format="pandas")
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        # degenerate branches slice the GROUP for their frames so every
        # output block (empty, unmatched-left, merged) carries identical
        # dtypes — an object-dtype empty would break the cross-block
        # schema invariant the tag stages establish
        lf = group[group["_side"] == 0][left_cols]
        rf = group[group["_side"] == 1][[on, ts_col] + right_value_cols]
        if len(lf) == 0:
            return group.iloc[0:0][all_cols]
        lf = lf.sort_values(ts_col, kind="stable")
        if len(rf) == 0:
            if how == "inner":
                return group.iloc[0:0][all_cols]
            # left rows already carry plan-typed null right columns
            return group[group["_side"] == 0].sort_values(
                ts_col, kind="stable"
            )[all_cols]
        rf = rf.sort_values(ts_col, kind="stable").assign(__matched=True)
        merged = pd.merge_asof(
            lf, rf, on=ts_col, by=on, direction=direction
        )
        if how == "inner":
            merged = merged[merged["__matched"].notna()]
        return merged.drop(columns=["__matched"])[all_cols]

    return tagged.groupby("_bucket").map_groups(merge, batch_format="pandas")


def range_join(
    left_ds,
    right_ds,
    left_col: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
    suffix: str = "_r",
    num_buckets: int | None = None,
):
    """Distributed interval join: left rows match right rows with
    ``right_lo <= left_col <= right_hi`` (inner).

    Without an equality key an interval join is a cross product unless
    the VALUE SPACE is partitioned: the number line splits into bins of
    ``bin_width``; each right interval replicates to every bin it
    overlaps, each left row lands in exactly ONE bin (its value's), and
    the predicate is evaluated inside the bin's group.  Because a match
    is only detected in the left value's bin, every (left, right) match
    is emitted exactly once — no dedup pass.  Cost: right replication
    factor = mean interval span / bin_width (pick bin_width near the
    typical span); skew guard is the per-bin group size.
    """
    num_buckets = resolve_parallelism(num_buckets)
    import numpy as np

    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    left_cols = list(left_schema.names)
    r_names = list(right_schema.names)
    reserved = {"_bin", "_side", "_bucket"} & set(left_cols + r_names)
    if reserved:
        raise ValueError(f"range_join reserves column names {sorted(reserved)}")
    rename = {c: (c + suffix if c in left_cols else c) for c in r_names}
    right_cols = [rename[c] for c in r_names]
    lo_c, hi_c = rename[right_lo], rename[right_hi]
    all_cols = left_cols + right_cols

    # every column is one-sided in this union — fix nullable dtypes on
    # both sides so shuffled blocks stay columnar (see _nullable_dtype)
    dtype_plan = dict(
        zip(left_cols, (_nullable_dtype(t) for t in left_schema.types))
    )
    dtype_plan.update(
        {rename[c]: _nullable_dtype(t) for c, t in zip(r_names, right_schema.types)}
    )

    def to_bin(v: np.ndarray) -> np.ndarray:
        return np.floor(v / bin_width).astype(np.int64)

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = _apply_dtype_plan(df.copy(), dtype_plan, len(df))
        b = to_bin(df[left_col].to_numpy(np.float64))
        out["_bin"] = b
        out["_side"] = np.int8(0)
        out["_bucket"] = (b % num_buckets).astype(np.int32)
        return out[all_cols + ["_bin", "_side", "_bucket"]]

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns=rename)
        lo = to_bin(df[lo_c].to_numpy(np.float64))
        hi = to_bin(df[hi_c].to_numpy(np.float64))
        spans = (hi - lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(df)), spans)
        bins = np.concatenate(
            [np.arange(a, b + 1) for a, b in zip(lo, hi)]
        ) if len(df) else np.empty(0, np.int64)
        out = _apply_dtype_plan(df.iloc[idx].copy(), dtype_plan, len(idx))
        out["_bin"] = bins
        out["_side"] = np.int8(1)
        out["_bucket"] = (bins % num_buckets).astype(np.int32)
        return out[all_cols + ["_bin", "_side", "_bucket"]]

    # no repartition before the groupby — it would add a second
    # all-to-all exchange on top of the groupby's own shuffle
    tagged = left_ds.map_batches(tag_left, batch_format="pandas").union(
        right_ds.map_batches(tag_right, batch_format="pandas")
    )

    def match(group: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in group.groupby("_bin", sort=False):
            lf = g[g["_side"] == 0]
            rf = g[g["_side"] == 1]
            if len(lf) == 0 or len(rf) == 0:
                continue
            v = lf[left_col].to_numpy(np.float64)
            lo = rf[lo_c].to_numpy(np.float64)
            hi = rf[hi_c].to_numpy(np.float64)
            li, ri = np.nonzero(
                (v[:, None] >= lo[None, :]) & (v[:, None] <= hi[None, :])
            )
            if len(li) == 0:
                continue
            merged = pd.concat(
                [
                    lf.iloc[li][left_cols].reset_index(drop=True),
                    rf.iloc[ri][right_cols].reset_index(drop=True),
                ],
                axis=1,
            )
            out.append(merged)
        if not out:
            return _apply_dtype_plan(pd.DataFrame(), dtype_plan, 0)[all_cols]
        return pd.concat(out, ignore_index=True)[all_cols]

    return tagged.groupby("_bucket").map_groups(match, batch_format="pandas")


# ---------------------------------------------------------------------------
# Bloom-filter semi-join prefilter
# ---------------------------------------------------------------------------


def _bloom_keys_u64(keys) -> "np.ndarray":
    """Keys -> uint64 for hashing: integers pass through; anything else
    hashes crc32(str) (32 bits is plenty of entropy for a Bloom mix)."""
    import zlib

    import numpy as np

    arr = np.asarray(keys)
    if np.issubdtype(arr.dtype, np.integer):
        return arr.astype(np.uint64)
    return np.fromiter(
        (zlib.crc32(str(k).encode()) for k in arr), np.uint64, count=len(arr)
    )


def build_bloom(keys, n_bits: int = 1 << 20, n_hashes: int = 5):
    """Bit-array Bloom filter from a key array (double hashing:
    h_i = h1 + i*h2, Kirsch-Mitzenmacher); int keys hash directly,
    other types via crc32 of their string form."""
    import numpy as np

    keys = _bloom_keys_u64(keys)
    h1 = (keys * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(16)
    h2 = (keys * np.uint64(0xC2B2AE3D27D4EB4F)) >> np.uint64(16) | np.uint64(1)
    bits = np.zeros(n_bits // 8, dtype=np.uint8)
    for i in range(n_hashes):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                         (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))
    return bits


def bloom_contains(bits, keys, n_hashes: int = 5):
    import numpy as np

    n_bits = np.uint64(len(bits) * 8)
    keys = _bloom_keys_u64(keys)
    h1 = (keys * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(16)
    h2 = (keys * np.uint64(0xC2B2AE3D27D4EB4F)) >> np.uint64(16) | np.uint64(1)
    ok = np.ones(len(keys), dtype=bool)
    for i in range(n_hashes):
        pos = (h1 + np.uint64(i) * h2) % n_bits
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        ok &= (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1 > 0
    return ok


def bloom_semi_join(
    big_ds,
    keys_ds,
    on: str,
    num_partitions: int | None = None,
    n_bits: int = 1 << 20,
    exact: str = "broadcast",
):
    """Exact semi-join against a small key side, Bloom-accelerated: the
    key set builds a broadcast bit-array filter whose O(1)-per-row probe
    rejects most non-matching big-side rows, then an exact membership
    test removes the Bloom's false positives.

    ``exact='broadcast'`` (default): the distinct key array itself is
    broadcast and checked with a vectorized ``np.isin`` after the Bloom
    probe — zero exchange of the big side, right whenever the DISTINCT
    keys fit in worker memory (the same regime where the small side of a
    broadcast join fits).  ``exact='join'``: Ray's hash-shuffle LEFT
    SEMI join does the final test — needed only when the distinct key
    set itself is too large to broadcast; note Ray 2.49's hash-shuffle
    join raises ArrowInvalid when a left hash partition receives no rows
    (keys sparser than num_partitions), so size num_partitions below the
    expected distinct-key count on that path.

    The scale pattern either way: at 10^12 big-side rows, the per-row
    cost is the Bloom probe; the 128 KiB filter rejects ~99% of
    non-members before any exact work.
    """
    num_partitions = resolve_parallelism(num_partitions)
    import numpy as np
    import ray

    # materialize once: unique() (for the filter) and the exact test
    # both consume the keys side — without this its upstream pipeline
    # would execute twice
    keys_ds = keys_ds.materialize()
    key_rows = np.asarray(keys_ds.unique(on))
    bits = build_bloom(key_rows, n_bits=n_bits)
    bits_ref = ray.put(bits)
    keys_ref = ray.put(key_rows)

    if exact == "broadcast":

        def prefilter(batch: pa.Table) -> pa.Table:
            b = ray.get(bits_ref)
            vals = batch[on].to_numpy()
            mask = bloom_contains(b, vals)
            if mask.any():
                # exact membership only on the Bloom survivors
                mask[mask] = np.isin(vals[mask], ray.get(keys_ref))
            return batch.filter(pa.array(mask))

        return big_ds.map_batches(prefilter, batch_format="pyarrow")

    def prefilter(batch: pa.Table) -> pa.Table:
        b = ray.get(bits_ref)
        return batch.filter(pa.array(bloom_contains(b, batch[on].to_numpy())))

    filtered = big_ds.map_batches(prefilter, batch_format="pyarrow")
    return hash_join(
        filtered, keys_ds, on=on, how="left_semi", num_partitions=num_partitions
    )
