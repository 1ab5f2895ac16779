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
    if how == "left":
        # pre-convert the small side's int/bool columns to NULLABLE
        # extension dtypes: a plain left merge promotes them to
        # float64/object only in batches containing an unmatched key,
        # so blocks of the same dataset would carry CONFLICTING schemas
        # (and int64 > 2^53 would silently lose precision) — the same
        # drift asof_join prevents with _ext_mapper
        conv = {}
        for c, dt in small_df.dtypes.items():
            if c in keys:
                continue
            if dt.kind in ("i", "u"):
                conv[c] = "Int64"
            elif dt.kind == "b":
                conv[c] = "boolean"
        if conv:
            small_df = small_df.astype(conv)
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


def _as_arrow(ds):
    """Normalize a Dataset to Arrow blocks so ``.schema()`` reports real
    Arrow types (pandas-block sources report None for dtypes Arrow can't
    introspect lazily, e.g. tz-aware datetimes) and the tagged-union
    exchange below ships columnar Arrow instead of pickled pandas.
    Schema metadata is stripped: pandas-written parquet embeds a
    b'pandas' dict that makes pa.Schema unhashable, so Ray's block
    concat warns and falls back to the slow schema-unify path."""
    from .common import strip_pandas_metadata

    return strip_pandas_metadata(ds)


def _ext_mapper(t):
    """Arrow -> pandas extension dtypes for the group merge: keeps
    int/bool columns nullable WITHOUT falling to float64/object, so a
    group whose one-sided columns are all-null still round-trips to the
    fixed output schema losslessly."""
    if pa.types.is_integer(t):
        return pd.Int64Dtype()
    if pa.types.is_boolean(t):
        return pd.BooleanDtype()
    return None


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
    import numpy as np

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, not {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner/left, not {how!r}")

    # .schema() on a transformed Dataset executes a limit-1 probe —
    # one per side, paid once per join build (pass pre-read datasets
    # with parquet sources to make it metadata-only)
    left_ds, right_ds = _as_arrow(left_ds), _as_arrow(right_ds)
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    left_cols = list(left_schema.names)
    reserved = {"_side", "_bucket", "__matched"} & set(
        left_cols + list(right_schema.names)
    )
    if reserved:
        raise ValueError(f"asof_join reserves column names {sorted(reserved)}")
    left_types = dict(zip(left_schema.names, left_schema.types))
    rename = {
        c: (c + suffix if (c in left_cols and c not in (on, ts_col)) else c)
        for c in right_schema.names
        if c not in (on, ts_col)
    }
    right_types = {
        rename[c]: t
        for c, t in zip(right_schema.names, right_schema.types)
        if c in rename
    }
    right_value_cols = [rename[c] for c in rename]
    all_cols = left_cols + right_value_cols

    # ONE fixed Arrow schema for the whole tagged union: columns present
    # on only one side ship as typed nulls, so every block — left,
    # right, merged, empty — is columnar Arrow with identical schema (no
    # pickled pandas through the exchange, no cross-block drift)
    col_types = {**left_types, **right_types}
    union_schema = pa.schema(
        [pa.field(c, col_types[c]) for c in all_cols]
        + [pa.field("_side", pa.int8()), pa.field("_bucket", pa.int32())]
    )
    out_schema = pa.schema([pa.field(c, col_types[c]) for c in all_cols])

    def _tag(t: pa.Table, side: int, colmap: dict) -> pa.Table:
        n = t.num_rows
        arrays = []
        for f in union_schema:
            if f.name == "_side":
                arrays.append(pa.array(np.full(n, side, np.int8)))
            elif f.name == "_bucket":
                key = t[colmap.get(on, on)].to_numpy(zero_copy_only=False)
                arrays.append(pa.array(bucket_of(key, num_buckets)))
            elif f.name in colmap:
                arrays.append(t[colmap[f.name]].cast(f.type))
            else:
                arrays.append(pa.nulls(n, f.type))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    left_map = {c: c for c in left_cols}
    right_map = {rename[c]: c for c in rename} | {on: on, ts_col: ts_col}
    # bounded batch size NORMALIZES block row counts into the sort-based
    # exchange: a small input's many sliver blocks coalesce (the sort
    # pays a fixed cost per block), a huge input's fat blocks split so
    # reduce-side parallelism holds — either way ~16k-row sort units
    tagged = left_ds.map_batches(
        lambda t: _tag(t, 0, left_map), batch_format="pyarrow", batch_size=16384
    ).union(
        right_ds.map_batches(
            lambda t: _tag(t, 1, right_map), batch_format="pyarrow", batch_size=16384
        )
    )

    def merge(group: pa.Table) -> pa.Table:
        # pandas only inside the group merge (merge_asof), with nullable
        # extension dtypes so all-null one-sided columns round-trip to
        # the fixed Arrow output schema losslessly
        df = group.to_pandas(types_mapper=_ext_mapper)
        # merge_asof requires plain (non-extension) on/by dtypes; only
        # de-extension the masked int/bool dtypes _ext_mapper introduced
        # (tz-aware datetimes are extension too but natively supported)
        for c in (on, ts_col):
            if isinstance(
                df[c].dtype, (pd.Int64Dtype().__class__, pd.BooleanDtype().__class__)
            ):
                df[c] = df[c].astype(df[c].dtype.numpy_dtype)
        lf = df[df["_side"] == 0][left_cols]
        if len(lf) == 0:
            return out_schema.empty_table()
        rf = df[df["_side"] == 1][[on, ts_col] + right_value_cols]
        lf = lf.sort_values(ts_col, kind="stable")
        if len(rf) == 0:
            if how == "inner":
                return out_schema.empty_table()
            # left rows with their (typed, all-null) right columns
            merged = df[df["_side"] == 0].sort_values(ts_col, kind="stable")
        else:
            rf = rf.sort_values(ts_col, kind="stable").assign(__matched=True)
            merged = pd.merge_asof(lf, rf, on=ts_col, by=on, direction=direction)
            if how == "inner":
                merged = merged[merged["__matched"].notna()]
            merged = merged.drop(columns=["__matched"])
        return pa.Table.from_pandas(
            merged[all_cols], schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)  # from_pandas re-attaches the
        # unhashable b'pandas' metadata even with an explicit schema

    return tagged.groupby("_bucket").map_groups(merge, batch_format="pyarrow")


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

    left_ds, right_ds = _as_arrow(left_ds), _as_arrow(right_ds)
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

    # one fixed Arrow schema for the union (typed nulls on the absent
    # side) and for every output block — pandas never touches this join
    col_types = dict(zip(left_cols, left_schema.types))
    col_types.update(
        {rename[c]: t for c, t in zip(r_names, right_schema.types)}
    )
    union_schema = pa.schema(
        [pa.field(c, col_types[c]) for c in all_cols]
        + [
            pa.field("_bin", pa.int64()),
            pa.field("_side", pa.int8()),
            pa.field("_bucket", pa.int32()),
        ]
    )
    out_schema = pa.schema([pa.field(c, col_types[c]) for c in all_cols])

    def to_bin(v: np.ndarray) -> np.ndarray:
        return np.floor(v / bin_width).astype(np.int64)

    def _assemble(t: pa.Table, names_present: dict, bins, side: int) -> pa.Table:
        n = len(bins)
        arrays = []
        for f in union_schema:
            if f.name == "_bin":
                arrays.append(pa.array(bins))
            elif f.name == "_side":
                arrays.append(pa.array(np.full(n, side, np.int8)))
            elif f.name == "_bucket":
                arrays.append(pa.array((bins % num_buckets).astype(np.int32)))
            elif f.name in names_present:
                arrays.append(t[names_present[f.name]].cast(f.type))
            else:
                arrays.append(pa.nulls(n, f.type))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    def tag_left(t: pa.Table) -> pa.Table:
        bins = to_bin(t[left_col].to_numpy(zero_copy_only=False).astype(np.float64))
        return _assemble(t, {c: c for c in left_cols}, bins, 0)

    def tag_right(t: pa.Table) -> pa.Table:
        lo_f = t[right_lo].to_numpy(zero_copy_only=False).astype(np.float64)
        hi_f = t[right_hi].to_numpy(zero_copy_only=False).astype(np.float64)
        # SQL BETWEEN semantics: a reversed (lo > hi) or NaN interval
        # matches nothing — drop it here instead of letting a negative
        # span crash np.repeat (opaquely) or a NaN->int64 cast fabricate
        # astronomically wide bin ranges
        ok = ~(np.isnan(lo_f) | np.isnan(hi_f)) & (lo_f <= hi_f)
        if not ok.all():
            t = t.filter(pa.array(ok))
            lo_f, hi_f = lo_f[ok], hi_f[ok]
        lo = to_bin(lo_f)
        hi = to_bin(hi_f)
        spans = (hi - lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(t.num_rows), spans)
        bins = (
            np.concatenate([np.arange(a, b + 1) for a, b in zip(lo, hi)])
            if t.num_rows
            else np.empty(0, np.int64)
        )
        rep = t.take(idx)  # each interval replicated to every bin it overlaps
        return _assemble(rep, {rename[c]: c for c in r_names}, bins, 1)

    # no repartition before the groupby — it would add a second
    # all-to-all exchange on top of the groupby's own shuffle
    tagged = left_ds.map_batches(
        tag_left, batch_format="pyarrow", batch_size=16384
    ).union(right_ds.map_batches(tag_right, batch_format="pyarrow", batch_size=16384))

    def match(group: pa.Table) -> pa.Table:
        side = group["_side"].to_numpy()
        bins = group["_bin"].to_numpy()
        vals = group[left_col].to_numpy(zero_copy_only=False)
        los = group[lo_c].to_numpy(zero_copy_only=False)
        his = group[hi_c].to_numpy(zero_copy_only=False)
        # one argsort by (bin, side) + change-point slicing instead of
        # per-bin full-length boolean masks (a wide-range group with
        # thousands of distinct bins paid O(bins x rows) pure masking)
        order = np.lexsort((side, bins))
        sb, ss = bins[order], side[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(sb[1:] != sb[:-1]) + 1, [len(sb)])
        )
        li_all, ri_all = [], []
        for si, ei in zip(starts[:-1], starts[1:]):
            seg = order[si:ei]
            seg_side = ss[si:ei]
            split = int(np.searchsorted(seg_side, 1))  # side-sorted
            lf, rf = seg[:split], seg[split:]
            if len(lf) == 0 or len(rf) == 0:
                continue
            v = vals[lf].astype(np.float64)
            lo = los[rf].astype(np.float64)
            hi = his[rf].astype(np.float64)
            li, ri = np.nonzero(
                (v[:, None] >= lo[None, :]) & (v[:, None] <= hi[None, :])
            )
            li_all.append(lf[li])
            ri_all.append(rf[ri])
        if not li_all:
            return out_schema.empty_table()
        lrows = group.take(np.concatenate(li_all))
        rrows = group.take(np.concatenate(ri_all))
        return pa.Table.from_arrays(
            [lrows[c] for c in left_cols] + [rrows[c] for c in right_cols],
            schema=out_schema,
        )

    return tagged.groupby("_bucket").map_groups(match, batch_format="pyarrow")


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
    # the Bloom-filtered left side carries (approximately) only member
    # keys, so its distinct-key count is bounded by len(key_rows) —
    # clamp the exchange width below it or an empty left hash partition
    # trips the documented Ray ArrowInvalid
    return hash_join(
        filtered,
        keys_ds,
        on=on,
        how="left_semi",
        num_partitions=max(1, min(num_partitions, len(key_rows))),
    )
