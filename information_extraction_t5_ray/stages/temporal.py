"""Temporal / event-stream operators.

``sessionize`` — gap-based sessionization: events of one key sorted by
time split into sessions wherever the gap to the previous event exceeds
``gap``.  The classic clickstream primitive (and the reference's
window-grouping move — group rows of one document, order, then segment
— ``features/postprocess.py:249-288`` — generalized to time).

Scale shape: ONE exchange — events co-hash on the key (bucketed
groupby), each group sorts its own key's history and assigns session
ids with a vectorized diff/cumsum.  Session ids are deterministic under
any partitioning: ``(key, session_seq)`` with session_seq numbered in
(ts, id_col) order within the key.
"""

from __future__ import annotations

import datetime as _dt
from typing import Optional

import numpy as np
import pandas as pd

from .common import bucket_of, resolve_parallelism


def _guard_reserved(ds, cols=("_bucket",)):
    """Reject inputs already carrying a reserved internal column — an
    append_column duplicate would make the groupby ambiguous and the
    final drop would silently delete the USER's column (same contract
    as joins.asof_join's reserved-name check)."""
    names = set(ds.schema().names)
    hit = sorted(names & set(cols))
    if hit:
        raise ValueError(f"input already has reserved column(s) {hit}")
    return ds


def sessionize(
    events_ds,
    key: str,
    ts_col: str,
    gap: _dt.timedelta,
    id_col: Optional[str] = None,
    out_col: str = "session_id",
    num_buckets: int | None = None,
):
    """Assign ``out_col`` = 0-based session index per ``key``, ordered
    by (``ts_col``, ``id_col``); a new session starts when the time
    since the previous event of the same key exceeds ``gap``.

    ``id_col`` breaks timestamp ties deterministically (required when
    timestamps can repeat within a key).
    """
    num_buckets = resolve_parallelism(num_buckets)
    events_ds = _guard_reserved(events_ds)
    import pyarrow as pa
    import pyarrow.compute as pc

    order_cols = [ts_col] + ([id_col] if id_col else [])
    sort_keys = [(c, "ascending") for c in [key] + order_cols]

    def tag(t: pa.Table) -> pa.Table:
        b = bucket_of(t[key].to_numpy(zero_copy_only=False), num_buckets)
        # strip any b'pandas' metadata a pandas upstream block smuggled
        # in: map_groups concats the per-group outputs, and an
        # unhashable metadata dict defeats Ray's schema dedup there
        return t.append_column("_bucket", pa.array(b)).replace_schema_metadata(
            None
        )

    # integer arithmetic, not total_seconds()*1e9: the float64 product
    # can round for day-scale gaps and flip the strictly-greater test
    gap_ns = np.timedelta64((gap // _dt.timedelta(microseconds=1)) * 1000, "ns")

    def assign(group: pa.Table) -> pa.Table:
        g = group.take(pc.sort_indices(group, sort_keys=sort_keys))
        n = g.num_rows
        ts = g[ts_col].to_numpy().astype("datetime64[ns]")
        k = g[key].to_numpy(zero_copy_only=False)
        new_key = np.empty(n, dtype=bool)
        new_key[0:1] = True
        new_key[1:] = k[1:] != k[:-1]
        brk = np.empty(n, dtype=np.int64)
        brk[0:1] = 0
        brk[1:] = ((ts[1:] - ts[:-1]) > gap_ns).astype(np.int64)
        brk[new_key] = 0
        # cumulative breaks within each key: global cumsum minus the
        # key's starting offset (vectorized segment reset)
        c = np.cumsum(brk)
        starts = np.where(new_key)[0]
        offset = np.repeat(c[starts], np.diff(np.append(starts, n)))
        return g.drop_columns(["_bucket"]).append_column(
            out_col, pa.array(c - offset)
        )

    # Arrow blocks end-to-end: the tag/exchange ships columnar, and every
    # group output (incl. empties) carries one fixed schema; bounded
    # batch size normalizes block row counts into the sort-based
    # exchange (sliver blocks coalesce, fat blocks split)
    tagged = events_ds.map_batches(tag, batch_format="pyarrow", batch_size=16384)
    return tagged.groupby("_bucket").map_groups(assign, batch_format="pyarrow")


def pivot_counts(
    ds,
    key: str,
    pivot_col: str,
    categories: list,
    num_buckets: int | None = None,
):
    """Distributed pivot: one row per ``key``, one count column per
    category of ``pivot_col`` (the reference's per-document-class sheet
    pivot — ``models/qa_model.py:388-436`` — as a streaming two-phase
    aggregate instead of a driver-side pandas pivot).

    ``categories`` must be the closed category set (column layout is
    schema, so it cannot depend on the data); unknown values count into
    none of the columns.  Shuffle moves one partial row per
    (batch, key) — the combiner pattern.
    """
    num_buckets = resolve_parallelism(num_buckets)
    ds = _guard_reserved(ds)
    import pyarrow as pa

    cols = [str(c) for c in categories]

    def partial(t: pa.Table) -> pa.Table:
        df = t.select([key, pivot_col]).to_pandas()
        d = pd.get_dummies(
            df[pivot_col].astype(str), dtype=np.int64
        ).reindex(columns=cols, fill_value=0)
        d[key] = df[key].to_numpy()
        g = d.groupby(key, sort=False).sum().reset_index()
        g["_bucket"] = bucket_of(g[key], num_buckets)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby(key, sort=False)[cols].sum().reset_index()
        out = out.astype({c: np.int64 for c in cols})
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("_bucket").map_groups(final, batch_format="pyarrow")


def rolling_window_sum(
    ds,
    key: str,
    ts_col: str,
    val_col: str,
    window: int,
    id_col: Optional[str] = None,
    out_col: str = "rolling_sum",
    num_buckets: int | None = None,
):
    """Per-key ordered rolling sum over the last ``window`` rows
    (inclusive) — the ROWS (window-1) PRECEDING window function.  Same
    partitioning shape as ``sessionize``: co-hash on key, sort the
    group, vectorized cumsum-difference per key segment.
    """
    num_buckets = resolve_parallelism(num_buckets)
    ds = _guard_reserved(ds)
    import pyarrow as pa
    import pyarrow.compute as pc

    order_cols = [ts_col] + ([id_col] if id_col else [])
    sort_keys = [(c, "ascending") for c in [key] + order_cols]

    def tag(t: pa.Table) -> pa.Table:
        b = bucket_of(t[key].to_numpy(zero_copy_only=False), num_buckets)
        # strip any b'pandas' metadata a pandas upstream block smuggled
        # in: map_groups concats the per-group outputs, and an
        # unhashable metadata dict defeats Ray's schema dedup there
        return t.append_column("_bucket", pa.array(b)).replace_schema_metadata(
            None
        )

    def assign(group: pa.Table) -> pa.Table:
        g = group.take(pc.sort_indices(group, sort_keys=sort_keys))
        # keep the value dtype: exact for integers, float64 for floats —
        # forcing int64 would silently truncate float values
        v = g[val_col].to_numpy()
        if not np.issubdtype(v.dtype, np.integer):
            v = v.astype(np.float64)
        k = g[key].to_numpy(zero_copy_only=False)
        c = np.concatenate(([0], np.cumsum(v)))
        n = g.num_rows
        idx = np.arange(n)
        # per-key segment starts
        new_key = np.empty(n, dtype=bool)
        new_key[0:1] = True
        new_key[1:] = k[1:] != k[:-1]
        seg_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        lo = np.maximum(idx - window + 1, seg_start)
        return g.drop_columns(["_bucket"]).append_column(
            out_col, pa.array(c[idx + 1] - c[lo])
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=16384)
    return tagged.groupby("_bucket").map_groups(assign, batch_format="pyarrow")


def funnel(
    events_ds,
    stages=("signup", "click", "purchase"),
    within: Optional[_dt.timedelta] = None,
    num_buckets: Optional[int] = None,
):
    """Ordered funnel conversion per user: stage k counts only if it
    happens AT OR AFTER the user's stage-(k-1) completion time — and,
    with ``within``, no later than ``t_{k-1} + within`` (the
    conversion-window form every product-analytics funnel uses) — the
    signup -> click -> purchase primitive.

    Output one row per user who completed stage 1:
    ``(user_id, stages_completed, t1, t2, ..., tK)`` with ``t_k`` the
    earliest qualifying timestamp (NULL once the chain breaks).

    Scale shape: map-side projection drops every non-funnel event and
    every unused column, then ONE user-hash exchange co-locates each
    user's funnel events; the per-bucket fold is a K-step vectorized
    merge chain (min-ts per stage filtered by the previous stage's
    time), never a per-user Python loop.  Deterministic: min() over
    timestamps is order-free.
    """
    num_buckets = resolve_parallelism(num_buckets)
    stages = list(stages)
    if len(stages) < 2:
        raise ValueError("funnel needs >= 2 stages")

    import pyarrow as pa
    import pyarrow.compute as pc

    stage_set = pa.array(stages, pa.string())

    def project(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"], value_set=stage_set)
        t = batch.filter(keep).select(["user_id", "event_type", "ts"])
        b = pa.array(
            (t["user_id"].to_numpy(zero_copy_only=False) % num_buckets)
            .astype(np.int32)
        )
        return t.append_column("_bucket", b)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "user_id" not in df.columns:
            # typed Arrow empty (size-estimator spam rule)
            fields = [
                ("user_id", pa.int64()),
                ("stages_completed", pa.int64()),
            ] + [(f"t{k}", pa.timestamp("us"))
                 for k in range(1, len(stages) + 1)]
            return pa.table(
                {n: pa.array([], t) for n, t in fields}
            )
        cur = (
            df[df["event_type"] == stages[0]]
            .groupby("user_id", as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "t1"})
        )
        out = cur
        for k, st in enumerate(stages[1:], start=2):
            prev_col = f"t{k - 1}"
            nxt = df[df["event_type"] == st].merge(
                out[["user_id", prev_col]].dropna(subset=[prev_col]),
                on="user_id",
            )
            nxt = nxt[nxt["ts"] >= nxt[prev_col]]
            if within is not None:
                nxt = nxt[nxt["ts"] <= nxt[prev_col] + within]
            tk = (
                nxt.groupby("user_id", as_index=False)["ts"]
                .min()
                .rename(columns={"ts": f"t{k}"})
            )
            out = out.merge(tk, on="user_id", how="left")
        done = np.ones(len(out), dtype=np.int64)
        for k in range(2, len(stages) + 1):
            done += out[f"t{k}"].notna().to_numpy()
        out["stages_completed"] = done
        cols = ["user_id", "stages_completed"] + [
            f"t{k}" for k in range(1, len(stages) + 1)
        ]
        return out[cols]

    return (
        _guard_reserved(events_ds)
        .map_batches(project, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(fold, batch_format="pandas")
    )


def cohort_retention(events_ds, num_buckets: Optional[int] = None):
    """Weekly cohort-retention matrix: users bucketed by the epoch-week
    of their FIRST event (the cohort), counted once per later week of
    activity — ``(cohort_week, week_offset, n_users)``, the classic
    product-retention triangle.

    Weeks are epoch-day // 7 indices (not calendar weeks: week-start
    conventions differ across engines; the integral index is
    convention-free and mirrors 1:1 in SQL).

    Scale shape: map-side shrink to DISTINCT (user, week) partials
    (activity collapses before the wire), ONE user-hash exchange where
    each user's min week anchors its offsets, then a (cohort, offset)
    merge whose key space is weeks x offsets — tiny.  Exact integral
    counts.
    """
    num_buckets = resolve_parallelism(num_buckets)

    import pyarrow as pa

    def week_partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "week": (
                    batch["ts"].cast(pa.int64()).to_numpy()
                    // (86_400 * 1_000_000)
                )
                // 7,
            }
        ).drop_duplicates()
        df["_bucket"] = (df["user_id"].to_numpy() % num_buckets).astype(
            np.int32
        )
        return df

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "user_id" not in df.columns:
            return pd.DataFrame(
                {
                    "cohort_week": pd.Series(dtype=np.int64),
                    "week_offset": pd.Series(dtype=np.int64),
                    "n_users": pd.Series(dtype=np.int64),
                    "_bucket2": pd.Series(dtype=np.int32),
                }
            )
        df = df.drop_duplicates(["user_id", "week"])
        w0 = df.groupby("user_id")["week"].transform("min")
        out = pd.DataFrame(
            {
                "cohort_week": w0.to_numpy(np.int64),
                "week_offset": (df["week"] - w0).to_numpy(np.int64),
            }
        )
        g = out.groupby(
            ["cohort_week", "week_offset"], sort=False, as_index=False
        ).size().rename(columns={"size": "n_users"})
        g["n_users"] = g["n_users"].astype(np.int64)
        g["_bucket2"] = (
            (g["cohort_week"] * 53 + g["week_offset"]) % 16
        ).astype(np.int32)
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(
            ["cohort_week", "week_offset"], sort=False, as_index=False
        )["n_users"].sum()
        g["n_users"] = g["n_users"].astype(np.int64)
        return g[["cohort_week", "week_offset", "n_users"]]

    return (
        events_ds.map_batches(
            week_partial, batch_format="pyarrow"
        )
        .groupby("_bucket")
        .map_groups(per_user, batch_format="pandas")
        .groupby("_bucket2")
        .map_groups(merge, batch_format="pandas")
    )
