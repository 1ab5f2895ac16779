"""Deterministic sampling operators.

``stratified_sample`` — per-stratum sampling fractions via a pure key
hash (the LCG used by ``hash_split``), so the sample is (a) exactly
reproducible under any partitioning or re-run, (b) a superset/subset
across fraction changes (raising a stratum's fraction only ADDS rows),
and (c) expressible in SQL for oracle checks.  The training-data move
behind language/source rebalancing of a crawl: no shuffle, no
coordination — membership is a pure function of the row key.

The reference's sampling (``train_test_split(random_state=42)``,
per-key negative resampling ``utils/balance_data.py:74-80``) relies on
a global seed; a key-hash rule is the partitioning-stable equivalent
(SURVEY.md §7.4 "per-row randomness under parallelism").
"""

from __future__ import annotations

from typing import Dict, Union

import numpy as np
import pandas as pd
import pyarrow as pa

# hash_split's LCG — glibc constants shared with stages/balance.py (one
# source of truth; the SQL oracles hardcode the same literals)
from .balance import LCG_INC as _LCG_C  # noqa: E402
from .common import arrowed, bucket_of, resolve_parallelism  # noqa: E402
from .balance import LCG_MULT as _LCG_A  # noqa: E402

_LCG_M = 2147483648
_DENOM = 10000


def lcg_bucket(keys: np.ndarray, denom: int = _DENOM) -> np.ndarray:
    # uint64 arithmetic: 2^31 divides 2^64, so the modular wrap leaves
    # the % 2^31 residue EXACT for any key magnitude (int64 would also
    # wrap consistently, but uint64 makes the intent explicit; note the
    # SQL oracle's int64 multiply errors past ~8.4e9 ids — cap oracle
    # checks to that range)
    k = keys.astype(np.uint64)
    return (
        ((k * np.uint64(_LCG_A) + np.uint64(_LCG_C)) % np.uint64(_LCG_M))
        % np.uint64(denom)
    ).astype(np.int64)


def stratified_sample(
    ds,
    strata_col: str,
    fractions: Union[Dict[str, float], float],
    key_col: str,
    default_fraction: float = 0.0,
):
    """Keep each row iff ``lcg(key) % 10000 < fraction(stratum) * 10000``.

    ``fractions``: per-stratum keep fraction (or one float for all);
    strata absent from the dict fall back to ``default_fraction``.
    Fractions are quantized to 1/10000.
    """
    if isinstance(fractions, (int, float)):
        table = {}
        default_fraction = float(fractions)
    else:
        table = {k: float(v) for k, v in fractions.items()}
    thresholds = {k: int(round(v * _DENOM)) for k, v in table.items()}
    default_thr = int(round(default_fraction * _DENOM))

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy()
        b = lcg_bucket(keys)
        strata = batch[strata_col].to_pylist()
        thr = np.fromiter(
            (thresholds.get(s, default_thr) for s in strata),
            np.int64,
            count=len(strata),
        )
        return batch.filter(pa.array(b < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def grouped_sample_k(
    ds,
    group_col: str,
    key_col: str,
    k: int,
    num_buckets: int | None = None,
):
    """Deterministic k-per-group sample: each group keeps the k rows
    with the smallest (lcg(key), key) rank — a seeded shuffle expressed
    as a pure hash so the sample is identical under any partitioning
    and re-run (the reference's seeded per-key resampling,
    ``utils/balance_data.py:74-80``, without global-seed fragility).

    Two-phase top-k: each batch keeps at most k rows per group before
    the shuffle, so the exchange carries O(groups x k x batches) rows.
    """

    num_buckets = resolve_parallelism(num_buckets)
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.assign(_rank=lcg_bucket(df[key_col].to_numpy(), denom=_LCG_M))
        out = out.sort_values(["_rank", key_col], kind="stable")
        out = out.groupby(group_col, sort=False).head(k)
        return out.assign(_bucket=bucket_of(out[group_col], num_buckets))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(["_rank", key_col], kind="stable")
        out = out.groupby(group_col, sort=False).head(k)
        return out.drop(columns=["_rank", "_bucket"])

    partials = ds.map_batches(arrowed(partial), batch_format="pandas")
    return partials.groupby("_bucket").map_groups(arrowed(final), batch_format="pandas")


def assign_shuffle_shards(
    ds,
    key_col: str,
    num_shards: int = 16,
    shard_col: str = "shard",
):
    """Deterministic global shuffle for training-data export: shard =
    lcg(key) % num_shards, within-shard order = (lcg(key), key).

    A seeded ``random_shuffle`` is partition-dependent and needs a full
    exchange; a key-hash shard assignment is reproducible byte-for-byte
    under any partitioning, resumable per shard, and SQL-checkable.
    Writing with ``partition_cols=[shard_col]`` yields the sharded
    layout trainers consume round-robin.
    """

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy()
        r = lcg_bucket(keys, denom=_LCG_M)
        batch = batch.append_column(
            "_shuffle_rank", pa.array(r, pa.int64())
        )
        # shard from the HIGH bits: an affine LCG's value mod a
        # power-of-two num_shards collapses to (a*key + c) mod shards —
        # a purely periodic function of the key that can correlate with
        # structured id strides.  (r * shards) >> 31 uses the
        # well-mixed top of the 31-bit state instead (and stays a
        # single BIGINT expression in the SQL mirror).
        shard = ((r * num_shards) // _LCG_M).astype(np.int32)
        return batch.append_column(shard_col, pa.array(shard))

    return ds.map_batches(tag, batch_format="pyarrow")


def export_shuffled(
    ds,
    key_col: str,
    out_dir: str,
    num_shards: int = 16,
    min_rows_per_file: int = 100_000,
):
    """Materialize a deterministically shuffled, sharded training-data
    layout: one Parquet directory per shard, rows ordered by the
    shuffle rank within each file."""
    tagged = assign_shuffle_shards(ds, key_col, num_shards)
    tagged.sort(["_shuffle_rank", key_col]).drop_columns(
        ["_shuffle_rank"]
    ).write_parquet(
        out_dir, partition_cols=["shard"], min_rows_per_file=min_rows_per_file
    )
    return out_dir


def data_mixture(
    docs_ds,
    tier_of_source,
    weights: dict,
    token_re: str = r"\S+",
    batch_size: int = 4096,
):
    """Token-budget data mixing (the pretraining mixture step): keep a
    deterministic per-tier document sample so the SURVIVING token mass
    follows the target ``weights`` distribution, scaled to the largest
    total no tier can exceed (no tier oversamples: the binding tier
    keeps ~everything, the rest downsample).

    Math (all integer, mirrored 1:1 in SQL): with B = sum(weights),
    ``cap_t = tok_t * B // w_t`` is the max total output if t binds,
    ``T = min(cap_t)``, and the per-tier keep rate in basis points is
    ``r_t = T * w_t * 10000 // (B * tok_t)`` — computed DRIVER-side
    with unbounded Python ints (no int64 overflow at any corpus size).
    A doc survives iff ``lcg(doc_id) % 10000 < r_t`` — the same pure
    key hash as ``stratified_sample``, so the pick is partitioning-
    stable and reproducible.

    Scale shape: one pass folds the text to a narrow (doc_id, source,
    tier, n_tokens) table (materialized — consumed by the tiny tier-sum
    aggregate and the filter); the exchange for the sums carries one
    row per (tier, batch).  ``tier_of_source`` maps the source column
    to a tier id IN-BATCH (vectorized caller-supplied fn).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    B = sum(weights.values())

    def slim(batch: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(batch["text"], token_re), pa.int64()
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "tier": pa.array(tier_of_source(batch["source"])),
                "n_tokens": n,
            }
        )

    slimmed = docs_ds.map_batches(
        slim, batch_format="pyarrow", batch_size=batch_size
    ).materialize()

    def tier_sums(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "tier": batch["tier"].to_numpy(),
                "n": batch["n_tokens"].to_numpy(),
            }
        )
        return df.groupby("tier", sort=False)["n"].sum().reset_index()

    partials = (
        slimmed.map_batches(tier_sums, batch_format="pyarrow")
        .to_pandas()
        .groupby("tier")["n"]
        .sum()
    )
    toks = {int(t): int(v) for t, v in partials.items()}
    if not any(t in toks for t in weights):
        raise ValueError(
            f"no corpus tier matches weights keys {sorted(weights)}; "
            f"tiers present: {sorted(toks)}"
        )
    T = min(toks[t] * B // w for t, w in weights.items() if t in toks)
    rates = {
        t: T * w * 10000 // (B * toks[t])
        for t, w in weights.items()
        if t in toks
    }
    rates_ref = ray.put(rates)

    def keep(batch: pa.Table) -> pa.Table:
        r = ray.get(rates_ref)
        tiers = batch["tier"].to_numpy()
        # tiers absent from `weights` (new source scheme, negative ids)
        # sample at rate 0 — dropped, never mis-indexed
        hi = max([int(tiers.max(initial=0))] + list(r.keys()))
        lut = np.zeros(hi + 2, dtype=np.int64)
        for t, v in r.items():
            if 0 <= t <= hi:
                lut[t] = v
        in_range = (tiers >= 0) & (tiers <= hi)
        rate = np.where(in_range, lut[np.clip(tiers, 0, hi)], 0)
        h = lcg_bucket(batch["doc_id"].to_numpy(), denom=10000)
        return batch.filter(pa.array(h < rate)).select(
            ["doc_id", "source", "tier", "n_tokens"]
        )

    return slimmed.map_batches(
        keep, batch_format="pyarrow", batch_size=batch_size
    )
