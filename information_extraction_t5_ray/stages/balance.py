"""Negative/positive balancing (reference ``utils/balance_data.py``).

The reference gathers the whole R3 example list into driver memory,
outer-joins positive counts onto negatives per ``(document_id,
example_id)`` and resamples negatives with replacement
(``random_state=42``).  Here the same semantics run distributed:

* positives stream through untouched (the reference concatenates
  ``df_pos`` unchanged, balance_data.py:85-89);
* negatives shuffle once on ``hash(key) % num_buckets`` and each bucket
  resamples per key — a key's rows are co-located, so no second pass;
* keys with no positive example are dropped (the reference's
  ``merge(how='outer')`` + ``dropna``, balance_data.py:65-70);
* sampling with replacement picks index ``(key_hash + i*A) % n_neg`` into
  the key's negatives sorted by a stable order column — a pure function
  of the key, so the result is identical under any partitioning AND
  expressible in ANSI SQL for the DuckDB oracle (the reference's global
  ``random_state=42`` cannot be reproduced distributively).

``A`` is an odd multiplier so consecutive draws walk different residues.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
from .common import arrowed, bucket_of, resolve_parallelism

LCG_MULT = 1103515245
LCG_INC = 12345
DRAW_STEP = 40503


def pick_indices(key_hash: int, n_pos: int, n_neg: int, ratio: int) -> np.ndarray:
    """Deterministic with-replacement draw: ``n_pos * ratio`` indices in
    ``[0, n_neg)`` — pure in (key_hash, counts)."""
    i = np.arange(n_pos * ratio, dtype=np.int64)
    return (key_hash * LCG_MULT + LCG_INC + i * DRAW_STEP) % n_neg


def balance_stage(
    ds,
    key_cols: List[str],
    neg_col: str = "is_negative",
    order_cols: Optional[List[str]] = None,
    negative_ratio: int = 1,
    num_buckets: int | None = None,
    key_hash_col: Optional[str] = None,
):
    """Dataset -> balanced Dataset (all positives + per-key resampled
    negatives).

    ``key_hash_col``: optional integer column to use as the sampling
    hash; defaults to crc32 over the concatenated key columns.
    ``order_cols``: stable within-key ordering of negatives before
    indexing (required for determinism).
    """
    num_buckets = resolve_parallelism(num_buckets)
    order_cols = order_cols or []

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        if key_hash_col:
            h = df[key_hash_col].to_numpy(np.int64)
        else:
            import zlib

            # crc32 over the (few) distinct keys only, scattered back —
            # keys repeat heavily (that is the point of balancing), so
            # factorize-then-hash-uniques removes the per-row Python
            # loop (same pattern as triples.project_triples_batch)
            joined = df[key_cols].astype(str).agg("|".join, axis=1)
            codes, uniques = pd.factorize(joined, sort=False)
            uhash = np.fromiter(
                (zlib.crc32(u.encode()) for u in uniques),
                np.int64,
                count=len(uniques),
            )
            h = uhash[codes]
        df = df.assign(_key_hash=h, _bucket=(h % num_buckets).astype(np.int32))
        return df

    tagged = ds.map_batches(arrowed(tag), batch_format="pandas")

    def resample(df: pd.DataFrame) -> pd.DataFrame:
        neg_mask = df[neg_col].to_numpy(bool)
        pos = df[~neg_mask]
        # negatives, key-major with the stable within-key order
        neg = df[neg_mask].sort_values(
            key_cols + order_cols, kind="stable", ignore_index=True
        )
        if len(neg) and len(pos):
            n_pos_by_key = (
                pos.groupby(key_cols, sort=False).size().rename("_n_pos")
            )
            meta = (
                neg.groupby(key_cols, sort=False)
                .agg(_n_neg=("_key_hash", "size"), _h=("_key_hash", "first"))
                .join(n_pos_by_key)
                .fillna({"_n_pos": 0})
            )
            # vectorized per-key LCG draw (pick_indices across all keys):
            # each key contributes n_pos*ratio picks into its own block of
            # the key-major negative frame
            n_draws = (meta["_n_pos"].to_numpy(np.int64) * negative_ratio)
            n_negs = meta["_n_neg"].to_numpy(np.int64)
            starts = np.concatenate([[0], np.cumsum(n_negs)])[:-1]
            hashes = meta["_h"].to_numpy(np.int64)
            total = int(n_draws.sum())
            rep = np.repeat(np.arange(len(meta)), n_draws)
            # i = position within the key's draw sequence
            i = np.arange(total) - np.repeat(
                np.concatenate([[0], np.cumsum(n_draws)])[:-1], n_draws
            )
            picks = (
                hashes[rep] * LCG_MULT + LCG_INC + i * DRAW_STEP
            ) % n_negs[rep] + starts[rep]
            sampled = neg.iloc[picks]
        else:
            sampled = neg.iloc[:0]
        out = pd.concat([pos, sampled], ignore_index=True)
        return out.drop(columns=["_key_hash", "_bucket"])

    return tagged.groupby("_bucket").map_groups(arrowed(resample), batch_format="pandas")


def count_pos_neg_stage(ds, key_cols: List[str], neg_col: str = "is_negative",
                        num_buckets: int | None = None):
    """Per-key (n_pos, n_neg) counts (reference count_pos_neg,
    balance_data.py:8-27) as a two-phase partial aggregate."""

    num_buckets = resolve_parallelism(num_buckets)
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_neg=df[neg_col].astype(np.int64))
        g = (
            df.groupby(key_cols, sort=False)
            .agg(n_neg=("_neg", "sum"), n_all=("_neg", "size"))
            .reset_index()
        )
        g["_bucket"] = bucket_of(
            g[key_cols].astype(str).agg("|".join, axis=1), num_buckets
        )
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(key_cols, sort=False)
            .agg(n_neg=("n_neg", "sum"), n_all=("n_all", "sum"))
            .reset_index()
        )
        g["n_pos"] = g["n_all"] - g["n_neg"]
        return g[key_cols + ["n_pos", "n_neg"]]

    partials = ds.map_batches(arrowed(partial), batch_format="pandas", batch_size=16384)
    return partials.groupby("_bucket").map_groups(arrowed(final), batch_format="pandas")
