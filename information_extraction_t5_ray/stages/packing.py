"""Sequence packing — the 'concat-then-chunk' pretraining layout.

Assigns every document to a training pack: documents are laid
end-to-end in ``doc_id`` order and the token stream is cut every
``budget`` tokens; a doc belongs to the pack where it STARTS
(``pack_id = exclusive_prefix_tokens // budget``).  This is the
deterministic packing strategy used for GPT-style pretraining corpora
(concatenate, then slice fixed-length windows) — unlike greedy
bin-packing it is a pure function of the ordered token-length prefix
sum, so it is byte-stable under any partitioning and exactly
SQL-mirrorable (one window SUM + integer division).

The interesting part at scale is the ORDERED GLOBAL PREFIX SCAN —
nothing else in the repo needs one.  Three narrow stages:

1. token counts per doc (stateless vectorized map, no shuffle);
2. per-range partial sums: docs bucket by contiguous ``doc_id`` range;
   ONE row per range reaches the driver (range count is bounded by
   ``num_ranges``, not corpus size), which computes the exclusive
   per-range offsets — the classic two-phase scan (Blelloch);
3. each range group sorts locally by doc_id, local exclusive cumsum +
   broadcast range offset -> pack_id.  The shuffle carries
   (doc_id, n_tokens) only — never text.

Range partitioning assumption: ``doc_id`` is integer-ish and roughly
dense so ranges are balanced; for arbitrary ids substitute any total
order + range-partition by sampled split points (same scan shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .common import resolve_parallelism
from .textstats import TOKEN_RE


def pack_sequences(
    docs_ds,
    budget: int = 2048,
    num_ranges: int | None = None,
    max_doc_id: int | None = None,
    batch_size: int = 4096,
):
    """(doc_id, text) -> (doc_id, n_tokens, pack_id, pack_off).

    ``pack_id``: which fixed-``budget`` token window the doc starts in;
    ``pack_off``: the doc's token offset within that window.  Both are
    integer arithmetic over the global ordered prefix sum — bit-exact
    vs the SQL window mirror.
    """
    import ray

    num_ranges = resolve_parallelism(num_ranges)

    def counts(batch: pa.Table) -> pa.Table:
        n = pc.cast(
            pc.count_substring_regex(batch["text"], TOKEN_RE), pa.int64()
        )
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": n})

    # one pass over the text; everything after runs on the narrow
    # (doc_id, n_tokens) table (materialized: consumed by the max probe,
    # the range sums, and the scan)
    slim = docs_ds.map_batches(
        counts, batch_format="pyarrow", batch_size=batch_size
    ).materialize()
    if max_doc_id is None:
        probed = slim.max("doc_id")
        if probed is None:
            raise ValueError("pack_sequences: empty input dataset")
        max_doc_id = int(probed)
    span = max_doc_id + 1
    width = -(-span // num_ranges)  # ceil

    def add_range(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch["doc_id"], pa.int64())
        top = pc.max(ids).as_py()
        if top is not None and top > max_doc_id:
            raise ValueError(
                f"pack_sequences: doc_id {top} exceeds max_doc_id="
                f"{max_doc_id} — stale caller-supplied bound"
            )
        rng = pc.cast(pc.divide(ids, width), pa.int32())
        return batch.append_column("rng", rng)

    counted = slim.map_batches(add_range, batch_format="pyarrow")

    # phase 1: one (range, token_sum) row per occupied range -> driver
    def range_sums(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "rng": batch["rng"].to_numpy(),
                "s": batch["n_tokens"].to_numpy(),
            }
        )
        return df.groupby("rng", sort=False)["s"].sum().reset_index()

    partials = (
        counted.map_batches(range_sums, batch_format="pyarrow")
        .to_pandas()
        .groupby("rng")["s"]
        .sum()
    )
    sums = np.zeros(num_ranges + 1, dtype=np.int64)
    sums[partials.index.to_numpy() + 1] = partials.to_numpy()
    offsets_ref = ray.put(np.cumsum(sums))  # exclusive offset per range

    # phase 2: local ordered scan per co-located range group
    def scan(df: pd.DataFrame) -> pd.DataFrame:
        offsets = ray.get(offsets_ref)
        df = df.sort_values("doc_id", kind="stable")
        n = df["n_tokens"].to_numpy(np.int64)
        start = (
            offsets[int(df["rng"].iloc[0])] + np.cumsum(n) - n
        )  # exclusive prefix
        out = df[["doc_id", "n_tokens"]].copy()
        out["pack_id"] = start // budget
        out["pack_off"] = start % budget
        return out

    return counted.groupby("rng").map_groups(scan, batch_format="pandas")


def pack_texts(docs_ds, budget: int = 2048, num_ranges: int | None = None,
               batch_size: int = 4096):
    """Materialize the packed TRAINING SEQUENCES themselves: the global
    doc_id-ordered token stream cut every ``budget`` tokens, each pack
    assembled from the (possibly partial) documents that overlap it —
    the export half of :func:`pack_sequences` (which only labels where
    each doc STARTS).

    (doc_id, text) -> (pack_id, n_tokens, text): every pack except the
    last carries exactly ``budget`` tokens; documents spanning a pack
    boundary are split at the token level.

    Shape: the prefix scan runs once (shared helper), the doc stream
    re-joins its global offset by doc_id (hash join — the only
    text-bearing exchange), each doc emits one piece row per overlapped
    pack (≤ n_tokens/budget + 1 rows), and one groupby assembles packs
    ordered by global position.  No task ever holds more than a pack's
    worth of final text plus its input block.
    """
    import ray  # noqa: F401  (parity with pack_sequences' env needs)

    from .joins import hash_join

    assign = pack_sequences(
        docs_ds, budget=budget, num_ranges=num_ranges, batch_size=batch_size
    )
    joined = hash_join(docs_ds, assign, on="doc_id")

    def pieces(batch: pa.Table) -> pd.DataFrame:
        # tokenize with the SAME kernel that produced the offsets
        # (textstats._exploded_tokens splits on the RE2 whitespace class
        # behind TOKEN_RE) — Python str.split() disagrees on \xa0/\x0b
        # and would write tokens onto positions budgeted for other docs
        from .textstats import _exploded_tokens

        d, toks = _exploded_tokens(batch)
        toks_np = toks.to_pandas().to_numpy()
        per_row = np.bincount(d, minlength=len(batch))
        bounds = np.concatenate(([0], np.cumsum(per_row)))
        strt = (
            batch["pack_id"].to_numpy() * budget
            + batch["pack_off"].to_numpy()
        )
        out_p, out_pos, out_piece, out_n = [], [], [], []
        for i, s in enumerate(strt.tolist()):
            w = toks_np[bounds[i] : bounds[i + 1]]
            n = len(w)
            if n == 0:
                continue
            p0, p1 = s // budget, (s + n - 1) // budget
            for p in range(p0, p1 + 1):
                a = max(0, p * budget - s)
                b = min(n, (p + 1) * budget - s)
                out_p.append(p)
                out_pos.append(s + a)
                out_piece.append(" ".join(w[a:b]))
                out_n.append(b - a)
        return pd.DataFrame(
            {
                "pack_id": pd.Series(out_p, dtype=np.int64),
                "pos": pd.Series(out_pos, dtype=np.int64),
                "piece": pd.Series(out_piece, dtype=str),
                "n": pd.Series(out_n, dtype=np.int64),
            }
        )

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["pack_id", "pos"], kind="stable")
        g = df.groupby("pack_id", sort=False)
        out = g.agg(n_tokens=("n", "sum"), text=("piece", " ".join))
        out["n_tokens"] = out["n_tokens"].astype(np.int64)
        return out.reset_index()[["pack_id", "n_tokens", "text"]]

    # bucket PACKS, not raw pack_ids: map_groups invokes its UDF once
    # per group, so grouping on pack_id directly would pay one Python
    # call per output pack (unbounded at corpus scale); the bucket
    # co-locates whole packs and assemble runs one pandas groupby per
    # bucket.  Width resolved ONCE here on the driver — resolving
    # inside the task would let an elastic cluster hand two batches of
    # the same pack different widths and split the pack across buckets.
    from .common import resolve_parallelism

    nb = resolve_parallelism(None)

    def add_pbucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pbucket"] = (df["pack_id"] % nb).astype(np.int32)
        return df

    piece_rows = joined.map_batches(
        pieces, batch_format="pyarrow", batch_size=batch_size
    ).map_batches(add_pbucket, batch_format="pandas")
    return (
        piece_rows.groupby("_pbucket")
        .map_groups(assemble, batch_format="pandas")
    )
