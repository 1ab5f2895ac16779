"""Deduplication operators for web-scale corpora.

Four families, each expressed Ray-Data-first (the shuffle key and skew
mitigation are the design):

* exact_dedup            — content-hash groupby, keep first (min doc_id);
                           two-phase (per-batch partial -> bucketed final)
                           so the shuffle moves one row per (batch, key),
                           not every input row.
* jaccard_pairs          — EXACT word-k-gram Jaccard duplicate pairs via
                           a distributed shingle inverted index:
                           doc -> distinct shingle rows (carrying the
                           doc's set size) -> bucket-groupby on shingle
                           -> emit candidate pairs -> bucket-groupby on
                           pair -> integral threshold test
                           (3*inter >= |A|+|B|  <=>  J >= 0.5, no float
                           boundary).  A df cap drops stop-shingles
                           (bounded C(df,2) blowup per shingle — the
                           classic skew guard for inverted-index joins).
* minhash_lsh_pairs      — MinHash signatures (128 perms, universal
                           hashing) + banded LSH; candidates verified by
                           signature-estimated Jaccard.  Approximate by
                           construction (tested for recall/precision vs
                           jaccard_pairs, not oracle-matched).
* simhash_pairs          — 64-bit SimHash + 16-bit band partitioning for
                           hamming radius <= 3; verification is EXACT
                           popcount inside the band group (fingerprints
                           ride along with the band rows — no broadcast,
                           no second join).

* apply_dedup            — pairs -> kept corpus (keep-first) via a
                           distributed LEFT ANTI hash join.

Cap sensitivity (measured): on a duplicate-heavy corpus the fixed
``max_df`` stop-shingle cap is the plain exact path's failure mode — at
16x corpus duplication EVERY shingle's df exceeds 64 and jaccard_pairs
returns zero pairs, while minhash_lsh_pairs (band df cap 256, collision
counting) recovers every group.  ``jaccard_pairs_verified`` removes the
failure mode entirely: stop-set accounting brackets each candidate's
true intersection, an exact-verify join settles the uncertain sliver,
and a heavy-doc all-pairs pass covers pairs that share only stop
shingles — equal to TRUE uncapped Jaccard by construction (differential
and oracle tested).  MinHash remains the cheap first screen at web
scale; the verified path is the exact tool that stays exact.

Semantics model the reference's dedup moves (first-occurrence keep:
``/root/reference/information_extraction_t5/features/postprocess.py:277-284``
grouped head(1); key-set dedup ``:196-199``) lifted to corpus scale.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .common import arrowed, bucket_of, maybe_scatter, resolve_parallelism
from .textstats import shingle_hashes

# ---------------------------------------------------------------------------
# vectorized within-group pair emission (shared by jaccard / minhash / simhash)
# ---------------------------------------------------------------------------


def _group_pair_indices(keys: np.ndarray, max_df: int):
    """All within-group (unordered) pairs of rows sharing a key.

    Returns ``(order, left, right)`` where ``order`` is the stable
    key-sort permutation and ``left``/``right`` index into the SORTED
    rows.  Groups of size 2 — the overwhelming majority in a dedup
    inverted index — are emitted in one vectorized step; only the rare
    groups of size > 2 loop (each bounded by ``max_df``).  Groups with
    more than ``max_df`` members are dropped entirely (stop-key skew
    guard: C(df, 2) pair blowup).
    """
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    if len(ks) == 0:
        z = np.empty(0, np.int64)
        return order, z, z
    change = np.flatnonzero(ks[1:] != ks[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(ks)]))
    sizes = ends - starts
    li = [np.empty(0, np.int64)]
    ri = [np.empty(0, np.int64)]
    # the cap applies to size-2 groups too: with max_df < 2 the
    # documented 'groups over max_df are dropped entirely' contract
    # (and the stop-shingle classification the verified path relies
    # on) must see NO pairs at all
    s2 = starts[sizes == 2] if max_df >= 2 else starts[:0]
    li.append(s2)
    ri.append(s2 + 1)
    # one vectorized emission per DISTINCT size class (<= max_df - 2 of
    # them), not per group: triu indices tile across all groups of that
    # size via broadcasting — the per-group Python loop was the pair
    # stage's hottest line on duplicate-heavy corpora
    big = (sizes > 2) & (sizes <= max_df)
    for s in np.unique(sizes[big]):
        st = starts[big & (sizes == s)]
        iu, ju = np.triu_indices(int(s), k=1)
        li.append((st[:, None] + iu[None, :]).ravel())
        ri.append((st[:, None] + ju[None, :]).ravel())
    return order, np.concatenate(li), np.concatenate(ri)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; numpy<2 has no bitwise_count)."""
    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------




def exact_dedup(docs_ds, num_buckets: int | None = None, batch_size: int = 4096):
    """(doc_id, text) -> (doc_id=min per content group, n_dups).

    Phase 1 folds each batch to one row per content key; phase 2
    shuffles only those partials, bucketed by key hash.
    """

    num_buckets = resolve_parallelism(num_buckets)
    def partial(batch: pa.Table) -> pd.DataFrame:
        keys = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        df = pd.DataFrame({"key": keys, "doc_id": batch["doc_id"].to_numpy()})
        g = df.groupby("key", sort=False).agg(
            doc_id=("doc_id", "min"), n_dups=("doc_id", "size")
        ).reset_index()
        g["bucket"] = bucket_of(g["key"], num_buckets)
        return g

    def final(bucket_df: pd.DataFrame) -> pd.DataFrame:
        out = (
            bucket_df.groupby("key", sort=False)
            .agg(doc_id=("doc_id", "min"), n_dups=("n_dups", "sum"))
            .reset_index()[["doc_id", "n_dups"]]
        )
        return out

    partials = docs_ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
    return partials.groupby("bucket").map_groups(final, batch_format="pandas")


def exact_dedup_keep(docs_ds, num_buckets: int | None = None, batch_size: int = 4096):
    """(doc_id, text) -> the min-doc_id representative ROW per exact
    content group: (doc_id, text, n_exact_dups).

    Same two-phase shape as :func:`exact_dedup`, but the survivor keeps
    its text so downstream stages (near-dedup, chunking) can consume the
    exact-deduped corpus directly — no join back against the input.  The
    shuffle still carries at most one row per (batch, content-key): the
    text rides on the folded representative only, and within a content
    group every text is byte-identical by construction, so any
    representative's payload is THE payload.
    """

    num_buckets = resolve_parallelism(num_buckets)

    def partial(batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pylist()
        keys = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
        df = pd.DataFrame(
            {"key": keys, "doc_id": batch["doc_id"].to_numpy(), "text": texts}
        )
        df = df.sort_values("doc_id", kind="stable")
        g = df.groupby("key", sort=False, as_index=False).agg(
            doc_id=("doc_id", "first"),
            text=("text", "first"),
            n_exact_dups=("doc_id", "size"),
        )
        g["bucket"] = bucket_of(g["key"], num_buckets)
        return g

    def final(bucket_df: pd.DataFrame) -> pd.DataFrame:
        bucket_df = bucket_df.sort_values("doc_id", kind="stable")
        out = bucket_df.groupby("key", sort=False, as_index=False).agg(
            doc_id=("doc_id", "first"),
            text=("text", "first"),
            n_exact_dups=("n_exact_dups", "sum"),
        )
        return out[["doc_id", "text", "n_exact_dups"]]

    partials = docs_ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
    return partials.groupby("bucket").map_groups(final, batch_format="pandas")


# ---------------------------------------------------------------------------
# corpus-level line dedup (CCNet-style duplicated-paragraph removal)
# ---------------------------------------------------------------------------


def _explode_lines(batch: pa.Table, num_buckets: int) -> pa.Table:
    """doc -> one row per non-empty line: (bucket, doc_id, line_no, line).
    Fully Arrow-vectorized (split_pattern + list_parent_indices); the
    bucket keys line CONTENT so the keep-first groupby co-locates every
    occurrence of a line."""
    split = pc.split_pattern(batch["text"], "\n")
    counts = pc.list_value_length(split).to_numpy().astype(np.int64)
    flat = pc.list_flatten(split)
    doc_ids = pc.take(batch["doc_id"], pc.list_parent_indices(split))
    total = int(counts.sum())
    line_no = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    t = pa.table(
        {"doc_id": doc_ids, "line_no": pa.array(line_no), "line": flat}
    )
    t = t.filter(pc.not_equal(t["line"], ""))
    buckets = bucket_of(t["line"].to_pandas(), num_buckets)
    return t.append_column("bucket", pa.array(buckets))


def _reassemble_docs(df: pd.DataFrame) -> pd.DataFrame:
    """Surviving (doc_id, line_no, line) rows -> (doc_id, n_lines, text)
    — the shared reassembly tail of line_dedup and boilerplate_strip."""
    df = df.sort_values(["doc_id", "line_no"], kind="stable")
    g = df.groupby("doc_id", sort=False)
    out = g.agg(n_lines=("line", "size"), text=("line", "\n".join))
    return out.reset_index()[["doc_id", "n_lines", "text"]]


def line_dedup(docs_ds, num_buckets: int | None = None, batch_size: int = 1024):
    """Corpus-level duplicated-line removal (the CCNet/C4 paragraph-dedup
    analog): every non-empty line keeps only its FIRST occurrence across
    the whole corpus — first = min (doc_id, line_no) — and each doc is
    reassembled from its surviving lines.

    (doc_id, text) -> (doc_id, n_lines, text) for docs with >= 1
    surviving line.  Two narrow shuffles: lines bucketed by content
    (keep-first), survivors bucketed by doc (reassembly).  Scale note:
    the exchange carries one row per line occurrence — no doc ever has
    to fit in one task until its own (already thinned) reassembly group.
    """

    num_buckets = resolve_parallelism(num_buckets)

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "line_no"], kind="stable")
        kept = df.drop_duplicates("line", keep="first")
        out = kept[["doc_id", "line_no", "line"]].copy()
        out["dbucket"] = (out["doc_id"].to_numpy() % num_buckets).astype(np.int32)
        return out

    lines = docs_ds.map_batches(
        lambda b: _explode_lines(b, num_buckets),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    kept = lines.groupby("bucket").map_groups(keep_first, batch_format="pandas")
    return kept.groupby("dbucket").map_groups(
        _reassemble_docs, batch_format="pandas"
    )


def boilerplate_strip(docs_ds, max_df: int = 2, num_buckets: int | None = None,
                      batch_size: int = 1024):
    """C4-style boilerplate removal: a non-empty line appearing in MORE
    than ``max_df`` documents (navigation chrome, cookie banners,
    'citation needed') is removed from EVERY document — unlike
    :func:`line_dedup`, which keeps the first occurrence.

    (doc_id, text) -> (doc_id, n_lines, text) for docs with >= 1
    surviving line.  Same two narrow shuffles as line_dedup (lines
    bucketed by content for the distinct-doc count, survivors bucketed
    by doc for reassembly); the exchange carries one row per line
    occurrence, never whole docs."""
    num_buckets = resolve_parallelism(num_buckets)

    def df_filter(df: pd.DataFrame) -> pd.DataFrame:
        # document frequency = DISTINCT docs containing the line
        dfreq = df.groupby("line", sort=False)["doc_id"].nunique()
        keep = df[df["line"].map(dfreq) <= max_df]
        out = keep[["doc_id", "line_no", "line"]].copy()
        out["dbucket"] = (out["doc_id"].to_numpy() % num_buckets).astype(np.int32)
        return out

    lines = docs_ds.map_batches(
        lambda b: _explode_lines(b, num_buckets),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    kept = lines.groupby("bucket").map_groups(df_filter, batch_format="pandas")
    return kept.groupby("dbucket").map_groups(
        _reassemble_docs, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap against a broadcast eval set)
# ---------------------------------------------------------------------------


def bench_ngram_index(bench_docs_ds, n: int = 8):
    """Build the broadcast contamination index from the (small) benchmark
    side: (sorted uint64 n-gram-hash array, frozenset of the literal
    n-gram strings).  The (hash, gram) pairs are computed batch-wide
    with the vectorized :func:`textstats.batch_word_ngrams` and folded
    to per-batch distinct rows distributedly; only the deduplicated
    small side reaches the driver — the same bounded-small-side regime
    as the ANN query matrix."""
    from .textstats import batch_word_ngrams

    def batch_grams(batch: pa.Table):
        _, h, g = batch_word_ngrams(batch, n)
        df = pd.DataFrame({"g": g.to_pandas().to_numpy(), "h": h})
        df = df.drop_duplicates("g")
        if df.empty:
            # empty ARROW block, not an empty pandas object column —
            # Ray 2.49's pandas size estimator logs 'Error calculating
            # size ... vectorize on size 0' per empty object column
            return pa.table(
                {"g": pa.array([], pa.string()),
                 "h": pa.array([], pa.uint64())}
            )
        return df

    grams: set = set()
    hashes_parts = []
    for b in bench_docs_ds.map_batches(
        arrowed(batch_grams), batch_format="pyarrow"
    ).iter_batches(batch_format="pandas"):
        grams.update(b["g"])
        hashes_parts.append(b["h"].to_numpy(np.uint64))
    hashes = (
        np.unique(np.concatenate(hashes_parts))
        if hashes_parts
        else np.empty(0, np.uint64)
    )
    return hashes, frozenset(grams)


def contamination_flags(docs_ds, index_ref, n: int = 8, batch_size: int = 1024):
    """(doc_id, text) -> (doc_id, contaminated) — 1 iff the doc shares a
    word n-gram with the broadcast benchmark index (GPT-3/PaLM-style
    eval-set decontamination).

    Hot path is batch-wide vectorized (:func:`textstats
    .batch_word_ngrams`): one ``np.isin`` of every gram hash in the
    batch against the broadcast sorted hash array; ONLY the hash-hit
    grams run the exact string-membership verify, so correctness does
    not rest on the 64-bit hash being collision-free and the verify
    cost is proportional to true contamination, not corpus size.
    ``index_ref`` is a ``ray.put`` handle — shipped once per worker,
    not per batch."""
    import ray

    from .textstats import batch_word_ngrams

    def flags(batch: pa.Table) -> pa.Table:
        hashes, grams = ray.get(index_ref)
        out = np.zeros(len(batch), dtype=np.int64)
        gd, h, g = batch_word_ngrams(batch, n)
        if len(h):
            hit = np.isin(h, hashes)
            if hit.any():
                gs = g.filter(pa.array(hit)).to_pylist()
                verified = np.fromiter(
                    (x in grams for x in gs), bool, count=len(gs)
                )
                out[gd[hit][verified]] = 1
        return pa.table(
            {"doc_id": batch["doc_id"], "contaminated": pa.array(out)}
        )

    return docs_ds.map_batches(
        flags, batch_format="pyarrow", batch_size=batch_size
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard via shingle inverted index
# ---------------------------------------------------------------------------


def _shingle_rows(batch: pa.Table, k: int, num_buckets: int) -> pa.Table:
    """doc -> one row per distinct shingle: (bucket, sh, doc_id, size)."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    sh_col, id_col, size_col = [], [], []
    for d, t in zip(doc_ids, texts):
        sh = shingle_hashes(t, k)
        sh_col.append(sh)
        id_col.append(np.full(len(sh), d, dtype=np.int64))
        size_col.append(np.full(len(sh), len(sh), dtype=np.int32))
    sh_all = np.concatenate(sh_col) if sh_col else np.empty(0, np.uint64)
    return pa.table(
        {
            "bucket": pa.array((sh_all % num_buckets).astype(np.int32)),
            "sh": pa.array(sh_all.astype(np.int64)),
            "doc_id": pa.array(
                np.concatenate(id_col) if id_col else np.empty(0, np.int64)
            ),
            "size": pa.array(
                np.concatenate(size_col) if size_col else np.empty(0, np.int32)
            ),
        }
    )


def _emit_pairs(bucket_df: pd.DataFrame, max_df: int, num_buckets: int) -> pd.DataFrame:
    """One inverted-index bucket -> candidate pair rows with both set
    sizes attached.  Shingles with df > max_df are dropped (stop-shingle
    skew guard; the SQL oracle applies the same cap).  Pair emission is
    fully vectorized via _group_pair_indices (a Python loop over the
    tens of thousands of tiny shingle groups was this stage's wall-time)."""
    keys = bucket_df["sh"].to_numpy()
    order, li, ri = _group_pair_indices(keys, max_df)
    if li.size == 0:
        return pd.DataFrame(
            {"i": pd.Series(dtype=np.int64), "j": pd.Series(dtype=np.int64),
             "si": pd.Series(dtype=np.int32), "sj": pd.Series(dtype=np.int32),
             "inter": pd.Series(dtype=np.int64), "pbucket": pd.Series(dtype=np.int32)}
        )
    ids = bucket_df["doc_id"].to_numpy()[order]
    szs = bucket_df["size"].to_numpy()[order]
    a, b = ids[li], ids[ri]
    sa, sb = szs[li], szs[ri]
    swap = a > b
    df = pd.DataFrame(
        {
            "i": np.where(swap, b, a),
            "j": np.where(swap, a, b),
            "si": np.where(swap, sb, sa),
            "sj": np.where(swap, sa, sb),
        }
    )
    # partial pre-aggregation before the pair shuffle
    g = df.groupby(["i", "j"], sort=False).agg(
        si=("si", "first"), sj=("sj", "first"), inter=("si", "size")
    ).reset_index()
    g["pbucket"] = ((g["i"] * 1000003 + g["j"]) % num_buckets).astype(np.int32)
    return g


def jaccard_pairs(
    docs_ds,
    k: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    max_df: int = 64,
    num_buckets: int | None = None,
    batch_size: int = 512,
    parallelism=None,
    max_df_frac: float | None = None,
):
    """Pairs (i < j) with word-k-gram Jaccard >= num/den, exact.

    The threshold test is kept integral:
        inter/(si+sj-inter) >= n/d  <=>  (n+d)*inter >= n*(si+sj).

    ``batch_size`` doubles as the sort width knob: shingling explodes
    each doc ~50-100x, and the pair-emit reduce width follows the
    shingle map's OUTPUT block count, so smaller input batches both
    bound the exploded block size and widen the sort (measured at
    sf0.1/32cpu: 512 runs 2x faster than 2048 end-to-end and beats an
    explicit re-scatter, which pays a full extra exchange —
    ``parallelism``/:func:`maybe_scatter` remains for narrow inputs).

    ``max_df_frac``: opt-in CORPUS-RELATIVE stop-shingle cap —
    ``max_df = max(max_df, ceil(frac * n_docs))`` via one extra count
    pass.  The fixed default cap's documented failure mode is a
    duplicate-heavy corpus where EVERY shingle's df exceeds it (16x
    duplication zeroed recall at cap 64); a fraction scales the cap
    with the corpus so uniform duplication can't starve the index.
    The cap remains a recall/cost dial — :func:`jaccard_pairs_verified`
    is the tool that stays exact under ANY cap.
    """

    num_buckets = resolve_parallelism(num_buckets)
    if max_df_frac is not None:
        n_docs = docs_ds.count()
        max_df = max(max_df, int(np.ceil(max_df_frac * n_docs)))
    nd = threshold_num + threshold_den

    def final_pairs(bucket_df: pd.DataFrame) -> pd.DataFrame:
        g = bucket_df.groupby(["i", "j"], sort=False).agg(
            si=("si", "first"), sj=("sj", "first"), inter=("inter", "sum")
        ).reset_index()
        keep = nd * g["inter"] >= threshold_num * (g["si"] + g["sj"])
        return g.loc[keep, ["i", "j"]]

    shingles = maybe_scatter(
        docs_ds.map_batches(
            lambda b: _shingle_rows(b, k, num_buckets),
            batch_format="pyarrow",
            batch_size=batch_size,
        ),
        parallelism,
    )
    candidates = shingles.groupby("bucket").map_groups(
        lambda df: _emit_pairs(df, max_df, num_buckets), batch_format="pandas"
    )
    return candidates.groupby("pbucket").map_groups(
        final_pairs, batch_format="pandas"
    )


def jaccard_stop_shingles(
    docs_ds, k: int, max_df: int, num_buckets: int, batch_size: int = 2048
) -> np.ndarray:
    """Sorted uint64 array of shingles with document frequency > max_df.

    Two-phase: per-batch fold to (shingle, partial df), bucketed groupby
    sums, filter.  The RESULT is driver-collected — bounded by
    total_shingle_rows / max_df (each stop shingle absorbs > max_df
    rows), i.e. the Zipf head of the shingle vocabulary, the only part
    small enough to broadcast and the only part the verified pair path
    needs by name."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        hs = [shingle_hashes(t, k) for t in batch["text"].to_pylist()]
        sh = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        u, c = np.unique(sh, return_counts=True)
        return pd.DataFrame(
            {
                "sh": u.astype(np.int64),
                "df": c.astype(np.int64),
                "bucket": (u % np.uint64(num_buckets)).astype(np.int32),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("sh", sort=False)["df"].sum()
        return pd.DataFrame({"sh": g.index[g > max_df].to_numpy(np.int64)})

    stops = (
        docs_ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby("bucket")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    return np.sort(stops["sh"].to_numpy(np.int64).astype(np.uint64))


def jaccard_pairs_verified(
    docs_ds,
    k: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    max_df: int = 64,
    num_buckets: int | None = None,
    batch_size: int = 512,
    parallelism=None,
    num_partitions: int | None = None,
):
    """EXACT word-k-gram Jaccard pairs that stay exact on duplicate-heavy
    corpora — the fix for plain :func:`jaccard_pairs`'s documented
    failure mode (its silent df cap undercounts intersections and can
    zero recall when shingle frequencies blow past ``max_df``).

    Three passes, each streaming:

    1. **Stop-set**: shingles with df > max_df (:func:`jaccard_stop_shingles`)
       — the Zipf head, broadcast once via ``ray.put``.
    2. **Kept-shingle inverted index**: every remaining group has df <=
       max_df BY CONSTRUCTION, so pair emission is bounded without
       dropping information silently; each doc carries its FULL set size
       ``si`` and dropped-shingle count ``di``.  A candidate's true
       intersection is bracketed:  inter_kept <= inter <= inter_kept +
       min(di, dj).  Lower bound passes -> pair is certainly real;
       upper bound fails -> certainly not; in between -> uncertain.
    3. **Exact verification** of the uncertain sliver: uncertain doc ids
       hash-join back to their full shingle arrays and each pair's true
       intersection is recomputed (``np.intersect1d``).  No broadcast of
       texts; pair and id sets are post-filter small.
    4. **Heavy-doc all-pairs**: a true pair can share ONLY stop-set
       shingles (zero kept overlap -> no candidate row from pass 2).
       Such a pair needs ``(n+d)*drop >= n*size`` on BOTH sides — the
       "heavy" docs.  Those go through a triangle-blocked exact
       all-pairs check (each heavy doc replicates to P block-pairs;
       every doc pair lands in exactly one group).  Quadratic ONLY in
       the heavy subset: rare in benign corpora (run ``exact_dedup``
       first so mass copies collapse), and in boilerplate-saturated
       corpora the TRUE OUTPUT is itself near-quadratic, so the cost is
       inherent to the answer, not the algorithm.

    The union of passes 2-4 (deduped) is the exact uncapped pair set:
    any true pair either shares a kept shingle (passes 2-3 bracket and
    verify it) or shares only stop shingles (both ends heavy -> pass 4).
    """
    import ray

    num_buckets = resolve_parallelism(num_buckets)
    num_partitions = resolve_parallelism(num_partitions)
    nd = threshold_num + threshold_den
    # four downstream consumers (stop-set count, kept-shingle index,
    # doc-shingles join, heavy-doc all-pairs) read docs_ds: pin the
    # blocks once or a lazy upstream re-executes per consumer (the
    # semdedup materialize note, same reason)
    docs_ds = docs_ds.materialize()
    stop = jaccard_stop_shingles(docs_ds, k, max_df, num_buckets, batch_size)
    stop_ref = ray.put(stop)

    def shingle_rows(batch: pa.Table) -> pa.Table:
        stops = ray.get(stop_ref)
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        sh_col, id_col, si_col, di_col = [], [], [], []
        for d, t in zip(ids, texts):
            sh = shingle_hashes(t, k)
            pos = np.searchsorted(stops, sh)
            pos[pos == len(stops)] = 0
            dropped = stops[pos] == sh if len(stops) else np.zeros(len(sh), bool)
            kept = sh[~dropped]
            sh_col.append(kept)
            id_col.append(np.full(len(kept), d, dtype=np.int64))
            si_col.append(np.full(len(kept), len(sh), dtype=np.int32))
            di_col.append(np.full(len(kept), int(dropped.sum()), dtype=np.int32))
        cat = lambda parts, dt: (
            np.concatenate(parts) if parts else np.empty(0, dt)
        )
        sh_all = cat(sh_col, np.uint64)
        return pa.table(
            {
                "bucket": pa.array((sh_all % num_buckets).astype(np.int32)),
                "sh": pa.array(sh_all.astype(np.int64)),
                "doc_id": pa.array(cat(id_col, np.int64)),
                "size": pa.array(cat(si_col, np.int32)),
                "drop": pa.array(cat(di_col, np.int32)),
            }
        )

    def emit(bucket_df: pd.DataFrame) -> pd.DataFrame:
        keys = bucket_df["sh"].to_numpy()
        # kept groups are <= max_df by construction; the cap is a backstop
        order, li, ri = _group_pair_indices(keys, max_df)
        cols = ["i", "j", "si", "sj", "di", "dj", "inter", "pbucket"]
        if li.size == 0:
            return pd.DataFrame(
                {c: pd.Series(dtype=np.int64 if c in ("i", "j", "inter")
                              else np.int32) for c in cols}
            )
        ids = bucket_df["doc_id"].to_numpy()[order]
        szs = bucket_df["size"].to_numpy()[order]
        dps = bucket_df["drop"].to_numpy()[order]
        a, b = ids[li], ids[ri]
        swap = a > b
        df = pd.DataFrame(
            {
                "i": np.where(swap, b, a),
                "j": np.where(swap, a, b),
                "si": np.where(swap, szs[ri], szs[li]),
                "sj": np.where(swap, szs[li], szs[ri]),
                "di": np.where(swap, dps[ri], dps[li]),
                "dj": np.where(swap, dps[li], dps[ri]),
            }
        )
        g = df.groupby(["i", "j"], sort=False).agg(
            si=("si", "first"), sj=("sj", "first"),
            di=("di", "first"), dj=("dj", "first"), inter=("si", "size"),
        ).reset_index()
        g["pbucket"] = ((g["i"] * 1000003 + g["j"]) % num_buckets).astype(np.int32)
        return g

    def classify(bucket_df: pd.DataFrame) -> pd.DataFrame:
        g = bucket_df.groupby(["i", "j"], sort=False).agg(
            si=("si", "first"), sj=("sj", "first"),
            di=("di", "first"), dj=("dj", "first"), inter=("inter", "sum"),
        ).reset_index()
        need = threshold_num * (g["si"] + g["sj"])
        lower = nd * g["inter"] >= need
        upper = nd * (g["inter"] + np.minimum(g["di"], g["dj"])) >= need
        g["certain"] = lower
        return g.loc[upper, ["i", "j", "certain"]]

    shingles = maybe_scatter(
        docs_ds.map_batches(
            shingle_rows, batch_format="pyarrow", batch_size=batch_size
        ),
        parallelism,
    )
    cands = (
        shingles.groupby("bucket").map_groups(arrowed(emit), batch_format="pandas")
        .groupby("pbucket").map_groups(arrowed(classify), batch_format="pandas")
    ).materialize()

    certain = cands.filter(lambda r: r["certain"]).select_columns(["i", "j"])
    uncertain = cands.filter(lambda r: not r["certain"]).select_columns(["i", "j"])
    n_unc = uncertain.count()
    heavy = _heavy_only_pairs(
        docs_ds, stop_ref, k, threshold_num, threshold_den,
        batch_size=batch_size,
    )
    if n_unc == 0:
        return certain.union(heavy) if heavy is not None else certain

    # exact verification of the uncertain sliver: full shingle arrays
    # travel only for the docs named by an uncertain pair (hash joins,
    # no broadcast of texts)
    def ids_of(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": np.unique(np.concatenate([df["i"].to_numpy(),
                                                 df["j"].to_numpy()]))}
        )

    ids = distinct_rows(
        uncertain.map_batches(ids_of, batch_format="pandas"), ["doc_id"]
    )
    # Ray's hash join raises when a partition receives zero left rows
    # (distinct keys sparser than partitions).  Pair VOLUME is the
    # wrong proxy under skew — a hub doc can put all uncertain pairs
    # on one key — so clamp to the true distinct-key counts of both
    # join sides (one cheap distinct-fold pass over the narrow pair
    # columns; `ids` above bounds neither side tightly)
    n_i = distinct_rows(
        uncertain.map_batches(
            lambda df: df[["i"]].drop_duplicates(), batch_format="pandas"
        ),
        ["i"],
    ).count()
    n_j = distinct_rows(
        uncertain.map_batches(
            lambda df: df[["j"]].drop_duplicates(), batch_format="pandas"
        ),
        ["j"],
    ).count()
    n_parts = max(1, min(num_partitions, n_unc // 256, n_i, n_j))

    def doc_shingles(batch: pa.Table) -> pa.Table:
        # arrays ride as binary: Arrow hash joins reject tensor/list
        # payload columns, and uint64 le-bytes round-trip exactly
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sh": pa.array(
                    [shingle_hashes(t, k).tobytes()
                     for t in batch["text"].to_pylist()],
                    pa.binary(),
                ),
            }
        )

    doc_sh = docs_ds.map_batches(doc_shingles, batch_format="pyarrow").join(
        ids, "inner", num_partitions=n_parts, on=("doc_id",)
    )
    left = uncertain.join(
        doc_sh.rename_columns({"doc_id": "i", "sh": "sh_i"}),
        "inner", num_partitions=n_parts, on=("i",),
    )
    both = left.join(
        doc_sh.rename_columns({"doc_id": "j", "sh": "sh_j"}),
        "inner", num_partitions=n_parts, on=("j",),
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        keep = []
        for a_raw, b_raw in zip(df["sh_i"], df["sh_j"]):
            a = np.frombuffer(a_raw, dtype=np.uint64)
            b = np.frombuffer(b_raw, dtype=np.uint64)
            inter = len(np.intersect1d(a, b, assume_unique=True))
            union = len(a) + len(b) - inter
            keep.append(threshold_den * inter >= threshold_num * union)
        return df.loc[keep, ["i", "j"]]

    verified = both.map_batches(arrowed(verify), batch_format="pandas")
    out = certain.union(verified)
    return out.union(heavy) if heavy is not None else out


def _heavy_only_pairs(
    docs_ds, stop_ref, k, threshold_num, threshold_den,
    batch_size: int = 2048, block_target: int = 1024,
):
    """Pass 4 of :func:`jaccard_pairs_verified`: exact pairs among HEAVY
    docs ((n+d)*dropped >= n*size) that share NO kept shingle — the only
    true pairs the kept-shingle index cannot see.  Triangle-blocked
    all-pairs: heavy doc in block b replicates to every block-pair group
    (min(b,c), max(b,c)), so each doc pair meets in exactly one group;
    the zero-kept-overlap filter keeps the output disjoint from passes
    2-3 (no downstream distinct needed).  Returns None when no doc is
    heavy (the common case on benign corpora)."""
    import ray

    nd = threshold_num + threshold_den

    def heavy_rows(batch: pa.Table) -> pa.Table:
        stops = ray.get(stop_ref)
        ids_out, sh_out = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sh = shingle_hashes(t, k)
            if len(sh) == 0:
                continue
            pos = np.searchsorted(stops, sh)
            pos[pos == len(stops)] = 0
            di = int((stops[pos] == sh).sum()) if len(stops) else 0
            if nd * di >= threshold_num * len(sh):
                ids_out.append(d)
                sh_out.append(sh.tobytes())
        return pa.table(
            {"doc_id": pa.array(ids_out, pa.int64()),
             "sh": pa.array(sh_out, pa.binary())}
        )

    heavy = docs_ds.map_batches(
        heavy_rows, batch_format="pyarrow", batch_size=batch_size
    ).materialize()
    n_heavy = heavy.count()
    if n_heavy == 0:
        return None
    P = int(max(1, min(32, -(-n_heavy // block_target))))

    def replicate(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        blocks = (ids % P).astype(np.int64)
        frames = []
        for c in range(P):
            a = np.minimum(blocks, c)
            b = np.maximum(blocks, c)
            frames.append(pd.DataFrame({
                "gid": a * P + b,
                "doc_id": ids,
                "blk": blocks,
                "sh": batch["sh"].to_pylist(),
            }))
        return pd.concat(frames, ignore_index=True).drop_duplicates(
            ["gid", "doc_id"]
        )

    def group_pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"i": pd.Series(dtype=np.int64), "j": pd.Series(dtype=np.int64)}
        )
        if len(df) == 0:
            return empty
        stops = None
        gid = int(df["gid"].iloc[0])
        a, b = gid // P, gid % P
        arrs = [np.frombuffer(r, dtype=np.uint64) for r in df["sh"]]
        rows = list(zip(df["doc_id"], df["blk"], arrs))
        out_i, out_j = [], []
        for x in range(len(rows)):
            dx, bx, sa = rows[x]
            for y in range(x + 1, len(rows)):
                dy, by, sb = rows[y]
                if a != b and bx == by:
                    continue  # same-block pairs belong to group (b, b)
                shared = np.intersect1d(sa, sb, assume_unique=True)
                inter = len(shared)
                union = len(sa) + len(sb) - inter
                if threshold_den * inter < threshold_num * union:
                    continue
                if stops is None:
                    stops = ray.get(stop_ref)
                if len(stops):
                    pos = np.searchsorted(stops, shared)
                    pos[pos == len(stops)] = 0
                    kept_shared = int((stops[pos] != shared).sum())
                else:
                    kept_shared = inter
                if kept_shared == 0:  # else passes 2-3 already saw it
                    out_i.append(min(dx, dy))
                    out_j.append(max(dx, dy))
        if not out_i:
            return empty
        return pd.DataFrame(
            {"i": pd.Series(out_i, dtype=np.int64),
             "j": pd.Series(out_j, dtype=np.int64)}
        )

    rep = heavy.map_batches(replicate, batch_format="pyarrow")
    return rep.groupby("gid").map_groups(
        arrowed(group_pairs), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MH_MUL = np.uint64(0xFF51AFD7ED558CCD)


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    # two independent uint64 xor-seeds per permutation
    s1 = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64)
    s2 = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64)
    return s1, s2


def minhash_signature(sh: np.ndarray, s1: np.ndarray, s2: np.ndarray) -> np.ndarray:
    """Min over shingles of a per-permutation xor-multiply mix (native
    uint64 wraparound — one (P, S) matrix op, no Python loop).  Not a
    textbook universal family but an adequate permutation approximation
    for MinHash in practice, and ~100x faster than exact mod-p."""
    if len(sh) == 0:
        return np.full(len(s1), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = sh.astype(np.uint64)
    h = (x[None, :] ^ s1[:, None]) * _MH_MUL
    h ^= h >> np.uint64(33)
    h = (h ^ s2[:, None]) * _MH_MUL
    return h.min(axis=1)


def minhash_signatures_batch(
    shingle_arrays, s1: np.ndarray, s2: np.ndarray, perm_chunk: int = 16
) -> np.ndarray:
    """(docs) list of shingle-hash arrays -> (N, P) signature matrix.

    Fully vectorized across the batch: all shingles flatten into ONE
    array, each perm-chunk mixes it in a (chunk, total_shingles) matrix
    and ``np.minimum.reduceat`` takes per-document minima on segment
    boundaries — no per-document temporaries (the naive per-doc P x S
    matrix allocates ~2 MB/doc and dominated the stage's wall time)."""
    n = len(shingle_arrays)
    P = len(s1)
    out = np.full((n, P), np.iinfo(np.uint64).max, dtype=np.uint64)
    lens = np.fromiter((len(a) for a in shingle_arrays), np.int64, count=n)
    nz = lens > 0
    if not nz.any():
        return out
    flat = np.concatenate([a for a in shingle_arrays if len(a)]).astype(np.uint64)
    starts = np.concatenate([[0], np.cumsum(lens[nz])[:-1]])
    for c0 in range(0, P, perm_chunk):
        s1c = s1[c0 : c0 + perm_chunk][:, None]
        s2c = s2[c0 : c0 + perm_chunk][:, None]
        h = (flat[None, :] ^ s1c) * _MH_MUL
        h ^= h >> np.uint64(33)
        h = (h ^ s2c) * _MH_MUL
        out[np.flatnonzero(nz)[:, None], np.arange(c0, c0 + s1c.shape[0])[None, :]] = (
            np.minimum.reduceat(h, starts, axis=1).T
        )
    return out


def band_keys_of(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(N, P) signatures -> (N, bands) mixed int64 band keys (band index
    folded into the key so equal values in different bands never
    collide).  Vectorized Fibonacci-xor mixing."""
    n, P = sigs.shape
    rows = P // bands
    banded = sigs[:, : bands * rows].reshape(n, bands, rows)
    h = np.zeros((n, bands), dtype=np.uint64)
    for r in range(rows):
        h = (h ^ banded[:, :, r]) * _MH_MUL
        h ^= h >> np.uint64(29)
    h ^= np.arange(bands, dtype=np.uint64)[None, :] * np.uint64(0x9E3779B97F4A7C15)
    return h.view(np.int64)


class MinHasher:
    """Actor-pool callable: permutation params built once per actor
    (map_batches(MinHasher, concurrency=N) — stateful-stage idiom).
    Emits NARROW band rows (band_key, doc_id) — signatures never enter
    the shuffle; verification uses the band-collision count."""

    def __init__(self, num_perm: int = 128, k: int = 3, bands: int = 32, seed: int = 42):
        self.s1, self.s2 = _minhash_params(num_perm, seed)
        self.k = k
        self.bands = bands
        self.rows = num_perm // bands

    def signature(self, text: str) -> np.ndarray:
        return minhash_signature(shingle_hashes(text, self.k), self.s1, self.s2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        sigs = minhash_signatures_batch(
            [shingle_hashes(t, self.k) for t in texts], self.s1, self.s2
        )
        bk = band_keys_of(sigs, self.bands)  # (N, bands)
        return pa.table(
            {
                "band_key": pa.array(bk.ravel()),
                "doc_id": pa.array(np.repeat(doc_ids.astype(np.int64), self.bands)),
            }
        )


_MINHASHER_CACHE: dict = {}


def _cached_minhasher(num_perm: int, k: int, bands: int) -> "MinHasher":
    """Per-worker-process MinHasher cache (workers persist across tasks,
    so every task after a worker's first reuses the param arrays)."""
    key = (num_perm, k, bands)
    if key not in _MINHASHER_CACHE:
        _MINHASHER_CACHE[key] = MinHasher(num_perm=num_perm, k=k, bands=bands)
    return _MINHASHER_CACHE[key]


def minhash_lsh_pairs(
    docs_ds,
    num_perm: int = 128,
    k: int = 3,
    bands: int = 32,
    threshold: float = 0.5,
    batch_size: int = 1024,
    num_buckets: int | None = None,
    max_band_df: int = 256,
    parallelism=None,
):
    """Near-duplicate pairs via MinHash banding with band-collision-count
    verification.

    A pair with Jaccard J collides in one band with probability J^rows;
    counting collisions b over all bands estimates J = (b/bands)^(1/rows),
    so ``keep iff b >= ceil(bands * threshold**rows)`` — e.g. >=2 of 32
    four-row bands for t=0.5.  This keeps the shuffle NARROW: band rows
    are (band_key:int64, doc_id:int64) and verification is the same
    pair-count groupby that dedups candidates — signatures never leave
    the hashing actor (shipping 1 KB sigs on every band row was ~95% of
    this stage's shuffle volume).  ``max_band_df`` caps C(df,2) pair
    blowup on degenerate band groups (near-empty docs all sharing one
    signature), the same stop-key skew guard as jaccard_pairs."""
    if bands < 1 or bands > num_perm or num_perm % bands != 0:
        # rows = num_perm // bands == 0 degenerates every band key to a
        # constant (threshold**0 == 1: all docs collide) and a remainder
        # silently discards trailing permutations — fail loudly like
        # simhash_pairs does for out-of-guarantee parameters
        raise ValueError(
            f"minhash_lsh_pairs: bands={bands} must divide num_perm="
            f"{num_perm} with rows >= 1"
        )
    num_buckets = resolve_parallelism(num_buckets)
    rows = num_perm // bands
    min_bands = max(1, int(np.ceil(bands * threshold**rows)))

    def candidates(band_df: pd.DataFrame) -> pd.DataFrame:
        keys = band_df["band_key"].to_numpy()
        order, li, ri = _group_pair_indices(keys, max_band_df)
        empty = pd.DataFrame(
            {
                "i": pd.Series(dtype=np.int64),
                "j": pd.Series(dtype=np.int64),
                "cnt": pd.Series(dtype=np.int64),
                "pbucket": pd.Series(dtype=np.int32),
            }
        )
        if li.size == 0:
            return empty
        ids = band_df["doc_id"].to_numpy()[order]
        a, b = ids[li], ids[ri]
        keep = a != b  # one row per (doc, band): same-doc pairs only via dup input rows
        if not keep.any():
            return empty
        df = pd.DataFrame(
            {"i": np.minimum(a[keep], b[keep]), "j": np.maximum(a[keep], b[keep])}
        )
        # partial pre-aggregation before the pair shuffle
        g = df.groupby(["i", "j"], sort=False).size().rename("cnt").reset_index()
        g["pbucket"] = ((g["i"] * 1000003 + g["j"]) % num_buckets).astype(np.int32)
        return g

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        g = (
            batch.groupby(["i", "j"], sort=False)["cnt"].sum().reset_index()
        )
        return g.loc[g["cnt"] >= min_bands, ["i", "j"]]

    # Stateless tasks, not an actor pool: MinHasher state is two small
    # param arrays, rebuilt from a per-worker-process cache in
    # microseconds — an actor pool would pay pool spin-up (seconds) per
    # pipeline execution for state that costs nothing to recreate.  The
    # actor-pool idiom (MinHasher class above) remains for callers that
    # embed signatures in a bigger stateful stage.
    def band_rows_batch(batch: pa.Table) -> pa.Table:
        hasher = _cached_minhasher(num_perm, k, bands)
        return hasher(batch)

    band_rows = docs_ds.map_batches(
        band_rows_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    band_rows = maybe_scatter(
        band_rows.map_batches(
            lambda df: df.assign(
                bucket=(df["band_key"] % num_buckets).astype(np.int32)
            ),
            batch_format="pandas",
        ),
        parallelism,
    )
    cand = band_rows.groupby("bucket").map_groups(candidates, batch_format="pandas")
    return cand.groupby("pbucket").map_groups(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigram crc-derived hashes (Charikar'02)."""
    from .textstats import token_hashes

    th = token_hashes(text)
    if len(th) == 0:
        return 0
    # spread 32-bit crc to 64 bits deterministically
    h64 = (th * np.uint64(0x9E3779B97F4A7C15)) ^ (th << np.uint64(31))
    bits = ((h64[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    v = (2 * bits - 1).sum(axis=0)
    out = 0
    for bit in range(64):
        if v[bit] > 0:
            out |= 1 << bit
    return out


def simhash64_batch(texts) -> np.ndarray:
    """uint64 SimHash per text, batch-wide: token crc hashes computed in
    ONE flat pass, bits unpacked for the whole batch at once, per-doc
    sign folds via ``np.add.reduceat`` over doc boundaries — removes the
    per-doc (n_tokens x 64) temporaries and 64-iteration Python bit
    loops of :func:`simhash64` (equivalence property-tested).  Same
    treatment that fixed the MinHash stage's per-doc wall-time."""
    import zlib

    toks_per = [t.split() for t in texts]
    counts = np.array([len(w) for w in toks_per], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.uint64)
    total = int(counts.sum())
    if total == 0:
        return out
    th = np.fromiter(
        (zlib.crc32(t.encode("utf-8")) for w in toks_per for t in w),
        dtype=np.uint64,
        count=total,
    )
    h64 = (th * np.uint64(0x9E3779B97F4A7C15)) ^ (th << np.uint64(31))
    bits = np.unpackbits(
        h64.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    ).astype(np.int64)  # (total, 64); column k = bit k (little-endian)
    nz = counts > 0
    bounds = np.concatenate(([0], np.cumsum(counts)))
    ones = np.add.reduceat(bits, bounds[:-1][nz], axis=0)  # (docs, 64)
    fp_bits = (2 * ones - counts[nz][:, None]) > 0  # v = sum(2b-1) > 0
    packed = np.packbits(
        fp_bits.astype(np.uint8), axis=1, bitorder="little"
    )
    out[nz] = packed.view(np.uint64).ravel()
    return out


def simhash_pairs(
    docs_ds,
    max_hamming: int = 3,
    batch_size: int = 2048,
    num_buckets: int | None = None,
    parallelism=None,
):
    """Pairs (i < j) with SimHash hamming distance <= max_hamming.

    Band partition: 4 x 16-bit bands — any pair within hamming 3 agrees
    exactly on >= 1 band (pigeonhole), so grouping by (band_id, band
    value) finds all of them; the exact popcount check runs inside the
    group (fingerprints ride with the rows).

    The pigeonhole guarantee needs bands > max_hamming: with the fixed
    4 bands, ``max_hamming > 3`` would silently miss pairs differing by
    one bit in every band, so larger radii are rejected outright."""
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the 4-band pigeonhole "
            "guarantee (radius <= 3); widen the band count to raise it"
        )

    num_buckets = resolve_parallelism(num_buckets)
    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        fp = simhash64_batch(batch["text"].to_pylist())  # uint64[n]
        bkeys, out_ids, out_fps = [], [], []
        for bi in range(4):  # 4 band slices, each fully vectorized
            band_val = (fp >> np.uint64(16 * bi)) & np.uint64(0xFFFF)
            bkeys.append((band_val.astype(np.int64)) | (bi << 16))
            out_ids.append(ids)
            out_fps.append((fp - np.uint64(1 << 63)).view(np.int64))
        return pa.table(
            {
                "band_key": pa.array(np.concatenate(bkeys)),
                "doc_id": pa.array(np.concatenate(out_ids)),
                "fp": pa.array(np.concatenate(out_fps)),
            }
        )

    def pairs_in_band(band_df: pd.DataFrame) -> pd.DataFrame:
        band_df = band_df.drop_duplicates(["band_key", "doc_id"])
        keys = band_df["band_key"].to_numpy()
        order, li, ri = _group_pair_indices(keys, max_df=len(keys))  # exact: no df cap
        if li.size == 0:
            return pd.DataFrame(
                {"i": pd.Series(dtype=np.int64), "j": pd.Series(dtype=np.int64)}
            )
        ids = band_df["doc_id"].to_numpy()[order]
        fp = (
            band_df["fp"].to_numpy().astype(np.int64).astype(np.uint64)
            + np.uint64(1 << 63)
        )[order]
        a, b = ids[li], ids[ri]
        m = (_popcount64(fp[li] ^ fp[ri]) <= max_hamming) & (a != b)
        return pd.DataFrame(
            {"i": np.minimum(a[m], b[m]), "j": np.maximum(a[m], b[m])},
            dtype=np.int64,
        )

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["i", "j"])[["i", "j"]]

    bands = docs_ds.map_batches(to_bands, batch_format="pyarrow", batch_size=batch_size)
    bands = maybe_scatter(
        bands.map_batches(
            lambda df: df.assign(
                bucket=(df["band_key"] % num_buckets).astype(np.int32)
            ),
            batch_format="pandas",
        ),
        parallelism,
    )
    cand = bands.groupby("bucket").map_groups(pairs_in_band, batch_format="pandas")
    cand = cand.map_batches(
        lambda df: df.assign(
            pbucket=((df["i"] * 1000003 + df["j"]) % num_buckets).astype(np.int32)
        )
        if len(df)
        else df.assign(pbucket=pd.Series(dtype=np.int32)),
        batch_format="pandas",
    )
    return cand.groupby("pbucket").map_groups(dedup_pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# corpus-level dedup consumer (pairs -> kept corpus)
# ---------------------------------------------------------------------------


def apply_dedup(docs_ds, pairs_ds, num_partitions: int | None = None, id_col: str = "doc_id"):
    """Keep-first corpus dedup: drop every doc that appears as the
    LARGER member ``j`` of any duplicate pair (i < j).

    The min-id representative of each duplicate group survives.  Exact
    connected components when every group member collides pairwise
    (always true for exact copies; true for LSH/banded detectors at
    high similarity), conservative otherwise — a doc drops only if some
    pair ties it to a smaller id.

    Scale shape: a distributed LEFT ANTI hash join (Ray's hash-shuffle
    join operator) — the drop set is NEVER broadcast, both sides
    co-hash on ``id_col`` across ``num_partitions``.  Pair lists grow
    quadratically in group size (a 10^6-copy boilerplate page is 5*10^11
    pairs), so at web scale feed this from a detector with a group-size
    cap (minhash ``max_band_df`` / jaccard ``max_df``) or from
    ``exact_dedup`` group representatives rather than raw pairs.
    """

    num_partitions = resolve_parallelism(num_partitions)
    def drop_ids(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df[["j"]].rename(columns={"j": id_col}).drop_duplicates()
        )

    drops = pairs_ds.map_batches(drop_ids, batch_format="pandas")
    return docs_ds.join(
        drops, "left_anti", num_partitions=num_partitions, on=(id_col,)
    )


def distinct_rows(ds, cols: Optional[list] = None, num_buckets: int | None = None):
    """Generic distinct over ``cols`` (default: all columns) — the
    two-phase shape: per-batch drop_duplicates folds each batch to its
    distinct rows (the combiner), then a bucketed groupby on the row
    hash dedups across batches.  Shuffle volume is the per-batch
    distinct set, not the input."""
    num_buckets = resolve_parallelism(num_buckets)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        use = cols or list(df.columns)
        out = df[use].drop_duplicates()
        # per-row C-speed frame hash (the bucket_of-vetted primitive,
        # process-stable) instead of the former astype(str) + row-wise
        # '|'.join — that was Python-object churn per distinct row on
        # the verified-jaccard hot path
        key = pd.util.hash_pandas_object(out, index=False).to_numpy()
        out = out.assign(_bucket=bucket_of(key, num_buckets))
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        use = cols or [c for c in df.columns if c != "_bucket"]
        return df[use].drop_duplicates()

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby("_bucket").map_groups(final, batch_format="pandas")


# ---------------------------------------------------------------------------
# connected components over the duplicate-pair graph
# ---------------------------------------------------------------------------


def _star_round(df: pd.DataFrame, kind: str, num_buckets: int) -> pd.DataFrame:
    """One bucket of a large-star / small-star round, fully vectorized.

    Input rows are directed edges (u, v); the bucket holds EVERY edge
    whose grouping node u lands in it, so per-node neighborhoods are
    complete.  Per sorted run of u: m = min(neighborhood ∪ {u});
    large-star reattaches strictly-larger neighbors to m, small-star
    reattaches all smaller neighbors (and u itself) to m.
    """
    if len(df) == 0:
        return pd.DataFrame({
            "u": pd.Series(dtype=np.int64), "v": pd.Series(dtype=np.int64),
            "bucket": pd.Series(dtype=np.int32),
        })
    u = df["u"].to_numpy(np.int64)
    v = df["v"].to_numpy(np.int64)
    order = np.argsort(u, kind="stable")
    us, vs = u[order], v[order]
    change = np.flatnonzero(us[1:] != us[:-1]) + 1
    starts = np.concatenate(([0], change))
    run_min = np.minimum(np.minimum.reduceat(vs, starts), us[starts])
    sizes = np.diff(np.concatenate((starts, [len(us)])))
    m = np.repeat(run_min, sizes)
    if kind == "large":
        keep = vs > us
        eu, ev = vs[keep], m[keep]
    else:  # small-star: edges arrive oriented u > v, attach v's and u to m
        keep = vs != m
        eu = np.concatenate((vs[keep], us[starts]))
        ev = np.concatenate((m[keep], run_min))
        self_loop = eu != ev
        eu, ev = eu[self_loop], ev[self_loop]
    out = pd.DataFrame({"u": eu, "v": ev}).drop_duplicates()
    out["bucket"] = (out["u"].to_numpy(np.int64) % num_buckets).astype(np.int32)
    return out


def _orient(batch: pa.Table, kind: str, num_buckets: int) -> pd.DataFrame:
    """Directed-edge prep for one star round: large-star groups on BOTH
    endpoints (symmetrize), small-star groups on the larger one."""
    i = batch["u"].to_numpy().astype(np.int64)
    j = batch["v"].to_numpy().astype(np.int64)
    if kind == "large":
        u = np.concatenate((i, j))
        v = np.concatenate((j, i))
    else:
        u = np.maximum(i, j)
        v = np.minimum(i, j)
    df = pd.DataFrame({"u": u, "v": v})
    df = df[df["u"] != df["v"]].drop_duplicates()
    df["bucket"] = (df["u"].to_numpy(np.int64) % num_buckets).astype(np.int32)
    return df


def _local_cc(batch: pa.Table) -> pa.Table:
    """Exact single-task connected components over one edge block:
    vectorized min-label propagation (numpy) alternating edge-relax and
    pointer-jumping — O(E log V) memory-bound numpy passes, no Python
    per-edge loop.  Output matches the distributed path: one
    (doc_id, cluster_id = component min) row per node seen in any edge."""
    u = batch["u"].to_numpy().astype(np.int64)
    v = batch["v"].to_numpy().astype(np.int64)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[: len(u)], inv[len(u):]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        relaxed = label.copy()
        np.minimum.at(relaxed, ui, label[vi])
        np.minimum.at(relaxed, vi, label[ui])
        while True:  # pointer jumping: label of my label
            nxt = relaxed[relaxed]
            if np.array_equal(nxt, relaxed):
                break
            relaxed = nxt
        if np.array_equal(relaxed, label):
            break
        label = relaxed
    # nodes is sorted, so the min label INDEX names the min node id
    return pa.table(
        {"doc_id": pa.array(nodes), "cluster_id": pa.array(nodes[label])}
    )


def connected_components(
    pairs_ds,
    num_buckets: int | None = None,
    max_rounds: int = 32,
    local_threshold: int = 4_000_000,
):
    """Duplicate pairs (i, j) -> (doc_id, cluster_id = component min).

    Alternating large-star / small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14): each round
    is one bucketed groupby over the EDGE set; the graph converges to
    stars centered on the component minimum in O(log^2 n) rounds (2-3 in
    practice for near-dup graphs, whose components are small and dense).

    Scale shape: every round shuffles only the candidate-pair edges —
    orders of magnitude smaller than the corpus — and the edge set
    shrinks monotonically toward one edge per non-root member.  The
    driver holds nothing but a per-round checksum; rounds materialize
    the contracted edge set (bounded by the pair count).  Skewed
    components are safe: a node's neighborhood after contraction is its
    component members, and the star ops only take a min and re-emit.

    Hybrid fast path: the edge set is already materialized for the
    round loop, so its count is free — when it is at most
    ``local_threshold`` edges (default 4M ≈ 64 MB of int64 pairs, far
    below one worker's heap) the multi-round loop degenerates to ONE
    coalesce + one vectorized task (:func:`_local_cc`).  The driver
    never holds the edges; above the threshold the distributed
    star-contraction loop runs unchanged, so a pathological
    billion-pair graph still converges without any single task seeing
    the whole edge set.

    Reference parity note: lifts features/postprocess.py:277-284's
    keep-first semantics from exact-key groups to TRANSITIVE closure
    over near-duplicate pairs (the pair detectors are not transitive:
    A~B and B~C does not imply the A~C row exists).
    """
    num_buckets = resolve_parallelism(num_buckets)

    def run_round(ds, kind):
        oriented = ds.map_batches(
            lambda b, k=kind: _orient(b, k, num_buckets), batch_format="pyarrow"
        )
        return oriented.groupby("bucket").map_groups(
            lambda df, k=kind: _star_round(df, k, num_buckets),
            batch_format="pandas",
        )

    def checksum(ds) -> tuple:
        def partial(b: pa.Table) -> pd.DataFrame:
            h = (b["u"].to_numpy().astype(np.uint64) * np.uint64(1000003)
                 ^ b["v"].to_numpy().astype(np.uint64))
            # mask to 63 bits so EVERY block's column infers int64:
            # a raw uint64 sum >= 2^63 makes pandas infer uint64 for
            # that block, and concatenating int64+uint64 blocks
            # silently promotes to float64 — truncating the checksum
            # the convergence guard depends on to 53 bits
            x = int(h.sum(dtype=np.uint64) & np.uint64(0x7FFFFFFFFFFFFFFF))
            return pd.DataFrame({"n": [len(h)], "x": [x]})

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        # wrap-around uint64 sum then mask: order-independent mod-2^63
        total = parts["x"].to_numpy(np.int64).astype(np.uint64).sum()
        return int(parts["n"].sum()), int(
            np.uint64(total) & np.uint64(0x7FFFFFFFFFFFFFFF)
        )

    edges = pairs_ds.map_batches(
        lambda b: pa.table({"u": pc.cast(b["i"], pa.int64()),
                            "v": pc.cast(b["j"], pa.int64())}),
        batch_format="pyarrow",
    ).materialize()
    if edges.count() <= local_threshold:
        # batch_size=None pins whole-block batches: _local_cc is only
        # correct on the COMPLETE edge set, and a future default that
        # splits blocks into fixed-size batches would silently
        # mis-cluster anything larger than one batch
        return edges.repartition(1).map_batches(
            _local_cc, batch_format="pyarrow", batch_size=None
        )
    prev = None
    converged = False
    for _ in range(max_rounds):
        edges = run_round(edges, "large")
        edges = run_round(edges, "small").materialize()
        cur = checksum(edges)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # star contraction converges in O(log^2 n) rounds, so 32 covers
        # any realistic near-dup graph — but finalizing an unconverged
        # edge set would emit a silently wrong clustering, so fail loud
        raise RuntimeError(
            f"connected_components: edge contraction did not converge "
            f"within max_rounds={max_rounds} (checksum still moving); "
            "raise max_rounds rather than trusting a partial clustering"
        )

    # star edges (member -> root) + the roots themselves; roots repeat
    # across batches/buckets, so close with a two-phase global distinct
    # (post-convergence each member has exactly one root, so (doc_id,
    # cluster_id) distinct == doc_id distinct)
    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        mem = df[["u", "v"]].rename(columns={"u": "doc_id", "v": "cluster_id"})
        roots = pd.DataFrame({"doc_id": df["v"].unique()})
        roots["cluster_id"] = roots["doc_id"]
        return pd.concat([mem, roots], ignore_index=True).astype(np.int64)

    rows = edges.map_batches(finalize, batch_format="pandas")
    return distinct_rows(rows, ["doc_id", "cluster_id"], num_buckets=num_buckets)


def apply_dedup_clusters(docs_ds, pairs_ds, num_partitions: int | None = None,
                         id_col: str = "doc_id",
                         broadcast_threshold: int = 4_000_000):
    """Transitive keep-first dedup: survivors are the per-component
    minimum ids of :func:`connected_components` plus every doc in no
    pair.

    Ids must be INTEGER: :func:`connected_components` casts the pair
    columns to int64 (string ids would need a factorize-to-int pass
    first).  The hybrid below is type-agnostic only downstream of that.

    Hybrid drop-side handling (same posture as ``bloom_semi_join``):
    the cluster table is bounded by the pair-graph node set — tiny next
    to the corpus — so it is materialized and counted for free.  At or
    under ``broadcast_threshold`` non-root rows the sorted drop-id array
    is shipped once via ``ray.put`` and the corpus STREAMS through a
    vectorized ``np.isin`` filter — zero shuffle on the big side.
    Above it, a distributed LEFT ANTI hash join keeps every task's
    working set bounded (the drop set is never broadcast)."""
    import ray

    num_partitions = resolve_parallelism(num_partitions)
    clusters = connected_components(pairs_ds).materialize()
    n_clusters = clusters.count()
    if n_clusters == 0:  # no duplicate pairs at all: everything survives
        return docs_ds

    def non_roots(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["doc_id"] != df["cluster_id"]][["doc_id"]]
        return out.rename(columns={"doc_id": id_col}) if id_col != "doc_id" else out

    drops = clusters.map_batches(non_roots, batch_format="pandas")
    if n_clusters <= broadcast_threshold:
        # no dtype cast: id_col may be string/any — np.sort/np.isin
        # handle object arrays, and the distributed join fallback below
        # is type-agnostic, so the two paths must accept the same ids
        ids = np.sort(drops.to_pandas()[id_col].to_numpy())
        ids_ref = ray.put(ids)

        def keep(batch: pa.Table) -> pa.Table:
            drop_ids = ray.get(ids_ref)
            col = batch[id_col].to_numpy(zero_copy_only=False)
            return batch.filter(
                pa.array(~np.isin(col, drop_ids, assume_unique=False))
            )

        return docs_ds.map_batches(keep, batch_format="pyarrow")
    return docs_ds.join(drops, "left_anti", num_partitions=num_partitions, on=(id_col,))


def incremental_dedup(new_ds, snapshot_ds, num_partitions: int | None = None,
                      batch_size: int = 4096):
    """Incremental ingest dedup: keep only the incoming docs whose exact
    content does NOT already exist in a corpus snapshot — the
    production shape for appending a fresh crawl to an existing 100 TB
    corpus without re-deduplicating it.

    Both sides reduce to md5 content keys IN the map phase (the wire
    carries one short hash row per doc, never text); the snapshot side
    additionally folds to one row per distinct key per batch.  The
    decision is a distributed LEFT ANTI hash join on the key — the
    snapshot key set is corpus-sized and is therefore NEVER broadcast
    (contrast apply_dedup_clusters' bounded drop set).  Returns
    (doc_id, key) for surviving incoming docs; join back on doc_id for
    payloads.
    """
    num_partitions = resolve_parallelism(num_partitions)

    def keyed(batch: pa.Table) -> pd.DataFrame:
        keys = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(), "key": keys}
        )

    def snap_keys(batch: pa.Table) -> pd.DataFrame:
        keys = {
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        }
        return pd.DataFrame({"key": sorted(keys)})

    incoming = new_ds.map_batches(
        keyed, batch_format="pyarrow", batch_size=batch_size
    )
    seen = snapshot_ds.map_batches(
        snap_keys, batch_format="pyarrow", batch_size=batch_size
    )
    return incoming.join(
        seen, "left_anti", num_partitions=num_partitions, on=("key",)
    )


# ---------------------------------------------------------------------------
# repeated-span detection (the ExactSubstr detection phase)
# ---------------------------------------------------------------------------


def _dup_gram_positions(
    docs_ds,
    w: int,
    num_buckets: int,
    batch_size: int,
):
    """Phases 1-2 of exact-substring dedup, shared by the detection
    (:func:`dup_spans`) and removal (:func:`dup_spans_apply`) ops:
    duplicate-hash sketch -> broadcast dup-hash array -> string-verify
    pass.  Returns the ``(doc_id, pos, dbucket)`` Dataset of verified
    duplicated-gram start offsets (0-based words), doc-bucketed — or
    ``None`` when the corpus has no duplicated gram at all."""
    import ray

    from .textstats import batch_word_ngrams

    def hash_partial(batch: pa.Table) -> pa.Table:
        _, h, _ = batch_word_ngrams(batch, w)
        if len(h) == 0:
            return pa.table(
                {"h": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64()),
                 "bucket": pa.array([], pa.int32())}
            )
        vals, cnt = np.unique(h, return_counts=True)
        sv = vals.astype(np.int64)  # reinterpretable, order-stable
        return pa.table(
            {
                "h": pa.array(sv),
                "cnt": pa.array(cnt.astype(np.int64)),
                "bucket": pa.array((vals % num_buckets).astype(np.int32)),
            }
        )

    def dup_hashes(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "h" not in df.columns:
            return pa.table({"h": pa.array([], pa.int64())})
        g = df.groupby("h", sort=False, as_index=False)["cnt"].sum()
        return g.loc[g["cnt"] >= 2, ["h"]]

    dup_parts = []
    for b in (
        docs_ds.map_batches(
            hash_partial, batch_format="pyarrow", batch_size=batch_size
        )
        .groupby("bucket")
        .map_groups(dup_hashes, batch_format="pandas")
        .iter_batches(batch_format="pandas")
    ):
        dup_parts.append(b["h"].to_numpy(np.int64).astype(np.uint64))
    dups = (
        np.sort(np.concatenate(dup_parts))
        if dup_parts
        else np.empty(0, np.uint64)
    )
    if len(dups) == 0:
        return None
    dups_ref = ray.put(dups)

    def verify_rows(batch: pa.Table) -> pa.Table:
        dp = ray.get(dups_ref)
        d, h, g, pos = batch_word_ngrams(batch, w, return_pos=True)
        empty = pa.table(
            {
                "h": pa.array([], pa.int64()),
                "gram": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int32()),
            }
        )
        if len(h) == 0:
            return empty
        hit = np.isin(h, dp)
        if not hit.any():
            return empty
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        hh = h[hit]
        return pa.table(
            {
                "h": pa.array(hh.astype(np.int64)),
                "gram": g.filter(pa.array(hit)),
                "doc_id": pa.array(doc_ids[d[hit]]),
                "pos": pa.array(pos[hit]),
                "bucket": pa.array((hh % num_buckets).astype(np.int32)),
            }
        )

    def string_verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "gram" not in df.columns:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "dbucket": pa.array([], pa.int32()),
                }
            )
        sizes = df.groupby("gram", sort=False)["gram"].transform("size")
        keep = df[sizes >= 2]
        out = keep[["doc_id", "pos"]].copy()
        out["dbucket"] = (out["doc_id"].to_numpy() % num_buckets).astype(
            np.int32
        )
        return out

    return (
        docs_ds.map_batches(
            verify_rows, batch_format="pyarrow", batch_size=batch_size
        )
        .groupby("bucket")
        .map_groups(string_verify, batch_format="pandas")
    )


def dup_spans(
    docs_ds,
    w: int = 8,
    num_buckets: int | None = None,
    batch_size: int = 1024,
):
    """Repeated-span detection — the detection phase of exact-substring
    dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", at word granularity): for every document,
    how many of its word ``w``-grams occur at least TWICE anywhere in
    the corpus (including within the same document — boilerplate
    counts), and how many words those duplicated spans cover (union of
    the [pos, pos+w) intervals).

    Output ``(doc_id, n_dup_grams, dup_span_words)`` for docs with at
    least one duplicated gram — the mask the removal pass
    (:func:`dup_spans_apply`) consumes.

    Exact without ever shipping the full gram stream as strings (the
    decontaminate posture — hash first, string-verify only the hits):

    1. duplicate-hash sketch: per-batch uint64 gram-hash count folds
       (int64-only wire) -> bucketed sum -> hashes with count >= 2.
       The DUPLICATED-gram vocabulary is the small side (bounded by
       true duplication, not corpus size) and broadcasts once.
    2. verify pass: batches re-derive grams, ``np.isin`` against the
       broadcast dup-hash array, and only HIT rows ship their literal
       gram string, bucketed BY HASH (same-string grams always share a
       hash, so string groups are complete within a hash bucket);
       per-bucket exact string counts drop hash collisions.
    3. per-doc island fold: verified (doc, pos) rows bucket by doc;
       sorted-position interval union via the min(gap, w) telescope —
       no per-position Python loop.
    """
    num_buckets = resolve_parallelism(num_buckets)
    pos_ds = _dup_gram_positions(docs_ds, w, num_buckets, batch_size)
    if pos_ds is None:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_dup_grams": pa.array([], pa.int64()),
                    "dup_span_words": pa.array([], pa.int64()),
                }
            )
        )

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "doc_id" not in df.columns:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_dup_grams": pa.array([], pa.int64()),
                    "dup_span_words": pa.array([], pa.int64()),
                }
            )
        df = df.sort_values(["doc_id", "pos"], kind="stable")
        doc = df["doc_id"].to_numpy(np.int64)
        pos = df["pos"].to_numpy(np.int64)
        new = np.ones(len(doc), dtype=bool)
        new[1:] = doc[1:] != doc[:-1]
        # interval-union telescope: first gram of a doc contributes w,
        # each subsequent one min(gap, w)
        gap = np.empty(len(pos), dtype=np.int64)
        gap[0] = w
        gap[1:] = np.minimum(pos[1:] - pos[:-1], w)
        gap[new] = w
        seg = np.cumsum(new) - 1
        n_docs = int(seg[-1]) + 1
        cnt = np.bincount(seg, minlength=n_docs).astype(np.int64)
        span = np.zeros(n_docs, dtype=np.int64)
        np.add.at(span, seg, gap)
        return pd.DataFrame(
            {
                "doc_id": doc[new],
                "n_dup_grams": cnt,
                "dup_span_words": span,
            }
        )

    return pos_ds.groupby("dbucket").map_groups(
        islands, batch_format="pandas"
    )


def dup_spans_apply(
    docs_ds,
    w: int = 8,
    num_buckets: int | None = None,
    batch_size: int = 1024,
):
    """Exact-substring REMOVAL (the apply phase of Lee et al. 2022's
    ExactSubstr, word granularity): strip from every document the
    union of its duplicated-``w``-gram spans — every occurrence goes,
    the cross-engine-deterministic reading of "deduplicate repeated
    substrings" — and emit the surviving text.

    Output one row PER DOCUMENT: ``(doc_id, n_kept, text)`` where
    ``text`` is the space-joined kept words ('' when the whole doc was
    duplicated — e.g. an exact-duplicate pair covers both copies
    entirely) — whitespace-normalized on both engines (``\\S+`` split
    + single-space join).

    Scale shape: the shared detection phases (:func:`dup_spans` notes)
    plus ONE doc-bucketed co-group joining the verified span offsets
    back to the document text; per-doc work is a numpy coverage mask +
    one join — no corpus-wide state, wire bounded by true duplication.
    """
    num_buckets = resolve_parallelism(num_buckets)

    def doc_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "pos": pa.array(np.full(len(ids), -1, dtype=np.int64)),
                "text": batch["text"].cast(pa.string()),
                "dbucket": pa.array((ids % num_buckets).astype(np.int32)),
            }
        )

    def strip_spans(df: pd.DataFrame) -> pd.DataFrame:
        docs = df[df["pos"] < 0]
        spans = df[df["pos"] >= 0]
        covered: dict = {}
        for did, g in spans.groupby("doc_id", sort=False):
            covered[did] = g["pos"].to_numpy(np.int64)
        out_id: list = []
        out_n: list = []
        out_txt: list = []
        for did, txt in zip(
            docs["doc_id"].to_numpy(np.int64), docs["text"]
        ):
            words = (txt or "").split()
            pos = covered.get(did)
            if pos is None:
                kept = words
            else:
                mask = np.ones(len(words), dtype=bool)
                # vectorized interval union: difference array over
                # [pos, pos+w) then cumsum > 0 = covered
                diff = np.zeros(len(words) + 1, dtype=np.int64)
                np.add.at(diff, pos, 1)
                np.add.at(diff, np.minimum(pos + w, len(words)), -1)
                mask &= np.cumsum(diff[:-1]) == 0
                kept = [wd for wd, m in zip(words, mask) if m]
            out_id.append(did)
            out_n.append(len(kept))
            out_txt.append(" ".join(kept))
        return pd.DataFrame(
            {
                "doc_id": np.asarray(out_id, dtype=np.int64),
                "n_kept": np.asarray(out_n, dtype=np.int64),
                "text": pd.Series(out_txt, dtype=object),
            }
        )

    docs_side = docs_ds.map_batches(
        doc_rows, batch_format="pyarrow", batch_size=batch_size
    )
    pos_ds = _dup_gram_positions(docs_ds, w, num_buckets, batch_size)
    if pos_ds is None:
        tagged = docs_side
    else:

        def tag_spans(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch["doc_id"].cast(pa.int64()),
                    "pos": batch["pos"].cast(pa.int64()),
                    "text": pa.array([""] * len(batch), pa.string()),
                    "dbucket": batch["dbucket"].cast(pa.int32()),
                }
            )

        tagged = docs_side.union(
            pos_ds.map_batches(tag_spans, batch_format="pyarrow")
        )
    return tagged.groupby("dbucket").map_groups(
        strip_spans, batch_format="pandas"
    )
