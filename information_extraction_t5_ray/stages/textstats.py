"""Text-analysis operators over a document corpus.

Large-scale training-data curation primitives, each a narrow
``map_batches`` stage (no shuffle):

* ``doc_stats_batch``      — length / token / line / punctuation counts,
                             fully vectorized ``pyarrow.compute``;
* ``lang_id_batch``        — marker-substring language heuristic whose
                             arithmetic is mirrored 1:1 in ANSI SQL
                             (sources/oracle_corpus.py) so the driver can
                             oracle-check it;
* ``fingerprint_batch``    — exact content fingerprint (md5, matches
                             DuckDB's ``md5()``);
* ``winnow_fingerprints``  — winnowing document sketch (rolling k-gram
                             hash minima; Schleimer et al., SIGMOD'03
                             public algorithm), for local-dedup sketches.

Quality scoring mirrors the *shape* of the reference's normalization
helpers (``/root/reference/information_extraction_t5/utils/metrics.py:14-37``
treats lowercase/punct/whitespace as the text signal) re-expressed as
corpus-level per-doc statistics.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from .common import bucket_of, resolve_parallelism

# --- doc_stats -------------------------------------------------------------

PUNCT_RE = r"[.,;:!?]"
TOKEN_RE = r"\S+"
# GPT-2-style pre-tokenizer, lookahead-free so the SAME pattern runs on
# RE2 (Arrow kernels) and DuckDB: contraction suffixes, space-prefixed
# letter runs, digit runs, punctuation runs, then whitespace runs.
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def doc_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> per-doc integer statistics (zero-copy in,
    vectorized Arrow kernels, no Python row loop)."""
    text = batch["text"]
    n_chars = pc.utf8_length(text)
    n_tokens = pc.count_substring_regex(text, TOKEN_RE)
    n_lines = pc.add(pc.count_substring(text, "\n"), 1)
    n_punct = pc.count_substring_regex(text, PUNCT_RE)
    n_bpe = pc.count_substring_regex(text, BPE_RE)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_lines": pc.cast(n_lines, pa.int64()),
            "n_punct": pc.cast(n_punct, pa.int64()),
            "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
        }
    )


# --- language id -----------------------------------------------------------

# marker substrings counted on ' '+lower(text)+' '; scoring and the
# nested tie-break CASE are replicated verbatim in SQL — keep the two in
# sync (oracle_corpus.lang_id_sql builds the SQL FROM these constants).
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "pt": [" de ", " que ", " para "],
    "es": [" el ", " los ", " una "],
}
LANG_ORDER = ["en", "pt", "es"]  # first-wins on strict-greater cascade


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Marker-count language heuristic.  predicted = first lang in
    LANG_ORDER whose score strictly beats every other; all-equal -> 'und'.
    Non-overlapping substring counts == Python str.count == SQL
    (len(t)-len(replace(t,m,'')))/len(m)."""
    padded = pc.binary_join_element_wise(
        pa.array([" "] * len(batch)), pc.utf8_lower(batch["text"]), pa.array([" "] * len(batch)), ""
    )
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        s = None
        for m in markers:
            c = pc.count_substring(padded, m)
            s = c if s is None else pc.add(s, c)
        scores[lang] = pc.cast(s, pa.int64())
    s_np = {k: v.to_numpy(zero_copy_only=False) for k, v in scores.items()}
    n = len(batch)
    pred = np.full(n, "und", dtype=object)
    # cascade: en wins if > pt and > es; else pt if > en and > es; ...
    remaining = np.ones(n, dtype=bool)
    for lang in LANG_ORDER:
        others = [s_np[o] for o in LANG_ORDER if o != lang]
        win = remaining & np.logical_and.reduce([s_np[lang] > o for o in others])
        pred[win] = lang
        remaining &= ~win
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "s_en": scores["en"],
            "s_pt": scores["pt"],
            "s_es": scores["es"],
            "lang_pred": pa.array(pred.tolist(), pa.string()),
        }
    )


# --- quality scoring -------------------------------------------------------

# Gopher/C4-style document-quality gates, kept INTEGRAL so the DuckDB
# oracle hashes identically (no float ratios anywhere):
#   tokens in [QL_MIN_TOKENS, QL_MAX_TOKENS]
#   mean word length in [3, 10]   <=>  3*n_tokens <= n_word_chars <= 10*n_tokens
#   >= QL_MIN_STOPWORDS stopword hits (C4's "has common function words")
#   punctuation runs do not outnumber tokens:  n_punct <= n_tokens
QL_MIN_TOKENS = 20
QL_MAX_TOKENS = 100_000
QL_MIN_STOPWORDS = 2
QL_STOPWORDS = sorted({m for ms in LANG_MARKERS.values() for m in ms})


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> per-doc quality signals + integral keep flag.
    Vectorized Arrow kernels only; the predicate arithmetic is mirrored
    1:1 in ``oracle_corpus.quality_score_sql``."""
    text = batch["text"]
    n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, PUNCT_RE), pa.int64())
    # word chars = non-whitespace chars (mean word length denominator)
    n_word_chars = pc.cast(
        pc.count_substring_regex(text, r"\S"), pa.int64()
    )
    padded = pc.binary_join_element_wise(
        pa.array([" "] * len(batch)), pc.utf8_lower(text),
        pa.array([" "] * len(batch)), "",
    )
    n_stop = None
    for m in QL_STOPWORDS:
        c = pc.count_substring(padded, m)
        n_stop = c if n_stop is None else pc.add(n_stop, c)
    n_stop = pc.cast(n_stop, pa.int64())
    t = n_tokens.to_numpy(zero_copy_only=False)
    w = n_word_chars.to_numpy(zero_copy_only=False)
    s = n_stop.to_numpy(zero_copy_only=False)
    p = n_punct.to_numpy(zero_copy_only=False)
    keep = (
        (t >= QL_MIN_TOKENS) & (t <= QL_MAX_TOKENS)
        & (3 * t <= w) & (w <= 10 * t)
        & (s >= QL_MIN_STOPWORDS)
        & (p <= t)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": n_tokens,
            "n_word_chars": n_word_chars,
            "n_stop": n_stop,
            "n_punct": n_punct,
            "keep": pa.array(keep.astype(np.int64)),
        }
    )


def quality_score_stage(docs_ds, batch_size: int = 4096):
    return docs_ds.map_batches(
        quality_score_batch, batch_format="pyarrow", batch_size=batch_size
    )


def quality_filter(docs_ds, batch_size: int = 4096):
    """docs -> docs that pass the quality gates (streaming filter: the
    predicate is evaluated inside the same batch, no join, no shuffle)."""

    def keep_rows(batch: pa.Table) -> pa.Table:
        flags = quality_score_batch(batch)["keep"]
        return batch.filter(pc.equal(flags, 1))

    return docs_ds.map_batches(
        keep_rows, batch_format="pyarrow", batch_size=batch_size
    )


# --- fingerprints ----------------------------------------------------------


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, fp) exact content fingerprint.
    hashlib.md5(utf8) hex == DuckDB md5(text) — oracle-checkable."""
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()]
    return pa.table({"doc_id": batch["doc_id"], "fp": pa.array(fps, pa.string())})


_B64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_MUL = np.uint64(0x9E3779B97F4A7C15)


def token_hashes(text: str) -> np.ndarray:
    """uint64 hash per whitespace token (crc32 — C speed, stable across
    runs, unlike Python hash(); measured 4x faster than pandas'
    object-dtype hash_array)."""
    import zlib

    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    return np.array([zlib.crc32(t.encode("utf-8")) for t in toks], dtype=np.uint64)


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct uint64 hashes of word k-grams (rolling combine of token
    hashes).  The SQL oracle shingles on the literal joined strings;
    both sides agree because hashing is injective enough at corpus
    scale and the *pair arithmetic* (3*inter >= |A|+|B|) is integral."""
    th = token_hashes(text)
    if len(th) < k:
        return np.empty(0, dtype=np.uint64)
    h = th[: len(th) - k + 1].copy()
    for i in range(1, k):
        h = (h * _MUL + th[i : len(th) - k + 1 + i]) & _B64
    return np.unique(h)


def winnow_fingerprints(text: str, k: int = 5, window: int = 8) -> List[int]:
    """Winnowing sketch: minima of each sliding window over char k-gram
    hashes (public algorithm; robust to local edits)."""
    data = text.encode("utf-8")
    if len(data) < k:
        return []
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    h = arr[: len(arr) - k + 1].copy()
    for i in range(1, k):
        h = (h * _MUL + arr[i : len(arr) - k + 1 + i]) & _B64
    if len(h) <= window:
        return [int(h.min())]
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    return sorted(set(int(x) for x in sw.min(axis=1)))


def winnow_batch(batch: pa.Table, k: int = 5, window: int = 8) -> pa.Table:
    sk = [winnow_fingerprints(t, k, window) for t in batch["text"].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "sketch": pa.array(sk, pa.list_(pa.uint64())),
            "sketch_size": pa.array([len(s) for s in sk], pa.int32()),
        }
    )


# --- repetition signals (Gopher-style, Rae et al. 2021 §A1.1) ---------------


def _exploded_tokens(batch: pa.Table):
    """text column -> (doc_pos int64 array, token Arrow string array),
    whitespace-tokenized (matches ``\\S+`` extraction), order-preserving
    within each doc.  Pure Arrow kernels."""
    split = pc.split_pattern_regex(batch["text"], r"\s+")
    parent = pc.list_parent_indices(split).to_numpy().astype(np.int64)
    flat = pc.list_flatten(split)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    return parent[keep_np], flat.filter(keep)


def rep_signals_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> within-doc repetition fractions — the Gopher
    quality signals (Rae et al. 2021, table A1): duplicate-line
    fraction, duplicate-line CHARACTER fraction, top-word fraction,
    top-bigram fraction.

    Entirely within-row statistics, so the stage is embarrassingly
    parallel — NO shuffle at any corpus size.  Each fraction is one
    IEEE division of two int64 sums, bit-deterministic and mirrored
    1:1 in ANSI SQL (oracle_corpus.rep_signals_sql).  Vectorized:
    Arrow split kernels explode lines/tokens via list_parent_indices;
    duplicate counting is a pandas groupby over the exploded frame —
    no Python loop over rows or tokens."""
    nrows = len(batch)
    dup_line_frac = np.zeros(nrows, dtype=np.float64)
    dup_line_char_frac = np.zeros(nrows, dtype=np.float64)
    top_word_frac = np.zeros(nrows, dtype=np.float64)
    top_bigram_frac = np.zeros(nrows, dtype=np.float64)

    # --- lines ---
    split = pc.split_pattern(batch["text"], "\n")
    parent = pc.list_parent_indices(split).to_numpy().astype(np.int64)
    flat = pc.list_flatten(split)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    ldf = pd.DataFrame(
        {
            "d": parent[keep],
            "line": flat.to_pandas().to_numpy()[keep],
            "l": pc.utf8_length(flat).to_numpy().astype(np.int64)[keep],
        }
    )
    if len(ldf):
        per_line = (
            ldf.groupby(["d", "line"], sort=False)
            .agg(c=("l", "size"), l=("l", "first"))
            .reset_index()
        )
        g = per_line.groupby("d", sort=False)
        dup_occ = g["c"].sum() - g["c"].size()
        tot_occ = g["c"].sum()
        dup_chars = (
            per_line.assign(x=(per_line["c"] - 1) * per_line["l"])
            .groupby("d", sort=False)["x"]
            .sum()
        )
        tot_chars = (
            per_line.assign(x=per_line["c"] * per_line["l"])
            .groupby("d", sort=False)["x"]
            .sum()
        )
        idx = tot_occ.index.to_numpy()
        dup_line_frac[idx] = dup_occ.to_numpy() / tot_occ.to_numpy()
        dup_line_char_frac[idx] = dup_chars.to_numpy() / tot_chars.to_numpy()

    # --- words / bigrams ---
    d, toks = _exploded_tokens(batch)
    if len(d):
        wc = (
            pd.DataFrame({"d": d, "w": toks.to_pandas().to_numpy()})
            .groupby(["d", "w"], sort=False)
            .size()
        )
        mx = wc.groupby(level=0).max()
        tot = wc.groupby(level=0).sum()
        top_word_frac[mx.index.to_numpy()] = mx.to_numpy() / tot.to_numpy()
        if len(d) >= 2:
            same = d[1:] == d[:-1]
            if same.any():
                bg = pc.binary_join_element_wise(
                    toks.slice(0, len(toks) - 1), toks.slice(1), " "
                ).filter(pa.array(same))
                bc = (
                    pd.DataFrame(
                        {"d": d[:-1][same], "g": bg.to_pandas().to_numpy()}
                    )
                    .groupby(["d", "g"], sort=False)
                    .size()
                )
                bmx = bc.groupby(level=0).max()
                btot = bc.groupby(level=0).sum()
                top_bigram_frac[bmx.index.to_numpy()] = (
                    bmx.to_numpy() / btot.to_numpy()
                )

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "dup_line_frac": pa.array(dup_line_frac),
            "dup_line_char_frac": pa.array(dup_line_char_frac),
            "top_word_frac": pa.array(top_word_frac),
            "top_bigram_frac": pa.array(top_bigram_frac),
        }
    )


def rep_signals_stage(docs_ds, batch_size: int = 2048):
    return docs_ds.map_batches(
        rep_signals_batch, batch_format="pyarrow", batch_size=batch_size
    )


def batch_word_ngrams(batch: pa.Table, n: int, return_pos: bool = False):
    """Batch-wide word n-gram explosion: -> (doc_pos int64[G],
    gram_hash uint64[G], gram_strings Arrow string[G]) — plus, with
    ``return_pos``, the 0-based WORD OFFSET of each gram within its
    document (int64[G]), for span/position consumers (dup_spans).

    Fully vectorized: tokens explode once per batch (Arrow kernels),
    every token gets a C-level siphash (``pd.util.hash_array`` — the
    same primitive as ``common.bucket_of``), n-gram hashes are the
    rolling _MUL combine over the FLAT hash array, and the in-doc mask
    ``d[i] == d[i+n-1]`` kills grams that would span documents (parent
    indices are non-decreasing, so the endpoints agreeing implies the
    interior does).  Gram strings come from one
    ``binary_join_element_wise`` over n shifted slices.  No Python loop
    over rows, tokens, or grams."""
    d, toks = _exploded_tokens(batch)
    L = len(d) - n + 1
    empty = (
        np.empty(0, np.int64),
        np.empty(0, np.uint64),
        pa.array([], pa.string()),
    )
    if return_pos:
        empty = empty + (np.empty(0, np.int64),)
    if L <= 0:
        return empty
    th = pd.util.hash_array(toks.to_pandas().to_numpy()).astype(np.uint64)
    h = th[:L].copy()
    for i in range(1, n):
        h = h * _MUL + th[i : L + i]
    valid = d[:L] == d[n - 1 :]
    if not valid.any():
        return empty
    grams = pc.binary_join_element_wise(
        *(toks.slice(j, L) for j in range(n)), " "
    )
    vmask = pa.array(valid)
    dv = d[:L][valid]
    out = (dv, h[valid], grams.filter(vmask))
    if return_pos:
        # gram i starts at flat token i; subtract its doc's first
        # flat-token index to get the 0-based in-doc word offset
        uniq, first = np.unique(d, return_index=True)
        fmap = np.zeros(int(uniq.max()) + 1, dtype=np.int64)
        fmap[uniq] = first
        pos = np.flatnonzero(valid) - fmap[dv]
        out = out + (pos,)
    return out


# --- count-based LM fluency (CCNet-shaped scoring loop) ----------------------

LM_MIN_COUNT = 4
_LM_LUT_CACHE: dict = {}  # per-worker-process LM lookup cache


def _ngram_count_partial(batch: pa.Table, n: int, num_buckets: int) -> pd.DataFrame:
    """Per-batch n-gram count fold (the combiner behind top_ngrams and
    frequent_ngrams): batch-wide vectorized gram explosion
    (:func:`batch_word_ngrams`) + one C-level value_counts — no Python
    loop over rows or grams."""
    _, _, g = batch_word_ngrams(batch, n)
    if len(g) == 0:
        return pd.DataFrame(
            {
                "ngram": pd.Series(dtype=str),
                "cnt": pd.Series(dtype=np.int64),
                "bucket": pd.Series(dtype=np.int32),
            }
        )
    vc = pd.Series(g.to_pandas().to_numpy()).value_counts(sort=False)
    df = pd.DataFrame(
        {
            "ngram": vc.index.to_numpy(),
            "cnt": vc.to_numpy().astype(np.int64),
        }
    )
    df["bucket"] = bucket_of(df["ngram"], num_buckets)
    return df


def frequent_ngrams(
    docs_ds,
    n: int = 2,
    min_count: int = LM_MIN_COUNT,
    num_buckets: int | None = None,
    batch_size: int = 2048,
):
    """Exact global word n-gram counts, filtered to ``cnt >= min_count``
    — the distributed 'train' half of the count-LM scoring loop.  Same
    two-phase shape as :func:`top_ngrams` (shared vectorized per-batch
    fold :func:`_ngram_count_partial` -> bucketed exact sum), but pruned
    by MINIMUM COUNT instead of top-k: a count threshold is
    deterministic under ties, so the pruned set is byte-stable and
    SQL-mirrorable (``HAVING count(*) >= min_count``).

    The survivor table is bounded by the threshold (frequent-n-gram
    vocabularies grow sublinearly in corpus size); at extreme scale
    raise ``min_count`` with the corpus or substitute a count-min
    sketch — documented tradeoff, same regime as the ANN query matrix.
    """
    num_buckets = resolve_parallelism(num_buckets)

    def partial(batch: pa.Table) -> pd.DataFrame:
        return _ngram_count_partial(batch, n, num_buckets)

    def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("ngram", sort=False)["cnt"].sum().reset_index()
        g = g[g["cnt"] >= min_count]
        g["cnt"] = g["cnt"].astype(np.int64)
        return g[["ngram", "cnt"]]

    partials = docs_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )
    return partials.groupby("bucket").map_groups(
        bucket_sum, batch_format="pandas"
    )


def lm_score(docs_ds, lm_ref, n: int = 2, batch_size: int = 2048):
    """(doc_id, text) -> (doc_id, n_bigrams, sum_freq, lm_score,
    oov_frac): score every document against the broadcast
    frequent-n-gram table — the CCNet curation shape (Wenzek et al.
    2020: score each page with a reference LM, filter on the score)
    with the KenLM replaced by corpus n-gram frequencies so the result
    is exactly SQL-mirrorable.

    ``lm_score`` is the mean reference frequency of the doc's n-grams
    (OOV counts 0); ``oov_frac`` the fraction of n-grams missing from
    the table.  Both are a single IEEE division of int64 sums — no
    float accumulation, so no sum-order nondeterminism against the
    oracle.  ``lm_ref`` is a ``ray.put`` handle to the (ngram, cnt)
    pandas frame: shipped once per worker, looked up per batch with a
    C-level hash map (Series.map); the LUT builds ONCE per worker
    process (cached by ref id — rebuilding a 100k-string hash index per
    batch is pure repeated work) — the doc stream never shuffles."""
    import ray

    def _lut_for(ref) -> pd.Series:
        key = ref.hex()
        if key not in _LM_LUT_CACHE:
            lm = ray.get(ref)
            # keep only the newest table: a long-lived worker scoring
            # successive corpus slices must not accumulate one ~100k-
            # string index per superseded ref until OOM
            _LM_LUT_CACHE.clear()
            _LM_LUT_CACHE[key] = pd.Series(
                lm["cnt"].to_numpy(np.int64), index=lm["ngram"], dtype=np.int64
            )
        return _LM_LUT_CACHE[key]

    def score(batch: pa.Table) -> pa.Table:
        lut = _lut_for(lm_ref)
        nrows = len(batch)
        nb = np.zeros(nrows, dtype=np.int64)
        sumc = np.zeros(nrows, dtype=np.int64)
        known = np.zeros(nrows, dtype=np.int64)
        gd, _, grams = batch_word_ngrams(batch, n)
        if len(gd):
            mapped = (
                pd.Series(grams.to_pandas().to_numpy()).map(lut).to_numpy()
            )
            np.add.at(nb, gd, 1)
            hit = ~np.isnan(mapped)
            np.add.at(known, gd[hit], 1)
            np.add.at(sumc, gd[hit], mapped[hit].astype(np.int64))
        nz = nb > 0
        lm_s = np.zeros(nrows, dtype=np.float64)
        oov = np.zeros(nrows, dtype=np.float64)
        lm_s[nz] = sumc[nz] / nb[nz]
        oov[nz] = (nb[nz] - known[nz]) / nb[nz]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bigrams": pa.array(nb),
                "sum_freq": pa.array(sumc),
                "lm_score": pa.array(lm_s),
                "oov_frac": pa.array(oov),
            }
        )

    return docs_ds.map_batches(
        score, batch_format="pyarrow", batch_size=batch_size
    )


# --- PII scrubbing ------------------------------------------------------------

# RE2-safe (no lookaround), shared VERBATIM with the DuckDB oracle —
# both engines are RE2, so match sets coincide byte-for-byte.  Applied
# in this order (email first so its digits can't be half-eaten by the
# phone pattern; the oracle nests replaces in the same order).
PII_PATTERNS = (
    ("n_emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("n_ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # space allowed inside (not \s: a phone must not gobble newlines)
    ("n_phones", r"\+?\d[\d ().-]{7,}\d", "<PHONE>"),
)


def pii_redact_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, redacted, n_emails, n_ips, n_phones):
    C4-style PII scrubbing — emails, IPv4s, phone-shaped digit runs
    replaced by sentinel tokens, per-pattern hit counts kept for
    corpus telemetry.  Stateless vectorized Arrow kernels (compiled
    RE2, no Python loop), no shuffle at any corpus size.  Counts are
    taken on the text each pattern actually sees (post the previous
    replacements), exactly like the SQL mirror's nested replaces."""
    text = batch["text"]
    cols = {"doc_id": batch["doc_id"]}
    for name, pat, repl in PII_PATTERNS:
        cols[name] = pc.cast(
            pc.count_substring_regex(text, pat), pa.int64()
        )
        text = pc.replace_substring_regex(text, pat, repl)
    cols["redacted"] = text
    return pa.table(cols)


def pii_redact_stage(docs_ds, batch_size: int = 4096):
    return docs_ds.map_batches(
        pii_redact_batch, batch_format="pyarrow", batch_size=batch_size
    )


# --- corpus length histogram -------------------------------------------------


def length_histogram(docs_ds, bucket_width: int = 64, batch_size: int = 4096,
                     num_buckets: int | None = None):
    """Token-length histogram over the corpus: (bucket_lo, n_docs) where
    ``bucket_lo = (n_tokens // bucket_width) * bucket_width``.

    Classic combiner shape: each batch folds to one row per occupied
    histogram bucket (vectorized ``np.bincount`` over Arrow-counted
    token totals), then one tiny groupby sums the partials — exchange
    volume is O(buckets x batches), independent of corpus size."""
    num_buckets = resolve_parallelism(num_buckets)

    def partial(batch: pa.Table) -> pd.DataFrame:
        n = pc.count_substring_regex(batch["text"], TOKEN_RE).to_numpy()
        lo = (n // bucket_width).astype(np.int64)
        cnt = np.bincount(lo)
        occ = np.flatnonzero(cnt)
        return pd.DataFrame(
            {
                "bucket_lo": occ * bucket_width,
                "n_docs": cnt[occ].astype(np.int64),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("bucket_lo", sort=False)["n_docs"].sum().reset_index()
        out["n_docs"] = out["n_docs"].astype(np.int64)
        return out

    partials = docs_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )
    return partials.groupby("bucket_lo").map_groups(
        final, batch_format="pandas"
    )


# --- stage wrappers --------------------------------------------------------


def doc_stats_stage(docs_ds, batch_size: int = 4096):
    return docs_ds.map_batches(doc_stats_batch, batch_format="pyarrow", batch_size=batch_size)


def lang_id_stage(docs_ds, batch_size: int = 4096):
    return docs_ds.map_batches(lang_id_batch, batch_format="pyarrow", batch_size=batch_size)


def fingerprint_stage(docs_ds, batch_size: int = 4096):
    return docs_ds.map_batches(fingerprint_batch, batch_format="pyarrow", batch_size=batch_size)


def winnow_stage(docs_ds, k: int = 5, window: int = 8, batch_size: int = 2048):
    return docs_ds.map_batches(
        lambda b: winnow_batch(b, k, window),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def top_ngrams(
    docs_ds,
    n: int = 2,
    k: int = 100,
    num_buckets: int | None = None,
    batch_size: int = 2048,
):
    """Global top-k word n-grams by document-stream frequency
    (vocabulary building — the corpus-statistics primitive behind BPE /
    stopword / boilerplate analysis).

    Three stages, all narrow until the final k rows:
    1. per-batch vectorized count fold (:func:`_ngram_count_partial`)
       -> one (ngram, cnt) row per distinct ngram per batch (the
       combiner: the shuffle moves vocabulary, not tokens);
    2. bucketed groupby on hash(ngram) -> exact global counts, each
       bucket emits only its local top-k (safe: the global top-k is a
       subset of the union of per-bucket top-ks since each ngram lives
       in exactly one bucket);
    3. tiny final fold -> top-k with deterministic ordering
       (cnt desc, ngram asc — byte-stable under any partitioning).
    """
    num_buckets = resolve_parallelism(num_buckets)

    def partial(batch: pa.Table) -> pd.DataFrame:
        return _ngram_count_partial(batch, n, num_buckets)

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("ngram", sort=False)["cnt"].sum().reset_index()
        g = g.sort_values(["cnt", "ngram"], ascending=[False, True], kind="stable")
        return g.head(k)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["cnt", "ngram"], ascending=[False, True], kind="stable")
        out = g.head(k).reset_index(drop=True)
        out["cnt"] = out["cnt"].astype(np.int64)
        return out[["ngram", "cnt"]]

    partials = docs_ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )
    per_bucket = partials.groupby("bucket").map_groups(
        bucket_topk, batch_format="pandas"
    )
    return per_bucket.repartition(1).map_batches(final_topk, batch_format="pandas")


def tfidf_top_terms(
    docs_ds,
    top_k: int = 3,
    num_buckets: int | None = None,
    batch_size: int = 4096,
):
    """Per-document top-k terms by a tf-idf ordering — the term-weighting
    primitive behind keyword extraction and quality-signal features.

    Ranking is (tf DESC, df ASC, term ASC): term frequency primary,
    document frequency as the (inverse-)idf tie-break — an INTEGRAL
    ordering that is hash-identical in SQL (float idf = tf*ln(N/df)
    would rank identically for fixed tf but differ in last-ulp hashing;
    the float score is trivially derivable from the returned tf/df).

    Scale shape (two bucketed exchanges, no join):
      1. per-batch tokenize -> (doc_id, term, tf) rows (tf is final
         in-batch: a document lives in exactly one row);
      2. groupby term-bucket: every term group is complete, so df
         attaches via a vectorized transform — the classic df join
         collapses into the same exchange that computes it;
      3. groupby doc-bucket: per-doc sort + head(k).
    Shuffle volume is the distinct (doc, term) incidence, pre-shrunk by
    in-batch tf folding; skew-safe because both exchanges key on hashed
    vocab/doc ids."""
    num_buckets = resolve_parallelism(num_buckets)
    from .common import bucket_of

    def term_rows(batch: pa.Table) -> pd.DataFrame:
        ids_out, term_out, tf_out = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = t.lower().split()
            if not toks:
                continue
            u, c = np.unique(toks, return_counts=True)
            ids_out.append(np.full(len(u), d, dtype=np.int64))
            term_out.append(u)
            tf_out.append(c.astype(np.int64))
        if not ids_out:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype=np.int64),
                 "term": pd.Series(dtype=object),
                 "tf": pd.Series(dtype=np.int64),
                 "bucket": pd.Series(dtype=np.int32)}
            )
        terms = np.concatenate(term_out)
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(ids_out),
                "term": terms,
                "tf": np.concatenate(tf_out),
                "bucket": bucket_of(terms, num_buckets),
            }
        )

    def attach_df(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc_id", "term", "tf"]].copy()
        out["df"] = df.groupby("term", sort=False)["doc_id"].transform("size")
        out["dbucket"] = (out["doc_id"].to_numpy(np.int64) % num_buckets).astype(
            np.int32
        )
        return out

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["doc_id", "tf", "df", "term"],
            ascending=[True, False, True, True],
            kind="stable",
        )
        g["rank"] = g.groupby("doc_id", sort=False).cumcount() + 1
        g = g[g["rank"] <= top_k]
        g["rank"] = g["rank"].astype(np.int64)
        g["df"] = g["df"].astype(np.int64)
        return g[["doc_id", "term", "tf", "df", "rank"]]

    rows = docs_ds.map_batches(
        term_rows, batch_format="pyarrow", batch_size=batch_size
    )
    with_df = rows.groupby("bucket").map_groups(attach_df, batch_format="pandas")
    return with_df.groupby("dbucket").map_groups(topk, batch_format="pandas")


def heavy_hitters(
    docs_ds,
    k: int = 200,
    num_buckets: int | None = None,
    batch_size: int = 2048,
):
    """EXACT phi-heavy hitters (phi = 1/k) over the corpus token
    stream — every token whose global count strictly exceeds N/k,
    with its exact count — via the classic two-pass candidate/verify
    shape (Misra-Gries / SpaceSaving's distributed form), so the full
    token vocabulary NEVER crosses the wire:

    1. Candidate pass: per batch, exact in-batch token counts
       (np.unique — the vectorized equivalent of a k-counter
       Misra-Gries summary over a batch that fits in memory); keep
       tokens with ``cnt_b * k > n_b``.  Pigeonhole guarantee: a token
       with global count > N/k must clear that threshold in at least
       one batch, so the union of per-batch candidates is a SUPERSET
       of the answer — and each batch emits FEWER THAN k rows by
       construction, so the driver-folded candidate set is bounded by
       k x n_batches (scalars + a small vocabulary, not data).
    2. Verify pass: the deduped candidate array broadcasts once
       (``ray.put``); each batch recounts ONLY candidates, one
       bucketed merge sums them, and the final filter ``cnt * k > N``
       (N = exact total tokens, folded from pass-1 partials) makes the
       output exact.

    Tokens are ``\\S+`` runs (``str.split()``), mirrored by the SQL
    oracle's ``regexp_extract_all(text, '\\S+')``.  Output
    ``(token, cnt)``, BIGINT counts.
    """
    import ray

    num_buckets = resolve_parallelism(num_buckets)

    def candidates_partial(batch: pa.Table) -> pa.Table:
        toks: List[np.ndarray] = []
        for t in batch["text"].to_pylist():
            w = (t or "").split()
            if w:
                toks.append(np.asarray(w, dtype=object))
        if not toks:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "n_b": pa.array([], pa.int64())}
            )
        flat = np.concatenate(toks)
        vals, cnt = np.unique(flat.astype(str), return_counts=True)
        n_b = len(flat)
        keep = cnt.astype(np.int64) * k > n_b
        # one extra row (token = "", n_b = batch total) carries the
        # exact token-count partial alongside the candidates
        return pa.table(
            {
                "token": pa.array(
                    vals[keep].tolist() + [""], pa.string()
                ),
                "n_b": pa.array(
                    np.concatenate(
                        [np.zeros(int(keep.sum()), dtype=np.int64),
                         np.asarray([n_b], dtype=np.int64)]
                    ),
                    pa.int64(),
                ),
            }
        )

    # bounded driver fold: < k candidate rows + 1 scalar row per batch
    pass1 = docs_ds.map_batches(
        candidates_partial, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()
    if "n_b" not in pass1.columns:  # empty shard set yields no batches
        pass1 = pd.DataFrame({"token": [], "n_b": []})
    n_total = int(pass1["n_b"].sum())
    cand = np.unique(
        pass1.loc[pass1["token"] != "", "token"].to_numpy(dtype=object).astype(str)
    )
    if len(cand) == 0 or n_total == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {"token": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        )
    cand_ref = ray.put(cand)  # broadcast ONCE, read per task

    def verify_partial(batch: pa.Table) -> pa.Table:
        cd = ray.get(cand_ref)
        toks: List[np.ndarray] = []
        for t in batch["text"].to_pylist():
            w = (t or "").split()
            if w:
                toks.append(np.asarray(w, dtype=object))
        if not toks:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64()),
                 "_bucket": pa.array([], pa.int32())}
            )
        flat = np.concatenate(toks).astype(str)
        flat = flat[np.isin(flat, cd)]
        vals, cnt = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "token": pa.array(vals.tolist(), pa.string()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "_bucket": pa.array(
                    bucket_of(pd.Series(vals, dtype=object), num_buckets),
                    pa.int32(),
                ),
            }
        )

    def merge_threshold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "token" not in df.columns:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        g = df.groupby("token", sort=False, as_index=False)["cnt"].sum()
        g = g[g["cnt"].to_numpy(np.int64) * k > n_total]
        g["cnt"] = g["cnt"].astype(np.int64)
        return g[["token", "cnt"]]

    return (
        docs_ds.map_batches(
            verify_partial, batch_format="pyarrow", batch_size=batch_size
        )
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(merge_threshold, batch_format="pandas")
    )


def _cms_positions(tokens: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) Count-Min cell positions per token: one blake2b-64
    per token split into (h1, h2|1), rows derived by the standard
    double-hashing scheme ``(h1 + i*h2) % width`` — deterministic,
    platform-independent, vectorized after the single digest pass."""
    h64 = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(
                    str(t).encode("utf-8"), digest_size=8
                ).digest(),
                "big",
            )
            for t in tokens
        ),
        dtype=np.uint64,
        count=len(tokens),
    )
    h1 = h64 & np.uint64(0xFFFFFFFF)
    h2 = (h64 >> np.uint64(32)) | np.uint64(1)
    rows = np.arange(depth, dtype=np.uint64)[:, None]
    return ((h1[None, :] + rows * h2[None, :]) % np.uint64(width)).astype(
        np.int64
    )


def cms_heavy_hitters(
    docs_ds,
    k: int = 150,
    width: int = 8192,
    depth: int = 4,
    num_buckets: int | None = None,
    batch_size: int = 2048,
):
    """Count-Min-sketch heavy hitters (Cormode & Muthukrishnan 2005) —
    the SKETCH path for the 100-TB regime, cross-validated against the
    exact two-pass answer the way :func:`~.graph.ball2_check` validates
    HyperBall: output ``(token, cnt, cms_within_tol)`` for every exact
    1/k-heavy hitter, where ``cnt`` is the EXACT count and
    ``cms_within_tol`` is the deterministic boolean

        est >= cnt  AND  est <= cnt + max(1, 4 * N // width)

    with ``est`` the sketch's min-over-rows estimate and ``N`` the
    total token count.  The sketch merge is an element-wise counter
    sum — commutative and associative — so ``est`` is a pure function
    of the corpus token MULTISET under any partitioning/batching: the
    boolean is deterministic and the SQL mirror asserts it as TRUE
    alongside the exact counts (tolerance-oracle pattern).

    Wire shape: ONE counter row per batch (depth x width int64 shipped
    as binary — 256 KiB at the 4 x 8192 default) folded on the driver
    — bounded by batch count, never by vocabulary; the exact side
    reuses :func:`heavy_hitters`'s candidate/verify passes.
    """
    import ray.data as rd

    def sketch_partial(batch: pa.Table) -> pa.Table:
        toks: List[np.ndarray] = []
        for t in batch["text"].to_pylist():
            w = (t or "").split()
            if w:
                toks.append(np.asarray(w, dtype=object))
        counters = np.zeros((depth, width), dtype=np.int64)
        n_b = 0
        if toks:
            flat = np.concatenate(toks).astype(str)
            n_b = len(flat)
            vals, cnt = np.unique(flat, return_counts=True)
            pos = _cms_positions(vals, depth, width)
            for i in range(depth):
                np.add.at(counters[i], pos[i], cnt.astype(np.int64))
        return pa.table(
            {
                "sketch": pa.array([counters.tobytes()], pa.binary()),
                "n_b": pa.array([n_b], pa.int64()),
            }
        )

    parts = docs_ds.map_batches(
        sketch_partial, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()  # bounded: one counter row per batch
    counters = np.zeros((depth, width), dtype=np.int64)
    if "sketch" in parts.columns:  # an empty shard set yields no batches
        for buf in parts["sketch"]:
            counters += np.frombuffer(buf, dtype=np.int64).reshape(
                depth, width
            )
    n_total = int(parts["n_b"].sum()) if "n_b" in parts.columns else 0

    exact = heavy_hitters(
        docs_ds, k=k, num_buckets=num_buckets, batch_size=batch_size
    ).to_pandas()  # bounded: < k rows by the phi-HH definition
    if len(exact) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                    "cms_within_tol": pa.array([], pa.bool_()),
                }
            )
        )
    tok = exact["token"].to_numpy(dtype=object)
    cnt = exact["cnt"].to_numpy(np.int64)
    pos = _cms_positions(tok, depth, width)
    est = counters[np.arange(depth)[:, None], pos].min(axis=0)
    tol = max(1, (4 * n_total) // width)
    within = (est >= cnt) & (est <= cnt + tol)
    return rd.from_arrow(
        pa.table(
            {
                "token": pa.array(tok.tolist(), pa.string()),
                "cnt": pa.array(cnt, pa.int64()),
                "cms_within_tol": pa.array(within.tolist(), pa.bool_()),
            }
        )
    )


# BPE-ish pretokenizer (GPT-2-style shape: contraction suffixes, letter
# runs, digit runs, punctuation runs, each with an optional leading
# space) restricted to the RE2-and-DuckDB-common subset — no \p{L}
# (Python re lacks it) and no lookahead (RE2 lacks it): the SAME string
# runs verbatim in pyarrow (RE2) and DuckDB (RE2), so both engines
# count identical non-overlapping matches by construction.
BPE_TOKEN_PATTERN = (
    r"'(?:ll|ve|re|[sdmt])"
    r"| ?[A-Za-zÀ-ÿ]+"
    r"| ?[0-9]+"
    r"| ?[^\sA-Za-zÀ-ÿ0-9]+"
)


def bpe_token_counts(docs_ds, batch_size: int = 4096):
    """Per-document token counting under BOTH tokenization regimes a
    data pipeline budgets with: whitespace tokens (``\\S+`` runs, the
    heavy-hitters/doc_stats convention) and BPE-ish pretokens
    (:data:`BPE_TOKEN_PATTERN` — the GPT-2 pretokenizer shape, the
    better proxy for LLM token cost on punctuation/number-dense text).
    Output ``(doc_id, n_ws_tokens, n_bpe_tokens)``.

    Shuffle-free: one zero-copy Arrow map, both counts from RE2 kernels
    (``pc.count_substring_regex``) — no Python loop, no token strings
    materialized."""

    def counts(batch: pa.Table) -> pa.Table:
        txt = pc.cast(batch["text"], pa.string())
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_ws_tokens": pc.cast(
                    pc.count_substring_regex(txt, pattern=r"\S+"),
                    pa.int64(),
                ),
                "n_bpe_tokens": pc.cast(
                    pc.count_substring_regex(
                        txt, pattern=BPE_TOKEN_PATTERN
                    ),
                    pa.int64(),
                ),
            }
        )

    return docs_ds.map_batches(
        counts, batch_format="pyarrow", batch_size=batch_size
    )
