"""Answer highlighting: locate an extracted answer's span inside the
raw window context (reference ``features/highlights.py:61-232``).

The reference drives this with fuzzywuzzy + fuzzysearch (neither is
installed here); the same contract is re-implemented on a semi-global
edit-distance DP (`find_near_matches`): free start/end in the haystack,
per-end-position minimal edit distance, candidates within the
length-bucketed Levenshtein budget, best = minimum distance with the
earliest occurrence winning ties (mirroring ``scores.index(min)``).
Alias variations are searched before the canonical form, like
``include_variations(query) + [query]``.

These are scalar kernels; `highlight_stage` lifts them over an answers
Dataset carrying ``(prediction, sent_ids, context)`` columns.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from .fuzzy import get_levenshtein_dist, include_variations
from .grammar import check_sent_id_is_valid, split_context_into_sentences


def find_sentence_of_sent_id(context: str, sent_id: int) -> str:
    """Sentence number ``sent_id`` (1-based, newline-partitioned;
    highlights.py:61-76)."""
    assert sent_id >= 0, f"SENT id must be greater or equal to 0. Received: {sent_id}"
    return split_context_into_sentences(context)[sent_id - 1]


def find_indexes_of_sentence(
    context: str, sent_id: int
) -> Union[Tuple[int, int], Tuple[None, None]]:
    """(start_char, end_char) of the sentence in the context
    (highlights.py:79-93: end = next newline after start, -1 if none)."""
    sentence = find_sentence_of_sent_id(context, sent_id)
    start_char = context.find(sentence)
    end_char = context.find("\n", start_char)
    return start_char, end_char


def find_near_matches(
    query: str, text: str, max_l_dist: int
) -> List[Tuple[int, int, int]]:
    """Approximate occurrences of ``query`` in ``text`` with edit
    distance <= ``max_l_dist``: list of (start, end, dist), one per
    admissible end position (local minima), ordered by end.

    Semi-global DP (query consumed fully, haystack start/end free),
    vectorized over the haystack axis; start positions are recovered
    from a companion start-pointer matrix.
    """
    m, n = len(query), len(text)
    if m == 0 or n == 0:
        return []
    prev = np.zeros(n + 1, dtype=np.int32)  # D[0, j] = 0 (free start)
    prev_start = np.arange(n + 1, dtype=np.int32)  # match starts at j
    tc = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    for i, qc in enumerate(query, start=1):
        cur = np.empty(n + 1, dtype=np.int32)
        cur_start = np.empty(n + 1, dtype=np.int32)
        cur[0] = i
        cur_start[0] = 0
        qv = np.uint32(ord(qc))
        sub = prev[:-1] + (tc != qv)  # diagonal (match/substitute)
        dele = prev[1:] + 1  # skip this query char
        # the two text-parallel candidates vectorize; the insertion
        # (skip a text char) depends on cur[j-1], one sequential pass
        best = np.minimum(sub, dele)
        best_start = np.where(sub <= dele, prev_start[:-1], prev_start[1:])
        for j in range(1, n + 1):
            ins = cur[j - 1] + 1
            if best[j - 1] <= ins:
                cur[j] = best[j - 1]
                cur_start[j] = best_start[j - 1]
            else:
                cur[j] = ins
                cur_start[j] = cur_start[j - 1]
        prev, prev_start = cur, cur_start
    out = []
    d = prev[1:]
    ok = np.flatnonzero(d <= max_l_dist)
    # keep local minima runs' best end (mirror fuzzysearch's grouped
    # matches closely enough: one candidate per contiguous run)
    i = 0
    while i < len(ok):
        j = i
        while j + 1 < len(ok) and ok[j + 1] == ok[j] + 1:
            j += 1
        run = ok[i : j + 1]
        best_local = run[np.argmin(d[run])]
        end = int(best_local) + 1
        out.append((int(prev_start[end]), end, int(d[best_local])))
        i = j + 1
    return out


def fuzzy_extract(
    query_string: str,
    large_string: str,
    max_levenshtein_dist: Union[int, dict] = -1,
) -> Union[Tuple[int, int], Tuple[None, None]]:
    """Best (start, end) of the query or its alias variations in the
    haystack; (None, None) when nothing admissible
    (highlights.py:109-174)."""
    query_strings = include_variations(query_string) + [query_string]
    large = large_string.lower()
    best: Optional[Tuple[int, int, int]] = None
    for q in query_strings:
        q = q.lower()
        if isinstance(max_levenshtein_dist, dict):
            budget = get_levenshtein_dist(q, max_levenshtein_dist)
        elif max_levenshtein_dist == -1:
            budget = get_levenshtein_dist(q)
        else:
            budget = max_levenshtein_dist
        for start, end, dist in find_near_matches(q, large, budget):
            if best is None or dist < best[2]:
                best = (start, end, dist)
    if best is None:
        return None, None
    return best[0], best[1]


def get_answer_highlight(
    answer: str,
    sent_id: int,
    context: str,
    sentence_expansion: int = 0,
) -> Union[Tuple[int, int, str], Tuple[None, None, None]]:
    """(start_char, end_char, highlight) of the answer within the
    context, searching the SENT-id sentence (optionally expanded N
    sentences forward for answers spanning linebreaks)
    (highlights.py:177-232)."""
    sentence = find_sentence_of_sent_id(context, sent_id)
    expanded = [sentence]
    for i in range(1, sentence_expansion + 1):
        if not check_sent_id_is_valid(context, sent_id + i):
            break
        expanded.append(find_sentence_of_sent_id(context, sent_id + i))
    sentence = " ".join(expanded)

    shift, _ = find_indexes_of_sentence(context, sent_id)
    start_char, end_char = fuzzy_extract(answer, sentence)
    if start_char is None or end_char is None:
        return None, None, None
    return start_char + shift, end_char + shift, context[start_char + shift : end_char + shift]


def highlight_stage(
    ds,
    answer_col: str = "prediction",
    sent_col: str = "sent_ids",
    context_col: str = "context",
    sentence_expansion: int = 2,
    batch_size: int = 2048,
):
    """Dataset with (answer, sent_ids, context) -> + (hl_start, hl_end,
    highlight) columns (stateless map_batches)."""
    import pyarrow as pa

    def add(batch: pa.Table) -> pa.Table:
        answers = batch[answer_col].to_pylist()
        sids = batch[sent_col].to_pylist()
        ctxs = batch[context_col].to_pylist()
        ss, ee, hh = [], [], []
        for a, s, c in zip(answers, sids, ctxs):
            sid = s[0] if isinstance(s, list) and s else (s if isinstance(s, int) else 0)
            if not a or not c or not sid:
                ss.append(None), ee.append(None), hh.append(None)
                continue
            st, en, hl = get_answer_highlight(a, sid, c, sentence_expansion)
            ss.append(st), ee.append(en), hh.append(hl)
        batch = batch.append_column("hl_start", pa.array(ss, pa.int64()))
        batch = batch.append_column("hl_end", pa.array(ee, pa.int64()))
        return batch.append_column("highlight", pa.array(hh, pa.string()))

    return ds.map_batches(add, batch_format="pyarrow", batch_size=batch_size)
