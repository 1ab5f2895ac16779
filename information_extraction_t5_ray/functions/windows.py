"""Sliding-window / positional context extraction.

Replicates the context semantics of the reference's
``features/context.py`` (six strategies: max_size, position, windows,
token, position_token, windows_token — context.py:344-454) as ONE
unified implementation over an abstract *unit axis*: units are chars
(char strategies) or tokens (token strategies).  The reference ships
two near-duplicate ~100-line functions; here the initial-bounds step is
the only mode branch and the fractional shrink loop / ellipsis
space-snapping are shared.  Behavior quirks preserved on purpose (all
parity-tested against the reference):

* ``token_lens[0] -= 1`` first-token ``▁`` adjustment (context.py:8-15).
* 20-step fractional shrink to fit the sentence-id budget
  (context.py:70-95 / 229-257).
* Ellipsis snapping: ``find(' ')`` forward from start, ``rfind(' ')``
  back from end, ``position_offset = start - 3`` when a leading
  ellipsis is added (context.py:97-108 / 259-270) — including the
  ``rfind`` -1 fallthrough when no space exists.
* Window advance ``start += int(len(context) * (1 - overlap))`` and the
  ``max_windows`` cap (context.py:133-173 / 296-341).
* The tiling assertion on tokenizer offsets (context.py:318-319).

Text passed in must already be cleaned (`textnorm.clean_text`); the
reference fuses cleaning into ``get_context`` (context.py:406-416), our
pipeline runs it as its own zero-copy stage.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from .tokenizer import Tokenizer

SENT_ID_CHAR_COST_PROBE = "[SENT1]"  # context.py:64
SENT_ID_TOKEN_COST_PROBE = "[SENT10]"  # context.py:223
DEFAULT_QUESTION = "Qual?"


def get_tokens_and_offsets(
    text: str, tokenizer: Tokenizer
) -> List[Tuple[str, int, int]]:
    """context.py:8-15 — char start/end per token; first ``▁`` dropped."""
    tokens = tokenizer.tokenize(text)
    token_lens = [len(t) for t in tokens]
    token_lens[0] -= 1
    ends = np.cumsum(token_lens)
    starts = [0] + ends[:-1].tolist()
    return list(zip(tokens, starts, ends))


def get_token_id_from_position(
    tokens_and_offsets: List[Tuple[str, int, int]], position: int
) -> int:
    """context.py:18-23 (vectorized; same fallback to the last token)."""
    ends = np.fromiter((e for _, _, e in tokens_and_offsets), dtype=np.int64)
    idx = int(np.searchsorted(ends, position, side="right"))
    if idx >= len(ends) or position < tokens_and_offsets[idx][1]:
        # out-of-range (incl. negative) falls through to the last token,
        # matching the reference's linear-scan fallback
        return len(ends) - 1
    return idx


def get_max_size_context(
    text: str, max_size: int = 4000, question: str = DEFAULT_QUESTION
) -> str:
    """context.py:26-36."""
    prefix = f"question: {question} context: "
    remaining = max_size - len(prefix)
    return text[: remaining - 4] + " ..."


class _Axis:
    """Unit axis: bounds arithmetic in units, rendering in chars."""

    def __init__(self, text: str, toks: Optional[List[Tuple[str, int, int]]]):
        self.text = text
        self.toks = toks  # None => char mode

    @property
    def n_units(self) -> int:
        return len(self.text) if self.toks is None else len(self.toks)

    def char_start(self, unit: int) -> int:
        return unit if self.toks is None else self.toks[unit][1]

    def char_end(self, end_unit: int) -> int:
        # end_unit is exclusive; token mode indexes end_unit-1 which may
        # wrap to the last token when shrunk to zero (reference quirk)
        return end_unit if self.toks is None else int(self.toks[end_unit - 1][2])

    def unit_of(self, position: int) -> int:
        return position if self.toks is None else get_token_id_from_position(self.toks, position)


def _position_context(
    text: str,
    start_position: int,
    proportion_before: float,
    budget: int,
    question: str,
    use_sentence_id: bool,
    tokenizer: Optional[Tokenizer] = None,
    toks: Optional[List[Tuple[str, int, int]]] = None,
    token_mode: bool = False,
) -> Tuple[str, int]:
    """Unified get_position_context / get_position_token_context
    (context.py:39-130 and 191-293)."""
    prefix = f"question: {question} context: "
    if token_mode:
        if toks is None:
            toks = get_tokens_and_offsets(text, tokenizer)
        remaining = budget - len(tokenizer.tokenize(prefix))
        sent_cost_each = (
            len(tokenizer.tokenize(SENT_ID_TOKEN_COST_PROBE)) if use_sentence_id else 0
        )
    else:
        remaining = budget - len(prefix)
        sent_cost_each = len(SENT_ID_CHAR_COST_PROBE) if use_sentence_id else 0

    axis = _Axis(text, toks if token_mode else None)

    # --- initial bounds (the one mode branch; context.py:59-61 vs 215-217)
    if token_mode:
        pos_u = axis.unit_of(start_position)
        start_u = max(0, pos_u - math.floor(remaining * proportion_before))
        end_u = min(pos_u + math.ceil(remaining * (1 - proportion_before)), axis.n_units)
    else:
        pos_u = start_position
        start_u = max(0, start_position - math.floor(remaining * proportion_before))
        end_u = min(axis.n_units, remaining + start_u)

    start_c, end_c = axis.char_start(start_u), axis.char_end(end_u)

    def sent_cost(s: int, e: int) -> int:
        if not use_sentence_id:
            return 0
        return (text[s:e].count("\n") + 1) * sent_cost_each

    cost = sent_cost(start_c, end_c)
    size = end_u - start_u

    # --- fractional shrink loop (context.py:70-95 / 229-257)
    if size + cost > remaining:
        to_remove = (size + cost) - remaining
        fractions = [to_remove // 20] * 20 + [to_remove % 20]
        for frac in fractions:
            if start_c == start_position:
                end_u -= frac
            else:
                before = math.floor(frac * proportion_before)
                before = min(before, pos_u - start_u)
                start_u += before
                end_u -= frac - before
            start_c, end_c = axis.char_start(start_u), axis.char_end(end_u)
            cost = sent_cost(start_c, end_c)
            size = end_u - start_u
            if size + cost <= remaining:
                break

    # --- ellipsis + space snapping (context.py:97-108 / 259-270)
    start_ellipsis = end_ellipsis = False
    if start_c != 0:
        start_ellipsis = True
        start_c = max(start_c, text.find(" ", start_c, start_position))
        position_offset = start_c - 3
    else:
        position_offset = start_c
    if end_c < len(text):
        end_ellipsis = True
        end_c = text.rfind(" ", start_position, end_c)

    context = (
        ("..." if start_ellipsis else "") + text[start_c:end_c] + ("..." if end_ellipsis else "")
    )
    return context, position_offset


def get_position_context(
    text: str,
    max_size: int = 4000,
    start_position: int = 0,
    proportion_before: float = 0.2,
    question: str = DEFAULT_QUESTION,
    use_sentence_id: bool = False,
) -> Tuple[str, int]:
    """context.py:39-130 (char budget)."""
    return _position_context(
        text, start_position, proportion_before, max_size, question, use_sentence_id
    )


def get_position_token_context(
    text: str,
    start_position: int = 0,
    proportion_before: float = 0.2,
    tokenizer: Optional[Tokenizer] = None,
    max_tokens: int = 512,
    tokens_and_offsets: Optional[List[Tuple[str, int, int]]] = None,
    question: str = DEFAULT_QUESTION,
    use_sentence_id: bool = False,
) -> Tuple[str, int]:
    """context.py:191-293 (token budget)."""
    return _position_context(
        text,
        start_position,
        proportion_before,
        max_tokens,
        question,
        use_sentence_id,
        tokenizer=tokenizer,
        toks=tokens_and_offsets,
        token_mode=True,
    )


def get_token_context(
    text: str,
    tokenizer: Optional[Tokenizer] = None,
    max_tokens: int = 512,
    question: str = DEFAULT_QUESTION,
    use_sentence_id: bool = False,
) -> Tuple[str, int]:
    """context.py:176-188 — first max_tokens tokens."""
    return get_position_token_context(
        text,
        start_position=0,
        proportion_before=0,
        tokenizer=tokenizer,
        max_tokens=max_tokens,
        question=question,
        use_sentence_id=use_sentence_id,
    )


def _windows(
    text: str,
    window_overlap: float,
    max_windows: int,
    position_fn,
) -> Tuple[List[str], List[int]]:
    """Unified sliding-window loop (context.py:133-173 / 296-341)."""
    assert max_windows != 0, (
        "Set max_windows higher than 0 to get a specific quantity of windows, "
        "or below to extract all possible ones."
    )
    contexts: List[str] = []
    offsets: List[int] = []
    start_position, position_offset, context = 0, 0, ""
    while position_offset + len(context) < len(text):
        context, position_offset = position_fn(start_position)
        contexts.append(context)
        offsets.append(position_offset)
        start_position += int(len(context) * (1 - window_overlap))
        if max_windows > 0 and len(contexts) == max_windows:
            break
    return contexts, offsets


def get_windows_context(
    text: str,
    max_size: int = 4000,
    window_overlap: float = 0.5,
    max_windows: int = 3,
    question: str = DEFAULT_QUESTION,
    use_sentence_id: bool = False,
) -> Tuple[List[str], List[int]]:
    """context.py:133-173 — char-budget sliding windows."""
    return _windows(
        text,
        window_overlap,
        max_windows,
        lambda pos: _position_context(
            text, pos, 0, max_size, question, use_sentence_id
        ),
    )


def get_windows_token_context(
    text: str,
    window_overlap: float = 0.5,
    max_windows: int = 3,
    tokenizer: Optional[Tokenizer] = None,
    max_tokens: int = 512,
    question: str = DEFAULT_QUESTION,
    use_sentence_id: bool = False,
    uuid: str = "",
) -> Tuple[List[str], List[int]]:
    """context.py:296-341 — token-budget sliding windows (the default
    strategy, params.yaml:57)."""
    toks = get_tokens_and_offsets(text, tokenizer)
    assert len(text) == toks[-1][2], (
        f"The original document ({uuid}) and the end of last token are not "
        f"matching: {len(text)} != {toks[-1][2]}"
    )
    return _windows(
        text,
        window_overlap,
        max_windows,
        lambda pos: _position_context(
            text,
            pos,
            0,
            max_tokens,
            question,
            use_sentence_id,
            tokenizer=tokenizer,
            toks=toks,
            token_mode=True,
        ),
    )


def get_context(
    text: str,
    context_content: str = "windows_token",
    max_size: int = 4000,
    start_position: int = 0,
    proportion_before: float = 0.2,
    use_sentence_id: bool = False,
    tokenizer: Optional[Tokenizer] = None,
    max_tokens: int = 512,
    question: str = DEFAULT_QUESTION,
    window_overlap: float = 0.5,
    max_windows: int = 3,
    uuid: str = "",
):
    """Strategy dispatcher (context.py:344-454, minus the fused cleaning —
    callers clean first).  Windows strategies return (list, list); the
    rest (str, int)."""
    if context_content == "max_size":
        return get_max_size_context(text, max_size, question), 0
    if context_content == "position":
        return get_position_context(
            text, max_size, start_position, proportion_before, question, use_sentence_id
        )
    if context_content == "windows":
        return get_windows_context(
            text, max_size, window_overlap, max_windows, question, use_sentence_id
        )
    if context_content == "token":
        return get_token_context(text, tokenizer, max_tokens, question, use_sentence_id)
    if context_content == "position_token":
        return get_position_token_context(
            text,
            start_position,
            proportion_before,
            tokenizer,
            max_tokens,
            question=question,
            use_sentence_id=use_sentence_id,
        )
    if context_content == "windows_token":
        return get_windows_token_context(
            text,
            window_overlap,
            max_windows,
            tokenizer,
            max_tokens,
            question,
            use_sentence_id,
            uuid=uuid,
        )
    return "", 0
