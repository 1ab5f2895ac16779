"""Text normalization: the byte-identical cleaning chain and answer
normalization.

Reference semantics (must match byte-for-byte, the per-row invariant of
``BASELINE.json.input_hint``):

* ``clean_text`` replicates the ordered regex chain of
  ``/root/reference/information_extraction_t5/features/context.py:406-416``
  plus the crazy-char strip done upstream at
  ``data/basic_to_squad.py:226``.
* ``normalize_answer`` replicates
  ``/root/reference/information_extraction_t5/utils/metrics.py:14-37``
  (lower -> strip punctuation -> strip accents (NFD) -> drop English
  articles -> collapse whitespace).  It is our canonicalization groupby
  key.

Two implementations of the cleaning chain are provided:

* ``clean_text`` — scalar, pure Python ``re`` (the executable spec).
* ``clean_chunked_array`` — vectorized over a ``pyarrow`` string array
  using RE2 kernels.  RE2 has no backreferences, so the reference's
  ``(\\s)\\1+ -> \\1`` pass is decomposed into per-character run
  collapses (provably equivalent: collapsing a run of one whitespace
  char never creates a new run of a *different* char).  Exotic unicode
  whitespace (anything outside space/newline after the first two
  passes) is detected per batch and falls back to the scalar path for
  the rare rows that contain it.
"""

from __future__ import annotations

import re
import string
import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

# The exact set of characters Python's re ``\\s`` matches on str inputs
# (computed once at import; used to build RE2-compatible explicit classes).
_RE_WS_PROBE = re.compile(r"\s")
_PY_RE_WS = "".join(chr(c) for c in range(0x3100) if _RE_WS_PROBE.match(chr(c)))
# The exact set str.strip() strips (chars where str.isspace() is True).
_PY_STRIP_WS = "".join(chr(c) for c in range(0x3100) if chr(c).isspace())

_WS_CLASS = "[" + re.escape(_PY_RE_WS) + "]"

_RE_NL_RUN = re.compile(r"\s*\n+\s*")
_RE_SAME_WS_RUN = re.compile(r"(\s)\1+")

CRAZY_CHARS = "༡༨/༢"  # stripped before windowing (basic_to_squad.py:226)


def clean_text(text: str) -> str:
    """Scalar reference chain. Order of operations is load-bearing
    (context.py:409-416: tab->space, newline-run collapse, same-char
    whitespace-run collapse, quote/TM/ellipsis fixes, strip)."""
    text = text.replace(CRAZY_CHARS, "")
    text = text.replace("\t", " ")
    text = _RE_NL_RUN.sub("\n", text)
    text = _RE_SAME_WS_RUN.sub(r"\1", text)
    text = text.replace("´", "'")
    text = text.replace("™", "TM")
    text = text.replace("…", "...")
    return text.strip()


# --- vectorized Arrow path -------------------------------------------------

# After tab->space and newline-run collapse, the only *common* repeated
# whitespace char left is the plain space.  Everything else is exotic.
_EXOTIC_WS = "".join(c for c in _PY_RE_WS if c not in " \n\t")
_EXOTIC_RUN_RE2 = "[" + _EXOTIC_WS + "]{2}|[" + _EXOTIC_WS + "]\n|\n[" + _EXOTIC_WS + "]"


def clean_chunked_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized ``clean_text`` over an Arrow string array (RE2 kernels).

    Falls back to the scalar chain for rows containing exotic unicode
    whitespace runs (rare in web text; correctness verified by property
    tests against ``clean_text``).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.replace_substring(arr, CRAZY_CHARS, "")
    arr = pc.replace_substring(arr, "\t", " ")
    # \s*\n+\s* -> \n  with the exact Python \s char class
    arr = pc.replace_substring_regex(
        arr, _WS_CLASS + "*\n+" + _WS_CLASS + "*", "\n"
    )
    # (\s)\1+ -> \1 decomposed: space runs (the common case) ...
    arr = pc.replace_substring_regex(arr, "  +", " ")
    # ... exotic whitespace runs: detect, then scalar-fix just those rows.
    exotic = pc.match_substring_regex(arr, _EXOTIC_RUN_RE2)
    if pc.any(exotic).as_py():
        fixed = []
        for i, has in enumerate(exotic):
            s = arr[i].as_py()
            if has.as_py() and s is not None:
                s = _RE_SAME_WS_RUN.sub(r"\1", s)
            fixed.append(s)
        arr = pa.array(fixed, type=arr.type)
    arr = pc.replace_substring(arr, "´", "'")
    arr = pc.replace_substring(arr, "™", "TM")
    arr = pc.replace_substring(arr, "…", "...")
    arr = pc.utf8_trim(arr, _PY_STRIP_WS)
    return arr


# --- HTML -> text ----------------------------------------------------------

_RE_TAG = re.compile(r"<[^>]*>")
_HTML_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&#39;": "'"}


def html_to_text(html: bytes | str) -> str:
    """Minimal deterministic HTML->text: drop tags, unescape the five
    basic entities.  Matches the trivial ``<html><body><pre>...`` wrapper
    of the synthetic pages byte-exactly (FIXTURES.md F1)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    text = _RE_TAG.sub("", html)
    for ent, ch in _HTML_ENTITIES.items():
        text = text.replace(ent, ch)
    return text


def html_to_text_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized ``html_to_text`` over an Arrow binary/string array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.large_string() if pa.types.is_large_binary(arr.type) else pa.string())
    arr = pc.replace_substring_regex(arr, "<[^>]*>", "")
    for ent, ch in _HTML_ENTITIES.items():
        arr = pc.replace_substring(arr, ent, ch)
    return arr


# --- normalize_answer ------------------------------------------------------

_PUNC = set(string.punctuation)
_PUNC_TABLE = str.maketrans("", "", string.punctuation)
_RE_ARTICLES = re.compile(r"\b(a|an|the)\b", re.UNICODE)


def normalize_answer(s: str) -> str:
    """metrics.py:14-37: lower -> remove punctuation -> strip accents
    (NFD, drop Mn) -> remove English articles -> collapse whitespace."""
    s = s.lower()
    s = s.translate(_PUNC_TABLE)
    s = "".join(c for c in unicodedata.normalize("NFD", s) if unicodedata.category(c) != "Mn")
    s = _RE_ARTICLES.sub(" ", s)
    return " ".join(s.split())


def get_tokens(s: str) -> list[str]:
    """metrics.py:40-43."""
    if not s:
        return []
    return normalize_answer(s).split()
