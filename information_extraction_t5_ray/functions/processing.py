"""Pre/post-processing utility scalars (reference
``utils/processing.py:8-86``): set intersection, fuzzy OR-regex
building, accent-class expansion, nested dict/list counting.

``concat_or_terms``'s ``{e<=1}`` suffix targets the third-party
``regex`` module's fuzzy syntax; the builder is pure string assembly so
it works without that module installed (callers that actually execute
fuzzy patterns should prefer functions/highlights.find_near_matches,
which needs no extra dependency).
"""

from __future__ import annotations

import re
from collections import OrderedDict
from typing import Dict, List, Tuple

COMPOSITE_CHAR_GROUPS = [
    "aáàâã",
    "eéê",
    "ií",
    "oóõ",
    "uúü",
    "cç",
]


def get_intersection_set(list_a: List, list_b: List) -> set:
    """processing.py:8-14."""
    return set(list_a).intersection(set(list_b))


def concat_or_terms(terms, suffix: str = "{e<=1}") -> str:
    """OR-group regex with a fuzzy suffix (processing.py:17-34).

    >>> concat_or_terms(['foo', 'bar'], suffix='{e<=1}')
    '(?:foo|bar){e<=1}'
    """
    groups = "|".join(map(str, terms))
    return r"(?:{}){}".format(groups, suffix)


def expand_composite_char_pattern(text: str) -> str:
    """Every accent-composable char becomes its character class, making
    a pattern accent-tolerant (processing.py:37-60)."""
    for group in COMPOSITE_CHAR_GROUPS:
        text = re.sub(rf"[{group}]", f"[{group}]", text)
    return text


def count_k_v(d) -> Tuple[int, int]:
    """(keys, values) across a nested dict/list structure
    (processing.py:63-86)."""
    keys, values = 0, 0
    if isinstance(d, (Dict, OrderedDict)):
        for item in d.keys():
            if isinstance(d[item], (List, Tuple, Dict)):
                keys += 1
                k, v = count_k_v(d[item])
                values += v
                keys += k
            else:
                keys += 1
                values += 1
    elif isinstance(d, (List, Tuple)):
        for item in d:
            if isinstance(item, (List, Tuple, Dict)):
                k, v = count_k_v(item)
                values += v
                keys += k
            else:
                values += 1
    return keys, values
