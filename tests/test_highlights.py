"""Highlight extraction + processing helpers (reference
features/highlights.py and utils/processing.py parity, incl. the
docstring golden case)."""

import numpy as np
import pandas as pd
import pytest

from information_extraction_t5_ray.functions import processing as proc
from information_extraction_t5_ray.functions.highlights import (
    find_indexes_of_sentence,
    find_near_matches,
    find_sentence_of_sent_id,
    fuzzy_extract,
    get_answer_highlight,
    highlight_stage,
)


def test_reference_docstring_golden():
    # highlights.py:198-204 example: fuzzy match across a linebreak
    start, end, hl = get_answer_highlight(
        "Rua Albert Einstein",
        3,
        "Campinas\n\nRua 4lbert \nE1nstein 1000",
        sentence_expansion=2,
    )
    assert (start, end, hl) == (10, 30, "Rua 4lbert \nE1nstein")


def test_sentence_lookup():
    ctx = "a\nbb\nccc"
    assert find_sentence_of_sent_id(ctx, 1) == "a"
    assert find_sentence_of_sent_id(ctx, 3) == "ccc"
    assert find_indexes_of_sentence(ctx, 2) == (2, 4)


def test_find_near_matches_exact_and_fuzzy():
    ms = find_near_matches("abc", "xxabcxx", 0)
    assert any(s == 2 and e == 5 and d == 0 for s, e, d in ms)
    # one substitution admitted
    ms = find_near_matches("abc", "xxaXcxx", 1)
    assert ms and min(d for _, _, d in ms) == 1
    # nothing within budget
    assert find_near_matches("abcdef", "zzzzzz", 1) == []


def test_fuzzy_extract_variations():
    # canonical UF code matches its long-name variation in the text
    s, e = fuzzy_extract("SP", "mora em são paulo desde 2001")
    assert (s, e) == (8, 17)
    assert fuzzy_extract("XQ", "nada aqui") == (None, None)


def test_fuzzy_extract_prefers_lower_distance():
    s, e = fuzzy_extract("abcde", "zz abXde zz abcde zz")
    assert (s, e) == (12, 17)


def test_highlight_stage(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "prediction": ["Rua Albert Einstein", "nada"],
            "sent_ids": [[3], []],
            "context": ["Campinas\n\nRua 4lbert \nE1nstein 1000", "x"],
        }
    )
    out = highlight_stage(rd.from_pandas(df)).to_pandas()
    assert out.highlight.iloc[0] == "Rua 4lbert \nE1nstein"
    assert pd.isna(out.highlight.iloc[1])


def test_processing_helpers():
    assert proc.get_intersection_set([1, 2, 3], [2, 3, 4]) == {2, 3}
    assert proc.concat_or_terms(["foo", "bar"]) == "(?:foo|bar){e<=1}"
    assert (
        proc.expand_composite_char_pattern("ação")
        == "[aáàâã][cç][aáàâã][oóõ]"
    )
    assert proc.count_k_v({"a": 1, "b": {"c": 2, "d": [3, 4]}}) == (4, 4)


@pytest.mark.parametrize("seed", range(3))
def test_find_near_matches_against_bruteforce(seed):
    """Min distance reported must equal brute-force min edit distance
    over all substrings (semi-global alignment correctness)."""
    rng = np.random.RandomState(seed)
    alpha = "abcd"
    text = "".join(rng.choice(list(alpha), 30))
    query = "".join(rng.choice(list(alpha), 5))

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            ndp = [i]
            for j, cb in enumerate(b, 1):
                ndp.append(min(dp[j] + 1, ndp[-1] + 1, dp[j - 1] + (ca != cb)))
            dp = ndp
        return dp[-1]

    brute = min(
        lev(query, text[s:e])
        for s in range(len(text))
        for e in range(s, len(text) + 1)
    )
    ms = find_near_matches(query, text, max_l_dist=len(query))
    assert ms and min(d for _, _, d in ms) == brute
