"""Tokenizer behavioral-contract tests (VERDICT r2 item 5).

The real ptt5 SentencePiece tokenizer cannot run in this sandbox (no
transformers/sentencepiece), so the fidelity risk is that
``StubSentencePieceTokenizer`` silently drifts from the properties the
chunker pipeline assumes of ANY tokenizer plugged into
``get_tokens_and_offsets`` (reference ``features/context.py:8-15``) —
the properties the reference itself asserts at runtime
(``context.py:318-319``) and which its ``clean_text`` pre-pass exists
to guarantee.

Three layers:

1. a GOLDEN TRANSCRIPT (``fixtures_tokenizer_golden.json``) of
   token/offset outputs over the reference's own sample corpus texts —
   any change to the stub's piece boundaries fails loudly;
2. the contract properties, checked on the golden set:
   * first token carries the ``▁`` prefix; ``token_lens[0] -= 1``
     makes lengths tile the text exactly (offset reconstruction);
   * every (start, end) span reproduces its substring after mapping
     ``▁`` -> space (space-aware detokenization);
   * offsets are contiguous and monotonically increasing;
3. hypothesis property: tiling holds for ARBITRARY cleaned text (the
   class of inputs the pipeline feeds tokenizers after ``clean_text``).

A tokenizer violating these (e.g. a real SP model that re-normalizes
whitespace) fails the chunker's hard assert at runtime rather than
mis-aligning answers silently — same failure mode as the reference.
"""

from __future__ import annotations

import json
from pathlib import Path

from information_extraction_t5_ray.functions.textnorm import clean_text
from information_extraction_t5_ray.functions.tokenizer import (
    SP_UNDERLINE,
    StubSentencePieceTokenizer,
)
from information_extraction_t5_ray.functions.windows import (
    get_tokens_and_offsets,
)

GOLDEN = json.loads(
    (Path(__file__).parent / "fixtures_tokenizer_golden.json").read_text()
)


def test_golden_transcript_exact():
    tok = StubSentencePieceTokenizer()
    for case in GOLDEN:
        toks = get_tokens_and_offsets(case["text"], tok)
        assert [t[0] for t in toks] == case["tokens"], case["text"][:40]
        assert [t[1] for t in toks] == case["starts"]
        assert [t[2] for t in toks] == case["ends"]


def test_contract_first_token_prefix_and_tiling():
    for case in GOLDEN:
        text, tokens = case["text"], case["tokens"]
        assert tokens[0].startswith(SP_UNDERLINE)
        # token_lens[0] -= 1 drops exactly the synthetic prefix char:
        # summed (adjusted) lengths tile the text end-to-end
        lens = [len(t) for t in tokens]
        lens[0] -= 1
        assert sum(lens) == len(text)
        assert case["ends"][-1] == len(text)


def test_contract_span_reconstruction():
    for case in GOLDEN:
        text = case["text"]
        for token, start, end in zip(
            case["tokens"], case["starts"], case["ends"]
        ):
            piece = token.replace(SP_UNDERLINE, " ")
            # the first token's underline maps to a space that is NOT in
            # the text (position -1); all other spans match verbatim
            if start == 0 and token.startswith(SP_UNDERLINE):
                assert piece[1:] == text[start:end]
            else:
                assert piece == text[start:end], (token, start, end)


def test_contract_offsets_contiguous():
    for case in GOLDEN:
        starts, ends = case["starts"], case["ends"]
        assert starts[0] == 0
        for i in range(1, len(starts)):
            assert starts[i] == ends[i - 1]
            assert ends[i] >= starts[i]


def test_tiling_property_arbitrary_cleaned_text():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tok = StubSentencePieceTokenizer()

    @settings(max_examples=200, deadline=None)
    @given(st.text(min_size=1, max_size=300))
    def check(raw):
        text = clean_text(raw)
        if not text:
            return
        toks = get_tokens_and_offsets(text, tok)
        assert toks[-1][2] == len(text)
        lens = [len(t[0]) for t in toks]
        lens[0] -= 1
        assert sum(lens) == len(text)

    check()
