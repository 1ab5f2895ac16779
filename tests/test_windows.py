"""Window/context extraction parity vs reference features/context.py.

The reference module imports transformers at the top; we inject a
minimal fake module (the reference only touches AutoTokenizer /
PreTrainedTokenizerBase names) and drive BOTH implementations with the
same deterministic stub tokenizer on real document texts.
"""

import json
import sys
import types

import pytest

from information_extraction_t5_ray.functions.textnorm import clean_text
from information_extraction_t5_ray.functions.tokenizer import (
    StubSentencePieceTokenizer,
)
from information_extraction_t5_ray.functions import windows as ours


@pytest.fixture(scope="module")
def ref_context():
    if "transformers" not in sys.modules:
        fake = types.ModuleType("transformers")
        fake.AutoTokenizer = object
        fake.PreTrainedTokenizerBase = object
        sys.modules["transformers"] = fake
    sys.path.insert(0, "/root/reference")
    import information_extraction_t5.features.context as ref

    return ref


@pytest.fixture(scope="module")
def texts():
    docs = json.load(open("/root/reference/data/raw/sample_train.json"))
    out = [clean_text(v["text"]) for v in docs.values()]
    out += [
        clean_text(
            "Linha um com palavras suficientes para janelas\n" * 40
            + "Final do documento aqui"
        ),
        "curto",
        "uma linha apenas sem quebras mas com muitas palavras " * 30,
        "palavra",
    ]
    return out


TOK = StubSentencePieceTokenizer()
QUESTION = "Qual o tipo, a classe, o órgão emissor, a localização e a abrangência?"


def test_tokens_and_offsets_parity(ref_context, texts):
    for t in texts:
        want = ref_context.get_tokens_and_offsets(t, TOK)
        got = ours.get_tokens_and_offsets(t, TOK)
        assert [(tok, s, e) for tok, s, e in got] == [
            (tok, s, e) for tok, s, e in want
        ]
        # tiling invariant (context.py:318-319)
        assert got[-1][2] == len(t)


def test_token_id_from_position_parity(ref_context, texts):
    t = texts[0]
    toks = ours.get_tokens_and_offsets(t, TOK)
    for pos in [0, 1, 5, 100, len(t) - 1, len(t), len(t) + 50, -1]:
        assert ours.get_token_id_from_position(
            toks, pos
        ) == ref_context.get_token_id_from_position(toks, pos)


@pytest.mark.parametrize("max_size", [200, 400, 1200])
def test_max_size_context_parity(ref_context, texts, max_size):
    for t in texts:
        doc = {"text": t, "uuid": "x"}
        assert ours.get_max_size_context(
            t, max_size, QUESTION
        ) == ref_context.get_max_size_context(doc, max_size, QUESTION)


@pytest.mark.parametrize("use_sentence_id", [False, True])
@pytest.mark.parametrize("proportion_before", [0.0, 0.2, 0.5])
@pytest.mark.parametrize("start_position", [0, 57, 300, 950])
def test_position_context_parity(
    ref_context, texts, use_sentence_id, proportion_before, start_position
):
    for t in texts:
        doc = {"text": t, "uuid": "x"}
        want = ref_context.get_position_context(
            doc,
            max_size=300,
            start_position=start_position,
            proportion_before=proportion_before,
            question=QUESTION,
            use_sentence_id=use_sentence_id,
        )
        got = ours.get_position_context(
            t,
            max_size=300,
            start_position=start_position,
            proportion_before=proportion_before,
            question=QUESTION,
            use_sentence_id=use_sentence_id,
        )
        assert got == want


@pytest.mark.parametrize("use_sentence_id", [False, True])
@pytest.mark.parametrize("proportion_before", [0.0, 0.2])
@pytest.mark.parametrize("start_position", [0, 57, 300, 950])
@pytest.mark.parametrize("max_tokens", [80, 150])
def test_position_token_context_parity(
    ref_context, texts, use_sentence_id, proportion_before, start_position, max_tokens
):
    for t in texts:
        doc = {"text": t, "uuid": "x"}
        want = ref_context.get_position_token_context(
            doc,
            start_position=start_position,
            proportion_before=proportion_before,
            tokenizer=TOK,
            max_tokens=max_tokens,
            question=QUESTION,
            use_sentence_id=use_sentence_id,
        )
        got = ours.get_position_token_context(
            t,
            start_position=start_position,
            proportion_before=proportion_before,
            tokenizer=TOK,
            max_tokens=max_tokens,
            question=QUESTION,
            use_sentence_id=use_sentence_id,
        )
        assert got == want


@pytest.mark.parametrize("use_sentence_id", [False, True])
@pytest.mark.parametrize("overlap", [0.2, 0.5])
@pytest.mark.parametrize("max_windows", [3, -1])
def test_windows_context_parity(ref_context, texts, use_sentence_id, overlap, max_windows):
    for t in texts:
        doc = {"text": t, "uuid": "x"}
        want = ref_context.get_windows_context(
            doc,
            max_size=300,
            window_overlap=overlap,
            max_windows=max_windows,
            question=QUESTION,
            use_sentence_id=use_sentence_id,
        )
        got = ours.get_windows_context(
            t,
            max_size=300,
            window_overlap=overlap,
            max_windows=max_windows,
            question=QUESTION,
            use_sentence_id=use_sentence_id,
        )
        assert got == want


@pytest.mark.parametrize("use_sentence_id", [False, True])
@pytest.mark.parametrize("overlap", [0.2, 0.5])
@pytest.mark.parametrize("max_windows", [3, -1])
@pytest.mark.parametrize("max_tokens", [150, 512])
def test_windows_token_context_parity(
    ref_context, texts, use_sentence_id, overlap, max_windows, max_tokens
):
    for t in texts:
        doc = {"text": t, "uuid": "x"}
        want = ref_context.get_windows_token_context(
            doc,
            window_overlap=overlap,
            max_windows=max_windows,
            tokenizer=TOK,
            max_tokens=max_tokens,
            question=QUESTION,
            use_sentence_id=use_sentence_id,
        )
        got = ours.get_windows_token_context(
            t,
            window_overlap=overlap,
            max_windows=max_windows,
            tokenizer=TOK,
            max_tokens=max_tokens,
            question=QUESTION,
            use_sentence_id=use_sentence_id,
        )
        assert got == want


def test_get_context_dispatcher_matches_reference_chain(ref_context, texts):
    """Full reference get_context (which fuses cleaning) vs our
    clean_text + dispatcher, for the default windows_token strategy."""
    raw = json.load(open("/root/reference/data/raw/sample_train.json"))
    for v in raw.values():
        doc = {"text": v["text"].replace("༡༨/༢", ""), "uuid": v.get("uuid", "u")}
        want = ref_context.get_context(
            doc,
            context_content="windows_token",
            tokenizer=TOK,
            max_tokens=150,
            question=QUESTION,
            window_overlap=0.2,
            max_windows=3,
            return_position_offset=True,
        )
        got = ours.get_context(
            clean_text(v["text"]),
            context_content="windows_token",
            tokenizer=TOK,
            max_tokens=150,
            question=QUESTION,
            window_overlap=0.2,
            max_windows=3,
        )
        assert got == want
