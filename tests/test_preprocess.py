"""Parity of T5 input/label sentence construction vs reference
features/preprocess.py (docstring goldens + property sweep)."""

import pytest

from information_extraction_t5_ray.functions import preprocess as pp


@pytest.fixture(scope="module")
def ref():
    import sys

    sys.path.insert(0, "/root/reference")
    import information_extraction_t5.features.preprocess as ref_pp

    return ref_pp


CONTEXTS = [
    "Rua PEDRO BIAGI 462 Apartamento nº 103, 1º Andar do RESIDENCIAL "
    "IMPERIAL. Sertãozinho\nSP",
    "linha um\nlinha {dois}\nlinha tres",
    "sem quebras",
    "",
    "\n\ncomeça vazio",
    "a\nb\nc\nd\ne\nf\ng\nh\ni\nj\nk",
]


@pytest.mark.parametrize("ctx", CONTEXTS)
def test_replace_linebreaks_with_tokens_parity(ref, ctx):
    assert pp.replace_linebreaks_with_tokens(ctx) == ref._replace_linebreaks_with_tokens(ctx)


@pytest.mark.parametrize("ctx", CONTEXTS)
def test_replace_linebreaks_with_spaces_parity(ref, ctx):
    assert pp.replace_linebreaks_with_spaces(ctx) == ref._replace_linebreaks_with_spaces(ctx)


@pytest.mark.parametrize("ctx", CONTEXTS)
@pytest.mark.parametrize("pos", [-1, 0, 5, 11, 40])
def test_sent_id_parity(ref, ctx, pos):
    pos = min(pos, len(ctx))
    assert pp.sent_id_of(ctx, pos) == ref._get_id_based_on_linebreaks(ctx, pos)


@pytest.mark.parametrize("ctx", CONTEXTS)
@pytest.mark.parametrize("use_sid", [True, False])
def test_input_sentence_parity(ref, ctx, use_sid):
    q = "Qual é o endereço?"
    assert pp.generate_t5_input_sentence(ctx, q, use_sid) == ref.generate_t5_input_sentence(ctx, q, use_sid)


@pytest.mark.parametrize("use_sid", [True, False])
@pytest.mark.parametrize(
    "answer,start",
    [
        ("[Cidade]: Sertãozinho", -1),
        ("[Cidade]: Sertãozinho", 30),
        ("[Logradouro]: Rua X [Número]: 462", [3, 25]),
        (
            "[Logradouro]: Rua X [aparece no texto]: RUA x [Número]: 462",
            [3, 25],
        ),
        ("[Estado]: N/A", None),
    ],
)
def test_label_sentence_parity(ref, use_sid, answer, start):
    ctx = CONTEXTS[0]
    assert pp.generate_t5_label_sentence(
        answer, start, ctx, use_sid
    ) == ref.generate_t5_label_sentence(answer, start, ctx, use_sid)


def test_complement_parity(ref):
    qs = ["Qual é o CPF?", "Qual é o nome?"]
    assert pp.complement_questions_to_require_rawdata(qs) == ref.complement_questions_to_require_rawdata(list(qs))
    assert pp.complement_questions_to_require_rawdata(qs[0]) == ref.complement_questions_to_require_rawdata(qs[0])


def test_max_sentences_guard():
    with pytest.raises(ValueError):
        pp.replace_linebreaks_with_tokens("\n" * (pp.MAX_SENTENCES + 1))
