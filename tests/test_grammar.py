"""Parity of the answer-grammar parser vs reference features/sentences.py,
including the docstring golden cases."""

import pytest

from information_extraction_t5_ray.functions import grammar
from information_extraction_t5_ray.registry import QuestionRegistry

SENTENCES = [
    "[SENT25] [Tipo de Logradouro]: Rua [SENT25] [Logradouro]: PEDRO BIAGI",
    "[SENT1] Campinas",
    "[Logradouro] Campinas",
    "[SENT25] [Tipo de Logradouro]: Rua [SENT25] [Logradouro]: PEDRO BIAGI "
    "[SENT26] [Número]: 462 [SENT25] [Cidade]: Sertãozinho [SENT0] [Estado]: SP",
    "[Estado]: N/A",
    "[CPF/CNPJ]: 123.456.789-01",
    "[SENT1] [Etiqueta] 88975 [aparece no texto] 88.975",
    "",
    "no brackets at all",
    "[SENTx] weird id",
]


@pytest.fixture(scope="module")
def ref(reference_path=None):
    import sys

    sys.path.insert(0, "/root/reference")
    import information_extraction_t5.features.sentences as ref_sentences

    return ref_sentences


@pytest.mark.parametrize("s", SENTENCES)
def test_find_sub_answers_parity(ref, s):
    assert grammar.find_sub_answers(s) == ref.find_sub_answers(s)


@pytest.mark.parametrize("s", SENTENCES)
def test_find_ids_parity(ref, s):
    assert grammar.find_ids_of_sent_tokens(s) == ref.find_ids_of_sent_tokens(s)


@pytest.mark.parametrize("s", SENTENCES)
def test_find_type_names_parity_unmapped(ref, s):
    assert grammar.find_type_names(s) == ref.find_type_names(s, map_type=False)


@pytest.mark.parametrize("s", SENTENCES)
def test_deconstruct_parity(ref, s):
    """deconstruct_answer with the display-name -> type-name map applied,
    exactly like the reference's default path."""
    t2tn = QuestionRegistry.default().type_to_typename
    try:
        want = ref.deconstruct_answer(s)
    except ValueError:
        with pytest.raises(ValueError):
            grammar.deconstruct_answer(s, t2tn)
        return
    got = grammar.deconstruct_answer(s, t2tn)
    assert got == want


@pytest.mark.parametrize("s", SENTENCES)
def test_subanswer_and_raw_parity(ref, s):
    t2tn = QuestionRegistry.default().type_to_typename
    try:
        subs, _ = grammar.deconstruct_answer(s, t2tn)
    except ValueError:
        return
    for sub in subs:
        assert grammar.get_subanswer_from_subsentence(
            sub
        ) == ref.get_subanswer_from_subsentence(sub)
        assert grammar.get_raw_answer_from_subsentence(
            sub
        ) == ref.get_raw_answer_from_subsentence(sub)
        sa = grammar.get_subanswer_from_subsentence(sub)
        assert grammar.get_clean_answer_from_subanswer(
            sa
        ) == ref.get_clean_answer_from_subanswer(sa)


def test_docstring_golden_deconstruct(ref):
    s = (
        "[SENT25] [Tipo de Logradouro]: Rua [SENT25] [Logradouro]: PEDRO BIAGI "
        "[SENT26] [Número]: 462 [SENT25] [Cidade]: Sertãozinho [SENT0] [Estado]: SP "
        "[aparece no texto] s paulo"
    )
    t2tn = QuestionRegistry.default().type_to_typename
    # extend the default registry map with the extra display names the
    # reference docstring uses
    t2tn.setdefault("Tipo de Logradouro", "tipo_de_logradouro")
    subs, tns = grammar.deconstruct_answer(s, t2tn)
    assert tns == ["tipo_de_logradouro", "logradouro", "numero", "cidade", "estado"]
    assert subs[-1] == "[SENT0] [estado]: SP [aparece no texto] s paulo"
    assert grammar.get_raw_answer_from_subsentence(subs[-1]) == "s paulo"


def test_registry_qa_id_expansion():
    reg = QuestionRegistry.default()
    qa_ids = reg.get_all_qa_ids(
        document_class="form",
        list_of_type_names=[f"form.{t}" for t in reg.questions["form"]],
        list_of_use_compound_question=["form.endereco"],
    )
    assert "form.endereco" in qa_ids
    assert "form.endereco.cidade" not in qa_ids  # compound collapses
    assert "form.cpf" in qa_ids and "form.etiqueta" in qa_ids
    # without compound flag the subfields expand (preprocess.py:155-172)
    qa_ids2 = reg.get_all_qa_ids(
        document_class="form",
        list_of_type_names=["form.endereco"],
    )
    assert "form.endereco.logradouro" in qa_ids2
    assert "form.endereco.compound" not in qa_ids2


def test_registry_expansion_parity():
    import sys

    sys.path.insert(0, "/root/reference")
    from information_extraction_t5.features.preprocess import get_all_qa_ids

    reg = QuestionRegistry.default()
    tns = [f"form.{t}" for t in reg.questions["form"]]
    for compound in ([], ["form.endereco"]):
        want = get_all_qa_ids(
            document_class="form",
            list_of_type_names=tns,
            list_of_use_compound_question=compound,
        )
        got = reg.get_all_qa_ids(
            document_class="form",
            list_of_type_names=tns,
            list_of_use_compound_question=compound,
        )
        assert got == want


def test_group_qas_parity():
    import sys

    sys.path.insert(0, "/root/reference")
    from information_extraction_t5.features.postprocess import group_qas as ref_group

    from information_extraction_t5_ray.functions.metrics import group_qas

    ids = [
        "form.cpf",
        "form.endereco",
        "form.endereco~cidade",
        "form.endereco~cidade*",
        "form.cpf_1",
        "form.cpf_2*",
        "form.endereco~estado_1",
        "certidoes.resultado",
        "doc_1",
        "doc_1",
    ]
    for flag in (True, False):
        assert group_qas(ids, group_by_typenames=flag) == ref_group(
            ids, group_by_typenames=flag
        )
