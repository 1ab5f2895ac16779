"""Differential parity for generate()-shaped transcripts (VERDICT r3
item 7): the mock/real scorer gap is the SHAPE of decoded T5 output —
so feed a battery of real-emission shapes (the reference's own doctest
transcripts plus the degenerate forms beam decode actually produces:
truncations, missing ids, malformed brackets, bare N/A, repetitions)
through BOTH our grammar (functions/grammar.py) and the REFERENCE's own
postprocessing module (features/sentences.py, imported from
/root/reference), asserting byte-equal results function by function.

Unlike a recorded-fixture approach this cannot drift: the expectation
IS the reference code, executed in-process (same precedent as
test_squad_e1_parity.py's converter import).
"""

import os
import sys
import types

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def ref_sentences():
    stub = sys.modules.get("transformers")
    if stub is None:
        stub = types.ModuleType("transformers")
        sys.modules["transformers"] = stub

    class _T:
        pass

    for name in ("AutoTokenizer", "PreTrainedTokenizerBase", "T5Tokenizer"):
        if not hasattr(stub, name):
            setattr(stub, name, _T)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from information_extraction_t5.features import sentences

    return sentences


@pytest.fixture(scope="module")
def type_map():
    """The registry's reverse display-name map — verified identical to
    the reference's global TYPE_TO_TYPENAME (registry parity is its own
    contract); our grammar takes it explicitly (broadcast design)
    where the reference reads the module global."""
    from information_extraction_t5_ray.registry import QuestionRegistry

    return QuestionRegistry.default().type_to_typename


# Real-emission battery.  First block: the reference's own documented
# transcripts (features/sentences.py doctests — authoritative recorded
# shapes).  Second block: degenerate forms a beam-decoded T5 emits in
# practice — max_length truncation mid-bracket / mid-id, missing or
# malformed SENT tokens, bare N/A, echoed prompts, repetition loops,
# stray colons/whitespace, accented type names, multiple raw-text
# complements — each of which the grammar must survive identically.
TRANSCRIPTS = [
    # --- reference doctests (sentences.py:41,62,96,136,183,237) ---
    "[SENT25] [Tipo de Logradouro]: Rua [SENT25] [Logradouro]: PEDRO BIAGI",
    "[SENT1] Campinas",
    "[Logradouro] Campinas",
    "[SENT25] [Tipo de Logradouro]: Rua [SENT25] [Logradouro]: PEDRO BIAGI "
    "[SENT26] [Número]: 462 [SENT25] [Cidade]: Sertãozinho [SENT0] [Estado]: SP",
    "[SENT25] [Tipo de Logradouro]: Rua [SENT25] [Logradouro]: PEDRO BIAGI "
    "[SENT26] [Número]: 462 [SENT25] [Cidade]: Sertãozinho [SENT0] [Estado]: SP "
    "[aparece no texto] s paulo",
    "[SENT1] [no_da_matricula] 88975 [aparece no texto] 88.975",
    # --- degenerate real-decode shapes ---
    "",
    " ",
    "N/A",
    "[SENT0] N/A",
    "[SENT] [Cidade]: Campinas",  # id digits dropped by decode
    "[SENTx7] [Cidade]: Campinas",  # corrupted id
    "[SENT25] [Cidade]: Sert",  # max_length truncation mid-answer
    "[SENT25] [Cida",  # truncation mid-type-bracket
    "[SENT25] [Cidade]: ",  # truncation right after colon
    "[SENT25] [Cidade]",  # no answer at all
    "Campinas",  # bare answer, no structure
    "[SENT3] [Agência]: 2347 [SENT3] [Agência]: 2347 [SENT3] [Agência]: 2347",
    "[SENT2] [CPF]: 516.759.760-90",
    "[SENT9] [Data de Emissão]: 21/07/2018 [aparece no texto] 21 de julho de 2018",
    "[SENT4] [Nome Completo]: ANA MADALENA SILVEIRA ALVES",
    "[SENT1] [Órgão Emissor]: SSP",  # accented type name
    "[SENT1] [endereço]: Rua : com : colons",  # stray colons in answer
    "[SENT12] [Conta Corrente]: 0011-2347-0000809875312",
    "[SENT5] [Logradouro]: PEDRO [SENT5] [aparece no texto] pedro "
    "[SENT6] [Número]: 42 [aparece no texto] quarenta e dois",
    "  [SENT7]   [Cidade]:   Campinas   ",  # whitespace spray
    "][ [SENT8] ]][[ [Cidade]: X",  # bracket garbage
    "[SENT25] [Tipo de Logradouro]: Rua [SENT25] [Logradouro]: PEDRO BIAGI "
    "[SENT26] [Número]: 462 [SENT25] [Cidade]: Sertãozinho [SENT0] [Estado]",
]


def _outcome(fn, *args, **kw):
    """Result-or-exception capture: parity includes RAISING identically
    (the reference raises ValueError on display names outside its
    shipped TYPE_TO_TYPENAME — e.g. the registro-imóveis doctest
    vocabulary — and on non-digit SENT ids nothing; our grammar must
    mirror both)."""
    try:
        return ("ok", fn(*args, **kw))
    except Exception as ex:  # noqa: BLE001 - parity on exception type
        return ("raise", type(ex).__name__, str(ex))


def test_deconstruct_answer_matches_reference(ref_sentences, type_map):
    from information_extraction_t5_ray.functions import grammar

    for t in TRANSCRIPTS:
        ours = _outcome(grammar.deconstruct_answer, t, type_map)
        ref = _outcome(ref_sentences.deconstruct_answer, t)
        assert ours == ref, (t, ours, ref)


def test_component_parsers_match_reference(ref_sentences, type_map):
    from information_extraction_t5_ray.functions import grammar

    for t in TRANSCRIPTS:
        assert _outcome(grammar.find_sub_answers, t) == _outcome(
            ref_sentences.find_sub_answers, t
        ), t
        assert _outcome(grammar.find_ids_of_sent_tokens, t) == _outcome(
            ref_sentences.find_ids_of_sent_tokens, t
        ), t
        # our map_type=True spelling passes the map; None == map_type=False
        assert _outcome(grammar.find_type_names, t, type_map) == _outcome(
            ref_sentences.find_type_names, t, map_type=True
        ), t
        assert _outcome(grammar.find_type_names, t, None) == _outcome(
            ref_sentences.find_type_names, t, map_type=False
        ), t
        assert _outcome(
            grammar.split_t5_sentence_into_components, t, type_map
        ) == _outcome(ref_sentences.split_t5_sentence_into_components, t), t


def test_subsentence_extractors_match_reference(ref_sentences, type_map):
    """The per-subsentence getters run on deconstruct OUTPUT — drive
    them on every subsentence the battery produces."""
    from information_extraction_t5_ray.functions import grammar

    n_checked = 0
    for t in TRANSCRIPTS:
        out = _outcome(ref_sentences.deconstruct_answer, t)
        if out[0] != "ok":
            continue
        subs, _ = out[1]
        for sub in subs:
            assert _outcome(
                grammar.get_subanswer_from_subsentence, sub
            ) == _outcome(
                ref_sentences.get_subanswer_from_subsentence, sub
            ), sub
            assert _outcome(
                grammar.get_raw_answer_from_subsentence, sub
            ) == _outcome(
                ref_sentences.get_raw_answer_from_subsentence, sub
            ), sub
            n_checked += 1
    # 19 of the 28 transcripts deconstruct cleanly (9 raise on display
    # names outside the bank-form map — covered by the deconstruct
    # parity test's exception compare); all 19 must flow through here
    assert n_checked >= 19


def test_clean_answer_matches_reference(ref_sentences):
    from information_extraction_t5_ray.functions import grammar

    for sub in [
        "[no_da_matricula]: 88975",
        "[cidade]: Campinas",
        "bare answer",
        "",
        "N/A",
        "[estado]: SP [aparece no texto] s paulo",
    ]:
        assert grammar.get_clean_answer_from_subanswer(
            sub
        ) == ref_sentences.get_clean_answer_from_subanswer(sub), sub
