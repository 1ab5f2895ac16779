"""End-to-end E1 parity: our raw-JSON -> SQuAD pipeline vs the
REFERENCE converter itself (data/basic_to_squad.get_document_data) on
the reference's own shipped sample corpus, char-window mode.

transformers is not installed; the reference modules only need its
names at import time for the (unused, tokenizer-free 'windows' mode)
annotations, so a stub module satisfies the import.
"""

import json
import sys
import types

import pytest

SAMPLE = "/root/reference/data/raw/sample_train.json"


@pytest.fixture(scope="module")
def ref_converter():
    stub = sys.modules.get("transformers")  # other tests stub it too
    if stub is None:
        stub = types.ModuleType("transformers")
        sys.modules["transformers"] = stub

    class _T:  # placeholder symbols; never instantiated in char mode
        pass

    for name in ("AutoTokenizer", "PreTrainedTokenizerBase", "T5Tokenizer"):
        if not hasattr(stub, name):
            setattr(stub, name, _T)
    sys.path.insert(0, "/root/reference")
    from information_extraction_t5.data import basic_to_squad
    from information_extraction_t5.features.preprocess import get_all_qa_ids

    return basic_to_squad, get_all_qa_ids


TYPE_NAMES = [
    "form.etiqueta", "form.agencia", "form.conta_corrente", "form.cpf",
    "form.nome_completo", "form.n_doc_serie", "form.orgao_emissor",
    "form.data_emissao", "form.data_nascimento", "form.nome_mae",
    "form.nome_pai", "form.endereco",
]
USE_COMPOUND = ["form.endereco"]


def _reference_squad(ref_converter):
    basic_to_squad, get_all_qa_ids = ref_converter
    all_qa_ids = get_all_qa_ids(
        list_of_type_names=TYPE_NAMES,
        list_of_use_compound_question=USE_COMPOUND,
    )
    docs = json.load(open(SAMPLE))
    out = []
    for doc_id, doc in docs.items():
        doc = dict(doc)
        doc["uuid"] = doc_id
        document_data, count = basic_to_squad.get_document_data(
            doc,
            document_type="form",
            all_qa_ids=all_qa_ids,
            max_size=2048,
            list_of_use_compound_question=USE_COMPOUND,
            list_of_type_names=TYPE_NAMES,
            context_content="windows",
            window_overlap=0.2,
            max_windows=3,
            tokenizer=None,
            choose_question="first",
            use_sentence_id=False,
        )
        assert count > 0
        out.append(document_data)
    return out


def test_squad_e1_matches_reference(ray_session, ref_converter):
    from information_extraction_t5_ray.pipelines.squad_e1 import (
        convert_raw_dataset,
        squad_data_from_rows,
    )

    expected = _reference_squad(ref_converter)
    qas = convert_raw_dataset(SAMPLE, use_sentence_id=False)
    got = squad_data_from_rows(qas.to_pandas())

    exp_by_title = {d["title"]: d for d in expected}
    assert {d["title"] for d in got} == set(exp_by_title)
    for doc in got:
        exp = exp_by_title[doc["title"]]
        assert len(doc["paragraphs"]) == len(exp["paragraphs"]), doc["title"]
        for p_got, p_exp in zip(doc["paragraphs"], exp["paragraphs"]):
            assert p_got["context"] == p_exp["context"]
            assert p_got["qas"] == p_exp["qas"]


def test_write_squad_json_roundtrip(ray_session, ref_converter, tmp_path):
    from information_extraction_t5_ray.pipelines.squad_e1 import run_convert

    paths = run_convert(SAMPLE, str(tmp_path), use_sentence_id=False)
    data = json.load(open(paths["train"]))
    assert data["version"] == "0.1"
    assert len(data["data"]) == 3
    qa_ids = {
        qa["id"]
        for d in data["data"]
        for p in d["paragraphs"]
        for qa in p["qas"]
    }
    assert "form.endereco" in qa_ids and "form.cpf" in qa_ids


def test_read_squad_json_roundtrip(ray_session, ref_converter, tmp_path):
    """write_squad_json -> read_squad_json reproduces the T5-example
    rows the direct pipeline emits (reference SquadV1 read path)."""
    from information_extraction_t5_ray.pipelines.squad_e1 import (
        convert_raw_dataset,
        read_squad_json,
        write_squad_json,
    )

    direct = convert_raw_dataset(SAMPLE, use_sentence_id=False).to_pandas()
    path = write_squad_json(
        convert_raw_dataset(SAMPLE, use_sentence_id=False),
        str(tmp_path / "rt.json"),
    )
    rt = read_squad_json(path, use_sentence_id=False).to_pandas()
    cols = ["url", "window_id", "qa_id", "question", "input_sentence",
            "label_sentence", "answer_start", "is_negative"]
    a = direct[cols].sort_values(cols, ignore_index=True)
    b = rt[cols].sort_values(cols, ignore_index=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_hash_split_partition(ray_session):
    from information_extraction_t5_ray.pipelines.squad_e1 import (
        convert_raw_dataset,
        hash_split,
    )

    import zlib

    qas = convert_raw_dataset(SAMPLE, use_sentence_id=False)
    train, valid = hash_split(qas, valid_percent=0.5)

    def urls(ds):
        df = ds.to_pandas()
        return set(df["url"]) if len(df) else set()

    t, v = urls(train), urls(valid)
    assert t.isdisjoint(v)
    assert len(t | v) == 3
    # membership is the pure url hash (stable under any partitioning)
    for u in t | v:
        expected_valid = zlib.crc32(u.encode()) % 1000 < 500
        assert (u in v) == expected_valid
