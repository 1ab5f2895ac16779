"""params.yaml compatibility: the reference's own config file drives
this engine unchanged."""

import json

import pytest

from information_extraction_t5_ray.config import (
    convert_from_params,
    load_params_yaml,
)

PARAMS = "/root/reference/params.yaml"


def test_load_reference_params():
    cfg = load_params_yaml(PARAMS)
    assert cfg.projects == ["form"]
    assert cfg.kg.chunk.context_content == "windows_token"
    assert cfg.kg.chunk.max_tokens == 512
    assert cfg.kg.chunk.max_size == 2048
    assert cfg.kg.chunk.window_overlap == 0.2
    assert cfg.kg.chunk.max_windows == 3
    assert cfg.kg.type_names == [
        "form.etiqueta", "form.agencia", "form.conta_corrente", "form.cpf",
        "form.nome_completo", "form.n_doc_serie", "form.orgao_emissor",
        "form.data_emissao", "form.data_nascimento", "form.nome_mae",
        "form.nome_pai", "form.endereco",
    ]
    assert cfg.kg.use_compound == ["form.endereco"]
    assert cfg.valid_percent == 0.2
    assert cfg.choose_question == "first"
    assert cfg.use_sentence_id is False
    assert cfg.model["num_beams"] == 5
    assert cfg.raw_data_files == ["data/raw/sample_train.json"]
    assert cfg.raw_test_data_files == ["data/raw/sample_test.json"]


def test_convert_from_params_end_to_end(ray_session, tmp_path):
    """E1 driven entirely by the reference's shipped YAML + corpus."""
    paths = convert_from_params(
        PARAMS, str(tmp_path), repo_root="/root/reference"
    )
    assert "train" in paths and "test" in paths
    train = json.load(open(paths["train"]))
    test = json.load(open(paths["test"]))
    total_docs = len(train["data"]) + len(json.load(open(paths["valid"]))["data"])
    assert total_docs == 3  # sample_train.json
    assert len(test["data"]) >= 1  # sample_test.json
    qa = train["data"][0]["paragraphs"][0]["qas"][0] if train["data"] else \
        test["data"][0]["paragraphs"][0]["qas"][0]
    assert set(qa) == {"answers", "question", "id"}
