"""E1 T5-example production, balance resampling, and the distributed
EM/F1 eval harness."""

import numpy as np
import pandas as pd
import pytest

from information_extraction_t5_ray.functions.metrics import t5_qa_evaluate, group_qas
from information_extraction_t5_ray.registry import QuestionRegistry
from information_extraction_t5_ray.sources import synth
from information_extraction_t5_ray.stages.balance import (
    balance_stage,
    count_pos_neg_stage,
    pick_indices,
)
from information_extraction_t5_ray.stages.chunk import ChunkConfig, chunk_stage
from information_extraction_t5_ray.stages.clean import clean_stage
from information_extraction_t5_ray.stages.evalqa import (
    eval_stage,
    finalize_eval,
    groups_of_id,
)
from information_extraction_t5_ray.stages.squad import t5_examples_stage

N_DOCS = 24


@pytest.fixture(scope="module")
def examples(ray_session):
    import ray.data as rd

    pages = rd.from_arrow(synth.synth_pages_table(N_DOCS))
    ds = clean_stage(pages)
    ds = chunk_stage(ds, ChunkConfig())
    return t5_examples_stage(ds).materialize()


def test_t5_examples_shape(examples):
    df = examples.to_pandas()
    # every (url, window) answers the full closed qa_id universe
    reg = QuestionRegistry.default()
    from information_extraction_t5_ray.pipelines.kg import KGConfig

    cfg = KGConfig()
    universe = set(
        reg.get_all_qa_ids(
            list_of_type_names=cfg.resolved_type_names(),
            list_of_use_compound_question=cfg.resolved_use_compound(),
        )
    )
    per_window = df.groupby(["url", "window_id"])["qa_id"].agg(set)
    assert all(s == universe for s in per_window)


def test_t5_examples_content(examples):
    df = examples.to_pandas()
    d = 7  # nome_pai present, etiqueta present, complemento present
    url = synth.url_of(d)
    vals = synth.field_values(d)
    rows = df[(df.url == url) & (df.qa_id == "form.cpf")]
    assert (rows.label_sentence == f"[SENT0] [CPF/CNPJ]: {vals['cpf']}").all()
    assert not rows.is_negative.any()
    assert rows.input_sentence.str.startswith(
        "question: Qual é o CPF/CNPJ? context:  [SENT1] "
    ).all()
    # absent field -> forced N/A (anti-join branch)
    d_na = 3  # etiqueta absent (d%7==3)
    rows_na = df[(df.url == synth.url_of(d_na)) & (df.qa_id == "form.etiqueta")]
    assert (rows_na.label_sentence == "[SENT0] [Etiqueta]: N/A").all()
    assert rows_na.is_negative.all()
    # compound follows signature order with N/A members inline
    d_c = 6  # complemento absent (d%3==0)
    row_c = df[(df.url == synth.url_of(d_c)) & (df.qa_id == "form.endereco")].iloc[0]
    assert "[Complemento]: N/A" in row_c.label_sentence
    idx = [
        row_c.label_sentence.index(f"[{t}]:")
        for t in ["Logradouro", "Número", "Complemento", "Bairro", "Cidade", "Estado", "CEP"]
    ]
    assert idx == sorted(idx)


def test_t5_examples_deterministic_under_repartition(examples, ray_session):
    import ray.data as rd

    pages = rd.from_arrow(synth.synth_pages_table(N_DOCS)).repartition(7)
    ds = clean_stage(pages)
    ds = chunk_stage(ds, ChunkConfig())
    df2 = (
        t5_examples_stage(ds)
        .to_pandas()
        .sort_values(["url", "window_id", "qa_id", "question"], ignore_index=True)
    )
    df1 = examples.to_pandas().sort_values(
        ["url", "window_id", "qa_id", "question"], ignore_index=True
    )
    pd.testing.assert_frame_equal(df1, df2)


# --- balance ----------------------------------------------------------------


def _toy_examples():
    rows = []
    for key in range(6):
        n_pos = key % 3  # 0,1,2 positives
        n_neg = 1 + key % 4
        for i in range(n_pos):
            rows.append(("u%d" % key, "q", i, False))
        for i in range(n_neg):
            rows.append(("u%d" % key, "q", 100 + i, True))
    return pd.DataFrame(rows, columns=["url", "qa_id", "window_id", "is_negative"])


def test_balance_semantics(ray_session):
    import ray.data as rd

    df = _toy_examples()
    out = balance_stage(
        rd.from_pandas(df),
        key_cols=["url", "qa_id"],
        order_cols=["window_id"],
        negative_ratio=2,
    ).to_pandas()
    # all positives survive
    pos_in = df[~df.is_negative]
    pos_out = out[~out.is_negative]
    assert len(pos_out) == len(pos_in)
    # negatives: n_pos * ratio per key; keys without positives dropped
    for key, grp in out[out.is_negative].groupby("url"):
        n_pos = len(pos_in[pos_in.url == key])
        assert n_pos > 0
        assert len(grp) == 2 * n_pos
        # sampled rows are real negatives of that key
        assert grp.window_id.isin(df[(df.url == key) & df.is_negative].window_id).all()
    # negatives-only keys contribute nothing
    neg_only = {u for u, g in df.groupby("url") if not (~g.is_negative).any()}
    assert not out.url.isin(neg_only).any()


def test_balance_deterministic_under_partitioning(ray_session):
    import ray.data as rd

    df = _toy_examples()
    outs = []
    for parts in (1, 5):
        out = balance_stage(
            rd.from_pandas(df).repartition(parts),
            key_cols=["url", "qa_id"],
            order_cols=["window_id"],
            negative_ratio=1,
        ).to_pandas()
        outs.append(
            out.sort_values(list(out.columns), ignore_index=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_pick_indices_pure():
    a = pick_indices(12345, 3, 7, 2)
    assert a.shape == (6,)
    assert ((0 <= a) & (a < 7)).all()
    assert (a == pick_indices(12345, 3, 7, 2)).all()


def test_count_pos_neg_stage(ray_session):
    import ray.data as rd

    df = _toy_examples()
    out = count_pos_neg_stage(rd.from_pandas(df), key_cols=["url"]).to_pandas()
    exp = (
        df.assign(neg=df.is_negative.astype(int))
        .groupby("url")
        .agg(n_neg=("neg", "sum"), n_all=("neg", "size"))
        .reset_index()
    )
    exp["n_pos"] = exp.n_all - exp.n_neg
    merged = out.sort_values("url", ignore_index=True)
    expected = exp[["url", "n_pos", "n_neg"]].sort_values("url", ignore_index=True)
    pd.testing.assert_frame_equal(merged, expected, check_dtype=False)


# --- eval harness -----------------------------------------------------------


GOLDEN_IDS = [
    "form.cpf",
    "form.cpf",
    "form.endereco~cidade",
    "form.endereco~cidade*",
    "form.endereco*",
    "pub.orgao_1",
    "pub.orgao_2*",
]


def test_groups_of_id_matches_reference_group_qas():
    """Row-wise group expansion must reproduce group_qas' index map."""
    expected = group_qas(GOLDEN_IDS, group_by_typenames=True)
    got = {}
    for idx, the_id in enumerate(GOLDEN_IDS):
        for g in groups_of_id(the_id, True):
            got.setdefault(g, []).append(idx)
    assert got == expected


def test_eval_stage_matches_t5_qa_evaluate(ray_session):
    import ray.data as rd

    labels = ["[CPF/CNPJ]: 123", "[Cidade]: Campinas", "[Estado]: SP", "[Nome]: Ana Lima"]
    preds = ["[CPF/CNPJ]: 123", "[Cidade]: Sertãozinho", "[Estado]: SP", "[Nome]: Ana"]
    ids = ["form.cpf", "form.endereco~cidade", "form.endereco~estado", "form.nome_completo"]
    df = pd.DataFrame({"label": labels, "prediction": preds, "example_id": ids})

    out = eval_stage(rd.from_pandas(df), num_buckets=3).to_pandas()
    got = finalize_eval(out)

    qid_dict = group_qas(ids, group_by_typenames=True)
    ref = t5_qa_evaluate(labels, preds, qid_dict)
    assert got["all"]["exact"] == pytest.approx(ref["exact"])
    assert got["all"]["f1"] == pytest.approx(ref["f1"], abs=1e-3)
    assert got["all"]["total"] == ref["total"]
    for grp, vals in ref.items():
        if grp in ("exact", "f1", "total"):
            continue
        assert got[grp]["exact"] == pytest.approx(vals["exact"])
        assert got[grp]["f1"] == pytest.approx(vals["f1"], abs=1e-3)
        assert got[grp]["total"] == vals["total"]
