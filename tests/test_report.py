"""Report sinks: outputs.txt dump, pivot sheet, metrics JSON."""

import json

import pandas as pd
import pytest

from information_extraction_t5_ray.stages.evalqa import eval_stage, finalize_eval
from information_extraction_t5_ray.stages.report import (
    save_metrics_json,
    save_outputs_report,
    save_sheets_report,
)


@pytest.fixture()
def answers_df():
    return pd.DataFrame(
        {
            "url": ["u1", "u1", "u2", "u2"],
            "example_id": ["form.cpf", "form.nome_completo", "form.cpf", "form.nome_completo"],
            "label": ["[CPF/CNPJ]: 123", "[Nome]: Ana Lima", "[CPF/CNPJ]: 99", "[Nome]: Bruno"],
            "prediction": ["[CPF/CNPJ]: 123", "[Nome]: Ana", "[CPF/CNPJ]: 99", "[Nome]: Bruno"],
            "prob": [0.9, 0.8, 0.95, 0.7],
            "window_id": [0, 0, 1, 0],
        }
    )


def test_outputs_report(ray_session, answers_df, tmp_path):
    import ray.data as rd

    p = save_outputs_report(
        rd.from_pandas(answers_df), str(tmp_path / "outputs.txt")
    )
    text = open(p).read()
    assert "form.cpf" in text and "[Nome]: Ana Lima" in text
    # misprediction-only filter keeps just the one mismatching row
    p2 = save_outputs_report(
        rd.from_pandas(answers_df),
        str(tmp_path / "mis.txt"),
        only_mispredictions=True,
    )
    t2 = open(p2).read()
    assert "[Nome]: Ana Lima" in t2 and "[CPF/CNPJ]: 123" not in t2


def test_sheets_report(ray_session, answers_df, tmp_path):
    import ray.data as rd

    p = save_sheets_report(rd.from_pandas(answers_df), str(tmp_path / "sheet.xlsx"))
    # small pivot -> real xlsx via the stdlib SpreadsheetML writer
    assert p.endswith(".xlsx")
    from information_extraction_t5_ray.functions.xlsx import read_xlsx_cells

    cells = read_xlsx_cells(p)
    rows = cells["sheet"]
    header = rows[0]
    assert any("form.cpf" in str(h) for h in header)
    flat = str(rows)
    assert "Ana" in flat
    # the streamed CSV twin carries identical cells
    csv_df = pd.read_csv(p[: -len(".xlsx")] + ".csv")
    assert len(csv_df) == len(rows) - 1
    assert list(map(str, csv_df.columns)) == [str(h) for h in header]


def test_xlsx_writer_roundtrip(tmp_path):
    """functions/xlsx.py round-trip: strings (escaped), ints, floats,
    None/NaN blanks, multiple sheets in insertion order (reference
    _save_sheets writes one sheet per document_class)."""
    from information_extraction_t5_ray.functions.xlsx import (
        read_xlsx_cells,
        write_xlsx,
    )

    path = str(tmp_path / "t.xlsx")
    write_xlsx(
        path,
        {
            "m": (
                ["doc", "f1", "note"],
                [["d<1>", 0.5, "a & b"], ["d2", 1.0, None]],
            ),
            "n": (["k"], [[3]]),
        },
    )
    cells = read_xlsx_cells(path)
    assert list(cells) == ["m", "n"]
    assert cells["m"][0] == ["doc", "f1", "note"]
    assert cells["m"][1] == ["d<1>", 0.5, "a & b"]
    assert cells["m"][2] == ["d2", 1.0, None]
    assert cells["n"] == [["k"], [3.0]]


def test_metrics_json(ray_session, answers_df, tmp_path):
    import ray.data as rd

    out = eval_stage(rd.from_pandas(answers_df)).to_pandas()
    p = save_metrics_json(finalize_eval(out), str(tmp_path / "metrics.json"))
    d = json.load(open(p))
    assert d["all"]["total"] == 4
    assert d["form.cpf"]["exact"] == 100.0


def test_split_stage_survives_malformed_sent_token(ray_session):
    """A model emission with a non-numeric [SENTxx] id must coerce to
    the -1 sentinel, not ArrowInvalid the whole split stage
    (ANSWERS_SCHEMA types sent_ids as list<int32>)."""
    import ray.data as rd

    from information_extraction_t5_ray.stages.postprocess import split_stage

    best = rd.from_items(
        [
            {
                "url": "u1", "qa_id": "form.cpf", "label": "[SENT1] x",
                "prediction": "broken [SENT01a]", "prob": 0.5,
                "window_id": 0,
            }
        ]
    )
    out = split_stage(best, {}).to_pandas()
    assert len(out) > 0
    flat = [i for row in out["sent_ids"] if row is not None for i in row]
    assert -1 in flat
