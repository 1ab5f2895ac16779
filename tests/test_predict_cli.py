"""Reference predict.py parity surface: SQuAD file -> prediction cache
-> postprocess -> reports, plus the CLI parser wiring."""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from information_extraction_t5_ray.cli import build_parser
from information_extraction_t5_ray.pipelines.predict import (
    read_squad_windows,
    run_predict,
    squad_label_map,
)
from information_extraction_t5_ray.pipelines.squad_e1 import run_convert

SAMPLE = "/root/reference/data/raw/sample_train.json"


@pytest.fixture(scope="module")
def squad_file(ray_session, tmp_path_factory):
    out = tmp_path_factory.mktemp("convert")
    paths = run_convert(SAMPLE, str(out))
    return paths["train"]


def test_squad_windows_and_labels(ray_session, squad_file):
    wins = read_squad_windows(squad_file).to_pandas()
    assert set(wins.columns) == {"url", "window_id", "n_windows", "context"}
    # every url's n_windows equals its distinct window count
    g = wins.groupby("url").agg(n=("window_id", "nunique"), nw=("n_windows", "first"))
    assert (g["n"] == g["nw"]).all()
    labels = squad_label_map(squad_file)
    assert labels, "sample corpus produces labeled examples"
    # label keys reference real windows
    keys = set(zip(wins["url"], wins["window_id"]))
    assert {(u, w) for (u, _q, w) in labels} <= keys


def test_run_predict_end_to_end(ray_session, squad_file, tmp_path):
    res = run_predict(squad_file, str(tmp_path / "out"))
    m = res["metrics"]
    assert "all" in m and set(m["all"]) == {"exact", "f1", "total"}
    assert m["all"]["total"] > 0
    for artifact in ("predictions", "outputs", "sheets", "metrics"):
        assert Path(res["paths"][artifact]).exists(), artifact
    saved = json.loads(Path(res["paths"]["metrics"]).read_text())
    assert saved["all"]["total"] == m["all"]["total"]


def test_run_predict_cached_reuses_predictions(ray_session, squad_file, tmp_path):
    out = str(tmp_path / "out")
    first = run_predict(squad_file, out)
    pred_dir = Path(first["paths"]["predictions"])
    stamp = {p.name: p.stat().st_mtime for p in pred_dir.iterdir()}
    second = run_predict(squad_file, out, use_cached_predictions=True)
    stamp2 = {p.name: p.stat().st_mtime for p in pred_dir.iterdir()}
    assert stamp == stamp2, "cached run must not rewrite the prediction cache"
    assert first["metrics"] == second["metrics"]


def test_run_predict_recompute_replaces_stale_cache(ray_session, tmp_path):
    """Recomputing into an existing out_dir must OVERWRITE the prediction
    cache: Ray's write_parquet appends into an existing directory, and a
    union of stale + fresh predictions would let a stale row win the
    per-(url, qa_id) argmax downstream."""
    import json

    import pandas as pd

    def squad_for(doc):
        return {
            "data": [
                {
                    "title": doc,
                    "paragraphs": [
                        {"context": "ctx zero", "qas": [
                            {"id": "form.cpf", "question": "Qual o CPF?",
                             "answers": [{"text": "111", "answer_start": 0}]},
                        ]},
                    ],
                }
            ],
            "version": "1.1",
        }

    out = str(tmp_path / "out")
    p1 = tmp_path / "a.json"
    p1.write_text(json.dumps(squad_for("docA")))
    run_predict(str(p1), out, only_mispredictions=False, group_by="qa_id")
    # changed input, SAME out_dir, cache not requested -> full recompute
    p2 = tmp_path / "b.json"
    p2.write_text(json.dumps(squad_for("docB")))
    res = run_predict(str(p2), out, only_mispredictions=False, group_by="qa_id")
    cached = pd.read_parquet(res["paths"]["predictions"])
    assert set(cached["url"].unique()) == {"docB"}, (
        "stale docA predictions survived the recompute"
    )


def test_cli_parser_covers_reference_workflow():
    p = build_parser()
    a = p.parse_args(
        ["convert", "-c", "params.yaml", "--out-dir", "/tmp/x"]
    )
    assert a.cmd == "convert"
    a = p.parse_args(
        ["predict", "--squad-file", "f.json", "--out-dir", "/tmp/x",
         "--scorer", "t5", "--checkpoint-dir", "ckpts", "--use-cached-predictions"]
    )
    assert a.scorer == "t5" and a.use_cached_predictions
    a = p.parse_args(["kg", "--input", "sf", "--ckpt-dir", "c", "--shards", "4"])
    assert a.shards == 4
    a = p.parse_args(["train"])
    assert a.cmd == "train"


def test_train_gated_without_torch(capsys):
    from information_extraction_t5_ray.cli import cmd_train

    try:
        import torch  # noqa: F401

        pytest.skip("torch present; gate test targets torch-less env")
    except ImportError:
        pass
    rc = cmd_train(build_parser().parse_args(["train"]))
    assert rc == 2
    assert "torch" in capsys.readouterr().err


def test_cli_query_parser_and_unknown():
    from information_extraction_t5_ray.cli import build_parser

    p = build_parser()
    a = p.parse_args(["query", "--list"])
    assert a.cmd == "query" and a.list
    a = p.parse_args(["query", "--name", "exact_dedup", "--sf-dir", "/x",
                      "--output", "/tmp/o"])
    assert a.name == "exact_dedup" and a.output == "/tmp/o"


def test_cli_query_list_covers_registry(capsys):
    from information_extraction_t5_ray.cli import build_parser, cmd_query

    rc = cmd_query(build_parser().parse_args(["query", "--list"]))
    assert rc == 0
    out = capsys.readouterr().out
    # every registered query appears with its oracle marker
    import __ray_entry__ as entry

    oracled = set(entry.oracle_sql())
    for line in out.strip().splitlines():
        name, marker = line.split("\t")
        expected = "oracle" if name in oracled else "rows-only"
        assert marker == expected, (name, marker)
    listed = {ln.split("\t")[0] for ln in out.strip().splitlines()}
    assert listed == set(entry.queries())


def test_predict_scores_only_file_defined_pairs(ray_session, tmp_path):
    """Reference parity: the eval must consider only (url, qa, window)
    triples the SQuAD file defines — a qa present ONLY on window 0 must
    have its prediction selected from window 0, even if another window
    would have scored 'better'."""
    import json

    from information_extraction_t5_ray.pipelines.predict import run_predict

    squad = {
        "data": [
            {
                "title": "docA",
                "paragraphs": [
                    {"context": "ctx zero", "qas": [
                        {"id": "form.cpf", "question": "Qual o CPF?",
                         "answers": [{"text": "111", "answer_start": 0}]},
                    ]},
                    # window 1 defines a DIFFERENT qa only
                    {"context": "ctx one", "qas": [
                        {"id": "form.agencia", "question": "Qual a agência?",
                         "answers": [{"text": "222", "answer_start": 0}]},
                    ]},
                ],
            }
        ],
        "version": "1.1",
    }
    p = tmp_path / "eval.json"
    p.write_text(json.dumps(squad))
    res = run_predict(str(p), str(tmp_path / "out"), scorer="mock",
                      only_mispredictions=False, group_by="qa_id")
    # every evaluated answer must come from a file-defined pair: with
    # 2 windows x 1 qa each, exactly ONE evaluated row per qa — had the
    # argmax considered registry qas on windows the file never defines,
    # extra qa groups (and cross-window labels) would appear
    m = res["metrics"]
    qa_groups = {k for k in m if k not in ("all",) and not k.endswith("*")}
    assert qa_groups == {"form.cpf", "form.agencia"}
    assert m["form.cpf"]["total"] == 1
    assert m["form.agencia"]["total"] == 1


def test_cli_kg_format_parser():
    from information_extraction_t5_ray.cli import build_parser

    p = build_parser()
    a = p.parse_args(
        ["kg", "--input", "/x", "--output", "/tmp/o", "--format", "ntriples"]
    )
    assert a.format == "ntriples"
    assert (
        p.parse_args(["kg", "--input", "/x"]).format == "parquet"
    )  # default


def test_cli_kg_sink_formats_end_to_end(ray_session, tmp_path, capsys):
    """Drive the two non-Parquet sink formats through the real CLI
    command (the session fixture owns Ray; cmd_kg's _ray_session is a
    no-op under an existing session)."""
    import json as _json

    from information_extraction_t5_ray.cli import build_parser, cmd_kg

    nt_out = str(tmp_path / "nt")
    rc = cmd_kg(
        build_parser().parse_args(
            ["kg", "--input", "/root/testdata/sf0.001",
             "--output", nt_out, "--format", "ntriples"]
        )
    )
    assert rc == 0
    assert _json.loads(capsys.readouterr().out)["format"] == "ntriples"
    assert list((tmp_path / "nt").glob("*.nt"))
    assert (tmp_path / "nt" / "_MANIFEST.json").exists()

    pg_out = str(tmp_path / "pg")
    rc = cmd_kg(
        build_parser().parse_args(
            ["kg", "--input", "/root/testdata/sf0.001",
             "--output", pg_out, "--format", "pg"]
        )
    )
    assert rc == 0
    info = _json.loads(capsys.readouterr().out)
    assert info["format"] == "pg"
    for d in (info["nodes"], info["edges"]):
        from pathlib import Path

        assert (Path(d) / "_MANIFEST.json").exists()
