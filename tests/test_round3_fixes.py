"""Round-3 regression tests: ADVICE items (RE2 dotall object extraction,
outputs.txt group-section parity, bucket-hash version guard, CC
convergence guard) and VERDICT items (vectorized EntityLinker,
vectorized balance crc32)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from information_extraction_t5_ray.functions.grammar import find_sub_answers
from information_extraction_t5_ray.stages import common
from information_extraction_t5_ray.stages.link import EntityLinker
from information_extraction_t5_ray.stages.triples import project_triples_batch


# ---------------------------------------------------------------------------
# ADVICE: RE2 '.' must cross newlines in the vectorized object extraction
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "prediction",
    [
        "[a]: x\n[b]: y",
        "[CPF/CNPJ]: 123\n[Nome]: Ana Lima",
        "[a]: line one\nline two [b]: tail",
        "no brackets at all",
        "[solo]: value",
    ],
)
def test_project_triples_newline_matches_scalar_grammar(prediction):
    batch = pa.table(
        {
            "variant": ["clean"],
            "prediction": [prediction],
            "example_id": ["form.cpf"],
            "url": ["u1"],
            "prob": [0.9],
            "window_ids": [[0]],
        }
    )
    out = project_triples_batch(batch)
    subs = find_sub_answers(prediction)
    expected = subs[-1] if subs else ""
    if expected in ("", "N/A"):
        assert len(out) == 0
    else:
        assert out["obj_surface"].to_pylist() == [expected]


# ---------------------------------------------------------------------------
# ADVICE: outputs.txt parity — ORIG/DISJOINT/document-class skip, stable
# within-group order, no spurious empty header, headers for filtered-empty
# groups in misprediction mode
# ---------------------------------------------------------------------------


def _answers_frame():
    return pd.DataFrame(
        {
            "url": ["u2", "u1", "u1", "u3", "u1", "u1"],
            "example_id": [
                "form.cpf",
                "form.cpf",
                "ORIG",
                "DISJOINT_0",
                "form",
                "form.nome",
            ],
            "label": ["[C]: 9", "[C]: 1", "[C]: x", "[C]: y", "[C]: z", "[N]: Ana"],
            "prediction": ["[C]: 9", "[C]: 2", "[C]: x", "[C]: y", "[C]: z", "[N]: Ana"],
            "prob": [0.9, 0.8, 0.7, 0.6, 0.5, 0.4],
            "window_id": [0, 0, 0, 0, 0, 0],
        }
    )


def test_outputs_report_skips_orig_disjoint_and_document_class(
    ray_session, tmp_path
):
    import ray.data as rd

    from information_extraction_t5_ray.stages.report import save_outputs_report

    p = save_outputs_report(
        rd.from_pandas(_answers_frame()), str(tmp_path / "o.txt")
    )
    text = open(p).read()
    assert "ORIG" not in text
    assert "DISJOINT" not in text
    # the bare document-class group is skipped, its row gone with it
    assert "[C]: z" not in text
    # within form.cpf, u1 precedes u2 (document order, not line-text order:
    # line text would put '[C]: 9' row wherever its label sorts)
    assert text.index("u1") < text.index("u2")
    assert "form.cpf" in text and "form.nome" in text


def test_outputs_report_no_header_when_group_col_missing(ray_session, tmp_path):
    import ray.data as rd

    from information_extraction_t5_ray.stages.report import save_outputs_report

    df = _answers_frame().drop(columns=["example_id"])
    p = save_outputs_report(rd.from_pandas(df), str(tmp_path / "o2.txt"))
    text = open(p).read()
    assert "===============" not in text
    assert text.count("\n") == 1 + len(df)  # header line + one line per row


def test_outputs_report_header_survives_misprediction_filter(
    ray_session, tmp_path
):
    import ray.data as rd

    from information_extraction_t5_ray.stages.report import save_outputs_report

    p = save_outputs_report(
        rd.from_pandas(_answers_frame()),
        str(tmp_path / "o3.txt"),
        only_mispredictions=True,
    )
    text = open(p).read()
    # form.cpf has the one mismatching row; form.nome is all-correct but
    # the reference still writes its section header (qa_model.py:377)
    assert "form.cpf" in text
    assert "form.nome" in text
    assert "[N]: Ana" not in text
    assert "ORIG" not in text and "DISJOINT" not in text


# ---------------------------------------------------------------------------
# ADVICE: bucket hash version guard
# ---------------------------------------------------------------------------


def test_bucket_of_hash_guard_passes_on_this_pandas():
    common._siphash_checked = False
    b = common.bucket_of(np.array(["a", "b", "a"], dtype=object), 8)
    assert b[0] == b[2]
    assert common._siphash_checked


def test_bucket_of_hash_guard_raises_on_drift(monkeypatch):
    monkeypatch.setattr(common, "_SIPHASH_SENTINELS", (1, 2))
    monkeypatch.setattr(common, "_siphash_checked", False)
    with pytest.raises(RuntimeError, match="pandas string hash"):
        common.bucket_of(np.array(["a"], dtype=object), 8)
    common._siphash_checked = False  # leave clean state


# ---------------------------------------------------------------------------
# ADVICE: connected_components must fail loud when contraction runs out of
# rounds instead of emitting a partial clustering
# ---------------------------------------------------------------------------


def test_connected_components_raises_when_rounds_exhausted(ray_session):
    import ray.data as rd

    from information_extraction_t5_ray.stages import dedup as dd

    pairs = rd.from_pandas(pd.DataFrame({"i": [1, 2, 3], "j": [2, 3, 4]}))
    with pytest.raises(RuntimeError, match="did not converge"):
        dd.connected_components(pairs, max_rounds=0, local_threshold=0)


# ---------------------------------------------------------------------------
# VERDICT: vectorized EntityLinker equals the scalar link_one row loop
# ---------------------------------------------------------------------------


def test_entity_linker_vectorized_matches_scalar():
    linker = EntityLinker()
    preds = [
        "form.estado",
        "form.cpf",
        "form.doc_id_uf",
        "form.estado",
        "form.estado",
        "form.nome",
    ]
    objs = ["sao paulo", "sao paulo", "RJ", "rio de janero", "", "minas"]
    batch = pa.table({"pred": preds, "obj_surface": objs})
    out = linker(batch)["obj_linked"].to_pylist()
    expected = [
        linker.link_one(p.rsplit(".", 1)[-1], v) for p, v in zip(preds, objs)
    ]
    assert out == expected
    # non-UF rows pass through untouched
    assert out[1] == "sao paulo" and out[5] == "minas"
    # exact alias + fuzzy rerank actually fired on the UF rows
    assert out[0] == "SP" and out[2] == "RJ"


def test_entity_linker_empty_batch():
    linker = EntityLinker()
    batch = pa.table(
        {"pred": pa.array([], pa.string()), "obj_surface": pa.array([], pa.string())}
    )
    out = linker(batch)
    assert len(out) == 0 and "obj_linked" in out.column_names


# ---------------------------------------------------------------------------
# VERDICT: factorized balance-stage crc32 equals the per-row definition
# ---------------------------------------------------------------------------


def test_balance_tag_hash_matches_per_row_crc32(ray_session):
    import zlib

    import ray.data as rd

    from information_extraction_t5_ray.stages.balance import balance_stage

    df = pd.DataFrame(
        {
            "url": ["u1"] * 4 + ["u2"] * 4,
            "qa_id": ["q1", "q1", "q2", "q2"] * 2,
            "is_negative": [False, True, True, False] * 2,
            "window_id": range(8),
            "question": [f"w{i}" for i in range(8)],
        }
    )
    out = balance_stage(
        rd.from_pandas(df),
        key_cols=["url", "qa_id"],
        order_cols=["window_id", "question"],
    ).to_pandas()
    # independent scalar re-derivation of the same draw
    from information_extraction_t5_ray.stages.balance import pick_indices

    for (u, q), grp in df.groupby(["url", "qa_id"]):
        h = zlib.crc32(f"{u}|{q}".encode())
        neg = grp[grp["is_negative"]].sort_values(["window_id", "question"])
        pos = grp[~grp["is_negative"]]
        want = len(pos) + (len(pos) if len(neg) else 0)
        got = out[(out["url"] == u) & (out["qa_id"] == q)]
        assert len(got) == want
        if len(neg) and len(pos):
            picks = pick_indices(h, len(pos), len(neg), 1)
            sampled_windows = sorted(neg.iloc[picks]["window_id"].tolist())
            got_neg = sorted(
                got[got["is_negative"]]["window_id"].tolist()
            )
            assert got_neg == sampled_windows


def test_entity_linker_null_pred_and_obj():
    """Nulls must pass through (scalar-path behavior), not crash the
    gather with float NaN dictionary indices."""
    import pyarrow as pa

    from information_extraction_t5_ray.stages.link import EntityLinker

    batch = pa.table(
        {
            "pred": pa.array(["form.endereco.estado", None, "form.nome"]),
            "obj_surface": pa.array(["pernambuco", "x", None]),
        }
    )
    out = EntityLinker()(batch)
    got = out["obj_linked"].to_pylist()
    assert got[0] == "PE"  # UF leaf linked to the canonical code
    assert got[1] == "x"  # null pred -> passthrough branch
    assert got[2] is None  # null object stays null


def test_latest_snapshot_equal_ts_deterministic(ray_session):
    """Equal-timestamp snapshots in DIFFERENT batches must resolve to
    the same winner on every run (content_id/n_bytes tiebreak)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from information_extraction_t5_ray.stages.crawl import latest_snapshot

    def tbl(content_id):
        return pa.table(
            {
                "url": pa.array(["u"], pa.string()),
                "warc_ts": pa.array(
                    np.array([100], "datetime64[s]").astype("datetime64[us]")
                ),
                "content_id": pa.array([content_id], pa.int64()),
                "n_bytes": pa.array([1], pa.int64()),
                "lang": pa.array(["pt"], pa.string()),
            }
        )

    for order in [(1, 2), (2, 1)]:  # both arrival orders
        ds = rd.from_arrow(tbl(order[0])).union(rd.from_arrow(tbl(order[1])))
        got = latest_snapshot(ds).to_pandas()
        assert len(got) == 1
        assert got["content_id"].iloc[0] == 2, order


def test_pagerank_overflow_raises(ray_session):
    """A rank*weight product that would wrap int64 must fail loud."""
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from information_extraction_t5_ray.stages.graph import pagerank

    big = 10_000_000  # rank 1e12 * 1e7 within one iteration -> > 2^63
    edges = pa.table(
        {
            "a": pa.array(["x", "y"], pa.string()),
            "b": pa.array(["y", "x"], pa.string()),
            "cnt": pa.array([big, big], pa.int64()),
        }
    )
    # the bounded fast path now runs worker-side (r5), so the guard's
    # OverflowError surfaces wrapped in RayTaskError — assert the loud
    # failure either way, with the original type in the traceback chain
    import traceback

    with _pytest.raises(Exception) as ei:
        pagerank(rd.from_arrow(edges)).to_pandas()
    tb = "".join(traceback.format_exception(ei.value))
    assert isinstance(ei.value, OverflowError) or "OverflowError" in tb, tb


def test_xlsx_numpy_scalars_are_numeric_cells(tmp_path):
    import numpy as np

    from information_extraction_t5_ray.functions.xlsx import write_xlsx

    p = tmp_path / "t.xlsx"
    write_xlsx(
        str(p), {"s": (["n", "f"], [[np.int64(5), np.float64(1.5)]])}
    )
    from zipfile import ZipFile

    xml = ZipFile(p).read("xl/worksheets/sheet1.xml").decode()
    assert 't="n"><v>5</v>' in xml
    assert 't="n"><v>1.5</v>' in xml
    # only the header strings may be inline text — never the values
    assert ">5</t>" not in xml and ">1.5</t>" not in xml


def test_merge_triples_latest_wins_across_batches(ray_session):
    """Newer src_ts wins per (subj, pred) even when old and new rows
    live in different datasets/batches; equal-ts conflicts resolve to
    the lexicographic-min obj deterministically."""
    import pyarrow as pa
    import ray.data as rd

    from information_extraction_t5_ray.stages.triples import merge_triples

    def tbl(rows):
        return pa.table(
            {
                "subj": pa.array([r[0] for r in rows], pa.string()),
                "pred": pa.array([r[1] for r in rows], pa.string()),
                "obj": pa.array([r[2] for r in rows], pa.string()),
                "src_ts": pa.array([r[3] for r in rows], pa.int64()),
            }
        )

    old = rd.from_arrow(
        tbl([("u1", "p", "old-val", 1), ("u2", "p", "keep-me", 1)])
    )
    new = rd.from_arrow(
        tbl([("u1", "p", "new-val", 2), ("u3", "p", "b", 2), ("u3", "p", "a", 2)])
    )
    got = (
        merge_triples(old, new)
        .to_pandas()
        .sort_values("subj")
        .reset_index(drop=True)
    )
    assert list(got["subj"]) == ["u1", "u2", "u3"]
    assert list(got["obj"]) == ["new-val", "keep-me", "a"]  # min-obj tie
    assert list(got["src_ts"]) == [2, 1, 2]


def test_write_triples_manifest_and_roundtrip(ray_session, tmp_path):
    """The sink writes sorted partitioned Parquet PLUS a per-partition
    lineage manifest whose row counts equal the data; read_parquet of
    the directory ignores the manifest and round-trips every row."""
    import json

    import ray.data as rd

    from information_extraction_t5_ray.pipelines.kg import run_kg
    from information_extraction_t5_ray.stages.triples import write_triples

    out = str(tmp_path / "sink")
    tri = run_kg("/root/testdata/sf0.001")
    n = tri.count()
    write_triples(run_kg("/root/testdata/sf0.001"), out)
    man = json.load(open(f"{out}/_MANIFEST.json"))
    assert man["total_rows"] == n
    assert man["partitions"], "at least one partition directory"
    for p, info in man["partitions"].items():
        assert p.startswith("partition_id=")
        assert info["rows"] > 0 and info["files"]
    back = rd.read_parquet(out)
    assert back.count() == n


def test_label_propagation_rejects_one_directional_edges(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from information_extraction_t5_ray.stages.graph import label_propagation

    # 'b' never appears as an 'a' endpoint -> loud precondition error
    edges = rd.from_arrow(
        pa.table(
            {
                "a": pa.array(["a"], pa.string()),
                "b": pa.array(["b"], pa.string()),
                "cnt": pa.array([1], pa.int64()),
            }
        )
    )
    with pytest.raises(ValueError, match="SYMMETRIC"):
        label_propagation(edges).to_pandas()


def test_compact_blocks_narrows_tiny_artifacts(ray_session):
    import ray.data as rd

    from information_extraction_t5_ray.stages.common import compact_blocks

    wide = rd.range(1000).repartition(40)
    m = compact_blocks(wide, floor=4)
    # 1000 int rows are far below one 32 MiB target block -> floor wins
    assert m.num_blocks() <= 4
    assert m.count() == 1000
    # already-narrow input is returned as-is (never widened)
    narrow = rd.range(100).repartition(2).materialize()
    same = compact_blocks(narrow, floor=8)
    assert same.num_blocks() == 2
    assert same.count() == 100
