"""Round-4 regression tests for the ADVICE r3 items: CLI non-parquet
--format without --output must error (not silently write parquet),
write_ntriples must reject subj/pred values illegal in an IRIREF at
write time, and export_property_graph must not leave a previous run's
shards behind on rerun."""

import json
import os

import pyarrow as pa
import pytest

from information_extraction_t5_ray.cli import main as cli_main


# ---------------------------------------------------------------------------
# ADVICE: `kg --format ntriples/pg` without --output silently fell into
# the parquet/count branch; --ckpt-dir likewise swallowed --format
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fmt", ["ntriples", "pg"])
def test_cli_kg_format_requires_output(fmt, capsys):
    rc = cli_main(["kg", "--input", "/root/testdata/sf0.001", "--format", fmt])
    assert rc == 2
    err = capsys.readouterr().err
    assert "--output" in err and fmt in err


def test_cli_kg_format_rejected_with_ckpt_dir(tmp_path, capsys):
    rc = cli_main(
        [
            "kg",
            "--input",
            "/root/testdata/sf0.001",
            "--format",
            "ntriples",
            "--output",
            str(tmp_path / "out"),
            "--ckpt-dir",
            str(tmp_path / "ckpt"),
        ]
    )
    assert rc == 2
    assert "--ckpt-dir" in capsys.readouterr().err


# ---------------------------------------------------------------------------
# ADVICE: write_ntriples interpolated subj/pred into <...> unvalidated —
# a '>' / space / newline emitted an unreadable shard, detected only at
# read time.  Now: loud ValueError at write time.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "bad_subj",
    ["ent>oops", "has space", "new\nline", 'quo"te', "back\\slash", "ctl\x01"],
)
def test_write_ntriples_rejects_illegal_iri(ray_session, tmp_path, bad_subj):
    import ray

    from information_extraction_t5_ray.stages.triples import write_ntriples

    ds = ray.data.from_arrow(
        pa.table(
            {
                "subj": pa.array([bad_subj]),
                "pred": pa.array(["tipo"]),
                "obj": pa.array(["ok"]),
            }
        )
    )
    with pytest.raises((ValueError, Exception)) as ei:
        write_ntriples(ds, str(tmp_path / "nt"))
    assert "IRIREF" in str(ei.value)


def test_write_ntriples_rejects_illegal_pred(ray_session, tmp_path):
    import ray

    from information_extraction_t5_ray.stages.triples import write_ntriples

    ds = ray.data.from_arrow(
        pa.table(
            {
                "subj": pa.array(["ok"]),
                "pred": pa.array(["pred with space"]),
                "obj": pa.array(["ok"]),
            }
        )
    )
    with pytest.raises(Exception) as ei:
        write_ntriples(ds, str(tmp_path / "nt"))
    assert "IRIREF" in str(ei.value)


def test_write_ntriples_accepts_escaped_object(ray_session, tmp_path):
    """Objects may carry any character — they are escaped literals; only
    subj/pred are IRI-constrained."""
    import ray

    from information_extraction_t5_ray.stages.triples import (
        read_ntriples,
        write_ntriples,
    )

    tbl = pa.table(
        {
            "subj": pa.array(["e1"]),
            "pred": pa.array(["tipo"]),
            "obj": pa.array(['line1\nline2\t"quoted" \\ end']),
        }
    )
    out = str(tmp_path / "nt")
    write_ntriples(ray.data.from_arrow(tbl), out)
    back = read_ntriples(out).to_pandas()
    assert back["obj"].tolist() == ['line1\nline2\t"quoted" \\ end']


# ---------------------------------------------------------------------------
# ADVICE: export_property_graph rerun into an existing out_dir left the
# previous run's parquet files in place; the flat-dir manifest globs
# *.parquet so leftovers were double-counted and double-read.
# ---------------------------------------------------------------------------


def test_export_property_graph_rerun_is_clean(ray_session, tmp_path):
    from information_extraction_t5_ray.pipelines.kg import (
        export_property_graph,
        run_kg,
    )

    triples = run_kg("/root/testdata/sf0.001")
    out = str(tmp_path / "pg")
    nodes_dir, edges_dir = export_property_graph(triples, out)

    def snapshot(d):
        files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
        with open(os.path.join(d, "_MANIFEST.json")) as f:
            manifest = json.load(f)
        return files, manifest

    nodes1, nm1 = snapshot(nodes_dir)
    edges1, em1 = snapshot(edges_dir)
    # plant a stale shard from a "previous run" alongside, then rerun
    stale = os.path.join(nodes_dir, "stale_from_old_run.parquet")
    with open(stale, "wb") as f:
        f.write(b"not really parquet")
    export_property_graph(run_kg("/root/testdata/sf0.001"), out)
    nodes2, nm2 = snapshot(nodes_dir)
    edges2, em2 = snapshot(edges_dir)
    assert "stale_from_old_run.parquet" not in nodes2
    # every file on disk is accounted for by the manifest, and the
    # manifests agree run-over-run on total rows
    assert nm1["total_rows"] == nm2["total_rows"]
    assert em1["total_rows"] == em2["total_rows"]
    import ray

    n = ray.data.read_parquet(nodes_dir).count()
    assert n == nm2["total_rows"]
