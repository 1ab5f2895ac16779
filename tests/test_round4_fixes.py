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


# ---------------------------------------------------------------------------
# VERDICT r3 item 4: IVF centroid training must draw a hash sample, not
# a corpus-prefix limit().  Fixture: a SOURCE-SORTED corpus (all of
# cluster A first, then cluster B) with train_sample smaller than
# cluster A — a prefix sample would train every centroid on A's
# manifold and low-nprobe recall on B-side queries would collapse.
# ---------------------------------------------------------------------------


def _sorted_two_cluster_corpus(n_per=400, d=16, seed=7):
    import numpy as np

    rng = np.random.RandomState(seed)
    a = rng.randn(n_per, d) * 0.05 + np.eye(d)[0] * 5
    b = rng.randn(n_per, d) * 0.05 + np.eye(d)[1] * 5
    mat = np.vstack([a, b])  # sorted: A block then B block
    ids = np.arange(len(mat), dtype=np.int64)
    return ids, mat


def test_ivf_train_sample_is_hash_drawn_not_prefix(ray_session):
    import numpy as np
    import ray

    from information_extraction_t5_ray.stages import similarity as sim

    ids, mat = _sorted_two_cluster_corpus()
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([row.tolist() for row in mat]),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(8)
    # train_sample (200) < cluster A's size (400): a prefix draw sees
    # ONLY cluster A
    sample = sim._train_sample_df(ds, 200)
    got = np.asarray(sample["vec_id"])
    assert (got < 400).any() and (got >= 400).any(), (
        "hash sample must span both source-sorted blocks"
    )
    # and IVF at nprobe=1 must still answer B-side queries correctly:
    # with prefix-trained centroids every centroid sits on A and the
    # probed cluster for a B query contains no B candidates
    q_ids = np.array([10_000, 10_001], dtype=np.int64)
    q = np.vstack([mat[5], mat[405]])  # one query per cluster
    out = sim.ann_topk_ivf(
        ds, q_ids, q, k=3, n_clusters=4, nprobe=1, train_sample=200
    ).to_pandas()
    b_neighbors = out[out["query_id"] == 10_001]["neighbor_id"]
    assert len(b_neighbors) == 3 and (b_neighbors >= 400).all(), (
        "B-side query must retrieve B-side neighbors under nprobe=1"
    )


def test_train_sample_df_small_corpus_passthrough(ray_session):
    import ray

    from information_extraction_t5_ray.stages import similarity as sim

    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(50)), type=pa.int64()),
            "embedding": pa.array([[float(i)] * 4 for i in range(50)]),
        }
    )
    sample = sim._train_sample_df(ray.data.from_arrow(tbl), 200)
    assert len(sample) == 50  # total <= n: everything, no filter pass


# ---------------------------------------------------------------------------
# VERDICT r3 item 3: when the documents table is a multi-file directory
# (the production layout), read_pages shard=(k, n) must become a
# FILE-RANGE path selection — each shard reads ~1/n of the input bytes
# — not a row filter after a full read.
# ---------------------------------------------------------------------------


@pytest.fixture()
def multifile_sf_dir(tmp_path):
    """sf0.001 documents re-laid-out as a 4-file directory."""
    import shutil

    import pyarrow.parquet as pq

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    d = tmp_path / "sf"
    docs = d / "documents.parquet"
    docs.mkdir(parents=True)
    n_files = 4
    step = (len(src) + n_files - 1) // n_files
    for i in range(n_files):
        pq.write_table(
            src.slice(i * step, step), str(docs / f"part-{i:05d}.parquet")
        )
    for t in ("region", "nation"):  # sibling tables some helpers touch
        shutil.copy(
            f"/root/testdata/sf0.001/{t}.parquet", str(d / f"{t}.parquet")
        )
    return str(d)


def test_read_pages_shard_is_file_range_on_multifile_input(
    ray_session, multifile_sf_dir
):
    from information_extraction_t5_ray.sources import synth

    import pyarrow.parquet as pq

    paths = synth.documents_paths(multifile_sf_dir)
    assert len(paths) == 4
    total_bytes = sum(os.path.getsize(p) for p in paths)
    n = 4
    seen: set[int] = set()
    for k in range(n):
        ds = synth.read_pages(multifile_sf_dir, shard=(k, n))
        # provenance: the shard's pages must be EXACTLY the rows of the
        # k-th file range (paths[k::n]) — proving the shard read that
        # file selection, not a row-filtered full scan
        sel = paths[k::n]
        assert len(sel) == 1
        shard_bytes = sum(os.path.getsize(p) for p in sel)
        assert shard_bytes <= 0.5 * total_bytes  # ~1/4 of the input bytes
        expect = set(
            pq.read_table(sel[0], columns=["doc_id"])["doc_id"].to_pylist()
        )
        ids = set(
            int(u.rsplit("/", 1)[-1]) for u in ds.to_pandas()["url"]
        )
        assert ids == expect
        assert seen.isdisjoint(ids)
        seen |= ids
    full = synth.read_pages(multifile_sf_dir)
    assert len(seen) == full.count()


def test_read_pages_more_shards_than_files_covers_all(
    ray_session, multifile_sf_dir
):
    from information_extraction_t5_ray.sources import synth

    n = 6  # > 4 files: two shards come up empty, union still complete
    counts = [
        synth.read_pages(multifile_sf_dir, shard=(k, n)).count()
        for k in range(n)
    ]
    assert counts.count(0) == 2
    assert sum(counts) == synth.read_pages(multifile_sf_dir).count()


def test_run_kg_sharded_resume_on_multifile_input(
    ray_session, multifile_sf_dir, tmp_path
):
    from pathlib import Path

    from information_extraction_t5_ray.pipelines.kg import (
        KGConfig,
        run_kg,
        run_kg_sharded,
    )

    ck = str(tmp_path / "ck")
    ds1, skipped1 = run_kg_sharded(multifile_sf_dir, ck, KGConfig(), num_shards=4)
    assert not any(skipped1.values())
    n1 = ds1.count()
    assert n1 == run_kg(multifile_sf_dir).count()
    (Path(ck) / "shard=2" / "_MANIFEST.json").unlink()
    ds2, skipped2 = run_kg_sharded(multifile_sf_dir, ck, KGConfig(), num_shards=4)
    assert [skipped2[k] for k in range(4)] == [True, True, False, True]
    assert ds2.count() == n1


# ---------------------------------------------------------------------------
# Code-review findings on the round-4 diff: shard_mode semantics, empty
# input dirs, heterogeneous shard schemas, layout-staleness of resume
# fingerprints.
# ---------------------------------------------------------------------------


def test_read_pages_shard_mode_rows_is_layout_independent(
    ray_session, multifile_sf_dir
):
    """kg_merge's oracle hardcodes doc_id % 2 = 0: with
    shard_mode="rows" the shard must be that row set even on the
    multi-file layout (where the default "files" mode selects
    a file range instead)."""
    from information_extraction_t5_ray.sources import synth

    ds = synth.read_pages(multifile_sf_dir, shard=(0, 2), shard_mode="rows")
    ids = [int(u.rsplit("/", 1)[-1]) for u in ds.to_pandas()["url"]]
    assert ids and all(i % 2 == 0 for i in ids)
    full = synth.read_pages(multifile_sf_dir).to_pandas()
    expect = sum(1 for u in full["url"] if int(u.rsplit("/", 1)[-1]) % 2 == 0)
    assert len(ids) == expect


def test_documents_paths_empty_dir_raises(tmp_path):
    from information_extraction_t5_ray.sources import synth

    (tmp_path / "documents.parquet").mkdir()
    with pytest.raises(FileNotFoundError):
        synth.documents_paths(str(tmp_path))


def test_read_parquet_clean_list_rejects_heterogeneous_shards(tmp_path):
    import pyarrow.parquet as pq

    from information_extraction_t5_ray.stages.common import read_parquet_clean

    a = tmp_path / "part-0.parquet"
    b = tmp_path / "part-1.parquet"
    pq.write_table(pa.table({"doc_id": pa.array([1], pa.int64())}), str(a))
    pq.write_table(pa.table({"doc_id": pa.array([2], pa.int32())}), str(b))
    with pytest.raises(ValueError) as ei:
        read_parquet_clean([str(a), str(b)], columns=["doc_id"])
    assert "part-1.parquet" in str(ei.value)


def test_run_kg_sharded_fingerprint_includes_layout(
    ray_session, multifile_sf_dir, tmp_path
):
    """Recompacting the documents dir into a different file count
    reshuffles which rows each file-range shard holds — resume must
    NOT skip the stale checkpoints (layout is fingerprinted)."""
    import glob
    import shutil

    import pyarrow.parquet as pq

    from information_extraction_t5_ray.pipelines.kg import (
        KGConfig,
        run_kg_sharded,
    )

    ck = str(tmp_path / "ck")
    ds1, skipped1 = run_kg_sharded(multifile_sf_dir, ck, KGConfig(), num_shards=2)
    n1 = ds1.count()
    assert not any(skipped1.values())
    # recompact 4 files -> 2 files (same rows, different layout)
    docs = f"{multifile_sf_dir}/documents.parquet"
    parts = sorted(glob.glob(f"{docs}/*.parquet"))
    tables = [pq.read_table(p) for p in parts]
    for p in parts:
        os.remove(p)
    pq.write_table(pa.concat_tables(tables[:2]), f"{docs}/new-0.parquet")
    pq.write_table(pa.concat_tables(tables[2:]), f"{docs}/new-1.parquet")
    ds2, skipped2 = run_kg_sharded(multifile_sf_dir, ck, KGConfig(), num_shards=2)
    assert not any(skipped2.values()), (
        "stale layout checkpoints must be rebuilt, not skipped"
    )
    assert ds2.count() == n1
    shutil.rmtree(ck)
