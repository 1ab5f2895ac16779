"""Checkpointed resume: stage-boundary Parquet + lineage manifests.

North-rule contract: resumable from checkpoint at every stage boundary,
per-partition lineage.  Verifies (1) a cold run writes manifests with
correct per-file row counts, (2) a warm rerun SKIPS all stages and the
checkpoint files are untouched (byte-identical resume), (3) deleting a
downstream stage recomputes ONLY that stage, (4) a config change
invalidates through the fingerprint chain.
"""

import json
import shutil
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from information_extraction_t5_ray.pipelines.kg import KGConfig, run_kg_checkpointed
from information_extraction_t5_ray.state import manifest as mf

SF = "/root/testdata/sf0.001"


def _mtimes(root: Path) -> dict:
    return {
        str(p.relative_to(root)): p.stat().st_mtime_ns
        for p in root.rglob("*.parquet")
    }


@pytest.fixture(scope="module")
def cold_run(ray_session, tmp_path_factory):
    ckpt = tmp_path_factory.mktemp("kg_ckpt")
    triples, skipped = run_kg_checkpointed(SF, str(ckpt))
    df = triples.to_pandas()
    return ckpt, df, skipped


def test_cold_run_writes_manifests(cold_run):
    ckpt, df, skipped = cold_run
    assert skipped == {"predictions": False, "answers": False, "triples": False}
    assert len(df) > 0
    for stage in ["predictions", "answers", "triples"]:
        m = mf.load_manifest(str(ckpt / stage))
        assert m is not None, stage
        assert m["stage"] == stage
        assert m["num_rows"] > 0
        assert m["num_files"] == len(m["files"]) > 0
        # per-partition lineage: recounting every file reproduces the totals
        import pyarrow.parquet as pq

        for e in m["files"]:
            assert pq.read_metadata(ckpt / stage / e["file"]).num_rows == e["rows"]
        # runtime metrics ride with the lineage (resume reports show
        # where a failed run spent its time)
        assert m["metrics"]["wall_sec"] is not None and m["metrics"]["wall_sec"] > 0
        assert m["metrics"]["rows_per_sec"] > 0
        assert m["metrics"]["bytes"] == sum(e["bytes"] for e in m["files"])
    # triples stage is partitioned by partition_id (resumable output layout)
    parts = {p.name for p in (ckpt / "triples").iterdir() if p.is_dir()}
    assert any(p.startswith("partition_id=") for p in parts)


def test_warm_rerun_skips_everything(cold_run):
    ckpt, df, _ = cold_run
    before = _mtimes(ckpt)
    triples2, skipped2 = run_kg_checkpointed(SF, str(ckpt))
    assert skipped2 == {"predictions": True, "answers": True, "triples": True}
    assert _mtimes(ckpt) == before, "warm resume must not rewrite checkpoints"
    df2 = triples2.to_pandas()
    cols = sorted(df.columns)
    a = df[cols].sort_values(cols).reset_index(drop=True)
    b = df2[cols].sort_values(cols).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_partial_resume_recomputes_only_downstream(cold_run):
    ckpt, df, _ = cold_run
    shutil.rmtree(ckpt / "triples")
    before_pred = _mtimes(ckpt / "predictions")
    _, skipped = run_kg_checkpointed(SF, str(ckpt))
    assert skipped == {"predictions": True, "answers": True, "triples": False}
    assert _mtimes(ckpt / "predictions") == before_pred


def test_config_change_invalidates_chain(cold_run, tmp_path):
    ckpt, _, _ = cold_run
    cfg = KGConfig(num_partitions=8)  # different config -> new fingerprints
    _, skipped = run_kg_checkpointed(SF, str(ckpt), cfg)
    assert skipped["predictions"] is False


def test_corrupt_manifest_forces_recompute(ray_session, tmp_path):
    ckpt = tmp_path / "ck"
    _, skipped = run_kg_checkpointed(SF, str(ckpt))
    assert not any(skipped.values())
    # truncate a manifest -> that stage must recompute, downstream too
    (ckpt / "answers" / mf.MANIFEST_NAME).write_text("{not json")
    _, skipped2 = run_kg_checkpointed(SF, str(ckpt))
    assert skipped2["predictions"] is True
    assert skipped2["answers"] is False


# --- sharded (partition-granular) resume ------------------------------------


def test_sharded_resume_skips_finished_shards(ray_session, tmp_path):
    """Kill-and-rerun semantics at shard granularity: only shards whose
    manifest is gone get recomputed; the union equals the unsharded run."""
    from pathlib import Path

    from information_extraction_t5_ray.pipelines.kg import (
        KGConfig,
        run_kg,
        run_kg_sharded,
    )

    sf = "/root/testdata/sf0.001"
    ck = str(tmp_path / "shards")
    n = 3

    ds1, skipped1 = run_kg_sharded(sf, ck, KGConfig(), num_shards=n)
    assert skipped1 == {k: False for k in range(n)}
    df1 = ds1.to_pandas().sort_values(["subj", "pred"], ignore_index=True)

    # simulate a crash that lost shard 1's checkpoint
    (Path(ck) / "shard=1" / "_MANIFEST.json").unlink()

    ds2, skipped2 = run_kg_sharded(sf, ck, KGConfig(), num_shards=n)
    assert skipped2 == {0: True, 1: False, 2: True}
    df2 = ds2.to_pandas().sort_values(["subj", "pred"], ignore_index=True)
    import pandas as pd

    pd.testing.assert_frame_equal(df1, df2)

    # and the union matches the unsharded pipeline
    direct = (
        run_kg(sf)
        .to_pandas()
        .sort_values(["subj", "pred"], ignore_index=True)
    )
    assert len(direct) == len(df1)
    pd.testing.assert_frame_equal(
        direct[["subj", "pred", "obj"]],
        df1[["subj", "pred", "obj"]],
    )


def test_curate_checkpointed_matches_direct_and_resumes(ray_session, tmp_path):
    """The checkpointed curation funnel equals the direct query, a warm
    rerun skips every stage, and deleting a mid-chain manifest
    recomputes that stage without changing the result."""
    from information_extraction_t5_ray.pipelines import corpus as c

    sf = "/root/testdata/sf0.001"
    ck = str(tmp_path / "curate")
    direct = (
        c.q_curate_corpus(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    kept, skipped = c.run_curate_checkpointed(sf, ck)
    got = kept.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert skipped == {"uniq": False, "pairs": False, "kept": False}
    assert got.equals(direct)
    # warm rerun: all boundaries skip, same rows
    kept2, skipped2 = c.run_curate_checkpointed(sf, ck)
    assert skipped2 == {"uniq": True, "pairs": True, "kept": True}
    assert (
        kept2.to_pandas().sort_values("doc_id").reset_index(drop=True).equals(direct)
    )
    # kill the pairs boundary: only it recomputes (uniq stays skipped;
    # kept's manifest survives), result identical
    import shutil

    shutil.rmtree(f"{ck}/pairs")
    kept3, skipped3 = c.run_curate_checkpointed(sf, ck)
    assert skipped3["uniq"] is True and skipped3["pairs"] is False
    assert (
        kept3.to_pandas().sort_values("doc_id").reset_index(drop=True).equals(direct)
    )


def test_crawl_checkpointed_matches_direct_and_resumes(ray_session, tmp_path):
    """The checkpointed crawl-intake funnel equals the direct chain,
    warm reruns skip both boundaries, and deleting the quota boundary
    recomputes only it."""
    from information_extraction_t5_ray.sources.crawl import read_crawl
    from information_extraction_t5_ray.stages import crawl as cr

    sf = "/root/testdata/sf0.001"
    ck = str(tmp_path / "crawl")
    key = ["host", "url"]
    direct = (
        cr.host_quota(cr.latest_snapshot(read_crawl(sf)), k=10)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    quota, skipped = cr.run_crawl_checkpointed(sf, ck, quota_k=10)
    got = quota.to_pandas().sort_values(key).reset_index(drop=True)
    assert skipped == {"latest": False, "quota": False}
    assert got.equals(direct)
    quota2, skipped2 = cr.run_crawl_checkpointed(sf, ck, quota_k=10)
    assert skipped2 == {"latest": True, "quota": True}
    assert (
        quota2.to_pandas().sort_values(key).reset_index(drop=True).equals(direct)
    )
    import shutil

    shutil.rmtree(f"{ck}/quota")
    quota3, skipped3 = cr.run_crawl_checkpointed(sf, ck, quota_k=10)
    assert skipped3 == {"latest": True, "quota": False}
    assert (
        quota3.to_pandas().sort_values(key).reset_index(drop=True).equals(direct)
    )
    # a different quota_k invalidates only the quota boundary
    quota4, skipped4 = cr.run_crawl_checkpointed(sf, ck, quota_k=3)
    assert skipped4 == {"latest": True, "quota": False}
    assert quota4.to_pandas().groupby("host").size().max() <= 3


def test_run_graph_checkpointed(ray_session, tmp_path):
    """Graph-analytics fan-out resume: triples -> edges -> {pagerank,
    components}, each boundary manifest-chained; killing one boundary
    resumes only that stage and its dependents."""
    from information_extraction_t5_ray.pipelines import kg as kgmod
    from information_extraction_t5_ray.sources import synth
    from information_extraction_t5_ray.stages import graph as G

    sf = "/root/testdata/sf0.001"
    ck = str(tmp_path / "graph_ck")

    tri = kgmod.kg_triples(synth.read_pages(sf), kgmod.KGConfig())
    direct_pr = (
        G.pagerank(G.cooccur_edges(tri, symmetric=True))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )

    out, skipped = kgmod.run_graph_checkpointed(sf, ck)
    assert skipped == {
        "triples": False, "edges": False, "pagerank": False,
        "components": False,
    }
    got = out["pagerank"].to_pandas().sort_values("node").reset_index(drop=True)
    assert got.equals(direct_pr)
    assert len(out["components"].to_pandas()) > 0

    # identical rerun skips every boundary and returns the same result
    out2, skipped2 = kgmod.run_graph_checkpointed(sf, ck)
    assert all(skipped2.values())
    got2 = (
        out2["pagerank"].to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert got2.equals(direct_pr)

    # killing the edges boundary rebuilds ONLY edges: the analytics
    # fingerprints chain on the edges CONFIG identity, and a same-
    # fingerprint rebuild produces identical content, so downstream
    # checkpoints stay valid (content-identity lineage, not mtimes)
    import shutil

    shutil.rmtree(f"{ck}/edges")
    out3, skipped3 = kgmod.run_graph_checkpointed(sf, ck)
    assert skipped3 == {
        "triples": True, "edges": False, "pagerank": True,
        "components": True,
    }
    got3 = (
        out3["pagerank"].to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert got3.equals(direct_pr)

    # killing an analytics boundary rebuilds just that one, and the
    # recompute over the checkpointed edges matches the direct run
    shutil.rmtree(f"{ck}/pagerank")
    out4, skipped4 = kgmod.run_graph_checkpointed(sf, ck)
    assert skipped4 == {
        "triples": True, "edges": True, "pagerank": False,
        "components": True,
    }
    got4 = (
        out4["pagerank"].to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert got4.equals(direct_pr)
