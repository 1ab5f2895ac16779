"""KG statistics / fusion-support layer (stages/kgstats.py): kernel
unit checks on tiny in-memory triple sets.  Oracle parity for all five
queries (kg_support / kg_schema_profile / kg_constraints / kg_sameas /
kg_negatives) runs in tests/test_oracle.py against the DuckDB mirrors."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from information_extraction_t5_ray.stages import kgstats as K


def _triples(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array([r[0] for r in rows], pa.string()),
                "pred": pa.array([r[1] for r in rows], pa.string()),
                "obj": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


def test_triple_support_dedups_pages(ray_session):
    # p1 asserted twice by d1 (multi-window duplicate) and once by d2:
    # n_pages counts DISTINCT pages, min/max are lexicographic.
    rows = [
        ("d1", "p1", "x"),
        ("d1", "p1", "x"),
        ("d2", "p1", "x"),
        ("d3", "p2", "y"),
    ]
    got = (
        K.triple_support(_triples(rows), num_buckets=3)
        .to_pandas()
        .sort_values(["pred", "obj"])
        .reset_index(drop=True)
    )
    assert got["n_pages"].tolist() == [2, 1]
    assert got["first_page"].tolist() == ["d1", "d3"]
    assert got["last_page"].tolist() == ["d2", "d3"]
    assert got["n_pages"].dtype == np.int64


def test_predicate_profile_functionality(ray_session):
    # p1: d1 has TWO values (max_per_subj=2), obj 'x' backs two subjs
    # (max_per_obj=2).  p2 is functional and inverse-functional.
    rows = [
        ("d1", "p1", "x"),
        ("d1", "p1", "y"),
        ("d2", "p1", "x"),
        ("d1", "p2", "z"),
        ("d2", "p2", "w"),
    ]
    got = (
        K.predicate_profile(_triples(rows), num_buckets=3)
        .to_pandas()
        .set_index("pred")
        .sort_index()
    )
    assert got.loc["p1", "n_triples"] == 3
    assert got.loc["p1", "n_subj"] == 2
    assert got.loc["p1", "n_obj"] == 2
    assert got.loc["p1", "max_per_subj"] == 2
    assert got.loc["p1", "max_per_obj"] == 2
    assert got.loc["p2", "max_per_subj"] == 1
    assert got.loc["p2", "max_per_obj"] == 1


def test_constraint_report_counts_invalid(ray_session):
    rows = [
        ("d1", "form.endereco.numero", "17"),
        ("d2", "form.endereco.numero", "1764"),  # 4 digits: invalid
        ("d3", "form.agencia", "1234"),
        ("d4", "form.nome_completo", "ana lima"),  # no rule: ignored
    ]
    got = (
        K.constraint_report(_triples(rows), num_buckets=2)
        .to_pandas()
        .set_index("pred")
    )
    assert set(got.index) == {"form.endereco.numero", "form.agencia"}
    assert got.loc["form.endereco.numero", "n_valid"] == 1
    assert got.loc["form.endereco.numero", "n_invalid"] == 1
    assert got.loc["form.agencia", "n_invalid"] == 0


def test_sameas_pairs_threshold_and_max_df(ray_session):
    P = K.ER_PREDS
    rows = [
        # d1/d2 agree on three identifying attrs -> pair (shared=3)
        ("d1", P[0], "ana lima"),
        ("d2", P[0], "ana lima"),
        ("d1", P[1], "eva reis"),
        ("d2", P[1], "eva reis"),
        ("d1", P[3], "01011990"),
        ("d2", P[3], "01011990"),
        # d3 agrees with d1 on one attr only: below min_shared
        ("d3", P[0], "ana lima"),
    ]
    got = K.sameas_pairs(
        _triples(rows), min_shared=3, num_buckets=2
    ).to_pandas()
    assert got.values.tolist() == [["d1", "d2", 3]]
    # max_df=2: the 'ana lima' block (3 pages) is non-identifying and
    # skipped, dropping the pair below the threshold.
    capped = K.sameas_pairs(
        _triples(rows), min_shared=3, max_df=2, num_buckets=2
    ).to_pandas()
    assert len(capped) == 0


def test_corruption_negatives_deterministic_and_filtered(ray_session):
    CITY = "form.endereco.cidade"
    UF = "form.endereco.estado"
    rows = [
        (f"https://example.org/{d:08d}", p, o)
        for d, p, o in [
            (0, CITY, "recife"),
            (1, CITY, "natal"),
            (2, UF, "pe"),
            (3, "form.nome_completo", "ana"),  # non-graph: dropped
        ]
    ]
    got = (
        K.corruption_negatives(_triples(rows))
        .to_pandas()
        .sort_values("subj")
        .reset_index(drop=True)
    )
    assert len(got) == 3  # the non-graph triple is excluded
    vocab = np.array(sorted({"recife", "natal", "pe"}), dtype=object)
    from information_extraction_t5_ray.stages.balance import (
        LCG_INC,
        LCG_MULT,
    )

    pidx = {p: i for i, p in enumerate(K.GRAPH_PREDS)}
    for _, r in got.iterrows():
        d = int(r["subj"][-8:])
        key = d * len(K.GRAPH_PREDS) + pidx[r["pred"]]
        idx = (((key * LCG_MULT + LCG_INC) % 2**31) >> 16) % len(vocab)
        want = vocab[idx]
        if want == r["obj"]:
            want = vocab[(idx + 1) % len(vocab)]
        assert r["neg_obj"] == want
        assert r["neg_obj"] != r["obj"]
    # two-entity minimum guard
    with pytest.raises(ValueError):
        K.corruption_negatives(_triples([("https://example.org/00000000", CITY, "x")]))


def test_corruption_negatives_collision_steps(ray_session):
    """Force the idx-lands-on-true-obj branch: with vocab {a, b}, find a
    doc id whose LCG draw points at its own object."""
    CITY = "form.endereco.cidade"
    from information_extraction_t5_ray.stages.balance import (
        LCG_INC,
        LCG_MULT,
    )

    vocab = ["a", "b"]
    hit = None
    for d in range(64):
        idx = ((((d * 4 + 0) * LCG_MULT + LCG_INC) % 2**31) >> 16) % 2
        if vocab[idx] == "a":
            hit = d
            break
    assert hit is not None
    rows = [
        (f"https://example.org/{hit:08d}", CITY, "a"),
        ("https://example.org/00000063", CITY, "b"),
    ]
    got = K.corruption_negatives(_triples(rows)).to_pandas()
    row = got[got["obj"] == "a"].iloc[0]
    assert row["neg_obj"] == "b"  # stepped off the collision


def test_empty_input_yields_typed_empty(ray_session):
    empty = _triples([])
    for fn in (
        lambda ds: K.triple_support(ds, num_buckets=2),
        lambda ds: K.predicate_profile(ds, num_buckets=2),
        lambda ds: K.constraint_report(ds, num_buckets=2),
        lambda ds: K.sameas_pairs(ds, num_buckets=2),
        lambda ds: K.predicate_assoc(ds, num_buckets=2),
        lambda ds: K.entity_summary(ds, num_buckets=2),
        lambda ds: K.star_query(ds, {"p": "x"}, num_buckets=2),
    ):
        out = fn(empty).to_pandas()
        assert len(out) == 0


def _er_rows(subjs):
    """Each subj asserts the same 3 identifying attributes -> all pair
    up (shared=3) into ONE component, plus one distinctive fact each."""
    rows = []
    for i, s in enumerate(subjs):
        rows += [
            (s, "form.nome_completo", "ana"),
            (s, "form.nome_mae", "bia"),
            (s, "form.data_nascimento", "19900101"),
            (s, "form.cpf", f"{i:011d}"),
        ]
    return rows


def test_canonicalize_rewrites_and_dedups(ray_session):
    subjs = ["p3", "p1", "p2"]
    out = K.canonicalize_triples(
        _triples(_er_rows(subjs)), min_shared=3
    ).to_pandas()
    # every subject rewritten to the min-string root
    assert set(out["subj"]) == {"p1"}
    # shared attributes collapsed to one row each; cpf facts all kept
    got = out.sort_values(["pred", "obj"]).reset_index(drop=True)
    assert (got["pred"] == "form.cpf").sum() == 3
    assert (got["pred"] == "form.nome_completo").sum() == 1
    assert len(got) == 6


def test_canonicalize_join_path_matches_broadcast(ray_session):
    rows = _er_rows(["p3", "p1", "p2"]) + [("q9", "form.cpf", "x")]
    a = (
        K.canonicalize_triples(_triples(rows), min_shared=3)
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    b = (
        K.canonicalize_triples(
            _triples(rows), min_shared=3, broadcast_threshold=0
        )
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # the pairless page survives untouched on both paths
    assert ("q9" == a["subj"]).sum() == 1


def test_encode_triples_roundtrip(ray_session):
    CITY = "form.endereco.cidade"
    rows = [
        ("https://example.org/00000002", CITY, "b"),
        ("https://example.org/00000001", CITY, "c"),
        ("https://example.org/00000001", "form.cpf", "x"),  # non-graph
        ("https://example.org/00000003", CITY, "a"),
    ]
    got = (
        K.encode_triples(_triples(rows))
        .to_pandas()
        .sort_values("h")
        .reset_index(drop=True)
    )
    # non-graph predicate dropped; vocab = sorted {a,b,c} -> 0,1,2
    assert list(got["h"]) == [1, 2, 3]
    assert list(got["t"]) == [2, 1, 0]
    assert set(got["r"]) <= set(range(len(K.GRAPH_PREDS)))
    for c in ("h", "r", "t"):
        assert got[c].dtype == np.int64

    with pytest.raises(ValueError, match="empty entity vocab"):
        K.encode_triples(_triples([("s", "form.cpf", "x")])).to_pandas()


def test_canonicalize_no_fixed_width_truncation(ray_session):
    """Root 'ab' rewritten into a batch whose own subjects are all one
    char wide must survive intact — a fixed-width unicode copy of the
    batch's subj array would silently truncate it to 'a'."""
    import ray.data as rd

    short = _triples(_er_rows(["b"]))  # block of 1-char subjects
    long = _triples(_er_rows(["ab"]))  # 'ab' < 'b' -> component root
    out = K.canonicalize_triples(short.union(long), min_shared=3).to_pandas()
    assert set(out["subj"]) == {"ab"}


def test_predicate_assoc_counts_and_confidence(ray_session):
    # d1: {p1, p2}; d2: {p1}; d3: {p1, p2, p3}.  Duplicate assertions
    # (multi-window) must not inflate the distinct-page counts.
    rows = [
        ("d1", "p1", "x"), ("d1", "p1", "x2"), ("d1", "p2", "y"),
        ("d2", "p1", "x"),
        ("d3", "p1", "x"), ("d3", "p2", "y"), ("d3", "p3", "z"),
    ]
    got = (
        K.predicate_assoc(_triples(rows), num_buckets=3)
        .to_pandas()
        .set_index(["p1", "p2"])
        .sort_index()
    )
    assert got.loc[("p1", "p2"), "n_both"] == 2
    assert got.loc[("p1", "p2"), "n_p1"] == 3
    assert got.loc[("p1", "p2"), "confidence"] == pytest.approx(2 / 3)
    assert got.loc[("p2", "p1"), "n_both"] == 2
    assert got.loc[("p2", "p1"), "n_p1"] == 2  # asymmetric direction
    assert got.loc[("p2", "p1"), "confidence"] == 1.0
    assert ("p1", "p1") not in got.index  # diagonal consumed, not emitted
    assert got.loc[("p3", "p1"), "n_both"] == 1


def test_entity_summary_topk_order(ray_session):
    # entity e backed by p1 (2 pages), p2 (2 pages), p3 (1 page):
    # k=2 keeps (p1, p2) — n_pages desc then pred asc.
    rows = [
        ("d1", "p1", "e"), ("d2", "p1", "e"),
        ("d1", "p2", "e"), ("d3", "p2", "e"),
        ("d1", "p3", "e"),
        ("d1", "p1", "other"),
    ]
    got = K.entity_summary(_triples(rows), k=2, num_buckets=3).to_pandas()
    e = got[got["entity"] == "e"].sort_values(["pred"])
    assert e["pred"].tolist() == ["p1", "p2"]
    assert e["n_pages"].tolist() == [2, 2]
    assert got[got["entity"] == "other"]["pred"].tolist() == ["p1"]


def test_star_query_requires_all_constraints(ray_session):
    rows = [
        ("d1", "p1", "aa"), ("d1", "p2", "77"),
        ("d2", "p1", "ab"),              # missing p2 -> dropped
        ("d3", "p1", "zz"), ("d3", "p2", "88"),  # p1 regex miss
    ]
    got = K.star_query(
        _triples(rows), {"p1": "a[a-z]", "p2": "[0-9]{2}"}, num_buckets=3
    ).to_pandas()
    assert sorted(got["subj"].unique()) == ["d1"]
    assert sorted(got["pred"]) == ["p1", "p2"]
    with pytest.raises(ValueError):
        K.star_query(_triples(rows), {})


def test_entity_embeddings_fixed_point_exact(ray_session, tmp_path):
    # pages 0,1 mention 'e' (graph pred), page 2 mentions 'f'.
    # avg must be floor(v*1e6)-exact: (q0+q1)/(2e6) regardless of
    # partitioning or summation order.
    import pyarrow.parquet as pq
    import ray.data as rd

    vecs = np.array(
        [[0.25, -0.125], [0.75, 0.375], [1.0, -1.0]], dtype=np.float32
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    pred = K.GRAPH_PREDS[0]
    rows = [
        ("https://example.org/00000000", pred, "e"),
        ("https://example.org/00000001", pred, "e"),
        ("https://example.org/00000001", pred, "e"),  # dup mention
        ("https://example.org/00000002", pred, "f"),
    ]
    for nblocks in (1, 4):
        tri = _triples(rows)
        if nblocks > 1:
            tri = tri.repartition(nblocks)
        got = (
            K.entity_embeddings(tri, str(tmp_path), num_buckets=3)
            .to_pandas()
            .set_index(["entity", "dim"])
            .sort_index()
        )
        q = np.floor(vecs.astype(np.float64) * 1e6)
        assert got.loc[("e", 0), "avg"] == (q[0, 0] + q[1, 0]) / 2e6
        assert got.loc[("e", 1), "avg"] == (q[0, 1] + q[1, 1]) / 2e6
        assert got.loc[("f", 0), "avg"] == q[2, 0] / 1e6
        assert len(got) == 4


def test_entity_embeddings_ragged_raises(ray_session, tmp_path):
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1], pa.int64()),
                "embedding": pa.array(
                    [[0.1, 0.2], [0.3]], pa.list_(pa.float32())
                ),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    pred = K.GRAPH_PREDS[0]
    # same entity on both pages: even when the reader splits the ragged
    # rows into separate (per-batch-uniform) blocks, their partials meet
    # at the entity reduce and must fail loudly there
    tri = _triples(
        [
            ("https://example.org/00000000", pred, "e"),
            ("https://example.org/00000001", pred, "e"),
        ]
    )
    with pytest.raises(Exception, match="ragged"):
        K.entity_embeddings(tri, str(tmp_path), num_buckets=2).to_pandas()


def test_entity_embeddings_missing_vector_page_excluded(
    ray_session, tmp_path
):
    # pages 0 and 1 mention 'e' but only page 0 has an embedding: the
    # mean is over OBSERVED vectors (inner join), denominator 1 — and
    # must match the SQL mirror's post-join page count.
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0], pa.int64()),
                "embedding": pa.array([[0.5, 0.25]], pa.list_(pa.float32())),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    pred = K.GRAPH_PREDS[0]
    tri = _triples(
        [
            ("https://example.org/00000000", pred, "e"),
            ("https://example.org/00000001", pred, "e"),
        ]
    )
    got = (
        K.entity_embeddings(tri, str(tmp_path), num_buckets=2)
        .to_pandas()
        .set_index("dim")
        .sort_index()
    )
    assert got.loc[0, "avg"] == np.floor(0.5 * 1e6) / 1e6
    assert got.loc[1, "avg"] == np.floor(np.float64(np.float32(0.25)) * 1e6) / 1e6


def test_fuse_majority_ties_and_vote_dedup(ray_session):
    import ray.data as rd

    def src(rows):
        return rd.from_arrow(
            pa.table(
                {
                    "subj": pa.array([r[0] for r in rows], pa.string()),
                    "pred": pa.array([r[1] for r in rows], pa.string()),
                    "obj": pa.array([r[2] for r in rows], pa.string()),
                }
            )
        )

    from information_extraction_t5_ray.stages.triples import fuse_majority

    # s1 asserts (d1, p, "b") TWICE (multi-window) — still one vote, so
    # the 1-1 tie against s2's "a" resolves to the min obj "a".
    s1 = src([("d1", "p", "b"), ("d1", "p", "b"), ("d2", "p", "x")])
    s2 = src([("d1", "p", "a")])
    got = (
        fuse_majority([s1, s2], num_buckets=3)
        .to_pandas()
        .set_index("subj")
        .sort_index()
    )
    assert got.loc["d1", "obj"] == "a"
    assert got.loc["d1", "support"] == 1
    assert got.loc["d2", "obj"] == "x"
    assert got.loc["d2", "support"] == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        fuse_majority([])


def test_fuse_majority_majority_wins(ray_session):
    import ray.data as rd

    def src(rows):
        return rd.from_arrow(
            pa.table(
                {
                    "subj": pa.array([r[0] for r in rows], pa.string()),
                    "pred": pa.array([r[1] for r in rows], pa.string()),
                    "obj": pa.array([r[2] for r in rows], pa.string()),
                }
            )
        )

    from information_extraction_t5_ray.stages.triples import fuse_majority

    srcs = [
        src([("d1", "p", "v")]),
        src([("d1", "p", "v")]),
        src([("d1", "p", "w")]),
    ]
    got = fuse_majority(srcs, num_buckets=2).to_pandas()
    assert got["obj"].tolist() == ["v"]
    assert got["support"].tolist() == [2]


def test_group_starts_separator_collision_and_empty():
    from information_extraction_t5_ray.stages.common import (
        group_starts,
        reduceat_sum,
    )

    # ('p\x1f', 'x') vs ('p', '\x1fx'): identical when concatenated with
    # the \x1f separator, distinct as column tuples — must be 2 groups
    pred = np.array(["p", "p\x1f"], dtype=object)
    obj = np.array(["\x1fx", "x"], dtype=object)
    starts, ends = group_starts(pred, obj)
    assert starts.tolist() == [0, 1] and ends.tolist() == [1, 2]

    s0, e0 = group_starts(np.array([], dtype=object))
    assert len(s0) == 0 and len(e0) == 0
    assert len(reduceat_sum(np.array([], dtype=np.int64), s0)) == 0


def test_triple_support_separator_adversarial(ray_session):
    rows = [
        ("d1", "p\x1f", "x"),
        ("d2", "p", "\x1fx"),
    ]
    got = K.triple_support(_triples(rows), num_buckets=2).to_pandas()
    assert len(got) == 2  # two distinct assertions, not one merged row
    assert sorted(got["n_pages"]) == [1, 1]


def test_neighbor_agg_distributed_matches_local(ray_session):
    """The GraphSAGE-layer aggregation must be bit-identical between
    the single-task fast path and the forced tagged co-group path
    (fixed-point sums are order-free by construction)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from information_extraction_t5_ray.stages.kgstats import neighbor_agg

    edges = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(["x", "y", "y", "z", "x", "z"]),
                "b": pa.array(["y", "x", "z", "y", "z", "x"]),
                "cnt": pa.array([2, 2, 1, 1, 3, 3], type=pa.int64()),
            }
        )
    ).repartition(3)
    vec_rows = []
    for ent, vec in (("x", [0.5, -1.25]), ("y", [2.0, 0.75]), ("z", [-0.1, 4.0])):
        for d, v in enumerate(vec):
            vec_rows.append((ent, d, v))
    vecs = ray.data.from_arrow(
        pa.table(
            {
                "entity": pa.array([r[0] for r in vec_rows]),
                "dim": pa.array([r[1] for r in vec_rows], type=pa.int64()),
                "avg": pa.array([r[2] for r in vec_rows], type=pa.float64()),
            }
        )
    ).repartition(2)
    loc = (
        neighbor_agg(edges, vecs)
        .to_pandas()
        .sort_values(["entity", "dim"])
        .reset_index(drop=True)
    )
    dist = (
        neighbor_agg(edges, vecs, local_threshold=0)
        .to_pandas()
        .sort_values(["entity", "dim"])
        .reset_index(drop=True)
    )
    assert loc.equals(dist)
    # hand value: x's neighbors y (w=2) and z (w=3):
    # dim0 = (2*2.0 + 3*(-0.1)) / 5 = 0.74
    got = loc.set_index(["entity", "dim"])["avg"]
    assert got[("x", 0)] == (2 * 2_000_000 + 3 * (-100_000)) / (5 * 1e6)
    # vectorless-neighbor rule: a neighbor absent from vecs contributes
    # neither numerator nor weight
    edges2 = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(["x", "q", "x", "y"]),
                "b": pa.array(["q", "x", "y", "x"]),
                "cnt": pa.array([9, 9, 1, 1], type=pa.int64()),
            }
        )
    )
    out2 = neighbor_agg(edges2, vecs).to_pandas()
    x0 = out2.set_index(["entity", "dim"])["avg"][("x", 0)]
    assert x0 == 2.0  # only y counts; q (no vector) is ignored entirely


def test_neighbor_agg_no_vector_overlap_keeps_schema(ray_session):
    """Edges whose endpoints have NO vectors must yield a typed empty
    (entity, dim, avg) result on BOTH paths, not a schemaless one."""
    import pyarrow as pa
    import ray

    from information_extraction_t5_ray.stages.kgstats import neighbor_agg

    edges = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(["x", "y"]),
                "b": pa.array(["y", "x"]),
                "cnt": pa.array([1, 1], type=pa.int64()),
            }
        )
    )
    vecs = ray.data.from_arrow(
        pa.table(
            {
                "entity": pa.array(["q"]),
                "dim": pa.array([0], type=pa.int64()),
                "avg": pa.array([1.5], type=pa.float64()),
            }
        )
    )
    for thresh in (0, 4_000_000):
        ds = neighbor_agg(edges, vecs, local_threshold=thresh)
        # Ray 2.49's to_pandas() drops columns for ANY zero-row dataset
        # (even a typed from_arrow empty), so the schema contract is
        # asserted at the Dataset level — where the distributed path
        # previously reported NO columns at all
        assert [f.name for f in ds.schema().base_schema] == [
            "entity",
            "dim",
            "avg",
        ], thresh
        assert ds.count() == 0, thresh


def test_retract_hosts_planted(ray_session, tmp_path):
    """Planted provenance: withdrawing src-b pages must zero facts only
    they support, shrink shared facts, and drop untouched facts from
    the output entirely (lossy rows only)."""
    import pyarrow.parquet as pq

    from information_extraction_t5_ray.sources.synth import URL_PREFIX

    def url(i):
        return f"{URL_PREFIX}{i:08d}"

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "source": pa.array(["a", "b", "a"], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = [
        (url(1), "p", "shared"),   # survives (src a)
        (url(2), "p", "shared"),   # withdrawn (src b)
        (url(2), "p", "only_b"),   # fully lost
        (url(3), "q", "safe"),     # untouched -> not in output
    ]
    got = (
        K.retract_hosts(_triples(rows), str(tmp_path), ["b"], num_buckets=3)
        .to_pandas()
        .sort_values(["pred", "obj"])
        .reset_index(drop=True)
    )
    assert got.values.tolist() == [
        ["p", "only_b", 1, 0],
        ["p", "shared", 2, 1],
    ]


def test_conflict_report_distinct_values_only(ray_session):
    """Conflicts are on VALUES, not votes: a source repeating an object
    adds nothing; agreeing keys never appear; the spread columns carry
    the lexicographic extremes across ALL sources."""
    from information_extraction_t5_ray.stages.triples import conflict_report

    s1 = _triples(
        [
            ("d1", "p", "x"),
            ("d1", "p", "x"),      # in-source duplicate: still 1 value
            ("d2", "p", "same"),
            ("d3", "q", "a"),
        ]
    )
    s2 = _triples(
        [
            ("d1", "p", "y"),      # disagrees with s1 -> conflict
            ("d2", "p", "same"),   # agrees -> no row
            ("d3", "q", "c"),
        ]
    )
    s3 = _triples([("d3", "q", "b")])  # third value for (d3, q)
    got = (
        conflict_report([s1, s2, s3], num_buckets=3)
        .to_pandas()
        .sort_values(["subj", "pred"])
        .reset_index(drop=True)
    )
    assert got.values.tolist() == [
        ["d1", "p", 2, "x", "y"],
        ["d3", "q", 3, "a", "c"],
    ]


def test_kge_training_pairs_matches_components(ray_session):
    """The fused table must agree row-for-row with its two components:
    (h, r, t_pos) with encode_triples, and vocab[t_neg] with
    corruption_negatives' neg_obj."""
    from information_extraction_t5_ray.stages.graph import GRAPH_PREDS
    from information_extraction_t5_ray.stages.kgstats import (
        _entity_vocab,
        corruption_negatives,
        encode_triples,
        kge_training_pairs,
    )

    p0, p1 = GRAPH_PREDS[0], GRAPH_PREDS[1]
    rows = [
        (f"https://example.org/{i:08d}", p, v)
        for i, (p, v) in enumerate(
            [(p0, "ssp"), (p0, "sp"), (p1, "rj"), (p0, "ssp"), (p1, "mg")]
        )
    ]
    tri = _triples(rows)
    got = (
        kge_training_pairs(tri)
        .to_pandas()
        .sort_values(["h", "r"])
        .reset_index(drop=True)
    )
    enc = (
        encode_triples(tri)
        .to_pandas()
        .sort_values(["h", "r"])
        .reset_index(drop=True)
    )
    assert got[["h", "r", "t_pos"]].values.tolist() == enc[
        ["h", "r", "t"]
    ].values.tolist()
    vocab = _entity_vocab(tri, GRAPH_PREDS)
    neg = corruption_negatives(tri).to_pandas()
    neg["h"] = neg["subj"].str[-8:].astype("int64")
    m = got.merge(neg[["h", "neg_obj"]], on="h")
    assert (vocab[m["t_neg"].to_numpy()] == m["neg_obj"].to_numpy()).all()
    assert (got["t_neg"] != got["t_pos"]).all()
