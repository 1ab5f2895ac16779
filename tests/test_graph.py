"""KG graph analytics (stages/graph.py): distributed-vs-local parity
and kernel unit checks.  Oracle parity for all four queries runs in
tests/test_oracle.py (kg_degrees / kg_cooccur / kg_pagerank /
kg_neighbors vs the DuckDB CTEs in sources/oracle.py)."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from information_extraction_t5_ray.stages import graph as G


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


CITY = "form.endereco.cidade"
UF = "form.endereco.estado"
FIXTURE = [
    ("d1", CITY, "recife"),
    ("d1", UF, "pe"),
    ("d1", "form.nome", "ana"),  # non-graph pred: excluded from edges
    ("d2", CITY, "recife"),
    ("d2", UF, "pe"),
    ("d3", CITY, "natal"),
    ("d3", UF, "rn"),
    ("d4", CITY, "recife"),  # singleton doc: no pairs
    ("d5", CITY, "recife"),
    ("d5", UF, "pb"),  # second in-source for recife (rank separation)
]


def test_node_degrees(ray_session):
    got = (
        G.node_degrees(_triples(FIXTURE))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    row = got.set_index("node")
    assert row.loc["d1", "out_degree"] == 3
    assert row.loc["d1", "in_degree"] == 0
    assert row.loc["recife", "out_degree"] == 0
    assert row.loc["recife", "in_degree"] == 4
    assert row.loc["ana", "in_degree"] == 1


def test_cooccur_edges_counts_documents(ray_session):
    got = (
        G.cooccur_edges(_triples(FIXTURE))
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "a": ["natal", "pb", "pe"],
            "b": ["rn", "recife", "recife"],
            "cnt": np.array([1, 1, 2], np.int64),
        }
    )
    pd.testing.assert_frame_equal(got, want)


def test_cooccur_symmetric_mirrors(ray_session):
    got = G.cooccur_edges(_triples(FIXTURE), symmetric=True).to_pandas()
    fwd = got[got["a"] < got["b"]].sort_values(["a", "b"]).reset_index(drop=True)
    rev = got[got["a"] > got["b"]].rename(columns={"a": "b", "b": "a"})
    rev = rev[["a", "b", "cnt"]].sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(fwd, rev)


def test_pagerank_distributed_matches_local(ray_session):
    """The distributed power iteration (broadcast rank vector, per-batch
    partial dst sums) must be bit-identical to the local int64 fast
    path — integer arithmetic commutes, so any divergence is a bug."""
    sym = G.cooccur_edges(_triples(FIXTURE), symmetric=True).materialize()
    local = (
        G.pagerank(sym).to_pandas().sort_values("node").reset_index(drop=True)
    )
    dist = (
        G.pagerank(sym, local_edge_threshold=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(local, dist)
    assert local["rank_int"].dtype == np.int64
    # conservation sanity: teleport floor below every rank
    assert (local["rank_int"] >= 15 * G.PAGERANK_SCALE // 100).all()
    # recife (in 2-doc edges) must outrank natal (1-doc component)
    r = local.set_index("node")["rank_int"]
    assert r["recife"] > r["natal"]


def test_pagerank_local_kernel_exact():
    """Hand-computed 2-node symmetric graph: a<->b, w=1 each side.
    W(a)=W(b)=1, so each iteration r' = teleport + 85*r//100 for both
    nodes (symmetric), converging toward SCALE."""
    a = np.array([0, 1], np.int64)
    b = np.array([1, 0], np.int64)
    w = np.ones(2, np.int64)
    outw = np.ones(2, np.int64)
    teleport = (
        G.PAGERANK_SCALE * (G.PAGERANK_DAMP_DEN - G.PAGERANK_DAMP_NUM)
    ) // G.PAGERANK_DAMP_DEN
    r = np.full(2, G.PAGERANK_SCALE, np.int64)
    for _ in range(5):
        r = teleport + (r * 1 // 1) * 85 // 100
    got = G._pagerank_iterate_local(a, b, w, outw, 5, teleport)
    assert (got == r).all()


def test_neighbor_topk_ties_and_k(ray_session):
    edges = pd.DataFrame(
        {
            "a": ["x"] * 4,
            "b": ["n1", "n2", "n3", "n4"],
            "cnt": np.array([5, 5, 9, 1], np.int64),
        }
    )
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(edges, preserve_index=False))
    got = (
        G.neighbor_topk(ds, k=3)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    # cnt desc, neighbor asc on ties; k=3 cuts n4
    assert list(got["neighbor"]) == ["n3", "n1", "n2"]
    assert list(got["rank"]) == [1, 2, 3]
    assert "n4" not in set(got["neighbor"])


def test_graph_preds_filter(ray_session):
    """Non-graph predicates (per-document literals) never become nodes."""
    got = G.cooccur_edges(_triples(FIXTURE), symmetric=True).to_pandas()
    assert "ana" not in set(got["a"]) | set(got["b"])


def _edges(rows, blocks=1):
    """rows: (a, b, cnt); split across ``blocks`` unioned datasets so
    per-batch partials see different batches."""
    import ray.data as rd

    def tbl(chunk):
        return pa.table(
            {
                "a": pa.array([r[0] for r in chunk], pa.string()),
                "b": pa.array([r[1] for r in chunk], pa.string()),
                "cnt": pa.array([r[2] for r in chunk], pa.int64()),
            }
        )

    per = max(1, len(rows) // blocks)
    chunks = [rows[i : i + per] for i in range(0, len(rows), per)]
    ds = rd.from_arrow(tbl(chunks[0]))
    for ch in chunks[1:]:
        ds = ds.union(rd.from_arrow(tbl(ch)))
    return ds


def test_kg_components_chain_across_batches(ray_session):
    """A chain whose edges live in different batches must still fuse
    into ONE component, labelled by the lexicographic-min member (NOT
    the min-hash root the contraction engine picks internally)."""
    rows = [
        ("m", "z", 1),   # component {m, z, a, q}: chain m-z, z-a? no:
        ("a", "m", 1),   # a-m links a into {m, z}
        ("a", "q", 1),   # q too -> component label 'a'
        ("x", "y", 2),   # separate component label 'x'
    ]
    for thresh in (0, 4_000_000):  # distributed star path AND the
        # single-task fast path must agree bit-for-bit
        got = (
            G.kg_components(_edges(rows, blocks=3), local_threshold=thresh)
            .to_pandas()
            .sort_values("entity")
            .reset_index(drop=True)
        )
        assert list(got["entity"]) == ["a", "m", "q", "x", "y", "z"], thresh
        assert list(got["component"]) == ["a", "a", "a", "x", "x", "a"], thresh


def test_kg_components_singleton_edge(ray_session):
    got = G.kg_components(_edges([("b", "c", 1)])).to_pandas()
    assert sorted(got["entity"]) == ["b", "c"]
    assert set(got["component"]) == {"b"}
    got = G.kg_components(
        _edges([("b", "c", 1)]), local_threshold=0
    ).to_pandas()
    assert sorted(got["entity"]) == ["b", "c"]
    assert set(got["component"]) == {"b"}


def test_blake2b_ids_stable_and_distinct():
    vals = np.array(["recife", "pe", "recife", "sp"], dtype=object)
    ids = G._blake2b_ids(vals)
    assert ids[0] == ids[2]
    assert len({ids[0], ids[1], ids[3]}) == 3
    assert (ids >= 0).all()
    # version-independent: pinned golden value (blake2b-8 of 'recife')
    import hashlib

    exp = int.from_bytes(
        hashlib.blake2b(b"recife", digest_size=8).digest(), "big"
    ) >> 1
    assert ids[0] == exp


def test_triangle_counts_basic(ray_session):
    """K4 minus one edge: nodes {a,b,c,d}, edges ab,ac,ad,bc,bd (cd
    missing) -> triangles abc, abd; c and d each touch 1, a and b 2."""
    rows = [
        ("a", "b", 1),
        ("a", "c", 1),
        ("a", "d", 1),
        ("b", "c", 1),
        ("b", "d", 1),
    ]
    for thresh in (0, 4_000_000):  # distributed wedge join AND the
        # single-task numpy fast path must agree
        got = (
            G.triangle_counts(_edges(rows, blocks=2), local_threshold=thresh)
            .to_pandas()
            .sort_values("entity")
            .reset_index(drop=True)
        )
        assert list(got["entity"]) == ["a", "b", "c", "d"], thresh
        assert list(got["n_triangles"]) == [2, 2, 1, 1], thresh
        assert got["n_triangles"].dtype == np.int64


def test_triangle_counts_triangle_free(ray_session):
    """A path graph has zero triangles but every node must appear."""
    rows = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)]
    for thresh in (0, 4_000_000):
        got = G.triangle_counts(
            _edges(rows), local_threshold=thresh
        ).to_pandas()
        assert sorted(got["entity"]) == ["a", "b", "c", "d"], thresh
        assert set(got["n_triangles"]) == {0}, thresh


def test_pagerank_guard_allows_large_graphs():
    """The overflow guard must be PER-NODE: a 150k-node ring (total
    rank mass far over a naive sum bound) with small weights is legal
    and must iterate, not abort."""
    n = 150_000
    a = np.arange(n, dtype=np.int64)
    b = (a + 1) % n
    # symmetric ring
    a2 = np.concatenate([a, b])
    b2 = np.concatenate([b, a])
    w = np.ones(2 * n, dtype=np.int64)
    outw = np.full(n, 2, dtype=np.int64)
    ranks = G._pagerank_iterate_local(
        a2, b2, w, outw, n_iters=2,
        teleport=(G.PAGERANK_SCALE * 15) // 100,
    )
    assert len(ranks) == n
    # a symmetric regular ring keeps every rank equal and positive
    assert (ranks > 0).all() and len(np.unique(ranks)) == 1


def test_pagerank_guard_catches_hub_overflow():
    """A genuine product overflow (hub rank * own out-weight past
    2^63) still fails loud."""
    a = np.array([0, 1], dtype=np.int64)
    b = np.array([1, 0], dtype=np.int64)
    w = np.array([10**7, 10**7], dtype=np.int64)
    outw = np.array([10**7, 10**7], dtype=np.int64)
    with pytest.raises(OverflowError):
        G._pagerank_iterate_local(
            a, b, w, outw, n_iters=1,
            teleport=(G.PAGERANK_SCALE * 15) // 100,
        )


def test_label_propagation_hand_case_and_paths(ray_session):
    """Weighted majority with min-label ties, synchronous rounds; the
    distributed per-round exchange must equal the local fast path."""
    rows = [
        # clique-ish group {a, b, c} with strong weights; d tethered to
        # c weakly but to e strongly -> d joins e's community
        ("a", "b", 5),
        ("a", "c", 5),
        ("b", "c", 5),
        ("c", "d", 1),
        ("d", "e", 9),
    ]

    def sym(ds_rows):
        out = []
        for x, y, w in ds_rows:
            out.append((x, y, w))
            out.append((y, x, w))
        return out

    loc = (
        G.label_propagation(_edges(sym(rows), blocks=2))
        .to_pandas()
        .sort_values("entity")
        .reset_index(drop=True)
    )
    dist = (
        G.label_propagation(_edges(sym(rows), blocks=2), local_edge_threshold=0)
        .to_pandas()
        .sort_values("entity")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(loc, dist)
    com = loc.set_index("entity")["community"]
    # the {a,b,c} triangle coalesces on the min label 'a'
    assert com["a"] == com["b"] == com["c"] == "a"
    # d<->e form a pendant pair: SYNCHRONOUS updates swap their labels
    # every round (the textbook LPA oscillation — deterministic under
    # the fixed-round contract, and the DuckDB oracle reproduces it);
    # after 3 (odd) rounds each holds the other's initial label
    assert com["d"] == "e" and com["e"] == "d"


# ---------------------------------------------------------------- r3 late:
# edge_jaccard / link_predict / bfs_layers


def _sym(rows):
    """Mirror (a, b, cnt) rows into a symmetric edge list."""
    return _edges(rows + [(b, a, c) for a, b, c in rows])


def test_edge_jaccard_hand_values(ray_session):
    """Triangle a-b-c plus pendant c-d: common = triangles through the
    edge, union = deg(a)+deg(b)-common."""
    got = (
        G.edge_jaccard(
            _edges([("a", "b", 1), ("a", "c", 1), ("b", "c", 1), ("c", "d", 1)])
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "a": ["a", "a", "b", "c"],
            "b": ["b", "c", "c", "d"],
            "common_cnt": np.array([1, 1, 1, 0], np.int64),
            "union_cnt": np.array([3, 4, 4, 4], np.int64),
        }
    )
    pd.testing.assert_frame_equal(got, want)


def test_edge_jaccard_distributed_matches_local(ray_session):
    """The wedge-confirm distributed path (local_threshold=0) must equal
    the single-task numpy kernel on a multi-block edge set."""
    rows = [("a", "b", 1), ("a", "c", 2), ("b", "c", 1), ("c", "d", 1),
            ("b", "d", 3), ("d", "e", 1), ("a", "e", 1)]
    local = (
        G.edge_jaccard(_edges(rows, blocks=3))
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    dist = (
        G.edge_jaccard(_edges(rows, blocks=3), local_threshold=0)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(local, dist)
    assert local["common_cnt"].dtype == np.int64
    assert local["union_cnt"].dtype == np.int64


def test_link_predict_hub_cap(ray_session):
    """Star hub h-x1..x5: with the cap below deg(h) the hub cannot serve
    as a shared neighbor, so no candidate pairs exist; at the cap every
    C(5,2) leaf pair is predicted with one common neighbor."""
    star = [("h", f"x{i}", 1) for i in range(1, 6)]
    none = G.link_predict(_edges(star), k=50, max_middle_degree=4).to_pandas()
    assert len(none) == 0
    full = (
        G.link_predict(_edges(star), k=50, max_middle_degree=5)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(full) == 10
    assert (full["common_cnt"] == 1).all()
    assert full["common_cnt"].dtype == np.int64
    # existing edges are anti-joined out
    assert not ((full["a"] == "h") | (full["b"] == "h")).any()


def test_link_predict_topk_determinism(ray_session):
    """k smaller than the candidate set: ties broken (cnt desc, a, b)."""
    star = [("h", f"x{i}", 1) for i in range(1, 6)]
    got = G.link_predict(_edges(star), k=3, max_middle_degree=9).to_pandas()
    assert got[["a", "b"]].values.tolist() == [
        ["x1", "x2"], ["x1", "x3"], ["x1", "x4"]
    ]


def test_bfs_layers_hand(ray_session):
    """Path a-b-c-d, one seed: layers 0..3; the round cap truncates."""
    rows = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)]
    got = (
        G.bfs_layers(_sym(rows), n_seeds=1)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"node": ["a", "b", "c", "d"], "dist": np.array([0, 1, 2, 3], np.int64)}
    )
    pd.testing.assert_frame_equal(got, want)
    capped = G.bfs_layers(_sym(rows), n_seeds=1, max_rounds=2).to_pandas()
    assert set(capped["node"]) == {"a", "b", "c"}


def test_bfs_layers_distributed_matches_local(ray_session):
    """The broadcast-frontier distributed path must equal the local
    kernel, including unreachable-component exclusion."""
    rows = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("x", "y", 1)]
    local = (
        G.bfs_layers(_sym(rows), n_seeds=2)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    dist = (
        G.bfs_layers(_sym(rows), n_seeds=2, local_threshold=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(local, dist)
    # seeds a,b reach the chain; the x-y component is never reached
    assert set(local["node"]) == {"a", "b", "c", "d"}


def test_kcore_path_cascade(ray_session):
    """Path a-b-c-d-e at k=2 peels one endpoint layer per round until
    nothing survives — the classic multi-round cascade."""
    rows = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("d", "e", 1)]
    got = G.k_core(_sym(rows), k=2).to_pandas()
    assert len(got) == 0
    # with a chord closing a cycle b-c-d-b, those three survive k=2
    rows2 = rows + [("b", "d", 1)]
    core = sorted(G.k_core(_sym(rows2), k=2).to_pandas()["entity"])
    assert core == ["b", "c", "d"]


def test_kcore_round_cap_is_contract(ray_session):
    """n_rounds caps the cascade: the 5-path at k=2 needs 2 peels to
    empty; with n_rounds=1 only the first layer is gone."""
    rows = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("d", "e", 1)]
    got = sorted(G.k_core(_sym(rows), k=2, n_rounds=1).to_pandas()["entity"])
    assert got == ["b", "c", "d"]


def test_kcore_distributed_matches_local(ray_session):
    """Driver-loop distributed peeling (local_threshold=0) must equal
    the single-task numpy kernel, including the full-collapse case."""
    rows = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("d", "e", 1),
            ("b", "d", 1), ("x", "y", 1)]

    def ents(ds):
        df = ds.to_pandas()  # empty datasets lose their columns
        return sorted(df["entity"]) if "entity" in df.columns else []

    for k in (2, 3):
        local = ents(G.k_core(_sym(rows), k=k))
        dist = ents(G.k_core(_sym(rows), k=k, local_threshold=0))
        assert local == dist, k
        if k == 2:
            assert local == ["b", "c", "d"]
        else:
            assert local == []


def test_link_predict_distributed_matches_local(ray_session):
    """The hybrid local kernel (default) must equal the distributed
    path (local_threshold=0) including cap filtering and top-k ties."""
    rows = [("h", f"x{i}", 1) for i in range(1, 6)] + [
        ("x1", "x2", 1), ("x2", "x3", 1), ("q", "x1", 1)
    ]
    for cap, kk in ((9, 50), (4, 50), (9, 3)):
        local = (
            G.link_predict(_edges(rows, blocks=2), k=kk, max_middle_degree=cap)
            .to_pandas()
        )
        dist = (
            G.link_predict(
                _edges(rows, blocks=2), k=kk, max_middle_degree=cap,
                local_threshold=0,
            )
            .to_pandas()
        )
        lv = local.values.tolist() if len(local) else []
        dv = dist.values.tolist() if len(dist) else []
        assert lv == dv, (cap, kk)


def test_kcore_bfs_reject_asymmetric_edges(ray_session):
    """k_core / bfs_layers read degrees and adjacency from the 'a' side
    only — feeding them the library-default a<b list must raise loudly
    (the _lpa_lookup posture), never silently mis-peel."""
    rows = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)]
    with pytest.raises(ValueError, match="SYMMETRIC"):
        G.k_core(_edges(rows), k=2).to_pandas()
    with pytest.raises(ValueError, match="SYMMETRIC"):
        G.bfs_layers(_edges(rows)).to_pandas()
    # and the symmetric versions still pass the check
    assert len(G.k_core(_sym(rows), k=1).to_pandas()) == 4


def test_with_self_loops_stabilizes_pendant_pair(ray_session):
    """The pendant-pair oscillation documented on label_propagation:
    with the max-incident-weight self-loop each endpoint ties between
    its own label and its partner's and the lexicographic-min wins —
    converged after round 1, identical on the local and distributed
    paths, and stable whether the round count is odd or even."""
    rows = [
        ("a", "b", 5),
        ("a", "c", 5),
        ("b", "c", 5),
        ("c", "d", 1),
        ("d", "e", 9),
    ]
    aug = G.with_self_loops(_sym(rows))
    for n_rounds in (3, 4):
        loc = (
            G.label_propagation(aug, n_rounds=n_rounds)
            .to_pandas()
            .sort_values("entity")
            .reset_index(drop=True)
        )
        dist = (
            G.label_propagation(aug, n_rounds=n_rounds, local_edge_threshold=0)
            .to_pandas()
            .sort_values("entity")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(loc, dist)
        com = loc.set_index("entity")["community"]
        # the pendant pair {d, e} converges to min('d', 'e') = 'd'
        # under BOTH parities (plain LPA would report d->'e', e->'d'
        # after odd rounds and d->'d', e->'e' after even ones)
        assert com["d"] == "d" and com["e"] == "d"
        # the {a,b,c} triangle still coalesces on 'a'
        assert com["a"] == com["b"] == com["c"] == "a"


def test_with_self_loops_rows(ray_session):
    """One self-loop per node, weighted by the node's max incident
    weight, appended to the untouched symmetric stream."""
    aug = G.with_self_loops(_sym([("a", "b", 5), ("b", "c", 2)])).to_pandas()
    loops = aug[aug["a"] == aug["b"]].set_index("a")["cnt"]
    assert dict(loops) == {"a": 5, "b": 5, "c": 2}
    assert len(aug) == 4 + 3  # 2 mirrored edges + 3 loops


def test_clustering_coefficient_both_paths(ray_session):
    """K4 minus cd: lcc(a)=2*2/(3*2)=2/3, lcc(b)=2/3, lcc(c)=2*1/(2*1)=1,
    lcc(d)=1; a pendant node e-f chain gets 0.0 (degree < 2 guard)."""
    rows = [
        ("a", "b", 1),
        ("a", "c", 1),
        ("a", "d", 1),
        ("b", "c", 1),
        ("b", "d", 1),
        ("e", "f", 1),
    ]
    for thresh in (0, 4_000_000):
        got = (
            G.clustering_coefficient(
                _edges(rows, blocks=2), local_threshold=thresh
            )
            .to_pandas()
            .sort_values("entity")
            .reset_index(drop=True)
        )
        assert list(got["entity"]) == ["a", "b", "c", "d", "e", "f"], thresh
        assert list(got["degree"]) == [3, 3, 2, 2, 1, 1], thresh
        assert list(got["n_triangles"]) == [2, 2, 1, 1, 0, 0], thresh
        assert got["lcc"].tolist() == pytest.approx(
            [2 / 3, 2 / 3, 1.0, 1.0, 0.0, 0.0]
        ), thresh
        assert got["lcc"].dtype == np.float64


def test_degree_delta_nets_out_zero_rows(ray_session):
    # old: d1-p->x, d1-q->y, d2-p->x ; new: d1-p->x, d1-q->z, d3-p->x
    # d1: swapped an obj (out net 0 -> no row); y: -1 in; z: +1 in;
    # d2: -1 out; d3: +1 out; x: net 0 in (lost d2, gained d3) -> no row.
    old = _triples([("d1", "p", "x"), ("d1", "q", "y"), ("d2", "p", "x")])
    new = _triples([("d1", "p", "x"), ("d1", "q", "z"), ("d3", "p", "x")])
    got = (
        G.degree_delta(old, new, num_buckets=3)
        .to_pandas()
        .set_index("node")
        .sort_index()
    )
    assert set(got.index) == {"y", "z", "d2", "d3"}
    assert got.loc["y"].tolist() == [0, -1]
    assert got.loc["z"].tolist() == [0, 1]
    assert got.loc["d2"].tolist() == [-1, 0]
    assert got.loc["d3"].tolist() == [1, 0]
    assert got["d_out"].dtype == np.int64 and got["d_in"].dtype == np.int64


def test_degree_delta_identical_sets_empty(ray_session):
    t = _triples([("d1", "p", "x"), ("d2", "q", "y")])
    assert G.degree_delta(t, t, num_buckets=3).count() == 0


# ---------------------------------------------------------------------------
# round 4: dense-id rank assignment + deterministic random walks
# ---------------------------------------------------------------------------


def _sym_ring(n=60, chord=7):
    rows = []
    for i in range(n):
        for j in ((i + 1) % n, (i * chord + 3) % n):
            if i != j:
                rows.append((f"n{i:04d}", f"n{j:04d}", 1))
                rows.append((f"n{j:04d}", f"n{i:04d}", 1))
    # dedup mirrored duplicates
    return sorted(set(rows))


def test_dense_node_ids_match_string_rank(ray_session):
    rows = _sym_ring()
    ids = (
        G.dense_node_ids(_edges(rows, blocks=5), num_buckets=7)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    expect = sorted({a for a, _, _ in rows})
    assert ids["node"].tolist() == expect
    assert ids["id"].tolist() == list(range(len(expect)))


def test_random_walks_distributed_matches_local(ray_session):
    rows = _sym_ring()
    loc = (
        G.random_walks(_edges(rows, blocks=3), n_steps=3)
        .to_pandas()
        .sort_values(["walk", "step"])
        .reset_index(drop=True)
    )
    dist = (
        G.random_walks(
            _edges(rows, blocks=3), n_steps=3, local_edge_threshold=0
        )
        .to_pandas()
        .sort_values(["walk", "step"])
        .reset_index(drop=True)
    )
    assert loc.equals(dist)


def test_random_walks_steps_are_real_edges(ray_session):
    rows = _sym_ring()
    out = G.random_walks(_edges(rows, blocks=3), n_steps=3).to_pandas()
    nodes = sorted({a for a, _, _ in rows})
    id_of = {n: i for i, n in enumerate(nodes)}
    edge_set = {(id_of[a], id_of[b]) for a, b, _ in rows}
    n = len(nodes)
    # every walk emits steps 0..3 and every hop follows a real edge
    per_walk = out.groupby("walk")["step"].apply(sorted)
    assert all(v == [0, 1, 2, 3] for v in per_walk)
    byw = out.sort_values(["walk", "step"])
    for w, g in byw.groupby("walk"):
        path = g["node_id"].tolist()
        assert path[0] == w
        for u, v in zip(path, path[1:]):
            assert (u, v) in edge_set


def test_personalized_pagerank_distributed_matches_local(ray_session):
    rows = _sym_ring(n=40)
    edges = _edges(rows, blocks=3)
    seeds = ["n0000", "n0007"]
    loc = (
        G.pagerank(edges, seeds=seeds)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    dist = (
        G.pagerank(edges, seeds=seeds, local_edge_threshold=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert loc.equals(dist)
    # mass is seed-relative: seeds hold the largest ranks on a ring
    top = loc.nlargest(2, "rank_int")["node"].tolist()
    assert set(top) == set(seeds)


def test_personalized_pagerank_nonseed_far_node_gets_no_teleport(ray_session):
    rows = _sym_ring(n=40)
    out = (
        G.pagerank(_edges(rows, blocks=2), seeds=["n0000"])
        .to_pandas()
        .set_index("node")["rank_int"]
    )
    # every rank is nonnegative and total mass is bounded by the seed
    # teleport budget (single seed): no node outside the seed's
    # neighborhood accumulates more than the seed itself
    assert (out >= 0).all()
    assert out.idxmax() == "n0000"


def test_shortest_paths_distributed_matches_local(ray_session):
    # weighted ring + chords with varying costs
    rows = []
    n = 40
    for i in range(n):
        for j, c in (((i + 1) % n, 1 + i % 3), ((i * 7 + 3) % n, 2 + i % 5)):
            if i != j:
                rows.append((f"n{i:04d}", f"n{j:04d}", c))
                rows.append((f"n{j:04d}", f"n{i:04d}", c))
    rows = sorted(set(rows))
    loc = (
        G.shortest_paths(_edges(rows, blocks=3), n_rounds=6)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    dist = (
        G.shortest_paths(
            _edges(rows, blocks=3), n_rounds=6, local_threshold=0
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert loc.equals(dist)
    # seeds are at distance 0; every reported dist is a real path cost
    sd = loc.set_index("node")["dist"]
    assert sd["n0000"] == 0 and sd.min() == 0
    assert (sd >= 0).all()


def test_hits_scores_closed_form(ray_session):
    """Hand-computable bipartite HITS: h1 = out-degree, a1 = sum of
    asserting docs' out-degrees, h2 = sum of values' a1."""
    got = (
        G.hits_scores(_triples(FIXTURE))
        .to_pandas()
        .set_index("node")
        .sort_index()
    )
    # out-degrees: d1=3, d2=2, d3=2, d4=1, d5=2
    # a1(recife) = d1+d2+d4+d5 = 3+2+1+2 = 8; a1(pe) = 3+2 = 5
    # a1(ana) = 3; a1(natal) = 2; a1(rn) = 2; a1(pb) = 2
    assert got.loc["recife", "auth_int"] == 8
    assert got.loc["pe", "auth_int"] == 5
    assert got.loc["ana", "auth_int"] == 3
    # h2(d1) = a1(recife) + a1(pe) + a1(ana) = 8 + 5 + 3 = 16
    assert got.loc["d1", "hub_int"] == 16
    # h2(d4) = a1(recife) = 8
    assert got.loc["d4", "hub_int"] == 8
    # doc nodes have no in-edges; value nodes have no out-edges
    assert got.loc["d1", "auth_int"] == 0
    assert got.loc["recife", "hub_int"] == 0


def test_hits_distributed_matches_local(ray_session):
    """The open-vocabulary distributed path (local_edge_threshold=0)
    must be bit-identical to the single-task kernel, including the
    duplicate-pair dedup and the zero-filled universe."""
    rows = FIXTURE + [("d1", "form.extra", "recife")]  # dup (d1, recife)
    loc = (
        G.hits_scores(_triples(rows))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    dist = (
        G.hits_scores(_triples(rows), local_edge_threshold=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(loc, dist)
    # the duplicated (d1, recife) pair must count once: h1(d1) still 3
    assert (
        loc.set_index("node").loc["recife", "auth_int"] == 8
    ), "distinct-pair contract violated"


def test_ktruss_closed_form_and_cascade(ray_session):
    """5-clique: every edge has support 3 -> survives k=5, peeled at
    k=6.  Two triangles sharing an edge: the shared edge has support
    2 but its wingmen have 1, so k=4 cascades to empty (round 1 drops
    the wings, round 2 starves the shared edge)."""
    import itertools

    clique = [(f"c{i}", f"c{j}", 1) for i, j in
              itertools.combinations(range(5), 2)]
    got = G.k_truss(_edges(clique, blocks=2), k=5).to_pandas()
    assert len(got) == 10
    assert len(G.k_truss(_edges(clique, blocks=2), k=6).to_pandas()) == 0
    bowtie = [("a", "b", 1), ("a", "c", 1), ("b", "c", 1),
              ("b", "d", 1), ("c", "d", 1)]  # triangles abc + bcd
    assert len(G.k_truss(_edges(bowtie), k=3).to_pandas()) == 5
    assert len(G.k_truss(_edges(bowtie), k=4).to_pandas()) == 0
    # round cap honored: one round only drops the wings
    one = G.k_truss(_edges(bowtie), k=4, n_rounds=1).to_pandas()
    assert sorted(map(tuple, one.values.tolist())) == [("b", "c")]
    with pytest.raises(ValueError, match="k >= 3"):
        G.k_truss(_edges(bowtie), k=2)


def test_ktruss_distributed_matches_local(ray_session):
    """Forced-distributed rounds (local_threshold=0) must equal the
    single-task kernel, including pendant edges (support 0) and the
    full-collapse case."""
    import itertools

    rows = (
        [(f"c{i}", f"c{j}", 1) for i, j in itertools.combinations(range(5), 2)]
        + [("c0", "x", 1), ("x", "y", 1)]  # pendant path
        + [("p", "q", 1), ("p", "r", 1), ("q", "r", 1)]  # lone triangle
    )
    def pairs(ds):
        df = ds.to_pandas()  # empty datasets lose their columns
        if "a" not in df.columns:
            return []
        return sorted(map(tuple, df[["a", "b"]].values.tolist()))

    for k in (3, 5, 6):
        loc = pairs(G.k_truss(_edges(rows, blocks=3), k=k))
        dist = pairs(G.k_truss(_edges(rows, blocks=3), k=k, local_threshold=0))
        assert loc == dist, k
        if k == 5:
            assert len(loc) == 10  # the clique alone
        if k == 6:
            assert loc == []


def test_assortativity_closed_form(ray_session):
    """Star K(1,3): every edge joins deg-3 to deg-1 -> r = -1.
    Perfect 4-clique: zero degree variance -> NULL (None)."""
    import itertools

    star = [("hub", f"l{i}", 1) for i in range(3)]
    got = G.assortativity(_sym(star))
    assert got["m"].iloc[0] == 6  # symmetric: 3 undirected edges
    assert got["assortativity"].iloc[0] == -1.0
    clique = [(f"c{i}", f"c{j}", 1) for i, j in
              itertools.combinations(range(4), 2)]
    reg = G.assortativity(_sym(clique))
    assert reg["m"].iloc[0] == 12
    assert pd.isna(reg["assortativity"].iloc[0])


def test_neighbor_sample_deterministic(ray_session):
    """The fanout draw is a pure function of the edge: block layout
    must not change it, ranks follow (md5(node:neighbor), neighbor),
    and a node with fewer than k neighbors keeps them all."""
    import hashlib

    star = [("hub", f"l{i}", 1) for i in range(9)] + [("p", "q", 1)]
    got1 = (
        G.neighbor_sample(_sym(star), k=3)
        .to_pandas()
        .sort_values(["node", "rank"])
        .reset_index(drop=True)
    )
    got2 = (
        G.neighbor_sample(_sym(star * 1), k=3, num_buckets=7)
        .to_pandas()
        .sort_values(["node", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got1, got2)
    hub = got1[got1["node"] == "hub"]
    assert len(hub) == 3
    want = sorted(
        (f"l{i}" for i in range(9)),
        key=lambda v: (hashlib.md5(f"hub:{v}".encode()).hexdigest(), v),
    )[:3]
    assert hub["neighbor"].tolist() == want
    # leaves have exactly one neighbor each -> rank 1, kept
    assert (got1[got1["node"] == "l0"]["neighbor"] == "hub").all()
    assert (got1[got1["node"] == "p"]["neighbor"] == "q").all()


def test_assortativity_distributed_matches_local(ray_session):
    """The single-task partials kernel (default ≤4M edges) must agree
    with the forced-distributed degree-attach rounds bit-for-bit,
    including the exact big-int sums behind the one float division."""
    rows = (
        [("hub", f"l{i}", 1) for i in range(5)]       # star
        + [("p", "q", 2), ("q", "r", 3), ("r", "s", 1)]  # weighted path
        + [("x", "y", 1), ("y", "z", 1), ("x", "z", 1)]  # triangle
    )
    loc = G.assortativity(_sym(rows))
    dist = G.assortativity(_sym(rows), local_edge_threshold=0)
    pd.testing.assert_frame_equal(loc, dist)
    assert loc["m"].iloc[0] == 22


def test_lift_closed_form_and_parity(ray_session):
    """Two disjoint pairs: each pair's weighted degrees equal its own
    cnt, so lift = N/cnt ×1e6 exactly; and the single-task kernel must
    match the forced-distributed degree-attach path bit-for-bit."""
    two = [("a", "b", 3), ("c", "d", 1)]  # N = 4
    got = (
        G.cooccur_lift(_edges(two))
        .to_pandas()
        .sort_values("a")
        .reset_index(drop=True)
    )
    # lift(a,b) = 3*4*1e6 // (3*3); lift(c,d) = 1*4*1e6 // (1*1)
    assert got["lift_x1e6"].tolist() == [1_333_333, 4_000_000]
    rows = (
        [("hub", f"l{i}", i + 1) for i in range(6)]
        + [("l0", "l1", 2), ("l2", "l3", 5), ("c", "d", 7)]
    )
    loc = (
        G.cooccur_lift(_edges(rows, blocks=3))
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    dist = (
        G.cooccur_lift(_edges(rows, blocks=3), local_edge_threshold=0)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(loc, dist)


def test_matching_greedy_semantics(ray_session):
    """Salted-hash handshake: a star matches exactly ONE pair — the
    hub plus its argmin-(md5(leaf:1), leaf) leaf; a path yields a
    valid (node-disjoint) matching that the local kernel and the
    hash rule agree on."""
    import hashlib

    star = [("hub", f"l{i}", 1) for i in range(4)]
    got = G.maximal_matching(_sym(star)).to_pandas()
    best = min(
        (f"l{i}" for i in range(4)),
        key=lambda v: (hashlib.md5(f"{v}:1".encode()).hexdigest(), v),
    )
    assert len(got) == 1
    assert sorted(got.iloc[0].tolist()) == sorted(["hub", best])
    path = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)]
    pairs = sorted(
        map(tuple, G.maximal_matching(_sym(path)).to_pandas().values.tolist())
    )
    flat = [n for p in pairs for n in p]
    assert len(pairs) >= 1 and len(flat) == len(set(flat))


def test_matching_distributed_matches_local(ray_session):
    """Forced-distributed handshake rounds must equal the single-task
    kernel, including multi-round cascades and isolated leftovers."""
    rows = (
        [(f"p{i}", f"p{i+1}", 1) for i in range(7)]  # long path
        + [("hub", f"l{i}", 1) for i in range(3)]    # star
        + [("x", "y", 1)]                            # isolated pair
    )

    def pairs(ds):
        df = ds.to_pandas()
        if "a" not in df.columns:
            return []
        return sorted(map(tuple, df.values.tolist()))

    loc = pairs(G.maximal_matching(_sym(rows)))
    dist = pairs(G.maximal_matching(_sym(rows), local_threshold=0))
    assert loc == dist
    # a maximal matching: no two pairs share a node, and every
    # unmatched adjacent pair would extend it (spot: x-y matched)
    flat = [n for p in loc for n in p]
    assert len(flat) == len(set(flat))
    assert ("x", "y") in loc


def test_degree_histogram_closed_form(ray_session):
    """Star K(1,4): one degree-4 hub + four degree-1 leaves; adding a
    disjoint edge shifts the degree-1 bucket by 2."""
    star = [("hub", f"l{i}", 1) for i in range(4)]
    got = (
        G.degree_histogram(_edges(star, blocks=2))
        .to_pandas()
        .sort_values("degree")
        .reset_index(drop=True)
    )
    assert got.values.tolist() == [[1, 4], [4, 1]]
    got2 = (
        G.degree_histogram(_edges(star + [("p", "q", 1)]))
        .to_pandas()
        .sort_values("degree")
        .reset_index(drop=True)
    )
    assert got2.values.tolist() == [[1, 6], [4, 1]]
