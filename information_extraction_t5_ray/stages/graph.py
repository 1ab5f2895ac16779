"""KG graph analytics over the materialized triples table.

The north star materializes (subj, pred, obj) edge lists; these
operators are the downstream graph-construction consumers a KG
pipeline needs: node degrees, entity co-mention edges, entity
importance (PageRank) and per-entity neighbor rankings.

Scale posture (all stages follow the repo's two-phase pattern):

* ``node_degrees`` — per-batch ``value_counts`` partials, one row per
  (batch, node) on the wire, bucketed merge; never ships raw triples
  into a shuffle.
* ``cooccur_edges`` — per-document entity pairs need the document
  co-located, so ONE ``groupby(subj)`` shuffle of the (pred-filtered,
  column-pruned) triples; pair emission is vectorized inside the
  group, then partial counts collapse per batch before the small
  final merge (pair vocabulary << pair occurrences).
* ``pagerank`` — INTEGER-exact power iteration whose distributed path
  keeps the rank vector as a hash-bucketed DATASET and advances it by
  two bucketed exchanges per iteration (tagged-union state co-group on
  the source endpoint, contribution merge on the destination) — the
  Pregel/GraphX posture, no driver-resident node map, so neither node
  vocabulary nor edge volume has a ceiling.  All arithmetic is int64
  (contributions floor-divide, damping is ``*85 // 100``), so results
  are bit-exact and order-independent: the DuckDB oracle hashes equal
  (no float accumulation drift), and the local fast path is
  arithmetic-identical.
* ``neighbor_topk`` — grouped top-k over the co-mention edges with
  deterministic (cnt desc, neighbor asc) ties.

Reference analog: none (the reference stops at flat answer tables);
cited design inputs are the north star's "canonicalization /
materialize (subj, pred, obj) edge lists" stage and the repo-wide
salted two-phase aggregation pattern (stages/triples.py).
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from .common import arrow_out as _arrow_out
from .common import arrowed, bucket_of, resolve_parallelism

# default entity predicates for the co-mention graph: closed-vocabulary
# fields (places, issuing organs) — the graph's nodes are ENTITIES, not
# per-document literals like CPF digits
GRAPH_PREDS = (
    "form.endereco.cidade",
    "form.endereco.estado",
    "form.endereco.bairro",
    "form.orgao_emissor",
)

PAGERANK_SCALE = 10**12  # initial integer rank mass per node
PAGERANK_DAMP_NUM, PAGERANK_DAMP_DEN = 85, 100  # 0.85 as a ratio


def _pairs_by_size_class(
    starts: np.ndarray, sizes: np.ndarray, values: np.ndarray
):
    """All within-group ordered pairs (i < j) over contiguous groups of
    ``values`` (group g spans ``values[starts[g] : starts[g]+sizes[g]]``).

    One (m, s) gather + one triu per DISTINCT group size — never a
    Python loop over groups.  Returns ``(first, second, group_index)``
    where ``group_index`` maps each pair back to its group position in
    ``starts`` (for apex/key lookups).  Shared by cooccur pair
    emission and both triangle wedge emitters.
    """
    out1: List[np.ndarray] = []
    out2: List[np.ndarray] = []
    gidx: List[np.ndarray] = []
    for s in np.unique(sizes):
        if s < 2:
            continue
        gsel = np.flatnonzero(sizes == s)
        rows = starts[gsel][:, None] + np.arange(s)[None, :]
        vals = values[rows]
        iu, ju = np.triu_indices(s, k=1)
        out1.append(vals[:, iu].ravel())
        out2.append(vals[:, ju].ravel())
        gidx.append(np.repeat(gsel, len(iu)))
    if not out1:
        e = np.array([], dtype=values.dtype)
        return e, e, np.array([], dtype=np.int64)
    return (
        np.concatenate(out1),
        np.concatenate(out2),
        np.concatenate(gidx).astype(np.int64),
    )


def node_degrees(triples_ds, num_buckets: Optional[int] = None):
    """(node, out_degree, in_degree) over subj/obj endpoints.

    Two-phase: per-batch value_counts -> bucketed sum merge.  Output
    BIGINT degrees; nodes appearing only as subj (documents) have
    in_degree 0 and vice versa.
    """
    num_buckets = resolve_parallelism(num_buckets)

    def partial(batch: pa.Table) -> pd.DataFrame:
        out_c = pd.Series(batch["subj"].to_pandas()).value_counts()
        in_c = pd.Series(batch["obj"].to_pandas()).value_counts()
        df = pd.concat(
            [out_c.rename("out_degree"), in_c.rename("in_degree")], axis=1
        ).fillna(0)
        res = pd.DataFrame(
            {
                "node": df.index.astype(str),
                "out_degree": df["out_degree"].to_numpy(np.int64),
                "in_degree": df["in_degree"].to_numpy(np.int64),
            }
        )
        res["_bucket"] = bucket_of(res["node"], num_buckets)
        return res

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False, as_index=False)[
            ["out_degree", "in_degree"]
        ].sum()
        g["out_degree"] = g["out_degree"].astype(np.int64)
        g["in_degree"] = g["in_degree"].astype(np.int64)
        return g[["node", "out_degree", "in_degree"]]

    partials = triples_ds.select_columns(["subj", "obj"]).map_batches(
        arrowed(partial), batch_format="pyarrow"
    )
    return partials.groupby("_bucket").map_groups(
        arrowed(final), batch_format="pandas"
    )


def degree_delta(old_ds, new_ds, num_buckets: Optional[int] = None):
    """Incremental degree maintenance: per-node ``(d_out, d_in)`` CHANGE
    between two triple sets, computed from the churn stream
    (:func:`~.triples.diff_triples`), never from a full recount — the
    maintenance path that keeps :func:`node_degrees` materializations
    fresh after an extractor upgrade or recrawl.  Nodes whose degrees
    are unchanged emit nothing: output is bounded by the churn, not the
    KG.  Set-semantic like ``diff_triples`` (degrees over the distinct
    (subj, pred, obj) set).

    One exchange past the diff's own: the signed (+1 added / -1
    removed) endpoint partials are per-batch combined, then summed per
    node in a bucketed merge; zero-net rows (a node that lost one
    triple and gained another) are dropped there.
    """
    from .triples import diff_triples

    num_buckets = resolve_parallelism(num_buckets)
    diff = diff_triples(old_ds, new_ds, num_buckets=num_buckets)

    def partial(batch: pa.Table) -> pd.DataFrame:
        sign = np.where(
            batch["change"].to_pandas().astype(str) == "added", 1, -1
        ).astype(np.int64)
        subj = batch["subj"].to_pandas().astype(str)
        obj = batch["obj"].to_pandas().astype(str)
        df = pd.concat(
            [
                pd.DataFrame({"node": subj, "d_out": sign, "d_in": 0}),
                pd.DataFrame({"node": obj, "d_out": 0, "d_in": sign}),
            ],
            ignore_index=True,
        )
        g = df.groupby("node", sort=False, as_index=False)[
            ["d_out", "d_in"]
        ].sum()
        for c in ("d_out", "d_in"):
            g[c] = g[c].astype(np.int64)
        g["_bucket"] = bucket_of(g["node"].to_numpy(), num_buckets)
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False, as_index=False)[
            ["d_out", "d_in"]
        ].sum()
        g = g[(g["d_out"] != 0) | (g["d_in"] != 0)]
        for c in ("d_out", "d_in"):
            g[c] = g[c].astype(np.int64)
        return g[["node", "d_out", "d_in"]]

    parts = diff.map_batches(arrowed(partial), batch_format="pyarrow")
    return parts.groupby("_bucket").map_groups(
        arrowed(merge), batch_format="pandas"
    )


def cooccur_edges(
    triples_ds,
    preds: Sequence[str] = GRAPH_PREDS,
    num_buckets: Optional[int] = None,
    symmetric: bool = False,
    scatter: Optional[int] = None,
):
    """Entity co-mention edges: (a, b, cnt) counting documents whose
    triple set mentions both entities, over the ``preds`` predicates,
    with ``a < b`` lexicographically (or both directions when
    ``symmetric`` — the PageRank input).

    One groupby(subj) co-locates each document's (few) graph-predicate
    objects; pair emission is a vectorized cross-product per document
    (bounded by len(preds)); per-batch partial counts collapse the
    pair stream before the final bucketed merge.
    """
    num_buckets = resolve_parallelism(num_buckets)
    pred_set = set(preds)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(
            pc.is_in(batch["pred"], value_set=pa.array(sorted(pred_set)))
        ).select(["subj", "obj"])
        # bucket DOCUMENTS (not raw groups): map_groups invokes its UDF
        # once per group, so grouping on raw subj would cost one Python
        # call per document — bucketing by subj hash co-locates complete
        # documents while the UDF runs once per bucket (C-speed inside)
        b = bucket_of(t["subj"].to_pandas().astype(str), num_buckets)
        return t.append_column(
            "_dbucket", pa.array(b, pa.int32())
        ).replace_schema_metadata(None)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        # df holds one or more COMPLETE documents (groupby subj).
        # Vectorized pair emission by document size class (the dedup
        # pattern): group sizes are bounded by len(preds), so each size
        # s yields one (m, s) value matrix and one triu gather — no
        # Python loop over the ~N documents, only over the ≤|preds|
        # distinct sizes.  Sorting by (subj, obj) makes in-document
        # values ascending, so a < b holds by construction.
        df = df[["subj", "obj"]].drop_duplicates()
        df = df.sort_values(["subj", "obj"], kind="stable")
        subj = df["subj"].to_numpy(dtype=object)
        obj = df["obj"].to_numpy(dtype=object).astype(str)
        a = b = np.array([], dtype=object)
        if len(df):
            new = np.ones(len(df), dtype=bool)
            new[1:] = subj[1:] != subj[:-1]
            sizes = np.bincount(np.cumsum(new) - 1)
            a, b, _ = _pairs_by_size_class(np.flatnonzero(new), sizes, obj)
        if not len(a):
            # typed ARROW empty: empty pandas object columns trip the
            # size estimator into per-block log spam
            return pa.table(
                {"a": pa.array([], pa.string()),
                 "b": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64()),
                 "_bucket": pa.array([], pa.int32())}
            )
        part = (
            pd.DataFrame({"a": a, "b": b})
            .groupby(["a", "b"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        part["cnt"] = part["cnt"].astype(np.int64)
        part["_bucket"] = bucket_of(part["a"] + "\x1f" + part["b"], num_buckets)
        return part

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["a", "b"], sort=False, as_index=False)["cnt"].sum()
        g["cnt"] = g["cnt"].astype(np.int64)
        return g[["a", "b", "cnt"]]

    from .common import maybe_scatter

    # no default pre-groupby re-scatter: the sort-based groupby's
    # reduce width follows the UPSTREAM block count, and triples
    # pipelines are already wide at the read — an extra all-to-all of
    # the filtered rows is pure fixed cost (same finding as minhash,
    # stages/common.maybe_scatter).  Pass ``scatter`` for narrow inputs.
    edges = (
        maybe_scatter(
            triples_ds.map_batches(keep, batch_format="pyarrow"), scatter
        )
        .groupby("_dbucket")
        .map_groups(arrowed(pairs), batch_format="pandas")
        .groupby("_bucket")
        .map_groups(arrowed(final), batch_format="pandas")
    )
    if not symmetric:
        return edges

    return edges.map_batches(mirror_edges, batch_format="pyarrow")


def mirror_edges(batch: pa.Table) -> pa.Table:
    """Mirror an (a, b, cnt) edge block into both directions — the ONE
    place the a<b -> symmetric conversion lives (cooccur_edges
    symmetric=True and the checkpointed graph fan-out both use it, so
    the two inputs can never drift)."""
    rev = pa.table({"a": batch["b"], "b": batch["a"], "cnt": batch["cnt"]})
    return pa.concat_tables(
        [batch.select(["a", "b", "cnt"]).replace_schema_metadata(None), rev]
    )


def with_self_loops(edges_ds, num_buckets: Optional[int] = None):
    """Augment a SYMMETRIC weighted edge list with one self-loop per
    node, weighted by the node's MAX incident edge weight — the
    inertia term that stabilizes synchronous label propagation.

    Under plain synchronous LPA a mutual-heaviest pendant pair swaps
    labels forever (the documented oscillation on
    :func:`label_propagation`).  With the self-loop each endpoint sees
    its OWN current label at weight == the pendant edge's weight, so
    the tie falls to the lexicographic-min label for BOTH endpoints in
    round 1 and every later round re-confirms it — converged, still
    fully deterministic, and the oracle stays the same iterated CTE
    run over the augmented edge CTE.

    Two-phase per-node max (per-batch partial -> bucketed merge), so
    only (node, max) rows exchange; the edge stream itself is passed
    through untouched.
    """
    num_buckets = resolve_parallelism(num_buckets)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "a": batch["a"].to_numpy(zero_copy_only=False).astype(str),
                "cnt": batch["cnt"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("a", sort=False, as_index=False)["cnt"].max()
        g["cnt"] = g["cnt"].astype(np.int64)
        g["_bucket"] = bucket_of(g["a"], num_buckets)
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("a", sort=False, as_index=False)["cnt"].max()
        out = pd.DataFrame(
            {
                "a": g["a"],
                "b": g["a"],
                "cnt": g["cnt"].astype(np.int64),
            }
        )
        return out

    loops = (
        edges_ds.map_batches(arrowed(partial), batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(arrowed(merge), batch_format="pandas")
    )
    return edges_ds.select_columns(["a", "b", "cnt"]).union(loops)


def _check_symmetric(edges, num_buckets: int) -> None:
    """Loud precondition for operators whose degree/traversal logic
    reads only the ``a`` side (k_core, bfs_layers): a symmetric edge
    multiset has multiset{(a,b)} == multiset{(b,a)}, so the int64
    wrap-sum of h(a,b) - h(b,a) over all rows is EXACTLY zero; an a<b
    list fails with overwhelming probability.  One map-side pass, one
    scalar per batch — the cheap analog of _lpa_lookup's miss check."""

    P = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 odd constants
    Q = np.uint64(0xBF58476D1CE4E5B9)

    def partial(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            # blake2b per UNIQUE node (vocabulary-bounded Python loop),
            # pair-coupled hash combined VECTORIZED per edge
            ia = _blake2b_ids(a).astype(np.uint64)
            ib = _blake2b_ids(b).astype(np.uint64)
            h_ab = ((ia * P) ^ ib) * Q
            h_ba = ((ib * P) ^ ia) * Q
            s = int((h_ab - h_ba).sum(dtype=np.uint64))  # mod 2^64
        return pa.table({"s": pa.array([s], pa.uint64())})

    total = sum(
        int(r["s"]) for r in
        edges.map_batches(partial, batch_format="pyarrow").take_all()
    ) % (1 << 64)
    if total != 0:
        raise ValueError(
            "this operator requires a SYMMETRIC edge list (every edge "
            "present in both directions); pass "
            "cooccur_edges(..., symmetric=True)"
        )


def _pagerank_iterate_local(
    a_idx: np.ndarray,
    b_idx: np.ndarray,
    w: np.ndarray,
    outw: np.ndarray,
    n_iters: int,
    teleport: int,
    seed_mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """One-worker power iteration, arithmetic-identical to the
    distributed path: per-dst int64 contribution sums (``np.add.at`` —
    exact, unlike float ``bincount``), then ``(sum * 85) // 100``.

    ``seed_mask`` selects PERSONALIZED PageRank: rank mass starts on
    (and teleports back to) the seed nodes only."""
    limit = np.iinfo(np.int64).max
    if seed_mask is None:
        ranks = np.full(len(outw), PAGERANK_SCALE, dtype=np.int64)
        tele = teleport
    else:
        ranks = np.where(seed_mask, PAGERANK_SCALE, 0).astype(np.int64)
        tele = np.where(seed_mask, teleport, 0).astype(np.int64)
    for _ in range(n_iters):
        total = _pagerank_overflow_guard(ranks, outw, limit)
        c = (ranks[a_idx] * w) // outw[a_idx]
        sums = np.zeros(len(outw), dtype=np.int64)
        np.add.at(sums, b_idx, c)
        _pagerank_check_sums(sums, total, limit)
        ranks = tele + (sums * PAGERANK_DAMP_NUM) // PAGERANK_DAMP_DEN
    return ranks


def _pagerank_overflow_guard(
    ranks: np.ndarray, outw: np.ndarray, limit: int
) -> int:
    """Fail loud on the product step BEFORE it can wrap (the DuckDB
    oracle raises on BIGINT overflow; parity demands the same):
    rank(u) * W(u) >= rank(u) * w(u,v) for every out-edge, so checking
    each node's rank against limit // W(u) is PER-NODE tight (never
    pairs one node's rank with another node's weight; conservative
    only up to the node's own weight spread).  Returns the total rank
    mass T = sum(ranks) as an unbounded Python int — the invariant
    checked after accumulation (:func:`_pagerank_check_sums`).
    """
    if len(ranks) == 0:
        return 0
    if bool((ranks > limit // np.maximum(outw, 1)).any()):
        raise OverflowError(
            "pagerank: rank * edge-weight would overflow int64; "
            "lower PAGERANK_SCALE or pre-scale edge weights"
        )
    return sum(int(r) for r in ranks.tolist())


def _exact_sum_nonneg(v: np.ndarray) -> int:
    """Exact Python-int total of a NONNEGATIVE int64 vector via 32-bit
    hi/lo partial sums (each bounded far below 2^63 for any realistic
    group size), immune to int64 wrap — the distributed guards compare
    these exact totals across an accumulation to detect overflow
    without any driver-resident vector."""
    if len(v) == 0:
        return 0
    # the hi/lo partials are only wrap-proof while each partial stays
    # below 2^63: lo <= len(v) * (2^32 - 1), so enforce the bound that
    # keeps the guard itself trustworthy instead of silently passing
    if len(v) >= 2**31:
        raise OverflowError(
            "_exact_sum_nonneg: group exceeds 2^31 rows; hi/lo partial "
            "sums could wrap — sum this group in chunks"
        )
    v = v.astype(np.int64, copy=False)
    return (int((v >> 32).sum()) << 32) + int((v & 0xFFFFFFFF).sum())


# fixed Arrow schema for the tagged (edges ∪ node-state) co-group union:
# one schema through the shuffle (repo invariant — mixed schemas hit the
# slow unify path).  Edge rows: side=0, (a, b, cnt, w=outw_a once
# enriched); state rows: side=1, a=node, w=value, b=""/cnt=0 unused.
_PR_TAG_SCHEMA = pa.schema(
    [
        ("side", pa.int8()),
        ("a", pa.string()),
        ("b", pa.string()),
        ("cnt", pa.int64()),
        ("w", pa.int64()),
        ("_bucket", pa.int32()),
    ]
)


def _pr_tag_edges(batch: pa.Table, num_buckets: int, w_col=None) -> pa.Table:
    a = pd.Series(batch["a"].to_numpy(zero_copy_only=False)).astype(str)
    n = len(a)
    w = (
        batch[w_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if w_col is not None and w_col in batch.column_names
        else np.zeros(n, dtype=np.int64)
    )
    return pa.table(
        {
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "a": pa.array(a, pa.string()),
            "b": batch["b"].cast(pa.string()),
            "cnt": batch["cnt"].cast(pa.int64()),
            "w": pa.array(w, pa.int64()),
            "_bucket": pa.array(bucket_of(a, num_buckets), pa.int32()),
        },
        schema=_PR_TAG_SCHEMA,
    )


def _pr_tag_state(batch: pa.Table, num_buckets: int) -> pa.Table:
    """State rows (node, w) tagged side=1, co-bucketed with the edges'
    ``a`` endpoint by the same hash."""
    node = pd.Series(batch["node"].to_numpy(zero_copy_only=False)).astype(str)
    n = len(node)
    return pa.table(
        {
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "a": pa.array(node, pa.string()),
            "b": pa.array([""] * n, pa.string()),
            "cnt": pa.array(np.zeros(n, dtype=np.int64)),
            "w": batch["w"].cast(pa.int64()),
            "_bucket": pa.array(bucket_of(node, num_buckets), pa.int32()),
        },
        schema=_PR_TAG_SCHEMA,
    )


def _pagerank_check_sums(csum: np.ndarray, total: int, limit: int) -> None:
    """Detect int64 wrap in the contribution accumulation AFTER the
    fact via mass conservation (contributions are nonnegative and
    floor-division makes their grand total <= the rank mass T, so a
    wrap shows as a negative entry or a mass violation — both checked
    in unbounded Python ints), then bound the *85 damping product
    exactly.  This keeps >100k-node graphs legal (a strict
    T <= limit//85 PRE-check would falsely abort them) while still
    never emitting wrapped ranks."""
    if len(csum) == 0:
        return
    if bool((csum < 0).any()) or sum(int(x) for x in csum.tolist()) > total:
        raise OverflowError(
            "pagerank: contribution accumulation wrapped int64; "
            "lower PAGERANK_SCALE"
        )
    if int(csum.max()) > limit // PAGERANK_DAMP_NUM:
        raise OverflowError(
            "pagerank: damping product would overflow int64; "
            "lower PAGERANK_SCALE"
        )


def _local_pagerank(
    batch: pa.Table,
    n_iters: int,
    teleport: int,
    seeds: Optional[list] = None,
) -> pa.Table:
    """Single-task PageRank kernel (the whole bounded edge list is one
    block after ``repartition(1)``) — arithmetic-identical to the
    distributed rounds; runs worker-side so the driver never holds the
    edge strings (VERDICT r4 item 2)."""
    edf = batch.to_pandas()
    nodes = np.unique(edf["a"].to_numpy(dtype=object).astype(str))
    idx = {n: i for i, n in enumerate(nodes)}
    a_idx = edf["a"].astype(str).map(idx).to_numpy(np.int64)
    b_idx = edf["b"].astype(str).map(idx).to_numpy(np.int64)
    w = edf["cnt"].to_numpy(np.int64)
    outw = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(outw, a_idx, w)
    mask = (
        np.isin(nodes, np.asarray(list(seeds), dtype=str))
        if seeds is not None
        else None
    )
    ranks = _pagerank_iterate_local(
        a_idx, b_idx, w, outw, n_iters, teleport, seed_mask=mask
    )
    return pa.table(
        {
            "node": pa.array(nodes.tolist(), pa.string()),
            "rank_int": pa.array(ranks.tolist(), pa.int64()),
        }
    )


def pagerank(
    edges_ds,
    n_iters: int = 5,
    num_buckets: Optional[int] = None,
    local_edge_threshold: int = 4_000_000,
    seeds: Optional[Sequence[str]] = None,
):
    """Integer-exact weighted PageRank over a SYMMETRIC weighted edge
    list (a, b, cnt).

    r_0(v) = SCALE; r_{t+1}(v) = TELEPORT + 85 * (sum over in-edges of
    r_t(u) * w(u,v) // W(u)) // 100, all int64 — bit-exact in any
    engine and under any partitioning (integer sums commute).  The
    distributed path keeps the rank vector AS A DATASET (node, rank)
    hash-bucketed alongside the edges and advances it with two bucketed
    exchanges per iteration (state co-group on the source endpoint,
    contribution merge on the destination) — no driver-resident node
    map, no per-round broadcast, so neither node vocabulary nor edge
    volume has a ceiling.

    Every symmetric edge gives W(u) >= 1, so there are no dangling
    nodes by construction, and every node receives contributions (every
    ``a`` is some edge's ``b``), so the per-destination merge re-emits
    the complete rank state each round.

    ``seeds`` selects PERSONALIZED PageRank: rank mass starts on (and
    teleports back to) the seed nodes only — proximity scores relative
    to the seed set.  The seed list is a bounded INPUT parameter (the
    caller's query, not data-scaled), so broadcasting it is within the
    open-vocabulary posture.
    """
    num_buckets = resolve_parallelism(num_buckets)
    teleport = (PAGERANK_SCALE * (PAGERANK_DAMP_DEN - PAGERANK_DAMP_NUM)
                ) // PAGERANK_DAMP_DEN

    # the edge list is consumed n_iters + 1 times (out-weights + one
    # pass per iteration); lazy lineage would re-execute the WHOLE
    # upstream pipeline (triples -> cooccur shuffle) per consumer, so
    # pin the (pair-vocabulary-sized, far smaller than the corpus)
    # edge blocks in the object store once
    edges_ds = edges_ds.materialize()

    # small graphs: each Ray pass costs ~1-2 s of fixed pipeline
    # overhead, so below the same edge bound dedup's _local_cc uses,
    # iterate in ONE WORKER TASK (the bfs_layers kernel shape,
    # VERDICT r4 item 2: repartition(1).map_batches keeps even the
    # bounded fast path's edge strings off the driver heap) —
    # arithmetic-identical (integer ops) to the distributed path,
    # which stays for crawl-scale edge volumes
    if edges_ds.count() <= local_edge_threshold:
        seed_list = list(seeds) if seeds is not None else None
        return edges_ds.repartition(1).map_batches(
            lambda t: _local_pagerank(t, n_iters, teleport, seed_list),
            batch_format="pyarrow",
            batch_size=None,
        )

    # ---- open-vocabulary distributed path (VERDICT r3 item 2) -------
    # EVERY per-node structure — out-weights, the rank vector — lives
    # in hash-bucketed Dataset blocks; the driver holds only scalars.
    # Per iteration: exchange 1 co-groups the edge stream with the rank
    # state on bucket_of(a) (a tagged union, the repo's asof-join
    # pattern) and emits per-group (dst, partial-sum) rows; exchange 2
    # merges those per bucket_of(dst) into the next rank state.  This
    # is the Pregel/GraphX posture — 2 bucketed exchanges per round —
    # and it has NO vocabulary ceiling: 10^9-node graphs never touch
    # the driver.  The overflow guards move into the tasks: the
    # pre-multiplication bound is checked per edge, and int64 wrap in
    # each accumulation is caught by comparing exact hi/lo Python-int
    # totals of inputs vs outputs (:func:`_exact_sum_nonneg`) inside
    # the same group — together equivalent to the local path's
    # mass-conservation check, with no global vector.
    import ray.data as rd

    limit = np.iinfo(np.int64).max

    # out-weight per node: two-phase aggregate, result STAYS distributed
    def outw_partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "node": batch["a"].to_pandas().astype(str),
                "w": batch["cnt"].to_pandas().astype(np.int64),
            }
        )
        g = df.groupby("node", sort=False, as_index=False)["w"].sum()
        g["_bucket"] = bucket_of(g["node"], num_buckets)
        return g

    def outw_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False, as_index=False)["w"].sum()
        sums = df["w"].to_numpy(np.int64)
        if bool((sums < 0).any()) or _exact_sum_nonneg(
            g["w"].to_numpy(np.int64)
        ) != _exact_sum_nonneg(sums):
            raise OverflowError("pagerank: out-weight sum wrapped int64")
        return g[["node", "w"]]

    # materialize: consumed twice (the eplus tagged union AND the rank
    # init) — lazy, the full out-weight shuffle aggregate would run
    # twice per pagerank call; the result is node-bounded
    outw_ds = (
        edges_ds.map_batches(arrowed(outw_partial), batch_format="pyarrow")
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(outw_final), batch_format="pandas")
        .materialize()
    )

    # enrich edges with outw_a ONCE (loop-invariant): one co-group
    def join_outw(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["side"] == 0]
        o = df[df["side"] == 1]
        m = pd.Series(o["w"].to_numpy(np.int64), index=o["a"].to_numpy())
        wa = e["a"].map(m)
        # symmetric edges: every a appears in the out-weight aggregate
        if wa.isna().any():
            raise ValueError(
                "pagerank: out-weight co-group missed an 'a' endpoint "
                "(non-symmetric or inconsistently bucketed edge list)"
            )
        return pd.DataFrame(
            {
                "a": e["a"],
                "b": e["b"],
                "cnt": e["cnt"].to_numpy(np.int64),
                "outw_a": wa.to_numpy(np.int64),
            }
        )

    tagged0 = edges_ds.map_batches(
        lambda t: _pr_tag_edges(t, num_buckets), batch_format="pyarrow"
    ).union(
        outw_ds.map_batches(
            lambda t: _pr_tag_state(t, num_buckets), batch_format="pyarrow"
        )
    )
    eplus = (
        tagged0.repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(join_outw), batch_format="pandas")
        .materialize()
    )

    import ray

    seeds_ref = (
        ray.put(np.sort(np.asarray(list(seeds), dtype=str)))
        if seeds is not None
        else None
    )

    # rank state: (node, w=rank) — initialized from the node universe
    def init_ranks(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if seeds_ref is None:
            r = np.full(n, PAGERANK_SCALE, dtype=np.int64)
        else:
            sd = ray.get(seeds_ref)
            node = batch["node"].to_numpy(zero_copy_only=False).astype(str)
            r = np.where(np.isin(node, sd), PAGERANK_SCALE, 0).astype(
                np.int64
            )
        return pa.table(
            {
                "node": batch["node"].cast(pa.string()),
                "w": pa.array(r, pa.int64()),
            }
        )

    ranks_ds = outw_ds.map_batches(
        init_ranks, batch_format="pyarrow"
    ).materialize()

    def contrib_group(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["side"] == 0]
        r = df[df["side"] == 1]
        if len(e) == 0:
            return pd.DataFrame(
                {
                    "dst": pd.Series(dtype=str),
                    "c": pd.Series(dtype=np.int64),
                    "_bucket": pd.Series(dtype=np.int32),
                }
            )
        # tagged convention: edge rows (side 0) carry outw_a in "w";
        # state rows (side 1) carry the rank in "w"
        rm = pd.Series(r["w"].to_numpy(np.int64), index=r["a"].to_numpy())
        ra_s = e["a"].map(rm)
        if ra_s.isna().any():
            raise ValueError(
                "pagerank requires a SYMMETRIC edge list (every node "
                "must appear as an 'a' endpoint)"
            )
        ra = ra_s.to_numpy(np.int64)
        wa = e["w"].to_numpy(np.int64)
        cnt = e["cnt"].to_numpy(np.int64)
        # pre-multiplication guard, per edge (w(u,v) <= W(u) makes the
        # per-node local check and this per-edge check the same bound)
        if bool((ra > limit // np.maximum(wa, 1)).any()):
            raise OverflowError(
                "pagerank: rank * edge-weight would overflow int64; "
                "lower PAGERANK_SCALE or pre-scale edge weights"
            )
        c = (ra * cnt) // wa
        g = (
            pd.DataFrame({"dst": e["b"].to_numpy(), "c": c})
            .groupby("dst", sort=False, as_index=False)["c"]
            .sum()
        )
        gc = g["c"].to_numpy(np.int64)
        if bool((gc < 0).any()) or _exact_sum_nonneg(gc) != _exact_sum_nonneg(c):
            raise OverflowError(
                "pagerank: contribution accumulation wrapped int64; "
                "lower PAGERANK_SCALE"
            )
        g["_bucket"] = bucket_of(
            pd.Series(g["dst"]).astype(str), num_buckets
        ).astype(np.int32)
        return g

    def rank_update(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("dst", sort=False, as_index=False)["c"].sum()
        gc = g["c"].to_numpy(np.int64)
        cin = df["c"].to_numpy(np.int64)
        if bool((gc < 0).any()) or _exact_sum_nonneg(gc) != _exact_sum_nonneg(
            cin
        ):
            raise OverflowError(
                "pagerank: contribution accumulation wrapped int64; "
                "lower PAGERANK_SCALE"
            )
        if len(gc) and int(gc.max()) > limit // PAGERANK_DAMP_NUM:
            raise OverflowError(
                "pagerank: damping product would overflow int64; "
                "lower PAGERANK_SCALE"
            )
        if seeds_ref is None:
            tele = teleport
        else:
            sd = ray.get(seeds_ref)
            tele = np.where(
                np.isin(g["dst"].to_numpy(dtype=object).astype(str), sd),
                teleport,
                0,
            ).astype(np.int64)
        rank = tele + (gc * PAGERANK_DAMP_NUM) // PAGERANK_DAMP_DEN
        return pd.DataFrame({"node": g["dst"].to_numpy(), "w": rank})

    for _ in range(n_iters):
        tagged = eplus.map_batches(
            lambda t: _pr_tag_edges(t, num_buckets, w_col="outw_a"),
            batch_format="pyarrow",
        ).union(
            ranks_ds.map_batches(
                lambda t: _pr_tag_state(t, num_buckets),
                batch_format="pyarrow",
            )
        )

        partials = (
            tagged.repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(arrowed(contrib_group), batch_format="pandas")
        )
        ranks_ds = (
            partials.repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(arrowed(rank_update), batch_format="pandas")
            .materialize()
        )

    def to_out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"].cast(pa.string()),
                "rank_int": batch["w"].cast(pa.int64()),
            }
        )

    return ranks_ds.map_batches(to_out, batch_format="pyarrow").sort("node")


def min_k_nodes(edges_ds, k: int) -> List[str]:
    """The ``k`` lexicographically smallest nodes of a symmetric edge
    list — the repo's deterministic seed-set convention (BFS layers,
    personalized PageRank).  Two-phase global min-k: per-batch ``k``
    smallest, one single-group merge; the driver receives ``k``
    strings, bounded by the caller's ask, not the node count."""

    def node_partial(batch: pa.Table) -> pa.Table:
        vals = np.unique(
            np.concatenate(
                [
                    batch["a"].to_numpy(zero_copy_only=False).astype(str),
                    batch["b"].to_numpy(zero_copy_only=False).astype(str),
                ]
            )
        )
        # typed ARROW output (empty-object-column estimator-spam rule)
        return pa.table(
            {
                "node": pa.array(vals[:k], pa.string()),
                "_g": pa.array([0] * min(k, len(vals)), pa.int32()),
            }
        )

    def node_final(df: pd.DataFrame) -> pd.DataFrame:
        return df[["node"]].drop_duplicates().sort_values("node").head(k)

    return (
        edges_ds.map_batches(node_partial, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(arrowed(node_final), batch_format="pandas")
        .to_pandas()["node"]
        .tolist()
    )


def _local_sssp(
    edf: pd.DataFrame, seeds: Sequence[str], n_rounds: int
) -> pd.DataFrame:
    """Single-task multi-source Bellman-Ford, arithmetic-identical to
    the distributed rounds: dist = min hop-cost sum (edge weight =
    cnt) from the seed set within ``n_rounds`` relaxations."""
    nodes, inv = np.unique(
        np.concatenate(
            [
                edf["a"].to_numpy(dtype=object).astype(str),
                edf["b"].to_numpy(dtype=object).astype(str),
            ]
        ),
        return_inverse=True,
    )
    src = inv[: len(edf)]
    dst = inv[len(edf):]
    w = edf["cnt"].to_numpy(np.int64)
    INF = np.iinfo(np.int64).max
    dist = np.full(len(nodes), INF, dtype=np.int64)
    dist[np.isin(nodes, np.asarray(list(seeds), dtype=str))] = 0
    for _ in range(n_rounds):
        reach = dist[src] != INF
        cand_dst = dst[reach]
        cand_d = dist[src[reach]] + w[reach]
        new = dist.copy()
        np.minimum.at(new, cand_dst, cand_d)
        if (new == dist).all():
            break
        dist = new
    keep = dist != INF
    return pd.DataFrame({"node": nodes[keep], "dist": dist[keep]})


def shortest_paths(
    edges_ds,
    n_seeds: int = 2,
    n_rounds: int = 8,
    num_buckets: Optional[int] = None,
    local_threshold: int = 4_000_000,
):
    """Multi-source WEIGHTED shortest paths over the symmetric edge
    list (edge cost = ``cnt``): ``(node, dist)`` — minimum cost from
    the seed set (:func:`min_k_nodes` convention) for every node
    reachable within ``n_rounds`` Bellman-Ford relaxations.  The round
    cap is part of the operator contract (the BFS/k-core posture,
    mirrored by the oracle's unrolled rounds); converging earlier makes
    the remaining rounds no-ops, so the output is exact whenever the
    cost-diameter fits the budget.

    Distributed shape (the :func:`pagerank` posture): the reached
    (node, dist) state is a hash-bucketed DATASET advanced by two
    tagged-union exchanges per round (state co-group on the source
    endpoint emitting per-group candidate minima, then a min-merge on
    the destination).  Convergence is detected from two scalars —
    state row count and exact dist total (:func:`_exact_sum_nonneg`):
    a relaxation strictly lowers some dist or adds a row, so the
    (count, total) pair is unchanged iff the state is a fixpoint.  No
    driver-resident node structures."""
    import ray.data as rd

    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.materialize()
    _check_symmetric(edges, num_buckets)
    if edges.count() <= local_threshold:
        # seeds from the in-process frame: the distributed min-k pass
        # would add a fixed map+groupby job the local path exists to
        # avoid (the bfs_layers precedent)
        edf = edges.to_pandas()
        seeds = sorted(
            np.unique(edf["a"].to_numpy(dtype=object).astype(str))
        )[:n_seeds]
        out = _local_sssp(edf, seeds, n_rounds)
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(
                        out["node"].to_numpy(dtype=object).astype(str),
                        pa.string(),
                    ),
                    "dist": pa.array(
                        out["dist"].to_numpy(np.int64), pa.int64()
                    ),
                }
            )
        )

    seeds = min_k_nodes(edges, n_seeds)

    # tagged union reuses the pagerank machinery (_PR_TAG_SCHEMA):
    # edge rows keep (a, b, cnt); state rows map node -> 'a' and the
    # distance into the shared int64 value column 'w'
    def relax_group(df: pd.DataFrame) -> pd.DataFrame:
        """Candidates dist(u)+w for edges whose source is reached,
        pre-minimized per destination inside the group.  INNER merge,
        not Series.map: a map with misses (unreached sources) would
        round-trip int64 distances through float64 and silently round
        values >= 2^53."""
        e = df[df["side"] == 0]
        s = df[df["side"] == 1]
        empty = pd.DataFrame(
            {
                "node": pd.Series(dtype=str),
                "w": pd.Series(dtype=np.int64),
                "_bucket": pd.Series(dtype=np.int32),
            }
        )
        if len(e) == 0 or len(s) == 0:
            return empty
        cand = e[["a", "b", "cnt"]].merge(
            s[["a", "w"]].rename(columns={"w": "du"}), on="a", how="inner"
        )
        if len(cand) == 0:
            return empty
        cand = pd.DataFrame(
            {
                "node": cand["b"].to_numpy(),
                "w": cand["du"].to_numpy(np.int64)
                + cand["cnt"].to_numpy(np.int64),
            }
        )
        g = cand.groupby("node", sort=False, as_index=False)["w"].min()
        g["_bucket"] = bucket_of(
            pd.Series(g["node"]).astype(str), num_buckets
        ).astype(np.int32)
        return g

    def min_merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False, as_index=False)["w"].min()
        return g[["node", "w"]]

    # state (node, w=dist) — the pagerank state shape, so the shared
    # _pr_tag_state / _pr_tag_edges tagging applies unchanged
    state = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(seeds, pa.string()),
                "w": pa.array([0] * len(seeds), pa.int64()),
            }
        )
    ).materialize()

    def _sig(ds) -> tuple:
        """(row count, exact dist total) — the fixpoint signature."""
        def parts(batch: pa.Table) -> pa.Table:
            v = batch["w"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "hi": pa.array(
                        [int((v >> 32).sum())], pa.int64()
                    ),
                    "lo": pa.array(
                        [int((v & 0xFFFFFFFF).sum())], pa.int64()
                    ),
                    "n": pa.array([len(v)], pa.int64()),
                }
            )

        agg = ds.map_batches(parts, batch_format="pyarrow").to_pandas()
        return (
            int(agg["n"].sum()),
            (int(agg["hi"].sum()) << 32) + int(agg["lo"].sum()),
        )

    sig = _sig(state)
    for _ in range(n_rounds):
        cand = (
            edges.map_batches(
                lambda t: _pr_tag_edges(t, num_buckets),
                batch_format="pyarrow",
            )
            .union(
                state.map_batches(
                    lambda t: _pr_tag_state(t, num_buckets),
                    batch_format="pyarrow",
                )
            )
            .repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(arrowed(relax_group), batch_format="pandas")
        )
        # min-merge candidates WITH the previous state
        merged_in = cand.union(
            state.map_batches(
                lambda t: pa.table(
                    {
                        "node": t["node"].cast(pa.string()),
                        "w": t["w"].cast(pa.int64()),
                        "_bucket": pa.array(
                            bucket_of(
                                pd.Series(
                                    t["node"].to_numpy(
                                        zero_copy_only=False
                                    )
                                ).astype(str),
                                num_buckets,
                            ),
                            pa.int32(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        state = (
            merged_in.repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(arrowed(min_merge), batch_format="pandas")
            .materialize()
        )
        nxt = _sig(state)
        if nxt == sig:  # count+total unchanged == fixpoint
            break
        sig = nxt

    def to_out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"].cast(pa.string()),
                "dist": batch["w"].cast(pa.int64()),
            }
        )

    return state.map_batches(to_out, batch_format="pyarrow").sort("node")


# --- distributed dense-id assignment + deterministic random walks ---------

# next-hop hash mixing constants (see _walk_hash); primes well under
# 2^31 so the pre-LCG mix stays BIGINT-safe in the SQL oracle too
WALK_K1, WALK_K2 = 131071, 8191
_WALK_MOD = 2**31


def _walk_hash(u: np.ndarray, step: int, v: np.ndarray) -> np.ndarray:
    """Deterministic per-(walk-position, candidate) draw: an LCG over a
    small-prime mix of (current id, step, neighbor id), fully
    int-exact and BIGINT-expressible (inner mod BEFORE the multiply
    keeps every product < 2^62 — the oracle-parity int64 rule)."""
    from .balance import LCG_INC, LCG_MULT

    raw = (
        u.astype(np.uint64) * np.uint64(WALK_K1)
        + np.uint64(step) * np.uint64(WALK_K2)
        + v.astype(np.uint64)
    ) % np.uint64(_WALK_MOD)
    return (
        (raw * np.uint64(LCG_MULT) + np.uint64(LCG_INC))
        % np.uint64(_WALK_MOD)
    ).astype(np.int64)


def dense_node_ids(edges_ds, num_buckets: Optional[int] = None):
    """Distributed zip-with-rank over the node universe: ``(node, id)``
    where ``id`` is the node's 0-based rank in global STRING order —
    the sort/rank-join dense-id assignment (VERDICT r3 fix shape), no
    driver-resident node map.

    Shape: (1) two-phase distinct over the ``a`` endpoints (symmetric
    edges cover every node); (2) RANGE boundaries from a bounded
    per-block sample — the driver holds ``num_buckets`` boundary
    strings, nothing node-scaled; (3) one exchange counts each range
    (sizes -> driver, ``num_buckets`` ints -> cumulative offsets);
    (4) one exchange sorts within each range and assigns
    ``offset[range] + local_rank``.  searchsorted on sorted boundaries
    + within-range sort == global string order, so the ids equal SQL's
    ``row_number() OVER (ORDER BY node) - 1`` (binary UTF-8 collation
    == code-point order == Python string order)."""
    import ray
    import ray.data as rd

    num_buckets = resolve_parallelism(num_buckets)

    def distinct_partial(batch: pa.Table) -> pd.DataFrame:
        vals = np.unique(
            batch["a"].to_numpy(zero_copy_only=False).astype(str)
        )
        return pd.DataFrame(
            {
                "node": vals,
                "_bucket": bucket_of(
                    pd.Series(vals, dtype=object), num_buckets
                ).astype(np.int32),
            }
        )

    def distinct_final(df: pd.DataFrame) -> pd.DataFrame:
        return df[["node"]].drop_duplicates()

    nodes = (
        edges_ds.map_batches(
            arrowed(distinct_partial), batch_format="pyarrow"
        )
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(distinct_final), batch_format="pandas")
        .materialize()
    )

    # range boundaries from a bounded sample: ~32 hash-spread nodes per
    # block (not a prefix — blocks may be value-clustered)
    def sample_block(batch: pa.Table) -> pd.DataFrame:
        v = pd.Series(
            batch["node"].to_numpy(zero_copy_only=False)
        ).astype(str)
        h = np.asarray(bucket_of(v, 2**31 - 1))
        take = v.iloc[np.argsort(h, kind="stable")[:32]]
        return pd.DataFrame({"node": take.to_numpy()})

    sample = np.sort(
        nodes.map_batches(arrowed(sample_block), batch_format="pyarrow")
        .to_pandas()["node"]
        .to_numpy(dtype=object)
        .astype(str)
    )
    if len(sample) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "id": pa.array([], pa.int64()),
                }
            )
        )
    q = np.linspace(0, len(sample) - 1, num_buckets + 1)[1:-1]
    bounds = np.unique(sample[q.astype(np.int64)])
    bounds_ref = ray.put(bounds)

    def to_range(batch: pa.Table) -> pd.DataFrame:
        b = ray.get(bounds_ref)
        v = pd.Series(
            batch["node"].to_numpy(zero_copy_only=False)
        ).astype(str)
        rng = np.searchsorted(b, v.to_numpy(dtype=object), side="right")
        return pd.DataFrame(
            {"node": v.to_numpy(), "_bucket": rng.astype(np.int32)}
        )

    ranged = nodes.map_batches(
        arrowed(to_range), batch_format="pyarrow"
    ).materialize()

    def range_count(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "rng": [np.int32(df["_bucket"].iloc[0])],
                "n": [np.int64(len(df))],
            }
        )

    counts = (
        ranged.groupby("_bucket")
        .map_groups(arrowed(range_count), batch_format="pandas")
        .to_pandas()  # num_buckets rows — bounded by parallelism
        .sort_values("rng")
    )
    offsets = dict(
        zip(
            counts["rng"].tolist(),
            (counts["n"].cumsum() - counts["n"]).tolist(),
        )
    )
    off_ref = ray.put(offsets)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)[int(df["_bucket"].iloc[0])]
        v = np.sort(df["node"].to_numpy(dtype=object).astype(str))
        return pd.DataFrame(
            {
                "node": v,
                "id": off + np.arange(len(v), dtype=np.int64),
            }
        )

    return ranged.groupby("_bucket").map_groups(
        arrowed(assign), batch_format="pandas"
    )


def _local_random_walks(
    edf: pd.DataFrame, ids: pd.DataFrame, n_steps: int
) -> pd.DataFrame:
    """Single-task walk kernel, arithmetic-identical to the distributed
    rounds: one walk per node, next hop = the neighbor minimizing
    :func:`_walk_hash` (ties: smallest neighbor id)."""
    idm = pd.Series(
        ids["id"].to_numpy(np.int64), index=ids["node"].to_numpy()
    )
    a = edf["a"].astype(str).map(idm).to_numpy(np.int64)
    b = edf["b"].astype(str).map(idm).to_numpy(np.int64)
    n = len(idm)
    cur = np.arange(n, dtype=np.int64)
    walks = np.arange(n, dtype=np.int64)
    out_w = [walks.copy()]
    out_s = [np.zeros(n, dtype=np.int64)]
    out_n = [cur.copy()]
    order = np.argsort(a, kind="stable")
    a_s, b_s = a[order], b[order]
    # loud precondition (ADVICE r4): the per-step a2[firsts] pick is
    # only the correct group head when EVERY node id has >= 1
    # out-edge — guaranteed by a symmetric edge list, silently wrong
    # (another node's neighbor) or IndexError otherwise.  a2 is a
    # permutation of a_s every step, so checking a_s once suffices.
    firsts0 = np.searchsorted(a_s, np.arange(n))
    if (firsts0 >= len(a_s)).any() or not (
        a_s[np.minimum(firsts0, len(a_s) - 1)] == np.arange(n)
    ).all():
        raise ValueError(
            "random_walks requires a SYMMETRIC edge list (every node "
            "must have an out-edge); pass "
            "cooccur_edges(..., symmetric=True)"
        )
    for s in range(1, n_steps + 1):
        # the successor is a function of the NODE (walks at the same
        # node take the same hop), so compute succ[] once per step:
        # sort every edge by (a, hash, b) and take each a-group's head
        h = _walk_hash(a_s, s, b_s)
        o2 = np.lexsort((b_s, h, a_s))
        a2, b2 = a_s[o2], b_s[o2]
        firsts = np.searchsorted(a2, np.arange(n))
        # symmetric edges: every node has >= 1 out-edge, so firsts is
        # in-range and a2[firsts] == arange(n)
        succ = b2[firsts]
        cur = succ[cur]
        out_w.append(walks.copy())
        out_s.append(np.full(n, s, dtype=np.int64))
        out_n.append(cur.copy())
    return pd.DataFrame(
        {
            "walk": np.concatenate(out_w),
            "step": np.concatenate(out_s),
            "node_id": np.concatenate(out_n),
        }
    )


def _local_random_walks_table(batch: pa.Table, n_steps: int) -> pa.Table:
    """Single-task wrapper around :func:`_local_random_walks` taking
    the whole bounded edge list as one Arrow block (the
    ``repartition(1).map_batches`` shape) and emitting the typed walk
    table worker-side."""
    edf = batch.to_pandas()
    nodes = np.unique(edf["a"].to_numpy(dtype=object).astype(str))
    ids = pd.DataFrame(
        {"node": nodes, "id": np.arange(len(nodes), dtype=np.int64)}
    )
    out = _local_random_walks(edf, ids, n_steps)
    return pa.table(
        {
            "walk": pa.array(out["walk"].to_numpy(np.int64)),
            "step": pa.array(out["step"].to_numpy(np.int64)),
            "node_id": pa.array(out["node_id"].to_numpy(np.int64)),
        }
    )


def random_walks(
    edges_ds,
    n_steps: int = 4,
    num_buckets: Optional[int] = None,
    local_edge_threshold: int = 4_000_000,
):
    """Deterministic random-walk corpus over the SYMMETRIC co-mention
    graph — the DeepWalk/node2vec training-data producer for KG
    embeddings, made hash-deterministic so it is SQL-oracle-exact: one
    walk starts at every node, and step ``s`` moves from ``u`` to the
    neighbor ``v`` minimizing :func:`_walk_hash` ``(u, s, v)`` (ties:
    smallest ``v``).  Output ``(walk, step, node_id)`` over the
    :func:`dense_node_ids` id space, steps 0..n_steps.

    Distributed shape (the :func:`pagerank` posture): node ids come
    from the sort/rank-join assignment; the walk-position state
    ``(walk, cur-node)`` is a hash-bucketed Dataset advanced by ONE
    tagged-union co-group per step against the id-enriched edge
    stream; the per-step pick is one vectorized sort inside each
    bucket.  No driver-resident node structures — walk volume AND node
    vocabulary are unbounded.  Hybrid single-task fast path under
    ``local_edge_threshold`` edges, bit-identical."""
    import ray.data as rd

    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.materialize()

    if edges.count() <= local_edge_threshold:
        # single WORKER task (bfs_layers kernel shape, VERDICT r4
        # item 2 — the driver never holds the edge strings): ids
        # computed in-task as the rank of sorted distinct 'a' (==
        # dense_node_ids' global contract — symmetric edges make 'a'
        # cover every node) — the distributed assignment's ~5 fixed
        # Ray stages would dominate a small graph's wall time
        return edges.repartition(1).map_batches(
            lambda t: _local_random_walks_table(t, n_steps),
            batch_format="pyarrow",
            batch_size=None,
        )

    # same precondition as bfs_layers/shortest_paths — the distributed
    # per-step group-head pick AND dense_node_ids' "'a' covers every
    # node" contract both require the symmetric multiset (ADVICE r4)
    _check_symmetric(edges, num_buckets)
    ids_ds = dense_node_ids(edges, num_buckets).materialize()

    _RW_TAG = pa.schema(
        [
            ("side", pa.int8()),
            ("key", pa.string()),  # co-group key: edge 'a' / state cur
            ("b", pa.string()),
            ("b_id", pa.int64()),
            ("walk", pa.int64()),
            ("cur_id", pa.int64()),
            ("_bucket", pa.int32()),
        ]
    )

    def tag_edge_rows(batch: pa.Table) -> pa.Table:
        a = pd.Series(batch["a"].to_numpy(zero_copy_only=False)).astype(str)
        n = len(a)
        return pa.table(
            {
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "key": pa.array(a, pa.string()),
                "b": batch["b"].cast(pa.string()),
                "b_id": batch["b_id"].cast(pa.int64()),
                "walk": pa.array(np.zeros(n, dtype=np.int64)),
                "cur_id": pa.array(np.zeros(n, dtype=np.int64)),
                "_bucket": pa.array(bucket_of(a, num_buckets), pa.int32()),
            },
            schema=_RW_TAG,
        )

    def tag_state(batch: pa.Table) -> pa.Table:
        cur = pd.Series(
            batch["cur"].to_numpy(zero_copy_only=False)
        ).astype(str)
        n = len(cur)
        return pa.table(
            {
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "key": pa.array(cur, pa.string()),
                "b": pa.array([""] * n, pa.string()),
                "b_id": pa.array(np.zeros(n, dtype=np.int64)),
                "walk": batch["walk"].cast(pa.int64()),
                "cur_id": batch["cur_id"].cast(pa.int64()),
                "_bucket": pa.array(bucket_of(cur, num_buckets), pa.int32()),
            },
            schema=_RW_TAG,
        )

    # id-enrich the edges' b endpoint ONCE (loop-invariant): co-group
    # on bucket_of(b) with the id assignment
    def tag_edges_by_b(batch: pa.Table) -> pa.Table:
        b = pd.Series(batch["b"].to_numpy(zero_copy_only=False)).astype(str)
        n = len(b)
        return pa.table(
            {
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "key": pa.array(b, pa.string()),
                "b": batch["a"].cast(pa.string()),  # carry the a side
                "b_id": pa.array(np.zeros(n, dtype=np.int64)),
                "walk": pa.array(np.zeros(n, dtype=np.int64)),
                "cur_id": pa.array(np.zeros(n, dtype=np.int64)),
                "_bucket": pa.array(bucket_of(b, num_buckets), pa.int32()),
            },
            schema=_RW_TAG,
        )

    def tag_ids(batch: pa.Table) -> pa.Table:
        node = pd.Series(
            batch["node"].to_numpy(zero_copy_only=False)
        ).astype(str)
        n = len(node)
        return pa.table(
            {
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "key": pa.array(node, pa.string()),
                "b": pa.array([""] * n, pa.string()),
                "b_id": batch["id"].cast(pa.int64()),
                "walk": pa.array(np.zeros(n, dtype=np.int64)),
                "cur_id": pa.array(np.zeros(n, dtype=np.int64)),
                "_bucket": pa.array(bucket_of(node, num_buckets), pa.int32()),
            },
            schema=_RW_TAG,
        )

    def join_bid(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["side"] == 0]
        m = df[df["side"] == 1]
        if len(e) == 0:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype=str),
                    "b": pd.Series(dtype=str),
                    "b_id": pd.Series(dtype=np.int64),
                }
            )
        im = pd.Series(m["b_id"].to_numpy(np.int64), index=m["key"].to_numpy())
        bid = e["key"].map(im)
        if bid.isna().any():
            raise ValueError(
                "random_walks: id assignment missed a node (asymmetric "
                "edge list?)"
            )
        # 'b' column carried the a side through the tag
        return pd.DataFrame(
            {
                "a": e["b"].to_numpy(),
                "b": e["key"].to_numpy(),
                "b_id": bid.to_numpy(np.int64),
            }
        )

    eplus = (
        edges.map_batches(tag_edges_by_b, batch_format="pyarrow")
        .union(ids_ds.map_batches(tag_ids, batch_format="pyarrow"))
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(join_bid), batch_format="pandas")
        .materialize()
    )

    def init_state(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "walk": batch["id"].cast(pa.int64()),
                "cur": batch["node"].cast(pa.string()),
                "cur_id": batch["id"].cast(pa.int64()),
            }
        )

    state = ids_ds.map_batches(init_state, batch_format="pyarrow").materialize()

    def emit(batch: pa.Table, step: int) -> pa.Table:
        return pa.table(
            {
                "walk": batch["walk"].cast(pa.int64()),
                "step": pa.array(
                    np.full(len(batch), step, dtype=np.int64)
                ),
                "node_id": batch["cur_id"].cast(pa.int64()),
            }
        )

    outputs = [
        state.map_batches(
            lambda t: emit(t, 0), batch_format="pyarrow"
        ).materialize()
    ]
    for s in range(1, n_steps + 1):
        def step_group(df: pd.DataFrame, _s=s) -> pd.DataFrame:
            e = df[df["side"] == 0]
            st = df[df["side"] == 1]
            if len(st) == 0:
                return pd.DataFrame(
                    {
                        "walk": pd.Series(dtype=np.int64),
                        "cur": pd.Series(dtype=str),
                        "cur_id": pd.Series(dtype=np.int64),
                    }
                )
            if len(e) == 0:
                raise ValueError(
                    "random_walks: walk position has no out-edges "
                    "(asymmetric edge list?)"
                )
            # merge walks with their current node's neighbor list and
            # pick argmin hash per walk — one vectorized sort
            m = st[["walk", "key", "cur_id"]].merge(
                e[["key", "b", "b_id"]], on="key", how="left"
            )
            if m["b_id"].isna().any():
                raise ValueError(
                    "random_walks: walk position has no out-edges "
                    "(asymmetric edge list?)"
                )
            u = m["cur_id"].to_numpy(np.int64)
            v = m["b_id"].to_numpy(np.int64)
            h = _walk_hash(u, _s, v)
            m = m.assign(_h=h)
            m = m.sort_values(
                ["walk", "_h", "b_id"], kind="stable"
            ).groupby("walk", sort=False).head(1)
            return pd.DataFrame(
                {
                    "walk": m["walk"].to_numpy(np.int64),
                    "cur": m["b"].to_numpy(),
                    "cur_id": m["b_id"].to_numpy(np.int64),
                }
            )

        tagged = eplus.map_batches(
            tag_edge_rows, batch_format="pyarrow"
        ).union(state.map_batches(tag_state, batch_format="pyarrow"))
        state = (
            tagged.repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(arrowed(step_group), batch_format="pandas")
            .materialize()
        )
        outputs.append(
            state.map_batches(
                lambda t, _s=s: emit(t, _s), batch_format="pyarrow"
            ).materialize()
        )

    out = outputs[0]
    for extra in outputs[1:]:
        out = out.union(extra)
    return out


def neighbor_topk(
    edges_ds,
    k: int = 3,
    num_buckets: Optional[int] = None,
):
    """Per-entity top-k co-mentioned neighbors: (node, rank, neighbor,
    cnt) with deterministic ordering (cnt desc, neighbor asc).  Input
    is the SYMMETRIC edge list so every node ranks all its neighbors.
    """
    num_buckets = resolve_parallelism(num_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of(
            pd.Series(batch["a"].to_pandas().astype(str)), num_buckets
        )
        return batch.append_column(
            "_bucket", pa.array(b, pa.int32())
        ).replace_schema_metadata(None)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["a", "cnt", "b"], ascending=[True, False, True], kind="stable"
        )
        top = df.groupby("a", sort=False).head(k).copy()
        top["rank"] = top.groupby("a", sort=False).cumcount() + 1
        out = top.rename(columns={"a": "node", "b": "neighbor"})[
            ["node", "rank", "neighbor", "cnt"]
        ]
        out["rank"] = out["rank"].astype(np.int64)
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    return (
        edges_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(arrowed(topk), batch_format="pandas")
    )


def neighbor_sample(
    edges_ds,
    k: int = 5,
    num_buckets: Optional[int] = None,
):
    """GNN minibatch fanout sampling (GraphSAGE §3.1): per node, an
    UNBIASED deterministic sample of at most ``k`` neighbors — ordered
    by ``(md5(node || ':' || neighbor), neighbor)``, so the draw is a
    pure function of the edge (partition-independent, identical on
    every worker and re-run, and computable in SQL: DuckDB
    ``row_number() OVER (PARTITION BY a ORDER BY md5(...), b)``).
    Unlike :func:`neighbor_topk` (cnt-ranked, biased toward heavy
    ties) this is the uniform-without-replacement draw a GraphSAGE
    trainer consumes; re-salting the hash string yields fresh epochs.

    Input is the SYMMETRIC edge list; output ``(node, rank,
    neighbor)``.  One node-bucketed exchange, per-group hash ordering
    — no global sort, no broadcast.
    """
    import hashlib

    num_buckets = resolve_parallelism(num_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of(
            pd.Series(batch["a"].to_pandas().astype(str)), num_buckets
        )
        return batch.append_column(
            "_bucket", pa.array(b, pa.int32())
        ).replace_schema_metadata(None)

    def sample(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(dtype=object)
        b = df["b"].to_numpy(dtype=object)
        key = np.fromiter(
            (
                hashlib.md5(f"{x}:{y}".encode("utf-8")).hexdigest()
                for x, y in zip(a, b)
            ),
            dtype="U32",
            count=len(df),
        )
        order = np.lexsort((b.astype(str), key, a.astype(str)))
        s = df.iloc[order]
        top = s.groupby("a", sort=False).head(k).copy()
        top["rank"] = (top.groupby("a", sort=False).cumcount() + 1).astype(
            np.int64
        )
        return top.rename(columns={"a": "node", "b": "neighbor"})[
            ["node", "rank", "neighbor"]
        ]

    return (
        edges_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(arrowed(sample), batch_format="pandas")
    )


def _blake2b_ids(values: np.ndarray) -> np.ndarray:
    """Collision-safe 63-bit node ids over UNIQUE surface forms (the
    factorize-over-uniques pattern of stages/triples.py): blake2b is
    version/platform-independent, unlike pandas' siphash, so the same
    entity maps to the same id on every worker of a heterogeneous
    cluster.  The top bit is cleared to stay nonnegative in int64."""
    import hashlib

    uniq, inv = np.unique(values.astype(str), return_inverse=True)
    ids = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(u.encode("utf-8"), digest_size=8).digest(),
                "big",
            )
            >> 1
            for u in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )
    return ids[inv]


def _local_components(batch: pa.Table) -> pa.Table:
    """Single-task components over one string-edge block: factorize
    surface forms (np.unique is SORTED, so code order == lexicographic
    order and the min-code root IS the min-string label), then the
    dedup engine's vectorized min-label propagation."""
    from .dedup import _local_cc

    a = batch["a"].to_numpy(zero_copy_only=False).astype(str)
    b = batch["b"].to_numpy(zero_copy_only=False).astype(str)
    if len(a) == 0:
        return pa.table(
            {"entity": pa.array([], pa.string()),
             "component": pa.array([], pa.string())}
        )
    uniq, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    res = _local_cc(
        pa.table(
            {
                "u": pa.array(inv[: len(a)].astype(np.int64)),
                "v": pa.array(inv[len(a):].astype(np.int64)),
            }
        )
    )
    ent = uniq[res["doc_id"].to_numpy()]
    comp = uniq[res["cluster_id"].to_numpy()]
    return pa.table(
        {
            "entity": pa.array(ent, pa.string()),
            "component": pa.array(comp, pa.string()),
        }
    )


def kg_components(
    edges_ds,
    num_buckets: Optional[int] = None,
    local_threshold: int = 4_000_000,
):
    """Connected components over the a<b co-mention edge list:
    ``(entity, component)`` where ``component`` is the component's
    lexicographic-min member — the entity-cluster primitive (which
    places/organs form one connected context group).

    Reuses the dedup engine's large/small-star contraction
    (stages/dedup.connected_components) by mapping surface forms to
    63-bit blake2b ids; the hash only routes the contraction — the
    OUTPUT is re-labelled to the min STRING per component with two
    bucketed merges, so results are hash-independent (a collision has
    ~n²/2⁶⁴ odds and would merge two clusters, never crash).

    Exchanges: the CC rounds (edge-bounded) + one node-id join + one
    per-root relabel; the edge list is materialized ONCE (it is
    pair-bounded, far smaller than the corpus) so the two consumers
    (pair stream, node map) do not re-execute upstream lineage.
    """
    from .dedup import connected_components

    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.materialize()
    if edges.count() <= local_threshold:
        # same hybrid as dedup.connected_components: the edge list is
        # already materialized so the count is free; below the
        # threshold (~64 MB of pairs) ONE task replaces the contraction
        # rounds + two join exchanges — bit-identical output since the
        # sorted factorization makes min-code == min-string.
        # batch_size=None pins whole-block batches (correctness needs
        # the COMPLETE edge set in one call).
        return edges.repartition(1).map_batches(
            _local_components, batch_format="pyarrow", batch_size=None
        )

    def to_pairs(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "i": pa.array(_blake2b_ids(a), pa.int64()),
                "j": pa.array(_blake2b_ids(b), pa.int64()),
            }
        )

    # both union sides carry the SAME (entity, node_id, root_id, _bucket)
    # schema with int64 sentinels (root_id = -1 marks the name side,
    # entity = "" the cc side) — 63-bit ids must never pass through a
    # NaN-bearing float64 column (53-bit mantissa would corrupt them)
    def node_map(batch: pa.Table) -> pd.DataFrame:
        vals = np.unique(
            np.concatenate(
                [
                    batch["a"].to_numpy(zero_copy_only=False).astype(str),
                    batch["b"].to_numpy(zero_copy_only=False).astype(str),
                ]
            )
        )
        df = pd.DataFrame({"entity": vals, "node_id": _blake2b_ids(vals)})
        df["root_id"] = np.int64(-1)
        df["_bucket"] = (df["node_id"] % num_buckets).astype(np.int32)
        return df[["entity", "node_id", "root_id", "_bucket"]]

    cc = connected_components(edges.map_batches(to_pairs, batch_format="pyarrow"))

    def cc_bucket(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df.rename(columns={"doc_id": "node_id", "cluster_id": "root_id"})
        df["entity"] = ""
        df["_bucket"] = (df["node_id"] % num_buckets).astype(np.int32)
        return df[["entity", "node_id", "root_id", "_bucket"]]

    # join (entity -> node_id) with (node_id -> root_id): both sides are
    # node-bounded; co-locate on node_id hash and pd.merge per bucket
    nodes = edges.map_batches(arrowed(node_map), batch_format="pyarrow")
    tagged = nodes.union(
        cc.map_batches(arrowed(cc_bucket), batch_format="pyarrow")
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["root_id"] < 0][["entity", "node_id"]]
        left = left.drop_duplicates("node_id")
        right = df[df["root_id"] >= 0][["node_id", "root_id"]]
        right = right.drop_duplicates("node_id")
        j = left.merge(right, on="node_id", how="inner")
        out = j[["entity", "root_id"]].copy()
        out["root_id"] = out["root_id"].astype(np.int64)
        out["_bucket2"] = (out["root_id"] % 64).astype(np.int32)
        return out

    def relabel(df: pd.DataFrame) -> pd.DataFrame:
        # all members of a root share its bucket; label = min entity
        lab = df.groupby("root_id", sort=False)["entity"].min()
        out = df[["entity", "root_id"]].copy()
        out["component"] = out["root_id"].map(lab)
        return out[["entity", "component"]]

    return (
        tagged.groupby("_bucket")
        .map_groups(arrowed(join_bucket), batch_format="pandas")
        .groupby("_bucket2")
        .map_groups(arrowed(relabel), batch_format="pandas")
    )


def _degree_ds(edges, num_buckets: int):
    """Distributed (node, c) neighbor-count Dataset over an a<b edge
    list — two-phase (per-batch unique counts -> bucketed merge).  The
    state stays in bucketed blocks; downstream consumers co-group with
    it instead of broadcasting a node map (the open-vocabulary
    posture).  Shared by triangle_counts, edge_jaccard and
    clustering_coefficient."""

    def deg_partial(batch: pa.Table) -> pd.DataFrame:
        ab = np.concatenate(
            [
                batch["a"].to_numpy(zero_copy_only=False).astype(str),
                batch["b"].to_numpy(zero_copy_only=False).astype(str),
            ]
        )
        vals, cnt = np.unique(ab, return_counts=True)
        df = pd.DataFrame({"node": vals, "c": cnt.astype(np.int64)})
        df["_bucket"] = bucket_of(df["node"], num_buckets)
        return df

    def deg_merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(
            ["node", "_bucket"], sort=False, as_index=False
        )["c"].sum()
        g["c"] = g["c"].astype(np.int64)
        # _bucket rides along so consumers' taggers reuse it instead of
        # re-hashing the node vocabulary per exchange
        return g[["node", "c", "_bucket"]]

    return (
        edges.map_batches(arrowed(deg_partial), batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(arrowed(deg_merge), batch_format="pandas")
        # consumed by 2+ union branches per caller (Ray has no
        # cross-branch plan dedup — without pinning, the full edge scan
        # + merge would run once per branch)
        .materialize()
    )


def degree_histogram(edges_ds, num_buckets: Optional[int] = None):
    """KG health-check readout: the co-mention degree DISTRIBUTION
    ``(degree, n_nodes)`` — the power-law-tail summary a graph report
    prints next to clustering/kcore (hub inflation after a bad
    extractor release shows up here first).  Input is the a<b pair
    list; output cardinality is bounded by max degree.

    Shape: the shared :func:`_degree_ds` aggregate (two-phase) plus
    one degree-keyed count merge — wire carries one row per
    (bucket, degree)."""
    num_buckets = resolve_parallelism(num_buckets)
    # no edges materialize: unlike the wedge ops, this is the edge
    # list's ONLY consumption (only deg itself is reused downstream,
    # and _degree_ds pins that)
    deg = _degree_ds(edges_ds, num_buckets)

    def partial(batch: pa.Table) -> pd.DataFrame:
        vals, cnt = np.unique(batch["c"].to_numpy(), return_counts=True)
        return pd.DataFrame(
            {
                "degree": vals.astype(np.int64),
                "n_nodes": cnt.astype(np.int64),
                "_b2": (vals % num_buckets).astype(np.int32),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("degree", sort=False, as_index=False)["n_nodes"].sum()
        g["n_nodes"] = g["n_nodes"].astype(np.int64)
        return g

    return (
        deg.map_batches(arrowed(partial), batch_format="pyarrow")
        .groupby("_b2")
        .map_groups(arrowed(merge), batch_format="pandas")
    )


# tagged union schema for every degree-state exchange: side-0 rows carry
# an operator-specific (key, other, d) payload; side-1 rows are the
# degree state (key = node, d = c) — one schema, one tagger, shared by
# the wedge orientation, link_predict's hub cap and clustering's attach
_DEG_TAG = pa.schema(
    [
        ("side", pa.int8()),
        ("key", pa.string()),
        ("other", pa.string()),
        ("d", pa.int64()),
        ("_bucket", pa.int32()),
    ]
)


def _tag_deg_state(batch: pa.Table) -> pa.Table:
    """Degree-state rows (node, c, _bucket) -> side-1 _DEG_TAG rows,
    reusing the bucket :func:`_degree_ds` already computed."""
    n = len(batch)
    return pa.table(
        {
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "key": batch["node"].cast(pa.string()),
            "other": pa.array([""] * n, pa.string()),
            "d": batch["c"].cast(pa.int64()),
            "_bucket": batch["_bucket"].cast(pa.int32()),
        },
        schema=_DEG_TAG,
    )


def _oriented_stream(edges, deg_ds, num_buckets: int):
    """Degree-ordered oriented edges ``(lo, hi, dlo, dhi)`` — every
    edge points from its lower-(degree, name) endpoint to the higher —
    built with TWO tagged co-group exchanges that attach each
    endpoint's degree from the bucketed degree state.  No broadcast
    node map: orientation only needs to COMPARE the two endpoints'
    (degree, name) pairs, which is edge-local once both degrees ride
    the row.  The (degree, name) comparison reproduces exactly the
    global degree-rank order the classic construction sorts by."""

    def tag_edge_a(batch: pa.Table) -> pa.Table:
        a = pd.Series(batch["a"].to_numpy(zero_copy_only=False)).astype(str)
        n = len(a)
        return pa.table(
            {
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "key": pa.array(a, pa.string()),
                "other": batch["b"].cast(pa.string()),
                "d": pa.array(np.zeros(n, dtype=np.int64)),
                "_bucket": pa.array(bucket_of(a, num_buckets), pa.int32()),
            },
            schema=_DEG_TAG,
        )

    def attach_a(df: pd.DataFrame) -> pd.DataFrame:
        """Join deg onto the 'a' endpoint; re-key by 'b' (inner merge —
        a Series.map with misses would float64-round int64 degrees)."""
        e = df[df["side"] == 0]
        s = df[df["side"] == 1]
        if len(e) == 0 or len(s) == 0:
            return pd.DataFrame(
                {
                    "key": pd.Series(dtype=str),
                    "other": pd.Series(dtype=str),
                    "d": pd.Series(dtype=np.int64),
                    "_bucket": pd.Series(dtype=np.int32),
                }
            )
        m = e[["key", "other"]].merge(
            s[["key", "d"]], on="key", how="inner"
        )
        b = m["other"].to_numpy(dtype=object)
        return pd.DataFrame(
            {
                "key": b,  # next exchange joins on the b endpoint
                "other": m["key"].to_numpy(dtype=object),
                "d": m["d"].to_numpy(np.int64),  # = deg(a), carried
                "_bucket": bucket_of(
                    pd.Series(b, dtype=object).astype(str), num_buckets
                ).astype(np.int32),
            }
        )

    def attach_b_orient(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["side"] == 0]
        s = df[df["side"] == 1]
        if len(e) == 0 or len(s) == 0:
            return pd.DataFrame(
                {
                    "lo": pd.Series(dtype=str),
                    "hi": pd.Series(dtype=str),
                    "dlo": pd.Series(dtype=np.int64),
                    "dhi": pd.Series(dtype=np.int64),
                    "_bucket": pd.Series(dtype=np.int32),
                }
            )
        m = e[["key", "other", "d"]].merge(
            s[["key", "d"]].rename(columns={"d": "db"}),
            on="key",
            how="inner",
        )
        a = m["other"].to_numpy(dtype=object).astype(str)
        b = m["key"].to_numpy(dtype=object).astype(str)
        da = m["d"].to_numpy(np.int64)
        db = m["db"].to_numpy(np.int64)
        swap = (da > db) | ((da == db) & (a > b))
        lo = np.where(swap, b, a)
        hi = np.where(swap, a, b)
        dlo = np.where(swap, db, da)
        dhi = np.where(swap, da, db)
        out = pd.DataFrame(
            {"lo": lo, "hi": hi, "dlo": dlo, "dhi": dhi}
        ).drop_duplicates(["lo", "hi"])
        out["_bucket"] = bucket_of(
            pd.Series(out["lo"]).astype(str), num_buckets
        ).astype(np.int32)
        return out

    stage1 = (
        edges.map_batches(tag_edge_a, batch_format="pyarrow")
        .union(deg_ds.map_batches(_tag_deg_state, batch_format="pyarrow"))
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(attach_a), batch_format="pandas")
    )

    def tag_stage1(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "key": batch["key"].cast(pa.string()),
                "other": batch["other"].cast(pa.string()),
                "d": batch["d"].cast(pa.int64()),
                "_bucket": batch["_bucket"].cast(pa.int32()),
            },
            schema=_DEG_TAG,
        )

    return (
        stage1.map_batches(tag_stage1, batch_format="pyarrow")
        .union(deg_ds.map_batches(_tag_deg_state, batch_format="pyarrow"))
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(attach_b_orient), batch_format="pandas")
        .materialize()
    )


def _local_triangles(batch: pa.Table) -> pa.Table:
    """Single-task triangle counts over one complete edge block: the
    same degree-ordered orientation as the distributed path, all-numpy
    (factorize → lexsort rank → size-class wedge emission → np.isin
    edge confirm → bincount corners)."""
    a = batch["a"].to_numpy(zero_copy_only=False).astype(str)
    b = batch["b"].to_numpy(zero_copy_only=False).astype(str)
    if len(a) == 0:
        return pa.table(
            {"entity": pa.array([], pa.string()),
             "n_triangles": pa.array([], pa.int64())}
        )
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    V = np.int64(len(nodes))
    u, v = inv[: len(a)].astype(np.int64), inv[len(a):].astype(np.int64)
    # drop duplicate undirected edges (canonical code order)
    cu, cv = np.minimum(u, v), np.maximum(u, v)
    keys = np.unique(cu * V + cv)
    cu, cv = keys // V, keys % V
    deg = np.bincount(np.concatenate([cu, cv]), minlength=len(nodes))
    # total order (degree, code): rank[order] = position
    order = np.lexsort((np.arange(len(nodes)), deg))
    rank = np.empty(len(nodes), dtype=np.int64)
    rank[order] = np.arange(len(nodes))
    swap = rank[cu] > rank[cv]
    lo = np.where(swap, cv, cu)
    hi = np.where(swap, cu, cv)
    # group out-neighbors per lo, sorted by neighbor rank
    srt = np.lexsort((rank[hi], lo))
    lo, hi = lo[srt], hi[srt]
    new = np.ones(len(lo), dtype=bool)
    new[1:] = lo[1:] != lo[:-1]
    sizes = np.bincount(np.cumsum(new) - 1)
    starts = np.flatnonzero(new)
    n1, n2, g = _pairs_by_size_class(starts, sizes, hi)
    counts = np.zeros(len(nodes), dtype=np.int64)
    if len(n1):
        apex = lo[starts[g]]
        hit = np.isin(n1 * V + n2, lo * V + hi)
        corners = np.concatenate([apex[hit], n1[hit], n2[hit]])
        counts += np.bincount(corners, minlength=len(nodes))
    return pa.table(
        {
            "entity": pa.array(nodes, pa.string()),
            "n_triangles": pa.array(counts, pa.int64()),
        }
    )


def triangle_counts(
    edges_ds,
    num_buckets: Optional[int] = None,
    local_threshold: int = 4_000_000,
    _deg=None,
):
    """Per-entity triangle counts over the a<b co-mention edge list:
    ``(entity, n_triangles)`` for every edge-endpoint node (zeros
    included) — the clustering/community primitive.

    Degree-ordered orientation (the classic O(E^1.5) wedge bound):
    every edge points from its lower-(degree, name) endpoint to the
    higher, so a node's out-neighborhood is bounded by sqrt(E) even at
    head entities; wedges are emitted per apex and confirmed against
    the oriented edge set with one bucketed co-group.  Open-vocabulary
    posture: degrees live in a bucketed Dataset and attach to each
    edge by co-group (:func:`_oriented_stream`) — no broadcast node
    map; edge/wedge streams never gather on the driver.

    Exchanges: degree partial-count (node-bounded) + 2 degree-attach
    co-groups (edge-bounded) + wedge groupby (apex-bucketed) +
    wedge-vs-edge confirm (pair-key-bucketed) + corner count
    (node-bounded).
    """
    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.materialize()
    if edges.count() <= local_threshold:
        # hybrid fast path (same posture as kg_components/_local_cc):
        # below ~64 MB of pairs one task replaces the bounded
        # exchanges; identical output by construction
        return edges.repartition(1).map_batches(
            _local_triangles, batch_format="pyarrow", batch_size=None
        )

    # _deg: callers that already hold the degree Dataset
    # (clustering_coefficient) pass it in so the degree aggregation is
    # not paid twice
    deg_ds = _degree_ds(edges, num_buckets) if _deg is None else _deg
    tagged, _ = _tagged_wedge_stream(edges, deg_ds, num_buckets)

    # -- confirm wedges against the edge set; emit 3 corners ----------
    def confirm(df: pd.DataFrame) -> pd.DataFrame:
        is_e = df["_is_edge"] == 1
        eset = df[is_e][["n1", "n2"]]
        w = df[~is_e]
        tri = w.merge(eset, on=["n1", "n2"], how="inner")
        if len(tri) == 0:
            # typed ARROW empty (size-estimator spam rule)
            return pa.table(
                {"node": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64()),
                 "_bucket3": pa.array([], pa.int32())}
            )
        corners = np.concatenate(
            [
                tri["apex"].to_numpy(dtype=object),
                tri["n1"].to_numpy(dtype=object),
                tri["n2"].to_numpy(dtype=object),
            ]
        )
        vals, cnt = np.unique(corners.astype(str), return_counts=True)
        out = pd.DataFrame({"node": vals, "c": cnt.astype(np.int64)})
        out["_bucket3"] = bucket_of(out["node"], num_buckets)
        return out

    counts = (
        tagged.groupby("_bucket2")
        .map_groups(arrowed(confirm), batch_format="pandas")
    )

    # -- final per-node sum, zeros for triangle-free nodes ------------
    def zeros(batch: pa.Table) -> pd.DataFrame:
        vals = np.unique(
            np.concatenate(
                [
                    batch["a"].to_numpy(zero_copy_only=False).astype(str),
                    batch["b"].to_numpy(zero_copy_only=False).astype(str),
                ]
            )
        )
        df = pd.DataFrame({"node": vals, "c": np.int64(0)})
        df["_bucket3"] = bucket_of(df["node"], num_buckets)
        return df

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False, as_index=False)["c"].sum()
        out = g.rename(columns={"node": "entity", "c": "n_triangles"})
        out["n_triangles"] = out["n_triangles"].astype(np.int64)
        return out[["entity", "n_triangles"]]

    return (
        counts.union(edges.map_batches(arrowed(zeros), batch_format="pyarrow"))
        .groupby("_bucket3")
        .map_groups(arrowed(final), batch_format="pandas")
    )


def _tagged_wedge_stream(edges, deg_ds, num_buckets: int):
    """Degree-ordered wedge/edge union stream over a materialized a<b
    edge Dataset: orient each edge low-(degree, name) -> high via
    :func:`_oriented_stream` (co-group degree attach — no broadcast
    node map), emit per-apex wedges plus the oriented edges themselves
    tagged ``_is_edge``, both bucketed by the (n1, n2) pair key
    (``_bucket2``) so one co-group confirms wedges against edges.
    Shared by :func:`triangle_counts` and :func:`edge_jaccard`.
    Returns ``(tagged, oriented)`` — edge_jaccard derives its
    degree-carrying zero rows from ``oriented``."""
    oriented = _oriented_stream(edges, deg_ds, num_buckets)

    # -- wedges per apex (out-neighbors sorted by (degree, name)) ------
    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        # contiguous (lo, (deg, name)-of-hi)-sorted layout, then the
        # shared size-class kernel — no Python loop over apex nodes;
        # (dhi, hi) reproduces the classic global degree-rank order
        df = df.sort_values(["lo", "dhi", "hi"], kind="stable")
        lo = df["lo"].to_numpy(dtype=object)
        hi = df["hi"].to_numpy(dtype=object)
        n1 = np.array([], dtype=object)
        if len(df):
            new = np.ones(len(df), dtype=bool)
            new[1:] = lo[1:] != lo[:-1]
            sizes = np.bincount(np.cumsum(new) - 1)
            starts = np.flatnonzero(new)
            n1, n2, g = _pairs_by_size_class(starts, sizes, hi)
        if not len(n1):
            # empty ARROW block (see dedup.batch_grams): empty pandas
            # object columns trip Ray's size estimator into log spam
            return pa.table(
                {
                    "n1": pa.array([], pa.string()),
                    "n2": pa.array([], pa.string()),
                    "apex": pa.array([], pa.string()),
                    "_is_edge": pa.array([], pa.int8()),
                    "_bucket2": pa.array([], pa.int32()),
                }
            )
        out = pd.DataFrame(
            {"n1": n1, "n2": n2, "apex": lo[starts[g]]}
        )
        out["_is_edge"] = np.int8(0)
        out["_bucket2"] = bucket_of(
            out["n1"].astype(str) + "\x1f" + out["n2"].astype(str), num_buckets
        )
        return out

    wedge_rows = (
        oriented.groupby("_bucket")
        .map_groups(arrowed(wedges), batch_format="pandas")
    )

    def edge_rows(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["lo", "hi"]).to_pandas()
        out = pd.DataFrame(
            {
                "n1": df["lo"].astype(str),
                "n2": df["hi"].astype(str),
                "apex": "",
            }
        )
        out["_is_edge"] = np.int8(1)
        out["_bucket2"] = bucket_of(
            out["n1"] + "\x1f" + out["n2"], num_buckets
        )
        return out

    tagged = wedge_rows.union(
        oriented.map_batches(arrowed(edge_rows), batch_format="pyarrow")
    )
    return tagged, oriented


# fixed Arrow schema for the LPA tagged (edges ∪ label-state) union:
# like _PR_TAG_SCHEMA but the state value is a STRING label and the
# co-group key is the ``b`` endpoint (the label lookup side)
_LPA_TAG_SCHEMA = pa.schema(
    [
        ("side", pa.int8()),
        ("a", pa.string()),
        ("b", pa.string()),
        ("cnt", pa.int64()),
        ("val", pa.string()),
        ("_bucket", pa.int32()),
    ]
)


def _lpa_pick(df: pd.DataFrame) -> pd.DataFrame:
    """ONE weighted-argmax kernel for both LPA paths (local fast path
    and distributed per-round merge must stay bit-identical): sum w
    per (node, label), then per node keep the max-weight label with
    lexicographic-min ties."""
    g = df.groupby(["node", "label"], sort=False, as_index=False)["w"].sum()
    g = g.sort_values(
        ["node", "w", "label"], ascending=[True, False, True], kind="stable"
    )
    return g.groupby("node", sort=False).head(1)


def _lpa_lookup(b: pd.Series, labels: pd.Series) -> pd.Series:
    """Vectorized previous-round label lookup (C-speed ``Series.map``,
    not a Python loop per edge) with the SYMMETRIC precondition made
    loud: a miss means some ``b`` endpoint never appeared as an ``a``,
    i.e. the caller passed a one-directional edge list."""
    lbl = b.map(labels)
    if lbl.isna().any():
        raise ValueError(
            "label_propagation requires a SYMMETRIC edge list (every "
            "node must appear as an 'a' endpoint); pass "
            "cooccur_edges(..., symmetric=True)"
        )
    return lbl


def label_propagation(
    edges_ds,
    n_rounds: int = 3,
    num_buckets: Optional[int] = None,
    local_edge_threshold: int = 4_000_000,
):
    """Community detection: synchronous label propagation over the
    SYMMETRIC weighted edge list, made fully deterministic — a fixed
    round count, every node updating from the PREVIOUS round's labels,
    new label = the neighbor label with the greatest incident weight
    (ties: lexicographic-min label).  Output ``(entity, community)``.

    Same distribution posture as :func:`pagerank`: the label map is a
    hash-bucketed DATASET (node, label) advanced by bucketed exchanges
    — a tagged-union label co-group on the ``b`` endpoint, then the
    weighted-argmax pick on the node — never a driver-resident Series,
    so the node vocabulary has no ceiling.  Hybrid single-task fast
    path under ``local_edge_threshold`` edges, arithmetic-identical.

    Known property of the synchronous contract (kept because it is
    what makes the result deterministic and oracle-reproducible):
    structures whose heaviest ties are mutual pendant pairs swap
    labels every round (textbook LPA oscillation) — after an odd
    round count such a pair reports each other's initial label.
    Use :func:`kg_components` when transitive-closure communities are
    wanted instead.
    """
    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.materialize()

    def _rounds_local(edf: pd.DataFrame) -> pd.DataFrame:
        a = pd.Series(edf["a"].to_numpy(dtype=object)).astype(str)
        b = pd.Series(edf["b"].to_numpy(dtype=object)).astype(str)
        w = edf["cnt"].to_numpy(np.int64)
        labels = None  # round 1 is the identity map: label(b) == b
        for _ in range(n_rounds):
            lbl = b if labels is None else _lpa_lookup(b, labels)
            top = _lpa_pick(
                pd.DataFrame({"node": a, "label": lbl, "w": w})
            )
            labels = pd.Series(
                top["label"].to_numpy(), index=top["node"].to_numpy()
            )
        out = pd.DataFrame(
            {
                "entity": labels.index.to_numpy(),
                "community": labels.to_numpy(),
            }
        )
        return out.sort_values("entity").reset_index(drop=True)

    if edges.count() <= local_edge_threshold:
        edf = edges.to_pandas()
        import ray.data as rd

        out = _rounds_local(edf)
        return rd.from_arrow(
            pa.table(
                {
                    "entity": pa.array(
                        out["entity"].tolist(), pa.string()
                    ),
                    "community": pa.array(
                        out["community"].tolist(), pa.string()
                    ),
                }
            )
        )

    # ---- open-vocabulary distributed path (VERDICT r3 item 2) -------
    # The label map is a hash-bucketed DATASET (node, label), never a
    # driver Series: each round after the first runs 2 bucketed
    # exchanges — a tagged-union label co-group on bucket_of(b) (the
    # previous round's label lookup as a join) then the weighted-argmax
    # pick on bucket_of(node).  Round 1's labels are the identity map
    # (label(b) == b), and symmetric edges make every node an ``a``,
    # so the first round's pick already covers the complete node set
    # — no node-universe pre-pass, no vocabulary ceiling.

    def pick_groups(df: pd.DataFrame) -> pd.DataFrame:
        return _lpa_pick(df)[["node", "label"]]

    def round1_partial(batch: pa.Table) -> pd.DataFrame:
        a = pd.Series(batch["a"].to_numpy(zero_copy_only=False)).astype(str)
        b = pd.Series(batch["b"].to_numpy(zero_copy_only=False)).astype(str)
        w = batch["cnt"].to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame({"node": a, "label": b, "w": w})
            .groupby(["node", "label"], sort=False, as_index=False)["w"]
            .sum()
        )
        g["w"] = g["w"].astype(np.int64)
        g["_bucket"] = bucket_of(g["node"], num_buckets)
        return g

    def lab_join(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["side"] == 0]
        lab = df[df["side"] == 1]
        if len(e) == 0:
            return pd.DataFrame(
                {
                    "node": pd.Series(dtype=str),
                    "label": pd.Series(dtype=str),
                    "w": pd.Series(dtype=np.int64),
                    "_bucket": pd.Series(dtype=np.int32),
                }
            )
        lm = pd.Series(lab["val"].to_numpy(), index=lab["b"].to_numpy())
        lbl = _lpa_lookup(e["b"], lm)
        g = (
            pd.DataFrame(
                {
                    "node": e["a"].to_numpy(),
                    "label": lbl.to_numpy(),
                    "w": e["cnt"].to_numpy(np.int64),
                }
            )
            .groupby(["node", "label"], sort=False, as_index=False)["w"]
            .sum()
        )
        g["_bucket"] = bucket_of(
            pd.Series(g["node"]).astype(str), num_buckets
        ).astype(np.int32)
        return g

    def tag_edges_by_b(batch: pa.Table) -> pa.Table:
        b = pd.Series(batch["b"].to_numpy(zero_copy_only=False)).astype(str)
        n = len(b)
        return pa.table(
            {
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "a": batch["a"].cast(pa.string()),
                "b": pa.array(b, pa.string()),
                "cnt": batch["cnt"].cast(pa.int64()),
                "val": pa.array([""] * n, pa.string()),
                "_bucket": pa.array(bucket_of(b, num_buckets), pa.int32()),
            },
            schema=_LPA_TAG_SCHEMA,
        )

    def tag_labels(batch: pa.Table) -> pa.Table:
        node = pd.Series(
            batch["node"].to_numpy(zero_copy_only=False)
        ).astype(str)
        n = len(node)
        return pa.table(
            {
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "a": pa.array([""] * n, pa.string()),
                "b": pa.array(node, pa.string()),
                "cnt": pa.array(np.zeros(n, dtype=np.int64)),
                "val": batch["label"].cast(pa.string()),
                "_bucket": pa.array(bucket_of(node, num_buckets), pa.int32()),
            },
            schema=_LPA_TAG_SCHEMA,
        )

    labels_ds = (
        edges.map_batches(arrowed(round1_partial), batch_format="pyarrow")
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(pick_groups), batch_format="pandas")
        .materialize()
    )
    for _ in range(n_rounds - 1):
        tagged = edges.map_batches(
            tag_edges_by_b, batch_format="pyarrow"
        ).union(labels_ds.map_batches(tag_labels, batch_format="pyarrow"))
        labels_ds = (
            tagged.repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(arrowed(lab_join), batch_format="pandas")
            .repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(arrowed(pick_groups), batch_format="pandas")
            .materialize()
        )

    def to_out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity": batch["node"].cast(pa.string()),
                "community": batch["label"].cast(pa.string()),
            }
        )

    return labels_ds.map_batches(to_out, batch_format="pyarrow").sort(
        "entity"
    )


def _local_edge_jaccard(batch: pa.Table) -> pa.Table:
    """Single-task per-edge neighborhood Jaccard over one complete edge
    block: the distributed path's degree-ordered wedge confirm, all
    numpy, but counting confirmed triangles PER EDGE (each triangle
    contributes to its three canonical edges) instead of per corner."""
    a = batch["a"].to_numpy(zero_copy_only=False).astype(str)
    b = batch["b"].to_numpy(zero_copy_only=False).astype(str)
    if len(a) == 0:
        return pa.table(
            {
                "a": pa.array([], pa.string()),
                "b": pa.array([], pa.string()),
                "common_cnt": pa.array([], pa.int64()),
                "union_cnt": pa.array([], pa.int64()),
            }
        )
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    V = np.int64(len(nodes))
    u, v = inv[: len(a)].astype(np.int64), inv[len(a):].astype(np.int64)
    cu, cv = np.minimum(u, v), np.maximum(u, v)
    keys = np.unique(cu * V + cv)
    cu, cv = keys // V, keys % V
    deg = np.bincount(np.concatenate([cu, cv]), minlength=len(nodes))
    order = np.lexsort((np.arange(len(nodes)), deg))
    rank = np.empty(len(nodes), dtype=np.int64)
    rank[order] = np.arange(len(nodes))
    swap = rank[cu] > rank[cv]
    lo = np.where(swap, cv, cu)
    hi = np.where(swap, cu, cv)
    srt = np.lexsort((rank[hi], lo))
    lo, hi = lo[srt], hi[srt]
    new = np.ones(len(lo), dtype=bool)
    new[1:] = lo[1:] != lo[:-1]
    sizes = np.bincount(np.cumsum(new) - 1)
    starts = np.flatnonzero(new)
    n1, n2, g = _pairs_by_size_class(starts, sizes, hi)
    common = np.zeros(len(keys), dtype=np.int64)
    if len(n1):
        apex = lo[starts[g]]
        hit = np.isin(n1 * V + n2, lo * V + hi)
        ax, x1, x2 = apex[hit], n1[hit], n2[hit]
        # the 3 canonical (code-min, code-max) edges of each triangle;
        # code order == string order (nodes is sorted), so canonical
        # codes match the a<b input edge keys
        ea = np.concatenate(
            [np.minimum(ax, x1), np.minimum(ax, x2), np.minimum(x1, x2)]
        )
        eb = np.concatenate(
            [np.maximum(ax, x1), np.maximum(ax, x2), np.maximum(x1, x2)]
        )
        ek, ec = np.unique(ea * V + eb, return_counts=True)
        common[np.searchsorted(keys, ek)] = ec.astype(np.int64)
    union = deg[cu] + deg[cv] - common
    return pa.table(
        {
            "a": pa.array(nodes[cu], pa.string()),
            "b": pa.array(nodes[cv], pa.string()),
            "common_cnt": pa.array(common, pa.int64()),
            "union_cnt": pa.array(union.astype(np.int64), pa.int64()),
        }
    )


def edge_jaccard(
    edges_ds,
    num_buckets: Optional[int] = None,
    local_threshold: int = 4_000_000,
):
    """Per-edge neighborhood Jaccard over the a<b co-mention edge list:
    ``(a, b, common_cnt, union_cnt)`` where ``common_cnt`` is the
    number of shared neighbors of a and b (= triangles through the
    edge) and ``union_cnt = deg(a) + deg(b) - common_cnt`` — the
    integer-exact numerator/denominator of the classic edge-similarity
    / tie-strength signal (Jaccard itself is their ratio; kept as two
    BIGINTs so the DuckDB oracle hashes equal with no float drift).

    Distributed path reuses the degree-ordered wedge scaffold of
    :func:`triangle_counts` (:func:`_tagged_wedge_stream`): confirmed
    triangles emit their THREE canonical string-ordered edges into a
    pair-bucketed partial count, zero-filled against the edge list;
    the endpoint degrees attach by co-group (:func:`_oriented_stream`
    — no broadcast node map) and ride the per-edge zero rows into the
    final merge.  Exchanges: degree partial + 2 degree-attach
    co-groups + wedge groupby + confirm co-group + per-edge merge.
    """
    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.materialize()
    if edges.count() <= local_threshold:
        return edges.repartition(1).map_batches(
            _local_edge_jaccard, batch_format="pyarrow", batch_size=None
        )

    deg_ds = _degree_ds(edges, num_buckets)
    tagged, oriented = _tagged_wedge_stream(edges, deg_ds, num_buckets)

    # -- confirm wedges; emit the 3 canonical edges per triangle ------
    def confirm(df: pd.DataFrame) -> pd.DataFrame:
        is_e = df["_is_edge"] == 1
        eset = df[is_e][["n1", "n2"]]
        w = df[~is_e]
        tri = w.merge(eset, on=["n1", "n2"], how="inner")
        if len(tri) == 0:
            # typed ARROW empty (size-estimator spam rule)
            return pa.table(
                {
                    "a": pa.array([], pa.string()),
                    "b": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                    "da": pa.array([], pa.int64()),
                    "db": pa.array([], pa.int64()),
                    "_bucket3": pa.array([], pa.int32()),
                }
            )
        ax = tri["apex"].to_numpy(dtype=object).astype(str)
        x1 = tri["n1"].to_numpy(dtype=object).astype(str)
        x2 = tri["n2"].to_numpy(dtype=object).astype(str)
        # n1/n2 are RANK-ordered; canonicalize all three edges to the
        # string order of the input edge list (np.where, not np.minimum:
        # the min/max ufuncs have no unicode loop)
        lo1, lo2, lo3 = ax <= x1, ax <= x2, x1 <= x2
        ea = np.concatenate(
            [
                np.where(lo1, ax, x1),
                np.where(lo2, ax, x2),
                np.where(lo3, x1, x2),
            ]
        )
        eb = np.concatenate(
            [
                np.where(lo1, x1, ax),
                np.where(lo2, x2, ax),
                np.where(lo3, x2, x1),
            ]
        )
        out = (
            pd.DataFrame({"a": ea, "b": eb})
            .groupby(["a", "b"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )
        out["c"] = out["c"].astype(np.int64)
        # degrees ride the ZERO rows (one per edge); partial-count rows
        # carry -1 so the final max picks the real value
        out["da"] = np.int64(-1)
        out["db"] = np.int64(-1)
        out["_bucket3"] = bucket_of(out["a"] + "\x1f" + out["b"], num_buckets)
        return _arrow_out(out)

    counts = tagged.groupby("_bucket2").map_groups(
        confirm, batch_format="pandas"
    )

    # -- zero rows keep triangle-free edges in the output AND carry
    # the endpoint degrees (from the oriented stream — exactly one
    # zero row per edge), so no broadcast degree map is needed -------
    def zeros(batch: pa.Table) -> pa.Table:
        lo = batch["lo"].to_numpy(zero_copy_only=False).astype(str)
        hi = batch["hi"].to_numpy(zero_copy_only=False).astype(str)
        dlo = batch["dlo"].to_numpy(zero_copy_only=False).astype(np.int64)
        dhi = batch["dhi"].to_numpy(zero_copy_only=False).astype(np.int64)
        # canonicalize back to the input's string order
        s = lo <= hi
        a = np.where(s, lo, hi)
        b = np.where(s, hi, lo)
        da = np.where(s, dlo, dhi)
        db = np.where(s, dhi, dlo)
        key = pd.Series(np.char.add(np.char.add(a, "\x1f"), b), dtype=object)
        # typed ARROW output (empty-object-column estimator rule)
        return pa.table(
            {
                "a": pa.array(a, pa.string()),
                "b": pa.array(b, pa.string()),
                "c": pa.array(np.zeros(len(a), np.int64), pa.int64()),
                "da": pa.array(da, pa.int64()),
                "db": pa.array(db, pa.int64()),
                "_bucket3": pa.array(
                    bucket_of(key, num_buckets) if len(a)
                    else np.array([], np.int32),
                    pa.int32(),
                ),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["a", "b"], sort=False, as_index=False).agg(
            c=("c", "sum"), da=("da", "max"), db=("db", "max")
        )
        common = g["c"].to_numpy(np.int64)
        da = g["da"].to_numpy(np.int64)
        db = g["db"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "a": g["a"],
                "b": g["b"],
                "common_cnt": common,
                "union_cnt": da + db - common,
            }
        )

    return (
        counts.union(oriented.map_batches(zeros, batch_format="pyarrow"))
        .groupby("_bucket3")
        .map_groups(arrowed(final), batch_format="pandas")
    )


def _local_link_predict(
    batch: pa.Table, k: int, max_middle_degree: int
) -> pa.Table:
    """Single-task common-neighbors top-k over one complete a<b edge
    block (numpy mirror of the distributed path, code-space keys)."""
    a = batch["a"].to_numpy(zero_copy_only=False).astype(str)
    b = batch["b"].to_numpy(zero_copy_only=False).astype(str)
    empty = pa.table(
        {"a": pa.array([], pa.string()),
         "b": pa.array([], pa.string()),
         "common_cnt": pa.array([], pa.int64())}
    )
    if len(a) == 0:
        return empty
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    V = np.int64(len(nodes))
    u, v = inv[: len(a)].astype(np.int64), inv[len(a):].astype(np.int64)
    cu, cv = np.minimum(u, v), np.maximum(u, v)
    ekeys = np.unique(cu * V + cv)
    cu, cv = ekeys // V, ekeys % V
    deg = np.bincount(np.concatenate([cu, cv]), minlength=len(nodes))
    m = np.concatenate([cu, cv])
    o = np.concatenate([cv, cu])
    keep = deg[m] <= max_middle_degree
    m, o = m[keep], o[keep]
    if len(m) == 0:
        return empty
    srt = np.lexsort((o, m))
    m, o = m[srt], o[srt]
    new = np.ones(len(m), dtype=bool)
    new[1:] = m[1:] != m[:-1]
    sizes = np.bincount(np.cumsum(new) - 1)
    x1, x2, _ = _pairs_by_size_class(np.flatnonzero(new), sizes, o)
    if not len(x1):
        return empty
    pk, pc = np.unique(x1 * V + x2, return_counts=True)
    non = ~np.isin(pk, ekeys)
    pk, pc = pk[non], pc[non].astype(np.int64)
    if not len(pk):
        return empty
    pa_, pb = pk // V, pk % V
    order = np.lexsort((pb, pa_, -pc))[:k]
    return pa.table(
        {
            "a": pa.array(nodes[pa_[order]], pa.string()),
            "b": pa.array(nodes[pb[order]], pa.string()),
            "common_cnt": pa.array(pc[order], pa.int64()),
        }
    )


def link_predict(
    edges_ds,
    k: int = 20,
    max_middle_degree: int = 64,
    num_buckets: Optional[int] = None,
    local_threshold: int = 4_000_000,
):
    """Common-neighbors link prediction over the a<b co-mention edge
    list: the global top-``k`` NON-adjacent entity pairs ranked by
    shared-neighbor count — ``(a, b, common_cnt)``, ties broken
    (common_cnt desc, a asc, b asc).

    Wedge enumeration through a middle node is inherently
    O(sum deg(middle)^2), so middles with degree >
    ``max_middle_degree`` are excluded from SERVING as the shared
    neighbor (the standard hub cap — a hub connecting everything
    predicts nothing); the cap is part of the operator contract and is
    mirrored in the DuckDB oracle.  Pipeline: adjacency bucketed BY
    MIDDLE co-grouped with the bucketed degree state (the hub cap is
    applied IN-GROUP before any pair is generated — no broadcast
    capped-middle set, the open-vocabulary posture; the quadratic pair
    pass never runs for a hub) -> pair-bucketed anti-merge against the
    edge list -> two-phase global top-k (per-group partial, one tiny
    final reduce — the events_top100 pattern)."""
    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.materialize()
    if edges.count() <= local_threshold:
        # hybrid fast path (triangle_counts posture): one task replaces
        # four bounded exchanges below ~64 MB of pairs
        return edges.repartition(1).map_batches(
            lambda t: _local_link_predict(t, k, max_middle_degree),
            batch_format="pyarrow",
            batch_size=None,
        )
    deg_ds = _degree_ds(edges, num_buckets)

    # -- adjacency rows keyed by middle (side 0), degree state (side 1)
    def adj(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(str)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(str)
        m = np.concatenate([a, b])
        o = np.concatenate([b, a])
        # typed ARROW output (empty-object-column estimator rule)
        return pa.table(
            {
                "side": pa.array(np.zeros(len(m), np.int8), pa.int8()),
                "key": pa.array(m, pa.string()),
                "other": pa.array(o, pa.string()),
                "d": pa.array(np.zeros(len(m), np.int64), pa.int64()),
                "_bucket": pa.array(
                    bucket_of(pd.Series(m, dtype=object), num_buckets)
                    if len(m)
                    else np.array([], np.int32),
                    pa.int32(),
                ),
            },
            schema=_DEG_TAG,
        )

    # -- per-middle neighbor pairs (string-ordered by construction);
    # the hub cap applies here, BEFORE the quadratic pair pass --------
    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        dg = df[df["side"] == 1]
        capped = np.sort(
            dg.loc[dg["d"] <= max_middle_degree, "key"]
            .to_numpy(dtype=object)
            .astype(str)
        )
        df = df[df["side"] == 0]
        df = df[
            np.isin(df["key"].to_numpy(dtype=object).astype(str), capped)
        ]
        df = df.sort_values(["key", "other"], kind="stable")
        m = df["key"].to_numpy(dtype=object)
        o = df["other"].to_numpy(dtype=object).astype(str)
        pa_, pb = np.array([], dtype=object), np.array([], dtype=object)
        if len(df):
            new = np.ones(len(df), dtype=bool)
            new[1:] = m[1:] != m[:-1]
            sizes = np.bincount(np.cumsum(new) - 1)
            pa_, pb, _ = _pairs_by_size_class(np.flatnonzero(new), sizes, o)
        if not len(pa_):
            return pa.table(
                {
                    "a": pa.array([], pa.string()),
                    "b": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                    "_is_edge": pa.array([], pa.int8()),
                    "_bucket2": pa.array([], pa.int32()),
                }
            )
        out = (
            pd.DataFrame({"a": pa_, "b": pb})
            .groupby(["a", "b"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )
        out["c"] = out["c"].astype(np.int64)
        out["_is_edge"] = np.int8(0)
        out["_bucket2"] = bucket_of(out["a"] + "\x1f" + out["b"], num_buckets)
        return _arrow_out(out)

    def edge_rows(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(str)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(str)
        key = pd.Series(np.char.add(np.char.add(a, "\x1f"), b), dtype=object)
        # typed ARROW output (empty-object-column estimator rule)
        return pa.table(
            {
                "a": pa.array(a, pa.string()),
                "b": pa.array(b, pa.string()),
                "c": pa.array(np.zeros(len(a), np.int64), pa.int64()),
                "_is_edge": pa.array(np.ones(len(a), np.int8), pa.int8()),
                "_bucket2": pa.array(
                    bucket_of(key, num_buckets) if len(a)
                    else np.array([], np.int32),
                    pa.int32(),
                ),
            }
        )

    tagged = (
        edges.map_batches(adj, batch_format="pyarrow")
        .union(deg_ds.map_batches(_tag_deg_state, batch_format="pyarrow"))
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(pairs), batch_format="pandas")
        .union(edges.map_batches(edge_rows, batch_format="pyarrow"))
    )

    # -- anti-merge + per-group partial top-k --------------------------
    def anti_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["a", "b"], sort=False).agg(
            c=("c", "sum"), e=("_is_edge", "max")
        )
        g = g[g["e"] == 0].reset_index()
        if len(g) == 0:
            # typed ARROW empty (size-estimator spam rule)
            return pa.table(
                {"a": pa.array([], pa.string()),
                 "b": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64()),
                 "_final": pa.array([], pa.int32())}
            )
        out = g.sort_values(
            ["c", "a", "b"], ascending=[False, True, True], kind="stable"
        ).head(k)[["a", "b", "c"]]
        out["c"] = out["c"].astype(np.int64)
        out["_final"] = np.int32(0)
        return _arrow_out(out)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(
            ["c", "a", "b"], ascending=[False, True, True], kind="stable"
        ).head(k)
        return out.rename(columns={"c": "common_cnt"})[
            ["a", "b", "common_cnt"]
        ]

    return (
        tagged.groupby("_bucket2")
        .map_groups(arrowed(anti_topk), batch_format="pandas")
        .groupby("_final")
        .map_groups(arrowed(final), batch_format="pandas")
    )


def _local_bfs(batch: pa.Table, n_seeds: int, max_rounds: int) -> pa.Table:
    """Single-task bounded multi-source BFS over one complete SYMMETRIC
    edge block: seeds are the ``n_seeds`` lexicographically smallest
    nodes; returns (node, dist) for every node reached within
    ``max_rounds`` hops."""
    a = batch["a"].to_numpy(zero_copy_only=False).astype(str)
    b = batch["b"].to_numpy(zero_copy_only=False).astype(str)
    if len(a) == 0:
        return pa.table(
            {"node": pa.array([], pa.string()),
             "dist": pa.array([], pa.int64())}
        )
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    src = inv[: len(a)]
    dst = inv[len(a):]
    dist = np.full(len(nodes), -1, dtype=np.int64)
    dist[: min(n_seeds, len(nodes))] = 0  # sorted unique -> smallest first
    for r in range(1, max_rounds + 1):
        hop = dist[src] == r - 1
        cand = np.unique(dst[hop])
        fresh = cand[dist[cand] == -1]
        if len(fresh) == 0:
            break
        dist[fresh] = r
    keep = dist >= 0
    return pa.table(
        {
            "node": pa.array(nodes[keep], pa.string()),
            "dist": pa.array(dist[keep], pa.int64()),
        }
    )


def bfs_layers(
    edges_ds,
    n_seeds: int = 4,
    max_rounds: int = 32,
    num_buckets: Optional[int] = None,
    local_threshold: int = 4_000_000,
):
    """Bounded multi-source BFS over a SYMMETRIC edge list (the
    pagerank/LPA input shape): ``(node, dist)`` — minimum hop distance
    from the seed set for every node reachable within ``max_rounds``
    hops, seeds being the ``n_seeds`` lexicographically smallest nodes
    (deterministic, no configuration table needed).  The round cap is
    part of the operator contract (mirrored by the oracle's recursive
    CTE dist guard), not a convergence heuristic: outputs are exact
    for the capped semantics even on graphs with larger diameter.

    Distributed shape (the :func:`pagerank` posture): the frontier and
    the visited (node, dist) map are hash-bucketed DATASETS, never
    driver sets — per round, exchange 1 co-groups the edge stream with
    the frontier on bucket_of(a) and emits per-group-unique candidate
    discoveries; exchange 2 co-groups those with the visited state on
    bucket_of(node) as an anti-join, yielding the fresh layer.  The
    driver holds only the round counter and the fresh-count scalar, so
    the reachable set has no vocabulary ceiling.  Rounds stop at the
    first empty frontier."""
    import ray.data as rd

    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.materialize()
    _check_symmetric(edges, num_buckets)
    if edges.count() <= local_threshold:
        return edges.repartition(1).map_batches(
            lambda t: _local_bfs(t, n_seeds, max_rounds),
            batch_format="pyarrow",
            batch_size=None,
        )

    seeds = min_k_nodes(edges, n_seeds)

    # ---- dataset-resident frontier / visited state ------------------
    _BFS_TAG = pa.schema(
        [
            ("side", pa.int8()),
            ("key", pa.string()),  # co-group key: edge 'a' / state node
            ("b", pa.string()),  # edge dst (side 0 only)
            ("dist", pa.int64()),  # visited distance (side 1 only)
            ("_bucket", pa.int32()),
        ]
    )

    def tag_edges(batch: pa.Table) -> pa.Table:
        a = pd.Series(batch["a"].to_numpy(zero_copy_only=False)).astype(str)
        n = len(a)
        return pa.table(
            {
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "key": pa.array(a, pa.string()),
                "b": batch["b"].cast(pa.string()),
                "dist": pa.array(np.zeros(n, dtype=np.int64)),
                "_bucket": pa.array(bucket_of(a, num_buckets), pa.int32()),
            },
            schema=_BFS_TAG,
        )

    def tag_state(batch: pa.Table, side: int) -> pa.Table:
        node = pd.Series(
            batch["node"].to_numpy(zero_copy_only=False)
        ).astype(str)
        n = len(node)
        d = (
            batch["dist"].cast(pa.int64())
            if "dist" in batch.column_names
            else pa.array(np.zeros(n, dtype=np.int64))
        )
        return pa.table(
            {
                "side": pa.array(np.full(n, side, dtype=np.int8)),
                "key": pa.array(node, pa.string()),
                "b": pa.array([""] * n, pa.string()),
                "dist": d,
                "_bucket": pa.array(bucket_of(node, num_buckets), pa.int32()),
            },
            schema=_BFS_TAG,
        )

    def expand_group(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["side"] == 0]
        f = df[df["side"] == 1]
        if len(e) == 0 or len(f) == 0:
            return pd.DataFrame({"node": pd.Series(dtype=str)})
        fr = np.sort(f["key"].to_numpy(dtype=object).astype(str))
        a = e["key"].to_numpy(dtype=object).astype(str)
        b = e["b"].to_numpy(dtype=object).astype(str)
        cand = np.unique(b[np.isin(a, fr)])
        return pd.DataFrame({"node": cand})

    def anti_group(df: pd.DataFrame, r: int) -> pd.DataFrame:
        c = df[df["side"] == 0]
        seen = df[df["side"] == 1]
        if len(c) == 0:
            return pd.DataFrame(
                {
                    "node": pd.Series(dtype=str),
                    "dist": pd.Series(dtype=np.int64),
                }
            )
        cand = np.unique(c["key"].to_numpy(dtype=object).astype(str))
        sn = np.sort(seen["key"].to_numpy(dtype=object).astype(str))
        fresh = cand[~np.isin(cand, sn)]
        return pd.DataFrame(
            {"node": fresh, "dist": np.full(len(fresh), r, dtype=np.int64)}
        )

    dist_ds = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(seeds, pa.string()),
                "dist": pa.array([0] * len(seeds), pa.int64()),
            }
        )
    ).materialize()
    frontier_ds = dist_ds
    for r in range(1, max_rounds + 1):
        tagged = edges.map_batches(tag_edges, batch_format="pyarrow").union(
            frontier_ds.map_batches(
                lambda t: tag_state(t, 1), batch_format="pyarrow"
            )
        )
        cand = (
            tagged.repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(arrowed(expand_group), batch_format="pandas")
        )

        def tag_cand(batch: pa.Table) -> pa.Table:
            return tag_state(batch, 0)

        tagged2 = cand.map_batches(tag_cand, batch_format="pyarrow").union(
            dist_ds.map_batches(
                lambda t: tag_state(t, 1), batch_format="pyarrow"
            )
        )
        fresh = (
            tagged2.repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(
                arrowed(lambda df, _r=r: anti_group(df, _r)),
                batch_format="pandas",
            )
            .materialize()
        )
        if fresh.count() == 0:
            break
        dist_ds = dist_ds.union(fresh).materialize()
        frontier_ds = fresh

    return dist_ds.sort("node")


def _local_kcore(
    batch: pa.Table, k: int, n_rounds: int, weighted: bool = False
) -> pa.Table:
    """Single-task fixed-round k-core peeling over one complete
    SYMMETRIC edge block (numpy mirror of the distributed rounds).
    ``weighted`` peels on the surviving WEIGHTED degree (int64 sum of
    ``cnt``) instead of the edge count."""
    a = batch["a"].to_numpy(zero_copy_only=False).astype(str)
    b = batch["b"].to_numpy(zero_copy_only=False).astype(str)
    if len(a) == 0:
        return pa.table({"entity": pa.array([], pa.string())})
    w = (
        batch["cnt"].to_numpy().astype(np.int64)
        if weighted
        else np.ones(len(a), dtype=np.int64)
    )
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    src = inv[: len(a)]
    dst = inv[len(a):]
    alive = np.ones(len(nodes), dtype=bool)
    for _ in range(n_rounds):
        keep = alive[src] & alive[dst]
        deg = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(deg, src[keep], w[keep])
        nxt = alive & (deg >= k)
        if (nxt == alive).all():
            break
        alive = nxt
    return pa.table({"entity": pa.array(nodes[alive], pa.string())})


def k_core(
    edges_ds,
    k: int = 2,
    n_rounds: int = 16,
    num_buckets: Optional[int] = None,
    local_threshold: int = 4_000_000,
    weighted: bool = False,
):
    """Fixed-round synchronous k-core peeling over a SYMMETRIC edge
    list: ``(entity)`` — the nodes still alive after ``n_rounds`` of
    "drop every node whose degree among survivors is < k".  The round
    count is part of the operator contract (the fixed-round LPA
    posture, mirrored by the oracle's unrolled CTEs); when peeling
    converges earlier the remaining rounds are no-ops, so the output
    IS the true k-core whenever the cascade depth fits the budget.

    ``weighted`` peels on the surviving WEIGHTED degree (int64 sum of
    ``cnt`` — the co-mention strength s-core of Eidsaa & Almaas) via
    the SAME rounds: the unweighted path sums ones, so both variants
    share one bit-tested code path.  Weighted sums stay exact int64
    (cnt is a document count, bounded far below the 2^63 / max-degree
    product the pagerank guard polices).

    Distributed shape (the :func:`pagerank` posture): the survivor set
    is a hash-bucketed DATASET, never a driver set — each round
    semi-joins the edge stream against it on BOTH endpoints via two
    tagged-union co-groups, then a third exchange sums the surviving
    degrees and thresholds.  Survivor sets shrink monotonically (a
    node outside round i-1's set has no surviving edges), so the
    driver-side convergence check reduces to comparing COUNTS —
    the only driver state is that scalar."""
    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.materialize()
    _check_symmetric(edges, num_buckets)
    if edges.count() <= local_threshold:
        return edges.repartition(1).map_batches(
            lambda t: _local_kcore(t, k, n_rounds, weighted),
            batch_format="pyarrow",
            batch_size=None,
        )

    import ray.data as rd

    _KC_TAG = pa.schema(
        [
            ("side", pa.int8()),
            ("key", pa.string()),  # co-group key (a, then b, then node)
            ("other", pa.string()),  # the carried opposite endpoint
            ("c", pa.int64()),
            ("_bucket", pa.int32()),
        ]
    )

    def tag_pairs(
        batch: pa.Table, key_col: str, other_col: str, c_col: Optional[str]
    ) -> pa.Table:
        kv = pd.Series(
            batch[key_col].to_numpy(zero_copy_only=False)
        ).astype(str)
        n = len(kv)
        c = (
            batch[c_col].cast(pa.int64())
            if c_col is not None
            else pa.array(np.ones(n, dtype=np.int64))
        )
        return pa.table(
            {
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "key": pa.array(kv, pa.string()),
                "other": batch[other_col].cast(pa.string()),
                "c": c,
                "_bucket": pa.array(bucket_of(kv, num_buckets), pa.int32()),
            },
            schema=_KC_TAG,
        )

    def tag_alive(batch: pa.Table) -> pa.Table:
        node = pd.Series(
            batch["entity"].to_numpy(zero_copy_only=False)
        ).astype(str)
        n = len(node)
        return pa.table(
            {
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "key": pa.array(node, pa.string()),
                "other": pa.array([""] * n, pa.string()),
                "c": pa.array(np.zeros(n, dtype=np.int64)),
                "_bucket": pa.array(bucket_of(node, num_buckets), pa.int32()),
            },
            schema=_KC_TAG,
        )

    def semi_keep(df: pd.DataFrame) -> pd.DataFrame:
        """Keep side-0 rows whose key is in the group's side-1 set,
        re-emitting them keyed (and bucketed) by ``other`` for the
        next exchange."""
        e = df[df["side"] == 0]
        s = df[df["side"] == 1]
        if len(e) == 0 or len(s) == 0:
            return pd.DataFrame(
                {
                    "key": pd.Series(dtype=str),
                    "other": pd.Series(dtype=str),
                    "c": pd.Series(dtype=np.int64),
                    "_bucket": pd.Series(dtype=np.int32),
                }
            )
        sn = np.sort(s["key"].to_numpy(dtype=object).astype(str))
        kv = e["key"].to_numpy(dtype=object).astype(str)
        keep = np.isin(kv, sn)
        oth = e["other"].to_numpy(dtype=object).astype(str)[keep]
        return pd.DataFrame(
            {
                "key": oth,  # next exchange keys on the other endpoint
                "other": kv[keep],
                "c": e["c"].to_numpy(np.int64)[keep],
                "_bucket": bucket_of(
                    pd.Series(oth, dtype=object), num_buckets
                ).astype(np.int32),
            }
        )

    def deg_from_group(df: pd.DataFrame) -> pd.DataFrame:
        """Final semi-join on b + per-group degree partials of a."""
        e = df[df["side"] == 0]
        s = df[df["side"] == 1]
        if len(e) == 0 or len(s) == 0:
            return pd.DataFrame(
                {
                    "node": pd.Series(dtype=str),
                    "c": pd.Series(dtype=np.int64),
                    "_bucket": pd.Series(dtype=np.int32),
                }
            )
        sn = np.sort(s["key"].to_numpy(dtype=object).astype(str))
        kv = e["key"].to_numpy(dtype=object).astype(str)
        keep = np.isin(kv, sn)
        a = e["other"].to_numpy(dtype=object).astype(str)[keep]
        w = e["c"].to_numpy(np.int64)[keep]
        vals, inv = np.unique(a, return_inverse=True)
        cnt = np.zeros(len(vals), dtype=np.int64)
        np.add.at(cnt, inv, w)  # unweighted: w == ones -> plain counts
        return pd.DataFrame(
            {
                "node": vals,
                "c": cnt,
                "_bucket": bucket_of(
                    pd.Series(vals, dtype=object), num_buckets
                ).astype(np.int32),
            }
        )

    def deg_first_round(batch: pa.Table) -> pd.DataFrame:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(str)
        w = (
            batch["cnt"].to_numpy().astype(np.int64)
            if weighted
            else np.ones(len(a), dtype=np.int64)
        )
        vals, inv = np.unique(a, return_inverse=True)
        cnt = np.zeros(len(vals), dtype=np.int64)
        np.add.at(cnt, inv, w)
        return pd.DataFrame(
            {
                "node": vals,
                "c": cnt,
                "_bucket": bucket_of(
                    pd.Series(vals, dtype=object), num_buckets
                ).astype(np.int32),
            }
        )

    def threshold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False, as_index=False)["c"].sum()
        return pd.DataFrame(
            {"entity": g.loc[g["c"] >= k, "node"].to_numpy(dtype=object)}
        )

    alive_ds = (
        edges.map_batches(arrowed(deg_first_round), batch_format="pyarrow")
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(threshold), batch_format="pandas")
        .materialize()
    )
    n_alive = alive_ds.count()
    for _ in range(n_rounds - 1):
        if n_alive == 0:
            break
        # exchange 1: a-side semi-join
        t1 = edges.map_batches(
            lambda t: tag_pairs(t, "a", "b", "cnt" if weighted else None),
            batch_format="pyarrow",
        ).union(alive_ds.map_batches(tag_alive, batch_format="pyarrow"))
        ab = (
            t1.repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(arrowed(semi_keep), batch_format="pandas")
        )
        # exchange 2: b-side semi-join + degree partials of a
        t2 = ab.map_batches(
            lambda t: tag_pairs(t, "key", "other", "c"),
            batch_format="pyarrow",
        ).union(alive_ds.map_batches(tag_alive, batch_format="pyarrow"))
        deg = (
            t2.repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(arrowed(deg_from_group), batch_format="pandas")
        )
        # exchange 3: sum + threshold -> next survivor set
        nxt = (
            deg.repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(arrowed(threshold), batch_format="pandas")
            .materialize()
        )
        n_nxt = nxt.count()
        alive_ds = nxt
        if n_nxt == n_alive:  # monotone shrink: equal count == converged
            break
        n_alive = n_nxt

    if n_alive == 0:
        return rd.from_arrow(
            pa.table({"entity": pa.array([], pa.string())})
        )
    return alive_ds.sort("entity")


def _edge_support_codes(cu: np.ndarray, cv: np.ndarray, V: int):
    """Per-edge triangle support over a canonical (cu < cv) int-coded
    edge list: degree-ordered wedge emission (the _local_triangles
    kernel) but scattered to the three EDGES of each confirmed
    triangle instead of its corners.  Returns int64 support aligned
    with the (sorted-unique) input edge codes."""
    keys = cu * V + cv
    deg = np.bincount(np.concatenate([cu, cv]), minlength=V)
    order = np.lexsort((np.arange(V), deg))
    rank = np.empty(V, dtype=np.int64)
    rank[order] = np.arange(V)
    swap = rank[cu] > rank[cv]
    lo = np.where(swap, cv, cu)
    hi = np.where(swap, cu, cv)
    srt = np.lexsort((rank[hi], lo))
    lo, hi = lo[srt], hi[srt]
    new = np.ones(len(lo), dtype=bool)
    new[1:] = lo[1:] != lo[:-1]
    sizes = np.bincount(np.cumsum(new) - 1)
    starts = np.flatnonzero(new)
    n1, n2, g = _pairs_by_size_class(starts, sizes, hi)
    support = np.zeros(len(keys), dtype=np.int64)
    if len(n1):
        apex = lo[starts[g]]
        okeys = np.minimum(lo, hi) * V + np.maximum(lo, hi)  # == keys set
        hit = np.isin(
            np.minimum(n1, n2) * V + np.maximum(n1, n2), okeys
        )
        ta, t1, t2 = apex[hit], n1[hit], n2[hit]
        # each triangle supports its three canonical edges
        e_keys = np.concatenate(
            [
                np.minimum(ta, t1) * V + np.maximum(ta, t1),
                np.minimum(ta, t2) * V + np.maximum(ta, t2),
                np.minimum(t1, t2) * V + np.maximum(t1, t2),
            ]
        )
        pos = np.searchsorted(keys, e_keys)
        np.add.at(support, pos, 1)
    return support


def _local_ktruss(batch: pa.Table, k: int, n_rounds: int) -> pa.Table:
    """Single-task fixed-round k-truss peeling over one complete a<b
    edge block: per round, drop every edge in fewer than k-2 triangles
    among the survivors; numpy mirror of the distributed rounds."""
    a = batch["a"].to_numpy(zero_copy_only=False).astype(str)
    b = batch["b"].to_numpy(zero_copy_only=False).astype(str)
    empty = pa.table(
        {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}
    )
    if len(a) == 0:
        return empty
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    V = np.int64(len(nodes))
    u, v = inv[: len(a)].astype(np.int64), inv[len(a):].astype(np.int64)
    cu, cv = np.minimum(u, v), np.maximum(u, v)
    keys = np.unique(cu * V + cv)
    for _ in range(n_rounds):
        if len(keys) == 0:
            break
        cu, cv = keys // V, keys % V
        support = _edge_support_codes(cu, cv, int(V))
        nxt = keys[support >= k - 2]
        if len(nxt) == len(keys):
            break
        keys = nxt
    if len(keys) == 0:
        return empty
    return pa.table(
        {
            "a": pa.array(nodes[keys // V], pa.string()),
            "b": pa.array(nodes[keys % V], pa.string()),
        }
    )


def k_truss(
    edges_ds,
    k: int = 4,
    n_rounds: int = 8,
    num_buckets: Optional[int] = None,
    local_threshold: int = 4_000_000,
):
    """Fixed-round synchronous k-truss peeling over the a<b co-mention
    edge list: the edges still alive after ``n_rounds`` of "drop every
    edge supported by fewer than k-2 triangles among the survivors" —
    the cohesion primitive one level finer than k-core (every k-truss
    edge sits inside the (k-1)-core, but not vice versa).  Output
    ``(a, b)``, sorted.  ``k >= 3`` required (k == 2 keeps every edge
    and the support recount would be wasted work).

    The round count is part of the operator contract (the k_core /
    fixed-round-LPA posture, mirrored by the oracle's unrolled
    MATERIALIZED CTEs); converged rounds are no-ops, so the output IS
    the true k-truss whenever the cascade depth fits the budget.

    Distributed shape: per round the per-edge triangle support is
    recomputed with the degree-ordered wedge machinery
    (:func:`_tagged_wedge_stream` — orientation bounds every
    out-neighborhood by sqrt(E), so hot entities never emit quadratic
    wedges) and each confirmed triangle scatters +1 to its three
    canonical edges; one pair-key-bucketed merge thresholds the
    support and emits the next edge set.  The driver holds only the
    surviving-edge COUNT (monotone shrink makes count equality the
    convergence test) — no edge set, no node map.  Cost: the
    triangle_counts exchange set (~5 bounded exchanges) per round —
    the price of truss over core, paid worker-side.
    """
    if k < 3:
        raise ValueError("k_truss requires k >= 3")
    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.select_columns(["a", "b"]).materialize()
    n_edges = edges.count()
    if n_edges <= local_threshold:
        return edges.repartition(1).map_batches(
            lambda t: _local_ktruss(t, k, n_rounds),
            batch_format="pyarrow",
            batch_size=None,
        )

    import ray.data as rd

    def confirm_edges(df: pd.DataFrame) -> pd.DataFrame:
        """Wedge-vs-edge confirm emitting the three canonical edge
        keys of each triangle (support partials), not corners."""
        is_e = df["_is_edge"] == 1
        eset = df[is_e][["n1", "n2"]]
        w = df[~is_e]
        tri = w.merge(eset, on=["n1", "n2"], how="inner")
        if len(tri) == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.string()),
                    "b": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                    "_bucket3": pa.array([], pa.int32()),
                }
            )
        # object arrays: np.minimum has no loop across mixed-width
        # unicode dtypes; elementwise comparisons do
        ap = tri["apex"].to_numpy(dtype=object)
        n1 = tri["n1"].to_numpy(dtype=object)
        n2 = tri["n2"].to_numpy(dtype=object)
        ea = np.concatenate(
            [
                np.where(ap < n1, ap, n1),
                np.where(ap < n2, ap, n2),
                np.where(n1 < n2, n1, n2),
            ]
        )
        eb = np.concatenate(
            [
                np.where(ap < n1, n1, ap),
                np.where(ap < n2, n2, ap),
                np.where(n1 < n2, n2, n1),
            ]
        )
        key = pd.DataFrame({"a": ea, "b": eb})
        g = key.groupby(["a", "b"], sort=False, as_index=False).size()
        out = pd.DataFrame(
            {
                "a": g["a"].to_numpy(dtype=object),
                "b": g["b"].to_numpy(dtype=object),
                "c": g["size"].to_numpy(np.int64),
            }
        )
        out["_bucket3"] = bucket_of(
            out["a"].astype(str) + "\x1f" + out["b"].astype(str), num_buckets
        )
        return out

    def threshold_edges(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "a" not in df.columns:
            # an all-empty support round reaches here without columns
            return pa.table(
                {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}
            )
        g = df.groupby(["a", "b"], sort=False, as_index=False)["c"].sum()
        keep = g[g["c"] >= k - 2]
        return pd.DataFrame(
            {
                "a": keep["a"].to_numpy(dtype=object),
                "b": keep["b"].to_numpy(dtype=object),
            }
        )

    for _ in range(n_rounds):
        if n_edges == 0:
            break
        deg_ds = _degree_ds(edges, num_buckets)
        tagged, _ = _tagged_wedge_stream(edges, deg_ds, num_buckets)
        support = (
            tagged.groupby("_bucket2")
            .map_groups(arrowed(confirm_edges), batch_format="pandas")
        )
        nxt = (
            support.repartition(num_buckets)
            .groupby("_bucket3")
            .map_groups(arrowed(threshold_edges), batch_format="pandas")
            .materialize()
        )
        n_nxt = nxt.count()
        edges = nxt
        if n_nxt == n_edges:  # monotone shrink: equal count == converged
            break
        n_edges = n_nxt

    if n_edges == 0:
        return rd.from_arrow(
            pa.table(
                {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}
            )
        )
    return edges.sort(["a", "b"])


def clustering_coefficient(
    edges_ds,
    num_buckets: Optional[int] = None,
    local_threshold: int = 4_000_000,
):
    """Local clustering coefficient per co-mention-graph node:
    ``(entity, degree, n_triangles, lcc)`` with
    ``lcc = 2*T / (d*(d-1))`` (0.0 for degree < 2) — how tightly each
    entity's neighborhood is interlinked, the standard small-world /
    community-structure signal.

    Composition: :func:`triangle_counts` does the heavy lifting
    (degree-ordered wedge join, or its single-task hybrid under
    ``local_threshold``); the degree attach is an in-process merge on
    the local path and ONE tagged co-group against the bucketed degree
    Dataset on the distributed path — no broadcast node map (the
    open-vocabulary posture).  The single IEEE division matches the
    SQL mirror bit-for-bit (both divide exact int64 products well
    under 2^53).
    """
    import ray.data as rd

    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.materialize()

    def _coeff(t: np.ndarray, d: np.ndarray) -> np.ndarray:
        denom = d * (d - 1)
        return np.where(denom > 0, (2.0 * t) / np.maximum(denom, 1), 0.0)

    if edges.count() <= local_threshold:
        tri = triangle_counts(
            edges, num_buckets=num_buckets, local_threshold=local_threshold
        ).to_pandas()
        edf = edges.to_pandas()
        nodes, cnt = np.unique(
            np.concatenate(
                [
                    edf["a"].to_numpy(dtype=object).astype(str),
                    edf["b"].to_numpy(dtype=object).astype(str),
                ]
            ),
            return_counts=True,
        )
        dm = pd.Series(cnt.astype(np.int64), index=nodes)
        tri = tri.sort_values("entity", kind="stable").reset_index(drop=True)
        d = (
            tri["entity"].astype(str).map(dm).to_numpy(np.int64)
        )  # every entity is an edge endpoint: no misses, stays int
        t = tri["n_triangles"].to_numpy(np.int64)
        return rd.from_arrow(
            pa.table(
                {
                    "entity": pa.array(
                        tri["entity"].to_numpy(dtype=object).astype(str),
                        pa.string(),
                    ),
                    "degree": pa.array(d, pa.int64()),
                    "n_triangles": pa.array(t, pa.int64()),
                    "lcc": pa.array(_coeff(t, d), pa.float64()),
                }
            )
        )

    # one degree aggregation (materialized inside _degree_ds), shared
    # by the triangle kernel's orientation co-groups and the attach
    deg_ds = _degree_ds(edges, num_buckets)
    tri = triangle_counts(
        edges,
        num_buckets=num_buckets,
        local_threshold=local_threshold,
        _deg=deg_ds,
    )

    def tag_tri(batch: pa.Table) -> pa.Table:
        ent = pd.Series(
            batch["entity"].to_numpy(zero_copy_only=False)
        ).astype(str)
        n = len(ent)
        return pa.table(
            {
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "key": pa.array(ent, pa.string()),
                "other": pa.array([""] * n, pa.string()),
                "d": batch["n_triangles"].cast(pa.int64()),
                "_bucket": pa.array(bucket_of(ent, num_buckets), pa.int32()),
            },
            schema=_DEG_TAG,
        )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        tr = df[df["side"] == 0]
        dg = df[df["side"] == 1]
        if len(tr) == 0:
            return pd.DataFrame(
                {
                    "entity": pd.Series(dtype=str),
                    "degree": pd.Series(dtype=np.int64),
                    "n_triangles": pd.Series(dtype=np.int64),
                    "lcc": pd.Series(dtype=np.float64),
                }
            )
        m = tr[["key", "d"]].rename(columns={"d": "t"}).merge(
            dg[["key", "d"]], on="key", how="inner"
        )
        t = m["t"].to_numpy(np.int64)
        d = m["d"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "entity": m["key"].to_numpy(),
                "degree": d,
                "n_triangles": t,
                "lcc": _coeff(t, d),
            }
        )

    return (
        tri.map_batches(tag_tri, batch_format="pyarrow")
        .union(deg_ds.map_batches(_tag_deg_state, batch_format="pyarrow"))
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(attach), batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# 2-hop neighborhood size: exact (wedge join) + HyperBall (HLL registers)
# ---------------------------------------------------------------------------


def _local_ball2(batch: pa.Table) -> pa.Table:
    """Single-task exact 2-hop ball sizes over one complete SYMMETRIC
    edge block: for every node, |{x : dist(node, x) <= 2, x != node}|."""
    a = batch["a"].to_numpy(zero_copy_only=False).astype(str)
    b = batch["b"].to_numpy(zero_copy_only=False).astype(str)
    if len(a) == 0:
        return pa.table(
            {"entity": pa.array([], pa.string()),
             "n_ball2": pa.array([], pa.int64())}
        )
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    n = len(nodes)
    src = inv[: len(a)].astype(np.int64)
    dst = inv[len(a):].astype(np.int64)
    # wedges through each middle m: all ordered neighbor pairs (u, v)
    # of m's neighbor list (symmetric edges: rows with a == m)
    order = np.argsort(src, kind="stable")
    ms, ns = src[order], dst[order]
    starts = np.searchsorted(ms, np.arange(n))
    ends = np.searchsorted(ms, np.arange(n) + 1)
    deg = ends - starts
    # vectorized per-middle cartesian products via repeat/tile offsets
    reps = np.repeat(np.arange(n), deg * deg)
    # index arithmetic: for middle m with degree d at offset s, pair t
    # (t in [0, d^2)) is (ns[s + t // d], ns[s + t % d])
    t_all = np.concatenate([np.arange(d * d) for d in deg]) if n else np.empty(0, np.int64)
    s_all = starts[reps]
    d_all = deg[reps]
    u = ns[s_all + t_all // np.maximum(d_all, 1)]
    v = ns[s_all + t_all % np.maximum(d_all, 1)]
    keep = u != v
    pair_u = np.concatenate([src, u[keep]])
    pair_v = np.concatenate([dst, v[keep]])
    # distinct (u, x) pairs, x != u, then counts per u
    key = pair_u * np.int64(n) + pair_v
    uniq = np.unique(key)
    uu = uniq // n
    counts = np.bincount(uu, minlength=n).astype(np.int64)
    return pa.table(
        {"entity": pa.array(nodes.tolist(), pa.string()),
         "n_ball2": pa.array(counts)}
    )


def two_hop_counts(
    edges_ds,
    num_buckets: Optional[int] = None,
    local_threshold: int = 4_000_000,
    max_middle_deg: int = 100_000,
):
    """EXACT 2-hop neighborhood sizes over a SYMMETRIC edge list:
    ``(entity, n_ball2)`` with ``n_ball2 = |{x : 0 < dist(entity, x)
    <= 2}|`` — the neighborhood-growth signal behind centrality and
    spam/hub detection.

    Distributed shape: exchange 1 groups the edge stream by the MIDDLE
    node and emits each group's deduplicated ordered neighbor pairs
    (the 2-hop candidates) plus nothing else — direct edges join the
    stream as-is; exchange 2 counts distinct targets per source.  The
    wedge volume is sum(deg(m)^2), the inherent cost of an exact
    answer; ``max_middle_deg`` FAILS LOUDLY (never silently caps) when
    a hub would make one group's emission quadratically explosive —
    at that scale use :func:`hyperball_counts`, the sketch path.
    Single-task fast path under ``local_threshold`` edges."""
    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.materialize()
    _check_symmetric(edges, num_buckets)
    if edges.count() <= local_threshold:
        return edges.repartition(1).map_batches(
            _local_ball2, batch_format="pyarrow", batch_size=None
        )

    def bucket_by_a(batch: pa.Table) -> pa.Table:
        av = pd.Series(batch["a"].to_numpy(zero_copy_only=False)).astype(str)
        return pa.table(
            {
                "a": pa.array(av, pa.string()),
                "b": batch["b"].cast(pa.string()),
                "_bucket": pa.array(bucket_of(av, num_buckets), pa.int32()),
            }
        )

    def wedge_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """Per middle-node group: deduped neighbor list -> ordered
        pairs (u, v), u != v, emitted keyed by u; plus the group's
        direct edges (m -> neighbor)."""
        out_u, out_v = [], []
        for m, g in df.groupby("a", sort=False):
            nbrs = np.unique(g["b"].to_numpy(dtype=object).astype(str))
            d = len(nbrs)
            if d > max_middle_deg:
                raise ValueError(
                    f"two_hop_counts: middle node {m!r} has degree {d} >"
                    f" max_middle_deg={max_middle_deg}; the exact wedge"
                    " join is quadratic in hub degree — use"
                    " hyperball_counts for this graph"
                )
            if d > 1:
                li = np.repeat(np.arange(d), d)
                ri = np.tile(np.arange(d), d)
                keep = li != ri
                out_u.append(nbrs[li[keep]])
                out_v.append(nbrs[ri[keep]])
            out_u.append(np.full(d, m, dtype=object))
            out_v.append(nbrs)
        if not out_u:
            return pd.DataFrame(
                {"u": pd.Series(dtype=str), "x": pd.Series(dtype=str),
                 "_bucket": pd.Series(dtype=np.int32)}
            )
        u = np.concatenate(out_u)
        x = np.concatenate(out_v)
        df2 = pd.DataFrame({"u": u, "x": x}).drop_duplicates()
        df2["_bucket"] = bucket_of(
            df2["u"].astype(str), num_buckets
        ).astype(np.int32)
        return df2

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.drop_duplicates(["u", "x"])
            .groupby("u", sort=False)
            .size()
            .rename("n_ball2")
            .reset_index()
        )
        return pd.DataFrame(
            {"entity": g["u"].to_numpy(dtype=object),
             "n_ball2": g["n_ball2"].to_numpy(np.int64)}
        )

    return (
        edges.map_batches(bucket_by_a, batch_format="pyarrow")
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(wedge_pairs), batch_format="pandas")
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(count_distinct), batch_format="pandas")
    )


HYPERBALL_P = 10  # 1024 registers/node: sigma = 1.04/32 ~ 3.3%


def _hll_node_hash(nodes: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash per node string (blake2b, engine-side
    only — the tolerance oracle never recomputes it)."""
    import hashlib

    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
            )
            for s in nodes
        ),
        dtype=np.uint64,
        count=len(nodes),
    )


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (float64 log2 rounds
    wrongly above 2^53 — a power-of-2 boundary crossing would corrupt
    the register rank)."""
    x = x.copy()
    bl = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        x[m] >>= np.uint64(s)
    bl[x > 0] += 1  # x is now 0 or 1
    return bl


def _hll_registers(nodes: np.ndarray, p: int) -> np.ndarray:
    """(n, m) uint8 register matrix: row i = HLL registers of the
    singleton {node_i} (one nonzero register)."""
    m = 1 << p
    h = _hll_node_hash(nodes)
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    rest = h >> np.uint64(p)
    # rho = 1 + number of leading zeros in the (64 - p)-bit remainder
    width = 64 - p
    rho = (width - _bit_length_u64(rest) + 1).astype(np.uint8)
    regs = np.zeros((len(nodes), m), dtype=np.uint8)
    regs[np.arange(len(nodes)), idx] = rho
    return regs


def _hll_estimate(regs: np.ndarray, p: int) -> np.ndarray:
    """Standard HLL estimate per row with the small-range linear
    counting correction — pure float64 arithmetic, deterministic."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv = np.power(2.0, -regs.astype(np.float64)).sum(axis=1)
    est = alpha * m * m / inv
    zeros = (regs == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = m * np.log(m / np.maximum(zeros, 1).astype(np.float64))
    return np.where(small, lin, est)


def hyperball_counts(
    edges_ds,
    rounds: int = 2,
    p: int = HYPERBALL_P,
    num_buckets: Optional[int] = None,
    local_threshold: int = 4_000_000,
):
    """HyperBall (Boldi & Vigna 2013): APPROXIMATE r-hop ball sizes
    ``(entity, est_ball)`` — per-node HyperLogLog registers advanced by
    ``rounds`` max-merge exchanges over the SYMMETRIC edge list.  The
    estimate includes the node itself (the round-0 singleton).

    This is the scale path where :func:`two_hop_counts`' exact wedge
    join explodes on hubs: state is nodes x 2^p bytes (1 KB/node at
    p=10) and each round moves edges x 2^p bytes through ONE co-group
    — linear in edges, hub-proof.  Every ingredient is deterministic
    (blake2b node hashes, order-free register max), so the estimate is
    reproducible under any partitioning and a tolerance claim against
    the exact count is a fixed boolean per corpus (the HLL/tolerance
    oracle pattern)."""
    import ray.data as rd

    num_buckets = resolve_parallelism(num_buckets)
    m = 1 << p
    edges = edges_ds.materialize()
    _check_symmetric(edges, num_buckets)

    if edges.count() <= local_threshold:
        def local(batch: pa.Table) -> pa.Table:
            a = batch["a"].to_numpy(zero_copy_only=False).astype(str)
            b = batch["b"].to_numpy(zero_copy_only=False).astype(str)
            if len(a) == 0:
                return pa.table(
                    {"entity": pa.array([], pa.string()),
                     "est_ball": pa.array([], pa.float64())}
                )
            nodes, inv = np.unique(
                np.concatenate([a, b]), return_inverse=True
            )
            src, dst = inv[: len(a)], inv[len(a):]
            regs = _hll_registers(nodes, p)
            chunk = 65536  # bound the (chunk, m) gather at ~64 MB
            for _ in range(rounds):
                nxt = regs.copy()
                for s0 in range(0, len(src), chunk):
                    sl = slice(s0, s0 + chunk)
                    np.maximum.at(nxt, dst[sl], regs[src[sl]])
                regs = nxt
            return pa.table(
                {
                    "entity": pa.array(nodes.tolist(), pa.string()),
                    "est_ball": pa.array(_hll_estimate(regs, p)),
                }
            )

        return edges.repartition(1).map_batches(
            local, batch_format="pyarrow", batch_size=None
        )

    # ---- dataset-resident register state (the pagerank posture) -----
    _HB_TAG = pa.schema(
        [
            ("side", pa.int8()),
            ("key", pa.string()),  # co-group key: edge 'a' / state node
            ("b", pa.string()),
            ("regs", pa.binary()),
            ("_bucket", pa.int32()),
        ]
    )

    def init_state(batch: pa.Table) -> pa.Table:
        nodes = np.unique(
            pd.Series(batch["a"].to_numpy(zero_copy_only=False)).astype(str)
        )
        regs = _hll_registers(nodes, p)
        return pa.table(
            {
                "node": pa.array(nodes.tolist(), pa.string()),
                "regs": pa.array([r.tobytes() for r in regs], pa.binary()),
                "_bucket": pa.array(
                    bucket_of(pd.Series(nodes, dtype=object), num_buckets),
                    pa.int32(),
                ),
            }
        )

    def dedup_state(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("node")[["node", "regs", "_bucket"]]

    state = (
        edges.map_batches(init_state, batch_format="pyarrow")
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(dedup_state), batch_format="pandas")
        .materialize()
    )

    def tag_edges(batch: pa.Table) -> pa.Table:
        av = pd.Series(batch["a"].to_numpy(zero_copy_only=False)).astype(str)
        n = len(av)
        return pa.table(
            {
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "key": pa.array(av, pa.string()),
                "b": batch["b"].cast(pa.string()),
                "regs": pa.array([b""] * n, pa.binary()),
                "_bucket": pa.array(bucket_of(av, num_buckets), pa.int32()),
            },
            schema=_HB_TAG,
        )

    def tag_state(batch: pa.Table) -> pa.Table:
        nv = pd.Series(
            batch["node"].to_numpy(zero_copy_only=False)
        ).astype(str)
        n = len(nv)
        return pa.table(
            {
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "key": pa.array(nv, pa.string()),
                "b": pa.array([""] * n, pa.string()),
                "regs": batch["regs"],
                "_bucket": pa.array(bucket_of(nv, num_buckets), pa.int32()),
            },
            schema=_HB_TAG,
        )

    def send_regs(df: pd.DataFrame) -> pd.DataFrame:
        """Co-group on the source endpoint: ship the source's registers
        to every neighbor, plus a self-carry row."""
        e = df[df["side"] == 0]
        s = df[df["side"] == 1]
        if len(s) == 0:
            return pd.DataFrame(
                {"node": pd.Series(dtype=str),
                 "regs": pd.Series(dtype=object),
                 "_bucket": pd.Series(dtype=np.int32)}
            )
        smap = pd.Series(
            s["regs"].to_numpy(), index=s["key"].to_numpy(dtype=object)
        )
        dst = e["b"].to_numpy(dtype=object).astype(str)
        regs = smap.loc[e["key"].to_numpy(dtype=object)].to_numpy()
        out_n = np.concatenate([dst, s["key"].to_numpy(dtype=object)])
        out_r = np.concatenate([regs, s["regs"].to_numpy()])
        out = pd.DataFrame({"node": out_n, "regs": out_r})
        out["_bucket"] = bucket_of(
            out["node"].astype(str), num_buckets
        ).astype(np.int32)
        return out

    def max_merge(df: pd.DataFrame) -> pd.DataFrame:
        nodes_out, regs_out = [], []
        for node, g in df.groupby("node", sort=False):
            mat = np.frombuffer(
                b"".join(g["regs"].tolist()), dtype=np.uint8
            ).reshape(-1, m)
            nodes_out.append(node)
            regs_out.append(mat.max(axis=0).tobytes())
        out = pd.DataFrame({"node": nodes_out, "regs": regs_out})
        out["_bucket"] = bucket_of(
            out["node"].astype(str), num_buckets
        ).astype(np.int32)
        return out

    for _ in range(rounds):
        tagged = edges.map_batches(tag_edges, batch_format="pyarrow").union(
            state.map_batches(tag_state, batch_format="pyarrow")
        )
        sent = (
            tagged.repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(arrowed(send_regs), batch_format="pandas")
        )
        state = (
            sent.repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(arrowed(max_merge), batch_format="pandas")
            .materialize()
        )

    def finish(batch: pa.Table) -> pa.Table:
        regs = np.frombuffer(
            b"".join(batch["regs"].to_pylist()), dtype=np.uint8
        ).reshape(-1, m)
        return pa.table(
            {
                "entity": batch["node"].cast(pa.string()),
                "est_ball": pa.array(_hll_estimate(regs, p)),
            }
        )

    return state.map_batches(finish, batch_format="pyarrow")


def ball2_check(
    edges_ds,
    tol: float = 0.10,
    p: int = HYPERBALL_P,
    num_buckets: Optional[int] = None,
    local_threshold: int = 4_000_000,
):
    """Exact 2-hop ball sizes cross-validated by HyperBall: ``(entity,
    n_ball2, hll_within_10pct)`` — the exact wedge-join count plus a
    deterministic boolean claiming the HyperBall estimate (which
    includes self) sits within ``tol`` of ``n_ball2 + 1``.  Both
    ingredients are partition-independent, so the flag is a fixed
    property of the corpus (the approx_distinct tolerance-oracle
    pattern applied to graph sketches)."""
    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.materialize()
    exact = two_hop_counts(
        edges, num_buckets=num_buckets, local_threshold=local_threshold
    )
    est = hyperball_counts(
        edges,
        rounds=2,
        p=p,
        num_buckets=num_buckets,
        local_threshold=local_threshold,
    )

    _BC_TAG = pa.schema(
        [
            ("side", pa.int8()),
            ("key", pa.string()),
            ("v", pa.float64()),
            ("_bucket", pa.int32()),
        ]
    )

    def tag(side: int, key_col: str, v_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            kv = pd.Series(
                batch[key_col].to_numpy(zero_copy_only=False)
            ).astype(str)
            n = len(kv)
            return pa.table(
                {
                    "side": pa.array(np.full(n, side, dtype=np.int8)),
                    "key": pa.array(kv, pa.string()),
                    "v": batch[v_col].cast(pa.float64()),
                    "_bucket": pa.array(
                        bucket_of(kv, num_buckets), pa.int32()
                    ),
                },
                schema=_BC_TAG,
            )

        return fn

    def join(df: pd.DataFrame) -> pd.DataFrame:
        ex = df[df["side"] == 0]
        es = df[df["side"] == 1]
        m_ = ex[["key", "v"]].merge(
            es[["key", "v"]], on="key", suffixes=("_x", "_e"), how="inner"
        )
        exact_n = m_["v_x"].to_numpy(np.float64)
        estv = m_["v_e"].to_numpy(np.float64)
        return pd.DataFrame(
            {
                "entity": m_["key"].to_numpy(dtype=object),
                "n_ball2": exact_n.astype(np.int64),
                "hll_within_10pct": np.abs(estv / (exact_n + 1.0) - 1.0)
                <= tol,
            }
        )

    tagged = exact.map_batches(
        tag(0, "entity", "n_ball2"), batch_format="pyarrow"
    ).union(est.map_batches(tag(1, "entity", "est_ball"), batch_format="pyarrow"))
    return (
        tagged.repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(join), batch_format="pandas")
    )


def harmonic_centrality_2(
    edges_ds,
    num_buckets: Optional[int] = None,
    local_threshold: int = 4_000_000,
):
    """Harmonic centrality truncated at radius 2: ``(entity, n1, n2,
    harmonic2)`` with ``n1`` = distinct neighbors, ``n2`` = the exact
    2-hop ball size and ``harmonic2 = n1 + (n2 - n1)/2`` (each
    distance-2 node contributes 1/2) — the bounded-radius centrality
    that 100-TB graphs actually compute (full closeness needs
    all-pairs distances).

    Composition: :func:`two_hop_counts` does the wedge work; the
    1-hop degree is a per-batch partial over the (distinct-pair)
    symmetric edge list; ONE tagged co-group joins the two — the
    single IEEE halving matches the SQL mirror bit-for-bit."""
    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.materialize()
    ball2 = two_hop_counts(
        edges, num_buckets=num_buckets, local_threshold=local_threshold
    )

    _HC_TAG = pa.schema(
        [
            ("side", pa.int8()),
            ("key", pa.string()),
            ("v", pa.int64()),
            ("_bucket", pa.int32()),
        ]
    )

    def deg_partial(batch: pa.Table) -> pa.Table:
        a = pd.Series(batch["a"].to_numpy(zero_copy_only=False)).astype(str)
        vals, cnt = np.unique(a.to_numpy(dtype=object), return_counts=True)
        kv = pd.Series(vals, dtype=object)
        return pa.table(
            {
                "side": pa.array(np.zeros(len(vals), dtype=np.int8)),
                "key": pa.array(vals.tolist(), pa.string()),
                "v": pa.array(cnt.astype(np.int64)),
                "_bucket": pa.array(bucket_of(kv, num_buckets), pa.int32()),
            },
            schema=_HC_TAG,
        )

    def tag_ball(batch: pa.Table) -> pa.Table:
        kv = pd.Series(
            batch["entity"].to_numpy(zero_copy_only=False)
        ).astype(str)
        n = len(kv)
        return pa.table(
            {
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "key": pa.array(kv, pa.string()),
                "v": batch["n_ball2"].cast(pa.int64()),
                "_bucket": pa.array(bucket_of(kv, num_buckets), pa.int32()),
            },
            schema=_HC_TAG,
        )

    def join(df: pd.DataFrame) -> pd.DataFrame:
        d = (
            df[df["side"] == 0]
            .groupby("key", sort=False)["v"]
            .sum()  # degree partials from different batches fold here
            .rename("n1")
            .reset_index()
        )
        b = df[df["side"] == 1][["key", "v"]].rename(columns={"v": "n2"})
        m = d.merge(b, on="key", how="inner")
        n1 = m["n1"].to_numpy(np.int64)
        n2 = m["n2"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "entity": m["key"].to_numpy(dtype=object),
                "n1": n1,
                "n2": n2,
                "harmonic2": n1 + (n2 - n1) / 2.0,
            }
        )

    tagged = edges.map_batches(deg_partial, batch_format="pyarrow").union(
        ball2.map_batches(tag_ball, batch_format="pyarrow")
    )
    return (
        tagged.repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(join), batch_format="pandas")
    )


LIFT_SCALE = 1_000_000  # fixed-point lift: floor(cnt * N * 1e6 / (ca * cb))


def _local_lift(batch: pa.Table) -> pa.Table:
    """Single-task lift kernel over one complete a<b edge block
    (``repartition(1)`` keeps the strings off the driver): weighted
    degrees via ``np.add.at``, then the same Python-big-int
    ``floor(cnt * N * 1e6 // (ca * cb))`` the distributed fold runs —
    bit-identical output, zero exchanges."""
    a = batch["a"].to_numpy(zero_copy_only=False).astype(str)
    b = batch["b"].to_numpy(zero_copy_only=False).astype(str)
    if len(a) == 0:
        return pa.table(
            {
                "a": pa.array([], pa.string()),
                "b": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
                "lift_x1e6": pa.array([], pa.int64()),
            }
        )
    cnt = batch["cnt"].to_numpy().astype(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    src, dst = inv[: len(a)], inv[len(a):]
    wdeg = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(wdeg, src, cnt)
    np.add.at(wdeg, dst, cnt)
    if _exact_sum_nonneg(wdeg) != 2 * _exact_sum_nonneg(cnt):
        raise OverflowError("cooccur_lift: weighted degree wrapped int64")
    n_total = _exact_sum_nonneg(cnt)  # exact Python int
    # Python-int arithmetic end-to-end (cnt * N * 1e6 exceeds int64)
    ca, cb, cc = wdeg[src].tolist(), wdeg[dst].tolist(), cnt.tolist()
    lift = [
        (c * n_total * LIFT_SCALE) // (x * y)
        for c, x, y in zip(cc, ca, cb)
    ]
    return pa.table(
        {
            "a": pa.array(a.tolist(), pa.string()),
            "b": pa.array(b.tolist(), pa.string()),
            "cnt": pa.array(cnt, pa.int64()),
            "lift_x1e6": pa.array(lift, pa.int64()),
        }
    )


def cooccur_lift(
    edges_ds,
    num_buckets: Optional[int] = None,
    local_edge_threshold: int = 4_000_000,
):
    """Association lift per co-mention pair: ``(a, b, cnt, lift_x1e6)``
    with ``lift = P(a,b) / (P(a) P(b))`` over mention events — the
    KG-pruning signal separating systematic relations from frequency
    coincidences (lift >> 1e6 fixed-point = genuinely associated).

    Everything stays INTEGRAL: ``lift_x1e6 = floor(cnt * N * 1e6 //
    (ca * cb))`` where ``N = sum(cnt)`` over the a<b pair list and
    ``ca`` is a's total co-mention weight — Python-int exact in the
    final fold (no int64 overflow: the numerator is computed per row
    as an object-dtype big int), bit-identical to the SQL mirror's
    HUGEINT arithmetic.

    Shape: one weighted-degree aggregate (bucketed partials), one
    tagged co-group attaching ``ca``/``cb`` to each pair (keyed twice
    — the wedge-family degree-attach pattern), zero broadcasts.  At or
    below ``local_edge_threshold`` pairs the whole computation runs as
    ONE worker-side task (:func:`_local_lift`) — same numbers, none of
    the fixed exchange cost."""
    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.materialize()  # a < b rows (the cooccur contract)

    if edges.count() <= local_edge_threshold:
        return edges.repartition(1).map_batches(
            _local_lift, batch_format="pyarrow", batch_size=None
        )

    # total weight N: per-block partial sums -> driver scalar (exact:
    # int64 partials, Python-int fold)
    parts = edges.map_batches(
        lambda t: pa.table(
            {"s": pa.array([int(t["cnt"].to_numpy().sum())], pa.int64())}
        ),
        batch_format="pyarrow",
    ).to_pandas()
    n_total = int(parts["s"].sum())

    _LF_TAG = pa.schema(
        [
            ("side", pa.int8()),  # 0 = pair row, 1 = degree state
            ("key", pa.string()),
            ("other", pa.string()),
            ("cnt", pa.int64()),
            ("deg", pa.int64()),
            ("keyed_on_a", pa.int8()),  # pair rows: which endpoint keys
            ("_bucket", pa.int32()),
        ]
    )

    def deg_partial(batch: pa.Table) -> pd.DataFrame:
        # weighted degree counts BOTH endpoints of each a<b pair
        a = pd.Series(batch["a"].to_numpy(zero_copy_only=False)).astype(str)
        b = pd.Series(batch["b"].to_numpy(zero_copy_only=False)).astype(str)
        w = batch["cnt"].to_numpy().astype(np.int64)
        node = np.concatenate([a.to_numpy(dtype=object), b.to_numpy(dtype=object)])
        ww = np.concatenate([w, w])
        vals, inv = np.unique(node.astype(str), return_inverse=True)
        deg = np.zeros(len(vals), dtype=np.int64)
        np.add.at(deg, inv, ww)
        return pd.DataFrame(
            {
                "node": vals,
                "deg": deg,
                "_bucket": bucket_of(
                    pd.Series(vals, dtype=object), num_buckets
                ).astype(np.int32),
            }
        )

    def deg_merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False, as_index=False)["deg"].sum()
        g["_bucket"] = bucket_of(g["node"].astype(str), num_buckets).astype(
            np.int32
        )
        return g

    deg_ds = (
        edges.map_batches(arrowed(deg_partial), batch_format="pyarrow")
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(deg_merge), batch_format="pandas")
        .materialize()
    )

    def tag_pairs(key_col: str, other_col: str, keyed_on_a: int):
        def fn(batch: pa.Table) -> pa.Table:
            kv = pd.Series(
                batch[key_col].to_numpy(zero_copy_only=False)
            ).astype(str)
            n = len(kv)
            return pa.table(
                {
                    "side": pa.array(np.zeros(n, dtype=np.int8)),
                    "key": pa.array(kv, pa.string()),
                    "other": batch[other_col].cast(pa.string()),
                    "cnt": batch["cnt"].cast(pa.int64()),
                    "deg": pa.array(np.zeros(n, dtype=np.int64)),
                    "keyed_on_a": pa.array(
                        np.full(n, keyed_on_a, dtype=np.int8)
                    ),
                    "_bucket": pa.array(
                        bucket_of(kv, num_buckets), pa.int32()
                    ),
                },
                schema=_LF_TAG,
            )

        return fn

    def tag_deg(batch: pa.Table) -> pa.Table:
        kv = pd.Series(batch["node"].to_numpy(zero_copy_only=False)).astype(str)
        n = len(kv)
        return pa.table(
            {
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "key": pa.array(kv, pa.string()),
                "other": pa.array([""] * n, pa.string()),
                "cnt": pa.array(np.zeros(n, dtype=np.int64)),
                "deg": batch["deg"].cast(pa.int64()),
                "keyed_on_a": pa.array(np.zeros(n, dtype=np.int8)),
                "_bucket": pa.array(bucket_of(kv, num_buckets), pa.int32()),
            },
            schema=_LF_TAG,
        )

    def attach_a(df: pd.DataFrame) -> pd.DataFrame:
        """Attach ca to pairs keyed on a; re-key output by b."""
        pr = df[df["side"] == 0]
        dg = df[df["side"] == 1]
        m = pr.merge(
            dg[["key", "deg"]].rename(columns={"deg": "ca"}),
            on="key",
            how="inner",
        )
        out = pd.DataFrame(
            {
                "key": m["other"].to_numpy(dtype=object),  # now keyed by b
                "other": m["key"].to_numpy(dtype=object),
                "cnt": m["cnt"].to_numpy(np.int64),
                "deg": m["ca"].to_numpy(np.int64),  # carries ca forward
                "keyed_on_a": np.int8(0),
                "side": np.int8(0),
            }
        )
        out["_bucket"] = bucket_of(out["key"].astype(str), num_buckets).astype(
            np.int32
        )
        return out[["side", "key", "other", "cnt", "deg", "keyed_on_a", "_bucket"]]

    def attach_b_and_lift(df: pd.DataFrame) -> pd.DataFrame:
        pr = df[df["side"] == 0]
        dg = df[df["side"] == 1]
        m = pr.merge(
            dg[["key", "deg"]].rename(columns={"deg": "cb"}),
            on="key",
            how="inner",
        )
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype=str),
                    "b": pd.Series(dtype=str),
                    "cnt": pd.Series(dtype=np.int64),
                    "lift_x1e6": pd.Series(dtype=np.int64),
                }
            )
        cnt = m["cnt"].astype(object)  # Python ints: overflow-proof
        ca = m["deg"].astype(object)
        cb = m["cb"].astype(object)
        lift = (cnt * n_total * LIFT_SCALE) // (ca * cb)
        return pd.DataFrame(
            {
                "a": m["other"].to_numpy(dtype=object),
                "b": m["key"].to_numpy(dtype=object),
                "cnt": m["cnt"].to_numpy(np.int64),
                "lift_x1e6": lift.astype(np.int64),
            }
        )

    t1 = edges.map_batches(
        tag_pairs("a", "b", 1), batch_format="pyarrow"
    ).union(deg_ds.map_batches(tag_deg, batch_format="pyarrow"))
    keyed_b = (
        t1.repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(attach_a), batch_format="pandas")
    )
    t2 = keyed_b.map_batches(
        lambda t: t.cast(_LF_TAG), batch_format="pyarrow"
    ).union(deg_ds.map_batches(tag_deg, batch_format="pyarrow"))
    return (
        t2.repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(attach_b_and_lift), batch_format="pandas")
    )


def _local_hits(batch: pa.Table) -> pa.Table:
    """Single-task HITS kernel over one complete distinct-edge block
    (``repartition(1)`` keeps the strings off the driver): factorize
    endpoints, two integer half-step pushes via ``np.add.at`` —
    arithmetic-identical to the distributed rounds."""
    s = batch["subj"].to_numpy(zero_copy_only=False).astype(str)
    o = batch["obj"].to_numpy(zero_copy_only=False).astype(str)
    if len(s) == 0:
        return pa.table(
            {
                "node": pa.array([], pa.string()),
                "hub_int": pa.array([], pa.int64()),
                "auth_int": pa.array([], pa.int64()),
            }
        )
    nodes, inv = np.unique(np.concatenate([s, o]), return_inverse=True)
    si, oi = inv[: len(s)], inv[len(s):]
    n = len(nodes)
    # distinct (subj, obj) pairs — the kernel dedups itself, so the
    # local path never pays a bucketed distinct exchange
    codes = np.unique(si.astype(np.int64) * n + oi.astype(np.int64))
    si, oi = codes // n, codes % n
    # h1(u) = out-degree (a0 = 1 everywhere)
    h1 = np.bincount(si, minlength=n).astype(np.int64)
    # a1(v) = sum of h1(u) over in-edges (u, v)
    a1 = np.zeros(n, dtype=np.int64)
    np.add.at(a1, oi, h1[si])
    if _exact_sum_nonneg(a1) != _exact_sum_nonneg(h1[si]):
        raise OverflowError("hits: authority accumulation wrapped int64")
    # h2(u) = sum of a1(v) over out-edges (u, v)
    h2 = np.zeros(n, dtype=np.int64)
    np.add.at(h2, si, a1[oi])
    if _exact_sum_nonneg(h2) != _exact_sum_nonneg(a1[oi]):
        raise OverflowError("hits: hub accumulation wrapped int64")
    return pa.table(
        {
            "node": pa.array(nodes.tolist(), pa.string()),
            "hub_int": pa.array(h2, pa.int64()),
            "auth_int": pa.array(a1, pa.int64()),
        }
    )


def hits_scores(
    triples_ds,
    num_buckets: Optional[int] = None,
    local_edge_threshold: int = 4_000_000,
):
    """Integer-exact HITS (Kleinberg) hub/authority scores over the
    DIRECTED assertion graph ``subj -> obj`` (distinct pairs over the
    full triples table — on the doc->value bipartite KG, authority of
    a value = total assertion breadth of the documents asserting it;
    hub of a document weights its values' authority: the
    source-trust / fusion-confidence signal).

    Two half-step iterations from ``a0 = 1``::

        h1(u) = #out-edges of u
        a1(v) = sum over in-edges (u, v) of h1(u)
        h2(u) = sum over out-edges (u, v) of a1(v)

    No normalization inside the fixed budget, so every value is an
    int64 sum — bit-exact under any partitioning, mirrored 1:1 by the
    SQL oracle; accumulations carry the repo's exact hi/lo wrap guard
    (:func:`_exact_sum_nonneg`).  Output ``(node, hub_int, auth_int)``
    for every endpoint (zeros where a side is empty).

    Distributed path (above ``local_edge_threshold`` distinct edges):
    the open-vocabulary posture — state lives in hash-bucketed Dataset
    blocks, each half-step is one tagged-union co-group on the source
    endpoint plus one destination-bucket merge (the pagerank exchange
    shape); the final zero-filled outer merge is a third tagged
    co-group on the node universe.  No broadcast node maps.
    """
    num_buckets = resolve_parallelism(num_buckets)

    # distinct (subj, obj): per-batch dedup partials first (cheap, no
    # shuffle); the bucketed distinct merge is only paid on the
    # distributed path — the local kernel dedups itself
    def pair_partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "subj": batch["subj"].to_pandas().astype(str),
                "obj": batch["obj"].to_pandas().astype(str),
            }
        ).drop_duplicates()
        df["_bucket"] = bucket_of(
            df["subj"] + "\x1f" + df["obj"], num_buckets
        )
        return df

    def pair_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["subj", "obj"])[["subj", "obj"]]

    partials = (
        triples_ds.select_columns(["subj", "obj"])
        .map_batches(arrowed(pair_partial), batch_format="pyarrow")
        .materialize()
    )

    if partials.count() <= local_edge_threshold:
        # per-batch-deduped pairs upper-bound the distinct edge count
        return partials.repartition(1).map_batches(
            _local_hits, batch_format="pyarrow", batch_size=None
        )

    edges = (
        partials.repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(pair_distinct), batch_format="pandas")
        .materialize()
    )

    # ---- open-vocabulary distributed path ---------------------------
    _HT_TAG = pa.schema(
        [
            ("side", pa.int8()),  # 0 = edge row, 1 = state row
            ("key", pa.string()),
            ("dst", pa.string()),
            ("w", pa.int64()),
            ("_bucket", pa.int32()),
        ]
    )

    def tag_edges(src_col: str, dst_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            k = pd.Series(
                batch[src_col].to_numpy(zero_copy_only=False)
            ).astype(str)
            n = len(k)
            return pa.table(
                {
                    "side": pa.array(np.zeros(n, dtype=np.int8)),
                    "key": pa.array(k, pa.string()),
                    "dst": batch[dst_col].cast(pa.string()),
                    "w": pa.array(np.zeros(n, dtype=np.int64)),
                    "_bucket": pa.array(bucket_of(k, num_buckets), pa.int32()),
                },
                schema=_HT_TAG,
            )

        return fn

    def tag_state(batch: pa.Table) -> pa.Table:
        k = pd.Series(batch["node"].to_numpy(zero_copy_only=False)).astype(str)
        n = len(k)
        return pa.table(
            {
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "key": pa.array(k, pa.string()),
                "dst": pa.array([""] * n, pa.string()),
                "w": batch["w"].cast(pa.int64()),
                "_bucket": pa.array(bucket_of(k, num_buckets), pa.int32()),
            },
            schema=_HT_TAG,
        )

    def push(df: pd.DataFrame) -> pd.DataFrame:
        """Co-group kernel: attach state w(key) to edge rows, emit
        per-dst partial sums (missing state = 0: nodes with no score
        yet contribute nothing)."""
        e = df[df["side"] == 0]
        st = df[df["side"] == 1]
        if len(e) == 0:
            # typed Arrow empty (size-estimator spam rule)
            return pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "w": pa.array([], pa.int64()),
                    "_bucket": pa.array([], pa.int32()),
                }
            )
        m = pd.Series(st["w"].to_numpy(np.int64), index=st["key"].to_numpy())
        wv = e["key"].map(m).fillna(0).astype(np.int64).to_numpy()
        g = (
            pd.DataFrame({"node": e["dst"].to_numpy(), "w": wv})
            .groupby("node", sort=False, as_index=False)["w"]
            .sum()
        )
        gw = g["w"].to_numpy(np.int64)
        if bool((gw < 0).any()) or _exact_sum_nonneg(gw) != _exact_sum_nonneg(
            wv
        ):
            raise OverflowError("hits: push accumulation wrapped int64")
        g["_bucket"] = bucket_of(g["node"].astype(str), num_buckets).astype(
            np.int32
        )
        return g

    def merge_state(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False, as_index=False)["w"].sum()
        gw = g["w"].to_numpy(np.int64)
        win = df["w"].to_numpy(np.int64)
        if bool((gw < 0).any()) or _exact_sum_nonneg(gw) != _exact_sum_nonneg(
            win
        ):
            raise OverflowError("hits: merge accumulation wrapped int64")
        return g[["node", "w"]]

    def half_step(state_ds, src_col: str, dst_col: str):
        tagged = edges.map_batches(
            tag_edges(src_col, dst_col), batch_format="pyarrow"
        ).union(state_ds.map_batches(tag_state, batch_format="pyarrow"))
        return (
            tagged.repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(arrowed(push), batch_format="pandas")
            .repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(arrowed(merge_state), batch_format="pandas")
            .materialize()
        )

    # h1 = out-degree: push a0 = 1 along reversed edges would need an
    # a0 state; the count form is cheaper (node-bounded two-phase)
    def h1_partial(batch: pa.Table) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {"node": batch["subj"].to_pandas().astype(str)}
            )
            .groupby("node", sort=False, as_index=False)
            .size()
            .rename(columns={"size": "w"})
        )
        g["w"] = g["w"].astype(np.int64)
        g["_bucket"] = bucket_of(g["node"], num_buckets)
        return g

    h1_ds = (
        edges.map_batches(arrowed(h1_partial), batch_format="pyarrow")
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(merge_state), batch_format="pandas")
        .materialize()
    )
    a1_ds = half_step(h1_ds, "subj", "obj")
    h2_ds = half_step(a1_ds, "obj", "subj")

    # zero-filled outer merge over the endpoint universe: tagged union
    # (side 0 = hub rows, 1 = auth rows, 2 = universe rows)
    _OUT_TAG = pa.schema(
        [
            ("side", pa.int8()),
            ("node", pa.string()),
            ("w", pa.int64()),
            ("_bucket", pa.int32()),
        ]
    )

    def tag_out(side: int, col: str = "w"):
        def fn(batch: pa.Table) -> pa.Table:
            k = pd.Series(
                batch["node"].to_numpy(zero_copy_only=False)
            ).astype(str)
            n = len(k)
            w = (
                batch[col].cast(pa.int64())
                if col in batch.column_names
                else pa.array(np.zeros(n, dtype=np.int64))
            )
            return pa.table(
                {
                    "side": pa.array(np.full(n, side, dtype=np.int8)),
                    "node": pa.array(k, pa.string()),
                    "w": w,
                    "_bucket": pa.array(bucket_of(k, num_buckets), pa.int32()),
                },
                schema=_OUT_TAG,
            )

        return fn

    def universe(batch: pa.Table) -> pd.DataFrame:
        vals = np.unique(
            np.concatenate(
                [
                    batch["subj"].to_numpy(zero_copy_only=False).astype(str),
                    batch["obj"].to_numpy(zero_copy_only=False).astype(str),
                ]
            )
        )
        df = pd.DataFrame({"node": vals})
        df["w"] = np.int64(0)
        df["_bucket"] = bucket_of(df["node"], num_buckets)
        return df

    def outer(df: pd.DataFrame) -> pd.DataFrame:
        hub = df[df["side"] == 0].groupby("node")["w"].sum()
        auth = df[df["side"] == 1].groupby("node")["w"].sum()
        nodes = df[df["side"] == 2]["node"].drop_duplicates()
        return pd.DataFrame(
            {
                "node": nodes.to_numpy(dtype=object),
                "hub_int": nodes.map(hub).fillna(0).astype(np.int64).to_numpy(),
                "auth_int": nodes.map(auth)
                .fillna(0)
                .astype(np.int64)
                .to_numpy(),
            }
        )

    tagged_out = (
        h2_ds.map_batches(tag_out(0), batch_format="pyarrow")
        .union(a1_ds.map_batches(tag_out(1), batch_format="pyarrow"))
        .union(
            edges.map_batches(arrowed(universe), batch_format="pyarrow")
            .map_batches(tag_out(2), batch_format="pyarrow")
        )
    )
    return (
        tagged_out.repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(outer), batch_format="pandas")
    )


def _local_assort_partials(batch: pa.Table) -> pa.Table:
    """Single-task exact-sum kernel over one complete SYMMETRIC edge
    block: per-node degree = row count keyed on ``a`` (the symmetric
    contract), then the same ``(m, sx, sxx, sxy)`` decimal-string
    partial row the distributed ``attach_y_sums`` emits — the driver
    fold downstream is shared, so the two paths are bit-identical."""
    a = batch["a"].to_numpy(zero_copy_only=False).astype(str)
    b = batch["b"].to_numpy(zero_copy_only=False).astype(str)
    if len(a) == 0:
        return pa.table(
            {
                "m": pa.array([], pa.int64()),
                "sx": pa.array([], pa.string()),
                "sxx": pa.array([], pa.string()),
                "sxy": pa.array([], pa.string()),
            }
        )
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    src, dst = inv[: len(a)], inv[len(a):]
    deg = np.bincount(src, minlength=len(nodes)).astype(np.int64)
    # Python ints end-to-end: the squared sums exceed int64 early
    x, y = deg[src].tolist(), deg[dst].tolist()
    return pa.table(
        {
            "m": pa.array([len(a)], pa.int64()),
            "sx": pa.array([str(sum(x))], pa.string()),
            "sxx": pa.array([str(sum(v * v for v in x))], pa.string()),
            "sxy": pa.array(
                [str(sum(u * v for u, v in zip(x, y)))], pa.string()
            ),
        }
    )


def assortativity(
    edges_ds,
    num_buckets: Optional[int] = None,
    local_edge_threshold: int = 4_000_000,
):
    """Degree assortativity coefficient (Newman 2002) over a SYMMETRIC
    edge list — one row ``(m, assortativity)``: do hubs attach to hubs
    (r > 0) or to leaves (r < 0)?  The macro-structure scalar a KG
    health check reports next to clustering/kcore.

    On a symmetric list the x/y marginals coincide, so Pearson over
    edge-endpoint degrees collapses to ``r = (m*sxy - sx*sx) /
    (m*sxx - sx*sx)`` — every sum folded EXACTLY (per-group partials
    ship as decimal strings, the driver folds Python big ints, so no
    int64 ceiling at any edge volume), then ONE float division both
    engines execute identically (HUGEINT -> DOUBLE in the mirror).

    Shape: one degree aggregate + two degree-attach co-groups (the
    cooccur_lift pattern) + a bounded driver fold of num_buckets
    partial rows; at or below ``local_edge_threshold`` rows the
    partials come from ONE worker-side task
    (:func:`_local_assort_partials`) feeding the same fold.  Regular
    graphs (zero degree variance) yield NULL.
    """
    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.materialize()
    _check_symmetric(edges, num_buckets)

    if edges.count() <= local_edge_threshold:
        parts = (
            edges.repartition(1)
            .map_batches(
                _local_assort_partials,
                batch_format="pyarrow",
                batch_size=None,
            )
            .to_pandas()
        )
        return _assort_fold(parts)

    deg_ds = _degree_ds(edges, num_buckets)  # per-a counts == degree

    def tag_edge(key_col: str, other_col: str, x_col: Optional[str]):
        def fn(batch: pa.Table) -> pa.Table:
            kv = pd.Series(
                batch[key_col].to_numpy(zero_copy_only=False)
            ).astype(str)
            n = len(kv)
            x = (
                batch[x_col].cast(pa.int64())
                if x_col is not None and x_col in batch.column_names
                else pa.array(np.zeros(n, dtype=np.int64))
            )
            return pa.table(
                {
                    "side": pa.array(np.zeros(n, dtype=np.int8)),
                    "key": pa.array(kv, pa.string()),
                    "other": batch[other_col].cast(pa.string()),
                    "d": x,
                    "_bucket": pa.array(
                        bucket_of(kv, num_buckets), pa.int32()
                    ),
                },
                schema=_DEG_TAG,
            )

        return fn

    def attach_x(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["side"] == 0]
        s = df[df["side"] == 1]
        if len(e) == 0 or len(s) == 0:
            return pa.table(
                {
                    "key": pa.array([], pa.string()),
                    "other": pa.array([], pa.string()),
                    "x": pa.array([], pa.int64()),
                    "_bucket": pa.array([], pa.int32()),
                }
            )
        m = e[["key", "other"]].merge(s[["key", "d"]], on="key", how="inner")
        b = m["other"].to_numpy(dtype=object)
        return pd.DataFrame(
            {
                "key": b,  # re-keyed by the b endpoint
                "other": m["key"].to_numpy(dtype=object),
                "x": m["d"].to_numpy(np.int64),
                "_bucket": bucket_of(
                    pd.Series(b, dtype=object).astype(str), num_buckets
                ).astype(np.int32),
            }
        )

    def attach_y_sums(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["side"] == 0]
        s = df[df["side"] == 1]
        if len(e) == 0 or len(s) == 0:
            return pa.table(
                {
                    "m": pa.array([], pa.int64()),
                    "sx": pa.array([], pa.string()),
                    "sxx": pa.array([], pa.string()),
                    "sxy": pa.array([], pa.string()),
                }
            )
        mg = e[["key", "other", "d"]].rename(columns={"d": "x"}).merge(
            s[["key", "d"]].rename(columns={"d": "y"}), on="key", how="inner"
        )
        # exact big-int partials (object dtype = Python ints)
        x = mg["x"].astype(object)
        y = mg["y"].astype(object)
        return pd.DataFrame(
            {
                "m": [np.int64(len(mg))],
                "sx": [str(x.sum())],
                "sxx": [str((x * x).sum())],
                "sxy": [str((x * y).sum())],
            }
        )

    # exchange 1: attach deg(a), re-key by b
    t1 = edges.map_batches(
        tag_edge("a", "b", None), batch_format="pyarrow"
    ).union(deg_ds.map_batches(_tag_deg_state, batch_format="pyarrow"))
    keyed_b = (
        t1.repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(attach_x), batch_format="pandas")
    )

    def tag_stage2(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "key": batch["key"].cast(pa.string()),
                "other": batch["other"].cast(pa.string()),
                "d": batch["x"].cast(pa.int64()),
                "_bucket": batch["_bucket"].cast(pa.int32()),
            },
            schema=_DEG_TAG,
        )

    t2 = keyed_b.map_batches(tag_stage2, batch_format="pyarrow").union(
        deg_ds.map_batches(_tag_deg_state, batch_format="pyarrow")
    )
    parts = (
        t2.repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(attach_y_sums), batch_format="pandas")
        .to_pandas()
    )
    return _assort_fold(parts)


def _assort_fold(parts: pd.DataFrame) -> pd.DataFrame:
    """Bounded driver fold of (m, sx, sxx, sxy) decimal-string partial
    rows (≤ num_buckets of them) into the one-row result — shared by
    the local and distributed assortativity paths."""
    m = int(parts["m"].sum()) if len(parts) else 0
    sx = sum(int(v) for v in parts["sx"]) if len(parts) else 0
    sxx = sum(int(v) for v in parts["sxx"]) if len(parts) else 0
    sxy = sum(int(v) for v in parts["sxy"]) if len(parts) else 0
    num, den = m * sxy - sx * sx, m * sxx - sx * sx
    # ONE float division (mirror: CAST(HUGEINT AS DOUBLE) / ...)
    r = float(num) / float(den) if den != 0 else None
    return pd.DataFrame(
        {"m": pd.Series([m], dtype=np.int64),
         "assortativity": pd.Series([r], dtype=np.float64)}
    )


def _mm_pref(names: np.ndarray, rnd: int) -> np.ndarray:
    """Per-round salted preference key: md5 hex of ``f"{name}:{rnd}"``
    — deterministic, partition-independent, and computable in SQL
    (DuckDB ``md5(name || ':' || rnd)``), yet free of the min-NAME
    rule's pathology on sequentially-named graphs (a ring under min
    name proposes everyone 'backwards' and matches O(1) pairs/round;
    a salted hash matches a constant fraction)."""
    import hashlib

    suffix = f":{rnd}".encode()
    return np.fromiter(
        (hashlib.md5(str(x).encode() + suffix).hexdigest() for x in names),
        dtype="U32",
        count=len(names),
    )


def _local_matching(batch: pa.Table, n_rounds: int) -> pa.Table:
    """Single-task deterministic handshake matching over one complete
    SYMMETRIC edge block: each alive node proposes to its alive
    neighbor with the smallest (md5(name:round), name) key; mutual
    proposals match and leave the graph.  numpy mirror of the
    distributed rounds."""
    a = batch["a"].to_numpy(zero_copy_only=False).astype(str)
    b = batch["b"].to_numpy(zero_copy_only=False).astype(str)
    empty = pa.table(
        {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}
    )
    if len(a) == 0:
        return empty
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    src, dst = inv[: len(a)], inv[len(a):]
    alive = np.ones(len(nodes), dtype=bool)
    out_a: List[np.ndarray] = []
    out_b: List[np.ndarray] = []
    for rnd in range(1, n_rounds + 1):
        keep = alive[src] & alive[dst]
        s, d = src[keep], dst[keep]
        if len(s) == 0:
            break
        # candidate per node: min (md5(name:round), name) neighbor;
        # node codes are name-sorted, so the code is the name tiebreak
        pref = _mm_pref(nodes, rnd)
        order = np.lexsort((d, pref[d], s))
        ss, dd = s[order], d[order]
        first = np.ones(len(ss), dtype=bool)
        first[1:] = ss[1:] != ss[:-1]
        prop_src = ss[first]
        prop_dst = dd[first]
        # mutual: candidate-of-candidate == self
        cand = np.full(len(nodes), -1, dtype=np.int64)
        cand[prop_src] = prop_dst
        mutual = (cand[prop_dst] == prop_src) & (prop_src < prop_dst)
        if not mutual.any():
            break
        ma, mb = prop_src[mutual], prop_dst[mutual]
        out_a.append(ma)
        out_b.append(mb)
        alive[ma] = False
        alive[mb] = False
    if not out_a:
        return empty
    fa = np.concatenate(out_a)
    fb = np.concatenate(out_b)
    return pa.table(
        {
            "a": pa.array(nodes[fa], pa.string()),
            "b": pa.array(nodes[fb], pa.string()),
        }
    )


def maximal_matching(
    edges_ds,
    n_rounds: int = 8,
    num_buckets: Optional[int] = None,
    local_threshold: int = 4_000_000,
):
    """Deterministic greedy maximal matching over a SYMMETRIC edge
    list — the graph-coarsening primitive (multilevel partitioners
    contract matched pairs; a KG uses it to pair near-duplicate
    entities one-to-one).  Handshake rounds: every alive node proposes
    to its lexicographically SMALLEST alive neighbor; mutual proposals
    become matches and both endpoints leave.  Output the matched pairs
    ``(a, b)``, a < b, sorted.

    Fixed-round contract (the LPA/k-core posture, mirrored by the
    oracle's unrolled CTEs): converged rounds are no-ops; the greedy
    min-name rule makes every round's matches unique and
    partition-independent, so the result is deterministic with no
    randomness to reconcile across engines.

    Distributed shape per round: two alive-set semi-join co-groups
    (the k_core exchange), one per-node min-neighbor merge, one
    unordered-pair-key co-group for the mutual check, one alive-set
    anti merge.  Driver state: the alive/matched COUNTS only.
    """
    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.select_columns(["a", "b"]).materialize()
    _check_symmetric(edges, num_buckets)
    if edges.count() <= local_threshold:
        return edges.repartition(1).map_batches(
            lambda t: _local_matching(t, n_rounds),
            batch_format="pyarrow",
            batch_size=None,
        )

    import ray.data as rd

    _MM_TAG = pa.schema(
        [
            ("side", pa.int8()),
            ("key", pa.string()),
            ("other", pa.string()),
            ("_bucket", pa.int32()),
        ]
    )

    def tag_edges_on(key_col: str, other_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            kv = pd.Series(
                batch[key_col].to_numpy(zero_copy_only=False)
            ).astype(str)
            n = len(kv)
            return pa.table(
                {
                    "side": pa.array(np.zeros(n, dtype=np.int8)),
                    "key": pa.array(kv, pa.string()),
                    "other": batch[other_col].cast(pa.string()),
                    "_bucket": pa.array(
                        bucket_of(kv, num_buckets), pa.int32()
                    ),
                },
                schema=_MM_TAG,
            )

        return fn

    def tag_nodes(batch: pa.Table, col: str = "node") -> pa.Table:
        kv = pd.Series(batch[col].to_numpy(zero_copy_only=False)).astype(str)
        n = len(kv)
        return pa.table(
            {
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "key": pa.array(kv, pa.string()),
                "other": pa.array([""] * n, pa.string()),
                "_bucket": pa.array(bucket_of(kv, num_buckets), pa.int32()),
            },
            schema=_MM_TAG,
        )

    def semi_rekey(df: pd.DataFrame) -> pd.DataFrame:
        """Keep edge rows whose key is alive; re-key by other."""
        e = df[df["side"] == 0]
        s = df[df["side"] == 1]
        if len(e) == 0 or len(s) == 0:
            return pa.table(
                {
                    "key": pa.array([], pa.string()),
                    "other": pa.array([], pa.string()),
                    "_bucket": pa.array([], pa.int32()),
                }
            )
        sn = np.sort(s["key"].to_numpy(dtype=object).astype(str))
        kv = e["key"].to_numpy(dtype=object).astype(str)
        keep = np.isin(kv, sn)
        oth = e["other"].to_numpy(dtype=object).astype(str)[keep]
        return pd.DataFrame(
            {
                "key": oth,
                "other": kv[keep],
                "_bucket": bucket_of(
                    pd.Series(oth, dtype=object), num_buckets
                ).astype(np.int32),
            }
        )

    def make_semi_candidate(rnd: int):
        def semi_candidate(df: pd.DataFrame) -> pd.DataFrame:
            """Second semi-join + PER-BUCKET partial min proposal by
            the (md5(v:round), v) key.  The bucket key here is the v
            endpoint, so one proposer u can span buckets — these are
            partials; the global per-u min happens in propose_merge
            (u-keyed)."""
            e = df[df["side"] == 0]
            s = df[df["side"] == 1]
            if len(e) == 0 or len(s) == 0:
                return pa.table(
                    {
                        "u": pa.array([], pa.string()),
                        "v": pa.array([], pa.string()),
                        "h": pa.array([], pa.string()),
                        "_bucketu": pa.array([], pa.int32()),
                    }
                )
            sn = np.sort(s["key"].to_numpy(dtype=object).astype(str))
            kv = e["key"].to_numpy(dtype=object).astype(str)
            keep = np.isin(kv, sn)
            # rows are keyed by the ALIVE-verified 'key' endpoint; the
            # proposer is 'other' (alive-verified one exchange back)
            u = e["other"].to_numpy(dtype=object).astype(str)[keep]
            v = kv[keep]
            h = _mm_pref(v, rnd)
            df2 = pd.DataFrame({"u": u, "v": v, "h": h}).sort_values(
                ["u", "h", "v"], kind="stable"
            )
            g = df2.groupby("u", sort=False, as_index=False).head(1).copy()
            g["_bucketu"] = bucket_of(
                g["u"].astype(str), num_buckets
            ).astype(np.int32)
            return g

        return semi_candidate

    def propose_merge(df: pd.DataFrame) -> pd.DataFrame:
        """Global per-u min over the bucket partials (same (h, v)
        order); re-key by the unordered pair for the mutual check."""
        if len(df) == 0 or "u" not in df.columns:
            return pa.table(
                {
                    "u": pa.array([], pa.string()),
                    "v": pa.array([], pa.string()),
                    "_bucketp": pa.array([], pa.int32()),
                }
            )
        g = (
            df.sort_values(["u", "h", "v"], kind="stable")
            .groupby("u", sort=False, as_index=False)
            .head(1)[["u", "v"]]
            .copy()
        )
        pk = np.where(g["u"] < g["v"], g["u"], g["v"]).astype(str)
        pk2 = np.where(g["u"] < g["v"], g["v"], g["u"]).astype(str)
        g["_bucketp"] = bucket_of(
            pd.Series(pk, dtype=object) + "\x1f" + pd.Series(pk2, dtype=object),
            num_buckets,
        ).astype(np.int32)
        return g

    def mutual(df: pd.DataFrame) -> pd.DataFrame:
        """Unordered-pair co-group: a pair with BOTH directed proposals
        is a match."""
        if len(df) == 0 or "u" not in df.columns:
            return pa.table(
                {"a": pa.array([], pa.string()),
                 "b": pa.array([], pa.string())}
            )
        lo = np.where(df["u"] < df["v"], df["u"], df["v"]).astype(str)
        hi = np.where(df["u"] < df["v"], df["v"], df["u"]).astype(str)
        g = (
            pd.DataFrame({"a": lo, "b": hi})
            .groupby(["a", "b"], sort=False, as_index=False)
            .size()
        )
        m = g[g["size"] >= 2]
        return pd.DataFrame(
            {
                "a": m["a"].to_numpy(dtype=object),
                "b": m["b"].to_numpy(dtype=object),
            }
        )

    # node universe = every endpoint (two-phase distinct)
    def node_partial(batch: pa.Table) -> pd.DataFrame:
        vals = np.unique(
            np.concatenate(
                [
                    batch["a"].to_numpy(zero_copy_only=False).astype(str),
                    batch["b"].to_numpy(zero_copy_only=False).astype(str),
                ]
            )
        )
        df = pd.DataFrame({"node": vals})
        df["_bucket"] = bucket_of(df["node"], num_buckets)
        return df

    def node_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("node")[["node"]]

    alive_ds = (
        edges.map_batches(arrowed(node_partial), batch_format="pyarrow")
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(node_distinct), batch_format="pandas")
        .materialize()
    )
    n_alive = alive_ds.count()
    matched_parts = []

    def remove_matched(df: pd.DataFrame) -> pd.DataFrame:
        """side 1 = alive nodes, side 0 = matched-node rows (key)."""
        alive_rows = df[df["side"] == 1]
        dead = df[df["side"] == 0]
        if len(alive_rows) == 0:
            return pa.table({"node": pa.array([], pa.string())})
        av = alive_rows["key"].to_numpy(dtype=object).astype(str)
        dv = np.sort(dead["key"].to_numpy(dtype=object).astype(str))
        keep = ~np.isin(av, dv)
        return pd.DataFrame({"node": av[keep]})

    for rnd in range(1, n_rounds + 1):
        if n_alive < 2:
            break
        t1 = edges.map_batches(
            tag_edges_on("a", "b"), batch_format="pyarrow"
        ).union(alive_ds.map_batches(tag_nodes, batch_format="pyarrow"))
        keyed_b = (
            t1.repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(arrowed(semi_rekey), batch_format="pandas")
        )
        t2 = keyed_b.map_batches(
            lambda t: pa.table(
                {
                    "side": pa.array(np.zeros(len(t), dtype=np.int8)),
                    "key": t["key"].cast(pa.string()),
                    "other": t["other"].cast(pa.string()),
                    "_bucket": t["_bucket"].cast(pa.int32()),
                },
                schema=_MM_TAG,
            ),
            batch_format="pyarrow",
        ).union(alive_ds.map_batches(tag_nodes, batch_format="pyarrow"))
        proposals = (
            t2.repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(
                arrowed(make_semi_candidate(rnd)), batch_format="pandas"
            )
            .repartition(num_buckets)
            .groupby("_bucketu")
            .map_groups(arrowed(propose_merge), batch_format="pandas")
        )
        matches = (
            proposals.repartition(num_buckets)
            .groupby("_bucketp")
            .map_groups(arrowed(mutual), batch_format="pandas")
            .materialize()
        )
        n_matches = matches.count()
        if n_matches == 0:
            break
        matched_parts.append(matches)

        def tag_dead(batch: pa.Table) -> pa.Table:
            nodes_ = np.concatenate(
                [
                    batch["a"].to_numpy(zero_copy_only=False).astype(str),
                    batch["b"].to_numpy(zero_copy_only=False).astype(str),
                ]
            )
            return pa.table(
                {
                    "side": pa.array(np.zeros(len(nodes_), dtype=np.int8)),
                    "key": pa.array(nodes_, pa.string()),
                    "other": pa.array([""] * len(nodes_), pa.string()),
                    "_bucket": pa.array(
                        bucket_of(pd.Series(nodes_), num_buckets), pa.int32()
                    ),
                },
                schema=_MM_TAG,
            )

        t3 = matches.map_batches(tag_dead, batch_format="pyarrow").union(
            alive_ds.map_batches(tag_nodes, batch_format="pyarrow")
        )
        alive_ds = (
            t3.repartition(num_buckets)
            .groupby("_bucket")
            .map_groups(arrowed(remove_matched), batch_format="pandas")
            .materialize()
        )
        n_alive = alive_ds.count()

    if not matched_parts:
        return rd.from_arrow(
            pa.table(
                {"a": pa.array([], pa.string()), "b": pa.array([], pa.string())}
            )
        )
    out = matched_parts[0]
    for m in matched_parts[1:]:
        out = out.union(m)
    return out.sort(["a", "b"])
