"""The flagship pipeline: Parquet web pages -> (subj, pred, obj) graph.

    read pages -> extract+clean -> chunk -> score -> argmax -> label ->
    compound split -> project triples -> link -> canonicalize ->
    [entities] + sorted partitioned Parquet

Single wide operations: the (url, qa_id) argmax bucket-groupby, the
salted entity aggregation, and the final (subj, pred) sort.  Everything
else is narrow map_batches; heavy columns (html, text, context) are
dropped at the earliest stage that no longer needs them.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from ..registry import QuestionRegistry, default_type_names
from ..sources import synth
from ..stages.chunk import ChunkConfig, chunk_stage
from ..stages.clean import clean_stage
from ..stages.label import attach_na_labels, attach_synth_labels
from ..stages.link import link_stage
from ..stages.postprocess import best_window_stage, split_stage
from ..stages.score import MockT5Scorer, score_stage
from ..stages.triples import (
    canonicalize_obj_stage,
    entities_stage,
    project_stage,
    write_triples,
)


@dataclass
class KGConfig:
    chunk: ChunkConfig = field(default_factory=ChunkConfig)
    type_names: Optional[List[str]] = None
    use_compound: Optional[List[str]] = None
    use_fewer_na: bool = True  # postprocess.py:274-280 path
    label_mode: str = "na"  # 'na' (inference) | 'synth' (eval labels)
    num_buckets: Optional[int] = None  # None -> sized to cluster CPUs
    num_partitions: int = 64
    # autoscaling (min, max): a fixed pool equal to the CPU count can
    # starve the read stage in small local sessions; at cluster scale
    # pass a fixed int sized to the GPU/CPU budget
    scorer_concurrency: int | tuple = (1, 4)  # actors mode only
    scorer_batch_size: int | None = None  # None = whole blocks
    chunk_batch_size: int | None = None
    # fused chunk+score+argmax (stages/extract.py): shuffle-free and
    # partition-safe because the argmax key (url, qa_id) derives from a
    # single input row.  False = separable stages + (url,qa_id) groupby
    # (the reference-shaped plan; needed when windows must materialize)
    fused_extraction: bool = True

    def registry(self) -> QuestionRegistry:
        return QuestionRegistry.default()

    def resolved_type_names(self) -> List[str]:
        return self.type_names or default_type_names()

    def resolved_use_compound(self) -> List[str]:
        if self.use_compound is not None:
            return self.use_compound
        reg = self.registry()
        return [q for q in self.resolved_type_names() if reg.is_compound(q)]


def kg_best(pages_ds, cfg: Optional[KGConfig] = None):
    """pages Dataset -> best answer per (url, qa_id)."""
    cfg = cfg or KGConfig()
    reg = cfg.registry()
    tns = cfg.resolved_type_names()
    compound = cfg.resolved_use_compound()
    ds = clean_stage(pages_ds)
    if cfg.fused_extraction:
        from ..stages.extract import extract_best_stage

        return extract_best_stage(
            ds,
            chunk=cfg.chunk,
            registry=reg,
            type_names=tns,
            use_compound=compound,
            use_fewer_na=cfg.use_fewer_na,
        )
    ds = chunk_stage(ds, cfg.chunk, batch_size=cfg.chunk_batch_size)
    ds = score_stage(
        ds,
        MockT5Scorer,
        scorer_kwargs={
            "registry": reg,
            "type_names": tns,
            "use_compound": compound,
        },
        concurrency=cfg.scorer_concurrency,
        batch_size=cfg.scorer_batch_size,
    )
    return best_window_stage(
        ds, use_fewer_na=cfg.use_fewer_na, num_buckets=cfg.num_buckets
    )


def kg_answers(pages_ds, cfg: Optional[KGConfig] = None):
    """pages Dataset -> answers Dataset (variant rows, reference R5)."""
    cfg = cfg or KGConfig()
    reg = cfg.registry()
    tns = cfg.resolved_type_names()
    compound = cfg.resolved_use_compound()
    best = kg_best(pages_ds, cfg)
    if cfg.label_mode == "synth":
        best = attach_synth_labels(best, reg)
    else:
        qa_ids = reg.get_all_qa_ids(
            list_of_type_names=tns, list_of_use_compound_question=compound
        )
        best = attach_na_labels(best, reg, qa_ids)
    return split_stage(best, reg.type_to_typename)


def kg_triples(pages_ds, cfg: Optional[KGConfig] = None):
    """pages Dataset -> canonical triples Dataset."""
    cfg = cfg or KGConfig()
    answers = kg_answers(pages_ds, cfg)
    raw = project_stage(answers, num_partitions=cfg.num_partitions)
    linked = link_stage(raw)
    return canonicalize_obj_stage(linked)


def kg_entities(triples_ds, cfg: Optional[KGConfig] = None):
    cfg = cfg or KGConfig()
    return entities_stage(triples_ds, num_buckets=cfg.num_buckets)


def kg_t5_examples(pages_ds, cfg: Optional[KGConfig] = None, **squad_kwargs):
    """pages Dataset -> T5 training examples (the reference's E1 path:
    convert_dataset_to_squad + convert_squad_to_t5, as one streaming
    cross-product of windows x question schema)."""
    from ..stages.squad import t5_examples_stage

    cfg = cfg or KGConfig()
    ds = clean_stage(pages_ds)
    ds = chunk_stage(ds, cfg.chunk, batch_size=cfg.chunk_batch_size)
    return t5_examples_stage(
        ds,
        registry=cfg.registry(),
        type_names=cfg.resolved_type_names(),
        use_compound=cfg.resolved_use_compound(),
        **squad_kwargs,
    )


def run_t5_examples(sf_dir: str, cfg: Optional[KGConfig] = None, **kw):
    return kg_t5_examples(synth.read_pages(sf_dir), cfg, **kw)


def run_balanced_examples(
    sf_dir: str, cfg: Optional[KGConfig] = None, negative_ratio: int = 1
):
    """E1 + the reference's balance_data resampling, distributed
    (stages/balance.py)."""
    from ..stages.balance import balance_stage

    examples = run_t5_examples(sf_dir, cfg)
    return balance_stage(
        examples,
        key_cols=["url", "qa_id"],
        neg_col="is_negative",
        order_cols=["window_id", "question"],
        negative_ratio=negative_ratio,
    )


def kg_eval_metrics(
    sf_dir: str,
    cfg: Optional[KGConfig] = None,
    granularity: str = "qa_id",
):
    """Distributed EM/F1 harness over the flagship pipeline with
    synthetic ground-truth labels (reference metrics_by_typenames /
    metrics_by_documents JSONs, qa_model.py:305-319).

    granularity: 'qa_id'   -> best rows pre-split, grouped by qa_id
                              (+ project rollup + 'all') — oracle-checked;
                 'typename' -> split variant rows, reference typename
                              grouping incl. ~member/* collapsing;
                 'document' -> split rows grouped per url.
    """
    import dataclasses

    from ..stages.evalqa import eval_stage

    # don't mutate the caller's config — the same cfg object may drive a
    # subsequent run_kg/run_predict expecting its original label_mode
    cfg = dataclasses.replace(cfg, label_mode="synth") if cfg else KGConfig(
        label_mode="synth"
    )
    pages = synth.read_pages(sf_dir)
    if granularity == "qa_id":
        best = attach_synth_labels(kg_best(pages, cfg), cfg.registry())
        return eval_stage(best, id_col="qa_id", by="typenames")
    answers = kg_answers(pages, cfg)
    if granularity == "typename":
        return eval_stage(answers, id_col="example_id", by="typenames")
    return eval_stage(answers, id_col="url", by="documents")


def run_kg(
    sf_dir: str,
    out_dir: Optional[str] = None,
    cfg: Optional[KGConfig] = None,
):
    """sf_dir documents.parquet -> triples (optionally materialized to
    sorted partitioned Parquet)."""
    cfg = cfg or KGConfig()
    pages = synth.read_pages(sf_dir)
    triples = kg_triples(pages, cfg)
    if out_dir:
        write_triples(triples, out_dir)
    return triples


def simulate_extractor_upgrade(
    triples_ds,
    added_pred: str = "form.cpf",
    removed_pred: str = "form.agencia",
):
    """The repo's canonical churn pair for incremental-maintenance
    demos: derive ``(old, new)`` triple sets from ONE extraction, where
    v1 lacks ``added_pred`` and v2 drops ``removed_pred`` — so the diff
    stream is exactly (added ``added_pred`` triples) + (removed
    ``removed_pred`` triples).  Single source of truth for kg_diff,
    kg_degree_delta and the bench entries; the defaults MUST mirror
    ``sources/oracle.kg_diff_sql`` / ``kg_degree_delta_sql``.
    """
    import pyarrow.compute as pc

    def drop_pred(p):
        def f(batch):
            return batch.filter(pc.not_equal(batch["pred"], p))

        f.__name__ = f"drop_{p.split('.')[-1]}"
        return f

    old = triples_ds.map_batches(
        drop_pred(added_pred), batch_format="pyarrow"
    )
    new = triples_ds.map_batches(
        drop_pred(removed_pred), batch_format="pyarrow"
    )
    return old, new


def export_property_graph(triples_ds, out_dir: str):
    """Graph materialize, property-graph shape: the node and edge
    tables a graph database bulk-loader ingests —
    ``{out_dir}/nodes/`` (entity_id, n_mentions, example_surface;
    salted entities aggregation) and ``{out_dir}/edges/`` (a, b, cnt
    co-mention list), each sorted Parquet with the same footer-only
    ``_MANIFEST.json`` lineage as :func:`~..stages.triples.write_triples`.
    Complements the (subj, pred, obj) edge-list sink and the N-Triples
    interchange sink.  Returns ``(nodes_dir, edges_dir)``.
    """
    import os

    from ..stages.graph import cooccur_edges
    from ..stages.triples import _write_partition_manifest

    # two sinks consume the same triples: materialize once or the lazy
    # extraction pipeline re-executes per consumer
    triples_ds = triples_ds.materialize()
    nodes_dir = os.path.join(out_dir, "nodes")
    edges_dir = os.path.join(out_dir, "edges")
    # a rerun into an existing out_dir must not leave a previous run's
    # shards behind: write_parquet only ADDS files and the flat-dir
    # manifest globs *.parquet, so leftovers would be double-read
    # (same authoritative-cleanup contract as write_ntriples)
    for d in (nodes_dir, edges_dir):
        if os.path.isdir(d):
            for name in os.listdir(d):
                if name.endswith(".parquet") or name == "_MANIFEST.json":
                    os.remove(os.path.join(d, name))
    nodes = kg_entities(triples_ds)
    nodes.sort("entity_id").write_parquet(
        nodes_dir, min_rows_per_file=100_000
    )
    _write_partition_manifest(nodes_dir, partitioned=False)
    edges = cooccur_edges(triples_ds)
    edges.sort(["a", "b"]).write_parquet(
        edges_dir, min_rows_per_file=100_000
    )
    _write_partition_manifest(edges_dir, partitioned=False)
    return nodes_dir, edges_dir


# the kg_fuse demo's disagreement mods — single source of truth shared
# by the query, the bench entry, and sources/oracle.kg_fuse_sql's
# defaults (same contract note as simulate_extractor_upgrade)
FUSE_MODS = (3, 5)


def perturb_objs(triples_ds, mod: int, prefix: str = "alt-"):
    """Deterministic disagreement injector for fusion demos: rewrite
    every object to ``prefix + obj`` on pages whose id (last 8 url
    chars, the pages-source contract) is divisible by ``mod``.  Used by
    the kg_fuse query to derive disagreeing extractor versions from one
    extraction; the SQL mirror applies the same CASE."""
    import numpy as np
    import pyarrow as pa

    def perturb(batch: pa.Table) -> pa.Table:
        subj = batch["subj"].to_pandas().astype(str)
        obj = batch["obj"].to_pandas().astype(str)
        hit = (subj.str[-8:].astype(np.int64) % mod == 0).to_numpy()
        out = obj.to_numpy(dtype=object)
        out[hit] = prefix + out[hit]
        return pa.table(
            {
                "subj": pa.array(subj, pa.string()),
                "pred": pa.array(
                    batch["pred"].to_pandas().astype(str), pa.string()
                ),
                "obj": pa.array(out, pa.string()),
            }
        )

    perturb.__name__ = f"perturb_mod{mod}"
    return triples_ds.map_batches(perturb, batch_format="pyarrow")


def kg_temporal(
    sf_dir: str,
    cfg: Optional[KGConfig] = None,
    num_partitions: Optional[int] = None,
):
    """Temporal KG: every extracted triple carries its page's LATEST
    content-validity interval from the multi-snapshot crawl — the
    SCD-2 provenance primitive ("this assertion reflects the page
    version observed over [valid_from, valid_to]").

    Composition, all bounded exchanges:

    1. ``stages.crawl.snapshot_intervals`` compacts the snapshot
       stream into per-(url, content run) validity intervals (one
       bucketed exchange);
    2. per-url LATEST interval via the two-phase tail-1 argmax on
       ``valid_to`` (intervals partition each url's timeline, so the
       max is unique) — one candidate row per (batch, url) on the
       wire;
    3. a vectorized remap from the crawl url to the page subject url
       (both embed the zero-padded doc id — sources/crawl.py:33,
       sources/synth.py URL scheme);
    4. a large-large hash join with the extracted triples on ``subj``
       (both sides exchange; the interval side is one row per url).

    Output ``(subj, pred, obj, valid_from, valid_to)``.
    """
    triples = kg_triples(synth.read_pages(sf_dir), cfg or KGConfig())
    return kg_temporal_join(triples, sf_dir, num_partitions=num_partitions)


def kg_temporal_join(triples_ds, sf_dir: str, num_partitions=None):
    """Stages 1-4 of :func:`kg_temporal` over an ALREADY-BUILT triples
    Dataset (production shape: the flagship materialize exists before
    provenance enrichment runs; bench.py times this join without
    re-timing the extraction).

    The subj join is the repo's tagged-union co-group (the asof-join
    shape, stages/joins.py): both sides bucket on subj hash into ONE
    sort exchange with a fixed Arrow schema (typed nulls for the
    columns each side lacks), then one vectorized pandas merge per
    bucket — Ray's ``Dataset.join`` hash-shuffle aggregator pays a
    multi-second fixed spin-up per call on small inputs, where this
    plan's cost tracks the data.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..sources.crawl import read_crawl
    from ..sources.synth import URL_PREFIX
    from ..stages.common import arrowed, bucket_of, resolve_parallelism
    from ..stages.crawl import latest_intervals

    num_buckets = resolve_parallelism(num_partitions)
    # fused compaction + latest-run argmax: ONE exchange over the
    # snapshot stream (stages/crawl.latest_intervals), then the join
    # sort — two all-to-alls total for the whole provenance attach
    iv = latest_intervals(read_crawl(sf_dir))
    ts = pa.timestamp("us")
    union_schema = pa.schema(
        [
            pa.field("subj", pa.string()),
            pa.field("pred", pa.string()),
            pa.field("obj", pa.string()),
            pa.field("valid_from", ts),
            pa.field("valid_to", ts),
            pa.field("_side", pa.int8()),
            pa.field("_bucket", pa.int32()),
        ]
    )

    def iv_rows(batch: pa.Table) -> pa.Table:
        # crawl url suffix = zero-padded doc id = page url suffix
        url = pd.Series(batch["url"].to_pandas().astype(str))
        subj = (URL_PREFIX + url.str[-8:]).to_numpy(dtype=object)
        n = len(url)
        return pa.Table.from_arrays(
            [
                pa.array(subj, pa.string()),
                pa.nulls(n, pa.string()),
                pa.nulls(n, pa.string()),
                batch["valid_from"].cast(ts),
                batch["valid_to"].cast(ts),
                pa.array(np.full(n, 1, np.int8)),
                pa.array(
                    bucket_of(pd.Series(subj, dtype=object), num_buckets)
                ),
            ],
            schema=union_schema,
        )

    def tri_rows(batch: pa.Table) -> pa.Table:
        subj = batch["subj"].to_numpy(zero_copy_only=False).astype(object)
        n = len(subj)
        return pa.Table.from_arrays(
            [
                batch["subj"].cast(pa.string()),
                batch["pred"].cast(pa.string()),
                batch["obj"].cast(pa.string()),
                pa.nulls(n, ts),
                pa.nulls(n, ts),
                pa.array(np.zeros(n, np.int8)),
                pa.array(
                    bucket_of(pd.Series(subj, dtype=object), num_buckets)
                ),
            ],
            schema=union_schema,
        )

    tagged = iv.map_batches(iv_rows, batch_format="pyarrow").union(
        triples_ds.select_columns(["subj", "pred", "obj"]).map_batches(
            tri_rows, batch_format="pyarrow", batch_size=16384
        )
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        side = df["_side"].to_numpy()
        left = df.loc[side == 0, ["subj", "pred", "obj"]]
        right = df.loc[side == 1, ["subj", "valid_from", "valid_to"]]
        return left.merge(right, on="subj", how="inner")

    return tagged.groupby("_bucket").map_groups(
        arrowed(join_bucket), batch_format="pandas"
    )


def run_kg_sharded(
    sf_dir: str,
    ckpt_dir: str,
    cfg: Optional[KGConfig] = None,
    num_shards: int = 8,
):
    """Partition-granular checkpointed resume: the input splits into
    ``num_shards`` deterministic doc_id shards, each flowing through the
    WHOLE pipeline into its own Parquet dir + lineage manifest.  A
    failed/killed run reruns only the shards whose manifest is missing
    or stale — the north rule's "skip finished partitions" semantics
    (at real scale each shard is an input file range and shards are
    separate ``ray job submit`` units).

    Returns (union triples Dataset, {shard: skipped_bool}).
    """
    from ..state import manifest as mf

    cfg = cfg or KGConfig()
    cfg_fp = mf.fingerprint("kgconfig", repr(cfg))
    # the shard -> row-set mapping depends on the RESOLVED file layout
    # (file-range selection): recompacting the same rows into a
    # different file count reshuffles every shard's contents, so the
    # layout must be part of each shard's fingerprint or resume would
    # skip 'done' shards holding the WRONG row subsets
    import os

    layout_fp = ",".join(
        os.path.basename(p) for p in synth.documents_paths(sf_dir)
    )
    skipped = {}
    parts = []
    for k in range(num_shards):
        fp = mf.fingerprint(
            "triples-shard", sf_dir, cfg_fp, f"{k}/{num_shards}", layout_fp
        )

        def build(k=k):
            pages = synth.read_pages(sf_dir, shard=(k, num_shards))
            return kg_triples(pages, cfg)

        ds, skipped[k] = mf.checkpointed(
            build, f"{ckpt_dir}/shard={k}", f"triples-shard-{k}", fp
        )
        parts.append(ds)
    out = parts[0]
    for extra in parts[1:]:
        out = out.union(extra)
    return out, skipped


def run_kg_checkpointed(
    sf_dir: str,
    ckpt_dir: str,
    cfg: Optional[KGConfig] = None,
):
    """Checkpointed flagship run: every stage boundary materializes to
    ``{ckpt_dir}/{stage}/`` with a lineage manifest; a rerun with the
    same inputs/config SKIPS completed stages (the scale version of the
    reference's ``use_cached_predictions`` pickle cache,
    models/qa_model.py:79-85,204-211).

    Boundaries: predictions (after the expensive scorer actor pool),
    answers (after the argmax shuffle + compound split), triples
    (final, partitioned by ``partition_id``).

    Returns (triples_dataset, {stage: skipped_bool}).
    """
    from ..state import manifest as mf

    cfg = cfg or KGConfig()
    reg = cfg.registry()
    tns = cfg.resolved_type_names()
    compound = cfg.resolved_use_compound()
    cfg_fp = mf.fingerprint("kgconfig", repr(cfg))
    fp_pred = mf.fingerprint("predictions", sf_dir, cfg_fp)
    fp_ans = mf.fingerprint("answers", fp_pred)
    fp_tri = mf.fingerprint("triples", fp_ans)
    skipped = {}

    def build_predictions():
        """Stage 1 boundary: best answers after the (expensive) model
        scoring — the scale analog of the reference's prediction cache
        (fused extraction when enabled, else score + argmax)."""
        return kg_best(synth.read_pages(sf_dir), cfg)

    preds, skipped["predictions"] = mf.checkpointed(
        build_predictions, f"{ckpt_dir}/predictions", "predictions", fp_pred
    )

    def build_answers():
        best = preds
        if cfg.label_mode == "synth":
            best = attach_synth_labels(best, reg)
        else:
            qa_ids = reg.get_all_qa_ids(
                list_of_type_names=tns, list_of_use_compound_question=compound
            )
            best = attach_na_labels(best, reg, qa_ids)
        return split_stage(best, reg.type_to_typename)

    answers, skipped["answers"] = mf.checkpointed(
        build_answers, f"{ckpt_dir}/answers", "answers", fp_ans
    )

    def build_triples():
        raw = project_stage(answers, num_partitions=cfg.num_partitions)
        linked = link_stage(raw)
        return canonicalize_obj_stage(linked)

    triples, skipped["triples"] = mf.checkpointed(
        build_triples,
        f"{ckpt_dir}/triples",
        "triples",
        fp_tri,
        partition_col="partition_id",
    )
    return triples, skipped


def run_graph_checkpointed(
    sf_dir: str,
    ckpt_dir: str,
    cfg: Optional[KGConfig] = None,
):
    """Checkpointed graph-analytics fan-out: the production shape where
    the triples table and the co-mention edge list are materialized
    Parquet artifacts and the analytics (PageRank, components) resume
    from whichever boundary survives a kill — the graph-family analog
    of :func:`run_kg_checkpointed` / ``crawl.run_crawl_checkpointed``.

    Boundaries (each with a fingerprint-chained lineage manifest):
    ``triples`` (full extraction), ``edges`` (a<b co-mention list;
    chains on the triples fingerprint + the graph predicate set),
    ``pagerank`` and ``components`` (each chains on the edges
    fingerprint + its own constants).  Changing the predicate set
    invalidates edges and everything downstream but NOT the
    extraction; a rerun with identical inputs skips every stage.
    Lineage is CONTENT-identity (fingerprints over inputs + config),
    not mtimes: deleting and rebuilding an intermediate with an
    unchanged fingerprint leaves valid downstream checkpoints alone.

    Returns ``({"pagerank": ds, "components": ds}, {stage: skipped})``.
    """
    from ..stages.graph import (
        GRAPH_PREDS,
        PAGERANK_DAMP_DEN,
        PAGERANK_DAMP_NUM,
        PAGERANK_SCALE,
        cooccur_edges,
        kg_components,
        pagerank,
    )
    from ..state import manifest as mf

    cfg = cfg or KGConfig()
    cfg_fp = mf.fingerprint("kgconfig", repr(cfg))
    fp_tri = mf.fingerprint("graph-triples", sf_dir, cfg_fp)
    fp_edges = mf.fingerprint("graph-edges", fp_tri, *GRAPH_PREDS)
    fp_pr = mf.fingerprint(
        "graph-pagerank",
        fp_edges,
        str(PAGERANK_SCALE),
        str(PAGERANK_DAMP_NUM),
        str(PAGERANK_DAMP_DEN),
    )
    fp_cc = mf.fingerprint("graph-components", fp_edges)
    skipped = {}

    # 'graph_triples', NOT 'triples': run_kg_checkpointed writes its own
    # triples boundary under {ckpt_dir}/triples with a different
    # fingerprint chain — sharing the subdirectory would make the two
    # pipelines thrash each other's most expensive checkpoint
    triples, skipped["triples"] = mf.checkpointed(
        lambda: kg_triples(synth.read_pages(sf_dir), cfg),
        f"{ckpt_dir}/graph_triples",
        "triples",
        fp_tri,
    )
    edges, skipped["edges"] = mf.checkpointed(
        lambda: cooccur_edges(triples),
        f"{ckpt_dir}/edges",
        "edges",
        fp_edges,
    )

    def build_pagerank():
        from ..stages.graph import mirror_edges

        # mirror the a<b checkpoint into the symmetric input pagerank
        # expects (the one shared a<b -> symmetric kernel)
        return pagerank(
            edges.map_batches(mirror_edges, batch_format="pyarrow")
        )

    pr, skipped["pagerank"] = mf.checkpointed(
        build_pagerank, f"{ckpt_dir}/pagerank", "pagerank", fp_pr
    )
    cc, skipped["components"] = mf.checkpointed(
        lambda: kg_components(edges),
        f"{ckpt_dir}/components",
        "components",
        fp_cc,
    )
    return {"pagerank": pr, "components": cc}, skipped
