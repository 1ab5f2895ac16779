"""KG-construction statistics & fusion-support operators.

The reference pipeline stops at the (subj, pred, obj) edge list
(reference: `predict.py` writes per-example triples, `utils/metrics.py`
scores them).  A production KG build needs the layer ABOVE the raw
extraction too: per-assertion provenance/support (how many pages back a
triple — the fusion signal), predicate schema profiling (cardinalities
and functionality, the ontology-induction input), attribute-blocked
entity resolution (which pages describe the same real-world entity),
constraint validation (format rules per predicate), and corruption
negatives (training data for KG-embedding models).  Every operator here
is a bucketed two-phase aggregation over the triples Dataset — nothing
materializes on the driver, every reduce key is salted through
``bucket_of``.

Scale notes (100 TB / 10^12 pages):

* ``triple_support`` never co-locates one hot assertion's rows before
  reduction — the distinct-page count is computed by hashing the FULL
  (pred, obj, subj) key first (so a ("estado","sp")-scale hot key
  spreads over all buckets) and only then re-keying the per-bucket
  partial counts on (pred, obj).
* ``sameas_pairs`` is standard blocking-based ER: attributes more
  frequent than ``max_df`` are non-identifying and skipped (the cap is
  part of the SEMANTICS and mirrored in the SQL oracle), so pair volume
  is bounded by ``max_df**2 / 2`` per block.
* ``corruption_negatives`` broadcasts the entity vocabulary — by
  construction the canonical-entity side of the graph predicates, i.e.
  the alias dictionary's value space (reference
  `utils/aux_functions.py` city/UF lists), which is bounded and small.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from .balance import LCG_INC, LCG_MULT
from .common import arrowed, bucket_of, resolve_parallelism
from .graph import GRAPH_PREDS, _pairs_by_size_class

_LCG_M = np.uint64(2147483648)  # 2^31, shared with stages/sampling.py
_SEP = "\x1f"  # composite-key separator (chr(31) in the SQL mirrors)

# Attributes a human record-linker would block on: person names and
# birth date.  High-frequency attributes (cities, states) are
# non-identifying and are excluded by construction; max_df guards the
# residual hot values at web scale.
ER_PREDS: Tuple[str, ...] = (
    "form.nome_completo",
    "form.nome_mae",
    "form.nome_pai",
    "form.data_nascimento",
)

# Per-predicate obj format rules (RE2-and-Python-safe character classes
# only: digits, lowercase ASCII, literal space).  Both engines anchor
# via fullmatch.  n_doc_serie and endereco.numero are deliberately
# strict (<=6 / <=3 digits) — real extractions exceed them, so the
# report carries real violation counts instead of a degenerate all-valid
# table.
DEFAULT_CONSTRAINTS: Dict[str, str] = {
    "form.etiqueta": "[0-9]{6}",
    "form.agencia": "[0-9]{4}",
    "form.conta_corrente": "[0-9]{6}",
    "form.cpf": "[0-9]{11}",
    "form.n_doc_serie": "[0-9]{1,6}",
    "form.data_emissao": "[0-9]{8}",
    "form.data_nascimento": "[0-9]{8}",
    "form.endereco.numero": "[0-9]{1,3}",
    "form.endereco.cep": "[0-9]{8}",
    "form.endereco.estado": "[a-z]{2}",
    "form.endereco.complemento": "apto [0-9]{1,2}",
}


def triple_support(triples_ds, num_buckets: Optional[int] = None):
    """Per-assertion provenance: (pred, obj) -> distinct supporting
    pages + first/last page id (lexicographic min/max subj).

    Exchange 1 hashes the full (pred, obj, subj) key so duplicate
    mentions of one assertion (recrawls, multi-window hits) collapse
    WITHOUT co-locating a hot assertion; exchange 2 sums the per-bucket
    partials on (pred, obj).
    """
    num_buckets = resolve_parallelism(num_buckets)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "subj": batch["subj"].to_pandas().astype(str),
                "pred": batch["pred"].to_pandas().astype(str),
                "obj": batch["obj"].to_pandas().astype(str),
            }
        ).drop_duplicates()
        key = df["pred"] + _SEP + df["obj"] + _SEP + df["subj"]
        df["_bucket"] = bucket_of(key.to_numpy(), num_buckets)
        return df

    def dedup_then_count(df: pd.DataFrame) -> pd.DataFrame:
        # sort-boundary fold instead of groupby.agg: pandas' grouped
        # string min/max was the dominant cost of this whole operator
        # (7.1 s remote wall in this stage alone; the sorted form gets
        # first/last for free at the group boundaries — operator total
        # 1.95 s -> 0.57 s at sf0.1/32)
        # boundaries compare the key COLUMNS, not a separator-joined
        # composite (see common.group_starts for the collision case);
        # the concat form survives only as the bucket hash input, where
        # a collision is harmless co-location
        from .common import group_starts

        d = df.drop_duplicates(["pred", "obj", "subj"]).sort_values(
            ["pred", "obj", "subj"], kind="stable"
        )
        pred = d["pred"].to_numpy()
        obj = d["obj"].to_numpy()
        starts, ends = group_starts(pred, obj)
        subj = d["subj"].to_numpy()
        g = pd.DataFrame(
            {
                "pred": pred[starts],
                "obj": obj[starts],
                "n_pages": (ends - starts).astype(np.int64),
                "first_page": subj[starts],
                "last_page": subj[ends - 1],
            }
        )
        g["_b2"] = bucket_of(
            (g["pred"] + _SEP + g["obj"]).to_numpy(), num_buckets
        )
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # same sort-boundary trick, one ordering per extreme: first_page
        # ascending within key -> min at starts; a second sort keyed the
        # same way with last_page DESCENDING -> max at its starts.
        # (groupby.agg with string min/max here measured 5.2 s of
        # remote wall across the merge tasks; the two sorts of the
        # tiny partial frame are ~10x cheaper).  Both sorts share the
        # (pred, obj) primary order, so starts and starts2 walk the
        # SAME key sequence.
        from .common import group_starts, reduceat_sum

        d1 = df.sort_values(["pred", "obj", "first_page"], kind="stable")
        p1 = d1["pred"].to_numpy()
        o1 = d1["obj"].to_numpy()
        starts, _ = group_starts(p1, o1)
        sums = reduceat_sum(d1["n_pages"].to_numpy(np.int64), starts)
        d2 = df.sort_values(
            ["pred", "obj", "last_page"],
            ascending=[True, True, False],
            kind="stable",
        )
        starts2, _ = group_starts(
            d2["pred"].to_numpy(), d2["obj"].to_numpy()
        )
        return pd.DataFrame(
            {
                "pred": p1[starts],
                "obj": o1[starts],
                "n_pages": sums,
                "first_page": d1["first_page"].to_numpy()[starts],
                "last_page": d2["last_page"].to_numpy()[starts2],
            }
        )

    parts = triples_ds.select_columns(["subj", "pred", "obj"]).map_batches(
        arrowed(partial), batch_format="pyarrow"
    )
    counted = parts.groupby("_bucket").map_groups(
        arrowed(dedup_then_count), batch_format="pandas"
    )
    return counted.groupby("_b2").map_groups(
        arrowed(merge), batch_format="pandas"
    )


def predicate_profile(triples_ds, num_buckets: Optional[int] = None):
    """Per-predicate schema profile for ontology induction:
    (pred, n_triples, n_subj, n_obj, max_per_subj, max_per_obj).

    ``max_per_subj == 1`` marks a FUNCTIONAL predicate (one value per
    page), ``max_per_obj == 1`` an inverse-functional (identifying) one.
    Both endpoint streams share one exchange via a side tag; distinct
    counts are per-(pred, side, key) partials summed on a hash of the
    full key, never a count-distinct over a co-located group.
    """
    num_buckets = resolve_parallelism(num_buckets)

    def partial(batch: pa.Table) -> pd.DataFrame:
        pred = batch["pred"].to_pandas().astype(str)
        frames = []
        for side, col in (("s", "subj"), ("o", "obj")):
            key = batch[col].to_pandas().astype(str)
            g = (
                pd.DataFrame({"pred": pred, "key": key})
                .groupby(["pred", "key"], sort=False)
                .size()
                .rename("cnt")
                .reset_index()
            )
            g["side"] = side
            frames.append(g)
        df = pd.concat(frames, ignore_index=True)
        df["cnt"] = df["cnt"].astype(np.int64)
        composite = df["pred"] + _SEP + df["side"] + _SEP + df["key"]
        df["_bucket"] = bucket_of(composite.to_numpy(), num_buckets)
        return df

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        # all copies of one (pred, side, key) land here -> exact per-key
        # totals; then collapse to per-(pred, side) bucket partials.
        k = df.groupby(["pred", "side", "key"], sort=False)["cnt"].sum()
        g = k.groupby(["pred", "side"]).agg(["size", "sum", "max"])
        g.columns = ["n_keys", "n_rows", "max_per"]
        g = g.reset_index()
        for c in ("n_keys", "n_rows", "max_per"):
            g[c] = g[c].astype(np.int64)
        g["_b2"] = bucket_of(g["pred"].to_numpy(), num_buckets)
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["pred", "side"], sort=False)
            .agg(
                n_keys=("n_keys", "sum"),
                n_rows=("n_rows", "sum"),
                max_per=("max_per", "max"),
            )
            .reset_index()
        )
        s = g[g["side"] == "s"].set_index("pred")
        o = g[g["side"] == "o"].set_index("pred")
        out = pd.DataFrame(
            {
                "pred": s.index.astype(str),
                "n_triples": s["n_rows"].to_numpy(np.int64),
                "n_subj": s["n_keys"].to_numpy(np.int64),
                "n_obj": o["n_keys"].reindex(s.index).to_numpy(np.int64),
                "max_per_subj": s["max_per"].to_numpy(np.int64),
                "max_per_obj": o["max_per"]
                .reindex(s.index)
                .to_numpy(np.int64),
            }
        )
        return out

    parts = triples_ds.select_columns(["subj", "pred", "obj"]).map_batches(
        arrowed(partial), batch_format="pyarrow"
    )
    keyed = parts.groupby("_bucket").map_groups(
        arrowed(per_key), batch_format="pandas"
    )
    return keyed.groupby("_b2").map_groups(
        arrowed(merge), batch_format="pandas"
    )


def constraint_report(
    triples_ds,
    rules: Optional[Dict[str, str]] = None,
    num_buckets: Optional[int] = None,
):
    """Per-predicate format validation: (pred, n_valid, n_invalid).

    ``rules`` maps pred -> fullmatch regex (RE2/Python-common subset
    only).  Predicates without a rule are ignored.  Partials are one row
    per (batch, pred) — the exchange moves O(n_batches * n_rules) rows.
    """
    rules = DEFAULT_CONSTRAINTS if rules is None else rules
    compiled = {p: re.compile(pat) for p, pat in rules.items()}
    num_buckets = resolve_parallelism(num_buckets)

    def partial(batch: pa.Table) -> pd.DataFrame:
        pred = batch["pred"].to_pandas().astype(str)
        obj = batch["obj"].to_pandas().astype(str)
        rows = []
        for p, rx in compiled.items():
            mask = pred == p
            n = int(mask.sum())
            if not n:
                continue
            ok = int(obj[mask].str.fullmatch(rx).sum())
            rows.append((p, ok, n - ok))
        df = pd.DataFrame(rows, columns=["pred", "n_valid", "n_invalid"])
        df["n_valid"] = df["n_valid"].astype(np.int64)
        df["n_invalid"] = df["n_invalid"].astype(np.int64)
        df["_bucket"] = bucket_of(df["pred"].to_numpy(), num_buckets)
        return df

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("pred", sort=False, as_index=False)[
            ["n_valid", "n_invalid"]
        ].sum()
        g["n_valid"] = g["n_valid"].astype(np.int64)
        g["n_invalid"] = g["n_invalid"].astype(np.int64)
        return g[["pred", "n_valid", "n_invalid"]]

    parts = triples_ds.select_columns(["pred", "obj"]).map_batches(
        arrowed(partial), batch_format="pyarrow"
    )
    return parts.groupby("_bucket").map_groups(
        arrowed(merge), batch_format="pandas"
    )


def sameas_pairs(
    triples_ds,
    preds: Sequence[str] = ER_PREDS,
    min_shared: int = 3,
    max_df: int = 10_000,
    num_buckets: Optional[int] = None,
):
    """Blocking-based entity resolution over page-level attributes:
    pairs of pages sharing >= ``min_shared`` identifying (pred, obj)
    attributes, with the shared count: (a, b, shared).

    Attributes backed by more than ``max_df`` pages are non-identifying
    blocks and are skipped — the cap is semantic (mirrored in the SQL
    oracle), and it bounds per-block pair volume at web scale.  Pair
    emission is the shared vectorized size-class kernel (no Python loop
    over blocks).
    """
    preds = tuple(preds)
    num_buckets = resolve_parallelism(num_buckets)

    def partial(batch: pa.Table) -> pd.DataFrame:
        pred = batch["pred"].to_pandas().astype(str)
        keep = pred.isin(preds).to_numpy()
        subj = batch["subj"].to_pandas().astype(str)[keep]
        attr = (
            pred[keep] + _SEP + batch["obj"].to_pandas().astype(str)[keep]
        )
        df = pd.DataFrame({"subj": subj, "attr": attr}).drop_duplicates()
        df["_bucket"] = bucket_of(df["attr"].to_numpy(), num_buckets)
        return df

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["subj", "attr"]).sort_values(
            ["attr", "subj"], kind="stable"
        )
        attrs = d["attr"].to_numpy()
        starts = np.flatnonzero(
            np.r_[True, attrs[1:] != attrs[:-1]]
        )
        sizes = np.diff(np.r_[starts, len(attrs)])
        ok = (sizes >= 2) & (sizes <= max_df)
        a, b, _ = _pairs_by_size_class(
            starts[ok], sizes[ok], d["subj"].to_numpy()
        )
        out = pd.DataFrame({"a": a.astype(str), "b": b.astype(str)})
        out["_b2"] = bucket_of(
            (out["a"] + _SEP + out["b"]).to_numpy(), num_buckets
        )
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["a", "b"], sort=False)
            .size()
            .rename("shared")
            .reset_index()
        )
        g = g[g["shared"] >= min_shared]
        g["shared"] = g["shared"].astype(np.int64)
        return g[["a", "b", "shared"]]

    parts = triples_ds.select_columns(["subj", "pred", "obj"]).map_batches(
        arrowed(partial), batch_format="pyarrow"
    )
    blocked = parts.groupby("_bucket").map_groups(
        arrowed(pairs), batch_format="pandas"
    )
    return blocked.groupby("_b2").map_groups(
        arrowed(merge), batch_format="pandas"
    )


def canonicalize_triples(
    triples_ds,
    preds: Sequence[str] = ER_PREDS,
    min_shared: int = 3,
    max_df: int = 10_000,
    num_buckets: Optional[int] = None,
    broadcast_threshold: int = 4_000_000,
):
    """sameAs-closure canonicalization — the ER loop closed end to end.

    :func:`sameas_pairs` proposes page pairs describing one real-world
    entity; their transitive closure (graph.kg_components: min-string
    root per component) assigns every merged page a canonical id; each
    triple's SUBJECT is rewritten to its root, and the merged pages'
    now-duplicate assertions collapse: output is the distinct
    (subj, pred, obj) set over canonical subjects.

    Scale shape: the rewrite map is bounded by the ER-pair node set
    (min_shared-filtered, max_df-blocked) — orders of magnitude smaller
    than the page corpus.  At or under ``broadcast_threshold`` entries
    it ships ONCE via ``ray.put`` and the triples stream through a
    vectorized ``searchsorted`` rewrite (zero shuffle on the big side);
    above it a distributed LEFT OUTER hash join on subj rewrites
    without a broadcast.  The final distinct is one bucketed exchange
    on the full (subj, pred, obj) hash — never a co-location of one
    hot subject.
    """
    import ray

    from .graph import kg_components

    width = resolve_parallelism(num_buckets)
    pairs = sameas_pairs(
        triples_ds,
        preds=preds,
        min_shared=min_shared,
        max_df=max_df,
        num_buckets=num_buckets,
    )
    comp = kg_components(pairs).materialize()  # (entity, component)
    n_mapped = comp.count()

    def non_roots(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["entity"] != df["component"]]

    base = triples_ds.select_columns(["subj", "pred", "obj"])

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["subj", "pred", "obj"]].astype(str)
        key = df["subj"] + _SEP + df["pred"] + _SEP + df["obj"]
        df = df.copy()
        df["_bucket"] = bucket_of(key.to_numpy(), width)
        return df

    if n_mapped == 0:
        rewritten = base.map_batches(
            arrowed(lambda b: bucketed(b.to_pandas())),
            batch_format="pyarrow",
        )
    elif n_mapped <= broadcast_threshold:
        m = comp.map_batches(non_roots, batch_format="pandas").to_pandas()
        order = np.argsort(m["entity"].to_numpy(), kind="stable")
        keys = m["entity"].to_numpy()[order]
        roots = m["component"].to_numpy()[order]
        ref = ray.put((keys, roots))

        def rewrite(batch: pa.Table) -> pd.DataFrame:
            ks, rs = ray.get(ref)
            subj = batch["subj"].to_numpy(zero_copy_only=False).astype(str)
            pos = np.clip(np.searchsorted(ks, subj), 0, len(ks) - 1)
            hit = ks[pos] == subj
            # object dtype: a fixed-width unicode copy of subj would
            # silently TRUNCATE any root longer than the batch's widest
            # subject (e.g. root 'ab' written into a <U1 slot as 'a')
            out = subj.astype(object)
            out[hit] = rs[pos[hit]]
            return bucketed(
                pd.DataFrame(
                    {
                        "subj": out,
                        "pred": batch["pred"].to_pandas().astype(str),
                        "obj": batch["obj"].to_pandas().astype(str),
                    }
                )
            )

        rewritten = base.map_batches(arrowed(rewrite), batch_format="pyarrow")
    else:  # pragma: no cover - exercised via a forced tiny threshold
        from .joins import _as_arrow

        mapping = _as_arrow(
            comp.map_batches(arrowed(non_roots), batch_format="pandas")
        )
        joined = base.join(
            mapping,
            "left_outer",
            num_partitions=width,
            on=("subj",),
            right_on=("entity",),
        )

        def coalesce(batch: pa.Table) -> pd.DataFrame:
            df = batch.to_pandas()
            root = df["component"]
            df["subj"] = np.where(
                root.notna(), root.astype(str), df["subj"].astype(str)
            )
            return bucketed(df)

        rewritten = joined.map_batches(
            arrowed(coalesce), batch_format="pyarrow"
        )

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["subj", "pred", "obj"])[
            ["subj", "pred", "obj"]
        ]

    return rewritten.groupby("_bucket").map_groups(
        arrowed(distinct), batch_format="pandas"
    )


def extraction_yield(
    triples_ds,
    sf_dir: str,
    num_buckets: Optional[int] = None,
    docs_scatter: Optional[int] = None,
):
    """Per-source-host fact yield: (host, n_pages, n_triples, yield) —
    the crawl-scheduling signal ("which hosts are worth recrawling for
    facts").  ``yield = n_triples / n_pages`` over ALL of the host's
    pages (a page yielding zero triples still counts — that is the
    point of the metric).

    Scale shape: a doc-bucketed co-group joins the per-page triple-count
    partials (combiner-reduced in the map phase: one row per page per
    batch) with the column-pruned documents table — both sides hash on
    the page url, so no side is ever broadcast (the page table is
    corpus-sized).  The per-bucket output is one row per (bucket, host);
    the final merge re-keys on host — web-domain-bounded, and the single
    IEEE division per host matches the SQL mirror bit-for-bit.

    ``docs_scatter`` follows the :func:`~.common.maybe_scatter`
    convention in reverse: a small pruned documents read arrives as
    many TINY blocks (Ray splits one file to ~2x CPUs regardless of
    bytes) and the union's sort width follows the block count, so an
    explicit width coalesces the doc partials first (measured 2.4 s ->
    1.4 s at sf0.1/32 CPUs).  Leave ``None`` for data-dominated corpora
    — there the repartition would be a full exchange of one row per
    page and the sort width is already byte-driven.
    """
    from ..sources.synth import URL_PREFIX
    from .common import read_parquet_clean

    width = resolve_parallelism(num_buckets)

    def tri_partial(batch: pa.Table) -> pd.DataFrame:
        url = batch["subj"].to_pandas().astype(str)
        g = url.value_counts()
        df = pd.DataFrame(
            {
                "url": g.index.astype(str),
                "host": "",
                "nt": g.to_numpy(np.int64),
                "_side": np.int8(1),
            }
        )
        df["_bucket"] = bucket_of(df["url"].to_numpy(), width)
        return df

    def doc_rows(batch: pa.Table) -> pd.DataFrame:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = batch["source"].to_pandas().astype(str)
        df = pd.DataFrame(
            {
                "url": URL_PREFIX + pd.Series(d).astype(str).str.zfill(8),
                "host": (src + ".example.org").to_numpy(),
                "nt": np.int64(0),
                "_side": np.int8(0),
            }
        )
        df["_bucket"] = bucket_of(df["url"].to_numpy(), width)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        docs = df[df["_side"] == 0][["url", "host"]]
        tri = (
            df[df["_side"] == 1]
            .groupby("url", sort=False, as_index=False)["nt"]
            .sum()
        )
        j = docs.merge(tri, on="url", how="left")
        j["nt"] = j["nt"].fillna(0).astype(np.int64)
        g = j.groupby("host", sort=False).agg(
            n_pages=("url", "size"), n_triples=("nt", "sum")
        )
        g = g.reset_index()
        for c in ("n_pages", "n_triples"):
            g[c] = g[c].astype(np.int64)
        g["_b2"] = bucket_of(g["host"].to_numpy(), width)
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("host", sort=False, as_index=False).agg(
            n_pages=("n_pages", "sum"), n_triples=("n_triples", "sum")
        )
        for c in ("n_pages", "n_triples"):
            g[c] = g[c].astype(np.int64)
        g["yield"] = g["n_triples"].to_numpy(np.int64) / g[
            "n_pages"
        ].to_numpy(np.int64)
        return g[["host", "n_pages", "n_triples", "yield"]]

    tri = triples_ds.select_columns(["subj"]).map_batches(
        arrowed(tri_partial), batch_format="pyarrow"
    )
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(arrowed(doc_rows), batch_format="pyarrow")
    if docs_scatter is not None:
        docs = docs.repartition(docs_scatter)
    return (
        docs.union(tri)
        .groupby("_bucket")
        .map_groups(arrowed(per_bucket), batch_format="pandas")
        .groupby("_b2")
        .map_groups(arrowed(merge), batch_format="pandas")
    )


def retract_hosts(
    triples_ds,
    sf_dir: str,
    blocked: List[str],
    num_buckets: Optional[int] = None,
):
    """Right-to-be-forgotten retraction delta: if every page of the
    ``blocked`` source hosts is withdrawn (GDPR erasure, DMCA, a
    poisoned-domain takedown), which ``(pred, obj)`` assertions lose
    support and by how much?  Output ``(pred, obj, n_before,
    n_after)`` for the LOSSY assertions only (``n_after <
    n_before``; ``n_after = 0`` means the fact leaves the KG
    entirely) — the churn-bounded input a fusion layer re-scores
    instead of recomputing the corpus (the maintenance complement of
    :func:`~.triples.diff_triples`, keyed on provenance rather than
    extractor version).

    Scale shape: per-batch ``(url, pred, obj)`` count partials
    (combiner-reduced) co-group with the column-pruned documents
    table hashed on the page url — the corpus-sized page->host map is
    NEVER broadcast; only the blocked list itself rides the closure
    (web blocklists are list-of-hosts small).  Exchange 2 merges one
    partial row per (bucket, assertion) on the assertion key and
    keeps the lossy rows."""
    from ..sources.synth import URL_PREFIX
    from .common import read_parquet_clean

    width = resolve_parallelism(num_buckets)
    blocked_set = {str(b) for b in blocked}

    def tri_partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "url": batch["subj"].to_pandas().astype(str),
                "pred": batch["pred"].to_pandas().astype(str),
                "obj": batch["obj"].to_pandas().astype(str),
            }
        )
        g = df.groupby(["url", "pred", "obj"], sort=False, as_index=False)
        g = g.size().rename(columns={"size": "cnt"})
        g["cnt"] = g["cnt"].astype(np.int64)
        g["blk"] = np.int8(0)
        g["_side"] = np.int8(1)
        g["_bucket"] = bucket_of(g["url"].to_numpy(), width)
        return g[["url", "pred", "obj", "cnt", "blk", "_side", "_bucket"]]

    def doc_rows(batch: pa.Table) -> pd.DataFrame:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = batch["source"].to_pandas().astype(str)
        df = pd.DataFrame(
            {
                "url": URL_PREFIX + pd.Series(d).astype(str).str.zfill(8),
                "pred": "",
                "obj": "",
                "cnt": np.int64(0),
                "blk": src.isin(blocked_set).to_numpy().astype(np.int8),
                "_side": np.int8(0),
            }
        )
        df["_bucket"] = bucket_of(df["url"].to_numpy(), width)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        docs = df[df["_side"] == 0][["url", "blk"]]
        tri = df[df["_side"] == 1][["url", "pred", "obj", "cnt"]]
        j = tri.merge(docs, on="url", how="inner")
        nb = j["cnt"].to_numpy(np.int64)
        na = np.where(j["blk"].to_numpy(np.int8) == 1, 0, nb)
        out = pd.DataFrame(
            {
                "pred": j["pred"].to_numpy(dtype=object),
                "obj": j["obj"].to_numpy(dtype=object),
                "n_before": nb,
                "n_after": na.astype(np.int64),
            }
        )
        g = out.groupby(["pred", "obj"], sort=False, as_index=False).sum()
        for c in ("n_before", "n_after"):
            g[c] = g[c].astype(np.int64)
        g["_b2"] = bucket_of(
            (g["pred"].astype(str) + "\x1f" + g["obj"].astype(str)).to_numpy(),
            width,
        )
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["pred", "obj"], sort=False, as_index=False).agg(
            n_before=("n_before", "sum"), n_after=("n_after", "sum")
        )
        for c in ("n_before", "n_after"):
            g[c] = g[c].astype(np.int64)
        return g[g["n_after"] < g["n_before"]]

    tri = triples_ds.select_columns(["subj", "pred", "obj"]).map_batches(
        arrowed(tri_partial), batch_format="pyarrow"
    )
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(arrowed(doc_rows), batch_format="pyarrow")
    return (
        docs.union(tri)
        .groupby("_bucket")
        .map_groups(arrowed(per_bucket), batch_format="pandas")
        .groupby("_b2")
        .map_groups(arrowed(merge), batch_format="pandas")
    )


def predicate_assoc(triples_ds, num_buckets: Optional[int] = None):
    """Predicate co-occurrence association rules (schema induction):
    for every ordered predicate pair ``p1 <> p2``,
    ``(p1, p2, n_both, n_p1, confidence)`` where ``n_both`` is the
    number of pages asserting BOTH predicates, ``n_p1`` the number
    asserting ``p1`` at all, and ``confidence = n_both / n_p1`` — the
    classic rule-mining signal ("pages with nome_pai almost always
    carry data_nascimento"), the input an ontology-induction step uses
    to propose mandatory/optional attribute sets per page type.
    (The reference stops at per-field extraction —
    ``predict.py`` emits fields independently; this is the layer above.)

    Scale shape: exchange 1 moves the per-batch-distinct (subj, pred)
    rows hashed on subj (a page's predicate set co-locates; P is
    schema-bounded, so per-subject pair volume is <= P**2, emitted as
    one vectorized self-merge per bucket — never a Python loop over
    subjects).  Exchange 2 moves one (p1, p2) count row per (bucket,
    pair) — O(buckets x P**2) rows total — keyed on p1 ONLY so every
    pair co-locates with its diagonal ``(p1, p1)`` row, whose count IS
    ``n_p1``: the confidence division needs no third exchange or
    broadcast.  The single IEEE division per rule matches the SQL
    mirror bit-for-bit.
    """
    num_buckets = resolve_parallelism(num_buckets)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "subj": batch["subj"].to_pandas().astype(str),
                "pred": batch["pred"].to_pandas().astype(str),
            }
        ).drop_duplicates()
        df["_bucket"] = bucket_of(df["subj"].to_numpy(), num_buckets)
        return df

    def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["subj", "pred"])[["subj", "pred"]]
        m = d.merge(d, on="subj")  # includes the (p, p) diagonal
        g = (
            m.groupby(["pred_x", "pred_y"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        g["n"] = g["n"].astype(np.int64)
        g["_b2"] = bucket_of(g["pred_x"].to_numpy(), num_buckets)
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["pred_x", "pred_y"], sort=False, as_index=False)["n"]
            .sum()
        )
        diag = g[g["pred_x"] == g["pred_y"]].set_index("pred_x")["n"]
        out = g[g["pred_x"] != g["pred_y"]].copy()
        n_p1 = diag.reindex(out["pred_x"]).to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "p1": out["pred_x"].astype(str),
                "p2": out["pred_y"].astype(str),
                "n_both": out["n"].to_numpy(np.int64),
                "n_p1": n_p1,
            }
        )
        out["confidence"] = out["n_both"].to_numpy(np.int64) / n_p1
        return out

    parts = triples_ds.select_columns(["subj", "pred"]).map_batches(
        arrowed(partial), batch_format="pyarrow"
    )
    paired = parts.groupby("_bucket").map_groups(
        arrowed(pair_counts), batch_format="pandas"
    )
    return paired.groupby("_b2").map_groups(
        arrowed(merge), batch_format="pandas"
    )


def entity_summary(triples_ds, k: int = 3, num_buckets: Optional[int] = None):
    """Per-entity fact summary: for every object entity, the top-``k``
    predicates by distinct-page support — ``(entity, pred, n_pages)``,
    ordered within each entity by (n_pages desc, pred asc).  This is the
    entity-card builder ("what does the KG say about 'sp'?"): fusion
    keeps an assertion's strongest provenance first.

    TWO exchanges (one fewer than composing :func:`triple_support` with
    :func:`~.aggregates.grouped_topk`, measured 1.69 s -> 0.48 s at
    sf0.1/32): exchange 1 hashes the FULL (pred, obj, subj) key — the
    :func:`triple_support` skew discipline: duplicate mentions collapse
    without co-locating a hot assertion — producing per-bucket
    distinct-page partial counts; exchange 2 re-keys those on the
    entity alone, and since ALL of an entity's partials co-locate
    (bounded: <= buckets x P rows per entity, P schema-bounded), the
    per-bucket fold sums and selects the exact top-k in one pass.
    """
    num_buckets = resolve_parallelism(num_buckets)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "subj": batch["subj"].to_pandas().astype(str),
                "pred": batch["pred"].to_pandas().astype(str),
                "obj": batch["obj"].to_pandas().astype(str),
            }
        ).drop_duplicates()
        key = df["pred"] + _SEP + df["obj"] + _SEP + df["subj"]
        df["_bucket"] = bucket_of(key.to_numpy(), num_buckets)
        return df

    def count_pages(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["pred", "obj", "subj"])
        g = (
            d.groupby(["obj", "pred"], sort=False)
            .size()
            .rename("n_pages")
            .reset_index()
        )
        g["n_pages"] = g["n_pages"].astype(np.int64)
        g["_b2"] = bucket_of(g["obj"].to_numpy(), num_buckets)
        return g

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["obj", "pred"], sort=False, as_index=False)[
            "n_pages"
        ].sum()
        g["n_pages"] = g["n_pages"].astype(np.int64)
        g = g.sort_values(
            ["obj", "n_pages", "pred"],
            ascending=[True, False, True],
            kind="stable",
        )
        out = g.groupby("obj", sort=False).head(k)
        return pd.DataFrame(
            {
                "entity": out["obj"].astype(str),
                "pred": out["pred"].astype(str),
                "n_pages": out["n_pages"].to_numpy(np.int64),
            }
        )

    parts = triples_ds.select_columns(["subj", "pred", "obj"]).map_batches(
        arrowed(partial), batch_format="pyarrow"
    )
    counted = parts.groupby("_bucket").map_groups(
        arrowed(count_pages), batch_format="pandas"
    )
    return counted.groupby("_b2").map_groups(
        arrowed(topk), batch_format="pandas"
    )


# Star-pattern constraints for the showcase query: RE2-and-Python-safe
# fullmatch regexes (same subset contract as DEFAULT_CONSTRAINTS).
# Chosen to cross the synth table's modular correlations (estado keys on
# doc_id*5 % 27, orgao on doc_id % 6, numero on doc_id % 2000), so the
# conjunction selects a non-trivial pseudo-random page subset.
STAR_CONSTRAINTS: Dict[str, str] = {
    "form.endereco.estado": "s[a-z]",
    "form.orgao_emissor": "ssp",
    "form.endereco.numero": "[0-9]{1,3}",
}


def star_query(
    triples_ds,
    constraints: Optional[Dict[str, str]] = None,
    num_buckets: Optional[int] = None,
):
    """Conjunctive star-pattern query answering over the constructed KG
    (the SPARQL basic-graph-pattern shape ``?s p1 ?v1 . ?s p2 ?v2 ...``
    with a regex filter per predicate): returns the matched bindings —
    one ``(subj, pred, obj)`` row per queried predicate for every
    subject satisfying ALL constraints.

    Scale shape: the filter is map-side (one vectorized fullmatch per
    constraint per batch — non-matching triples never reach the wire),
    then ONE exchange hashed on subj co-locates each candidate page's
    surviving bindings; the per-bucket fold keeps subjects whose
    distinct matched-predicate count equals the constraint count.  Wire
    volume is bounded by the match selectivity, not the corpus.
    """
    rules = STAR_CONSTRAINTS if constraints is None else constraints
    if not rules:
        raise ValueError("star_query: need at least one constraint")
    compiled = {p: re.compile(rx) for p, rx in rules.items()}
    n_constraints = len(compiled)
    num_buckets = resolve_parallelism(num_buckets)

    def partial(batch: pa.Table) -> pd.DataFrame:
        pred = batch["pred"].to_pandas().astype(str)
        obj = batch["obj"].to_pandas().astype(str)
        subj = batch["subj"].to_pandas().astype(str)
        keep = np.zeros(len(pred), dtype=bool)
        for p, rx in compiled.items():
            mask = (pred == p).to_numpy()
            if mask.any():
                hit = obj[mask].str.fullmatch(rx).to_numpy()
                keep[np.flatnonzero(mask)[hit]] = True
        df = pd.DataFrame(
            {"subj": subj[keep], "pred": pred[keep], "obj": obj[keep]}
        ).drop_duplicates()
        df["_bucket"] = bucket_of(df["subj"].to_numpy(), num_buckets)
        return df

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["subj", "pred", "obj"])
        n_preds = d.drop_duplicates(["subj", "pred"]).groupby(
            "subj", sort=False
        ).size()
        ok = set(n_preds[n_preds == n_constraints].index)
        out = d[d["subj"].isin(ok)]
        return out[["subj", "pred", "obj"]]

    parts = triples_ds.select_columns(["subj", "pred", "obj"]).map_batches(
        arrowed(partial), batch_format="pyarrow"
    )
    return parts.groupby("_bucket").map_groups(
        arrowed(fold), batch_format="pandas"
    )


def entity_embeddings(
    triples_ds,
    sf_dir: str,
    preds: Sequence[str] = GRAPH_PREDS,
    scale: int = 1_000_000,
    num_buckets: Optional[int] = None,
    vecs_scatter: Optional[int] = None,
):
    """Entity-embedding construction — the KG x embeddings bridge: each
    canonical entity's vector is the mean of the page embeddings that
    assert it (graph predicates), the bi-encoder side of the
    north-star's entity-link rerank (north_star stage 3: alias dict +
    embedding rerank; this builds the entity side from the corpus
    itself).  Output is exploded ``(entity, dim, avg)`` rows.  The mean
    is over mentioning pages that HAVE an embedding row (inner join): a
    page absent from the embeddings table contributes neither numerator
    nor denominator — missing vectors must not drag the mean toward
    zero.  The SQL mirror counts the same post-join page set.

    Determinism at scale: float sums are order-dependent, and a
    distributed reduce cannot fix its addition order — so the page
    vectors are quantized to FIXED-POINT int64 (``floor(v * scale)``)
    at the read, summed exactly (order-free), and divided ONCE at the
    end: ``avg = q_sum / (n_pages * scale)``.  Bit-identical under any
    partitioning and to the SQL mirror.

    Shape: exchange 1 co-groups the distinct (page, entity) mention
    pairs with the quantized page vectors on a page-id hash (both sides
    corpus-sized, neither broadcast); per bucket a ``reduceat`` produces
    one (entity, sum_vec, n) row per (bucket, entity); exchange 2 is
    entity-keyed — bounded by the alias-dictionary vocabulary.

    ``vecs_scatter`` follows :func:`extraction_yield`'s ``docs_scatter``
    convention: a small embeddings fixture arrives as ~2x-CPUs tiny
    blocks and the union sort width follows the block count, so an
    explicit width coalesces the quantized-vector partials first
    (measured 2.5 s -> 1.4 s at sf0.1/32).  Leave ``None`` for
    data-dominated corpora.
    """
    # page id = last 8 url chars, the pages-source contract shared with
    # encode_triples / corruption_negatives
    from .common import read_parquet_clean

    preds = tuple(preds)
    width = resolve_parallelism(num_buckets)
    qvec_t = pa.list_(pa.int64())

    def _union_table(pid, entity, qvec, side):
        n = len(pid)
        return pa.table(
            {
                "pid": pa.array(pid, pa.int64()),
                "entity": pa.array(entity, pa.string()),
                "qvec": qvec
                if qvec is not None
                else pa.nulls(n, qvec_t),
                "_side": pa.array(
                    np.full(n, side, dtype=np.int8), pa.int8()
                ),
                "_bucket": pa.array(
                    (pid % width).astype(np.int32), pa.int32()
                ),
            }
        )

    def mention_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch["pred"], value_set=pa.array(list(preds)))
        t = batch.filter(mask)
        df = pd.DataFrame(
            {
                "pid": t["subj"]
                .to_pandas()
                .astype(str)
                .str[-8:]
                .astype(np.int64),
                "entity": t["obj"].to_pandas().astype(str),
            }
        ).drop_duplicates()
        return _union_table(
            df["pid"].to_numpy(np.int64),
            df["entity"].to_numpy(),
            None,
            1,
        )

    def vec_rows(batch: pa.Table) -> pa.Table:
        arr = batch["embedding"].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):  # pragma: no cover
            arr = arr.combine_chunks()
        offsets = arr.offsets.to_numpy()
        widths = np.diff(offsets)
        if len(widths) and not (widths == widths[0]).all():
            raise ValueError("entity_embeddings: ragged embedding column")
        # .values is the ABSOLUTE buffer: a sliced block's offsets need
        # not start at 0, so slice before reshaping
        flat = arr.values.to_numpy(zero_copy_only=False)
        flat = flat[offsets[0] : offsets[-1]] if len(offsets) else flat
        mat = flat.reshape(len(arr), -1) if len(arr) else flat.reshape(0, 0)
        qflat = np.floor(mat.astype(np.float64) * scale).astype(
            np.int64
        ).ravel()
        rel = offsets - offsets[0] if len(offsets) else offsets
        qcol = pa.ListArray.from_arrays(
            pa.array(rel, pa.int32()), pa.array(qflat, pa.int64())
        )
        pid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return _union_table(pid, np.full(len(pid), "", object), qcol, 0)

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        vecs = df[df["_side"] == 0]
        men = df[df["_side"] == 1].drop_duplicates(["pid", "entity"])[
            ["pid", "entity"]
        ]
        j = men.merge(vecs[["pid", "qvec"]], on="pid", how="inner")
        if not len(j):
            return pa.table(
                {
                    "entity": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "svec": pa.array([], qvec_t),
                    "_b2": pa.array([], pa.int32()),
                }
            )
        j = j.sort_values("entity", kind="stable")
        ents = j["entity"].to_numpy()
        mat = np.stack(j["qvec"].to_numpy()).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, ents[1:] != ents[:-1]])
        sums = np.add.reduceat(mat, starts, axis=0)
        n = np.diff(np.r_[starts, len(ents)]).astype(np.int64)
        uniq = ents[starts]
        dim = mat.shape[1]
        svec = pa.ListArray.from_arrays(
            pa.array(
                np.arange(len(uniq) + 1, dtype=np.int64) * dim, pa.int32()
            ),
            pa.array(sums.ravel(), pa.int64()),
        )
        return pa.table(
            {
                "entity": pa.array(uniq.astype(str), pa.string()),
                "n": pa.array(n, pa.int64()),
                "svec": svec,
                "_b2": pa.array(
                    bucket_of(uniq.astype(str), width), pa.int32()
                ),
            }
        )

    def merge(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table(
                {
                    "entity": pa.array([], pa.string()),
                    "dim": pa.array([], pa.int64()),
                    "avg": pa.array([], pa.float64()),
                }
            )
        df = df.sort_values("entity", kind="stable")
        ents = df["entity"].to_numpy()
        lens = np.fromiter(
            (len(v) for v in df["svec"]), dtype=np.int64, count=len(df)
        )
        if len(lens) and not (lens == lens[0]).all():
            # raggedness split across read blocks evades the per-batch
            # width check in vec_rows; catch it at the reduce
            raise ValueError("entity_embeddings: ragged embedding column")
        mat = np.stack(df["svec"].to_numpy()).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, ents[1:] != ents[:-1]])
        sums = np.add.reduceat(mat, starts, axis=0)
        counts = np.add.reduceat(df["n"].to_numpy(np.int64), starts)
        uniq = ents[starts]
        dim = mat.shape[1]
        avg = sums / (counts[:, None] * np.float64(scale))
        return pa.table(
            {
                "entity": pa.array(
                    np.repeat(uniq, dim).astype(str), pa.string()
                ),
                "dim": pa.array(
                    np.tile(np.arange(dim, dtype=np.int64), len(uniq)),
                    pa.int64(),
                ),
                "avg": pa.array(avg.ravel(), pa.float64()),
            }
        )

    mentions = triples_ds.select_columns(["subj", "pred", "obj"]).map_batches(
        mention_rows, batch_format="pyarrow"
    )
    vecs = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(vec_rows, batch_format="pyarrow")
    if vecs_scatter is not None:
        vecs = vecs.repartition(vecs_scatter)
    partials = (
        mentions.union(vecs)
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return partials.groupby("_b2").map_groups(merge, batch_format="pandas")


def _entity_vocab(triples_ds, preds: Sequence[str]) -> np.ndarray:
    """Sorted distinct canonical-entity vocabulary over ``preds``.

    Per-batch unique partials -> driver set-union.  Bounded by the
    alias dictionary's value space (the linker maps surface forms INTO
    this closed vocabulary), so the driver holds at most
    n_batches x |vocab| short strings in flight — this is the sanctioned
    small-side broadcast, not a corpus materialization.
    """
    plist = list(preds)

    def uniq(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch["pred"], value_set=pa.array(plist))
        vals = pc.unique(batch.filter(mask)["obj"])
        return pa.table({"obj": vals.cast(pa.string())})

    rows = (
        triples_ds.select_columns(["pred", "obj"])
        .map_batches(uniq, batch_format="pyarrow")
        .take_all()
    )
    return np.array(sorted({r["obj"] for r in rows}), dtype=object)


def _dense_batch(batch: pa.Table, preds: Tuple[str, ...], pidx_map: Dict):
    """Shared dense-id extraction over one batch's graph-pred rows —
    THE single home of the page-id (last 8 url chars) and
    predicate-index contracts every KGE op keys on
    (:func:`encode_triples`, :func:`corruption_negatives`,
    :func:`kge_training_pairs`).  Returns ``(subj, pred, obj, h, r)``.
    """
    import pyarrow.compute as pc

    mask = pc.is_in(batch["pred"], value_set=pa.array(list(preds)))
    t = batch.filter(mask)
    subj = t["subj"].to_pandas().astype(str)
    pred = t["pred"].to_pandas().astype(str)
    obj = t["obj"].to_pandas().astype(str).to_numpy()
    h = subj.str[-8:].astype(np.int64).to_numpy()
    r = pred.map(pidx_map).to_numpy().astype(np.int64)
    return subj, pred, obj, h, r


def _corruption_idx(
    h: np.ndarray, r: np.ndarray, stride: np.uint64, n: int
) -> np.ndarray:
    """The shared filtered-corruption draw: glibc LCG over
    ``h * |preds| + r``, HIGH bits of the residue mod ``|vocab|`` (low
    bits of a power-of-two-modulus LCG cycle; see
    :func:`corruption_negatives`)."""
    key = h.astype(np.uint64) * stride + r.astype(np.uint64)
    raw = (key * np.uint64(LCG_MULT) + np.uint64(LCG_INC)) % _LCG_M
    return ((raw >> np.uint64(16)) % np.uint64(n)).astype(np.int64)


def encode_triples(triples_ds, preds: Sequence[str] = GRAPH_PREDS):
    """Dense-id triple encoding for KG-embedding training: one
    ``(h, r, t)`` int64 row per graph-predicate triple — the tensor
    input TransE-family trainers take, and the positive companion to
    :func:`corruption_negatives` (same key spaces on every axis).

    * ``h``: the page id — dense by the pages-source contract (the
      last 8 url chars; the same contract corruption_negatives keys
      its LCG on).
    * ``r``: index into the closed graph-predicate list.
    * ``t``: index into the row_number-ordered entity vocabulary —
      the bounded alias-dictionary value space, broadcast once (see
      :func:`_entity_vocab`); the lookup is one vectorized
      ``searchsorted`` against the sorted vocab.

    Zero exchanges: encoding is a stateless map over the triples
    stream.
    """
    preds = tuple(preds)
    vocab = _entity_vocab(triples_ds, preds)
    if len(vocab) == 0:
        raise ValueError("encode_triples: empty entity vocabulary")
    vocab_str = vocab.astype(str)
    pidx_map = {p: i for i, p in enumerate(preds)}

    def encode(batch: pa.Table) -> pa.Table:
        _, _, obj, h, r = _dense_batch(batch, preds, pidx_map)
        tt = np.searchsorted(vocab_str, obj)
        return pa.table(
            {
                "h": pa.array(h, pa.int64()),
                "r": pa.array(r, pa.int64()),
                "t": pa.array(tt.astype(np.int64), pa.int64()),
            }
        )

    return triples_ds.select_columns(["subj", "pred", "obj"]).map_batches(
        encode, batch_format="pyarrow"
    )


def corruption_negatives(
    triples_ds, preds: Sequence[str] = GRAPH_PREDS
):
    """KG-embedding training negatives: per graph triple, one corrupted
    tail drawn deterministically from the entity vocabulary:
    (subj, pred, obj, neg_obj).

    The draw index is the repo's glibc LCG over a per-triple integer key
    (page id * |preds| + pred index), taking the HIGH bits of the
    residue (``raw >> 16``) modulo |vocab| — the low bits of a power-of-
    two-modulus LCG cycle with period 2^k, and with the stride-4 key the
    draw's low bit would be CONSTANT per predicate.  A draw that lands
    on the true object steps to the next vocabulary slot (standard
    filtered corruption).  The vocabulary is broadcast once (see
    :func:`_entity_vocab`); the map is fully vectorized.
    """
    preds = tuple(preds)
    vocab = _entity_vocab(triples_ds, preds)
    n = len(vocab)
    if n < 2:
        raise ValueError(
            f"corruption_negatives: need >=2 distinct entities, got {n}"
        )
    pidx_map = {p: i for i, p in enumerate(preds)}
    stride = np.uint64(len(preds))

    def corrupt(batch: pa.Table) -> pa.Table:
        subj, pred, obj, h, r = _dense_batch(batch, preds, pidx_map)
        idx = _corruption_idx(h, r, stride, n)
        neg = vocab[idx].astype(str)
        coll = neg == obj
        if coll.any():
            neg[coll] = vocab[(idx[coll] + 1) % n].astype(str)
        return pa.table(
            {
                "subj": pa.array(subj, pa.string()),
                "pred": pa.array(pred, pa.string()),
                "obj": pa.array(obj, pa.string()),
                "neg_obj": pa.array(neg, pa.string()),
            }
        )

    return triples_ds.select_columns(["subj", "pred", "obj"]).map_batches(
        corrupt, batch_format="pyarrow"
    )


def kge_training_pairs(triples_ds, preds: Sequence[str] = GRAPH_PREDS):
    """The consumable KGE trainer input: one ``(h, r, t_pos, t_neg)``
    int64 row per graph-predicate triple — :func:`encode_triples`'s
    dense positives FUSED with :func:`corruption_negatives`' filtered
    draw in a single vectorized map (same page-id / predicate-index /
    row_number-vocab key spaces, so no join is ever materialized;
    margin-ranking losses read this table directly).

    Zero exchanges: the bounded entity vocabulary broadcasts once,
    ``t_pos`` is a vectorized searchsorted, the corruption index is
    the same high-bits LCG as corruption_negatives with the +1
    self-collision step on INDEX equality (vocab is sorted-unique, so
    index equality == string equality)."""
    preds = tuple(preds)
    vocab = _entity_vocab(triples_ds, preds)
    n = len(vocab)
    if n < 2:
        raise ValueError(
            f"kge_training_pairs: need >=2 distinct entities, got {n}"
        )
    pidx_map = {p: i for i, p in enumerate(preds)}
    stride = np.uint64(len(preds))

    def pairs(batch: pa.Table) -> pa.Table:
        _, _, obj, h, r = _dense_batch(batch, preds, pidx_map)
        t_pos = np.searchsorted(vocab, obj).astype(np.int64)
        idx = _corruption_idx(h, r, stride, n)
        t_neg = np.where(idx == t_pos, (idx + 1) % n, idx)
        return pa.table(
            {
                "h": pa.array(h),
                "r": pa.array(r),
                "t_pos": pa.array(t_pos),
                "t_neg": pa.array(t_neg),
            }
        )

    return triples_ds.select_columns(["subj", "pred", "obj"]).map_batches(
        pairs, batch_format="pyarrow"
    )


def neighbor_agg(
    edges_ds,
    vecs_ds,
    scale: int = 1_000_000,
    num_buckets: Optional[int] = None,
    local_threshold: int = 4_000_000,
):
    """GNN-style neighbor feature aggregation (one GraphSAGE layer):
    each entity's co-mention-weighted MEAN of its NEIGHBORS' vectors —
    exploded ``(entity, dim, avg)``, the :func:`entity_embeddings`
    layout, so layers compose.

    ``avg(a, d) = sum_b floor(vec(b, d) * scale) * w(a, b)
                  / (sum_b w(a, b) * scale)``
    over neighbors ``b`` PRESENT in ``vecs_ds`` (inner-join semantics —
    a vectorless neighbor contributes neither numerator nor weight,
    matching entity_embeddings' missing-page rule).  The neighbor
    vectors are re-quantized to fixed-point int64 at the read, so the
    sums are order-free exact and the single terminal division is
    bit-identical to the SQL mirror under any partitioning (the
    entity_vecs determinism regime).

    Distributed shape: ONE tagged co-group joins the edge stream
    (keyed by the neighbor endpoint) with the exploded vector state
    (keyed by entity) and emits per-group (node, dim) partial sums;
    exchange 2 merges per node — entity-vocabulary-bounded.  Hybrid
    single-task fast path under ``local_threshold`` edges,
    bit-identical.
    """
    import ray.data as rd

    num_buckets = resolve_parallelism(num_buckets)
    edges = edges_ds.materialize()
    vecs = vecs_ds.materialize()

    def _finish(qsum: np.ndarray, wsum: np.ndarray) -> np.ndarray:
        return qsum / (wsum * np.float64(scale))

    if edges.count() <= local_threshold:
        edf = edges.to_pandas()
        vdf = vecs.to_pandas()
        # prune to entities that ARE someone's neighbor before paying
        # the quantization: a small edge list against a large vector
        # table must not floor the whole vocabulary on the driver
        vdf = vdf[
            vdf["entity"].isin(pd.unique(edf["b"]))
        ]
        vdf = vdf.assign(
            qa=np.floor(
                vdf["avg"].to_numpy(np.float64) * np.float64(scale)
            ).astype(np.int64)
        )
        m = edf[["a", "b", "cnt"]].merge(
            vdf[["entity", "dim", "qa"]],
            left_on="b",
            right_on="entity",
            how="inner",
        )
        if len(m) == 0:
            return rd.from_arrow(
                pa.table(
                    {
                        "entity": pa.array([], pa.string()),
                        "dim": pa.array([], pa.int64()),
                        "avg": pa.array([], pa.float64()),
                    }
                )
            )
        cnt = m["cnt"].to_numpy(np.int64)
        g = (
            pd.DataFrame(
                {
                    "entity": m["a"].to_numpy(),
                    "dim": m["dim"].to_numpy(np.int64),
                    "qp": m["qa"].to_numpy(np.int64) * cnt,
                    "w": cnt,
                }
            )
            .groupby(["entity", "dim"], sort=False, as_index=False)
            .sum()
        )
        # NOTE: row order is not part of the contract (the distributed
        # path emits per-bucket order); only the VALUES are identical
        return rd.from_arrow(
            pa.table(
                {
                    "entity": pa.array(
                        g["entity"].to_numpy(dtype=object).astype(str),
                        pa.string(),
                    ),
                    "dim": pa.array(g["dim"].to_numpy(np.int64), pa.int64()),
                    "avg": pa.array(
                        _finish(
                            g["qp"].to_numpy(np.int64),
                            g["w"].to_numpy(np.int64),
                        ),
                        pa.float64(),
                    ),
                }
            )
        )

    _NA_TAG = pa.schema(
        [
            ("side", pa.int8()),
            ("key", pa.string()),  # co-group key: edge 'b' / vec entity
            ("other", pa.string()),  # the aggregating node (edge 'a')
            ("dim", pa.int64()),
            ("v", pa.int64()),  # side 0: edge weight; side 1: qa
            ("_bucket", pa.int32()),
        ]
    )

    def tag_edges(batch: pa.Table) -> pa.Table:
        b = pd.Series(batch["b"].to_numpy(zero_copy_only=False)).astype(str)
        n = len(b)
        return pa.table(
            {
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "key": pa.array(b, pa.string()),
                "other": batch["a"].cast(pa.string()),
                "dim": pa.array(np.zeros(n, dtype=np.int64)),
                "v": batch["cnt"].cast(pa.int64()),
                "_bucket": pa.array(bucket_of(b, num_buckets), pa.int32()),
            },
            schema=_NA_TAG,
        )

    def tag_vecs(batch: pa.Table) -> pa.Table:
        ent = pd.Series(
            batch["entity"].to_numpy(zero_copy_only=False)
        ).astype(str)
        n = len(ent)
        qa = np.floor(
            batch["avg"].to_numpy(zero_copy_only=False).astype(np.float64)
            * np.float64(scale)
        ).astype(np.int64)
        return pa.table(
            {
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "key": pa.array(ent, pa.string()),
                "other": pa.array([""] * n, pa.string()),
                "dim": batch["dim"].cast(pa.int64()),
                "v": pa.array(qa, pa.int64()),
                "_bucket": pa.array(bucket_of(ent, num_buckets), pa.int32()),
            },
            schema=_NA_TAG,
        )

    def agg_group(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["side"] == 0]
        vv = df[df["side"] == 1]
        if len(e) == 0 or len(vv) == 0:
            return pd.DataFrame(
                {
                    "entity": pd.Series(dtype=str),
                    "dim": pd.Series(dtype=np.int64),
                    "qp": pd.Series(dtype=np.int64),
                    "w": pd.Series(dtype=np.int64),
                    "_bucket": pd.Series(dtype=np.int32),
                }
            )
        m = e[["key", "other", "v"]].rename(columns={"v": "cnt"}).merge(
            vv[["key", "dim", "v"]], on="key", how="inner"
        )
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "entity": pd.Series(dtype=str),
                    "dim": pd.Series(dtype=np.int64),
                    "qp": pd.Series(dtype=np.int64),
                    "w": pd.Series(dtype=np.int64),
                    "_bucket": pd.Series(dtype=np.int32),
                }
            )
        cnt = m["cnt"].to_numpy(np.int64)
        g = (
            pd.DataFrame(
                {
                    "entity": m["other"].to_numpy(),
                    "dim": m["dim"].to_numpy(np.int64),
                    "qp": m["v"].to_numpy(np.int64) * cnt,
                    "w": cnt,
                }
            )
            .groupby(["entity", "dim"], sort=False, as_index=False)
            .sum()
        )
        g["qp"] = g["qp"].astype(np.int64)
        g["w"] = g["w"].astype(np.int64)
        g["_bucket"] = bucket_of(
            pd.Series(g["entity"]).astype(str), num_buckets
        ).astype(np.int32)
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["entity", "dim"], sort=False, as_index=False)[
            ["qp", "w"]
        ].sum()
        return pd.DataFrame(
            {
                "entity": g["entity"].to_numpy(),
                "dim": g["dim"].to_numpy(np.int64),
                "avg": _finish(
                    g["qp"].to_numpy(np.int64), g["w"].to_numpy(np.int64)
                ),
            }
        )

    out = (
        edges.map_batches(tag_edges, batch_format="pyarrow")
        .union(vecs.map_batches(tag_vecs, batch_format="pyarrow"))
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(agg_group), batch_format="pandas")
        .repartition(num_buckets)
        .groupby("_bucket")
        .map_groups(arrowed(merge), batch_format="pandas")
    )
    # a zero-row typed block rides along so the no-vector-overlap case
    # still yields the documented (entity, dim, avg) schema (an
    # all-empty groupby produces a schemaless dataset otherwise —
    # local-path parity on the empty case)
    return rd.from_arrow(
        pa.schema(
            [
                ("entity", pa.string()),
                ("dim", pa.int64()),
                ("avg", pa.float64()),
            ]
        ).empty_table()
    ).union(out)
