"""Stage 6: triple projection, canonicalization and graph materialize.

answers (variant rows) -> (subj, pred, obj) edges:

* project the ``clean`` / ``member_clean`` rows (the reference's
  DISJOINT set — the per-leaf canonical answers), drop N/A objects,
  rewrite ``form.endereco~cidade*`` -> ``form.endereco.cidade``;
* link objects (stages/link.py) and canonicalize on
  ``normalize_answer`` keys (north-star stage 4);
* canonical-entity aggregation is a SALTED two-phase groupby: per-batch
  partial counts keyed ``(obj_key, salt)`` -> bucket groupby -> final
  merge, so head entities (e.g. the deliberately skewed 'SSP') never
  land on one reducer;
* final edges sort on ``(subj, pred)`` and write partitioned Parquet
  (``partition_id = hash(url) % P``) with per-partition lineage
  manifests (state/manifest.py).
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.grammar import find_sub_answers
from ..functions.textnorm import normalize_answer

TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_surface", pa.string()),
        ("prob", pa.float64()),
        ("window_id", pa.int32()),
        ("partition_id", pa.int32()),
    ]
)


def project_triples_batch(batch: pa.Table, num_partitions: int = 64) -> pa.Table:
    """answers -> raw triples (obj not yet linked/canonicalized)."""
    mask = pc.is_in(batch["variant"], value_set=pa.array(["clean", "member_clean"]))
    rows = batch.filter(mask)
    subjs, preds, objs, probs, wids, parts = [], [], [], [], [], []
    memo_vals: dict = {}  # answer strings repeat heavily (N/A, small vocabularies)
    memo_rel: dict = {}
    for url, ex_id, pred_sa, prob, window_ids in zip(
        rows["url"].to_pylist(),
        rows["example_id"].to_pylist(),
        rows["prediction"].to_pylist(),
        rows["prob"].to_pylist(),
        rows["window_ids"].to_pylist(),
    ):
        value = memo_vals.get(pred_sa)
        if value is None:
            vs = find_sub_answers(pred_sa) if pred_sa else []
            value = vs[-1] if vs else ""
            memo_vals[pred_sa] = value
        if not value or value == "N/A":
            continue
        # 'form.cpf*' -> 'form.cpf'; 'form.endereco~cidade*' -> 'form.endereco.cidade'
        rel = memo_rel.get(ex_id)
        if rel is None:
            rel = ex_id.rstrip("*").replace("~", ".")
            memo_rel[ex_id] = rel
        subjs.append(url)
        preds.append(rel)
        objs.append(value)
        probs.append(prob)
        wids.append(window_ids[0] if window_ids else 0)
        parts.append(zlib.crc32(url.encode()) % num_partitions)
    return pa.table(
        {
            "subj": subjs,
            "pred": preds,
            "obj_surface": objs,
            "prob": probs,
            "window_id": pa.array(wids, pa.int32()),
            "partition_id": pa.array(parts, pa.int32()),
        }
    )


def project_stage(answers_ds, num_partitions: int = 64, batch_size: int | None = None):
    kw = {"batch_size": batch_size} if batch_size else {}
    return answers_ds.map_batches(
        lambda b: project_triples_batch(b, num_partitions),
        batch_format="pyarrow",
        **kw,
    )


def canonicalize_obj_stage(linked_ds, batch_size: int | None = None):
    """obj = normalize_answer(linked surface) — the canonical entity key."""

    def canon(batch: pa.Table) -> pa.Table:
        memo: dict = {}  # small value vocabularies -> memoize per batch

        def norm(v):
            out = memo.get(v)
            if out is None:
                out = normalize_answer(v)
                memo[v] = out
            return out

        objs = [norm(v) for v in batch["obj_linked"].to_pylist()]
        batch = batch.append_column("obj", pa.array(objs, pa.string()))
        return batch.select(
            ["subj", "pred", "obj", "obj_surface", "prob", "window_id", "partition_id"]
        )

    kw = {"batch_size": batch_size} if batch_size else {}
    return linked_ds.map_batches(canon, batch_format="pyarrow", **kw)


# ---------------------------------------------------------------------------
# salted canonical-entity aggregation
# ---------------------------------------------------------------------------


def entities_stage(
    triples_ds, num_salts: int = 16, num_buckets: int = 32, batch_size: int = 16384
):
    """Canonical entity table (entity_id, n_mentions, n_subjects_est,
    example_surface) via salted two-phase aggregation.

    Phase 1 (map_batches, vectorized): partial counts per
    ``(obj, salt)`` where ``salt = hash(subj) % num_salts`` — a head
    entity's rows split across salts.
    Phase 2: bucket groupby over the (tiny) partials; each bucket merges
    its keys vectorized and unsalts.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            salt=df["subj"].map(lambda u: zlib.crc32(u.encode()) % num_salts)
        )
        g = (
            df.groupby(["obj", "salt"], sort=False)
            .agg(
                n_mentions=("subj", "size"),
                example_surface=("obj_surface", "first"),
            )
            .reset_index()
        )
        g["bucket"] = g["obj"].map(lambda k: zlib.crc32(k.encode()) % num_buckets)
        return g

    def final(bucket_df: pd.DataFrame) -> pd.DataFrame:
        out = (
            bucket_df.groupby("obj", sort=False)
            .agg(
                n_mentions=("n_mentions", "sum"),
                example_surface=("example_surface", "first"),
            )
            .reset_index()
            .rename(columns={"obj": "entity_id"})
        )
        return out

    partials = triples_ds.map_batches(
        partial, batch_format="pandas", batch_size=batch_size
    )
    return partials.groupby("bucket").map_groups(final, batch_format="pandas")


def write_triples(
    triples_ds,
    out_dir: str,
    sort: bool = True,
    min_rows_per_file: int = 100_000,
):
    """Sorted, partitioned Parquet materialize (north rule) + lineage
    manifest per partition.

    ``min_rows_per_file`` coalesces output files — without it each sort
    output block becomes its own file (measured: 320k docs -> 4096 x
    ~30 KiB files), and small-file explosion is the classic sink failure
    at crawl scale (object-store listing and read-amplification costs).
    """
    ds = triples_ds.sort(["subj", "pred"]) if sort else triples_ds
    ds.write_parquet(
        out_dir,
        partition_cols=["partition_id"],
        min_rows_per_file=min_rows_per_file,
    )
    return out_dir
