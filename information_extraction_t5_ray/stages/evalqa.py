"""Distributed EM/F1 evaluation harness (reference
``utils/metrics.py:104-131`` + ``models/qa_model.py:305-319``).

The reference gathers every prediction into driver lists, builds
group -> row-index maps (``features/postprocess.py:16-70``) and means
EM/F1 per group.  Here each row expands to its (possibly several) group
keys inside ``map_batches`` — project rollup, the id itself, the
``_i``-chunk/``~comp``/``*`` collapsed id — with per-batch partial sums,
and a tiny final groupby reduces (sum_exact, sum_f1, n).  No driver
gather; output cardinality is the number of groups, not rows.

Two row-id groupings, matching the reference's two JSON reports:
``by='typenames'`` (metrics_by_typenames.json) and ``by='documents'``
(metrics_by_documents.json).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd

from ..functions.metrics import compute_exact, compute_f1
from .common import resolve_parallelism


def groups_of_id(the_id: str, by_typenames: bool = True) -> List[str]:
    """Group keys one example_id contributes to (the per-element logic of
    reference postprocess.py:16-70 group_qas)."""
    groups: List[str] = []
    if by_typenames and "~" not in the_id:
        groups.append(the_id.split(".")[0])
    groups.append(the_id)
    if by_typenames:
        comp = None
        work_id = the_id
        if "~" in work_id:
            work_id, comp = work_id.rsplit("~", 1)
        try:
            doc_ex_id, t = work_id.rsplit("_", 1)
            has_asterisk = t.endswith("*")
            if comp is None and has_asterisk:
                t = t[:-1]
            int(t.strip())
            if comp is not None:
                doc_ex_id += "~" + comp
            elif has_asterisk:
                doc_ex_id += "*"
            groups.append(doc_ex_id)
        except ValueError:
            pass
    return groups


def eval_stage(
    ds,
    label_col: str = "label",
    pred_col: str = "prediction",
    id_col: str = "example_id",
    by: str = "typenames",
    overall_key: str = "all",
    num_buckets: int | None = None,
    batch_size: int | None = None,
):
    """answers Dataset -> per-group metrics Dataset
    ``(grp, n_exact, f1_sum_x1e6, total)`` (ints — exact under any
    summation order; render means with :func:`finalize_eval`)."""
    num_buckets = resolve_parallelism(num_buckets)
    by_typenames = by == "typenames"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        grps, exacts, f1s = [], [], []
        for label, pred, the_id in zip(df[label_col], df[pred_col], df[id_col]):
            e = compute_exact(label, pred)
            # per-ROW integer quantization so partial sums are exact and
            # partition-order-independent (floats would drift)
            f = int(round(compute_f1(label, pred) * 1e6))
            keys = [overall_key]
            if by_typenames:
                keys += groups_of_id(the_id, True)
            else:
                keys.append(the_id)
            for g in keys:
                grps.append(g)
                exacts.append(e)
                f1s.append(f)
        out = pd.DataFrame(
            {"grp": grps, "exact": exacts, "f1": np.asarray(f1s, dtype=np.int64)}
        )
        agg = (
            out.groupby("grp", sort=False)
            .agg(
                n_exact=("exact", "sum"),
                f1_sum_x1e6=("f1", "sum"),
                total=("exact", "size"),
            )
            .reset_index()
        )
        h = pd.util.hash_pandas_object(agg["grp"], index=False)
        agg["_bucket"] = (h % num_buckets).astype(np.int32)
        return agg

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("grp", sort=False)
            .agg(
                n_exact=("n_exact", "sum"),
                f1_sum_x1e6=("f1_sum_x1e6", "sum"),
                total=("total", "sum"),
            )
            .reset_index()
        )
        return g

    partials = ds.map_batches(
        partial, batch_format="pandas", **({"batch_size": batch_size} if batch_size else {})
    )
    return partials.groupby("_bucket").map_groups(final, batch_format="pandas")


def finalize_eval(metrics_df: pd.DataFrame) -> dict:
    """Small-table driver render: the reference's eval dict shape
    ``{group: {exact, f1, total}}`` with means x100
    (utils/metrics.py:66-85)."""
    out = {}
    for _, row in metrics_df.iterrows():
        out[row["grp"]] = {
            "exact": 100.0 * row["n_exact"] / row["total"],
            "f1": 100.0 * (row["f1_sum_x1e6"] / 1e6) / row["total"],
            "total": int(row["total"]),
        }
    return out
