"""Stage 4: highest-probability-window argmax + compound-answer explosion.

Argmax (reference ``features/postprocess.py:249-288``): for each
``(url, qa_id)`` pick the window with the fewest ``'N/A'`` occurrences,
then highest prob, then earliest window — exactly pandas
``sort_values(['na','probs'], ascending=[True,False], kind='stable')
.groupby(...).head(1)`` + ``sort_index`` semantics, since rows are
generated in window order and the comparator ``(na, -prob, window_id)``
is a total order per key.

Scale shape: a vectorized PARTIAL reduce inside ``map_batches`` (one
surviving row per key per batch) -> shuffle only the partials, bucketed
by ``hash(url) % num_buckets`` -> per-bucket VECTORIZED final reduce in
``map_groups`` (each group is a whole bucket, not a single key, so the
per-group Python overhead is amortized; SURVEY.md §7.3 keys this
shuffle on url — uniform, high-cardinality, no salt needed).

Compound explosion (reference ``features/postprocess.py:73-246``): one
row per answer becomes up to ``1 + 1 + 2*len(signature)`` variant rows
(original, ``*``-clean, per-member ``~tn`` and ``~tn*``), tagged with a
``variant`` column instead of the reference's driver-side index lists —
ORIG/DISJOINT metric sets become filter predicates.
"""

from __future__ import annotations

import zlib
from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from .common import arrowed, bucket_of, resolve_parallelism
from ..functions.grammar import (
    deconstruct_answer,
    find_ids_of_sent_tokens,
    get_raw_answer_from_subsentence,
    get_subanswer_from_subsentence,
)

# ---------------------------------------------------------------------------
# argmax
# ---------------------------------------------------------------------------


def _reduce_best(df: pd.DataFrame, use_fewer_na: bool) -> pd.DataFrame:
    if use_fewer_na:
        df = df.sort_values(
            ["na", "prob", "window_id"],
            ascending=[True, False, True],
            kind="stable",
        )
    else:
        df = df.sort_values(
            ["prob", "window_id"], ascending=[False, True], kind="stable"
        )
    return df.drop_duplicates(subset=["url", "qa_id"], keep="first")


def best_window_stage(
    predictions_ds,
    use_fewer_na: bool = True,
    num_buckets: int | None = None,
    batch_size: int | None = None,  # None = whole blocks: an explicit
    # batch_size on a stage fused behind row-expanding maps is counted
    # in INPUT rows by the bundler and collapses task parallelism
):
    """predictions -> one best row per (url, qa_id)."""

    num_buckets = resolve_parallelism(num_buckets)
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(na=batch["prediction"].str.count("N/A"))
        out = _reduce_best(batch, use_fewer_na)
        out = out.assign(bucket=bucket_of(out["url"], num_buckets))
        return out

    def final(bucket_df: pd.DataFrame) -> pd.DataFrame:
        return _reduce_best(bucket_df, use_fewer_na).drop(columns=["bucket", "na"])

    partials = predictions_ds.map_batches(
        arrowed(partial),
        batch_format="pandas",
        **({"batch_size": batch_size} if batch_size else {}),
    )
    return partials.groupby("bucket").map_groups(arrowed(final), batch_format="pandas")


# ---------------------------------------------------------------------------
# compound split / explosion
# ---------------------------------------------------------------------------

ANSWERS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("example_id", pa.string()),
        ("label", pa.large_string()),
        ("prediction", pa.large_string()),
        ("prob", pa.float64()),
        ("window_ids", pa.list_(pa.int32())),
        ("sent_ids", pa.list_(pa.int32())),
        ("raw_text", pa.string()),
        ("variant", pa.string()),  # orig | clean | member | member_clean
        ("is_disjoint", pa.bool_()),
    ]
)


def split_compound_batch(
    batch: pa.Table,
    type_to_typename: dict,
    keep_original_compound: bool = True,
    keep_disjoint_compound: bool = True,
) -> pa.Table:
    """Faithful re-expression of split_compound_labels_and_predictions
    (postprocess.py:73-246) as a flat map over Arrow rows.

    The grammar parses are memoized PER BATCH: answer strings repeat
    heavily (every absent field yields the same '[Type]: N/A'; value
    vocabularies are small), and the parsers are pure — measured ~2x on
    this stage.  Memos are batch-local, so results stay independent of
    partitioning and worker history."""
    urls = batch["url"].to_pylist()
    qa_ids = batch["qa_id"].to_pylist()
    labels = batch["label"].to_pylist()
    preds = batch["prediction"].to_pylist()
    probs = batch["prob"].to_pylist()
    wids = batch["window_id"].to_pylist()

    memo_dec: dict = {}
    memo_sub: dict = {}

    def dec(s):
        out = memo_dec.get(s)
        if out is None:
            out = deconstruct_answer(s, type_to_typename)
            memo_dec[s] = out
        return out

    def sub(s):
        out = memo_sub.get(s)
        if out is None:
            # the grammar keeps non-numeric [SENTx] ids as strings
            # (sentences.py:55-74), but ANSWERS_SCHEMA types sent_ids as
            # list<int32> — a malformed model emission would otherwise
            # ArrowInvalid the whole split stage.  Coerce those to the
            # -1 sentinel (count preserved, id marked unparseable).
            sids = [
                i if isinstance(i, int) else -1
                for i in find_ids_of_sent_tokens(s)
            ]
            out = (
                get_subanswer_from_subsentence(s),
                get_raw_answer_from_subsentence(s),
                sids,
            )
            memo_sub[s] = out
        return out

    cols = {name: [] for name in ANSWERS_SCHEMA.names}

    def emit(url, ex_id, label, pred, prob, window_ids, sent_ids, raw_text, variant, disjoint):
        cols["url"].append(url)
        cols["example_id"].append(ex_id)
        cols["label"].append(label)
        cols["prediction"].append(pred)
        cols["prob"].append(prob)
        cols["window_ids"].append(window_ids)
        cols["sent_ids"].append(sent_ids)
        cols["raw_text"].append(raw_text)
        cols["variant"].append(variant)
        cols["is_disjoint"].append(disjoint)

    for url, qa_id, label, pred, prob, wid in zip(
        urls, qa_ids, labels, preds, probs, wids
    ):
        label_subs, label_tns = dec(label)
        pred_subs, pred_tns = dec(pred)
        # the reference's window_ids string: the winner's window id
        # repeated once per prediction subsentence (postprocess.py:271-272)
        window_ids = [wid] * max(1, len(pred_subs))

        if len(label_tns) <= 1 or keep_original_compound:
            emit(
                url, qa_id, " ".join(label_subs), " ".join(pred_subs), prob,
                window_ids, None, None, "orig", False,
            )
            if len(label_tns) <= 1:
                label_sa, _, _ = sub(" ".join(label_subs))
                pred_sa, _, _ = sub(" ".join(pred_subs))
                if pred_subs:
                    _, raw, sids = sub(pred_subs[0])
                else:
                    raw, sids = None, []
                emit(
                    url, qa_id + "*", label_sa, pred_sa, prob, window_ids,
                    sids, raw, "clean", keep_disjoint_compound,
                )

        if len(label_tns) > 1:
            w1 = window_ids[:1]  # compound: replicated id collapses
            for label_ss, label_tn in zip(label_subs, label_tns):
                try:
                    pred_ss = pred_subs[pred_tns.index(label_tn)]
                except ValueError:
                    pred_ss = ""
                emit(
                    url, f"{qa_id}~{label_tn}", label_ss, pred_ss, 0.0, w1,
                    None, None, "member", False,
                )
                label_sa, _, _ = sub(label_ss)
                pred_sa, raw, sids = sub(pred_ss)
                emit(
                    url, f"{qa_id}~{label_tn}*", label_sa, pred_sa, 0.0, w1,
                    sids, raw, "member_clean", keep_disjoint_compound,
                )

    return pa.table(cols, schema=ANSWERS_SCHEMA)


def split_stage(best_ds, type_to_typename: dict, batch_size: int | None = None):
    kw = {"batch_size": batch_size} if batch_size else {}
    return best_ds.map_batches(
        lambda b: split_compound_batch(b, type_to_typename),
        batch_format="pyarrow",
        **kw,
    )
