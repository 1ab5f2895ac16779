"""Exact-match / token-F1 metrics (reference ``utils/metrics.py:40-131``).

Scalar kernels used inside ``map_batches``; the grouped aggregates live
in ``stages/metrics_stage.py`` (partial sum/count per batch -> tiny
final groupby, never a driver gather).
"""

from __future__ import annotations

import collections
from typing import Dict, List, Optional

from .textnorm import get_tokens, normalize_answer


def compute_exact(a_gold: str, a_pred: str) -> int:
    """metrics.py:46-47."""
    return int(normalize_answer(a_gold) == normalize_answer(a_pred))


def compute_f1(a_gold: str, a_pred: str) -> float:
    """metrics.py:50-63 — token-multiset F1; empty-vs-empty agrees."""
    gold_toks = get_tokens(a_gold)
    pred_toks = get_tokens(a_pred)
    common = collections.Counter(gold_toks) & collections.Counter(pred_toks)
    num_same = sum(common.values())
    if len(gold_toks) == 0 or len(pred_toks) == 0:
        return int(gold_toks == pred_toks)
    if num_same == 0:
        return 0
    precision = 1.0 * num_same / len(pred_toks)
    recall = 1.0 * num_same / len(gold_toks)
    return (2 * precision * recall) / (precision + recall)


def get_raw_scores(answers: List[str], preds: List[str]):
    """metrics.py:88-101."""
    exact = {i: compute_exact(a, p) for i, (a, p) in enumerate(zip(answers, preds))}
    f1 = {i: compute_f1(a, p) for i, (a, p) in enumerate(zip(answers, preds))}
    return exact, f1


def make_eval_dict(exact_scores, f1_scores, qid_list=None):
    """metrics.py:66-85 — means x100 plus total count."""
    if not qid_list:
        total = len(exact_scores)
        return collections.OrderedDict(
            [
                ("exact", 100.0 * sum(exact_scores.values()) / total),
                ("f1", 100.0 * sum(f1_scores.values()) / total),
                ("total", total),
            ]
        )
    total = len(qid_list)
    return collections.OrderedDict(
        [
            ("exact", 100.0 * sum(exact_scores[k] for k in qid_list) / total),
            ("f1", 100.0 * sum(f1_scores[k] for k in qid_list) / total),
            ("total", total),
        ]
    )


def t5_qa_evaluate(
    answers: List[str], preds: List[str], qid_dict: Optional[Dict] = None
):
    """metrics.py:104-131 — overall + per-group EM/F1 dicts."""
    if qid_dict is None:
        qid_dict = {}
    exact, f1 = get_raw_scores(answers, preds)
    evaluation = make_eval_dict(exact, f1)
    for kword, qid_list in qid_dict.items():
        evaluation[kword] = make_eval_dict(exact, f1, qid_list)
    return evaluation


def group_qas(ids: List[str], group_by_typenames: bool = True) -> Dict[str, List[int]]:
    """Reference ``features/postprocess.py:16-70`` — build group-key ->
    row-index maps over example_ids (project rollup, ``_i`` suffix and
    ``~comp`` / ``*`` collapsing) or document_ids."""
    qid_dict: Dict[str, List[int]] = {}
    for idx, the_id in enumerate(ids):
        if group_by_typenames and "~" not in the_id:
            proj = the_id.split(".")[0]
            qid_dict.setdefault(proj, []).append(idx)

        qid_dict.setdefault(the_id, []).append(idx)

        if group_by_typenames:
            comp = None
            work_id = the_id
            try:
                work_id, comp = work_id.rsplit("~", 1)
            except ValueError:
                pass
            try:
                doc_ex_id, t = work_id.rsplit("_", 1)
                has_asterisk = t.endswith("*")
                if comp is None and has_asterisk:
                    t = t[:-1]
                int(t.strip())  # chunk suffix must be an integer
                if comp is not None:
                    doc_ex_id += "~" + comp
                elif has_asterisk:
                    doc_ex_id += "*"
                qid_dict.setdefault(doc_ex_id, []).append(idx)
            except ValueError:
                pass
    return qid_dict
