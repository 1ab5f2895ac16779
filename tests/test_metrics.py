"""EM/F1 metric parity vs reference utils/metrics.py (FIXTURES.md F5)."""

import sys

import pytest

sys.path.insert(0, "/root/reference")

from information_extraction_t5.utils import metrics as ref_metrics

from information_extraction_t5_ray.functions import metrics as our_metrics

PAIRS = [
    ("São Paulo", "sao paulo"),  # accents -> EM 1
    ("88.975", "88975"),  # punctuation -> EM 1
    ("[Estado]: N/A", "[Estado]: N/A"),
    ("N/A", ""),  # NA vs empty: both normalize to "na" vs ""
    ("", ""),
    ("Rua PEDRO BIAGI 462", "Rua PEDRO BIAGI"),
    ("the cat sat", "cat sat here"),
    ("a", "an"),
]


@pytest.mark.parametrize("gold,pred", PAIRS)
def test_exact_parity(gold, pred):
    assert our_metrics.compute_exact(gold, pred) == ref_metrics.compute_exact(
        gold, pred
    )


@pytest.mark.parametrize("gold,pred", PAIRS)
def test_f1_parity(gold, pred):
    assert our_metrics.compute_f1(gold, pred) == pytest.approx(
        ref_metrics.compute_f1(gold, pred)
    )


def test_t5_qa_evaluate_parity():
    answers = [g for g, _ in PAIRS]
    preds = [p for _, p in PAIRS]
    qid_dict = {"grp_a": [0, 1, 2], "grp_b": [3, 4, 5, 6, 7]}
    assert our_metrics.t5_qa_evaluate(
        answers, preds, qid_dict
    ) == ref_metrics.t5_qa_evaluate(answers, preds, qid_dict)
