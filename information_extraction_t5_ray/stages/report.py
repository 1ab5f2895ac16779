"""Human-readable report sinks (reference ``models/qa_model.py:351-436``
``_save_outputs`` / ``_save_sheets`` + the metrics JSON writers
``:305-319``).

Scale posture: the FILTER (mispredictions only) and the metric
computation run distributed; only the rows that survive — a report
meant for human eyes, so inherently small — are rendered driver-side.
The xlsx writer needs openpyxl (not in this container), so the pivot
falls back to CSV with identical cell contents; the pivot itself is the
reference's (labels, predictions, exact, f1, probs) x typename layout.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import pandas as pd

from ..functions.grammar import get_clean_answer_from_subanswer
from ..functions.metrics import compute_exact, compute_f1
from ..functions.textnorm import normalize_answer

_HEADER = "{0:<50} | {1:50} | {2:30} | {3} | {4}\n"


def save_outputs_report(
    answers_ds,
    path: str,
    only_mispredictions: bool = False,
    normalize_outputs: bool = True,
    group_col: Optional[str] = "example_id",
):
    """answers Dataset -> ``outputs.txt``-style grouped dump (reference
    _save_outputs).  The misprediction filter runs as a distributed
    ``map_batches``; rendering happens on the (small) survivor set,
    grouped by example_id with the reference's section headers."""

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        if not only_mispredictions:
            return df
        lab = df["label"].map(normalize_answer) if normalize_outputs else df["label"]
        pred = (
            df["prediction"].map(normalize_answer)
            if normalize_outputs
            else df["prediction"]
        )
        return df[lab.values != pred.values]

    small = answers_ds.map_batches(keep, batch_format="pandas").to_pandas()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        f.write(_HEADER.format("label", "prediction", "uuid", "prob", "window"))
        if group_col and group_col in small.columns:
            for kword, grp in small.groupby(group_col, sort=True):
                if kword == "ORIG" or str(kword).startswith("DISJOINT"):
                    continue
                f.write(f"===============\n{kword}\n===============\n")
                for _, r in grp.iterrows():
                    f.write(
                        _HEADER.format(
                            r["label"], r["prediction"], r["url"],
                            r["prob"], r.get("window_id", ""),
                        )
                    )
        else:
            for _, r in small.iterrows():
                f.write(
                    _HEADER.format(
                        r["label"], r["prediction"], r["url"],
                        r["prob"], r.get("window_id", ""),
                    )
                )
    return path


def save_sheets_report(answers_ds, path: str):
    """answers Dataset -> per-document pivot sheet (reference
    _save_sheets): one row per url, a (labels, predictions, exact, f1,
    probs) column block per typename.  Metric columns are computed
    distributed; the pivot runs on the aggregated small table.  Writes
    xlsx when openpyxl exists, else CSV (same cells)."""

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["exact"] = [
            compute_exact(l, p) for l, p in zip(df["label"], df["prediction"])
        ]
        df["f1"] = [compute_f1(l, p) for l, p in zip(df["label"], df["prediction"])]
        df["label"] = [
            ", ".join(get_clean_answer_from_subanswer(x)) for x in df["label"]
        ]
        df["prediction"] = [
            ", ".join(get_clean_answer_from_subanswer(x)) for x in df["prediction"]
        ]
        return df[["url", "example_id", "label", "prediction", "exact", "f1", "prob"]]

    small = answers_ds.map_batches(score, batch_format="pandas").to_pandas()
    pivoted = small.pivot(
        index=["url"],
        columns=["example_id"],
        values=["label", "prediction", "exact", "f1", "prob"],
    )
    pivoted = pivoted.swaplevel(0, 1, axis=1).sort_index(axis=1)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    try:  # pragma: no cover - openpyxl absent in this container
        pivoted.to_excel(path)
    except (ImportError, ModuleNotFoundError):
        path = str(Path(path).with_suffix(".csv"))
        pivoted.to_csv(path)
    return path


def save_metrics_json(eval_dict: dict, path: str):
    """{group: {exact, f1, total}} -> JSON (reference qa_model.py:316-319)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(eval_dict, f, indent=4, ensure_ascii=False)
    return path
