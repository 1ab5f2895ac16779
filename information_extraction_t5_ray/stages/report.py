"""Human-readable report sinks (reference ``models/qa_model.py:351-436``
``_save_outputs`` / ``_save_sheets`` + the metrics JSON writers
``:305-319``).

Scale posture: filtering, line rendering, metric computation and the
per-document pivot all run DISTRIBUTED; the driver only streams the
finished rows to the output file one batch at a time
(``iter_batches``), so driver RSS stays flat no matter how large the
answers table is.  The reference gathers everything into driver pandas
(qa_model.py:190-204) — that is exactly what dies at crawl scale, so
these sinks never call ``to_pandas()`` on an unbounded dataset.

The xlsx sink uses the stdlib SpreadsheetML writer (functions/xlsx.py —
no openpyxl needed) and is inherently a single-file driver-side render,
so it is only attempted for small result sets; everything else streams
to CSV with identical cells.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Optional

import pandas as pd

from ..functions.grammar import get_clean_answer_from_subanswer
from ..functions.metrics import compute_exact, compute_f1
from ..functions.textnorm import normalize_answer
from .common import bucket_of, resolve_parallelism

_HEADER = "{0:<50} | {1:50} | {2:30} | {3} | {4}\n"

# above this many pivot rows the xlsx attempt is skipped outright: one
# worksheet per crawl is not a human report, and to_excel is driver-bound
_XLSX_MAX_ROWS = 50_000


def save_outputs_report(
    answers_ds,
    path: str,
    only_mispredictions: bool = False,
    normalize_outputs: bool = True,
    group_col: Optional[str] = "example_id",
    document_classes: tuple = ("form",),
):
    """answers Dataset -> ``outputs.txt``-style grouped dump (reference
    _save_outputs).  The misprediction filter and line rendering run as
    distributed ``map_batches``; a distributed sort puts groups
    contiguous; the driver streams batches to the file and only tracks
    the current group header.

    Parity notes (qa_model.py:351-386): sections for ``ORIG``,
    ``DISJOINT*`` and bare document-class groups are skipped outright
    (metrics-only groups, :372-374); rows within a group keep document
    order — the sort key is (group, url, window), a stable row key, NOT
    the rendered line text; a group whose rows are all filtered by the
    misprediction filter still gets its section header (the reference
    writes the header before the row loop)."""

    def _skip_group(g: str) -> bool:
        return g == "ORIG" or g.startswith("DISJOINT") or g in document_classes

    def render(df: pd.DataFrame) -> pd.DataFrame:
        if group_col and group_col in df.columns:
            grp = df[group_col].astype(str)
        else:
            grp = pd.Series([""] * len(df), index=df.index, dtype=str)
        keep = ~grp.map(_skip_group).to_numpy(bool)
        df, grp = df[keep], grp[keep]
        if only_mispredictions:
            lab = df["label"].map(normalize_answer) if normalize_outputs else df["label"]
            pred = (
                df["prediction"].map(normalize_answer)
                if normalize_outputs
                else df["prediction"]
            )
            mism = lab.values != pred.values
            df, grp = df[mism], grp[mism]

        def _win(r):
            # production answers carry window_ids (winner id repeated,
            # ANSWERS_SCHEMA); the reference prints that winner id per
            # row (qa_model.py:357-385).  Scalar window_id kept for
            # ad-hoc frames.
            w = r.get("window_ids")
            if w is not None and not isinstance(w, str) and hasattr(w, "__len__"):
                return w[0] if len(w) else ""
            return r.get("window_id", "")

        lines, wins = [], []
        for _, r in df.iterrows():
            w = _win(r)
            wins.append(str(w))
            lines.append(
                _HEADER.format(r["label"], r["prediction"], r["url"], r["prob"], w)
            )
        return pd.DataFrame(
            {
                "grp": grp.to_numpy(),
                "url": df["url"].astype(str).to_numpy(),
                "win": wins,
                "line": lines,
            }
        )

    # the reference writes every (non-skipped) group's section header even
    # when the misprediction filter leaves it empty; with the filter on,
    # the group universe must come from the UNFILTERED input.  That makes
    # answers_ds a two-consumer dataset (universe pass + render pass), so
    # pin its blocks once — a lazy input would re-execute its whole
    # upstream lineage for each consumer.  No exception guard: a failed
    # universe pass must fail loud, not silently drop the headers this
    # branch exists to emit.
    empty_groups: list = []
    if only_mispredictions and group_col:
        answers_ds = answers_ds.materialize()

        def _grp_partial(df: pd.DataFrame) -> pd.DataFrame:
            # per-batch distinct (Ray's Unique aggregate trips over
            # pandas-block accumulators in 2.49); the driver sees one
            # row per (batch, group) — bounded by the group vocabulary
            if group_col in df.columns:
                vals = df[group_col].astype(str).unique()
            else:
                vals = []
            return pd.DataFrame({"g": pd.Series(vals, dtype=str)})

        seen = answers_ds.map_batches(
            _grp_partial, batch_format="pandas"
        ).to_pandas()
        # a ZERO-block dataset yields a column-less frame — an empty
        # input is not a failure (write a header-only report), only
        # real errors stay loud
        groups = seen["g"] if "g" in seen.columns else []
        empty_groups = sorted(
            {g for g in groups if not _skip_group(g) and g != ""}
        )  # consumed in order below
    rendered = answers_ds.map_batches(render, batch_format="pandas").sort(
        ["grp", "url", "win"]
    )
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    current = None
    ptr = 0
    with open(path, "w") as f:
        f.write(_HEADER.format("label", "prediction", "uuid", "prob", "window"))
        for batch in rendered.iter_batches(batch_format="pandas"):
            for g, line in zip(batch["grp"], batch["line"]):
                if group_col and g != "" and g != current:
                    # headers of row-less groups sorting before g
                    while ptr < len(empty_groups) and empty_groups[ptr] < g:
                        f.write(
                            f"===============\n{empty_groups[ptr]}\n===============\n"
                        )
                        ptr += 1
                    if ptr < len(empty_groups) and empty_groups[ptr] == g:
                        ptr += 1
                    f.write(f"===============\n{g}\n===============\n")
                    current = g
                f.write(line)
        while ptr < len(empty_groups):
            f.write(f"===============\n{empty_groups[ptr]}\n===============\n")
            ptr += 1
    return path


def pivoted_answers(
    answers_ds,
    example_ids: Optional[List[str]] = None,
    num_buckets: int | None = None,
):
    """answers Dataset -> one row per url with a (label, prediction,
    exact, f1, prob) column block per example_id (the reference
    _save_sheets pivot, distributed).

    ``example_ids``: the closed column universe (pass the registry's
    qa_id expansion when known).  When omitted it is derived with one
    extra distributed pass (``Dataset.unique``) — every bucket must emit
    the same columns or the blocks disagree on schema.
    """
    num_buckets = resolve_parallelism(num_buckets)

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
        out = df[["url", "example_id", "label", "prediction", "exact", "f1", "prob"]]
        return out.assign(_bucket=bucket_of(out["url"], num_buckets))

    scored = answers_ds.map_batches(score, batch_format="pandas")
    if example_ids is None:
        example_ids = sorted(scored.unique("example_id"))
    metrics = ["label", "prediction", "exact", "f1", "prob"]
    # flattened reference layout: example_id-major, metric-minor
    columns = [f"{e}.{m}" for e in sorted(example_ids) for m in metrics]

    def pivot(df: pd.DataFrame) -> pd.DataFrame:
        p = df.pivot(index=["url"], columns=["example_id"], values=metrics)
        p = p.swaplevel(0, 1, axis=1).sort_index(axis=1)
        p.columns = [f"{e}.{m}" for e, m in p.columns]
        p = p.reindex(columns=columns)
        return p.reset_index()

    return scored.groupby("_bucket").map_groups(pivot, batch_format="pandas")


def save_sheets_report(
    answers_ds,
    path: str,
    example_ids: Optional[List[str]] = None,
):
    """answers Dataset -> per-document pivot sheet (reference
    _save_sheets).  The pivot runs distributed (:func:`pivoted_answers`);
    small results try xlsx (openpyxl), everything else streams to one
    CSV batch-by-batch — the driver never holds the full table."""
    pivoted = pivoted_answers(answers_ds, example_ids=example_ids)
    Path(path).parent.mkdir(parents=True, exist_ok=True)

    # stream the sorted pivot to CSV batch-by-batch (never a full-table
    # to_pandas); xlsx is attempted afterwards only when the streamed
    # result turned out small (it re-reads the bounded CSV)
    csv_path = str(Path(path).with_suffix(".csv"))
    ordered = pivoted.sort("url")
    wrote_header = False
    n_rows = 0
    with open(csv_path, "w") as f:
        for batch in ordered.iter_batches(batch_format="pandas"):
            n_rows += len(batch)
            batch.set_index("url").to_csv(f, header=not wrote_header)
            wrote_header = True
    # n_rows > 0: an empty pivot writes a 0-byte CSV (no header), and
    # pd.read_csv on it raises EmptyDataError
    if 0 < n_rows <= _XLSX_MAX_ROWS and str(path) != csv_path:
        # stdlib SpreadsheetML writer (functions/xlsx.py) — the
        # reference's _save_sheets xlsx sink (qa_model.py:388-436)
        # without the openpyxl dependency; bounded by _XLSX_MAX_ROWS so
        # the re-read stays driver-small
        from ..functions.xlsx import write_xlsx

        small = pd.read_csv(csv_path)
        write_xlsx(
            path,
            {"sheet": (list(small.columns), small.itertuples(index=False))},
        )
        return path
    return csv_path


def save_metrics_json(eval_dict: dict, path: str):
    """{group: {exact, f1, total}} -> JSON (reference qa_model.py:316-319)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(eval_dict, f, indent=4, ensure_ascii=False)
    return path
