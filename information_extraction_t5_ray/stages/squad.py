"""E1 path: windows x question schema -> SQuAD-style qa_pairs -> T5
examples (the reference's training-data production,
``data/basic_to_squad.py:196-319`` + ``data/convert_squad_to_t5.py:55-113``,
re-expressed as one vectorized ``map_batches`` over the windows table).

The reference nests windows inside a per-document SQuAD JSON; here every
(window, qa_id) pair is one Arrow row, so the cross-product streams and
shards naturally.  Per window:

* each schema ``qa_id`` whose value is present in the document becomes a
  positive qa ``[Type]: value`` (compound fields concatenate present +
  forced-N/A members in signature order, basic_to_squad.py:95-114);
* the anti-join remainder ``sorted(set(all_qa_ids) - satisfied)`` becomes
  forced-N/A rows with question choice pinned to 'first'
  (basic_to_squad.py:294-312 "avoid using too much negatives");
* both are rendered to the seq2seq pair ``(input_sentence,
  label_sentence)`` with optional ``[SENTk]`` sentence-ids
  (convert_squad_to_t5.py:84-104; answer_start is -1 for raw corpora, so
  annotated labels carry the ``[SENT0]`` prefix).

Field values come from a broadcast ``values_of(url) -> {leaf: value}``
callable (the small side of the join — the reference walks the raw
document dict, basic_to_squad.py:34-36).  The default is the synthetic
closed-form model, 1:1 with what ``sources/synth.py`` rendered into the
page text.

Question choice 'random' derives from a stable per-(url, qa_id) hash —
never from task order — so results are identical under any partitioning
(reference uses a global ``nr.randint``, convert_dataset_to_squad.py:214).
"""

from __future__ import annotations

import zlib
from typing import Callable, Dict, List, Optional

import pyarrow as pa

from ..functions.preprocess import (
    generate_t5_input_sentence,
    generate_t5_label_sentence,
)
from ..registry import QuestionRegistry

T5_EXAMPLES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("window_id", pa.int32()),
        ("qa_id", pa.string()),
        ("question", pa.string()),
        ("input_sentence", pa.large_string()),
        ("label_sentence", pa.string()),
        ("answer_start", pa.int64()),
        ("is_negative", pa.bool_()),
    ]
)

# + raw SQuAD fields (answer text + window context) for the JSON sink
SQUAD_EXTRA_FIELDS = [
    ("answer", pa.string()),
    ("context", pa.large_string()),
    ("qa_seq", pa.int32()),  # qa order within (url, window) paragraph
]


def synth_values_of(url: str) -> Dict[str, Optional[str]]:
    """Default broadcast value lookup: closed-form in doc_id."""
    from ..sources.synth import URL_PREFIX, field_values

    return field_values(int(url[len(URL_PREFIX):]))


class SquadGen:
    """Per-actor plan: closed qa_id set, questions, compound signatures
    (built once per worker, broadcast-join style)."""

    def __init__(
        self,
        registry: Optional[QuestionRegistry] = None,
        type_names: Optional[List[str]] = None,
        use_compound: Optional[List[str]] = None,
        values_of: Callable[[str], Dict[str, Optional[str]]] = synth_values_of,
        choose_question: str = "first",
        use_sentence_id: bool = True,
        project: str = "form",
        include_squad_cols: bool = False,
    ):
        from .score import _QAPlan

        registry = registry or QuestionRegistry.default()
        # _QAPlan's default type_names already excludes typenames with no
        # display-type mapping (reference params.yaml behavior)
        self.plan = _QAPlan(registry, type_names, use_compound, choose_question)
        self.values_of = values_of
        self.choose = choose_question
        self.use_sentence_id = use_sentence_id
        self.project = project
        self.tn2type = registry.typename_to_type
        # also emit (answer, context, qa_seq) for the SQuAD JSON sink
        self.include_squad_cols = include_squad_cols

    # -- reference basic_to_squad.py:13-130 semantics -------------------------

    def _questions(self, questions: List[str], url: str, qa_id: str) -> List[str]:
        if self.choose == "first":
            return [questions[0]]
        if self.choose == "random":
            idx = zlib.crc32(f"{url}|{qa_id}".encode()) % len(questions)
            return [questions[idx]]
        return list(questions)  # 'all' (train-time augmentation)

    def _answer_for(self, qa_id: str, values: Dict[str, Optional[str]]):
        """(answer text, satisfied?) for one schema qa_id."""
        is_compound, _qs, leaf_or_sig = self.plan.plan[qa_id]
        prefix = qa_id.split(".", 1)[1] if "." in qa_id else qa_id
        if is_compound:
            parts, any_present = [], False
            for tn in leaf_or_sig:
                v = values.get(f"{prefix}.{tn}")
                if v is None:
                    parts.append(f"[{self.tn2type[tn]}]: N/A")
                else:
                    parts.append(f"[{self.tn2type[tn]}]: {v}")
                    any_present = True
            return " ".join(parts), any_present
        v = values.get(prefix)
        leaf = leaf_or_sig
        if v is None:
            return f"[{self.tn2type[leaf]}]: N/A", False
        return f"[{self.tn2type[leaf]}]: {v}", True

    # -- batch interface -------------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json as _json

        urls = batch["url"].to_pylist()
        wids = batch["window_id"].to_pylist()
        ctxs = batch["context"].to_pylist()
        # annotations riding with the row win over the broadcast lookup
        fields = (
            batch["fields_json"].to_pylist()
            if "fields_json" in batch.schema.names
            else None
        )
        schema = T5_EXAMPLES_SCHEMA
        if self.include_squad_cols:
            for name, typ in SQUAD_EXTRA_FIELDS:
                schema = schema.append(pa.field(name, typ))
        out = {k: [] for k in schema.names}
        seq = {"n": 0}

        def emit(url, wid, ctx, qa_id, question, answer):
            x = generate_t5_input_sentence(ctx, question, self.use_sentence_id)
            y = generate_t5_label_sentence(answer, -1, ctx, self.use_sentence_id)
            out["url"].append(url)
            out["window_id"].append(wid)
            out["qa_id"].append(qa_id)
            out["question"].append(question)
            out["input_sentence"].append(x)
            out["label_sentence"].append(y)
            out["answer_start"].append(-1)
            out["is_negative"].append("N/A" in answer)
            if self.include_squad_cols:
                out["answer"].append(answer)
                out["context"].append(ctx)
                out["qa_seq"].append(seq["n"])
                seq["n"] += 1

        for row_i, (url, wid, ctx) in enumerate(zip(urls, wids, ctxs)):
            seq["n"] = 0
            if fields is not None:
                values = _json.loads(fields[row_i])
            else:
                values = self.values_of(url)
            satisfied = []
            for qa_id in self.plan.type_names:
                if qa_id.split(".")[0] != self.project:
                    continue
                is_compound, questions, _ = self.plan.plan.get(qa_id) or (
                    None,
                    None,
                    None,
                )
                if questions is None:
                    continue
                answer, present = self._answer_for(qa_id, values)
                if not present:
                    continue  # falls through to the forced-N/A anti-join
                for q in self._questions(questions, url, qa_id):
                    emit(url, wid, ctx, qa_id, q, answer)
                satisfied.append(qa_id)
            # anti-join vs broadcast universe; sorted for determinism
            for qa_id in sorted(set(self.plan.all_qa_ids) - set(satisfied)):
                entry = self.plan.plan.get(qa_id)
                if entry is None:
                    continue
                _, questions, _ = entry
                answer, _ = self._answer_for(qa_id, {})
                emit(url, wid, ctx, qa_id, questions[0], answer)
        return pa.table(out, schema=schema)


def t5_examples_stage(
    windows_ds,
    registry: Optional[QuestionRegistry] = None,
    type_names: Optional[List[str]] = None,
    use_compound: Optional[List[str]] = None,
    values_of: Callable = synth_values_of,
    choose_question: str = "first",
    use_sentence_id: bool = True,
    include_squad_cols: bool = False,
    batch_size: int | None = None,
    concurrency=None,
):
    """windows Dataset -> T5 examples Dataset (R3).

    Default: stateless tasks with the (cheap-to-build) generator
    instance broadcast in the UDF closure — full parallelism from the
    first block.  Pass ``concurrency`` to run as an actor pool instead
    (only worthwhile once the values lookup holds real state)."""
    ctor = dict(
        registry=registry,
        type_names=type_names,
        use_compound=use_compound,
        values_of=values_of,
        choose_question=choose_question,
        use_sentence_id=use_sentence_id,
        include_squad_cols=include_squad_cols,
    )
    kw = {"batch_size": batch_size} if batch_size else {}
    if concurrency is not None:
        return windows_ds.map_batches(
            SquadGen,
            batch_format="pyarrow",
            concurrency=concurrency,
            fn_constructor_kwargs=ctor,
            **kw,
        )
    gen = SquadGen(**ctor)
    return windows_ds.map_batches(
        lambda b: gen(b), batch_format="pyarrow", **kw
    )
