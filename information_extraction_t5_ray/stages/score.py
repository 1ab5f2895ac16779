"""Stage 3: question-conditioned T5 scoring (windows -> predictions).

A fixed-size actor-pool ``map_batches`` stage (north-star stage 2).
Each actor holds the model + question plan built once in ``__init__``
(reference loads T5 once per process, models/qa_model.py:37-88) and
answers EVERY qa_id of the closed schema for every window in one pass —
the T5 input ``question: {q} context: {ctx}`` is assembled inside the
actor per (window, question) pair, so window text is never duplicated
13x through the object store (scale-conscious departure from the
reference's materialized R3 tuples, convert_squad_to_t5.py:84-104).

Two scorers with the same output contract
``(url, window_id, n_windows, qa_id, prediction, prob)``:

* ``T5Scorer`` — production path: HF generate with ``num_beams=5,
  max_length=200, early_stopping=True`` + ``prob = exp(-loss/len)``
  (models/qa_model.py:140-171, 327-342).  Gated: transformers/torch are
  not installed here.
* ``MockT5Scorer`` — deterministic reader exercising the full grammar:
  finds the synthetic corpus' label lines in the window, answers
  ``[Type]: value`` / ``[Type]: N/A`` / compound concatenation in
  signature order (basic_to_squad.py:95-114), and mimics the
  ``exp(-loss/len)`` ranking: probability decays with the number of
  N/A members, so the fewer-NA/highest-prob window argmax is exercised
  for real.  A value line truncated by the window boundary (last line
  of an ellipsized context) is treated as unreadable -> N/A, mirroring
  a model failing on a cut-off span.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from ..registry import QuestionRegistry
from ..sources.synth import ENDERECO_LABELS, SIMPLE_LABELS

PREDICTIONS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("window_id", pa.int32()),
        ("n_windows", pa.int32()),
        ("qa_id", pa.string()),
        ("question", pa.string()),
        ("prediction", pa.string()),
        ("prob", pa.float64()),
    ]
)


def choose_question(questions: List[str], how: str, row_key: str) -> str:
    """'first' / 'random' / 'all' is handled upstream; 'random' derives
    the choice from a stable per-row hash, never from task order
    (SURVEY.md §4 determinism)."""
    if how == "first":
        return questions[0]
    if how == "random":
        import zlib

        return questions[zlib.crc32(row_key.encode()) % len(questions)]
    raise ValueError(f"choose_question={how} not supported at inference")


class _QAPlan:
    """Per-actor precomputed question plan over the closed qa_id set."""

    def __init__(
        self,
        registry: QuestionRegistry,
        type_names: Optional[List[str]] = None,
        use_compound: Optional[List[str]] = None,
        choose: str = "first",
    ):
        self.registry = registry
        self.choose = choose
        # default = configured universe: typenames whose display type is
        # mapped (params.yaml deliberately leaves e.g. doc_id_uf out)
        self.type_names = type_names or [
            f"{proj}.{tn}"
            for proj, d in registry.questions.items()
            for tn in d
            if isinstance(d[tn], dict) or tn in registry.typename_to_type
        ]
        self.use_compound = use_compound if use_compound is not None else [
            qa_id for qa_id in self.type_names if registry.is_compound(qa_id)
        ]
        self.all_qa_ids = registry.get_all_qa_ids(
            list_of_type_names=self.type_names,
            list_of_use_compound_question=self.use_compound,
        )
        self.tn2type = registry.typename_to_type
        # per qa_id: (is_compound, questions, leaf typename or signature)
        self.plan: Dict[str, tuple] = {}
        for qa_id in self.all_qa_ids:
            if qa_id in self.use_compound:
                qs = registry.get_questions_for_chunk(qa_id, is_compound=True)
                sig = list(registry.compound_signature(qa_id).keys())
                self.plan[qa_id] = (True, qs, sig)
            else:
                qs = registry.get_questions_for_chunk(qa_id)
                leaf = qa_id.split(".")[-1]
                self.plan[qa_id] = (False, qs, leaf)


class MockT5Scorer:
    """Deterministic scorer over the synthetic corpus layout."""

    def __init__(
        self,
        registry: Optional[QuestionRegistry] = None,
        type_names: Optional[List[str]] = None,
        use_compound: Optional[List[str]] = None,
        choose: str = "first",
    ):
        registry = registry or QuestionRegistry.default()
        self.plan = _QAPlan(registry, type_names, use_compound, choose)
        # leaf typename -> label line of the synthetic corpus
        self.simple_labels = dict(SIMPLE_LABELS)
        self.member_labels = dict(ENDERECO_LABELS)

    # -- per-window reading --------------------------------------------------

    def _read_window(self, context: str) -> Tuple[Dict[str, str], bool]:
        """Index the window's lines; returns (line -> next line) map and
        whether the window is end-truncated."""
        lines = context.split("\n")
        truncated = context.endswith("...")
        nxt: Dict[str, str] = {}
        last = len(lines) - 1
        for i, line in enumerate(lines):
            if i < last and line not in nxt:
                # value on the following line; unreadable if that line is
                # the truncated tail
                if not (truncated and i + 1 == last):
                    nxt[line] = lines[i + 1]
        # member lines 'Key: value' (self-contained)
        members: Dict[str, str] = {}
        for i, line in enumerate(lines):
            if ": " in line:
                if truncated and i == last:
                    continue
                k, v = line.split(": ", 1)
                if k not in members:
                    members[k] = v
        self._members = members
        return nxt, truncated

    def _answer(self, qa_id: str, nxt: Dict[str, str]) -> Tuple[str, float]:
        is_compound, _qs, leaf_or_sig = self.plan.plan[qa_id]
        tn2type = self.plan.tn2type
        if is_compound:
            parts, n_na = [], 0
            for tn in leaf_or_sig:
                label = self.member_labels.get(tn, tn)
                value = self._members.get(label)
                if value is None:
                    n_na += 1
                    parts.append(f"[{tn2type[tn]}]: N/A")
                else:
                    parts.append(f"[{tn2type[tn]}]: {value}")
            return " ".join(parts), math.exp(-(0.05 + 0.02 * n_na))
        leaf = leaf_or_sig
        label = self.simple_labels.get(leaf)
        value = nxt.get(label) if label else None
        if value is None:
            return f"[{tn2type[leaf]}]: N/A", math.exp(-0.07)
        return f"[{tn2type[leaf]}]: {value}", math.exp(-0.05)

    # -- batch interface -----------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        wids = batch["window_id"].to_pylist()
        nwins = batch["n_windows"].to_pylist()
        ctxs = batch["context"].to_pylist()
        o_url, o_wid, o_nw, o_qa, o_q, o_pred, o_prob = [], [], [], [], [], [], []
        for url, wid, nw, ctx in zip(urls, wids, nwins, ctxs):
            nxt, _trunc = self._read_window(ctx)
            for qa_id in self.plan.all_qa_ids:
                _, questions, _ = self.plan.plan[qa_id]
                pred, prob = self._answer(qa_id, nxt)
                o_url.append(url)
                o_wid.append(wid)
                o_nw.append(nw)
                o_qa.append(qa_id)
                o_q.append(choose_question(questions, self.plan.choose, f"{url}|{qa_id}"))
                o_pred.append(pred)
                o_prob.append(prob)
        return pa.table(
            {
                "url": o_url,
                "window_id": o_wid,
                "n_windows": o_nw,
                "qa_id": o_qa,
                "question": o_q,
                "prediction": o_pred,
                "prob": o_prob,
            },
            schema=PREDICTIONS_SCHEMA,
        )


def build_t5_inputs(
    batch: pa.Table, plan: "_QAPlan", use_sentence_id: bool = False
):
    """(windows batch, plan) -> flat lists (urls, wids, nwins, qa_ids,
    questions, input_sentences): the window x qa_id cross-product with
    the seq2seq input assembled in place (convert_squad_to_t5.py:84-104
    semantics; pure — unit-testable without torch)."""
    from ..functions.preprocess import generate_t5_input_sentence

    urls, wids, nwins, qa_ids, questions, inputs = [], [], [], [], [], []
    for url, wid, nw, ctx in zip(
        batch["url"].to_pylist(),
        batch["window_id"].to_pylist(),
        batch["n_windows"].to_pylist(),
        batch["context"].to_pylist(),
    ):
        for qa_id in plan.all_qa_ids:
            _, qs, _ = plan.plan[qa_id]
            q = choose_question(qs, plan.choose, f"{url}|{qa_id}")
            urls.append(url)
            wids.append(wid)
            nwins.append(nw)
            qa_ids.append(qa_id)
            questions.append(q)
            inputs.append(generate_t5_input_sentence(ctx, q, use_sentence_id))
    return urls, wids, nwins, qa_ids, questions, inputs


class T5Scorer:
    """Production scorer: same output contract as MockT5Scorer, real
    model on a fixed-size (GPU) actor pool.  Exercised without torch by
    tests/test_t5_scorer_real.py against a numpy-backed fake of the
    exact torch/transformers surface (incl. the int8 branch and the
    batched prob arithmetic).

    __init__ loads weights ONCE per actor — newest ``*.ckpt`` under the
    checkpoint dir or an HF name (predict.py:33-47) — and on CPU applies
    dynamic int8 quantization of Linear layers + ``set_num_threads(1)``
    (predict.py:43-52: one thread per 1-CPU actor, parallelism comes
    from the pool).  __call__ assembles the window x qa_id inputs,
    beam-search generates (``num_beams=5, max_length=200,
    early_stopping=True``, models/qa_model.py:153-163) and computes
    ``prob = exp(-loss / len(output_ids))`` via a second forward pass
    with the prediction as labels, batched with per-row masked CE
    instead of the reference's per-example loop
    (models/qa_model.py:327-342).
    """

    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        model_name: str = "unicamp-dl/ptt5-base-portuguese-vocab",
        registry: Optional[QuestionRegistry] = None,
        type_names: Optional[List[str]] = None,
        use_compound: Optional[List[str]] = None,
        choose: str = "first",
        use_sentence_id: bool = False,
        max_seq_length: int = 512,
        num_beams: int = 5,
        max_length: int = 200,
    ):
        try:
            import torch
            from transformers import AutoTokenizer, T5ForConditionalGeneration
        except ImportError as e:  # this container has no torch
            raise ImportError(
                "T5Scorer needs torch+transformers; MockT5Scorer "
                "implements the same contract for CPU-only environments."
            ) from e
        self.torch = torch
        self.plan = _QAPlan(
            registry or QuestionRegistry.default(), type_names, use_compound, choose
        )
        self.use_sentence_id = use_sentence_id
        self.max_seq_length = max_seq_length
        self.num_beams = num_beams
        self.max_length = max_length
        self.tokenizer = AutoTokenizer.from_pretrained(model_name, use_fast=False)
        if checkpoint_path:
            import glob as _glob
            import os as _os
            import re as _re

            # newest checkpoint, deterministically: primary keys are
            # NAMED epoch= / step= captures when present (so
            # 'epoch=9-val_loss=0.35.ckpt' ranks on 9, never on the
            # loss digits), falling back to the LAST bare number
            # ('epoch-10' sorts before 'epoch-9' as a string, the
            # reference predict.py:33-40 glob-order bug), then mtime
            # (which a tar/cp restore can flatten — hence not
            # primary), then name as the total-order tiebreak
            def _named(p: str, field: str) -> int:
                m = _re.search(rf"{field}[=\-_](\d+)", p)
                return int(m.group(1)) if m else -1

            def _ckpt_key(p: str):
                base = _os.path.basename(p)
                nums = _re.findall(r"\d+", base)
                return (
                    _named(base, "epoch"),
                    _named(base, "step"),
                    int(nums[-1]) if nums else -1,
                    _os.path.getmtime(p),
                    p,
                )

            ckpts = _glob.glob(f"{checkpoint_path}/*ckpt")
            if not ckpts:
                raise FileNotFoundError(
                    f"no *ckpt files under {checkpoint_path!r}"
                )
            newest = max(ckpts, key=_ckpt_key)
            state = torch.load(newest, map_location="cpu")["state_dict"]
            self.model = T5ForConditionalGeneration.from_pretrained(model_name)
            self.model.load_state_dict(
                {k.removeprefix("model."): v for k, v in state.items()},
                strict=False,
            )
        else:
            self.model = T5ForConditionalGeneration.from_pretrained(model_name)
        self.device = "cuda" if torch.cuda.is_available() else "cpu"
        if self.device == "cpu":
            self.model = torch.quantization.quantize_dynamic(
                self.model, {torch.nn.Linear}, dtype=torch.qint8
            )
            torch.set_num_threads(1)
        else:
            self.model = self.model.to(self.device)
        self.model.eval()

    def _generate(self, sentences: List[str]) -> List[str]:
        toks = self.tokenizer.batch_encode_plus(
            sentences,
            padding=True,
            truncation=True,
            max_length=self.max_seq_length,
            return_tensors="pt",
        )
        out = self.model.generate(
            input_ids=toks["input_ids"].to(self.device).long(),
            attention_mask=toks["attention_mask"].to(self.device).long(),
            max_length=self.max_length,
            num_beams=self.num_beams,
            early_stopping=True,
        )
        return self.tokenizer.batch_decode(out, skip_special_tokens=True)

    def _compute_probs(self, sentences: List[str], predictions: List[str]):
        """Batched exp(-loss/len): one forward with prediction ids as
        labels; per-row mean CE over non-pad positions."""
        torch = self.torch
        with torch.no_grad():
            enc = self.tokenizer.batch_encode_plus(
                sentences, padding=True, truncation=True,
                max_length=self.max_seq_length, return_tensors="pt",
            )
            lab = self.tokenizer.batch_encode_plus(
                predictions, padding=True, truncation=True,
                max_length=self.max_seq_length, return_tensors="pt",
            )
            labels = lab["input_ids"].to(self.device).long()
            labels_masked = labels.clone()
            labels_masked[lab["attention_mask"].to(self.device) == 0] = -100
            out = self.model(
                input_ids=enc["input_ids"].to(self.device).long(),
                attention_mask=enc["attention_mask"].to(self.device).long(),
                labels=labels_masked,
            )
            logits = out.logits
            ce = torch.nn.functional.cross_entropy(
                logits.transpose(1, 2), labels_masked,
                ignore_index=-100, reduction="none",
            )
            n_tok = (labels_masked != -100).sum(dim=1).clamp(min=1)
            loss_per_row = ce.sum(dim=1) / n_tok
            probs = torch.exp(-loss_per_row / n_tok).cpu().numpy()
        return probs.tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, wids, nwins, qa_ids, questions, inputs = build_t5_inputs(
            batch, self.plan, self.use_sentence_id
        )
        preds = self._generate(inputs)
        probs = self._compute_probs(inputs, preds)
        return pa.table(
            {
                "url": urls,
                "window_id": wids,
                "n_windows": nwins,
                "qa_id": qa_ids,
                "question": questions,
                "prediction": preds,
                "prob": probs,
            },
            schema=PREDICTIONS_SCHEMA,
        )


def score_stage(
    ds,
    scorer_cls=MockT5Scorer,
    scorer_kwargs: Optional[dict] = None,
    concurrency=4,
    batch_size: int | None = None,
    num_cpus: float = 1,
    num_gpus: float = 0,
    mode: str = "auto",
):
    """Attach the scorer stage.

    mode='actors': actor pool — REQUIRED when construction is expensive
    (T5Scorer loads weights once per actor; north-star GPU pool sizing
    via concurrency x num_gpus).
    mode='tasks': stateless task pool — the scorer INSTANCE is built on
    the driver and captured in the UDF closure (broadcast once into the
    object store).  Right when construction is cheap (MockT5Scorer's
    question plan, ~ms): tasks run on prestarted workers at full
    parallelism immediately, where an autoscaling actor pool spends the
    first seconds of every run ramping from one actor (measured 0.40 ->
    0.8+ scaling efficiency at sf0.1).
    mode='auto': tasks for cheap-constructor scorers, actors otherwise.
    """
    if mode == "auto":
        mode = "actors" if num_gpus or scorer_cls is not MockT5Scorer else "tasks"
    bs_kw = {"batch_size": batch_size} if batch_size else {}
    if mode == "tasks":
        scorer = scorer_cls(**(scorer_kwargs or {}))
        return ds.map_batches(
            lambda batch: scorer(batch),
            batch_format="pyarrow",
            num_cpus=num_cpus,
            **bs_kw,
        )
    kwargs = dict(
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=num_cpus,
        **bs_kw,
    )
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    return ds.map_batches(
        scorer_cls, fn_constructor_kwargs=(scorer_kwargs or {}), **kwargs
    )
