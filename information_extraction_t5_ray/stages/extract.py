"""Fused extraction: cleaned pages -> best answer per (url, qa_id) in
ONE stateless ``map_batches`` — no shuffle.

The reference materializes windows, scores them, gathers everything to
the driver and argmaxes per (document, field)
(``features/postprocess.py:249-288``).  The separable Ray stages
(chunk_stage -> score_stage -> best_window_stage) reproduce that shape
with a (url, qa_id)-keyed groupby.  But the argmax's key is derived
from ONE input row — every window of a url comes from the same pages
row — so grouping is free if the window explosion and the reduction
happen inside the same UDF call.  This stage composes chunker + scorer
+ fewest-NA/highest-prob/earliest-window reduction per page, which:

* removes the pipeline's only pre-materialize all-to-all (the argmax
  sort shuffle — measured ~40% of flagship wall time at sf0.1);
* is safe under ANY partitioning (a url lives in exactly one row);
* never ships window text through the object store.

Window-order tie-breaking is identical to the reference: windows are
scored in ascending window_id order and a later window must be strictly
better ((na, -prob) lexicographic) to replace the incumbent.
"""

from __future__ import annotations

from typing import List, Optional

import pyarrow as pa

from ..registry import QuestionRegistry
from .chunk import ChunkConfig
from .score import MockT5Scorer, choose_question
from ..functions.tokenizer import StubSentencePieceTokenizer
from ..functions.windows import get_context

BEST_SCHEMA = pa.schema(
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


class ExtractBest:
    """pages batch (url, clean_text) -> one best row per (url, qa_id)."""

    def __init__(
        self,
        chunk: Optional[ChunkConfig] = None,
        registry: Optional[QuestionRegistry] = None,
        type_names: Optional[List[str]] = None,
        use_compound: Optional[List[str]] = None,
        use_fewer_na: bool = True,
        scorer: Optional[MockT5Scorer] = None,
    ):
        self.cfg = chunk or ChunkConfig()
        self.tokenizer = StubSentencePieceTokenizer(self.cfg.piece_size)
        self.scorer = scorer or MockT5Scorer(
            registry=registry or QuestionRegistry.default(),
            type_names=type_names,
            use_compound=use_compound,
        )
        self.use_fewer_na = use_fewer_na

    def _windows(self, text: str, uuid: str = ""):
        cfg = self.cfg
        contexts, offsets = get_context(
            text,
            uuid=uuid,  # names the offending page in the tokenizer-
            # offset assertion — at crawl scale 'which document' is
            # the whole diagnosis (chunk.py passes it; the fused path
            # must too)
            context_content=cfg.context_content,
            max_size=cfg.max_size,
            use_sentence_id=cfg.use_sentence_id,
            tokenizer=self.tokenizer,
            max_tokens=cfg.max_tokens,
            question=cfg.question,
            window_overlap=cfg.window_overlap,
            max_windows=cfg.max_windows,
        )
        if not isinstance(contexts, list):
            contexts = [contexts]
        return contexts

    def __call__(self, batch: pa.Table) -> pa.Table:
        sc = self.scorer
        plan = sc.plan
        cols = {name: [] for name in BEST_SCHEMA.names}
        for url, text in zip(
            batch["url"].to_pylist(), batch["clean_text"].to_pylist()
        ):
            if not text:
                continue
            contexts = self._windows(text, uuid=url)
            n = len(contexts)
            # best per qa_id: (na, -prob) lexicographic, first window wins
            # ties (reference stable sort + head(1))
            best = {}
            for wid, ctx in enumerate(contexts):
                nxt, _trunc = sc._read_window(ctx)
                for qa_id in plan.all_qa_ids:
                    pred, prob = sc._answer(qa_id, nxt)
                    na = pred.count("N/A") if self.use_fewer_na else 0
                    key = (na, -prob)
                    cur = best.get(qa_id)
                    if cur is None or key < cur[0]:
                        best[qa_id] = (key, wid, pred, prob)
            for qa_id, (key, wid, pred, prob) in best.items():
                _, questions, _ = plan.plan[qa_id]
                cols["url"].append(url)
                cols["window_id"].append(wid)
                cols["n_windows"].append(n)
                cols["qa_id"].append(qa_id)
                cols["question"].append(
                    choose_question(questions, plan.choose, f"{url}|{qa_id}")
                )
                cols["prediction"].append(pred)
                cols["prob"].append(prob)
        return pa.table(cols, schema=BEST_SCHEMA)


def extract_best_stage(
    pages_clean_ds,
    chunk: Optional[ChunkConfig] = None,
    registry: Optional[QuestionRegistry] = None,
    type_names: Optional[List[str]] = None,
    use_compound: Optional[List[str]] = None,
    use_fewer_na: bool = True,
    concurrency=None,
    batch_size: Optional[int] = None,
):
    """Attach the fused extraction.  Tasks by default (instance in the
    UDF closure); pass ``concurrency`` for an actor pool when the scorer
    holds real model state."""
    ctor = dict(
        chunk=chunk,
        registry=registry,
        type_names=type_names,
        use_compound=use_compound,
        use_fewer_na=use_fewer_na,
    )
    kw = {"batch_size": batch_size} if batch_size else {}
    if concurrency is not None:
        return pages_clean_ds.map_batches(
            ExtractBest,
            batch_format="pyarrow",
            concurrency=concurrency,
            fn_constructor_kwargs=ctor,
            **kw,
        )
    inst = ExtractBest(**ctor)
    return pages_clean_ds.map_batches(
        lambda b: inst(b), batch_format="pyarrow", **kw
    )
