"""Stage 2: sliding-window chunking (pages -> windows rows).

An actor-pool ``map_batches`` stage: the tokenizer is built ONCE per
actor in ``__init__`` (reference loads AutoTokenizer once per process,
convert_dataset_to_squad.py:206-212); each ``__call__`` explodes a
batch of cleaned pages into window rows (the flat_map is expressed
inside map_batches so output stays Arrow-native).

Window semantics = ``functions/windows.py`` (parity-tested against
reference features/context.py).  The sizing question is the
reference's ``largest_question`` (basic_to_squad.py:218).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from ..functions.tokenizer import StubSentencePieceTokenizer
from ..functions.windows import get_context

LARGEST_QUESTION = "Quais são as principais informações do documento de publicação?"

WINDOWS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("window_id", pa.int32()),
        ("window_start", pa.int64()),
        ("context", pa.large_string()),
        ("n_windows", pa.int32()),
    ]
)


@dataclass
class ChunkConfig:
    context_content: str = "windows_token"  # params.yaml:57
    max_tokens: int = 512  # params.yaml:60
    max_size: int = 4000
    window_overlap: float = 0.2  # params.yaml:58
    max_windows: int = 3  # params.yaml:59
    use_sentence_id: bool = False
    piece_size: int = 4  # stub-tokenizer subword granularity
    question: str = LARGEST_QUESTION


class WindowChunker:
    """Callable-class stage for ``map_batches(WindowChunker, fn_constructor_kwargs=...)``."""

    def __init__(self, config: ChunkConfig | None = None):
        self.cfg = config or ChunkConfig()
        # once per actor (stateful setup)
        self.tokenizer = StubSentencePieceTokenizer(self.cfg.piece_size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        urls = batch["url"].to_pylist()
        texts = batch["clean_text"].to_pylist()
        # per-row annotations (raw-JSON E1 path) replicate onto windows
        carry = (
            batch["fields_json"].to_pylist()
            if "fields_json" in batch.schema.names
            else None
        )
        out_carry = [] if carry is not None else None
        out_url, out_wid, out_start, out_ctx, out_n = [], [], [], [], []
        for row_i, (url, text) in enumerate(zip(urls, texts)):
            if not text:
                continue
            contexts, offsets = get_context(
                text,
                context_content=cfg.context_content,
                max_size=cfg.max_size,
                use_sentence_id=cfg.use_sentence_id,
                tokenizer=self.tokenizer,
                max_tokens=cfg.max_tokens,
                question=cfg.question,
                window_overlap=cfg.window_overlap,
                max_windows=cfg.max_windows,
                uuid=url,
            )
            if not isinstance(contexts, list):  # non-windows strategies
                contexts, offsets = [contexts], [offsets]
            n = len(contexts)
            out_url.extend([url] * n)
            out_wid.extend(range(n))
            out_start.extend(int(o) for o in offsets)
            out_ctx.extend(contexts)
            out_n.extend([n] * n)
            if out_carry is not None:
                out_carry.extend([carry[row_i]] * n)
        cols = {
            "url": out_url,
            "window_id": out_wid,
            "window_start": out_start,
            "context": out_ctx,
            "n_windows": out_n,
        }
        if out_carry is not None:
            schema = WINDOWS_SCHEMA.append(pa.field("fields_json", pa.large_string()))
            cols["fields_json"] = out_carry
            return pa.table(cols, schema=schema)
        return pa.table(cols, schema=WINDOWS_SCHEMA)


def chunk_stage(ds, config: ChunkConfig | None = None, concurrency=None, batch_size: int | None = None):
    """Attach the chunker actor pool.  ``concurrency=None`` lets Ray run
    it as stateless tasks (fine for the stub tokenizer); pass an int or
    (min, max) when the tokenizer is expensive to build."""
    kwargs = dict(batch_format="pyarrow")
    if batch_size:
        kwargs["batch_size"] = batch_size
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
        return ds.map_batches(WindowChunker, fn_constructor_kwargs={"config": config}, **kwargs)
    return ds.map_batches(WindowChunker(config), **kwargs)
