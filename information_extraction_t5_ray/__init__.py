"""Ray-Data-native knowledge-graph construction engine.

From-scratch re-expression of the extraction semantics of
``neuralmind-ai/information-extraction-t5`` (reference at /root/reference,
cited by file:line throughout) as a streaming Ray Data DAG over Parquet
web-page shards ``(url, warc_ts, html, text, lang)``:

    read_parquet(pages)
      -> extract+clean text        (stateless map_batches, zero-copy Arrow)
      -> sliding-window chunking   (actor pool holding the tokenizer)
      -> question generation       (broadcast question registry)
      -> T5 scoring                (fixed-size actor pool; mock scorer here)
      -> output-grammar parsing    (stateless map_batches)
      -> per-(url, qa_id) argmax   (partial combine + small groupby)
      -> compound-answer explosion
      -> entity linking            (broadcast alias dict + embedding rerank)
      -> canonicalization          (salted groupby on normalized keys)
      -> (subj, pred, obj) triples (sorted, partitioned Parquet + manifests)

Nothing here calls ``ray.init()``; sessions are owned by bench.py / tests.
"""

__version__ = "0.1.0"


def _install_empty_schema_log_filter() -> None:
    """Drop ONE known-benign Ray Data warning: 'Operator produced a
    RefBundle with a different schema ... new schema: <EMPTY>'.

    Ray's sort-based ``groupby().map_groups()`` emits a zero-row,
    zero-FIELD block for every sort partition that received no rows
    (more upstream blocks than distinct bucket keys guarantees some),
    and `streaming_executor_state` only short-circuits the comparison
    when the OLD schema is empty — an empty NEW schema still warns
    (ray/data/block.py ``_is_empty_schema`` is checked one-sided).
    Those blocks carry no rows, so the 'divergence' cannot affect
    results.  Real schema divergences (both schemas non-empty) still
    warn; nothing else is filtered."""
    import logging

    class _EmptyNewSchema(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:  # noqa: A003
            msg = record.getMessage()
            if "Operator produced a RefBundle with a different schema" not in msg:
                return True
            return not (
                "new schema: . " in msg
                or "new schema: PandasBlockSchema(names=[], types=[])" in msg
            )

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptyNewSchema())


_install_empty_schema_log_filter()
