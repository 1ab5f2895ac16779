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
