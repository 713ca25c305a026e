"""astrologer_ray — a Ray-Data-native full-text index build + BM25 query engine.

A from-scratch re-expression (NOT a port) of the capabilities of
astroband/astrologer (reference at /root/reference): the reference is a
Go extract→transform→bulk-index pipeline feeding Elasticsearch, which then
owns the inverted index and the query surface. This engine owns all three
halves natively on Ray Data:

- ingest/extract  -> ``ray.data.read_parquet`` + ``map_batches`` over
  zero-copy Arrow batches (reference: commands/export.go:40-89),
- index build     -> SPIMI-style per-partition partial postings, a salted
  ``groupby(term)`` merge shuffle, delta+varbyte-compressed block-max
  posting chunks (what Elasticsearch/Lucene did for the reference),
- query serving   -> actor pool holding dictionary + posting shards,
  top-k BM25 (k1=1.2, b=0.75) via block-max document-at-a-time scoring
  (reference query surface: es.postman_collection.json).

Package layout:
  sources/    corpus generator + readers (reference: db/*.go)
  functions/  pure vectorized kernels: tokenizer, varbyte codec, text ops
  stages/     map_batches stage classes (stateful actor-pool stages)
  pipelines/  end-to-end pipelines: index build, aggs, dedup, ANN, text stats
  state/      query-time state: searcher actors, BM25 oracle, lineage
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
