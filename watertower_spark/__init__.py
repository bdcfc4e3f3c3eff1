"""watertower_spark — a PySpark-native full-text indexing + search engine.

A from-scratch rebuild of the search semantics of
future-architect/watertower (reference at /root/reference, Apache-2.0)
as an idiomatic Spark batch pipeline:

- ``analyzers``  — language analyzers (tokenize → stem → positions), pure
  Python, executed inside vectorized Arrow/pandas UDFs.
- ``functions``  — posting-list codec (delta+varint, Frame-of-Reference
  blocks with per-block max-impact) and text-analysis column functions.
- ``operators``  — index build (doc-sharded postings), query engines
  (reference-parity TF-IDF and BM25 block-max-WAND top-k), dedup,
  similarity search.
- ``sources``    — deterministic synthetic corpus generator (input_hint
  shape: url, warc_ts, html, text, lang) and table catalog with
  snapshot/lineage manifests.
"""

__version__ = "0.1.0"
