"""keywords4cv_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference repo ``DavidOsipov/Keywords4CV``
(read-only at /root/reference) as an idiomatic PySpark engine:

- deterministic text normalization / tokenization / n-grams
  (reference semantics: keywords4cv.py:593-613 regex chain,
  :618-678 token filters, :1480-1497 n-grams) — implemented three
  ways that must agree byte-for-byte: pure Python (the frozen parity
  target), Spark column expressions (the JVM fast path), and a
  vectorized pandas UDF (the Arrow path);
- SPIMI-style inverted-index build with term-hash partitioning,
  salted-key skew splitting for Zipfian head terms, delta-gap +
  varbyte posting compression and per-block max-score metadata;
- BM25 (k1/b) top-k retrieval: a relational brute-force scorer and a
  Block-Max-WAND scorer that must be rank-identical;
- checkpoint-resumable builds with per-partition lineage + metrics;
- large-scale training-data-pipeline operators: exact/MinHash-LSH/
  SimHash/Jaccard dedup, cosine ANN, language-ID and quality scoring,
  document fingerprinting, multimodal binary-column plumbing.

Everything is DataFrame/Catalyst-first; Python appears only in
vectorized Arrow-batched UDFs (never per-row).
"""

# NB 0.4.0: postings `segment` became a doc band (doc_id % n_salts) —
# 0.3.x indexes are layout-incompatible with band-grouped query plans.
# 0.5.0: the stats table carries an explicit `layout` marker and
# load_index refuses trees without it (pre-0.5 caches must rebuild).
__version__ = "0.6.0"

from keywords4cv_spark.config import EngineConfig  # noqa: F401
