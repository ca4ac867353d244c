"""Vocabulary expansion operators (SURVEY.md §2.3/§2.8).

- G4 synonym expansion: broadcast map explode — the static-table
  re-expression of the reference's WordNet/API synonym sources
  (/root/reference/keywords4cv.py:966-1019; the REST source S4 is an
  executor-I/O anti-pattern and stays out of the engine, SURVEY.md §2.1)
- U4 n-gram subsumption: drop a shorter n-gram when its token set is
  contained (overlap ratio ≥ threshold) in a longer kept n-gram
  (/root/reference/keyword_canonicalizer.py:167-231). Vocabulary-level
  self-join seeded on the first token to avoid the all-pairs product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from keywords4cv_spark.config import DEFAULT_CONFIG, EngineConfig
from keywords4cv_spark.index.build import tokenized_docs
from keywords4cv_spark.textprep.spark_exprs import ngrams_col

SYNONYMS: list[tuple[str, str]] = [
    ("spark", "pyspark"),
    ("merge", "combine"),
    ("vector", "embedding"),
    ("search", "retrieval"),
]

SUBSUME_OVERLAP = 0.8


def synonym_expanded_counts(
    spark: SparkSession, docs: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Per-term counts after synonym expansion: every corpus occurrence of
    a term also counts once per synonym (explode over the broadcast map)."""
    syn = spark.createDataFrame(SYNONYMS, "term string, synonym string")
    toks = tokenized_docs(docs, cfg)
    terms = toks.select("doc_id", F.explode("tokens").alias("term"))
    expanded = terms.join(F.broadcast(syn), "term", "left").select(
        "doc_id", F.explode(F.array("term", "synonym")).alias("out_term")
    ).filter(F.col("out_term").isNotNull())
    return expanded.groupBy(F.col("out_term").alias("term")).agg(
        F.count("*").alias("n")
    )


def surviving_bigrams(
    docs: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG, overlap: float = SUBSUME_OVERLAP
) -> DataFrame:
    """Distinct corpus bigrams NOT subsumed by any distinct trigram.

    A bigram is subsumed when overlap = |tokens(bi) ∩ tokens(tri)| /
    |tokens(bi)| ≥ threshold (with 2 tokens and 0.8 ⇒ both tokens in
    the trigram). The candidate join is seeded on the bigram's first
    token matching any trigram token — sub-quadratic at vocabulary size.
    """
    toks = tokenized_docs(docs, cfg).withColumn(
        "bi", ngrams_col(F.col("tokens"), 2, 2)
    ).withColumn("tri", ngrams_col(F.col("tokens"), 3, 3))
    bigrams = (
        toks.select(F.explode("bi").alias("bigram")).distinct()
        .withColumn("btoks", F.array_distinct(F.split("bigram", " ")))
        .withColumn("seed", F.element_at(F.split("bigram", " "), 1))
    )
    trigrams = (
        toks.select(F.explode("tri").alias("trigram")).distinct()
        .withColumn("ttoks", F.array_distinct(F.split("trigram", " ")))
        .select("trigram", "ttoks", F.explode("ttoks").alias("seed"))
    )
    cand = bigrams.join(trigrams, "seed")
    subsumed = cand.filter(
        F.size(F.array_intersect("btoks", "ttoks"))
        >= F.ceil(F.lit(overlap) * F.size("btoks"))
    ).select("bigram").distinct()
    return bigrams.select("bigram").join(subsumed, "bigram", "left_anti")
