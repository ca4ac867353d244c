"""Synthetic corpus: determinism, input_hint shape, extract_text parity
(byte-identical text per url — the BASELINE.json invariant)."""

from __future__ import annotations

from pyspark.sql import functions as F

from keywords4cv_spark.sources.corpus import synth_documents
from keywords4cv_spark.textprep.udfs import make_extract_text_udf

N = 1000


def test_schema_matches_input_hint(spark):
    df = synth_documents(spark, 50)
    assert dict(df.drop("doc_id").dtypes) == {
        "url": "string",
        "warc_ts": "timestamp",
        "html": "binary",
        "text": "string",
        "lang": "string",
    }


def test_deterministic_across_builds_and_partitioning(spark):
    a = synth_documents(spark, N, n_partitions=2).orderBy("doc_id").collect()
    b = synth_documents(spark, N, n_partitions=16).orderBy("doc_id").collect()
    assert a == b


def test_urls_unique_and_empty_row_present(spark):
    df = synth_documents(spark, N)
    assert df.select("url").distinct().count() == N
    assert df.filter(F.length("text") == 0).count() == N // 997


def test_extract_text_byte_identical_per_url(spark):
    """input_hint invariant: extract_text(html) == text, byte for byte."""
    df = synth_documents(spark, N)
    out = df.withColumn("extracted", make_extract_text_udf()(F.col("html")))
    bad = out.filter(F.col("extracted") != F.col("text"))
    rows = bad.select("url", "text", "extracted").take(3)
    assert not rows, rows


def test_zipf_head_terms(spark):
    """Head vocab terms must hit a large fraction of docs (skew driver)."""
    from keywords4cv_spark.index.build import term_frequencies, tokenized_docs
    from keywords4cv_spark.config import EngineConfig

    df = synth_documents(spark, N)
    tf = term_frequencies(tokenized_docs(df, EngineConfig()))
    n_en = df.filter(F.col("lang") == "en").count()
    dfs = {
        r["term"]: r["n"]
        for r in tf.groupBy("term").agg(F.count("*").alias("n")).collect()
    }
    assert dfs["the"] > 0.8 * n_en  # head term in >80% of docs
    tail = [t for t in dfs if t.startswith("term1")]
    assert tail and max(dfs[t] for t in tail) < 0.2 * n_en  # deep tail is rare
    # hyphenated skills split into parts
    assert "scikit" in dfs and "learn" in dfs
