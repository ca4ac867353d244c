"""Structured Streaming surface: incremental index maintenance.

The reference is strictly batch (SURVEY.md §2.10 — its "streaming" is
generator-based out-of-core batch), so there is no parity obligation
here; this module is the idiomatic-Spark continuation the north star
implies: new crawl snapshots arrive → token stats update with
event-time windows → new postings are staged per micro-batch and
periodically folded into the main index.

- ``windowed_term_counts``: watermarked tumbling-window term counts
  over the document stream (event time = warc_ts).
- ``stage_postings_stream``: foreachBatch sink that tokenizes each
  micro-batch and appends ``(doc_id, term, tf, dl, batch_id)`` rows to
  a staging directory — the write side of an LSM-style index: cheap
  sequential appends, no read-modify-write of compressed blocks.
- ``staged_term_frequencies``: reads the staging area back as the same
  relation ``index.build.term_frequencies`` produces, so a periodic
  compaction is just ``build_index`` over (old docs ∪ staged docs) —
  Iceberg snapshot semantics at sandbox scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from keywords4cv_spark.config import DEFAULT_CONFIG, EngineConfig
from keywords4cv_spark.index.build import term_frequencies, tokenized_docs


def windowed_term_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Streaming tumbling-window counts of terms by event time."""
    toks = tokenized_docs(stream, cfg)
    terms = toks.select("warc_ts", F.explode("terms").alias("term"))
    return (
        terms.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "term")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "term",
            "n",
        )
    )


def stage_postings_stream(
    stream: DataFrame,
    staging_dir: str,
    checkpoint_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
):
    """Start a foreachBatch query staging per-micro-batch postings."""

    def stage(batch_df: DataFrame, batch_id: int) -> None:
        tf = term_frequencies(tokenized_docs(batch_df, cfg)).withColumn(
            "batch_id", F.lit(batch_id)
        )
        tf.write.mode("append").parquet(staging_dir)

    return (
        stream.writeStream.foreachBatch(stage)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def staged_term_frequencies(spark: SparkSession, staging_dir: str) -> DataFrame:
    """Staged rows re-aggregated to the batch term_frequencies relation.

    A doc appears in exactly one micro-batch, so summing tf across
    batch_ids is exact (and idempotent compaction drops batch_id)."""
    return (
        spark.read.parquet(staging_dir)
        .groupBy("doc_id", "term")
        .agg(F.sum("tf").alias("tf"), F.max("dl").alias("dl"))
    )
