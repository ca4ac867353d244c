"""Extraction-quality metrics (SURVEY.md §2.5 A7/A8).

Re-expresses the reference's precision/recall/F1/coverage set-overlap
metrics (/root/reference/keywords4cv.py:2182-2239,
metrics_evaluation.py:36-107) and mean-average-precision
(metrics_evaluation.py:147-178) as semi-join counts and a window
cumsum — no sklearn, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from keywords4cv_spark import vocab
from keywords4cv_spark.config import DEFAULT_CONFIG, EngineConfig
from keywords4cv_spark.index.build import term_frequencies, tokenized_docs


def extraction_metrics(
    spark: SparkSession, docs: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """One-row (n_extracted, n_skills, n_hit, precision, recall, f1).

    ONE aggregation job: the whitelist is a driver-side constant (its
    distinct count needs no Spark job), so a single broadcast left join
    + agg yields every count, and the derived metrics are columns of
    that one row — no collect/driver arithmetic, no repeated scans.
    """
    skill_set = sorted({s for _, s in vocab.SKILLS})
    n_skills = len(skill_set)
    skill_terms = spark.createDataFrame(
        [(s, 1) for s in skill_set], "term string, is_skill int"
    )
    extracted = (
        tokenized_docs(docs, cfg)
        .select(F.explode("tokens").alias("term"))
        .distinct()
    )
    counts = (
        extracted.join(F.broadcast(skill_terms), "term", "left")
        .agg(
            F.count("*").alias("n_extracted"),
            F.coalesce(F.sum("is_skill"), F.lit(0)).cast("long").alias("n_hit"),
        )
        .withColumn("n_skills", F.lit(n_skills).cast("long"))
    )
    p = F.when(
        F.col("n_extracted") > 0, F.col("n_hit") / F.col("n_extracted")
    ).otherwise(F.lit(0.0))
    r = F.when(F.col("n_skills") > 0, F.col("n_hit") / F.col("n_skills")).otherwise(
        F.lit(0.0)
    )
    f1 = F.when((p + r) > 0, 2.0 * p * r / (p + r)).otherwise(F.lit(0.0))
    return counts.select(
        "n_extracted",
        "n_skills",
        "n_hit",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def mean_average_precision(
    spark: SparkSession, docs: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """AP of whitelist skills over the cf-ranked term list (one row).

    rank terms by (cf DESC, term ASC); at each whitelist hit take
    hits_so_far / position; AP = mean over hits.

    The global position is assigned with the same partition-offset
    scheme as index.build.assign_term_ids — ``Window.orderBy`` with no
    partitionBy would funnel the ENTIRE vocabulary through one task
    (the 1e9-term blocker): instead range-partition on the rank key,
    collect per-partition counts (driver-small), broadcast cumulative
    offsets, and add a within-partition row_number. Range partitions
    are ordered and disjoint on (cf DESC, term), so offset + local rank
    IS the global rank. The only remaining global window runs over the
    whitelist-hit subset — bounded by the whitelist cardinality (a
    driver-side constant list), not the vocabulary.
    """
    skills = spark.createDataFrame(vocab.SKILLS, "category string, skill string")
    skill_terms = skills.select(F.col("skill").alias("term")).distinct()
    dict_df = (
        term_frequencies(tokenized_docs(docs, cfg))
        .groupBy("term")
        .agg(F.sum("tf").alias("cf"))
    )
    n_parts = spark.sparkContext.defaultParallelism
    # eager localCheckpoint, not persist: the materialized blocks pin the
    # (pid → count) mapping collected below against recomputation (range
    # boundaries are sampled), and are GC-released when this frame goes
    # out of scope — a persist here would sit in the cache manager for
    # the driver session's lifetime (ADVICE r3).
    parted = (
        dict_df.repartitionByRange(n_parts, F.col("cf").desc(), F.col("term"))
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        int(r["pid"]): int(r["cnt"])
        for r in parted.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = spark.createDataFrame(offsets, "pid int, pos_offset long")
    w_local = Window.partitionBy("pid").orderBy(F.col("cf").desc(), F.col("term"))
    positioned = (
        parted.join(F.broadcast(off_df), "pid")
        .withColumn("pos", F.row_number().over(w_local) + F.col("pos_offset"))
        .drop("pid", "pos_offset")
    )
    # whitelist-sized relation from here on: hits_so_far at a hit row is
    # its rank among hit rows in the same global order. Computed as a
    # broadcast self-join count (O(|whitelist|²) pairs, trivially small)
    # instead of Window.orderBy(pos) so NO node in this plan — not even a
    # bounded one — funnels through Exchange SinglePartition.
    hit_pos = positioned.join(F.broadcast(skill_terms), "term", "left_semi").select(
        "pos"
    )
    earlier = hit_pos.select(F.col("pos").alias("pos_b"))
    per_hit = (
        hit_pos.join(F.broadcast(earlier), F.col("pos_b") <= F.col("pos"))
        .groupBy("pos")
        .agg(F.count("*").alias("hits"))
    )
    return per_hit.agg(
        F.round(F.avg(F.col("hits") / F.col("pos")), 6).alias("average_precision"),
        F.count("*").alias("n_hits"),
    )
