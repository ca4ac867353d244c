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
    """One-row (n_extracted, n_skills, n_hit, precision, recall, f1)."""
    skills = spark.createDataFrame(vocab.SKILLS, "category string, skill string")
    skill_terms = skills.select(F.col("skill").alias("term")).distinct()
    extracted = (
        tokenized_docs(docs, cfg)
        .select(F.explode("tokens").alias("term"))
        .distinct()
    )
    n_extracted = extracted.count()
    n_skills = skill_terms.count()
    n_hit = extracted.join(F.broadcast(skill_terms), "term", "left_semi").count()
    precision = n_hit / n_extracted if n_extracted else 0.0
    recall = n_hit / n_skills if n_skills else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return spark.createDataFrame(
        [
            (
                n_extracted,
                n_skills,
                n_hit,
                round(precision, 6),
                round(recall, 6),
                round(f1, 6),
            )
        ],
        "n_extracted long, n_skills long, n_hit long, "
        "precision double, recall double, f1 double",
    )


def mean_average_precision(
    spark: SparkSession, docs: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """AP of whitelist skills over the cf-ranked term list (one row).

    rank terms by (cf DESC, term ASC); at each whitelist hit take
    hits_so_far / position; AP = mean over hits.
    """
    skills = spark.createDataFrame(vocab.SKILLS, "category string, skill string")
    skill_terms = skills.select(F.col("skill").alias("term")).distinct()
    dict_df = (
        term_frequencies(tokenized_docs(docs, cfg))
        .groupBy("term")
        .agg(F.sum("tf").alias("cf"))
    )
    w = Window.orderBy(F.col("cf").desc(), F.col("term"))
    ranked = (
        dict_df.join(
            F.broadcast(skill_terms.withColumn("is_skill", F.lit(1))), "term", "left"
        )
        .withColumn("is_skill", F.coalesce("is_skill", F.lit(0)))
        .withColumn("pos", F.row_number().over(w))
        .withColumn(
            "hits",
            F.sum("is_skill").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return ranked.filter(F.col("is_skill") == 1).agg(
        F.round(F.avg(F.col("hits") / F.col("pos")), 6).alias("average_precision"),
        F.count("*").alias("n_hits"),
    )
