"""Categorization + centroid operators (J5/A5) and input sanitation (P3).

- sanitize_docs: the reference's input-sanitation policies
  (/root/reference/keywords4cv.py:1979-2006; policy model :104-113)
  as declarative filters — drop null/empty/too-short texts under
  policy 'strict', keep-and-flag under 'allow'.
- categorize_terms: direct-match category assignment from the skills
  whitelist with 'Uncategorized' default
  (/root/reference/keywords4cv.py:1068-1090 — the centroid-argmax
  fallback stage needs term vectors, which the engine models via the
  embeddings path below).
- label_centroids: per-group mean embedding
  (/root/reference/keywords4cv.py:1025-1048 category centroids) as a
  posexplode + avg aggregation — no UDF, scales to any group count.
- assign_to_centroids: argmax-cosine assignment of vectors to the
  computed centroids (the J5 semantic fallback re-expressed over the
  embeddings table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from keywords4cv_spark import vocab
from keywords4cv_spark.config import DEFAULT_CONFIG, EngineConfig
from keywords4cv_spark.index.build import tokenized_docs
from keywords4cv_spark.operators.similarity import cosine_col

MIN_TEXT_LEN = 10


def sanitize_docs(docs: DataFrame, policy: str = "strict") -> DataFrame:
    """(doc_id, text, lang, reject_reason): policy-driven sanitation.

    'strict' drops bad rows; 'allow' keeps them flagged (reason column
    NULL for clean rows) — mirroring the reference's warn/error/allow."""
    reason = (
        F.when(F.col("text").isNull(), "null_text")
        .when(F.length(F.trim(F.col("text"))) == 0, "empty_text")
        .when(F.length(F.col("text")) < MIN_TEXT_LEN, "too_short")
        .otherwise(F.lit(None).cast("string"))
    )
    out = docs.select("doc_id", "text", "lang", reason.alias("reject_reason"))
    if policy == "strict":
        return out.filter(F.col("reject_reason").isNull()).drop("reject_reason")
    return out


def categorize_terms(
    spark: SparkSession, docs: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """(term, category, df): direct whitelist match else 'Uncategorized'."""
    skills = spark.createDataFrame(vocab.SKILLS, "category string, skill string")
    terms = (
        tokenized_docs(docs, cfg)
        .select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    return terms.join(
        F.broadcast(skills.withColumnRenamed("skill", "term")), "term", "left"
    ).select(
        "term",
        F.coalesce("category", F.lit("Uncategorized")).alias("category"),
        "df",
    )


def label_centroids(emb: DataFrame) -> DataFrame:
    """(label, centroid array<double>, n): per-label mean embedding via
    posexplode + avg — dimension-wise hash aggregation, no UDF."""
    dims = emb.select("label", F.posexplode("embedding").alias("i", "x"))
    per_dim = dims.groupBy("label", "i").agg(
        F.avg(F.col("x").cast("double")).alias("m")
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("i", "m"))
            ).alias("pairs")
        )
        .select(
            "label",
            F.transform(F.col("pairs"), lambda p: p["m"]).alias("centroid"),
        )
        .join(emb.groupBy("label").agg(F.count("*").alias("n")), "label")
    )


def assign_to_centroids(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, assigned_label, cosine): argmax-cosine over broadcast
    centroids with deterministic ties (label asc)."""
    scored = emb.crossJoin(
        F.broadcast(
            centroids.select(F.col("label").alias("c_label"), "centroid")
        )
    ).select(
        "vec_id",
        "c_label",
        F.round(cosine_col(F.col("embedding"), F.col("centroid")), 6).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("c_label"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("c_label").alias("assigned_label"), "cosine")
    )
