"""Auxiliary sources/sinks (SURVEY.md §2.1 S3/S8/S9).

- load_synonyms_json: the reference's synonyms.json phrase-synonym
  source (/root/reference/keywords4cv.py:900-927, shape
  {phrase: [synonyms...]}) → a broadcastable (term, synonym) relation.
- save_results_jsonl / save_results_parquet: result sinks (reference
  S8/S9, keywords4cv.py:3243-3277 + :1338-1340); atomicity comes from
  Spark's _SUCCESS commit protocol rather than tmp-file + os.replace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_synonyms_rows(path: str) -> list[tuple[str, str]]:
    """{phrase: [syn, ...]} JSON file → sorted (term, synonym) tuples.

    The plain-Python half of the synonym source: the packaged
    WordNet-substitute fixture (resources/synonyms.json) and any
    user-supplied synonyms file load through this same shape — the
    reference's synonyms.json contract
    (/root/reference/keywords4cv.py:900-927)."""
    import json

    with open(path) as f:
        data = json.load(f)
    return [
        (str(term), str(s))
        for term, syns in sorted(data.items())
        for s in sorted(syns)
    ]


def load_synonyms_json(spark: SparkSession, path: str) -> DataFrame:
    """{phrase: [syn, ...]} JSON file → (term, synonym) rows.

    Read driver-side (the file is vocabulary-sized by definition) and
    parallelized as a broadcast-ready DataFrame — matching the
    reference's single-file load, not a distributed JSON scan.
    """
    return spark.createDataFrame(
        load_synonyms_rows(path), "term string, synonym string"
    )


def load_job_descriptions_json(spark: SparkSession, path: str) -> DataFrame:
    """The reference's input format ({title: description} JSON,
    /root/reference/job_descriptions.json shape) → a documents frame
    (doc_id, text, lang, source). Titles become the source field (the
    reference carries them as 'Job Title'); doc ids are assigned in
    sorted-title order (deterministic)."""
    import json

    with open(path) as f:
        data = json.load(f)
    rows = [
        (i, str(desc), "en", str(title))
        for i, (title, desc) in enumerate(sorted(data.items()))
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def save_results_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def save_results_parquet(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def summary_and_details(summary: DataFrame, details: DataFrame, out_dir: str) -> None:
    """Two-sheet result sink analog (reference S8 writes Summary +
    Detailed Scores xlsx) — two partitioned parquet tables under one dir."""
    save_results_parquet(summary.withColumn("sheet", F.lit("summary")), f"{out_dir}/summary")
    save_results_parquet(details.withColumn("sheet", F.lit("details")), f"{out_dir}/details")
