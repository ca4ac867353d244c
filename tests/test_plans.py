"""Physical-plan assertions: pushdown, broadcast, codegen (SURVEY.md §4.3).

These pin the *plans*, not just the results — a regression that turns
the lang filter into a post-scan filter or the query-term join into a
sort-merge shuffle fails here before it shows up as a slowdown.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from keywords4cv_spark.config import EngineConfig
from keywords4cv_spark.index.build import tokenized_docs
from keywords4cv_spark.plans import (
    explain_str,
    pushed_filters,
    uses_broadcast_join,
    wholestage_codegen_spans,
    without_aqe,
)
from keywords4cv_spark.query.bm25 import bm25_brute_force

CFG = EngineConfig()


def test_lang_filter_pushed_to_scan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tokenized_docs(docs, CFG).select("doc_id", "dl")
    filters = pushed_filters(toks)
    assert any("lang" in f for f in filters), filters


def test_column_pruning_reaches_scan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = explain_str(docs.select("doc_id").filter(F.col("doc_id") > 5))
    assert "ReadSchema: struct<doc_id:bigint>" in plan, plan


def test_bm25_uses_broadcast_joins_and_codegen(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with without_aqe(spark):
        df = bm25_brute_force(spark, docs, CFG)
        assert uses_broadcast_join(df)
        assert wholestage_codegen_spans(df) > 0
        # query terms are the broadcast side; nothing falls to sort-merge
        assert "SortMergeJoin" not in explain_str(df)
