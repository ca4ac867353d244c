"""Driver-contract query registry: Spark queries + DuckDB oracle SQL.

Each entry pairs a PySpark implementation (spark, sf_dir) -> DataFrame
with an equivalent ANSI-SQL string DuckDB runs on the same parquet
tables. Column names/types are aligned on both sides because the
driver's comparator hashes values after sorting columns by name.

Ordering is irrelevant to the comparator, but LIMIT/top-k queries pin
deterministic tie-breaks on BOTH sides so the selected row SET is
identical.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from keywords4cv_spark.config import DEFAULT_CONFIG, EngineConfig
from keywords4cv_spark.deploy import ensure_py_files
from keywords4cv_spark.index.build import (
    build_index,
    corpus_stats,
    term_frequencies,
    tokenized_docs,
)
from keywords4cv_spark.oracle import tokens_sql
from keywords4cv_spark.query.bm25 import bm25_brute_force
from keywords4cv_spark.query.fixtures import TOP_K, query_term_pairs
from keywords4cv_spark.query.wand import bm25_wand

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

CFG = DEFAULT_CONFIG


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_py_files(spark)  # executors must import this package
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB); the Spark twins live in index/build.py
# ---------------------------------------------------------------------------

_EN_TOKS = (
    "SELECT doc_id, {toks} AS toks FROM documents WHERE lang = 'en'"
).format(toks=tokens_sql("text"))

_TF_CTES = f"""
d AS ({_EN_TOKS}),
dd AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM d),
post AS (SELECT doc_id, unnest(toks) AS term FROM dd),
tfs AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM post GROUP BY doc_id, term),
dict AS (SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
         FROM tfs GROUP BY term),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dd)
"""


def _values_queries() -> str:
    rows = ", ".join(f"({qid}, '{t}')" for qid, t in query_term_pairs())
    return f"q(query_id, term) AS (SELECT CAST(c0 AS BIGINT), c1 FROM (VALUES {rows}) v(c0, c1))"


def _bm25_oracle(k1: float, b: float, k: int) -> str:
    return f"""
WITH {_TF_CTES},
{_values_queries()},
scored AS (
  SELECT q.query_id, t.doc_id,
         sum( ln(1.0 + (s.n_docs - dict.df + 0.5) / (dict.df + 0.5))
              * (t.tf * ({k1} + 1.0))
              / (t.tf + {k1} * (1.0 - {b} + {b} * dd.dl / s.avgdl)) ) AS score
  FROM q
  JOIN dict USING (term)
  JOIN tfs t USING (term)
  JOIN dd ON dd.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, t.doc_id
),
ranked AS (
  SELECT query_id, doc_id, round(score, 6) AS score,
         CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id
         ) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# BM25 retrieval (north-star ops T4): brute force + Block-Max WAND
# ---------------------------------------------------------------------------


@register("bm25_topk", _bm25_oracle(CFG.k1, CFG.b, TOP_K))
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_brute_force(spark, _docs(spark, sf_dir), CFG, TOP_K)


_INDEX_CACHE: dict[str, object] = {}


def _index_for(spark: SparkSession, sf_dir: str):
    if sf_dir not in _INDEX_CACHE:
        base = os.path.join(
            tempfile.gettempdir(), "k4cv_index", sf_dir.strip("/").replace("/", "_")
        )
        cfg = EngineConfig(
            n_term_buckets=4,
            # exercise the salted-segment path at every sf (head-term df is
            # ~200 at sf0.01, ~2000 at sf0.1)
            skew_df_threshold=150,
            n_salts=4,
        )
        docs = _docs(spark, sf_dir)
        _INDEX_CACHE[sf_dir] = (build_index(spark, docs, base, cfg, url_col="source"), cfg)
    return _INDEX_CACHE[sf_dir]


@register("bm25_wand_topk", _bm25_oracle(CFG.k1, CFG.b, TOP_K))
def q_bm25_wand_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-identical to bm25_topk by construction — shares its oracle."""
    index, cfg = _index_for(spark, sf_dir)
    return bm25_wand(spark, index, CFG, TOP_K)


# ---------------------------------------------------------------------------
# dictionary / stats relations (A1/A4 analogs)
# ---------------------------------------------------------------------------


@register(
    "term_dictionary",
    f"WITH {_TF_CTES} SELECT term, df, cf FROM dict",
)
def q_term_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = tokenized_docs(_docs(spark, sf_dir), CFG)
    return (
        term_frequencies(toks)
        .groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
    )


@register(
    "doc_stats",
    f"WITH {_TF_CTES} SELECT n_docs, round(avgdl, 6) AS avgdl FROM stats",
)
def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = tokenized_docs(_docs(spark, sf_dir), CFG)
    return corpus_stats(toks).select(
        "n_docs", F.round("avgdl", 6).alias("avgdl")
    )


@register(
    "doc_lengths",
    f"WITH {_TF_CTES} SELECT doc_id, dl FROM dd",
)
def q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = tokenized_docs(_docs(spark, sf_dir), CFG)
    return toks.select("doc_id", F.col("dl").cast("long").alias("dl"))


@register(
    "top_terms",
    f"""WITH {_TF_CTES}
SELECT term, df, cf FROM dict ORDER BY cf DESC, term LIMIT 20""",
)
def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        q_term_dictionary(spark, sf_dir)
        .orderBy(F.col("cf").desc(), F.col("term"))
        .limit(20)
    )


@register(
    "bigram_counts",
    f"""
WITH d AS ({_EN_TOKS}),
big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM d WHERE len(toks) >= 2
)
SELECT bigram, CAST(count(*) AS BIGINT) AS n
FROM big
GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50
""",
)
def q_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigrams (G1 n=2) — posexplode + window twin of the SQL."""
    toks = tokenized_docs(_docs(spark, sf_dir), CFG)
    pos = toks.select("doc_id", F.posexplode("tokens").alias("pos", "term"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = pos.withColumn("nxt", F.lead("term").over(w)).filter(
        F.col("nxt").isNotNull()
    )
    return (
        big.select(F.concat_ws(" ", "term", "nxt").alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(50)
    )
