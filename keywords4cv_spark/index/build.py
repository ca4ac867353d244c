"""SPIMI-style inverted-index build: documents → compressed postings.

Generalizes the reference's chunked extract→vectorize→score pipeline
(/root/reference/keywords4cv.py:2008-2065 driver loop; :3044-3095
DTM build) into a distributed Spark build:

  documents scan (lang filter pushed to parquet)
   → tokens (JVM expr chain, textprep.spark_exprs)
   → explode → groupBy(doc_id, term).count() = tf       [shuffle 1]
   → dictionary: groupBy(term) df/cf + deterministic term_id
   → skew split: head terms (df > threshold) get `n_salts` segments
     keyed by pmod(xxhash64(doc_id), n_salts) — Zipf head terms
     ("the") otherwise serialize one reducer (SURVEY.md §4.2.1)
   → repartition(term_id, segment) → applyInPandas encode blocks
     (delta-gap + varbyte + exact per-block max BM25 contribution)
   → parquet tables: dictionary / postings / docmeta / stats / _lineage

Checkpoint-resume (north_rule): postings are built per term bucket
(term_id % n_term_buckets), each bucket commits atomically
(parquet dir rename-free: bucket subdir write + _lineage row with
status=complete). A restarted build anti-joins completed buckets from
_lineage and only runs the rest — mirroring the reference's
verify-then-load checkpoint gate (keywords4cv.py:2821-2895,
:3336-3339) with Iceberg-snapshot-style semantics at sandbox scale.

Scale notes (1000-executor / 10^12-doc design point):
- tf aggregation is one hash-partial + final agg shuffle on
  (doc_id, term); no collect anywhere.
- dictionary term_id uses a vocabulary-global sort (row_number over
  ORDER BY term). Vocabulary is ~1e8-1e9 terms at web scale — one
  range-partitioned sort, acceptable; it buys deterministic ids and
  range-prunable dictionaries.
- postings join dictionary on term: Spark/AQE picks broadcast when the
  dictionary is small, sort-merge otherwise; head-term skew in THIS
  join is handled by AQE skewJoin, while the groupBy-encode skew is
  handled by our explicit salting (AQE cannot split a groupBy group).
- each (term_id, segment) group is bounded by the salt factor, so
  applyInPandas groups fit in executor memory by construction.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from keywords4cv_spark.config import DEFAULT_CONFIG, EngineConfig
from keywords4cv_spark.index.codec import encode_postings
from keywords4cv_spark.textprep.spark_exprs import ngrams_col, tokens_col

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term_id", T.LongType()),
        T.StructField("segment", T.IntegerType()),
        T.StructField("block_id", T.IntegerType()),
        T.StructField("first_doc", T.LongType()),
        T.StructField("last_doc", T.LongType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("max_tf", T.IntegerType()),
        T.StructField("max_score", T.DoubleType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

LINEAGE_SCHEMA = (
    "bucket int, status string, rows long, n_blocks long, n_terms long, "
    "payload_bytes long, input_hash long, started_ts double, finished_ts double"
)


@dataclass
class IndexTables:
    dictionary: DataFrame
    postings: DataFrame
    docmeta: DataFrame
    stats: DataFrame
    lineage: DataFrame
    _stats_row: object = None

    def stats_row(self):
        """Collected stats row, cached — the query hot path shouldn't pay
        a driver round-trip per call for one immutable row."""
        if self._stats_row is None:
            self._stats_row = self.stats.collect()[0]
        return self._stats_row


def tokenized_docs(
    docs: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG, text_col: str = "text"
) -> DataFrame:
    """documents → (doc_id, tokens, dl); lang filter pushed into the scan.

    Tokenizer engine per cfg.tokenizer: both are parity-tested
    byte-identical; "pandas" (Arrow UDF in Python worker processes) is
    the default because JDK-17 regex doesn't scale across threads of one
    JVM (see config.py) — the reference's own multiprocessing fan-out
    (keywords4cv.py:1673-1692), re-learned the Spark way.
    """
    if cfg.lang_filter and "lang" in docs.columns:
        docs = docs.filter(F.col("lang") == cfg.lang_filter)
    if cfg.tokenizer == "pandas":
        from keywords4cv_spark.deploy import ensure_py_files
        from keywords4cv_spark.textprep.udfs import make_tokenize_udf

        ensure_py_files(docs.sparkSession)
        tok = make_tokenize_udf(cfg.min_token_len, cfg.stopwords)
        out = docs.withColumn("tokens", tok(F.col(text_col)))
    else:
        out = docs.withColumn(
            "tokens", tokens_col(F.col(text_col), cfg.min_token_len, cfg.stopwords)
        )
    if cfg.ngram_hi > 1:
        out = out.withColumn("terms", ngrams_col(F.col("tokens"), cfg.ngram_lo, cfg.ngram_hi))
    else:
        out = out.withColumn("terms", F.col("tokens"))
    # dl is the unigram token count (BM25 document length), not n-gram count
    return out.withColumn("dl", F.size("tokens"))


def term_frequencies(toks: DataFrame, with_positions: bool = False) -> DataFrame:
    """(doc_id, term, tf, dl[, positions]) — one shuffle, partial agg map-side.

    ``with_positions`` collects the ascending token positions per
    (doc, term) for positional (phrase-capable) indexes; positions are
    only meaningful over the unigram token stream (ngram_hi == 1).
    """
    if not with_positions:
        return (
            toks.select("doc_id", "dl", F.explode("terms").alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
        )
    return (
        toks.select("doc_id", "dl", F.posexplode("terms").alias("pos", "term"))
        .groupBy("doc_id", "term")
        .agg(
            F.count("*").alias("tf"),
            F.max("dl").alias("dl"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )


def build_dictionary(tf_df: DataFrame) -> DataFrame:
    """(term, term_id, df, cf). term_id = dense rank of term (deterministic)."""
    agg = tf_df.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    w = Window.orderBy("term")
    return agg.withColumn("term_id", F.row_number().over(w).cast("long")).select(
        "term", "term_id", "df", "cf"
    )


def corpus_stats(toks: DataFrame) -> DataFrame:
    # sum_dl kept exactly (long) so multi-generation stats combine without
    # float error: avgdl_global = Σ sum_dl / Σ n_docs
    return toks.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )


def _make_encoder(cfg: EngineConfig, n_docs: int, avgdl: float):
    k1, b, block_size = cfg.k1, cfg.b, cfg.block_size

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        term_id = int(pdf["term_id"].iloc[0])
        segment = int(pdf["segment"].iloc[0])
        df_val = int(pdf["df"].iloc[0])
        import numpy as np

        idf = float(np.log(1.0 + (n_docs - df_val + 0.5) / (df_val + 0.5)))
        positions = (
            [np.asarray(p, dtype=np.int64) for p in pdf["positions"]]
            if "positions" in pdf.columns
            else None
        )
        blocks = encode_postings(
            pdf["doc_id"].to_numpy(),
            pdf["tf"].to_numpy(),
            pdf["dl"].to_numpy(),
            idf,
            k1,
            b,
            avgdl,
            block_size,
            positions=positions,
        )
        out = pd.DataFrame(blocks)
        out.insert(0, "segment", segment)
        out.insert(0, "term_id", term_id)
        return out

    return encode_group


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    resume: bool = True,
    doc_id_col: str = "doc_id",
    url_col: str | None = None,
) -> IndexTables:
    """Build (or resume) the full index under ``index_dir``."""
    from keywords4cv_spark.deploy import ensure_py_files

    ensure_py_files(spark)
    os.makedirs(index_dir, exist_ok=True)
    docs = docs.withColumnRenamed(doc_id_col, "doc_id")

    if cfg.store_positions and cfg.ngram_hi != 1:
        raise ValueError("positional indexes require unigram terms (ngram_hi == 1)")
    # persist ONLY what downstream needs — caching the full documents
    # relation (html/text ride along) blows the block-manager memory and
    # the resulting GC serializes every later stage
    keep = [F.col("doc_id"), F.col("terms"), F.col("dl")]
    if url_col and url_col in docs.columns:
        keep.insert(1, F.col(url_col).alias("url"))
    toks = tokenized_docs(docs, cfg).select(*keep).persist()

    # --- docmeta + stats (tiny outputs; computed once) ---
    meta_cols = [F.col("doc_id"), F.col("dl").cast("long").alias("dl")]
    if url_col and url_col in docs.columns:
        meta_cols.insert(1, F.col("url"))
    docmeta = toks.select(*meta_cols)
    stats = corpus_stats(toks)
    srow = stats.collect()[0]
    n_docs, avgdl = int(srow["n_docs"]), float(srow["avgdl"])

    tf_df = term_frequencies(toks, with_positions=cfg.store_positions).persist()
    dictionary = build_dictionary(tf_df).persist()

    if not _complete(index_dir, "dictionary"):
        dictionary.write.mode("overwrite").parquet(f"{index_dir}/dictionary")
        docmeta.write.mode("overwrite").parquet(f"{index_dir}/docmeta")
        stats.withColumn("k1", F.lit(cfg.k1)).withColumn("b", F.lit(cfg.b)).withColumn(
            "n_term_buckets", F.lit(cfg.n_term_buckets)
        ).write.mode("overwrite").parquet(f"{index_dir}/stats")

    # --- postings per term bucket, with lineage + resume ---
    done = _committed_buckets(index_dir, cfg.n_term_buckets) if resume else set()
    posted = (
        tf_df.join(dictionary.select("term", "term_id", "df"), "term")
        .withColumn(
            "segment",
            F.when(
                F.col("df") > cfg.skew_df_threshold,
                F.pmod(F.xxhash64("doc_id"), F.lit(cfg.n_salts)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .withColumn("bucket", F.pmod(F.col("term_id"), F.lit(cfg.n_term_buckets)).cast("int"))
    )
    encoder = _make_encoder(cfg, n_docs, avgdl)
    todo = [b for b in range(cfg.n_term_buckets) if b not in done]
    hashes: dict[int, int] = {}
    if todo:
        posted = posted.persist()
        # order-independent content fingerprint per bucket, one job for all
        # (mirrors the reference's xxh3 checksum manifest,
        # keywords4cv.py:2821-2858)
        hashes = {
            r["bucket"]: r["h"]
            for r in posted.groupBy("bucket")
            .agg(F.expr("bit_xor(xxhash64(term_id, doc_id, tf))").alias("h"))
            .collect()
        }
    times: dict[int, tuple[float, float]] = {}

    def encode_bucket(bucket: int) -> tuple[float, float]:
        started = time.time()
        part = posted.filter(F.col("bucket") == bucket)
        blocks = (
            part.repartition(cfg.shuffle_partitions, "term_id", "segment")
            .groupBy("term_id", "segment")
            .applyInPandas(encoder, POSTINGS_SCHEMA)
        )
        # the parquet _SUCCESS marker of this bucket dir IS the atomic
        # per-partition commit (Iceberg-snapshot analog); resume keys on it.
        # sortWithinPartitions gives each file tight term_id min/max stats →
        # query-time rowgroup pruning on top of the bucket-dir pruning
        blocks.sortWithinPartitions("term_id", "segment", "block_id").write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/postings/bucket={bucket}")
        return started, time.time()

    if todo:
        # submit bucket jobs concurrently: each still commits independently
        # (per-partition checkpoint granularity), but their fixed per-job
        # scheduling/worker-spin-up costs overlap instead of serializing
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(4, len(todo))) as ex:
            for bucket, span in zip(todo, ex.map(encode_bucket, todo)):
                times[bucket] = span

    # a crash between a bucket's parquet commit and the lineage append
    # leaves a committed bucket without a lineage row — recover it here
    recovered = sorted(
        (_committed_buckets(index_dir, cfg.n_term_buckets) - set(todo))
        - _lineage_buckets(spark, index_dir)
    )
    for b in recovered:
        times[b] = (0.0, time.time())
    todo = todo + recovered

    if todo:
        # per-bucket lineage metrics in ONE job over the written files
        # (one read-back agg instead of 2 driver round-trips per bucket —
        # the serial fraction is what caps scaling efficiency)
        bstats = {
            int(r["bucket"]): r
            for r in spark.read.option("basePath", f"{index_dir}/postings")
            .parquet(*[f"{index_dir}/postings/bucket={b}" for b in todo])
            .groupBy("bucket")
            .agg(
                F.coalesce(F.sum("n"), F.lit(0)).alias("rows"),
                F.count("*").alias("n_blocks"),
                F.countDistinct("term_id").alias("n_terms"),
                F.coalesce(F.sum(F.length("payload")), F.lit(0)).alias("payload_bytes"),
            )
            .collect()
        }
        lineage_rows = pd.DataFrame(
            [
                {
                    "bucket": b,
                    "status": "complete",
                    "rows": int(bstats[b]["rows"]) if b in bstats else 0,
                    "n_blocks": int(bstats[b]["n_blocks"]) if b in bstats else 0,
                    "n_terms": int(bstats[b]["n_terms"]) if b in bstats else 0,
                    "payload_bytes": int(bstats[b]["payload_bytes"]) if b in bstats else 0,
                    "input_hash": int(hashes.get(b, 0)),
                    "started_ts": times[b][0],
                    "finished_ts": times[b][1],
                }
                for b in todo
            ]
        )
        spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(f"{index_dir}/_lineage")

    toks.unpersist()
    tf_df.unpersist()
    dictionary.unpersist()
    if todo:
        posted.unpersist()
    return load_index(spark, index_dir)


def _complete(index_dir: str, table: str) -> bool:
    return os.path.exists(os.path.join(index_dir, table, "_SUCCESS"))


def _committed_buckets(index_dir: str, n_buckets: int) -> set[int]:
    """Buckets whose parquet dir carries the atomic _SUCCESS commit marker."""
    return {
        b
        for b in range(n_buckets)
        if os.path.exists(os.path.join(index_dir, "postings", f"bucket={b}", "_SUCCESS"))
    }


def _lineage_buckets(spark: SparkSession, index_dir: str) -> set[int]:
    path = f"{index_dir}/_lineage"
    if not os.path.exists(path):
        return set()
    return {
        r["bucket"]
        for r in spark.read.parquet(path).select("bucket").distinct().collect()
    }


def load_index(spark: SparkSession, index_dir: str) -> IndexTables:
    return IndexTables(
        dictionary=spark.read.parquet(f"{index_dir}/dictionary"),
        postings=spark.read.option("basePath", f"{index_dir}/postings").parquet(
            f"{index_dir}/postings"
        ),
        docmeta=spark.read.parquet(f"{index_dir}/docmeta"),
        stats=spark.read.parquet(f"{index_dir}/stats"),
        lineage=spark.read.parquet(f"{index_dir}/_lineage"),
    )
