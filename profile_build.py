#!/usr/bin/env python
"""Phase-level wall-clock profile of build_index at one parallelism
level — finds the n-independent serial term the 2->8 Amdahl fit shows
(~32 s at 500k docs). Forces each cached relation in sequence so the
phases are separable; the sum exceeds a production build (which
overlaps them), so read DELTAS between thread counts, not absolutes.

Usage: python profile_build.py <cpus> [corpus]
"""

from __future__ import annotations

import sys
import tempfile
import time

cpus = int(sys.argv[1])
corpus = sys.argv[2] if len(sys.argv) > 2 else "/tmp/k4cv_scale_corpus"

from pyspark.sql import functions as F  # noqa: E402

from keywords4cv_spark.config import EngineConfig  # noqa: E402
from keywords4cv_spark.index.build import (  # noqa: E402
    build_dictionary,
    term_frequencies_fused,
)
from keywords4cv_spark.session import get_spark  # noqa: E402

spark = get_spark(
    master=f"local[{cpus}]",
    app_name=f"k4cv-profile-{cpus}",
    shuffle_partitions=4 * cpus,
)
cfg = EngineConfig(n_term_buckets=4, n_salts=8, shuffle_partitions=4 * cpus)
docs = spark.read.parquet(corpus)
docs.count()

marks: list[tuple[str, float]] = []


def mark(name: str, t0: float) -> None:
    marks.append((name, time.perf_counter() - t0))
    print(f"{name:28s} {marks[-1][1]:8.2f}s", flush=True)


t_all = time.perf_counter()

t = time.perf_counter()
tf_df = term_frequencies_fused(docs, cfg).persist()
tf_df.count()
mark("tf_fused (tokenize+persist)", t)

t = time.perf_counter()
dictionary = build_dictionary(tf_df).persist()
dictionary.count()
mark("dictionary", t)

t = time.perf_counter()
vocab_size = getattr(dictionary, "_k4cv_vocab_size", None)
small = vocab_size is not None and vocab_size <= cfg.broadcast_vocab_limit
dict_side = dictionary.select("term", "term_id", "df")
if small:
    dict_side = F.broadcast(dict_side)
posted = (
    tf_df.join(dict_side, "term")
    .withColumn("segment", F.pmod(F.col("doc_id"), F.lit(cfg.n_salts)).cast("int"))
    .withColumn("bucket", F.pmod(F.col("term_id"), F.lit(cfg.n_term_buckets)).cast("int"))
    .select("segment", "bucket", "term_id", "df", "doc_id", "tf", "dl")
    .repartition(cfg.shuffle_partitions, "term_id", "segment")
    .persist()
)
posted.count()
mark("posted (join+repartition)", t)

t = time.perf_counter()
hashes = (
    dictionary.select(
        F.pmod(F.col("term_id"), F.lit(cfg.n_term_buckets)).cast("int").alias("b"), "h"
    )
    .groupBy("b")
    .agg(F.expr("bit_xor(h)").alias("h"))
    .collect()
)
mark("bucket hashes collect", t)

idx_dir = tempfile.mkdtemp(prefix=f"k4cv_prof_{cpus}_")

t = time.perf_counter()
dictionary.drop("h").write.mode("overwrite").parquet(f"{idx_dir}/dictionary")
mark("write dictionary", t)

t = time.perf_counter()
slim = docs.select("doc_id", F.col("url"))
dls = tf_df.groupBy("doc_id").agg(F.max("dl").alias("dl"))
docmeta = slim.join(dls, "doc_id", "left").withColumn(
    "dl", F.coalesce(F.col("dl"), F.lit(0)).cast("long")
)
docmeta.write.mode("overwrite").parquet(f"{idx_dir}/docmeta")
mark("write docmeta", t)

t = time.perf_counter()
spark.read.parquet(f"{idx_dir}/docmeta").agg(
    F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
).collect()
mark("stats agg", t)

from keywords4cv_spark.index.build import POSTINGS_SCHEMA, _make_encoder  # noqa: E402

srow = spark.read.parquet(f"{idx_dir}/docmeta").agg(
    F.count("*").alias("n"), F.avg("dl").alias("a")
).collect()[0]
encoder = _make_encoder(cfg, int(srow["n"]), float(srow["a"]))

t = time.perf_counter()
from concurrent.futures import ThreadPoolExecutor  # noqa: E402


def encode_bucket(bucket: int) -> None:
    blocks = (
        posted.filter(F.col("bucket") == bucket)
        .groupBy("term_id", "segment")
        .applyInPandas(encoder, POSTINGS_SCHEMA)
    )
    blocks.sortWithinPartitions("term_id", "segment", "block_id").write.mode(
        "overwrite"
    ).parquet(f"{idx_dir}/postings/bucket={bucket}")


with ThreadPoolExecutor(max_workers=4) as ex:
    list(ex.map(encode_bucket, range(cfg.n_term_buckets)))
mark("encode+write buckets", t)

t = time.perf_counter()
for b in range(cfg.n_term_buckets):
    spark.read.parquet(f"{idx_dir}/postings/bucket={b}").agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("rows"),
        F.count("*").alias("n_blocks"),
        F.countDistinct("term_id").alias("n_terms"),
        F.coalesce(F.sum(F.length("payload")), F.lit(0)).alias("payload_bytes"),
    ).collect()
mark("lineage read-back aggs", t)

mark("TOTAL", t_all)
print({n: round(s, 2) for n, s in marks})
spark.stop()
