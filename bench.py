#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Usage: python bench.py            # sf0.1, local[32] (env-overridable)
       SPARK_GRAFT_CPUS=8 python bench.py   # scaling-efficiency runs
       SPARK_GRAFT_REPEATS=3 python bench.py

Headline metrics (BASELINE.json): index-build docs/sec, BM25 top-k
latency (brute force and Block-Max WAND). Per-query wall seconds go in
"queries"; "value" is the total.

Each query is timed SPARK_GRAFT_REPEATS times (default 2) and the
minimum is reported: 48+ queries share one JVM, so a single pass mixes
JIT warmup, Python-worker spin-up and GC debt from earlier queries
into later timings (r1 recorded a 40 s dedup_exact that reruns at
3 s). The min is the steady-state number a warmed cluster would see;
"queries_first" keeps the cold pass for transparency.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from keywords4cv_spark.config import EngineConfig
from keywords4cv_spark.index.build import build_index
from keywords4cv_spark.query.bm25 import bm25_brute_force
from keywords4cv_spark.query.wand import bm25_wand
from keywords4cv_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark(
        master=f"local[{cpus}]", app_name="k4cv-bench", shuffle_partitions=cpus
    )

    from keywords4cv_spark.driver_queries import QUERIES

    cfg = EngineConfig(
        n_term_buckets=4,
        n_salts=8,
        shuffle_partitions=cpus,
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs_total = docs.count()

    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))
    runs: dict[str, list[float]] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        runs.setdefault(name, []).append(time.perf_counter() - t0)

    from pyspark.sql import functions as F

    index = None
    for rep in range(repeats):
        # --- index build throughput + compression (fresh dir per repeat) ---
        idx_dir = tempfile.mkdtemp(prefix="k4cv_bench_idx_")

        def build():
            nonlocal index
            index = build_index(spark, docs, idx_dir, cfg, url_col="source")

        timed("index_build", build)
        if rep == 0:
            payload_bytes = int(
                index.lineage.agg(
                    F.coalesce(F.sum("payload_bytes"), F.lit(0))
                ).collect()[0][0]
            )
            text_bytes = int(docs.agg(F.sum(F.length("text"))).collect()[0][0])
            extras["postings_payload_bytes"] = payload_bytes
            extras["raw_text_bytes"] = text_bytes

        # --- BM25 query latency (fixture query set) ---
        timed("bm25_brute_force", lambda: bm25_brute_force(spark, docs, cfg).count())
        timed("bm25_wand", lambda: bm25_wand(spark, index, cfg).count())

        # --- remaining registry queries (skip the two already timed) ---
        skip = {"bm25_topk", "bm25_wand_topk"}
        for name in sorted(QUERIES):
            if name in skip:
                continue
            timed(name, lambda name=name: QUERIES[name](spark, sf_dir).count())
        shutil.rmtree(idx_dir, ignore_errors=True)

    timings = {k: min(v) for k, v in runs.items()}
    extras["index_docs_per_sec"] = n_docs_total / timings["index_build"]

    out = {
        "metric": "headline suite wall time (index build + BM25 top-k + operator queries; min of repeats)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "queries_first": {k: round(v[0], 3) for k, v in runs.items()},
        "repeats": repeats,
        "sf": sf,
        "cpus": cpus,
        "n_docs": n_docs_total,
        "index_docs_per_sec": round(extras["index_docs_per_sec"], 1),
        "postings_payload_bytes": extras["postings_payload_bytes"],
        "raw_text_bytes": extras["raw_text_bytes"],
        "compression_ratio": round(
            extras["raw_text_bytes"] / max(extras["postings_payload_bytes"], 1), 2
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
