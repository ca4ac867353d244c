#!/usr/bin/env python
"""Scaling-efficiency benchmark: the SAME index-build + query job at two
parallelism levels (local[8] vs local[32]) over the SAME on-disk corpus.

This is the sandbox stand-in for the north_rule's N vs 4N executors —
one JVM per level (fresh subprocess), shared memory bus caveat noted
in the report. Writes BENCH/BASELINE.md and prints one JSON line.

Usage:  python bench_scaling.py [--docs 100000]
        python bench_scaling.py --worker <cpus> --corpus <dir>   (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

CORPUS_DEFAULT = os.path.join(tempfile.gettempdir(), "k4cv_scale_corpus")
LEVELS = (8, 32)


def ensure_corpus(path: str, n_docs: int) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    from keywords4cv_spark.session import get_spark
    from keywords4cv_spark.sources.corpus import synth_documents

    spark = get_spark(master="local[32]", app_name="k4cv-synth", shuffle_partitions=32)
    synth_documents(spark, n_docs, n_partitions=64).write.mode("overwrite").parquet(path)
    spark.stop()


def worker(cpus: int, corpus: str) -> None:
    """One measured run at a single parallelism level. Prints JSON."""
    from keywords4cv_spark.config import EngineConfig
    from keywords4cv_spark.index.build import build_index
    from keywords4cv_spark.query.wand import bm25_wand
    from keywords4cv_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]", app_name=f"k4cv-scale-{cpus}", shuffle_partitions=cpus
    )
    cfg = EngineConfig(
        n_term_buckets=4, skew_df_threshold=20_000, n_salts=8, shuffle_partitions=cpus
    )
    docs = spark.read.parquet(corpus)
    n_docs = docs.count()

    idx_dir = tempfile.mkdtemp(prefix=f"k4cv_scale_idx_{cpus}_")
    t0 = time.perf_counter()
    index = build_index(spark, docs, idx_dir, cfg, url_col="url")
    build_sec = time.perf_counter() - t0

    # query latency: per-query wall times over the fixture set, 3 rounds
    from keywords4cv_spark.query.fixtures import QUERY_SET, query_terms

    lat = []
    for _ in range(3):
        for qid, q in QUERY_SET:
            pairs = [(qid, t) for t in query_terms(q)]
            t0 = time.perf_counter()
            bm25_wand(spark, index, cfg, queries=pairs).count()
            lat.append(time.perf_counter() - t0)
    lat.sort()
    p95 = lat[int(0.95 * (len(lat) - 1))]
    shutil.rmtree(idx_dir, ignore_errors=True)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_docs": n_docs,
                "build_sec": round(build_sec, 3),
                "docs_per_sec": round(n_docs / build_sec, 1),
                "query_p50_ms": round(1000 * lat[len(lat) // 2], 1),
                "query_p95_ms": round(1000 * p95, 1),
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--corpus", default=CORPUS_DEFAULT)
    args = ap.parse_args()

    if args.worker:
        worker(args.worker, args.corpus)
        return

    ensure_corpus(args.corpus, args.docs)
    results = {}
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, __file__, "--worker", str(cpus), "--corpus", args.corpus],
            capture_output=True,
            text=True,
            check=True,
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = LEVELS
    speedup = results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]
    efficiency = speedup / (hi / lo)
    summary = {
        "metric": "index-build docs/sec at two parallelism levels + scaling efficiency",
        "levels": results,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "unit": "docs/sec",
    }
    print(json.dumps(summary))
    write_report(summary)


def write_report(s: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    lo, hi = LEVELS
    r8, r32 = s["levels"][lo], s["levels"][hi]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH — scaling evidence (north_rule two-cluster-size criterion)

Same job (full index build: tokenize → tf → dictionary → salted SPIMI
encode → postings/docmeta/stats/lineage), same on-disk corpus
({r8["n_docs"]:,} synthetic input_hint-shaped documents, seed 42),
two parallelism levels, each in a fresh JVM:

| level | build sec | docs/sec | BM25-WAND p50 | p95 |
|---|---|---|---|---|
| local[{lo}]  | {r8["build_sec"]} | {r8["docs_per_sec"]:,} | {r8["query_p50_ms"]} ms | {r8["query_p95_ms"]} ms |
| local[{hi}] | {r32["build_sec"]} | {r32["docs_per_sec"]:,} | {r32["query_p50_ms"]} ms | {r32["query_p95_ms"]} ms |

**Speedup {lo}→{hi} cores: {s["speedup"]}× (ideal {hi // lo}×) →
scaling efficiency {s["scaling_efficiency"]}** (north_rule target ≥ 0.8).

## Methodology caveats (honest limits of the sandbox)

- local[{lo}] vs local[{hi}] threads share ONE memory bus, page cache
  and JVM — this under-reports the efficiency a real {hi // lo}× executor
  fleet would show for this shuffle-light, CPU-bound build (and
  over-reports nothing: there is no network shuffle to hide).
- Query latency is dominated by local-mode job-scheduling overhead
  (~100-300 ms floor per Spark job); on a cluster the same plan is
  partition-pruned to the query's term buckets.
- The corpus is deterministic in (n_docs, seed) — both levels read
  byte-identical parquet input.

Regenerate: `python bench_scaling.py` (optionally `--docs N`).
""")


if __name__ == "__main__":
    main()
