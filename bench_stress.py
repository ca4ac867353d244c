#!/usr/bin/env python
"""sf1.0 spot-stress of the retrieval family (VERDICT r4 next #7).

Runs the heavy-hitter queries at 100× the correctness-gate scale
(50,000 docs = sf1.0-equivalent; the gate runs at sf0.01 = 500) with
the SAME DuckDB value-level oracles, and records per-query wall time
plus the postings partition-skew table.

The corpus is the sf0.1 testdata amplified ×10: copy k of doc d gets
doc_id = d + k·50_000_000 and one extra distinguishing token appended,
so copies are NEAR-duplicates (59/60-token Jaccard) — which stresses
the LSH → verify → connected-components cascade with 10-clique dup
families on top of the corpus's own planted pairs, exactly the shape a
recrawl-heavy web corpus has. Deterministic in (source table, k).

Prints one JSON line and writes BENCH/stress_sf1_r{round}.json.

Usage: python bench_stress.py [--round 5] [--copies 10]
NB: do not run concurrently with bench.py / bench_scaling.py.
"""

from __future__ import annotations

import argparse
import json
import os
import time

STRESS_QUERIES = [
    "bm25_wand_topk",
    "prefix_query",
    "phrase_query_indexed",
    "curated_corpus_clean",
    "dup_components",
]

SRC = "/root/testdata/sf0.1"
COPY_STRIDE = 50_000_000


def ensure_corpus(spark, out_dir: str, copies: int) -> str:
    from pyspark.sql import functions as F

    marker = os.path.join(out_dir, "documents.parquet", "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for k in range(copies):
        d = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * COPY_STRIDE)
        )
        if k > 0:
            # one extra token makes copies NEAR-dups, not exact dups
            d = d.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" copymark{k}"))
            )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    return out_dir


def postings_skew(spark, sf_dir: str) -> dict:
    """Block counts per (bucket, segment) partition of the index the
    WAND query used — max/mean is the skew number that decides whether
    the Zipf salting held at this scale."""
    from pyspark.sql import functions as F

    from keywords4cv_spark.driver_queries import _index_for

    index, _cfg = _index_for(spark, sf_dir)
    rows = (
        index.postings.groupBy("bucket", "segment")
        .agg(F.count("*").alias("blocks"), F.sum("n").alias("postings"))
        .collect()
    )
    blocks = [int(r["blocks"]) for r in rows]
    posts = [int(r["postings"]) for r in rows]
    return {
        "partitions": len(rows),
        "blocks_max": max(blocks),
        "blocks_mean": round(sum(blocks) / len(blocks), 1),
        "blocks_skew": round(max(blocks) / (sum(blocks) / len(blocks)), 2),
        "postings_max": max(posts),
        "postings_mean": round(sum(posts) / len(posts), 1),
        "postings_skew": round(max(posts) / (sum(posts) / len(posts)), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import duckdb

    from keywords4cv_spark.session import get_spark

    spark = get_spark(
        master=f"local[{args.cpus}]",
        app_name="k4cv-stress",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    stress_dir = os.path.join(
        tempfile.gettempdir(), f"k4cv_stress_sf1_x{args.copies}"
    )
    ensure_corpus(spark, stress_dir, args.copies)

    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from keywords4cv_spark.driver_queries import ORACLES, QUERIES

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{stress_dir}/documents.parquet/*.parquet'"
    )

    import math

    import pandas as pd

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        out = df.reindex(sorted(df.columns), axis=1)
        return out.sort_values(by=list(out.columns)).reset_index(drop=True)

    results: dict[str, dict] = {}
    fails: list[str] = []
    n_docs = spark.read.parquet(f"{stress_dir}/documents.parquet").count()
    for name in STRESS_QUERIES:
        t0 = time.perf_counter()
        got = QUERIES[name](spark, stress_dir).toPandas()
        spark_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        want = con.execute(ORACLES[name]).fetchdf()
        duck_sec = time.perf_counter() - t0
        ok = len(got) == len(want)
        if ok:
            g, w = canon(got), canon(want)
            for c in g.columns:
                for a, b in zip(g[c].tolist(), w[c].tolist()):
                    if isinstance(a, float) or isinstance(b, float):
                        fa, fb = float(a), float(b)
                        if not (
                            (math.isnan(fa) and math.isnan(fb))
                            or abs(fa - fb) < 1e-9
                        ):
                            ok = False
                            break
                    elif a != b:
                        ok = False
                        break
                if not ok:
                    break
        if not ok:
            fails.append(name)
        results[name] = {
            "rows": len(got),
            "match": ok,
            "spark_sec": round(spark_sec, 2),
            "duckdb_sec": round(duck_sec, 2),
        }
        print(f"{name}: rows={len(got)} match={ok} "
              f"spark={spark_sec:.1f}s duckdb={duck_sec:.1f}s", flush=True)

    skew = postings_skew(spark, stress_dir)
    out = {
        "metric": "sf1.0 stress (100x gate scale) value-level sweep",
        "n_docs": n_docs,
        "copies": args.copies,
        "cpus": args.cpus,
        "queries": results,
        "postings_skew": skew,
        "fails": fails,
    }
    dest = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH",
        f"stress_sf1_r{args.round}.json",
    )
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
