"""SparkSession factory with the engine's standard knobs.

Local-mode defaults are tuned for the sandbox (single JVM,
``local[$SPARK_GRAFT_CPUS]``); on a real cluster the same config keys
apply, minus master. AQE is on so runtime stats re-plan joins and
coalesce post-shuffle partitions (replaces the reference's Q-learning
chunk-size tuner, keywords4cv.py:1823-1891).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "keywords4cv_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # sandbox corpora are ~100MB: the 128MB default packs the whole
        # scan into 1-2 splits and the tokenize stage runs on ONE core
        # (measured: 16-thread tokenize == single-thread Python). At
        # cluster scale with TB inputs the default is fine — this knob is
        # the local-mode equivalent of "have enough input splits".
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "64k")
        # local mode = driver-only: the heap must hold every persisted
        # relation × concurrent tasks, or cache eviction serializes the
        # build (measured: 500k-doc build at local[16] SLOWER than
        # local[4] on an 8g heap)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # NB: spark.cleaner.periodicGC.interval was tried at 5min for
        # long benches (200 query invocations leak out-of-scope cached
        # blocks until a driver GC runs) and REVERTED: the forced full
        # GCs + cleanup storms cost the long iterative queries more
        # than the reclaimed storage bought (curated family +100% in
        # the A/B). Queries release their own caches explicitly
        # instead (jaccard/map_whitelist/LSH unpersist on completion).
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def local_rows(spark: SparkSession, rows, schema: str):
    """Small driver-local relation as a ONE-partition DataFrame.

    ``spark.createDataFrame(list, schema)`` slices the list across
    ``defaultParallelism`` partitions, so every broadcast build over a
    10-row clause table runs a 32-task job in local[32] — measured
    ~0.5 s vs ~0.3 s warm for the single-slice shape, times the ~10
    such builds a composed query makes. ``coalesce(1)`` is NOT
    equivalent: it defeats the Arrow local-relation conversion and
    measured ~3.5 s per materialization on this box.
    """
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )
