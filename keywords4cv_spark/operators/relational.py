"""Relational operator coverage on the driver's TPC-H-ish tables.

The reference has no SQL joins (SURVEY.md §2.4 maps its dict/set
lookups), but the engine is a full DataFrame-capable system — these
named operators pin the breadth Catalyst gives us for free and are
oracle-checked like everything else: hash aggregation (partial+final),
broadcast join chains, semi/anti joins, window rank, rows-between
frames, sessionization via lag+cumsum, tumbling event-time windows
(batch form — the reference is batch-only, SURVEY.md §2.10), sort+limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped: groupBy 2 cols + 6 aggregates on lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast join chain customer ⋈ nation ⋈ region + agg on orders."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1-shaped window rank: top-2 orders per customer by price."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("int").alias("rn"))
    )


def customers_without_big_orders(
    spark: SparkSession, sf_dir: str, threshold: float = 300_000.0
) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no order above threshold."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > threshold)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (batch form of W-agg)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def events_sessionized(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: lag(ts) + cumulative sum over gap breaks, then
    per-session aggregates. The stateful-streaming analog in batch."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet gives TIMESTAMP_NTZ; cast via timestamp (session TZ pinned to
    # UTC) to get epoch seconds identical to DuckDB's epoch(ts)
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    sess = (
        e.withColumn("new_session", F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0))
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 6).alias("session_value"),
    )


def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-between running frame (W2-shaped): cumulative value per user."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 6).alias("running_value"),
        F.row_number().over(Window.partitionBy("user_id").orderBy("ts", "event_id")).cast("int").alias("seq"),
    )


def returns_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all grouping-set combinations
    with explicit grouping ids — multidimensional rollup coverage."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "sum_qty",
            "n",
        )
    )


def priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (orderpriority, orderstatus): hierarchical subtotals."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"), F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            "revenue",
            "n",
        )
    )


def segment_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts by market segment (fixed column set)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderstatus")
        .pivot("c_mktsegment", segs)
        .agg(F.count(F.lit(1)))
        .na.fill(0, segs)
        .select(
            "o_orderstatus",
            *[F.col(s).cast("long").alias(s.lower()) for s in segs],
        )
    )


def part_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped: fact ⋈ two broadcast dims ⋈ nation, grouped
    revenue per (nation, brand) — the star-join shape whose dims stay
    broadcast at any fact-table scale."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.count("*").alias("n_lines"),
        )
    )


def supplier_balance_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (nation) of supplier account balances."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .rollup("n_name")
        .agg(
            F.round(F.sum("s_acctbal"), 4).alias("total_balance"),
            F.round(F.avg("s_acctbal"), 6).alias("avg_balance"),
            F.count("*").alias("n_suppliers"),
        )
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            "total_balance",
            "avg_balance",
            "n_suppliers",
        )
    )


def events_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path: extract a JSON field from the props column
    (JVM get_json_object — no UDF) and aggregate per event type."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )
