"""Relational/OLAP query operators over the TPC-H-ish testdata.

These cover the query shapes the reference serves through its SQL
templates (grouped aggregation, multi-way joins, semi-joins, top-N,
window analytics — reference: examples/sqls/*/*.sql run through
src/query_executor.cpp). Implemented with the DataFrame API so
Catalyst owns the physical plan: dimension joins broadcast, filters
land in the parquet scan, aggregates get map-side partials.

Every function takes (spark, sf_dir) and returns a DataFrame whose
column names match the DuckDB oracle in flapi_spark/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flapi_spark.operators.common import MONEY, avg_of, dec, revenue_expr
from flapi_spark.session import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation, 4-group output.

    Scale: single shuffle over a 6-value grouping key with map-side
    partial aggregation; the shipdate filter is pushed to parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast(MONEY)
    disc_price = dec("l_extendedprice") * (one - dec("l_discount"))
    charge = disc_price * (one + dec("l_tax"))
    qty_sum = F.sum(dec("l_quantity"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            qty_sum.cast(MONEY).alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast(MONEY).alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(30,4)").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(30,6)").alias("sum_charge"),
            avg_of(F.sum(dec("l_quantity")), F.count(F.lit(1))).alias("avg_qty"),
            avg_of(F.sum(dec("l_extendedprice")), F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter + 3-way join + top-N.

    Scale: customer filter broadcasts into orders; revenue agg shuffles
    on l_orderkey only; top-10 is a TakeOrdered, not a full sort."""
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue_expr()).cast("decimal(30,4)").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join + priority counts."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with co-located customer/supplier
    nation constraint.

    Scale: region/nation/supplier/customer all broadcast (dims); the
    only big shuffle is lineitem⋈orders on the order key."""
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue_expr()).cast("decimal(30,4)").alias("revenue"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective scan, single-row aggregate.

    Scale: all three predicates push into the parquet scan; the agg is
    a partial-then-final reduction, no wide shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.0199)
            & (F.col("l_discount") <= 0.0401)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("decimal(30,4)")
            .alias("revenue")
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top-20."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue_expr()).cast("decimal(30,4)").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def top_customers_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 customers by balance per market segment (window rank)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.withColumn("rnk", F.rank().over(w).cast("long"))
        .where(F.col("rnk") <= 5)
        .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal", "rnk")
    )


def running_revenue_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order revenue with a running cumulative total.

    Scale note: the cumulative window is over the (small) per-day
    aggregate, not the raw fact table — the heavy input is reduced by
    the groupBy first, so the unpartitioned window sees ~thousands of
    rows regardless of fact-table size."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy("o_orderdate").agg(
        F.sum(dec("o_totalprice")).cast(MONEY).alias("daily_revenue")
    )
    w = Window.orderBy("o_orderdate").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "o_orderdate",
        "daily_revenue",
        F.sum("daily_revenue").over(w).cast("decimal(30,2)").alias("cum_revenue"),
    )


def ntile_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bands over event values (ntile window + band stats)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy("value", "event_id")
    return (
        ev.withColumn("band", F.ntile(4).over(w).cast("long"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation) revenue subtotals + grand total."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.sum(dec("o_totalprice")).cast("decimal(30,2)").alias("revenue"),
        F.count(F.lit(1)).alias("order_count"),
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) per user.

    Classic lag + cumulative-sum composition: one shuffle on user_id;
    both windows share that partitioning so Catalyst plans a single
    exchange."""
    ev = load_table(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(order_w))
    new_session = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sessions = ev.withColumn(
        "session_id",
        F.sum(new_session).over(
            order_w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def events_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window event aggregate — the batch twin of the
    streaming pipeline in flapi_spark/streaming.py."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("decimal(38,10)")
            .alias("sum_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )


def distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users")
    )


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct users per event type (rows-only check:
    HLL estimates are engine-specific). At 100 TB this replaces the
    exact distinct's expensive two-phase shuffle with a mergeable
    sketch."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users")
    )


def paginate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's pagination contract (COUNT + LIMIT/OFFSET page,
    reference: database_manager.cpp:430-521) as a deterministic page."""
    from flapi_spark.executor import paginate_sql
    from flapi_spark.session import register_views

    register_views(spark, sf_dir, tables=("orders",))
    inner = (
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate "
        "FROM orders"
    )
    return spark.sql(paginate_sql(inner, "o_orderkey", limit=50, offset=100))


def part_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by part type: big fact ⋈ broadcast part dim."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(
            F.sum(revenue_expr()).cast("decimal(30,4)").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def supplier_balance_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier account-balance stats per nation (dim ⋈ dim)."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(dec("s_acctbal")).cast(MONEY).alias("total_balance"),
            avg_of(F.sum(dec("s_acctbal")), F.count(F.lit(1))).alias("avg_balance"),
        )
    )


def cache_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cache manager's primary-key merge semantics (latest cursor
    wins — flapi_spark/cache.py, reference: cache_manager.cpp) expressed
    as a pure query: latest order per customer."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")
    )
