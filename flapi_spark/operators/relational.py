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
            qty_sum.cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            avg_of(F.sum(dec("l_quantity")), F.count(F.lit(1))).alias("avg_qty"),
            avg_of(F.sum(dec("l_extendedprice")), F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter + 3-way join + top-N.

    Scale: customer join is unhinted (AQE broadcasts while the dim
    fits, shuffle-joins beyond); revenue agg shuffles
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
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
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

    Scale: region/nation broadcast; supplier/customer joins are
    unhinted (AQE decides by measured size); the
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
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
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
            .cast("double")
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
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
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
        F.col("daily_revenue").cast("double").alias("daily_revenue"),
        F.sum("daily_revenue").over(w).cast("double").alias("cum_revenue"),
    )


def ntile_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bands over event values (ntile + band stats).

    Scale shape: NOT the naive ``ntile(4).over(Window.orderBy(...))``
    — an unpartitioned window is a single-task global sort. Instead
    the distributed-rank pattern (scale.global_rank):
    repartitionByRange on (value, event_id), per-partition row_number,
    partition-count offsets broadcast back, then the exact ANSI ntile
    bucket formula (scale.ntile_band) as a column expression. Output
    identical to the window version (and to the DuckDB ntile oracle);
    the heaviest step is one range shuffle that scales out."""
    from flapi_spark.operators.scale import global_rank, ntile_band

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    # count() is parquet-footer metadata — a bounded scalar action,
    # same class as global_rank's partition-count offset collect
    n = ev.count()
    ranked = global_rank(ev, ["value", "event_id"], rank_col="__rank")
    return (
        ranked
        .withColumn("band", ntile_band(F.col("__rank"), F.lit(n), 4))
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
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("order_count"),
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) per user.

    Classic lag + cumulative-sum composition: one shuffle on user_id;
    both windows share that partitioning so Catalyst plans a single
    exchange."""
    ev = load_table(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestamp_diff works for TIMESTAMP and TIMESTAMP_NTZ alike (the
    # testdata's TIMESTAMP(NANOS) arrives as NTZ on Spark >= 4.1.2,
    # as LTZ via the nanosAsLong long-to-micros conversion before).
    gap_us = F.timestamp_diff(
        "MICROSECOND", F.lag("ts").over(order_w), F.col("ts")
    )
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
            .cast("double")
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
    """Revenue by part type: big fact ⋈ part dim.

    Scale: part is 200k×SF rows — NOT force-broadcast (a pinned hint
    would abort on the 8 GB broadcast limit at the 100 TB SF). AQE
    picks broadcast when the measured size is genuinely small."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(
            F.sum(revenue_expr()).cast("double").alias("revenue"),
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
            F.sum(dec("s_acctbal")).cast("double").alias("total_balance"),
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


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year (supplier nation ↔ customer nation, both directions).

    Scale: the nation-pair predicate is applied on broadcast dims, so
    the only wide shuffle is lineitem⋈orders; the year extraction and
    revenue math stay in whole-stage codegen."""
    n1, n2 = "NATION_1", "NATION_2"
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sk"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sk"),
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("ck"),
                                  F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("ck"),
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = (
        ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
        | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue per year
    for one part type (conditional-sum ratio).

    Scale: nation/region (fixed 25/5 rows) broadcast; part is
    unhinted — AQE broadcasts it only while measured-small. The share
    is two conditional sums in a single agg — no second fact pass."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sk"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sk"),
    )
    cust_region = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = revenue_expr()
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_region, orders.o_custkey == cust_region.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
    )
    target = F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)
                   .otherwise(F.lit(0).cast(MONEY)))
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            target.cast("double").alias("nation_volume"),
            F.sum(vol).cast("double").alias("total_volume"),
            (target.cast("double") / F.sum(vol).cast("double"))
            .cast("double")
            .alias("mkt_share"),
        )
    )


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per year. The schema
    has no partsupp/ps_supplycost, so cost is proxied as
    0.6 * p_retailprice * l_quantity (same join/agg shape).

    Scale: nation (25 rows) broadcasts; part/supplier are unhinted —
    both grow with SF, so AQE decides by measured size; one shuffle on
    the group key."""
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").contains("bolt"))
    li = load_table(spark, sf_dir, "lineitem")
    cost = (F.lit(0.60).cast(MONEY) * dec("p_retailprice") * dec("l_quantity"))
    profit = revenue_expr() - cost
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


def q13_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer including
    zero-order customers (left outer join, two-level aggregate)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: % of monthly revenue from PROMO-type parts
    (conditional sum / total sum in one agg)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    vol = revenue_expr()
    promo = F.sum(F.when(F.col("p_type") == "PROMO", vol)
                  .otherwise(F.lit(0).cast(MONEY)))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            promo.cast("double").alias("promo_revenue"),
            F.sum(vol).cast("double").alias("total_revenue"),
            (F.lit(100.0) * promo.cast("double") / F.sum(vol).cast("double"))
            .cast("double")
            .alias("promo_share_pct"),
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue
    (scalar-subquery max re-expressed as a rank-1 window over the
    aggregated revenue view — one pass, no re-aggregation).

    Scale: the window ranks the per-supplier aggregate (supplier-count
    rows), not the fact table; ties all surface, matching the spec."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(revenue_expr()).cast("double").alias("total_revenue")
    )
    # rank()==1 is just "ties at the max": a one-row broadcast max
    # joined back beats an unpartitioned rank window (supplier-grain
    # is fact-scale at the 100 TB SF)
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    top = rev.join(
        F.broadcast(mx), rev.total_revenue == F.col("__mx")
    ).drop("__mx")
    return (
        top.join(supp, top.supplier_no == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: avg yearly revenue that would be lost by not
    filling small-quantity orders for one brand (correlated avg
    subquery re-expressed as a per-part aggregate join)."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#11")
    li = load_table(spark, sf_dir, "lineitem")
    branded = li.join(part, li.l_partkey == part.p_partkey)
    avg_qty = branded.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)))
        .alias("avg_q")
    )
    return (
        branded.join(avg_qty, branded.l_partkey == avg_qty.ap)
        .where(F.col("l_quantity") < 0.5 * F.col("avg_q"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(2.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with orders above a total-quantity
    threshold (HAVING on a fact aggregate, then enrich + top-N).

    Scale: the qualifying-order set is tiny after the HAVING filter, so
    the enrich joins broadcast it against orders/customer."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).cast(MONEY).alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            dec("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three OR'd brand/size/quantity
    brackets — a disjunctive pushdown test."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(part, li.l_partkey == part.p_partkey)
    b1 = (
        (F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 21)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30)
    )
    b3 = (
        (F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40)
    )
    return j.where(b1 | b2 | b3).agg(
        F.sum(revenue_expr()).cast("double").alias("revenue")
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, grouped by nation (anti-join + scalar-subquery average).

    Scale: the global average is a one-row broadcast cross join; the
    anti-join shuffles on custkey with AQE free to pick broadcast-anti
    when the order side is small after the date pruning."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1)))
        .alias("avg_bal")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal").cast(MONEY).cast("double") > F.col("avg_bal")
    )
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    nation = load_table(spark, sf_dir, "nation")
    return (
        idle.join(F.broadcast(nation), idle.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


def events_hopping_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window event aggregate (1-hour windows, 30-min hop) —
    batch twin of a sliding streaming window. Each event lands in two
    windows via F.window(slide); the oracle reproduces the assignment
    by unnesting the two candidate window starts."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def paginate_orders_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-cursor page: orders after cursor key 150, page size 50 —
    the O(limit)-per-page pagination the reference's OFFSET contract
    cannot give at scale (flapi_spark/executor.py:paginate_keyset_sql).
    The key predicate pushes into the parquet scan."""
    from flapi_spark.executor import paginate_keyset_sql
    from flapi_spark.session import register_views

    register_views(spark, sf_dir, tables=("orders",))
    inner = (
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate "
        "FROM orders"
    )
    sql = paginate_keyset_sql(inner, "o_orderkey", after=150, limit=50)
    return spark.sql(sql, args={"__after": 150})


def percentile_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of order value per priority
    (median / p90 / p99). Exact percentile is a full sort per group —
    fine here because groups are few; the approx twin below is the
    100 TB default."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("p50"),
        F.percentile("o_totalprice", 0.9).alias("p90"),
        F.percentile("o_totalprice", 0.99).alias("p99"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def approx_percentile_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch percentiles (Greenwald-Khanna in Spark) — the
    scale path: one pass, no per-group sort, bounded memory (rows-only
    check: sketch estimates are engine-specific)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
        F.percentile_approx("o_totalprice", 0.9, 10000).alias("p90"),
        F.percentile_approx("o_totalprice", 0.99, 10000).alias("p99"),
    )


def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull `k` out of the JSON props
    column and aggregate — the read_json/raw-JSON capability the
    reference reaches through DuckDB's JSON extension, Spark-side via
    get_json_object (no schema declaration needed)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (distinct from ROLLUP): totals by
    (priority), by (status), and overall, in one pass over orders."""
    from flapi_spark.session import register_views

    register_views(spark, sf_dir, tables=("orders",))
    return spark.sql(
        "SELECT o_orderpriority, o_orderstatus,"
        " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,"
        " count(*) AS n_orders"
        " FROM orders"
        " GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())"
    )


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: supplier-part relationships come from
    lineitem, no partsupp table): distinct suppliers per brand/type/size
    bucket, excluding one brand."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#45")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_volume_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted): suppliers shipping more than 30% of a
    part's 1997 volume — per-part total via a window, then filter and
    enrich with the supplier dim."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    per = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_quantity")).cast(MONEY).alias("supp_qty")
    )
    w = Window.partitionBy("l_partkey")
    shared = per.withColumn(
        "part_qty", F.sum("supp_qty").over(w).cast(MONEY)
    ).where(
        F.col("supp_qty").cast("double") > 0.3 * F.col("part_qty").cast("double")
    )
    return (
        shared.join(supp, shared.l_suppkey == supp.s_suppkey)
        .select(
            "l_partkey", "s_suppkey", "s_name",
            F.col("supp_qty").cast("double").alias("supp_qty"),
            F.col("part_qty").cast("double").alias("part_qty"),
        )
    )


def q2_min_price_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp, so the correlated minimum
    runs on p_retailprice within each part type): parts priced at their
    type's minimum, enriched with the suppliers that actually ship them
    in a region."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") < 20)
    w = Window.partitionBy("p_type")
    cheapest = (
        part.withColumn("min_price", F.min("p_retailprice").over(w))
        .where(F.col("p_retailprice") == F.col("min_price"))
        .drop("min_price")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    shippers = (
        li.join(cheapest, li.l_partkey == cheapest.p_partkey, "left_semi")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        shippers.join(cheapest, shippers.l_partkey == cheapest.p_partkey)
        .join(supp, shippers.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "s_name", "n_name", "p_partkey", "p_type",
            dec("p_retailprice").cast("double").alias("p_retailprice"),
        )
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: stock value from lineitem volumes):
    parts whose shipped value exceeds 0.07% of the total — a scalar
    subquery over the whole fact table feeding a HAVING filter."""
    li = load_table(spark, sf_dir, "lineitem")
    value = (dec("l_extendedprice") * dec("l_quantity"))
    per_part = li.groupBy("l_partkey").agg(
        F.sum(value).cast("decimal(30,4)").alias("part_value")
    )
    total = per_part.agg(
        F.sum("part_value").cast("decimal(38,4)").alias("total_value")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("part_value").cast("double")
            > 0.0007 * F.col("total_value").cast("double")
        )
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
    )


def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: no commit/receipt dates, so 'kept the
    order waiting' = shipped strictly last on a multi-supplier order):
    per supplier, count orders where the supplier shipped the single
    latest lineitem AND at least one other supplier was on the order —
    the EXISTS + NOT EXISTS double-correlation, expressed with per-order
    window aggregates instead of two correlated scans."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    flagged = li.select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        F.max("l_shipdate").over(w).alias("max_ship"),
        # count(DISTINCT) over a window is unsupported in Spark;
        # size(collect_set) is the standard equivalent
        F.size(F.collect_set("l_suppkey").over(w)).cast("long").alias("n_supp"),
        F.sum(
            F.when(F.col("l_shipdate") == F.max("l_shipdate").over(w), 1).otherwise(0)
        ).over(w).alias("n_at_max"),
    )
    waiting = (
        flagged.where(
            (F.col("n_supp") >= 2)
            & (F.col("l_shipdate") == F.col("max_ship"))
            & (F.col("n_at_max") == 1)
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: no shipmode/commit/receipt columns, so
    the two-way conditional count runs per linestatus over a ship-year
    window): urgent vs non-urgent order counts per l_linestatus."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
    )


def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order recency analytics: gap in days since the
    previous order (lag), plus first/last order dates — the
    lead/lag/first_value/last_value window family over one partition
    pass."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    prev_date = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), prev_date).cast("long").alias("gap_days"),
        F.first("o_orderdate").over(wall).alias("first_order"),
        F.last("o_orderdate").over(wall).alias("last_order"),
        F.lead("o_orderdate").over(w).alias("next_order"),
    )


SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def pivot_priority_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab: order counts per priority, pivoted to one column per
    market segment. The explicit value list keeps the output schema
    static (and skips the extra distinct-values job Spark runs for an
    unlisted pivot)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return (
        j.groupBy("o_orderpriority")
        .pivot("c_mktsegment", SEGMENTS)
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            *[F.coalesce(F.col(s), F.lit(0)).alias(s.lower()) for s in SEGMENTS],
        )
    )


def lapsed_customer_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation shape: customers who ordered in 1997 EXCEPT those
    who ordered in 1998 onward (subtract = EXCEPT DISTINCT, planned as
    an aggregate + anti-join)."""
    orders = load_table(spark, sf_dir, "orders")
    in_97 = orders.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    after = orders.where(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    ).select("o_custkey")
    return in_97.subtract(after)


def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly time-bucket gap-fill with LOCF — the hypertable
    `time_bucket_gapfill` + `locf()` pattern: a dense (event_type ×
    hour) spine over the observed range, left-joined with the hourly
    rollup; missing buckets carry the last observed sum forward
    (leading gaps fill 0.0) and are flagged.

    Scale shape: the spine is tiny (types × hours — KBs at any corpus
    size) and BROADCASTS against the rollup; the only full-data pass
    is the rollup groupBy itself. LOCF is a per-type window over
    spine-sized data, not event-sized. Exact DuckDB oracle (sums
    routed through DECIMAL so fill values are order-independent)."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(28,10)"))
        .cast("double")
        .alias("sv"),
    )
    rng = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = rng.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("bucket")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(spine))
    j = grid.join(F.broadcast(obs), ["event_type", "bucket"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        "bucket",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.coalesce(
            F.last("sv", ignorenulls=True).over(w), F.lit(0.0)
        ).alias("filled_value"),
        F.col("n").isNull().alias("is_gap"),
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the events stream: users are
    cohorted by the week of their first event; each cell counts the
    cohort's users active in week N after signup (classic retention
    triangle, the product-analytics shape the reference serves via
    SQL templates over event tables).

    Scale shape: one groupBy(user) for first-activity, one distinct
    over (user, week) — both shuffle on user_id so AQE reuses the
    exchange; the final (cohort × offset) aggregate is tiny. Week
    arithmetic stays integral (date_diff days / 7 on week-truncated
    stamps is exact), so the output is engine-portable."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    j = active.join(first, "user_id")
    return (
        j.groupBy(
            "cohort_week",
            F.floor(
                F.date_diff(F.col("act_week"), F.col("cohort_week")) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active_users"))
    )


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel over events: first view, first click strictly
    after that view, first purchase strictly after that click — per
    user, then stage-level user counts with conversion from the top
    of the funnel.

    Scale shape: three min-aggregates keyed on user_id; every join is
    user-keyed so the plan is a chain of co-partitioned hash joins
    (no broadcast of event-scale data, no cartesian). The stack() at
    the end unpivots a single 1-row product of three scalars."""
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .join(views, "user_id")
        .where(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .where(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    row = (
        views.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(clicks.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(purchases.agg(F.count(F.lit(1)).alias("n_purchase")))
    )
    un = row.selectExpr(
        "stack(3, '1_view', n_view, '2_click_after_view', n_click,"
        " '3_purchase_after_click', n_purchase) as (stage, n_users)",
        "n_view",
    )
    return un.select(
        "stage",
        F.col("n_users").cast("long").alias("n_users"),
        (
            F.col("n_users").cast("double") / F.col("n_view").cast("double")
        ).alias("conv_from_start"),
    )


def windowfns_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function breadth: per market segment, customers ranked
    by exact total order value with dense_rank / percent_rank /
    cume_dist / quartile ntile in one window pass; top 10 per segment.

    The window ordering carries a unique (value desc, custkey)
    tiebreak so rank-derived ratios are deterministic across engines.
    Scale shape: customer-keyed aggregate, unhinted customer join
    (AQE broadcasts only while the dim fits),
    one window shuffle on the 5-value segment key; top-10 filter
    prunes before the driver sees anything."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    totals = orders.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).alias("total")
    )
    j = totals.join(
        cust, totals.o_custkey == cust.c_custkey
    ).select("o_custkey", "c_mktsegment", "total")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("total"), F.asc("o_custkey")
    )
    return (
        j.select(
            "c_mktsegment",
            "o_custkey",
            F.col("total").cast("double").alias("total_value"),
            F.row_number().over(w).alias("rn"),
            F.dense_rank().over(w).alias("drank"),
            F.percent_rank().over(w).alias("prank"),
            F.cume_dist().over(w).alias("cdist"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .where(F.col("rn") <= 10)
        .select(
            "c_mktsegment", "o_custkey", "total_value",
            F.col("rn").cast("long").alias("rn"),
            F.col("drank").cast("long").alias("drank"),
            "prank", "cdist",
            F.col("quartile").cast("long").alias("quartile"),
        )
    )


def histogram_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order values: 20 bins of 30,000 with
    the last bin absorbing the tail. Bin assignment runs in INTEGER
    cents (value*100 DIV 3,000,000), so bucket edges are exact on any
    engine — no float boundary drift.

    Scale shape: a single map-side-combined groupBy over ≤20 keys;
    the scan reads one column."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (dec("o_totalprice") * 100).cast("long")
    b = orders.select(
        F.least(F.floor(cents / F.lit(3_000_000)), F.lit(19))
        .cast("long")
        .alias("bin"),
        dec("o_totalprice").alias("v"),
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("v").cast("double").alias("sum_value"),
        )
        .select(
            "bin",
            (F.col("bin") * 30_000).cast("long").alias("bin_lo"),
            "n_orders",
            "sum_value",
        )
    )


def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over lineitem measures (quantity,
    extendedprice, discount) computed from EXACT decimal moment sums:
    Σx, Σx², Σxy are all decimal (order-independent), and only the
    final corr formula runs in double with an expression shape
    mirrored verbatim in the oracle — so both engines execute the
    identical IEEE sequence and agree bit-for-bit.

    Scale shape: one pass, one map-side-combined global aggregate;
    at 1000 executors this is a treeAggregate-style reduction with
    constant output. (Built-in corr() is one pass too but its running
    float accumulation is partition-order-dependent — useless for
    cross-engine verification.)"""
    li = load_table(spark, sf_dir, "lineitem")
    q, p, d = dec("l_quantity"), dec("l_extendedprice"), dec("l_discount")
    sums = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sq"), F.sum(p).alias("sp"), F.sum(d).alias("sd"),
        F.sum(q * q).alias("sqq"), F.sum(p * p).alias("spp"),
        F.sum(d * d).alias("sdd"), F.sum(q * p).alias("sqp"),
        F.sum(q * d).alias("sqd"), F.sum(p * d).alias("spd"),
    )

    def corr(nc, sxy, sx, sy, sxx, syy):
        n_ = F.col(nc).cast("double")
        return (
            (n_ * F.col(sxy).cast("double")
             - F.col(sx).cast("double") * F.col(sy).cast("double"))
            / (
                F.sqrt(n_ * F.col(sxx).cast("double")
                       - F.col(sx).cast("double") * F.col(sx).cast("double"))
                * F.sqrt(n_ * F.col(syy).cast("double")
                         - F.col(sy).cast("double") * F.col(sy).cast("double"))
            )
        )

    return sums.select(
        F.col("n").cast("long").alias("n"),
        corr("n", "sqp", "sq", "sp", "sqq", "spp").alias("corr_qty_price"),
        corr("n", "sqd", "sq", "sd", "sqq", "sdd").alias("corr_qty_discount"),
        corr("n", "spd", "sp", "sd", "spp", "sdd").alias("corr_price_discount"),
    )


def scd2_order_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 history build: collapse each customer's order stream
    into priority "versions" with valid_from / valid_to intervals and
    an is_current flag — the dimension-history maintenance pattern the
    reference's cache merge (primary-key + cursor upsert) feeds.

    Scale shape: change detection (lag), run numbering (running sum),
    run collapse (groupBy) and interval close (lead) all share the
    customer-key partitioning, so Catalyst plans ONE exchange on
    o_custkey for the whole pipeline."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderpriority", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = F.when(
        F.lag("o_orderpriority").over(w).isNull()
        | (F.lag("o_orderpriority").over(w) != F.col("o_orderpriority")),
        F.lit(1),
    ).otherwise(F.lit(0))
    runs = o.withColumn(
        "version",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    collapsed = runs.groupBy("o_custkey", "version", "o_orderpriority").agg(
        F.min("o_orderdate").alias("valid_from"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w2 = Window.partitionBy("o_custkey").orderBy("version")
    return collapsed.select(
        "o_custkey",
        F.col("version").cast("long").alias("version"),
        "o_orderpriority",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
        "n_orders",
    )


def events_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-fill with LINEAR interpolation (the hypertable
    `interpolate()` twin of events_gapfill's locf): missing buckets
    take prev + (next - prev) * elapsed_fraction between the
    neighboring observed buckets; leading gaps backfill, trailing
    gaps carry forward. Fractions come from integral hour differences
    and the arithmetic shape is mirrored in the oracle, so the double
    math is engine-identical.

    Scale shape: identical to events_gapfill — the only event-scale
    pass is the hourly rollup; interpolation is windows over the tiny
    (type × hour) spine."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("sv")
    )
    rng = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = rng.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias(
            "bucket"
        )
    )
    grid = ev.select("event_type").distinct().crossJoin(F.broadcast(spine))
    j = grid.join(F.broadcast(obs), ["event_type", "bucket"], "left")
    back = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last("sv", ignorenulls=True).over(back)
    next_v = F.first("sv", ignorenulls=True).over(fwd)
    prev_b = F.last(
        F.when(F.col("sv").isNotNull(), F.col("bucket")), ignorenulls=True
    ).over(back)
    next_b = F.first(
        F.when(F.col("sv").isNotNull(), F.col("bucket")), ignorenulls=True
    ).over(fwd)
    frac = (
        F.timestamp_diff("HOUR", prev_b, F.col("bucket")).cast("double")
        / F.timestamp_diff("HOUR", prev_b, next_b).cast("double")
    )
    interp = (
        F.when(F.col("sv").isNotNull(), F.col("sv"))
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * frac,
        )
        .when(prev_v.isNotNull(), prev_v)
        .otherwise(next_v)
    )
    return j.select(
        "event_type",
        "bucket",
        interp.alias("value_interp"),
        F.col("sv").isNull().alias("is_gap"),
    )


def rolling_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling revenue over daily order totals: a RANGE-frame
    time window (each day sees the calendar week ending on it, not the
    last 7 rows — days can be missing). Ordering runs on an integral
    day number so the frame bounds are exact on any engine; sums stay
    decimal inside the frame and surface as DOUBLE.

    Scale shape: the event-scale work is the per-day groupBy; the
    rolling window runs over one row per day (a few thousand rows for
    years of data) — fine unpartitioned, and at a 100 TB ingest rate
    you'd partition the window by month and stitch the 6-day seam."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(
        F.sum(dec("o_totalprice")).alias("rev"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    daynum = F.date_diff(F.col("day"), F.lit("1995-01-01").cast("date"))
    w = (
        Window.orderBy(daynum.cast("long"))
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "day",
        F.col("rev").cast("double").alias("revenue"),
        F.col("n_orders").cast("long").alias("n_orders"),
        F.sum("rev").over(w).cast("double").alias("revenue_7d"),
        F.sum("n_orders").over(w).cast("long").alias("n_orders_7d"),
        (
            F.sum("rev").over(w).cast("double")
            / F.sum("n_orders").over(w)
        ).alias("avg_order_value_7d"),
    )


def repeat_customers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set operation: customers active in both the first and
    the last order year (set-op breadth beside EXCEPT's
    lapsed_customer_keys). Catalyst plans a semi-join over the two
    distinct key sets — one shuffle each side."""
    orders = load_table(spark, sf_dir, "orders")
    first_year = orders.where(
        F.year("o_orderdate") == 1995
    ).select("o_custkey")
    last_year = orders.where(
        F.year("o_orderdate") >= 2000
    ).select("o_custkey")
    return first_year.intersect(last_year)


def lineitem_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) breadth: lineitem's four measures aggregated
    exactly, then stacked into (measure, total, avg) rows — the
    inverse of pivot_priority_by_segment's cross-tab. One global
    aggregate; the stack is a 1-row projection."""
    li = load_table(spark, sf_dir, "lineitem")
    sums = li.agg(
        F.sum(dec("l_quantity")).cast("double").alias("sq"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sp"),
        F.sum(dec("l_discount")).cast("double").alias("sd"),
        F.sum(dec("l_tax")).cast("double").alias("st"),
        F.count(F.lit(1)).alias("n"),
    )
    un = sums.selectExpr(
        "stack(4, 'quantity', sq, 'extendedprice', sp,"
        " 'discount', sd, 'tax', st) as (measure, total)",
        "n",
    )
    return un.select(
        "measure",
        "total",
        (F.col("total") / F.col("n")).alias("avg_value"),
    )


def market_basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining over order contents: for every pair of
    part brands co-occurring in an order, the co-occurrence count,
    support (share of all orders) and lift — the association-rule
    primitives (Agrawal & Srikant 1994) behind "frequently bought
    together" endpoints the reference serves via SQL templates.

    Scale shape: brand tagging joins the part dim UNHINTED (part is
    200k×SF rows — AQE broadcasts only while measured-small; a pinned
    hint would abort at the 100 TB SF); the pair generation is a
    SELF-JOIN ON l_orderkey — both sides
    shuffle-partitioned on the same key, so pairs are built within
    co-located partitions and the blow-up is bounded by (brands per
    order choose 2), never |orders|². Brand-level rollup keeps the
    output at ≤ |brands|² rows. Lift is formed from exact BIGINT
    counts with the identical double expression on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(
            part.select("p_partkey", "p_brand"),
            li.l_partkey == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = ob.select(
        F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand_a")
    )
    b = ob.select(
        F.col("l_orderkey").alias("ok2"), F.col("p_brand").alias("brand_b")
    )
    pairs = (
        a.join(b, (a.ok == b.ok2) & (a.brand_a < b.brand_b))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    bc = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_brand"))
    tot = ob.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    na = bc.select(
        F.col("p_brand").alias("brand_a"), F.col("n_brand").alias("na")
    )
    nb = bc.select(
        F.col("p_brand").alias("brand_b"), F.col("n_brand").alias("nb")
    )
    return (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            F.col("n_both").cast("long").alias("n_both"),
            (
                F.col("n_both").cast("double")
                / F.col("n_orders").cast("double")
            ).alias("support"),
            (
                (F.col("n_both").cast("double") * F.col("n_orders").cast("double"))
                / (F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("lift"),
        )
    )


def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average over the daily revenue
    series (alpha = 0.25): y_t = 0.25*x_t + 0.75*y_{t-1}, y_0 = x_0 —
    the classic smoothing signal for dashboard/alerting endpoints.

    EWMA is inherently sequential, but only over the DAILY grain: the
    event-scale work is one map-side-combined groupBy(day); the fold
    then runs over a few-thousand-element array (years of days) in a
    single task. The closed-form window trick (powers of (1-a)^-t)
    overflows for long series, so the fold is the scale-correct shape.
    Both engines execute the identical IEEE sequence — Spark as an
    ordered aggregate() left fold, DuckDB as the equivalent recursive
    CTE — so results hash-match bit-for-bit."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum(dec("o_totalprice")).cast("double").alias("x"))
    arr = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("s")
    )
    folded = arr.select(
        F.expr(
            "aggregate(s,"
            " CAST(array() AS ARRAY<STRUCT<day: TIMESTAMP, x: DOUBLE,"
            "  y: DOUBLE>>),"
            " (acc, e) -> array_append(acc, named_struct("
            "  'day', e.day, 'x', e.x,"
            "  'y', CASE WHEN size(acc) = 0 THEN e.x"
            "   ELSE CAST(0.25 AS DOUBLE) * e.x"
            "    + CAST(0.75 AS DOUBLE) * element_at(acc, -1).y END)))"
        ).alias("r")
    )
    return folded.select(F.explode("r").alias("e")).select(
        F.col("e.day").alias("day"),
        F.col("e.x").alias("revenue"),
        F.col("e.y").alias("ewma"),
    )


def anomaly_zscore_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each day's revenue scored
    against the mean/stddev of the PRECEDING 30 calendar days (RANGE
    frame on an integral day number — the current day is excluded, so
    an anomalous day cannot mask itself). |z| > 2 flags the anomaly.

    Cross-engine exactness: frame sums of revenue and revenue² stay
    decimal (order-independent); mean/sd/z are formed with the
    identical double expression shape on both engines (sqrt is
    IEEE-exact, so no rounding is needed). Scale shape: one event-scale
    groupBy(day); the window runs over one row per day."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum(dec("o_totalprice")).cast(MONEY).alias("rev"))
    d2 = daily.select(
        "day",
        "rev",
        (F.col("rev") * F.col("rev")).alias("rev2"),
        F.date_diff(F.col("day"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("dn"),
    )
    w = Window.orderBy("dn").rangeBetween(-30, -1)
    stats = d2.select(
        "day",
        "rev",
        F.count(F.lit(1)).over(w).alias("n30"),
        F.sum("rev").over(w).alias("s30"),
        F.sum("rev2").over(w).alias("ss30"),
    ).where(F.col("n30") >= 10)
    mean30 = F.col("s30").cast("double") / F.col("n30").cast("double")
    sd30 = (
        F.sqrt(
            F.col("n30").cast("double") * F.col("ss30").cast("double")
            - F.col("s30").cast("double") * F.col("s30").cast("double")
        )
        / F.col("n30").cast("double")
    )
    out = stats.select(
        "day",
        F.col("rev").cast("double").alias("revenue"),
        mean30.alias("mean30"),
        sd30.alias("sd30"),
        ((F.col("rev").cast("double") - mean30) / sd30).alias("z"),
    ).where(F.col("sd30") > 0)
    return out.select(
        "day", "revenue", "mean30", "sd30", "z",
        (F.abs(F.col("z")) > 2).alias("is_anomaly"),
    )


def mode_priority_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode: the most frequent order priority within
    each market segment, with a deterministic (count desc, priority
    asc) tiebreak, plus the mode's share of the segment. Built-in
    mode() is tie-unstable across engines; the count + rank shape is
    portable and equally one-pass.

    Scale shape: unhinted customer join onto orders (AQE-sized), one
    (segment, priority) groupBy — ≤ |segments|×|priorities| groups —
    then a window over that tiny aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).select("c_mktsegment", "o_orderpriority")
    counts = j.groupBy("c_mktsegment", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    wseg = Window.partitionBy("c_mktsegment")
    wrank = wseg.orderBy(F.desc("n"), F.asc("o_orderpriority"))
    return (
        counts.withColumn("rn", F.row_number().over(wrank))
        .withColumn("tot", F.sum("n").over(wseg))
        .where(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").cast("long").alias("n_orders"),
            (
                F.col("n").cast("double") / F.col("tot").cast("double")
            ).alias("seg_share"),
        )
    )


def _z_interleave_terms(ca: str, cb: str, n_bits: int = 8) -> str:
    """Bit-interleave two n-bit values into a Z-value as a sum of
    constant-multiplied bit extractions — pure integer arithmetic that
    renders identically in Spark SQL and DuckDB."""
    terms = []
    for i in range(n_bits):
        terms.append(f"((({ca} >> {i}) & 1) * {1 << (2 * i + 1)})")
        terms.append(f"((({cb} >> {i}) & 1) * {1 << (2 * i)})")
    return " + ".join(terms)


def zorder_locality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout statistics for orders clustered on
    (o_custkey, order day): rank-normalize each dimension onto an 8-bit
    grid (Delta's OPTIMIZE ZORDER does exactly this with
    range_partition_id — equal-weight quantile cells, immune to
    cardinality/skew differences between columns), interleave the bits
    into a Z-value, cut the Z-ordered sequence into 16 equal buckets
    (stand-ins for files), and report each bucket's min/max/span on
    BOTH dimensions. Tight per-bucket spans on both columns are what
    make file-level min/max statistics prune scans for predicates on
    EITHER dimension; a single-column sort leaves the other dimension's
    span at full width in every file.

    The rank-normalization and bucketing run through the distributed
    global_rank/ntile_band pattern (scale.py) — no unpartitioned
    window anywhere, so the diagnostic itself survives fact-scale
    input; the exact ANSI-ntile bucket formula keeps the cut
    deterministic so the DuckDB oracle replays it bit-for-bit. (At
    write time the production layout step is `repartitionByRange(z)` +
    `sortWithinPartitions(z)`, the same shape Delta's OPTIMIZE ZORDER
    uses.)"""
    from flapi_spark.operators.scale import global_rank, ntile_band

    orders = load_table(spark, sf_dir, "orders")
    base = orders.selectExpr(
        "o_orderkey",
        "o_custkey",
        "date_diff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS dn",
    )
    n = base.count()  # footer-metadata scalar, shared by all 3 cuts
    ranked = global_rank(
        global_rank(base, ["o_custkey", "o_orderkey"], "rc"),
        ["dn", "o_orderkey"],
        "rd",
        checkpoint_input=True,  # inner rank's machinery runs once
    )
    norm = ranked.select(
        "o_orderkey",
        "o_custkey",
        "dn",
        (ntile_band(F.col("rc"), F.lit(n), 256) - 1).alias("c8"),
        (ntile_band(F.col("rd"), F.lit(n), 256) - 1).alias("d8"),
    )
    z = norm.selectExpr(
        "o_orderkey",
        "o_custkey",
        "dn",
        f"{_z_interleave_terms('c8', 'd8')} AS z",
    )
    zr = global_rank(z, ["z", "o_orderkey"], "rz")
    return (
        zr.withColumn("bucket", ntile_band(F.col("rz"), F.lit(n), 16))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").alias("ck_min"),
            F.max("o_custkey").alias("ck_max"),
            F.min("dn").alias("dn_min"),
            F.max("dn").alias("dn_max"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("ck_min").cast("long").alias("ck_min"),
            F.col("ck_max").cast("long").alias("ck_max"),
            (F.col("ck_max") - F.col("ck_min")).cast("long").alias("ck_span"),
            F.col("dn_min").cast("long").alias("dn_min"),
            F.col("dn_max").cast("long").alias("dn_max"),
            (F.col("dn_max") - F.col("dn_min")).cast("long").alias("dn_span"),
        )
    )


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the event stream: for
    each user's time-ordered events, count (from_type → to_type)
    transitions and the per-source transition probability — the
    behavioral-analytics shape behind next-action prediction and
    anomaly path detection.

    Scale shape: ONE window pass partitioned by user_id (the same
    user-keyed exchange every other events query shuffles on; AQE
    reuses it), then a groupBy over ≤ |types|² keys. The (ts,
    event_id) ordering carries a unique tiebreak so simultaneous
    events transition deterministically on any engine."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wsrc = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n_transitions"),
        (
            F.col("n").cast("double")
            / F.sum("n").over(wsrc).cast("double")
        ).alias("p_transition"),
    )


def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation:
    per-customer days-since-last-order against a fixed as-of date,
    order count, and exact decimal spend, each cut into quintiles
    (1 = best) with deterministic tiebreaks, concatenated into the
    classic 3-digit RFM segment code.

    Scale shape: the order-scale work is one groupBy(custkey); the
    quintile cuts run through the DISTRIBUTED global_rank + exact
    ANSI ntile formula (scale.py) — customer-grain is fact-scale at
    the 100 TB SF, so three unpartitioned ntile windows would each be
    a single-task sort. Descending dimensions rank on negated keys.
    Bit-for-bit equal to the window ntile, so the DuckDB oracle (which
    keeps using ntile) stays green."""
    from flapi_spark.operators.scale import global_rank, ntile_band

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.date_diff(
            F.lit("2002-01-01").cast("date"), F.max("o_orderdate")
        )
        .cast("long")
        .alias("recency_days"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec("o_totalprice")).alias("monetary"),
    )
    # materialize the customer rollup ONCE — the count action and the
    # first rank's four frozen-bin passes all read the same blocks
    per_cust = per_cust.localCheckpoint(eager=True)
    n = per_cust.count()
    ranked = per_cust.withColumn(
        "__negf", -F.col("n_orders")
    ).withColumn("__negm", -F.col("monetary"))
    # chained ranks: the 2nd/3rd stage's input embeds the previous
    # stage's frozen-bin machinery — checkpoint those so the 3rd rank
    # does not re-run the 1st and 2nd's machinery four more times
    ranked = global_rank(ranked, ["recency_days", "o_custkey"], "__rr")
    ranked = global_rank(
        ranked, ["__negf", "o_custkey"], "__rf", checkpoint_input=True
    )
    ranked = global_rank(
        ranked, ["__negm", "o_custkey"], "__rm", checkpoint_input=True
    )
    scored = ranked.select(
        "o_custkey",
        "recency_days",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("monetary").cast("double").alias("monetary"),
        ntile_band(F.col("__rr"), F.lit(n), 5).cast("int").alias("r_q"),
        ntile_band(F.col("__rf"), F.lit(n), 5).cast("int").alias("f_q"),
        ntile_band(F.col("__rm"), F.lit(n), 5).cast("int").alias("m_q"),
    )
    return scored.select(
        "o_custkey",
        "recency_days",
        "n_orders",
        "monetary",
        F.col("r_q").cast("long").alias("r_q"),
        F.col("f_q").cast("long").alias("f_q"),
        F.col("m_q").cast("long").alias("m_q"),
        F.concat(
            F.col("r_q").cast("string"),
            F.col("f_q").cast("string"),
            F.col("m_q").cast("string"),
        ).alias("rfm_segment"),
    )


def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via the VARIANT type (Spark 4 /
    open-variant binary encoding — the successor to string-JSON
    pipelines): parse once with try_parse_json, extract typed paths
    with variant_get, and survive malformed input without failing the
    query. Every ~97th event's props is deterministically truncated so
    the malformed-row branch has real data; the oracle replays the
    identical truncation with json_valid gating.

    Scale shape: a zero-shuffle projection + a ≤|types| groupBy.
    Variant's binary encoding parses each document once (vs
    get_json_object re-parsing per path) — at 100 TB the difference
    is a full scan's worth of CPU when several paths are extracted."""
    ev = load_table(spark, sf_dir, "events")
    truncated = F.when(
        F.col("event_id") % 97 == 0,
        F.expr("substr(props, 1, length(props) - 2)"),
    ).otherwise(F.col("props"))
    v = F.try_parse_json(truncated)
    k = F.expr(
        "variant_get(try_parse_json(CASE WHEN event_id % 97 = 0"
        " THEN substr(props, 1, length(props) - 2)"
        " ELSE props END), '$.k', 'bigint')"
    )
    return (
        ev.select(
            "event_type",
            v.isNull().cast("long").alias("malformed"),
            k.alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("malformed").cast("long").alias("n_malformed"),
            F.count("k").alias("n_with_k"),
            F.sum("k").cast("long").alias("sum_k"),
            (
                F.sum("k").cast("double") / F.count("k").cast("double")
            ).alias("avg_k"),
        )
    )


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(priority, status) — all four grouping combinations
    (by-both, by-priority, by-status, grand total) in ONE pass,
    completing the multi-dim aggregate family beside ROLLUP and
    explicit GROUPING SETS. grouping_id disambiguates a real NULL
    member from a subtotal row (the standard cube-consumer contract).

    Scale shape: Catalyst expands the cube into a single Expand +
    hash aggregate — map-side combined, one shuffle over the (tiny)
    expanded key space."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


def fuzzy_part_name_pairs(
    spark: SparkSession, sf_dir: str, max_dist: int = 3
) -> DataFrame:
    """Entity-resolution fuzzy join over the part-name space: distinct
    names, blocked on their final token (the noun), verified with
    levenshtein ≤ max_dist — the blocking+verify shape every
    dedup/record-linkage pipeline uses to avoid the all-pairs
    cartesian (Fellegi-Sunter style blocking; same skeleton as the
    MinHash band join).

    Scale shape: DISTINCT collapses the name space first (names
    repeat across parts); the self-join is EQUI-keyed on the block
    token, so pair volume is bounded per block, never |names|²;
    levenshtein runs only on block-cohabitants. Exact oracle —
    levenshtein is the same classic edit distance in both engines."""
    part = load_table(spark, sf_dir, "part")
    names = (
        part.select(F.col("p_name").alias("name"))
        .distinct()
        .withColumn("block", F.element_at(F.split("name", " "), -1))
    )
    a = names.select(
        F.col("block"), F.col("name").alias("name_a")
    )
    b = names.select(
        F.col("block").alias("block_b"), F.col("name").alias("name_b")
    )
    return (
        a.join(b, (a.block == b.block_b) & (a.name_a < b.name_b))
        .select(
            "block",
            "name_a",
            "name_b",
            # banded threshold form: O(max_dist·len) per pair instead
            # of O(len²), early-abandons above max_dist (returns -1 —
            # exactly the rows the filter dropped; survivors carry the
            # identical exact distance)
            F.levenshtein("name_a", "name_b", threshold=max_dist)
            .cast("long")
            .alias("distance"),
        )
        .where(F.col("distance") >= 0)
    )


def rolling_distinct_customers_7d(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trailing-7-day DISTINCT customer count per day — the windowed
    count-distinct Spark's window functions cannot express directly
    (COUNT(DISTINCT) OVER is unsupported).

    Scale shape: the coverage-explode formulation — a customer active
    on day a counts toward every window day a..a+6, so each distinct
    (custkey, day) pair explodes into ≤7 (custkey, window_day) rows,
    deduped and counted per window day. Every row stays
    CONSTANT-SIZE (the previous formulation collected per-day
    customer SETS, whose row width grows with daily active customers
    — tens of millions of keys in one row at the 100 TB SF); every
    stage is a linear shuffle. Sketch twin at extreme cardinality:
    HLL union over the same explode. Counts integral → exact
    oracle."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.date_trunc("day", F.col("o_orderdate")).alias("day")
    daily = orders.groupBy(day).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    pairs = orders.select(
        "o_custkey", day
    ).distinct()
    coverage = pairs.select(
        "o_custkey",
        F.explode(
            F.expr("sequence(day, day + interval 6 days, interval 1 day)")
        ).alias("wday"),
    ).distinct()
    counts = coverage.groupBy("wday").agg(
        F.count(F.lit(1)).alias("distinct_customers_7d")
    )
    return daily.join(
        counts, daily.day == counts.wday
    ).select(
        "day",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("distinct_customers_7d").cast("long").alias(
            "distinct_customers_7d"
        ),
    )


def events_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization through Spark's NATIVE session_window (the
    merging-window operator that also runs under Structured Streaming
    with state eviction) — the idiomatic twin of the manual
    lag+cumsum events_sessionize. Same 30-minute-gap semantics: an
    event merges into the session while its gap from the previous
    event is ≤ the timeout (verified empirically; the oracle encodes
    the identical > comparison for session breaks).

    Output start = first event ts; end = last event ts + timeout
    (session_window's close boundary). Scale shape: one shuffle on
    (user_id); merging happens inside the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy("user_id", sw.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal-routed: double sums are partition-order-dependent
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col("n_events").cast("long").alias("n_events"),
            "sum_value",
        )
    )


def rolling_median_order_value_7d(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact moving MEDIAN of daily revenue over the trailing 7
    calendar days — the order statistic Spark's windows can't express
    natively (percentile over a moving RANGE frame). Daily totals stay
    decimal; each frame's ≤7 values are collected, sorted, and
    interpolated with quantile_cont semantics (linear between the two
    middle values on even counts) — identical IEEE arithmetic on both
    engines, so the oracle matches exactly.

    Scale shape: event-scale work is one groupBy(day); frames carry at
    most 7 day-grain values each, so the collect is bounded by the
    frame width, never by data volume."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum(dec("o_totalprice")).cast("double").alias("rev"))
    daynum = F.date_diff(F.col("day"), F.lit("1995-01-01").cast("date"))
    w = (
        Window.orderBy(daynum.cast("long"))
        .rangeBetween(-6, Window.currentRow)
    )
    framed = daily.select(
        "day",
        F.col("rev").alias("revenue"),
        F.sort_array(F.collect_list("rev").over(w)).alias("vals"),
    )
    # quantile_cont(0.5): pos = (n-1)/2; lerp between floor/ceil.
    # Indexing uses explicit integer division (DIV / //) — a float
    # CAST-to-INT rounds in DuckDB but truncates in Spark.
    median = F.expr(
        "CASE WHEN size(vals) % 2 = 1"
        " THEN element_at(vals, CAST(size(vals) DIV 2 AS INT) + 1)"
        " ELSE element_at(vals, CAST(size(vals) DIV 2 AS INT))"
        "  + (element_at(vals, CAST(size(vals) DIV 2 AS INT) + 1)"
        "     - element_at(vals, CAST(size(vals) DIV 2 AS INT)))"
        "    * CAST(0.5 AS DOUBLE) END"
    )
    return framed.select(
        "day",
        "revenue",
        F.size("vals").cast("long").alias("n_days_in_frame"),
        median.alias("median_7d"),
    )


BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("table", "scan", "merge")


def bm25_idf_tfn() -> tuple[F.Column, F.Column]:
    """THE BM25 scoring expressions (round-10c review: four inlined
    copies), over columns (tf, df, dl, n_docs, total_len):
    idf = ln((N − df + 0.5)/(df + 0.5) + 1) [Lucene's +1 form],
    tf-norm with the avglen division deferred so every operand derives
    from exact integers. One expression shape everywhere — the DuckDB
    oracles mirror this exact arithmetic."""
    idf = F.log(
        (
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        + F.lit(1.0)
    )
    tfn = (
        F.col("tf") * (F.lit(BM25_K1) + 1)
        / (
            F.col("tf")
            + F.lit(BM25_K1) * (F.lit(1.0) - F.lit(BM25_B))
            + F.lit(BM25_K1)
            * F.lit(BM25_B)
            * (
                F.col("dl").cast("double")
                * F.col("n_docs").cast("double")
                / F.col("total_len").cast("double")
            )
        )
    )
    return idf, tfn


def bm25_search(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """BM25 ranking (Robertson & Spärck Jones probabilistic IR; the
    scoring function behind Lucene/Elasticsearch): score every
    document against a fixed query token set and return the top-k —
    the retrieval primitive beside the embedding-space ANN operators.

    idf = ln((N - df + 0.5) / (df + 0.5) + 1)  [Lucene's +1 form]
    tf-norm = tf·(k1+1) / (tf + k1·(1 - b + b·len/avglen))

    Exactness: tf/df/N/len are integral; avglen enters as an exact
    integer pair (len·N vs total) — the score expression is mirrored
    IEEE arithmetic, rounded to 6 decimals, rank tiebreak on doc_id.
    Scale shape: one token-explode groupBy for per-doc tf of the ≤3
    query terms (everything else pre-filters on the tiny query set),
    df/avglen are scalar broadcasts, top-k is a TakeOrdered."""
    from flapi_spark.operators.text import _tokens

    docs = load_table(spark, sf_dir, "documents")
    # canonical normalization (operators/text.py _tokens == the
    # oracle's _TOKS): collapse whitespace, trim, lower, split
    toks = docs.select("doc_id", F.explode(_tokens()).alias("tok"))
    lens = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    q = toks.where(F.col("tok").isin(*BM25_QUERY))
    tf = q.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "tok")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf, tfn = bm25_idf_tfn()
    per_doc = (
        scored.select("doc_id", (idf * tfn).alias("part"))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.expr(
                    "aggregate(sort_array(collect_list(part)),"
                    " CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
                ),
                6,
            ).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    # top-k via orderBy+limit -> TakeOrderedAndProject (per-partition
    # heap of k, no global sort) — NOT a row_number window over every
    # scored doc, which plans as a single-task sort of the whole
    # corpus. rnk is re-derived over the k survivors only.
    topk = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    wr = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.select(
        "doc_id", "score",
        F.col("n_terms_hit").cast("long").alias("n_terms_hit"),
        F.row_number().over(wr).cast("long").alias("rnk"),
    )


def twa_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the event value per type with LOCF
    weighting (TimescaleDB's time_weight('LOCF') hyperfunction): each
    observation holds until the next one, so its weight is the gap to
    the successor; the final observation carries no weight. The signal
    irregular-interval telemetry needs — a plain AVG over-counts
    bursts.

    Cross-engine exactness: gaps are integral microseconds; the
    weighted sum folds value·gap in POSITIONAL (time) order on both
    engines — identical IEEE sequence — then rounds to 6dp. Scale
    shape: one shuffle on event_type; per-type series fold in one
    task (partition by day and stitch for petabyte series)."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        # NTZ-pure microseconds from a fixed anchor: no session-TZ
        # dependence (an LTZ cast would shift under non-UTC sessions)
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
        ).alias("ts_us"),
        "value",
        "event_id",
    )
    arr = pts.groupBy("event_type").agg(
        F.sort_array(
            F.collect_list(F.struct("ts_us", "event_id", "value"))
        ).alias("a")
    )
    wsum = F.expr(
        "aggregate(sequence(1, size(a) - 1), CAST(0.0 AS DOUBLE),"
        " (acc, i) -> acc + element_at(a, i).value"
        "  * CAST(element_at(a, i + 1).ts_us"
        "     - element_at(a, i).ts_us AS DOUBLE))"
    )
    tdur = F.expr(
        "element_at(a, -1).ts_us - element_at(a, 1).ts_us"
    )
    # a 1-point series has no weighted span (and sequence(1, 0) would
    # descend); every real series here has thousands of points
    arr = arr.where(F.size("a") >= 2)
    return arr.select(
        "event_type",
        F.size("a").cast("long").alias("n_events"),
        tdur.cast("long").alias("total_dur_us"),
        F.round(wsum / tdur.cast("double"), 6).alias("twa_value"),
    )


def m4_downsample_events(
    spark: SparkSession, sf_dir: str, n_buckets: int = 100
) -> DataFrame:
    """M4 downsampling (Jugel et al. 2014): per series and time
    bucket, keep first/last/min/max — the lossless-for-rendering
    reduction every time-series dashboard runs before plotting
    (error-free min/max envelopes at pixel resolution).

    Pure SELECTION — no float arithmetic at all, so results are
    engine-exact by construction. Bucket ids are integral-microsecond
    arithmetic over the global span. Scale shape: two window passes
    over (type, bucket) + one groupBy; everything shuffles once on
    the series key."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
        ).alias("ts_us"),
        "value",
        "event_id",
    )
    span = pts.agg(
        F.min("ts_us").alias("t0"), F.max("ts_us").alias("t1")
    )
    b = pts.crossJoin(F.broadcast(span)).withColumn(
        "bucket",
        F.least(
            F.floor(
                (F.col("ts_us") - F.col("t0"))
                * n_buckets
                / (F.col("t1") - F.col("t0") + 1)
            ).cast("long"),
            F.lit(n_buckets - 1).cast("long"),
        ),
    )
    wasc = Window.partitionBy("event_type", "bucket").orderBy(
        F.asc("ts_us"), F.asc("event_id")
    )
    wdesc = Window.partitionBy("event_type", "bucket").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    ranked = b.select(
        "event_type", "bucket", "ts_us", "value",
        F.row_number().over(wasc).alias("ra"),
        F.row_number().over(wdesc).alias("rd"),
    )
    return ranked.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        F.max(F.when(F.col("ra") == 1, F.col("value"))).alias("v_first"),
        F.max(F.when(F.col("rd") == 1, F.col("value"))).alias("v_last"),
        F.min("ts_us").alias("ts_first_us"),
        F.max("ts_us").alias("ts_last_us"),
    )


def orderpriority_status_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/string_agg parity: per order priority, the DISTINCT
    statuses concatenated in sorted order — deterministic ordered
    aggregation string both engines render identically (unordered
    listagg is engine-arbitrary; the ORDER BY inside the aggregate is
    the portability contract)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderstatus")), ","
            ).alias("statuses"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def counter_rate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style counter `increase()` with reset detection — the
    monitoring-series primitive (Prometheus counter semantics: a
    cumulative counter only rises; an observed drop means the process
    restarted, and the post-reset value counts from zero).

    The synthetic counter is derived deterministically: per-user
    running sum of floor(value*100) integer units, wrapped modulo
    100000 so resets genuinely occur in testdata. Per consecutive
    sample (user-keyed, (ts, event_id)-ordered): increase = counter −
    prev when monotone, else counter (reset ⇒ restarted from 0).
    Rolled up per (event_type, hour): total increase, sample count,
    reset count — all exact BIGINT arithmetic, exact DuckDB oracle.

    Scale shape: two window passes over the SAME user-keyed exchange
    (cumsum + lag share partitioning) and one tiny groupBy — the shape
    a 100 TB metrics store (hypertable/Prometheus TSDB rollup) needs.
    floor(value*100) avoids the double→int cast trap (Spark truncates,
    DuckDB rounds); floor is IEEE-exact in both."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counters = v.withColumn(
        "counter",
        F.pmod(
            F.sum("v").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            F.lit(100000),
        ),
    )
    stepped = counters.withColumn("prev", F.lag("counter").over(w))
    inc = F.when(F.col("prev").isNull(), F.lit(0)).otherwise(
        F.when(
            F.col("counter") >= F.col("prev"),
            F.col("counter") - F.col("prev"),
        ).otherwise(F.col("counter"))
    )
    reset = F.when(
        F.col("prev").isNotNull() & (F.col("counter") < F.col("prev")), 1
    ).otherwise(0)
    return (
        stepped.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            inc.alias("inc"),
            reset.alias("r"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.sum("inc").cast("long").alias("total_increase"),
            F.count(F.lit(1)).cast("long").alias("n_samples"),
            F.sum("r").cast("long").alias("n_resets"),
        )
    )


def trimmed_mean_order_values(
    spark: SparkSession, sf_dir: str, trim_pct: int = 10
) -> DataFrame:
    """Robust statistics per customer segment: the 10%-trimmed mean of
    order values beside the plain mean — the outlier-resistant central
    tendency analysts reach for when a few whale orders drag the
    average (trim k = n DIV 10 rows from EACH tail; explicit integer
    division because Spark truncates where DuckDB's cast rounds).

    Scale shape: the customer join is unhinted (AQE broadcasts while
    the projected dim fits); the
    two rank windows (ascending / descending over a unique
    (value, orderkey) order) share ONE segment-keyed exchange; sums
    stay exact DECIMAL until the final double division. Exact DuckDB
    oracle."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).select(
        "c_mktsegment",
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        "o_orderkey",
    )
    asc = Window.partitionBy("c_mktsegment").orderBy("v", "o_orderkey")
    desc = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("v"), F.desc("o_orderkey")
    )
    ranked = j.select(
        "c_mktsegment",
        "v",
        F.row_number().over(asc).alias("ra"),
        F.row_number().over(desc).alias("rd"),
        F.count(F.lit(1)).over(
            Window.partitionBy("c_mktsegment")
        ).alias("n"),
    ).withColumn("k", F.expr(f"n div {100 // trim_pct}"))
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            (
                F.sum("v").cast("double") / F.count(F.lit(1))
            ).alias("mean_all"),
            (
                F.sum(F.when((F.col("ra") > F.col("k")) & (F.col("rd") > F.col("k")), F.col("v"))).cast("double")
                / F.sum(F.when((F.col("ra") > F.col("k")) & (F.col("rd") > F.col("k")), 1))
            ).alias("mean_trimmed"),
        )
    )


def customer_activity_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation of two activity ledgers — the join
    type still missing from the suite: customers seen in ORDERS vs
    users seen in EVENTS, keyed on the shared id space. Matched rows
    carry both counts; one-sided rows surface as has_* = false with a
    zero count (the audit shape: 'who ordered but never clicked, who
    clicked but never ordered').

    Both sides pre-aggregate to key grain BEFORE the join (map-side
    combined), so the full-outer shuffles key-grain rows, not raw
    facts — the 100 TB reconciliation shape. Exact DuckDB oracle."""
    orders = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    o = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    e = ev.groupBy(F.col("user_id").alias("key")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return (
        o.join(e, "key", "full_outer")
        .select(
            F.col("key").cast("long").alias("key"),
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.col("n_orders").isNotNull().alias("has_orders"),
            F.col("n_events").isNotNull().alias("has_events"),
        )
    )


def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency percentiles: for every user completing the
    ordered view→click→purchase funnel (funnel_conversion's chain),
    the time from first view to the completing purchase — reported as
    exact interpolated p50/p90 seconds plus min/max/count, the metric
    a growth dashboard plots next to the stage counts.

    Scale shape: the same user-keyed min-aggregate chain as the
    funnel (co-partitioned joins, no event-scale broadcast); the
    percentile sorts only the converted-user latencies (funnel-sized,
    not event-sized). Latencies are integral NTZ microseconds, so the
    only doubles are the final interpolation/division — mirrored in
    the exact DuckDB oracle."""
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .join(views, "user_id")
        .where(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"), F.first("view_ts").alias("view_ts"))
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .where(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("purchase_ts"),
            F.first("view_ts").alias("view_ts"),
        )
    )
    lat = purchases.select(
        F.expr("timestampdiff(MICROSECOND, view_ts, purchase_ts)").alias(
            "lat_us"
        )
    )
    return lat.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.percentile("lat_us", 0.5) / 1e6, 6).alias("p50_s"),
        F.round(F.percentile("lat_us", 0.9) / 1e6, 6).alias("p90_s"),
        F.round(F.min("lat_us") / 1e6, 6).alias("min_s"),
        F.round(F.max("lat_us") / 1e6, 6).alias("max_s"),
    )


def user_overlap_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact audience-overlap matrix: for every ordered pair of event
    types, distinct users in both / either, and the Jaccard overlap —
    the segment-intersection question behind audience sizing.

    Scale shape: one distinct (type, user) projection, then a
    self-join on user_id — shuffle bounded by distinct pairs, with
    per-type distinct counts joined in from the same base. Exact
    DuckDB oracle. The HLL twin below answers the same question in
    one pass with mergeable sketches (no user-keyed self-join) — the
    100 TB path when ±2%% is acceptable."""
    ev = load_table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    singles = tu.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    both = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        both.join(sa, "type_a")
        .join(sb, "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_both").cast("long").alias("n_both"),
            (F.col("na") + F.col("nb") - F.col("n_both"))
            .cast("long")
            .alias("n_either"),
            F.round(
                F.col("n_both").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
    )


def user_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-algebra twin of user_overlap_exact: per-type HLL user
    sketches built in ONE pass, pairwise union via hll_union (sketch
    merge — no re-scan, no user-keyed join), intersection by
    inclusion-exclusion |A∩B| = |A| + |B| − |A∪B|. Mergeable sketches
    are the 100 TB shape: type-grain sketch rows are bytes, the whole
    matrix computes driver-free from one aggregate. Rows-only check
    (HLL estimates are engine-specific); accuracy vs the exact twin
    is test-asserted."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk"),
        F.approx_count_distinct("user_id").alias("n_est"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("n_est").alias("na"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("n_est").alias("nb"),
    )
    pairs = a.crossJoin(b).where(F.col("type_a") < F.col("type_b"))
    est_union = F.expr("hll_sketch_estimate(hll_union(sk_a, sk_b))")
    return pairs.select(
        "type_a",
        "type_b",
        (F.col("na") + F.col("nb") - est_union).cast("long").alias("n_both_est"),
        est_union.cast("long").alias("n_either_est"),
    )


def forecast_seasonal_naive(
    spark: SparkSession, sf_dir: str, season_days: int = 7
) -> DataFrame:
    """Seasonal-naive forecast backtest over the daily revenue series:
    predict each day as the value `season_days` earlier (the standard
    baseline every forecasting benchmark starts from, cf. M-series
    competitions) and score the backtest with per-day absolute error
    plus running MAE — the model-quality readout an endpoint would
    serve.

    Scale shape: the order-scale work is ONE groupBy(day); lag and
    the running mean share a single (unpartitioned but day-grain —
    series-length, not fact-scale) window. Exact decimal revenue;
    error math in integral cents; MAE divides two exact integers per
    row (deterministic double), rounded 6dp. Exact oracle."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
            ).alias("cents")
        )
    )
    w = Window.orderBy("day")
    fc = daily.select(
        "day",
        "cents",
        F.lag("cents", season_days).over(w).alias("pred_cents"),
    ).where(F.col("pred_cents").isNotNull())
    err = F.abs(F.col("cents") - F.col("pred_cents"))
    scored = fc.select(
        "day",
        (F.col("cents").cast("double") / 100).alias("actual"),
        (F.col("pred_cents").cast("double") / 100).alias("predicted"),
        err.alias("abs_err_cents"),
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return scored.select(
        "day",
        "actual",
        "predicted",
        F.col("abs_err_cents").cast("long").alias("abs_err_cents"),
        F.round(
            F.sum("abs_err_cents").over(wc).cast("double")
            / (F.count(F.lit(1)).over(wc) * 100),
            6,
        ).alias("running_mae"),
    )


def hhi_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman market-concentration index per nation:
    each supplier's share of its nation's lineitem revenue, squared
    and summed (×10000, the antitrust convention) — the market-power
    diagnostic (HHI > 2500 = highly concentrated).

    Revenue sums stay exact DECIMAL through both aggregation levels;
    shares and the HHI are mirrored double expressions rounded 6dp.
    Fact-scale work is ONE groupBy(suppkey); nation rollups run on
    supplier-grain rows. Exact oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    # HHI from EXACT integers: scaled revenue rs (decimal -> integral
    # BIGINT), sum(rs^2) in DECIMAL(38,0) / HUGEINT, only ONE final
    # double ratio. A double share-sum would accumulate in partition
    # order (engine-divergent); int->double conversion is single-
    # rounded in both engines, so this form is bit-identical.
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(l_extendedprice AS DECIMAL(18,2))"
                    " * (1 - CAST(l_discount AS DECIMAL(18,2)))"
                )
            ).alias("rev")
        )
        .withColumn("rs", F.expr("CAST(rev * 10000 AS BIGINT)"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    num = F.expr("sum(CAST(rs AS DECIMAL(38,0)) * CAST(rs AS DECIMAL(38,0)))")
    den = F.sum("rs")
    return rev.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.round(
            (F.lit(10000.0) * num.cast("double"))
            / (den.cast("double") * den.cast("double")),
            6,
        ).alias("hhi"),
    )


def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the customer revenue distribution — the
    inequality readout of a marketplace ("do 1% of customers drive 99%
    of revenue?"). G = (2·Σ i·x_i) / (n·Σ x_i) − (n+1)/n over
    ascending-sorted per-customer revenue x_i (rank i from 1).

    Per-customer revenue in exact integer cents; Σ i·x_i and Σ x_i are
    exact BIGINT sums (rank · cents < 2^63 at any realistic scale);
    only the final two-term formula runs in mirrored doubles. One
    fact-scale groupBy, then the rank comes from the DISTRIBUTED
    global_rank (scale.py) — customer-grain is still billions of rows
    at the 100 TB SF, so an unpartitioned rank window would be a
    single-task sort. Exact oracle."""
    from flapi_spark.operators.scale import global_rank

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).alias(
            "cents"
        )
    )
    ranked = global_rank(
        per_cust, ["cents", "o_custkey"], "i", checkpoint_input=True
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.round(
            (F.lit(2.0) * F.sum(F.col("i") * F.col("cents")))
            / (F.count(F.lit(1)) * F.sum("cents"))
            - (F.count(F.lit(1)) + F.lit(1)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


def benford_leading_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen over order values: observed leading-digit
    frequencies vs the log10(1 + 1/d) expectation — the classic
    anomaly/fraud diagnostic for transaction amounts.

    The leading digit comes from string arithmetic (first char of the
    integral part — deterministic, no float log in the extraction);
    expected frequencies are log10 literals computed identically in
    both engines; deviation = observed − expected rounded 6dp. One
    conditional-sum scan. Exact oracle."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.substring(
        F.expr("CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING)"), 1, 1
    ).cast("int")
    t = orders.select(d.alias("digit")).where(F.col("digit") >= 1)
    from pyspark.sql import Window

    wall = Window.partitionBy()
    counted = (
        t.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("total", F.sum("n").over(wall))
    )
    obs = F.col("n").cast("double") / F.col("total").cast("double")
    expect = F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6)
    return counted.select(
        F.col("digit").cast("long").alias("digit"),
        F.col("n").cast("long").alias("n"),
        F.round(obs, 6).alias("observed_freq"),
        expect.alias("benford_freq"),
        F.round(obs - F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6).alias(
            "deviation"
        ),
    )


def kaplan_meier_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve over inter-order gaps: "how long
    until a customer orders again?" with proper right-censoring (each
    customer's time from last order to the end of observation counts
    as at-risk but uneventful) — the churn-analysis estimator.

    d_i / n_i at each event time are exact integer counts (one
    fact-scale window pass + day-grain aggregates). The survival
    product S_i = Π (1 − d_i/n_i) folds over the SORTED event times —
    a few hundred elements — as a sequential array fold whose IEEE
    sequence the oracle's recursive CTE replays term for term
    (bit-exact, the ewma_daily_revenue pattern)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = orders.select(
        "o_custkey",
        "o_orderdate",
        F.lead("o_orderdate").over(w).alias("next_date"),
    )
    end = orders.agg(F.max("o_orderdate")).first()[0]
    durations = nxt.select(
        F.when(
            F.col("next_date").isNotNull(),
            F.datediff("next_date", "o_orderdate"),
        )
        .otherwise(F.datediff(F.lit(end), F.col("o_orderdate")))
        .cast("long")
        .alias("t"),
        F.col("next_date").isNotNull().alias("event"),
    )
    total = durations.count()
    per_t = durations.groupBy("t").agg(
        F.sum(F.when(F.col("event"), 1).otherwise(0)).alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    wt = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = per_t.withColumn(
        "n", F.lit(total) - F.coalesce(F.sum("leaving").over(wt), F.lit(0))
    ).where(F.col("d") > 0)
    folded = risk.select(
        F.expr(
            "aggregate("
            " array_sort(collect_list(struct(t, d, n))),"
            " CAST(named_struct('s', CAST(1.0 AS DOUBLE),"
            "  'out', CAST(array() AS"
            "   ARRAY<STRUCT<t: BIGINT, d: BIGINT, n: BIGINT, surv: DOUBLE>>)"
            " ) AS STRUCT<s: DOUBLE,"
            "  out: ARRAY<STRUCT<t: BIGINT, d: BIGINT, n: BIGINT, surv: DOUBLE>>>),"
            " (acc, e) -> named_struct("
            "  's', acc.s * (CAST(1.0 AS DOUBLE) - CAST(e.d AS DOUBLE) / e.n),"
            "  'out', array_append(acc.out, named_struct("
            "   't', CAST(e.t AS BIGINT), 'd', CAST(e.d AS BIGINT),"
            "   'n', CAST(e.n AS BIGINT),"
            "   'surv', acc.s * (CAST(1.0 AS DOUBLE)"
            "    - CAST(e.d AS DOUBLE) / e.n)))),"
            " acc -> acc.out) AS km"
        )
    )
    return folded.select(F.explode("km").alias("e")).select(
        F.col("e.t").alias("t_days"),
        F.col("e.d").alias("n_events"),
        F.col("e.n").alias("n_at_risk"),
        F.col("e.surv").alias("survival"),
    )


def lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve in deciles over customer revenue (the plot behind
    gini_customer_revenue): each decile's exact revenue share and the
    cumulative share — "the top decile holds X% of revenue".

    Exact integer cents throughout; each share divides two exact
    BIGINTs once (round 6dp). One fact-scale groupBy, then the decile
    cut via distributed global_rank + the exact ANSI ntile formula
    (customer-grain rows are fact-scale at the 100 TB SF — no
    unpartitioned window). The two windows AFTER the decile groupBy
    run over 10 rows. Exact oracle."""
    from pyspark.sql import Window

    from flapi_spark.operators.scale import global_rank, ntile_band

    orders = load_table(spark, sf_dir, "orders")
    pc = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).alias(
            "cents"
        )
    )
    # materialize the rollup ONCE — the count and the four frozen-bin
    # passes all read the same blocks
    pc = pc.localCheckpoint(eager=True)
    n = pc.count()
    dec = global_rank(pc, ["cents", "o_custkey"], "__r").withColumn(
        "decile", ntile_band(F.col("__r"), F.lit(n), 10)
    )
    per = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("cents"),
    )
    wall = Window.partitionBy()
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per.withColumn("total", F.sum("cents").over(wall))
        .withColumn("cum", F.sum("cents").over(wcum))
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("n_customers").cast("long").alias("n_customers"),
            F.round(
                F.col("cents").cast("double") / F.col("total"), 6
            ).alias("share"),
            F.round(
                F.col("cum").cast("double") / F.col("total"), 6
            ).alias("cum_share"),
        )
    )


def welch_ttest_segments(
    spark: SparkSession, sf_dir: str,
    seg_a: str = "BUILDING", seg_b: str = "MACHINERY",
) -> DataFrame:
    """Welch's unequal-variance t-test between two customer segments'
    order values — the A/B-significance primitive (does segment A
    spend differently from B?).

    Group moments (n, Σx, Σx²) accumulate as exact integers (cents;
    squares in DECIMAL(38,0)/HUGEINT); mean, variance, t and the
    Welch–Satterthwaite df are mirrored double expressions over those
    exact sums (int→double single-rounded in both engines), rounded
    6dp. One broadcast-dim scan, a 2-row aggregate. Exact oracle."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).where(F.col("c_mktsegment").isin(seg_a, seg_b))
    x = F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
    stats = j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.expr(
            "sum(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)"
            " AS DECIMAL(38,0))"
            " * CAST(floor(o_totalprice * 100) AS BIGINT))"
        ).alias("sxx"),
    )
    a = stats.where(F.col("c_mktsegment") == seg_a).select(
        F.col("n").alias("na"), F.col("sx").alias("sxa"),
        F.col("sxx").alias("sxxa"),
    )
    b = stats.where(F.col("c_mktsegment") == seg_b).select(
        F.col("n").alias("nb"), F.col("sx").alias("sxb"),
        F.col("sxx").alias("sxxb"),
    )
    t = a.crossJoin(b)
    mean_a = F.col("sxa").cast("double") / F.col("na")
    mean_b = F.col("sxb").cast("double") / F.col("nb")
    var_a = (
        F.col("sxxa").cast("double")
        - F.col("sxa").cast("double") * F.col("sxa") / F.col("na")
    ) / (F.col("na") - 1)
    var_b = (
        F.col("sxxb").cast("double")
        - F.col("sxb").cast("double") * F.col("sxb") / F.col("nb")
    ) / (F.col("nb") - 1)
    se2 = var_a / F.col("na") + var_b / F.col("nb")
    tstat = (mean_a - mean_b) / F.sqrt(se2)
    dfw = (se2 * se2) / (
        (var_a / F.col("na")) * (var_a / F.col("na")) / (F.col("na") - 1)
        + (var_b / F.col("nb")) * (var_b / F.col("nb")) / (F.col("nb") - 1)
    )
    return t.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(mean_a / 100, 6).alias("mean_a"),
        F.round(mean_b / 100, 6).alias("mean_b"),
        F.round(tstat, 6).alias("t_stat"),
        F.round(dfw, 6).alias("welch_df"),
    )


def ols_quantity_on_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand ordinary-least-squares regression of quantity on unit
    price — the demand-curve primitive (a negative slope = price
    sensitivity). slope/intercept/R² derive from the classic
    closed-form moments (n, Σx, Σy, Σxy, Σx², Σy²), ALL accumulated
    as exact integers (price in cents; squares in DECIMAL(38,0)/
    HUGEINT), so the aggregation is order-independent; only the final
    formulas run in mirrored doubles (int→double single-rounded in
    both engines), rounded 6dp. One unhinted part-dim join (AQE
    broadcasts while measured-small) + one groupBy(brand). Exact
    oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(part, li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.expr(
            "CAST(floor(l_extendedprice / l_quantity * 100) AS BIGINT)"
        ).alias("x"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("y"),
    )
    big = lambda c: f"CAST({c} AS DECIMAL(38,0))"
    stats = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.expr(f"sum({big('x')} * y)").alias("sxy"),
        F.expr(f"sum({big('x')} * x)").alias("sxx"),
        F.expr(f"sum({big('y')} * y)").alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    intercept = (sy - cov_n / var_x * sx) / n
    r2 = (cov_n * cov_n) / (var_x * var_y)
    return stats.select(
        "p_brand",
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def session_path_trigrams(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """Sequence mining over sessionized events: the top-k ordered
    event-type TRIGRAMS inside sessions (the path-analysis readout —
    "view→view→purchase happens N times") built on the same gap
    sessionization as events_sessionize.

    One user-keyed window pass assigns sessions; two leads per row
    form trigrams without materializing per-session arrays (codegen,
    no explode of collected lists); one tiny groupBy counts paths.
    Deterministic (ts, event_id) ordering; exact oracle."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000  # exact integral microseconds (NTZ)
    s = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "ns",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
                > F.lit(gap_us)
            ),
            1,
        ).otherwise(0),
    ).withColumn(
        "session_no",
        F.sum("ns").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_no").orderBy(
        "ts", "event_id"
    )
    tri = s.select(
        "event_type",
        F.lead("event_type", 1).over(ws).alias("e2"),
        F.lead("event_type", 2).over(ws).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    # top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    # heap of k) — the trigram vocabulary grows with the corpus, so a
    # global row_number window over it would be a single-task sort;
    # rnk re-derives over the k survivors only
    wr = Window.orderBy(F.desc("n"), F.asc("path"))
    return (
        tri.select(
            F.concat_ws(
                ">", F.col("event_type"), F.col("e2"), F.col("e3")
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(k)
        .select(
            "path",
            F.col("n").cast("long").alias("n"),
            F.row_number().over(wr).cast("long").alias("rnk"),
        )
    )


def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A
    = the head covering 80% of cumulative revenue, B to 95%, C the
    tail — the warehouse-prioritization classic.

    Revenue per part in exact integer units (cents via the decimal
    revenue expression ×100); cumulative shares divide two exact
    BIGINTs per row. One fact-scale groupBy, then the descending
    cumulative sum via the DISTRIBUTED global_ordered_prefix
    (scale.py) on a negated sort key — part-grain is fact-scale at
    the 100 TB SF, so an unpartitioned window would be a single-task
    sort; the grand total is a one-row scalar collect. Exact
    oracle."""
    from flapi_spark.operators.scale import global_ordered_prefix

    li = load_table(spark, sf_dir, "lineitem")
    # revenue has decimal scale 4 (price scale 2 x discount scale 2);
    # x10000 clears the scale EXACTLY — x100 would leave a fractional
    # part where Spark's cast truncates and DuckDB's rounds
    per_part = li.groupBy("l_partkey").agg(
        F.expr(
            "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000"
            " AS BIGINT)"
        ).alias("units")
    )
    # partkey-grain rollup read by the total collect AND the four
    # frozen-bin passes — materialize once
    per_part = per_part.localCheckpoint(eager=True)
    total = per_part.agg(F.sum("units")).collect()[0][0] or 0
    t = global_ordered_prefix(
        per_part.withColumn("__neg", -F.col("units")),
        ["__neg", "l_partkey"],
        rank_col="__r",
        sum_col="units",
        prefix_col="cum",
    ).withColumn("total", F.lit(total).cast("long"))
    share = F.col("cum").cast("double") / F.col("total")
    cls = (
        F.when(share <= 0.80, F.lit("A"))
        .when(share <= 0.95, F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return (
        t.withColumn("abc", cls)
        .groupBy("abc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("units").cast("long").alias("units"),
            F.round(
                F.sum("units").cast("double") / F.max("total"), 6
            ).alias("revenue_share"),
        )
    )


def psi_order_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift check between the early and
    late halves of the order stream — the ML-ops monitor for "has the
    value distribution shifted since the reference period?" (PSI >
    0.2 = significant drift).

    Reference bins: the early period's value deciles, with EXACT
    integer-cents boundaries (max cents per ntile bucket — no float
    interpolation). Both periods then bucket by pure integer
    comparisons; per-bin PSI contribution (p−q)·ln(p/q) runs in
    mirrored doubles (one ln per bin over identical inputs), rounded
    6dp. Exact oracle."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    med = "1995-06-17"
    base = orders.select(
        "o_orderkey",
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
        (F.col("o_orderdate") < F.lit(med).cast("timestamp")).alias(
            "is_ref"
        ),
    )
    ref = base.where("is_ref")
    # Reference deciles WITHOUT the naive ntile(10) global window (an
    # unpartitioned window over the reference half of orders is a
    # single-task sort — the 100×-scale killer). The boundary of
    # decile d is just the cents value at global rank
    # R_d = d*(n div 10) + min(d, n mod 10) under the unique
    # (cents, o_orderkey) order — ties alone would split
    # partition-order-nondeterministically across engines/runs. So:
    # distributed rank (scale.global_rank: range-repartition +
    # per-partition row_number + broadcast offsets), then filter the 9
    # cut ranks and collect 9 rows. Boundaries are bit-identical to
    # the ntile formulation, so the oracle (which may keep using
    # ntile) stays green.
    from flapi_spark.operators.scale import global_rank

    n_ref = ref.count()  # footer-metadata scalar
    small, rem = divmod(n_ref, 10)
    cut_ranks = [d * small + min(d, rem) for d in range(1, 10)]
    ranked = global_rank(
        ref.select("cents", "o_orderkey"), ["cents", "o_orderkey"]
    )
    cuts = (
        ranked.where(F.col("__rank").isin(cut_ranks))
        .orderBy("__rank")
        .select("cents")
        .collect()
    )
    b = [r.cents for r in cuts]
    bin_expr = "CASE"
    for i, hi in enumerate(b, start=1):
        bin_expr += f" WHEN cents <= {hi} THEN {i}"
    bin_expr += f" ELSE {len(b) + 1} END"
    binned = base.withColumn("bin", F.expr(bin_expr))
    agg = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("n_cur"),
    )
    wall = Window.partitionBy()
    t = agg.withColumn("tr", F.sum("n_ref").over(wall)).withColumn(
        "tc", F.sum("n_cur").over(wall)
    )
    p = F.col("n_ref").cast("double") / F.col("tr")
    q = F.col("n_cur").cast("double") / F.col("tc")
    contrib = F.round((p - q) * F.log(p / q), 6)
    return t.select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round(p, 6).alias("p_ref"),
        F.round(q, 6).alias("p_cur"),
        contrib.alias("psi_contrib"),
    )


def ma_crossover_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average crossover detection over daily revenue: days
    where the 7-day mean crosses the 28-day mean (golden/death cross
    — the trend-change signal of technical analysis, equally the
    alerting rule of an ops dashboard).

    Day-number RANGE frames (calendar-aware like rolling_revenue_7d)
    over exact integer cents; each mean is ONE division of exact
    sums; the crossing test compares identically-computed doubles, so
    the signal days are engine-exact. Emits only crossing days with
    both means (6dp). Exact oracle."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(
        F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).alias(
            "cents"
        )
    ).withColumn(
        "dn", F.datediff("day", F.lit("1992-01-01").cast("date"))
    )
    w7 = Window.orderBy("dn").rangeBetween(-6, 0)
    w28 = Window.orderBy("dn").rangeBetween(-27, 0)
    t = (
        daily.withColumn("s7", F.sum("cents").over(w7))
        .withColumn("n7", F.count(F.lit(1)).over(w7))
        .withColumn("s28", F.sum("cents").over(w28))
        .withColumn("n28", F.count(F.lit(1)).over(w28))
    )
    ma7 = F.col("s7").cast("double") / F.col("n7")
    ma28 = F.col("s28").cast("double") / F.col("n28")
    t = t.withColumn("above", (ma7 > ma28).cast("int"))
    wl = Window.orderBy("dn")
    t = t.withColumn("prev_above", F.lag("above").over(wl))
    sig = F.when(
        F.col("prev_above").isNotNull() & (F.col("above") != F.col("prev_above")),
        F.when(F.col("above") == 1, F.lit("golden")).otherwise(F.lit("death")),
    )
    return (
        t.withColumn("signal", sig)
        .where(F.col("signal").isNotNull())
        .select(
            "day",
            "signal",
            F.round(ma7 / 100, 6).alias("ma7"),
            F.round(ma28 / 100, 6).alias("ma28"),
        )
    )


def new_vs_returning_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition-mix series: per month, orders from first-time vs
    returning customers and the new-order share — the growth
    dashboard's acquisition/retention split (cohort_retention's
    month-grain sibling).

    One fact-scale window (first order date per customer, shared
    customer-key exchange) + one month-grain groupBy; the share
    divides exact BIGINTs once (6dp). Exact oracle."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    t = orders.withColumn("first_dt", F.min("o_orderdate").over(w)).select(
        F.date_trunc("month", "o_orderdate").alias("month"),
        (F.col("o_orderdate") == F.col("first_dt")).alias("is_new"),
    )
    return (
        t.groupBy("month")
        .agg(
            F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias("n_new"),
            F.sum(F.when(~F.col("is_new"), 1).otherwise(0)).alias(
                "n_returning"
            ),
        )
        .select(
            "month",
            F.col("n_new").cast("long").alias("n_new"),
            F.col("n_returning").cast("long").alias("n_returning"),
            F.round(
                F.col("n_new").cast("double")
                / (F.col("n_new") + F.col("n_returning")),
                6,
            ).alias("new_share"),
        )
    )


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over daily revenue: the cumulative
    sum of deviations from the global mean pinpoints where the level
    shifted (the argmax-|CUSUM| day is the classic single-changepoint
    estimate; Page 1954).

    Fully EXACT integer arithmetic: deviation is scaled by the day
    count (cents_i·N − total, avoiding the fractional mean entirely),
    so the CUSUM series is a BIGINT running sum — no float drift
    anywhere. Output: per-day scaled CUSUM + the changepoint flag.
    Exact oracle."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).alias(
            "cents"
        )
    )
    wall = Window.partitionBy()
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    t = (
        daily.withColumn("nn", F.count(F.lit(1)).over(wall))
        .withColumn("total", F.sum("cents").over(wall))
        .withColumn(
            "cusum",
            F.sum(
                F.col("cents") * F.col("nn") - F.col("total")
            ).over(wc),
        )
    )
    wmax = Window.partitionBy()
    return (
        t.withColumn("max_abs", F.max(F.abs("cusum")).over(wmax))
        .select(
            "day",
            F.col("cents").cast("long").alias("cents"),
            F.col("cusum").cast("long").alias("cusum_scaled"),
            (F.abs("cusum") == F.col("max_abs")).alias("is_changepoint"),
        )
    )


def holt_linear_daily_revenue(
    spark: SparkSession, sf_dir: str, alpha: float = 0.3, beta: float = 0.1
) -> DataFrame:
    """Holt's linear (double-exponential) smoothing over daily revenue
    — level + trend, the forecasting step beyond the EWMA and
    seasonal-naive baselines:

        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    Event-scale work is one groupBy(day); the inherently sequential
    recursion folds over the tiny daily array in order, and the DuckDB
    oracle's recursive CTE replays the identical IEEE sequence
    (bit-exact, the ewma pattern with a two-component state).
    Initialization: l_2 = x_2, b_2 = x_2 − x_1 (emitting from t=3)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
        ).alias("x")
    )
    w = Window.orderBy("day")
    rn = daily.withColumn("rn", F.row_number().over(w))
    a, b = float(alpha), float(beta)
    folded = rn.select(
        F.expr(
            "aggregate("
            " slice(array_sort(collect_list(struct(rn, day, x))), 3,"
            "  size(collect_list(struct(rn, day, x)))),"
            " named_struct("
            "  'l', element_at(array_sort(collect_list(struct(rn, day, x))), 2).x,"
            "  'b', element_at(array_sort(collect_list(struct(rn, day, x))), 2).x"
            "   - element_at(array_sort(collect_list(struct(rn, day, x))), 1).x,"
            "  'out', CAST(array() AS ARRAY<STRUCT<day: DATE, x: DOUBLE,"
            "   level: DOUBLE, trend: DOUBLE>>)),"
            f" (acc, e) -> named_struct("
            f"  'l', CAST({a} AS DOUBLE) * e.x"
            f"   + CAST({1 - a} AS DOUBLE) * (acc.l + acc.b),"
            f"  'b', CAST({b} AS DOUBLE) * ((CAST({a} AS DOUBLE) * e.x"
            f"   + CAST({1 - a} AS DOUBLE) * (acc.l + acc.b)) - acc.l)"
            f"   + CAST({1 - b} AS DOUBLE) * acc.b,"
            "  'out', array_append(acc.out, named_struct("
            "   'day', e.day, 'x', e.x,"
            f"   'level', CAST({a} AS DOUBLE) * e.x"
            f"    + CAST({1 - a} AS DOUBLE) * (acc.l + acc.b),"
            f"   'trend', CAST({b} AS DOUBLE) * ((CAST({a} AS DOUBLE) * e.x"
            f"    + CAST({1 - a} AS DOUBLE) * (acc.l + acc.b)) - acc.l)"
            f"    + CAST({1 - b} AS DOUBLE) * acc.b))),"
            " acc -> acc.out) AS hw"
        )
    )
    return folded.select(F.explode("hw").alias("e")).select(
        F.col("e.day").alias("day"),
        F.col("e.x").alias("revenue"),
        F.col("e.level").alias("level"),
        F.col("e.trend").alias("trend"),
    )


def funnel_conversion_steps(
    spark: SparkSession, sf_dir: str, steps: list[str] | None = None
) -> DataFrame:
    """funnel_conversion generalized to an arbitrary ordered step
    list: first occurrence of step i strictly after the user's first
    occurrence of step i-1, any depth — the parameterized form an
    endpoint exposes (steps from a validated enum param).

    Same scale shape as the 3-step original: one user-keyed
    min-aggregate chain of co-partitioned joins, one tiny stack()
    unpivot. The default step list reproduces funnel_conversion
    exactly (test-asserted)."""
    steps = steps or ["view", "click", "purchase"]
    ev = load_table(spark, sf_dir, "events")
    prev = None
    counts = []
    for step in steps:
        cur = ev.where(F.col("event_type") == step)
        if prev is None:
            cur = cur.groupBy("user_id").agg(F.min("ts").alias("step_ts"))
        else:
            cur = (
                cur.join(prev.select("user_id", "step_ts"), "user_id")
                .where(F.col("ts") > F.col("step_ts"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("step_ts"))
            )
        counts.append(cur.agg(F.count(F.lit(1)).alias("n")))
        prev = cur
    row = counts[0].select(F.col("n").alias("n0"))
    for i, c in enumerate(counts[1:], start=1):
        row = row.crossJoin(c.select(F.col("n").alias(f"n{i}")))
    stack_args = ", ".join(
        f"'{i + 1}_{s}', n{i}" for i, s in enumerate(steps)
    )
    un = row.selectExpr(
        f"stack({len(steps)}, {stack_args}) as (stage, n_users)", "n0"
    )
    return un.select(
        "stage",
        F.col("n_users").cast("long").alias("n_users"),
        (
            F.col("n_users").cast("double") / F.col("n0").cast("double")
        ).alias("conv_from_start"),
    )


def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value curves by acquisition cohort: for each
    signup-quarter cohort (first order) and quarter offset, the
    cumulative revenue per cohort member — the money-weighted sibling
    of cohort_retention ("how much has the 1994-Q1 cohort spent by
    quarter 4 of its life?").

    Exact integer cents end to end (cumulative window sum of BIGINTs);
    the per-member normalization divides two exact integers per row
    (6dp). Quarter arithmetic is integral (year*4 + quarter). One
    fact-scale window for cohort assignment (customer-key exchange),
    one (cohort, offset) groupBy, one cohort-partitioned cumsum over
    the tiny curve grid. Exact oracle."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    t = orders.withColumn("first_dt", F.min("o_orderdate").over(w)).select(
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
        (F.year("first_dt") * 4 + F.quarter("first_dt") - 1).alias("cq"),
        (F.year("o_orderdate") * 4 + F.quarter("o_orderdate") - 1).alias(
            "oq"
        ),
    )
    cohort_size = (
        t.select("o_custkey", "cq")
        .distinct()
        .groupBy("cq")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )
    per = t.groupBy("cq", (F.col("oq") - F.col("cq")).alias("offset_q")).agg(
        F.sum("cents").alias("cents")
    )
    wc = Window.partitionBy("cq").orderBy("offset_q").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per.withColumn("cum_cents", F.sum("cents").over(wc))
        .join(cohort_size, "cq")
        .select(
            F.col("cq").cast("long").alias("cohort_quarter"),
            F.col("offset_q").cast("long").alias("offset_q"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("cum_cents").cast("long").alias("cum_cents"),
            F.round(
                F.col("cum_cents").cast("double")
                / (F.col("n_members") * 100),
                6,
            ).alias("ltv_per_member"),
        )
    )


def revenue_growth_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth — the
    dashboard staple ("up 3.2% MoM, 12% YoY"). Monthly sums in exact
    integer cents; each growth rate is ONE division of exact integers
    (lag windows over the month grid), rounded 6dp. The YoY lag is 12
    month-grain rows. Exact oracle."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).alias(
            "cents"
        )
    )
    w = Window.orderBy("month")
    t = monthly.withColumn("prev_m", F.lag("cents", 1).over(w)).withColumn(
        "prev_y", F.lag("cents", 12).over(w)
    )
    mom = F.when(
        F.col("prev_m").isNotNull(),
        F.round(
            (F.col("cents") - F.col("prev_m")).cast("double")
            / F.col("prev_m"),
            6,
        ),
    )
    yoy = F.when(
        F.col("prev_y").isNotNull(),
        F.round(
            (F.col("cents") - F.col("prev_y")).cast("double")
            / F.col("prev_y"),
            6,
        ),
    )
    return t.select(
        "month",
        F.col("cents").cast("long").alias("cents"),
        mom.alias("mom_growth"),
        yoy.alias("yoy_growth"),
    )


def order_to_ship_latency_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order→ship latency percentiles per priority class — the
    logistics SLA readout (does URGENT actually ship faster?).
    Latencies are exact integer days (datediff through the orders ⋈
    lineitem join); p50/p90 interpolate identically in Spark's
    percentile() and DuckDB's quantile_cont (the proven pairing).
    One fact join shuffling on orderkey + a 5-row aggregate."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("lat_d"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.percentile("lat_d", 0.5).alias("p50_days"),
        F.percentile("lat_d", 0.9).alias("p90_days"),
        F.min("lat_d").cast("long").alias("min_days"),
        F.max("lat_d").cast("long").alias("max_days"),
    )


def events_weekday_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap grid: event counts per (weekday, hour) — the
    "when are users active" dashboard tile. Weekday comes from pure
    integer day arithmetic anchored on a known Monday (0=Monday;
    Spark's dayofweek() and DuckDB's disagree on week start, integer
    modulo doesn't). One tiny groupBy; exact oracle."""
    ev = load_table(spark, sf_dir, "events")
    dow = F.pmod(
        F.datediff(F.to_date("ts"), F.lit("1970-01-05").cast("date")),
        F.lit(7),
    )
    return (
        ev.select(
            dow.cast("long").alias("weekday"),
            F.hour("ts").cast("long").alias("hour"),
            "value",
        )
        .groupBy("weekday", "hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.expr("CAST(floor(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("value_cents"),
        )
    )


def k_anonymity_orders(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """k-anonymity risk measurement over the orders quasi-identifier
    (priority, status, order year): per equivalence class its size and
    whether it violates k — the privacy check a governance layer runs
    BEFORE an endpoint may serve row-level data (classes smaller than
    k re-identify; the masking policies in shape_df are the remedy).

    One groupBy on the quasi-identifier; the violation share derives
    from exact integers. Exact oracle."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cls = orders.groupBy(
        "o_orderpriority",
        "o_orderstatus",
        F.year("o_orderdate").cast("long").alias("o_year"),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    wall = Window.partitionBy()
    return (
        cls.withColumn("total", F.sum("class_size").over(wall))
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "o_year",
            F.col("class_size").cast("long").alias("class_size"),
            (F.col("class_size") < k).alias("violates_k"),
            F.round(
                F.col("class_size").cast("double") / F.col("total"), 6
            ).alias("class_share"),
        )
    )


def bootstrap_ci_order_value(
    spark: SparkSession, sf_dir: str, n_boot: int = 200, m: int = 1000
) -> DataFrame:
    """Deterministic m-out-of-n bootstrap confidence interval for the
    mean order value (Efron 1979; m-out-of-n: Bickel et al. 1997) —
    the uncertainty quantification a report layer attaches to point
    estimates. Everything that is random in a textbook bootstrap is
    replayable here: resample draws are portable md5 hashes of
    (replicate, draw) coordinates mapped onto an exact global row
    numbering of the orders (scale.global_rank — never a single-task
    window), so any engine reproduces the same B resample means and
    the same percentile interval (order statistics at the exact
    0.025/0.975 positions with integer index arithmetic).

    Scale shape: the resample frame is B*m rows (bounded by
    configuration, not data) equi-joined to the ranked corpus; per-
    replicate means are DECIMAL-exact; the final order-statistic
    window sees exactly B rows. Exact oracle."""
    from pyspark.sql import Window

    from flapi_spark.operators.scale import global_rank

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").alias("v")
    )
    ranked = global_rank(orders, ["o_orderkey"], rank_col="pos")
    n = orders.count()  # one bounded scalar (the modulus)
    sel = (
        spark.range(1, n_boot + 1)
        .toDF("b")
        .select(
            "b", F.explode(F.expr(f"sequence(1, {m})")).alias("i")
        )
        .select(
            "b",
            (
                F.lit(1)
                + F.expr(
                    "cast(conv(substr(md5(concat(cast(b as string), '_',"
                    " cast(i as string))), 1, 15), 16, 10) as bigint)"
                )
                % F.lit(n)
            ).alias("pos"),
        )
    )
    means = (
        sel.join(ranked.select("pos", "v"), "pos")
        .groupBy("b")
        .agg(F.sum("v").alias("s"))
        .select("b", (F.col("s").cast("double") / m).alias("mean_b"))
    )
    # exact percentile positions: 1-based order statistics at
    # floor(q * (B - 1)) + 1 with integer arithmetic
    k_lo = (25 * (n_boot - 1)) // 1000 + 1
    k_hi = (975 * (n_boot - 1)) // 1000 + 1
    w = Window.orderBy("mean_b", "b")  # exactly B rows
    ci = (
        means.select("mean_b", F.row_number().over(w).alias("r"))
        .agg(
            F.max(F.when(F.col("r") == k_lo, F.col("mean_b"))).alias(
                "ci_lo"
            ),
            F.max(F.when(F.col("r") == k_hi, F.col("mean_b"))).alias(
                "ci_hi"
            ),
        )
    )
    full = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias(
            "mean_value"
        ),
    )
    return full.crossJoin(F.broadcast(ci)).select(
        "n",
        F.lit(m).cast("long").alias("m"),
        F.lit(n_boot).cast("long").alias("n_boot"),
        F.round("mean_value", 6).alias("mean_value"),
        F.round("ci_lo", 6).alias("ci_lo"),
        F.round("ci_hi", 6).alias("ci_hi"),
    )


def mann_whitney_order_value(
    spark: SparkSession, sf_dir: str,
    seg_a: str = "AUTOMOBILE", seg_b: str = "BUILDING",
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) for order value between two
    customer segments — the rank-based two-sample test completing the
    inference trio (Welch parametric, randomization Monte-Carlo,
    Mann-Whitney rank): robust to outliers and any monotone transform
    of the values.

    Exactness: ranks stay INTEGER throughout — tied values get the
    average rank carried as 2·rank = 2·cum_before + count + 1 (always
    integral), summed as BIGINTs, so U is exact in half-units on any
    engine; the tie-corrected normal approximation z is the only
    double (rounded to 6). Distributed shape: one value-grain
    aggregate, scale.global_ordered_prefix for the cumulative counts
    (never a single-task window), two scalar rollups."""
    from flapi_spark.operators.scale import global_ordered_prefix

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    rows = (
        orders.join(cust, "o_custkey")
        .where(F.col("c_mktsegment").isin(seg_a, seg_b))
        .select(
            F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
            (F.col("c_mktsegment") == seg_a).alias("in_a"),
        )
    )
    vals = rows.groupBy("v").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.col("in_a").cast("long")).alias("ca"),
    )
    ord_ = global_ordered_prefix(
        vals, ["v"], rank_col="__r", sum_col="c", prefix_col="cum",
        checkpoint_input=True,  # value-grain rollup behind a join
    )
    # prefix is INCLUSIVE of the current value's count
    two_rank = 2 * (F.col("cum") - F.col("c")) + F.col("c") + 1
    agg = ord_.agg(
        F.sum(F.col("ca") * two_rank).alias("r2a"),
        F.sum(F.col("ca")).alias("na"),
        F.sum(F.col("c")).alias("n"),
        F.sum(
            F.col("c").cast("long") * F.col("c") * F.col("c")
            - F.col("c")
        ).alias("tsum"),
    )
    na, nb = F.col("na").cast("double"), (
        F.col("n") - F.col("na")
    ).cast("double")
    n = F.col("n").cast("double")
    u_a = F.col("r2a").cast("double") / 2 - na * (na + 1) / 2
    mu = na * nb / 2
    var = (
        na * nb / 12
        * ((n + 1) - F.col("tsum").cast("double") / (n * (n - 1)))
    )
    z = (u_a - mu) / F.sqrt(var)
    return agg.select(
        F.col("na").cast("long").alias("n_a"),
        (F.col("n") - F.col("na")).cast("long").alias("n_b"),
        u_a.alias("u_a"),
        (na * nb - u_a).alias("u_b"),
        F.round(z, 6).alias("z_score"),
    )


def randomization_test_order_value(
    spark: SparkSession, sf_dir: str, n_perm: int = 200,
    seg_a: str = "AUTOMOBILE", seg_b: str = "BUILDING",
) -> DataFrame:
    """Deterministic randomization test (Fisher 1935 shape; the
    relabeling Monte-Carlo variant) for the difference in mean order
    value between two customer segments — the non-parametric sibling
    of welch_ttest_segments: no normality assumption, the null
    distribution comes from the data itself. Every "random" relabel
    is a portable md5 coin over (permutation, order key), so the null
    distribution, the exceedance count, and the p-value
    (1 + #{|diff_p| ≥ |observed|}) / (P + 1) are engine-reproducible
    and exactly DuckDB-checkable.

    Relabeling approximation: each row's side is an independent
    Bernoulli(na/nt) md5 coin, NOT a draw of fixed group sizes — the
    binomial-relabel variant of the permutation test (group sizes
    vary slightly per permutation; asymptotically equivalent, and
    what keeps the relabel a stateless per-row projection at scale).
    A degenerate permutation whose coin leaves one side EMPTY has a
    NULL mean difference and is counted as an exceedance
    (conservative; see the n_ge aggregate).

    Scale shape: one explode to P coins per row (P
    configuration-bounded), one (perm, side) grouped aggregate with
    map-side combine; per-permutation means are DECIMAL-exact and the
    final exceedance sum compares identically-derived doubles."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    rows = (
        orders.join(cust, "o_custkey")
        .where(F.col("c_mktsegment").isin(seg_a, seg_b))
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
            (F.col("c_mktsegment") == seg_a).alias("in_a"),
        )
    )
    sizes = rows.agg(
        F.sum(F.col("in_a").cast("long")).alias("na"),
        F.count(F.lit(1)).alias("nt"),
    ).first()
    na, nt = int(sizes.na), int(sizes.nt)  # two bounded scalars
    mean = lambda s, c: s.cast("double") / c  # noqa: E731
    obs = rows.agg(
        (
            mean(F.sum(F.when(F.col("in_a"), F.col("v"))),
                 F.sum(F.col("in_a").cast("long")))
            - mean(F.sum(F.when(~F.col("in_a"), F.col("v"))),
                   F.sum((~F.col("in_a")).cast("long")))
        ).alias("obs_diff")
    )
    coin = (
        F.expr(
            "cast(conv(substr(md5(concat(cast(p as string), '_',"
            " cast(o_orderkey as string))), 1, 15), 16, 10) as bigint)"
        )
        % F.lit(nt)
        < F.lit(na)
    )
    perms = (
        rows.select(
            "o_orderkey", "v",
            F.explode(F.expr(f"sequence(1, {n_perm})")).alias("p"),
        )
        .select("p", "v", coin.alias("side_a"))
        .groupBy("p")
        .agg(
            F.sum(F.when(F.col("side_a"), F.col("v"))).alias("sa"),
            F.sum(F.col("side_a").cast("long")).alias("ca"),
            F.sum(F.when(~F.col("side_a"), F.col("v"))).alias("sb"),
            F.sum((~F.col("side_a")).cast("long")).alias("cb"),
        )
        .select(
            (mean(F.col("sa"), F.col("ca"))
             - mean(F.col("sb"), F.col("cb"))).alias("diff_p")
        )
    )
    # a degenerate permutation (one side empty -> NULL mean) counts
    # as an exceedance: conservative — dropping it would shrink the
    # numerator while n_perm + 1 stays in the denominator, biasing p
    # downward on small inputs (ADVICE r10)
    null_dist = perms.crossJoin(F.broadcast(obs)).agg(
        F.sum(
            F.coalesce(
                F.abs(F.col("diff_p")) >= F.abs(F.col("obs_diff")),
                F.lit(True),
            ).cast("long")
        ).alias("n_ge")
    )
    return (
        obs.crossJoin(F.broadcast(null_dist))
        .select(
            F.lit(na).cast("long").alias("n_a"),
            F.lit(nt - na).cast("long").alias("n_b"),
            F.lit(n_perm).cast("long").alias("n_perm"),
            F.round("obs_diff", 6).alias("obs_diff"),
            F.col("n_ge").cast("long").alias("n_exceed"),
            F.round(
                (F.lit(1) + F.col("n_ge")).cast("double") / (n_perm + 1),
                6,
            ).alias("p_value"),
        )
    )


_MKT_SEGMENTS = (
    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
)


def t_closeness_orders(
    spark: SparkSession, sf_dir: str, t: float = 0.2
) -> DataFrame:
    """t-closeness over the k_anonymity_orders quasi-identifier
    classes with the customer's market segment as the sensitive
    attribute (Li/Li/Venkatasubramanian 2007): a class leaks even when
    l-diverse if its sensitive-value DISTRIBUTION differs from the
    global one (skew attack — 90% one segment in a class vs 20%
    globally updates the attacker's prior). For a categorical
    attribute the Earth Mover's Distance with unit ground distance is
    the total variation distance: emd = 0.5 * Σ|p_class - p_global|.
    Completes the governance quartet: k-anonymity (row linkage),
    l-diversity (attribute count), t-closeness (attribute
    distribution), dp_event_counts (released aggregates).

    Determinism: the five known segments pivot into FIXED conditional
    sums, so the Σ is a left-associated five-term expression chain in
    declared segment order — no aggregation-order float drift; shares
    divide exact integers. One grouped aggregate + one broadcast
    single-row global. Exact oracle."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    rows = orders.join(cust, "o_custkey").select(
        "o_orderpriority",
        "o_orderstatus",
        F.year("o_orderdate").cast("long").alias("o_year"),
        "c_mktsegment",
    )

    def _seg_counts(prefix: str) -> list:
        return [
            F.sum(
                F.when(F.col("c_mktsegment") == s, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias(f"{prefix}{i}")
            for i, s in enumerate(_MKT_SEGMENTS)
        ]

    cls = rows.groupBy(
        "o_orderpriority", "o_orderstatus", "o_year"
    ).agg(F.count(F.lit(1)).alias("class_size"), *_seg_counts("n"))
    glob = rows.agg(F.count(F.lit(1)).alias("total"), *_seg_counts("g"))
    emd = None
    for i in range(len(_MKT_SEGMENTS)):
        term = F.abs(
            F.col(f"n{i}").cast("double") / F.col("class_size")
            - F.col(f"g{i}").cast("double") / F.col("total")
        )
        emd = term if emd is None else emd + term
    return cls.crossJoin(F.broadcast(glob)).select(
        "o_orderpriority",
        "o_orderstatus",
        "o_year",
        F.col("class_size").cast("long").alias("class_size"),
        F.round(F.lit(0.5) * emd, 6).alias("emd_to_global"),
        (F.round(F.lit(0.5) * emd, 6) > t).alias("violates_t"),
    )


def tables_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One verified probe over EVERY source table: per-table row
    counts (the smoke query a deployment health check runs — it
    proves all ten scans resolve and the metadata matches). Count-only
    scans read footers, not data. Exact oracle."""
    from flapi_spark.session import load_table as _lt

    tables = [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]
    parts = []
    for t in tables:
        parts.append(
            _lt(spark, sf_dir, t).agg(
                F.lit(t).alias("table_name"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity per user: Shannon entropy of the
    event-type mix (0 = single-minded, ln(5) ≈ 1.609 = uniform) — the
    engagement-breadth signal segmentation models consume.

    The five known types pivot into fixed conditional-sum columns, so
    the entropy is a LEFT-ASSOCIATED chain of at most five
    −p·ln(p) terms in a deterministic order — a groupBy double-sum
    would accumulate in partition order and diverge across engines.
    Exact integer counts; one ln per present type; 6dp. Exact
    oracle."""
    ev = load_table(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(
            f"n_{t}"
        )
        for t in _EVENT_TYPES
    ]
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_total"), *aggs
    )
    ent = None
    for t in _EVENT_TYPES:
        p = F.col(f"n_{t}").cast("double") / F.col("n_total")
        term = F.when(F.col(f"n_{t}") > 0, -p * F.log(p)).otherwise(
            F.lit(0.0)
        )
        ent = term if ent is None else ent + term
    return per.select(
        "user_id",
        F.col("n_total").cast("long").alias("n_events"),
        *[F.col(f"n_{t}").cast("long").alias(f"n_{t}") for t in _EVENT_TYPES],
        F.round(ent, 6).alias("type_entropy"),
    )


def order_value_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier screen per priority class: counts outside
    [q1 − 1.5·IQR, q3 + 1.5·IQR] — the robust complement to the
    z-score anomaly flags (quartiles don't care about the outliers
    they fence).

    Quartiles interpolate identically (percentile/quantile_cont);
    the fences and comparisons are mirrored doubles over exact
    integer cents. Two passes: a 5-row quartile aggregate broadcast
    back over the fact scan. Exact oracle."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    q = orders.groupBy("o_orderpriority").agg(
        F.percentile("cents", 0.25).alias("q1"),
        F.percentile("cents", 0.75).alias("q3"),
    )
    j = orders.join(F.broadcast(q), "o_orderpriority")
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - 1.5 * iqr
    hi = F.col("q3") + 1.5 * iqr
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.when(F.col("cents") < lo, 1).otherwise(0))
            .cast("long")
            .alias("n_low_outliers"),
            F.sum(F.when(F.col("cents") > hi, 1).otherwise(0))
            .cast("long")
            .alias("n_high_outliers"),
            F.round(F.max("q1") / 100, 6).alias("q1"),
            F.round(F.max("q3") / 100, 6).alias("q3"),
        )
    )


def dim_profile_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling for the part dimension — the data-discovery
    pass (distinct counts, null counts, min/max rendered as strings)
    a catalog UI shows before anyone writes a query. One row per
    column, ALL columns profiled in a single scan (conditional
    aggregates, no per-column jobs). Exact oracle."""
    part = load_table(spark, sf_dir, "part")
    cols = part.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count_distinct(F.col(c)).alias(f"d_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"n_{c}"
            ),
            F.min(F.col(c).cast("string")).alias(f"mn_{c}"),
            F.max(F.col(c).cast("string")).alias(f"mx_{c}"),
        ]
    one = part.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    stack_args = ", ".join(
        f"'{c}', d_{c}, n_{c}, mn_{c}, mx_{c}" for c in cols
    )
    return one.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack_args})"
        " as (column_name, n_distinct, n_nulls, min_str, max_str)",
    ).select(
        "column_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        "min_str",
        "max_str",
    )


def events_error_rate_sla(
    spark: SparkSession, sf_dir: str, threshold_pct: int = 5
) -> DataFrame:
    """Operational SLA series: per hour, the error-event share and a
    breach flag (> threshold%) — the alerting rule an on-call
    dashboard evaluates. The share compares exact integers scaled by
    100·denominator (no float in the breach decision); the rendered
    rate divides once (6dp). One tiny groupBy. Exact oracle."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_errors"),
    )
    return t.select(
        "bucket",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_errors").cast("long").alias("n_errors"),
        F.round(
            F.col("n_errors").cast("double") / F.col("n_events"), 6
        ).alias("error_rate"),
        # integer comparison: errors*100 > threshold*events avoids any
        # float in the breach decision
        (
            F.col("n_errors") * 100 > F.lit(threshold_pct) * F.col("n_events")
        ).alias("sla_breach"),
    )


def mau_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-engagement staple: per month, monthly active users,
    average daily active users, and stickiness (avg DAU / MAU) — the
    ratio product teams track weekly. Distinct-user counts are exact;
    avg-DAU divides two exact integers (Σ daily distincts / days with
    activity); stickiness divides the two results (mirrored shape,
    6dp). Exact oracle."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.date_trunc("month", "ts").alias("month"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    mau = base.groupBy("month").agg(
        F.count_distinct("user_id").alias("mau")
    )
    dau = (
        base.groupBy("month", "day")
        .agg(F.count_distinct("user_id").alias("dau"))
        .groupBy("month")
        .agg(
            F.sum("dau").alias("dau_sum"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )
    j = mau.join(dau, "month")
    avg_dau = F.col("dau_sum").cast("double") / F.col("n_days")
    return j.select(
        "month",
        F.col("mau").cast("long").alias("mau"),
        F.round(avg_dau, 6).alias("avg_dau"),
        F.round(
            (F.col("dau_sum").cast("double") / F.col("n_days"))
            / F.col("mau"),
            6,
        ).alias("stickiness"),
    )


def events_interarrival_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Inter-arrival time percentiles per event type — the traffic-
    model fit input (is arrival bursty or Poisson-ish?). Gaps are
    exact integral microseconds between consecutive same-type events
    ((ts, event_id)-ordered); p50/p90 interpolate via the proven
    percentile/quantile_cont pairing, rendered in seconds (6dp)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .where(F.col("prev_ts").isNotNull())
        .select(
            "event_type",
            F.expr("timestampdiff(MICROSECOND, prev_ts, ts)").alias(
                "gap_us"
            ),
        )
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.round(F.percentile("gap_us", 0.5) / 1e6, 6).alias("p50_s"),
        F.round(F.percentile("gap_us", 0.9) / 1e6, 6).alias("p90_s"),
        F.round(F.max("gap_us") / 1e6, 6).alias("max_s"),
    )


def customer_concentration_topn(
    spark: SparkSession, sf_dir: str, n: int = 10
) -> DataFrame:
    """Revenue-concentration exec metric: the top-N customers' share
    of total revenue plus each member's own share — "our ten largest
    accounts are 4.1% of revenue". Exact integer cents; each share is
    one division (6dp); deterministic (revenue desc, custkey)
    ranking.

    Scale shape: top-N via orderBy+limit (TakeOrderedAndProject — a
    per-partition heap of N, never a global sort of customer-grain
    rows); the grand total is a one-row scalar collect; the rank and
    top-N-sum windows run over the N survivors only. Exact oracle."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    pc = orders.groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")).alias(
            "cents"
        )
    )
    total = pc.agg(F.sum("cents")).collect()[0][0] or 0
    w = Window.orderBy(F.desc("cents"), F.asc("o_custkey"))
    t = (
        pc.orderBy(F.desc("cents"), F.asc("o_custkey"))
        .limit(n)
        .withColumn("total", F.lit(total).cast("long"))
        .withColumn("rnk", F.row_number().over(w))
    )
    wtop = Window.partitionBy()
    return t.withColumn("top_cents", F.sum("cents").over(wtop)).select(
        F.col("rnk").cast("long").alias("rnk"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("cents").cast("long").alias("cents"),
        F.round(F.col("cents").cast("double") / F.col("total"), 6).alias(
            "share"
        ),
        F.round(
            F.col("top_cents").cast("double") / F.col("total"), 6
        ).alias("topn_share"),
    )


def events_value_boxplot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-number summary (boxplot feed) of event values per type in
    exact integer cents with interpolated quartiles — the
    small-multiples distribution tile beside the heatmap. Exact
    oracle."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_type",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    return t.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("cents").cast("long").alias("min_cents"),
        F.percentile("cents", 0.25).alias("q1_cents"),
        F.percentile("cents", 0.5).alias("median_cents"),
        F.percentile("cents", 0.75).alias("q3_cents"),
        F.max("cents").cast("long").alias("max_cents"),
    )


def order_line_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Basket-size distribution: how many orders have 1, 2, ... line
    items — the order-shape histogram capacity planning and join-fanout
    estimates read. Two exact groupBys (order grain, then count
    grain) with the share per bucket; exact oracle."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    dist = per_order.groupBy("n_lines").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    wall = Window.partitionBy()
    return dist.withColumn("total", F.sum("n_orders").over(wall)).select(
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round(
            F.col("n_orders").cast("double") / F.col("total"), 6
        ).alias("share"),
    )


def region_nation_revenue_shares(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hierarchical drill-down feed (treemap shape): per nation, its
    revenue, its share WITHIN its region, and the region's share of
    the world — the two-level ratio set a drill-down UI binds
    directly. Revenue stays exact decimal through every aggregate;
    the three divisions are mirrored (6dp). Dims broadcast; one fact
    groupBy. Exact oracle."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(l_extendedprice AS DECIMAL(18,2))"
                    " * (1 - CAST(l_discount AS DECIMAL(18,2)))"
                )
            ).alias("rev")
        )
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum("rev").alias("rev"))
    )
    wr = Window.partitionBy("r_name")
    wall = Window.partitionBy()
    t = (
        rev.withColumn("region_rev", F.sum("rev").over(wr))
        .withColumn("world_rev", F.sum("rev").over(wall))
    )
    return t.select(
        "r_name",
        "n_name",
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double") / F.col("region_rev").cast("double"),
            6,
        ).alias("share_in_region"),
        F.round(
            F.col("region_rev").cast("double")
            / F.col("world_rev").cast("double"),
            6,
        ).alias("region_share"),
    )


def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness index per event type: coefficient of variation of
    inter-arrival gaps (CV ≈ 1 ⇒ Poisson-like, > 1 ⇒ bursty) — the
    one-number traffic-shape readout beside the percentile profile.
    Gap moments (n, Σg, Σg²) accumulate as exact integers
    (HUGEINT/DECIMAL(38,0) squares); mean/sd/CV are mirrored double
    formulas over those sums (6dp). Exact oracle."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .where(F.col("prev_ts").isNotNull())
        .select(
            "event_type",
            F.expr("timestampdiff(MICROSECOND, prev_ts, ts)").alias("g"),
        )
    )
    stats = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("g").alias("sg"),
        F.expr(
            "sum(CAST(g AS DECIMAL(38,0)) * CAST(g AS DECIMAL(38,0)))"
        ).alias("sgg"),
    )
    n = F.col("n").cast("double")
    mean = F.col("sg").cast("double") / n
    var = (
        F.col("sgg").cast("double")
        - F.col("sg").cast("double") * F.col("sg") / n
    ) / (F.col("n") - 1)
    return stats.select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.round(mean / 1e6, 6).alias("mean_gap_s"),
        F.round(F.sqrt(var) / 1e6, 6).alias("sd_gap_s"),
        F.round(F.sqrt(var) / mean, 6).alias("cv"),
    )


def repeat_rate_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase rate per customer segment: share of a
    segment's customers placing 2+ orders — the loyalty KPI beside
    the acquisition mix. One order-grain groupBy + broadcast dim;
    exact integers + one division (6dp). Exact oracle."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    per = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    j = per.join(
        cust, per.o_custkey == cust.c_custkey
    )
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0)).alias(
                "n_repeat"
            ),
        )
        .select(
            "c_mktsegment",
            F.col("n_customers").cast("long").alias("n_customers"),
            F.col("n_repeat").cast("long").alias("n_repeat"),
            F.round(
                F.col("n_repeat").cast("double") / F.col("n_customers"), 6
            ).alias("repeat_rate"),
        )
    )


def order_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality index for order volume: each weekday's
    order count against the uniform expectation (index 1.0 = flat) —
    the staffing/capacity planning readout. Integer-anchored weekday
    (the Monday-epoch modulo, engine-neutral); the index is one
    division of exact integers ×7 (6dp). Exact oracle."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    dow = F.pmod(
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-05").cast("date")),
        F.lit(7),
    )
    t = orders.groupBy(dow.cast("long").alias("weekday")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    wall = Window.partitionBy()
    return t.withColumn("total", F.sum("n_orders").over(wall)).select(
        "weekday",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round(
            F.col("n_orders").cast("double") * 7 / F.col("total"), 6
        ).alias("seasonality_index"),
    )


def discount_band_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo-effect analysis: per discount band (whole percent), line
    counts and the average quantity — does a deeper discount move more
    units? Band = floor(discount·100) (exact); average divides exact
    integer sums (6dp). One conditional-free groupBy. Exact oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.expr("CAST(floor(l_discount * 100) AS BIGINT)").alias(
            "discount_pct"
        ),
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty"),
    )
    return (
        t.groupBy("discount_pct")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("qty").alias("qty_sum"),
        )
        .select(
            "discount_pct",
            F.col("n_lines").cast("long").alias("n_lines"),
            F.round(
                F.col("qty_sum").cast("double") / F.col("n_lines"), 6
            ).alias("avg_quantity"),
        )
    )


def tax_burden_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective tax share per brand: Σ(price·tax) / Σ(price) over
    exact DECIMAL products — the pricing-compliance rollup. Both sums
    stay decimal-exact; one mirrored double division (6dp). Unhinted
    part-dim join, one fact groupBy. Exact oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(part, li.l_partkey == part.p_partkey)
    taxed = F.expr(
        "CAST(l_extendedprice AS DECIMAL(18,2))"
        " * CAST(l_tax AS DECIMAL(18,2))"
    )
    base = F.expr("CAST(l_extendedprice AS DECIMAL(18,2))")
    return (
        j.groupBy("p_brand")
        .agg(
            F.sum(taxed).alias("tax_amt"),
            F.sum(base).alias("base_amt"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            "p_brand",
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("tax_amt").cast("double").alias("tax_amount"),
            F.round(
                F.col("tax_amt").cast("double")
                / F.col("base_amt").cast("double"),
                6,
            ).alias("effective_tax_rate"),
        )
    )


def customer_value_trends(
    spark: SparkSession, sf_dir: str, min_orders: int = 5
) -> DataFrame:
    """Per-customer spending trend: an OLS slope of order value (cents)
    over order sequence number for every customer with ≥ min_orders —
    thousands of tiny regressions in ONE groupBy (the churn-risk
    signal: a negative slope is a declining account). x = the order's
    rank in the customer's history (exact, gap-free), so moments stay
    small integers; slope arithmetic mirrors ols_quantity_on_price.
    Exact oracle."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    t = orders.select(
        "o_custkey",
        F.row_number().over(w).cast("long").alias("x"),
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("y"),
    )
    big = "CAST({c} AS DECIMAL(38,0))"
    stats = (
        t.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.expr(f"sum({big.format(c='x')} * y)").alias("sxy"),
            F.expr(f"sum({big.format(c='x')} * x)").alias("sxx"),
        )
        .where(F.col("n") >= min_orders)
    )
    n = F.col("n").cast("double")
    cov_n = n * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy")
    var_x = n * F.col("sxx").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx")
    return stats.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("n").cast("long").alias("n_orders"),
        F.round(cov_n / var_x / 100, 6).alias("slope_per_order"),
        (cov_n < 0).alias("declining"),
    )


def daily_top_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily argmax: each day's largest order (value + customer) with
    its share of the day — the leaderboard tile. One day-partitioned
    rank window with a unique tiebreak; exact cents. Exact oracle."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    t = orders.select(
        F.to_date("o_orderdate").alias("day"),
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("day").orderBy(
        F.desc("cents"), F.asc("o_orderkey")
    )
    wd = Window.partitionBy("day")
    return (
        t.withColumn("rnk", F.row_number().over(w))
        .withColumn("day_cents", F.sum("cents").over(wd))
        .where(F.col("rnk") == 1)
        .select(
            "day",
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.col("o_custkey").cast("long").alias("o_custkey"),
            F.col("cents").cast("long").alias("cents"),
            F.round(
                F.col("cents").cast("double") / F.col("day_cents"), 6
            ).alias("share_of_day"),
        )
    )


def write_postings_index(
    spark: SparkSession,
    docs: DataFrame,
    table: str = "bm25_postings_index",
    buckets: int = 16,
) -> None:
    """Persist the BM25 postings as a BUCKETED warehouse table on tok
    (round 10c — the lexical sibling of the band/IVF/phash index
    family): (tok, doc_id, tf, dl) rows, term-co-located on disk, plus
    a one-row `<table>__stats` sidecar freezing the corpus constants
    (n_docs, total_len). Probes filter tok IN (query terms) against
    the bucketed scan and aggregate df bucket-locally — zero
    index-side exchange per query batch; at 100 TB the corpus
    tokenizes and shuffles into term buckets exactly ONCE at bootstrap
    (plus appends), not per query. dl rides denormalized in the
    posting row (the classic posting-list layout) so scoring needs no
    second doc-length table."""
    from flapi_spark.operators.text import _tokens

    toks = docs.select("doc_id", F.explode(_tokens()).alias("tok"))
    lens = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    (
        lens.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("total_len"),
        )
        .write.mode("overwrite")
        .saveAsTable(f"{table}__stats")
    )
    (
        tf.join(lens, "doc_id")
        .select("tok", "doc_id", "tf", "dl")
        .write.mode("overwrite")
        .bucketBy(buckets, "tok")
        .sortBy("tok")
        .saveAsTable(table)
    )


def bm25_probe_indexed(
    spark: SparkSession,
    query_terms: tuple[str, ...] = BM25_QUERY,
    table: str = "bm25_postings_index",
    k: int = 20,
) -> DataFrame:
    """BM25 top-k served from the persisted postings index: the
    bucketed scan filters tok IN (query terms), df aggregates
    bucket-locally, idf/tfn read the frozen sidecar constants — the
    IDENTICAL arithmetic to the self-contained bm25_search (same fold,
    same 6dp round, same tiebreak), so the indexed twin reuses its
    oracle: the index changes the physical strategy, never the rows
    (bit-equality pytest-pinned)."""
    # (tok, doc_id) dedup via MAX over identical rows: a crash inside
    # the streaming maintainer's marker window can replay one batch's
    # posting rows — duplicated (tok, doc) postings would double-count
    # BM25 parts, so the probe collapses them (bucket-local: the scan
    # is hash-distributed on tok, which satisfies the (tok, doc_id)
    # grouping — no exchange)
    idx = (
        spark.table(table)
        .where(F.col("tok").isin(*query_terms))
        .groupBy("tok", "doc_id")
        .agg(F.max("tf").alias("tf"), F.max("dl").alias("dl"))
    )
    stats = spark.table(f"{table}__stats")
    df_ = idx.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = idx.join(F.broadcast(df_), "tok").crossJoin(
        F.broadcast(stats)
    )
    idf, tfn = bm25_idf_tfn()
    per_doc = (
        scored.select("doc_id", (idf * tfn).alias("part"))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.expr(
                    "aggregate(sort_array(collect_list(part)),"
                    " CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
                ),
                6,
            ).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    topk = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    wr = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.select(
        "doc_id", "score",
        F.col("n_terms_hit").cast("long").alias("n_terms_hit"),
        F.row_number().over(wr).cast("long").alias("rnk"),
    )


def append_postings_index(
    spark: SparkSession,
    new_docs: DataFrame,
    table: str = "bm25_postings_index",
) -> None:
    """Append a document batch to the persisted postings index
    (round 10c): tokenize the NEW docs only, insertInto the bucketed
    postings (bucket spec preserved — appended files land
    term-bucketed), and roll the __stats sidecar forward by the
    batch's additive deltas (n_docs, total_len). Unlike the IVF
    centroid sidecar — which stays FROZEN because cell identity must
    be stable — BM25's corpus constants are meant to track the corpus:
    both are plain sums, so the update is one tiny read + overwrite,
    and an appended index equals a from-scratch rebuild exactly
    (per-doc posting rows are independent; stats are additive —
    pytest-pinned)."""
    from flapi_spark.operators.text import _tokens

    toks = new_docs.select("doc_id", F.explode(_tokens()).alias("tok"))
    lens = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    delta = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    ).collect()[0]
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    (
        tf.join(lens, "doc_id")
        .select("tok", "doc_id", "tf", "dl")
        .write.insertInto(table)
    )
    old = spark.table(f"{table}__stats").collect()[0]
    stats = spark.createDataFrame(
        [(old.n_docs + delta.n_docs,
          old.total_len + delta.total_len)],
        "n_docs BIGINT, total_len BIGINT",
    )
    stats.write.mode("overwrite").saveAsTable(f"{table}__stats")


def bm25_search_expanded(
    spark: SparkSession,
    sf_dir: str,
    k: int = 20,
    m: int = 5,
    e: int = 3,
    weight: float = 0.5,
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (RM3-lite — Lavrenko
    & Croft's relevance-model family as Lucene/Anserini ship it): run
    the base BM25 query, mine the top-`m` documents for the `e`
    highest-evidence expansion terms (integer token-occurrence mass,
    stopwords and original terms excluded, deterministic tiebreak),
    then rescore the corpus against original terms at weight 1.0 plus
    expansion terms at `weight` — recall recovery for vocabulary
    mismatch, the classic lexical-retrieval second pass.

    Fully declarative: the top-m and top-e sets stay DataFrames (no
    driver collect); the second pass reuses the same tf/df/len
    aggregates as the first. Exactness: expansion evidence is integer,
    term weights are float-exact literals, weighted parts fold as
    w · (idf · tfn) in sorted order, 6dp round — exact DuckDB oracle
    replays both passes. Scale: everything downstream of the one
    token-explode groupBy is bounded by |query terms| + e postings."""
    from flapi_spark.operators.text import STOPWORDS, _tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_tokens()).alias("tok"))
    lens = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    tf_all = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_all = tf_all.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf, tfn = bm25_idf_tfn()

    def _score(parts: DataFrame) -> DataFrame:
        return parts.groupBy("doc_id").agg(
            F.round(
                F.expr(
                    "aggregate(sort_array(collect_list(part)),"
                    " CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
                ),
                6,
            ).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )

    base_parts = (
        tf_all.where(F.col("tok").isin(*BM25_QUERY))
        .join(F.broadcast(df_all), "tok")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * tfn).alias("part"))
    )
    topm = (
        _score(base_parts)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(m)
        .select("doc_id")
    )
    excluded = tuple(BM25_QUERY) + tuple(STOPWORDS)
    exp = (
        toks.join(topm, "doc_id")
        .where(~F.col("tok").isin(*excluded))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("mass"))
        .orderBy(F.desc("mass"), F.asc("tok"))
        .limit(e)
        .select("tok", F.lit(float(weight)).alias("w"))
    )
    orig = spark.createDataFrame(
        [(t, 1.0) for t in BM25_QUERY], "tok STRING, w DOUBLE"
    )
    terms = orig.unionAll(exp)
    parts2 = (
        tf_all.join(F.broadcast(terms), "tok")
        .join(F.broadcast(df_all), "tok")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (F.col("w") * (idf * tfn)).alias("part"))
    )
    topk = (
        _score(parts2)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    wr = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.select(
        "doc_id", "score",
        F.col("n_terms_hit").cast("long").alias("n_terms_hit"),
        F.row_number().over(wr).cast("long").alias("rnk"),
    )


def dp_event_counts(
    spark: SparkSession, sf_dir: str, epsilon: float = 0.5,
    seed: str = "",
) -> DataFrame:
    """Differentially-private release of the per-(event_type, day)
    event counts: Laplace(1/ε) noise on each count (sensitivity 1 —
    one user event moves one cell by one), the textbook ε-DP counting
    query (Dwork et al. 2006). Companion to k_anonymity_orders:
    k-anonymity suppresses small groups, DP noises every group —
    together they are the privacy surface an analytics endpoint
    publishes through. The released frame carries NO true counts.

    The noise is DETERMINISTIC pseudo-randomness: u ∈ (0,1) from the
    md5 of seed‖group-key via the inverse CDF
    X = -(1/ε)·sgn(u-½)·ln(1-2|u-½|), centered on the half-ULP grid
    ((h+0.5)/2^52) so 1-2|u-½| ∈ (0,1] and the ln never sees zero.
    PRIVACY CONTRACT: with the registry default seed="" the noise is
    a public function of the published key — fully invertible, ZERO
    privacy — which is exactly what makes the release replayable by
    the exact DuckDB oracle (this entry is arithmetic-verification
    plumbing, like every portable-hash twin). A real deployment MUST
    pass a SECRET `seed`: the mechanism is then the standard Laplace
    release (noise unpredictable without the secret), the plan is
    unchanged, and the md5→inverse-CDF arithmetic stays identical —
    only the salt stops being public. Tests pin that distinct seeds
    decorrelate the noise and that |noise| scales exactly 1/ε.

    Scale shape: one map-side-combined groupBy, then pure codegen
    projections; the md5/ln arithmetic is per-GROUP, not per-row."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    key = F.concat_ws(
        "|", F.lit(seed), F.col("event_type"),
        F.date_format("day", "yyyy-MM-dd"),
    )
    h = F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(16 ** 13))
    s = u - F.lit(0.5)
    noise = (
        -(F.lit(1.0) / F.lit(epsilon))
        * F.signum(s)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(s))
    )
    return g.select(
        "event_type",
        "day",
        F.lit(float(epsilon)).alias("epsilon"),
        F.round(F.col("n") + noise, 6).alias("noisy_count"),
    )


def l_diversity_orders(
    spark: SparkSession, sf_dir: str, l: int = 3
) -> DataFrame:
    """l-diversity over the same quasi-identifier classes as
    k_anonymity_orders, with the customer's market segment as the
    sensitive attribute: a class is l-diverse iff it contains ≥ l
    DISTINCT sensitive values — the attack k-anonymity misses
    (a class of 50 rows that all share one segment re-identifies the
    attribute even though no ROW re-identifies; Machanavajjhala et
    al. 2007). Completes the governance trio: k-anonymity (row
    linkage), l-diversity (attribute disclosure), dp_event_counts
    (released aggregates).

    Per class: size, distinct sensitive count, the dominant value's
    share (homogeneity — 1.0 means full disclosure), violation flag.
    One join + two grouped aggregates + one per-class argmax window;
    all shares divide exact integers. Exact oracle."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    rows = orders.join(cust, "o_custkey").select(
        "o_orderpriority",
        "o_orderstatus",
        F.year("o_orderdate").cast("long").alias("o_year"),
        "c_mktsegment",
    )
    per_val = rows.groupBy(
        "o_orderpriority", "o_orderstatus", "o_year", "c_mktsegment"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(
        "o_orderpriority", "o_orderstatus", "o_year"
    ).orderBy(F.desc("n"), F.asc("c_mktsegment"))
    return (
        per_val.withColumn("r", F.row_number().over(w))
        .groupBy("o_orderpriority", "o_orderstatus", "o_year")
        .agg(
            F.sum("n").cast("long").alias("class_size"),
            F.count(F.lit(1)).cast("long").alias("n_sensitive"),
            F.max(F.when(F.col("r") == 1, F.col("n"))).alias("top_n"),
        )
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "o_year",
            "class_size",
            "n_sensitive",
            F.round(
                F.col("top_n").cast("double") / F.col("class_size"), 6
            ).alias("homogeneity"),
            (F.col("n_sensitive") < l).alias("violates_l"),
        )
    )
