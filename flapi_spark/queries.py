"""Central registry: query name → (spark_fn, duckdb_oracle_sql).

Each spark_fn takes (spark, sf_dir) and returns a DataFrame; the
oracle is ANSI SQL DuckDB runs over the same parquet tables (views
pre-registered by the correctness driver). Column names/aliases match
on both sides — the driver sorts columns by name before hashing.

Cross-engine exactness conventions (see operators/common.py):
- money doubles → DECIMAL(18,2) before arithmetic; sums emitted at the
  exact product scale (no rounding casts).
- averages = CAST(exact decimal sum AS DOUBLE) / COUNT on both sides.
- events.ts is parquet TIMESTAMP(NANOS): Spark truncates to micros at
  load; oracles use CAST(ts AS TIMESTAMP) for the same truncation.
- oracle `None` ⇒ rows-only check (op not SQL-expressible or
  engine-specific estimates).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flapi_spark.operators import relational as R
from flapi_spark.operators.asof import asof_join_events_orders

_DEC = "CAST({c} AS DECIMAL(18,2))"
_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)


# --- template/executor-backed queries (flAPI endpoint parity) -------------

_CUSTOMERS_TEMPLATE = (
    "SELECT c_custkey AS key, c_name AS name, c_acctbal AS balance,"
    " c_mktsegment AS segment"
    " FROM parquet.`{{{conn.path}}}`"
    " WHERE 1=1"
    "{{#params.segment}} AND c_mktsegment = {{params.segment}}{{/params.segment}}"
)


def _customers_endpoint(sf_dir: str, **kw):
    import os

    from flapi_spark.config import EndpointConfig
    from flapi_spark.validation import RequestField, Validator

    return (
        EndpointConfig(
            url_path="/customers/",
            template_text=_CUSTOMERS_TEMPLATE,
            connections=["customers-parquet"],
            request_fields=[
                RequestField(
                    field_name="segment",
                    validators=[
                        Validator(
                            type="enum",
                            allowed_values=[
                                "AUTOMOBILE", "BUILDING", "FURNITURE",
                                "HOUSEHOLD", "MACHINERY",
                            ],
                        )
                    ],
                )
            ],
            **kw,
        ),
        os.path.join(sf_dir, "customer.parquet"),
    )


def _executor_for(spark, path):
    from flapi_spark.executor import QueryExecutor
    from flapi_spark.sources.registry import Connection, ConnectionRegistry

    reg = ConnectionRegistry()
    reg.add(Connection(name="customers-parquet", properties={"path": path}))
    return QueryExecutor(spark, reg)


def tpl_customers_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference customers.sql template with a typed enum param bound as
    a Spark named SQL parameter (reference: examples/sqls/customers)."""
    ep, path = _customers_endpoint(sf_dir, with_pagination=False)
    return _executor_for(spark, path).execute(ep, {"segment": "BUILDING"}).df


def tpl_customers_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same template with the optional param absent — the mustache
    section drops the filter entirely."""
    ep, path = _customers_endpoint(sf_dir, with_pagination=False)
    return _executor_for(spark, path).execute(ep, {}).df


def shape_redact_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination + response shaping (redact balance, first page of 10
    ordered by key) — reference: mcp_response_shaper.cpp semantics."""
    from flapi_spark.config import ShapeConfig

    ep, path = _customers_endpoint(
        sf_dir,
        with_pagination=True,
        shape=ShapeConfig(redact_columns=["balance"]),
    )
    res = _executor_for(spark, path).execute(
        ep, {"limit": "10", "offset": "0"}, order_by="key"
    )
    return res.df


# --- registry --------------------------------------------------------------

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # -- core engine / endpoint parity
    "tpl_customers_by_segment": (
        tpl_customers_by_segment,
        "SELECT c_custkey AS key, c_name AS name, c_acctbal AS balance,"
        " c_mktsegment AS segment FROM customer WHERE c_mktsegment = 'BUILDING'",
    ),
    "tpl_customers_all": (
        tpl_customers_all,
        "SELECT c_custkey AS key, c_name AS name, c_acctbal AS balance,"
        " c_mktsegment AS segment FROM customer",
    ),
    "shape_redact_customers": (
        shape_redact_customers,
        "SELECT c_custkey AS key, c_name AS name, c_mktsegment AS segment"
        " FROM customer ORDER BY c_custkey LIMIT 10",
    ),
    "paginate_orders": (
        R.paginate_orders,
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate"
        " FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100",
    ),
    "cache_upsert_latest": (
        R.cache_upsert_latest,
        "SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate FROM ("
        " SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,"
        "  row_number() OVER (PARTITION BY o_custkey"
        "   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn"
        " FROM orders) t WHERE rn = 1",
    ),
    # -- relational / OLAP
    "q1_pricing_summary": (
        R.q1_pricing_summary,
        "SELECT l_returnflag, l_linestatus,"
        " CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,"
        " CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,"
        f" CAST(SUM({_REVENUE}) AS DECIMAL(30,4)) AS sum_disc_price,"
        f" CAST(SUM({_REVENUE} * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DECIMAL(30,6)) AS sum_charge,"
        " CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,"
        " CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_price,"
        " COUNT(*) AS count_order"
        " FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'"
        " GROUP BY l_returnflag, l_linestatus",
    ),
    "q3_shipping_priority": (
        R.q3_shipping_priority,
        "SELECT l_orderkey, o_orderdate, o_orderpriority,"
        f" CAST(SUM({_REVENUE}) AS DECIMAL(30,4)) AS revenue"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
        " WHERE c_mktsegment = 'BUILDING'"
        " AND o_orderdate < TIMESTAMP '1998-03-15'"
        " AND l_shipdate > TIMESTAMP '1998-03-15'"
        " GROUP BY l_orderkey, o_orderdate, o_orderpriority"
        " ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10",
    ),
    "q4_order_priority": (
        R.q4_order_priority,
        "SELECT o_orderpriority, count(*) AS order_count FROM orders"
        " WHERE o_orderdate >= TIMESTAMP '1997-01-01'"
        " AND o_orderdate < TIMESTAMP '1997-04-01'"
        " AND EXISTS (SELECT 1 FROM lineitem"
        "  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)"
        " GROUP BY o_orderpriority",
    ),
    "q5_local_supplier_volume": (
        R.q5_local_supplier_volume,
        "SELECT n_name,"
        f" CAST(SUM({_REVENUE}) AS DECIMAL(30,4)) AS revenue"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        " JOIN supplier ON l_suppkey = s_suppkey"
        " JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey"
        " JOIN nation ON c_nationkey = n_nationkey"
        " JOIN region ON n_regionkey = r_regionkey"
        " WHERE r_name = 'ASIA'"
        " AND o_orderdate >= TIMESTAMP '1997-01-01'"
        " AND o_orderdate < TIMESTAMP '1998-01-01'"
        " GROUP BY n_name",
    ),
    "q6_forecast_revenue": (
        R.q6_forecast_revenue,
        "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
        " * CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4)) AS revenue"
        " FROM lineitem"
        " WHERE l_shipdate >= TIMESTAMP '1997-01-01'"
        " AND l_shipdate < TIMESTAMP '1998-01-01'"
        " AND l_discount >= 0.0199 AND l_discount <= 0.0401"
        " AND l_quantity < 24",
    ),
    "q10_returned_items": (
        R.q10_returned_items,
        "SELECT c_custkey, c_name, c_acctbal, n_name,"
        f" CAST(SUM({_REVENUE}) AS DECIMAL(30,4)) AS revenue"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
        " JOIN nation ON c_nationkey = n_nationkey"
        " WHERE l_returnflag = 'R'"
        " AND o_orderdate >= TIMESTAMP '1997-10-01'"
        " AND o_orderdate < TIMESTAMP '1998-01-01'"
        " GROUP BY c_custkey, c_name, c_acctbal, n_name"
        " ORDER BY revenue DESC, c_custkey LIMIT 20",
    ),
    # -- window / analytics
    "top_customers_window": (
        R.top_customers_window,
        "SELECT c_mktsegment, c_custkey, c_name, c_acctbal, rnk FROM ("
        " SELECT c_mktsegment, c_custkey, c_name, c_acctbal,"
        "  rank() OVER (PARTITION BY c_mktsegment"
        "   ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk"
        " FROM customer) t WHERE rnk <= 5",
    ),
    "running_revenue_window": (
        R.running_revenue_window,
        "WITH daily AS ("
        " SELECT o_orderdate,"
        "  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS daily_revenue"
        " FROM orders GROUP BY o_orderdate)"
        " SELECT o_orderdate, daily_revenue,"
        "  CAST(SUM(daily_revenue) OVER (ORDER BY o_orderdate"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(30,2))"
        "  AS cum_revenue"
        " FROM daily",
    ),
    "ntile_value_bands": (
        R.ntile_value_bands,
        "SELECT band, count(*) AS n, min(value) AS min_value,"
        " max(value) AS max_value FROM ("
        " SELECT ntile(4) OVER (ORDER BY value, event_id) AS band, value"
        " FROM events) t GROUP BY band",
    ),
    "rollup_revenue": (
        R.rollup_revenue,
        "SELECT r_name, n_name,"
        " CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(30,2)) AS revenue,"
        " count(*) AS order_count"
        " FROM orders JOIN customer ON o_custkey = c_custkey"
        " JOIN nation ON c_nationkey = n_nationkey"
        " JOIN region ON n_regionkey = r_regionkey"
        " GROUP BY ROLLUP(r_name, n_name)",
    ),
    # -- events / time-series
    "events_sessionize": (
        R.events_sessionize,
        "WITH ordered AS ("
        " SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,"
        "  epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)))"
        "   OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)"
        "   AS gap_us FROM events),"
        " flagged AS (SELECT user_id, event_id, ts,"
        "  CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END"
        "   AS new_session FROM ordered),"
        " sess AS (SELECT user_id, ts,"
        "  CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
        "   AS session_id FROM flagged)"
        " SELECT user_id, session_id, count(*) AS n_events,"
        "  min(ts) AS session_start, max(ts) AS session_end"
        " FROM sess GROUP BY user_id, session_id",
    ),
    "events_tumbling_agg": (
        R.events_tumbling_agg,
        "SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,"
        " event_type, count(*) AS n_events,"
        " CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DECIMAL(38,10)) AS sum_value,"
        " count(DISTINCT user_id) AS n_users"
        " FROM events GROUP BY 1, 2",
    ),
    "distinct_users": (
        R.distinct_users,
        "SELECT event_type, count(DISTINCT user_id) AS n_users"
        " FROM events GROUP BY event_type",
    ),
    "approx_distinct_users": (R.approx_distinct_users, None),  # rows-only: HLL
    "asof_join_events_orders": (
        asof_join_events_orders,
        "WITH errors AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts"
        "  FROM events WHERE event_type = 'error'),"
        " purchases AS (SELECT user_id, ts, value AS purchase_value FROM ("
        "  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,"
        "   row_number() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP)"
        "    ORDER BY event_id DESC) AS rn"
        "  FROM events WHERE event_type = 'purchase') t WHERE rn = 1)"
        " SELECT e.event_id, e.user_id, e.ts, p.purchase_value"
        " FROM errors e ASOF LEFT JOIN purchases p"
        "  ON e.user_id = p.user_id AND e.ts >= p.ts",
    ),
}
