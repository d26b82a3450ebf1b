"""Range joins — interval and binning joins the reference serves via
plain SQL theta joins (reference: examples/sqls/*.sql templates allow
arbitrary join predicates through DuckDB; re-expressed here with
Spark-first physical shapes).

Two scale-sensitive shapes:

- **keyed interval join** (equi key + time-range predicate): planned as
  a sort-merge join on the equi key with the range as a join filter —
  linear in the per-key group sizes, never a cartesian. AQE's skew
  handling splits hot keys.
- **bin join** (value BETWEEN lo AND hi against a small bands table):
  the bands side is broadcast; with non-overlapping bands this is one
  streamed pass over the fact (BroadcastNestedLoop with a tiny build
  side — bounded work per row since bands are few and sorted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flapi_spark.session import load_table


def keyed_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_gap: str,
) -> DataFrame:
    """left ⋈ right on key where right_ts in (left_ts, left_ts + max_gap].

    `max_gap` is a SQL interval literal body, e.g. ``'1 hour'``."""
    gap = F.expr(f"INTERVAL {max_gap}")
    return left.join(
        right,
        (left[key] == right[key])
        & (right[right_ts] > left[left_ts])
        & (right[right_ts] <= left[left_ts] + gap),
    )


def range_join_error_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases within 1 hour after each error event, per user — the
    keyed interval join. Matches the SQL theta-join oracle."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("error_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    joined = errors.join(
        purchases,
        (errors.user_id == purchases.p_user)
        & (purchases.purchase_ts > errors.error_ts)
        & (purchases.purchase_ts <= errors.error_ts + F.expr("INTERVAL 1 HOUR")),
    )
    return joined.select(
        "error_id", "user_id", "error_ts", "purchase_id", "purchase_ts",
        "purchase_value",
    )


# static value bands: deterministic, engine-agnostic
VALUE_BANDS = [(i, float(i * 10), float((i + 1) * 10)) for i in range(10)] + [
    (10, 100.0, float("inf"))
]


def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin events into value bands via a broadcast range join, then
    aggregate per band — the binning-join shape."""
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [(b, lo, hi if hi != float("inf") else 1e18) for b, lo, hi in VALUE_BANDS],
        "band_id INT, lo DOUBLE, hi DOUBLE",
    )
    joined = ev.join(
        F.broadcast(bands),
        (ev.value >= bands.lo) & (ev.value < bands.hi),
    )
    return joined.groupBy("band_id", "lo").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,10)"))
        .cast("double")
        .alias("sum_value"),
    )
