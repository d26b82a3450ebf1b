"""As-of (backward) join — an operator Spark lacks natively.

Implemented as a composition of existing DataFrame ops (union +
last-ignore-nulls window), NOT a range join: for each left row, attach
the most recent right row with right.ts <= left.ts per key.

Scale rationale: a naive range/theta join explodes toward O(|L|·|R|)
per key; the union/window form is one shuffle on the key, linear in
|L|+|R|, and AQE handles skewed keys. Semantics match DuckDB's
ASOF JOIN (the oracle used by the correctness gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flapi_spark.session import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str,
    right_value_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of left join.

    `left` and `right` must both have the `on` key columns and the `ts`
    column; `right_value_cols` are carried from right to left. Right
    rows tied on (key, ts) should be pre-deduped by the caller for
    deterministic output. `tolerance` (e.g. '30 DAYS') nulls matches
    older than left.ts - tolerance.
    """
    lcols = left.columns
    null_vals = [
        F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_value_cols
    ]
    tagged_l = left.select(
        *lcols, F.lit(1).alias("__is_left"), *null_vals,
        F.lit(None).cast(right.schema[ts].dataType).alias("__right_ts"),
    )
    null_left = [
        F.lit(None).cast(left.schema[c].dataType).alias(c)
        for c in lcols
        if c not in on and c != ts
    ]
    tagged_r = right.select(
        *on, ts, *null_left, F.lit(0).alias("__is_left"),
        *[F.col(c) for c in right_value_cols],
        F.col(ts).alias("__right_ts"),
    ).select(*lcols, "__is_left", *right_value_cols, "__right_ts")

    # right rows sort before left rows at equal ts → ties count as match
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = tagged_l.unionByName(tagged_r).select(
        *lcols,
        "__is_left",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(c)
            for c in right_value_cols
        ],
        F.last(F.col("__right_ts"), ignorenulls=True).over(w).alias("__right_ts"),
    )
    out = filled.where(F.col("__is_left") == 1)
    if tolerance is not None:
        too_old = F.col("__right_ts") < F.col(ts) - F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *lcols,
            *[
                F.when(too_old, F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in right_value_cols
            ],
        )
    return out.drop("__is_left", "__right_ts")


def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each 'error' event, the most recent prior-or-equal 'purchase'
    by the same user (left as-of join). Oracle: DuckDB ASOF LEFT JOIN."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    # dedupe purchases at identical (user, ts) for determinism
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "ts", F.col("value").alias("purchase_value"))
    )
    joined = asof_join(
        errors, purchases, on=["user_id"], ts="ts",
        right_value_cols=["purchase_value"],
    )
    return joined.select("event_id", "user_id", "ts", "purchase_value")
