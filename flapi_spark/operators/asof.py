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
    direction: str = "backward",
    keep_right_ts: str | None = None,
) -> DataFrame:
    """As-of left join, backward (most recent right.ts <= left.ts) or
    forward (`direction="forward"`: earliest right.ts >= left.ts).

    `left` and `right` must both have the `on` key columns and the `ts`
    column; `right_value_cols` are carried from right to left. Right
    rows tied on (key, ts) should be pre-deduped by the caller for
    deterministic output. `tolerance` (e.g. '30 DAYS') nulls matches
    further than the tolerance in the join direction. `keep_right_ts`
    names an extra output column carrying the matched right timestamp.

    Both directions are the same one-shuffle union + ignore-nulls
    window composition — forward just flips the sort tie-break and
    uses the following-frame first() instead of the preceding-frame
    last()."""
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

    if direction == "backward":
        # right rows sort before left rows at equal ts → ties match
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(ts), F.col("__is_left"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )

        def pick(c):
            return F.last(F.col(c), ignorenulls=True).over(w)

    elif direction == "forward":
        # left rows sort before right rows at equal ts → ties match
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(ts), F.desc("__is_left"))
            .rowsBetween(0, Window.unboundedFollowing)
        )

        def pick(c):
            return F.first(F.col(c), ignorenulls=True).over(w)

    else:
        raise ValueError(f"unknown as-of direction: {direction!r}")

    filled = tagged_l.unionByName(tagged_r).select(
        *lcols,
        "__is_left",
        *[pick(c).alias(c) for c in right_value_cols],
        pick("__right_ts").alias("__right_ts"),
    )
    out = filled.where(F.col("__is_left") == 1)
    if tolerance is not None:
        iv = F.expr(f"INTERVAL {tolerance}")
        too_far = (
            F.col("__right_ts") < F.col(ts) - iv
            if direction == "backward"
            else F.col("__right_ts") > F.col(ts) + iv
        )
        out = out.select(
            *lcols,
            "__is_left",
            *[
                F.when(too_far, F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in right_value_cols
            ],
            F.when(too_far, F.lit(None)).otherwise(F.col("__right_ts")).alias(
                "__right_ts"
            ),
        )
    if keep_right_ts is not None:
        out = out.withColumn(keep_right_ts, F.col("__right_ts"))
    return out.drop("__is_left", "__right_ts")


def _errors_and_purchases(spark: SparkSession, sf_dir: str):
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
    return errors, purchases


def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each 'error' event, the most recent prior-or-equal 'purchase'
    by the same user (left as-of join). Oracle: DuckDB ASOF LEFT JOIN."""
    errors, purchases = _errors_and_purchases(spark, sf_dir)
    joined = asof_join(
        errors, purchases, on=["user_id"], ts="ts",
        right_value_cols=["purchase_value"],
    )
    return joined.select("event_id", "user_id", "ts", "purchase_value")


def asof_join_events_orders_forward(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """For each 'error' event, the EARLIEST at-or-after 'purchase' by
    the same user — the forward as-of join (pandas merge_asof
    direction='forward'). Oracle: DuckDB ASOF LEFT JOIN with <=."""
    errors, purchases = _errors_and_purchases(spark, sf_dir)
    joined = asof_join(
        errors, purchases, on=["user_id"], ts="ts",
        right_value_cols=["purchase_value"],
        direction="forward", keep_right_ts="matched_ts",
    )
    return joined.select(
        "event_id", "user_id", "ts", "matched_ts", "purchase_value"
    )


def asof_join_events_orders_nearest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Nearest-in-time as-of join (pandas merge_asof
    direction='nearest'): each error takes whichever purchase is
    closer in absolute time, backward winning ties. Composed from one
    backward and one forward pass — both single-shuffle window
    compositions on the same user key — joined on the (unique) event
    id. Oracle: two DuckDB ASOF joins + the same CASE arbitration."""
    errors, purchases = _errors_and_purchases(spark, sf_dir)
    back = asof_join(
        errors, purchases, on=["user_id"], ts="ts",
        right_value_cols=["purchase_value"],
        keep_right_ts="b_ts",
    ).select(
        "event_id", "user_id", "ts", "b_ts",
        F.col("purchase_value").alias("b_val"),
    )
    fwd = asof_join(
        errors, purchases, on=["user_id"], ts="ts",
        right_value_cols=["purchase_value"],
        direction="forward", keep_right_ts="f_ts",
    ).select("event_id", "f_ts", F.col("purchase_value").alias("f_val"))
    j = back.join(fwd, "event_id")
    pick_b = F.col("f_ts").isNull() | (
        F.col("b_ts").isNotNull()
        & (
            F.timestamp_diff("MICROSECOND", F.col("b_ts"), F.col("ts"))
            <= F.timestamp_diff("MICROSECOND", F.col("ts"), F.col("f_ts"))
        )
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        F.when(pick_b, F.col("b_ts")).otherwise(F.col("f_ts")).alias(
            "matched_ts"
        ),
        F.when(pick_b, F.col("b_val")).otherwise(F.col("f_val")).alias(
            "purchase_value"
        ),
    )
