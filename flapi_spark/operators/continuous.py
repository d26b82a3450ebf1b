"""Continuous aggregate: incrementally-maintained time-bucket rollup.

The hypertable/continuous-aggregate pattern (TimescaleDB continuous
aggregates, Druid rollup segments): keep an hourly rollup of the
events stream as a cache table and, on each sync, aggregate ONLY the
events past the last watermark, then merge bucket-wise into the
existing rollup. At 100 TB this is the difference between re-scanning
the full fact table per refresh and touching just the new partition.

Merge requires every measure to be MERGEABLE:
- counts and sums merge by addition;
- distinct users CANNOT merge from finalized counts — the rollup
  stores an HLL SKETCH per bucket (``hll_sketch_agg``) and merges
  with ``hll_union``; estimates are read out with
  ``hll_sketch_estimate``. Sketch-merge is exact over unions, so an
  incrementally-built estimate equals the recompute-from-scratch
  estimate bit-for-bit.

Storage rides the snapshot CacheManager (flapi_spark/cache.py):
each sync commits a new snapshot whose cursor watermark is the max
event ts folded in, giving the same lineage/retention/audit surface
as every other cached table. The streaming twin of this operator is
flapi_spark/streaming.py:tumbling_agg_stream; this is the batch
micro-refresh form the reference reaches with scheduled cache
refreshes (reference: cache_manager.cpp schedule + cursor sync).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flapi_spark.cache import CacheManager, SnapshotInfo
from flapi_spark.config import CacheConfig

BUCKET = "1 hour"


def rollup_delta(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Hourly rollup of events past `watermark` (None = everything):
    additive measures + an HLL user sketch + the fold-in cursor."""
    ev = events
    if watermark is not None:
        wm = F.lit(watermark).cast(events.schema["ts"].dataType)
        ev = events.where(F.col("ts") > wm)
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("sum_value"),
            F.hll_sketch_agg("user_id").alias("users_sketch"),
            F.max("ts").alias("max_ts"),
        )
    )


def merge_rollup(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Bucket-wise merge: add counts/sums, union sketches, max cursor.
    One shuffle on the bucket key; buckets untouched by the delta pass
    through the same aggregate unchanged."""
    return (
        existing.unionByName(delta)
        .groupBy("window_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.hll_union_agg("users_sketch").alias("users_sketch"),
            F.max("max_ts").alias("max_ts"),
        )
    )


def continuous_rollup_sync(
    cache: CacheManager, cfg: CacheConfig, events: DataFrame
) -> SnapshotInfo:
    """One refresh tick: delta-aggregate past the snapshot watermark,
    merge into the current rollup, commit a new snapshot. `cfg` must
    set ``cursor_column='max_ts'`` so the commit records the new
    watermark."""
    info = cache.snapshot_info(cfg)
    delta = rollup_delta(events, info.cursor_watermark)
    if info.current_snapshot_id is None:
        merged = delta
        mode = "initial_rollup"
    else:
        merged = merge_rollup(cache.read(cfg), delta)
        mode = "continuous_rollup"
    return cache._commit_snapshot(cfg, merged, mode)


def rollup_estimate(rollup: DataFrame) -> DataFrame:
    """Read out the finished rollup: sketch → distinct-user estimate."""
    return rollup.select(
        "window_start",
        "event_type",
        "n_events",
        "sum_value",
        F.hll_sketch_estimate("users_sketch").alias("n_users_approx"),
    )
