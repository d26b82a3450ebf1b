"""Continuous aggregate: incremental rollup == full recompute."""
import pytest
from pyspark.sql import functions as F

from flapi_spark.cache import CacheManager
from flapi_spark.config import CacheConfig
from flapi_spark.operators import continuous as C
from flapi_spark.session import load_table


@pytest.fixture()
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _key(r):
    return (r.window_start, r.event_type)


def test_incremental_equals_full_recompute(spark, events, tmp_path):
    """Split the stream at the median ts, sync twice, compare against a
    one-shot rollup: additive measures exact, HLL estimates identical
    (sketch union is exact over set union)."""
    cache = CacheManager(spark, tmp_path)
    cfg = CacheConfig(schema="main", table="hourly", cursor_column="max_ts")

    cut = events.agg(
        F.percentile_approx("ts", 0.5).alias("c")).collect()[0]["c"]
    first = events.where(F.col("ts") <= F.lit(cut))
    assert 0 < first.count() < events.count()

    info1 = C.continuous_rollup_sync(cache, cfg, first)
    assert info1.cursor_watermark is not None
    # second sync sees the FULL stream but must only fold in ts > cut
    info2 = C.continuous_rollup_sync(cache, cfg, events)
    assert info2.cursor_watermark > info1.cursor_watermark

    got = {
        _key(r): (r.n_events, r.sum_value, r.n_users_approx)
        for r in C.rollup_estimate(cache.read(cfg)).collect()
    }
    want = {
        _key(r): (r.n_events, r.sum_value, r.n_users_approx)
        for r in C.rollup_estimate(C.rollup_delta(events)).collect()
    }
    assert got == want


def test_sync_is_idempotent_when_no_new_events(spark, events, tmp_path):
    cache = CacheManager(spark, tmp_path)
    cfg = CacheConfig(schema="main", table="hourly", cursor_column="max_ts")
    C.continuous_rollup_sync(cache, cfg, events)
    before = {
        _key(r): (r.n_events, r.sum_value)
        for r in cache.read(cfg).collect()
    }
    info = C.continuous_rollup_sync(cache, cfg, events)  # nothing new
    after = {
        _key(r): (r.n_events, r.sum_value)
        for r in cache.read(cfg).collect()
    }
    assert after == before
    assert info.previous_snapshot_id is not None  # still a committed tick


def test_rollup_counts_match_batch_twin(spark, events, sf_dir, tmp_path):
    """The continuous rollup's exact measures agree with the one-shot
    events_tumbling_agg query (the sketch replaces exact distinct)."""
    from flapi_spark.operators.relational import events_tumbling_agg

    cache = CacheManager(spark, tmp_path)
    cfg = CacheConfig(schema="main", table="hourly", cursor_column="max_ts")
    C.continuous_rollup_sync(cache, cfg, events)
    got = {
        _key(r): (r.n_events, r.sum_value)
        for r in cache.read(cfg).collect()
    }
    want = {
        _key(r): (r.n_events, r.sum_value)
        for r in events_tumbling_agg(spark, sf_dir).collect()
    }
    assert got == want
