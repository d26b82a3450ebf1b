"""Cached-endpoint orchestration end-to-end: template renders with the
{{cache.*}} context so the SOURCE SCAN is already cursor-pruned, the
result commits as snapshots, reads serve from cache (reference flow:
request_handler.cpp + cache_manager.cpp + customers_cache.sql)."""

import os

import pyspark.sql.functions as F
import pytest

from flapi_spark.cache import CacheManager
from flapi_spark.cache_flow import read_cached_endpoint, refresh_endpoint_cache
from flapi_spark.config import CacheConfig, EndpointConfig
from flapi_spark.executor import QueryExecutor
from flapi_spark.sources.registry import Connection, ConnectionRegistry

SF = os.environ.get("FLAPI_SPARK_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture()
def setup(spark, tmp_path):
    src_path = str(tmp_path / "orders_src.parquet")
    full = spark.read.parquet(os.path.join(SF, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    endpoint = EndpointConfig(
        url_path="/orders-cached/",
        template_text=(
            "SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate"
            " FROM parquet.`{{{conn.path}}}`"
            "{{#cache.cursorWatermark}}"
            " WHERE o_orderdate > '{{cache.cursorWatermark}}'"
            "{{/cache.cursorWatermark}}"
        ),
        connections=["orders-src"],
        with_pagination=False,
        cache=CacheConfig(
            enabled=True,
            table="orders_cache",
            schema="analytics",
            primary_key=["o_orderkey"],
            cursor_column="o_orderdate",
        ),
    )
    reg = ConnectionRegistry()
    reg.add(Connection(name="orders-src", properties={"path": src_path}))
    ex = QueryExecutor(spark, reg)
    mgr = CacheManager(spark, tmp_path / "cache_root")
    return spark, full, src_path, endpoint, ex, mgr


def test_full_then_incremental_refresh(setup):
    spark, full, src_path, ep, ex, mgr = setup
    cutoff = "1998-01-01"
    early = full.where(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
    early.write.mode("overwrite").parquet(src_path)

    info1 = refresh_endpoint_cache(ex, mgr, ep)
    assert info1.current_snapshot_id is not None
    assert read_cached_endpoint(ex, mgr, ep).count() == early.count()

    # the source grows; second refresh must render the template WITH
    # the cursor watermark, pulling only the new slice
    full.write.mode("overwrite").parquet(src_path)
    info2 = mgr.snapshot_info(ep.cache)
    sql, _ = ex.render(ep, {}, cache_ctx=info2.template_context())
    assert "WHERE o_orderdate >" in sql  # cursor pruning reaches the scan

    refresh_endpoint_cache(ex, mgr, ep)
    cached = read_cached_endpoint(ex, mgr, ep)
    assert cached.count() == full.count()
    # pk uniqueness survives the merge
    assert cached.select("o_orderkey").distinct().count() == full.count()

    events = [e["event"] for e in mgr.sync_events()]
    assert "full_refresh" in events or "initial_sync" in events
    assert "incremental_sync" in events


def test_first_refresh_has_no_cursor_filter(setup):
    spark, full, src_path, ep, ex, mgr = setup
    full.write.mode("overwrite").parquet(src_path)
    sql, _ = ex.render(ep, {}, cache_ctx=mgr.snapshot_info(ep.cache).template_context())
    assert "WHERE" not in sql  # inverted: no watermark on first run


def test_scheduled_cache_refresh(setup):
    import time

    from flapi_spark.cache_flow import schedule_cache_refreshes
    from flapi_spark.heartbeat import HeartbeatWorker

    spark, full, src_path, ep, ex, mgr = setup
    full.write.mode("overwrite").parquet(src_path)
    ep.cache.schedule = "1s"  # parse_duration handles s/m/h/d/w
    hb = HeartbeatWorker(tick_s=0.05)
    names = schedule_cache_refreshes(hb, ex, mgr, [ep])
    assert names == ["cache:analytics.orders_cache"]
    hb.start()
    try:
        deadline = time.time() + 15
        while time.time() < deadline:
            try:
                if read_cached_endpoint(ex, mgr, ep).count() == full.count():
                    break
            except FileNotFoundError:
                pass
            time.sleep(0.3)
        else:
            raise AssertionError("scheduled refresh never populated the cache")
    finally:
        hb.stop()
    stats = hb.stats()
    assert stats["cache:analytics.orders_cache"]["runs"] >= 1
    assert stats["cache:analytics.orders_cache"]["errors"] == 0


def test_cache_template_vars_full_namespace(setup):
    from flapi_spark.cache_flow import cache_template_vars

    spark, full, src_path, ep, ex, mgr = setup
    full.write.mode("overwrite").parquet(src_path)
    refresh_endpoint_cache(ex, mgr, ep)
    ctx = cache_template_vars(ep.cache, mgr.snapshot_info(ep.cache))
    # the documented {{cache.*}} set (reference: customers_cache.sql)
    assert ctx["catalog"] == "cache"
    assert ctx["schema"] == "analytics"
    assert ctx["table"] == "orders_cache"
    assert ctx["mode"] == "merge"  # pk + cursor configured
    assert ctx["cursorColumn"] == "o_orderdate"
    assert ctx["primaryKeys"] == "o_orderkey"
    assert "cacheSnapshotId" in ctx and "cacheSnapshotTimestamp" in ctx
