"""Metrics registry + executor instrumentation tests."""

import pytest

from flapi_spark.metrics import MetricsRegistry


def test_counters_and_labels():
    m = MetricsRegistry()
    m.inc("flapi_queries", {"endpoint": "/a/", "status": "ok"})
    m.inc("flapi_queries", {"endpoint": "/a/", "status": "ok"})
    m.inc("flapi_queries", {"endpoint": "/a/", "status": "error"})
    assert m.counter_value("flapi_queries", {"endpoint": "/a/", "status": "ok"}) == 2
    assert m.counter_value("flapi_queries", {"status": "error", "endpoint": "/a/"}) == 1
    assert m.counter_value("flapi_queries", {"endpoint": "/b/"}) == 0


def test_histogram_buckets_cumulative():
    m = MetricsRegistry(buckets=(0.1, 1.0, 10.0))
    for v in (0.05, 0.5, 5.0, 50.0):
        m.observe("dur", v)
    text = m.render_prometheus()
    assert 'dur_bucket{le="0.1"} 1' in text
    assert 'dur_bucket{le="1"} 2' in text
    assert 'dur_bucket{le="10"} 3' in text
    assert 'dur_bucket{le="+Inf"} 4' in text
    assert "dur_count 4" in text
    snap = m.snapshot()
    assert snap["histograms"]["dur"]["{}"]["count"] == 4


def test_prometheus_counter_format():
    m = MetricsRegistry()
    m.inc("flapi_cache_refreshes", {"table": "t1"})
    text = m.render_prometheus()
    assert "# TYPE flapi_cache_refreshes_total counter" in text
    assert 'flapi_cache_refreshes_total{table="t1"} 1' in text


def test_executor_instruments_ok_and_validation_error(spark, tmp_path):
    from flapi_spark.config import EndpointConfig
    from flapi_spark.executor import QueryExecutor
    from flapi_spark.validation import ValidationError

    ep = EndpointConfig.from_dict(
        {
            "url-path": "/probe/",
            "template-text": "SELECT 1 AS one",
            "request": [
                {
                    "field-name": "n",
                    "field-in": "query",
                    "validators": [{"type": "int", "min": 0}],
                }
            ],
        },
        base_dir=tmp_path,
    )
    m = MetricsRegistry()
    ex = QueryExecutor(spark, metrics=m)
    ex.execute(ep, {"n": "1"})
    assert m.counter_value(
        "flapi_queries", {"endpoint": "/probe/", "status": "ok"}
    ) == 1
    with pytest.raises(ValidationError):
        ex.execute(ep, {"n": "not-an-int"})
    assert m.counter_value(
        "flapi_queries", {"endpoint": "/probe/", "status": "validation_error"}
    ) == 1
    snap = m.snapshot()
    label = '{endpoint="/probe/"}'
    assert snap["histograms"]["flapi_query_duration_seconds"][label]["count"] == 2


def test_plan_guard_rejects_cartesian(spark, tmp_path):
    from flapi_spark.config import EndpointConfig
    from flapi_spark.executor import PlanGuardError, QueryExecutor

    spark.range(5).createOrReplaceTempView("pg_a")
    spark.range(5).createOrReplaceTempView("pg_b")
    cross = EndpointConfig.from_dict(
        {
            "url-path": "/cross/",
            "template-text": "SELECT a.id FROM pg_a a, pg_b b",
        },
        base_dir=tmp_path,
    )
    guarded = QueryExecutor(spark, plan_guard=True)
    with pytest.raises(PlanGuardError, match="/cross/"):
        guarded.execute(cross)
    # unguarded executor still serves it (analytical sessions)
    assert QueryExecutor(spark).execute(cross).df.count() == 25
    # a keyed join passes the guard
    joined = EndpointConfig.from_dict(
        {
            "url-path": "/join/",
            "template-text": "SELECT a.id FROM pg_a a JOIN pg_b b USING (id)",
        },
        base_dir=tmp_path,
    )
    assert guarded.execute(joined).df.count() == 5


def test_cache_refresh_metrics(spark, sf_dir, tmp_path):
    from flapi_spark.cache import CacheManager
    from flapi_spark.config import CacheConfig
    from flapi_spark.session import load_table

    m = MetricsRegistry()
    mgr = CacheManager(spark, str(tmp_path / "c"), metrics=m)
    cfg = CacheConfig(enabled=True, table="t", schema="s")
    region = load_table(spark, sf_dir, "region")
    mgr.full_refresh(cfg, region)
    mgr.full_refresh(cfg, region)
    assert m.counter_value(
        "flapi_cache_refreshes", {"table": "s.t", "mode": "full_refresh"}
    ) == 2
    assert m.counter_value(
        "flapi_cache_rows_committed", {"table": "s.t"}
    ) == 2 * region.count()
