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


def test_cursor_roundtrip_and_tampering():
    import pytest as _pytest

    from flapi_spark.cursor import CursorError, decode_cursor, encode_cursor

    for v in (42, "O_199", 3.5, True, None):
        assert decode_cursor(encode_cursor(v)) == v
        assert decode_cursor(encode_cursor(v, "k"), "k") == v
    tok = encode_cursor(100, "secret")
    # flipped byte in the body -> signature mismatch
    body, sig = tok.split(".")
    bad = ("A" if body[0] != "A" else "B") + body[1:] + "." + sig
    with _pytest.raises(CursorError, match="signature"):
        decode_cursor(bad, "secret")
    with _pytest.raises(CursorError, match="signature"):
        decode_cursor(body, "secret")  # stripped signature
    with _pytest.raises(CursorError):
        decode_cursor("!!notb64!!")
    # unsigned tokens decode without a secret but are rejected by a
    # signing decoder
    with _pytest.raises(CursorError):
        decode_cursor(encode_cursor(5), "secret")


def test_cursor_drives_keyset_pagination(spark, sf_dir):
    from flapi_spark.cursor import decode_cursor, encode_cursor
    from flapi_spark.executor import paginate_keyset_sql
    from flapi_spark.session import register_views

    register_views(spark, sf_dir, tables=("orders",))
    inner = "SELECT o_orderkey, o_totalprice FROM orders"
    page1 = spark.sql(paginate_keyset_sql(inner, "o_orderkey", None, 10))
    rows1 = page1.collect()
    token = encode_cursor(rows1[-1].o_orderkey, "k")
    after = decode_cursor(token, "k")
    page2 = spark.sql(
        paginate_keyset_sql(inner, "o_orderkey", after, 10),
        args={"__after": after},
    )
    rows2 = page2.collect()
    assert rows2 and rows2[0].o_orderkey > rows1[-1].o_orderkey
    assert {r.o_orderkey for r in rows1}.isdisjoint(
        {r.o_orderkey for r in rows2}
    )


def test_metrics_registry_thread_safety():
    import threading

    m = MetricsRegistry()

    def work():
        for _ in range(2000):
            m.inc("c", {"t": "x"})
            m.observe("h", 0.01)

    threads = [threading.Thread(target=work) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert m.counter_value("c", {"t": "x"}) == 16000
    assert m.snapshot()["histograms"]["h"]["{}"]["count"] == 16000


def test_prometheus_label_values_escaped():
    from flapi_spark.metrics import MetricsRegistry

    reg = MetricsRegistry()
    reg.inc("hits", labels={"path": 'a"b\\c\nd'})
    text = reg.render_prometheus()
    line = next(l for l in text.splitlines() if l.startswith("hits_total{"))
    assert 'path="a\\"b\\\\c\\nd"' in line
    assert "\n" not in line  # the raw newline never reaches the line


class TestFlapiTelemetry:
    """Vector-mirrored from reference test_flapi_telemetry.cpp."""

    class MockBackend:
        def __init__(self):
            self.start_calls = 0
            self.stop_calls = 0
            self.last = None

        def capture_start(self, app, ver):
            self.start_calls += 1
            self.last = ("start", app, ver)

        def capture_stop(self, app, ver):
            self.stop_calls += 1
            self.last = ("stop", app, ver)

    def test_notify_start_stop_forwarded_once(self):
        from flapi_spark.metrics import FlapiTelemetry

        b = self.MockBackend()
        t = FlapiTelemetry(b, env={})
        t.notify_start("flapi", "1.2.3")
        assert b.start_calls == 1 and b.last == ("start", "flapi", "1.2.3")
        t.notify_stop("flapi", "1.2.3")
        assert b.stop_calls == 1 and b.last == ("stop", "flapi", "1.2.3")
        t.notify_start("flapi", "1.2.3")
        assert b.start_calls == 2  # each call forwarded

    def test_env_var_suppresses(self):
        from flapi_spark.metrics import FlapiTelemetry

        for val in ("1", "true", "TRUE"):
            b = self.MockBackend()
            t = FlapiTelemetry(b, env={"DATAZOO_DISABLE_TELEMETRY": val})
            t.notify_start("a", "v")
            t.notify_stop("a", "v")
            assert b.start_calls == 0 and b.stop_calls == 0
        # unset allows calls through
        b2 = self.MockBackend()
        FlapiTelemetry(b2, env={}).notify_start("a", "v")
        assert b2.start_calls == 1

    def test_set_enabled_false_suppresses(self):
        from flapi_spark.metrics import FlapiTelemetry

        b = self.MockBackend()
        t = FlapiTelemetry(b, env={})
        t.set_enabled(False)
        t.notify_start("a", "v")
        t.notify_stop("a", "v")
        assert b.start_calls == 0 and b.stop_calls == 0
        t.set_enabled(True)
        t.notify_start("a", "v")
        assert b.start_calls == 1

    def test_requires_backend(self):
        import pytest as _pytest

        from flapi_spark.metrics import FlapiTelemetry

        with _pytest.raises(ValueError):
            FlapiTelemetry(None)


def test_flapi_no_telemetry_env_also_suppresses():
    """main.cpp:536-541: FLAPI_NO_TELEMETRY (1/true/yes) suppresses
    capture exactly like DATAZOO_DISABLE_TELEMETRY."""
    from flapi_spark.metrics import FlapiTelemetry, TelemetryBackend

    class Rec(TelemetryBackend):
        def __init__(self):
            self.events = []

        def capture_start(self, n, v):
            self.events.append(("start", n, v))

        def capture_stop(self, n, v):
            self.events.append(("stop", n, v))

    b = Rec()
    t = FlapiTelemetry(b, env={"FLAPI_NO_TELEMETRY": "true"})
    t.notify_start("flapi", "1.0")
    assert b.events == []
    t2 = FlapiTelemetry(b, env={"FLAPI_NO_TELEMETRY": "0"})
    t2.notify_start("flapi", "1.0")
    assert b.events == [("start", "flapi", "1.0")]
