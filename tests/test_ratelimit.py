"""Endpoint-level rate limiting (reference: rate_limit_middleware.cpp,
rate_limit_key_builder.cpp)."""
import os

import pytest

from flapi_spark.ratelimit import (
    FixedWindowLimiter, RateLimitExceeded, build_key, check_endpoint,
)


def test_fixed_window_resets_after_interval():
    lim = FixedWindowLimiter()
    for i in range(3):
        st = lim.check("k", 3, 10.0, now=100.0 + i)
        assert st.remaining == 2 - i and st.limit == 3
    with pytest.raises(RateLimitExceeded) as ei:
        lim.check("k", 3, 10.0, now=104.0)
    assert ei.value.retry_after_s >= 1
    # window rolls over -> quota restored
    assert lim.check("k", 3, 10.0, now=110.1).remaining == 2


def test_keys_isolate_endpoints_and_principals():
    lim = FixedWindowLimiter()
    lim.check(build_key("ip", "1.2.3.4", None, "/a"), 1, 60, now=0)
    # same ip, different endpoint: fresh window
    lim.check(build_key("ip", "1.2.3.4", None, "/b"), 1, 60, now=0)
    # different ip on /a: fresh window
    lim.check(build_key("ip", "9.9.9.9", None, "/a"), 1, 60, now=0)
    with pytest.raises(RateLimitExceeded):
        lim.check(build_key("ip", "1.2.3.4", None, "/a"), 1, 60, now=1)


def test_key_strategies():
    # user: stable hash of the auth header, no plaintext token
    k1 = build_key("user", "1.1.1.1", "Bearer tok-A", "/p")
    k2 = build_key("user", "2.2.2.2", "Bearer tok-A", "/p")
    assert k1 == k2 and "tok-A" not in k1
    assert build_key("user", None, None, "/p").endswith("anonymous")
    # user-or-ip falls back to ip when unauthenticated
    assert build_key("user-or-ip", "3.3.3.3", None, "/p").endswith("3.3.3.3")
    assert build_key("user-or-ip", "3.3.3.3", "Bearer t", "/p") == build_key(
        "user", "x", "Bearer t", "/p")
    # unknown strategy preserves historical ip behavior
    assert build_key("whatever", "4.4.4.4", None, "/p").endswith("4.4.4.4")


def test_check_endpoint_disabled_and_zero_max():
    lim = FixedWindowLimiter()
    assert check_endpoint(lim, {}, "/p") is None
    assert check_endpoint(lim, {"enabled": False, "max": 5}, "/p") is None
    assert check_endpoint(lim, {"enabled": True, "max": 0}, "/p") is None


def test_executor_enforces_endpoint_rate_limit(spark):
    from flapi_spark.config import EndpointConfig
    from flapi_spark.executor import QueryExecutor
    from flapi_spark.sources.registry import Connection, ConnectionRegistry

    sf = os.environ.get("FLAPI_SPARK_TEST_SF", "/root/testdata/sf0.001")
    reg = ConnectionRegistry()
    reg.add(Connection(name="customers-parquet",
                       properties={"path": os.path.join(sf, "customer.parquet")}))
    ex = QueryExecutor(spark, reg)
    ep = EndpointConfig(
        url_path="/limited/",
        template_text="SELECT c_custkey AS key FROM parquet.`{{{conn.path}}}`",
        connections=["customers-parquet"],
        with_pagination=False,
        rate_limit={"enabled": True, "max": 2, "interval": 3600, "key": "ip"},
    )
    r1 = ex.execute(ep, {}, client_ip="10.0.0.1")
    assert r1.rate_status is not None and r1.rate_status.remaining == 1
    r2 = ex.execute(ep, {}, client_ip="10.0.0.1")
    assert r2.rate_status.remaining == 0
    with pytest.raises(RateLimitExceeded):
        ex.execute(ep, {}, client_ip="10.0.0.1")
    # another caller is unaffected; an unlimited endpoint has no status
    assert ex.execute(ep, {}, client_ip="10.0.0.2").rate_status.remaining == 1
    free = EndpointConfig(
        url_path="/free/",
        template_text="SELECT c_custkey AS key FROM parquet.`{{{conn.path}}}`",
        connections=["customers-parquet"],
        with_pagination=False,
    )
    assert ex.execute(free, {}).rate_status is None
