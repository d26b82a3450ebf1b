"""Data-quality expectations: fused row-level pass, unique, FK; clean
data passes, injected violations are counted exactly."""

from pyspark.sql import functions as F

from flapi_spark.quality import (
    accepted_values, dq_orders_expectations, in_range, not_null,
    references, run_expectations, unique,
)


def test_orders_expectations_all_pass(spark, sf_dir):
    rows = {(r.rule, r.column): r for r in
            dq_orders_expectations(spark, sf_dir).collect()}
    assert len(rows) == 6
    for r in rows.values():
        assert r.passed and r.violations == 0


def test_injected_violations_counted(spark):
    df = spark.createDataFrame(
        [
            (1, "A", 10.0, 100),
            (1, "A", 20.0, 100),   # dup id
            (None, "B", -5.0, 200),  # null id, bad status, below range
            (3, "A", 999.0, 999),  # orphan fk
        ],
        "id LONG, status STRING, amount DOUBLE, fk LONG",
    )
    ref = spark.createDataFrame([(100,), (200,)], "k LONG")
    rep = {(r.rule, r.column): r.violations for r in run_expectations(
        df,
        [
            not_null("id"),
            unique("id"),
            accepted_values("status", ["A"]),
            in_range("amount", 0.0, 100.0),
            references("fk", ref, "k"),
        ],
    ).collect()}
    assert rep[("not_null", "id")] == 1
    assert rep[("unique", "id")] == 1       # one extra copy of id=1
    assert rep[("accepted_values", "status")] == 1
    assert rep[("in_range", "amount")] == 2  # -5 below, 999 above
    assert rep[("references", "fk")] == 1    # fk=999 orphan


def test_row_level_rules_fuse_into_one_scan(spark, sf_dir):
    from flapi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    rep = run_expectations(
        orders,
        [not_null("o_orderkey"), in_range("o_totalprice", 0.0, 1e6),
         accepted_values("o_orderstatus", ["F", "O", "P"])],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # one scan of orders, one aggregate — no join, no extra exchange
    assert plan.count("FileScan parquet") == 1
    assert "Join" not in plan


def test_freshness_fresh_and_stale(spark, sf_dir):
    from flapi_spark.quality import freshness, run_expectations
    from flapi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg({"ts": "max"}).first()[0]
    as_of = mx.strftime("%Y-%m-%d %H:%M:%S")
    fresh = run_expectations(
        ev, [freshness("ts", "2 DAYS", as_of=as_of)]
    ).collect()[0]
    assert fresh.passed and fresh.violations == 0
    # evaluate a month after the newest event: stale
    import datetime

    later = (mx + datetime.timedelta(days=30)).strftime("%Y-%m-%d %H:%M:%S")
    stale = run_expectations(
        ev, [freshness("ts", "2 DAYS", as_of=later)]
    ).collect()[0]
    assert not stale.passed and stale.violations == 1


def test_freshness_requires_valid_as_of_and_interval():
    import pytest as _pytest

    from flapi_spark.quality import freshness

    with _pytest.raises(ValueError, match="required"):
        freshness("ts", "2 days", None)
    with _pytest.raises(ValueError, match="timestamp"):
        freshness("ts", "2 days", "not-a-time")
    with _pytest.raises(ValueError, match="INTERVAL"):
        freshness("ts", "2; DROP TABLE x", "2024-06-01 00:00:00")
    r = freshness("ts", "2 days", "2024-06-01 00:00:00")
    assert r.kind == "freshness"
