"""Every registry query with an oracle is compared against DuckDB at
sf0.001 — the same contract as the driver's correctness gate."""

import pytest

from flapi_spark.queries import QUERIES
from tests.conftest import assert_df_matches_oracle

WITH_ORACLE = sorted(name for name, (_, sql) in QUERIES.items() if sql)
ROWS_ONLY = sorted(name for name, (_, sql) in QUERIES.items() if not sql)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    fn, oracle = QUERIES[name]
    df = fn(spark, sf_dir)
    assert_df_matches_oracle(df, duck, oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    fn, _ = QUERIES[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_gapfill_dense_spine_and_locf(spark, sf_dir):
    from flapi_spark.operators.relational import events_gapfill
    from flapi_spark.session import load_table

    rows = events_gapfill(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_types = ev.select("event_type").distinct().count()
    buckets = {r.bucket for r in rows}
    # dense: every type has every bucket of the global range
    assert len(rows) == n_types * len(buckets)
    by_type = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.bucket)):
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        last = 0.0
        for r in series:
            if r.is_gap:
                assert r.n_events == 0
                assert r.filled_value == last  # LOCF carries forward
            else:
                assert r.n_events > 0
                last = r.filled_value


def test_funnel_monotone_and_rates(spark, sf_dir):
    from flapi_spark.operators.relational import funnel_conversion

    rows = {r.stage: r for r in funnel_conversion(spark, sf_dir).collect()}
    v, c, p = (
        rows["1_view"], rows["2_click_after_view"],
        rows["3_purchase_after_click"],
    )
    assert v.n_users >= c.n_users >= p.n_users > 0
    assert v.conv_from_start == 1.0
    assert 0.0 < p.conv_from_start <= c.conv_from_start <= 1.0


def test_cohort_retention_offsets(spark, sf_dir):
    from flapi_spark.operators.relational import cohort_retention

    rows = cohort_retention(spark, sf_dir).collect()
    assert rows
    # offset 0 exists for every cohort (the signup week itself) and
    # week-0 actives are the cohort maximum (retention can only decay
    # below the full cohort size)
    by_cohort = {}
    for r in rows:
        assert r.week_offset >= 0
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.n_active_users
    for offsets in by_cohort.values():
        assert 0 in offsets
        assert offsets[0] == max(offsets.values())


def test_scd2_intervals_contiguous(spark, sf_dir):
    from flapi_spark.operators.relational import scd2_order_priority_history

    rows = scd2_order_priority_history(spark, sf_dir).collect()
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for hist in by_cust.values():
        hist.sort(key=lambda r: r.version)
        assert hist[0].version == 1
        assert [r.version for r in hist] == list(range(1, len(hist) + 1))
        # adjacent versions differ in priority and chain valid_from→valid_to
        for a, b in zip(hist, hist[1:]):
            assert a.o_orderpriority != b.o_orderpriority
            assert a.valid_to == b.valid_from
            assert not a.is_current
        assert hist[-1].is_current and hist[-1].valid_to is None


def test_linear_interp_known_series(spark, monkeypatch):
    import datetime as dt

    from flapi_spark.operators import relational as rmod

    base = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        # hour 0 observed sum=2.0, hours 1-3 missing, hour 4 observed 10.0
        (1, base, 7, "view", 2.0, "{}"),
        (2, base + dt.timedelta(hours=4), 7, "view", 10.0, "{}"),
    ]
    df = rmod.load_table.__globals__  # noqa: F841 (document intent)
    ev = None

    def fake_load(spark_, sf_dir_, name_):
        return spark.createDataFrame(
            rows,
            "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG,"
            " event_type STRING, value DOUBLE, props STRING",
        )

    monkeypatch.setattr(rmod, "load_table", fake_load)
    out = {
        int((r.bucket - dt.datetime(2024, 1, 1)).total_seconds() // 3600):
        (r.value_interp, r.is_gap)
        for r in rmod.events_linear_interp(spark, "unused").collect()
    }
    assert out[0] == (2.0, False)
    assert out[4] == (10.0, False)
    for h, want in ((1, 4.0), (2, 6.0), (3, 8.0)):
        got, gap = out[h]
        assert gap and abs(got - want) < 1e-12


def test_histogram_covers_all_orders(spark, sf_dir):
    from flapi_spark.operators.relational import histogram_order_values
    from flapi_spark.session import load_table

    rows = histogram_order_values(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == total
    for r in rows:
        assert 0 <= r.bin <= 19
        assert r.bin_lo == r.bin * 30000


def test_corr_matrix_bounds(spark, sf_dir):
    from flapi_spark.operators.relational import corr_matrix_lineitem

    r = corr_matrix_lineitem(spark, sf_dir).collect()[0]
    assert r.n > 0
    # the synthetic generator draws the measures independently, so all
    # pairwise correlations are near zero — the informative check is
    # that they're well-defined and bounded
    for c in (r.corr_qty_price, r.corr_qty_discount, r.corr_price_discount):
        assert -1.0 <= c <= 1.0


def test_asof_directions_known_case(spark):
    import datetime as dt

    from flapi_spark.operators.asof import asof_join

    t = dt.datetime(2024, 1, 1)

    def ts(m):
        return t + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, 7, ts(10)), (2, 7, ts(30)), (3, 8, ts(5))],
        "event_id LONG, user_id LONG, ts TIMESTAMP_NTZ",
    )
    right = spark.createDataFrame(
        [(7, ts(8), 1.0), (7, ts(29), 2.0), (7, ts(31), 3.0)],
        "user_id LONG, ts TIMESTAMP_NTZ, v DOUBLE",
    )
    back = {
        r.event_id: r.v
        for r in asof_join(
            left, right, on=["user_id"], ts="ts", right_value_cols=["v"]
        ).collect()
    }
    assert back == {1: 1.0, 2: 2.0, 3: None}
    fwd = {
        r.event_id: r.v
        for r in asof_join(
            left, right, on=["user_id"], ts="ts", right_value_cols=["v"],
            direction="forward",
        ).collect()
    }
    assert fwd == {1: 2.0, 2: 3.0, 3: None}
    # forward tolerance: 30-min event is 1 min from the 31-min purchase
    fwd_tol = {
        r.event_id: r.v
        for r in asof_join(
            left, right, on=["user_id"], ts="ts", right_value_cols=["v"],
            direction="forward", tolerance="5 MINUTES",
        ).collect()
    }
    assert fwd_tol == {1: None, 2: 3.0, 3: None}


def test_asof_nearest_prefers_closer_and_breaks_ties_backward(spark, sf_dir):
    from flapi_spark.operators.asof import (
        asof_join_events_orders_nearest,
    )

    rows = asof_join_events_orders_nearest(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.matched_ts is None:
            assert r.purchase_value is None
        # every match is a real purchase timestamp; distance sanity
        # (nearest can be on either side of ts)
    matched = [r for r in rows if r.matched_ts is not None]
    before = sum(1 for r in matched if r.matched_ts <= r.ts)
    after = sum(1 for r in matched if r.matched_ts > r.ts)
    assert before > 0 and after > 0  # both directions actually used


def test_rolling_7d_window_equals_manual(spark, sf_dir):
    from flapi_spark.operators.relational import rolling_revenue_7d

    rows = sorted(
        rolling_revenue_7d(spark, sf_dir).collect(), key=lambda r: r.day
    )
    by_day = {r.day: r for r in rows}
    for r in rows:
        manual_n = sum(
            o.n_orders
            for o in rows
            if 0 <= (r.day - o.day).days <= 6
        )
        assert r.n_orders_7d == manual_n
        assert abs(
            r.avg_order_value_7d - r.revenue_7d / r.n_orders_7d
        ) < 1e-9


def test_bm25_expanded_recovers_vocabulary_mismatch(spark, sf_dir):
    """round 10c: the expanded pass hits more terms per top doc than
    the base query has (expansion terms actually score), expansion
    terms exclude stopwords and originals, and weight=0 degenerates
    to the base ranking."""
    from flapi_spark.operators.relational import (
        BM25_QUERY, bm25_search, bm25_search_expanded,
    )
    from flapi_spark.operators.text import STOPWORDS

    exp = bm25_search_expanded(spark, sf_dir).collect()
    assert max(r.n_terms_hit for r in exp) > len(BM25_QUERY)
    base = {r.doc_id: r.score for r in bm25_search(spark, sf_dir).collect()}
    # weight 0: expansion parts contribute 0.0 to every fold, so the
    # top-k set ranks exactly as the base query (scores equal where
    # the doc appears in both)
    zero = bm25_search_expanded(spark, sf_dir, weight=0.0).collect()
    for r in zero:
        if r.doc_id in base:
            assert abs(r.score - base[r.doc_id]) < 1e-9
