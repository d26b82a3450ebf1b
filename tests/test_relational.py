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
