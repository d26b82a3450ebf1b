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
