import os

import pytest

SF_SMOKE = os.environ.get("FLAPI_SPARK_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from flapi_spark.session import get_spark

    spark = get_spark(app_name="flapi_spark_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def views(spark, sf_dir):
    from flapi_spark.session import register_views

    register_views(spark, sf_dir)
    return sf_dir


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(SF_SMOKE, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def assert_df_matches_oracle(spark_df, duck_con, oracle_sql, float_tol=1e-9):
    """Order-insensitive comparison of a Spark DataFrame against a DuckDB
    oracle query — the same contract the driver's correctness gate uses
    (columns sorted by name, rows sorted, values compared)."""
    import math

    cols = sorted(spark_df.columns)
    spark_rows = [tuple(row[c] for c in cols) for row in spark_df.collect()]

    duck_res = duck_con.execute(oracle_sql)
    duck_cols = [d[0] for d in duck_res.description]
    assert sorted(duck_cols) == cols, f"column mismatch: {sorted(duck_cols)} vs {cols}"
    idx = [duck_cols.index(c) for c in cols]
    duck_rows = [tuple(r[i] for i in idx) for r in duck_res.fetchall()]

    def norm(v):
        if isinstance(v, float):
            return round(v, 9)
        return v

    def key(t):
        return tuple(str(norm(x)) for x in t)

    spark_sorted = sorted(spark_rows, key=key)
    duck_sorted = sorted(duck_rows, key=key)
    assert len(spark_sorted) == len(duck_sorted), (
        f"row count {len(spark_sorted)} vs oracle {len(duck_sorted)}"
    )
    for sr, dr in zip(spark_sorted, duck_sorted):
        for sv, dv in zip(sr, dr):
            if isinstance(sv, float) or isinstance(dv, float):
                assert sv is not None and dv is not None and math.isclose(
                    float(sv), float(dv), rel_tol=float_tol, abs_tol=float_tol
                ), f"value mismatch {sv} vs {dv} in row {sr} vs {dr}"
            else:
                assert str(sv) == str(dv), f"value mismatch {sv!r} vs {dv!r} in row {sr} vs {dr}"
