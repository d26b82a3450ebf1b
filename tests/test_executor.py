import os

import pytest

from flapi_spark.config import EndpointConfig, ShapeConfig
from flapi_spark.executor import QueryExecutor, shape_df
from flapi_spark.sources.registry import Connection, ConnectionRegistry
from flapi_spark.validation import RequestField, ValidationError, Validator

SF = os.environ.get("FLAPI_SPARK_TEST_SF", "/root/testdata/sf0.001")


def customers_endpoint(**kw):
    """The reference's customers endpoint re-expressed
    (reference: examples/sqls/customers/customers.sql + customers-rest.yaml)."""
    return EndpointConfig(
        url_path="/customers/",
        template_text=(
            "SELECT c_custkey AS key, c_name AS name, c_acctbal AS balance,"
            " c_mktsegment AS segment"
            " FROM parquet.`{{{conn.path}}}`"
            " WHERE 1=1"
            "{{#params.id}} AND c_custkey = {{params.id}}{{/params.id}}"
            "{{#params.segment}} AND c_mktsegment = {{params.segment}}{{/params.segment}}"
        ),
        connections=["customers-parquet"],
        request_fields=[
            RequestField(field_name="id", validators=[Validator(type="int", min=1)]),
            RequestField(
                field_name="segment",
                validators=[
                    Validator(
                        type="enum",
                        allowed_values=["AUTOMOBILE", "BUILDING", "FURNITURE",
                                        "HOUSEHOLD", "MACHINERY"],
                    )
                ],
            ),
        ],
        **kw,
    )


@pytest.fixture(scope="module")
def executor(spark):
    reg = ConnectionRegistry()
    reg.add(
        Connection(
            name="customers-parquet",
            format="parquet",
            properties={"path": os.path.join(SF, "customer.parquet")},
        )
    )
    return QueryExecutor(spark, reg)


def test_render_binds_typed_params(executor):
    sql, args = executor.render(customers_endpoint(), {"id": "7"})
    assert ":id" in sql and args == {"id": 7}
    assert "segment" not in args


def test_execute_filters_by_id(executor):
    res = executor.execute(customers_endpoint(with_pagination=False), {"id": "7"})
    rows = res.df.collect()
    assert len(rows) == 1 and rows[0]["key"] == 7


def test_execute_enum_param(executor):
    res = executor.execute(
        customers_endpoint(with_pagination=False), {"segment": "BUILDING"}
    )
    segs = {r["segment"] for r in res.df.collect()}
    assert segs == {"BUILDING"}


def test_invalid_enum_rejected(executor):
    with pytest.raises(ValidationError):
        executor.execute(customers_endpoint(), {"segment": "PLASTICS"})


def test_injection_attempt_is_inert(executor):
    # typed int site: non-numeric injection payload fails validation
    with pytest.raises(ValidationError):
        executor.execute(customers_endpoint(), {"id": "1 OR 1=1"})


def test_pagination(executor):
    ep = customers_endpoint(with_pagination=True)
    res = executor.execute(ep, {"limit": "10", "offset": "5"}, order_by="key")
    rows = res.df.collect()
    assert len(rows) == 10
    assert res.total_count and res.total_count > 10
    assert [r["key"] for r in rows] == sorted(r["key"] for r in rows)
    # next page starts where this one ended
    res2 = executor.execute(ep, {"limit": "10", "offset": "15"}, order_by="key")
    assert res2.df.collect()[0]["key"] > rows[-1]["key"]


def test_shape_redact_and_max_rows(spark, executor):
    ep = customers_endpoint(
        with_pagination=False,
        shape=ShapeConfig(max_rows=5, redact_columns=["Balance"]),
    )
    res = executor.execute(ep, {})
    assert "balance" not in [c.lower() for c in res.df.columns]
    assert res.df.count() == 5
    assert res.shaped["redacted"] == ["balance"]


def test_shape_sample(spark):
    df = spark.range(100)
    shaped, info = shape_df(df, ShapeConfig(sample=7))
    assert shaped.count() == 7 and info["sampled"] is True


def test_explain_dry_run(executor):
    plan = executor.explain(customers_endpoint(), {"id": "3"})
    assert "Scan parquet" in plan or "BatchScan" in plan


def test_quoted_typed_param_binds_as_value(spark, executor):
    """'{{params.x}}' (quoted typed site, the reference's own template
    idiom) must bind the VALUE, not the literal ':x' marker text."""
    from flapi_spark.binding import rewrite_typed_params
    from flapi_spark.validation import RequestField, Validator

    fields = [RequestField(field_name="d", validators=[Validator(type="date")])]
    tpl = "SELECT * FROM t WHERE dt >= '{{params.d}}'"
    out, bound = rewrite_typed_params(tpl, fields)
    assert out == "SELECT * FROM t WHERE dt >= :d"
    assert bound == ["d"]
    # triple-brace quoted form too
    out2, _ = rewrite_typed_params(
        "SELECT * FROM t WHERE dt >= '{{{ params.d }}}'", fields
    )
    assert out2 == "SELECT * FROM t WHERE dt >= :d"
    # unquoted form unchanged behavior
    out3, _ = rewrite_typed_params("WHERE dt >= {{params.d}}", fields)
    assert out3 == "WHERE dt >= :d"
    # end-to-end through spark.sql named args: value comparison works
    df = spark.sql(
        "SELECT CASE WHEN DATE '2024-06-01' >= :d THEN 1 ELSE 0 END AS ok",
        args={"d": "2024-01-01"},
    )
    assert df.collect()[0].ok == 1


def test_multi_statement_template_runs_setup_then_result(executor):
    """A ;-separated template: temp-view setup statement, then the
    result query (reference: sql_utils.cpp splitSqlStatements + the
    request handler statement loop). Semicolons inside string
    literals must survive unsplit."""
    ep = customers_endpoint()
    ep.template_text = (
        "CREATE OR REPLACE TEMP VIEW _exec_ms AS"
        " SELECT c_custkey, c_mktsegment, ';not a split;' AS marker"
        " FROM parquet.`{{{conn.path}}}`;"
        " SELECT c_mktsegment, count(*) AS n, max(marker) AS marker"
        " FROM _exec_ms"
        "{{#params.segment}} WHERE c_mktsegment = {{params.segment}}{{/params.segment}}"
        " GROUP BY c_mktsegment"
    )
    res = executor.execute(ep, {"segment": "BUILDING"})
    rows = res.df.collect()
    assert len(rows) == 1
    assert rows[0].c_mktsegment == "BUILDING"
    assert rows[0].n > 0
    assert rows[0].marker == ";not a split;"


def test_partial_binding_escape_aware_and_repeated_markers():
    """The in-string partial rewrite must treat '' as an escape (one
    literal, not two) and must rewrite EVERY marker occurrence inside
    a literal, not just the first."""
    from flapi_spark.binding import rewrite_typed_params
    from flapi_spark.validation import RequestField, Validator

    fields = [RequestField(field_name="q", validators=[Validator(type="int")])]
    # '' escape inside the literal: naive pairing would split at the
    # escape and rewrite into broken SQL
    out, bound = rewrite_typed_params(
        "SELECT * FROM t WHERE note = 'it''s {{params.q}}'", fields
    )
    assert out == "SELECT * FROM t WHERE note = concat('it''s ', :q)"
    assert bound == ["q"]
    # repeated marker in one literal: both occurrences become pieces
    out2, _ = rewrite_typed_params(
        "SELECT * FROM t WHERE x LIKE '%{{params.q}}-{{params.q}}%'", fields
    )
    assert out2 == (
        "SELECT * FROM t WHERE x LIKE concat('%', :q, '-', :q, '%')"
    )
    # marker-only literal still collapses to the bare marker
    out3, _ = rewrite_typed_params("WHERE x = '{{params.q}}'", fields)
    assert out3 == "WHERE x = :q"


def test_concurrent_executor_queries(spark):
    """Load-shape smoke (reference: test/integration/
    test_load_testing.py exercises the server under concurrent
    clients): 8 threads share one QueryExecutor + SparkSession; every
    query returns its own correct result (Spark sessions are
    thread-safe for job submission; the executor keeps no mutable
    per-query state)."""
    import concurrent.futures as cf

    from flapi_spark.config import EndpointConfig
    from flapi_spark.executor import QueryExecutor

    ex = QueryExecutor(spark, None)

    def one(i: int) -> tuple[int, int]:
        ep = EndpointConfig.from_dict({
            "url-path": f"/t{i}",
            "template-text":
                f"SELECT {i} AS tag, count(*) AS n"
                f" FROM range({i + 1} * 100)",
            "with-pagination": False,
        })
        row = ex.execute(ep, {}).df.collect()[0]
        return row.tag, row.n

    with cf.ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(one, range(16)))
    assert results == [(i, (i + 1) * 100) for i in range(16)]
