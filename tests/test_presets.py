"""Source preset translation (reference: per-connection DuckDB
extension attach, database_manager.cpp:251-310; Spark-side the
translation is config -> reader format + options)."""
import pytest

from flapi_spark.sources.presets import has_preset, reader_spec
from flapi_spark.sources.registry import Connection, SourceUnavailableError


def test_postgres_preset():
    fmt, opts = reader_spec("postgres", {
        "host": "db.internal", "port": 5433, "database": "sales",
        "schema": "public", "table": "orders",
        "user": "u", "password": "p", "numPartitions": 8,
        "partitionColumn": "id", "lowerBound": 0, "upperBound": 100000,
    })
    assert fmt == "jdbc"
    assert opts["url"] == "jdbc:postgresql://db.internal:5433/sales"
    assert opts["driver"] == "org.postgresql.Driver"
    assert opts["dbtable"] == "public.orders"
    assert opts["numPartitions"] == "8" and opts["partitionColumn"] == "id"


def test_postgres_defaults_and_query():
    fmt, opts = reader_spec("postgresql", {
        "database": "d", "query": "SELECT 1 AS x",
    })
    assert opts["url"] == "jdbc:postgresql://localhost:5432/d"
    assert opts["query"] == "SELECT 1 AS x" and "dbtable" not in opts


def test_mysql_preset_with_url_params():
    fmt, opts = reader_spec("mysql", {
        "host": "h", "database": "d", "table": "t",
        "url_params": {"useSSL": "false", "serverTimezone": "UTC"},
    })
    assert fmt == "jdbc"
    assert opts["url"] == "jdbc:mysql://h:3306/d?serverTimezone=UTC&useSSL=false"
    assert opts["driver"] == "com.mysql.cj.jdbc.Driver"
    assert opts["dbtable"] == "t"


def test_bigquery_preset():
    fmt, opts = reader_spec("bigquery", {
        "project_id": "my-proj", "dataset": "ds", "table": "events",
        "credentials_file": "/sa.json", "views_enabled": True,
    })
    assert fmt == "bigquery"
    assert opts["parentProject"] == "my-proj"
    assert opts["table"] == "ds.events"
    assert opts["credentialsFile"] == "/sa.json"
    assert opts["viewsEnabled"] == "true"
    # fully-qualified table wins over dataset prefixing
    _, o2 = reader_spec("bigquery", {"table": "ds2.t2", "dataset": "ds"})
    assert o2["table"] == "ds2.t2"


def test_unknown_format():
    assert not has_preset("mongodb")
    with pytest.raises(KeyError):
        reader_spec("mongodb", {})


def test_registry_surfaces_unavailable_connector(spark):
    """The live read is availability-gated like generic jdbc: without
    the postgres driver on the classpath the connection raises
    SourceUnavailableError, not an opaque crash."""
    from flapi_spark.sources.registry import Connection, SourceUnavailableError

    conn = Connection(name="pg", format="postgres",
                      properties={"database": "d", "table": "t"})
    with pytest.raises(SourceUnavailableError):
        conn.read(spark)


def test_sap_rfc_preset_translates_rfc_credentials():
    fmt, opts = reader_spec("sap_rfc", {
        "ashost": "localhost", "sysnr": "00", "client": "001",
        "user": "DEVELOPER", "passwd": "secret", "lang": "EN",
        "table": "SFLIGHT",
    })
    assert fmt == "sap_rfc"
    assert opts == {
        "ASHOST": "localhost", "SYSNR": "00", "CLIENT": "001",
        "USER": "DEVELOPER", "PASSWD": "secret", "LANG": "EN",
        "TABLE": "SFLIGHT",
    }
    assert has_preset("sap") and has_preset("sap_rfc")


def test_sap_read_table_rewrite_end_to_end(spark):
    from flapi_spark.sources.sap import rewrite_sap_read_table

    conn = Connection(name="sap-abap-trial", format="sap_rfc",
                      properties={"ashost": "h", "sysnr": "00"})
    served = []

    def fake_reader(spark_, conn_, table):
        served.append((conn_.name, table))
        return spark_.createDataFrame(
            [(1, "LH"), (2, "AA")], "connid INT, carrid STRING"
        )

    sql = ("SELECT carrid, count(*) AS n FROM sap_read_table('SFLIGHT')"
           " AS f GROUP BY carrid")
    out = rewrite_sap_read_table(spark, sql, conn, reader=fake_reader)
    assert "sap_read_table" not in out
    assert "sap_sflight" in out
    assert served == [("sap-abap-trial", "SFLIGHT")]
    rows = {r.carrid: r.n for r in spark.sql(out).collect()}
    assert rows == {"LH": 1, "AA": 1}


def test_sap_read_unavailable_without_connector(spark):
    conn = Connection(name="sap", format="sap_rfc",
                      properties={"ashost": "h", "table": "SFLIGHT"})
    with pytest.raises(SourceUnavailableError):
        conn.read(spark)


def test_sap_rewrite_through_executor(spark):
    from flapi_spark.config import EndpointConfig
    from flapi_spark.executor import QueryExecutor
    from flapi_spark.sources.registry import ConnectionRegistry

    conn = Connection(name="sap-abap-trial", format="sap_rfc",
                      properties={"ashost": "h"})
    # pre-register the view the rewrite will target, with a local
    # stand-in (the executor's default reader is availability-gated)
    spark.createDataFrame(
        [(17, "LH")], "connid INT, carrid STRING"
    ).createOrReplaceTempView("sap_sflight")
    import flapi_spark.sources.sap as sap_mod

    orig = sap_mod._default_reader
    sap_mod._default_reader = lambda s, c, t: s.table("sap_" + t.lower())
    try:
        ex = QueryExecutor(spark, registry=ConnectionRegistry({conn.name: conn}))
        ep = EndpointConfig(
            url_path="/sap/flights",
            template_text="SELECT carrid FROM sap_read_table('SFLIGHT') AS f",
            connections=["sap-abap-trial"],
            with_pagination=False,
        )
        res = ex.execute(ep)
        assert [r.carrid for r in res.df.collect()] == ["LH"]
    finally:
        sap_mod._default_reader = orig


def test_bigquery_query_rewrite_end_to_end(spark):
    """bigquery_query('project', 'SELECT …') table-function syntax
    (reference: examples/sqls/recommendations/bydevice_cache.sql via
    the DuckDB bigquery community extension) rewrites to a
    query-pushdown temp view; an injected local reader proves the
    flow without the connector jar. Repeated identical calls share
    one view; distinct inner queries get distinct views; '' unescapes
    to a literal quote before the pushdown."""
    from flapi_spark.sources.bigquery import rewrite_bigquery_query
    from flapi_spark.sources.registry import Connection

    conn = Connection(name="bq", format="bigquery", properties={})
    seen = []

    def fake_reader(spark_, conn_, project, inner_sql):
        seen.append((project, inner_sql))
        return spark_.createDataFrame(
            [(project, inner_sql, 1)], "proj string, q string, v int"
        )

    sql = (
        "SELECT a.v + b.v AS s FROM"
        " bigquery_query('proj-1', 'SELECT * FROM ds.t1') a,"
        " bigquery_query('proj-1', 'SELECT * FROM ds.t1') b"
    )
    out = rewrite_bigquery_query(spark, sql, conn, reader=fake_reader)
    assert "bigquery_query" not in out.lower()
    assert len(seen) == 1  # identical calls share one view/read
    assert spark.sql(out).collect()[0].s == 2

    sql2 = (
        "SELECT * FROM bigquery_query('p', 'SELECT ''x'' AS lit')"
    )
    out2 = rewrite_bigquery_query(spark, sql2, conn, reader=fake_reader)
    assert seen[-1] == ("p", "SELECT 'x' AS lit")  # '' unescaped
    assert spark.sql(out2).count() == 1


def test_bigquery_rewrite_wired_into_executor(spark):
    from flapi_spark import sources
    from flapi_spark.config import EndpointConfig
    from flapi_spark.executor import QueryExecutor
    from flapi_spark.sources.registry import Connection, ConnectionRegistry

    reg = ConnectionRegistry()
    reg.add(Connection(name="bq", format="bigquery", properties={}))
    ex = QueryExecutor(spark, reg)
    ep = EndpointConfig.from_dict({
        "url-path": "/bq",
        "template-text":
            "SELECT * FROM bigquery_query('p', 'SELECT 1 AS one')",
        "connection": ["bq"],
        "with-pagination": False,
    })
    import flapi_spark.sources.bigquery as B

    orig = B._default_reader
    B._default_reader = lambda s, c, p, q: s.createDataFrame(
        [(1,)], "one int"
    )
    try:
        res = ex.execute(ep, {})
        assert res.df.collect()[0].one == 1
    finally:
        B._default_reader = orig
