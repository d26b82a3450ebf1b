"""Source preset translation (reference: per-connection DuckDB
extension attach, database_manager.cpp:251-310; Spark-side the
translation is config -> reader format + options)."""
import pytest

from flapi_spark.sources.presets import has_preset, reader_spec


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
