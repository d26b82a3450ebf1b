"""Real JDBC source-path test against embedded Derby (the jars ship
with Spark for the Hive metastore, so no network or install needed).
Exercises the same Connection(format=jdbc) path a Postgres/MySQL
deployment uses — only the url/driver differ."""

import pytest

from flapi_spark.sources.registry import Connection


@pytest.fixture(scope="module")
def derby_table(spark, tmp_path_factory):
    db = str(tmp_path_factory.mktemp("derby") / "testdb")
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(f"jdbc:derby:{db};create=true")
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE people (id INT PRIMARY KEY, name VARCHAR(32), score DOUBLE)"
    )
    for i, (name, score) in enumerate(
        [("ada", 9.5), ("grace", 9.9), ("alan", 9.7), ("edsger", 9.1)]
    ):
        st.executeUpdate(
            f"INSERT INTO people VALUES ({i}, '{name}', {score})"
        )
    st.close()
    conn.close()
    return db


def test_jdbc_connection_reads_table(spark, derby_table):
    conn = Connection(
        name="derby-people",
        format="jdbc",
        properties={
            "url": f"jdbc:derby:{derby_table}",
            "dbtable": "people",
            "driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver",
        },
    )
    df = conn.read(spark)
    rows = {r.ID: (r.NAME, r.SCORE) for r in df.collect()}
    assert rows[1] == ("grace", 9.9)
    assert len(rows) == 4


def test_jdbc_pushdown_reaches_source(spark, derby_table):
    conn = Connection(
        name="derby-people",
        format="jdbc",
        properties={
            "url": f"jdbc:derby:{derby_table}",
            "dbtable": "people",
            "driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver",
        },
    )
    df = conn.read(spark).where("score > 9.6").select("NAME")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # filter + projection land in the JDBC scan, not in Spark
    assert "PushedFilters" in plan or "pushedFilters" in plan.lower()
    assert {r.NAME for r in df.collect()} == {"grace", "alan"}


def test_jdbc_view_joins_with_parquet(spark, derby_table, sf_dir):
    """Federated shape: JDBC table joined against a parquet table —
    the reference reaches external DBs through DuckDB extensions; here
    both sides are first-class DataFrames."""
    from flapi_spark.session import load_table

    conn = Connection(
        name="derby-people",
        format="jdbc",
        properties={
            "url": f"jdbc:derby:{derby_table}",
            "dbtable": "people",
            "driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver",
        },
    )
    people = conn.read(spark)
    cust = load_table(spark, sf_dir, "customer").limit(10)
    joined = cust.join(people, cust.c_custkey == people.ID)
    assert joined.count() == 4  # ids 0-3 overlap
