"""Python DataSource connector (flapi_jsonl) — partition planning,
NULL fill for missing keys, and error paths."""

import json

import pytest

from flapi_spark.sources.pyds import register


@pytest.fixture
def landing(tmp_path):
    rows_a = [
        {"doc_id": 1, "lang": "en", "source": "s0", "n_chars": 10},
        {"doc_id": 2, "lang": "de", "source": "s1", "n_chars": 20},
    ]
    rows_b = [
        {"doc_id": 3, "lang": "en", "n_chars": 30},  # missing `source`
    ]
    for name, rows in (("a.jsonl", rows_a), ("b.jsonl", rows_b)):
        with open(tmp_path / name, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
    return str(tmp_path)


def test_reads_rows_and_fills_missing_keys_null(spark, landing):
    register(spark)
    df = spark.read.format("flapi_jsonl").option("path", landing).load()
    got = {r.doc_id: (r.lang, r.source, r.n_chars) for r in df.collect()}
    assert got == {
        1: ("en", "s0", 10),
        2: ("de", "s1", 20),
        3: ("en", None, 30),  # missing key → NULL
    }


def test_one_partition_per_file(spark, landing):
    register(spark)
    df = spark.read.format("flapi_jsonl").option("path", landing).load()
    assert df.rdd.getNumPartitions() == 2


def test_custom_schema_projection(spark, landing):
    register(spark)
    df = (
        spark.read.format("flapi_jsonl")
        .schema("doc_id BIGINT, lang STRING")
        .option("path", landing)
        .load()
    )
    assert df.columns == ["doc_id", "lang"]
    assert df.count() == 3


def test_missing_path_and_empty_dir_error(spark, tmp_path):
    register(spark)
    with pytest.raises(Exception, match="path"):
        spark.read.format("flapi_jsonl").load().collect()
    with pytest.raises(Exception, match="no .jsonl files"):
        (
            spark.read.format("flapi_jsonl")
            .option("path", str(tmp_path))
            .load()
            .collect()
        )


def test_jsonl_stream_reader_tails_landing_zone(spark, tmp_path):
    """readStream over the custom connector: two availableNow passes —
    the checkpointed file-list offset makes the second run ingest ONLY
    the file that appeared in between (exactly-once at file grain)."""
    import json as _json

    from flapi_spark.sources.pyds import register

    register(spark)
    land = tmp_path / "land"
    land.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_rows = []

    def write_file(name, rows):
        with open(land / name, "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")

    write_file("a.jsonl", [{"doc_id": 1, "lang": "en", "source": "s", "n_chars": 3}])

    out = str(tmp_path / "out")

    def run_once():
        stream = (
            spark.readStream.format("flapi_jsonl")
            .option("path", str(land))
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [r.doc_id for r in spark.read.parquet(out).collect()]

    first = run_once()
    assert first == [1]
    write_file("b.jsonl", [{"doc_id": 2, "lang": "de", "source": "s", "n_chars": 5}])
    second = run_once()
    # the checkpointed file-list offset prevented re-reading a.jsonl:
    # doc 1 appears exactly once across both runs
    assert sorted(second) == [1, 2]


class TestDuckDBDataSource:
    """Live heterogeneous-source read: Spark scanning an embedded
    DuckDB engine (parquet query + attached .duckdb database),
    Arrow-batched, with predicate-split partitioning."""

    def test_query_over_parquet(self, spark, sf_dir):
        from flapi_spark.sources.pyds import register

        register(spark)
        df = (
            spark.read.format("flapi_duckdb")
            .option("schema", "r_regionkey BIGINT, r_name STRING")
            .option(
                "query",
                f"SELECT r_regionkey, r_name FROM '{sf_dir}/region.parquet'"
                " ORDER BY r_regionkey",
            )
            .load()
        )
        rows = df.collect()
        assert len(rows) == 5
        assert rows[0].r_name is not None

    def test_partitioned_read_matches_single(self, spark, sf_dir):
        from flapi_spark.sources.pyds import register

        register(spark)
        base = (
            spark.read.format("flapi_duckdb")
            .option("schema", "o_orderkey BIGINT, o_custkey BIGINT")
            .option(
                "query",
                f"SELECT o_orderkey, o_custkey FROM '{sf_dir}/orders.parquet'",
            )
        )
        single = base.load()
        split = (
            base.option("partition_column", "o_orderkey")
            .option("num_partitions", "4")
            .load()
        )
        assert split.rdd.getNumPartitions() == 4
        assert split.count() == single.count()
        assert (
            split.exceptAll(single).count() == 0
            and single.exceptAll(split).count() == 0
        )

    def test_attached_database(self, spark, tmp_path):
        import duckdb

        from flapi_spark.sources.pyds import register

        db = str(tmp_path / "t.duckdb")
        con = duckdb.connect(db)
        con.execute("CREATE TABLE kv (k BIGINT, v VARCHAR)")
        con.execute("INSERT INTO kv VALUES (1, 'a'), (2, 'b')")
        con.close()
        register(spark)
        df = (
            spark.read.format("flapi_duckdb")
            .option("schema", "k BIGINT, v STRING")
            .option("database", db)
            .option("query", "SELECT k, v FROM kv ORDER BY k")
            .load()
        )
        assert [tuple(r) for r in df.collect()] == [(1, "a"), (2, "b")]

    def test_missing_options_raise(self, spark):
        from flapi_spark.sources.pyds import register

        register(spark)
        import pytest as _pytest
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PySparkException

        with _pytest.raises((Py4JJavaError, PySparkException, Exception)):
            spark.read.format("flapi_duckdb").option(
                "schema", "x BIGINT"
            ).load().collect()


def test_duckdb_connection_through_registry(spark, sf_dir):
    """connections: {format: duckdb} routes through the flapi_duckdb
    DataSource — the ATTACH-style connection config end-to-end."""
    from flapi_spark.sources.registry import Connection

    conn = Connection(
        name="duck",
        format="duckdb",
        properties={
            "schema": "r_regionkey BIGINT, r_name STRING",
            "query": (
                "SELECT r_regionkey, r_name"
                f" FROM '{sf_dir}/region.parquet' ORDER BY r_regionkey"
            ),
        },
    )
    assert conn.read(spark).count() == 5
