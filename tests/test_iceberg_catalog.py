"""Live Iceberg-on-files round-trip (reference: database_manager.cpp
Iceberg ATTACH path). Requires the iceberg-spark-runtime jar, which is
not shipped in stock PySpark — the whole module skips when absent so
the test is live the moment a deployment adds the jar.

The configuration under test is the real production shape: a
`SparkCatalog` with a `hadoop` warehouse on a local dir — identical
semantics to an s3:// warehouse minus the network."""

import pytest


def _iceberg_available() -> bool:
    import glob
    import os

    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    return bool(glob.glob(os.path.join(jars, "*iceberg-spark-runtime*")))


pytestmark = pytest.mark.skipif(
    not _iceberg_available(),
    reason="iceberg-spark-runtime jar not on the Spark classpath",
)


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    from pyspark.sql import SparkSession

    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg_roundtrip")
        .config(
            "spark.sql.catalog.ice",
            "org.apache.iceberg.spark.SparkCatalog",
        )
        .config("spark.sql.catalog.ice.type", "hadoop")
        .config("spark.sql.catalog.ice.warehouse", wh)
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions."
            "IcebergSparkSessionExtensions",
        )
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_iceberg_write_read_time_travel(iceberg_spark):
    s = iceberg_spark
    s.sql("CREATE TABLE ice.db.t (id BIGINT, v STRING) USING iceberg")
    s.sql("INSERT INTO ice.db.t VALUES (1, 'a'), (2, 'b')")
    first = [r.snapshot_id for r in s.sql(
        "SELECT snapshot_id FROM ice.db.t.snapshots ORDER BY committed_at"
    ).collect()][0]
    s.sql("INSERT INTO ice.db.t VALUES (3, 'c')")
    assert s.table("ice.db.t").count() == 3
    # time travel back to the first snapshot
    old = s.read.option("snapshot-id", str(first)).format("iceberg").load(
        "ice.db.t"
    )
    assert old.count() == 2
    # schema evolution survives
    s.sql("ALTER TABLE ice.db.t ADD COLUMN w DOUBLE")
    s.sql("INSERT INTO ice.db.t VALUES (4, 'd', 1.5)")
    assert s.table("ice.db.t").where("w = 1.5").count() == 1
