"""SparkSession factory tuned for the engine.

Defaults are sized for local[N] testing but every knob matters at
cluster scale: AQE (runtime re-planning + skew-join splitting),
auto-broadcast for dimension tables, Arrow for the few Pandas-UDF
paths, and shuffle partitions sized to the environment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flapi_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("FLAPI_SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # NOTE: keep parallelismFirst at its default (true). Setting it
        # false coalesces by bytes (64m advisory) which collapses
        # compute-dense-but-small shuffles (e.g. MinHash signatures:
        # tiny bytes, millions of hash evaluations) onto one core.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.ts is parquet TIMESTAMP(NANOS) which the Spark
        # reader rejects; read as long and convert in register_views.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("FLAPI_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Lazy DataFrame over one testdata parquet table.

    Plain ``spark.read.parquet`` (no cache) so Catalyst pushes filters
    and projections from downstream plans into the scan.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if name == "events":
        # testdata events.ts is parquet TIMESTAMP(NANOS), which Spark's
        # reader rejects unless nanosAsLong is on. get_spark sets it at
        # build time, but callers may hand us a vanilla SparkSession —
        # the conf is runtime-settable, so set it here before the read.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # parquet TIMESTAMP(NANOS) read as long (nanosAsLong): truncate
        # to micros — the same truncation DuckDB applies when casting
        # TIMESTAMP_NS to TIMESTAMP, so oracles agree.
        # integer DIV, not double division — int64 nanos exceed a
        # double's 53-bit mantissa and would round the last microsecond
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def _scan_bytes(sf_dir: str, name: str) -> int:
    """On-disk bytes of one testdata table (file or directory)."""
    p = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(p):
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _dirs, files in os.walk(p)
            for f in files
        )
    return os.path.getsize(p) if os.path.exists(p) else 0


def spread(df, key: str = "doc_id", sf_dir: str | None = None,
           table: str = "documents"):
    """Hash-repartition a scan across the cluster when it arrives in
    fewer splits than cores — the single-row-group parquet trap: a
    tiny-bytes corpus lands as ONE input split, serializing every
    compute-dense per-token stage (md5 hashing, explodes) onto one
    core (guide §2.5: repartition immediately after a skewed read).
    The exchange is conditional on the scan's expected split count
    (table bytes / maxPartitionBytes, a pure file-metadata check — a
    .rdd.getNumPartitions() probe measured 0.7-1.2 s of plan-convert
    overhead PER QUERY), so at production scale — where the scan
    already yields >= cores splits — NO corpus-wide shuffle is
    added; it only fires when the shuffle is small by construction
    (the whole input fits in fewer splits than cores). Without
    `sf_dir` the split count cannot be estimated and the exchange is
    applied unconditionally (callers on the tiny-corpus path).
    """
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    if sf_dir is not None:
        try:
            max_split = int(
                spark.conf.get(
                    "spark.sql.files.maxPartitionBytes", "134217728"
                ).rstrip("b")
            )
        except ValueError:  # size suffix form ("1g") — default is fine
            max_split = 128 * 1024 * 1024
        if _scan_bytes(sf_dir, table) >= n * max_split:
            return df
    return df.repartition(n, key)


def register_views(spark: SparkSession, sf_dir: str, tables=TPCH_TABLES) -> None:
    """Register each parquet table as a temp view named after the table."""
    for name in tables:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
