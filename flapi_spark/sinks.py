"""Result sinks: partitioned / sized parquet, csv, json writers.

The reference is read-only over its sources but its cache layer
writes DuckLake/parquet snapshots (cache_manager.cpp); at Spark scale
the write path is as important as the read path — a 100 TB pipeline
ends in a partitioned columnar dataset that downstream scans can
prune. These writers wrap the idiomatic DataFrameWriter with the
knobs that matter at scale:

- `partition_by`: hive-style directory partitioning so downstream
  filters on the partition columns become directory pruning (zero
  I/O for excluded partitions) rather than row filtering.
- `max_records_per_file`: bounds individual file size without an
  extra repartition shuffle (the writer rolls files).
- `target_files`: optional repartition before write — at 1000
  executors an unrepartitioned write emits one file per task, and
  thousands of KB-sized files poison the downstream scan (the
  small-files problem); conversely a single giant file kills read
  parallelism.

Bucketed table writes live in operators/scale.py:write_bucketed
(they need the session catalog); this module is pure path-based.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
    target_files: int | None = None,
    compression: str = "snappy",
) -> None:
    """Partitioned parquet dataset write.

    When `partition_by` is set, rows are laid out as
    `path/col=value/...` so a later `read.parquet(path).where(col=v)`
    plans PartitionFilters (directory pruning), not a data filter."""
    if target_files:
        df = (
            df.repartition(target_files, *partition_by)
            if partition_by
            else df.repartition(target_files)
        )
    w = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    compression: str | None = None,
    target_files: int | None = None,
) -> None:
    """CSV dataset write (the executor's serializers cover single
    API responses; this is the bulk-export path)."""
    if target_files:
        df = df.repartition(target_files)
    w = df.write.mode(mode).option("header", str(header).lower())
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def write_json(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
    target_files: int | None = None,
) -> None:
    """JSON-lines dataset write."""
    if target_files:
        df = df.repartition(target_files)
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_files: int,
    partition_by: list[str] | None = None,
) -> dict:
    """Small-files compaction: rewrite a parquet dataset into
    `target_files` files (per partition directory when `partition_by`
    is given) — the maintenance pass every long-lived landing zone
    needs. A streaming ingest that commits a file per micro-batch per
    task accumulates thousands of KB-files; scans then pay per-file
    open/footer costs and lose column-chunk locality. Compaction is
    one read + one shuffle-free coalesce-style write (repartition by
    the partition columns when present so files stay partition-pure).

    Returns {"files_before", "files_after", "rows"} so schedulers can
    log the effect. Writes to `dst` (not in place): at scale the swap
    is a metastore/manifest pointer flip, never a destructive
    overwrite of a dataset readers may be scanning.
    """
    import glob as _glob

    df = spark.read.parquet(src)
    rows = df.count()
    files_before = len(_glob.glob(f"{src}/**/*.parquet", recursive=True))
    write_parquet(
        df, dst, partition_by=partition_by, target_files=target_files
    )
    files_after = len(_glob.glob(f"{dst}/**/*.parquet", recursive=True))
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": rows,
    }


def idempotent_batch_writer(out_dir: str):
    """Exactly-once streaming parquet sink for
    ``writeStream.foreachBatch`` (reference analogue: the cache
    manager's committed-snapshot flip; Spark contract: foreachBatch
    is at-least-once, so the SINK must deduplicate replays).

    Each micro-batch lands in ``{out_dir}/batch_id=<N>/`` and a batch
    that already committed (its ``_SUCCESS`` marker exists) is
    SKIPPED — after a failure/restart Spark replays the last batch
    with the same batch_id, and the skip turns at-least-once delivery
    into exactly-once output. Readers see only whole committed batch
    directories (Spark writes _SUCCESS last), mirroring the
    snapshot-flip pattern used by CacheManager.

    Returns the (batch_df, batch_id) -> None callable to pass to
    foreachBatch.
    """
    import os

    def _write(batch_df, batch_id: int) -> None:
        dst = os.path.join(out_dir, f"batch_id={batch_id}")
        if os.path.exists(os.path.join(dst, "_SUCCESS")):
            return  # replayed batch — already committed
        batch_df.write.mode("overwrite").parquet(dst)

    return _write
