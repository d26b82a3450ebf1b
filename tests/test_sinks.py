"""Partitioned/sized sink writers: round-trips, partition pruning on
read-back, file sizing."""

import glob
import os

from pyspark.sql import functions as F

from flapi_spark.session import load_table
from flapi_spark.sinks import write_csv, write_json, write_parquet


def test_partitioned_parquet_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_part")
    write_parquet(docs, out, partition_by=["lang"])

    # hive layout on disk
    langs = {os.path.basename(p).split("=")[1]
             for p in glob.glob(f"{out}/lang=*")}
    assert "en" in langs and len(langs) >= 2

    back = spark.read.parquet(out)
    assert back.count() == docs.count()

    # a filter on the partition column must prune directories, not
    # filter rows: PartitionFilters in the scan, nothing in Filter
    plan = (
        back.where(F.col("lang") == "en")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [" in plan
    assert "lang" in plan.split("PartitionFilters:")[1].split("]")[0]


def test_parquet_max_records_per_file(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").coalesce(1)
    out = str(tmp_path / "docs_sized")
    write_parquet(docs, out, max_records_per_file=100)
    files = glob.glob(f"{out}/*.parquet")
    n = docs.count()
    assert len(files) >= n // 100  # writer rolled files at the cap
    for f in files:
        assert spark.read.parquet(f).count() <= 100


def test_parquet_target_files(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_nfiles")
    write_parquet(docs, out, target_files=3)
    assert len(glob.glob(f"{out}/*.parquet")) == 3


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    csv_out = str(tmp_path / "docs_csv")
    json_out = str(tmp_path / "docs_json")
    write_csv(docs, csv_out, target_files=1)
    write_json(docs, json_out, compression="gzip", target_files=1)

    csv_back = spark.read.option("header", "true").csv(csv_out)
    assert csv_back.count() == docs.count()
    assert set(csv_back.columns) == set(docs.columns)

    json_back = spark.read.json(json_out)
    assert json_back.count() == docs.count()
    assert glob.glob(f"{json_out}/*.gz")  # compressed parts


def test_append_mode_accumulates(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    out = str(tmp_path / "docs_append")
    write_parquet(docs, out, mode="overwrite")
    write_parquet(docs, out, mode="append")
    assert spark.read.parquet(out).count() == 20


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    from flapi_spark.sinks import compact_parquet

    docs = load_table(spark, sf_dir, "documents")
    frag = str(tmp_path / "fragmented")
    # simulate a micro-batch landing zone: 50 tiny files
    docs.repartition(50).write.parquet(frag)
    out = str(tmp_path / "compacted")
    stats = compact_parquet(spark, frag, out, target_files=2)
    assert stats["files_before"] == 50
    assert stats["files_after"] == 2
    assert stats["rows"] == docs.count()
    assert spark.read.parquet(out).count() == docs.count()


def test_idempotent_batch_writer_skips_replayed_batches(spark, tmp_path):
    """foreachBatch replays after failure reuse the batch_id — the
    sink must commit once and skip the replay (exactly-once output
    from at-least-once delivery)."""
    import glob
    import os

    from flapi_spark.sinks import idempotent_batch_writer

    out = str(tmp_path / "sink")
    write = idempotent_batch_writer(out)
    df1 = spark.range(100).withColumnRenamed("id", "v")
    write(df1, 0)
    first = sorted(glob.glob(out + "/batch_id=0/*.parquet"))
    mtimes = [os.path.getmtime(p) for p in first]
    # replay with the same batch id but different data: must be a no-op
    write(spark.range(5).withColumnRenamed("id", "v"), 0)
    assert sorted(glob.glob(out + "/batch_id=0/*.parquet")) == first
    assert [os.path.getmtime(p) for p in first] == mtimes
    # a NEW batch id commits normally
    write(spark.range(7).withColumnRenamed("id", "v"), 1)
    got = spark.read.parquet(out).count()
    assert got == 107


def test_idempotent_batch_writer_end_to_end_stream(spark, tmp_path, sf_dir):
    """Drive it through a real availableNow stream over the events
    landing files; rerunning the whole stream with a FRESH checkpoint
    replays batch ids — output must not duplicate."""
    import shutil as _sh

    from flapi_spark import streaming as ST
    from flapi_spark.sinks import idempotent_batch_writer

    landing = tmp_path / "landing"
    landing.mkdir()
    _sh.copy(f"{sf_dir}/events.parquet", landing / "events.parquet")
    out = str(tmp_path / "sink")
    n_src = spark.read.parquet(str(landing)).count()

    def run(cp: str) -> None:
        events = ST.read_events_stream(spark, str(landing))
        q = (
            events.writeStream.foreachBatch(idempotent_batch_writer(out))
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(str(tmp_path / "cp1"))
    assert spark.read.parquet(out).count() == n_src
    # fresh checkpoint -> batch ids restart at 0 -> all replays skipped
    run(str(tmp_path / "cp2"))
    assert spark.read.parquet(out).count() == n_src
