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
