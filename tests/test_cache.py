import datetime
import time

import pytest
from pyspark.sql import Row, functions as F

from flapi_spark.cache import CacheManager, parse_duration
from flapi_spark.config import CacheConfig


def cfg(**kw):
    base = dict(
        enabled=True,
        table="orders_cache",
        schema="analytics",
        primary_key=["id"],
        cursor_column="updated_at",
    )
    base.update(kw)
    return CacheConfig(**base)


def rows_df(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, val=v, updated_at=datetime.date.fromisoformat(d)) for i, v, d in rows]
    )


@pytest.fixture
def mgr(spark, tmp_path):
    return CacheManager(spark, tmp_path)


def test_full_refresh_and_read(spark, mgr):
    df = rows_df(spark, [(1, "a", "2026-01-01"), (2, "b", "2026-01-02")])
    info = mgr.full_refresh(cfg(), df)
    assert info.current_snapshot_id
    got = {(r.id, r.val) for r in mgr.read(cfg()).collect()}
    assert got == {(1, "a"), (2, "b")}


def test_incremental_sync_merges_latest_wins(spark, mgr):
    c = cfg()
    mgr.incremental_sync(c, rows_df(spark, [(1, "a", "2026-01-01"), (2, "b", "2026-01-02")]))
    # id=2 updated later, id=3 new, id=1 older-than-watermark (ignored)
    src = rows_df(
        spark,
        [(1, "a", "2026-01-01"), (2, "b2", "2026-01-05"), (3, "c", "2026-01-04")],
    )
    info = mgr.incremental_sync(c, src)
    got = {(r.id, r.val) for r in mgr.read(c).collect()}
    assert got == {(1, "a"), (2, "b2"), (3, "c")}
    assert info.previous_snapshot_id is not None
    assert info.cursor_watermark == "2026-01-05"


def test_incremental_sync_tie_prefers_incoming(spark, mgr):
    c = cfg()
    mgr.incremental_sync(c, rows_df(spark, [(1, "old", "2026-01-01")]))
    # same cursor value as watermark is NOT pulled (strict >) — bump it
    mgr.incremental_sync(c, rows_df(spark, [(1, "new", "2026-01-02")]))
    got = {(r.id, r.val) for r in mgr.read(c).collect()}
    assert got == {(1, "new")}


def test_snapshot_context_for_templates(spark, mgr):
    c = cfg()
    mgr.full_refresh(c, rows_df(spark, [(1, "a", "2026-01-01")]))
    mgr.full_refresh(c, rows_df(spark, [(1, "a", "2026-01-02")]))
    ctx = mgr.snapshot_info(c).template_context()
    assert "cacheSnapshotId" in ctx and "previousSnapshotId" in ctx
    assert ctx["cacheSnapshotId"] != ctx["previousSnapshotId"]


def test_read_previous_snapshot(spark, mgr):
    c = cfg()
    mgr.full_refresh(c, rows_df(spark, [(1, "v1", "2026-01-01")]))
    mgr.full_refresh(c, rows_df(spark, [(1, "v2", "2026-01-02")]))
    info = mgr.snapshot_info(c)
    old = mgr.read(c, snapshot_id=info.previous_snapshot_id)
    assert old.collect()[0].val == "v1"


def test_expire_keep_last(spark, mgr):
    c = cfg(keep_last_snapshots=2)
    for d in ("2026-01-01", "2026-01-02", "2026-01-03"):
        mgr.full_refresh(c, rows_df(spark, [(1, "x", d)]))
    expired = mgr.expire_snapshots(c)
    assert len(expired) == 1
    assert len(mgr._load_manifest(c)) == 2
    mgr.read(c)  # current still readable


def test_expire_by_age_never_drops_current(spark, mgr):
    c = cfg(max_snapshot_age="1s")
    mgr.full_refresh(c, rows_df(spark, [(1, "x", "2026-01-01")]))
    mgr.full_refresh(c, rows_df(spark, [(1, "y", "2026-01-02")]))
    expired = mgr.expire_snapshots(c, now=time.time() + 10)
    assert len(expired) == 1
    assert mgr.read(c).collect()[0].val == "y"


def test_audit_log(spark, mgr):
    c = cfg()
    mgr.full_refresh(c, rows_df(spark, [(1, "a", "2026-01-01")]))
    events = mgr.sync_events()
    assert events and events[-1]["event"] == "full_refresh"
    assert events[-1]["status"] == "success"


def test_parse_duration():
    assert parse_duration("5m") == 300
    assert parse_duration("7d") == 7 * 86400
    with pytest.raises(ValueError):
        parse_duration("soon")


def test_incremental_without_cursor_is_full_refresh(spark, mgr):
    c = cfg(cursor_column=None)
    mgr.incremental_sync(c, rows_df(spark, [(1, "a", "2026-01-01")]))
    mgr.incremental_sync(c, rows_df(spark, [(2, "b", "2026-01-02")]))
    got = {r.id for r in mgr.read(c).collect()}
    assert got == {2}  # full refresh replaced the table


def test_read_pruned_skips_files_and_matches_full_filter(spark, mgr, tmp_path):
    """Range-clustered snapshot + footer-stats pruning: a narrow
    predicate must scan a strict subset of files and return exactly
    what the unpruned filtered read returns."""
    from flapi_spark.cache import read_pruned

    c = cfg(table="pruned", primary_key=None, cursor_column=None)
    src = (
        spark.range(0, 10_000)
        .withColumnRenamed("id", "k")
        .withColumn("v", F.col("k") * 2)
        .repartitionByRange(8, "k")
        .sortWithinPartitions("k")
    )
    mgr.full_refresh(c, src)

    df, stats = read_pruned(mgr, c, "k", lo=100, hi=200)
    assert stats["files_total"] >= 8
    assert 0 < stats["files_scanned"] < stats["files_total"]
    got = sorted(r.k for r in df.collect())
    want = list(range(100, 201))
    assert got == want


def test_read_pruned_empty_range_and_unknown_column(spark, mgr):
    from flapi_spark.cache import read_pruned

    c = cfg(table="pruned2", primary_key=None, cursor_column=None)
    src = (
        spark.range(0, 1000)
        .withColumnRenamed("id", "k")
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
    )
    mgr.full_refresh(c, src)
    # disjoint range: zero files scanned, empty result, schema intact
    df, stats = read_pruned(mgr, c, "k", lo=10_000, hi=20_000)
    assert stats["files_scanned"] == 0
    assert df.count() == 0
    assert df.columns == ["k"]


def test_schema_drift_detects_add_remove_retype(spark, sf_dir, tmp_path):
    from flapi_spark.cache import CacheManager, schema_drift
    from flapi_spark.config import CacheConfig
    from flapi_spark.session import load_table
    from pyspark.sql import functions as F

    mgr = CacheManager(spark, str(tmp_path / "drift"))
    cfg = CacheConfig(enabled=True, table="drift_t", schema="analytics")
    base = load_table(spark, sf_dir, "region")
    mgr.full_refresh(cfg, base)
    evolved = (
        base.drop("r_name")
        .withColumn("r_added", F.lit(1).cast("long"))
        .withColumn("r_regionkey", F.col("r_regionkey").cast("string"))
    )
    mgr.full_refresh(cfg, evolved)
    info = mgr.snapshot_info(cfg)
    drift = schema_drift(
        mgr, cfg, info.previous_snapshot_id, info.current_snapshot_id
    )
    by_col = {d["column"]: d for d in drift}
    assert by_col["r_name"]["change"] == "removed"
    assert by_col["r_added"]["change"] == "added"
    assert by_col["r_regionkey"]["change"] == "retyped"
    assert by_col["r_regionkey"]["from_type"] == "int"
    assert by_col["r_regionkey"]["to_type"] == "string"
    # identical snapshots -> clean contract
    assert schema_drift(
        mgr, cfg, info.current_snapshot_id, info.current_snapshot_id
    ) == []
