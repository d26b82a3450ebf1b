"""DuckLake-style catalog surface over the snapshot cache (reference:
database_manager.cpp:145-163 ATTACH alias/metadata/data-path/inlining)."""
import os

import pytest

from flapi_spark.catalog import CacheCatalog, CatalogConfig
from flapi_spark.config import CacheConfig


def _cfg(tmp_path, **over):
    base = {
        "enabled": True,
        "alias": "lake",
        "metadata-path": str(tmp_path / "meta"),
        "data-path": str(tmp_path / "data"),
        "data-inlining-row-limit": 10,
    }
    base.update(over)
    return CatalogConfig.from_dict(base)


def test_config_block_parses_reference_keys(tmp_path):
    c = _cfg(tmp_path)
    assert c.enabled and c.alias == "lake"
    assert c.metadata_path.endswith("meta") and c.data_path.endswith("data")
    assert c.data_inlining_row_limit == 10
    assert CatalogConfig.from_dict(None).enabled is False
    with pytest.raises(ValueError):
        CacheCatalog(None, CatalogConfig(enabled=True))


def test_metadata_and_data_separate_paths(spark, tmp_path):
    cat = CacheCatalog(spark, _cfg(tmp_path, **{"data-inlining-row-limit": None}))
    df = spark.range(100).withColumnRenamed("id", "k")
    cat.manager.full_refresh(CacheConfig(schema="main", table="big"), df)
    # manifest in metadata path, parquet snapshot in data path
    assert (tmp_path / "meta" / "main" / "big" / "_manifest.json").exists()
    snaps = list((tmp_path / "data" / "main" / "big").glob("snapshot=*"))
    assert snaps
    assert not list((tmp_path / "meta" / "main" / "big").glob("snapshot=*"))
    assert cat.read("main", "big").count() == 100


def test_data_inlining_small_table_writes_no_parquet(spark, tmp_path):
    cat = CacheCatalog(spark, _cfg(tmp_path))
    small = spark.range(5).withColumnRenamed("id", "k")
    cat.manager.full_refresh(CacheConfig(schema="main", table="dim"), small)
    # no parquet snapshot dir: rows inlined into the manifest
    assert not list((tmp_path / "data" / "main" / "dim").glob("snapshot=*"))
    got = sorted(r.k for r in cat.read("main", "dim").collect())
    assert got == list(range(5))
    # over the limit -> parquet as usual
    big = spark.range(50).withColumnRenamed("id", "k")
    cat.manager.full_refresh(CacheConfig(schema="main", table="fact"), big)
    assert list((tmp_path / "data" / "main" / "fact").glob("snapshot=*"))


def test_inlined_incremental_merge_roundtrip(spark, tmp_path):
    """Inlined snapshots take part in cursor merges like parquet ones."""
    cat = CacheCatalog(spark, _cfg(tmp_path))
    cfg = CacheConfig(schema="main", table="upd", primary_key=["k"],
                      cursor_column="v")
    first = spark.createDataFrame([(1, 10), (2, 20)], "k INT, v INT")
    cat.manager.incremental_sync(cfg, first)
    second = spark.createDataFrame([(2, 25), (3, 30)], "k INT, v INT")
    cat.manager.incremental_sync(cfg, second)
    got = {(r.k, r.v) for r in cat.read("main", "upd").collect()}
    assert got == {(1, 10), (2, 25), (3, 30)}


def test_attach_registers_alias_views(spark, tmp_path):
    cat = CacheCatalog(spark, _cfg(tmp_path))
    cat.manager.full_refresh(
        CacheConfig(schema="main", table="dim"),
        spark.createDataFrame([(1, "a"), (2, "b")], "k INT, name STRING"),
    )
    cat.manager.full_refresh(
        CacheConfig(schema="sales", table="facts"),
        spark.range(30).withColumnRenamed("id", "k"),
    )
    names = cat.attach()
    assert set(names) == {"lake_main_dim", "lake_sales_facts"}
    assert spark.sql("SELECT count(*) AS n FROM lake_main_dim").collect()[0].n == 2
    joined = spark.sql(
        "SELECT d.name FROM lake_sales_facts f JOIN lake_main_dim d ON f.k = d.k"
    ).collect()
    assert {r.name for r in joined} == {"a", "b"}
