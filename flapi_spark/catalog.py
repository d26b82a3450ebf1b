"""Catalog surface over the snapshot cache — the DuckLake ATTACH
analogue.

The reference attaches a DuckLake catalog under a configured alias
with separate metadata and data paths and an optional inlining limit
(reference: src/database_manager.cpp:145-163 —
``ATTACH 'ducklake:<metadata_path>' AS <alias>
(DATA_PATH '<data_path>', DATA_INLINING_ROW_LIMIT n)``), and its SQL
then addresses cached tables as ``alias.schema.table``.

Spark-first re-expression: the same config block builds a CacheManager
with split metadata/data roots and the inlining limit, and ``attach``
registers every cached table's current snapshot as a temp view named
``{alias}_{schema}_{table}`` so endpoint SQL addresses the catalog by
alias. Re-attach after refreshes to repoint views at new snapshots.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from flapi_spark.cache import CacheConfig, CacheManager


@dataclass
class CatalogConfig:
    """The ``ducklake:`` config block (reference: getDuckLakeConfig)."""

    enabled: bool = False
    alias: str = "lake"
    metadata_path: str = ""
    data_path: str = ""
    data_inlining_row_limit: int | None = None

    @classmethod
    def from_dict(cls, d: dict | None) -> "CatalogConfig":
        d = d or {}
        return cls(
            enabled=bool(d.get("enabled", False)),
            alias=str(d.get("alias", "lake") or "lake"),
            metadata_path=str(d.get("metadata-path", d.get("metadata_path", ""))),
            data_path=str(d.get("data-path", d.get("data_path", ""))),
            data_inlining_row_limit=(
                int(d["data-inlining-row-limit"])
                if d.get("data-inlining-row-limit") is not None
                else (
                    int(d["data_inlining_row_limit"])
                    if d.get("data_inlining_row_limit") is not None
                    else None
                )
            ),
        )


class CacheCatalog:
    def __init__(self, spark: SparkSession, config: CatalogConfig):
        if not config.metadata_path:
            raise ValueError("catalog requires metadata-path")
        self.spark = spark
        self.config = config
        self.manager = CacheManager(
            spark,
            root=config.metadata_path,
            data_root=config.data_path or None,
            inline_row_limit=config.data_inlining_row_limit,
        )

    # --- naming ------------------------------------------------------------

    def view_name(self, schema: str, table: str) -> str:
        """``alias_schema_table`` — Spark temp views cannot carry dots,
        so the reference's ``alias.schema.table`` flattens."""
        return f"{self.config.alias}_{schema}_{table}"

    # --- table discovery / attach ------------------------------------------

    def tables(self) -> list[tuple[str, str]]:
        """(schema, table) pairs present in the metadata catalog."""
        out = []
        root = Path(self.config.metadata_path)
        for manifest in sorted(root.glob("*/*/_manifest.json")):
            out.append((manifest.parent.parent.name, manifest.parent.name))
        return out

    def attach(self) -> list[str]:
        """Register the current snapshot of every cataloged table as a
        temp view; returns the view names (the ATTACH statement's
        observable effect)."""
        names = []
        for schema, table in self.tables():
            cfg = CacheConfig(schema=schema, table=table)
            name = self.view_name(schema, table)
            self.manager.read(cfg).createOrReplaceTempView(name)
            names.append(name)
        return names

    def read(self, schema: str, table: str) -> DataFrame:
        return self.manager.read(CacheConfig(schema=schema, table=table))
