"""Custom connector via the Spark 4 Python DataSource API
(pyspark.sql.datasource) — the pure-Python extension point for
sources Spark has no built-in reader for (the Spark-side analogue of
the reference auto-installing a DuckDB extension per connection,
database_manager.cpp:251-286).

`flapi_jsonl` reads a directory of JSONL files with real partition
planning: one InputPartition per file, so a 1000-file landing zone
fans out across 1000 tasks with no driver-side row handling — the
scan scales with file count exactly like the built-in sources. Rows
are parsed with the schema's column order; missing keys surface as
NULL, matching relaxed-JSON reader behavior.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_DEFAULT_SCHEMA = (
    "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT"
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options
        self.path = options.get("path")
        if not self.path:
            raise ValueError("flapi_jsonl: `path` option is required")

    def partitions(self):
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".jsonl")
        )
        if not files:
            raise FileNotFoundError(
                f"flapi_jsonl: no .jsonl files under {self.path}"
            )
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        names = [f.name for f in self.schema.fields]
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                obj = json.loads(line)
                yield tuple(obj.get(n) for n in names)


class JsonlDataSource(DataSource):
    """spark.read.format("flapi_jsonl").schema(...).option("path", d)"""

    @classmethod
    def name(cls) -> str:
        return "flapi_jsonl"

    def schema(self) -> str:
        return self.options.get("schema", _DEFAULT_SCHEMA)

    def reader(self, schema: StructType) -> JsonlReader:
        return JsonlReader(schema, self.options)


def register(spark) -> None:
    """Idempotently register the datasource with a session."""
    spark.dataSource.register(JsonlDataSource)
