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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
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

    def simpleStreamReader(self, schema: StructType) -> "JsonlStreamReader":
        return JsonlStreamReader(schema, self.options)


class JsonlStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector (readStream.format(
    "flapi_jsonl")): the offset is the SORTED list of files already
    ingested, so each micro-batch picks up exactly the files that
    appeared since the last one — the landing-zone tailer pattern.
    Offsets are JSON-serializable dicts checkpointed by Spark; replay
    of a (start, end) range re-reads precisely the files in
    end - start, giving exactly-once file-level semantics through the
    engine's own offset log. Per-batch work is file-partitioned by
    the engine; this simple reader is the prototyping path (the
    partition-planned batch reader above remains the scale path)."""

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("flapi_jsonl: `path` option is required")

    def _files(self):
        return sorted(
            f for f in os.listdir(self.path) if f.endswith(".jsonl")
        )

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        return {"files": self._files()}

    def partitions(self, start: dict, end: dict):
        new = [f for f in end["files"] if f not in set(start["files"])]
        return [_FilePartition(os.path.join(self.path, f)) for f in new]

    def read(self, start: dict):
        end = self.latestOffset()
        rows = []
        names = [f.name for f in self.schema_.fields]
        for part in self.partitions(start, end):
            with open(part.path, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        obj = json.loads(line)
                        rows.append(tuple(obj.get(n) for n in names))
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        names = [f.name for f in self.schema_.fields]
        for part in self.partitions(start, end):
            with open(part.path, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        obj = json.loads(line)
                        yield tuple(obj.get(n) for n in names)


def register(spark) -> None:
    """Idempotently register the datasources with a session."""
    spark.dataSource.register(JsonlDataSource)
    spark.dataSource.register(DuckDBDataSource)


class _RangePartition(InputPartition):
    def __init__(self, idx: int, n: int):
        self.idx = idx
        self.n = n


class DuckDBReader(DataSourceReader):
    """Executor-side DuckDB query evaluation, Arrow-batched.

    Each task opens its own read-only connection (DuckDB connections
    are process-local; nothing crosses the serialization boundary but
    the options dict) and yields pyarrow RecordBatches — Spark's
    Python DataSource API moves them zero-copy into the scan.

    Partitioning mirrors the JDBC predicate-split pattern: with
    `partition_column` + `num_partitions`, partition i evaluates
    `query WHERE hash(col) % n = i` — n independent scans that fan
    out across the cluster (DuckDB re-reads the source per task; the
    split is by predicate, not offset, so it is deterministic and
    stable under parallel re-execution). Without it: one partition.
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options
        if not options.get("query"):
            raise ValueError("flapi_duckdb: `query` option is required")

    def partitions(self):
        n = int(self.options.get("num_partitions", "1"))
        if n > 1 and not self.options.get("partition_column"):
            raise ValueError(
                "flapi_duckdb: num_partitions > 1 needs partition_column"
            )
        return [_RangePartition(i, n) for i in range(n)]

    def read(self, partition: _RangePartition):
        import duckdb

        con = duckdb.connect()
        query = self.options["query"]
        database = self.options.get("database")
        if database:
            con.execute(
                f"ATTACH '{database}' AS src (READ_ONLY); USE src"
            )
        if partition.n > 1:
            col = self.options["partition_column"]
            query = (
                f"SELECT * FROM ({query}) __q"
                f" WHERE hash({col}) % {partition.n} = {partition.idx}"
            )
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        # DuckDB's Arrow types follow its own inference (parquet int32
        # stays int32); Spark's scan requires vectors matching the
        # DECLARED schema exactly — cast every batch to it
        target = to_arrow_schema(self.schema)
        reader = con.execute(query).fetch_record_batch(
            int(self.options.get("batch_size", "8192"))
        )
        try:
            while True:
                batch = reader.read_next_batch()
                yield pa.record_batch(
                    [
                        batch.column(i).cast(target.field(i).type)
                        for i in range(batch.num_columns)
                    ],
                    schema=target,
                )
        except StopIteration:
            return


class DuckDBDataSource(DataSource):
    """spark.read.format("flapi_duckdb")
        .option("query", "SELECT ... FROM 'file.parquet'")
        [.option("database", "/path/file.duckdb")]
        [.option("partition_column", "id").option("num_partitions", 8)]

    The live heterogeneous-source read the reference does via ATTACH
    (database_manager.cpp:251-310): an embedded analytical engine
    queried in place, results landing in Spark as Arrow batches.
    `schema` option (DDL string) is required — Spark's Python
    DataSource API cannot infer it, and pinning it keeps the scan
    contract explicit (same stance as the JDBC presets)."""

    @classmethod
    def name(cls) -> str:
        return "flapi_duckdb"

    def schema(self) -> str:
        s = self.options.get("schema")
        if not s:
            raise ValueError("flapi_duckdb: `schema` option is required")
        return s

    def reader(self, schema: StructType) -> DuckDBReader:
        return DuckDBReader(schema, self.options)
