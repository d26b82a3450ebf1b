"""Named connection registry.

Parity with the reference's connection model (reference:
src/config_manager.cpp connections section; templates consume
connection properties as ``{{conn.*}}``): a connection is a named
bundle of properties (at minimum a path or JDBC coordinates plus a
format), and endpoints reference connections by name.

Spark-first re-expression: each connection knows how to materialize a
lazy DataFrame (``spark.read.<format>``) and register it as a temp
view, so endpoint SQL can either reference the view by connection name
or interpolate ``{{conn.path}}`` into ``parquet.`...``` table syntax —
both keep the scan lazy and pushdown-friendly.

Formats: parquet / csv / json are first-class. jdbc (postgres, mysql)
and iceberg — which the reference reaches through DuckDB extensions —
are gated behind availability checks because the local container has
no JDBC drivers or Iceberg catalog; the code path is real, the
environment is not.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SourceUnavailableError(RuntimeError):
    pass


@dataclass
class Connection:
    name: str
    format: str = "parquet"  # parquet | csv | json | orc | jdbc | duckdb | iceberg
    properties: dict[str, Any] = field(default_factory=dict)
    init_sql: str | None = None

    @property
    def path(self) -> str | None:
        return self.properties.get("path")

    def template_context(self) -> dict:
        """Properties exposed to templates as {{conn.*}}."""
        ctx = dict(self.properties)
        ctx.setdefault("name", self.name)
        return ctx

    def read(self, spark: SparkSession) -> DataFrame:
        fmt = self.format.lower()
        if fmt in ("parquet", "csv", "json", "orc"):
            # object-store paths (s3://, gs://, abfss://) get their
            # credentials wired into the Hadoop conf per bucket and the
            # scheme normalized (s3 -> s3a) before the read — reference:
            # credential_manager.cpp / examples/flapi-s3.yaml
            from flapi_spark.sources.objectstore import configure_connection_path

            path = configure_connection_path(
                spark, self.properties["path"], self.properties
            )
            if fmt == "parquet":
                return spark.read.parquet(path)
            if fmt == "orc":
                return spark.read.orc(path)
            if fmt == "csv":
                opts = {"header": "true", "inferSchema": "true"}
                opts.update(
                    {k: str(v) for k, v in self.properties.get("options", {}).items()}
                )
                return spark.read.options(**opts).csv(path)
            return spark.read.json(path)
        if fmt == "jdbc":
            # Real code path; requires a JDBC driver jar on the Spark
            # classpath (not present in this container).
            try:
                reader = (
                    spark.read.format("jdbc")
                    .option("url", self.properties["url"])
                    .option("dbtable", self.properties["dbtable"])
                )
                for k in ("user", "password", "driver", "numPartitions",
                          "partitionColumn", "lowerBound", "upperBound"):
                    if k in self.properties:
                        reader = reader.option(k, str(self.properties[k]))
                return reader.load()
            except Exception as exc:  # pragma: no cover - env dependent
                raise SourceUnavailableError(
                    f"jdbc connection '{self.name}' unavailable: {exc}"
                ) from exc
        if fmt == "duckdb":
            # LIVE embedded-DuckDB read through the flapi_duckdb Python
            # DataSource (sources/pyds.py) — the reference's DuckDB
            # ATTACH, runnable in any environment with the duckdb
            # wheel. properties: query (required), schema (required
            # DDL), database (optional .duckdb file),
            # partition_column/num_partitions (optional split).
            from flapi_spark.sources.pyds import register

            register(spark)
            reader = spark.read.format("flapi_duckdb")
            for k in ("query", "schema", "database",
                      "partition_column", "num_partitions", "batch_size"):
                if k in self.properties:
                    reader = reader.option(k, str(self.properties[k]))
            return reader.load()
        if fmt == "iceberg":
            try:
                return spark.read.format("iceberg").load(self.properties["table"])
            except Exception as exc:  # pragma: no cover - env dependent
                raise SourceUnavailableError(
                    f"iceberg connection '{self.name}' unavailable: {exc}"
                ) from exc
        from flapi_spark.sources.presets import has_preset, reader_spec

        if has_preset(fmt):
            # postgres / mysql / bigquery: friendly properties translate
            # to a reader spec (flapi_spark/sources/presets.py); the
            # live read needs the connector on the classpath, same
            # availability gate as generic jdbc
            spark_fmt, opts = reader_spec(fmt, self.properties)
            try:
                return spark.read.format(spark_fmt).options(**opts).load()
            except Exception as exc:  # pragma: no cover - env dependent
                raise SourceUnavailableError(
                    f"{fmt} connection '{self.name}' unavailable: {exc}"
                ) from exc
        raise ValueError(f"unknown connection format: {self.format}")

    def register_view(self, spark: SparkSession, view_name: str | None = None) -> str:
        name = view_name or self.name.replace("-", "_")
        self.read(spark).createOrReplaceTempView(name)
        return name


class ConnectionRegistry:
    def __init__(self, connections: dict[str, Connection] | None = None):
        self._conns: dict[str, Connection] = dict(connections or {})

    def add(self, conn: Connection) -> None:
        self._conns[conn.name] = conn

    def get(self, name: str) -> Connection:
        if name not in self._conns:
            raise KeyError(f"unknown connection '{name}'")
        return self._conns[name]

    def __contains__(self, name: str) -> bool:
        return name in self._conns

    def names(self) -> list[str]:
        return sorted(self._conns)


def load_connections(doc: dict) -> ConnectionRegistry:
    """Parse the ``connections:`` block of a flapi-style project YAML:

    connections:
      customers-parquet:
        properties:
          path: ./data/customers.parquet
    """
    reg = ConnectionRegistry()
    for name, spec in (doc.get("connections") or {}).items():
        spec = spec or {}
        props = dict(spec.get("properties") or {})
        fmt = spec.get("format")
        if not fmt:
            p = str(props.get("path", ""))
            if p.endswith(".csv"):
                fmt = "csv"
            elif p.endswith(".json") or p.endswith(".jsonl"):
                fmt = "json"
            elif p.endswith(".orc"):
                fmt = "orc"
            else:
                fmt = "parquet"
        reg.add(Connection(name=name, format=fmt, properties=props,
                           init_sql=spec.get("init")))
    return reg
