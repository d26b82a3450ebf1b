"""SAP RFC source surface — the ERPL-extension analogue.

The reference reaches SAP through DuckDB's ERPL extension: a
connection `init:` installs ERPL and creates a `sap_rfc` secret with
ASHOST/SYSNR/CLIENT/USER/PASSWD/LANG, and templates call the
`sap_read_table('SFLIGHT')` table function (reference:
examples/flapi.yaml:37-50, examples/sqls/sap/flights.sql).

Spark-first analogue, split the same way the other heterogeneous
sources are:

- the CONFIG TRANSLATION (friendly RFC properties → reader
  format/options) is pure and unit-tested — see
  `flapi_spark/sources/presets.py` `sap_rfc`;
- the `sap_read_table('T')` TABLE-FUNCTION SYNTAX is translated by
  rewriting each call site to a per-table temp view backed by the
  connection's reader (`rewrite_sap_read_table` below) — templates
  written for the reference run unchanged;
- the LIVE READ needs an SAP connector on the Spark classpath (none
  ships in this container) and is availability-gated behind
  SourceUnavailableError exactly like jdbc/iceberg/bigquery; tests
  inject a local reader to prove the rewrite + view flow end-to-end.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flapi_spark.sources.registry import Connection, SourceUnavailableError

SAP_READ_TABLE_RE = re.compile(
    r"sap_read_table\(\s*'([A-Za-z0-9_/]+)'\s*\)", re.IGNORECASE
)

Reader = Callable[[SparkSession, Connection, str], DataFrame]


def _default_reader(spark: SparkSession, conn: Connection, table: str) -> DataFrame:
    from flapi_spark.sources.presets import reader_spec

    fmt, opts = reader_spec(conn.format, {**conn.properties, "table": table})
    try:
        return spark.read.format(fmt).options(**opts).load()
    except Exception as exc:  # pragma: no cover - needs a live connector
        raise SourceUnavailableError(
            f"sap_rfc connection '{conn.name}' unavailable for table"
            f" {table!r}: {exc}"
        ) from exc


def rewrite_sap_read_table(
    spark: SparkSession,
    sql: str,
    conn: Connection,
    reader: Reader | None = None,
) -> str:
    """Replace every ``sap_read_table('T')`` call with a temp view fed
    by the connection's reader. `/` in SAP table names (namespaced
    tables like /BI0/MMATERIAL) maps to ``_`` in the view name."""
    read = reader or _default_reader
    out = sql
    for table in sorted(set(SAP_READ_TABLE_RE.findall(sql))):
        view = "sap_" + re.sub(r"[^A-Za-z0-9_]", "_", table).lower()
        read(spark, conn, table).createOrReplaceTempView(view)
        out = re.sub(
            r"sap_read_table\(\s*'" + re.escape(table) + r"'\s*\)",
            view,
            out,
            flags=re.IGNORECASE,
        )
    return out
