"""BigQuery query-pushdown source surface.

The reference reaches BigQuery through DuckDB's community `bigquery`
extension (examples/flapi-bigquery-procedure.yaml installs it), and
templates call the ``bigquery_query('project', 'SELECT …')`` table
function (examples/sqls/recommendations/bydevice_cache.sql shape) to
push an arbitrary query down to BigQuery.

Spark-first analogue, split the same three ways as the SAP surface
(flapi_spark/sources/sap.py):

- CONFIG translation lives in presets.py (`bigquery` → the
  spark-bigquery connector's format/options);
- the ``bigquery_query('p', 'sql')`` TABLE-FUNCTION SYNTAX is
  rewritten here to a per-call temp view backed by the connector's
  query-pushdown read (``.option("query", …)`` — BigQuery executes
  the inner SQL, Spark receives only the result), so reference
  templates run unchanged;
- the LIVE read needs the spark-bigquery connector jar + credentials
  (none in this container) and is availability-gated behind
  SourceUnavailableError; tests inject a local reader to prove the
  rewrite + view flow end-to-end.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flapi_spark.sources.registry import Connection, SourceUnavailableError

# bigquery_query('project', 'inner sql') — the inner SQL is a DuckDB
# single-quoted string ('' escapes a literal quote)
BIGQUERY_QUERY_RE = re.compile(
    r"bigquery_query\(\s*'(?P<proj>[^']*)'\s*,\s*"
    r"'(?P<sql>(?:[^']|'')*)'\s*\)",
    re.IGNORECASE,
)

Reader = Callable[[SparkSession, Connection, str, str], DataFrame]


def _default_reader(
    spark: SparkSession, conn: Connection, project: str, inner_sql: str
) -> DataFrame:
    from flapi_spark.sources.presets import reader_spec

    # TRANSLATE the friendly connection properties through the preset
    # layer (credentials_file → credentialsFile etc. — presets.py owns
    # the spelling); then overlay the pushdown read: query replaces
    # any table binding (a table= + query= pair is rejected by the
    # connector), and the call-site project wins
    _fmt, opts = reader_spec("bigquery", conn.properties)
    opts.pop("table", None)
    opts.update(
        parentProject=project, query=inner_sql, viewsEnabled="true"
    )
    try:
        return spark.read.format("bigquery").options(**opts).load()
    except Exception as exc:  # pragma: no cover - needs a live connector
        raise SourceUnavailableError(
            f"bigquery connection '{conn.name}' unavailable for"
            f" pushdown query: {exc}"
        ) from exc


def rewrite_bigquery_query(
    spark: SparkSession,
    sql: str,
    conn: Connection,
    reader: Reader | None = None,
) -> str:
    """Replace every ``bigquery_query('p', 'inner')`` call with a temp
    view fed by the connector's query-pushdown read. View names hash
    the (project, inner-sql) pair so repeated identical calls share
    one view and distinct calls never collide."""
    import hashlib

    read = reader or _default_reader
    out = sql
    for m in sorted(
        {(m.group("proj"), m.group("sql"))
         for m in BIGQUERY_QUERY_RE.finditer(sql)}
    ):
        project, inner = m
        inner_unescaped = inner.replace("''", "'")
        h = hashlib.md5(f"{project}\x00{inner}".encode()).hexdigest()[:10]
        view = f"bq_{h}"
        read(spark, conn, project, inner_unescaped).createOrReplaceTempView(
            view
        )
        # only the FUNCTION NAME is case-insensitive; the project and
        # inner-SQL payloads match exactly (two calls differing only
        # in inner-SQL case are DISTINCT queries and must keep their
        # own views)
        pat = (
            r"(?i:bigquery_query)\(\s*'" + re.escape(project)
            + r"'\s*,\s*'" + re.escape(inner) + r"'\s*\)"
        )
        out = re.sub(pat, view, out)
    return out
