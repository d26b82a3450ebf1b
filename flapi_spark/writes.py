"""Write operations: POST/PUT/PATCH/DELETE endpoints over warehouse
tables (reference: database_manager.cpp executeWrite /
executeWriteInTransaction, request_handler.cpp rows_affected,
examples/data/write-examples/*, test/integration/
test_write_operations*.py).

Spark-first re-expression. DuckDB mutates rows in place inside one
transactional engine; Spark's storage is immutable files, so row-level
DML becomes COPY-ON-WRITE — exactly the mechanism Delta/Iceberg use
under their UPDATE/DELETE, spelled out here for plain catalog parquet
tables:

- ``INSERT INTO …`` runs natively (Spark supports it on catalog
  tables); rows_affected is the target's before/after row-count delta.
- ``UPDATE t SET … WHERE …`` translates to a staged full projection —
  ``CASE WHEN (pred) THEN expr ELSE col END`` per assigned column —
  written to a staging table and swapped in with INSERT OVERWRITE
  (Spark refuses a direct self-overwrite: UNSUPPORTED_OVERWRITE).
  rows_affected = matching-row count, evaluated pre-image.
- ``DELETE FROM t WHERE …`` keeps the complement (same staging swap).
- ``RETURNING col, …`` (DuckDB syntax the reference's templates use)
  is honored for UPDATE (post-image rows re-selected by the
  predicate — exact when the predicate doesn't touch assigned
  columns, which is the keyed-update shape every reference template
  has) and DELETE (pre-image rows, captured before the swap). INSERT
  RETURNING raises with guidance: the multi-statement
  ``INSERT …; SELECT …`` workflow (which the reference also supports,
  database_manager.cpp:612-647) is the Spark path.

Transactionality: each statement is atomic (INSERT OVERWRITE commits
via staged files). Multi-statement writes with ``operation.transaction``
snapshot every touched table first (CTAS backup) and restore on
failure — copy-on-write BEGIN/ROLLBACK. Single-statement writes skip
the backup (the statement is already atomic).

Scale: every translated statement is a full linear scan + rewrite of
the target table — the honest cost of row-level DML on immutable
storage; at 100 TB the target should be a partitioned table so the
predicate prunes the rewrite to touched partitions, or an
Iceberg/Delta catalog where Spark's native row-level plans take over
(same SQL, no translation needed — the translator steps aside for v2
tables that accept UPDATE/DELETE directly).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_IDENT = r"[A-Za-z_][\w]*(?:\.[A-Za-z_][\w]*)*|`[^`]+`(?:\.`[^`]+`)*"
_INSERT_RE = re.compile(
    rf"^\s*INSERT\s+(?:INTO|OVERWRITE)\s+(?:TABLE\s+)?(?P<t>{_IDENT})",
    re.IGNORECASE,
)
_UPDATE_RE = re.compile(
    rf"^\s*UPDATE\s+(?P<t>{_IDENT})\s+SET\s+(?P<body>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    rf"^\s*DELETE\s+FROM\s+(?P<t>{_IDENT})(?:\s+WHERE\s+(?P<pred>.*))?$",
    re.IGNORECASE | re.DOTALL,
)
_RETURNING_RE = re.compile(
    r"\s+RETURNING\s+(?P<cols>.+?)\s*;?\s*$", re.IGNORECASE | re.DOTALL
)


@dataclass
class WriteResult:
    """reference: database_manager.hpp WriteResult."""

    rows_affected: int = 0
    returned_data: DataFrame | None = None


class WriteError(ValueError):
    pass


def _strip_returning(stmt: str) -> tuple[str, str | None]:
    # the clause is the LAST RETURNING whose prefix has even quote
    # parity — an occurrence inside a string literal is data, but a
    # real trailing clause may follow it in the same statement
    m = None
    for m_ in re.finditer(r"\bRETURNING\b", stmt, re.IGNORECASE):
        if stmt[: m_.start()].count("'") % 2 == 0:
            m = m_
    if m is None:
        return stmt, None
    tail = stmt[m.end():].strip().rstrip(";").strip()
    if not tail:
        return stmt, None
    return stmt[: m.start()].rstrip(), tail


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    """Split on `sep` outside quotes/parens (SET-clause assignments)."""
    parts, depth, in_str, cur = [], 0, False, []
    i = 0
    while i < len(text):
        ch = text[i]
        if ch == "'":
            if in_str and i + 1 < len(text) and text[i + 1] == "'":
                cur.append("''")
                i += 2
                continue
            in_str = not in_str
        elif not in_str:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            elif ch == sep and depth == 0:
                parts.append("".join(cur))
                cur = []
                i += 1
                continue
        cur.append(ch)
        i += 1
    if cur:
        parts.append("".join(cur))
    return parts


def _split_where(body: str) -> tuple[str, str | None]:
    """Split a SET body into (assignments, predicate) on the LAST
    top-level WHERE keyword."""
    m = None
    for m_ in re.finditer(r"\bWHERE\b", body, re.IGNORECASE):
        # quote/paren awareness: count quotes+parens before the match
        prefix = body[: m_.start()]
        if prefix.count("'") % 2 == 0 and (
            prefix.count("(") == prefix.count(")")
        ):
            m = m_
    if m is None:
        return body, None
    return body[: m.start()], body[m.end():]


def _classify(stmt: str) -> tuple[str, str | None]:
    s = stmt.strip()
    if _INSERT_RE.match(s):
        return "insert", _INSERT_RE.match(s).group("t")
    if _UPDATE_RE.match(s):
        return "update", _UPDATE_RE.match(s).group("t")
    if _DELETE_RE.match(s):
        return "delete", _DELETE_RE.match(s).group("t")
    return "other", None


def touched_tables(statements: list[str]) -> list[str]:
    out = []
    for s in statements:
        kind, t = _classify(s)
        if kind in ("insert", "update", "delete") and t and t not in out:
            out.append(t)
    return out


def _run(spark: SparkSession, sql: str, args: dict | None):
    return spark.sql(sql, args=args) if args else spark.sql(sql)


def _scalar(spark: SparkSession, sql: str, args: dict | None) -> int:
    return int(_run(spark, sql, args).collect()[0][0])


def _table_supports_row_dml(spark: SparkSession, table: str) -> bool:
    """v2 tables (Iceberg/Delta) take UPDATE/DELETE natively — the
    translator steps aside for them."""
    try:
        provider = {
            r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
        }.get("Provider", "").lower()
        return provider in ("iceberg", "delta")
    except Exception:
        return False


def _partition_cols(spark: SparkSession, table: str) -> list[str]:
    """Partition columns from DESCRIBE TABLE (empty for unpartitioned)."""
    rows = spark.sql(f"DESCRIBE TABLE {table}").collect()
    out: list[str] = []
    in_part = False
    for r in rows:
        name = r.col_name
        if name.startswith("# Partition"):
            in_part = True
            continue
        if in_part:
            if name.startswith("#") or not name:
                continue
            out.append(name)
    return out


def _staged_swap(
    spark: SparkSession,
    table: str,
    projection_sql: str,
    args: dict | None,
    dynamic: bool = False,
) -> None:
    """Write the new image to a staging table, swap via INSERT
    OVERWRITE (a direct self-overwrite is rejected by Spark), drop the
    stage. With `dynamic`, the swap runs under dynamic partition
    overwrite — only the partitions PRESENT in the stage are replaced
    (the partition-pruned copy-on-write path)."""
    stage = re.sub(r"\W", "_", table) + "__write_stage"
    spark.sql(f"DROP TABLE IF EXISTS {stage}")
    _run(spark, f"CREATE TABLE {stage} AS {projection_sql}", args)
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key, "static")
    try:
        if dynamic:
            spark.conf.set(conf_key, "dynamic")
        spark.sql(f"INSERT OVERWRITE {table} SELECT * FROM {stage}")
    finally:
        spark.conf.set(conf_key, prev)
        spark.sql(f"DROP TABLE IF EXISTS {stage}")


def apply_write_statement(
    spark: SparkSession,
    stmt: str,
    args: dict | None = None,
    max_returning_rows: int = 10_000,
) -> WriteResult:
    """Execute ONE write statement with reference semantics; see the
    module docstring for the translation rules."""
    # classify FIRST: RETURNING is a DML-only clause, and stripping it
    # from a passthrough statement could corrupt SQL that merely uses
    # the word (e.g. a column alias in a CTAS)
    kind0, _t0 = _classify(stmt)
    returning = None
    if kind0 in ("insert", "update", "delete"):
        stmt, returning = _strip_returning(stmt)
    kind, table = _classify(stmt)

    if kind == "insert":
        if returning:
            raise WriteError(
                "INSERT ... RETURNING is not expressible on Spark; use"
                " the multi-statement 'INSERT ...; SELECT ...' workflow"
                " with operation.returns-data (the reference supports"
                " the same shape)"
            )
        before = _scalar(spark, f"SELECT count(*) FROM {table}", None)
        _run(spark, stmt, args)
        after = _scalar(spark, f"SELECT count(*) FROM {table}", None)
        return WriteResult(rows_affected=max(after - before, 0))

    if kind == "update":
        m = _UPDATE_RE.match(stmt.strip())
        body = m.group("body")
        assigns_raw, pred = _split_where(body)
        if _table_supports_row_dml(spark, table):
            # pre-image count: counting AFTER the update with the same
            # predicate would see the post-image (often 0 matches)
            n = _scalar(
                spark,
                f"SELECT count(*) FROM {table}"
                + (f" WHERE {pred}" if pred else ""),
                args,
            )
            _run(spark, stmt, args)
            ret = None
            if returning:
                ret = _run(
                    spark,
                    f"SELECT {returning} FROM {table}"
                    + (f" WHERE {pred}" if pred else "")
                    + f" LIMIT {max_returning_rows}",
                    args,
                )
            return WriteResult(rows_affected=n, returned_data=ret)
        assigns = {}
        for part in _split_top_level(assigns_raw):
            col, _, expr = part.partition("=")
            col, expr = col.strip().strip("`"), expr.strip()
            if not col or not expr:
                raise WriteError(f"unparseable SET assignment: {part!r}")
            assigns[col] = expr
        cols = spark.table(table).columns
        by_lower = {c.lower(): c for c in cols}
        unknown = [c for c in assigns if c.lower() not in by_lower]
        if unknown:
            raise WriteError(f"UPDATE assigns unknown columns: {sorted(unknown)}")
        assigns = {by_lower[c.lower()]: e for c, e in assigns.items()}
        cond = pred if pred else "true"
        if returning and any(
            re.search(rf"\b{re.escape(c)}\b", cond, re.IGNORECASE)
            for c in assigns
        ):
            # checked BEFORE the swap: raising after it would leave
            # the table mutated behind an error response
            raise WriteError(
                "UPDATE ... RETURNING with a predicate over assigned"
                " columns is ambiguous post-image; re-select instead"
            )
        n = _scalar(
            spark, f"SELECT count(*) FROM {table} WHERE {cond}", args
        )
        proj = ", ".join(
            f"CASE WHEN ({cond}) THEN ({assigns[c]}) ELSE {c} END AS {c}"
            if c in assigns else c
            for c in cols
        )
        pcols = _partition_cols(spark, table)
        if pcols and not set(pcols) & set(assigns):
            # partition-PRUNED copy-on-write: stage only the
            # partitions that contain matching rows (multi-column IN
            # subquery = a semi-join, no driver collect) and swap
            # under dynamic partition overwrite — untouched partitions
            # are never rewritten. This is the 100 TB UPDATE shape
            # (the full-table rewrite only happens for unpartitioned
            # targets or partition-column reassignment, where rows
            # migrate across partitions).
            plist = ", ".join(pcols)
            nullp = " OR ".join(f"{c} IS NULL" for c in pcols)
            # NULL partition values make the IN-subquery evaluate to
            # NULL (row silently skipped) — include every
            # NULL-partition row in the stage so its updates land
            sel = (
                f"SELECT {proj} FROM {table}"
                f" WHERE ({plist}) IN"
                f" (SELECT DISTINCT {plist} FROM {table} WHERE {cond})"
                f" OR ({nullp})"
            )
            _staged_swap(spark, table, sel, args, dynamic=True)
        else:
            _staged_swap(
                spark, table, f"SELECT {proj} FROM {table}", args
            )
        ret = None
        if returning:
            ret = _run(
                spark,
                f"SELECT {returning} FROM {table} WHERE {cond}"
                f" LIMIT {max_returning_rows}",
                args,
            )
        return WriteResult(rows_affected=n, returned_data=ret)

    if kind == "delete":
        m = _DELETE_RE.match(stmt.strip())
        pred = (m.group("pred") or "").strip()
        if _table_supports_row_dml(spark, table):
            n = _scalar(
                spark,
                f"SELECT count(*) FROM {table}"
                + (f" WHERE {pred}" if pred else ""),
                args,
            )
            ret = None
            if returning:
                pre = _run(
                    spark,
                    f"SELECT {returning} FROM {table}"
                    + (f" WHERE {pred}" if pred else "")
                    + f" LIMIT {max_returning_rows}",
                    args,
                )
                rows = pre.collect()
                ret = spark.createDataFrame(rows, pre.schema)
            _run(spark, stmt, args)
            return WriteResult(rows_affected=n, returned_data=ret)
        cond = pred if pred else "true"
        n = _scalar(
            spark, f"SELECT count(*) FROM {table} WHERE {cond}", args
        )
        ret = None
        if returning:
            # DELETE RETURNING = the pre-image rows; materialize to the
            # driver (bounded) BEFORE the swap deletes them
            pre = _run(
                spark,
                f"SELECT {returning} FROM {table} WHERE {cond}"
                f" LIMIT {max_returning_rows}",
                args,
            )
            rows = pre.collect()
            ret = spark.createDataFrame(rows, pre.schema)
        # DELETE stays a FULL rewrite even on partitioned tables: a
        # partition whose every row matches would vanish from the
        # stage, and dynamic overwrite would leave its old files in
        # place (stale survivors) — correctness over pruning here
        _staged_swap(
            spark, table,
            f"SELECT * FROM {table} WHERE NOT ({cond})"
            " OR (" + cond + ") IS NULL",
            args,
        )
        return WriteResult(rows_affected=n, returned_data=ret)

    # DDL / other statements pass through untranslated
    _run(spark, stmt, args)
    return WriteResult(rows_affected=0)


_DESTRUCTIVE_RE = re.compile(
    r"^\s*(DROP|TRUNCATE|ALTER)\b", re.IGNORECASE
)


def execute_write_statements(
    spark: SparkSession,
    statements: list[str],
    args: dict | None = None,
    returns_data: bool = False,
    transaction: bool = True,
    validate_before_write: bool = True,
) -> WriteResult:
    """Multi-statement write with the reference's trailing-SELECT
    contract (database_manager.cpp:612-647): when `returns_data` and
    the LAST statement is a SELECT, it runs after the writes and its
    result becomes `returned_data`. With `transaction`, every touched
    table is snapshotted first (CTAS backup) and restored if any
    statement fails — copy-on-write BEGIN/ROLLBACK; single-statement
    writes skip the backup (each statement is already atomic)."""
    if not statements:
        raise WriteError("no statements to execute")
    statements = [s for s in (s.strip() for s in statements) if s]
    if validate_before_write:
        # operation.validate-before-write (reference default true):
        # endpoint-driven writes are row mutations, not schema
        # surgery — DROP/TRUNCATE/ALTER only run when the endpoint
        # explicitly opts out of the stricter validation
        for s in statements:
            if _DESTRUCTIVE_RE.match(s):
                raise WriteError(
                    f"destructive statement blocked by"
                    f" validate-before-write: {s.split(None, 1)[0].upper()}"
                    " (set operation.validate-before-write: false to"
                    " allow)"
                )
    trailing_select = None
    if returns_data and len(statements) > 1 and re.match(
        r"^\s*SELECT\b", statements[-1], re.IGNORECASE
    ):
        trailing_select = statements[-1]
        statements = statements[:-1]

    # backup value None = the table did not exist before this write
    # (a CREATE TABLE IF NOT EXISTS in the same template will make
    # it): rollback then DROPS it instead of restoring
    backups: dict[str, str | None] = {}
    need_backup = transaction and len(statements) > 1
    if need_backup:
        for t in touched_tables(statements):
            if not spark.catalog.tableExists(t.strip("`")):
                backups[t] = None
                continue
            bk = re.sub(r"\W", "_", t) + "__txn_backup"
            spark.sql(f"DROP TABLE IF EXISTS {bk}")
            spark.sql(f"CREATE TABLE {bk} AS SELECT * FROM {t}")
            backups[t] = bk

    result = WriteResult()
    try:
        for stmt in statements:
            r = apply_write_statement(spark, stmt, args)
            if r.rows_affected > 0:
                result.rows_affected = r.rows_affected
            if r.returned_data is not None:
                result.returned_data = r.returned_data
    except Exception:
        for t, bk in backups.items():
            if bk is None:
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            else:
                spark.sql(f"INSERT OVERWRITE {t} SELECT * FROM {bk}")
        raise
    finally:
        for bk in backups.values():
            if bk is not None:
                spark.sql(f"DROP TABLE IF EXISTS {bk}")

    if trailing_select is not None and result.returned_data is None:
        result.returned_data = _run(spark, trailing_select, args)
    return result
