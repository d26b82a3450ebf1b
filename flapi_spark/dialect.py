"""DuckDB → Spark SQL dialect translation for migrated templates.

The reference's SQL templates are written for embedded DuckDB
(`examples/sqls/*`); most of their SQL is ANSI and runs on Spark
unchanged, but a handful of DuckDB-isms appear in real flAPI projects
and would otherwise force template edits during migration:

- `FROM '<file.parquet>'` (bare quoted path as a table)
- `read_parquet('<path>')` / `read_csv('<path>')` table functions
- `read_parquet('<glob>', filename=true)` + a `filename` column
  (provenance reads, examples/sqls/taxi/taxi.sql)
- `{ 'k': expr, ... }` struct literals (examples/sqls/customers)
- `json_object('k', v, ...)` → `to_json(named_struct(...))`
- SQLite-style `DATE('now', '-N days')` (examples/sqls/customers)
- CREATE TABLE column types Spark lacks: `TEXT`→STRING, `TIME`→STRING,
  and `PRIMARY KEY` constraints stripped (Spark tables are
  constraint-free; the write-examples' CRUD DDL,
  test/integration/api_configuration/sqls/customers-create.sql)
- `TIME '12:34:56'` literals → plain string literals

`duckdb_to_spark_sql` rewrites exactly these, leaving everything else
byte-identical — it is a syntactic shim, not a SQL parser, applied to
endpoints that opt in with `template-dialect: duckdb` in their YAML.
All rewrites are quote-aware (never fire inside string literals).
"""

from __future__ import annotations

import re


def _scan_strings(sql: str):
    """Yield (start, end, in_string) runs; '…' literals with ''
    escapes are opaque."""
    runs = []
    i, n = 0, len(sql)
    last = 0
    while i < n:
        if sql[i] == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            runs.append((last, i, False))
            runs.append((i, min(j + 1, n), True))
            i = j + 1
            last = i
        else:
            i += 1
    runs.append((last, n, False))
    return runs


def _sub_quote_aware(regex: "re.Pattern", repl, sql: str) -> str:
    """regex.sub that SKIPS matches starting inside a string literal
    (per _scan_strings, ''-escape-aware). The patterns here (e.g.
    read_parquet('p')) legitimately SPAN quotes — what must never
    happen is the trigger token itself sitting inside prose, like
    SELECT 'use json_object(x)' — so the guard is on match START."""
    spans = [(a, b) for a, b, in_str in _scan_strings(sql) if in_str]

    def guard(m: "re.Match") -> str:
        if any(a <= m.start() < b for a, b in spans):
            return m.group(0)
        return repl(m) if callable(repl) else m.expand(repl)

    return regex.sub(guard, sql)


_READ_FN = re.compile(
    r"read_(parquet|csv)\s*\(\s*'([^']+)'\s*(?:,\s*filename\s*=\s*true\s*)?\)",
    re.IGNORECASE,
)
_QUOTED_FROM = re.compile(
    r"\b(FROM|JOIN)\s+'([^']+\.(?:parquet|csv|json|orc))'", re.IGNORECASE
)
_SQLITE_DATE = re.compile(
    r"DATE\s*\(\s*'now'\s*,\s*'-(\d+)\s+days?'\s*\)", re.IGNORECASE
)
_JSON_OBJECT = re.compile(r"\bjson_object\s*\(", re.IGNORECASE)
_TIME_LITERAL = re.compile(r"\bTIME\s+'([^']*)'", re.IGNORECASE)
_JSON_CAST_SUFFIX = re.compile(r"::\s*JSON\b", re.IGNORECASE)
_CAST_OPEN = re.compile(r"\bCAST\s*\(", re.IGNORECASE)
_AS_JSON_TAIL = re.compile(r"\s+AS\s+JSON\s*$", re.IGNORECASE)


def _rewrite_json_casts(sql: str) -> str:
    """CAST(expr AS JSON) → CAST(expr AS STRING) with a paren-aware
    scan: the operand may be any expression, including nested calls
    like json_object(...) — a regex character class cannot balance
    parentheses, so the close paren is found by depth counting
    (''-escape-aware). Nested JSON casts inside the operand are
    rewritten recursively."""
    spans = [(a, b) for a, b, in_str in _scan_strings(sql) if in_str]
    out: list[str] = []
    i = 0
    while True:
        m = _CAST_OPEN.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        if any(a <= m.start() < b for a, b in spans):
            out.append(sql[i:m.end()])
            i = m.end()
            continue
        depth, j, in_str = 1, m.end(), False
        while j < len(sql) and depth:
            ch = sql[j]
            if ch == "'":
                in_str = not in_str
            elif not in_str:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
            j += 1
        if depth:  # unbalanced — leave the remainder untouched
            out.append(sql[i:])
            break
        body = sql[m.end():j - 1]
        tail = _AS_JSON_TAIL.search(body)
        if tail:
            inner = _rewrite_json_casts(body[: tail.start()])
            out.append(sql[i:m.start()])
            out.append(f"CAST({inner} AS STRING)")
            i = j
        else:
            # not a JSON cast: step inside so nested CAST(.. AS JSON)
            # operands still get rewritten
            out.append(sql[i:m.end()])
            i = m.end()
    return "".join(out)
# typed-literal prefix over a NAMED MARKER: the binding pass rewrites
# quoted typed sites like DATE '{{{params.d}}}' into DATE :d before
# the dialect runs — Spark cannot parse a type keyword before a
# parameter marker, so the prefix becomes a CAST (TIME -> plain
# string, the repo-wide time convention)
_TYPED_MARKER = re.compile(
    r"\b(DATE|TIMESTAMP|TIME)\s+(:\w+)", re.IGNORECASE
)
_CREATE_TABLE = re.compile(
    r"\bCREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?[\w.`]+\s*\(",
    re.IGNORECASE,
)
_PK_CONSTRAINT = re.compile(r"\s+PRIMARY\s+KEY", re.IGNORECASE)


def _split_defs(body: str) -> list[str]:
    """Split a CREATE TABLE body on top-level commas (quote- and
    paren-aware, so DECIMAL(10,2) and COMMENT 'a, b' stay intact)."""
    parts, depth, in_str, cur = [], 0, False, []
    for ch in body:
        if ch == "'":
            in_str = not in_str
        elif not in_str:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append("".join(cur))
                cur = []
                continue
        cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def _fmt_for(path: str) -> str:
    lower = path.lower()
    for ext in ("csv", "json", "orc"):
        if ext in ("csv",) and lower.endswith(".csv"):
            return "csv"
        if lower.endswith("." + ext):
            return ext
    return "parquet"


def _rewrite_read_fns(sql: str) -> str:
    def repl(m: re.Match) -> str:
        fmt, path = m.group(1).lower(), m.group(2)
        table = f"{'parquet' if fmt == 'parquet' else fmt}.`{path}`"
        if "filename" in m.group(0).lower():
            # provenance read: surface the source file like DuckDB's
            # filename=true via Spark's _metadata hidden column
            return (
                f"(SELECT *, _metadata.file_path AS filename"
                f" FROM {table})"
            )
        return table

    return _sub_quote_aware(_READ_FN, repl, sql)


def _rewrite_struct_literals(sql: str) -> str:
    """`{ 'k': expr, ... }` → named_struct('k', expr, ...), nested.
    Scans for '{' followed by a quoted key and rewrites the balanced
    region; anything else (mustache already rendered away) is left."""
    i = 0
    out = []
    n = len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            # copy the whole literal verbatim (''-escape-aware) so a
            # {...}-shaped snippet inside prose never rewrites
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i : min(j + 1, n)])
            i = j + 1
            continue
        if c == "{" and re.match(r"\{\s*'", sql[i:]):
            j, depth = i, 0
            while j < n:
                if sql[j] == "'":  # skip string
                    j += 1
                    while j < n and sql[j] != "'":
                        j += 1
                elif sql[j] == "{":
                    depth += 1
                elif sql[j] == "}":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            body = sql[i + 1 : j]
            out.append(_struct_body(body))
            i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _struct_body(body: str) -> str:
    """Convert `'k': v, 'k2': v2` (v possibly a nested {…}) to
    named_struct(...)."""
    parts = []
    depth = 0
    cur = []
    in_str = False
    for ch in body:
        if ch == "'":
            in_str = not in_str
            cur.append(ch)
        elif not in_str and ch in "{([":
            depth += 1
            cur.append(ch)
        elif not in_str and ch in "})]":
            depth -= 1
            cur.append(ch)
        elif not in_str and ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    args = []
    for part in parts:
        k, _, v = part.partition(":")
        v = v.strip()
        if re.match(r"^\{\s*'", v):
            v = _rewrite_struct_literals(v)
        args.append(f"{k.strip()}, {v}")
    return "named_struct(" + ", ".join(args) + ")"


def _rewrite_json_object(sql: str) -> str:
    """json_object(...) → to_json(named_struct(...)) with balanced
    parens (args copied verbatim — same key/value convention)."""
    out = []
    i, n = 0, len(sql)
    spans = [(a, b) for a, b, in_str in _scan_strings(sql) if in_str]
    while True:
        m = _JSON_OBJECT.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        if any(a <= m.start() < b for a, b in spans):
            # token inside a string literal — prose, not a call
            out.append(sql[i : m.end()])
            i = m.end()
            continue
        out.append(sql[i : m.start()])
        j, depth = m.end() - 1, 0
        in_str = False
        while j < n:
            ch = sql[j]
            if ch == "'":
                in_str = not in_str
            elif not in_str and ch == "(":
                depth += 1
            elif not in_str and ch == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        inner = sql[m.end() : j]
        out.append(f"to_json(named_struct({inner}))")
        i = j + 1
    return "".join(out)


def _rewrite_create_table_types(sql: str) -> str:
    """Map DuckDB DDL Spark can't parse inside CREATE TABLE column
    lists: TEXT/TIME column types -> STRING, PRIMARY KEY constraints
    stripped (Spark tables carry no constraints). Only the balanced
    paren region after CREATE TABLE is touched."""
    out = []
    pos = 0
    while True:
        m = _CREATE_TABLE.search(sql, pos)
        if not m:
            out.append(sql[pos:])
            break
        out.append(sql[pos : m.end()])
        j, depth, in_str = m.end(), 1, False
        while j < len(sql) and depth:
            ch = sql[j]
            if ch == "'":
                in_str = not in_str
            elif not in_str:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
            j += 1
        body = sql[m.end() : j - 1]
        body = _PK_CONSTRAINT.sub("", body)
        # map types per COLUMN DEFINITION (name then type): a blanket
        # \bTEXT|TIME\b substitution would also rewrite column NAMES
        # like `time` or words inside COMMENT literals
        defs = []
        for coldef in _split_defs(body):
            toks = coldef.split(None, 2)
            if len(toks) >= 2 and toks[1].upper() in ("TEXT", "TIME"):
                lead = coldef[: len(coldef) - len(coldef.lstrip())]
                rest = " " + toks[2] if len(toks) > 2 else ""
                coldef = f"{lead}{toks[0]} STRING{rest}"
            defs.append(coldef)
        body = ",".join(defs)
        out.append(body)
        out.append(")")
        pos = j
    return "".join(out)


def duckdb_to_spark_sql(sql: str) -> str:
    """Apply every rewrite; idempotent on already-Spark SQL."""
    sql = _rewrite_read_fns(sql)
    # DATE('now', ...) / FROM 'path': the quotes are intrinsic to the
    # patterns, so they run over the raw text but guarded on match
    # START — a same-shaped snippet inside another literal stays prose
    sql = _sub_quote_aware(
        _SQLITE_DATE, r"date_sub(current_date(), \1)", sql
    )
    sql = _sub_quote_aware(
        _QUOTED_FROM,
        lambda m: f"{m.group(1)} {_fmt_for(m.group(2))}.`{m.group(2)}`",
        sql,
    )
    sql = _rewrite_struct_literals(sql)
    sql = _rewrite_json_object(sql)
    sql = _rewrite_create_table_types(sql)
    # TIME '…' literal -> plain string (Spark has no TIME type; the
    # repo-wide convention binds times as strings, binding.py)
    sql = _sub_quote_aware(_TIME_LITERAL, r"'\1'", sql)

    def _typed_marker(m: "re.Match") -> str:
        kw, marker = m.group(1).upper(), m.group(2)
        if kw == "TIME":
            return marker  # binds as string
        return f"CAST({marker} AS {kw})"

    sql = _sub_quote_aware(_TYPED_MARKER, _typed_marker, sql)
    # DuckDB's JSON type is a VARCHAR alias (query_executor.cpp:213);
    # Spark has no JSON type, so the cast disappears and the value
    # stays a string — declare the column in the endpoint's
    # `json-columns:` to get the reference's nested-object response
    # (issue #38, results.to_json_rows)
    sql = _sub_quote_aware(_JSON_CAST_SUFFIX, "", sql)
    sql = _rewrite_json_casts(sql)
    return sql
