"""SQL text utilities: statement splitting, trimming, placeholder
counting — quote-aware per the reference's semantics (reference:
sql_utils.cpp, test/cpp/sql_utils_test.cpp).

Templates may render to MULTIPLE statements (setup temp views /
session settings, then the result query); the splitter must respect
single quotes (with '' escapes), double-quoted identifiers (with ""
escapes), and PostgreSQL-style dollar quoting ($tag$ ... $tag$ /
$$...$$) so a semicolon inside any quoted context never splits.

Implementation: one shared scanner yields each character with its
quote context; the three public functions are thin consumers — same
observable behavior as the reference, structured differently.
"""

from __future__ import annotations

CODE = "code"
QUOTED = "quoted"  # inside ' " or $tag$ — semicolons/placeholders inert


def _valid_dollar_tag(tag: str) -> bool:
    """$identifier$ where identifier is [A-Za-z0-9_]* (may be empty);
    ASCII-only, matching the reference's isalnum."""
    return all(
        (c.isascii() and c.isalnum()) or c == "_" for c in tag[1:-1]
    )


def _scan(sql: str):
    """Yield (chunk, context) pairs covering `sql` exactly once.

    Chunks are either single characters in CODE context or longer
    QUOTED runs (quote delimiters, escaped quotes, dollar tags emit
    with QUOTED so consumers treat them as inert text)."""
    i = 0
    n = len(sql)
    state = CODE  # or "squote" / "dquote" / "dollar"
    dollar_tag = ""
    while i < n:
        c = sql[i]
        if state == CODE:
            if c == "'":
                state = "squote"
                yield c, QUOTED
                i += 1
                continue
            if c == '"':
                state = "dquote"
                yield c, QUOTED
                i += 1
                continue
            if c == "$":
                end = sql.find("$", i + 1)
                if end != -1:
                    tag = sql[i : end + 1]
                    if _valid_dollar_tag(tag):
                        state = "dollar"
                        dollar_tag = tag
                        yield tag, QUOTED
                        i = end + 1
                        continue
                yield c, CODE
                i += 1
                continue
            yield c, CODE
            i += 1
            continue
        if state == "squote":
            if c == "'":
                if i + 1 < n and sql[i + 1] == "'":
                    yield "''", QUOTED  # escaped quote stays inside
                    i += 2
                    continue
                state = CODE
            yield c if c != "'" else "'", QUOTED
            i += 1
            continue
        if state == "dquote":
            if c == '"':
                if i + 1 < n and sql[i + 1] == '"':
                    yield '""', QUOTED
                    i += 2
                    continue
                state = CODE
            yield c if c != '"' else '"', QUOTED
            i += 1
            continue
        # state == "dollar"
        if c == "$":
            end = sql.find("$", i + 1)
            if end != -1 and sql[i : end + 1] == dollar_tag:
                state = CODE
                yield dollar_tag, QUOTED
                i = end + 1
                continue
        yield c, QUOTED
        i += 1


def trim_sql_string(sql: str) -> str:
    """Whitespace-trim (the reference's trimSqlString)."""
    return sql.strip()


def split_sql_statements(sql: str) -> list[str]:
    """Split on semicolons OUTSIDE any quoted context; statements come
    back trimmed, empties dropped, trailing semicolon optional."""
    statements: list[str] = []
    current: list[str] = []
    for chunk, ctx in _scan(sql):
        if ctx is CODE and chunk == ";":
            stmt = trim_sql_string("".join(current))
            if stmt:
                statements.append(stmt)
            current = []
        else:
            current.append(chunk)
    stmt = trim_sql_string("".join(current))
    if stmt:
        statements.append(stmt)
    return statements


def count_sql_placeholders(sql: str) -> int:
    """Count `?` placeholders OUTSIDE any quoted context."""
    return sum(
        1 for chunk, ctx in _scan(sql) if ctx is CODE and chunk == "?"
    )
