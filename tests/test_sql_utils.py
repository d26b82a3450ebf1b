"""SQL text utilities — ports the reference's sql_utils_test.cpp
vector set (basic splitting, quoted contexts, dollar quoting,
security edge cases, trimming, placeholder counting)."""

import pytest

from flapi_spark.sql_utils import (
    count_sql_placeholders,
    split_sql_statements,
    trim_sql_string,
)


@pytest.mark.parametrize(
    "sql,want",
    [
        ("SELECT * FROM t", ["SELECT * FROM t"]),
        ("SELECT * FROM t;", ["SELECT * FROM t"]),
        (
            "INSERT INTO t VALUES (1); SELECT * FROM t",
            ["INSERT INTO t VALUES (1)", "SELECT * FROM t"],
        ),
        ("SELECT 1; SELECT 2; SELECT 3", ["SELECT 1", "SELECT 2", "SELECT 3"]),
        (
            "  SELECT 1;  SELECT 2;  SELECT 3;  ",
            ["SELECT 1", "SELECT 2", "SELECT 3"],
        ),
        ("", []),
        ("   \n\t  ", []),
        (";;;", []),
        (" ; ; ; ", []),
        ("SELECT 1;\nSELECT 2;\nSELECT 3", ["SELECT 1", "SELECT 2", "SELECT 3"]),
    ],
)
def test_basic_splitting(sql, want):
    assert split_sql_statements(sql) == want


@pytest.mark.parametrize(
    "sql,n",
    [
        ("SELECT 'a;b' FROM t", 1),
        ("SELECT 'a;b;c;d' FROM t", 1),
        ("SELECT 'it''s fine; really' FROM t", 1),
        ("SELECT 'a''b''c;d''e' FROM t", 1),
        ("SELECT 'test'';' FROM t", 1),
        ("SELECT ''; SELECT 2", 2),
        ('SELECT "col;name" FROM t', 1),
        ('SELECT "a;b;c" FROM t', 1),
        ('SELECT "test""more;" FROM t', 1),
        ("SELECT 'a;b', \"c;d\" FROM t", 1),
        ('SELECT "it\'s; here" FROM t', 1),
        ("SELECT 'say \"hello;\"; bye' FROM t", 1),
    ],
)
def test_quoted_semicolons_do_not_split(sql, n):
    assert len(split_sql_statements(sql)) == n


@pytest.mark.parametrize(
    "sql,n",
    [
        ("SELECT $$ text; here $$", 1),
        ("SELECT $tag$ text; here $tag$", 1),
        ("SELECT $abc123$ text; here $abc123$", 1),
        ("SELECT $my_tag$ text; here $my_tag$", 1),
        ("SELECT $$ a;b $$; SELECT 2", 2),
        ("SELECT $$ a;b $$, $$ c;d $$; SELECT 2", 2),
        ("SELECT $a$ $b$ text; $b$ more $a$", 1),  # tags must match
        ("SELECT $$ it's; fine $$ FROM t", 1),
        ('SELECT $$ say "hi;"; $$ FROM t', 1),
        ("SELECT $5; SELECT 2", 2),  # $5 is not a tag opener
    ],
)
def test_dollar_quoting(sql, n):
    assert len(split_sql_statements(sql)) == n


def test_dollar_quote_statement_content_preserved():
    got = split_sql_statements("SELECT $$ a;b $$; SELECT 2")
    assert got == ["SELECT $$ a;b $$", "SELECT 2"]


@pytest.mark.parametrize(
    "sql,n",
    [
        # fail-safe: unclosed quote swallows the rest — never split
        ("SELECT 'unclosed; DROP TABLE t", 1),
        ('SELECT "unclosed; DROP TABLE t', 1),
        ("SELECT $tag$ unclosed; DROP TABLE t", 1),
        ("SELECT * FROM t WHERE x = 'y'; DROP TABLE t", 2),
        # SQL escapes with '', not backslash: 'test\' is complete
        ("SELECT 'test\\'; DROP TABLE t", 2),
        ("SELECT 'test\\'''; SELECT 2", 2),
        ("SELECT '-- comment; DROP TABLE t'; SELECT 2", 2),
        ("SELECT ';;;'; SELECT 2", 2),
        ("SELECT 'a' || \"b\" || 'c;d'; SELECT 2", 2),
    ],
)
def test_security_edge_cases(sql, n):
    assert len(split_sql_statements(sql)) == n


def test_long_string_literal():
    long_str = "a" * 10000
    assert len(split_sql_statements(f"SELECT '{long_str};'; SELECT 2")) == 2


@pytest.mark.parametrize(
    "raw,want",
    [
        ("hello", "hello"),
        ("   hello", "hello"),
        ("hello   ", "hello"),
        ("   hello   ", "hello"),
        ("\t\n hello \n\t", "hello"),
        ("", ""),
        ("   \t\n   ", ""),
        ("  hello   world  ", "hello   world"),
    ],
)
def test_trim(raw, want):
    assert trim_sql_string(raw) == want


@pytest.mark.parametrize(
    "sql,n",
    [
        ("", 0),
        ("SELECT 1", 0),
        ("SELECT ?", 1),
        ("INSERT INTO t VALUES (?, ?, ?)", 3),
        ("SELECT '?'", 0),
        ("SELECT 'literal ? mark'", 0),
        ('SELECT "col?name"', 0),
        ("SELECT $$body with ? inside$$", 0),
        ("SELECT $tag$with ? inside$tag$", 0),
        ("WHERE x = ? AND label = '?'", 1),
        ("WHERE a = ? AND b = '?' AND c = ?", 2),
        ("WHERE a = ? AND b LIKE 'x?y' AND c = ?", 2),
        ("SELECT 'O''?''Brien'", 0),
        ("SELECT 'O''?''Brien' WHERE x = ?", 1),
    ],
)
def test_count_placeholders(sql, n):
    assert count_sql_placeholders(sql) == n
