"""DuckDB→Spark dialect shim tests: unit rewrites plus the reference's
own example templates (examples/sqls/customers/customers.sql,
examples/sqls/taxi/taxi.sql shapes) executing through the engine
unchanged via `template-dialect: duckdb`."""

import textwrap

import os

import pytest

from flapi_spark.config import EndpointConfig
from flapi_spark.dialect import duckdb_to_spark_sql
from flapi_spark.executor import QueryExecutor


def test_quoted_from_rewrites_by_extension():
    assert (
        duckdb_to_spark_sql("SELECT * FROM '/data/c.parquet' WHERE x=1")
        == "SELECT * FROM parquet.`/data/c.parquet` WHERE x=1"
    )
    assert "csv.`/d/f.csv`" in duckdb_to_spark_sql("SELECT 1 FROM '/d/f.csv'")
    # non-path string literals survive untouched
    s = "SELECT * FROM t WHERE name = 'FROM ''x.parquet'''"
    assert duckdb_to_spark_sql(s) == s


def test_read_parquet_and_filename_provenance():
    assert (
        duckdb_to_spark_sql("SELECT * FROM read_parquet('/d/x.parquet')")
        == "SELECT * FROM parquet.`/d/x.parquet`"
    )
    out = duckdb_to_spark_sql(
        "select filename, count(*) from"
        " read_parquet('/d/*.parquet', filename=true) group by 1"
    )
    assert "_metadata.file_path AS filename" in out
    assert "parquet.`/d/*.parquet`" in out


def test_struct_literal_nested():
    out = duckdb_to_spark_sql(
        "SELECT { 'street': c_address, 'address': {'nation': c_nationkey,"
        " 'phone': c_phone }} AS contact FROM t"
    )
    assert out == (
        "SELECT named_struct('street', c_address, 'address',"
        " named_struct('nation', c_nationkey, 'phone', c_phone)) AS"
        " contact FROM t"
    )


def test_json_object_and_sqlite_date():
    out = duckdb_to_spark_sql(
        "SELECT json_object('id', o_id, 'd', o_date) AS j FROM o"
        " WHERE d >= DATE('now', '-90 days')"
    )
    assert "to_json(named_struct('id', o_id, 'd', o_date))" in out
    assert "date_sub(current_date(), 90)" in out


def test_idempotent_on_spark_sql():
    s = "SELECT named_struct('a', 1) AS s FROM parquet.`/d/x.parquet`"
    assert duckdb_to_spark_sql(s) == s


def test_reference_customers_template_end_to_end(spark, sf_dir):
    """The reference's customers.sql (examples/sqls/customers/
    customers.sql — quoted-path FROM + nested struct literals +
    conditional mustache sections) served through the engine with only
    `template-dialect: duckdb` added to the endpoint YAML."""
    template = textwrap.dedent(
        """
        SELECT
          c_custkey as key,
          c_name as name,
          c_acctbal as balance,
          { 'name': c_name, 'address': {'nation': c_nationkey, 'balance': c_acctbal }} AS contact,
          { 'segment': c_mktsegment } AS segment
        FROM '{{{conn.path}}}'
        WHERE 1=1
        {{#params.id}}
          AND c_custkey = {{{ params.id }}}
        {{/params.id}}
        {{#params.segment}}
          AND c_mktsegment LIKE '%{{{ params.segment }}}%'
        {{/params.segment}}
        """
    )
    ep = EndpointConfig.from_dict(
        {
            "url-path": "/customers/",
            "template-text": template,
            "template-dialect": "duckdb",
            "connection": ["customers-parquet"],
            "with-pagination": False,
            "request": [
                {
                    "field-name": "id",
                    "field-in": "query",
                    "validators": [{"type": "int", "min": 1}],
                },
                {
                    "field-name": "segment",
                    "field-in": "query",
                    "validators": [
                        {
                            "type": "enum",
                            "allowedValues": [
                                "AUTOMOBILE", "BUILDING", "FURNITURE",
                                "HOUSEHOLD", "MACHINERY",
                            ],
                        }
                    ],
                },
            ],
        },
        base_dir=None,
    )
    from flapi_spark.sources.registry import Connection, ConnectionRegistry

    reg = ConnectionRegistry()
    reg.add(
        Connection(
            name="customers-parquet",
            properties={"path": f"{sf_dir}/customer.parquet"},
        )
    )
    ex = QueryExecutor(spark, registry=reg)
    res = ex.execute(ep, {"segment": "BUILDING"})
    rows = res.df.collect()
    assert rows
    for r in rows:
        assert r.segment.segment == "BUILDING"  # nested struct built
        assert r.contact.address.balance is not None
    one = ex.execute(ep, {"id": str(rows[0].key)}).df.collect()
    assert len(one) == 1 and one[0].key == rows[0].key


def test_reference_taxi_provenance_template(spark, sf_dir, tmp_path):
    """The taxi.sql shape (examples/sqls/taxi/taxi.sql): glob read with
    filename=true provenance, columns adapted to the testdata
    schema."""
    import shutil

    d = tmp_path / "multi"
    d.mkdir()
    for n in ("a.parquet", "b.parquet"):
        shutil.copy(f"{sf_dir}/customer.parquet", d / n)
    ep = EndpointConfig.from_dict(
        {
            "url-path": "/taxi/",
            "template-text": (
                "select filename, c_mktsegment, count(*) AS n"
                " from read_parquet('{{{conn.path}}}/*.parquet', filename=true)"
                " group by 1, 2"
            ),
            "template-dialect": "duckdb",
            "connection": ["lake"],
            "with-pagination": False,
        },
        base_dir=None,
    )
    from flapi_spark.sources.registry import Connection, ConnectionRegistry

    reg = ConnectionRegistry()
    reg.add(Connection(name="lake", properties={"path": str(d)}))
    rows = QueryExecutor(spark, registry=reg).execute(ep).df.collect()
    files = {r.filename.split("/")[-1] for r in rows}
    assert files == {"a.parquet", "b.parquet"}


# --- robustness: the shim must never corrupt non-DuckDB SQL ---------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False

if HAS_HYPOTHESIS:

    @given(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("L", "N", "P", "Z"),
                blacklist_characters="{}'",
            ),
            max_size=200,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_shim_identity_without_duckdb_isms(sql):
        # no braces, no quotes -> nothing for any rewrite to bite on
        # (read_parquet/DATE('now') both need quotes)
        assert duckdb_to_spark_sql(sql) == sql

    @given(st.text(max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_shim_total_on_arbitrary_text(sql):
        # never raises, always returns a string
        out = duckdb_to_spark_sql(sql)
        assert isinstance(out, str)


if HAS_HYPOTHESIS:

    from flapi_spark.binding import rewrite_typed_params, spark_args
    from flapi_spark.validation import RequestField

    _FIELD = RequestField.from_dict(
        {
            "field-name": "p",
            "field-in": "query",
            "validators": [{"type": "enum", "allowedValues": ["A"]}],
        }
    )

    @given(st.text(max_size=80))
    @settings(max_examples=300, deadline=None)
    def test_typed_param_value_never_lands_in_sql(value):
        """Injection-proof by construction: for TYPED fields (enum
        here; plain strings deliberately stay interpolation +
        preventSqlInjection, matching the reference), the rewritten
        SQL contains only the :p marker — the value travels in the
        args dict, never the query text."""
        sql_in = "SELECT * FROM t WHERE a = {{params.p}} AND b = '{{{params.p}}}'"
        sql, bound = rewrite_typed_params(sql_in, [_FIELD])
        assert "{{" not in sql and "}}" not in sql
        assert bound == ["p"]
        args = spark_args({"p": value}, bound)
        assert args.get("p") == value
        # the SQL text is a CONSTANT independent of the value — the
        # value can only travel through the args dict
        assert sql == "SELECT * FROM t WHERE a = :p AND b = :p"


def test_rewrites_skip_tokens_inside_string_literals():
    """Trigger tokens sitting inside prose string literals must stay
    prose — the module promises all rewrites are quote-aware."""
    from flapi_spark.dialect import duckdb_to_spark_sql as d

    # json_object( inside a literal is prose
    sql = "SELECT 'call json_object(a, b) here' AS note"
    assert d(sql) == sql
    # a real call NEXT TO prose containing the token
    out = d("SELECT 'json_object(' AS p, json_object('k', v) AS j")
    assert out == "SELECT 'json_object(' AS p, to_json(named_struct('k', v)) AS j"
    # read_parquet mentioned in prose
    sql2 = "SELECT 'use read_parquet(x) for speed' AS tip"
    assert d(sql2) == sql2
    # {'k': v}-shaped snippet inside prose
    sql3 = "SELECT '{ ''k'': 1 }' AS shape"
    assert d(sql3) == sql3
    # DATE('now') mentioned midway through a literal
    sql4 = "SELECT 'DATE(''now'', ''-3 days'') syntax' AS doc"
    assert d(sql4) == sql4


def test_json_cast_rewrites(spark):
    """The issue-#38 template shape (api_configuration/sqls/
    json_demo.sql): '…'::JSON parses in DuckDB but not Spark — the
    cast drops (JSON is a VARCHAR alias) and runs end-to-end; with
    json-columns declared, the response embeds the nested object."""
    from flapi_spark.config import EndpointConfig
    from flapi_spark.dialect import duckdb_to_spark_sql
    from flapi_spark.executor import QueryExecutor
    from flapi_spark.results import to_json_rows

    sql = (
        "SELECT 1 AS id,"
        " '{\"a\": 1, \"b\": [10, 20]}'::JSON AS payload"
    )
    out = duckdb_to_spark_sql(sql)
    assert "::" not in out and "JSON" not in out.upper().replace(
        '"A": 1', ""
    ).split("AS PAYLOAD")[0].split("'")[-1]
    assert duckdb_to_spark_sql(
        "SELECT CAST(x AS JSON) FROM t"
    ) == "SELECT CAST(x AS STRING) FROM t"
    # a ::JSON inside a string literal is data, untouched
    lit = "SELECT 'cast it with ::JSON' AS note"
    assert duckdb_to_spark_sql(lit) == lit
    # nested-call operands (paren-aware scan; r5 ADVICE: the old
    # character-class regex could not match any parenthesized operand)
    assert duckdb_to_spark_sql(
        "SELECT CAST(json_object('a', x, 'b', f(y, 2)) AS JSON) FROM t"
    ) == (
        "SELECT CAST(to_json(named_struct('a', x, 'b', f(y, 2)))"
        " AS STRING) FROM t"
    )
    # non-JSON casts with nested parens are untouched; a JSON cast
    # NESTED inside another cast's operand still rewrites
    assert duckdb_to_spark_sql(
        "SELECT CAST(coalesce(CAST(p AS JSON), '{}') AS VARCHAR) FROM t"
    ) == (
        "SELECT CAST(coalesce(CAST(p AS STRING), '{}') AS VARCHAR)"
        " FROM t"
    )
    # 'AS JSON' as trailing string DATA is not a cast tail
    s = "SELECT CAST('payload AS JSON' AS VARCHAR) FROM t"
    assert duckdb_to_spark_sql(s) == s

    ep = EndpointConfig.from_dict({
        "url-path": "/json-demo",
        "template-text": sql,
        "template-dialect": "duckdb",
        "json-columns": ["payload"],
        "with-pagination": False,
    })
    res = QueryExecutor(spark, None).execute(ep, {})
    rows = to_json_rows(res.df, json_columns=res.json_columns)
    assert rows == [{"id": 1, "payload": {"a": 1, "b": [10, 20]}}]


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/examples/sqls"),
    reason="reference tree not available",
)
def test_dialect_parses_entire_reference_template_corpus(spark):
    """Every SQL template shipped by the reference (examples/ + the
    integration fixture project) must survive the dialect shim and
    PARSE in Spark once mustache placeholders are rendered. Template
    params render as literals; {{conn.*}}/table refs as dummy
    identifiers (a missing table is fine — resolution errors are
    allowed, parse errors are not)."""
    import glob as _glob
    import re as _re

    from flapi_spark.dialect import duckdb_to_spark_sql

    paths = sorted(
        _glob.glob(
            "/root/reference/test/integration/api_configuration/sqls/*.sql"
        )
        + _glob.glob("/root/reference/examples/sqls/**/*.sql",
                     recursive=True)
    )
    assert len(paths) >= 25
    failures = []
    for p in paths:
        raw = open(p).read()
        # render: conn/table refs -> identifier, params -> literal,
        # section markers -> empty (their bodies keep rendering)
        txt = _re.sub(r"\{\{[#^/][^}]*\}\}", "", raw)
        # conn.path renders as a parquet path (the quoted-FROM rewrite
        # keys on the extension, exactly like a real render would)
        txt = _re.sub(
            r"\{\{\{?\s*conn\.path\s*\}\}\}?", "tbl.parquet", txt
        )
        txt = _re.sub(r"\{\{\{?\s*(conn|cache)\.[^}]*\}\}\}?", "tbl", txt)
        txt = _re.sub(r"\{\{\{?[^}]*\}\}\}?", "1", txt)
        try:
            sql = duckdb_to_spark_sql(txt)
        except Exception as exc:
            failures.append((p, f"dialect: {exc}"))
            continue
        for s in (x.strip() for x in sql.split(";")):
            if not s or not s.lstrip().upper().startswith(
                ("SELECT", "WITH")
            ):
                continue
            try:
                spark.sql("EXPLAIN " + s)
            except Exception as exc:
                msg = str(exc).split("\n")[0]
                if (
                    "TABLE_OR_VIEW_NOT_FOUND" in msg
                    or "cannot be found" in msg
                    or "PATH_NOT_FOUND" in msg
                    or "UNRESOLVED_COLUMN" in msg
                    or "UNRESOLVED_ROUTINE" in msg
                    or "COLUMN_NOT_FOUND" in msg
                ):
                    continue  # parse succeeded; only resolution failed
                failures.append((p, msg[:160]))
                break
    assert not failures, failures
