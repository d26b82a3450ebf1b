from flapi_spark.templates import build_context, render_template, sql_escape


def test_variable_escaped():
    assert render_template("x = '{{params.v}}'", {"params": {"v": "a'b"}}) == "x = 'a''b'"


def test_raw_variable():
    assert render_template("FROM '{{{conn.path}}}'", {"conn": {"path": "/tmp/x.parquet"}}) == (
        "FROM '/tmp/x.parquet'"
    )


def test_missing_variable_renders_empty():
    assert render_template("a{{params.nope}}b", {"params": {}}) == "ab"


def test_section_present():
    t = "WHERE 1=1{{#params.id}} AND id = {{params.id}}{{/params.id}}"
    assert render_template(t, {"params": {"id": 5}}) == "WHERE 1=1 AND id = 5"
    assert render_template(t, {"params": {}}) == "WHERE 1=1"


def test_inverted_section():
    t = "{{^params.id}}no id{{/params.id}}"
    assert render_template(t, {"params": {}}) == "no id"
    assert render_template(t, {"params": {"id": 1}}) == ""


def test_nested_sections():
    t = "{{#params.a}}A{{#params.b}}B{{/params.b}}{{/params.a}}"
    assert render_template(t, {"params": {"a": 1, "b": 1}}) == "AB"
    assert render_template(t, {"params": {"a": 1}}) == "A"
    assert render_template(t, {"params": {"b": 1}}) == ""


def test_comment_dropped():
    assert render_template("a{{! ignore me }}b", {}) == "ab"


def test_env_namespace():
    ctx = build_context(env={"FOO": "bar"})
    assert render_template("{{env.FOO}}", ctx) == "bar"


def test_cache_namespace():
    ctx = build_context(cache={"table": "t1", "previousSnapshotTimestamp": "2026-01-01"})
    out = render_template(
        "INSERT INTO {{cache.table}} -- since {{cache.previousSnapshotTimestamp}}", ctx
    )
    assert out == "INSERT INTO t1 -- since 2026-01-01"


def test_reference_customers_template_shape():
    """Renders the same shape as the reference's customers.sql
    (reference: examples/sqls/customers/customers.sql)."""
    t = (
        "SELECT c_custkey FROM '{{{conn.path}}}' WHERE 1=1"
        "{{#params.id}} AND c_custkey = {{{ params.id }}}{{/params.id}}"
        "{{#params.segment}} AND c_mktsegment LIKE '%{{{ params.segment }}}%'{{/params.segment}}"
    )
    ctx = build_context(params={"segment": "AUTO"}, conn={"path": "/x.parquet"})
    out = render_template(t, ctx)
    assert out == (
        "SELECT c_custkey FROM '/x.parquet' WHERE 1=1 AND c_mktsegment LIKE '%AUTO%'"
    )


def test_sql_escape():
    assert sql_escape("O'Brien") == "O''Brien"


def test_sql_escape_backslash():
    # Spark's default parser treats backslash as an escape inside
    # string literals: a payload ending in \' must not escape the
    # doubled quote. Escaped output must keep attacker text inside the
    # literal.
    assert sql_escape("\\") == "\\\\"
    assert sql_escape("\\' OR 1=1 --") == "\\\\'' OR 1=1 --"
    assert sql_escape("O'Brien") == "O''Brien"


def test_backslash_payload_stays_inside_literal(spark):
    # end-to-end: under default escapedStringLiterals=false the
    # rendered literal must round-trip the payload as data
    payload = "x\\' OR '1'='1"
    sql = f"SELECT '{sql_escape(payload)}' AS v"
    assert spark.sql(sql).collect()[0].v == payload
