"""Write operations, vector-mirrored from the reference's
examples/data/write-examples/* and test/integration/
test_write_operations*.py: POST insert, PUT update with RETURNING,
DELETE, rows_affected, trailing-SELECT returns-data, transactional
rollback, cache invalidate/refresh-on-write, and the write half of the
injection corpus (typed binding holds for writes too)."""

import pytest

from flapi_spark.config import EndpointConfig
from flapi_spark.executor import QueryExecutor
from flapi_spark.writes import (
    WriteError,
    _rm_table as _rm,
    apply_write_statement,
    execute_write_statements,
)


@pytest.fixture()
def customers_table(spark):
    spark.sql("DROP TABLE IF EXISTS wcustomers")
    spark.sql(
        "CREATE TABLE wcustomers (customer_id BIGINT, name STRING,"
        " email STRING, segment STRING) USING parquet"
    )
    spark.sql(
        "INSERT INTO wcustomers VALUES"
        " (1, 'Alice', 'alice@x.io', 'BUILDING'),"
        " (2, 'Bob', 'bob@x.io', 'MACHINERY'),"
        " (3, 'Cara', 'cara@x.io', 'BUILDING')"
    )
    yield "wcustomers"
    spark.sql("DROP TABLE IF EXISTS wcustomers")


class TestStatements:
    def test_insert_rows_affected(self, spark, customers_table):
        r = apply_write_statement(
            spark,
            "INSERT INTO wcustomers VALUES"
            " (4, 'Dee', 'dee@x.io', 'FURNITURE')",
        )
        assert r.rows_affected == 1
        assert spark.table("wcustomers").count() == 4

    def test_update_translates_to_copy_on_write(self, spark, customers_table):
        r = apply_write_statement(
            spark,
            "UPDATE wcustomers SET segment = 'AUTOMOBILE'"
            " WHERE customer_id = 2",
        )
        assert r.rows_affected == 1
        rows = {r2.customer_id: r2.segment
                for r2 in spark.table("wcustomers").collect()}
        assert rows[2] == "AUTOMOBILE" and rows[1] == "BUILDING"

    def test_update_returning_post_image(self, spark, customers_table):
        r = apply_write_statement(
            spark,
            "UPDATE wcustomers SET email = 'new@x.io'"
            " WHERE customer_id = 1"
            " RETURNING customer_id, email",
        )
        assert r.rows_affected == 1
        got = r.returned_data.collect()
        assert [(x.customer_id, x.email) for x in got] == [(1, "new@x.io")]

    def test_update_without_where_touches_all(self, spark, customers_table):
        r = apply_write_statement(
            spark, "UPDATE wcustomers SET segment = 'ALL'"
        )
        assert r.rows_affected == 3
        assert spark.table("wcustomers").where(
            "segment != 'ALL'"
        ).count() == 0

    def test_delete_with_returning_pre_image(self, spark, customers_table):
        r = apply_write_statement(
            spark,
            "DELETE FROM wcustomers WHERE segment = 'BUILDING'"
            " RETURNING customer_id, name",
        )
        assert r.rows_affected == 2
        kept = [x.customer_id for x in spark.table("wcustomers").collect()]
        assert kept == [2]
        deleted = sorted(x.customer_id for x in r.returned_data.collect())
        assert deleted == [1, 3]

    def test_insert_returning_returns_inserted_rows(self, spark, customers_table):
        """Reference create-template shape (database_manager.cpp write
        path; examples/data/write-examples/): INSERT ... RETURNING
        yields the inserted rows, cast to table column types."""
        r = apply_write_statement(
            spark,
            "INSERT INTO wcustomers VALUES (9,'Zed','z@x.io','S')"
            " RETURNING customer_id, name",
        )
        assert r.rows_affected == 1
        got = [(x.customer_id, x.name) for x in r.returned_data.collect()]
        assert got == [(9, "Zed")]
        assert spark.table("wcustomers").count() == 4

    def test_insert_returning_with_column_list_nulls_unlisted(
        self, spark, customers_table
    ):
        r = apply_write_statement(
            spark,
            "INSERT INTO wcustomers (customer_id, name)"
            " VALUES (10, 'Yan'), (11, 'Wes')"
            " RETURNING customer_id, email, segment",
        )
        assert r.rows_affected == 2
        got = sorted(
            (x.customer_id, x.email, x.segment)
            for x in r.returned_data.collect()
        )
        assert got == [(10, None, None), (11, None, None)]

    def test_insert_returning_does_not_rescan_target(
        self, spark, customers_table
    ):
        """The RETURNING projection derives from the statement's OWN
        source rows (pre-existing rows with the same values never
        appear): inserting a duplicate of customer 1 returns ONE row."""
        r = apply_write_statement(
            spark,
            "INSERT INTO wcustomers VALUES"
            " (1, 'Alice', 'alice@x.io', 'BUILDING')"
            " RETURNING customer_id",
        )
        assert r.rows_affected == 1
        assert len(r.returned_data.collect()) == 1

    def test_insert_overwrite_returning_still_guided(
        self, spark, customers_table
    ):
        with pytest.raises(WriteError, match="multi-statement"):
            apply_write_statement(
                spark,
                "INSERT OVERWRITE wcustomers VALUES (9,'x','x@x','S')"
                " RETURNING customer_id",
            )

    def test_v2_update_returning_ambiguity_guard_precedes_native_path(
        self, spark, customers_table, monkeypatch
    ):
        """Iceberg/Delta targets take UPDATE natively — but a RETURNING
        whose predicate touches an assigned column must STILL raise
        BEFORE the native update runs (the post-update re-select would
        be silently empty/wrong). Simulated v2: no Iceberg jar in this
        sandbox, so _table_supports_row_dml is forced true and the
        guard must fire before anything executes."""
        import flapi_spark.writes as W

        monkeypatch.setattr(
            W, "_table_supports_row_dml", lambda *_: True
        )
        with pytest.raises(WriteError, match="ambiguous post-image"):
            apply_write_statement(
                spark,
                "UPDATE wcustomers SET segment = 'S2'"
                " WHERE segment = 'BUILDING' RETURNING customer_id",
            )
        # nothing mutated (the guard fired before the native branch)
        assert spark.table("wcustomers").where(
            "segment = 'BUILDING'"
        ).count() == 2

    def test_update_unknown_column_rejected(self, spark, customers_table):
        with pytest.raises(WriteError, match="unknown columns"):
            apply_write_statement(
                spark, "UPDATE wcustomers SET nope = 1 WHERE customer_id = 1"
            )


class TestMultiStatement:
    def test_trailing_select_returns_data(self, spark, customers_table):
        r = execute_write_statements(
            spark,
            [
                "INSERT INTO wcustomers VALUES (5,'Eve','eve@x.io','S')",
                "SELECT customer_id, name FROM wcustomers"
                " WHERE customer_id = 5",
            ],
            returns_data=True,
        )
        assert r.rows_affected == 1
        assert [(x.customer_id, x.name) for x in r.returned_data.collect()] \
            == [(5, "Eve")]

    def test_transaction_rolls_back_on_failure(self, spark, customers_table):
        with pytest.raises(Exception):
            execute_write_statements(
                spark,
                [
                    "DELETE FROM wcustomers WHERE customer_id = 1",
                    "INSERT INTO wcustomers SELECT * FROM no_such_table",
                ],
                transaction=True,
            )
        # first statement's delete restored
        assert spark.table("wcustomers").count() == 3

    def test_no_transaction_keeps_partial_effects(self, spark, customers_table):
        with pytest.raises(Exception):
            execute_write_statements(
                spark,
                [
                    "DELETE FROM wcustomers WHERE customer_id = 1",
                    "INSERT INTO wcustomers SELECT * FROM no_such_table",
                ],
                transaction=False,
            )
        assert spark.table("wcustomers").count() == 2


class TestEndpointSurface:
    def _write_ep(self, template, method="POST", **kw):
        d = {
            "url-path": "/customers",
            "method": method,
            "template-text": template,
            "request": [
                {"field-name": "id", "field-in": "body",
                 "validators": [{"type": "int", "min": 0}]},
                {"field-name": "name", "field-in": "body",
                 "validators": [{"type": "string",
                                 "preventSqlInjection": True}]},
            ],
        }
        d.update(kw)
        return EndpointConfig.from_dict(d)

    def test_post_endpoint_creates_record(self, spark, customers_table):
        ep = self._write_ep(
            "INSERT INTO wcustomers VALUES"
            " ({{params.id}}, '{{params.name}}', 'x@x.io', 'S')"
        )
        assert ep.is_write  # auto-detected from POST
        res = QueryExecutor(spark).execute_write(
            ep, {"id": "7", "name": "Greg"}
        )
        assert res.rows_affected == 1
        assert spark.table("wcustomers").where("customer_id = 7").count() == 1

    def test_put_update_via_typed_binding(self, spark, customers_table):
        ep = self._write_ep(
            "UPDATE wcustomers SET name = '{{params.name}}'"
            " WHERE customer_id = {{params.id}}",
            method="PUT",
        )
        res = QueryExecutor(spark).execute_write(
            ep, {"id": "2", "name": "Bobby"}
        )
        assert res.rows_affected == 1
        assert spark.table("wcustomers").where(
            "name = 'Bobby'"
        ).count() == 1

    def test_read_endpoint_refuses_write_path(self, spark, customers_table):
        ep = self._write_ep("SELECT 1", method="GET")
        with pytest.raises(WriteError, match="not a write endpoint"):
            QueryExecutor(spark).execute_write(ep, {})

    def test_write_injection_corpus(self, spark, customers_table):
        """Write half of the reference's injection corpus
        (test_sql_injection_write_corpus.py shapes): hostile values in
        typed/screened params must fail validation or bind inertly —
        never execute."""
        from flapi_spark.validation import ValidationError

        ep = self._write_ep(
            "INSERT INTO wcustomers VALUES"
            " ({{params.id}}, '{{params.name}}', 'x@x.io', 'S')"
        )
        ex = QueryExecutor(spark)
        before = spark.table("wcustomers").count()
        for hostile_id in ("1; DROP TABLE wcustomers", "1 OR 1=1"):
            with pytest.raises((ValidationError, ValueError)):
                ex.execute_write(ep, {"id": hostile_id, "name": "ok"})
        for hostile_name in ("x'); DELETE FROM wcustomers; --",
                             "Robert'); DROP TABLE wcustomers;--"):
            with pytest.raises((ValidationError, ValueError)):
                ex.execute_write(ep, {"id": "8", "name": hostile_name})
        assert spark.table("wcustomers").count() == before
        assert spark.table("wcustomers").columns  # table still exists

    def test_cache_invalidate_and_refresh_on_write(
        self, spark, customers_table, tmp_path
    ):
        from flapi_spark.cache import CacheManager

        (tmp_path / "cache_refresh.sql").write_text(
            "SELECT customer_id, name FROM wcustomers"
        )
        ep = self._write_ep(
            "INSERT INTO wcustomers VALUES"
            " ({{params.id}}, '{{params.name}}', 'x@x.io', 'S')",
            **{
                "cache": {
                    "enabled": True,
                    "table": "wcustomers_cache",
                    "template-file": str(tmp_path / "cache_refresh.sql"),
                    "invalidate-on-write": True,
                },
            },
        )
        mgr = CacheManager(spark, root=str(tmp_path / "cache_root"))
        ex = QueryExecutor(spark)
        # seed the cache, then write through the endpoint
        from flapi_spark.cache_flow import refresh_endpoint_cache

        refresh_endpoint_cache(ex, mgr, ep)
        assert not mgr.is_stale(ep.cache)
        ex.execute_write(ep, {"id": "11", "name": "Kay"}, cache_mgr=mgr)
        assert mgr.is_stale(ep.cache)
        # refresh-on-write variant re-syncs immediately
        ep.cache.refresh_on_write = True
        ex.execute_write(ep, {"id": "12", "name": "Lee"}, cache_mgr=mgr)
        assert not mgr.is_stale(ep.cache)
        cached = mgr.read(ep.cache)
        assert cached.where("customer_id = 12").count() == 1


class TestReferenceCrudShapes:
    """Reference-shaped CRUD templates (the construct mix of
    test/integration/api_configuration/sqls/customers-create.sql /
    -patch.sql: DuckDB DDL types, CREATE IF NOT EXISTS + INSERT +
    trailing SELECT in one template, mustache-optional PATCH
    assignments) run unchanged under template-dialect: duckdb."""

    def _ep(self, template, method, extra_fields=()):
        fields = [
            {"field-name": "customer_id", "field-in": "path",
             "required": False,
             "validators": [{"type": "int", "min": 1}]},
            {"field-name": "name", "field-in": "body", "required": False,
             "validators": [{"type": "string", "max": 100,
                             "preventSqlInjection": True}]},
            {"field-name": "segment", "field-in": "body",
             "required": False,
             "validators": [{"type": "enum",
                             "allowedValues": ["BUILDING", "MACHINERY"]}]},
            {"field-name": "last_login_time", "field-in": "body",
             "required": False, "validators": [{"type": "time"}]},
        ]
        return EndpointConfig.from_dict({
            "url-path": "/crud-customers",
            "method": method,
            "template-dialect": "duckdb",
            "template-text": template,
            "operation": {"type": "Write", "returns-data": True},
            "request": fields + list(extra_fields),
        })

    CREATE_TPL = """
CREATE TABLE IF NOT EXISTS crud_customers (
    id INTEGER PRIMARY KEY,
    name VARCHAR(100),
    segment VARCHAR(50),
    comment TEXT,
    last_login_time TIME
);

INSERT INTO crud_customers
SELECT COALESCE(MAX(id), 0) + 1,
  '{{{ params.name }}}',
  '{{{ params.segment }}}',
  {{#params.comment}}'{{{ params.comment }}}'{{/params.comment}}{{^params.comment}}NULL{{/params.comment}},
  {{#params.last_login_time}}TIME '{{{ params.last_login_time }}}'{{/params.last_login_time}}{{^params.last_login_time}}NULL{{/params.last_login_time}}
FROM crud_customers;

SELECT * FROM crud_customers WHERE id = (SELECT MAX(id) FROM crud_customers);
"""

    PATCH_TPL = """
UPDATE crud_customers
SET
  name = {{#params.name}}'{{{ params.name }}}'{{/params.name}}{{^params.name}}name{{/params.name}},
  segment = {{#params.segment}}'{{{ params.segment }}}'{{/params.segment}}{{^params.segment}}segment{{/params.segment}}
WHERE id = {{{ params.customer_id }}};

SELECT * FROM crud_customers WHERE id = {{{ params.customer_id }}};
"""

    def test_create_patch_delete_cycle(self, spark):
        spark.sql("DROP TABLE IF EXISTS crud_customers")
        try:
            ex = QueryExecutor(spark)
            create = self._ep(
                self.CREATE_TPL, "POST",
                extra_fields=[{"field-name": "comment", "field-in": "body",
                               "required": False,
                               "validators": [{"type": "string",
                                               "max": 500}]}],
            )
            r1 = ex.execute_write(create, {
                "name": "Acme Corp", "segment": "BUILDING",
                "last_login_time": "12:30:00",
            })
            assert r1.rows_affected == 1
            row = r1.returned_data.collect()[0]
            assert row.id == 1 and row.name == "Acme Corp"
            assert row.last_login_time == "12:30:00"
            # second create auto-increments via MAX(id)+1
            r2 = ex.execute_write(create, {
                "name": "Bolt Ltd", "segment": "MACHINERY",
            })
            assert r2.returned_data.collect()[0].id == 2

            patch = self._ep(self.PATCH_TPL, "PATCH")
            r3 = ex.execute_write(patch, {
                "customer_id": "1", "name": "Acme Holdings",
            })
            assert r3.rows_affected == 1
            got = r3.returned_data.collect()[0]
            assert got.name == "Acme Holdings"
            assert got.segment == "BUILDING"  # untouched (self-assign)

            delete = self._ep(
                "DELETE FROM crud_customers"
                " WHERE id = {{{ params.customer_id }}}",
                "DELETE",
            )
            r4 = ex.execute_write(delete, {"customer_id": "2"})
            assert r4.rows_affected == 1
            assert spark.table("crud_customers").count() == 1
        finally:
            spark.sql("DROP TABLE IF EXISTS crud_customers")


def test_mcp_write_tool_reports_rows_affected(spark):
    """MCP write tools (reference: customers_write_mcp.yaml) route
    through the write path and report rows_affected + returned rows."""
    from flapi_spark.executor import QueryExecutor
    from flapi_spark.mcp import McpToolRegistry

    spark.sql("DROP TABLE IF EXISTS mcp_writes")
    spark.sql("CREATE TABLE mcp_writes (id BIGINT, v STRING) USING parquet")
    try:
        ep = EndpointConfig.from_dict({
            "url-path": "/mcp-write",
            "method": "POST",
            "operation": {"type": "write", "returns-data": True},
            "template-text": (
                "INSERT INTO mcp_writes VALUES ({{params.id}}, 'x');"
                " SELECT * FROM mcp_writes WHERE id = {{params.id}}"
            ),
            "request": [
                {"field-name": "id", "field-in": "query",
                 "validators": [{"type": "int", "min": 0}]},
            ],
        })
        reg = McpToolRegistry(QueryExecutor(spark))
        reg.register("create_row", ep, description="insert one row")
        out = reg.call_tool("create_row", {"id": "41"})
        assert out["rows_affected"] == 1
        assert out["rows"] == [{"id": 41, "v": "x"}]
    finally:
        spark.sql("DROP TABLE IF EXISTS mcp_writes")


def test_describe_never_executes_write_and_openapi_method(spark):
    """describe/OpenAPI on a write endpoint must NOT execute the DML
    (spark.sql runs commands eagerly) and must emit the method verb
    with a requestBody + rows_affected response."""
    from flapi_spark.describe import describe_endpoint, openapi_doc
    from flapi_spark.executor import QueryExecutor

    spark.sql("DROP TABLE IF EXISTS desc_writes")
    spark.sql("CREATE TABLE desc_writes (id BIGINT) USING parquet")
    try:
        ep = EndpointConfig.from_dict({
            "url-path": "/desc-write",
            "method": "POST",
            "template-text": "INSERT INTO desc_writes VALUES ({{params.id}})",
            "request": [
                {"field-name": "id", "field-in": "body",
                 "validators": [{"type": "int"}]},
            ],
        })
        ex = QueryExecutor(spark)
        d = describe_endpoint(ex, ep, {"id": "1"})
        assert d["method"] == "POST"
        assert d["result_schema"][0]["name"] == "rows_affected"
        assert spark.table("desc_writes").count() == 0  # not executed
        doc = openapi_doc(ex, [ep])
        op = doc["paths"]["/desc-write"]["post"]
        assert "201" in op["responses"]
        assert "id" in op["requestBody"]["content"]["application/json"][
            "schema"]["properties"]
        assert spark.table("desc_writes").count() == 0
    finally:
        spark.sql("DROP TABLE IF EXISTS desc_writes")


def test_read_path_refuses_write_endpoint(spark):
    from flapi_spark.executor import QueryExecutor

    ep = EndpointConfig.from_dict({
        "url-path": "/w", "method": "POST",
        "template-text": "INSERT INTO nowhere VALUES (1)",
    })
    with pytest.raises(WriteError, match="use execute_write"):
        QueryExecutor(spark).execute(ep, {})


def test_partitioned_update_prunes_untouched_partitions(spark, tmp_path):
    """UPDATE on a partitioned table rewrites ONLY the partitions
    containing matches (dynamic overwrite + semi-join pruning): the
    untouched partition's data files stay byte-identical."""
    import glob as _glob
    import os

    from flapi_spark.writes import apply_write_statement

    spark.sql("DROP TABLE IF EXISTS part_upd")
    spark.sql(
        "CREATE TABLE part_upd (id BIGINT, v STRING) USING parquet"
        " PARTITIONED BY (seg STRING)"
    )
    try:
        spark.sql(
            "INSERT INTO part_upd VALUES"
            " (1,'a','X'),(2,'b','Y'),(3,'c','X'),(4,'d','Z')"
        )
        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir"
        ).removeprefix("file:")
        y_files = {
            (p, os.path.getmtime(p))
            for p in _glob.glob(
                os.path.join(warehouse, "part_upd", "seg=Y", "*.parquet")
            )
        }
        assert y_files
        r = apply_write_statement(
            spark, "UPDATE part_upd SET v = upper(v) WHERE seg = 'X'"
        )
        assert r.rows_affected == 2
        rows = {x.id: x.v for x in spark.table("part_upd").collect()}
        assert rows == {1: "A", 2: "b", 3: "C", 4: "d"}
        y_after = {
            (p, os.path.getmtime(p))
            for p in _glob.glob(
                os.path.join(warehouse, "part_upd", "seg=Y", "*.parquet")
            )
        }
        assert y_after == y_files  # untouched partition: same files
    finally:
        spark.sql("DROP TABLE IF EXISTS part_upd")


def test_partitioned_delete_handles_emptied_partition(spark):
    """DELETE that empties a whole partition must actually remove its
    rows: the pruned path stages survivors under dynamic overwrite and
    explicitly DROPs partitions whose every row matched (stale files
    would otherwise survive the dynamic overwrite)."""
    import glob as _glob
    import os

    from flapi_spark.writes import apply_write_statement

    _rm(spark, "part_del")
    spark.sql(
        "CREATE TABLE part_del (id BIGINT, v STRING) USING parquet"
        " PARTITIONED BY (seg STRING)"
    )
    try:
        spark.sql(
            "INSERT INTO part_del VALUES (1,'a','X'),(2,'b','Y')"
        )
        r = apply_write_statement(
            spark, "DELETE FROM part_del WHERE seg = 'Y'"
        )
        assert r.rows_affected == 1
        assert [x.id for x in spark.table("part_del").collect()] == [1]
        # the emptied partition's DIRECTORY is gone, not just unread
        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir"
        ).removeprefix("file:")
        assert not os.path.isdir(
            os.path.join(warehouse, "part_del", "seg=Y")
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS part_del")


def test_partitioned_delete_prunes_untouched_partitions(spark):
    """DELETE on a partitioned table rewrites ONLY partitions that
    contain matches: the untouched partition's files stay
    byte-identical (same paths, same mtimes)."""
    import glob as _glob
    import os

    from flapi_spark.writes import apply_write_statement

    _rm(spark, "part_del2")
    spark.sql(
        "CREATE TABLE part_del2 (id BIGINT, v STRING) USING parquet"
        " PARTITIONED BY (seg STRING)"
    )
    try:
        spark.sql(
            "INSERT INTO part_del2 VALUES"
            " (1,'a','X'),(2,'b','X'),(3,'c','Y'),(4,'d','Z')"
        )
        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir"
        ).removeprefix("file:")
        y_files = {
            (p, os.path.getmtime(p))
            for p in _glob.glob(
                os.path.join(warehouse, "part_del2", "seg=Y", "*.parquet")
            )
        }
        assert y_files
        # delete SOME rows of X (partial) and ALL of Z (emptied)
        r = apply_write_statement(
            spark,
            "DELETE FROM part_del2 WHERE id = 1 OR seg = 'Z'",
        )
        assert r.rows_affected == 2
        rows = sorted(x.id for x in spark.table("part_del2").collect())
        assert rows == [2, 3]
        y_after = {
            (p, os.path.getmtime(p))
            for p in _glob.glob(
                os.path.join(warehouse, "part_del2", "seg=Y", "*.parquet")
            )
        }
        assert y_after == y_files  # untouched partition: same files
        assert not os.path.isdir(
            os.path.join(warehouse, "part_del2", "seg=Z")
        )  # emptied partition dropped
    finally:
        spark.sql("DROP TABLE IF EXISTS part_del2")


def test_partitioned_delete_null_partition(spark):
    """NULL-partition rows delete correctly, including the fully-
    emptied default partition (DROP PARTITION (p=null))."""
    from flapi_spark.writes import apply_write_statement

    _rm(spark, "part_del3")
    spark.sql(
        "CREATE TABLE part_del3 (id BIGINT, v STRING) USING parquet"
        " PARTITIONED BY (seg STRING)"
    )
    try:
        spark.sql(
            "INSERT INTO part_del3 VALUES (1,'a','X'),(2,'b',NULL)"
        )
        r = apply_write_statement(
            spark, "DELETE FROM part_del3 WHERE seg IS NULL"
        )
        assert r.rows_affected == 1
        assert [x.id for x in spark.table("part_del3").collect()] == [1]
    finally:
        spark.sql("DROP TABLE IF EXISTS part_del3")


class TestMetadataRollback:
    """Round-5 transaction machinery: rollback restores BEGIN state
    without the round-4 full CTAS backup — renames + manifest-diff
    file deletes (unpartitioned), touched-partition deltas
    (partitioned)."""

    def test_rollback_never_rewrites_table_files(self, spark):
        """A failed transaction restores the table to its exact BEGIN
        files — same paths AND same mtimes: the pre-image was renamed
        aside and renamed back, never copied or rewritten."""
        import os

        from flapi_spark.writes import execute_write_statements

        _rm(spark, "txn_meta")
        spark.sql("CREATE TABLE txn_meta (id BIGINT, v STRING) USING parquet")
        try:
            spark.sql("INSERT INTO txn_meta VALUES (1,'a'),(2,'b')")
            begin = {
                (p.removeprefix("file:"),
                 os.path.getmtime(p.removeprefix("file:")))
                for p in spark.table("txn_meta").inputFiles()
            }
            with pytest.raises(Exception):
                execute_write_statements(
                    spark,
                    [
                        "UPDATE txn_meta SET v = 'zz' WHERE id = 1",
                        "INSERT INTO txn_meta SELECT * FROM no_such_table",
                    ],
                    transaction=True,
                )
            after = {
                (p.removeprefix("file:"),
                 os.path.getmtime(p.removeprefix("file:")))
                for p in spark.table("txn_meta").inputFiles()
            }
            assert after == begin  # metadata-only restore
            rows = {x.id: x.v for x in spark.table("txn_meta").collect()}
            assert rows == {1: "a", 2: "b"}
        finally:
            spark.sql("DROP TABLE IF EXISTS txn_meta")

    def test_rollback_deletes_appended_files(self, spark):
        """INSERT INTO needs no snapshot: rollback removes exactly the
        files the transaction appended (manifest diff)."""
        from flapi_spark.writes import execute_write_statements

        _rm(spark, "txn_app")
        spark.sql("CREATE TABLE txn_app (id BIGINT) USING parquet")
        try:
            spark.sql("INSERT INTO txn_app VALUES (1)")
            begin = set(spark.table("txn_app").inputFiles())
            with pytest.raises(Exception):
                execute_write_statements(
                    spark,
                    [
                        "INSERT INTO txn_app VALUES (2), (3)",
                        "INSERT INTO txn_app SELECT * FROM no_such_table",
                    ],
                    transaction=True,
                )
            assert set(spark.table("txn_app").inputFiles()) == begin
            assert [x.id for x in spark.table("txn_app").collect()] == [1]
        finally:
            spark.sql("DROP TABLE IF EXISTS txn_app")

    def test_rollback_mixed_insert_then_update_unpartitioned(self, spark):
        """Append + full swap on the same unpartitioned table: the
        rename-back restores the first-swap image and the manifest
        diff removes the pre-swap append — BEGIN state exactly."""
        from flapi_spark.writes import execute_write_statements

        _rm(spark, "txn_mix")
        spark.sql("CREATE TABLE txn_mix (id BIGINT, v STRING) USING parquet")
        try:
            spark.sql("INSERT INTO txn_mix VALUES (1,'a')")
            with pytest.raises(Exception):
                execute_write_statements(
                    spark,
                    [
                        "INSERT INTO txn_mix VALUES (2,'b')",
                        "UPDATE txn_mix SET v = 'zz'",
                        "INSERT INTO txn_mix SELECT * FROM no_such_table",
                    ],
                    transaction=True,
                )
            rows = {x.id: x.v for x in spark.table("txn_mix").collect()}
            assert rows == {1: "a"}
        finally:
            spark.sql("DROP TABLE IF EXISTS txn_mix")

    def test_rollback_partitioned_delta_restores_dropped_partition(
        self, spark
    ):
        """Pruned DELETE inside a failed transaction: the touched-
        partition delta snapshot restores even a DROP PARTITION'd
        partition; the untouched partition is never rewritten."""
        import glob as _glob
        import os

        from flapi_spark.writes import execute_write_statements

        _rm(spark, "txn_part")
        spark.sql(
            "CREATE TABLE txn_part (id BIGINT, v STRING) USING parquet"
            " PARTITIONED BY (seg STRING)"
        )
        try:
            spark.sql(
                "INSERT INTO txn_part VALUES"
                " (1,'a','X'),(2,'b','Y'),(3,'c','Z')"
            )
            warehouse = spark.conf.get(
                "spark.sql.warehouse.dir"
            ).removeprefix("file:")
            y_files = {
                (p, os.path.getmtime(p))
                for p in _glob.glob(
                    os.path.join(warehouse, "txn_part", "seg=Y", "*.parquet")
                )
            }
            # the failing statement targets a DIFFERENT table, so
            # txn_part's only kind is DELETE → the delta path (a mixed
            # insert+delete on one partitioned table is the documented
            # full-backup fallback)
            with pytest.raises(Exception):
                execute_write_statements(
                    spark,
                    [
                        "DELETE FROM txn_part WHERE seg = 'Z'",
                        "INSERT INTO txn_elsewhere"
                        " SELECT * FROM no_such_table",
                    ],
                    transaction=True,
                )
            rows = sorted(x.id for x in spark.table("txn_part").collect())
            assert rows == [1, 2, 3]  # dropped partition restored
            y_after = {
                (p, os.path.getmtime(p))
                for p in _glob.glob(
                    os.path.join(warehouse, "txn_part", "seg=Y", "*.parquet")
                )
            }
            assert y_after == y_files  # untouched partition untouched
        finally:
            spark.sql("DROP TABLE IF EXISTS txn_part")

    def test_rollback_v2_table_ctas_backup_never_raw_deletes(
        self, spark, monkeypatch
    ):
        """A v2 (Iceberg/Delta) table in a failed transaction gets the
        CTAS backup at BEGIN — its statements run natively through the
        table's transaction log, so the file-manifest machinery records
        no pre-image — and its data files are NEVER raw-deleted:
        rollback restores through the log (INSERT OVERWRITE), because a
        filesystem delete would corrupt log-referenced snapshots.
        Simulated v2 (no Iceberg jar in this sandbox):
        _table_supports_row_dml is forced true for the target and
        _delete_files is intercepted to record every path."""
        import flapi_spark.writes as W

        _rm(spark, "txn_v2")
        spark.sql("CREATE TABLE txn_v2 (id BIGINT, v STRING) USING parquet")
        try:
            spark.sql("INSERT INTO txn_v2 VALUES (1,'a'),(2,'b')")
            monkeypatch.setattr(
                W,
                "_table_supports_row_dml",
                lambda _s, t: t.strip("`").endswith("txn_v2"),
            )
            deleted: list[str] = []
            real_delete = W._delete_files

            def recording_delete(s, paths):
                deleted.extend(paths)
                real_delete(s, paths)

            monkeypatch.setattr(W, "_delete_files", recording_delete)
            # insert-only shape: without the v2 CTAS forcing, rollback
            # would take the manifest-diff branch and raw-delete the
            # appended (log-owned) files
            with pytest.raises(Exception):
                W.execute_write_statements(
                    spark,
                    [
                        "INSERT INTO txn_v2 VALUES (3,'c')",
                        "INSERT INTO txn_v2 SELECT * FROM no_such_table",
                    ],
                    transaction=True,
                )
            assert not [p for p in deleted if "txn_v2" in p]
            rows = {x.id: x.v for x in spark.table("txn_v2").collect()}
            assert rows == {1: "a", 2: "b"}  # logical pre-image restored
            assert not spark.catalog.tableExists("txn_v2__txn_backup")
        finally:
            spark.sql("DROP TABLE IF EXISTS txn_v2")

    def test_rollback_v2_partitioned_static_overwrite_under_dynamic_mode(
        self, spark, monkeypatch
    ):
        """The v2 full-backup restore pins partitionOverwriteMode=
        static: with a site-wide dynamic setting, INSERT OVERWRITE
        only rewrites partitions PRESENT in the backup, so a partition
        first created by the failed transaction would survive rollback
        (and the v2 guard never raw-deletes its files). The restore
        must remove it regardless of the session mode."""
        import flapi_spark.writes as W

        conf_key = "spark.sql.sources.partitionOverwriteMode"
        _rm(spark, "txn_v2p")
        spark.sql(
            "CREATE TABLE txn_v2p (id BIGINT, v STRING)"
            " USING parquet PARTITIONED BY (p STRING)"
        )
        prev_mode = spark.conf.get(conf_key, "static")
        try:
            spark.sql(
                "INSERT INTO txn_v2p VALUES (1,'a','p1'),(2,'b','p1')"
            )
            spark.conf.set(conf_key, "dynamic")  # site-wide setting
            monkeypatch.setattr(
                W,
                "_table_supports_row_dml",
                lambda _s, t: t.strip("`").endswith("txn_v2p"),
            )
            with pytest.raises(Exception):
                W.execute_write_statements(
                    spark,
                    [
                        # creates a BRAND-NEW partition p2
                        "INSERT INTO txn_v2p VALUES (3,'c','p2')",
                        "INSERT INTO txn_v2p SELECT * FROM no_such_table",
                    ],
                    transaction=True,
                )
            rows = {(x.id, x.v, x.p)
                    for x in spark.table("txn_v2p").collect()}
            assert rows == {(1, "a", "p1"), (2, "b", "p1")}
            # session mode untouched after rollback
            assert spark.conf.get(conf_key) == "dynamic"
        finally:
            spark.conf.set(conf_key, prev_mode)
            spark.sql("DROP TABLE IF EXISTS txn_v2p")

    def test_commit_drops_preservation_tables(self, spark):
        from flapi_spark.writes import execute_write_statements

        _rm(spark, "txn_ok")
        spark.sql("CREATE TABLE txn_ok (id BIGINT, v STRING) USING parquet")
        try:
            spark.sql("INSERT INTO txn_ok VALUES (1,'a')")
            execute_write_statements(
                spark,
                [
                    "UPDATE txn_ok SET v = 'b' WHERE id = 1",
                    "INSERT INTO txn_ok VALUES (2,'c')",
                ],
                transaction=True,
            )
            rows = {x.id: x.v for x in spark.table("txn_ok").collect()}
            assert rows == {1: "b", 2: "c"}
            assert not spark.catalog.tableExists("txn_ok__txn_keep")
            assert not spark.catalog.tableExists("txn_ok__txn_backup")
        finally:
            spark.sql("DROP TABLE IF EXISTS txn_ok")


def test_returning_inside_string_literal_is_data(spark):
    from flapi_spark.writes import _strip_returning

    stmt = "INSERT INTO t VALUES ('about RETURNING x')"
    out, cols = _strip_returning(stmt)
    assert cols is None and out == stmt
    out2, cols2 = _strip_returning(
        "DELETE FROM t WHERE v = 'x' RETURNING id"
    )
    assert cols2 == "id" and out2.rstrip() == "DELETE FROM t WHERE v = 'x'"


def test_update_swap_uses_pre_image_semantics(spark):
    """SQL UPDATE evaluates every right-hand side against the
    PRE-image: UPDATE t SET a=b, b=a must swap, not duplicate — the
    CASE-projection translation reads FROM the unmodified table, so it
    inherits this for free."""
    from flapi_spark.writes import apply_write_statement

    spark.sql("DROP TABLE IF EXISTS swap_t")
    spark.sql("CREATE TABLE swap_t (id BIGINT, a BIGINT, b BIGINT) USING parquet")
    try:
        spark.sql("INSERT INTO swap_t VALUES (1, 10, 20), (2, 30, 40)")
        r = apply_write_statement(
            spark, "UPDATE swap_t SET a = b, b = a WHERE id = 1"
        )
        assert r.rows_affected == 1
        rows = {x.id: (x.a, x.b) for x in spark.table("swap_t").collect()}
        assert rows[1] == (20, 10)  # swapped
        assert rows[2] == (30, 40)  # untouched
    finally:
        spark.sql("DROP TABLE IF EXISTS swap_t")


def test_real_returning_after_literal_mention(spark):
    from flapi_spark.writes import _strip_returning

    out, cols = _strip_returning(
        "UPDATE t SET msg = 'use RETURNING wisely'"
        " WHERE id = 1 RETURNING id"
    )
    assert cols == "id"
    assert out.endswith("WHERE id = 1")


def test_validate_before_write_blocks_destructive_statements(spark):
    from flapi_spark.executor import QueryExecutor

    ep = EndpointConfig.from_dict({
        "url-path": "/drop", "method": "POST",
        "template-text": "DROP TABLE important",
    })
    with pytest.raises(WriteError, match="validate-before-write"):
        QueryExecutor(spark).execute_write(ep, {})
    # explicit opt-out allows DDL (fails later on the missing table,
    # which proves the guard stepped aside)
    ep2 = EndpointConfig.from_dict({
        "url-path": "/drop2", "method": "POST",
        "operation": {"type": "write", "validate-before-write": False},
        "template-text": "DROP TABLE IF EXISTS not_important_tmp",
    })
    r = QueryExecutor(spark).execute_write(ep2, {})
    assert r.rows_affected == 0


def test_refresh_on_write_requires_cache_template(spark, tmp_path):
    from flapi_spark.cache import CacheManager
    from flapi_spark.executor import QueryExecutor

    spark.sql("DROP TABLE IF EXISTS row_guard_t")
    spark.sql("CREATE TABLE row_guard_t (id BIGINT) USING parquet")
    try:
        ep = EndpointConfig.from_dict({
            "url-path": "/rw", "method": "POST",
            "template-text": "INSERT INTO row_guard_t VALUES ({{params.id}})",
            "request": [{"field-name": "id", "field-in": "body",
                         "validators": [{"type": "int"}]}],
            "cache": {"enabled": True, "table": "rw_cache",
                      "refresh-on-write": True},
        })
        mgr = CacheManager(spark, root=str(tmp_path / "c"))
        with pytest.raises(WriteError, match="template-file"):
            QueryExecutor(spark).execute_write(
                ep, {"id": "1"}, cache_mgr=mgr
            )
        # the refresh guard fires AFTER the write itself (the insert
        # happened; only the refresh hook is refused) — config
        # validation catches this combination statically:
        from flapi_spark.config_validator import validate_endpoint

        r = validate_endpoint(ep)
        assert any("template-file" in e for e in r.errors)
    finally:
        spark.sql("DROP TABLE IF EXISTS row_guard_t")


def test_stale_cache_refreshes_on_read(spark, tmp_path):
    """invalidate-on-write marks the snapshot stale; the cached READ
    path refreshes before serving (finding: the flag previously had
    no consumer)."""
    from flapi_spark.cache import CacheManager
    from flapi_spark.cache_flow import (
        read_cached_endpoint, refresh_endpoint_cache,
    )
    from flapi_spark.executor import QueryExecutor

    spark.sql("DROP TABLE IF EXISTS stale_t")
    spark.sql("CREATE TABLE stale_t (id BIGINT) USING parquet")
    try:
        (tmp_path / "refresh.sql").write_text("SELECT id FROM stale_t")
        ep = EndpointConfig.from_dict({
            "url-path": "/stale", "method": "POST",
            "template-text": "INSERT INTO stale_t VALUES ({{params.id}})",
            "request": [{"field-name": "id", "field-in": "body",
                         "validators": [{"type": "int"}]}],
            "cache": {"enabled": True, "table": "stale_cache",
                      "template-file": str(tmp_path / "refresh.sql"),
                      "invalidate-on-write": True},
        })
        ex = QueryExecutor(spark)
        mgr = CacheManager(spark, root=str(tmp_path / "c2"))
        ex.execute_write(ep, {"id": "1"}, cache_mgr=mgr)
        refresh_endpoint_cache(ex, mgr, ep)
        assert read_cached_endpoint(ex, mgr, ep).count() == 1
        ex.execute_write(ep, {"id": "2"}, cache_mgr=mgr)
        assert mgr.is_stale(ep.cache)
        # the read path refreshes and serves the NEW row
        assert read_cached_endpoint(ex, mgr, ep).count() == 2
        assert not mgr.is_stale(ep.cache)
        # opt-out serves the stale snapshot
        ex.execute_write(ep, {"id": "3"}, cache_mgr=mgr)
        assert read_cached_endpoint(
            ex, mgr, ep, refresh_if_stale=False
        ).count() == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS stale_t")


def test_heartbeat_stale_poll_refreshes_after_write(spark, tmp_path):
    """invalidate-on-write + a stale-poll heartbeat job: the write
    flags the snapshot; the next poll refreshes it without waiting for
    the scheduled interval."""
    from flapi_spark.cache import CacheManager
    from flapi_spark.cache_flow import (
        refresh_endpoint_cache, schedule_cache_refreshes,
    )
    from flapi_spark.executor import QueryExecutor
    from flapi_spark.heartbeat import HeartbeatWorker

    spark.sql("DROP TABLE IF EXISTS hb_t")
    spark.sql("CREATE TABLE hb_t (id BIGINT) USING parquet")
    try:
        (tmp_path / "r.sql").write_text("SELECT id FROM hb_t")
        ep = EndpointConfig.from_dict({
            "url-path": "/hb", "method": "POST",
            "template-text": "INSERT INTO hb_t VALUES ({{params.id}})",
            "request": [{"field-name": "id", "field-in": "body",
                         "validators": [{"type": "int"}]}],
            "cache": {"enabled": True, "table": "hb_cache",
                      "template-file": str(tmp_path / "r.sql"),
                      "invalidate-on-write": True},
        })
        ex = QueryExecutor(spark)
        mgr = CacheManager(spark, root=str(tmp_path / "c"))
        ex.execute_write(ep, {"id": "1"}, cache_mgr=mgr)
        refresh_endpoint_cache(ex, mgr, ep)
        worker = HeartbeatWorker()
        names = schedule_cache_refreshes(
            worker, ex, mgr, [ep], stale_poll=0.01
        )
        assert any(n.startswith("cache-stale:") for n in names)
        ex.execute_write(ep, {"id": "2"}, cache_mgr=mgr)
        assert mgr.is_stale(ep.cache)
        import time as _t

        ran = worker.run_pending(now=_t.monotonic() + 1)
        assert ran >= 1
        assert not mgr.is_stale(ep.cache)
        assert mgr.read(ep.cache).count() == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS hb_t")


def test_rollback_safe_when_stage_creation_fails(spark):
    """If the staged projection itself fails (before any rename), the
    live table must survive rollback untouched — the keep name is
    reserved but never recorded, so rollback must NOT drop the live
    table expecting a pre-image that never came to exist."""
    from flapi_spark.writes import _rm_table, execute_write_statements

    _rm_table(spark, "txn_stagefail")
    spark.sql("CREATE TABLE txn_stagefail (id BIGINT, v STRING) USING parquet")
    try:
        spark.sql("INSERT INTO txn_stagefail VALUES (1,'a')")
        with pytest.raises(Exception):
            execute_write_statements(
                spark,
                [
                    # the CASE projection references a missing function
                    # -> stage CTAS fails before any rename
                    "UPDATE txn_stagefail SET v = no_such_fn(v)",
                    "INSERT INTO txn_stagefail VALUES (2,'b')",
                ],
                transaction=True,
            )
        rows = {x.id: x.v for x in spark.table("txn_stagefail").collect()}
        assert rows == {1: "a"}  # live table intact
    finally:
        spark.sql("DROP TABLE IF EXISTS txn_stagefail")


def test_rollback_insert_overwrite_unpartitioned(spark):
    """Review finding (round 5): INSERT OVERWRITE destroys old files
    natively, so a transaction must take a full pre-image backup even
    for unpartitioned targets — rollback restores the BEGIN rows, not
    an empty table."""
    from flapi_spark.writes import _rm_table, execute_write_statements

    _rm_table(spark, "txn_ovr")
    spark.sql("CREATE TABLE txn_ovr (id BIGINT, v STRING) USING parquet")
    try:
        spark.sql("INSERT INTO txn_ovr VALUES (1,'a'),(2,'b')")
        with pytest.raises(Exception):
            execute_write_statements(
                spark,
                [
                    "INSERT OVERWRITE txn_ovr VALUES (9,'z')",
                    "INSERT INTO txn_ovr SELECT * FROM no_such_table",
                ],
                transaction=True,
            )
        rows = {x.id: x.v for x in spark.table("txn_ovr").collect()}
        assert rows == {1: "a", 2: "b"}
    finally:
        spark.sql("DROP TABLE IF EXISTS txn_ovr")


def test_rollback_external_table_update(spark, tmp_path):
    """Review finding (round 5): external targets take the INSERT
    OVERWRITE swap (no rename-preserve possible), so a transaction
    must full-backup them — rollback restores the BEGIN rows."""
    from flapi_spark.writes import _rm_table, execute_write_statements

    loc = tmp_path / "ext_data"
    _rm_table(spark, "txn_ext")
    spark.sql(
        f"CREATE TABLE txn_ext (id BIGINT, v STRING) USING parquet"
        f" LOCATION '{loc}'"
    )
    try:
        spark.sql("INSERT INTO txn_ext VALUES (1,'a'),(2,'b')")
        with pytest.raises(Exception):
            execute_write_statements(
                spark,
                [
                    "UPDATE txn_ext SET v = 'zz' WHERE id = 1",
                    "INSERT INTO txn_ext SELECT * FROM no_such_table",
                ],
                transaction=True,
            )
        rows = {x.id: x.v for x in spark.table("txn_ext").collect()}
        assert rows == {1: "a", 2: "b"}
    finally:
        spark.sql("DROP TABLE IF EXISTS txn_ext")


def test_insert_returning_self_referential_reads_pre_image(
    spark, customers_table
):
    """Review finding (round 5): INSERT INTO t SELECT * FROM t
    RETURNING must return the 3 pre-image rows being inserted, not the
    6-row post-image."""
    r = apply_write_statement(
        spark,
        "INSERT INTO wcustomers SELECT * FROM wcustomers"
        " RETURNING customer_id",
    )
    assert r.rows_affected == 3
    got = sorted(x.customer_id for x in r.returned_data.collect())
    assert got == [1, 2, 3]
    assert spark.table("wcustomers").count() == 6


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False

if HAS_HYPOTHESIS:

    @given(st.text(max_size=120))
    @settings(max_examples=200, deadline=None)
    def test_split_top_level_is_lossless(text):
        """Re-joining the split parts with the separator reconstructs
        the input byte-for-byte for ANY text — the splitter only ever
        removes top-level separators, never content."""
        from flapi_spark.writes import _split_top_level

        assert ",".join(_split_top_level(text)) == text

    @given(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("L", "N", "Z", "P"),
            ),
            max_size=60,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_strip_returning_finds_appended_clause(body):
        """For any UPDATE statement whose quotes are balanced (string
        data built by escaping), appending a real RETURNING clause is
        always detected and stripped to exactly the original."""
        from flapi_spark.writes import _strip_returning

        lit = body.replace("'", "''")
        stmt = f"UPDATE t SET v = '{lit}' WHERE id = 1"
        out, cols = _strip_returning(stmt + " RETURNING id, v")
        assert cols == "id, v"
        assert out.rstrip() == stmt

    @given(st.text(max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_strip_returning_never_raises(stmt):
        from flapi_spark.writes import _strip_returning

        out, cols = _strip_returning(stmt)
        assert isinstance(out, str)

    @given(
        st.text(
            alphabet="0123456789abcxyz.- +",
            min_size=1,
            max_size=10,
        )
    )
    @settings(max_examples=300, deadline=None)
    def test_resolve_port_strict_or_error(raw):
        """FLAPI_PORT either resolves to its exact in-range integer or
        raises — never a silent coercion (truncation, stripping,
        clamping)."""
        from flapi_spark.__main__ import (
            SettingsError, resolve_runtime_settings,
        )

        try:
            s = resolve_runtime_settings(env={"FLAPI_PORT": raw})
        except SettingsError:
            return
        # stoi semantics: leading whitespace/sign/zeros fine, value
        # exact, trailing junk rejected (it would have raised)
        assert s["port"] == int(raw.strip())
        assert 1 <= s["port"] <= 65535
