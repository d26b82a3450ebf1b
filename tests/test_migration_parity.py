"""End-to-end migration parity: a project laid out exactly like a
flAPI project (project YAML + endpoint YAMLs + SQL templates, the
shapes in reference examples/flapi.yaml + examples/sqls/customers/*)
loads and serves through this engine unchanged — the 'a user of the
reference could switch' test."""

import os
import textwrap

import pytest

from flapi_spark.config import load_endpoint_yaml
from flapi_spark.executor import QueryExecutor
from flapi_spark.sources.registry import load_connections
from flapi_spark.validation import ValidationError

SF = os.environ.get("FLAPI_SPARK_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    root = tmp_path_factory.mktemp("flapi_project")
    (root / "common.yaml").write_text(
        textwrap.dedent(
            """
            request:
              - field-name: id
                field-in: query
                description: Customer ID
                required: false
                validators:
                  - type: int
                    min: 1
                    max: 1000000
                    preventSqlInjection: true
              - field-name: segment
                field-in: query
                required: false
                validators:
                  - type: enum
                    allowedValues: [AUTOMOBILE, BUILDING, FURNITURE, HOUSEHOLD, MACHINERY]
              - field-name: name
                field-in: query
                required: false
                validators:
                  - type: string
                    regex: "^[A-Za-z #0-9]{2,50}$"
                    preventSqlInjection: true

            rate-limit:
              enabled: true
              max: 10
              interval: 60
            """
        )
    )
    (root / "customers.sql").write_text(
        "SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment\n"
        "FROM parquet.`{{{conn.path}}}`\n"
        "WHERE 1=1\n"
        "{{#params.id}} AND c_custkey = {{params.id}}{{/params.id}}\n"
        "{{#params.segment}} AND c_mktsegment = {{params.segment}}{{/params.segment}}\n"
    )
    (root / "customers-rest.yaml").write_text(
        textwrap.dedent(
            """
            url-path: /customers/

            {{include:request from common.yaml}}
            {{include:rate-limit from common.yaml}}

            template-source: customers.sql
            connection: [customers-parquet]
            with-pagination: true

            cache:
              enabled: true
              table: customers_cache
              schema: analytics
              schedule: 5m
              primary-key: [id]
              cursor:
                column: registration_date
                type: date
              retention:
                keep-last-snapshots: 3
                max-snapshot-age: 7d

            heartbeat:
              enabled: false
            """
        )
    )
    project_yaml = {
        "project-name": "migrated-project",
        "connections": {
            "customers-parquet": {
                "properties": {"path": os.path.join(SF, "customer.parquet")}
            }
        },
    }
    return root, project_yaml


def test_project_yaml_connections_load(project):
    _, doc = project
    reg = load_connections(doc)
    assert "customers-parquet" in reg
    assert reg.get("customers-parquet").format == "parquet"


def test_endpoint_yaml_with_includes_loads(project):
    root, _ = project
    ep = load_endpoint_yaml(root / "customers-rest.yaml")
    assert ep.url_path == "/customers/"
    names = [f.field_name for f in ep.request_fields]
    assert names == ["id", "segment", "name"]
    id_field = ep.request_fields[0]
    assert id_field.bound_type == "int"
    assert id_field.validators[0].prevent_sql_injection is True
    assert ep.rate_limit["max"] == 10
    assert ep.cache.enabled and ep.cache.table == "customers_cache"
    assert ep.cache.schedule == "5m"
    assert ep.cache.primary_key == ["id"]
    assert ep.cache.cursor_column == "registration_date"
    assert ep.cache.keep_last_snapshots == 3
    assert ep.cache.max_snapshot_age == "7d"
    assert ep.with_pagination is True


def test_migrated_endpoint_executes(project, spark):
    root, doc = project
    ep = load_endpoint_yaml(root / "customers-rest.yaml")
    ex = QueryExecutor(spark, load_connections(doc))
    res = ex.execute(ep, {"segment": "BUILDING", "limit": "5"}, order_by="id")
    rows = res.df.collect()
    assert 0 < len(rows) <= 5
    assert res.total_count > len(rows)  # pagination counted the full set
    assert all(r.segment == "BUILDING" for r in rows)

    # typed binding: id is a named marker, not splice
    sql, args = ex.render(ep, {"id": "7"})
    assert ":id" in sql and args == {"id": 7}

    with pytest.raises(ValidationError):
        ex.execute(ep, {"segment": "NOT_A_SEGMENT"})
    with pytest.raises(ValidationError):
        ex.execute(ep, {"id": "x'; DROP TABLE t; --"})
