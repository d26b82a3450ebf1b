import textwrap

import pytest

from flapi_spark.config import load_endpoint_yaml, load_endpoints_dir


def write(p, text):
    p.write_text(textwrap.dedent(text))


def test_basic_endpoint(tmp_path):
    write(
        tmp_path / "ep.yaml",
        """
        url-path: /customers/
        template-source: q.sql
        with-pagination: true
        connection:
          - customers-parquet
        request:
          - field-name: id
            field-in: query
            required: false
            validators:
              - type: int
                min: 1
        cache:
          enabled: true
          table: cust_cache
          schedule: 5m
          primary-key: [id]
          cursor:
            column: registration_date
            type: date
          retention:
            keep-last-snapshots: 3
            max-snapshot-age: 7d
        """,
    )
    (tmp_path / "q.sql").write_text("SELECT 1 AS one")
    ep = load_endpoint_yaml(tmp_path / "ep.yaml")
    assert ep.url_path == "/customers/"
    assert ep.connections == ["customers-parquet"]
    assert ep.request_fields[0].field_name == "id"
    assert ep.request_fields[0].validators[0].type == "int"
    assert ep.cache.enabled and ep.cache.table == "cust_cache"
    assert ep.cache.primary_key == ["id"]
    assert ep.cache.cursor_column == "registration_date"
    assert ep.cache.keep_last_snapshots == 3
    assert ep.load_template() == "SELECT 1 AS one"


def test_include_section(tmp_path):
    write(
        tmp_path / "common.yaml",
        """
        request:
          - field-name: segment
            validators:
              - type: enum
                allowedValues: [A, B]
        rate-limit:
          enabled: true
          max: 100
        """,
    )
    write(
        tmp_path / "ep.yaml",
        """
        url-path: /x/
        template-text: SELECT 1 AS one
        {{include:request from common.yaml}}
        {{include:rate-limit from common.yaml}}
        """,
    )
    ep = load_endpoint_yaml(tmp_path / "ep.yaml")
    assert ep.request_fields[0].field_name == "segment"
    assert ep.rate_limit["max"] == 100


def test_env_expansion(tmp_path):
    write(
        tmp_path / "ep.yaml",
        """
        url-path: /x/
        template-text: SELECT 1 AS one
        auth:
          enabled: true
          users:
            - username: '{{env.TEST_USER}}'
        """,
    )
    ep = load_endpoint_yaml(tmp_path / "ep.yaml", env={"TEST_USER": "alice"})
    assert ep.auth["users"][0]["username"] == "alice"


def test_load_endpoints_dir(tmp_path):
    write(tmp_path / "a.yaml", "url-path: /a/\ntemplate-text: SELECT 1 AS one\n")
    write(tmp_path / "notes.yaml", "just: notes\n")
    eps = load_endpoints_dir(tmp_path)
    assert [e.url_path for e in eps] == ["/a/"]


# --- extended include features (round 3c; reference:
# extended_yaml_parser_test.cpp) ------------------------------------------


def test_whole_file_include(tmp_path):
    from flapi_spark.config import _resolve_includes
    import yaml as _yaml

    (tmp_path / "common.yaml").write_text("auth:\n  enabled: true\nrate: 5\n")
    doc = _yaml.safe_load(
        _resolve_includes(
            "{{include from common.yaml}}\nvalue: always_present\n", tmp_path
        )
    )
    assert doc["auth"] == {"enabled": True}
    assert doc["rate"] == 5
    assert doc["value"] == "always_present"


def test_conditional_include_true_and_false(tmp_path):
    from flapi_spark.config import _resolve_includes
    import yaml as _yaml

    (tmp_path / "auth.yaml").write_text("auth:\n  enabled: true\n")
    tpl = "{{include from auth.yaml if env.ENABLE_AUTH}}\nvalue: v\n"
    on = _yaml.safe_load(
        _resolve_includes(tpl, tmp_path, env={"ENABLE_AUTH": "1"})
    )
    assert on["auth"] == {"enabled": True} and on["value"] == "v"
    # empty string evaluates false (reference semantics)
    off = _yaml.safe_load(
        _resolve_includes(tpl, tmp_path, env={"ENABLE_AUTH": ""})
    )
    assert "auth" not in off and off["value"] == "v"


def test_conditional_section_include(tmp_path):
    from flapi_spark.config import _resolve_includes
    import yaml as _yaml

    (tmp_path / "shared.yaml").write_text("cache:\n  enabled: true\nother: 1\n")
    tpl = "{{include:cache from shared.yaml if env.WITH_CACHE}}\nurl-path: /x\n"
    on = _yaml.safe_load(
        _resolve_includes(tpl, tmp_path, env={"WITH_CACHE": "yes"})
    )
    assert on["cache"] == {"enabled": True}
    assert "other" not in on
    off = _yaml.safe_load(_resolve_includes(tpl, tmp_path, env={}))
    assert "cache" not in off


def test_circular_include_detected(tmp_path):
    from flapi_spark.config import _resolve_includes

    (tmp_path / "a.yaml").write_text("{{include from b.yaml}}\nvalue: a\n")
    (tmp_path / "b.yaml").write_text("{{include from a.yaml}}\nvalue: b\n")
    with pytest.raises(ValueError, match="Circular dependency"):
        _resolve_includes("{{include from a.yaml}}\n", tmp_path)


def test_nested_includes_resolve(tmp_path):
    from flapi_spark.config import _resolve_includes
    import yaml as _yaml

    (tmp_path / "inner.yaml").write_text("deep: 42\n")
    (tmp_path / "outer.yaml").write_text(
        "{{include from inner.yaml}}\nmiddle: 1\n"
    )
    doc = _yaml.safe_load(
        _resolve_includes("{{include from outer.yaml}}\ntop: 0\n", tmp_path)
    )
    assert doc == {"deep": 42, "middle": 1, "top": 0}


class TestConfigSerializer:
    """Vectors from reference test/cpp/test_config_serializer.cpp:
    reference-spelled keys in the YAML, and full round-trip fidelity
    through from_dict(serialize(ep))."""

    def test_basic_rest_endpoint_yaml_keys(self):
        from flapi_spark.config import (
            EndpointConfig, serialize_endpoint_to_yaml,
        )

        ep = EndpointConfig.from_dict({
            "url-path": "/customers", "method": "POST",
            "template-source": "test.sql",
            "connection": ["primary", "cache"],
        })
        y = serialize_endpoint_to_yaml(ep)
        assert "url-path: /customers" in y
        assert "method: POST" in y
        assert "template-source: test.sql" in y
        assert "connection:" in y and "primary" in y and "cache" in y

    def test_mcp_tool_block(self):
        from flapi_spark.config import (
            EndpointConfig, serialize_endpoint_to_yaml,
        )

        ep = EndpointConfig.from_dict({
            "template-source": "test.sql",
            "mcp-tool": {"name": "customer_lookup",
                         "description": "Test tool"},
        })
        y = serialize_endpoint_to_yaml(ep)
        assert "mcp-tool:" in y
        assert "name: customer_lookup" in y
        assert "description: Test tool" in y

    def test_round_trip_complex_endpoint(self):
        from flapi_spark.config import (
            EndpointConfig, serialize_endpoint_to_dict,
        )

        doc = {
            "url-path": "/orders", "method": "POST",
            "template-text": "INSERT INTO t VALUES (:id)",
            "description": "create order",
            "with-pagination": False,
            "json-columns": ["payload"],
            "allowed-roles": ["admin"],
            "request": [
                {"field-name": "id", "field-in": "body",
                 "required": True, "default": "1",
                 "validators": [
                     {"type": "int", "min": 0, "max": 10},
                     {"type": "string", "regex": "^x",
                      "preventSqlInjection": True},
                 ]},
            ],
            "cache": {
                "enabled": True, "table": "orders_c",
                "schema": "analytics", "primary-key": ["id"],
                "cursor": {"column": "updated_at", "type": "timestamp"},
                "retention": {"keep-last-snapshots": 3},
                "refresh-on-write": True,
            },
            "operation": {"type": "write", "returns-data": True,
                          "transaction": False},
            "shape": {"max-rows": 10, "redact-columns": ["ssn"],
                      "mask-columns": {"email": "partial"}},
            "mcp-tool": {"name": "create_order", "description": "d"},
        }
        ep1 = EndpointConfig.from_dict(doc)
        ep2 = EndpointConfig.from_dict(serialize_endpoint_to_dict(ep1))
        assert serialize_endpoint_to_dict(ep1) == \
            serialize_endpoint_to_dict(ep2)
        assert ep2.url_path == ep1.url_path
        assert ep2.request_fields == ep1.request_fields
        assert ep2.cache == ep1.cache
        assert ep2.operation == ep1.operation
        assert ep2.shape == ep1.shape
        assert ep2.mcp_tool == ep1.mcp_tool
        assert ep2.json_columns == ep1.json_columns

    def test_defaults_are_omitted(self):
        from flapi_spark.config import (
            EndpointConfig, serialize_endpoint_to_dict,
        )

        d = serialize_endpoint_to_dict(EndpointConfig.from_dict({
            "url-path": "/x", "template-text": "SELECT 1",
        }))
        assert d == {"url-path": "/x", "template-text": "SELECT 1"}

    def test_write_method_implies_operation_omitted(self):
        from flapi_spark.config import (
            EndpointConfig, serialize_endpoint_to_dict,
        )

        # POST auto-implies write: no operation block needed in the
        # output unless a field deviates from the implied defaults
        ep = EndpointConfig.from_dict({
            "url-path": "/w", "method": "POST",
            "template-text": "INSERT INTO t VALUES (1)",
        })
        d = serialize_endpoint_to_dict(ep)
        assert "operation" not in d
        ep2 = EndpointConfig.from_dict(d)
        assert ep2.is_write
