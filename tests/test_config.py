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
