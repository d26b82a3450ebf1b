"""Config service CRUD/reload semantics (reference: config_service.cpp,
path_utils.cpp slugs, test/cpp/config_service_*.cpp)."""
import time

import pytest
import yaml

from flapi_spark.auth import AuthError
from flapi_spark.config_service import (
    ConfigService, ConfigServiceError, EndpointNotFound, path_to_slug,
    slug_to_path,
)


def _doc(url_path="/customers/", **over):
    base = {
        "url-path": url_path,
        "template-text": "SELECT 1 AS one",
        "connection": ["c1"],
        "description": "d",
    }
    base.update(over)
    return base


def test_slug_round_trip_matches_reference():
    # reference path_utils test vectors
    assert path_to_slug("/customers/") == "customers-slash"
    assert path_to_slug("/publicis") == "publicis"
    assert path_to_slug("/sap/functions") == "sap-functions"
    assert path_to_slug("") == "empty"
    assert slug_to_path("customers-slash") == "/customers/"
    assert slug_to_path("publicis") == "/publicis"
    assert slug_to_path("sap-functions") == "/sap/functions"
    assert slug_to_path("empty") == ""
    for p in ("/a/b/c", "/x/", "/top"):
        assert slug_to_path(path_to_slug(p)) == p


def test_crud_lifecycle(tmp_path):
    svc = ConfigService(tmp_path)
    slug = svc.create_endpoint(_doc())
    assert slug == "customers-slash"
    assert (tmp_path / "customers-slash.yaml").exists()
    assert [e["slug"] for e in svc.list_endpoints()] == ["customers-slash"]
    ep = svc.get_endpoint(slug)
    assert ep.url_path == "/customers/" and ep.description == "d"
    # update
    svc.update_endpoint(slug, _doc(description="new desc"))
    assert svc.get_endpoint(slug).description == "new desc"
    # duplicate create rejected
    with pytest.raises(ConfigServiceError):
        svc.create_endpoint(_doc())
    # delete
    svc.delete_endpoint(slug)
    assert svc.list_endpoints() == []
    assert not (tmp_path / "customers-slash.yaml").exists()
    with pytest.raises(EndpointNotFound):
        svc.get_endpoint(slug)


def test_invalid_config_rejected(tmp_path):
    svc = ConfigService(tmp_path)
    bad = _doc(url_path="no-leading-slash")
    assert not svc.validate(bad).valid
    with pytest.raises(ConfigServiceError):
        svc.create_endpoint(bad)


def test_token_gate_fail_closed(tmp_path):
    svc = ConfigService(tmp_path, token="s3cret")
    for call in (
        lambda: svc.list_endpoints(),
        lambda: svc.create_endpoint(_doc()),
        lambda: svc.list_endpoints(token="wrong"),
        lambda: svc.environment_variables(),
    ):
        with pytest.raises(AuthError):
            call()
    assert svc.list_endpoints(token="s3cret") == []
    svc.create_endpoint(_doc(), token="s3cret")
    assert len(svc.list_endpoints(token="s3cret")) == 1


def test_hot_reload_picks_up_edit_add_delete(tmp_path):
    svc = ConfigService(tmp_path)
    svc.create_endpoint(_doc())
    assert svc.reload_if_changed() == []  # nothing moved

    # out-of-band edit (another process / operator editing YAML)
    f = tmp_path / "customers-slash.yaml"
    doc = yaml.safe_load(f.read_text())
    doc["description"] = "edited on disk"
    f.write_text(yaml.safe_dump(doc))
    import os
    os.utime(f, (time.time() + 2, time.time() + 2))
    assert svc.reload_if_changed() == ["/customers/"]
    assert svc.get_endpoint("customers-slash").description == "edited on disk"

    # out-of-band add
    (tmp_path / "orders.yaml").write_text(yaml.safe_dump(_doc("/orders")))
    assert svc.reload_if_changed() == ["/orders"]
    assert {e["slug"] for e in svc.list_endpoints()} == {
        "customers-slash", "orders"}

    # out-of-band delete
    f.unlink()
    assert svc.reload_if_changed() == ["/customers/"]
    assert [e["slug"] for e in svc.list_endpoints()] == ["orders"]


def test_reload_single_endpoint(tmp_path):
    svc = ConfigService(tmp_path)
    svc.create_endpoint(_doc())
    f = tmp_path / "customers-slash.yaml"
    doc = yaml.safe_load(f.read_text())
    doc["description"] = "reloaded"
    f.write_text(yaml.safe_dump(doc))
    ep = svc.reload_endpoint("customers-slash")
    assert ep.description == "reloaded"


def test_project_config_and_env(tmp_path):
    svc = ConfigService(tmp_path, env={"K": "V"})
    assert svc.project_config() == {}
    svc.update_project_config({"project-name": "p", "version": "1.0"})
    assert svc.project_config()["project-name"] == "p"
    assert svc.environment_variables() == {"K": "V"}
    # project file is not mistaken for an endpoint
    assert svc.reload_if_changed() == []
    assert svc.list_endpoints() == []


def test_config_service_token_env_fallback(tmp_path):
    """main.cpp:504-509: CLI token wins; FLAPI_CONFIG_SERVICE_TOKEN
    fills in when no token was passed; unset env leaves the gate
    open."""
    import pytest as _pytest

    from flapi_spark.config_service import AuthError, ConfigService

    svc = ConfigService(
        tmp_path / "a", env={"FLAPI_CONFIG_SERVICE_TOKEN": "sekrit"}
    )
    with _pytest.raises(AuthError):
        svc.list_endpoints()
    assert svc.list_endpoints(token="sekrit") == []
    # explicit token beats env
    svc2 = ConfigService(
        tmp_path / "b", env={"FLAPI_CONFIG_SERVICE_TOKEN": "ignored"},
        token="cli-tok",
    )
    assert svc2.list_endpoints(token="cli-tok") == []
    # no env, no token -> open (reference empty-token path)
    svc3 = ConfigService(tmp_path / "c", env={})
    assert svc3.list_endpoints() == []


def test_cache_audit_surface(tmp_path, spark):
    """Reference AuditLogHandler (config_service.cpp:690-737,
    test_ducklake_scheduler.py): all-endpoints audit list, per-endpoint
    filter, 400 for cache-disabled endpoints, 404 for unknown slugs,
    DuckLake-disabled analogue when no manager is wired."""
    import pytest as _pytest

    from flapi_spark.cache import CacheConfig, CacheManager
    from flapi_spark.config_service import ConfigService, EndpointNotFound

    cfgdir = tmp_path / "eps"
    cfgdir.mkdir()
    (cfgdir / "cached.yaml").write_text(
        "url-path: /cached\ntemplate-text: SELECT * FROM {{cache.table}}\n"
        "cache:\n  enabled: true\n  table: audit_t\n"
    )
    (cfgdir / "plain.yaml").write_text(
        "url-path: /plain\ntemplate-text: SELECT 1 AS one\n"
    )
    svc = ConfigService(cfgdir, env={})
    with _pytest.raises(ValueError, match="no cache manager"):
        svc.cache_audit()

    mgr = CacheManager(spark, root=tmp_path / "cache_root")
    svc.attach_cache_manager(mgr)
    ep = svc.get_endpoint("cached")
    assert ep.cache.enabled
    c = CacheConfig(enabled=True, table="audit_t", schema="flapi_cache")
    mgr.full_refresh(c, spark.createDataFrame([(1,)], "x int"))
    events = svc.cache_audit()
    assert events and events[0]["table"] == "audit_t"
    per = svc.cache_audit("cached")
    assert per and all(e["table"] == "audit_t" for e in per)
    with _pytest.raises(ValueError, match="not enabled"):
        svc.cache_audit("plain")
    with _pytest.raises(EndpointNotFound):
        svc.cache_audit("nope")


def test_schema_info_surface(spark, tmp_path):
    """Reference /api/v1/_config/schema vectors
    (test_config_service_schema.py): hierarchical schemas→tables→
    columns, tables-only list, connections list, completion format,
    per-connection filter, unknown-connection 404."""
    import os

    import pytest as _pytest

    from flapi_spark.config_service import EndpointNotFound, schema_info
    from flapi_spark.sources.registry import Connection, ConnectionRegistry
    from flapi_spark.writes import _rm_table

    _rm_table(spark, "schema_demo")
    spark.sql(
        "CREATE TABLE schema_demo (id BIGINT, v STRING) USING parquet"
    )
    reg = ConnectionRegistry()
    reg.add(Connection(
        name="customers-parquet",
        properties={"path": "/root/testdata/sf0.001/customer.parquet"},
    ))
    try:
        full = schema_info(spark)
        assert len(full) > 0
        found = [
            (db, t) for db, d in full.items()
            for t in d.get("tables", {})
        ]
        assert any(t == "schema_demo" for _db, t in found)
        db, _ = next((db, t) for db, t in found if t == "schema_demo")
        cols = full[db]["tables"]["schema_demo"]["columns"]
        assert cols["id"] == "bigint" and cols["v"] == "string"

        tbl = schema_info(spark, tables=True)
        assert {"name": "schema_demo", "schema": db} in tbl["tables"]

        conns = schema_info(spark, reg, connections=True)
        assert conns == {"connections": ["customers-parquet"]}

        comp = schema_info(spark, fmt="completion")
        assert "schema_demo" in comp["tables"]
        assert "id" in comp["columns"] and "v" in comp["columns"]

        one = schema_info(spark, reg, connection="customers-parquet")
        view_cols = next(iter(
            one["customers-parquet"]["tables"].values()
        ))["columns"]
        assert "c_custkey" in view_cols

        with _pytest.raises(EndpointNotFound):
            schema_info(spark, reg, connection="nope")
    finally:
        spark.sql("DROP TABLE IF EXISTS schema_demo")


def test_find_endpoints_by_template():
    """config_service_template_lookup_test.cpp vectors: single match,
    multiple endpoints sharing one template, path normalization, MCP
    surfaces typed, and zero matches for unknown templates."""
    from flapi_spark.config import EndpointConfig
    from flapi_spark.config_service import find_endpoints_by_template

    eps = [
        EndpointConfig.from_dict({
            "url-path": "/customers/", "method": "GET",
            "template-source": "sqls/customers.sql",
        }),
        EndpointConfig.from_dict({
            "url-path": "/customers-v2/", "method": "GET",
            "template-source": "./sqls/customers.sql",
        }),
        EndpointConfig.from_dict({
            "template-source": "sqls/tool.sql",
            "mcp-tool": {"name": "lookup", "description": "d"},
        }),
        EndpointConfig.from_dict({
            "url-path": "/other/", "template-text": "SELECT 1",
        }),
    ]
    got = find_endpoints_by_template(eps, "sqls/customers.sql")
    assert got["count"] == 2
    assert {e["url_path"] for e in got["endpoints"]} == \
        {"/customers/", "/customers-v2/"}
    assert all(e["type"] == "REST" for e in got["endpoints"])

    mcp = find_endpoints_by_template(eps, "tool.sql")
    assert mcp["count"] == 1 and mcp["endpoints"][0]["type"] == "MCP"

    assert find_endpoints_by_template(eps, "nope.sql") == \
        {"count": 0, "endpoints": []}


def test_endpoint_parameters_shape():
    """config_service_parameters_test.cpp vectors: metadata + per-
    field validator constraints; empty request list yields an empty
    parameters array."""
    from flapi_spark.config import EndpointConfig
    from flapi_spark.config_service import endpoint_parameters

    ep = EndpointConfig.from_dict({
        "url-path": "/api/test", "method": "GET",
        "template-text": "SELECT 1",
        "request": [
            {"field-name": "user_id", "field-in": "query",
             "description": "User identifier", "required": True,
             "default": "123",
             "validators": [{"type": "int", "min": 1, "max": 9999}]},
            {"field-name": "tag", "field-in": "query",
             "validators": [{"type": "string", "regex": "^[a-z]+$",
                             "preventSqlInjection": True}]},
        ],
    })
    got = endpoint_parameters(ep)
    assert got["endpoint"] == "/api/test" and got["method"] == "GET"
    p0 = got["parameters"][0]
    assert p0["name"] == "user_id" and p0["in"] == "query"
    assert p0["required"] is True and p0["default"] == "123"
    assert p0["validators"] == [{"type": "int", "min": 1, "max": 9999}]
    p1 = got["parameters"][1]
    assert p1["validators"][0]["preventSqlInjection"] is True
    bare = EndpointConfig.from_dict({
        "url-path": "/bare", "template-text": "SELECT 1",
    })
    assert endpoint_parameters(bare)["parameters"] == []


def test_filesystem_structure(tmp_path):
    """config_service_filesystem_test.cpp vectors: classification
    (endpoint/project/shared), cache template relationships, nested
    dirs, dirs-before-files sorting, empty dirs."""
    from flapi_spark.config_service import filesystem_structure

    d = tmp_path / "cfg"
    (d / "sub").mkdir(parents=True)
    (d / "flapi.yaml").write_text("project-name: t\nconnections: {}\n")
    (d / "users.yaml").write_text(
        "url-path: /users\ntemplate-source: users.sql\n"
    )
    (d / "products.yaml").write_text(
        "url-path: /products\ntemplate-source: products.sql\n"
        "cache:\n  enabled: true\n  table: p\n"
        "  template-file: products_cache.sql\n"
    )
    (d / "auth-shared.yaml").write_text("auth:\n  enabled: false\n")
    (d / "users.sql").write_text("SELECT 1")
    (d / "sub" / "deep.yaml").write_text(
        "url-path: /deep\ntemplate-text: SELECT 1\n"
    )

    got = filesystem_structure(d)
    assert got["config_file_exists"] is True
    assert got["config_file"] == "flapi.yaml"
    tree = got["tree"]
    # directories first, then files alphabetically
    assert tree[0]["type"] == "directory" and tree[0]["name"] == "sub"
    assert tree[0]["children"][0]["yaml_type"] == "endpoint"
    names = [n["name"] for n in tree[1:]]
    assert names == sorted(names)
    by_name = {n["name"]: n for n in tree[1:]}
    assert by_name["users.yaml"]["yaml_type"] == "endpoint"
    assert by_name["users.yaml"]["url_path"] == "/users"
    assert by_name["users.yaml"]["template_source"] == "users.sql"
    assert by_name["products.yaml"]["cache_template_source"] == \
        "products_cache.sql"
    assert by_name["flapi.yaml"]["yaml_type"] == "project"
    assert by_name["auth-shared.yaml"]["yaml_type"] == "shared"
    assert by_name["users.sql"]["type"] == "file"
    assert "yaml_type" not in by_name["users.sql"]
    # empty directory
    empty = filesystem_structure(tmp_path / "nope")
    assert empty["tree"] == [] and empty["config_file_exists"] is False
