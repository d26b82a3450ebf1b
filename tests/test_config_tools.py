"""MCP config-tool adapter (reference: config_tool_adapter.cpp -
flapi_* tool defs, required-arg validation, JSON-RPC error codes,
per-tool auth gating)."""
import pytest

from flapi_spark.config_service import ConfigService
from flapi_spark.config_tools import ConfigToolAdapter


def _doc(url_path="/customers/", **over):
    base = {
        "url-path": url_path,
        "template-text": "SELECT 1 AS one",
        "connection": ["c1"],
        "description": "d",
    }
    base.update(over)
    return base


@pytest.fixture
def adapter(tmp_path):
    svc = ConfigService(tmp_path, token="sekrit")
    svc.create_endpoint(_doc(), token="sekrit")
    return ConfigToolAdapter(svc)


def test_tool_listing_has_schemas(adapter):
    tools = {t["name"]: t for t in adapter.list_tools()}
    assert "flapi_list_endpoints" in tools
    assert tools["flapi_get_endpoint"]["inputSchema"]["required"] == ["slug"]
    assert adapter.is_authentication_required("flapi_delete_endpoint")
    assert not adapter.is_authentication_required("flapi_list_endpoints")


def test_unknown_tool_error_code(adapter):
    out = adapter.execute_tool("flapi_nope")
    assert out["error"]["code"] == -32601


def test_missing_required_params(adapter):
    out = adapter.execute_tool("flapi_get_endpoint", {})
    assert out["error"]["code"] == -32602
    assert "slug" in out["error"]["message"]


def test_readonly_tools_work_without_token(adapter):
    out = adapter.execute_tool("flapi_list_endpoints")
    assert [e["url-path"] for e in out["result"]] == ["/customers/"]
    got = adapter.execute_tool("flapi_get_endpoint", {"slug": "customers-slash"})
    assert got["result"]["url_path"] == "/customers/"


def test_mutating_tool_requires_token(adapter):
    out = adapter.execute_tool(
        "flapi_create_endpoint", {"doc": _doc("/orders")}
    )
    assert out["error"]["code"] == -32001
    ok = adapter.execute_tool(
        "flapi_create_endpoint", {"doc": _doc("/orders")}, token="sekrit"
    )
    assert ok["result"]["slug"] == "orders"
    # wrong token also denied
    bad = adapter.execute_tool(
        "flapi_delete_endpoint", {"slug": "orders"}, token="nope"
    )
    assert bad["error"]["code"] == -32001


def test_validate_and_crud_round_trip(adapter):
    res = adapter.execute_tool(
        "flapi_validate_config", {"doc": _doc("/x")}
    )["result"]
    assert res["valid"] is True
    adapter.execute_tool(
        "flapi_create_endpoint", {"doc": _doc("/x")}, token="sekrit"
    )
    upd = adapter.execute_tool(
        "flapi_update_endpoint",
        {"slug": "x", "doc": _doc("/x", description="new")},
        token="sekrit",
    )
    assert upd["result"] == {"updated": "x"}
    got = adapter.execute_tool("flapi_get_endpoint", {"slug": "x"})
    assert got["result"]["description"] == "new"
    gone = adapter.execute_tool(
        "flapi_delete_endpoint", {"slug": "x"}, token="sekrit"
    )
    assert gone["result"] == {"deleted": "x"}
    miss = adapter.execute_tool("flapi_get_endpoint", {"slug": "x"})
    assert miss["error"]["code"] == -32602


def test_environment_and_project_config(adapter):
    env = adapter.execute_tool("flapi_get_environment")
    assert isinstance(env["result"], dict)
    pc = adapter.execute_tool("flapi_get_project_config")
    assert isinstance(pc["result"], dict)
