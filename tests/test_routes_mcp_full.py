"""Route translation (reference: route_translator.cpp) and the full
MCP surface — resources and prompts beside tools (reference:
customers-mcp-resource.yaml, customers-mcp-prompt.yaml)."""

import json
import os

import pytest

from flapi_spark.mcp import McpError, McpRegistry, Prompt
from flapi_spark.routes import RouteTable, match_route, translate_route_path

# --- routes ----------------------------------------------------------------


def test_translate_route_path():
    rx, names = translate_route_path("/customers/:id/")
    assert names == ["id"]
    assert rx.match("/customers/42/").groups() == ("42",)
    assert rx.match("/customers/42/orders/") is None


def test_match_route_multi_params():
    params = match_route("/customers/7/orders/99", "/customers/:cid/orders/:oid")
    assert params == {"cid": "7", "oid": "99"}
    assert match_route("/other/7", "/customers/:cid") is None


def test_route_table_first_match_wins():
    t = RouteTable()
    t.add("/customers/current", "special")
    t.add("/customers/:id", "generic")
    assert t.match("/customers/current") == ("special", {})
    assert t.match("/customers/9") == ("generic", {"id": "9"})
    assert t.match("/nope") is None


# --- MCP resources + prompts ----------------------------------------------


@pytest.fixture(scope="module")
def full_registry(spark):
    from flapi_spark.config import EndpointConfig
    from flapi_spark.executor import QueryExecutor
    from flapi_spark.sources.registry import Connection, ConnectionRegistry
    from flapi_spark.validation import RequestField, Validator

    sf = os.environ.get("FLAPI_SPARK_TEST_SF", "/root/testdata/sf0.001")
    reg = ConnectionRegistry()
    reg.add(
        Connection(
            name="customers-parquet",
            properties={"path": os.path.join(sf, "customer.parquet")},
        )
    )
    ep = EndpointConfig(
        url_path="/customers/",
        template_text=(
            "SELECT c_custkey AS key, c_mktsegment AS segment"
            " FROM parquet.`{{{conn.path}}}`"
            " WHERE c_custkey <= 5 ORDER BY c_custkey"
        ),
        connections=["customers-parquet"],
        with_pagination=False,
    )
    registry = McpRegistry(QueryExecutor(spark, reg))
    registry.register_resource(
        "customer_schema", ep, description="first five customers",
        mime_type="application/json",
    )
    registry.register_prompt(
        Prompt.from_dict(
            {
                "mcp-prompt": {
                    "name": "customer_analysis",
                    "description": "analyze a customer",
                    "template": (
                        "Analyze customer data."
                        "{{#customer_id}} Customer: {{customer_id}}.{{/customer_id}}"
                        "{{^customer_id}} All customers.{{/customer_id}}"
                        "{{#segment}} Segment: {{segment}}.{{/segment}}"
                    ),
                    "arguments": ["customer_id", "segment"],
                }
            }
        )
    )
    return registry


def test_list_and_read_resource(full_registry):
    listed = full_registry.list_resources()
    assert listed == [
        {
            "name": "customer_schema",
            "description": "first five customers",
            "mimeType": "application/json",
        }
    ]
    out = full_registry.read_resource("customer_schema")
    assert out["mimeType"] == "application/json"
    rows = json.loads(out["content"])
    assert len(rows) == 6  # keys 0..5
    assert rows[0]["key"] == 0
    with pytest.raises(McpError):
        full_registry.read_resource("nope")


def test_list_and_get_prompt(full_registry):
    listed = full_registry.list_prompts()
    assert listed[0]["name"] == "customer_analysis"
    assert {a["name"] for a in listed[0]["arguments"]} == {"customer_id", "segment"}

    msg = full_registry.get_prompt(
        "customer_analysis", {"customer_id": "7", "segment": "BUILDING",
                              "not_declared": "ignored"}
    )
    text = msg["messages"][0]["content"]["text"]
    assert "Customer: 7." in text
    assert "Segment: BUILDING." in text
    assert "ignored" not in text  # undeclared args are dropped

    empty = full_registry.get_prompt("customer_analysis", {})
    assert "All customers." in empty["messages"][0]["content"]["text"]
    with pytest.raises(McpError):
        full_registry.get_prompt("nope")


def test_tools_still_work_on_full_registry(full_registry):
    # McpRegistry extends the tool registry — same executor drives both
    assert full_registry.list_tools() == []


def test_route_table_is_method_aware():
    """Same pattern, different methods → independent targets (the
    reference routes by (path, method))."""
    t = RouteTable()
    t.add("/customers/:id", "get-target", method="GET")
    t.add("/customers/:id", "post-target", method="POST")
    got_get = t.match("/customers/7", "GET")
    got_post = t.match("/customers/7", "post")
    assert got_get == ("get-target", {"id": "7"})
    assert got_post == ("post-target", {"id": "7"})
    assert t.match("/customers/7", "DELETE") is None
