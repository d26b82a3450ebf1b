"""Endpoint schema description (OpenAPI-doc analogue).

Reference: src/open_api_doc_generator.cpp builds a Swagger document
from endpoint configs; the Spark-native equivalent describes each
endpoint's parameters and — via Catalyst analysis only, no execution —
its result schema.
"""

from __future__ import annotations

from typing import Any

from flapi_spark.config import EndpointConfig
from flapi_spark.executor import QueryExecutor


def describe_endpoint(
    executor: QueryExecutor,
    endpoint: EndpointConfig,
    sample_params: dict | None = None,
) -> dict[str, Any]:
    params = []
    for f in endpoint.request_fields:
        params.append(
            {
                "name": f.field_name,
                "in": f.field_in,
                "description": f.description,
                "required": f.required,
                "type": f.bound_type,
                "validators": [
                    {k: v for k, v in vars(val).items() if v not in (None, [], False)}
                    for val in f.validators
                ],
            }
        )
    if endpoint.is_write:
        # NEVER probe a write endpoint's schema: spark.sql() runs DML
        # commands EAGERLY, so building the "lazy" DataFrame would
        # execute the mutation. Writes report the WriteResult shape.
        result_schema = [
            {"name": "rows_affected", "type": "bigint", "nullable": False},
        ]
    else:
        sql, args = executor.render(endpoint, dict(sample_params or {}))
        df = executor.spark.sql(sql, args=args) if args else executor.spark.sql(sql)
        result_schema = [
            {"name": fld.name, "type": fld.dataType.simpleString(), "nullable": fld.nullable}
            for fld in df.schema.fields
        ]
    doc = {
        "url_path": endpoint.url_path,
        "description": endpoint.description,
        "parameters": params,
        "result_schema": result_schema,
        "with_pagination": endpoint.with_pagination,
        "method": endpoint.method,
    }
    if endpoint.with_pagination:
        doc["pagination"] = {
            "offset": {"type": "integer", "default": 0},
            "limit": {"type": "integer", "default": 100},
            "response_fields": ["total_count"],
        }
    return doc


_OPENAPI_TYPES = {
    "int": ("integer", "int64"), "integer": ("integer", "int64"),
    "double": ("number", "double"), "float": ("number", "double"),
    "boolean": ("boolean", None), "bool": ("boolean", None),
    "date": ("string", "date"), "time": ("string", "time"),
    "uuid": ("string", "uuid"), "email": ("string", "email"),
    "enum": ("string", None), "string": ("string", None),
}


def openapi_doc(
    executor: QueryExecutor,
    endpoints: list[EndpointConfig],
    title: str = "flapi_spark API",
    version: str = "1.0.0",
) -> dict[str, Any]:
    """OpenAPI 3 document over an endpoint list (reference:
    src/open_api_doc_generator.cpp builds the same shape from the
    endpoint registry). Result schemas come from Catalyst analysis of
    the rendered template — no query execution."""
    paths: dict[str, Any] = {}
    for ep in endpoints:
        desc = describe_endpoint(executor, ep)
        parameters = []
        for p in desc["parameters"]:
            typ, fmt = _OPENAPI_TYPES.get(p["type"], ("string", None))
            schema: dict[str, Any] = {"type": typ}
            if fmt:
                schema["format"] = fmt
            for v in p["validators"]:
                if "allowed_values" in v:
                    schema["enum"] = list(v["allowed_values"])
                if v.get("min") is not None:
                    schema["minimum"] = v["min"]
                if v.get("max") is not None:
                    schema["maximum"] = v["max"]
                if v.get("regex"):
                    schema["pattern"] = v["regex"]
            parameters.append(
                {
                    "name": p["name"],
                    "in": "query" if p["in"] in ("", "query") else p["in"],
                    "required": bool(p["required"]),
                    "description": p["description"] or "",
                    "schema": schema,
                }
            )
        if desc["with_pagination"]:
            for name, dflt in (("offset", 0), ("limit", 100)):
                parameters.append(
                    {
                        "name": name, "in": "query", "required": False,
                        "schema": {"type": "integer", "default": dflt},
                    }
                )
        item_props = {
            f["name"]: {"type": _spark_to_openapi(f["type"])}
            for f in desc["result_schema"]
        }
        method = desc.get("method", "GET").lower()
        if ep.is_write:
            # write endpoints: body params become a requestBody; the
            # response is the WriteResult envelope (reference:
            # request_handler.cpp rows_affected + 201 for POST)
            body_props = {
                p["name"]: p["schema"]
                for p in parameters if p["in"] == "body"
            }
            op = {
                "description": ep.description or "",
                "parameters": [p for p in parameters if p["in"] != "body"],
                "responses": {
                    ("201" if method == "post" else "200"): {
                        "description": "write result",
                        "content": {
                            "application/json": {
                                "schema": {
                                    "type": "object",
                                    "properties": {
                                        "rows_affected": {
                                            "type": "integer"
                                        },
                                    },
                                }
                            }
                        },
                    },
                    "400": {"description": "validation error"},
                },
            }
            if body_props:
                op["requestBody"] = {
                    "required": True,
                    "content": {
                        "application/json": {
                            "schema": {
                                "type": "object",
                                "properties": body_props,
                            }
                        }
                    },
                }
            paths[ep.url_path] = {method: op}
            continue
        paths[ep.url_path] = {
            "get": {
                "description": ep.description or "",
                "parameters": parameters,
                "responses": {
                    "200": {
                        "description": "query result",
                        "content": {
                            "application/json": {
                                "schema": {
                                    "type": "array",
                                    "items": {
                                        "type": "object",
                                        "properties": item_props,
                                    },
                                }
                            }
                        },
                    },
                    "400": {"description": "validation error"},
                },
            }
        }
    return {
        "openapi": "3.0.3",
        "info": {"title": title, "version": version},
        "paths": paths,
    }


def _spark_to_openapi(spark_type: str) -> str:
    if spark_type in ("tinyint", "smallint", "int", "bigint", "long"):
        return "integer"
    if spark_type in ("float", "double") or spark_type.startswith("decimal"):
        return "number"
    if spark_type == "boolean":
        return "boolean"
    return "string"
