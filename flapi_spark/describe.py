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
    }
    if endpoint.with_pagination:
        doc["pagination"] = {
            "offset": {"type": "integer", "default": 0},
            "limit": {"type": "integer", "default": 100},
            "response_fields": ["total_count"],
        }
    return doc
