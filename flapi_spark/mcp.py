"""MCP-style tool registry over endpoints.

Re-expresses the reference's MCP layer semantics as a Python API
(reference: src/mcp_tool_handler.cpp, mcp_authorization_policy.cpp,
mcp_dry_run.cpp, mcp_response_shaper.cpp, mcp_tool_rate_limiter.cpp,
mcp_description_scanner.cpp): declarative tools over endpoints with
per-tool RBAC (`allowed-roles`), dry-run (`_dryRun: true` returns the
would-run plan instead of rows), response shaping, per-tool rate
limits, and a tool-description hygiene scanner for prompt-injection
attempts. The HTTP/JSON-RPC transport is out of scope — the policy
layer is what carries over to a Spark engine.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field
from typing import Any

from flapi_spark.config import EndpointConfig
from flapi_spark.executor import QueryExecutor, shape_df


class McpError(RuntimeError):
    pass


class AuthorizationError(McpError):
    pass


class RateLimitError(McpError):
    pass


# prompt-injection markers for tool descriptions (reference:
# mcp_description_scanner.cpp — hygiene scan before tools are exposed)
_INJECTION_PATTERNS = [
    r"ignore\s+(all\s+|any\s+)?(previous|prior|above)\s+instructions",
    r"disregard\s+(all\s+|any\s+)?(previous|prior|above)",
    r"you\s+are\s+now\b",
    r"system\s*prompt",
    r"do\s+not\s+tell\s+the\s+user",
    r"<\s*/?(system|assistant|tool)\s*>",
    r"BEGIN\s+ADMIN",
]


def scan_description(description: str) -> list[str]:
    """Return the list of suspicious patterns found in a tool description."""
    hits = []
    for pat in _INJECTION_PATTERNS:
        if re.search(pat, description, re.IGNORECASE):
            hits.append(pat)
    return hits


class TokenBucket:
    """Per-tool rate limiter (reference: mcp_tool_rate_limiter.cpp)."""

    def __init__(self, max_calls: int, interval_s: float):
        self.max_calls = max_calls
        self.interval_s = interval_s
        self._hits: list[float] = []

    def acquire(self, now: float | None = None) -> bool:
        now = time.monotonic() if now is None else now
        cutoff = now - self.interval_s
        self._hits = [t for t in self._hits if t > cutoff]
        if len(self._hits) >= self.max_calls:
            return False
        self._hits.append(now)
        return True


_TYPE_MAP = {
    "int": "integer", "integer": "integer", "double": "number",
    "float": "number", "boolean": "boolean", "bool": "boolean",
    "date": "string", "time": "string", "uuid": "string",
    "email": "string", "enum": "string", "string": "string",
}


@dataclass
class Tool:
    name: str
    endpoint: EndpointConfig
    description: str = ""
    allowed_roles: list[str] = field(default_factory=list)
    max_rows: int | None = None
    rate_limit: TokenBucket | None = None
    description_warnings: list[str] = field(default_factory=list)

    def input_schema(self) -> dict:
        props: dict[str, Any] = {}
        required = []
        for f in self.endpoint.request_fields:
            spec: dict[str, Any] = {
                "type": _TYPE_MAP.get(f.bound_type, "string"),
                "description": f.description,
            }
            for v in f.validators:
                if v.type == "enum" and v.allowed_values:
                    spec["enum"] = list(v.allowed_values)
                if v.min is not None:
                    spec["minimum"] = v.min
                if v.max is not None:
                    spec["maximum"] = v.max
            props[f.field_name] = spec
            if f.required:
                required.append(f.field_name)
        return {"type": "object", "properties": props, "required": required}


class McpToolRegistry:
    def __init__(self, executor: QueryExecutor):
        self.executor = executor
        self._tools: dict[str, Tool] = {}

    def register(
        self,
        name: str,
        endpoint: EndpointConfig,
        description: str = "",
        allowed_roles: list[str] | None = None,
        max_rows: int | None = None,
        rate_limit: tuple[int, float] | None = None,
    ) -> Tool:
        tool = Tool(
            name=name,
            endpoint=endpoint,
            description=description or endpoint.description,
            allowed_roles=list(allowed_roles or endpoint.allowed_roles),
            max_rows=max_rows,
            rate_limit=TokenBucket(*rate_limit) if rate_limit else None,
            description_warnings=scan_description(description or endpoint.description),
        )
        self._tools[name] = tool
        return tool

    def list_tools(self, roles: list[str] | None = None) -> list[dict]:
        out = []
        for tool in self._tools.values():
            if tool.allowed_roles and roles is not None and not (
                set(tool.allowed_roles) & set(roles)
            ):
                continue
            out.append(
                {
                    "name": tool.name,
                    "description": tool.description,
                    "inputSchema": tool.input_schema(),
                    "warnings": tool.description_warnings,
                }
            )
        return out

    def call_tool(
        self,
        name: str,
        arguments: dict | None = None,
        roles: list[str] | None = None,
        order_by: str | None = None,
    ) -> dict:
        if name not in self._tools:
            raise McpError(f"unknown tool '{name}'")
        tool = self._tools[name]
        if tool.allowed_roles and not (set(tool.allowed_roles) & set(roles or [])):
            raise AuthorizationError(
                f"tool '{name}' requires one of roles {tool.allowed_roles}"
            )
        if tool.rate_limit is not None and not tool.rate_limit.acquire():
            raise RateLimitError(f"tool '{name}' rate limit exceeded")

        arguments = dict(arguments or {})
        dry_run = bool(arguments.pop("_dryRun", False))
        if dry_run:
            # reference: mcp_dry_run.cpp returns the would-run SQL; the
            # Spark analogue returns rendered SQL + the physical plan
            sql, args = self.executor.render(tool.endpoint, arguments)
            plan = self.executor.explain(tool.endpoint, arguments)
            return {"dry_run": True, "sql": sql, "bound_params": sorted(args), "plan": plan}

        result = self.executor.execute(tool.endpoint, arguments, order_by=order_by)
        df = result.df
        if tool.max_rows is not None:
            df = df.limit(tool.max_rows)
        rows = [r.asDict() for r in df.collect()]
        out: dict[str, Any] = {"rows": rows, "row_count": len(rows)}
        if result.total_count is not None:
            out["total_count"] = result.total_count
        if result.shaped:
            out["shaped"] = result.shaped
        return out
