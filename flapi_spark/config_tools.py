"""MCP tool adapter over the config service.

Re-expresses the reference's ConfigToolAdapter
(reference: src/config_tool_adapter.cpp:49-370): the config service's
CRUD/reload/validate operations surface as `flapi_*` MCP tools with
per-tool required-argument validation, JSON-RPC-style error codes
(-32601 unknown tool, -32602 invalid params, -32001 auth required)
and a token gate on every mutating tool. Read-only tools
(list/get/validate/project-config/environment) work without a token
even when one is configured, mirroring the reference's per-tool
`auth_required` map.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from flapi_spark.auth import AuthError
from flapi_spark.config_service import ConfigService, EndpointNotFound


@dataclass
class ConfigToolDef:
    name: str
    description: str
    required: list[str] = field(default_factory=list)
    optional: list[str] = field(default_factory=list)
    auth_required: bool = False

    def input_schema(self) -> dict:
        props = {
            p: {"type": "object" if p in ("doc",) else "string"}
            for p in [*self.required, *self.optional]
        }
        return {
            "type": "object",
            "properties": props,
            "required": list(self.required),
        }


def _err(code: int, message: str) -> dict:
    return {"error": {"code": code, "message": message}}


class ConfigToolAdapter:
    """`flapi_*` MCP tools backed by a ConfigService."""

    def __init__(self, service: ConfigService):
        self.service = service
        s = service
        self._defs: dict[str, ConfigToolDef] = {}
        self._handlers: dict[str, Callable[[dict, str | None], Any]] = {}

        def tool(d: ConfigToolDef, h: Callable[[dict, str | None], Any]):
            self._defs[d.name] = d
            self._handlers[d.name] = h

        tool(
            ConfigToolDef("flapi_list_endpoints", "List configured endpoints"),
            lambda a, t: s.list_endpoints(token=t),
        )
        tool(
            ConfigToolDef("flapi_get_endpoint", "Get one endpoint config",
                          required=["slug"]),
            lambda a, t: _endpoint_doc(s.get_endpoint(a["slug"], token=t)),
        )
        tool(
            ConfigToolDef("flapi_validate_config",
                          "Validate an endpoint document", required=["doc"]),
            lambda a, t: _validation_dict(s.validate(a["doc"], token=t)),
        )
        tool(
            ConfigToolDef("flapi_create_endpoint", "Create an endpoint",
                          required=["doc"], auth_required=True),
            lambda a, t: {"slug": s.create_endpoint(a["doc"], token=t)},
        )
        tool(
            ConfigToolDef("flapi_update_endpoint", "Update an endpoint",
                          required=["slug", "doc"], auth_required=True),
            lambda a, t: s.update_endpoint(a["slug"], a["doc"], token=t)
            or {"updated": a["slug"]},
        )
        tool(
            ConfigToolDef("flapi_delete_endpoint", "Delete an endpoint",
                          required=["slug"], auth_required=True),
            lambda a, t: s.delete_endpoint(a["slug"], token=t)
            or {"deleted": a["slug"]},
        )
        tool(
            ConfigToolDef("flapi_reload_endpoint",
                          "Reload an endpoint from disk", required=["slug"],
                          auth_required=True),
            lambda a, t: _endpoint_doc(s.reload_endpoint(a["slug"], token=t)),
        )
        tool(
            ConfigToolDef("flapi_reload_changed",
                          "Reload every endpoint whose file changed",
                          auth_required=True),
            lambda a, t: {"reloaded": s.reload_if_changed(token=t)},
        )
        tool(
            ConfigToolDef("flapi_get_project_config",
                          "Get the project-level config"),
            lambda a, t: s.project_config(token=t),
        )
        tool(
            ConfigToolDef("flapi_update_project_config",
                          "Replace the project-level config",
                          required=["doc"], auth_required=True),
            lambda a, t: s.update_project_config(a["doc"], token=t)
            or {"updated": True},
        )
        tool(
            ConfigToolDef("flapi_get_environment",
                          "Environment variables visible to templates"),
            lambda a, t: s.environment_variables(token=t),
        )

    # --- MCP surface --------------------------------------------------------

    def list_tools(self) -> list[dict]:
        return [
            {
                "name": d.name,
                "description": d.description,
                "inputSchema": d.input_schema(),
            }
            for d in self._defs.values()
        ]

    def get_tool_definition(self, name: str) -> ConfigToolDef | None:
        return self._defs.get(name)

    def is_authentication_required(self, name: str) -> bool:
        d = self._defs.get(name)
        return bool(d and d.auth_required)

    def execute_tool(
        self, name: str, arguments: dict | None = None, token: str | None = None
    ) -> dict:
        if name not in self._defs:
            return _err(-32601, f"Tool not found: {name}")
        d = self._defs[name]
        arguments = dict(arguments or {})
        missing = [p for p in d.required if p not in arguments]
        if missing:
            return _err(
                -32602, f"Missing required parameters: {', '.join(missing)}"
            )
        if (
            d.auth_required
            and self.service.token is not None
            and token != self.service.token
        ):
            return _err(-32001, f"Authentication required for tool: {name}")
        try:
            # read-only tools pass the service's own token through the
            # gate so they stay usable without the caller's secret
            eff = token if d.auth_required else (token or self.service.token)
            return {"result": self._handlers[name](arguments, eff)}
        except EndpointNotFound as exc:
            return _err(-32602, str(exc))
        except AuthError as exc:
            return _err(-32001, str(exc))
        except (KeyError, ValueError) as exc:
            return _err(-32602, f"{type(exc).__name__}: {exc}")


def _endpoint_doc(ep) -> dict:
    return {
        "url_path": ep.url_path,
        "description": ep.description,
        "connections": list(ep.connections),
        "with_pagination": ep.with_pagination,
        "request_fields": [f.field_name for f in ep.request_fields],
    }


def _validation_dict(res) -> dict:
    return {"valid": res.valid, "errors": list(res.errors),
            "warnings": list(res.warnings)}
