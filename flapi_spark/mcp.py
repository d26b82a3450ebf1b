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

import logging
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


# Explicit opt-out sentinel for row caps: max_rows=UNLIMITED disables
# the default driver-side materialization bound.
UNLIMITED = -1

# Default row cap applied before any driver-side collect. At cluster
# scale an uncapped endpoint result OOMs the driver; callers that
# genuinely need everything must opt out with max_rows=UNLIMITED
# (reference: mcp_response_shaper.cpp max-rows semantics).
DEFAULT_MAX_ROWS = 10_000


class McpToolRegistry:
    def __init__(self, executor: QueryExecutor, auth_enabled: bool = False):
        self.executor = executor
        self.auth_enabled = auth_enabled
        self._tools: dict[str, Tool] = {}

    def _authorize(
        self, kind: str, name: str, allowed_roles: list[str], roles: list[str] | None
    ) -> None:
        """Fail-closed when MCP auth is enabled (reference:
        mcp_authorization_policy.cpp): an auth-enabled registry denies
        any tool/resource that has no allowed-roles configured — a
        forgotten allowed-roles block must not expose the endpoint."""
        if self.auth_enabled:
            if not allowed_roles:
                raise AuthorizationError(
                    f"{kind} '{name}' has no allowed-roles configured and MCP"
                    " auth is enabled (fail-closed)"
                )
            if not (set(allowed_roles) & set(roles or [])):
                raise AuthorizationError(
                    f"{kind} '{name}' requires one of roles {allowed_roles}"
                )
        elif allowed_roles and not (set(allowed_roles) & set(roles or [])):
            raise AuthorizationError(
                f"{kind} '{name}' requires one of roles {allowed_roles}"
            )

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
            if self.auth_enabled and not tool.allowed_roles:
                continue  # fail-closed: unconfigured tools are not listed
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
        self._authorize("tool", name, tool.allowed_roles, roles)
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

        if tool.endpoint.is_write:
            # write tools (reference: customers_write_mcp.yaml +
            # mcp_tool_handler.cpp rows_affected): route through the
            # write path; rows out = RETURNING / trailing-SELECT data
            wres = self.executor.execute_write(tool.endpoint, arguments)
            out = {"rows_affected": wres.rows_affected}
            if wres.returned_data is not None:
                cap = DEFAULT_MAX_ROWS if tool.max_rows is None else tool.max_rows
                df = wres.returned_data
                if cap != UNLIMITED:
                    df = df.limit(cap)
                rows = [r.asDict() for r in df.collect()]
                out["rows"] = rows
                out["row_count"] = len(rows)
            return out

        result = self.executor.execute(tool.endpoint, arguments, order_by=order_by)
        df = result.df
        cap = DEFAULT_MAX_ROWS if tool.max_rows is None else tool.max_rows
        if cap != UNLIMITED:
            # bound driver-side materialization: the limit is planned
            # (CollectLimit), never a full collect of an unshaped result
            df = df.limit(cap)
        rows = [r.asDict() for r in df.collect()]
        out: dict[str, Any] = {"rows": rows, "row_count": len(rows)}
        if result.total_count is not None:
            out["total_count"] = result.total_count
        if result.shaped:
            out["shaped"] = result.shaped
        return out


@dataclass
class Resource:
    """MCP resource: a named, mime-typed view over an endpoint query
    (reference: customers-mcp-resource.yaml + mcp_route_handlers.cpp
    resource listing/reading)."""

    name: str
    endpoint: EndpointConfig
    description: str = ""
    mime_type: str = "application/json"
    rate_limit: TokenBucket | None = None
    allowed_roles: list[str] = field(default_factory=list)


@dataclass
class Prompt:
    """MCP prompt: a mustache text template with declared arguments
    (reference: customers-mcp-prompt.yaml + mcp_prompt_handler.cpp).
    Unlike endpoint SQL templates, prompt variables are bare names."""

    name: str
    template: str
    description: str = ""
    arguments: list[str] = field(default_factory=list)
    # request_fields of the originating EndpointConfig — the reference
    # resolves a prompt ref back to its endpoint and completes from
    # these (mcp_route_handlers.cpp:1338-1349), so a YAML mcp-prompt
    # endpoint with enum-validated fields gets real suggestions
    request_fields: list = field(default_factory=list)
    # True when the prompt was registered from an endpoint: the
    # reference then completes ONLY against request_fields — an
    # endpoint prompt whose endpoint declares no request_fields gets
    # 'Argument not found' for every argument (mcp_route_handlers.cpp
    # ~1349), never the bare-argument fallback
    has_endpoint: bool = False

    @classmethod
    def from_dict(cls, d: dict, request_fields: list | None = None) -> "Prompt":
        p = d.get("mcp-prompt", d)
        return cls(
            name=p.get("name", ""),
            template=p.get("template", ""),
            description=p.get("description", ""),
            arguments=list(p.get("arguments", []) or []),
            request_fields=list(request_fields or []),
            has_endpoint=request_fields is not None,
        )

    def render(self, args: dict | None = None) -> str:
        from flapi_spark.templates import render_template

        args = {k: v for k, v in (args or {}).items() if k in self.arguments}
        return render_template(self.template, args)


class McpRegistry(McpToolRegistry):
    """Tools + resources + prompts — the full MCP surface."""

    def __init__(self, executor: QueryExecutor, auth_enabled: bool = False):
        super().__init__(executor, auth_enabled=auth_enabled)
        self._resources: dict[str, Resource] = {}
        self._prompts: dict[str, Prompt] = {}

    # --- resources ---------------------------------------------------------

    def register_resource(
        self,
        name: str,
        endpoint: EndpointConfig,
        description: str = "",
        mime_type: str = "application/json",
        rate_limit: tuple[int, float] | None = None,
        allowed_roles: list[str] | None = None,
    ) -> Resource:
        res = Resource(
            name=name,
            endpoint=endpoint,
            description=description or endpoint.description,
            mime_type=mime_type,
            rate_limit=TokenBucket(*rate_limit) if rate_limit else None,
            allowed_roles=list(allowed_roles or endpoint.allowed_roles),
        )
        self._resources[name] = res
        return res

    def list_resources(self) -> list[dict]:
        return [
            {
                "name": r.name,
                "description": r.description,
                "mimeType": r.mime_type,
            }
            for r in self._resources.values()
        ]

    def read_resource(
        self,
        name: str,
        params: dict | None = None,
        roles: list[str] | None = None,
    ) -> dict:
        if name not in self._resources:
            raise McpError(f"unknown resource '{name}'")
        res = self._resources[name]
        self._authorize("resource", name, res.allowed_roles, roles)
        if res.rate_limit is not None and not res.rate_limit.acquire():
            raise RateLimitError(f"resource '{name}' rate limit exceeded")
        from flapi_spark import results as _rz

        out = self.executor.execute(res.endpoint, dict(params or {}))
        body, ct = _rz.negotiate(out.df, res.mime_type)
        return {"name": name, "mimeType": ct, "content": body}

    # --- prompts -----------------------------------------------------------

    def register_prompt(self, prompt: Prompt) -> Prompt:
        self._prompts[prompt.name] = prompt
        return prompt

    def list_prompts(self) -> list[dict]:
        return [
            {
                "name": p.name,
                "description": p.description,
                "arguments": [
                    {"name": a, "required": False} for a in p.arguments
                ],
            }
            for p in self._prompts.values()
        ]

    def get_prompt(self, name: str, args: dict | None = None) -> dict:
        if name not in self._prompts:
            raise McpError(f"Prompt not found: {name}")
        p = self._prompts[name]
        return {
            "name": name,
            "description": p.description,
            "messages": [
                {"role": "user", "content": {"type": "text", "text": p.render(args)}}
            ],
        }

    # --- completion ----------------------------------------------------------

    def complete(
        self, ref: str, argument: str, value_prefix: str = ""
    ) -> dict:
        """Argument-completion suggestions for a tool or prompt
        (reference: mcp_route_handlers.cpp
        handleCompletionCompleteRequest): enum-validated arguments
        complete from their allowedValues, prefix-filtered, capped at
        50 with total/hasMore; non-enum arguments return an empty
        completion (the client falls back to its own methods)."""
        fields = None
        tool = self._tools.get(ref)
        if tool is not None:
            fields = {
                f.field_name: f for f in tool.endpoint.request_fields
            }
        elif ref in self._prompts:
            # a prompt ref resolves back to its originating endpoint's
            # request_fields and completes from those enum validators
            # (reference mcp_route_handlers.cpp:1321-1349 — the same
            # lookup path as tools): an endpoint prompt completes ONLY
            # against its request_fields, so an empty list means every
            # argument is 'Argument not found'; only a prompt
            # registered WITHOUT an endpoint falls back to its bare
            # argument names, which complete to the empty set
            p = self._prompts[ref]
            if p.has_endpoint:
                fields = {f.field_name: f for f in p.request_fields}
            else:
                fields = {a: None for a in p.arguments}
        if fields is None:
            raise McpError(f"Reference not found: {ref}")
        if argument not in fields:
            raise McpError(f"Argument not found: {argument}")
        values: list[str] = []
        total = 0
        has_more = False
        f = fields[argument]
        if f is not None:
            for v in f.validators:
                if v.type == "enum" and v.allowed_values:
                    # total counts every value ITERATED (reference
                    # parity — the loop breaks once the 50-cap trips,
                    # so total under-reports past the cap, by design)
                    for ev in v.allowed_values:
                        ev = str(ev)
                        if not value_prefix or ev.startswith(value_prefix):
                            if len(values) < 50:
                                values.append(ev)
                            else:
                                has_more = True
                                break
                        total += 1  # loop-level (not per-match)
                    break
        return {"values": values, "total": total, "hasMore": has_more}


# --- description scanner (reference: mcp_description_scanner.cpp) -------

MAX_DESCRIPTION_LENGTH = 2048

# phrases observed in prompt-injection corpora; short and anchored so
# legitimate uses of common words like "ignore" don't trip the detector
_INJECTION_PHRASES = (
    "ignore previous instructions",
    "ignore the above",
    "disregard previous instructions",
    "disregard the above",
    "system:",
    "you are now",
)

# regex markers beyond the reference's literal phrase set: role-tag
# injection (</system> etc.), qualified ignore/disregard variants,
# admin-mode markers, and tell-no-one secrecy instructions
_INJECTION_REGEXES = tuple(
    re.compile(p, re.IGNORECASE)
    for p in (
        r"ignore\s+(all\s+|any\s+)?(previous|prior|above)\s+instructions",
        r"disregard\s+(all\s+|any\s+)?(previous|prior|above)",
        r"system\s*prompt",
        r"do\s+not\s+tell\s+the\s+user",
        r"<\s*/?(system|assistant|tool)\s*>",
        r"BEGIN\s+ADMIN",
    )
)


def scan_description(description: str) -> list[dict]:
    """Screen an MCP tool/endpoint description before it is exposed to
    a model: flag control bytes (NUL/BEL/...; \\n \\r \\t tolerated),
    excessive length (context-drowning), and known prompt-injection
    phrases (case-insensitive). Returns [{code, message}, ...]; empty
    means clean. An empty description is structurally fine — required-
    ness is validator policy, not hostile content.

    Reference: mcp_description_scanner.cpp (same codes, same phrase
    set, one control-character report per description)."""
    issues: list[dict] = []
    for ch in description:
        o = ord(ch)
        if (o < 0x20 and ch not in "\n\r\t") or o == 0x7F:
            issues.append(
                {
                    "code": "DESCRIPTION_CONTROL_CHARACTER",
                    "message": "description contains a control character"
                    " (NUL, BEL, etc.); only \\n, \\r and \\t are tolerated",
                }
            )
            break  # one report per description is enough
    if len(description.encode("utf-8")) > MAX_DESCRIPTION_LENGTH:
        issues.append(
            {
                "code": "DESCRIPTION_TOO_LONG",
                "message": f"description exceeds {MAX_DESCRIPTION_LENGTH}"
                " bytes; long descriptions waste model context and are"
                " sometimes used to drown out user prompts",
            }
        )
    lowered = description.lower()
    if any(p in lowered for p in _INJECTION_PHRASES) or any(
        rx.search(description) for rx in _INJECTION_REGEXES
    ):
        issues.append(
            {
                "code": "DESCRIPTION_PROMPT_INJECTION",
                "message": "description contains a phrase commonly used"
                " in prompt-injection attempts; if intentional copy,"
                " rephrase — otherwise treat the YAML as compromised",
            }
        )
    return issues


# --- session manager (reference: mcp_session_manager.cpp) ---------------

MCP_PROTOCOL_VERSIONS = (
    "2024-11-05",
    "2025-03-26",
    "2025-06-18",
    "2025-11-25",
)
MCP_LATEST_PROTOCOL_VERSION = MCP_PROTOCOL_VERSIONS[-1]
DEFAULT_SESSION_TIMEOUT_MINUTES = 30


def negotiate_protocol_version(client_version: str) -> str:
    """MCP initialize negotiation: echo the client's version when the
    server supports it, otherwise answer with the latest supported
    (per the MCP spec's version-negotiation rule)."""
    if client_version in MCP_PROTOCOL_VERSIONS:
        return client_version
    return MCP_LATEST_PROTOCOL_VERSION


class McpSessionManager:
    """In-memory MCP session registry: create/get/touch/remove plus
    timeout-based expiry sweeps. The clock is injectable so expiry is
    testable without sleeping. Sessions carry the client's negotiated
    protocol version and an optional auth context (user + roles) so
    per-call RBAC doesn't re-validate credentials.

    Reference: mcp_session_manager.cpp (expired sessions are evicted
    lazily on lookup and in bulk by cleanup_expired_sessions)."""

    def __init__(
        self,
        timeout_minutes: int = DEFAULT_SESSION_TIMEOUT_MINUTES,
        clock=None,
    ):
        import time as _time

        self._timeout_s = timeout_minutes * 60
        self._clock = clock or _time.monotonic
        self._sessions: dict[str, dict] = {}

    def set_session_timeout(self, minutes: int) -> None:
        self._timeout_s = minutes * 60

    @property
    def session_timeout_minutes(self) -> int:
        return self._timeout_s // 60

    def create_session(
        self, client_version: str = "", auth_context: dict | None = None
    ) -> str:
        import secrets

        session_id = secrets.token_hex(12)
        self._sessions[session_id] = {
            "session_id": session_id,
            "client_version": client_version,
            "protocol_version": negotiate_protocol_version(client_version),
            "auth_context": auth_context,
            "last_activity": self._clock(),
        }
        return session_id

    def _expired(self, session: dict) -> bool:
        return self._clock() - session["last_activity"] > self._timeout_s

    def get_session(self, session_id: str) -> dict | None:
        s = self._sessions.get(session_id)
        if s is None:
            return None
        if self._expired(s):
            del self._sessions[session_id]
            return None
        return s

    def update_session_activity(self, session_id: str) -> None:
        s = self._sessions.get(session_id)
        if s is not None:
            s["last_activity"] = self._clock()

    def remove_session(self, session_id: str) -> None:
        self._sessions.pop(session_id, None)

    def cleanup_expired_sessions(self) -> int:
        dead = [k for k, s in self._sessions.items() if self._expired(s)]
        for k in dead:
            del self._sessions[k]
        return len(dead)

    def is_session_valid(self, session_id: str) -> bool:
        s = self._sessions.get(session_id)
        return s is not None and not self._expired(s)

    @property
    def active_session_count(self) -> int:
        return len(self._sessions)


# --- server instructions + initialize payload ---------------------------
# (reference: config_manager.cpp:1267-1300 loadMCPInstructions,
#  mcp_route_handlers.cpp:752-774 handleInitialize)


def load_mcp_instructions(
    mcp_config: dict | None, base_path: str = "."
) -> str:
    """Resolve the server-instructions block the initialize response
    serves. Priority mirrors config_manager.cpp loadMCPInstructions:
    1) inline `instructions`, 2) `instructions-file` (relative paths
    resolve against the project base path; unreadable file → "" with
    a warning, never an error), 3) empty."""
    import os
    import warnings

    mcp_config = mcp_config or {}
    inline = mcp_config.get("instructions") or ""
    if inline:
        return inline
    file_ref = mcp_config.get("instructions-file") or ""
    if not file_ref:
        return ""
    path = file_ref
    if not os.path.isabs(path):
        path = os.path.join(base_path, path)
    try:
        with open(path, encoding="utf-8") as fh:
            return fh.read()
    except OSError:
        warnings.warn(
            f"Failed to open MCP instructions file: {path}",
            stacklevel=2,
        )
        return ""


@dataclass
class McpClientCapabilities:
    """reference: mcp_client_capabilities.hpp MCPClientCapabilities."""

    supports_sampling: bool = False
    supports_roots: bool = False
    supports_logging: bool = False
    supported_protocols: list[str] = field(default_factory=list)


def detect_client_capabilities(params: Any) -> McpClientCapabilities:
    """Extract the client's declared capabilities from the initialize
    params (reference: mcp_client_capabilities.cpp:6-44
    detectFromInitialize + :48 extractSupportedProtocols). Booleans
    count only when the capability value is LITERALLY true (an object
    value like {"listChanged": true} is not a boolean grant);
    supportedProtocols lists are collected from every nested
    capability object, strings only."""
    caps = McpClientCapabilities()
    if not isinstance(params, dict):
        return caps
    obj = params.get("capabilities")
    if not isinstance(obj, dict):
        return caps
    caps.supports_sampling = obj.get("sampling") is True
    caps.supports_roots = obj.get("roots") is True
    caps.supports_logging = obj.get("logging") is True
    for value in obj.values():
        if isinstance(value, dict):
            protos = value.get("supportedProtocols")
            if isinstance(protos, list):
                caps.supported_protocols.extend(
                    p for p in protos if isinstance(p, str)
                )
    return caps


def build_initialize_result(
    params: dict | None = None,
    mcp_config: dict | None = None,
    base_path: str = ".",
    server_name: str = "flapi-spark",
    server_version: str = "0.5.0",
) -> dict:
    """Assemble the MCP initialize result (reference:
    mcp_route_handlers.cpp:752-774): negotiated protocolVersion,
    advertised server capabilities, serverInfo, and — only when
    configured non-empty — the instructions block
    (test/integration/test_mcp_instructions.py: absent or "" without
    configuration)."""
    params = params or {}
    client_version = params.get("protocolVersion") or ""
    result = {
        "protocolVersion": negotiate_protocol_version(client_version),
        "capabilities": {
            "tools": {"listChanged": True},
            "resources": {"subscribe": False, "listChanged": True},
            "prompts": {"listChanged": True},
            "logging": {},
        },
        "serverInfo": {"name": server_name, "version": server_version},
    }
    instructions = load_mcp_instructions(mcp_config, base_path)
    if instructions:
        result["instructions"] = instructions
    return result


# --- JSON-RPC request validation ----------------------------------------
# (reference: mcp_request_validator.cpp + mcp_constants.hpp)

JSONRPC_VERSION = "2.0"
PARSE_ERROR = -32700
INVALID_REQUEST = -32600
METHOD_NOT_FOUND = -32601
INVALID_PARAMS = -32602
INTERNAL_ERROR = -32603

MCP_METHODS = (
    "initialize", "tools/list", "tools/call",
    "resources/list", "resources/read",
    "prompts/list", "prompts/get",
    "logging/setLevel", "completion/complete", "ping",
)
_METHOD_NAME_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_./]*$")
# accepted initialize protocol versions: everything the server can
# NEGOTIATE (MCP_PROTOCOL_VERSIONS) plus the reference validator's
# legacy "2024-01-01" (mcp_request_validator.cpp:106). Deliberate
# deviation: the reference's validator whitelist is NARROWER than its
# own initialize negotiation, so a current client sending e.g.
# 2025-06-18 would be bounced before negotiation ever ran — we accept
# the full negotiable set instead of reproducing that bug.
_VALIDATOR_PROTOCOL_VERSIONS = (*MCP_PROTOCOL_VERSIONS, "2024-01-01")


def validate_jsonrpc_request(request: dict) -> list[str]:
    """Validation errors for an MCP JSON-RPC request, empty when valid
    (reference: mcp_request_validator.cpp validateJsonRpcRequest —
    version check, method-name pattern, then method-specific param
    rules; first failure short-circuits like the reference)."""
    if request.get("jsonrpc") != JSONRPC_VERSION:
        return [f"Invalid JSON-RPC version: {request.get('jsonrpc', '')}"]
    method = request.get("method") or ""
    if not _METHOD_NAME_RE.match(method):
        return [f"Invalid method name: {method}"]
    return validate_params_for_method(method, request.get("params"))


def validate_method_exists(method: str) -> list[str]:
    if method not in MCP_METHODS:
        return [f"Method not found: {method}"]
    return []


def validate_params_for_method(method: str, params) -> list[str]:
    if method == "initialize":
        if not isinstance(params, dict):
            return ["Initialize params must be an object"]
        version = params.get("protocolVersion")
        if isinstance(version, str) and version not in \
                _VALIDATOR_PROTOCOL_VERSIONS:
            return [f"Unsupported protocol version: {version}"]
        return []
    if method == "tools/call":
        if not isinstance(params, dict):
            return ["Tools call params must be an object"]
        if "name" not in params:
            return ["Tools call params must include 'name' field"]
        if not isinstance(params["name"], str):
            return ["Tool name must be a string"]
        return []
    if method == "resources/read":
        if not isinstance(params, dict):
            return ["Resources read params must be an object"]
        if "uri" not in params:
            return ["Resources read params must include 'uri' field"]
        if not isinstance(params["uri"], str):
            return ["Resource URI must be a string"]
        return []
    if method == "prompts/get":
        # reference: mcp_route_handlers.cpp handlePromptsGetRequest →
        # extractRequiredStringParam("name") (-32602 on miss)
        if not isinstance(params, dict):
            return ["Prompts get params must be an object"]
        if "name" not in params:
            return ["Prompts get params must include 'name' field"]
        if not isinstance(params["name"], str):
            return ["Prompt name must be a string"]
        return []
    if method == "logging/setLevel":
        # reference: handleLoggingSetLevelRequest — missing/non-string
        # 'level' is -32602
        if not isinstance(params, dict):
            return ["Logging setLevel params must be an object"]
        if "level" not in params:
            return ["Invalid params: missing 'level' field"]
        if not isinstance(params["level"], str):
            return ["Invalid params: 'level' must be a string"]
        return []
    if method == "completion/complete":
        # reference: handleCompletionCompleteRequest — 'ref' and
        # 'argument' required strings
        if not isinstance(params, dict):
            return ["Completion params must be an object"]
        if "ref" not in params or "argument" not in params:
            return ["Invalid params: missing 'ref' or 'argument' field"]
        if not isinstance(params["ref"], str):
            return ["Invalid params: 'ref' must be a string"]
        if not isinstance(params["argument"], str):
            return ["Invalid params: 'argument' must be a string"]
        return []
    return []  # other methods carry no param rules (reference parity)


# MCP log levels → Python logging levels (reference:
# handleLoggingSetLevelRequest maps the 8 MCP/syslog levels onto the 4
# Crow levels; the Python analogue collapses the same way)
_MCP_LOG_LEVELS = {
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "notice": logging.INFO,
    "warning": logging.WARNING,
    "error": logging.ERROR,
    "critical": logging.ERROR,
    "alert": logging.ERROR,
    "emergency": logging.ERROR,
}


def set_mcp_log_level(level: str) -> int:
    """Apply an MCP logging/setLevel request to the package logger.
    Unknown levels raise McpError (the reference's -32602 'Invalid log
    level'). Returns the applied Python level."""
    py_level = _MCP_LOG_LEVELS.get(level)
    if py_level is None:
        raise McpError(f"Invalid log level: {level}")
    logging.getLogger("flapi_spark").setLevel(py_level)
    return py_level


def validate_accept_header(accept_header: str) -> bool:
    """Streamable-HTTP transport requires BOTH application/json and
    text/event-stream in Accept (mcp_request_validator.cpp:67-77)."""
    if not accept_header:
        return False
    return (
        "application/json" in accept_header
        and "text/event-stream" in accept_header
    )


def validate_content_type(content_type: str) -> bool:
    return content_type == "application/json"


def jsonrpc_error(
    id_value, code: int, message: str, data=None
) -> dict:
    """JSON-RPC error object (reference: mcp_error_builder.cpp
    createJsonRpcError): empty/None id → JSON null; a numeric-looking
    string id is coerced to a number (the reference std::stod's it);
    `data` attaches only when provided."""
    err: dict = {"code": code, "message": message}
    if data is not None:
        err["data"] = data
    if id_value in (None, ""):
        rid = None
    elif isinstance(id_value, str) and id_value and all(
        c in "0123456789.-" for c in id_value
    ):
        try:
            f = float(id_value)
            rid = int(f) if f.is_integer() else f
        except ValueError:
            rid = id_value
    else:
        rid = id_value
    return {"jsonrpc": JSONRPC_VERSION, "id": rid, "error": err}


# --- content blocks ------------------------------------------------------
# (reference: mcp_content_types.cpp ContentBuilder / ContentResponse)

_MIME_BY_EXT = {
    "png": "image/png", "jpg": "image/jpeg", "jpeg": "image/jpeg",
    "gif": "image/gif", "webp": "image/webp", "svg": "image/svg+xml",
    "bmp": "image/bmp",
    "wav": "audio/wav", "mp3": "audio/mpeg", "ogg": "audio/ogg",
    "oga": "audio/ogg", "m4a": "audio/mp4", "aac": "audio/aac",
    "flac": "audio/flac",
    "mp4": "video/mp4", "webm": "video/webm", "mov": "video/quicktime",
    "avi": "video/x-msvideo",
    "pdf": "application/pdf", "json": "application/json",
    "xml": "application/xml", "csv": "text/csv", "txt": "text/plain",
    "html": "text/html", "htm": "text/html",
}


def detect_mime_type(filename: str) -> str:
    """Extension → MIME (reference mcp_content_types.cpp:70-112 table,
    unknown/missing extension → application/octet-stream)."""
    if "." not in filename:
        return "application/octet-stream"
    ext = filename.rsplit(".", 1)[1].lower()
    return _MIME_BY_EXT.get(ext, "application/octet-stream")


def text_content(text: str, mime_type: str | None = None) -> dict:
    out = {"type": "text", "text": text}
    if mime_type is not None:
        out["mimeType"] = mime_type
    return out


def image_content(base64_data: str, mime_type: str) -> dict:
    return {"type": "image", "data": base64_data, "mimeType": mime_type}


def audio_content(base64_data: str, mime_type: str) -> dict:
    return {"type": "audio", "data": base64_data, "mimeType": mime_type}


def resource_content(
    uri: str, mime_type: str, text: str | None = None
) -> dict:
    res = {"uri": uri, "mimeType": mime_type}
    if text is not None:
        res["text"] = text
    return {"type": "resource", "resource": res}


def embedded_file_content(uri: str, mime_type: str, content: str) -> dict:
    return {
        "type": "resource",
        "resource": {"uri": uri, "mimeType": mime_type, "text": content},
    }


class ContentResponse:
    """Accumulates content blocks into the {"content": [...]} response
    shape tools/resources return (mcp_content_types.cpp:225-249)."""

    def __init__(self):
        self._blocks: list[dict] = []

    def add_content(self, block: dict) -> None:
        self._blocks.append(block)

    def add_text(self, text: str) -> None:
        self.add_content(text_content(text))

    def add_image(self, base64_data: str, mime_type: str) -> None:
        self.add_content(image_content(base64_data, mime_type))

    def to_json(self) -> dict:
        return {"content": list(self._blocks)}


def handle_jsonrpc(
    registry: "McpRegistry",
    request: dict,
    mcp_config: dict | None = None,
    base_path: str = ".",
    session_manager: "McpSessionManager | None" = None,
    session_id: str | None = None,
    roles: list[str] | None = None,
) -> dict:
    """One-shot JSON-RPC dispatch composing the full MCP surface
    (reference: mcp_route_handlers.cpp handleJsonRpcRequest — parse/
    validate → per-method handler → uniform JSON-RPC result/error
    envelopes): initialize (session create + negotiated version +
    instructions), tools/list, tools/call, resources/list,
    resources/read, prompts/list, prompts/get, logging/setLevel,
    completion/complete, ping — the reference's full method table
    (mcp_route_handlers.cpp:662-684), so every capability initialize
    advertises is dispatchable. Transport-free — an HTTP layer dumps the returned
    dict; errors surface as JSON-RPC error objects with the
    reference's codes (validation −32600/−32602, unknown method
    −32601, handler failures −32603)."""
    rid = request.get("id")
    # envelope checks (version, method name) are INVALID_REQUEST;
    # method-specific param faults are uniformly INVALID_PARAMS —
    # decided structurally, not by matching error text
    if request.get("jsonrpc") != JSONRPC_VERSION:
        return jsonrpc_error(
            rid, INVALID_REQUEST,
            f"Invalid JSON-RPC version: {request.get('jsonrpc', '')}",
        )
    method = request.get("method") or ""
    if not _METHOD_NAME_RE.match(method):
        return jsonrpc_error(
            rid, INVALID_REQUEST, f"Invalid method name: {method}"
        )
    if validate_method_exists(method):
        return jsonrpc_error(
            rid, METHOD_NOT_FOUND, f"Method not found: {method}"
        )
    param_errors = validate_params_for_method(
        method, request.get("params")
    )
    if param_errors:
        return jsonrpc_error(rid, INVALID_PARAMS, param_errors[0])
    params = request.get("params") or {}
    try:
        if method == "initialize":
            result = build_initialize_result(
                params, mcp_config=mcp_config, base_path=base_path
            )
            if session_manager is not None:
                sid = session_manager.create_session(
                    client_version=params.get("protocolVersion", "")
                )
                result["sessionId"] = sid
            return {"jsonrpc": JSONRPC_VERSION, "id": rid,
                    "result": result}
        if session_manager is not None and method != "ping":
            # non-initialize on a session-managed server: the session
            # must be live (mcp_session_manager.cpp expiry semantics).
            # ping is exempt — it is the transport liveness probe and
            # may precede initialize (reference handlePingRequest has
            # no session dependency)
            if session_id is None or not session_manager.is_session_valid(
                session_id
            ):
                return jsonrpc_error(
                    rid, INVALID_REQUEST, "Invalid or expired session"
                )
            session_manager.update_session_activity(session_id)
        if method == "tools/list":
            return {"jsonrpc": JSONRPC_VERSION, "id": rid,
                    "result": {"tools": registry.list_tools(roles=roles)}}
        if method == "tools/call":
            out = registry.call_tool(
                params["name"], params.get("arguments"), roles=roles
            )
            return {"jsonrpc": JSONRPC_VERSION, "id": rid, "result": out}
        if method == "resources/list":
            return {
                "jsonrpc": JSONRPC_VERSION, "id": rid,
                "result": {"resources": registry.list_resources()},
            }
        if method == "prompts/list":
            return {
                "jsonrpc": JSONRPC_VERSION, "id": rid,
                "result": {"prompts": registry.list_prompts()},
            }
        if method == "prompts/get":
            out = registry.get_prompt(
                params["name"], params.get("arguments")
            )
            return {"jsonrpc": JSONRPC_VERSION, "id": rid, "result": out}
        if method == "ping":
            # empty-object result per MCP spec (reference:
            # handlePingRequest)
            return {"jsonrpc": JSONRPC_VERSION, "id": rid, "result": {}}
        if method == "logging/setLevel":
            set_mcp_log_level(params["level"])
            return {"jsonrpc": JSONRPC_VERSION, "id": rid, "result": {}}
        if method == "completion/complete":
            # non-string 'value' (e.g. the number 42) is IGNORED, not
            # coerced to "42" — reference mcp_route_handlers.cpp:1311-
            # 1316 only extracts the prefix when the param is a string
            raw_value = params.get("value")
            out = registry.complete(
                params["ref"], params["argument"],
                raw_value if isinstance(raw_value, str) else "",
            )
            return {"jsonrpc": JSONRPC_VERSION, "id": rid, "result": out}
        if method == "resources/read":
            uri = params["uri"]
            name = uri.split("://", 1)[1] if "://" in uri else uri
            out = registry.read_resource(name, roles=roles)
            # MCP resources/read result shape: {"contents": [...]} of
            # content blocks — the registry hands back negotiated BYTES
            # (results.negotiate), which must become JSON-serializable
            # text here, not leak into the envelope
            body = out.get("content", b"")
            if isinstance(body, (bytes, bytearray)):
                body = bytes(body).decode("utf-8", errors="replace")
            block = resource_content(
                uri, out.get("mimeType", "application/json"), text=body
            )
            return {
                "jsonrpc": JSONRPC_VERSION, "id": rid,
                "result": {"contents": [block]},
            }
        raise McpError(f"unhandled method {method}")  # pragma: no cover
    except AuthorizationError as exc:
        return jsonrpc_error(rid, INVALID_REQUEST, str(exc))
    except RateLimitError as exc:
        return jsonrpc_error(rid, INVALID_REQUEST, str(exc))
    except McpError as exc:
        return jsonrpc_error(rid, INVALID_PARAMS, str(exc))
    except Exception as exc:  # handler failure → internal error
        return jsonrpc_error(rid, INTERNAL_ERROR, str(exc))


def register_endpoints(
    registry: "McpRegistry", endpoints: list[EndpointConfig]
) -> dict:
    """Walk a project's endpoint configs and register every declared
    MCP surface from its ``mcp-tool`` / ``mcp-resource`` /
    ``mcp-prompt`` block (reference: endpoint_config_parser.cpp:76-78
    detects the blocks; mcp_server.cpp builds the tool/resource/prompt
    registries from them at startup). Returns counts per surface. An
    endpoint may declare several surfaces (dual endpoints — the
    EndpointRepository semantics); endpoints without any mcp-* block
    are skipped."""
    counts = {"tools": 0, "resources": 0, "prompts": 0}
    for ep in endpoints:
        tool = ep.mcp_tool
        if isinstance(tool, dict) and tool.get("name"):
            registry.register(
                tool["name"], ep,
                description=tool.get("description", ""),
                allowed_roles=tool.get("allowed-roles"),
            )
            counts["tools"] += 1
        res = ep.mcp_resource
        if isinstance(res, dict) and res.get("name"):
            registry.register_resource(
                res["name"], ep,
                description=res.get("description", ""),
                mime_type=res.get(
                    "mime-type", res.get("content-type", "application/json")
                ),
                allowed_roles=res.get("allowed-roles"),
            )
            counts["resources"] += 1
        pr = ep.mcp_prompt
        if isinstance(pr, dict) and pr.get("name"):
            registry.register_prompt(
                Prompt.from_dict(pr, request_fields=ep.request_fields)
            )
            counts["prompts"] += 1
    return counts
