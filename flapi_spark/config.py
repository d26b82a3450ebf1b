"""Endpoint & connection configuration model.

Parity with the reference's YAML config layer (reference:
src/endpoint_config_parser.cpp, config_manager.cpp,
extended_yaml_parser.cpp): endpoint YAMLs with ``url-path``,
``request:`` field definitions, ``template-source``, ``connection:``,
``cache:``, ``with-pagination``, auth / rate-limit / heartbeat blocks,
``{{include:section from other.yaml}}`` composition and ``{{env.X}}``
expansion inside scalar values.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml

from flapi_spark.validation import RequestField

_INCLUDE_RE = re.compile(
    r"^\s*\{\{\s*include:\s*(?P<section>[\w\-]+)\s+from\s+(?P<file>[^\s}]+)"
    r"(?:\s+if\s+env\.(?P<cond>\w+))?\s*\}\}\s*$"
)
# whole-file form: {{include from file.yaml}} [if env.X]
_INCLUDE_FILE_RE = re.compile(
    r"^\s*\{\{\s*include\s+from\s+(?P<file>[^\s}]+)"
    r"(?:\s+if\s+env\.(?P<cond>\w+))?\s*\}\}\s*$"
)
_ENV_RE = re.compile(r"\{\{\s*env\.(?P<name>\w+)\s*\}\}")


def _expand_env(value: Any, env: dict | None = None) -> Any:
    environ = env if env is not None else os.environ
    if isinstance(value, str):
        return _ENV_RE.sub(lambda m: str(environ.get(m.group("name"), "")), value)
    if isinstance(value, list):
        return [_expand_env(v, env) for v in value]
    if isinstance(value, dict):
        return {k: _expand_env(v, env) for k, v in value.items()}
    return value


def _cond_enabled(name: str | None, env: dict | None) -> bool:
    """``if env.X`` include condition: truthy when X is set non-empty
    (the reference treats an empty string as false)."""
    if name is None:
        return True
    environ = env if env is not None else os.environ
    return bool(environ.get(name))


def _resolve_includes(
    text: str,
    base_dir: Path,
    env: dict | None = None,
    _stack: tuple[str, ...] = (),
) -> str:
    """Expand include directives by splicing referenced YAML
    (reference: extended_yaml_parser.cpp + its test suite):

    - ``{{include:section from file.yaml}}`` — the named top-level
      section only;
    - ``{{include from file.yaml}}`` — the whole document;
    - either form with `` if env.X`` — conditional include, skipped
      when X is unset/empty;
    - circular include chains raise (a.yaml → b.yaml → a.yaml),
      matching the reference's circular-dependency detection."""
    out_lines = []
    for line in text.splitlines():
        m = _INCLUDE_RE.match(line)
        mf = None if m else _INCLUDE_FILE_RE.match(line)
        if not m and not mf:
            out_lines.append(line)
            continue
        matched = m or mf
        if not _cond_enabled(matched.group("cond"), env):
            continue
        fname = matched.group("file")
        from flapi_spark.paths import PathValidator

        inc_path = Path(PathValidator().validate(fname, base_dir))
        key = str(inc_path.resolve())
        if key in _stack:
            chain = " -> ".join([*_stack, key])
            raise ValueError(f"Circular dependency in includes: {chain}")
        with open(inc_path) as fh:
            inc_doc = yaml.safe_load(
                _resolve_includes(
                    fh.read(), inc_path.parent, env, (*_stack, key)
                )
            )
        if m:
            section = m.group("section")
            if not isinstance(inc_doc, dict) or section not in inc_doc:
                raise KeyError(
                    f"include section '{section}' not found in {inc_path}"
                )
            snippet = yaml.safe_dump({section: inc_doc[section]}, sort_keys=False)
        else:
            if not isinstance(inc_doc, dict):
                raise ValueError(f"whole-file include is not a mapping: {inc_path}")
            snippet = yaml.safe_dump(inc_doc, sort_keys=False)
        out_lines.append(snippet.rstrip("\n"))
    return "\n".join(out_lines)


@dataclass
class CacheConfig:
    enabled: bool = False
    table: str = ""
    schema: str = "main"
    schedule: str | None = None
    primary_key: list[str] = field(default_factory=list)
    cursor_column: str | None = None
    cursor_type: str | None = None
    template_file: str | None = None
    keep_last_snapshots: int | None = None
    max_snapshot_age: str | None = None
    # write-endpoint interplay (reference: config_manager.hpp
    # invalidate_on_write / refresh_on_write)
    invalidate_on_write: bool = False
    refresh_on_write: bool = False

    @classmethod
    def from_dict(cls, d: dict | None) -> "CacheConfig":
        if not d:
            return cls()
        cursor = d.get("cursor") or {}
        retention = d.get("retention") or {}
        return cls(
            enabled=bool(d.get("enabled", False)),
            table=d.get("table", ""),
            schema=d.get("schema", "main"),
            schedule=d.get("schedule"),
            primary_key=list(d.get("primary-key", d.get("primary_key", []) or [])),
            cursor_column=cursor.get("column"),
            cursor_type=cursor.get("type"),
            template_file=d.get("template-file", d.get("template_file")),
            keep_last_snapshots=retention.get("keep-last-snapshots"),
            max_snapshot_age=retention.get("max-snapshot-age"),
            invalidate_on_write=bool(
                d.get("invalidate-on-write", d.get("invalidate_on_write", False))
            ),
            refresh_on_write=bool(
                d.get("refresh-on-write", d.get("refresh_on_write", False))
            ),
        )


@dataclass
class OperationConfig:
    """Operation block (reference: config_manager.hpp OperationConfig +
    endpoint_config_parser.cpp:369-404): writes are auto-detected from
    POST/PUT/PATCH/DELETE methods and overridable via `operation:`."""

    type: str = "read"  # read | write
    returns_data: bool = False
    transaction: bool = True
    validate_before_write: bool = True

    @classmethod
    def from_dict(cls, d: dict | None) -> "OperationConfig":
        if not d:
            return cls()
        t = str(d.get("type", "read")).lower()
        if t not in ("read", "write"):
            raise ValueError(f"operation.type must be read|write, got {t!r}")
        return cls(
            type=t,
            returns_data=bool(d.get("returns-data", d.get("returns_data", False))),
            transaction=bool(d.get("transaction", True)),
            validate_before_write=bool(
                d.get("validate-before-write", d.get("validate_before_write", True))
            ),
        )


@dataclass
class ShapeConfig:
    """Response shaping (reference: mcp_response_shaper.cpp)."""

    max_rows: int | None = None
    redact_columns: list[str] = field(default_factory=list)
    sample: int | None = None
    # column -> strategy ('hash' | 'partial' | 'null'): masking keeps
    # the column present but de-identified, where redact drops it
    mask_columns: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict | None) -> "ShapeConfig":
        if not d:
            return cls()
        return cls(
            max_rows=d.get("max-rows", d.get("max_rows")),
            redact_columns=list(d.get("redact-columns", d.get("redact_columns", []) or [])),
            sample=d.get("sample"),
            mask_columns=dict(
                d.get("mask-columns", d.get("mask_columns")) or {}
            ),
        )


def _operation_with_method_default(d: dict) -> OperationConfig:
    """Auto-detect write from the HTTP method (reference:
    endpoint_config_parser.cpp:150-156 — POST/PUT/PATCH imply write;
    DELETE added for the write-examples' delete-order endpoint), then
    let an explicit operation block override."""
    op = OperationConfig.from_dict(d.get("operation"))
    if "operation" not in d or "type" not in (d.get("operation") or {}):
        if str(d.get("method", "GET")).upper() in ("POST", "PUT", "PATCH",
                                                   "DELETE"):
            op.type = "write"
    return op


@dataclass
class EndpointConfig:
    url_path: str = ""
    request_fields: list[RequestField] = field(default_factory=list)
    template_source: str = ""
    template_text: str | None = None
    connections: list[str] = field(default_factory=list)
    with_pagination: bool = True
    cache: CacheConfig = field(default_factory=CacheConfig)
    shape: ShapeConfig = field(default_factory=ShapeConfig)
    auth: dict = field(default_factory=dict)
    rate_limit: dict = field(default_factory=dict)
    heartbeat: dict = field(default_factory=dict)
    allowed_roles: list[str] = field(default_factory=list)
    description: str = ""
    # 'duckdb' opts the template into dialect translation
    # (flapi_spark/dialect.py) — migrated reference templates run
    # unchanged; default empty = template is already Spark SQL
    template_dialect: str = ""
    # columns whose string values are JSON documents to embed as
    # nested objects in responses (reference issue #38: DuckDB's JSON
    # logical-type alias — no Spark analogue, so the endpoint declares
    # them)
    json_columns: list[str] = field(default_factory=list)
    # MCP surface blocks (reference endpoint_config_parser.cpp:76-78,
    # 163-166: an endpoint may be a REST route, an MCP tool/resource/
    # prompt, or BOTH — the repository registers each surface
    # independently)
    mcp_tool: dict | None = None
    mcp_resource: dict | None = None
    mcp_prompt: dict | None = None
    method: str = "GET"
    operation: OperationConfig = field(default_factory=OperationConfig)
    base_dir: Path | None = None

    @property
    def is_write(self) -> bool:
        return self.operation.type == "write"

    @classmethod
    def from_dict(cls, d: dict, base_dir: Path | None = None) -> "EndpointConfig":
        conns = d.get("connection", []) or []
        if isinstance(conns, str):
            conns = [conns]
        return cls(
            url_path=d.get("url-path", d.get("url_path", "")),
            request_fields=[RequestField.from_dict(f) for f in d.get("request", []) or []],
            template_source=d.get("template-source", d.get("template_source", "")),
            template_text=d.get("template-text", d.get("template_text")),
            connections=list(conns),
            with_pagination=bool(d.get("with-pagination", d.get("with_pagination", True))),
            cache=CacheConfig.from_dict(d.get("cache")),
            shape=ShapeConfig.from_dict(d.get("shape") or d.get("response-shape")),
            auth=d.get("auth") or {},
            rate_limit=d.get("rate-limit") or {},
            heartbeat=d.get("heartbeat") or {},
            allowed_roles=list(d.get("allowed-roles", []) or []),
            description=d.get("description", ""),
            template_dialect=d.get(
                "template-dialect", d.get("template_dialect", "")
            ),
            json_columns=list(
                d.get("json-columns", d.get("json_columns", [])) or []
            ),
            mcp_tool=d.get("mcp-tool", d.get("mcp_tool")),
            mcp_resource=d.get("mcp-resource", d.get("mcp_resource")),
            mcp_prompt=d.get("mcp-prompt", d.get("mcp_prompt")),
            method=str(d.get("method", "GET")).upper(),
            operation=_operation_with_method_default(d),
            base_dir=base_dir,
        )

    def load_template(self, provider=None) -> str:
        """Template text; `provider` (a vfs file provider, e.g.
        vfs.CachingFileProvider over remote schemes) intercepts
        remote `template-source` paths — the reference's caching VFS
        layer (caching_file_provider.cpp) serving s3://-hosted
        templates without a refetch per request."""
        if self.template_text is not None:
            return self.template_text
        if not self.template_source:
            raise ValueError(f"endpoint {self.url_path}: no template")
        from flapi_spark.vfs import is_remote_path

        if (
            provider is not None
            and getattr(provider, "serves_local", False)
            and not is_remote_path(self.template_source)
        ):
            # a self-contained provider (vfs.ArchiveFileProvider —
            # templates live INSIDE the bundle, not on the local fs)
            # intercepts archive-relative paths; REMOTE template
            # sources (s3://…) still take the remote branch below —
            # an archive can never serve them
            return provider.read_file(self.template_source)
        if is_remote_path(self.template_source):
            if provider is None:
                raise ValueError(
                    f"endpoint {self.url_path}: remote template-source"
                    f" {self.template_source!r} needs a file provider"
                    " (vfs.CachingFileProvider)"
                )
            return provider.read_file(self.template_source)
        path = Path(self.template_source)
        if not path.is_absolute() and self.base_dir is not None:
            # config-supplied relative template paths must stay inside
            # the config tree (reference: path_validator.cpp traversal
            # + allowed-prefix checks; symlinks resolved)
            from flapi_spark.paths import PathValidator

            path = Path(
                PathValidator().validate(self.template_source, self.base_dir)
            )
        return path.read_text()


def load_endpoint_yaml(path: str | Path, env: dict | None = None) -> EndpointConfig:
    path = Path(path)
    text = _resolve_includes(path.read_text(), path.parent)
    doc = yaml.safe_load(text) or {}
    doc = _expand_env(doc, env)
    return EndpointConfig.from_dict(doc, base_dir=path.parent)


def load_endpoints_dir(dir_path: str | Path, env: dict | None = None) -> list[EndpointConfig]:
    """Load every endpoint YAML under a directory tree (a YAML counts as
    an endpoint if it has url-path), mirroring the reference's template
    directory scan."""
    out = []
    for p in sorted(Path(dir_path).rglob("*.yaml")):
        try:
            doc = yaml.safe_load(_resolve_includes(p.read_text(), p.parent)) or {}
        except Exception:
            continue
        if isinstance(doc, dict) and ("url-path" in doc or "url_path" in doc):
            out.append(EndpointConfig.from_dict(_expand_env(doc, env), base_dir=p.parent))
    return out


# --- serialization (reference: config_serializer.cpp
#     serializeEndpointConfigToYaml / deserialize; vectors in
#     test/cpp/test_config_serializer.cpp) -------------------------------


def serialize_endpoint_to_dict(ep: "EndpointConfig") -> dict:
    """EndpointConfig → the reference-spelled YAML document shape,
    round-trip-faithful: EndpointConfig.from_dict(serialize(ep))
    reproduces the config (defaults are omitted so the emitted YAML
    stays minimal, like the reference serializer)."""
    d: dict = {}
    if ep.url_path:
        d["url-path"] = ep.url_path
    if ep.method != "GET":
        d["method"] = ep.method
    if ep.template_source:
        d["template-source"] = ep.template_source
    if ep.template_text is not None:
        d["template-text"] = ep.template_text
    if ep.connections:
        d["connection"] = list(ep.connections)
    if ep.description:
        d["description"] = ep.description
    if not ep.with_pagination:
        d["with-pagination"] = False
    if ep.template_dialect:
        d["template-dialect"] = ep.template_dialect
    if ep.json_columns:
        d["json-columns"] = list(ep.json_columns)
    if ep.allowed_roles:
        d["allowed-roles"] = list(ep.allowed_roles)
    if ep.auth:
        d["auth"] = dict(ep.auth)
    if ep.rate_limit:
        d["rate-limit"] = dict(ep.rate_limit)
    if ep.heartbeat:
        d["heartbeat"] = dict(ep.heartbeat)
    for key, block in (("mcp-tool", ep.mcp_tool),
                       ("mcp-resource", ep.mcp_resource),
                       ("mcp-prompt", ep.mcp_prompt)):
        if block is not None:
            d[key] = dict(block)

    if ep.request_fields:
        fields = []
        for f in ep.request_fields:
            fd: dict = {"field-name": f.field_name}
            if f.field_in != "query":
                fd["field-in"] = f.field_in
            if f.description:
                fd["description"] = f.description
            if f.required:
                fd["required"] = True
            if f.default is not None:
                fd["default"] = f.default
            if f.validators:
                vs = []
                for v in f.validators:
                    vd: dict = {"type": v.type}
                    if v.min is not None:
                        vd["min"] = v.min
                    if v.max is not None:
                        vd["max"] = v.max
                    if v.regex:
                        vd["regex"] = v.regex
                    if v.allowed_values:
                        vd["allowedValues"] = list(v.allowed_values)
                    if v.case_insensitive:
                        vd["caseInsensitive"] = True
                    if v.prevent_sql_injection:
                        vd["preventSqlInjection"] = True
                    vs.append(vd)
                fd["validators"] = vs
            fields.append(fd)
        d["request"] = fields

    c = ep.cache
    if c.enabled or c.table:
        cd: dict = {"enabled": c.enabled, "table": c.table}
        if c.schema != "main":
            cd["schema"] = c.schema
        if c.schedule:
            cd["schedule"] = c.schedule
        if c.primary_key:
            cd["primary-key"] = list(c.primary_key)
        if c.cursor_column or c.cursor_type:
            cd["cursor"] = {
                k: v for k, v in (("column", c.cursor_column),
                                  ("type", c.cursor_type)) if v
            }
        if c.template_file:
            cd["template-file"] = c.template_file
        if c.keep_last_snapshots is not None or c.max_snapshot_age:
            cd["retention"] = {
                k: v for k, v in (
                    ("keep-last-snapshots", c.keep_last_snapshots),
                    ("max-snapshot-age", c.max_snapshot_age),
                ) if v is not None
            }
        if c.invalidate_on_write:
            cd["invalidate-on-write"] = True
        if c.refresh_on_write:
            cd["refresh-on-write"] = True
        d["cache"] = cd

    op = ep.operation
    implied_write = ep.method in ("POST", "PUT", "PATCH", "DELETE")
    if (op.type == "write") != implied_write or op.returns_data \
            or not op.transaction or not op.validate_before_write:
        od: dict = {"type": op.type}
        if op.returns_data:
            od["returns-data"] = True
        if not op.transaction:
            od["transaction"] = False
        if not op.validate_before_write:
            od["validate-before-write"] = False
        d["operation"] = od

    s = ep.shape
    if s.max_rows is not None or s.redact_columns or s.sample is not None \
            or s.mask_columns:
        sd: dict = {}
        if s.max_rows is not None:
            sd["max-rows"] = s.max_rows
        if s.redact_columns:
            sd["redact-columns"] = list(s.redact_columns)
        if s.sample is not None:
            sd["sample"] = s.sample
        if s.mask_columns:
            sd["mask-columns"] = dict(s.mask_columns)
        d["shape"] = sd
    return d


def serialize_endpoint_to_yaml(ep: "EndpointConfig") -> str:
    return yaml.safe_dump(
        serialize_endpoint_to_dict(ep), sort_keys=False
    )
