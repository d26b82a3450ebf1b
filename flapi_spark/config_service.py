"""Config service: token-gated CRUD + hot-reload over endpoint configs.

Parity with the reference's config service semantics (reference:
src/config_service.cpp routes /api/v1/_config/*, src/path_utils.cpp
slug algorithm, test/cpp/config_service_*.cpp): list/create/get/
update/delete endpoint configurations addressed by SLUG, validate a
config without applying it, reload one endpoint from disk, project
config get/update, and environment-variable listing. HTTP transport is
out of scope (SURVEY §1) — the operations and their authorization
gate are the library surface.

Hot-reload goes beyond the reference's explicit reload route:
``reload_if_changed`` rescans the config directory and picks up
edited / added / deleted YAMLs by mtime — the "config hot-reload"
capability a long-running Spark service needs, since unlike the
reference binary it cannot cheaply restart to re-read configs.
"""

from __future__ import annotations

import re
from pathlib import Path

import yaml

from flapi_spark.auth import AuthError
from flapi_spark.config import EndpointConfig, load_endpoint_yaml
from flapi_spark.config_validator import ValidationResult, validate_endpoint

EMPTY_SLUG = "empty"


def path_to_slug(path: str) -> str:
    """URL path → filesystem/route-safe slug (reference:
    path_utils.cpp:pathToSlug — '/customers/' → 'customers-slash')."""
    if not path:
        return EMPTY_SLUG
    slug = path[1:] if path.startswith("/") else path
    trailing = slug.endswith("/")
    if trailing:
        slug = slug[:-1]
    slug = slug.replace("/", "-")
    slug = re.sub(r"[^a-zA-Z0-9\-_]", "-", slug)
    slug = re.sub(r"-+", "-", slug).strip("-")
    if trailing:
        slug += "-slash"
    return slug or EMPTY_SLUG


def slug_to_path(slug: str) -> str:
    """Slug → URL path (reference: path_utils.cpp:slugToPath)."""
    if slug == EMPTY_SLUG:
        return ""
    path = slug
    trailing = path.endswith("-slash")
    if trailing:
        path = path[: -len("-slash")]
    path = path.replace("-", "/")
    if path:
        path = "/" + path
    if trailing:
        path += "/"
    return path


class ConfigServiceError(RuntimeError):
    pass


class EndpointNotFound(ConfigServiceError):
    pass


class ConfigService:
    """CRUD + reload over a directory of endpoint YAMLs.

    `token`: when set, every operation requires it (the reference's
    validateToken gate — 401 on mismatch, fail-closed)."""

    def __init__(
        self,
        config_dir: str | Path,
        env: dict | None = None,
        token: str | None = None,
    ):
        self.config_dir = Path(config_dir)
        self.config_dir.mkdir(parents=True, exist_ok=True)
        self.env = env
        if token is None:
            # CLI token > FLAPI_CONFIG_SERVICE_TOKEN env (reference
            # main.cpp:504-509); an unset env leaves the gate open
            # exactly like the reference's empty-token path
            import os

            src = env if env is not None else os.environ
            token = src.get("FLAPI_CONFIG_SERVICE_TOKEN") or None
        self.token = token
        # url_path -> (EndpointConfig, source file, mtime at load)
        self._endpoints: dict[str, tuple[EndpointConfig, Path, float]] = {}
        self._scan()

    # --- auth gate ----------------------------------------------------------

    def _check(self, token: str | None) -> None:
        if self.token is not None and token != self.token:
            raise AuthError("config service: invalid or missing token")

    # --- disk scan ----------------------------------------------------------

    def _is_endpoint_doc(self, doc) -> bool:
        return isinstance(doc, dict) and ("url-path" in doc or "url_path" in doc)

    def _scan(self) -> None:
        self._endpoints.clear()
        for p in sorted(self.config_dir.rglob("*.yaml")):
            try:
                doc = yaml.safe_load(p.read_text()) or {}
            except Exception:
                continue
            if self._is_endpoint_doc(doc):
                ep = load_endpoint_yaml(p, env=self.env)
                self._endpoints[ep.url_path] = (ep, p, p.stat().st_mtime)

    # --- lookup -------------------------------------------------------------

    def _by_slug(self, slug: str) -> tuple[EndpointConfig, Path, float]:
        for url_path, entry in self._endpoints.items():
            if path_to_slug(url_path) == slug:
                return entry
        raise EndpointNotFound(f"no endpoint with slug {slug!r}")

    def list_endpoints(self, token: str | None = None) -> list[dict]:
        self._check(token)
        return [
            {
                "slug": path_to_slug(url_path),
                "url-path": url_path,
                "description": ep.description,
                "source": str(src),
            }
            for url_path, (ep, src, _) in sorted(self._endpoints.items())
        ]

    def get_endpoint(self, slug: str, token: str | None = None) -> EndpointConfig:
        self._check(token)
        return self._by_slug(slug)[0]

    # --- mutation -----------------------------------------------------------

    def validate(self, doc: dict, token: str | None = None) -> ValidationResult:
        """Validate a config document without applying it (the
        reference's /validate route)."""
        self._check(token)
        return validate_endpoint(EndpointConfig.from_dict(doc))

    def create_endpoint(self, doc: dict, token: str | None = None) -> str:
        self._check(token)
        ep = EndpointConfig.from_dict(doc)
        res = validate_endpoint(ep)
        if not res.valid:
            raise ConfigServiceError(f"invalid endpoint config: {res.errors}")
        if ep.url_path in self._endpoints:
            raise ConfigServiceError(f"endpoint {ep.url_path!r} already exists")
        slug = path_to_slug(ep.url_path)
        out = self.config_dir / f"{slug}.yaml"
        out.write_text(yaml.safe_dump(doc, sort_keys=False))
        ep = load_endpoint_yaml(out, env=self.env)
        self._endpoints[ep.url_path] = (ep, out, out.stat().st_mtime)
        return slug

    def update_endpoint(self, slug: str, doc: dict, token: str | None = None) -> None:
        self._check(token)
        _, src, _ = self._by_slug(slug)
        ep = EndpointConfig.from_dict(doc)
        res = validate_endpoint(ep)
        if not res.valid:
            raise ConfigServiceError(f"invalid endpoint config: {res.errors}")
        old_path = next(
            up for up, (e, s, m) in self._endpoints.items() if s == src
        )
        src.write_text(yaml.safe_dump(doc, sort_keys=False))
        del self._endpoints[old_path]
        ep = load_endpoint_yaml(src, env=self.env)
        self._endpoints[ep.url_path] = (ep, src, src.stat().st_mtime)

    def delete_endpoint(self, slug: str, token: str | None = None) -> None:
        self._check(token)
        _, src, _ = self._by_slug(slug)
        url_path = next(
            up for up, (e, s, m) in self._endpoints.items() if s == src
        )
        src.unlink(missing_ok=True)
        del self._endpoints[url_path]

    # --- reload -------------------------------------------------------------

    def reload_endpoint(self, slug: str, token: str | None = None) -> EndpointConfig:
        """Re-read one endpoint's YAML from disk (the reference's
        /reload route)."""
        self._check(token)
        _, src, _ = self._by_slug(slug)
        url_path = next(
            up for up, (e, s, m) in self._endpoints.items() if s == src
        )
        ep = load_endpoint_yaml(src, env=self.env)
        del self._endpoints[url_path]
        self._endpoints[ep.url_path] = (ep, src, src.stat().st_mtime)
        return ep

    def reload_if_changed(self, token: str | None = None) -> list[str]:
        """Hot-reload: rescan the directory; reload endpoints whose file
        mtime moved, pick up new files, drop deleted ones. Returns the
        affected url-paths."""
        self._check(token)
        changed: list[str] = []
        seen_files: dict[Path, float] = {}
        for p in sorted(self.config_dir.rglob("*.yaml")):
            try:
                doc = yaml.safe_load(p.read_text()) or {}
            except Exception:
                continue
            if self._is_endpoint_doc(doc):
                seen_files[p] = p.stat().st_mtime
        known = {src: (up, mtime) for up, (ep, src, mtime) in self._endpoints.items()}
        for p, mtime in seen_files.items():
            if p not in known:
                ep = load_endpoint_yaml(p, env=self.env)
                self._endpoints[ep.url_path] = (ep, p, mtime)
                changed.append(ep.url_path)
            elif mtime > known[p][1]:
                old_path = known[p][0]
                ep = load_endpoint_yaml(p, env=self.env)
                del self._endpoints[old_path]
                self._endpoints[ep.url_path] = (ep, p, mtime)
                changed.append(ep.url_path)
        for p, (old_path, _) in known.items():
            if p not in seen_files:
                del self._endpoints[old_path]
                changed.append(old_path)
        return changed

    # --- project config + environment ---------------------------------------

    def project_config(self, token: str | None = None) -> dict:
        self._check(token)
        p = self.config_dir / "flapi.yaml"
        if not p.exists():
            return {}
        return yaml.safe_load(p.read_text()) or {}

    def update_project_config(self, doc: dict, token: str | None = None) -> None:
        self._check(token)
        (self.config_dir / "flapi.yaml").write_text(
            yaml.safe_dump(doc, sort_keys=False)
        )

    def environment_variables(self, token: str | None = None) -> dict[str, str]:
        """The env the template engine resolves {{env.*}} against
        (reference: /environment-variables route)."""
        self._check(token)
        import os

        return dict(self.env if self.env is not None else os.environ)

    # --- cache audit (reference: config_service.cpp AuditLogHandler,
    #     routes /api/v1/_config/cache/audit and
    #     /_config/endpoints/<slug>/cache/audit;
    #     test_ducklake_scheduler.py vectors) --------------------------------

    def attach_cache_manager(self, cache_manager) -> None:
        """Wire the CacheManager whose sync_events log backs the audit
        surface (the reference reads the DuckLake catalog's audit
        table; the repo's analogue is the manager's JSONL log)."""
        self._cache_manager = cache_manager

    def cache_audit(
        self, slug: str | None = None, token: str | None = None
    ) -> list[dict]:
        """All cache audit entries, newest first — or one endpoint's
        when `slug` names it. Mirrors the reference's failure modes:
        unknown endpoint raises KeyError (404), an endpoint without
        caching raises ValueError (400), no cache manager wired raises
        ValueError (the DuckLake-disabled 400)."""
        self._check(token)
        mgr = getattr(self, "_cache_manager", None)
        if mgr is None:
            raise ValueError("cache audit: no cache manager attached")
        events = list(reversed(mgr.sync_events()))
        if slug is None:
            return events
        ep, _path, _mtime = self._by_slug(slug)
        if not ep.cache.enabled:
            raise ValueError("cache not enabled for this endpoint")
        table = ep.cache.table
        return [e for e in events if e.get("table") == table]


def schema_info(
    spark,
    registry=None,
    tables: bool = False,
    connections: bool = False,
    fmt: str | None = None,
    connection: str | None = None,
) -> dict:
    """Catalog introspection for the config service's /schema route
    (reference: config_service.cpp /api/v1/_config/schema +
    test_config_service_schema.py): the full schemas → tables →
    columns hierarchy by default, a flat table list with
    ``tables=True``, the connection names with ``connections=True``,
    the editor-completion shape with ``fmt='completion'``, and a
    single connection's view schema with ``connection=``. Spark-first:
    the source of truth is the session catalog (databases, tables,
    temp views) instead of an embedded DuckDB instance."""
    if connections:
        return {
            "connections": sorted(registry.names()) if registry else []
        }
    if connection is not None:
        if registry is None or connection not in registry:
            raise EndpointNotFound(f"unknown connection {connection!r}")
        conn = registry.get(connection)
        view = conn.register_view(spark)
        cols = {
            f.name: f.dataType.simpleString()
            for f in spark.table(view).schema.fields
        }
        return {connection: {"tables": {view: {"columns": cols}}}}

    all_tables = []
    for db in spark.catalog.listDatabases():
        for t in spark.catalog.listTables(db.name):
            all_tables.append((t.database or db.name, t.name))
    # global/local temp views surface with a None database
    for t in spark.catalog.listTables():
        if t.database is None and ("", t.name) not in all_tables:
            all_tables.append(("", t.name))

    if tables:
        return {
            "tables": [
                {"name": name, "schema": db} for db, name in sorted(all_tables)
            ]
        }
    if fmt == "completion":
        names, cols = [], set()
        for db, name in sorted(all_tables):
            names.append(name)
            try:
                for c in spark.catalog.listColumns(
                    name, dbName=db or None
                ):
                    cols.add(c.name)
            except Exception:
                continue
        return {"tables": names, "columns": sorted(cols)}

    out: dict = {}
    for db, name in sorted(all_tables):
        try:
            cols = {
                c.name: c.dataType
                for c in spark.catalog.listColumns(name, dbName=db or None)
            }
        except Exception:
            continue
        out.setdefault(db or "temp", {"tables": {}})["tables"][name] = {
            "columns": cols
        }
    return out


# --- template lookup + endpoint parameters (reference:
#     config_service.cpp EndpointConfigHandler.findEndpointsByTemplate /
#     getEndpointParameters; vectors in
#     config_service_template_lookup_test.cpp and
#     config_service_parameters_test.cpp) ---------------------------------


def _endpoint_surface_type(ep: EndpointConfig) -> str:
    rest = bool(ep.url_path)
    mcp = bool(
        (isinstance(ep.mcp_tool, dict) and ep.mcp_tool.get("name"))
        or (isinstance(ep.mcp_resource, dict) and ep.mcp_resource.get("name"))
        or (isinstance(ep.mcp_prompt, dict) and ep.mcp_prompt.get("name"))
    )
    if rest and mcp:
        return "REST+MCP"
    if mcp:
        return "MCP"
    return "REST"


def find_endpoints_by_template(
    endpoints: list[EndpointConfig], template_path: str
) -> dict:
    """Which endpoints would a template edit affect? Matches on the
    template-source path with normalization (exact, basename, or
    suffix match — the reference normalizes ./-prefixed and
    dir-qualified spellings). Returns the reference's response shape:
    {"count": n, "endpoints": [{url_path, method, type,
    template_source}, …]}."""
    import os

    def norm(p: str) -> str:
        # normpath already collapses the ./ prefix; a str.lstrip("./")
        # would strip CHARACTERS (mangling names like "..foo")
        return os.path.normpath(str(p))

    want = norm(template_path)
    hits = []
    for ep in endpoints:
        src = norm(ep.template_source) if ep.template_source else ""
        if not src:
            continue
        if (
            src == want
            or os.path.basename(src) == os.path.basename(want)
            and (src.endswith(want) or want.endswith(src))
        ):
            hits.append({
                "url_path": ep.url_path,
                "method": ep.method,
                "type": _endpoint_surface_type(ep),
                "template_source": ep.template_source,
            })
    return {"count": len(hits), "endpoints": hits}


def endpoint_parameters(ep: EndpointConfig) -> dict:
    """The /parameters response shape: endpoint metadata plus one
    entry per request field with its validator constraints spelled
    out (config_service_parameters_test.cpp)."""
    params = []
    for f in ep.request_fields:
        entry: dict = {
            "name": f.field_name,
            "in": f.field_in,
            "description": f.description,
            "required": f.required,
        }
        if f.default is not None:
            entry["default"] = f.default
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
            if v.prevent_sql_injection:
                vd["preventSqlInjection"] = True
            vs.append(vd)
        entry["validators"] = vs
        params.append(entry)
    return {
        "endpoint": ep.url_path,
        "method": ep.method,
        "parameters": params,
    }


def filesystem_structure(
    config_dir: str | Path, config_file: str = "flapi.yaml"
) -> dict:
    """The config tree the admin UI renders (reference:
    config_service.cpp getFilesystemStructure, vectors in
    config_service_filesystem_test.cpp): a recursive, sorted tree
    (directories before files, alphabetical within each kind) where
    every YAML is classified — `endpoint` (carries url_path +
    template_source + cache_template_source when cached), `project`
    (the flapi.yaml), `shared` (any other mapping) — and .sql files
    appear as plain template files. Response shape:
    {config_file_exists, config_file, tree}."""
    root = Path(config_dir)

    def classify(p: Path) -> dict:
        node: dict = {"name": p.name, "type": "file"}
        if p.suffix == ".yaml":
            try:
                doc = yaml.safe_load(p.read_text()) or {}
            except Exception:
                node["yaml_type"] = "invalid"
                return node
            if isinstance(doc, dict) and (
                "url-path" in doc or "url_path" in doc
            ):
                node["yaml_type"] = "endpoint"
                node["url_path"] = doc.get(
                    "url-path", doc.get("url_path", "")
                )
                src = doc.get("template-source", doc.get("template_source"))
                if src:
                    node["template_source"] = src
                cache = doc.get("cache") or {}
                ct = cache.get("template-file", cache.get("template_file"))
                if ct:
                    node["cache_template_source"] = ct
            elif p.name == config_file:
                node["yaml_type"] = "project"
            else:
                node["yaml_type"] = "shared"
        return node

    def walk(d: Path) -> list[dict]:
        dirs = sorted(
            (p for p in d.iterdir() if p.is_dir()), key=lambda p: p.name
        )
        files = sorted(
            (p for p in d.iterdir() if p.is_file()), key=lambda p: p.name
        )
        out = [
            {"name": p.name, "type": "directory", "children": walk(p)}
            for p in dirs
        ]
        out.extend(classify(p) for p in files)
        return out

    return {
        "config_file_exists": (root / config_file).is_file(),
        "config_file": config_file,
        "tree": walk(root) if root.is_dir() else [],
    }
