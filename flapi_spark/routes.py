"""URL route translation: `:param` path segments → matchers.

Parity with the reference's route layer (reference:
src/route_translator.cpp translates `/customers/:id/` patterns into
regexes and extracts path params into the request's parameter map,
merged with query params before validation)."""

from __future__ import annotations

import re
from typing import Any

_PARAM_SEG = re.compile(r":([A-Za-z_][A-Za-z0-9_]*)")


def translate_route_path(pattern: str) -> tuple[re.Pattern, list[str]]:
    """`/customers/:id/orders/:n` → compiled regex + ['id', 'n']."""
    names: list[str] = []

    def _repl(m: re.Match) -> str:
        names.append(m.group(1))
        return r"([^/]+)"

    regex = _PARAM_SEG.sub(_repl, re.escape(pattern).replace(r"\:", ":"))
    return re.compile("^" + regex + "$"), names


def match_route(
    path: str, pattern: str
) -> dict[str, str] | None:
    """Path params if `path` matches `pattern`, else None."""
    rx, names = translate_route_path(pattern)
    m = rx.match(path)
    if not m:
        return None
    return dict(zip(names, m.groups()))


class RouteTable:
    """Ordered route registry: first matching pattern wins (the
    reference registers endpoints in config order)."""

    def __init__(self) -> None:
        self._routes: list[
            tuple[str, str, re.Pattern, list[str], Any]
        ] = []

    def add(self, pattern: str, target: Any, method: str = "GET") -> None:
        rx, names = translate_route_path(pattern)
        self._routes.append((pattern, method.upper(), rx, names, target))

    def match(
        self, path: str, method: str = "GET"
    ) -> tuple[Any, dict[str, str]] | None:
        """First registered route whose pattern AND method match —
        the reference routes by (path, method), so /customers GET and
        /customers POST are independent targets
        (endpoint_repository.cpp semantics at the pattern level)."""
        m_up = method.upper()
        for _pattern, m_method, rx, names, target in self._routes:
            if m_method != m_up:
                continue
            m = rx.match(path)
            if m:
                return target, dict(zip(names, m.groups()))
        return None


class EndpointRepository:
    """Endpoint registry keyed independently per surface (reference:
    src/endpoint_repository.cpp, test_endpoint_repository.cpp): REST
    endpoints by (url_path, method) — same path with different methods
    are SEPARATE endpoints, re-adding an existing key REPLACES it —
    and MCP tools by tool name. One EndpointConfig may register on
    both surfaces (dual endpoints) and each registration is removable
    independently; `count()` counts CONFIGS, not registrations."""

    def __init__(self) -> None:
        self._rest: dict[tuple[str, str], Any] = {}
        self._mcp: dict[str, Any] = {}

    @staticmethod
    def _mcp_name(ep: Any) -> str | None:
        tool = getattr(ep, "mcp_tool", None)
        if isinstance(tool, dict):
            return tool.get("name")
        return None

    def add_endpoint(self, ep: Any) -> None:
        url_path = getattr(ep, "url_path", "") or ""
        if url_path:
            method = (getattr(ep, "method", "GET") or "GET").upper()
            self._rest[(url_path, method)] = ep
        name = self._mcp_name(ep)
        if name:
            self._mcp[name] = ep

    # --- REST surface ---------------------------------------------------

    def get_endpoint_by_rest_path(self, url_path: str, method: str = "GET"):
        return self._rest.get((url_path, method.upper()))

    def has_rest_endpoint(self, url_path: str, method: str = "GET") -> bool:
        return (url_path, method.upper()) in self._rest

    def remove_rest_endpoint(self, url_path: str, method: str = "GET") -> bool:
        return self._rest.pop((url_path, method.upper()), None) is not None

    def count_rest_endpoints(self) -> int:
        return len(self._rest)

    # --- MCP surface ----------------------------------------------------

    def get_endpoint_by_mcp_name(self, name: str):
        return self._mcp.get(name)

    def has_mcp_endpoint(self, name: str) -> bool:
        return name in self._mcp

    def remove_mcp_endpoint(self, name: str) -> bool:
        return self._mcp.pop(name, None) is not None

    def count_mcp_endpoints(self) -> int:
        return len(self._mcp)

    # --- whole-repository ------------------------------------------------

    def count(self) -> int:
        seen = {id(ep) for ep in self._rest.values()}
        seen.update(id(ep) for ep in self._mcp.values())
        return len(seen)

    def get_all_endpoints(self) -> list:
        out, seen = [], set()
        for ep in list(self._rest.values()) + list(self._mcp.values()):
            if id(ep) not in seen:
                seen.add(id(ep))
                out.append(ep)
        return out

    def find_endpoints(self, predicate) -> list:
        return [ep for ep in self.get_all_endpoints() if predicate(ep)]

    def clear(self) -> None:
        self._rest.clear()
        self._mcp.clear()
