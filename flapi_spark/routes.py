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
        self._routes: list[tuple[str, re.Pattern, list[str], Any]] = []

    def add(self, pattern: str, target: Any) -> None:
        rx, names = translate_route_path(pattern)
        self._routes.append((pattern, rx, names, target))

    def match(self, path: str) -> tuple[Any, dict[str, str]] | None:
        for _pattern, rx, names, target in self._routes:
            m = rx.match(path)
            if m:
                return target, dict(zip(names, m.groups()))
        return None
