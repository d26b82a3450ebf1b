"""Mustache-style SQL template renderer.

Re-expresses the semantics of the reference's template layer
(reference: src/sql_template_processor.cpp, which delegates to
crow::mustache) as a small dependency-free renderer:

- ``{{name}}``        variable, SQL-escaped (single quotes doubled)
- ``{{{name}}}``      raw variable (no escaping)
- ``{{#name}}..{{/name}}`` section: rendered iff value is present/truthy
- ``{{^name}}..{{/name}}`` inverted section: rendered iff absent/falsy
- ``{{! comment }}``  dropped
- dotted lookups (``params.id``, ``conn.path``, ``env.HOME``,
  ``cache.table``, ``cache.previousSnapshotTimestamp``) against a nested
  dict context.

The reference escapes for HTML because its renderer is a web-template
engine; a SQL engine wants SQL escaping, so ``{{x}}`` doubles single
quotes — raw interpolation stays available as ``{{{x}}}`` exactly like
the reference's templates use it.
"""

from __future__ import annotations

import re
from typing import Any

_TAG = re.compile(
    r"\{\{\{\s*(?P<raw>[\w.\-]+)\s*\}\}\}"  # {{{raw}}}
    r"|\{\{\s*(?P<bang>!)(?P<comment>.*?)\}\}"  # {{! comment }}
    r"|\{\{\s*(?P<sigil>[#^/])\s*(?P<sec>[\w.\-]+)\s*\}\}"  # sections
    r"|\{\{\s*(?P<var>[\w.\-]+)\s*\}\}",  # {{var}}
    re.DOTALL,
)


class TemplateError(ValueError):
    pass


def _lookup(context: dict, dotted: str) -> Any:
    cur: Any = context
    for part in dotted.split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            return None
    return cur


def _truthy(value: Any) -> bool:
    if value is None or value is False:
        return False
    if isinstance(value, str):
        return value != ""
    if isinstance(value, (list, dict)):
        return len(value) > 0
    return True


def sql_escape(value: Any) -> str:
    """Escape a value for splicing into a Spark SQL string literal.

    Quote-doubling alone (the reference's DuckDB-sufficient escaping)
    is NOT enough for Spark: with the default
    ``spark.sql.parser.escapedStringLiterals=false`` backslash is an
    escape character inside string literals, so a value ending in a
    backslash would turn the doubled quote into an escaped quote and
    let attacker text out of the literal. Double backslashes first,
    then quotes — correct under Spark's default parser mode."""
    return str(value).replace("\\", "\\\\").replace("'", "''")


def _parse(template: str, pos: int, stop_section: str | None, out: list, context: dict) -> int:
    """Render template[pos:] into out until the closing tag of
    stop_section (or end of input). Returns the new position."""
    while True:
        m = _TAG.search(template, pos)
        if m is None:
            if stop_section is not None:
                raise TemplateError(f"Unclosed section {{{{#{stop_section}}}}}")
            out.append(template[pos:])
            return len(template)
        out.append(template[pos : m.start()])
        pos = m.end()
        if m.group("raw") is not None:
            val = _lookup(context, m.group("raw"))
            if val is not None:
                out.append(str(val))
        elif m.group("bang") is not None:
            pass  # comment
        elif m.group("sigil") is not None:
            sigil, name = m.group("sigil"), m.group("sec")
            if sigil == "/":
                if name != stop_section:
                    raise TemplateError(
                        f"Mismatched close tag {{{{/{name}}}}} (open: {stop_section})"
                    )
                return pos
            val = _lookup(context, name)
            render = _truthy(val) if sigil == "#" else not _truthy(val)
            if render:
                pos = _parse(template, pos, name, out, context)
            else:
                pos = _parse(template, pos, name, [], context)  # skip body
        else:
            val = _lookup(context, m.group("var"))
            if val is not None:
                out.append(sql_escape(val))


def render_template(template: str, context: dict) -> str:
    """Render a mustache SQL template against a nested-dict context."""
    out: list[str] = []
    _parse(template, 0, None, out, context)
    return "".join(out)


def build_context(
    params: dict | None = None,
    conn: dict | None = None,
    env: dict | None = None,
    cache: dict | None = None,
) -> dict:
    """Assemble the standard flAPI template context namespaces."""
    import os

    return {
        "params": dict(params or {}),
        "conn": dict(conn or {}),
        "env": dict(env if env is not None else os.environ),
        "cache": dict(cache or {}),
    }
