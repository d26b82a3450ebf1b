"""Typed-parameter binding: mustache param tags → Spark named markers.

The reference rewrites typed ``{{params.x}}`` sites into DuckDB
prepared-statement placeholders before mustache rendering (reference:
src/prepared_template_rewriter.cpp, sql_parameter_classifier.cpp), so
typed values never enter the SQL text. Spark's analogue is
parameterized SQL: ``spark.sql(sql, args={...})`` with ``:name``
markers — the literal is attached server-side by the analyzer, never
spliced into the query string, so injection is structurally impossible
for those sites. String-typed sites remain template-interpolated
(escaped, plus the optional keyword screen), mirroring the reference.
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Any

from flapi_spark.validation import RequestField

_TYPED = ("int", "integer", "double", "float", "boolean", "bool",
          "date", "time", "uuid", "email", "enum")


def rewrite_typed_params(
    template: str, fields: list[RequestField]
) -> tuple[str, list[str]]:
    """Replace ``{{params.x}}`` / ``{{{params.x}}}`` for typed fields
    with ``:x`` named markers. Section tags (``{{#params.x}}``) are left
    alone — they control rendering, not values. Returns (rewritten
    template, names of rewritten fields).

    Quoted sites — ``'{{params.since}}'``, the way the reference's own
    templates write date/uuid/enum params — consume the surrounding
    quotes too: leaving them would make Spark parse ``':since'`` as the
    string literal ":since" instead of a parameter marker (the
    reference's rewriter skips such sites for the same reason,
    prepared_template_rewriter.cpp)."""
    bound: list[str] = []
    out = template
    for f in fields:
        if f.bound_type not in _TYPED:
            continue
        name = f.field_name
        pat = re.compile(
            r"(?P<q>')?\{\{(?P<t>\{)?\s*params\."
            + re.escape(name)
            + r"\s*(?(t)\})\}\}(?(q)')"
        )
        # PARTIAL in-string interpolation — the reference's
        # `LIKE '%{{{params.x}}}%'` idiom: the marker shares a string
        # literal with literal text, so a bare :x would be quoted
        # prose. Rewrite the whole literal to concat('%', :x, '%')
        # (pieces dropped when empty); still injection-proof — the
        # value travels as a bound parameter, never spliced.
        marker = re.compile(
            r"(?:\{\{\{\s*params\." + re.escape(name) + r"\s*\}\}\}"
            r"|\{\{\s*params\." + re.escape(name) + r"\s*\}\})"
        )
        # String literals pair left-to-right; only a marker wholly
        # INSIDE one literal rewrites here (a naive cross-literal regex
        # would swallow the SQL between two adjacent literals). The
        # scanner is ''-escape-aware: 'it''s {{params.q}}' is ONE
        # literal, not two — pairing on bare quotes would split it at
        # the escape and emit broken SQL.
        literal = re.compile(r"'(?:[^']|'')*'")

        def _concat(lit: re.Match) -> str:
            body = lit.group(0)[1:-1]
            # split on EVERY marker occurrence — a literal like
            # '%{{params.q}}%{{params.q}}%' yields one concat piece
            # per marker (re-quoting the text parts preserves any ''
            # escapes verbatim)
            parts = marker.split(body)
            if len(parts) == 1:
                return lit.group(0)
            pieces: list[str] = []
            for i, p in enumerate(parts):
                if p:
                    pieces.append(f"'{p}'")
                if i < len(parts) - 1:
                    pieces.append(f":{name}")
            if pieces == [f":{name}"]:
                return f":{name}"
            return "concat(" + ", ".join(pieces) + ")"

        new = literal.sub(_concat, out)
        if new != out:
            bound.append(name)
            out = new
        # Distinguish section tags by the sigil: the regex above cannot
        # match {{#...}} / {{/...}} / {{^...}} because of the leading
        # sigil character right after the braces. The optional quote
        # groups are paired: a lone quote on one side is left in place.
        new, n = pat.subn(f":{name}", out)
        if n:
            if name not in bound:
                bound.append(name)
            out = new
    return out, bound


def spark_args(params: dict[str, Any], bound: list[str]) -> dict[str, Any]:
    """Build the args dict for spark.sql() from validated typed params."""
    args: dict[str, Any] = {}
    for name in bound:
        if name not in params:
            continue
        v = params[name]
        if isinstance(v, _dt.time):
            v = v.isoformat()  # Spark has no TIME type; bind as string
        args[name] = v
    return args
