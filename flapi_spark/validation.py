"""Typed request-parameter validation.

Parity with the reference's validator surface (reference:
src/request_validator.cpp:14-290, examples/sqls/customers/
customer-common.yaml): validator types string (regex), int (min/max),
double (min/max), boolean, date (min/max), time (min/max), uuid,
email, enum (allowedValues, optional case-insensitivity), plus
``preventSqlInjection`` whole-word keyword screening and required /
default handling.

Validated typed values also carry their Python-typed form so the
executor can bind them as Spark named SQL parameters (the analogue of
the reference's prepared-statement binding, where typed sites are
structurally injection-proof)."""

from __future__ import annotations

import datetime as _dt
import re
import uuid as _uuid
from dataclasses import dataclass, field
from typing import Any


class ValidationError(ValueError):
    def __init__(self, errors: list[str]):
        super().__init__("; ".join(errors))
        self.errors = errors


_EMAIL_RE = re.compile(r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$")
_UUID_RE = re.compile(r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$")

# Whole-word SQL keyword screen (reference: request_validator.cpp:265-290)
_SQL_KEYWORDS = (
    "select", "insert", "update", "delete", "drop", "union", "exec",
    "execute", "alter", "create", "truncate", "grant", "revoke",
)
_SQL_KEYWORD_RE = re.compile(
    r"\b(" + "|".join(_SQL_KEYWORDS) + r")\b", re.IGNORECASE
)
_SQL_META_RE = re.compile(r"(--|;|/\*|\*/|')")


@dataclass
class Validator:
    type: str = "string"
    min: Any = None
    max: Any = None
    regex: str | None = None
    allowed_values: list = field(default_factory=list)
    case_insensitive: bool = False
    prevent_sql_injection: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "Validator":
        return cls(
            type=str(d.get("type", "string")),
            min=d.get("min"),
            max=d.get("max"),
            regex=d.get("regex"),
            allowed_values=list(d.get("allowedValues", d.get("allowed-values", []))),
            case_insensitive=bool(d.get("caseInsensitive", d.get("case-insensitive", False))),
            prevent_sql_injection=bool(
                d.get("preventSqlInjection", d.get("prevent-sql-injection", False))
            ),
        )


@dataclass
class RequestField:
    field_name: str
    field_in: str = "query"
    description: str = ""
    required: bool = False
    default: Any = None
    validators: list[Validator] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict) -> "RequestField":
        return cls(
            field_name=d.get("field-name", d.get("fieldName", "")),
            field_in=d.get("field-in", d.get("fieldIn", "query")),
            description=d.get("description", ""),
            required=bool(d.get("required", False)),
            default=d.get("default"),
            validators=[Validator.from_dict(v) for v in d.get("validators", [])],
        )

    @property
    def bound_type(self) -> str:
        """The typed-binding class of this field: the first validator
        type that admits prepared binding, else 'string'."""
        for v in self.validators:
            if v.type in ("int", "integer", "double", "float", "boolean", "bool",
                          "date", "time", "uuid", "email", "enum"):
                return v.type
        return "string"


def _check_int(name: str, value: str, v: Validator, errors: list) -> Any:
    try:
        iv = int(value)
    except (TypeError, ValueError):
        errors.append(f"{name}: '{value}' is not a valid integer")
        return None
    if v.min is not None and iv < int(v.min):
        errors.append(f"{name}: {iv} below min {v.min}")
    if v.max is not None and iv > int(v.max):
        errors.append(f"{name}: {iv} above max {v.max}")
    return iv


def _check_double(name: str, value: str, v: Validator, errors: list) -> Any:
    try:
        dv = float(value)
    except (TypeError, ValueError):
        errors.append(f"{name}: '{value}' is not a valid double")
        return None
    if v.min is not None and dv < float(v.min):
        errors.append(f"{name}: {dv} below min {v.min}")
    if v.max is not None and dv > float(v.max):
        errors.append(f"{name}: {dv} above max {v.max}")
    return dv


def _check_date(name: str, value: str, v: Validator, errors: list) -> Any:
    try:
        dv = _dt.date.fromisoformat(value)
    except (TypeError, ValueError):
        errors.append(f"{name}: '{value}' is not a valid ISO date")
        return None
    if v.min is not None and dv < _dt.date.fromisoformat(str(v.min)):
        errors.append(f"{name}: {dv} before min {v.min}")
    if v.max is not None and dv > _dt.date.fromisoformat(str(v.max)):
        errors.append(f"{name}: {dv} after max {v.max}")
    return dv


def _check_time(name: str, value: str, v: Validator, errors: list) -> Any:
    try:
        tv = _dt.time.fromisoformat(value)
    except (TypeError, ValueError):
        errors.append(f"{name}: '{value}' is not a valid ISO time")
        return None
    if v.min is not None and tv < _dt.time.fromisoformat(str(v.min)):
        errors.append(f"{name}: {tv} before min {v.min}")
    if v.max is not None and tv > _dt.time.fromisoformat(str(v.max)):
        errors.append(f"{name}: {tv} after max {v.max}")
    return tv


def _check_one(name: str, value: str, v: Validator, errors: list) -> Any:
    t = v.type
    if t in ("int", "integer"):
        return _check_int(name, value, v, errors)
    if t in ("double", "float"):
        return _check_double(name, value, v, errors)
    if t in ("boolean", "bool"):
        if str(value).lower() in ("true", "1", "yes"):
            return True
        if str(value).lower() in ("false", "0", "no"):
            return False
        errors.append(f"{name}: '{value}' is not a valid boolean")
        return None
    if t == "date":
        return _check_date(name, value, v, errors)
    if t == "time":
        return _check_time(name, value, v, errors)
    if t == "uuid":
        if not _UUID_RE.match(str(value)):
            errors.append(f"{name}: '{value}' is not a valid UUID")
            return None
        return str(_uuid.UUID(str(value)))
    if t == "email":
        if not _EMAIL_RE.match(str(value)):
            errors.append(f"{name}: '{value}' is not a valid email")
            return None
        return str(value)
    if t == "enum":
        allowed = v.allowed_values
        if v.case_insensitive:
            lowered = {str(a).lower(): a for a in allowed}
            if str(value).lower() in lowered:
                return lowered[str(value).lower()]
            errors.append(f"{name}: '{value}' not in allowed values {allowed}")
            return None
        if value in [str(a) for a in allowed]:
            return value
        errors.append(f"{name}: '{value}' not in allowed values {allowed}")
        return None
    # string
    if v.regex:
        if not re.fullmatch(v.regex, str(value)):
            errors.append(f"{name}: '{value}' does not match regex {v.regex}")
            return None
    return str(value)


def check_sql_injection(value: str) -> list[str]:
    hits = []
    m = _SQL_KEYWORD_RE.search(str(value))
    if m:
        hits.append(f"SQL keyword '{m.group(1)}'")
    m = _SQL_META_RE.search(str(value))
    if m:
        hits.append(f"SQL metacharacter '{m.group(1)}'")
    return hits


def validate_params(
    fields: list[RequestField], params: dict[str, Any]
) -> dict[str, Any]:
    """Validate raw params against the declared request fields.

    Returns the typed/normalized param dict (validated values carry
    Python types suitable for Spark named-parameter binding). Raises
    ValidationError with the full error list on any failure. Params
    not declared as fields pass through untouched (reference keeps
    undeclared reserved keys like offset/limit flowing)."""
    errors: list[str] = []
    out: dict[str, Any] = dict(params)
    for f in fields:
        name = f.field_name
        if name not in params or params[name] in (None, ""):
            if f.default is not None:
                out[name] = f.default
            elif f.required:
                errors.append(f"{name}: required parameter missing")
            else:
                out.pop(name, None)
            continue
        raw = str(params[name])
        typed: Any = raw
        typed_bound = False
        for v in f.validators:
            res = _check_one(name, raw, v, errors)
            if res is not None and v.type != "string":
                typed = res
                typed_bound = True
            elif res is not None and not typed_bound:
                typed = res
        # Typed prepared-bound sites are structurally injection-proof
        # (reference: request_validator.cpp:77-105 demotes the keyword
        # regex for them); raw string sites keep the screen when asked.
        needs_screen = any(v.prevent_sql_injection for v in f.validators)
        if needs_screen and f.bound_type == "string":
            hits = check_sql_injection(raw)
            if hits:
                errors.append(f"{name}: possible SQL injection ({'; '.join(hits)})")
        out[name] = typed
    if errors:
        raise ValidationError(errors)
    return out
