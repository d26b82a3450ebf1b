"""Opaque keyset-pagination cursors.

The executor's keyset pagination (`paginate_keyset_sql`) takes the
last key of the previous page; an API surface shouldn't hand raw key
values to clients (they get treated as contract, tweaked, and break
ordering guarantees). These helpers wrap the key in an opaque
base64url token, optionally HMAC-SHA256-signed so a tampered cursor is
rejected instead of silently scanning from an attacker-chosen key —
the hardening the reference applies to every other client-controlled
input (request_validator.cpp's posture, applied to pagination).

Typed round-trip: int / float / str / bool keys come back with their
type (the keyset WHERE clause binds them as typed parameters)."""

from __future__ import annotations

import base64
import hashlib
import hmac
import json


class CursorError(ValueError):
    pass


def _b64e(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _b64d(text: str) -> bytes:
    pad = "=" * (-len(text) % 4)
    try:
        return base64.urlsafe_b64decode(text + pad)
    except Exception as exc:
        raise CursorError("malformed cursor") from exc


def encode_cursor(after, secret: str | None = None) -> str:
    """Opaque token for the `after` key; with `secret`, appends an
    HMAC so the token is tamper-evident."""
    body = _b64e(json.dumps({"a": after}, separators=(",", ":")).encode())
    if secret is None:
        return body
    sig = hmac.new(
        secret.encode(), body.encode(), hashlib.sha256
    ).hexdigest()[:32]
    return f"{body}.{sig}"


def decode_cursor(token: str, secret: str | None = None):
    """Recover the key; raises CursorError on malformed tokens or
    signature mismatch (constant-time compare)."""
    if secret is not None:
        body, _, sig = token.partition(".")
        if not sig:
            raise CursorError("cursor missing signature")
        want = hmac.new(
            secret.encode(), body.encode(), hashlib.sha256
        ).hexdigest()[:32]
        if not hmac.compare_digest(sig, want):
            raise CursorError("cursor signature mismatch")
    else:
        body = token.partition(".")[0]
    try:
        doc = json.loads(_b64d(body))
    except (ValueError, TypeError) as exc:
        raise CursorError("malformed cursor") from exc
    if not isinstance(doc, dict) or "a" not in doc:
        raise CursorError("malformed cursor")
    return doc["a"]
