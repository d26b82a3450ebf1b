"""Authentication semantics: PBKDF2 password hashing + basic-auth user
store feeding role-based access control.

Parity with the reference (reference: password_hasher.cpp — passlib
format `$pbkdf2-sha256$<iter>$<salt>$<hash>` with URL-safe unpadded
base64; auth_middleware.cpp — per-endpoint `auth:` blocks listing
users with roles). HTTP header plumbing is out of scope; the semantics
— verify credentials, resolve roles, let RBAC filter tools/endpoints —
are the library surface here.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
from dataclasses import dataclass, field

PBKDF2_PREFIX = "$pbkdf2-sha256$"
DEFAULT_ITERATIONS = 29000


class AuthError(RuntimeError):
    pass


def _b64(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).decode().rstrip("=")


def _unb64(text: str) -> bytes:
    pad = "=" * (-len(text) % 4)
    return base64.urlsafe_b64decode(text + pad)


def hash_password(
    password: str,
    iterations: int = DEFAULT_ITERATIONS,
    salt: bytes | None = None,
) -> str:
    """passlib-compatible `$pbkdf2-sha256$...` hash; random salt unless
    one is supplied (tests)."""
    salt = salt if salt is not None else os.urandom(16)
    dk = hashlib.pbkdf2_hmac("sha256", password.encode(), salt, iterations)
    return f"{PBKDF2_PREFIX}{iterations}${_b64(salt)}${_b64(dk)}"


def verify_password(password: str, stored: str) -> bool:
    """Verify against a pbkdf2 hash, or constant-time-compare plaintext
    (the reference's example configs carry plaintext dev passwords)."""
    if stored.startswith(PBKDF2_PREFIX):
        try:
            iter_s, salt_s, hash_s = stored[len(PBKDF2_PREFIX):].split("$")
            dk = hashlib.pbkdf2_hmac(
                "sha256", password.encode(), _unb64(salt_s), int(iter_s)
            )
            return hmac.compare_digest(dk, _unb64(hash_s))
        except (ValueError, TypeError):
            return False
    return hmac.compare_digest(password.encode(), stored.encode())


@dataclass
class User:
    username: str
    password: str  # plaintext or $pbkdf2-sha256$ hash
    roles: list[str] = field(default_factory=list)


class BasicAuthenticator:
    """User store built from an endpoint's `auth:` block:

    auth:
      enabled: true
      type: basic
      users:
        - username: admin
          password: secret            # or $pbkdf2-sha256$...
          roles: [admin, read]
    """

    def __init__(self, auth_config: dict | None):
        cfg = auth_config or {}
        self.enabled = bool(cfg.get("enabled", False))
        self._users: dict[str, User] = {}
        for u in cfg.get("users", []) or []:
            name = str(u.get("username", ""))
            if not name:
                continue
            self._users[name] = User(
                username=name,
                password=str(u.get("password", "")),
                roles=list(u.get("roles", []) or []),
            )

    def authenticate(self, username: str, password: str) -> list[str]:
        """Roles for valid credentials; AuthError otherwise. When auth
        is disabled every caller gets the empty role set (RBAC-free
        endpoints accept that)."""
        if not self.enabled:
            return []
        user = self._users.get(username)
        if user is None or not verify_password(password, user.password):
            raise AuthError("invalid credentials")
        return list(user.roles)
