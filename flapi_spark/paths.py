"""Path validation for user-supplied template / data paths.

Re-expresses the reference's PathValidator semantics
(reference: src/path_validator.cpp:13-115):

- URL-decode FIRST, so %2e%2e%2f-encoded traversal is caught;
- reject `..` traversal sequences outright;
- remote URIs pass only on an allowed-scheme list;
- local paths canonicalize (symlinks resolved — a symlink pointing
  outside the sandbox must not escape it) and must land under an
  allowed prefix when prefixes are configured.
"""

from __future__ import annotations

import urllib.parse
from dataclasses import dataclass, field
from pathlib import Path


class PathValidationError(ValueError):
    pass


@dataclass
class PathValidator:
    allowed_schemes: set[str] = field(
        default_factory=lambda: {"file", "https", "s3", "s3a", "gs", "abfss"}
    )
    allow_local_paths: bool = True
    allow_relative_paths: bool = True
    allowed_prefixes: list[str] = field(default_factory=list)

    def validate(self, user_path: str, base_path: str | Path | None = None) -> str:
        """Canonical validated path, or raise PathValidationError."""
        if not user_path:
            raise PathValidationError("Path cannot be empty")
        decoded = urllib.parse.unquote(str(user_path))
        if self._contains_traversal(decoded):
            raise PathValidationError("Path traversal not allowed")
        scheme = self._scheme(decoded)
        if scheme and scheme not in ("file",):
            if scheme not in self.allowed_schemes:
                raise PathValidationError(f"URL scheme not allowed: {scheme}")
            return decoded
        if not self.allow_local_paths:
            raise PathValidationError("Local paths not allowed")
        p = Path(decoded[7:] if decoded.startswith("file://") else decoded)
        if not p.is_absolute():
            if not self.allow_relative_paths:
                raise PathValidationError("Relative paths not allowed")
            if base_path is None:
                raise PathValidationError("Relative path requires a base path")
            p = Path(base_path) / p
        # resolve() follows symlinks (weakly canonical: missing tails
        # are normalized without erroring) — a symlink escape lands
        # outside the allowed prefix and is rejected below
        canonical = p.resolve()
        if base_path is not None:
            base = Path(base_path).resolve()
            if not canonical.is_relative_to(base) and not self._under_prefixes(
                canonical
            ):
                raise PathValidationError("Path not within allowed directory")
        elif self.allowed_prefixes and not self._under_prefixes(canonical):
            raise PathValidationError("Path not within allowed directory")
        return str(canonical)

    @staticmethod
    def _contains_traversal(path: str) -> bool:
        norm = path.replace("\\", "/")
        parts = norm.split("/")
        return ".." in parts

    @staticmethod
    def _scheme(path: str) -> str | None:
        if "://" not in path:
            return None
        return path.split("://", 1)[0].lower()

    def _under_prefixes(self, canonical: Path) -> bool:
        return any(
            canonical.is_relative_to(Path(pref).resolve())
            for pref in self.allowed_prefixes
        )
