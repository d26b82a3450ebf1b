"""Typed error taxonomy with HTTP status mapping (reference:
src/include/error.hpp Error + ErrorCategory, src/error.cpp
toJson/getCategoryName; vectors in test/cpp/test_error.cpp).

The reference routes every failure through one Error struct so the
HTTP layer renders a uniform `{"success": false, "error": {category,
message, details?}}` body with the right status code. The repo's
library surface raises typed Python exceptions instead; this module
is the boundary adapter — `classify_exception` maps each library
exception family onto the reference's categories so any transport
(HTTP framework, MCP, CLI) renders identical error envelopes.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Error:
    category: str
    message: str
    details: str = ""
    http_status_code: int = 500

    # --- factories (error.hpp:27-49) -----------------------------------

    @staticmethod
    def config(msg: str, details: str = "") -> "Error":
        return Error("Configuration", msg, details, 500)

    @staticmethod
    def database(msg: str, details: str = "") -> "Error":
        return Error("Database", msg, details, 500)

    @staticmethod
    def validation(msg: str, details: str = "") -> "Error":
        return Error("Validation", msg, details, 400)

    @staticmethod
    def auth(msg: str, details: str = "") -> "Error":
        return Error("Authentication", msg, details, 401)

    @staticmethod
    def not_found(msg: str, details: str = "") -> "Error":
        return Error("NotFound", msg, details, 404)

    @staticmethod
    def internal(msg: str, details: str = "") -> "Error":
        return Error("Internal", msg, details, 500)

    def to_json(self) -> dict:
        """error.cpp toJson: details key only when non-empty."""
        err: dict = {"category": self.category, "message": self.message}
        if self.details:
            err["details"] = self.details
        return {"success": False, "error": err}


def classify_exception(exc: BaseException) -> Error:
    """Library exception → reference error category/status. Imports
    stay lazy so the adapter never forces optional deps."""
    msg = str(exc)

    from flapi_spark.validation import ValidationError

    if isinstance(exc, ValidationError):
        return Error.validation("Invalid input", msg)

    try:
        from flapi_spark.auth import AuthError

        if isinstance(exc, AuthError):
            return Error.auth("Authentication failed", msg)
    except ImportError:  # pragma: no cover
        pass

    try:
        from flapi_spark.mcp import AuthorizationError, RateLimitError

        if isinstance(exc, AuthorizationError):
            return Error.auth("Authorization failed", msg)
        if isinstance(exc, RateLimitError):
            # the reference's 429 surfaces through the rate-limit
            # middleware rather than Error, but the adapter keeps the
            # status faithful for transports that only see exceptions
            return Error("Validation", "Rate limit exceeded", msg, 429)
    except ImportError:  # pragma: no cover
        pass

    try:
        from flapi_spark.config_service import (
            ConfigServiceError, EndpointNotFound,
        )

        if isinstance(exc, EndpointNotFound):
            return Error.not_found("Resource not found", msg)
        if isinstance(exc, ConfigServiceError):
            return Error.config("Invalid configuration", msg)
    except ImportError:  # pragma: no cover
        pass

    try:
        from flapi_spark.writes import WriteError

        if isinstance(exc, WriteError):
            return Error.validation("Invalid write statement", msg)
    except ImportError:  # pragma: no cover
        pass

    try:
        from pyspark.errors import AnalysisException, PySparkException

        if isinstance(exc, AnalysisException):
            return Error.database("Query failed", msg)
        if isinstance(exc, PySparkException):
            return Error.database("Query execution failed", msg)
    except ImportError:  # pragma: no cover
        pass

    if isinstance(exc, (KeyError, LookupError)):
        return Error.not_found("Resource not found", msg)
    if isinstance(exc, ValueError):
        return Error.validation("Invalid input", msg)
    return Error.internal("Internal error", msg)
