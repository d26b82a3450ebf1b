"""Endpoint-level rate limiting (fixed window, keyed by principal).

Parity with the reference's middleware semantics (reference:
src/rate_limit_middleware.cpp, rate_limit_key_builder.cpp): each
endpoint carries a ``rate-limit: {enabled, max, interval, key}``
block; the bucket key strategy is ``ip`` (default), ``user`` (stable
hash of the Authorization header, ``anonymous`` when absent), or
``user-or-ip``; the window is a fixed interval — when it expires the
quota resets; an exhausted window raises with Retry-After metadata
(the reference's 429 + X-RateLimit-* headers, minus HTTP transport).

This sits a level above the per-MCP-tool TokenBucket (flapi_spark/
mcp.py): that throttles individual tools; this throttles the endpoint
regardless of entry path — QueryExecutor checks it on every execute.
"""

from __future__ import annotations

import hashlib
import time
from dataclasses import dataclass
from threading import Lock


class RateLimitExceeded(RuntimeError):
    def __init__(self, limit: int, reset_at: float, retry_after_s: float):
        super().__init__(
            f"rate limit exceeded (limit {limit}; retry after "
            f"{max(1, int(retry_after_s))}s)"
        )
        self.limit = limit
        self.remaining = 0
        self.reset_at = reset_at
        self.retry_after_s = max(1.0, retry_after_s)


@dataclass
class RateLimitStatus:
    """The reference's X-RateLimit-* header triple."""

    limit: int
    remaining: int
    reset_at: float


def build_key(
    strategy: str,
    client_ip: str | None = None,
    auth_header: str | None = None,
    path: str = "",
) -> str:
    """Bucket key per the endpoint's key strategy (reference:
    rate_limit_key_builder.cpp). The auth header is hashed — stable per
    caller, no plaintext token in keys or logs."""

    def principal() -> str:
        if not auth_header:
            return "anonymous"
        return "u" + hashlib.sha256(auth_header.encode()).hexdigest()[:16]

    if strategy == "user":
        who = principal()
    elif strategy == "user-or-ip":
        who = principal() if auth_header else (client_ip or "anonymous")
    else:  # 'ip', empty, or unknown — historical default
        who = client_ip or "anonymous"
    return f"{path}|{who}"


class FixedWindowLimiter:
    """Keyed fixed-window counter (the reference's updateRateLimit):
    first hit of a window grants `max` and stamps the reset time;
    hits past the quota raise until the window rolls over."""

    def __init__(self):
        self._windows: dict[str, tuple[float, int]] = {}  # key -> (reset, left)
        self._lock = Lock()

    def check(
        self, key: str, max_calls: int, interval_s: float, now: float | None = None
    ) -> RateLimitStatus:
        now = time.monotonic() if now is None else now
        with self._lock:
            reset, left = self._windows.get(key, (0.0, 0))
            if now >= reset:
                reset, left = now + interval_s, max_calls
            left -= 1
            self._windows[key] = (reset, left)
        if left < 0:
            raise RateLimitExceeded(max_calls, reset, reset - now)
        return RateLimitStatus(limit=max_calls, remaining=left, reset_at=reset)


def check_endpoint(
    limiter: FixedWindowLimiter,
    rate_limit_cfg: dict,
    path: str,
    client_ip: str | None = None,
    auth_header: str | None = None,
    now: float | None = None,
) -> RateLimitStatus | None:
    """Apply an endpoint's ``rate-limit:`` block; None when disabled."""
    cfg = rate_limit_cfg or {}
    if not cfg.get("enabled"):
        return None
    max_calls = int(cfg.get("max", 0) or 0)
    interval = float(cfg.get("interval", 60) or 60)
    if max_calls <= 0:
        return None
    key = build_key(str(cfg.get("key", "ip") or "ip"), client_ip, auth_header, path)
    return limiter.check(key, max_calls, interval, now=now)
