"""In-process metrics registry with Prometheus text rendering.

Reference parity (`flapi_telemetry.cpp` + the API server's
operational surface): the reference ships query/cache telemetry;
the Spark-side engine keeps the SEMANTICS — counters and duration
histograms keyed by (metric, labels) — and exposes them in the
Prometheus exposition format an operator would scrape at /metrics.
No network IO here; emitting is the caller's concern.

Thread-safe (the heartbeat worker and MCP tools call from other
threads). Histograms use fixed buckets in seconds (Prometheus
convention: cumulative `le` buckets + _sum + _count).
"""

from __future__ import annotations

import threading
from collections import defaultdict

_DEFAULT_BUCKETS = (0.005, 0.025, 0.1, 0.5, 1.0, 5.0, 30.0)


def _label_key(labels: dict | None) -> tuple:
    return tuple(sorted((labels or {}).items()))


def _esc_label(v) -> str:
    """Prometheus exposition-format label escaping: backslash, double
    quote and newline must be escaped or the scrape line is invalid
    (e.g. an endpoint path label containing a quote)."""
    return (
        str(v)
        .replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
    )


def _label_str(key: tuple) -> str:
    if not key:
        return ""
    inner = ",".join(f'{k}="{_esc_label(v)}"' for k, v in key)
    return "{" + inner + "}"


class MetricsRegistry:
    """Counters + duration histograms; snapshot() for programmatic
    reads, render_prometheus() for the scrape format."""

    def __init__(self, buckets: tuple = _DEFAULT_BUCKETS):
        self._lock = threading.Lock()
        self._buckets = tuple(sorted(buckets))
        self._counters: dict[str, dict[tuple, float]] = defaultdict(
            lambda: defaultdict(float)
        )
        self._hist: dict[str, dict[tuple, dict]] = defaultdict(dict)

    def inc(self, name: str, labels: dict | None = None, by: float = 1.0) -> None:
        with self._lock:
            self._counters[name][_label_key(labels)] += by

    def observe(self, name: str, value_s: float, labels: dict | None = None) -> None:
        with self._lock:
            key = _label_key(labels)
            h = self._hist[name].get(key)
            if h is None:
                h = {"buckets": [0] * len(self._buckets), "sum": 0.0, "count": 0}
                self._hist[name][key] = h
            for i, le in enumerate(self._buckets):
                if value_s <= le:
                    h["buckets"][i] += 1
            h["sum"] += value_s
            h["count"] += 1

    def counter_value(self, name: str, labels: dict | None = None) -> float:
        with self._lock:
            return self._counters.get(name, {}).get(_label_key(labels), 0.0)

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "counters": {
                    n: {_label_str(k) or "{}": v for k, v in d.items()}
                    for n, d in self._counters.items()
                },
                "histograms": {
                    n: {
                        _label_str(k) or "{}": {
                            "count": h["count"],
                            "sum": h["sum"],
                        }
                        for k, h in d.items()
                    }
                    for n, d in self._hist.items()
                },
            }

    def render_prometheus(self) -> str:
        """Prometheus exposition format: counters as `<name>_total`,
        histograms as cumulative `_bucket{le=...}` + `_sum` +
        `_count`."""
        out: list[str] = []
        with self._lock:
            for name in sorted(self._counters):
                out.append(f"# TYPE {name}_total counter")
                for key in sorted(self._counters[name]):
                    v = self._counters[name][key]
                    out.append(f"{name}_total{_label_str(key)} {v:g}")
            for name in sorted(self._hist):
                out.append(f"# TYPE {name} histogram")
                for key in sorted(self._hist[name]):
                    h = self._hist[name][key]
                    labels = dict(key)
                    for i, le in enumerate(self._buckets):
                        lk = _label_key({**labels, "le": f"{le:g}"})
                        out.append(f"{name}_bucket{_label_str(lk)} {h['buckets'][i]}")
                    lk = _label_key({**labels, "le": "+Inf"})
                    out.append(f"{name}_bucket{_label_str(lk)} {h['count']}")
                    out.append(f"{name}_sum{_label_str(key)} {h['sum']:g}")
                    out.append(f"{name}_count{_label_str(key)} {h['count']}")
        return "\n".join(out) + "\n"


class TelemetryBackend:
    """Interface for start/stop lifecycle capture (reference:
    flapi_telemetry.hpp ITelemetryBackend). The production reference
    backend phones home; this library ships NO network backend — the
    injectable seam exists for parity and for deployments that wire
    their own sink."""

    def capture_start(self, app_name: str, app_version: str) -> None:
        raise NotImplementedError

    def capture_stop(self, app_name: str, app_version: str) -> None:
        raise NotImplementedError


class FlapiTelemetry:
    """Lifecycle telemetry with the reference's opt-out semantics
    (flapi_telemetry.cpp, test_flapi_telemetry.cpp vectors):
    DATAZOO_DISABLE_TELEMETRY set to 1/true (any case) suppresses all
    capture, as does FLAPI_NO_TELEMETRY (the 12-factor spelling the
    launcher resolves, main.cpp:536-541: CLI flag > env > config) and
    setEnabled(False); every notify is forwarded once, never batched
    or deduped."""

    ENV_VAR = "DATAZOO_DISABLE_TELEMETRY"
    ENV_VAR_ALT = "FLAPI_NO_TELEMETRY"

    def __init__(self, backend: TelemetryBackend, env: dict | None = None):
        if backend is None:
            raise ValueError("FlapiTelemetry requires a backend")
        self._backend = backend
        self._env = env
        self._enabled = True

    def set_enabled(self, enabled: bool) -> None:
        self._enabled = bool(enabled)

    def _suppressed(self) -> bool:
        import os

        env = self._env if self._env is not None else os.environ
        val = str(env.get(self.ENV_VAR, "")).strip().lower()
        alt = str(env.get(self.ENV_VAR_ALT, "")).strip().lower()
        off = ("1", "true", "yes")
        return (not self._enabled) or val in off or alt in off

    def notify_start(self, app_name: str, app_version: str) -> None:
        if not self._suppressed():
            self._backend.capture_start(app_name, app_version)

    def notify_stop(self, app_name: str, app_version: str) -> None:
        if not self._suppressed():
            self._backend.capture_stop(app_name, app_version)
