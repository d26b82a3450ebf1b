"""Query-execution audit log.

Parity with the reference's audit trail (reference: audit_logger.cpp,
security_auditor.cpp; the cache side keeps its own sync_events table in
flapi_spark/cache.py). Each executed endpoint call appends one JSONL
record; raw parameter VALUES are never logged — only a fingerprint —
mirroring the reference's redaction posture.

The log is itself queryable: `as_dataframe(spark)` reads the JSONL back
through the engine, so operational questions ("which endpoints are
slow", "who hit rate limits") are just more queries.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import time
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def params_fingerprint(params: dict[str, Any]) -> str:
    """Order-insensitive md5 over param names+values; logged instead of
    raw values so secrets/PII never land in the audit trail."""
    canon = json.dumps(
        {str(k): str(v) for k, v in sorted(params.items())}, sort_keys=True
    )
    return hashlib.md5(canon.encode()).hexdigest()


@dataclass
class AuditRecord:
    ts: float
    endpoint: str
    user: str | None
    params_fp: str
    status: str  # ok | validation_error | auth_error | rate_limited | error
    rows: int | None
    duration_ms: float | None
    detail: str | None = None


class AuditLogger:
    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()

    def log(
        self,
        endpoint: str,
        params: dict[str, Any] | None = None,
        status: str = "ok",
        user: str | None = None,
        rows: int | None = None,
        duration_ms: float | None = None,
        detail: str | None = None,
        now: float | None = None,
    ) -> AuditRecord:
        rec = AuditRecord(
            ts=now if now is not None else time.time(),
            endpoint=endpoint,
            user=user,
            params_fp=params_fingerprint(params or {}),
            status=status,
            rows=rows,
            duration_ms=duration_ms,
            detail=detail,
        )
        line = json.dumps(rec.__dict__, sort_keys=True)
        with self._lock:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "a", encoding="utf-8") as f:
                f.write(line + "\n")
        return rec

    def as_dataframe(self, spark: SparkSession) -> DataFrame:
        return spark.read.json(self.path)
