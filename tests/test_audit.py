"""Audit-log parity (reference: audit_logger_test.cpp,
security_auditor.cpp): every executed endpoint call is recorded with a
param fingerprint, never raw values; the log is queryable as a
DataFrame."""

import json
import os

import pytest

from flapi_spark.audit import AuditLogger, params_fingerprint
from flapi_spark.validation import ValidationError
from tests.test_executor import customers_endpoint


@pytest.fixture()
def audited_executor(spark, tmp_path):
    from flapi_spark.executor import QueryExecutor
    from flapi_spark.sources.registry import Connection, ConnectionRegistry

    sf = os.environ.get("FLAPI_SPARK_TEST_SF", "/root/testdata/sf0.001")
    reg = ConnectionRegistry()
    reg.add(
        Connection(
            name="customers-parquet",
            properties={"path": os.path.join(sf, "customer.parquet")},
        )
    )
    audit = AuditLogger(str(tmp_path / "audit.jsonl"))
    return QueryExecutor(spark, reg, audit=audit), audit


def _lines(audit):
    with open(audit.path) as f:
        return [json.loads(line) for line in f]


def test_ok_call_logged_with_fingerprint_not_values(audited_executor):
    ex, audit = audited_executor
    ex.execute(customers_endpoint(), {"segment": "BUILDING"}, user="alice")
    (rec,) = _lines(audit)
    assert rec["endpoint"] == "/customers/"
    assert rec["status"] == "ok"
    assert rec["user"] == "alice"
    assert rec["rows"] is not None and rec["rows"] > 0
    assert rec["duration_ms"] > 0
    assert rec["params_fp"] == params_fingerprint({"segment": "BUILDING"})
    assert "BUILDING" not in json.dumps(rec)  # raw values never logged


def test_validation_error_logged_and_reraised(audited_executor):
    ex, audit = audited_executor
    with pytest.raises(ValidationError):
        ex.execute(customers_endpoint(), {"segment": "NOT_A_SEGMENT"})
    (rec,) = _lines(audit)
    assert rec["status"] == "validation_error"
    assert rec["detail"] == "ValidationError"


def test_fingerprint_is_order_insensitive():
    assert params_fingerprint({"a": 1, "b": 2}) == params_fingerprint(
        {"b": 2, "a": 1}
    )
    assert params_fingerprint({"a": 1}) != params_fingerprint({"a": 2})


def test_audit_log_queryable_as_dataframe(audited_executor, spark):
    ex, audit = audited_executor
    ex.execute(customers_endpoint(), {"segment": "BUILDING"})
    ex.execute(customers_endpoint(), {})
    df = audit.as_dataframe(spark)
    assert df.count() == 2
    assert df.where(df.status == "ok").count() == 2
