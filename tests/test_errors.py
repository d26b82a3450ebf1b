"""Typed error taxonomy, vector-mirrored from the reference's
test/cpp/test_error.cpp (categories, status codes, JSON envelope) plus
the repo-specific exception classifier."""

from flapi_spark.errors import Error, classify_exception


class TestErrorConstruction:
    def test_validation(self):
        e = Error.validation("Invalid input", "Field 'id' must be numeric")
        assert e.category == "Validation"
        assert e.http_status_code == 400
        assert e.message == "Invalid input"
        assert e.details == "Field 'id' must be numeric"

    def test_database(self):
        e = Error.database("Query failed", "Table 'users' not found")
        assert e.category == "Database" and e.http_status_code == 500

    def test_config_empty_details(self):
        e = Error.config("Invalid config")
        assert e.category == "Configuration"
        assert e.http_status_code == 500 and e.details == ""

    def test_auth(self):
        assert Error.auth("Invalid token").http_status_code == 401

    def test_not_found(self):
        assert Error.not_found("Resource not found").http_status_code == 404

    def test_internal(self):
        assert Error.internal("boom").http_status_code == 500


class TestErrorJson:
    def test_envelope_shape(self):
        j = Error.validation("bad", "why").to_json()
        assert j == {"success": False,
                     "error": {"category": "Validation", "message": "bad",
                               "details": "why"}}

    def test_details_omitted_when_empty(self):
        j = Error.internal("x").to_json()
        assert "details" not in j["error"]


class TestClassifier:
    def test_validation_error(self):
        from flapi_spark.validation import ValidationError

        e = classify_exception(ValidationError(["id must be int"]))
        assert e.category == "Validation" and e.http_status_code == 400
        assert "id must be int" in e.details

    def test_auth_error(self):
        from flapi_spark.auth import AuthError

        assert classify_exception(AuthError("nope")).http_status_code == 401

    def test_endpoint_not_found(self):
        from flapi_spark.config_service import EndpointNotFound

        assert classify_exception(
            EndpointNotFound("no slug")
        ).http_status_code == 404

    def test_write_error(self):
        from flapi_spark.writes import WriteError

        assert classify_exception(
            WriteError("bad statement")
        ).category == "Validation"

    def test_rate_limit_is_429(self):
        from flapi_spark.mcp import RateLimitError

        assert classify_exception(
            RateLimitError("slow down")
        ).http_status_code == 429

    def test_unknown_exception_is_internal(self):
        e = classify_exception(RuntimeError("?"))
        assert e.category == "Internal" and e.http_status_code == 500

    def test_value_error_is_validation(self):
        assert classify_exception(ValueError("x")).category == "Validation"
