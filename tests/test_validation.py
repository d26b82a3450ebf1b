import datetime

import pytest

from flapi_spark.validation import (
    RequestField,
    ValidationError,
    Validator,
    check_sql_injection,
    validate_params,
)


def fld(name, vtype="string", required=False, default=None, **kw):
    return RequestField(
        field_name=name,
        required=required,
        default=default,
        validators=[Validator(type=vtype, **kw)],
    )


def test_int_ok_and_typed():
    out = validate_params([fld("id", "int", min=1, max=100)], {"id": "42"})
    assert out["id"] == 42 and isinstance(out["id"], int)


def test_int_range_violation():
    with pytest.raises(ValidationError):
        validate_params([fld("id", "int", min=1, max=10)], {"id": "42"})


def test_int_not_a_number():
    with pytest.raises(ValidationError):
        validate_params([fld("id", "int")], {"id": "abc"})


def test_double():
    out = validate_params([fld("x", "double", min=0)], {"x": "3.5"})
    assert out["x"] == 3.5


def test_boolean():
    assert validate_params([fld("b", "boolean")], {"b": "true"})["b"] is True
    assert validate_params([fld("b", "boolean")], {"b": "0"})["b"] is False
    with pytest.raises(ValidationError):
        validate_params([fld("b", "boolean")], {"b": "maybe"})


def test_date_range():
    out = validate_params(
        [fld("d", "date", min="2000-01-01", max="2025-12-31")], {"d": "2020-06-15"}
    )
    assert out["d"] == datetime.date(2020, 6, 15)
    with pytest.raises(ValidationError):
        validate_params([fld("d", "date", max="2025-12-31")], {"d": "2026-01-01"})


def test_time():
    out = validate_params([fld("t", "time")], {"t": "13:45:00"})
    assert out["t"] == datetime.time(13, 45)


def test_uuid():
    u = "123e4567-e89b-12d3-a456-426614174000"
    assert validate_params([fld("u", "uuid")], {"u": u})["u"] == u
    with pytest.raises(ValidationError):
        validate_params([fld("u", "uuid")], {"u": "nope"})


def test_email():
    assert validate_params([fld("e", "email")], {"e": "a@b.co"})["e"] == "a@b.co"
    with pytest.raises(ValidationError):
        validate_params([fld("e", "email")], {"e": "not-an-email"})


def test_enum():
    f = fld("seg", "enum", allowed_values=["AUTOMOBILE", "BUILDING"])
    assert validate_params([f], {"seg": "BUILDING"})["seg"] == "BUILDING"
    with pytest.raises(ValidationError):
        validate_params([f], {"seg": "PLASTICS"})


def test_enum_case_insensitive():
    f = fld("seg", "enum", allowed_values=["AUTOMOBILE"], case_insensitive=True)
    assert validate_params([f], {"seg": "automobile"})["seg"] == "AUTOMOBILE"


def test_string_regex():
    f = fld("name", "string", regex="^[A-Za-z ]{2,50}$")
    assert validate_params([f], {"name": "Jane Doe"})["name"] == "Jane Doe"
    with pytest.raises(ValidationError):
        validate_params([f], {"name": "x; DROP TABLE"})


def test_required_missing():
    with pytest.raises(ValidationError):
        validate_params([fld("id", "int", required=True)], {})


def test_default_applied():
    out = validate_params([fld("lim", "int", default=10)], {})
    assert out["lim"] == 10


def test_sql_injection_screen_on_string():
    f = fld("q", "string", prevent_sql_injection=True)
    with pytest.raises(ValidationError):
        validate_params([f], {"q": "1; DROP TABLE users"})
    assert validate_params([f], {"q": "hello world"})["q"] == "hello world"


def test_typed_field_bypasses_keyword_screen():
    # typed prepared-bound sites are structurally injection-proof
    # (reference: request_validator.cpp:77-105)
    f = RequestField(
        field_name="id",
        validators=[Validator(type="int", prevent_sql_injection=True)],
    )
    assert validate_params([f], {"id": "7"})["id"] == 7


def test_check_sql_injection_hits():
    assert check_sql_injection("UNION SELECT * FROM x")
    assert check_sql_injection("a'b")
    assert not check_sql_injection("ordinary text")


def test_undeclared_params_pass_through():
    out = validate_params([fld("id", "int")], {"id": "1", "offset": "5"})
    assert out["offset"] == "5"
