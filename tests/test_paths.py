"""Path validation (reference: path_validator.cpp — URL-decode first,
traversal rejection, scheme allowlist, prefix containment, symlink
resolution)."""
import os

import pytest

from flapi_spark.paths import PathValidationError, PathValidator


def test_rejects_plain_traversal(tmp_path):
    v = PathValidator()
    with pytest.raises(PathValidationError, match="traversal"):
        v.validate("../secrets.yaml", tmp_path)


def test_rejects_url_encoded_traversal(tmp_path):
    v = PathValidator()
    with pytest.raises(PathValidationError, match="traversal"):
        v.validate("%2e%2e%2fsecrets.yaml", tmp_path)
    with pytest.raises(PathValidationError, match="traversal"):
        v.validate("sub/%2E%2E/%2E%2E/etc/passwd", tmp_path)


def test_rejects_empty_and_disallowed_scheme(tmp_path):
    v = PathValidator()
    with pytest.raises(PathValidationError):
        v.validate("", tmp_path)
    with pytest.raises(PathValidationError, match="scheme"):
        v.validate("ftp://host/data.csv", tmp_path)


def test_allows_remote_allowed_schemes():
    v = PathValidator()
    assert v.validate("s3://bucket/key.parquet") == "s3://bucket/key.parquet"
    assert v.validate("https://x/y.csv") == "https://x/y.csv"


def test_relative_resolves_under_base(tmp_path):
    v = PathValidator()
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "t.sql").write_text("SELECT 1")
    got = v.validate("sub/t.sql", tmp_path)
    assert got == str(tmp_path / "sub" / "t.sql")


def test_symlink_escape_rejected(tmp_path):
    outside = tmp_path / "outside"
    outside.mkdir()
    (outside / "secret.sql").write_text("SELECT 'secret'")
    base = tmp_path / "cfg"
    base.mkdir()
    os.symlink(outside / "secret.sql", base / "link.sql")
    v = PathValidator()
    with pytest.raises(PathValidationError, match="allowed directory"):
        v.validate("link.sql", base)


def test_template_source_traversal_blocked(tmp_path):
    from flapi_spark.config import EndpointConfig

    ep = EndpointConfig(
        url_path="/x", template_source="../../etc/passwd", base_dir=tmp_path
    )
    with pytest.raises(PathValidationError):
        ep.load_template()


def test_include_traversal_blocked(tmp_path):
    from flapi_spark.config import load_endpoint_yaml

    (tmp_path / "ep.yaml").write_text(
        "url-path: /x\n{{include:request from ../../outside.yaml}}\n"
    )
    with pytest.raises(PathValidationError):
        load_endpoint_yaml(tmp_path / "ep.yaml")
