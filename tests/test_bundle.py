"""Bundle pack/unpack parity tests (reference: pack_test.cpp — deny
list, round-trip, secrets refusal/override, reproducibility; plus the
zip-slip containment from path_validator.cpp)."""

import hashlib
import zipfile

import pytest

from flapi_spark.bundle import (
    PackError,
    bundle_info,
    is_secret_excluded,
    load_endpoints_from_bundle,
    pack_project,
    unpack_bundle,
)


def test_secret_deny_list_vectors():
    # reference pack_test.cpp "IsSecretExcluded matches the default deny list"
    assert is_secret_excluded(".env")
    assert is_secret_excluded("prod.env")
    assert is_secret_excluded("conf/.env")
    assert is_secret_excluded("secrets/api.yaml")
    assert is_secret_excluded("nested/secrets/token.txt")
    assert is_secret_excluded("tls/server.pem")
    assert is_secret_excluded("id_rsa.key")
    assert not is_secret_excluded("endpoints/customers.yaml")
    assert not is_secret_excluded("environment.yaml")
    assert not is_secret_excluded("keynotes.md")
    assert not is_secret_excluded("monkey.txt")


def _write_project(d):
    (d / "endpoints").mkdir()
    (d / "endpoints" / "c.yaml").write_text(
        "url-path: /customers/\ntemplate-text: SELECT 1 AS one\n"
    )
    (d / "README.md").write_text("api bundle\n")


def test_pack_round_trips_and_lists(tmp_path):
    src = tmp_path / "proj"
    src.mkdir()
    _write_project(src)
    z = tmp_path / "bundle.zip"
    entries = pack_project(src, z)
    assert entries == ["README.md", "endpoints/c.yaml"]
    info = {i["name"]: i for i in bundle_info(z)}
    assert set(info) == set(entries)
    assert info["README.md"]["size"] == len("api bundle\n")
    out = tmp_path / "restored"
    restored = unpack_bundle(z, out)
    assert sorted(restored) == entries
    assert (out / "endpoints" / "c.yaml").read_text().startswith("url-path")


def test_pack_refuses_secrets_unless_allowed(tmp_path):
    src = tmp_path / "proj"
    src.mkdir()
    _write_project(src)
    (src / "prod.env").write_text("PASSWORD=x\n")
    z = tmp_path / "bundle.zip"
    with pytest.raises(PackError, match="prod.env"):
        pack_project(src, z)
    entries = pack_project(src, z, allow_secrets=True)
    assert "prod.env" in entries


def test_pack_is_byte_reproducible(tmp_path):
    src = tmp_path / "proj"
    src.mkdir()
    _write_project(src)
    z1, z2 = tmp_path / "a.zip", tmp_path / "b.zip"
    pack_project(src, z1, source_date_epoch=1700000000)
    pack_project(src, z2, source_date_epoch=1700000000)
    h = lambda p: hashlib.sha256(p.read_bytes()).hexdigest()
    assert h(z1) == h(z2)
    # different epoch -> different bytes (timestamps are IN the zip)
    z3 = tmp_path / "c.zip"
    pack_project(src, z3, source_date_epoch=1800000000)
    assert h(z1) != h(z3)


def test_unpack_rejects_zip_slip(tmp_path):
    z = tmp_path / "evil.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("../escape.txt", "pwned")
    with pytest.raises(PackError, match="escapes destination"):
        unpack_bundle(z, tmp_path / "dst")
    assert not (tmp_path / "escape.txt").exists()


def test_load_endpoints_from_bundle(tmp_path):
    src = tmp_path / "proj"
    src.mkdir()
    _write_project(src)
    z = tmp_path / "bundle.zip"
    pack_project(src, z)
    endpoints, d = load_endpoints_from_bundle(z)
    assert len(endpoints) == 1
    assert endpoints[0].url_path == "/customers/"


def test_unpack_foreign_archive_with_directory_entries(tmp_path):
    """Archives produced by other tools carry explicit 'dir/' members;
    those must become directories, not zero-byte files that collide
    with the 'dir/file' member that follows."""
    import zipfile

    from flapi_spark.bundle import unpack_bundle

    zp = tmp_path / "foreign.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("sub/", "")            # explicit directory entry
        z.writestr("sub/file.txt", "hi")
    out = unpack_bundle(zp, tmp_path / "dst")
    assert (tmp_path / "dst" / "sub" / "file.txt").read_text() == "hi"
    assert "sub/file.txt" in out and "sub/" not in out
