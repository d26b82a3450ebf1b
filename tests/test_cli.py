"""CLI surface tests (python -m flapi_spark): metadata verbs run
in-process via main(); `run` reuses the session fixture indirectly by
invoking the executor path through a tiny template."""

import json

import pytest

from flapi_spark.__main__ import main


@pytest.fixture()
def project(tmp_path):
    d = tmp_path / "proj"
    (d / "endpoints").mkdir(parents=True)
    (d / "endpoints" / "one.yaml").write_text(
        "url-path: /one/\ntemplate-text: SELECT 1 AS one\n"
    )
    (d / "endpoints" / "two.yaml").write_text(
        "url-path: /two/\n"
        "template-text: SELECT {{params.n}} AS n\n"
        "request:\n"
        "  - field-name: n\n"
        "    field-in: query\n"
        "    validators:\n"
        "      - type: int\n"
    )
    return d


def test_validate_ok_and_failure(project, capsys):
    assert main(["validate", "-c", str(project)]) == 0
    out = capsys.readouterr().out
    assert "2 endpoint(s) checked, 0 error(s)" in out
    # duplicate url-path -> exit 1
    (project / "endpoints" / "dup.yaml").write_text(
        "url-path: /one/\ntemplate-text: SELECT 2 AS two\n"
    )
    assert main(["validate", "-c", str(project)]) == 1


def test_list_endpoints(project, capsys):
    assert main(["list", "-c", str(project)]) == 0
    out = capsys.readouterr().out
    assert "/one/" in out and "/two/" in out and "params=[n]" in out


def test_pack_and_bundle_info(project, tmp_path, capsys):
    z = str(tmp_path / "b.zip")
    assert main(["pack", "-c", str(project), "-o", z]) == 0
    capsys.readouterr()
    assert main(["bundle-info", "-b", z]) == 0
    out = capsys.readouterr().out
    assert "endpoints/one.yaml" in out
    # a secret blocks packing
    (project / "creds.env").write_text("X=1\n")
    assert main(["pack", "-c", str(project), "-o", z]) == 1


def test_run_endpoint_json(project, spark, capsys):
    # `run` builds its own session via get_spark(); the session-scoped
    # fixture already holds it, so this reuses the same JVM
    assert main(
        ["run", "-c", str(project), "-u", "/two/", "-p", "n=41"]
    ) == 0
    out = capsys.readouterr().out.strip()
    rows = json.loads(out)
    assert rows == [{"n": 41}]


def test_run_unknown_endpoint(project, capsys):
    assert main(["run", "-c", str(project), "-u", "/nope/"]) == 1


def test_openapi_cli_loads_project_connections(capsys):
    """openapi probes templates, so {{conn.*}} must resolve through the
    project flapi.yaml — previously the command passed no registry and
    any connection-templated endpoint failed to render."""
    import json as _json
    import os

    from flapi_spark.__main__ import main

    os.environ.setdefault("NOTES_PASSWORD", "pw")
    rc = main(["openapi", "-c", "examples/project/endpoints"])
    assert rc == 0
    doc = _json.loads(capsys.readouterr().out)
    assert "/customers/" in doc["paths"]          # conn-templated read
    assert "post" in doc["paths"]["/customer-notes"]  # write endpoint
