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


class TestEnvOverrides:
    """12-factor env-var precedence, vector-mirrored from the
    reference's test/integration/test_env_overrides.py (issues
    #47/#63): CLI flag > env var > built-in default; invalid
    FLAPI_PORT / FLAPI_LOG_LEVEL are single-line hard errors, never
    silent coercions."""

    def _resolve(self, **kw):
        from flapi_spark.__main__ import resolve_runtime_settings

        return resolve_runtime_settings(**kw)

    def test_env_fallback_used_when_cli_absent(self):
        s = self._resolve(env={
            "FLAPI_CONFIG": "/tmp/cfg", "FLAPI_LOG_LEVEL": "debug",
            "FLAPI_PORT": "9099", "FLAPI_HOST": "127.0.0.1",
        })
        assert s == {"config": "/tmp/cfg", "port": 9099,
                     "host": "127.0.0.1", "log_level": "debug"}

    def test_cli_beats_env(self):
        s = self._resolve(
            config="/cli/cfg", port=8123, host="0.0.0.0",
            log_level="error",
            env={"FLAPI_CONFIG": "/env/cfg", "FLAPI_LOG_LEVEL": "debug",
                 "FLAPI_PORT": "9099", "FLAPI_HOST": "127.0.0.1"},
        )
        assert s == {"config": "/cli/cfg", "port": 8123,
                     "host": "0.0.0.0", "log_level": "error"}

    def test_defaults_when_nothing_given(self):
        s = self._resolve(env={})
        assert s == {"config": None, "port": None, "host": None,
                     "log_level": "info"}

    def test_empty_env_values_ignored(self):
        # reference: *env != '\0' — empty string is "not set"
        s = self._resolve(env={"FLAPI_CONFIG": "", "FLAPI_PORT": "",
                               "FLAPI_LOG_LEVEL": "", "FLAPI_HOST": ""})
        assert s["config"] is None and s["port"] is None
        assert s["log_level"] == "info"

    @pytest.mark.parametrize(
        "bad", ["abc", "12.5", "0", "65536", "-1", "8080 ", "8e3"]
    )
    def test_invalid_port_rejected(self, bad):
        from flapi_spark.__main__ import SettingsError

        with pytest.raises(SettingsError, match="FLAPI_PORT"):
            self._resolve(env={"FLAPI_PORT": bad})

    def test_port_stoi_semantics_accepts_leading_space_and_zeros(self):
        # std::stoi skips leading whitespace and its consumed count
        # includes it (main.cpp:471-479), so ' 8080' and '01' are
        # VALID reference ports; trailing junk is not
        assert self._resolve(env={"FLAPI_PORT": " 8080"})["port"] == 8080
        assert self._resolve(env={"FLAPI_PORT": "01"})["port"] == 1

    @pytest.mark.parametrize("bad", ["DEBUG", "verbose", "trace", "warn"])
    def test_invalid_log_level_rejected(self, bad):
        from flapi_spark.__main__ import SettingsError

        with pytest.raises(SettingsError, match="log level"):
            self._resolve(env={"FLAPI_LOG_LEVEL": bad})

    def test_cli_invalid_log_level_also_rejected(self):
        # CLI values pass through the same validator (reference
        # validates the RESOLVED level, wherever it came from)
        from flapi_spark.__main__ import SettingsError

        with pytest.raises(SettingsError):
            self._resolve(log_level="DEBUG", env={})

    def test_main_uses_flapi_config_env(self, tmp_path, monkeypatch, capsys):
        from flapi_spark.__main__ import main

        d = tmp_path / "eps"
        d.mkdir()
        (d / "e.yaml").write_text(
            "url-path: /x\ntemplate-text: SELECT 1 AS one\n"
        )
        monkeypatch.setenv("FLAPI_CONFIG", str(d))
        assert main(["list"]) == 0
        assert "/x" in capsys.readouterr().out

    def test_main_errors_without_any_config(self, monkeypatch, capsys):
        from flapi_spark.__main__ import main

        monkeypatch.delenv("FLAPI_CONFIG", raising=False)
        assert main(["list"]) == 1
        assert "FLAPI_CONFIG" in capsys.readouterr().err

    def test_main_invalid_env_port_is_single_line_error(
        self, tmp_path, monkeypatch, capsys
    ):
        from flapi_spark.__main__ import main, resolve_runtime_settings

        monkeypatch.setenv("FLAPI_PORT", "not-a-port")
        # settings layer raises; main's CLI surface has no port flag to
        # override it, so commands that resolve ports would abort —
        # assert the error text shape the reference emits
        from flapi_spark.__main__ import SettingsError

        try:
            resolve_runtime_settings(env={"FLAPI_PORT": "not-a-port"})
        except SettingsError as e:
            msg = str(e)
        assert "invalid FLAPI_PORT 'not-a-port'" in msg
        assert "1..65535" in msg


class TestEndpointRepository:
    """Vectors from reference test/cpp/test_endpoint_repository.cpp."""

    def _rest(self, path, method="GET", template="test.sql"):
        from flapi_spark.config import EndpointConfig

        return EndpointConfig.from_dict({
            "url-path": path, "method": method,
            "template-source": template,
        })

    def _tool(self, name):
        from flapi_spark.config import EndpointConfig

        return EndpointConfig.from_dict({
            "template-source": "test.sql",
            "mcp-tool": {"name": name, "description": "Test tool"},
        })

    def _dual(self, path, name, method="POST"):
        from flapi_spark.config import EndpointConfig

        return EndpointConfig.from_dict({
            "url-path": path, "method": method,
            "template-source": "test.sql",
            "mcp-tool": {"name": name, "description": "d"},
        })

    def test_counts_and_clear(self):
        from flapi_spark.routes import EndpointRepository

        repo = EndpointRepository()
        assert repo.count() == 0
        repo.add_endpoint(self._rest("/customers", "GET"))
        repo.add_endpoint(self._rest("/customers", "POST"))
        repo.add_endpoint(self._rest("/orders", "GET"))
        repo.add_endpoint(self._tool("customer_lookup"))
        assert repo.count() == 4
        assert repo.count_rest_endpoints() == 3
        assert repo.count_mcp_endpoints() == 1
        repo.clear()
        assert repo.count() == 0

    def test_methods_are_separate_endpoints(self):
        from flapi_spark.routes import EndpointRepository

        repo = EndpointRepository()
        repo.add_endpoint(self._rest("/customers", "GET"))
        repo.add_endpoint(self._rest("/customers", "POST"))
        assert repo.has_rest_endpoint("/customers", "GET")
        assert repo.has_rest_endpoint("/customers", "POST")
        assert not repo.has_rest_endpoint("/customers", "DELETE")

    def test_replace_same_path_method(self):
        from flapi_spark.routes import EndpointRepository

        repo = EndpointRepository()
        repo.add_endpoint(self._rest("/customers", "GET", "customers.sql"))
        repo.add_endpoint(self._rest("/customers", "GET", "customers_v2.sql"))
        assert repo.count_rest_endpoints() == 1
        got = repo.get_endpoint_by_rest_path("/customers", "GET")
        assert got.template_source == "customers_v2.sql"

    def test_remove_semantics(self):
        from flapi_spark.routes import EndpointRepository

        repo = EndpointRepository()
        repo.add_endpoint(self._rest("/customers", "GET"))
        repo.add_endpoint(self._rest("/orders", "GET"))
        assert repo.remove_rest_endpoint("/customers", "GET")
        assert not repo.remove_rest_endpoint("/nonexistent", "GET")
        assert repo.count_rest_endpoints() == 1
        assert repo.has_rest_endpoint("/orders", "GET")

    def test_dual_endpoint_counts_once_removes_independently(self):
        from flapi_spark.routes import EndpointRepository

        repo = EndpointRepository()
        repo.add_endpoint(self._dual("/customers", "create_customer"))
        assert repo.count() == 1
        assert repo.count_rest_endpoints() == 1
        assert repo.count_mcp_endpoints() == 1
        assert repo.get_endpoint_by_rest_path("/customers", "POST") is \
            repo.get_endpoint_by_mcp_name("create_customer")
        assert repo.remove_rest_endpoint("/customers", "POST")
        assert repo.count_rest_endpoints() == 0
        assert repo.has_mcp_endpoint("create_customer")

    def test_get_all_and_find(self):
        from flapi_spark.routes import EndpointRepository

        repo = EndpointRepository()
        repo.add_endpoint(self._dual("/customers", "create_customer"))
        repo.add_endpoint(self._rest("/orders", "GET"))
        eps = repo.get_all_endpoints()
        assert len(eps) == 2  # the dual endpoint appears once
        posts = repo.find_endpoints(lambda e: e.method == "POST")
        assert len(posts) == 1


def test_run_bundle_serves_from_archive(tmp_path, capsys, spark):
    """pack -> run-bundle executes an endpoint with configs AND
    templates served straight from the archive (the reference
    binary's self-contained mode; nothing unpacked)."""
    import json as _json

    from flapi_spark.__main__ import main
    from flapi_spark.bundle import pack_project

    proj = tmp_path / "proj"
    proj.mkdir()
    (proj / "nums.yaml").write_text(
        "url-path: /nums\n"
        "template-source: nums.sql\n"
        "with-pagination: false\n"
        "request:\n"
        "  - field-name: n\n"
        "    field-in: query\n"
        "    validators:\n"
        "      - type: int\n"
        "        min: 0\n"
    )
    (proj / "nums.sql").write_text(
        "SELECT {{{ params.n }}} * 2 AS doubled"
    )
    out = tmp_path / "proj.zip"
    pack_project(proj, out)
    rc = main(["run-bundle", "-b", str(out), "-u", "/nums", "-p", "n=21"])
    assert rc == 0
    rows = _json.loads(capsys.readouterr().out)
    assert rows == [{"doubled": 42}]


def test_run_bundle_nested_endpoints_dir(tmp_path, capsys, spark):
    """Bundles with endpoints nested under a subdir (the standard
    project layout) resolve YAMLs and their sibling templates at any
    depth."""
    import json as _json

    from flapi_spark.__main__ import main
    from flapi_spark.bundle import pack_project

    proj = tmp_path / "proj"
    (proj / "endpoints").mkdir(parents=True)
    (proj / "endpoints" / "deep.yaml").write_text(
        "url-path: /deep\n"
        "template-source: deep.sql\n"
        "with-pagination: false\n"
    )
    (proj / "endpoints" / "deep.sql").write_text("SELECT 7 AS seven")
    out = tmp_path / "p.zip"
    pack_project(proj, out)
    rc = main(["run-bundle", "-b", str(out), "-u", "/deep"])
    assert rc == 0
    assert _json.loads(capsys.readouterr().out) == [{"seven": 7}]


def test_run_bundle_write_endpoint_and_env_expansion(
    tmp_path, capsys, spark, monkeypatch
):
    """run-bundle routes write endpoints through execute_write (same
    as `run`) and expands {{env.X}} placeholders in bundle YAMLs."""
    import json as _json

    from flapi_spark.__main__ import main
    from flapi_spark.bundle import pack_project
    from flapi_spark.writes import _rm_table

    monkeypatch.setenv("RB_TABLE", "rb_notes")
    _rm_table(spark, "rb_notes")
    spark.sql("CREATE TABLE rb_notes (id BIGINT, note STRING) USING parquet")
    try:
        proj = tmp_path / "proj"
        proj.mkdir()
        (proj / "add.yaml").write_text(
            "url-path: /add\n"
            "method: POST\n"
            "template-text: >-\n"
            "  INSERT INTO {{env.RB_TABLE}} VALUES (1, 'hi')\n"
        )
        out = tmp_path / "w.zip"
        pack_project(proj, out)
        rc = main(["run-bundle", "-b", str(out), "-u", "/add"])
        assert rc == 0
        got = _json.loads(capsys.readouterr().out)
        assert got["rows_affected"] == 1
        assert spark.table("rb_notes").count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS rb_notes")


def test_run_bundle_include_directive_gets_clear_error(
    tmp_path, capsys
):
    from flapi_spark.__main__ import main
    from flapi_spark.bundle import pack_project

    proj = tmp_path / "proj"
    proj.mkdir()
    (proj / "inc.yaml").write_text(
        "url-path: /inc\n"
        "template-text: SELECT 1\n"
        "{{include:auth from shared.yaml}}\n"
    )
    (proj / "shared.yaml").write_text("auth:\n  enabled: false\n")
    out = tmp_path / "i.zip"
    pack_project(proj, out)
    rc = main(["run-bundle", "-b", str(out), "-u", "/inc"])
    assert rc == 1
    assert "include" in capsys.readouterr().err


def test_curate_verb_runs_pipeline_and_writes_keepset(
    spark, sf_dir, tmp_path, capsys
):
    """Round 10: `flapi_spark curate` runs a YAML pipeline end-to-end,
    prints the funnel (TSV and --json forms agree), and -o writes the
    surviving keep-set as parquet matching the funnel's final
    count."""
    import json as _json

    cfg = tmp_path / "p.yaml"
    cfg.write_text("stages:\n  - url_filter\n  - quality\n")
    out = str(tmp_path / "keep.parquet")
    assert main([
        "curate", "--pipeline", str(cfg), "--data", sf_dir, "-o", out,
    ]) == 0
    tsv = capsys.readouterr().out.strip().splitlines()
    assert tsv[0].startswith("stage\tname")
    rows = [line.split("\t") for line in tsv[1:]]
    assert [r[1] for r in rows] == ["url_filter", "quality"]
    n_final = int(rows[-1][3])
    assert spark.read.parquet(out).count() == n_final

    assert main([
        "curate", "--pipeline", str(cfg), "--data", sf_dir, "--json",
    ]) == 0
    jrows = [
        _json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert [j["stage"] for j in jrows] == [1, 2]
    assert [(j["n_in"], j["n_out"]) for j in jrows] == [
        (int(r[2]), int(r[3])) for r in rows
    ]


def test_curate_verb_rejects_bad_config(sf_dir, tmp_path, capsys):
    cfg = tmp_path / "empty.yaml"
    cfg.write_text("name: nothing\n")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty 'stages'"):
        main(["curate", "--pipeline", str(cfg), "--data", sf_dir])


def test_curate_verb_materializes_shards(spark, sf_dir, tmp_path, capsys):
    """round 10d: --shards-out writes the curated corpus as ordered
    shard=K parquet and prints the manifest; doc total matches the
    funnel's final count."""
    cfg = tmp_path / "p.yaml"
    cfg.write_text("stages:\n  - quality\n")
    out = str(tmp_path / "shards")
    assert main([
        "curate", "--pipeline", str(cfg), "--data", sf_dir,
        "--shards-out", out, "--n-shards", "3",
    ]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    n_final = int(lines[1].split("\t")[3])
    manifest = [l for l in lines if l.startswith("shard=")]
    assert len(manifest) == 3
    assert sum(int(l.split("\t")[1].split("=")[1]) for l in manifest) \
        == n_final
    written = spark.read.parquet(out)
    assert written.count() == n_final
    assert {r.shard for r in written.select("shard").distinct().collect()} \
        == {0, 1, 2}


def test_curate_delta_verb_bootstrap_then_batch(
    spark, sf_dir, tmp_path, capsys
):
    """Round 10f: `flapi_spark curate-delta --bootstrap` builds the T0
    world and curates the delta span in one command; the keep-set
    parquet matches the funnel's final count and holds only delta
    ids; funnel matches curate_delta's library result."""
    from flapi_spark.pipeline_delta import (
        DeltaIndexes, bootstrap_delta_indexes, curate_base, curate_delta,
    )
    from flapi_spark.writes import _rm_table

    tables = ("cli_dband", "cli_dshingle", "cli_dexact")
    for t in tables:
        _rm_table(spark, t)
    out = str(tmp_path / "delta_keep.parquet")
    try:
        assert main([
            "curate-delta", "--data", sf_dir, "--since", "400",
            "--bootstrap",
            "--band-table", "cli_dband",
            "--shingle-store", "cli_dshingle",
            "--exact-table", "cli_dexact",
            "-o", out,
        ]) == 0
        tsv = capsys.readouterr().out.strip().splitlines()
        rows = [line.split("\t") for line in tsv[1:]]
        assert [r[1] for r in rows] == [
            "quality", "langid", "exact_dedup", "near_dedup", "decontam",
        ]
        got = spark.read.parquet(out)
        ids = [r.doc_id for r in got.collect()]
        assert len(ids) == int(rows[-1][3])
        assert ids and min(ids) >= 400
        # funnel parity with the library call against the same tables
        idx = DeltaIndexes(
            band_table="cli_dband", shingle_store="cli_dshingle",
            exact_table="cli_dexact",
        )
        rep = curate_delta(spark, sf_dir, 400, idx)
        assert [(s["n_in"], s["n_out"]) for s in rep.stages] == [
            (int(r[2]), int(r[3])) for r in rows
        ]
    finally:
        for t in tables:
            _rm_table(spark, t)


def test_curate_delta_stages_do_not_rebase_bootstrap(
    spark, sf_dir, tmp_path, capsys
):
    """ADVICE r10: with --bootstrap, --stages gates ONLY the ingest
    chain — the T0 base curation stays on the default 5-stage chain
    (the funnel_full convention) unless --base-stages says otherwise."""
    from flapi_spark.pipeline_delta import curate_base
    from flapi_spark.writes import _rm_table

    tables = ("cli_dband2", "cli_dshingle2", "cli_dexact2")
    args = [
        "curate-delta", "--data", sf_dir, "--since", "400",
        "--bootstrap", "--stages", "quality",
        "--band-table", tables[0],
        "--shingle-store", tables[1],
        "--exact-table", tables[2],
    ]
    try:
        for t in tables:
            _rm_table(spark, t)
        assert main(args) == 0
        capsys.readouterr()
        # T0 world == DEFAULT 5-stage base curation, not quality-only
        base_default = curate_base(spark, sf_dir, 400).keep.count()
        assert spark.table(tables[2]).count() == base_default
        # --base-stages overrides the base chain explicitly
        for t in tables:
            _rm_table(spark, t)
        assert main(args + ["--base-stages", "quality"]) == 0
        capsys.readouterr()
        base_quality = curate_base(
            spark, sf_dir, 400, stages=["quality"]
        ).keep.count()
        assert base_quality > base_default  # fewer gates keep more
        assert spark.table(tables[2]).count() == base_quality
    finally:
        for t in tables:
            _rm_table(spark, t)


def test_curate_delta_flag_validation():
    """Flags that silently do nothing are operator traps: --base-stages
    without --bootstrap and --marker-dir without --maintain fail fast."""
    import pytest

    base = ["curate-delta", "--data", "/x", "--since", "1"]
    with pytest.raises(SystemExit, match="base-stages"):
        main(base + ["--base-stages", "quality"])
    with pytest.raises(SystemExit, match="marker-dir"):
        main(base + ["--marker-dir", "/tmp/m"])
