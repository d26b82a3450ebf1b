"""Command-line surface: the reference binary's non-HTTP verbs.

    python -m flapi_spark validate  -c DIR            # config check
    python -m flapi_spark list      -c DIR            # endpoints table
    python -m flapi_spark run       -c DIR -u /path/ [-p k=v ...]
    python -m flapi_spark openapi   -c DIR            # OpenAPI 3 JSON
    python -m flapi_spark pack      -c DIR -o out.zip [--allow-secrets]
    python -m flapi_spark bundle-info -b out.zip
    python -m flapi_spark run-bundle -b out.zip -u /path [-p k=v ...]

`run` spins a local SparkSession (the serve analogue: one endpoint,
one execution, JSON rows to stdout); everything else is metadata-only
and needs no JVM. Exit code 0 on success, 1 on validation/config
errors — scriptable like the reference's `--validate` flag.
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_validate(args) -> int:
    from pathlib import Path

    import yaml

    from flapi_spark.config import load_endpoints_dir
    from flapi_spark.config_validator import (
        ConfigurationError,
        parse_https_config,
        validate_endpoints,
    )

    from flapi_spark.security_auditor import audit

    eps = load_endpoints_dir(args.config)
    result = validate_endpoints(eps)
    for w in audit(eps):
        result.warnings.append(f"[{w.code}] {w.location}: {w.message}")
    proj = Path(args.config) / "flapi.yaml"
    if proj.exists():
        try:
            parse_https_config(
                yaml.safe_load(proj.read_text()) or {}, check_files=True
            )
        except ConfigurationError as exc:
            result.error(f"flapi.yaml {exc.config_path}: {exc}")
    for w in result.warnings:
        print(f"WARN  {w}", file=sys.stderr)
    for e in result.errors:
        print(f"ERROR {e}", file=sys.stderr)
    print(
        f"{len(eps)} endpoint(s) checked,"
        f" {len(result.errors)} error(s), {len(result.warnings)} warning(s)"
    )
    return 0 if result.valid else 1


def _cmd_list(args) -> int:
    from flapi_spark.config import load_endpoints_dir

    eps = load_endpoints_dir(args.config)
    for ep in eps:
        params = ",".join(f.field_name for f in ep.request_fields)
        print(f"{ep.url_path}\tparams=[{params}]")
    return 0


def _spark_log_level(args) -> str:
    """Map the resolved flapi log level onto Spark's log4j levels —
    the consumer of --log-level/FLAPI_LOG_LEVEL in the CLI (CLI
    default 'info' intentionally maps to ERROR: Spark's INFO firehose
    would bury query output; 'debug' opts into the full stream)."""
    return {
        "debug": "INFO", "info": "ERROR",
        "warning": "WARN", "error": "ERROR",
    }[getattr(args, "log_level", None) or "info"]


def _cmd_run(args) -> int:
    from flapi_spark.config import load_endpoints_dir
    from flapi_spark.executor import QueryExecutor
    from flapi_spark.results import to_json_bytes
    from flapi_spark.session import get_spark
    from flapi_spark.sources.registry import load_connections

    import yaml
    from pathlib import Path

    eps = load_endpoints_dir(args.config)
    match = [e for e in eps if e.url_path == args.url_path]
    if not match:
        print(f"no endpoint with url-path {args.url_path}", file=sys.stderr)
        return 1
    params = dict(kv.split("=", 1) for kv in (args.param or []))
    reg = None
    proj = Path(args.config) / "flapi.yaml"
    if proj.exists():
        reg = load_connections(yaml.safe_load(proj.read_text()) or {})
    spark = get_spark(app_name="flapi_spark_cli")
    spark.sparkContext.setLogLevel(_spark_log_level(args))
    ex = QueryExecutor(spark, registry=reg)
    ep = match[0]
    if ep.is_write:
        wres = ex.execute_write(ep, params)
        out = {"rows_affected": wres.rows_affected}
        if wres.returned_data is not None:
            from flapi_spark.results import to_json_rows

            out["rows"] = to_json_rows(wres.returned_data)
        sys.stdout.write(json.dumps(out))
        sys.stdout.write("\n")
        return 0
    res = ex.execute(ep, params)
    sys.stdout.write(
        to_json_bytes(res.df, json_columns=res.json_columns).decode()
    )
    sys.stdout.write("\n")
    return 0


def _cmd_openapi(args) -> int:
    from pathlib import Path

    import yaml

    from flapi_spark.config import load_endpoints_dir
    from flapi_spark.describe import openapi_doc
    from flapi_spark.executor import QueryExecutor
    from flapi_spark.session import get_spark
    from flapi_spark.sources.registry import load_connections

    eps = load_endpoints_dir(args.config)
    reg = None
    proj = Path(args.config) / "flapi.yaml"
    if proj.exists():
        # schema probing renders templates, so {{conn.*}} needs the
        # project connections — same wiring as the run command
        reg = load_connections(yaml.safe_load(proj.read_text()) or {})
    spark = get_spark(app_name="flapi_spark_cli")
    spark.sparkContext.setLogLevel(_spark_log_level(args))
    print(json.dumps(
        openapi_doc(QueryExecutor(spark, registry=reg), eps), indent=2
    ))
    return 0


def _cmd_pack(args) -> int:
    from flapi_spark.bundle import PackError, pack_project

    try:
        entries = pack_project(
            args.config, args.output, allow_secrets=args.allow_secrets
        )
    except PackError as exc:
        print(f"ERROR {exc}", file=sys.stderr)
        return 1
    print(f"packed {len(entries)} file(s) -> {args.output}")
    return 0


def _cmd_run_bundle(args) -> int:
    """Run an endpoint STRAIGHT from a packed bundle — the reference
    binary's self-contained mode (bundle_locator.cpp +
    embedded_archive_file_provider.cpp: configs and templates served
    from the archive, nothing unpacked)."""
    import yaml

    from flapi_spark.config import EndpointConfig
    from flapi_spark.executor import QueryExecutor
    from flapi_spark.results import to_json_bytes
    from flapi_spark.session import get_spark
    from flapi_spark.sources.registry import load_connections
    from flapi_spark.vfs import ArchiveFileProvider

    import os

    from flapi_spark.config import _expand_env
    from flapi_spark.vfs import is_remote_path

    provider = ArchiveFileProvider(args.bundle)
    eps = []
    reg = None
    for name in provider.glob("*.yaml"):
        raw = provider.read_file(name)
        if "{{include" in raw:
            # include directives resolve against the filesystem
            # (config._resolve_includes); in-archive resolution is not
            # supported — fail with guidance, not a parser traceback
            print(
                f"run-bundle: {name} uses {{{{include:…}}}} directives;"
                " unpack the bundle and use `run -c DIR` instead",
                file=sys.stderr,
            )
            return 1
        try:
            doc = yaml.safe_load(raw) or {}
        except yaml.YAMLError:
            continue  # load_endpoints_dir tolerance: skip bad YAMLs
        doc = _expand_env(doc, dict(os.environ))
        if isinstance(doc, dict) and ("url-path" in doc or "url_path" in doc):
            ep = EndpointConfig.from_dict(doc)
            # archive-relative template paths resolve against the
            # YAML's own directory (matching on-disk resolution);
            # remote s3://… sources stay untouched
            if (
                ep.template_source
                and "/" in name
                and not is_remote_path(ep.template_source)
            ):
                ep.template_source = (
                    name.rsplit("/", 1)[0] + "/" + ep.template_source
                )
            eps.append(ep)
        elif isinstance(doc, dict) and "connections" in doc:
            reg = load_connections(doc)
    match = [e for e in eps if e.url_path == args.url_path]
    if not match:
        print(f"no endpoint with url-path {args.url_path}", file=sys.stderr)
        return 1
    params = dict(kv.split("=", 1) for kv in (args.param or []))
    spark = get_spark(app_name="flapi_spark_cli")
    spark.sparkContext.setLogLevel(_spark_log_level(args))
    ex = QueryExecutor(spark, registry=reg, file_provider=provider)
    ep = match[0]
    if ep.is_write:
        # same write routing as the on-disk `run` verb
        wres = ex.execute_write(ep, params)
        out = {"rows_affected": wres.rows_affected}
        if wres.returned_data is not None:
            from flapi_spark.results import to_json_rows

            out["rows"] = to_json_rows(wres.returned_data)
        sys.stdout.write(json.dumps(out))
        sys.stdout.write("\n")
        return 0
    res = ex.execute(ep, params)
    sys.stdout.write(
        to_json_bytes(res.df, json_columns=res.json_columns).decode()
    )
    sys.stdout.write("\n")
    return 0


def _cmd_bundle_info(args) -> int:
    from flapi_spark.bundle import bundle_info

    for e in bundle_info(args.bundle):
        print(f"{e['name']}\t{e['size']}\t{e['compressed']}")
    return 0


def _print_funnel(rep, as_json: bool) -> None:
    """Shared funnel printer for the curate verbs: one JSON object
    per stage with --json, an aligned TSV otherwise."""
    import json as _json

    if as_json:
        for i, s in enumerate(rep.stages, 1):
            print(_json.dumps({
                "stage": i, "name": s["stage"], "n_in": s["n_in"],
                "n_out": s["n_out"],
                "n_dropped": s["n_in"] - s["n_out"], "sec": s["sec"],
            }))
    else:
        print("stage\tname\tn_in\tn_out\tn_dropped\tsec")
        for i, s in enumerate(rep.stages, 1):
            print(
                f"{i}\t{s['stage']}\t{s['n_in']}\t{s['n_out']}"
                f"\t{s['n_in'] - s['n_out']}\t{s['sec']}"
            )


def _cmd_curate_delta(args) -> int:
    """Run the incremental ingest batch (round 10f): curate ONLY
    doc_id >= --since against the persisted index set
    (flapi_spark.pipeline_delta.curate_delta). With --bootstrap the
    T0 world is built first — curate_base over doc_id < --since and
    the indexes from its accepted set — so a cold deployment is one
    command; steady state omits it and probes the existing tables.
    --stages applies ONLY to the ingest (delta) chain; the T0 base
    curation keeps the default 5-stage chain unless --base-stages is
    given (ADVICE r10: a gated ingest bootstrap must not silently
    re-base the accepted corpus on the delta's stage list — the
    documented convention is queries._pipeline_delta_funnel_full's).
    --maintain appends the accepted batch to the indexes (the next
    batch sees this one); --marker-dir makes a retried batch an O(1)
    no-op (otherwise idempotence is per-table anti-joins)."""
    from flapi_spark.pipeline_delta import (
        DeltaIndexes, bootstrap_delta_indexes, clear_lane_markers,
        curate_base, curate_delta,
    )
    from flapi_spark.session import get_spark

    # flags that silently do nothing are operator traps (round-11
    # review): fail fast on inconsistent combinations
    if args.base_stages and not args.bootstrap:
        raise SystemExit(
            "curate-delta: --base-stages only applies with --bootstrap"
            " (steady-state ingest never re-curates the base)"
        )
    if args.marker_dir and not args.maintain:
        raise SystemExit(
            "curate-delta: --marker-dir only applies with --maintain"
            " (there is no index maintenance to make replay-safe)"
        )

    spark = get_spark(app_name="flapi_spark_curate_delta")
    if args.log_level != "debug":
        spark.sparkContext.setLogLevel("ERROR")
    idx = DeltaIndexes(
        band_table=args.band_table,
        shingle_store=args.shingle_store,
        exact_table=args.exact_table,
        image_table=args.image_table,
        audio_table=args.audio_table,
        video_table=args.video_table,
    )
    stages = args.stages.split(",") if args.stages else None
    if args.bootstrap:
        base_stages = (
            args.base_stages.split(",") if args.base_stages else None
        )
        base = curate_base(spark, args.data, args.since, stages=base_stages)
        bootstrap_delta_indexes(spark, args.data, base.keep, idx)
        if args.marker_dir:
            # the rebuild erased any appended batches: stale markers
            # would skip re-appending them forever (round-11 review)
            clear_lane_markers(args.marker_dir, idx)
    rep = curate_delta(
        spark, args.data, args.since, idx, stages=stages,
        maintain_indexes=args.maintain, marker_dir=args.marker_dir,
    )
    _print_funnel(rep, args.json)
    if args.output:
        rep.keep.write.mode("overwrite").parquet(args.output)
    return 0


def _cmd_curate(args) -> int:
    """Run a YAML curation pipeline end-to-end and print the
    attrition funnel (round 10): the CLI surface for
    flapi_spark.pipeline.curate_from_config — a data-curation run is
    an operational action exactly like `run`, so it gets a verb, not
    just a library call. `--json` emits one JSON object per stage
    (machine-readable, incl. wall seconds); default is an aligned
    TSV funnel."""
    from flapi_spark.pipeline import curate_from_config
    from flapi_spark.session import get_spark

    spark = get_spark(app_name="flapi_spark_curate")
    if args.log_level != "debug":
        spark.sparkContext.setLogLevel("ERROR")
    rep = curate_from_config(spark, args.data, args.pipeline)
    _print_funnel(rep, args.json)
    if args.output:
        # id-grain keep-set; partitioning left to the session default
        # (a 100 TB keep-set is still billions of rows — never
        # coalesce(1) an output on principle)
        rep.keep.write.mode("overwrite").parquet(args.output)
    if args.shards_out:
        from flapi_spark.pipeline import materialize_training_corpus

        manifest = materialize_training_corpus(
            spark, args.data, rep.keep, args.shards_out,
            n_shards=args.n_shards, seed=args.shard_seed,
        )
        for r in sorted(manifest.collect(), key=lambda r: r.shard):
            print(f"shard={r.shard}	n_docs={r.n_docs}"
                  f"	n_tokens={r.n_tokens}")
    return 0


VALID_LOG_LEVELS = ("debug", "info", "warning", "error")


class SettingsError(ValueError):
    """Invalid runtime setting — a single-line error, never a silent
    coercion (reference main.cpp:469-499: a typo'd FLAPI_PORT or
    FLAPI_LOG_LEVEL must abort, not fall through)."""


def resolve_runtime_settings(
    config: str | None = None,
    port: int | None = None,
    host: str | None = None,
    log_level: str | None = None,
    env: dict | None = None,
) -> dict:
    """12-factor env-var precedence (reference main.cpp:451-500,
    issues #47/#63): CLI flag > env var > built-in default; config-file
    values apply downstream only when neither CLI nor env provided one.
    Pass explicit (non-None) values for CLI flags the user actually
    used. FLAPI_PORT must be a strict integer in 1..65535; the
    resolved log level must be one of debug/info/warning/error —
    anything else raises SettingsError."""
    import os

    env = dict(os.environ) if env is None else env

    if config is None:
        config = env.get("FLAPI_CONFIG") or None
    if log_level is None:
        log_level = env.get("FLAPI_LOG_LEVEL") or "info"
    if log_level not in VALID_LOG_LEVELS:
        raise SettingsError(
            f"invalid log level '{log_level}'; must be one of:"
            " debug, info, warning, error"
        )
    if port is None:
        raw = env.get("FLAPI_PORT") or ""
        if raw:
            import re as _re

            # std::stoi semantics (main.cpp:471-479): optional leading
            # whitespace + sign + digits consumed to the END of the
            # string (trailing junk rejected), then the 1..65535 range
            m = _re.fullmatch(r"\s*([+-]?\d+)", raw)
            parsed = int(m.group(1)) if m else None
            if parsed is None or not (1 <= parsed <= 65535):
                raise SettingsError(
                    f"invalid FLAPI_PORT '{raw}'; must be an integer"
                    " in 1..65535"
                )
            port = parsed
    if host is None:
        host = env.get("FLAPI_HOST") or None
    return {
        "config": config,
        "port": port,
        "host": host,
        "log_level": log_level,
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="flapi_spark")
    ap.add_argument(
        "--log-level", default=None, choices=None,
        help="debug|info|warning|error (default: FLAPI_LOG_LEVEL or info)",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    def _with_config(p):
        # not required at parse time: FLAPI_CONFIG is the 12-factor
        # fallback (resolve_runtime_settings); missing BOTH is the error
        p.add_argument("-c", "--config", default=None, help="endpoint dir")
        return p

    _with_config(sub.add_parser("validate")).set_defaults(fn=_cmd_validate)
    _with_config(sub.add_parser("list")).set_defaults(fn=_cmd_list)
    runp = _with_config(sub.add_parser("run"))
    runp.add_argument("-u", "--url-path", required=True)
    runp.add_argument("-p", "--param", action="append", metavar="k=v")
    runp.set_defaults(fn=_cmd_run)
    _with_config(sub.add_parser("openapi")).set_defaults(fn=_cmd_openapi)
    packp = _with_config(sub.add_parser("pack"))
    packp.add_argument("-o", "--output", required=True)
    packp.add_argument("--allow-secrets", action="store_true")
    packp.set_defaults(fn=_cmd_pack)
    bip = sub.add_parser("bundle-info")
    bip.add_argument("-b", "--bundle", required=True)
    bip.set_defaults(fn=_cmd_bundle_info)
    rbp = sub.add_parser("run-bundle")
    rbp.add_argument("-b", "--bundle", required=True)
    rbp.add_argument("-u", "--url-path", required=True)
    rbp.add_argument("-p", "--param", action="append", metavar="k=v")
    rbp.set_defaults(fn=_cmd_run_bundle)
    cup = sub.add_parser("curate")
    cup.add_argument(
        "--pipeline", required=True, help="pipeline YAML (stages list)"
    )
    cup.add_argument(
        "--data", required=True, help="table dir (parquet per table)"
    )
    cup.add_argument(
        "-o", "--output", default=None,
        help="write the surviving doc_id keep-set as parquet",
    )
    cup.add_argument("--json", action="store_true")
    cup.add_argument(
        "--shards-out", default=None,
        help="materialize the curated corpus as ordered training"
             " shards (shard=K/ parquet layout + manifest)",
    )
    cup.add_argument("--n-shards", type=int, default=8)
    cup.add_argument("--shard-seed", default="epoch0")
    cup.set_defaults(fn=_cmd_curate)
    cdp = sub.add_parser("curate-delta")
    cdp.add_argument(
        "--data", required=True, help="table dir (parquet per table)"
    )
    cdp.add_argument(
        "--since", type=int, required=True,
        help="delta span start: curate doc_id >= SINCE only",
    )
    cdp.add_argument(
        "--stages", default=None,
        help="comma-separated stage subset for the INGEST (delta)"
             " chain only (default: the 5-stage chain)",
    )
    cdp.add_argument(
        "--base-stages", default=None,
        help="stage subset for the --bootstrap T0 base curation"
             " (default: the 5-stage chain, NOT --stages)",
    )
    cdp.add_argument(
        "--bootstrap", action="store_true",
        help="build the T0 world first (curate_base over doc_id <"
             " SINCE, indexes from its accepted set)",
    )
    cdp.add_argument(
        "--maintain", action="store_true",
        help="append the accepted batch to the indexes",
    )
    cdp.add_argument(
        "--marker-dir", default=None,
        help="with --maintain: _SUCCESS-marker dir keyed on --since"
             " so a retried batch is an O(1) no-op",
    )
    cdp.add_argument("--band-table", default="neardup_band_index_portable")
    cdp.add_argument(
        "--shingle-store", default="neardup_shingle_store_portable"
    )
    cdp.add_argument("--exact-table", default="dedup_exact_index")
    cdp.add_argument("--image-table", default=None)
    cdp.add_argument("--audio-table", default=None)
    cdp.add_argument("--video-table", default=None)
    cdp.add_argument(
        "-o", "--output", default=None,
        help="write the surviving delta doc_id keep-set as parquet",
    )
    cdp.add_argument("--json", action="store_true")
    cdp.set_defaults(fn=_cmd_curate_delta)

    args = ap.parse_args(argv)
    if args.cmd == "bundle-info":
        # metadata-only command: runs before env resolution, exactly
        # like the reference's unpack path (main.cpp:430-443 returns
        # before the 12-factor block) — a typo'd FLAPI_PORT must not
        # block reading a bundle manifest
        return args.fn(args)
    try:
        settings = resolve_runtime_settings(
            config=getattr(args, "config", None),
            log_level=args.log_level,
        )
    except SettingsError as exc:
        print(f"flapi_spark: {exc}", file=sys.stderr)
        return 1
    if hasattr(args, "config"):
        # run-bundle carries a -b bundle instead of a config dir
        if settings["config"] is None:
            print(
                "flapi_spark: no config given (pass -c/--config or set"
                " FLAPI_CONFIG)",
                file=sys.stderr,
            )
            return 1
        args.config = settings["config"]
    # log level drives the Spark session verbosity in run/openapi;
    # FLAPI_PORT/HOST are resolved for VALIDATION only (the reference
    # aborts even --validate-config on a malformed FLAPI_PORT,
    # test_env_overrides.py) — this CLI has no serve command, so the
    # values themselves are not consumed
    args.log_level = settings["log_level"]
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
