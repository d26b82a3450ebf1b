"""Source presets: friendly connection properties → Spark reader specs.

The reference reaches heterogeneous systems by auto-installing DuckDB
extensions per connection (reference: database_manager.cpp:251-310
autoinstall/autoload + per-connection ``init:`` blocks such as
``INSTALL 'bigquery' FROM community`` in
examples/flapi-bigquery-procedure.yaml). The Spark-first analogue of
"the extension" is the connector already shipped on the cluster
classpath: JDBC drivers for postgres/mysql, the spark-bigquery
connector, the Iceberg runtime. What carries over is the CONFIG
TRANSLATION — a connection declares friendly properties
(host/database/user, project_id/dataset) and the engine derives the
reader format + options. That translation is pure and unit-testable;
the live read is availability-gated exactly like the generic JDBC
path (tests/test_jdbc_source.py proves the JDBC mechanics on Derby).
"""

from __future__ import annotations

_JDBC_PRESETS = {
    "postgres": {
        "scheme": "postgresql",
        "driver": "org.postgresql.Driver",
        "default_port": 5432,
    },
    "postgresql": {
        "scheme": "postgresql",
        "driver": "org.postgresql.Driver",
        "default_port": 5432,
    },
    "mysql": {
        "scheme": "mysql",
        "driver": "com.mysql.cj.jdbc.Driver",
        "default_port": 3306,
    },
}

# options forwarded verbatim to any JDBC reader when present
_JDBC_PASSTHROUGH = (
    "numPartitions", "partitionColumn", "lowerBound", "upperBound",
    "fetchsize", "queryTimeout", "sessionInitStatement",
)


def reader_spec(fmt: str, props: dict) -> tuple[str, dict[str, str]]:
    """(spark_format, options) for a connection's format + properties.

    postgres/mysql → ``jdbc`` with a derived url + driver;
    bigquery → the spark-bigquery connector's format/options;
    anything else raises KeyError (caller falls back to its own path).
    """
    fmt = fmt.lower()
    if fmt in _JDBC_PRESETS:
        preset = _JDBC_PRESETS[fmt]
        host = props.get("host", "localhost")
        port = int(props.get("port", preset["default_port"]))
        database = props["database"]
        url = f"jdbc:{preset['scheme']}://{host}:{port}/{database}"
        if props.get("url_params"):
            url += "?" + "&".join(
                f"{k}={v}" for k, v in sorted(dict(props["url_params"]).items())
            )
        opts: dict[str, str] = {"url": url, "driver": preset["driver"]}
        table = props.get("dbtable") or props.get("table")
        schema = props.get("schema")
        if table:
            opts["dbtable"] = f"{schema}.{table}" if schema else str(table)
        elif props.get("query"):
            opts["query"] = str(props["query"])
        for k in ("user", "password"):
            if k in props:
                opts[k] = str(props[k])
        for k in _JDBC_PASSTHROUGH:
            if k in props:
                opts[k] = str(props[k])
        return "jdbc", opts
    if fmt == "bigquery":
        opts = {}
        if props.get("project_id"):
            opts["parentProject"] = str(props["project_id"])
        if props.get("billing_project_id"):
            opts["parentProject"] = str(props["billing_project_id"])
            opts["project"] = str(props.get("project_id", ""))
        table = props.get("table")
        dataset = props.get("dataset")
        if table:
            opts["table"] = (
                f"{dataset}.{table}" if dataset and "." not in str(table) else str(table)
            )
        if props.get("credentials_file"):
            opts["credentialsFile"] = str(props["credentials_file"])
        if props.get("views_enabled"):
            opts["viewsEnabled"] = "true"
        return "bigquery", opts
    if fmt in ("sap_rfc", "sap"):
        # RFC credential block, mirroring the reference's sap_rfc
        # secret fields (examples/flapi.yaml:42-49 ASHOST/SYSNR/CLIENT/
        # USER/PASSWD/LANG); table comes from the sap_read_table()
        # rewrite (flapi_spark/sources/sap.py)
        opts = {
            key.upper(): str(props[key])
            for key in ("ashost", "sysnr", "client", "user", "passwd", "lang")
            if key in props
        }
        if props.get("table"):
            opts["TABLE"] = str(props["table"])
        return "sap_rfc", opts
    raise KeyError(f"no preset for format {fmt!r}")


def has_preset(fmt: str) -> bool:
    return fmt.lower() in _JDBC_PRESETS or fmt.lower() in (
        "bigquery", "sap_rfc", "sap",
    )
