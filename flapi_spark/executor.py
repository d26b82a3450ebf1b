"""Query execution: render → validate → bind → spark.sql, plus
pagination and response shaping.

Parity with the reference's request path (reference:
src/request_handler.cpp:200-340, database_manager.cpp:420-525,
query_executor.cpp): validate request params, process the SQL
template, execute with typed params bound as prepared parameters,
optionally wrap with COUNT(*) + LIMIT/OFFSET pagination, then shape
the response (redact-columns / max-rows / sample —
mcp_response_shaper.cpp).

Spark-first: the rendered SQL runs through ``spark.sql(sql, args=…)``
so Catalyst sees one declarative plan — template filters land in the
parquet scan as pushed predicates, and pagination's LIMIT is a
CollectLimit, not a full materialization.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from flapi_spark.binding import rewrite_typed_params, spark_args
from flapi_spark.config import EndpointConfig, ShapeConfig
from flapi_spark.sources.registry import ConnectionRegistry
from flapi_spark.templates import build_context, render_template
from flapi_spark.validation import validate_params


@dataclass
class QueryResult:
    df: DataFrame
    total_count: int | None = None
    offset: int | None = None
    limit: int | None = None
    shaped: dict = field(default_factory=dict)
    # the reference's X-RateLimit-* triple when the endpoint has a
    # rate-limit block (flapi_spark/ratelimit.py), else None
    rate_status: "RateLimitStatus | None" = None
    # endpoint-declared JSON-document columns, threaded to the JSON
    # serializer (results.to_json_rows — reference issue #38)
    json_columns: list[str] = field(default_factory=list)


def paginate_sql(inner_sql: str, order_by: str | None, limit: int, offset: int) -> str:
    """Wrap a query with deterministic ORDER BY + LIMIT/OFFSET.

    The reference appends LIMIT/OFFSET to the subquery
    (database_manager.cpp:444-448); on a distributed engine an
    unordered page is nondeterministic, so an order key is required
    for stable pages."""
    order = f" ORDER BY {order_by}" if order_by else ""
    return f"SELECT * FROM ({inner_sql}) AS page_subquery{order} LIMIT {int(limit)} OFFSET {int(offset)}"


def paginate_keyset_sql(
    inner_sql: str, key_col: str, after: Any | None, limit: int
) -> str:
    """Keyset (cursor) pagination: WHERE key > :cursor ORDER BY key.

    The 100 TB path. OFFSET pagination does O(offset + limit) work per
    page — page 10,000 of a 100 TB result re-sorts and skips 10,000
    pages of rows. Keyset pagination is O(limit) per page and the key
    predicate pushes into the scan. The cursor is the last key of the
    previous page (None for the first page); callers pass the typed
    value through spark.sql args as :__after."""
    where = f" WHERE {key_col} > :__after" if after is not None else ""
    return (
        f"SELECT * FROM ({inner_sql}) AS page_subquery{where}"
        f" ORDER BY {key_col} LIMIT {int(limit)}"
    )


def _mask_col(df: DataFrame, name: str, strategy: str):
    from pyspark.sql import functions as F

    c = F.col(name).cast("string")
    if strategy == "hash":
        return F.md5(c)
    if strategy == "partial":
        # keep the last 4 characters (the card-number convention)
        return F.when(
            F.length(c) > 4,
            F.concat(
                F.repeat(F.lit("*"), F.length(c) - 4), F.substring(c, -4, 4)
            ),
        ).otherwise(F.repeat(F.lit("*"), F.length(c)))
    if strategy == "null":
        return F.lit(None).cast("string")
    raise ValueError(f"unknown mask strategy '{strategy}' for column {name}")


def shape_df(df: DataFrame, shape: ShapeConfig) -> tuple[DataFrame, dict]:
    """Apply response shaping (redact-columns, mask-columns, max-rows,
    sample). Masking (hash / partial / null) keeps the column in the
    schema but de-identifies values — the governance middle ground
    between serving raw PII and dropping the column (reference:
    mcp_response_shaper.cpp shaping surface, extended)."""
    info: dict[str, Any] = {}
    if shape.mask_columns:
        lower_map = {k.lower(): v for k, v in shape.mask_columns.items()}
        masked = []
        for c in df.columns:
            if c.lower() in lower_map:
                df = df.withColumn(c, _mask_col(df, c, lower_map[c.lower()]))
                masked.append(c)
        if masked:
            info["masked"] = masked
    if shape.redact_columns:
        redact = {c.lower() for c in shape.redact_columns}
        keep = [c for c in df.columns if c.lower() not in redact]
        dropped = [c for c in df.columns if c.lower() in redact]
        if dropped:
            df = df.select(*keep)
            info["redacted"] = dropped
    if shape.sample is not None:
        df = df.limit(int(shape.sample))
        info["sampled"] = True
    elif shape.max_rows is not None:
        df = df.limit(int(shape.max_rows))
        info["max_rows"] = int(shape.max_rows)
    return df, info


class PlanGuardError(RuntimeError):
    """An endpoint's physical plan contains an operator the guard
    forbids (cartesian / nested-loop join)."""


def assert_plan_safe(df, endpoint_path: str = "") -> None:
    """Operational guard for API-served queries: reject plans whose
    join degenerated into CartesianProduct or BroadcastNestedLoopJoin
    — on a shared cluster one template typo (a missing join predicate)
    must fail fast at plan time, not occupy executors with an O(n²)
    scan. Opt-in via QueryExecutor(plan_guard=True); analytical
    sessions that legitimately cross-join stay unguarded."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if marker in plan:
            raise PlanGuardError(
                f"endpoint {endpoint_path or '<unknown>'}: physical plan"
                f" contains {marker} — add a join predicate or disable"
                " the plan guard for this executor"
            )


class QueryExecutor:
    def __init__(
        self,
        spark: SparkSession,
        registry: ConnectionRegistry | None = None,
        env: dict | None = None,
        audit: "AuditLogger | None" = None,
        rate_limiter: "FixedWindowLimiter | None" = None,
        metrics: "MetricsRegistry | None" = None,
        plan_guard: bool = False,
        file_provider=None,
    ):
        from flapi_spark.ratelimit import FixedWindowLimiter

        self.spark = spark
        self.registry = registry or ConnectionRegistry()
        self.env = env
        self.audit = audit
        self.rate_limiter = rate_limiter or FixedWindowLimiter()
        self.metrics = metrics
        self.plan_guard = plan_guard
        # vfs provider for remote template-source paths (TTL-cached
        # reads; see vfs.CachingFileProvider / config.load_template)
        self.file_provider = file_provider

    def render(
        self,
        endpoint: EndpointConfig,
        params: dict[str, Any],
        cache_ctx: dict | None = None,
    ) -> tuple[str, dict[str, Any]]:
        """Validate params and produce (sql, spark_args)."""
        typed = validate_params(endpoint.request_fields, params)
        template = endpoint.load_template(provider=self.file_provider)
        rewritten, bound = rewrite_typed_params(template, endpoint.request_fields)
        conn_ctx: dict = {}
        for name in endpoint.connections:
            if name in self.registry:
                conn = self.registry.get(name)
                conn_ctx = conn.template_context()
                # sap_rfc has no standalone table to expose as a view
                # (tables materialize per sap_read_table() call site);
                # likewise a bigquery connection WITHOUT a table/path
                # property is pushdown-only — its data materializes
                # per bigquery_query() call site
                fmt = conn.format.lower()
                pushdown_only = fmt in ("sap_rfc", "sap") or (
                    fmt == "bigquery"
                    and not (
                        conn.properties.get("table")
                        or conn.properties.get("path")
                    )
                )
                if not pushdown_only:
                    conn.register_view(self.spark)
                break
        ctx = build_context(params=typed, conn=conn_ctx, env=self.env, cache=cache_ctx)
        sql = render_template(rewritten, ctx)
        if endpoint.template_dialect.lower() == "duckdb":
            # migrated reference templates: translate DuckDB-isms
            # (quoted-file FROM, read_parquet, struct literals, ...)
            # AFTER rendering so {{conn.path}}-built paths rewrite too
            from flapi_spark.dialect import duckdb_to_spark_sql

            sql = duckdb_to_spark_sql(sql)
        if "sap_read_table" in sql.lower():
            # ERPL table-function syntax → per-table temp views backed
            # by the endpoint's sap_rfc connection (sources/sap.py)
            from flapi_spark.sources.sap import rewrite_sap_read_table

            for name in endpoint.connections:
                if name in self.registry:
                    c = self.registry.get(name)
                    if c.format.lower() in ("sap_rfc", "sap"):
                        sql = rewrite_sap_read_table(self.spark, sql, c)
                        break
        if "bigquery_query" in sql.lower():
            # DuckDB-bigquery-extension table function → query-pushdown
            # temp views (sources/bigquery.py)
            from flapi_spark.sources.bigquery import rewrite_bigquery_query

            for name in endpoint.connections:
                if name in self.registry:
                    c = self.registry.get(name)
                    if c.format.lower() == "bigquery":
                        sql = rewrite_bigquery_query(self.spark, sql, c)
                        break
        return sql, spark_args(typed, bound)

    def execute(
        self,
        endpoint: EndpointConfig,
        params: dict[str, Any] | None = None,
        order_by: str | None = None,
        user: str | None = None,
        client_ip: str | None = None,
        auth_header: str | None = None,
    ) -> QueryResult:
        from flapi_spark.ratelimit import check_endpoint

        rate_status = check_endpoint(
            self.rate_limiter, endpoint.rate_limit, endpoint.url_path,
            client_ip=client_ip, auth_header=auth_header,
        )
        import time as _time

        t0 = _time.perf_counter()
        try:
            result = self._execute(endpoint, params, order_by)
        except Exception as exc:
            from flapi_spark.validation import ValidationError

            status = (
                "validation_error" if isinstance(exc, ValidationError) else "error"
            )
            dur_s = _time.perf_counter() - t0
            if self.metrics is not None:
                self.metrics.inc(
                    "flapi_queries",
                    {"endpoint": endpoint.url_path, "status": status},
                )
                self.metrics.observe(
                    "flapi_query_duration_seconds", dur_s,
                    {"endpoint": endpoint.url_path},
                )
            if self.audit is not None:
                self.audit.log(
                    endpoint.url_path, params or {}, status=status, user=user,
                    duration_ms=dur_s * 1000,
                    detail=type(exc).__name__,
                )
            raise
        dur_s = _time.perf_counter() - t0
        if self.metrics is not None:
            self.metrics.inc(
                "flapi_queries",
                {"endpoint": endpoint.url_path, "status": "ok"},
            )
            self.metrics.observe(
                "flapi_query_duration_seconds", dur_s,
                {"endpoint": endpoint.url_path},
            )
        if self.audit is not None:
            self.audit.log(
                endpoint.url_path, params or {}, status="ok", user=user,
                rows=result.total_count,
                duration_ms=dur_s * 1000,
            )
        result.rate_status = rate_status
        return result

    def _execute(
        self,
        endpoint: EndpointConfig,
        params: dict[str, Any] | None = None,
        order_by: str | None = None,
    ) -> QueryResult:
        if endpoint.is_write:
            from flapi_spark.writes import WriteError

            raise WriteError(
                f"endpoint {endpoint.url_path} is a write endpoint; use"
                " execute_write() — the read path would run its DML"
                " eagerly and then mis-handle the result"
            )
        params = dict(params or {})
        offset = int(params.pop("offset", 0) or 0)
        limit = int(params.pop("limit", 100) or 100)
        if offset < 0 or limit < 0:
            raise ValueError("Invalid pagination parameters")

        sql, args = self.render(endpoint, params)
        # Templates may render to several ;-separated statements (temp
        # views / session settings, then the result query): run setup
        # statements in order, the LAST one is the endpoint's result
        # (reference: sql_utils.cpp splitSqlStatements + the request
        # handler's statement loop). The quote-aware splitter never
        # splits inside '…'/"…"/$tag$…$tag$.
        from flapi_spark.sql_utils import split_sql_statements

        stmts = split_sql_statements(sql)
        for setup in stmts[:-1]:
            if args:
                self.spark.sql(setup, args=args)
            else:
                self.spark.sql(setup)
        sql = stmts[-1] if stmts else sql
        df = self.spark.sql(sql, args=args) if args else self.spark.sql(sql)
        if self.plan_guard:
            assert_plan_safe(df, endpoint.url_path)

        result = QueryResult(
            df=df, json_columns=list(endpoint.json_columns)
        )
        if endpoint.with_pagination:
            result.total_count = df.count()
            result.offset, result.limit = offset, limit
            page_sql = paginate_sql(sql, order_by, limit, offset)
            df = (
                self.spark.sql(page_sql, args=args)
                if args
                else self.spark.sql(page_sql)
            )
            result.df = df
        shaped_df, info = shape_df(result.df, endpoint.shape)
        result.df, result.shaped = shaped_df, info
        return result

    def explain(self, endpoint: EndpointConfig, params: dict[str, Any] | None = None) -> str:
        """Dry-run: return the formatted physical plan without executing
        (the Spark analogue of the reference's MCP _dryRun —
        mcp_dry_run.cpp returns the would-run SQL)."""
        sql, args = self.render(endpoint, dict(params or {}))
        df = self.spark.sql(sql, args=args) if args else self.spark.sql(sql)
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )

    def execute_write(
        self,
        endpoint: EndpointConfig,
        params: dict[str, Any] | None = None,
        cache_mgr=None,
        user: str | None = None,
        client_ip: str | None = None,
        auth_header: str | None = None,
    ):
        """Write-endpoint path (reference: database_manager.cpp
        executeWrite / executeWriteInTransaction + request_handler.cpp
        rows_affected): render with the SAME typed-binding pipeline as
        reads, split statements, then run them through the
        copy-on-write translator (flapi_spark.writes). Honors
        operation.returns-data (trailing SELECT or RETURNING),
        operation.transaction (multi-statement backup/restore), and
        the cache write hooks (invalidate-on-write marks the snapshot
        stale; refresh-on-write re-syncs it immediately)."""
        from flapi_spark.ratelimit import check_endpoint
        from flapi_spark.sql_utils import split_sql_statements
        from flapi_spark.writes import WriteError, execute_write_statements

        if not endpoint.is_write:
            raise WriteError(
                f"endpoint {endpoint.url_path} is not a write endpoint"
                " (set method: POST/PUT/PATCH/DELETE or operation.type:"
                " write)"
            )
        check_endpoint(
            self.rate_limiter, endpoint.rate_limit, endpoint.url_path,
            client_ip=client_ip, auth_header=auth_header,
        )
        import time as _time

        t0 = _time.perf_counter()
        status = "ok"
        try:
            sql, args = self.render(endpoint, dict(params or {}))
            stmts = split_sql_statements(sql)
            result = execute_write_statements(
                self.spark,
                stmts,
                args=args,
                returns_data=endpoint.operation.returns_data,
                transaction=endpoint.operation.transaction,
                validate_before_write=(
                    endpoint.operation.validate_before_write
                ),
            )
        except Exception as exc:
            from flapi_spark.validation import ValidationError

            status = (
                "validation_error"
                if isinstance(exc, ValidationError)
                else "error"
            )
            raise
        finally:
            dur_s = _time.perf_counter() - t0
            if self.metrics is not None:
                self.metrics.inc(
                    "flapi_writes",
                    {"endpoint": endpoint.url_path, "status": status},
                )
                self.metrics.observe(
                    "flapi_write_duration_seconds", dur_s,
                    {"endpoint": endpoint.url_path},
                )
            if self.audit is not None:
                self.audit.log(
                    endpoint.url_path, params or {}, status=status,
                    user=user, duration_ms=dur_s * 1000,
                )
        cfg = endpoint.cache
        if cache_mgr is not None and cfg.enabled and cfg.table:
            if cfg.invalidate_on_write:
                cache_mgr.invalidate(cfg)
            if cfg.refresh_on_write:
                if not cfg.template_file:
                    # without a separate cache template, the refresh
                    # would re-render THIS endpoint's template — i.e.
                    # re-run the mutation just executed
                    raise WriteError(
                        f"endpoint {endpoint.url_path}:"
                        " refresh-on-write requires cache.template-file"
                        " (the endpoint template is the mutation, not"
                        " the cacheable read)"
                    )
                from flapi_spark.cache_flow import refresh_endpoint_cache

                refresh_endpoint_cache(self, cache_mgr, endpoint)
        return result
