"""Cached-endpoint orchestration: the reference's full cache loop.

Reference flow (request_handler.cpp + cache_manager.cpp): an endpoint
with a `cache:` block serves reads from the cache table; a refresh
(scheduled via heartbeat, or on demand) renders the endpoint's cache
template with the `{{cache.*}}` context (previous snapshot timestamp,
cursor watermark) so the template itself decides what slice of the
source to pull, then commits it as a new snapshot — full rebuild or
cursor-merge.

This module ties those pieces together over the Spark-native parts:
QueryExecutor (render + bind), CacheManager (snapshots, merge, GC),
and the endpoint config.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from flapi_spark.cache import CacheManager, SnapshotInfo
from flapi_spark.config import CacheConfig, EndpointConfig
from flapi_spark.executor import QueryExecutor, shape_df


def cache_template_vars(cfg: CacheConfig, info: SnapshotInfo) -> dict:
    """The full {{cache.*}} namespace: config-derived names
    (catalog/schema/table/mode/cursor/primaryKeys — reference:
    examples/sqls/customers/customers_cache.sql documents the set)
    merged with the snapshot-lineage vars from SnapshotInfo."""
    mode = (
        "merge" if cfg.primary_key and cfg.cursor_column
        else "append" if cfg.cursor_column
        else "full"
    )
    ctx = {
        "catalog": "cache",
        "schema": cfg.schema,
        "table": cfg.table,
        "mode": mode,
    }
    if cfg.cursor_column:
        ctx["cursorColumn"] = cfg.cursor_column
    if cfg.cursor_type:
        ctx["cursorType"] = cfg.cursor_type
    if cfg.primary_key:
        ctx["primaryKeys"] = ", ".join(cfg.primary_key)
    ctx.update(info.template_context())
    return ctx


def refresh_endpoint_cache(
    executor: QueryExecutor,
    cache_mgr: CacheManager,
    endpoint: EndpointConfig,
    params: dict | None = None,
) -> SnapshotInfo:
    """Render the endpoint template with the {{cache.*}} context and
    commit the result as a new snapshot.

    First refresh (no snapshot yet) is a full rebuild; with a cursor
    configured and a previous snapshot present, the template sees
    `previousSnapshotTimestamp` / `cursorWatermark` and is expected to
    emit only the new slice, which is merged on the primary key
    (latest-cursor-wins)."""
    cfg = endpoint.cache
    if not cfg.enabled or not cfg.table:
        raise ValueError(f"endpoint {endpoint.url_path}: cache not configured")
    info = cache_mgr.snapshot_info(cfg)
    # the reference keeps a SEPARATE refresh template per cached
    # endpoint (cache.template-file, cache_manager.cpp) — essential
    # for WRITE endpoints, whose own template is the mutation, not the
    # cacheable read. Fall back to the endpoint template when no cache
    # template is configured (read endpoints).
    src_ep = endpoint
    if cfg.template_file:
        import dataclasses

        src_ep = dataclasses.replace(
            endpoint,
            template_source=cfg.template_file,
            template_text=None,
        )
    sql, args = executor.render(
        src_ep, dict(params or {}), cache_ctx=cache_template_vars(cfg, info)
    )
    df = executor.spark.sql(sql, args=args) if args else executor.spark.sql(sql)
    if cfg.cursor_column and info.current_snapshot_id:
        return cache_mgr.incremental_sync(cfg, df)
    return cache_mgr.full_refresh(cfg, df)


def read_cached_endpoint(
    executor: QueryExecutor,
    cache_mgr: CacheManager,
    endpoint: EndpointConfig,
    refresh_if_stale: bool = True,
) -> DataFrame:
    """Serve the endpoint from its committed cache snapshot (shaped),
    never touching the source — the reference's read path for cached
    endpoints. A snapshot flagged by invalidate-on-write is STALE:
    by default the read refreshes first (the contract the flag
    exists for); pass refresh_if_stale=False to serve it anyway
    (explicitly-stale reads, e.g. dashboards that prefer speed)."""
    if refresh_if_stale and cache_mgr.is_stale(endpoint.cache):
        refresh_endpoint_cache(executor, cache_mgr, endpoint)
    df = cache_mgr.read(endpoint.cache)
    shaped, _info = shape_df(df, endpoint.shape)
    return shaped


def schedule_cache_refreshes(
    worker,
    executor: QueryExecutor,
    cache_mgr: CacheManager,
    endpoints: list[EndpointConfig],
    stale_poll: str | float | None = None,
) -> list[str]:
    """Register every cache-enabled endpoint with a `schedule:` on the
    heartbeat worker (reference: heartbeat_worker.cpp drives
    schedule-based cache syncs). Each tick refreshes the snapshot and
    applies retention GC. With `stale_poll`, a second job per cached
    endpoint refreshes EARLY whenever invalidate-on-write has flagged
    the snapshot stale — writes propagate to readers at the poll
    cadence instead of waiting out the full schedule. Returns the
    scheduled job names."""
    names = []
    for ep in endpoints:
        cfg = ep.cache
        if stale_poll is not None and cfg.enabled and cfg.table:
            sname = f"cache-stale:{cfg.schema}.{cfg.table}"

            def _stale_job(ep=ep):
                if cache_mgr.is_stale(ep.cache):
                    refresh_endpoint_cache(executor, cache_mgr, ep)

            worker.add_job(sname, stale_poll, _stale_job)
            names.append(sname)
        if not (cfg.enabled and cfg.table and cfg.schedule):
            continue
        name = f"cache:{cfg.schema}.{cfg.table}"

        def _job(ep=ep):
            refresh_endpoint_cache(executor, cache_mgr, ep)
            cache_mgr.expire_snapshots(ep.cache)

        worker.add_job(name, cfg.schedule, _job)
        names.append(name)
    return names
