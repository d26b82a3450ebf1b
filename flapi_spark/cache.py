"""Snapshot cache with full-refresh and incremental sync.

Parity with the reference's DuckLake-backed cache (reference:
src/cache_manager.cpp, database_manager_cache_adapter.cpp, and the
cache: blocks in examples/sqls/*/*.yaml): named cache tables with
  - full refresh (rebuild the table from the endpoint query),
  - incremental sync via a cursor column (only rows with cursor >
    previous watermark are pulled) merged on a primary key
    (latest-cursor-wins upsert),
  - snapshot lineage (current/previous snapshot id + committed-at,
    exposed to cache SQL templates as {{cache.*}}),
  - retention GC (keep-last-snapshots / max-snapshot-age), and
  - a sync_events audit log.

Spark-first re-expression: a snapshot is an immutable parquet
directory under {root}/{schema}/{table}/snapshot=<id>/ plus a JSON
manifest (the DuckLake-catalog analogue). Readers always see a fully
committed snapshot (manifest is flipped after the parquet write), the
merge is one shuffle on the primary key (union + row_number, no
driver-side loop), and GC is metadata + directory removal. At 100 TB
you'd point `root` at object storage and bucket the write by pk —
the code paths are identical.
"""

from __future__ import annotations

import json
import re
import shutil
import time
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flapi_spark.config import CacheConfig

_DURATION_RE = re.compile(r"^(\d+)\s*([smhdw])$")
_DURATION_SECS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


def parse_duration(text: str) -> int:
    """'5m' / '2d' / '7d'-style durations (reference schedule/retention
    syntax) → seconds."""
    m = _DURATION_RE.match(text.strip())
    if not m:
        raise ValueError(f"bad duration: {text!r}")
    return int(m.group(1)) * _DURATION_SECS[m.group(2)]


@dataclass
class SnapshotInfo:
    current_snapshot_id: str | None = None
    current_snapshot_committed_at: str | None = None
    previous_snapshot_id: str | None = None
    previous_snapshot_committed_at: str | None = None
    cursor_watermark: str | None = None

    def template_context(self) -> dict:
        """The {{cache.*}} namespace (reference: cache_manager.cpp:72-92)."""
        ctx = {}
        if self.current_snapshot_id:
            ctx["cacheSnapshotId"] = self.current_snapshot_id
        if self.current_snapshot_committed_at:
            ctx["cacheSnapshotTimestamp"] = self.current_snapshot_committed_at
        if self.previous_snapshot_id:
            ctx["previousSnapshotId"] = self.previous_snapshot_id
        if self.previous_snapshot_committed_at:
            ctx["previousSnapshotTimestamp"] = self.previous_snapshot_committed_at
        if self.cursor_watermark:
            ctx["cursorWatermark"] = self.cursor_watermark
        return ctx


class CacheManager:
    """`root` holds the catalog metadata (manifests, audit log);
    `data_root` holds the parquet snapshot data — separable exactly
    like DuckLake's ATTACH metadata_path vs DATA_PATH (reference:
    database_manager.cpp:145-163). They default to the same location.

    `inline_row_limit` is the DATA_INLINING_ROW_LIMIT analogue: a
    snapshot at or under the limit is stored as JSON rows inside the
    manifest itself — no parquet files, no file-listing on read — the
    right call for small dimension caches."""

    def __init__(
        self,
        spark: SparkSession,
        root: str | Path,
        data_root: str | Path | None = None,
        inline_row_limit: int | None = None,
        metrics=None,
    ):
        self.spark = spark
        self.metrics = metrics  # optional MetricsRegistry
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.data_root = Path(data_root) if data_root is not None else self.root
        self.data_root.mkdir(parents=True, exist_ok=True)
        self.inline_row_limit = inline_row_limit
        self._clock = 0  # monotonic snapshot counter tiebreaker

    # --- paths & manifest -------------------------------------------------

    def _table_dir(self, cfg: CacheConfig) -> Path:
        return self.data_root / cfg.schema / cfg.table

    def _meta_dir(self, cfg: CacheConfig) -> Path:
        return self.root / cfg.schema / cfg.table

    def _manifest_path(self, cfg: CacheConfig) -> Path:
        return self._meta_dir(cfg) / "_manifest.json"

    def _load_manifest(self, cfg: CacheConfig) -> list[dict]:
        p = self._manifest_path(cfg)
        if not p.exists():
            return []
        return json.loads(p.read_text()).get("snapshots", [])

    def _write_manifest(self, cfg: CacheConfig, snapshots: list[dict]) -> None:
        p = self._manifest_path(cfg)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.with_suffix(".json.tmp")
        tmp.write_text(json.dumps({"snapshots": snapshots}, indent=1))
        tmp.replace(p)  # atomic flip: readers never see a half commit

    def snapshot_info(self, cfg: CacheConfig) -> SnapshotInfo:
        snaps = self._load_manifest(cfg)
        info = SnapshotInfo()
        if snaps:
            cur = snaps[-1]
            info.current_snapshot_id = cur["id"]
            info.current_snapshot_committed_at = cur["committed_at"]
            info.cursor_watermark = cur.get("cursor_watermark")
            if len(snaps) > 1:
                prev = snaps[-2]
                info.previous_snapshot_id = prev["id"]
                info.previous_snapshot_committed_at = prev["committed_at"]
        return info

    def invalidate(self, cfg: CacheConfig) -> bool:
        """Mark the current snapshot stale (reference:
        cache.invalidate-on-write — a write through the endpoint means
        the cached result no longer reflects the table; the NEXT read
        should refresh first). Returns False when there is nothing to
        invalidate. The snapshot data stays on disk (time travel keeps
        working); only the staleness flag flips."""
        snaps = self._load_manifest(cfg)
        if not snaps:
            return False
        snaps[-1]["invalidated"] = True
        self._write_manifest(cfg, snaps)
        self._audit(cfg, "invalidate", "ok", "write invalidated snapshot", snaps[-1]["id"])
        return True

    def is_stale(self, cfg: CacheConfig) -> bool:
        snaps = self._load_manifest(cfg)
        return bool(snaps) and bool(snaps[-1].get("invalidated"))

    # --- snapshot IO --------------------------------------------------------

    def _df_from_inline(self, snap: dict) -> DataFrame:
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(snap["schema_json"]))
        rdd = self.spark.sparkContext.parallelize(snap["inline_rows"] or [""])
        if not snap["inline_rows"]:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).json(rdd)

    def _commit_snapshot(
        self, cfg: CacheConfig, df: DataFrame, mode: str
    ) -> SnapshotInfo:
        self._clock += 1
        snap_id = f"{int(time.time() * 1000)}_{self._clock}"

        inline_rows = None
        if self.inline_row_limit is not None:
            # DuckLake-style data inlining: probe one row past the
            # limit; small results live in the manifest, large ones go
            # to parquet (single pass for small inputs, bounded probe
            # for large ones)
            probe = df.toJSON().take(self.inline_row_limit + 1)
            if len(probe) <= self.inline_row_limit:
                inline_rows = probe

        if inline_rows is not None:
            committed = self._df_from_inline(
                {"inline_rows": inline_rows, "schema_json": df.schema.json()}
            )
            row_count = len(inline_rows)
        else:
            out_dir = self._table_dir(cfg) / f"snapshot={snap_id}"
            df.write.mode("overwrite").parquet(str(out_dir))
            committed = self.spark.read.parquet(str(out_dir))
            row_count = committed.count()
        watermark = None
        if cfg.cursor_column:
            wm = committed.agg(F.max(cfg.cursor_column).alias("wm")).collect()[0]["wm"]
            watermark = str(wm) if wm is not None else None

        snaps = self._load_manifest(cfg)
        entry = {
            "id": snap_id,
            "committed_at": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime()),
            "mode": mode,
            "row_count": row_count,
            "cursor_watermark": watermark,
        }
        if inline_rows is not None:
            entry["inline_rows"] = inline_rows
            entry["schema_json"] = df.schema.json()
        snaps.append(entry)
        self._write_manifest(cfg, snaps)
        self._audit(cfg, mode, "success", f"rows={row_count}", snap_id)
        if self.metrics is not None:
            self.metrics.inc(
                "flapi_cache_refreshes",
                {"table": f"{cfg.schema}.{cfg.table}", "mode": mode},
            )
            self.metrics.inc(
                "flapi_cache_rows_committed",
                {"table": f"{cfg.schema}.{cfg.table}"},
                by=float(row_count),
            )
        return self.snapshot_info(cfg)

    def read(self, cfg: CacheConfig, snapshot_id: str | None = None) -> DataFrame:
        snaps = self._load_manifest(cfg)
        if not snaps:
            raise FileNotFoundError(f"cache {cfg.schema}.{cfg.table} has no snapshots")
        snap = snaps[-1] if snapshot_id is None else next(
            s for s in snaps if s["id"] == snapshot_id
        )
        if "inline_rows" in snap:
            return self._df_from_inline(snap)
        return self.spark.read.parquet(
            str(self._table_dir(cfg) / f"snapshot={snap['id']}")
        )

    # --- refresh strategies -------------------------------------------------

    def full_refresh(self, cfg: CacheConfig, source: DataFrame) -> SnapshotInfo:
        """Rebuild the cache table from scratch (reference: full refresh)."""
        return self._commit_snapshot(cfg, source, "full_refresh")

    def incremental_sync(self, cfg: CacheConfig, source: DataFrame) -> SnapshotInfo:
        """Cursor-based incremental sync + primary-key merge.

        Pull only source rows with cursor > previous watermark, then
        upsert into the current snapshot: per primary key the row with
        the greatest cursor wins (ties → incoming row wins). One
        shuffle on the pk; no driver-side iteration."""
        if not cfg.cursor_column:
            return self.full_refresh(cfg, source)
        info = self.snapshot_info(cfg)
        if info.current_snapshot_id is None:
            return self._commit_snapshot(cfg, source, "initial_sync")

        delta = source
        if info.cursor_watermark is not None:
            wm = F.lit(info.cursor_watermark).cast(
                source.schema[cfg.cursor_column].dataType
            )
            delta = source.where(F.col(cfg.cursor_column) > wm)

        current = self.read(cfg)
        if not cfg.primary_key:
            merged = current.unionByName(delta)
        else:
            tagged = current.withColumn("__src", F.lit(0)).unionByName(
                delta.withColumn("__src", F.lit(1))
            )
            w = Window.partitionBy(*cfg.primary_key).orderBy(
                F.desc(cfg.cursor_column), F.desc("__src")
            )
            merged = (
                tagged.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .drop("__rn", "__src")
            )
        return self._commit_snapshot(cfg, merged, "incremental_sync")

    # --- retention / GC -----------------------------------------------------

    def expire_snapshots(self, cfg: CacheConfig, now: float | None = None) -> list[str]:
        """Apply retention (keep-last-snapshots, max-snapshot-age);
        returns expired snapshot ids (reference:
        cache_manager.cpp:115-129 ducklake_expire_snapshots)."""
        snaps = self._load_manifest(cfg)
        if not snaps:
            return []
        now = now if now is not None else time.time()
        keep = snaps[:]
        if cfg.keep_last_snapshots is not None and len(keep) > cfg.keep_last_snapshots:
            keep = keep[-cfg.keep_last_snapshots:]
        if cfg.max_snapshot_age:
            max_age = parse_duration(cfg.max_snapshot_age)
            kept = []
            for s in keep:
                born_ms = int(s["id"].split("_")[0])
                if now - born_ms / 1000.0 <= max_age or s is keep[-1]:
                    kept.append(s)  # never expire the current snapshot
            keep = kept
        expired = [s for s in snaps if s not in keep]
        for s in expired:
            shutil.rmtree(self._table_dir(cfg) / f"snapshot={s['id']}", ignore_errors=True)
        if expired:
            self._write_manifest(cfg, keep)
            self._audit(cfg, "garbage_collection", "success",
                        f"expired={len(expired)}", None)
        return [s["id"] for s in expired]

    # --- audit log (reference: cache_manager.cpp sync_events) ---------------

    def _audit(self, cfg: CacheConfig, event: str, status: str,
               message: str, snapshot_id: str | None) -> None:
        log = self.root / "flapi_audit" / "sync_events.jsonl"
        log.parent.mkdir(parents=True, exist_ok=True)
        with open(log, "a") as fh:
            fh.write(json.dumps({
                "ts": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime()),
                "schema": cfg.schema, "table": cfg.table,
                "event": event, "status": status,
                "message": message, "snapshot_id": snapshot_id,
            }) + "\n")

    def sync_events(self) -> list[dict]:
        log = self.root / "flapi_audit" / "sync_events.jsonl"
        if not log.exists():
            return []
        return [json.loads(line) for line in log.read_text().splitlines()]


def read_pruned(
    mgr: "CacheManager",
    cfg,
    column: str,
    lo=None,
    hi=None,
    snapshot_id: str | None = None,
):
    """File-skipping snapshot read via parquet footer statistics — the
    Iceberg-manifest / DuckLake-metadata pruning pattern on the cache's
    snapshot directories: consult each file's column min/max (metadata
    only, no data IO) and hand Spark ONLY the files whose range
    overlaps [lo, hi]; the residual predicate still applies on top.

    Pays off when snapshots are written range-clustered on the prune
    column (repartitionByRange + sortWithinPartitions at commit time —
    same layout story as zorder_locality_stats): file ranges become
    tight and disjoint, so a narrow predicate scans O(1) files out of
    thousands. Returns (df, {"files_total", "files_scanned"}).
    """
    import glob as _glob

    import pyarrow.parquet as _pq

    from pyspark.sql import functions as _F

    snaps = mgr._load_manifest(cfg)
    if not snaps:
        raise FileNotFoundError(f"cache {cfg.schema}.{cfg.table} has no snapshots")
    snap = snaps[-1] if snapshot_id is None else next(
        s for s in snaps if s["id"] == snapshot_id
    )

    def _residual(df):
        if lo is not None:
            df = df.where(_F.col(column) >= lo)
        if hi is not None:
            df = df.where(_F.col(column) <= hi)
        return df

    if "inline_rows" in snap:
        df = mgr._df_from_inline(snap)
        return _residual(df), {"files_total": 0, "files_scanned": 0}

    snap_dir = mgr._table_dir(cfg) / f"snapshot={snap['id']}"
    files = sorted(_glob.glob(str(snap_dir / "*.parquet")))
    keep = []
    for path in files:
        md = _pq.ParquetFile(path).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        try:
            ci = names.index(column)
        except ValueError:
            keep.append(path)  # unknown column: never prune blindly
            continue
        fmin = fmax = None
        prunable = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                prunable = False
                break
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if not prunable:
            keep.append(path)
            continue
        if (hi is not None and fmin > hi) or (lo is not None and fmax < lo):
            continue  # file range disjoint from the predicate: skip
        keep.append(path)
    stats = {"files_total": len(files), "files_scanned": len(keep)}
    if not keep:
        df = mgr.spark.read.parquet(str(snap_dir)).limit(0)
        return _residual(df), stats
    df = mgr.spark.read.parquet(*keep)
    return _residual(df), stats


def snapshot_diff(
    mgr: "CacheManager",
    cfg,
    from_snapshot_id: str,
    to_snapshot_id: str,
    primary_keys: list[str],
    compare_columns: list[str] | None = None,
) -> DataFrame:
    """Change-data-feed between two cache snapshots (Delta CDF /
    DuckLake table-changes semantics): full-outer join the two
    snapshot states on the primary key and classify every key as
    insert / delete / update / unchanged-excluded.

    Output: pk columns + change_type ('insert'|'delete'|'update').
    `compare_columns` limits the update check (default: all shared
    non-pk columns). Metadata-routed reads (one parquet dir per
    snapshot) + one pk-keyed join — the diff costs two scans and one
    shuffle regardless of how many snapshots exist between the two."""
    old = mgr.read(cfg, from_snapshot_id)
    new = mgr.read(cfg, to_snapshot_id)
    if compare_columns is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_columns = [c for c in shared if c not in set(primary_keys)]
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") if c not in primary_keys else F.col(c)
          for c in primary_keys + compare_columns]
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") if c not in primary_keys else F.col(c)
          for c in primary_keys + compare_columns]
    )
    # presence flags come from explicit markers (a data column could
    # be legitimately NULL for a present row)
    o = o.withColumn("__in_old", F.lit(1))
    n = n.withColumn("__in_new", F.lit(1))
    j = o.join(n, primary_keys, "full_outer")
    changed = F.lit(False)
    for c in compare_columns:
        changed = changed | ~(
            F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        )
    ct = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit(None))
    )
    return (
        j.withColumn("change_type", ct)
        .where(F.col("change_type").isNotNull())
        .select(*primary_keys, "change_type")
    )


def schema_drift(
    mgr: "CacheManager",
    cfg,
    from_snapshot_id: str,
    to_snapshot_id: str,
) -> list[dict]:
    """Schema evolution between two snapshots: columns added, removed
    or retyped — the contract check a pipeline runs before consuming a
    refreshed table (the CDF's structural sibling; reference:
    cache_manager.cpp snapshot lineage + DuckLake schema tracking).

    Metadata-only: two parquet-footer schema reads, no data IO.
    Returns [{column, change, from_type, to_type}, ...] sorted by
    column; empty means the contract held."""
    old = dict(
        (f.name, f.dataType.simpleString())
        for f in mgr.read(cfg, from_snapshot_id).schema.fields
    )
    new = dict(
        (f.name, f.dataType.simpleString())
        for f in mgr.read(cfg, to_snapshot_id).schema.fields
    )
    out = []
    for c in sorted(set(old) | set(new)):
        if c not in new:
            out.append(
                {"column": c, "change": "removed", "from_type": old[c],
                 "to_type": None}
            )
        elif c not in old:
            out.append(
                {"column": c, "change": "added", "from_type": None,
                 "to_type": new[c]}
            )
        elif old[c] != new[c]:
            out.append(
                {"column": c, "change": "retyped", "from_type": old[c],
                 "to_type": new[c]}
            )
    return out
