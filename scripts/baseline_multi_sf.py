"""Multi-SF baseline for the round-4 bench additions: run each query
on BOTH engines (embedded DuckDB = the reference's engine, executing
the query's own oracle SQL; Spark via the registry callable) at three
scale points — sf0.01, sf0.1, and an 8x-replicated sf0.1 ("sf0.8-rep",
built in /tmp with key-offset replicas; /root/testdata is read-only
and has no sf1) — so BASELINE.md's crossover claim ("Spark's fixed
overhead amortizes as data grows") carries measured points instead of
one SF.

Usage: python scripts/baseline_multi_sf.py [query ...]
Prints one JSON line {sf_label: {query: {"duckdb": s, "spark": s}}}.
min-of-2 runs per engine, 120 s per-query DuckDB budget (a timeout IS
the datum, recorded as ">120").
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from flapi_spark.queries import QUERIES
from flapi_spark.session import get_spark

DEFAULT_QUERIES = [
    "pagerank_neardup_graph", "kcore_neardup_graph",
    "session_path_trigrams", "psi_order_value_drift",
    "ntile_value_bands", "bm25_search",
]
TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings"
).split()
# Key columns offset per replica by a UNIFORM constant (round 8
# correction — the original scheme offset each table's keys by its own
# ROW COUNT, which breaks referential integrity across joined tables:
# orders replica i pointed at customer keys that only replica 0
# carried, so multi-table queries at "sf0.8-rep" measured skewed
# semi-matched joins; and lineitem/customer/part/supplier were not
# replicated at all, so their grid rows re-measured sf0.1-sized
# inputs). With one KEY_OFFSET for every key column, every join edge
# (o_custkey→c_custkey, l_orderkey→o_orderkey, l_partkey→p_partkey,
# l_suppkey→s_suppkey, events.user_id) lands on the matching replica
# — the scale-up models MORE customers/orders/users, dims
# (nation/region) shared. documents suffix every WORD and part
# suffixes p_name with the replica id, so text-similarity pair sets
# scale linearly instead of forming cross-replica exact-dup cliques.
KEY_OFFSET = 10**10
REPLICATED = {
    "documents": ("doc_id",),
    # round 10c: vec_id-offset EXACT vector copies (queries stay in
    # replica 0, candidate corpus grows) — right for the fixed-query
    # retrieval/k-means grid rows; do NOT grid pairwise embedding
    # dedup entries over this build (exact copies mint cross-replica
    # duplicate cliques, the same artifact word-suffixing avoids for
    # documents)
    "embeddings": ("vec_id",),
    "events": ("event_id", "user_id"),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "customer": ("c_custkey",),
    "part": ("p_partkey",),
    "supplier": ("s_suppkey",),
}
BUDGET_S = float(os.environ.get("BASELINE_QUERY_BUDGET_S", "120"))


def build_replica(spark, base: str, factor: int) -> str:
    from pyspark.sql import functions as F

    # v2 suffix: replicas built under the round-8 uniform-offset
    # scheme land in a fresh root so stale row-count-offset builds
    # from earlier rounds are never reused; base-keyed so builds from
    # different SF dirs never collide in the cache
    stem = os.path.basename(base.rstrip("/"))
    out_root = f"/tmp/flapi_spark_baseline_{stem}_{factor}x_v2"
    os.makedirs(out_root, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(out_root, f"{t}.parquet")
        if t in REPLICATED:
            if os.path.isdir(dst):
                continue  # reuse a previous build
            src = spark.read.parquet(os.path.join(base, f"{t}.parquet"))
            keys = REPLICATED[t]
            parts = []
            for i in range(factor):
                p = src
                for key in keys:
                    p = p.withColumn(
                        key, F.col(key) + F.lit(i * KEY_OFFSET)
                    )
                if t == "documents" and i > 0:
                    p = p.withColumn(
                        "text",
                        F.expr(
                            "array_join(transform(split(text, ' '),"
                            f" x -> concat(x, '{i}')), ' ')"
                        ),
                    )
                if t == "part" and i > 0:
                    # keep replica p_names disjoint: the fuzzy-match
                    # blocking key is the last word, so a suffix keeps
                    # cross-replica pairs out (linear pair growth)
                    p = p.withColumn(
                        "p_name", F.expr(f"concat(p_name, ' r{i}')")
                    )
                parts.append(p)
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            u.write.mode("overwrite").parquet(dst)
        elif not os.path.exists(dst):
            os.symlink(os.path.join(base, f"{t}.parquet"), dst)
    return out_root


def duck_connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        p = os.path.realpath(p)
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def time_duckdb(con, sql: str) -> float | str:
    best = None
    for _ in range(2):
        timer = threading.Timer(BUDGET_S, con.interrupt)
        timer.start()
        t0 = time.perf_counter()
        try:
            con.execute(sql).fetchall()
        except duckdb.Error:
            return f">{BUDGET_S:g}"
        finally:
            timer.cancel()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        if dt > 10:  # min-of-2 only matters in the noise regime
            break
    return round(best, 3)


def time_spark(spark, fn, sf_dir: str) -> float:
    # SPARK_GRAFT_WARM=1: one untimed pass first — indexed entries pay
    # a one-time per-SF bootstrap (persisted index build) plus codegen
    # inside their first call, which the >10 s short-circuit would
    # otherwise freeze into the grid cell (the cross_source artifact
    # documented in BASELINE.md); warm cells measure the steady-state
    # probe, which is the number the index exists to provide
    if os.environ.get("SPARK_GRAFT_WARM") == "1":
        fn(spark, sf_dir).count()
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        if dt > 10:
            break
    return round(best, 3)


def main() -> None:
    queries = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark(app_name="baseline_multi_sf")
    spark.sparkContext.setLogLevel("ERROR")
    # SPARK_GRAFT_REP_FACTOR widens the top scale point (round 8:
    # factor 24 = "sf2.4-rep" measures the crossover queries past the
    # sf0.8-rep grid); SPARK_GRAFT_REP_ONLY=1 skips the small points
    # already covered by the full grid in BASELINE.md
    factor = int(os.environ.get("SPARK_GRAFT_REP_FACTOR", "8"))
    rep_dir = build_replica(spark, "/root/testdata/sf0.1", factor)
    rep_label = f"sf{factor / 10:g}-rep"
    points = {
        "sf0.01": "/root/testdata/sf0.01",
        "sf0.1": "/root/testdata/sf0.1",
        rep_label: rep_dir,
    }
    if os.environ.get("SPARK_GRAFT_REP_ONLY") == "1":
        points = {rep_label: rep_dir}
    out: dict[str, dict] = {}
    for label, sf_dir in points.items():
        con = duck_connect(sf_dir)
        out[label] = {}
        for name in queries:
            fn, sql = QUERIES[name]
            row = {}
            row["spark"] = time_spark(spark, fn, sf_dir)
            if sql:
                row["duckdb"] = time_duckdb(con, sql)
            out[label][name] = row
            print(f"{label} {name}: {row}", file=sys.stderr)
        con.close()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
