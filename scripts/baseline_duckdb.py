"""Measure the single-node baseline: run each benched query's DuckDB
oracle SQL at $SPARK_GRAFT_SF_DIR (default sf0.1) on embedded DuckDB —
the same engine the reference embeds — and print one JSON line
{"queries": {name: sec}, "total": sec}.

This is the honest denominator for BASELINE.md: the reference is an
API server over embedded DuckDB, so its per-query compute cost at a
given SF is DuckDB's. min-of-2 runs, mirroring bench.py's estimator.
Entries without an oracle (rows-only) are skipped.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE
from flapi_spark.queries import QUERIES

TABLES = (
    "region nation customer supplier part orders lineitem events"
    " documents embeddings"
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    con = duckdb.connect()
    for t in TABLES.split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    budget_s = float(os.environ.get("BASELINE_QUERY_BUDGET_S", "120"))
    timings: dict[str, float | str] = {}
    total = 0.0
    for name in HEADLINE:
        entry = QUERIES.get(name)
        if not entry or not entry[1]:
            continue
        sql = entry[1]
        best = None
        timed_out = False
        for _ in range(2):
            timer = threading.Timer(budget_s, con.interrupt)
            timer.start()
            t0 = time.perf_counter()
            try:
                con.execute(sql).fetchall()
            except duckdb.Error:
                timed_out = True
                break
            finally:
                timer.cancel()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        if timed_out:
            # a >budget oracle is itself the datum: the single-node
            # engine exceeds the per-query budget at this SF
            timings[name] = f">{budget_s:g}"
            total += budget_s
            print(f"{name}: TIMEOUT >{budget_s:g}s", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        total += best
        print(f"{name}: {best:.3f}s", file=sys.stderr)
    print(json.dumps({
        "engine": "duckdb-embedded",
        "sf_dir": sf_dir,
        "queries": timings,
        "total": round(total, 3),
    }))


if __name__ == "__main__":
    main()
