"""Drive the driver contract exactly as the verify harness would:
fresh SparkSession -> entry() smoke; then each queries() entry at
sf0.01 compared to oracle_sql() via DuckDB (row-count + sorted-column
value comparison)."""
import sys
sys.path.insert(0, "/root/repo")
import __spark_entry__ as E
from flapi_spark.session import get_spark

spark = get_spark(app_name="contract_drive")
spark.sparkContext.setLogLevel("ERROR")

# 1. entry() smoke
df = E.entry(spark)
rows = df.collect()
print("entry(): rows =", len(rows), "schema =", df.schema.simpleString())
assert len(rows) >= 0

# 2. queries vs oracles at sf0.01
import duckdb, math
con = duckdb.connect()
sf = "/root/testdata/sf0.01"
for t in ("region nation customer supplier part orders lineitem events documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

qs, oracles = E.queries(), E.oracle_sql()
fails = []
for name, fn in sorted(qs.items()):
    sdf = fn(spark, sf)
    if name not in oracles:
        print(f"{name}: rows-only, n={sdf.count()}")
        continue
    cols = sorted(sdf.columns)
    srows = sorted([tuple(str(r[c]) for c in cols) for r in sdf.collect()])
    res = con.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    idx = [dcols.index(c) for c in cols]
    drows = sorted([tuple(str(r[i]) for i in idx) for r in res.fetchall()])
    ok = srows == drows
    print(f"{name}: n={len(srows)} oracle_n={len(drows)} match={ok}")
    if not ok:
        fails.append(name)
        for a, b in list(zip(srows, drows))[:3]:
            if a != b:
                print("   ", a, "VS", b)
print("FAILS:", fails)
sys.exit(1 if fails else 0)
