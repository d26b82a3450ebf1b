"""Table profiling, candidate-key discovery, and FD checking.

The observability layer a data engine needs before it trusts a new
source: per-column profile cards (null rate, cardinality, bounds),
uniqueness checks for candidate keys, and functional-dependency
violation counts. flAPI surfaces the same information through its
DESCRIBE/OpenAPI schema layer and DuckDB's SUMMARIZE (reference:
src/api_server.cpp schema endpoints); here they are distributed
operators with exact SQL oracles.

Scale shape:
- `profile_table` is ONE aggregate over one scan: every per-column
  metric (count / nulls / distinct / min / max) is computed in a
  single .agg(...) and the wide result row is exploded into the
  per-column card afterwards — a pure driver-side pivot of one row,
  not a per-column scan loop. The exact count(distinct c1), ...,
  count(distinct ck) set expands the scan k-ways inside the aggregate
  (Spark's Expand operator) — the standard cost of exact multi-column
  cardinality; swap in approx_count_distinct at 100 TB when 2% error
  is acceptable (the plan collapses back to a single pass).
- Key/FD checks are groupBy aggregations on the checked columns —
  one hash shuffle each, map-side partial aggregation applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile card: (col_name, n_rows, n_null,
    n_distinct, min_num, max_num, min_str, max_str).

    Numeric columns report min/max as DOUBLE (min_num/max_num);
    everything else (strings, dates, timestamps) reports them as
    canonical strings (min_str/max_str) — never a numeric-to-string
    cast, whose rendering is engine-specific.
    """
    cols = cols or df.columns
    types = dict(df.dtypes)
    schema = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__dist_{c}"))
        if isinstance(schema[c], _NUMERIC):
            aggs.append(F.min(c).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"__max_{c}"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    cards = []
    for c in cols:
        numeric = isinstance(schema[c], _NUMERIC)
        cards.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").alias("n_null"),
                F.col(f"__dist_{c}").alias("n_distinct"),
                (F.col(f"__min_{c}") if numeric else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"__max_{c}") if numeric else F.lit(None).cast("double")).alias("max_num"),
                (F.lit(None).cast("string") if numeric else F.col(f"__min_{c}")).alias("min_str"),
                (F.lit(None).cast("string") if numeric else F.col(f"__max_{c}")).alias("max_str"),
            )
        )
    return wide.select(F.explode(F.array(*cards)).alias("card")).select("card.*")


def profile_table_oracle_sql(table: str, cols: list[str], numeric: set[str]) -> str:
    """UNION ALL of per-column aggregate SELECTs mirroring
    profile_table()'s output exactly."""
    parts = []
    for c in cols:
        if c in numeric:
            mn = f"CAST(min({c}) AS DOUBLE)", "CAST(NULL AS VARCHAR)"
            mx = f"CAST(max({c}) AS DOUBLE)", "CAST(NULL AS VARCHAR)"
            min_num, min_str = mn
            max_num, max_str = mx
        else:
            min_num, max_num = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            min_str = f"min(CAST({c} AS VARCHAR))"
            max_str = f"max(CAST({c} AS VARCHAR))"
        parts.append(
            f"SELECT '{c}' AS col_name,"
            f" CAST(count(*) AS BIGINT) AS n_rows,"
            f" CAST(count(*) - count({c}) AS BIGINT) AS n_null,"
            f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,"
            f" {min_num} AS min_num, {max_num} AS max_num,"
            f" {min_str} AS min_str, {max_str} AS max_str"
            f" FROM {table}"
        )
    return " UNION ALL ".join(parts)


# candidate-key inventory checked by the registry entry: the actual
# key of each fact table, a near-key, and a clearly non-unique combo
KEY_CANDIDATES = [
    ("orders", ["o_orderkey"]),
    ("orders", ["o_custkey"]),
    ("orders", ["o_custkey", "o_orderdate"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("lineitem", ["l_orderkey"]),
]


def candidate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(table_name, candidate, n_rows, n_distinct, is_key,
    uniqueness): exact uniqueness check for each candidate column
    set. Each check is one column-pruned scan + one aggregate; the
    distinct count over the combo shuffles on the combo itself."""
    out = None
    for table, cols in KEY_CANDIDATES:
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        row = df.agg(
            F.count("*").alias("n_rows"),
            F.countDistinct(*[F.col(c) for c in cols]).alias("n_distinct"),
        ).select(
            F.lit(table).alias("table_name"),
            F.lit(",".join(cols)).alias("candidate"),
            "n_rows",
            "n_distinct",
            (F.col("n_distinct") == F.col("n_rows")).alias("is_key"),
            F.round(F.col("n_distinct") / F.col("n_rows"), 6).alias("uniqueness"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def candidate_keys_oracle_sql() -> str:
    parts = []
    for table, cols in KEY_CANDIDATES:
        combo = ", ".join(cols)
        label = ",".join(cols)
        parts.append(
            f"SELECT '{table}' AS table_name, '{label}' AS candidate,"
            f" CAST(count(*) AS BIGINT) AS n_rows,"
            f" CAST(count(DISTINCT ({combo})) AS BIGINT) AS n_distinct,"
            f" count(DISTINCT ({combo})) = count(*) AS is_key,"
            f" round(CAST(count(DISTINCT ({combo})) AS DOUBLE)"
            f"  / count(*), 6) AS uniqueness"
            f" FROM {table}"
        )
    return " UNION ALL ".join(parts)


# FD inventory: lhs -> rhs checks spanning a true FD (the composite
# key determines everything) and plausible-but-false business FDs
FD_CHECKS = [
    ("orders", "o_orderkey", "o_orderstatus"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
]


def fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(table_name, lhs, rhs, n_groups, n_violating, fd_holds):
    does lhs functionally determine rhs? A violating group is an lhs
    value mapping to more than one distinct rhs. One groupBy(lhs)
    shuffle per check, map-side partials apply."""
    out = None
    for table, lhs, rhs in FD_CHECKS:
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        g = df.groupBy(lhs).agg(F.countDistinct(rhs).alias("nd"))
        row = g.agg(
            F.count("*").alias("n_groups"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias("n_violating"),
        ).select(
            F.lit(table).alias("table_name"),
            F.lit(lhs).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            "n_groups",
            "n_violating",
            (F.col("n_violating") == 0).alias("fd_holds"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def fd_violations_oracle_sql() -> str:
    parts = []
    for table, lhs, rhs in FD_CHECKS:
        parts.append(
            f"SELECT '{table}' AS table_name, '{lhs}' AS lhs,"
            f" '{rhs}' AS rhs,"
            f" CAST(count(*) AS BIGINT) AS n_groups,"
            f" CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)"
            f"  AS n_violating,"
            f" sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds"
            f" FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS nd"
            f"  FROM {table} GROUP BY {lhs}) g"
        )
    return " UNION ALL ".join(parts)
