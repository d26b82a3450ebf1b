"""Scale-path join strategies: skew salting and bucketed co-location.

These are the knobs a 100 TB deployment turns when AQE alone isn't
enough. The reference runs single-node DuckDB and never needs them;
they are part of this engine's Spark-first scale design (SURVEY §4).

- **Salted join**: a shuffle join on a skewed key puts one hot key's
  entire row set into one task. Salting splits each hot key into
  `n_salts` sub-keys: the big (skewed) side gets a deterministic salt
  from its row content, the small side is replicated once per salt.
  Result identical to the plain join; the hot key now spreads over
  `n_salts` tasks. Use when AQE skew-join can't help (e.g. skewed
  aggregation feeding a join, or a non-sort-merge plan).

- **Bucketed co-located join**: pre-bucket both tables on the join key
  into the warehouse (`DataFrameWriter.bucketBy`); Spark then plans a
  sort-merge join with NO shuffle exchange on either side — the join
  cost at read time is a local sort per bucket. This is the "reuse a
  partitioning across stages" move: pay the shuffle once at write
  time, amortize it over every subsequent join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join `big` (skewed) with `small` on `key`, spreading each key
    over `n_salts` shuffle partitions.

    The salt on the big side is derived from the whole row (xxhash64 of
    all columns) so it is deterministic — replayable plans, no RNG in
    the lineage. The small side crossJoins a `sequence()` literal (no
    driver-side loop) to produce one replica per salt.

    Only ``inner`` and ``left`` joins are supported: the small side is
    replicated once per salt, so a right/full outer join would emit
    every unmatched small-side row `n_salts` times (duplicate
    null-padded rows) instead of once.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}:"
            " the replicated small side would duplicate unmatched rows"
            " under right/full outer semantics"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn("__salt", salt.cast("int"))
    small_s = small.crossJoin(F.broadcast(_salt_range(small.sparkSession, n_salts)))
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def _salt_range(spark: SparkSession, n_salts: int) -> DataFrame:
    return spark.range(n_salts).select(F.col("id").cast("int").alias("__salt"))


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed+sorted warehouse table on `key`.

    One shuffle now; every later equi-join or aggregation on `key`
    between same-bucketed tables runs with zero exchanges."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed warehouse tables on their bucket key.

    With matching bucket specs Catalyst plans SortMergeJoin with no
    ShuffleExchange on either side (asserted in tests via the physical
    plan). The MERGE hint keeps the planner from choosing a broadcast
    join on small inputs, which would skip the bucketed path this
    helper exists to exercise — at warehouse scale SMJ is what the
    planner picks anyway."""
    return spark.table(left_table).hint("merge").join(
        spark.table(right_table).hint("merge"), key
    )


def skew_profile(
    df: DataFrame, key: str, top_n: int = 20
) -> DataFrame:
    """Join-key skew profiler: per-key row counts, corpus share, and
    rank for the `top_n` heaviest keys — the diagnostic an engineer
    runs BEFORE shuffling 100 TB on a key, to size salting / AQE skew
    thresholds. One groupBy (map-side combined) plus a windowed rank
    over the key-cardinality-sized count table; the raw table is
    touched once."""
    from pyspark.sql import Window

    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    w_all = Window.partitionBy()
    w_rank = Window.orderBy(F.desc("n"), F.asc(key))
    return (
        counts.withColumn("tot", F.sum("n").over(w_all))
        .withColumn("rnk", F.row_number().over(w_rank).cast("long"))
        .where(F.col("rnk") <= top_n)
        .select(
            key,
            F.col("n").cast("long").alias("n"),
            (F.col("n") / F.col("tot")).alias("share"),
            "rnk",
        )
    )


def skew_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skew_profile over orders.o_custkey (the key a customer-enrich
    join would shuffle on). Exact DuckDB oracle in queries.py."""
    from flapi_spark.session import load_table

    return skew_profile(load_table(spark, sf_dir, "orders"), "o_custkey")
