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
    thresholds. One groupBy (map-side combined); the top-N cut is
    orderBy+limit (TakeOrderedAndProject — per-partition heap over
    the key-cardinality count table, which is itself fact-scale for
    high-cardinality keys, so no global window); the total is the
    input row count (one scalar); the rank window runs over the N
    survivors. The raw table is touched once per pass."""
    from pyspark.sql import Window

    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    tot = df.count()
    w_rank = Window.orderBy(F.desc("n"), F.asc(key))
    return (
        counts.orderBy(F.desc("n"), F.asc(key))
        .limit(top_n)
        .select(
            key,
            F.col("n").cast("long").alias("n"),
            (F.col("n") / F.lit(tot)).alias("share"),
            F.row_number().over(w_rank).cast("long").alias("rnk"),
        )
    )


def skew_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skew_profile over orders.o_custkey (the key a customer-enrich
    join would shuffle on). Exact DuckDB oracle in queries.py."""
    from flapi_spark.session import load_table

    return skew_profile(load_table(spark, sf_dir, "orders"), "o_custkey")


def _frozen_bins(
    df: DataFrame, order_cols: list[str], num_partitions: int
) -> DataFrame:
    """Deterministic range-binning with FROZEN literal boundaries.

    ``repartitionByRange`` re-SAMPLES split points per job
    (RangePartitioner seeds differ per shuffle), so two passes over
    the same plan can disagree on boundaries — fatal when a counts
    pass feeds offsets to a later pass. One seeded sample (bounded:
    ~200 keys per target bin) picks split points, collected once and
    baked into the plan as struct-comparison literals; every
    subsequent job bins identically. Adds ``__bin`` (0..n_bins-1,
    range-ordered)."""
    spark = df.sparkSession
    n = df.count()  # parquet-footer / cached-plan scalar
    key = F.struct(*[F.col(c) for c in order_cols])
    if n > 0 and num_partitions > 1:
        frac = min(1.0, (num_partitions * 200) / n)
        sampled = sorted(
            tuple(r) for r in
            df.select(*order_cols).sample(False, frac, seed=42).collect()
        )
        nb = num_partitions - 1
        step = max(1, len(sampled) // (nb + 1))
        raw = [sampled[min(i * step, len(sampled) - 1)]
               for i in range(1, nb + 1)]
        bounds = sorted(set(raw))
    else:
        bounds = []
    dtypes = dict(df.dtypes)
    bin_col = F.lit(0)
    for b in bounds:
        # literal struct must mirror the key struct's field names AND
        # types (lit(2376) is INT, event_id is BIGINT) or the struct
        # comparison fails to resolve
        bound = F.struct(*[
            F.lit(v).cast(dtypes[c]).alias(c)
            for v, c in zip(b, order_cols)
        ])
        bin_col = bin_col + F.when(key > bound, 1).otherwise(0)
    return df.withColumn("__bin", bin_col)


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "__rank",
    num_partitions: int | None = None,
    checkpoint_input: bool = False,
) -> DataFrame:
    """Exact global 1-based row numbering by `order_cols` WITHOUT a
    single-task global sort.

    An unpartitioned ``row_number().over(Window.orderBy(...))`` plans
    as one exchange to ONE partition — the canonical 100×-scale
    killer. This is the distributed twin: deterministic range bins
    (see _frozen_bins), per-bin counts (one tiny agg; collect bounded
    by the bin count, not the data) become cumulative offsets
    broadcast back, and per-bin ``row_number`` windows sort only
    their own slice.

    `order_cols` must form a UNIQUE total order (composite keys
    including a tiebreaker are fine — comparison is on the full
    struct, so ties never straddle bins nondeterministically).
    Output = `df` + `rank_col`, identical to the single-task window.
    """
    return global_ordered_prefix(
        df, order_cols, rank_col=rank_col, num_partitions=num_partitions,
        checkpoint_input=checkpoint_input,
    )


def global_ordered_prefix(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "__rank",
    sum_col: str | None = None,
    prefix_col: str = "__prefix",
    num_partitions: int | None = None,
    checkpoint_input: bool = False,
) -> DataFrame:
    """global_rank plus (optionally) an exact global running SUM of
    `sum_col` in `order_cols` order — the distributed twin of
    ``sum(x).over(Window.orderBy(...).rowsBetween(unboundedPreceding,
    currentRow))``, the shape Gini/Lorenz/ABC cumulative-share
    analytics need. Same frozen-bin machinery; the per-bin agg
    collects (count, sum) pairs so both the rank offset and the
    prefix-sum offset come from one bounded collect.

    `sum_col` must be integral or double (the repo-wide exact-cents
    convention): a DECIMAL sum would silently lose its scale through
    the LONG/DOUBLE offset schema, so it is rejected up front.

    `checkpoint_input=True` materializes `df` ONCE before the
    machinery's four passes (count, boundary sample, per-bin counts,
    final output — each otherwise re-runs the input lineage, pruned).
    Opt in when the input is a NARROW pre-aggregated frame that is
    expensive to recompute and cheap to store (value-grain /
    customer-grain rollups behind a join); leave off for wide
    corpus-grain frames, where one full-width materialization costs
    more than three column-pruned recomputes (measured both ways —
    see the band-candidate note in dedup.py)."""
    from pyspark.sql import Window

    spark = df.sparkSession
    if sum_col is not None:
        t = dict(df.dtypes).get(sum_col, "")
        if t.startswith("decimal"):
            raise ValueError(
                f"global_ordered_prefix: sum_col {sum_col!r} is {t};"
                " cast to BIGINT integer cents (or DOUBLE) first —"
                " decimal offsets would lose scale"
            )
    # validate BEFORE materializing: the rejection path must not pay
    # (or leak) a full checkpoint of the input
    if checkpoint_input:
        df = df.localCheckpoint(eager=True)
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    binned = _frozen_bins(df, order_cols, num_partitions)
    aggs = [F.count(F.lit(1)).alias("__cnt")]
    is_double = False
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("__bin_sum"))
        is_double = dict(df.dtypes)[sum_col] in ("double", "float")
    counts = binned.groupBy("__bin").agg(*aggs).orderBy("__bin").collect()
    rows = []
    # the accumulator's PYTHON type must match the offset schema from
    # row one (DoubleType rejects int 0), so seed it by column dtype
    run_n = 0
    run_s = 0.0 if is_double else 0
    for r in counts:
        rows.append((r["__bin"], run_n, run_s))
        run_n += r["__cnt"]
        if sum_col is not None:
            run_s += r["__bin_sum"] or (0.0 if is_double else 0)
    off_schema = (
        "__bin INT, __off LONG, __soff DOUBLE"
        if is_double else "__bin INT, __off LONG, __soff LONG"
    )
    offset_df = spark.createDataFrame(rows, off_schema)
    w = Window.partitionBy("__bin").orderBy(*order_cols)
    out = (
        binned.withColumn("__local_rn", F.row_number().over(w))
        .join(F.broadcast(offset_df), "__bin")
        .withColumn(rank_col, F.col("__off") + F.col("__local_rn"))
    )
    if sum_col is not None:
        wsum = w.rowsBetween(Window.unboundedPreceding, 0)
        out = out.withColumn(
            prefix_col, F.col("__soff") + F.sum(sum_col).over(wsum)
        )
    return out.drop("__bin", "__local_rn", "__off", "__soff")


def ntile_band(rank: "F.Column", n_rows: "F.Column", k: int) -> "F.Column":
    """SQL ntile(k) bucket for a 1-based `rank` out of `n_rows` —
    column-expression twin of the window function, for use after
    :func:`global_rank`. First ``n_rows % k`` tiles get one extra row
    (exact ANSI ntile semantics). Division runs in double then
    truncates — exact while ranks stay under 2^53 (at the 100 TB SF
    orders is ~1.5e11 rows, comfortably inside)."""
    rem = n_rows % k                       # first `rem` tiles are larger
    small = ((n_rows - rem) / k).cast("long")  # floor size of a tile
    big_span = rem * (small + 1)  # rows covered by the larger tiles
    return F.when(
        rank <= big_span, (rank - 1) / (small + 1)
    ).otherwise(
        rem + (rank - 1 - big_span) / F.greatest(small, F.lit(1))
    ).cast("long") + 1


def compact_bucketed_table(
    spark: "SparkSession", table: str, stage_suffix: str = "__compact",
    writer_tasks: int = 1,
) -> dict:
    """Small-files compaction for a BUCKETED warehouse table, bucket
    spec preserved (round 8). Every `insertInto` append (band index /
    shingle store maintenance, bucketed fact appends) lands one file
    per bucket per writing task, so a long-running ingest multiplies
    per-bucket file counts and probes pay per-file open/footer costs.
    `sinks.compact_parquet` cannot serve here: a plain-parquet rewrite
    drops the metastore bucket spec, silently demoting every
    zero-exchange probe back to a shuffle.

    Mechanics: DESCRIBE the live table for its bucket/sort spec,
    rewrite into a staging table with the SAME spec (one shuffle into
    n_buckets writer tasks → exactly one file per bucket), then
    RENAME-swap (stage → table, the writes.py pattern — a metadata +
    directory move, never an in-place overwrite readers might be
    scanning). Consumers re-list on their next freshly-resolved read
    (refreshTable'd here, same contract as the maintainers).

    CRASH/CONCURRENCY CONTRACT (round-9 ADVICE): the two renames are
    not one atomic step — a process crash between them leaves no
    `{table}` but a complete `{table}__precompact`, and a reader
    resolving the name inside that window sees table-not-found. The
    recovery check below makes a RERUN heal that state (rename the
    precompact snapshot back before proceeding), so the operator is
    idempotent across crashes; run it single-writer in a maintenance
    window, like the maintainers it serves.

    Returns {"files_before", "files_after", "rows"}."""
    import glob as _glob
    import re as _re

    old = f"{table}__precompact"
    if not spark.catalog.tableExists(table) and spark.catalog.tableExists(old):
        # crashed mid-swap on a prior run: the live table was renamed
        # away but the stage never took its place — restore it first
        spark.sql(f"ALTER TABLE {old} RENAME TO {table}")

    desc = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    }
    if "Num Buckets" not in desc:
        raise ValueError(
            f"compact_bucketed_table: {table} is not bucketed — use "
            "sinks.compact_parquet for plain datasets (a bucket-less "
            "rewrite here would silently drop nothing, but the point "
            "of this operator is preserving the bucket spec)"
        )
    n_buckets = int(desc["Num Buckets"])
    cols = _re.findall(r"`([^`]+)`", desc["Bucket Columns"])
    sort_cols = _re.findall(r"`([^`]+)`", desc.get("Sort Columns", ""))
    loc = desc["Location"].removeprefix("file:")
    files_before = len(_glob.glob(f"{loc}/**/*.parquet", recursive=True))
    df = spark.table(table)
    rows = df.count()
    stage = f"{table}{stage_suffix}"
    spark.sql(f"DROP TABLE IF EXISTS {stage}")
    # coalesce, not repartition: the V1 bucketed-write path strips a
    # user repartition (measured: repartition(n_buckets, cols) still
    # ran one writer task per INPUT split, 450 files; coalesce(1)
    # wrote exactly n_buckets). Each writer task emits one file per
    # bucket it holds, so files_after == writer_tasks * n_buckets —
    # keep writer_tasks=1 for index-sized tables; raise it for tables
    # where single-task write throughput is the bottleneck (the
    # files-per-bucket trade is still ~appends-fold better)
    w = df.coalesce(max(1, writer_tasks)).write.mode("overwrite")
    w = w.bucketBy(n_buckets, *cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(stage)
    spark.sql(f"DROP TABLE IF EXISTS {old}")
    spark.sql(f"ALTER TABLE {table} RENAME TO {old}")
    try:
        spark.sql(f"ALTER TABLE {stage} RENAME TO {table}")
    except Exception:
        spark.sql(f"ALTER TABLE {old} RENAME TO {table}")  # restore
        raise
    spark.sql(f"DROP TABLE {old}")
    spark.catalog.refreshTable(table)
    new_loc = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    }["Location"].removeprefix("file:")
    files_after = len(_glob.glob(f"{new_loc}/**/*.parquet", recursive=True))
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": rows,
    }
