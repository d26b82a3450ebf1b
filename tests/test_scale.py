"""Scale-path join strategies: salting correctness (identical result to
the plain join) and bucketed co-location (no shuffle exchange in the
physical plan)."""

import pyspark.sql.functions as F
import pytest

from flapi_spark.operators import scale
from flapi_spark.session import load_table


def _rowset(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(orders, "l_orderkey")
    salted = scale.salted_join(li, orders, "l_orderkey", n_salts=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _rowset(salted.select(*plain.columns)) == _rowset(plain)


def test_salted_join_spreads_hot_key(spark):
    # one hot key (99% of rows) — every salt bucket must receive rows
    big = spark.range(10_000).select(
        F.when(F.col("id") % 100 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(20).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    salt = F.pmod(F.xxhash64("k", "payload"), F.lit(8))
    n_buckets = big.where(F.col("k") == 7).select(salt.alias("s")).distinct().count()
    assert n_buckets == 8  # the hot key's rows hash across all salts
    joined = scale.salted_join(big, small, "k", n_salts=8)
    assert joined.count() == big.where(F.col("k").isin([i for i in range(20)])).count()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    scale.write_bucketed(cust, "t_cust_bucketed", "c_custkey", n_buckets=4)
    scale.write_bucketed(orders, "t_orders_bucketed", "c_custkey", n_buckets=4)
    try:
        joined = scale.colocated_join(
            spark, "t_cust_bucketed", "t_orders_bucketed", "c_custkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and it's still correct
        expected = cust.join(orders, "c_custkey").count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cust_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_orders_bucketed")


def test_salted_join_rejects_outer_hows(spark):
    import pytest

    big = spark.range(10).withColumnRenamed("id", "k")
    small = spark.range(5).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError):
            scale.salted_join(big, small, "k", how=how)
    # left join still works and matches the plain join
    got = sorted(
        r.k for r in scale.salted_join(big, small, "k", how="left").collect()
    )
    assert got == list(range(10))


def test_skew_profile_matches_plain_counts(spark, sf_dir):
    from flapi_spark.operators.scale import skew_profile_orders
    from flapi_spark.session import load_table

    prof = sorted(skew_profile_orders(spark, sf_dir).collect(),
                  key=lambda r: r.rnk)
    orders = load_table(spark, sf_dir, "orders")
    total = orders.count()
    counts = {
        r.o_custkey: r.n
        for r in orders.groupBy("o_custkey").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert len(prof) == 20
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.o_custkey, r.n) for r in prof] == top
    for r in prof:
        assert abs(r.share - r.n / total) < 1e-12
    assert [r.rnk for r in prof] == list(range(1, 21))


def test_global_rank_matches_single_task_window(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flapi_spark.operators.scale import global_rank
    from flapi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    w = Window.orderBy("value", "event_id")
    expected = ev.withColumn("r", F.row_number().over(w).cast("long"))
    got = global_rank(ev, ["value", "event_id"], "r")
    diff = expected.join(got, "event_id").where(
        expected.r != got.r
    )
    assert diff.count() == 0
    assert got.count() == ev.count()


def test_global_ordered_prefix_matches_window_cumsum(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flapi_spark.operators.scale import global_ordered_prefix
    from flapi_spark.session import load_table

    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents",
    )
    w = (
        Window.orderBy("cents", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    expected = o.withColumn("cum", F.sum("cents").over(w))
    got = global_ordered_prefix(
        o, ["cents", "o_orderkey"], rank_col="r",
        sum_col="cents", prefix_col="cum",
    )
    joined = expected.alias("e").join(got.alias("g"), "o_orderkey")
    assert joined.where("e.cum != g.cum").count() == 0


def test_global_ordered_prefix_checkpoint_input_parity(spark, sf_dir):
    """checkpoint_input=True is a pure materialization knob — ranks
    and prefix sums must be bit-identical to the lazy path (the
    frozen-bin boundaries come from the same seeded sample either
    way)."""
    from flapi_spark.operators.scale import global_ordered_prefix
    from flapi_spark.session import load_table

    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents",
    )
    kw = dict(rank_col="r", sum_col="cents", prefix_col="cum")
    lazy = global_ordered_prefix(o, ["cents", "o_orderkey"], **kw)
    ckpt = global_ordered_prefix(
        o, ["cents", "o_orderkey"], checkpoint_input=True, **kw
    )
    joined = lazy.alias("a").join(ckpt.alias("b"), "o_orderkey")
    assert joined.where("a.r != b.r OR a.cum != b.cum").count() == 0
    assert ckpt.count() == o.count()


def test_global_rank_empty_and_tiny_inputs(spark):
    from flapi_spark.operators.scale import global_rank

    empty = spark.range(0).selectExpr("id AS k")
    assert global_rank(empty, ["k"], "r").count() == 0
    tiny = spark.range(3).selectExpr("id AS k")
    got = {r.k: r.r for r in global_rank(tiny, ["k"], "r").collect()}
    assert got == {0: 1, 1: 2, 2: 3}


def test_global_ordered_prefix_rejects_decimal_sum(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from flapi_spark.operators.scale import global_ordered_prefix

    df = spark.range(5).select(
        "id", F.expr("CAST(id AS DECIMAL(10,2))").alias("d")
    )
    with _pytest.raises(ValueError, match="integer cents"):
        global_ordered_prefix(df, ["id"], sum_col="d")


def test_ntile_band_property_matches_ansi_semantics(spark):
    """Property: for random (n, k), ntile_band over ranks 1..n equals
    Spark's own ntile(k) window output."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flapi_spark.operators.scale import ntile_band

    rng = random.Random(1234)
    cases = [(rng.randint(1, 500), rng.randint(1, 12)) for _ in range(12)]
    cases += [(1, 1), (1, 5), (4, 4), (5, 4), (3, 10)]
    for n, k in cases:
        df = spark.range(1, n + 1).toDF("r")
        w = Window.orderBy("r")
        expected = df.select(
            "r", F.ntile(k).over(w).cast("long").alias("e")
        )
        got = df.select(
            "r", ntile_band(F.col("r"), F.lit(n), k).alias("g")
        )
        bad = expected.join(got, "r").where("e != g").count()
        assert bad == 0, (n, k)


def test_global_ordered_prefix_double_sum_works(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flapi_spark.operators.scale import global_ordered_prefix

    df = spark.range(1, 101).select(
        "id", (F.col("id") * 0.5).alias("x")
    )
    got = global_ordered_prefix(
        df, ["id"], rank_col="r", sum_col="x", prefix_col="cum"
    )
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    exp = df.withColumn("cum", F.sum("x").over(w))
    joined = exp.alias("e").join(got.alias("g"), "id")
    assert joined.where("abs(e.cum - g.cum) > 1e-9").count() == 0


def test_compact_bucketed_table_preserves_spec_and_plan(spark, sf_dir):
    """Round 8: after N appends multiply per-bucket files, compaction
    rewrites to one file per bucket, the bucket/sort spec survives the
    RENAME-swap (zero-exchange probe still plans as a bucketed scan),
    and the row set is unchanged."""
    from flapi_spark.operators.dedup import (
        append_band_index, pairs_from_band_index, write_band_index_portable,
        append_band_index_portable,
    )
    from flapi_spark.operators.scale import compact_bucketed_table
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    docs = load_table(spark, sf_dir, "documents")
    table = "t_compact_band_idx"
    _rm_table(spark, table)
    spark.sql(f"DROP TABLE IF EXISTS {table}__precompact")
    spark.sql(f"DROP TABLE IF EXISTS {table}__compact")
    try:
        write_band_index_portable(spark, docs.where("doc_id % 4 = 0"), table)
        for m in (1, 2, 3):  # three appends -> files multiply
            append_band_index_portable(
                spark, docs.where(f"doc_id % 4 = {m}"), table
            )
        before = {tuple(r) for r in spark.table(table).collect()}
        stats = compact_bucketed_table(spark, table)
        assert stats["files_after"] < stats["files_before"]
        assert stats["rows"] == len(before)
        after = {tuple(r) for r in spark.table(table).collect()}
        assert after == before
        desc = {
            r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
        }
        assert "band_id" in desc["Bucket Columns"]
        # the zero-exchange probe still plans bucketed post-swap
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            df = pairs_from_band_index(spark, docs, table)
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert plan.count("Bucketed: true") >= 2
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        _rm_table(spark, table)
        spark.sql(f"DROP TABLE IF EXISTS {table}__precompact")
        spark.sql(f"DROP TABLE IF EXISTS {table}__compact")


def test_compact_bucketed_table_rejects_unbucketed(spark):
    from flapi_spark.operators.scale import compact_bucketed_table
    from flapi_spark.writes import _rm_table

    import pytest as _pytest

    t = "t_compact_plain"
    _rm_table(spark, t)
    try:
        spark.range(10).write.saveAsTable(t)
        with _pytest.raises(ValueError, match="not bucketed"):
            compact_bucketed_table(spark, t)
    finally:
        _rm_table(spark, t)


def test_compact_bucketed_table_recovers_from_crashed_swap(spark, sf_dir):
    """Round 9 (ADVICE): the rename-swap is not atomic — simulate a
    crash between the two renames (live table renamed away, stage
    never promoted) and assert a RERUN heals the orphaned
    __precompact snapshot and completes the compaction."""
    from flapi_spark.operators.dedup import (
        append_band_index_portable, write_band_index_portable,
    )
    from flapi_spark.operators.scale import compact_bucketed_table
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    docs = load_table(spark, sf_dir, "documents")
    table = "t_compact_crash"
    for t in (table, f"{table}__precompact", f"{table}__compact"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        write_band_index_portable(spark, docs.where("doc_id % 2 = 0"), table)
        append_band_index_portable(spark, docs.where("doc_id % 2 = 1"), table)
        before = {tuple(r) for r in spark.table(table).collect()}
        # crash window: first rename committed, second never ran
        spark.sql(f"ALTER TABLE {table} RENAME TO {table}__precompact")
        assert not spark.catalog.tableExists(table)
        stats = compact_bucketed_table(spark, table)
        assert stats["rows"] == len(before)
        assert {tuple(r) for r in spark.table(table).collect()} == before
        desc = {
            r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
        }
        assert "band_id" in desc["Bucket Columns"]
    finally:
        for t in (table, f"{table}__precompact", f"{table}__compact"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
