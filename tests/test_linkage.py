"""Round 10e: entity resolution / record linkage + profiling.

Golden and property tests beyond the oracle equalities the driver
checks: the dirty-table derivation is verified against an independent
pure-Python replay, the damage classes against their designed edit
distances, and the chain against ground truth recovered end to end.
"""

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_df_matches_oracle


def _oracle(name):
    from flapi_spark.queries import QUERIES

    return QUERIES[name][1]


def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _py_records(custkeys):
    """Independent replay of the er_records derivation."""
    import hashlib

    from flapi_spark.operators.linkage import (
        ER_FIRST, ER_LAST, ER_SUFFIX, ER_ZIP_MOD,
    )

    recs = {}
    for ck in custkeys:
        h = int(hashlib.md5(f"er:{ck}".encode()).hexdigest()[:15], 16)
        w1 = ER_FIRST[h % 24]
        w2 = ER_LAST[(h // 24) % 24]
        sfx = ER_SUFFIX[(h // 576) % 5]
        zipc = (h // 2880) % ER_ZIP_MOD
        name = f"{w1} {w2}{sfx}"
        p = 3 + ck % 2  # 1-based
        recs[ck * 10] = ("crm", name, zipc)
        if ck % 3 == 1:
            recs[ck * 10 + 1] = ("web", name[: p - 1] + name[p:], zipc)
        if ck % 3 == 2:
            recs[ck * 10 + 2] = (
                "app",
                name[: p - 1] + name[p] + name[p - 1] + name[p + 1 :],
                zipc,
            )
        if ck % 12 == 0:
            recs[ck * 10 + 3] = ("legacy", f"{w2} {w1}{sfx}", zipc)
    return recs


@pytest.fixture(scope="module")
def records(spark, sf_dir):
    from flapi_spark.operators.linkage import er_records

    return {
        r.rec_id: (r.src, r.name, r.zip)
        for r in er_records(spark, sf_dir).collect()
    }


def test_er_records_matches_python_replay(spark, sf_dir, records):
    cks = [
        r.c_custkey
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey")
        .collect()
    ]
    assert records == _py_records(cks)


def test_er_damage_classes_have_designed_distances(records):
    by_base = {}
    for rec_id, (src, name, _zip) in records.items():
        by_base.setdefault(rec_id // 10, {})[src] = name
    n_web = n_app = n_legacy = 0
    for members in by_base.values():
        base = members["crm"]
        if "web" in members:
            assert _py_levenshtein(base, members["web"]) == 1
            n_web += 1
        if "app" in members:
            # transposing identical adjacent chars is a no-op (lev 0)
            assert _py_levenshtein(base, members["app"]) in (0, 2)
            n_app += 1
        if "legacy" in members:
            # token swap is designed to clear the threshold when the
            # two words differ (they always do: disjoint word lists)
            assert _py_levenshtein(base, members["legacy"]) > 2
            n_legacy += 1
    assert n_web > 0 and n_app > 0 and n_legacy > 0


def test_er_blocking_recall_on_editable_variants(spark, sf_dir, records):
    """Every within-threshold true pair must survive blocking: a
    single in-word edit breaks at most one of the two affix keys."""
    from flapi_spark.operators.linkage import er_blocked_pairs

    matched = {
        (r.rec_a, r.rec_b)
        for r in er_blocked_pairs(spark, sf_dir).collect()
    }
    for rec_id, (src, name, _zip) in records.items():
        if src in ("web", "app"):
            base_id = (rec_id // 10) * 10
            if _py_levenshtein(records[base_id][1], name) <= 2:
                assert (base_id, rec_id) in matched, (base_id, rec_id)


def test_er_clusters_recover_entities(spark, sf_dir):
    """Variant records land in the same entity as their base — even
    the web/app pair that can be 3 edits apart directly."""
    from flapi_spark.operators.linkage import er_clusters

    ent = {r.rec_id: r.entity_id for r in er_clusters(spark, sf_dir).collect()}
    for rec_id, eid in ent.items():
        base_id = (rec_id // 10) * 10
        if rec_id % 10 in (1, 2) and base_id in ent:
            assert ent[base_id] == eid


def test_er_eval_bounds(spark, sf_dir):
    from flapi_spark.operators.linkage import er_eval

    row = er_eval(spark, sf_dir).collect()[0]
    assert row.n_tp <= row.n_pred_pairs
    assert row.n_tp <= row.n_true_pairs
    # legacy copies are beyond the threshold -> recall strictly < 1;
    # precision dips below 1 only when the birthday-random name space
    # actually collides (guaranteed neither way at sf0.001)
    assert 0.5 < row.recall < 1.0
    assert 0.7 < row.precision <= 1.0
    assert 0.0 < row.f1 < 1.0


def test_er_golden_record_prefers_trusted_source(spark, sf_dir):
    from flapi_spark.operators.linkage import er_golden_record

    rows = er_golden_record(spark, sf_dir).collect()
    # every entity with >1 member must have been merged from a cluster
    multi = [r for r in rows if r.n_members > 1]
    assert multi
    for r in multi:
        assert r.n_sources >= 1
        # a multi-member entity that contains its crm base keeps it
        if r.survivor_rec_id % 10 == 0:
            assert r.survivor_src == "crm"
    # total members across golden rows == total records
    from flapi_spark.operators.linkage import er_records

    n_recs = er_records(spark, sf_dir).count()
    assert sum(r.n_members for r in rows) == n_recs


def test_er_oracle_equalities(spark, sf_dir, duck, views):
    from flapi_spark.operators.linkage import er_block_stats, er_eval

    assert_df_matches_oracle(
        er_block_stats(spark, sf_dir), duck, _oracle("er_block_stats")
    )
    assert_df_matches_oracle(
        er_eval(spark, sf_dir), duck, _oracle("er_eval")
    )


def test_profile_orders_card(spark, sf_dir, duck, views):
    from flapi_spark.queries import QUERIES

    df = QUERIES["table_profile_orders"][0](spark, sf_dir)
    cards = {r.col_name: r for r in df.collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    assert cards["o_orderkey"].n_rows == n
    assert cards["o_orderkey"].n_distinct == n
    assert cards["o_orderkey"].n_null == 0
    assert cards["o_totalprice"].min_num <= cards["o_totalprice"].max_num
    assert cards["o_orderstatus"].min_str is not None
    assert cards["o_orderstatus"].max_num is None
    assert_df_matches_oracle(df, duck, _oracle("table_profile_orders"))


def test_er_pairs_indexed_matches_inline_and_plan_is_bucketed(
    spark, sf_dir,
):
    """The persisted-index twin returns bit-identical pairs, and its
    probe plan reads the bucketed table (no re-derivation from the
    customer parquet, no index-side exchange prerequisites)."""
    from flapi_spark.operators.linkage import er_blocked_pairs
    from flapi_spark.queries import _er_pairs_indexed
    from flapi_spark.writes import _rm_table

    table = "t_er_idx_test"
    _rm_table(spark, table)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        indexed = _er_pairs_indexed(spark, sf_dir, table=table)
        plan = indexed._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert "customer.parquet" not in plan
        got = {tuple(r) for r in indexed.collect()}
        expect = {tuple(r) for r in er_blocked_pairs(spark, sf_dir).collect()}
        assert got == expect and got
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        _rm_table(spark, table)


def test_er_guard_stream_equals_batch_and_index_resident(
    spark, sf_dir, tmp_path_factory,
):
    """availableNow run over a landed record batch == the batch twin
    pair-for-pair; the micro-batch plan probes the bucketed index and
    never touches the customer parquet."""
    import glob
    import shutil
    import uuid

    from flapi_spark import streaming as ST
    from flapi_spark.operators.linkage import (
        append_er_index, er_records, write_er_index,
    )
    from flapi_spark.writes import _rm_table

    table = "t_er_guard_idx"
    _rm_table(spark, table)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        recs = er_records(spark, sf_dir)
        corpus = recs.filter(F.col("rec_id") % 7 != 0)
        incoming = recs.filter(F.col("rec_id") % 7 == 0)
        write_er_index(spark, corpus, table)

        d = tmp_path_factory.mktemp("er_guard_landing")
        staging = str(d / "_stage")
        incoming.coalesce(1).write.parquet(staging)
        shutil.copy(
            glob.glob(staging + "/part-*.parquet")[0],
            str(d / "batch_0.parquet"),
        )
        shutil.rmtree(staging)

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        stream = spark.readStream.schema(
            "rec_id BIGINT, src STRING, name STRING, zip INT"
        ).parquet(str(d))
        guarded = ST.er_guard_stream(stream, spark.table(table))
        name = "t" + uuid.uuid4().hex[:10]
        q = (
            guarded.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        plan = q._jsq.explainInternal(True)
        assert "Bucketed: true" in plan
        assert "customer.parquet" not in plan
        got = {tuple(r) for r in spark.table(name).collect()}
        expect = {
            tuple(r)
            for r in ST.er_guard_batch(
                incoming, spark.table(table)
            ).collect()
        }
        assert got == expect and got

        # maintenance: fold the incoming batch in; probing with the
        # CORPUS records now surfaces their previously-held-out
        # same-entity partners (insertInto preserved the buckets)
        append_er_index(spark, incoming, table)
        spark.catalog.refreshTable(table)
        seen = {
            r.index_rec_id
            for r in ST.er_guard_batch(
                corpus, spark.table(table)
            ).collect()
        }
        assert any(i % 7 == 0 for i in seen)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        _rm_table(spark, table)


def test_candidate_keys_and_fd(spark, sf_dir, duck, views):
    from flapi_spark.operators.profile import candidate_keys, fd_violations

    keys = {
        (r.table_name, r.candidate): r
        for r in candidate_keys(spark, sf_dir).collect()
    }
    assert keys[("orders", "o_orderkey")].is_key
    # the synthetic lineitem does NOT honor TPC-H's composite key —
    # (l_orderkey, l_linenumber) repeats — which is precisely the
    # surprise a key check exists to catch before a MERGE trusts it
    assert not keys[("lineitem", "l_orderkey,l_linenumber")].is_key
    assert (
        keys[("lineitem", "l_orderkey,l_linenumber")].uniqueness
        > keys[("lineitem", "l_orderkey")].uniqueness
    )
    assert not keys[("lineitem", "l_orderkey")].is_key
    fds = {
        (r.table_name, r.lhs, r.rhs): r
        for r in fd_violations(spark, sf_dir).collect()
    }
    # the primary key trivially determines any column
    assert fds[("orders", "o_orderkey", "o_orderstatus")].fd_holds
    assert_df_matches_oracle(
        fd_violations(spark, sf_dir), duck, _oracle("fd_violations")
    )
