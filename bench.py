"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import time


HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "top_customers_window",
    "events_sessionize",
    "events_tumbling_agg",
    "asof_join_events_orders",
    "q9_profit_by_nation_year",
    "q18_large_orders",
    "range_join_error_purchase",
    "cache_upsert_latest",
    "tpl_customers_by_segment",
    # pipeline operators (added as they land in flapi_spark.queries)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_lsh",
    "ann_bruteforce_topk",
    "text_quality_score",
    "contamination_ngram_overlap",
    # round 3
    "cohort_retention",
    "text_bigram_lm_score",
    # round 3d
    "counter_rate_events",
    "dedup_substring_spans",
    "vocab_oov_rate",
    "ann_pq_adc_topk",
    # round 4: graph + statistics tail, and the de-globalized windows
    "pagerank_neardup_graph",
    "kcore_neardup_graph",
    "session_path_trigrams",
    "psi_order_value_drift",
    "ntile_value_bands",
    "bm25_search",
    # round 5: sketch + asymmetric-dedup additions
    "bloom_token_filter",
    "dedup_containment_pairs",
    # round 6: corpus information-theory + source-pair dedup rollup
    "lang_bigram_entropy",
    "cross_source_neardup_matrix",
    # round 7: the source-pair rollup and the O(log n) clustering
    # served from the persisted bucketed band index (first call pays
    # the bootstrap; min-of-runs reports the steady-state probe)
    "neardup_matrix_indexed",
    "dedup_components_indexed",
    # round 8: the two most expensive graph queries served from the
    # persisted band index (zero-exchange candidate generation)
    "pagerank_indexed",
    "kcore_indexed",
    # round 9: the image + audio near-dup lanes (rows-only entries —
    # no DuckDB rows in the baseline table) and the composed funnel
    "mm_phash_pairs",
    "mm_audio_fingerprint_pairs",
    "mm_video_phash_pairs",
    "pipeline_curation_funnel",
    # round 10: the crawl-side gates — URL filtering (stage 0), HTML
    # main-text extraction, and the FULL curation chain led by it
    "text_url_filter",
    "text_html_extract",
    "pipeline_curation_funnel_html",
    # round 10b: the model-based quality gate (NB log-odds score +
    # rank cut) and the distributed LR trainer
    "quality_classifier_score",
    "quality_classifier_train",
    "corpus_report",
    # the COMPLETE seven-stage chain with the model gate deployed
    # (html -> quality -> classifier -> langid -> dedups -> decontam)
    "pipeline_curation_funnel_gated",
    # round 10c: Lloyd refinement of the IVF centroids, the
    # lexical+vector RRF hybrid retrieval, the MMR diversifier, and
    # the fully-indexed serving shape (first run pays both index
    # bootstraps; min-of-runs reports the steady-state probe)
    "embedding_kmeans_refine",
    "hybrid_search_rrf",
    "retrieval_mmr_diversify",
    "hybrid_search_indexed",
    "dedup_components_incremental",
    # round 10d: cluster-grain curation (topic card + outlier gate),
    # per-source KL drift, and LPA communities (inline + index-served)
    "cluster_topic_card",
    "embedding_outlier_prune",
    "source_token_kl",
    "lpa_communities",
    "lpa_indexed",
    "dp_event_counts",
    "text_unicode_sanitize",
    "cluster_card_indexed",
    # the seven-stage chain with the embedding-space pair deployed
    "pipeline_curation_funnel_semantic",
    # round 10e: the entity-resolution lane (blocking + levenshtein
    # verify, O(log n) clustering, golden-record merge; the indexed
    # twin pays the bootstrap once, min-of-runs reports the probe)
    "er_blocked_pairs",
    "er_clusters",
    "er_golden_record",
    "er_pairs_indexed",
    # and the profiling layer (single-scan multi-distinct card)
    "table_profile_orders",
    # round 10e: curation observability + decontamination depth
    # (broadcast-benchmark max-cosine; full-chain drop attribution;
    # zero-shuffle rights gate)
    "contamination_semantic",
    "curation_drop_attribution",
    "text_license_detect",
    # and the SFT-prep layer (group-limited rank join; bounded explode)
    "preference_pairs",
    "dialogue_turns_parse",
    # round 10f: incremental delta curation — the steady-state ingest
    # batch over the persisted index triple (first run pays the base
    # bootstrap; min-of-runs reports the per-batch probe cost)
    "pipeline_delta_funnel",
    "dedup_delta_probe_pairs",
    "pipeline_delta_funnel_full",
    # round 10f: governance quartet completion + gate calibration +
    # TextRank keywords over the shared integer-PageRank machinery
    "t_closeness_orders",
    "classifier_calibration_bins",
    "keyword_textrank",
    "bootstrap_ci_order_value",
    "randomization_test_order_value",
    "mann_whitney_order_value",
    "ann_truncation_eval",
]

# Like-for-like marker (r7 ADVICE): cross-round totals are only
# comparable over a FROZEN query set — this is the round-7 bench list.
# New rounds append to HEADLINE, never to STABLE_SUBSET; the JSON line
# carries both the full total and the stable subtotal.
STABLE_SUBSET = HEADLINE[:38]
assert STABLE_SUBSET[-1] == "dedup_components_indexed"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from flapi_spark.queries import QUERIES
    from flapi_spark.session import get_spark

    spark = get_spark(app_name="flapi_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths once so the timed loop measures
    # data-proportional engine work, not one-time plan compilation /
    # whole-stage-codegen JIT: run each headline query once at the
    # smallest SF (sf0.001, ~1k fact rows — compile cost dominates, data
    # cost is nil). At the 100 TB design point compile time is noise;
    # per-row throughput is the signal the benchmark exists to track.
    spark.range(1_000_000).selectExpr("sum(id) AS s").collect()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in HEADLINE:
            if name in QUERIES:
                QUERIES[name][0](spark, warm_dir).count()
    # Per-query time = min of 2 runs (3 for queries still above 1.5 s
    # after two — the heavy dedup tail is where GC-pause variance bites
    # hardest): single runs on this shared box vary up to 2x with
    # ambient load and JVM GC pauses; the minimum is the standard
    # steady-state estimator (it measures the engine, not the
    # scheduler).
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        fn, _ = QUERIES[name]
        best = None
        for attempt in range(3):
            if attempt == 2 and best is not None and best <= 1.5:
                break
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            assert n >= 0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += best

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    stable = [n for n in STABLE_SUBSET if n in timings]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "n_queries": len(timings),
                "stable_n": len(stable),
                "stable_subtotal": round(
                    sum(timings[n] for n in stable), 3
                ),
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
