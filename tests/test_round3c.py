"""Semantic property tests for the round-3c operators (basket mining,
EWMA, anomaly z-score, Z-order layout, script detect, perplexity
buckets, SemDeDup, cache time travel) — beyond the oracle equality
already covered by tests/test_relational.py."""

import math

import pytest
from pyspark.sql import functions as F

from flapi_spark.operators.dedup import semdedup_clusters
from flapi_spark.operators.relational import (
    anomaly_zscore_daily,
    ewma_daily_revenue,
    market_basket_brand_pairs,
    mode_priority_by_segment,
    zorder_locality_stats,
)
from flapi_spark.operators.similarity import cosine_col, ivf_assign, ivf_centroids
from flapi_spark.operators.text import ccnet_perplexity_buckets, text_script_detect
from flapi_spark.session import load_table


def test_market_basket_support_and_lift_bounds(spark, sf_dir):
    rows = market_basket_brand_pairs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.brand_a < r.brand_b
        assert 0 < r.support <= 1
        assert r.lift > 0


def test_market_basket_pair_bounded_by_singles(spark, sf_dir):
    df = market_basket_brand_pairs(spark, sf_dir)
    ob = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "part"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    singles = {
        r.p_brand: r.n
        for r in ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in df.collect():
        assert r.n_both <= min(singles[r.brand_a], singles[r.brand_b])


def test_ewma_smooths_within_series_range(spark, sf_dir):
    rows = sorted(ewma_daily_revenue(spark, sf_dir).collect(), key=lambda r: r.day)
    assert rows
    xs = [r.revenue for r in rows]
    assert rows[0].ewma == rows[0].revenue  # y_0 = x_0
    lo, hi = min(xs), max(xs)
    for r in rows:
        assert lo <= r.ewma <= hi  # convex combination stays in range
    # recurrence holds exactly
    for prev, cur in zip(rows, rows[1:]):
        assert cur.ewma == pytest.approx(0.25 * cur.revenue + 0.75 * prev.ewma)


def test_anomaly_zscore_flags_match_z(spark, sf_dir):
    rows = anomaly_zscore_daily(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.sd30 > 0
        assert r.is_anomaly == (abs(r.z) > 2)
        # z recomputes from the published mean/sd
        assert r.z == pytest.approx((r.revenue - r.mean30) / r.sd30)


def test_mode_is_argmax_of_counts(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    counts = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_seg = {}
    for r in counts:
        by_seg.setdefault(r.c_mktsegment, []).append(r)
    for r in mode_priority_by_segment(spark, sf_dir).collect():
        best = max(by_seg[r.c_mktsegment], key=lambda x: (x.n, x.o_orderpriority[::-1]))
        assert r.n_orders == max(x.n for x in by_seg[r.c_mktsegment])
        assert 0 < r.seg_share <= 1


def test_zorder_buckets_localize_both_dims(spark, sf_dir):
    rows = zorder_locality_stats(spark, sf_dir).collect()
    assert len(rows) == 16
    ck_glob = max(r.ck_max for r in rows) - min(r.ck_min for r in rows)
    dn_glob = max(r.dn_max for r in rows) - min(r.dn_min for r in rows)
    # Z-order locality: the MEDIAN bucket is much tighter than the
    # global range on BOTH dimensions (a 1-D sort would leave one
    # dimension's spans at ~full width in every bucket).
    ck_med = sorted(r.ck_span for r in rows)[8]
    dn_med = sorted(r.dn_span for r in rows)[8]
    assert ck_med <= ck_glob * 0.8
    assert dn_med <= dn_glob * 0.8


def test_script_detect_injected_scripts_found(spark, sf_dir):
    rows = text_script_detect(spark, sf_dir).collect()
    assert rows
    for r in rows:
        m = r.doc_id % 4
        assert (r.n_cyrillic > 0) == (m == 1)
        assert (r.n_cjk > 0) == (m == 2)
        assert (r.n_arabic > 0) == (m == 3)
        # corpus text is long ASCII; the short suffix never flips dominance
        assert r.dominant_script == "latin"
        assert 0 < r.frac_latin < 1
        assert r.n_chars_total >= r.n_latin + r.n_cyrillic + r.n_cjk + r.n_arabic


def test_ccnet_terciles_are_balanced_and_ordered(spark, sf_dir):
    rows = ccnet_perplexity_buckets(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        sizes = [
            sum(1 for r in rs if r.tercile == t) for t in (1, 2, 3)
        ]
        assert max(sizes) - min(sizes) <= 1  # ntile balance
        heads = [r.avg_nll for r in rs if r.bucket == "head"]
        tails = [r.avg_nll for r in rs if r.bucket == "tail"]
        if heads and tails:
            assert max(heads) <= min(tails) + 1e-9


def test_semdedup_dropped_have_kept_cluster_neighbor(spark, sf_dir):
    out = semdedup_clusters(spark, sf_dir, threshold=0.4)
    rows = out.collect()
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {r.vec_id: r.embedding for r in emb.collect()}
    cluster = {r.vec_id: r.cell_id for r in rows}
    keep = {r.vec_id: r.keep for r in rows}
    assert len(rows) == len(vecs)

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    dropped = [v for v, k in keep.items() if not k]
    assert dropped  # the corpus has near-dup clusters by construction
    for v in dropped:
        mates = [
            u for u in cluster
            if cluster[u] == cluster[v] and u < v
        ]
        assert any(cos(vecs[u], vecs[v]) >= 0.4 - 1e-9 for u in mates)
    # survivors: no SMALLER surviving mate above threshold
    for v, k in keep.items():
        if k:
            smaller_kept = [
                u for u in cluster
                if cluster[u] == cluster[v] and u < v and keep[u]
            ]
            # (a kept vector may still have a dropped smaller mate ≥ τ
            #  only if that mate was itself dropped by an even smaller
            #  one — SemDeDup keeps the min id per similarity chain)
            for u in smaller_kept:
                assert cos(vecs[u], vecs[v]) < 0.4 + 1e-9 or not keep[v]


def test_semdedup_cluster_assignment_is_nearest_centroid(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_centroids(emb)
    assign = ivf_assign(emb, cents, nprobe=1)
    joined = (
        assign.join(emb, "vec_id")
        .join(
            cents.withColumnRenamed("cell_id", "cid2"),
            F.col("cell_id") == F.col("cid2"),
        )
        .select(
            "vec_id", cosine_col("embedding", "centroid").alias("sim_assigned")
        )
    )
    best = (
        emb.crossJoin(cents)
        .select("vec_id", cosine_col("embedding", "centroid").alias("sim"))
        .groupBy("vec_id")
        .agg(F.max("sim").alias("sim_best"))
    )
    for r in joined.join(best, "vec_id").collect():
        assert r.sim_assigned == pytest.approx(r.sim_best)


def test_cache_time_travel_reads_previous_state(spark, sf_dir):
    from flapi_spark.queries import cache_time_travel

    rows = cache_time_travel(spark, sf_dir).collect()
    years = {r.o_year for r in rows}
    assert years  # pre-1998 snapshot only
    assert max(years) <= 1997
    full_years = {
        r[0]
        for r in load_table(spark, sf_dir, "orders")
        .select(F.year("o_orderdate"))
        .distinct()
        .collect()
    }
    assert max(full_years) > 1997  # current snapshot has more


# --- batch 2: transitions, RFM, BPE ---------------------------------------


def test_transition_probabilities_sum_to_one(spark, sf_dir):
    from flapi_spark.operators.relational import event_transition_matrix

    rows = event_transition_matrix(spark, sf_dir).collect()
    assert rows
    by_src = {}
    for r in rows:
        by_src.setdefault(r.from_type, []).append(r)
    for src, rs in by_src.items():
        assert sum(r.p_transition for r in rs) == pytest.approx(1.0)
        assert all(r.n_transitions > 0 for r in rs)


def test_rfm_quintiles_balanced_and_consistent(spark, sf_dir):
    from flapi_spark.operators.relational import rfm_segmentation

    rows = rfm_segmentation(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    for q in ("r_q", "f_q", "m_q"):
        sizes = [sum(1 for r in rows if getattr(r, q) == t) for t in range(1, 6)]
        assert max(sizes) - min(sizes) <= 1
    for r in rows:
        assert r.rfm_segment == f"{r.r_q}{r.f_q}{r.m_q}"
    # best monetary quintile really holds the biggest spenders
    m1 = [r.monetary for r in rows if r.m_q == 1]
    m5 = [r.monetary for r in rows if r.m_q == 5]
    assert min(m1) >= max(m5)


def _golden_bpe(word_freqs, n_merges):
    """Pure-Python reference BPE (Sennrich et al. 2016) with the same
    (count desc, pair asc) tiebreak."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for syms, f in vocab.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, n))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_matches_golden_python(spark, sf_dir):
    import re

    from flapi_spark.operators.text import bpe_train_merges

    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in sorted(bpe_train_merges(spark, sf_dir).collect())
    ]
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    freqs = {}
    for row in docs:
        norm = re.sub(r"\s+", " ", row.text).strip().lower()
        for w in norm.split(" "):
            if re.fullmatch(r"[a-z]+", w):
                freqs[w] = freqs.get(w, 0) + 1
    golden = _golden_bpe(freqs, 10)
    assert got == golden
