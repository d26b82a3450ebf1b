"""Semantic property tests for the round-3d operators (graph
analytics over the near-dup pair graph, substring-span dedup, vocab
OOV coverage, BPE encoding, counter-rate time series) — beyond the
oracle equality covered by the registry drive."""

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from flapi_spark.operators.graph import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_ITERATIONS,
    PR_SCALE,
    pagerank_fixed_point,
    pagerank_neardup_graph,
    triangle_count_neardup,
    triangle_counts,
)
from flapi_spark.operators.dedup import dedup_substring_spans
from flapi_spark.operators.relational import counter_rate_events
from flapi_spark.operators.text import (
    bpe_encode_tokens,
    bpe_train_merges,
    vocab_oov_rate,
    vocab_top_tokens,
)
from flapi_spark.session import load_table


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a LONG, doc_b LONG")


def _golden_pagerank(pairs, iterations=PR_ITERATIONS):
    nbrs = defaultdict(set)
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    n = len(nbrs)
    pr = {u: PR_SCALE // n for u in nbrs}
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN) // n
    for _ in range(iterations):
        give = {u: pr[u] // len(nbrs[u]) for u in nbrs}
        pr = {
            u: base + (PR_DAMP_NUM * sum(give[v] for v in nbrs[u])) // PR_DAMP_DEN
            for u in nbrs
        }
    return pr


def test_pagerank_matches_golden_python_exactly(spark):
    # star (1 center, 3 leaves) + a separate edge
    pairs = [(1, 2), (1, 3), (1, 4), (10, 11)]
    got = {
        r.doc_id: r.pr_scaled
        for r in pagerank_fixed_point(_pairs_df(spark, pairs)).collect()
    }
    assert got == _golden_pagerank(pairs)
    # the star center dominates its leaves
    assert got[1] > got[2] == got[3] == got[4]


def test_pagerank_neardup_deterministic_and_ranked(spark, sf_dir):
    a = {r.doc_id: r.pr_scaled for r in pagerank_neardup_graph(spark, sf_dir).collect()}
    b = {r.doc_id: r.pr_scaled for r in pagerank_neardup_graph(spark, sf_dir).collect()}
    assert a == b  # exact integer arithmetic ⇒ bit-stable across runs
    assert a and all(v > 0 for v in a.values())
    # total mass stays ≤ SCALE (floor truncation only leaks downward)
    assert sum(a.values()) <= PR_SCALE


def test_triangle_counts_golden_graph(spark):
    # triangle 1-2-3 plus a pendant 3-4
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4)]
    rows = {r.doc_id: r for r in triangle_counts(_pairs_df(spark, pairs)).collect()}
    assert rows[1].n_triangles == rows[2].n_triangles == rows[3].n_triangles == 1
    assert rows[4].n_triangles == 0
    assert rows[3].degree == 3
    assert rows[1].clustering == 1.0  # deg 2, 1 triangle
    assert rows[3].clustering == pytest.approx(1 / 3, abs=1e-6)
    assert rows[4].clustering == 0.0


def test_triangle_neardup_consistent_with_degrees(spark, sf_dir):
    rows = triangle_count_neardup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # T ≤ C(deg, 2): each triangle uses a distinct neighbor pair
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2
        assert 0.0 <= r.clustering <= 1.0


def test_substring_spans_golden_python(spark, sf_dir):
    import duckdb

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
        f" AS t FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    chunk = 5
    tiles = []  # (doc_id, i, text)
    for doc_id, t in docs:
        toks = t.split(" ")
        for i in range(len(toks) // chunk):
            tiles.append((doc_id, i, " ".join(toks[i * chunk:(i + 1) * chunk])))
    by_text = Counter()
    docs_per = defaultdict(set)
    for d, _, c in tiles:
        docs_per[c].add(d)
    dup = {c for c, ds in docs_per.items() if len(ds) >= 2}
    flagged = defaultdict(list)
    for d, i, c in tiles:
        if c in dup:
            flagged[d].append(i)
    expect = set()
    for d, idxs in flagged.items():
        idxs.sort()
        run = [idxs[0]]
        for i in idxs[1:]:
            if i == run[-1] + 1:
                run.append(i)
            else:
                expect.add((d, run[0] * chunk, (run[-1] + 1) * chunk - 1, len(run)))
                run = [i]
        expect.add((d, run[0] * chunk, (run[-1] + 1) * chunk - 1, len(run)))
    got = {
        (r.doc_id, r.start_token, r.end_token, r.n_chunks)
        for r in dedup_substring_spans(spark, sf_dir).collect()
    }
    assert got == expect


def test_vocab_oov_rate_bounds_and_vocab_docs(spark, sf_dir):
    rows = vocab_oov_rate(spark, sf_dir).collect()
    assert len(rows) == load_table(spark, sf_dir, "documents").count()
    vocab = {r.tok for r in vocab_top_tokens(spark, sf_dir).collect()}
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert 0.0 <= r.oov_rate <= 1.0
    # tiny synthetic vocab (~31 tokens) fits entirely in top-100 ⇒
    # every doc is fully covered
    if len(vocab) < 100:
        assert all(r.n_oov == 0 for r in rows)


def _golden_bpe_encode(word, merges):
    syms = list(word)
    for left, right in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_matches_golden_python(spark, sf_dir):
    merges = [
        (r["left"], r["right"])
        for r in bpe_train_merges(spark, sf_dir).orderBy("rank").collect()
    ]
    assert merges
    import duckdb

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
        f" AS t FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    import re

    expect = {}
    for doc_id, t in docs:
        words = [w for w in t.split(" ") if re.fullmatch("[a-z]+", w)]
        if not words:
            continue
        n_chars = sum(len(w) for w in words)
        n_syms = sum(len(_golden_bpe_encode(w, merges)) for w in words)
        expect[doc_id] = (len(words), n_chars, n_syms)
    got = {
        r.doc_id: (r.n_words, r.n_chars, r.n_symbols)
        for r in bpe_encode_tokens(spark, sf_dir).collect()
    }
    assert got == expect


def test_bpe_encode_compression_at_least_one(spark, sf_dir):
    for r in bpe_encode_tokens(spark, sf_dir).collect():
        # merging can only shrink the symbol stream
        assert r.n_symbols <= r.n_chars
        assert r.chars_per_symbol >= 1.0


def test_counter_rate_increase_conservation(spark, sf_dir):
    """Per (type, hour) increases sum exactly to the all-time counter
    deltas: without resets total_increase over all buckets equals the
    final counters' cumulative gain; with resets each reset forfeits
    the pre-reset remainder (< 100000). So the global bound holds:
    sum(v) - n_resets*100000 < total <= sum(v)."""
    rows = counter_rate_events(spark, sf_dir).collect()
    assert rows
    total = sum(r.total_increase for r in rows)
    n_resets = sum(r.n_resets for r in rows)
    ev = load_table(spark, sf_dir, "events")
    sum_v = (
        ev.select(F.expr("CAST(floor(value * 100) AS BIGINT)").alias("v"))
        .agg(F.sum("v"))
        .collect()[0][0]
    )
    n_users = ev.select("user_id").distinct().count()
    # first sample of each user contributes 0 (no prev) — subtract the
    # largest possible first-sample mass and reset losses
    assert total <= sum_v
    assert total >= sum_v - (n_resets + n_users) * 100000
    for r in rows:
        assert r.total_increase >= 0 and r.n_resets <= r.n_samples


def test_pq_adc_matches_golden_numpy(spark, sf_dir):
    """Full numpy/python replication of PQ-ADC: deterministic codebook
    sample, per-subspace argmin encode, LUT, left-associated ADC sum,
    (adc, cid) ranking — exact equality including distances."""
    import duckdb

    from flapi_spark.operators.similarity import (
        PQ_CODEWORDS,
        PQ_SAMPLE_MOD,
        PQ_SUBSPACES,
        ann_pq_adc_topk,
    )

    con = duckdb.connect()
    vecs = dict(
        con.sql(
            f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    )
    xs = {vid: [float(v) for v in e] for vid, e in vecs.items()}
    samp_ids = sorted(v for v in xs if v % PQ_SAMPLE_MOD == 0)[:PQ_CODEWORDS]
    cb = [xs[v] for v in samp_ids]

    def subdist(a, b, m):
        acc = 0.0
        for i in range(8):
            d = a[m * 8 + i] - b[m * 8 + i]
            acc = acc + d * d
        return acc

    def encode(x):
        out = []
        for m in range(PQ_SUBSPACES):
            best = min(
                range(len(cb)), key=lambda j: (subdist(x, cb[j], m), j)
            )
            out.append(best)
        return out

    codes = {v: encode(x) for v, x in xs.items() if v > 5}
    expect = {}
    for qid in (v for v in xs if v <= 5):
        lut = [
            [subdist(xs[qid], cb[j], m) for j in range(len(cb))]
            for m in range(PQ_SUBSPACES)
        ]
        scored = []
        for cid, cd in codes.items():
            acc = lut[0][cd[0]]
            for m in range(1, PQ_SUBSPACES):
                acc = acc + lut[m][cd[m]]
            scored.append((acc, cid))
        scored.sort()
        for rnk, (adc, cid) in enumerate(scored[:10], 1):
            expect[(qid, cid)] = (adc, rnk)
    got = {
        (r.qid, r.cid): (r.adc_dist, r.rnk)
        for r in ann_pq_adc_topk(spark, sf_dir).collect()
    }
    assert got == expect


def test_ttr_matches_golden_python(spark, sf_dir):
    import duckdb
    from collections import Counter as C

    from flapi_spark.operators.text import text_ttr_diversity

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
        f" AS t FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    expect = {}
    for doc_id, t in docs:
        cnt = C(t.split(" "))
        n_tok, n_typ = sum(cnt.values()), len(cnt)
        n_hapax = sum(1 for v in cnt.values() if v == 1)
        expect[doc_id] = (n_tok, n_typ, n_hapax)
    got = {
        r.doc_id: (r.n_tokens, r.n_types, r.n_hapax)
        for r in text_ttr_diversity(spark, sf_dir).collect()
    }
    assert got == expect


def test_corpus_shard_assign_matches_golden_python(spark, sf_dir):
    import hashlib

    from flapi_spark.operators.text import (
        SHARD_COUNT,
        SHARD_SEED,
        corpus_shard_assign,
    )
    from flapi_spark.session import load_table

    ids = [
        r.doc_id
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    rows = []
    for d in ids:
        h = hashlib.md5(f"{SHARD_SEED}:{d}".encode()).hexdigest()
        shard = int(h[:15], 16) % SHARD_COUNT
        rows.append((shard, h, d))
    expect = {}
    by_shard = defaultdict(list)
    for shard, h, d in rows:
        by_shard[shard].append((h, d))
    for shard, members in by_shard.items():
        members.sort()
        for pos, (_, d) in enumerate(members, 1):
            expect[d] = (shard, pos)
    got = {
        r.doc_id: (r.shard, r.pos)
        for r in corpus_shard_assign(spark, sf_dir).collect()
    }
    assert got == expect
    # shards are balanced within a loose md5-uniformity band
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) <= 3 * max(1, min(sizes))


def test_gram_novelty_bounds_and_duplicate_docs_not_novel(spark, sf_dir):
    from flapi_spark.operators.text import gram_novelty_rate
    from flapi_spark.operators.dedup import dedup_exact

    rows = {r.doc_id: r for r in gram_novelty_rate(spark, sf_dir).collect()}
    for r in rows.values():
        assert 0 <= r.n_novel <= r.n_grams
        assert 0.0 <= r.novelty_rate <= 1.0
    # exact duplicates share every gram -> zero novelty on both sides
    # (sf0.001 has no exact dups; the clause bites at sf0.01+)
    dups = dedup_exact(spark, sf_dir).where(F.col("n_copies") >= 2).collect()
    for grp in dups:
        cid = grp.canonical_id
        if cid in rows:
            assert rows[cid].n_novel == 0


def test_trimmed_mean_within_range_and_less_extreme(spark, sf_dir):
    from flapi_spark.operators.relational import trimmed_mean_order_values

    rows = trimmed_mean_order_values(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_orders > 0
        # trimming both tails keeps the mean finite and inside the
        # untrimmed envelope of the data
        assert r.mean_trimmed is not None and r.mean_all is not None


def test_orc_source_roundtrip_through_registry(spark, sf_dir, tmp_path):
    from flapi_spark.session import load_table
    from flapi_spark.sources.registry import Connection

    src = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    out = str(tmp_path / "cust_orc")
    src.write.orc(out)
    conn = Connection(name="orc-src", format="orc", properties={"path": out})
    back = conn.read(spark)
    assert back.count() == src.count()
    assert {r.c_custkey for r in back.collect()} == {
        r.c_custkey for r in src.collect()
    }


def test_weighted_sample_bias_and_determinism(spark, sf_dir):
    from flapi_spark.operators.text import sample_weighted_quality
    from flapi_spark.session import load_table

    a = sample_weighted_quality(spark, sf_dir).collect()
    b = sample_weighted_quality(spark, sf_dir).collect()
    assert [(r.doc_id, r.rnk) for r in a] == [(r.doc_id, r.rnk) for r in b]
    docs = load_table(spark, sf_dir, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = sum(r.weight for r in a) / len(a)
    # A-Res biases inclusion toward heavier docs: the sampled mean
    # weight exceeds the corpus mean
    assert sample_mean > corpus_mean
    for r in a:
        assert r.key <= 0.0  # ln(u) <= 0, weights positive


def test_full_outer_reconciliation_coverage(spark, sf_dir):
    from flapi_spark.operators.relational import customer_activity_full_outer
    from flapi_spark.session import load_table

    rows = {r.key: r for r in customer_activity_full_outer(spark, sf_dir).collect()}
    orders_keys = {
        r.o_custkey
        for r in load_table(spark, sf_dir, "orders").select("o_custkey").distinct().collect()
    }
    event_keys = {
        r.user_id
        for r in load_table(spark, sf_dir, "events").select("user_id").distinct().collect()
    }
    assert set(rows) == orders_keys | event_keys
    for k, r in rows.items():
        assert r.has_orders == (k in orders_keys)
        assert r.has_events == (k in event_keys)
        assert (r.n_orders > 0) == r.has_orders
        assert (r.n_events > 0) == r.has_events
    # both one-sided and matched rows genuinely occur
    assert any(r.has_orders and not r.has_events for r in rows.values())
    assert any(r.has_orders and r.has_events for r in rows.values())


def test_funnel_latency_consistent_with_funnel_counts(spark, sf_dir):
    from flapi_spark.operators.relational import (
        funnel_conversion,
        funnel_time_to_convert,
    )

    lat = funnel_time_to_convert(spark, sf_dir).collect()[0]
    stages = {r.stage: r.n_users for r in funnel_conversion(spark, sf_dir).collect()}
    assert lat.n_converted == stages["3_purchase_after_click"]
    assert 0 < lat.min_s <= lat.p50_s <= lat.p90_s <= lat.max_s


def test_user_overlap_hll_close_to_exact(spark, sf_dir):
    from flapi_spark.operators.relational import (
        user_overlap_exact,
        user_overlap_hll,
    )

    exact = {
        (r.type_a, r.type_b): (r.n_both, r.n_either)
        for r in user_overlap_exact(spark, sf_dir).collect()
    }
    est = {
        (r.type_a, r.type_b): (r.n_both_est, r.n_either_est)
        for r in user_overlap_hll(spark, sf_dir).collect()
    }
    assert set(est) == set(exact)
    for k, (nb, ne) in exact.items():
        eb, ee = est[k]
        # lg_k=14 sketches: ~1% standard error; allow 5% + small slack
        assert abs(ee - ne) <= max(5, 0.05 * ne)
        assert abs(eb - nb) <= max(10, 0.10 * max(nb, 1))


def _golden_kcore(pairs, k=2):
    from collections import defaultdict as dd

    nbrs = dd(set)
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    changed = True
    while changed:
        changed = False
        for u in list(nbrs):
            if len(nbrs[u]) < k:
                for v in nbrs[u]:
                    nbrs[v].discard(u)
                del nbrs[u]
                changed = True
    return {u: len(vs) for u, vs in nbrs.items()}


def test_kcore_golden_graph(spark):
    from flapi_spark.operators.graph import kcore_decompose

    # triangle (core) + a tail chain that must peel away entirely
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6)]
    got = {
        r.doc_id: r.core_degree
        for r in kcore_decompose(_pairs_df(spark, pairs), k=2).collect()
    }
    assert got == _golden_kcore(pairs, 2) == {1: 2, 2: 2, 3: 2}


def test_kcore_neardup_matches_golden(spark, sf_dir):
    from flapi_spark.operators.dedup import dedup_ngram_jaccard
    from flapi_spark.operators.graph import kcore_neardup_graph

    pairs = [
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf_dir, 0.95)
        .select("doc_a", "doc_b")
        .collect()
    ]
    got = {
        r.doc_id: r.core_degree
        for r in kcore_neardup_graph(spark, sf_dir).collect()
    }
    assert got == _golden_kcore(pairs, 2)


def test_gini_and_hhi_bounds(spark, sf_dir):
    from flapi_spark.operators.relational import (
        gini_customer_revenue,
        hhi_market_concentration,
    )

    g = gini_customer_revenue(spark, sf_dir).collect()[0]
    assert 0.0 <= g.gini < 1.0
    for r in hhi_market_concentration(spark, sf_dir).collect():
        # HHI of n equal shares = 10000/n; bounds (10000/n, 10000]
        assert 10000.0 / r.n_suppliers - 1e-6 <= r.hhi <= 10000.0 + 1e-6


def test_benford_freqs_sum_to_one(spark, sf_dir):
    from flapi_spark.operators.relational import benford_leading_digit

    rows = benford_leading_digit(spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed_freq for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.benford_freq for r in rows) - 1.0) < 1e-4


def test_flesch_monotone_in_syllable_density(spark, sf_dir):
    from flapi_spark.operators.text import text_readability_flesch

    rows = text_readability_flesch(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_syllables >= r.n_words >= 1
        assert r.n_sentences >= 1


def test_kaplan_meier_monotone_nonincreasing(spark, sf_dir):
    from flapi_spark.operators.relational import kaplan_meier_order_gaps

    rows = sorted(
        kaplan_meier_order_gaps(spark, sf_dir).collect(), key=lambda r: r.t_days
    )
    assert rows
    prev = 1.0
    for r in rows:
        assert 0.0 <= r.survival <= prev + 1e-12  # survival never rises
        assert r.n_events >= 1 and r.n_at_risk >= r.n_events
        prev = r.survival


def test_lorenz_monotone_and_convex(spark, sf_dir):
    from flapi_spark.operators.relational import lorenz_deciles

    rows = sorted(lorenz_deciles(spark, sf_dir).collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    assert abs(rows[-1].cum_share - 1.0) < 1e-4
    shares = [r.share for r in rows]
    # sorted ascending by revenue -> decile shares non-decreasing
    assert all(a <= b + 1e-9 for a, b in zip(shares, shares[1:]))


def test_welch_ttest_selfconsistency(spark, sf_dir):
    from flapi_spark.operators.relational import welch_ttest_segments

    r = welch_ttest_segments(spark, sf_dir).collect()[0]
    assert r.n_a > 1 and r.n_b > 1
    assert r.welch_df > min(r.n_a, r.n_b) / 2  # df in a sane band
    # same segment vs itself -> t == 0
    same = welch_ttest_segments(spark, sf_dir, "BUILDING", "BUILDING").collect()
    # identical groups collapse to one stats row; cross join yields 1 row
    assert same[0].t_stat == 0.0


def test_funnel_steps_default_matches_fixed_funnel(spark, sf_dir):
    from flapi_spark.operators.relational import (
        funnel_conversion,
        funnel_conversion_steps,
    )

    fixed = {
        r.stage.split("_", 1)[1]: (r.n_users, r.conv_from_start)
        for r in funnel_conversion(spark, sf_dir).collect()
    }
    generic = {
        r.stage.split("_", 1)[1]: (r.n_users, r.conv_from_start)
        for r in funnel_conversion_steps(spark, sf_dir).collect()
    }
    # the fixed funnel labels stages view/click_after_view/...; compare
    # by position instead
    fvals = [v for _, v in sorted(fixed.items())]
    gvals = [v for _, v in sorted(generic.items())]
    assert sorted(v[0] for v in fvals) == sorted(v[0] for v in gvals)
    # a 2-step funnel keeps more users at the last stage than 3-step
    two = funnel_conversion_steps(spark, sf_dir, ["view", "purchase"]).collect()
    three = funnel_conversion_steps(spark, sf_dir).collect()
    last2 = [r.n_users for r in two if r.stage.startswith("2_")][0]
    last3 = [r.n_users for r in three if r.stage.startswith("3_")][0]
    assert last2 >= last3
