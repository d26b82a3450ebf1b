

def test_split_is_deterministic_and_partition_invariant(spark, sf_dir):
    from flapi_spark.operators.text import split_train_holdout
    from flapi_spark.session import load_table

    a = {r.doc_id: r.split for r in split_train_holdout(spark, sf_dir).collect()}
    b = {r.doc_id: r.split for r in split_train_holdout(spark, sf_dir).collect()}
    assert a == b  # pure function of the row: stable across runs
    n = load_table(spark, sf_dir, "documents").count()
    holdout = sum(1 for v in a.values() if v == "holdout")
    assert 0.02 <= holdout / n <= 0.25  # ~10% by construction


def test_stratified_sample_subset_and_rates(spark, sf_dir):
    from flapi_spark.operators.text import sample_stratified_by_lang
    from flapi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    sample = sample_stratified_by_lang(spark, sf_dir)
    ids = {r.doc_id for r in docs.select("doc_id").collect()}
    sids = [r.doc_id for r in sample.select("doc_id").collect()]
    assert set(sids) <= ids and len(sids) == len(set(sids))
    # full-fraction strata are kept whole; en is halved (tolerance wide)
    n_de = docs.where("lang = 'de'").count()
    s_de = sample.where("lang = 'de'").count()
    assert s_de == n_de
    n_en = docs.where("lang = 'en'").count()
    s_en = sample.where("lang = 'en'").count()
    assert 0.25 * n_en <= s_en <= 0.75 * n_en
    # seeded: same seed, same sample
    again = {r.doc_id for r in sample_stratified_by_lang(spark, sf_dir).collect()}
    assert set(sids) == again


def test_gopher_filters_gates_consistent(spark, sf_dir):
    from flapi_spark.operators.text import text_gopher_filters

    rows = text_gopher_filters(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.pass_n_tokens == (20 <= r.n_tokens <= 100000)
        assert r.pass_alpha_ratio == (r.alpha_word_ratio >= 0.8)
        assert r.keep == (r.pass_n_tokens and r.pass_token_len
                          and r.pass_alpha_ratio and r.pass_stopwords)
    # thresholds chosen so the gate actually separates the corpus
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < len(rows)


def test_contamination_only_cross_split_pairs(spark, sf_dir):
    from flapi_spark.operators.text import contamination_ngram_overlap

    rows = contamination_ngram_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.train_doc % 50 != 0 and r.eval_doc % 50 == 0
        assert r.n_shared_grams >= 1


def test_pack_sequences_budget_and_determinism(spark, sf_dir):
    from flapi_spark.operators.text import PACK_BUDGET, pack_sequences

    rows = pack_sequences(spark, sf_dir).collect()
    by_pack = {}
    for r in rows:
        by_pack.setdefault((r.shard, r.pack_id), []).append(r)
    for (shard, pack), members in by_pack.items():
        tokens = sum(m.n_tokens for m in members)
        # sequential fill: a pack exceeds the budget only by its last
        # member's tokens, and only the shard's final pack may be tiny
        assert tokens < PACK_BUDGET + max(m.n_tokens for m in members)
    # deterministic across runs
    again = {(r.doc_id, r.pack_id) for r in pack_sequences(spark, sf_dir).collect()}
    assert again == {(r.doc_id, r.pack_id) for r in rows}


def test_connected_components_closure(spark, sf_dir):
    """Every pair is intra-component, component ids are the member
    minimum, and components agree with a python union-find replay."""
    from flapi_spark.operators.dedup import (
        dedup_connected_components, dedup_ngram_jaccard,
    )

    pairs = [(r.doc_a, r.doc_b)
             for r in dedup_ngram_jaccard(spark, sf_dir).collect()]
    comp = {r.doc_id: r.component_id
            for r in dedup_connected_components(spark, sf_dir).collect()}
    assert pairs and comp
    # union-find replay
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {}
    for node in parent:
        expect[node] = find(node)
    assert comp == expect
    for a, b in pairs:
        assert comp[a] == comp[b]
    # id is the min member of its component
    members = {}
    for node, c in comp.items():
        members.setdefault(c, []).append(node)
    for c, ms in members.items():
        assert c == min(ms)


def test_pii_redact_counts_and_masking(spark, sf_dir):
    from flapi_spark.operators.text import text_pii_redact
    from flapi_spark.session import load_table

    rows = {r.doc_id: r for r in text_pii_redact(spark, sf_dir).collect()}
    n = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n
    # every doc gets exactly one injected email/ip/phone; the base
    # corpus is PII-free word salad
    assert all(r.n_emails == 1 for r in rows.values())
    assert all(r.n_ips == 1 for r in rows.values())
    assert all(r.n_phones == 1 for r in rows.values())
    # redaction is deterministic
    again = {r.doc_id: r.redacted_md5
             for r in text_pii_redact(spark, sf_dir).collect()}
    assert again == {k: v.redacted_md5 for k, v in rows.items()}


def test_pii_redact_masks_leave_no_matches(spark):
    from pyspark.sql import functions as F

    from flapi_spark.operators.text import PII_EMAIL, PII_IP, PII_PHONE

    df = spark.createDataFrame(
        [(1, "mail a.b-c_9@ex-1.org then 192.168.0.255 and 555-0199 done")],
        "id INT, t STRING",
    )
    red = df.select(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("t", PII_EMAIL, "<EMAIL>"), PII_IP, "<IP>"
            ),
            PII_PHONE, "<PHONE>",
        ).alias("r")
    ).first().r
    assert "<EMAIL>" in red and "<IP>" in red and "<PHONE>" in red
    post = df.sparkSession.createDataFrame([(red,)], "t STRING").select(
        F.regexp_count("t", F.lit(PII_EMAIL)).alias("e"),
        F.regexp_count("t", F.lit(PII_IP)).alias("i"),
        F.regexp_count("t", F.lit(PII_PHONE)).alias("p"),
    ).first()
    assert (post.e, post.i, post.p) == (0, 0, 0)


def test_repetition_filters_consistent(spark, sf_dir):
    from flapi_spark.operators.text import text_repetition_filters

    rows = text_repetition_filters(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.top_2gram_share <= 1.0
        assert 0.0 <= r.dup_2gram_frac <= 1.0
        assert 0.0 <= r.dup_token_frac < 1.0
        # the top gram's chars are a subset of all duplicated-gram
        # chars whenever the top gram itself repeats
        assert r.pass_top_2gram == (r.top_2gram_share < 0.10)
        assert r.keep == (
            r.pass_top_2gram and r.pass_dup_2gram and r.pass_dup_tokens
        )
    # thresholds chosen so both outcomes occur on the synthetic corpus
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < len(rows)


def test_repetition_filters_known_doc(spark):
    from flapi_spark.operators import text as T
    from pyspark.sql import functions as F

    # "a b a b c": 2-grams = [a b, b a, a b, b c]; top gram "a b" x2
    # covers 2*3=6 chars of 9; dup chars also 6; tokens 5, distinct 3
    df = spark.createDataFrame([(1, "a b a b c")], "doc_id LONG, text STRING")
    df.createOrReplaceTempView("_rep_doc")
    base = df.select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    )
    import flapi_spark.operators.text as tmod

    # drive the same pipeline through a monkeypatched loader
    orig = tmod.load_table
    tmod.load_table = lambda spark, sf_dir, name: df
    try:
        r = tmod.text_repetition_filters(spark, "unused").collect()[0]
    finally:
        tmod.load_table = orig
    assert r.top_2gram == "a b"
    assert abs(r.top_2gram_share - 6 / 9) < 1e-12
    assert abs(r.dup_2gram_frac - 6 / 9) < 1e-12
    assert abs(r.dup_token_frac - 2 / 5) < 1e-12
    assert not r.pass_top_2gram and not r.keep


def test_domain_mixture_sample_proportions(spark, sf_dir):
    import math

    from flapi_spark.operators.text import (
        MIXTURE_WEIGHTS, domain_mixture_sample,
    )
    from flapi_spark.session import load_table

    picked = domain_mixture_sample(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    counts = {
        r.source: r.n
        for r in docs.groupBy("source").count().withColumnRenamed("count", "n")
        .collect()
    }
    scale = min(counts[s] / w for s, w in MIXTURE_WEIGHTS.items())
    expect = {s: math.floor(scale * w) for s, w in MIXTURE_WEIGHTS.items()}
    got = {}
    for r in picked:
        got[r.source] = got.get(r.source, 0) + 1
    assert got == {s: k for s, k in expect.items() if k > 0}
    # deterministic: same pick set on re-run
    again = sorted((r.doc_id, r.source) for r in
                   domain_mixture_sample(spark, sf_dir).collect())
    assert again == sorted((r.doc_id, r.source) for r in picked)


def test_bigram_lm_score_sanity(spark, sf_dir):
    from flapi_spark.operators.text import text_bigram_lm_score

    rows = text_bigram_lm_score(spark, sf_dir).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.n_bigrams >= 1
        # smoothed probabilities are < 1, so avg negative log-lik > 0
        assert r.avg_nll > 0.0


def test_dsir_weights_favor_target_language(spark, sf_dir):
    from flapi_spark.operators.text import dsir_importance_weights
    from flapi_spark.session import load_table

    w = {r.doc_id: r.log_weight
         for r in dsir_importance_weights(spark, sf_dir).collect()}
    langs = {r.doc_id: r.lang
             for r in load_table(spark, sf_dir, "documents")
             .select("doc_id", "lang").collect()}
    en = [w[d] for d in w if langs[d] == "en"]
    zh = [w[d] for d in w if langs[d] == "zh"]
    assert en and zh
    # importance weights must rank target-language docs above the most
    # distant language on average (the entire point of DSIR)
    assert sum(en) / len(en) > sum(zh) / len(zh)


def test_tfidf_top_terms_shape(spark, sf_dir):
    from flapi_spark.operators.text import tfidf_top_terms

    rows = tfidf_top_terms(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for terms in by_doc.values():
        assert 1 <= len(terms) <= 3
        ranks = sorted(t.rn for t in terms)
        assert ranks == list(range(1, len(terms) + 1))
        ordered = sorted(terms, key=lambda t: t.rn)
        for a, b in zip(ordered, ordered[1:]):
            assert (a.score, b.term) >= (b.score, a.term) or a.score >= b.score


# --- round 5: sketch / corpus-statistics operators -----------------------


def test_bloom_token_filter_bounds_and_determinism(spark, sf_dir):
    from flapi_spark.operators.text import BLOOM_K, BLOOM_M, bloom_token_filter

    r1 = bloom_token_filter(spark, sf_dir).collect()[0]
    r2 = bloom_token_filter(spark, sf_dir).collect()[0]
    assert r1 == r2  # deterministic hashing, no rng
    assert 0 < r1.bits_set <= min(r1.n_distinct_tokens * BLOOM_K, BLOOM_M)
    assert 0.0 < r1.fill_rate <= 1.0
    assert abs(r1.est_fpr - round(r1.fill_rate ** BLOOM_K, 6)) < 1e-6


def test_bloom_filter_no_false_negatives(spark, sf_dir):
    """Every corpus token's k probe bits must all be set — the Bloom
    guarantee that matters (zero false negatives)."""
    from pyspark.sql import functions as F

    from flapi_spark.operators.text import (
        BLOOM_M, BLOOM_PERMS, _MERSENNE_P, _tokens,
    )
    from flapi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(_tokens()).alias("tok"))
        .where(F.col("tok") != "").distinct()
    )
    th = F.expr(
        f"pmod(cast(conv(substr(md5(tok), 1, 15), 16, 10) as bigint),"
        f" {_MERSENNE_P})"
    )
    bits = toks.select(th.alias("h")).select(
        F.explode(F.array(*[
            ((F.col("h") * F.lit(a) + F.lit(b)) % _MERSENNE_P % BLOOM_M)
            for a, b in BLOOM_PERMS
        ])).alias("bit_idx")
    ).distinct()
    bitset = {r.bit_idx for r in bits.collect()}
    # re-probe a sample of tokens: all bits present
    sample = toks.limit(20).collect()
    import hashlib as H
    for row in sample:
        h = int(H.md5(row.tok.encode()).hexdigest()[:15], 16) % _MERSENNE_P
        for a, b in BLOOM_PERMS:
            assert ((h * a + b) % _MERSENNE_P) % BLOOM_M in bitset


def test_tokens_zipf_fit_natural_shape(spark, sf_dir):
    from flapi_spark.operators.text import tokens_zipf_fit

    r = tokens_zipf_fit(spark, sf_dir).collect()[0]
    assert r.zipf_slope < 0          # frequency falls with rank
    assert 0.0 <= r.r_squared <= 1.0
    assert r.n_tokens_fit >= 10


def test_token_coverage_curve_monotone(spark, sf_dir):
    from flapi_spark.operators.text import token_coverage_curve

    rows = {r.k: r for r in token_coverage_curve(spark, sf_dir).collect()}
    assert 10 in rows
    ks = sorted(rows)
    for k1, k2 in zip(ks, ks[1:]):
        assert rows[k2].coverage >= rows[k1].coverage
        assert rows[k2].covered_tokens >= rows[k1].covered_tokens
    assert all(0.0 < r.coverage <= 1.0 for r in rows.values())


def test_text_char_entropy_known_value(spark, sf_dir, tmp_path):
    """Entropy of a crafted corpus checked against the closed form."""
    import math

    from flapi_spark.operators.text import text_char_entropy

    d = tmp_path / "docs"
    spark.createDataFrame(
        [(1, "aaaa", "en", "s", 4),          # one symbol -> 0 bits
         (2, "ab ab", "en", "s", 5),         # p(a)=p(b)=2/5, p(' ')=1/5
         (3, "abcd efgh", "en", "s", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = {r.doc_id: r for r in text_char_entropy(spark, str(d)).collect()}
    assert got[1].char_entropy == 0.0 and got[1].low_entropy
    exp2 = -(2 * 0.4 * math.log2(0.4) + 0.2 * math.log2(0.2))
    assert abs(got[2].char_entropy - round(exp2, 6)) < 1e-6
    exp3 = -(8 * (1 / 9) * math.log2(1 / 9) + (1 / 9) * math.log2(1 / 9))
    assert abs(got[3].char_entropy - round(exp3, 6)) < 1e-6
    assert not got[3].low_entropy


class TestRound6CorpusDials:
    """Round 6: information-theory corpus QA + LSH design dials."""

    def test_lang_bigram_entropy_invariants(self, spark, sf_dir):
        """Conditional entropy is non-negative and bounded by
        ln(distinct bigrams of the language); totals are consistent."""
        import math

        from flapi_spark.operators.text import lang_bigram_entropy

        rows = lang_bigram_entropy(spark, sf_dir).collect()
        assert rows and len(rows) == len({r.lang for r in rows})
        for r in rows:
            assert r.cond_entropy >= 0.0
            assert r.cond_entropy <= math.log(r.distinct_bigrams) + 1e-9
            assert 0 < r.distinct_bigrams <= r.n_bigrams

    def test_lang_bigram_entropy_deterministic_text(self, spark, tmp_path):
        """Hand-checked value: 'a b a c' repeated — bigrams from one
        doc 'a b','b a','a c' each once: H = (1/3)ln(2/1)x2 (the two
        a-successors) + (1/3)ln(1/1) = (2/3)ln 2."""
        import math

        from flapi_spark.operators.text import lang_bigram_entropy

        d = tmp_path / "sf"
        d.mkdir()
        spark.createDataFrame(
            [(1, "a b a c", "en", "s", 7)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.parquet(str(d / "documents.parquet"))
        r = lang_bigram_entropy(spark, str(d)).collect()[0]
        assert r.n_bigrams == 3 and r.distinct_bigrams == 3
        assert abs(r.cond_entropy - (2 / 3) * math.log(2)) < 1e-6

    def test_source_vocab_overlap_bounds(self, spark, sf_dir):
        from flapi_spark.operators.text import source_vocab_overlap

        rows = source_vocab_overlap(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.source_a < r.source_b
            assert 0 < r.common <= min(r.vocab_a, r.vocab_b)
            assert 0.0 < r.jaccard <= 1.0
        # unordered pairs appear once
        keys = [(r.source_a, r.source_b) for r in rows]
        assert len(keys) == len(set(keys))

    def test_token_freq_spectrum_partitions_vocabulary(self, spark, sf_dir):
        """Buckets partition the vocabulary: types sum to the distinct
        token count, mass sums to the total token count, shares to 1;
        bucket edges are powers of two."""
        from pyspark.sql import functions as F

        from flapi_spark.operators.text import _tokens, token_freq_spectrum
        from flapi_spark.session import load_table

        rows = token_freq_spectrum(spark, sf_dir).collect()
        docs = load_table(spark, sf_dir, "documents")
        toks = docs.select(F.explode(_tokens()).alias("w"))
        n_types = toks.distinct().count()
        n_tokens = toks.count()
        assert sum(r.n_types for r in rows) == n_types
        assert sum(r.mass for r in rows) == n_tokens
        assert abs(sum(r.mass_share for r in rows) - 1.0) < 1e-4
        for r in rows:
            assert r.freq_lo == 2 ** r.log2_freq

    def test_lsh_tuning_curve_scurve_shape(self, spark, sf_dir):
        """The s-curve is monotone in s, monotone in b, anti-monotone
        in r (more rows per band = stricter), and the threshold sits
        where collision probability is moderate."""
        from flapi_spark.operators.dedup import lsh_tuning_curve

        rows = lsh_tuning_curve(spark, sf_dir).collect()
        assert len(rows) == 81
        t = {(r.r, r.b, round(r.s, 2)): r for r in rows}
        for (r_, b_, s_), row in t.items():
            assert 0.0 <= row.p_candidate <= 1.0
            if (r_, b_, round(s_ - 0.1, 2)) in t:
                assert row.p_candidate >= t[
                    (r_, b_, round(s_ - 0.1, 2))].p_candidate - 1e-9
        # more bands -> more collisions at fixed (r, s)
        assert t[(4, 16, 0.5)].p_candidate >= t[(4, 4, 0.5)].p_candidate
        # more rows per band -> fewer collisions at fixed (b, s)
        assert t[(8, 8, 0.5)].p_candidate <= t[(2, 8, 0.5)].p_candidate

    def test_quality_gate_funnel_monotone(self, spark, sf_dir):
        """The cumulative survivor count is non-increasing down the
        funnel, bounded by each gate's marginal count, and stage 1's
        cum equals its marginal."""
        from flapi_spark.operators.text import quality_gate_funnel

        rows = {r.stage: r for r in
                quality_gate_funnel(spark, sf_dir).collect()}
        assert sorted(rows) == [1, 2, 3, 4]
        assert rows[1].n_pass_cum == rows[1].n_pass_gate
        for s in (2, 3, 4):
            assert rows[s].n_pass_cum <= rows[s - 1].n_pass_cum
            assert rows[s].n_pass_cum <= rows[s].n_pass_gate
        n = rows[1].n_docs
        for r in rows.values():
            assert r.n_docs == n
            assert abs(r.cum_rate - r.n_pass_cum / n) < 1e-6

    def test_cross_source_neardup_matrix_consistent(self, spark, sf_dir):
        """Matrix totals equal the pair-stream size; unordered pairs
        appear once; the flag matches the key columns."""
        from flapi_spark.operators.dedup import (
            cross_source_neardup_matrix, dedup_minhash_portable,
        )

        rows = cross_source_neardup_matrix(spark, sf_dir).collect()
        n_pairs = dedup_minhash_portable(spark, sf_dir).count()
        assert sum(r.n_pairs for r in rows) == n_pairs
        keys = [(r.source_a, r.source_b) for r in rows]
        assert len(keys) == len(set(keys))
        for r in rows:
            assert r.source_a <= r.source_b
            assert r.cross_source == (r.source_a != r.source_b)


class TestHtmlExtract:
    """Round 10: HTML main-text extraction (text_html_extract)."""

    def test_extraction_recovers_original_text(self, spark, sf_dir):
        """The full strip chain recovers the wrapped text
        byte-for-byte: main_md5 equals md5 of the raw text for EVERY
        document (the end-to-end extraction check the docstring
        promises)."""
        from pyspark.sql import functions as F

        from flapi_spark.operators.text import text_html_extract
        from flapi_spark.session import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("want_md5"),
            F.length("text").cast("long").alias("want_len"),
        )
        got = text_html_extract(spark, sf_dir).join(docs, "doc_id")
        assert got.where(
            (F.col("main_md5") != F.col("want_md5"))
            | (F.col("text_len") != F.col("want_len"))
        ).count() == 0

    def test_link_count_and_density_bounds(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from flapi_spark.operators.text import text_html_extract

        out = text_html_extract(spark, sf_dir)
        # nav carries 1 + doc_id%3 category links plus the about link
        assert out.where(
            F.col("n_links") != (F.lit(2) + F.col("doc_id") % 3)
        ).count() == 0
        rows = out.collect()
        assert all(0.0 < r.text_density < 1.0 for r in rows)
        assert all(r.html_len > r.text_len for r in rows)

    def test_keep_gate_splits_corpus_and_replays(self, spark, sf_dir):
        """The density gate drops boilerplate-dominated (short) docs,
        keeps long ones, and is exactly the rounded-density/length
        predicate on the output columns."""
        from flapi_spark.operators.text import text_html_extract

        rows = text_html_extract(
            spark, sf_dir, min_density=0.4, min_text_len=80
        ).collect()
        kept = [r for r in rows if r.keep]
        assert 0 < len(kept) < len(rows)
        for r in rows:
            assert r.keep == (
                r.text_density >= 0.4 and r.text_len >= 80
            )
        # threshold variation shifts the cut monotonically
        loose = text_html_extract(spark, sf_dir, min_density=0.0,
                                  min_text_len=0)
        assert all(r.keep for r in loose.collect())


class TestUrlFilter:
    """Round 10: URL filtering (text_url_filter) — the stage-0 crawl
    gate."""

    def test_rules_replay_locally(self, spark, sf_dir):
        import re

        from flapi_spark.operators.text import (
            URL_BLOCKED_DOMAINS, URL_DOMAINS, URL_KEYWORD_RE,
            text_url_filter,
        )

        rows = text_url_filter(spark, sf_dir).collect()
        assert rows
        for r in rows:
            want_domain = URL_DOMAINS[r.doc_id % len(URL_DOMAINS)]
            assert r.domain == want_domain
            assert r.url.startswith(f"https://{want_domain}/page")
            assert r.url_norm == r.url.split("?")[0]
            if r.doc_id % 5 == 0:
                assert "?utm_source=feed&ref=" in r.url
            else:
                assert "?" not in r.url
            if want_domain in URL_BLOCKED_DOMAINS:
                want = "domain"
            elif re.search(URL_KEYWORD_RE, r.url_norm):
                want = "keyword"
            else:
                want = "none"
            assert r.block_reason == want
            assert r.keep == (want == "none")
        reasons = {r.block_reason for r in rows}
        assert reasons == {"domain", "keyword", "none"}

    def test_normalization_strips_tracking_only(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from flapi_spark.operators.text import text_url_filter

        out = text_url_filter(spark, sf_dir)
        assert out.where(F.col("url_norm").contains("?")).count() == 0
        # the keyword rule fires on the NORMALIZED url: a tracking
        # param could never smuggle a blocked keyword past the gate
        assert out.where(
            (F.col("block_reason") == "keyword")
            & ~F.col("url_norm").rlike("casino|lottery|xxx")
        ).count() == 0

    def test_curate_stage_parity(self, spark, sf_dir):
        from flapi_spark.operators.text import text_url_filter
        from flapi_spark.pipeline import curate

        rep = curate(spark, sf_dir, stages=["url_filter"])
        got = {r.doc_id for r in rep.keep.collect()}
        want = {
            r.doc_id
            for r in text_url_filter(spark, sf_dir).where("keep").collect()
        }
        assert got == want and 0 < len(got) < 500


class TestHtmlMainOnRealMarkup:
    """Round 10 follow-up: _html_main on HAND-WRITTEN HTML (not the
    synthetic injection) — entity decoding, nested boilerplate,
    multiple scripts. The injected-markup oracle path has no entities,
    so these pin the real-page behavior the chain claims."""

    def _extract(self, spark, html: str) -> str:
        from pyspark.sql import functions as F

        from flapi_spark.operators.text import _html_main

        df = spark.createDataFrame([(html,)], "html STRING")
        return df.select(_html_main(F.col("html")).alias("m")).collect()[0].m

    def test_entities_decode_after_tag_strip(self, spark):
        got = self._extract(
            spark,
            '<html><head><title>t</title></head><body>'
            '<p>Tom &amp; Jerry say &quot;hi&quot; &lt;tag&gt;'
            ' caf&#39;e&nbsp;menu</p></body></html>',
        )
        # &lt;tag&gt; decodes to literal text AFTER stripping, so it
        # survives as text instead of being eaten as a fake tag
        assert got == 'Tom & Jerry say "hi" <tag> caf\'e menu'

    def test_double_escape_decodes_once(self, spark):
        got = self._extract(spark, "<body><p>&amp;lt;не tag&amp;gt;</p></body>")
        assert got == "&lt;не tag&gt;"

    def test_boilerplate_blocks_and_scripts_dropped(self, spark):
        got = self._extract(
            spark,
            '<html><head><style>p{x:1}</style><script>a()</script></head>'
            '<body><nav><a href="/">home</a></nav>'
            '<script type="text/javascript">var x = "<p>not text</p>";'
            "</script><article><p>real   content</p></article>"
            '<div class="ad">BUY</div><footer>(c)</footer></body></html>',
        )
        assert got == "real content"


def test_mixture_token_plan_invariants(spark, sf_dir):
    """round 10b: integer-waterfall invariants — per-source cap,
    budget cap, exhausted flag consistency, and a skewed-weight run
    allocating more to the heavier source."""
    from flapi_spark.operators.text import mixture_token_plan

    rows = mixture_token_plan(spark, sf_dir).collect()
    assert rows
    total = sum(r["available_tokens"] for r in rows)
    budget = total * 500_000 // 1_000_000
    alloc = sum(r["allocated_tokens"] for r in rows)
    assert alloc <= budget
    for r in rows:
        assert 0 <= r["allocated_tokens"] <= r["available_tokens"]
        assert r["exhausted"] == (
            r["allocated_tokens"] >= r["available_tokens"]
        )
    # skewed weights: src0 gets 10x the ppm of the rest
    srcs = sorted(r["source"] for r in rows)
    ppm_rest = 1_000_000 // (len(srcs) + 9)
    weights = {s: ppm_rest for s in srcs}
    weights[srcs[0]] = 10 * ppm_rest
    skew = {
        r["source"]: r["allocated_tokens"]
        for r in mixture_token_plan(
            spark, sf_dir, weights_ppm=weights
        ).collect()
    }
    flat = {r["source"]: r["allocated_tokens"] for r in rows}
    assert skew[srcs[0]] >= flat[srcs[0]]


def test_mixture_token_plan_weight_validation(spark, sf_dir):
    """round-10b review pins: bad weights fail loudly — non-positive
    or over-scale eagerly; a source missing from the dict at
    execution (raise_error in the plan), never NULL allocations."""
    import pytest
    from pyspark.errors import PySparkRuntimeError
    from py4j.protocol import Py4JJavaError

    from flapi_spark.operators.text import mixture_token_plan

    with pytest.raises(ValueError, match="positive"):
        mixture_token_plan(spark, sf_dir, weights_ppm={"src0": 0})
    with pytest.raises(ValueError, match="sum exceeds"):
        mixture_token_plan(
            spark, sf_dir, weights_ppm={"a": 800_000, "b": 800_000}
        )
    with pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception)):
        mixture_token_plan(
            spark, sf_dir, weights_ppm={"src0": 500_000}
        ).collect()


def test_mixture_sample_keepset_prefix_property(spark, sf_dir):
    """round 10b: per source, kept tokens fit the plan allocation,
    and the FIRST excluded doc in md5 order is exactly the overflow
    doc (prefix property — no doc skipped mid-prefix)."""
    from flapi_spark.operators.text import (
        mixture_sample_keepset, mixture_token_plan,
    )

    alloc = {
        r["source"]: r["allocated_tokens"]
        for r in mixture_token_plan(spark, sf_dir).collect()
    }
    rows = mixture_sample_keepset(spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == set(alloc)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["cum_tokens"])
        kept = [r for r in rs if r["keep"]]
        assert sum(r["n_toks"] for r in kept) <= alloc[src]
        # prefix: keeps are exactly the leading run in cumsum order
        flags = [r["keep"] for r in rs]
        assert flags == sorted(flags, reverse=True)
        if len(kept) < len(rs):  # first excluded doc would overflow
            nxt = rs[len(kept)]
            assert kept == rs[: len(kept)]
            assert nxt["cum_tokens"] > alloc[src]


def test_chunk_windows_cover_and_reconstruct(spark, sf_dir):
    """round 10c: every token lands in some window, middle windows are
    exactly `size` tokens with `size - stride` overlap, and stitching
    the non-overlapping prefixes reconstructs the normalized text."""
    from flapi_spark.operators.text import text_chunk_windows

    rows = text_chunk_windows(spark, sf_dir, size=32, stride=24).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    docs = {
        r.doc_id: " ".join(r.text.strip().lower().split())
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    multi = 0
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        n = chunks[0].n_toks
        assert [c.start_tok for c in chunks] == [
            i * 24 for i in range(len(chunks))
        ]
        # coverage: last window reaches the end of the doc
        last = chunks[-1]
        assert last.start_tok + last.n_chunk_toks == n
        for c in chunks[:-1]:
            assert c.n_chunk_toks == min(32, n - c.start_tok)
        # reconstruct from each chunk's stride-sized prefix
        parts = []
        for c in chunks:
            toks = c.chunk_text.split(" ")
            assert len(toks) == c.n_chunk_toks
            parts.extend(toks[:24])
        full = docs[doc_id].split(" ")
        assert parts[:n] == full[: len(parts[:n])] and len(parts) >= n
        if len(chunks) > 1:
            multi += 1
            # adjacent windows overlap by size - stride tokens
            a, b = chunks[0], chunks[1]
            assert a.chunk_text.split(" ")[24:] == b.chunk_text.split(
                " "
            )[: a.n_chunk_toks - 24]
    assert multi > 0  # the corpus has docs longer than one window


def test_chunk_windows_validates_params(spark, sf_dir):
    import pytest

    from flapi_spark.operators.text import text_chunk_windows

    with pytest.raises(ValueError):
        text_chunk_windows(spark, sf_dir, size=0)
    with pytest.raises(ValueError):
        text_chunk_windows(spark, sf_dir, stride=0)


def test_curriculum_order_properties(spark, sf_dir):
    """round 10c: positions are a permutation 1..n, buckets are
    contiguous in position order (the schedule IS easy-bucket-first),
    bucket sizes balance within 1, and bucket is monotone in the
    quality rank."""
    from flapi_spark.operators.text import curriculum_order

    rows = curriculum_order(spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r.position for r in rows) == list(range(1, n + 1))
    assert sorted(r.quality_rank for r in rows) == list(range(1, n + 1))
    by_pos = sorted(rows, key=lambda r: r.position)
    assert [r.bucket for r in by_pos] == sorted(r.bucket for r in rows)
    sizes = {}
    for r in rows:
        sizes[r.bucket] = sizes.get(r.bucket, 0) + 1
    assert max(sizes.values()) - min(sizes.values()) <= 1
    by_rank = sorted(rows, key=lambda r: r.quality_rank)
    assert [r.bucket for r in by_rank] == sorted(r.bucket for r in rows)
    # within a bucket, position order is the md5 shuffle, not rank
    b0 = [r for r in by_pos if r.bucket == 0]
    assert [r.quality_rank for r in b0] != sorted(
        r.quality_rank for r in b0
    )
