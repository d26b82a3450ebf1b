"""Text-analysis operators over the `documents` table.

Large-scale training-data pipeline primitives: token counting
(whitespace + BPE-ish regex), quality scoring (length / stopword /
punctuation heuristics), n-gram-heuristic language ID, and document
fingerprinting. All pure `pyspark.sql.functions` — JVM-side, inside
whole-stage codegen, no Python in the hot path; each has an exact
DuckDB oracle in flapi_spark/queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flapi_spark.session import load_table, spread

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

LANG_MARKERS = {
    "en": ("the", "a", "of", "to"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "los", "y", "una"),
    "fr": ("le", "les", "et", "une"),
}


def norm_text(col: str = "text") -> F.Column:
    """Whitespace-collapsed, lowercased, trimmed normalization shared by
    dedup and fingerprint operators."""
    return F.lower(F.trim(F.regexp_replace(F.col(col), "\\s+", " ")))


def _tokens(col: str = "text") -> F.Column:
    return F.split(norm_text(col), " ")


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace and BPE-ish-regex token counts per document."""
    docs = load_table(spark, sf_dir, "documents")
    # counts cast to long: DuckDB len()/length() yield BIGINT and the
    # correctness driver compares schemas
    return docs.select(
        "doc_id",
        F.size(_tokens()).cast("long").alias("n_tokens"),
        F.regexp_count(norm_text(), F.lit(BPE_PATTERN)).cast("long").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals: token stats, stopword density, and a
    composite score. At 100 TB this is the per-document filter pass
    before dedup — a single narrow projection, fully codegen'd."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_alpha_chars = F.length(F.regexp_replace(norm_text(), "[^a-z]", ""))
    stopword_ratio = n_stop.cast("double") / n_tokens
    avg_token_len = (
        F.length(F.regexp_replace(norm_text(), " ", "")).cast("double") / n_tokens
    )
    score = (
        F.least(n_tokens.cast("double") / F.lit(64.0), F.lit(1.0)) * F.lit(0.5)
        + F.least(stopword_ratio * F.lit(4.0), F.lit(1.0)) * F.lit(0.25)
        + F.least(avg_token_len / F.lit(8.0), F.lit(1.0)) * F.lit(0.25)
    )
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stopwords"),
        stopword_ratio.alias("stopword_ratio"),
        avg_token_len.alias("avg_token_len"),
        n_alpha_chars.cast("long").alias("n_alpha_chars"),
        score.alias("quality_score"),
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID heuristic with fixed-priority argmax
    (deterministic tie-breaking: en > de > es > fr > unknown)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    def _hits(words: tuple[str, ...]) -> F.Column:
        # single-arg lambda: a 2-arg lambda would be read as the
        # (element, index) form of F.filter
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    hits = {lang: _hits(words) for lang, words in LANG_MARKERS.items()}
    en, de, es, fr = hits["en"], hits["de"], hits["es"], hits["fr"]
    best = F.greatest(en, de, es, fr)
    predicted = (
        F.when(best == 0, F.lit("unknown"))
        .when(en == best, F.lit("en"))
        .when(de == best, F.lit("de"))
        .when(es == best, F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return docs.select(
        "doc_id",
        en.cast("long").alias("en_hits"),
        de.cast("long").alias("de_hits"),
        es.cast("long").alias("es_hits"),
        fr.cast("long").alias("fr_hits"),
        predicted.alias("predicted_lang"),
        F.col("lang").alias("actual_lang"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: md5 of the normalized text (exact-dup key)
    plus a cheap rolling-style prefix hash for sharded processing."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(norm_text()).alias("fp_md5"),
        F.md5(F.substring(norm_text(), 1, 64)).alias("fp_prefix64"),
    )


def text_winnow_fingerprint(
    spark: SparkSession, sf_dir: str, k: int = 8, w: int = 4
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003): hash
    every k-char gram of the normalized text, then keep the minimum
    hash of each w-gram sliding window — a content-defined sample of
    local fingerprints that survives insertions/deletions elsewhere in
    the document (the rolling-hash dedup/attribution primitive).

    All codegen'd: substring-gram md5s and window minima are array
    lambda expressions; one explode + distinct per doc. md5 is used as
    the gram hash because it is bit-identical in DuckDB, keeping the
    oracle exact."""
    docs = load_table(spark, sf_dir, "documents")
    nt = docs.select("doc_id", norm_text().alias("nt"))
    grams = F.expr(
        f"transform(sequence(1, greatest(length(nt) - {k} + 1, 1)),"
        f" i -> md5(substring(nt, i, {k})))"
    )
    with_grams = nt.select("doc_id", grams.alias("g"))
    winnowed = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(g) - {w} + 1, 1)),"
        f" j -> array_min(slice(g, j, {w}))))"
    )
    return (
        with_grams.select("doc_id", F.explode(winnowed).alias("fp"))
        .distinct()
    )


def split_train_holdout(
    spark: SparkSession, sf_dir: str, holdout_pct: int = 10
) -> DataFrame:
    """Deterministic corpus split: bucket = first 8 hex chars of
    md5(doc_id) mod 100 — a pure function of the row, so the split is
    reproducible across runs, engines, partitionings, and cluster
    sizes (the property a training pipeline needs; rng-based sampling
    has none of them). md5 keeps the DuckDB oracle bit-exact."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long") % 100
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < holdout_pct, F.lit("holdout"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def sample_stratified_by_lang(
    spark: SparkSession, sf_dir: str, fractions: dict | None = None,
    seed: int = 42,
) -> DataFrame:
    """Stratified subsample: per-language sampling fractions (e.g.
    downsample dominant languages when rebalancing a corpus). Seeded
    Bernoulli per stratum via sampleBy — proportions are statistical,
    so correctness is property-tested (subset of corpus, per-stratum
    rates within tolerance), not oracle-matched."""
    docs = load_table(spark, sf_dir, "documents")
    fractions = fractions or {"en": 0.5, "de": 1.0, "es": 1.0, "fr": 1.0}
    return docs.sampleBy("lang", fractions, seed=seed).select(
        "doc_id", "lang", "source"
    )


def vocab_top_tokens(spark: SparkSession, sf_dir: str, k: int = 100) -> DataFrame:
    """Corpus vocabulary: top-k tokens by document frequency and total
    count — the vocab-building pass of a tokenizer pipeline. One
    explode + one groupBy (map-side combined); the top-k is a
    TakeOrdered over the (vocab-sized, not corpus-sized) aggregate.
    Deterministic tiebreak on the token string keeps the oracle exact."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(norm_text(), " ")).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_total"), F.asc("tok"))
        .limit(k)
    )


def text_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gates (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", §A1.1): per-document metrics plus the
    boolean gate each implies, and the combined keep decision. At
    100 TB this is the first pass of a training-data pipeline — a
    narrow projection, one scan, no shuffle; thresholds adapted to the
    short synthetic corpus (token window 20..100000 instead of
    Gopher's 50..100000) so both outcomes occur in testdata.

    Array lambdas here are per-token linear work (interpreted, not
    codegen — acceptable: the alternative regex contortions obscure
    the semantics for no measured win at this arity)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks)
    nt = norm_text()
    mean_tok_len = (
        F.length(F.regexp_replace(nt, " ", "")).cast("double") / n_tokens
    )
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
    alpha_ratio = alpha_words.cast("double") / n_tokens
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    tok_ok = (n_tokens >= 20) & (n_tokens <= 100000)
    len_ok = (mean_tok_len >= 3.0) & (mean_tok_len <= 10.0)
    alpha_ok = alpha_ratio >= 0.8
    stop_ok = stop_hits >= 2
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        alpha_ratio.alias("alpha_word_ratio"),
        stop_hits.cast("long").alias("n_stopword_hits"),
        tok_ok.alias("pass_n_tokens"),
        len_ok.alias("pass_token_len"),
        alpha_ok.alias("pass_alpha_ratio"),
        stop_ok.alias("pass_stopwords"),
        (tok_ok & len_ok & alpha_ok & stop_ok).alias("keep"),
    )


CONTAMINATION_NGRAM = 4


def contamination_ngram_overlap(
    spark: SparkSession, sf_dir: str, n: int = CONTAMINATION_NGRAM
) -> DataFrame:
    """Train/eval contamination check: word n-gram overlap between the
    training split and a held-out eval set (doc_id % 50 == 0 here; in
    production the benchmark corpus). The standard decontamination
    step before training (e.g. GPT-3 appendix C: 13-gram overlap) —
    n=4 gives the short synthetic 10-99-token docs enough colliding
    grams to exercise the check; production corpora use 8-13.

    Scale shape: distinct n-gram hashes per side, equi-join on the
    hash — linear shuffle in total grams, never doc×doc; the eval side
    is tiny and broadcasts. Output: (train_doc, eval_doc,
    n_shared_grams) for every contaminated pair."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(norm_text(), " ").alias("t")).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    grams_expr = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(t) - {n - 1}, 0)),"
        f" i -> md5(concat_ws(' ', slice(t, i, {n})))))"
    )
    grams = toks.select("doc_id", F.explode(grams_expr).alias("gram"))
    is_eval = F.col("doc_id") % 50 == 0
    train = grams.where(~is_eval).select(
        F.col("doc_id").alias("train_doc"), "gram"
    )
    ev = grams.where(is_eval).select(F.col("doc_id").alias("eval_doc"), "gram")
    return (
        train.join(F.broadcast(ev), "gram")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


PACK_BUDGET = 256
PACK_SHARDS = 8


def pack_sequences(
    spark: SparkSession, sf_dir: str,
    budget: int = PACK_BUDGET, shards: int = PACK_SHARDS,
) -> DataFrame:
    """Deterministic sequence packing for training batches: assign each
    document to a pack so every pack holds ~`budget` tokens —
    sequential fill in doc_id order via a running token sum
    (pack = floor((cumsum - own)/budget)).

    Scale: a single global ordering would serialize the window; docs
    are sharded first (pmod(doc_id, shards)) and packed per shard —
    each shard's window is an independent partition, so the plan is
    one shuffle on the shard key and parallel scans within. Pack
    identity is (shard, pack_id)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    n_tokens = F.size(_tokens()).cast("long")
    with_shard = docs.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(shards)).cast("long").alias("shard"),
        n_tokens.alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = F.sum("n_tokens").over(w)
    return with_shard.select(
        "doc_id", "shard", "n_tokens",
        F.floor((cum - F.col("n_tokens")) / budget).cast("long").alias("pack_id"),
        cum.alias("cum_tokens"),
    )


def _gram_expr(n: int, col: str = "t") -> F.Column:
    """Word n-grams (space-joined) as an array column; empty array when
    the doc has fewer than n tokens."""
    return F.expr(
        f"CASE WHEN size({col}) >= {n} THEN"
        f" transform(sequence(1, size({col}) - {n} + 1),"
        f" i -> concat_ws(' ', slice({col}, i, {n})))"
        " ELSE array() END"
    )


def text_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gates (Rae et al. 2021 §A1.1): the
    fraction of characters covered by the most frequent word 2-gram,
    the fraction covered by duplicated 2-grams, and the duplicate-token
    fraction, each with its pass flag and a combined keep. (The
    reference signals use line/paragraph fractions and n up to 10; the
    synthetic corpus is single-line with a ~31-word vocabulary, so
    2-grams are where repetition actually shows — thresholds picked so
    both outcomes occur in testdata.)

    Scale shape: explode + one map-side-combined groupBy(doc_id, gram)
    — shuffle bounded by distinct (doc, gram) pairs, never corpus
    n-gram volume; the top-gram pick is a per-doc window over the
    already-aggregated counts. Overlapping occurrences double-count
    characters by construction (count × gram length); the metric is a
    repetition *signal*, not a span-cover measure, and the oracle
    applies the identical definition."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        norm_text().alias("nt"),
        _tokens().alias("t"),
    ).select(
        "doc_id",
        F.length("nt").alias("n_chars"),
        F.size("t").alias("n_tokens"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
        _gram_expr(2).alias("g2"),
    )
    c2 = (
        base.select("doc_id", F.explode("g2").alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("gram"))
    top2 = (
        c2.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("gram").alias("top_2gram"),
            (F.col("c") * F.length("gram")).alias("top_chars"),
        )
    )
    dup2 = (
        c2.where(F.col("c") >= 2)
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.length("gram")).alias("dup_chars"))
    )
    joined = (
        base.drop("g2")
        .join(top2, "doc_id", "left")
        .join(dup2, "doc_id", "left")
    )
    top_share = (
        F.coalesce(F.col("top_chars"), F.lit(0)).cast("double") / F.col("n_chars")
    )
    dup_frac = (
        F.coalesce(F.col("dup_chars"), F.lit(0)).cast("double") / F.col("n_chars")
    )
    dup_tok = (
        (F.col("n_tokens") - F.col("n_distinct")).cast("double") / F.col("n_tokens")
    )
    pass_top = top_share < 0.10
    pass_dup = dup_frac < 0.20
    pass_tok = dup_tok < 0.60
    return joined.select(
        "doc_id",
        F.coalesce(F.col("top_2gram"), F.lit("")).alias("top_2gram"),
        top_share.alias("top_2gram_share"),
        dup_frac.alias("dup_2gram_frac"),
        dup_tok.alias("dup_token_frac"),
        pass_top.alias("pass_top_2gram"),
        pass_dup.alias("pass_dup_2gram"),
        pass_tok.alias("pass_dup_tokens"),
        (pass_top & pass_dup & pass_tok).alias("keep"),
    )


# Default target mixture for domain_mixture_sample: rebalance five of
# the corpus sources; docs from unlisted sources are dropped.
MIXTURE_WEIGHTS = {
    "src0": 0.30, "src1": 0.25, "src2": 0.20, "src3": 0.15, "src4": 0.10,
}


def domain_mixture_sample(
    spark: SparkSession, sf_dir: str, weights: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministic domain-mixture rebalancing: given target mixture
    weights per `source`, keep the largest corpus subset whose source
    proportions match the weights exactly — scale = min_s(n_s / w_s),
    k_s = floor(scale * w_s), then the k_s docs of each source that
    rank first by (md5(doc_id), doc_id). The hash rank is a pure
    function of the row, so the sample is reproducible across engines,
    partitionings and cluster sizes (the data-mixture step of corpus
    assembly, cf. The Pile / Gopher mixture tables).

    Scale shape (round 11 closed the per-source-window deferral):
    per-source counts are a tiny aggregate broadcast back; the
    per-source pick rank is ONE global frozen-bin rank in
    (source, md5, doc_id) order minus each source's preceding-source
    row offset — exact counts stay part of the contract (unlike the
    hash-threshold variant, which trades them for a scan) and no
    partition ever holds a whole source."""
    from itertools import chain

    from pyspark.sql import Window

    from flapi_spark.operators.scale import global_rank

    docs = load_table(spark, sf_dir, "documents")
    weights = weights or MIXTURE_WEIGHTS
    wmap = F.create_map(*[F.lit(x) for x in chain.from_iterable(weights.items())])
    # materialize the filtered projection ONCE — the counts rollup
    # and the frozen-bin passes read the same blocks
    base = (
        docs.where(F.col("source").isin(*weights))
        .select(
            "doc_id",
            "source",
            F.md5(F.col("doc_id").cast("string")).alias("__h"),
        )
        .localCheckpoint(eager=True)
    )
    counts = (
        base.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("wt", wmap[F.col("source")])
    )
    scale = counts.agg(
        F.min(F.col("n").cast("double") / F.col("wt")).alias("scale")
    )
    wsrc = Window.orderBy("source").rowsBetween(
        Window.unboundedPreceding, -1
    )
    k = (
        counts.crossJoin(F.broadcast(scale))
        .select(
            "source",
            F.floor(F.col("scale") * F.col("wt")).cast("long").alias("k"),
            F.coalesce(F.sum("n").over(wsrc), F.lit(0)).alias("__off"),
        )
    )
    ranked = (
        global_rank(base, ["source", "__h", "doc_id"], "__gr")
        .join(F.broadcast(k), "source")
        .withColumn("pick_rank", F.col("__gr") - F.col("__off"))
    )
    return (
        ranked.where(F.col("pick_rank") <= F.col("k"))
        .select(
            "doc_id",
            "source",
            F.col("pick_rank").cast("long").alias("pick_rank"),
        )
    )


# PII patterns — valid in both Java regex (Spark) and RE2 (DuckDB)
PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PII_IP = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PII_PHONE = "\\b[0-9]{3}-[0-9]{4}\\b"


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: count and mask emails / IPv4s / phone-shaped
    numbers per document. The synthetic corpus carries no PII, so each
    query row gets a deterministic doc_id-derived PII suffix appended
    first — the operator then has real matches to find, and the DuckDB
    oracle (same injection, same regexes) verifies counts and the md5
    of the redacted text exactly.

    100 TB shape: pure regexp_count/regexp_replace projections —
    JVM-side, whole-stage codegen, embarrassingly parallel, no
    shuffle. The redaction order (emails, then IPs, then phones) is
    part of the contract: earlier masks cannot create later matches
    because mask tokens contain no digits or '@'."""
    docs = load_table(spark, sf_dir, "documents")
    pii = F.concat(
        F.col("text"),
        F.format_string(
            " contact user%d@example.com from 10.%d.0.1 call 555-%04d",
            F.col("doc_id"),
            F.col("doc_id") % 256,
            F.col("doc_id") % 10000,
        ),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(pii, PII_EMAIL, "<EMAIL>"),
            PII_IP, "<IP>",
        ),
        PII_PHONE, "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(pii, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(pii, F.lit(PII_IP)).cast("long").alias("n_ips"),
        F.regexp_count(pii, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


def text_bigram_lm_score(
    spark: SparkSession, sf_dir: str, alpha: float = 0.5
) -> DataFrame:
    """Corpus-trained bigram language-model scoring (the CCNet-style
    perplexity-bucket quality signal, Wenzek et al. 2020, with the LM
    trained on the corpus itself): per document, the average negative
    log-likelihood of its token bigrams under an add-alpha-smoothed
    bigram model.

    Cross-engine determinism: per-bigram log-probs are single libm
    ln() calls (engines may differ in the last ulp), summed in sorted
    order via an ordered array fold so divergence stays ~n*ulp, then
    rounded to 6 decimals — orders of magnitude inside the rounding
    grid. Scale shape: bigram counts are two map-side-combined
    groupBys; the probability join is bigram-keyed (linear shuffle);
    no Python, no driver loops."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", _tokens().alias("t"))
    pairs = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1,"
                "  element_at(t, i + 1) AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    # c1 is the w1-marginal of c2 (identical values to a direct
    # count — each (w1,w2) occurrence contributes exactly once), so
    # deriving it turns a second corpus-grain explode+groupBy into a
    # vocab-grain re-aggregate (round 8; left LAZY — measured faster
    # than a localCheckpoint at bench scale, same finding as the
    # MinHash signature trade documented in dedup.py)
    c2 = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c2")
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        t.select(F.explode("t").alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    scored = (
        pairs.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log(
                (F.col("c2") + F.lit(alpha))
                / (F.col("c1") + F.lit(alpha) * F.col("v"))
            ).alias("lp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("lp")).alias("lps")
    )
    fold = F.expr("aggregate(lps, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
    return per_doc.select(
        "doc_id",
        F.size("lps").cast("long").alias("n_bigrams"),
        F.round(-(fold / F.size("lps")), 6).alias("avg_nll"),
    )


DSIR_BUCKETS = 1024


def dsir_importance_weights(
    spark: SparkSession, sf_dir: str, target_lang: str = "en",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    hashed-unigram bag-of-words features; the per-document log
    importance weight sums ln(p_target(bucket) / p_raw(bucket)) over
    its token stream, with add-1-smoothed bucket distributions
    estimated from the target subset (lang = target_lang) vs the whole
    corpus. Selection = resample docs with probability proportional to
    exp(weight).

    The token->bucket hash is the engine-portable md5-prefix fold used
    by the portable MinHash, so bucket ids replicate anywhere md5
    exists. The probability ratio is formed from exact integer
    products (< 2^53) before a single ln(), per-doc sums run in
    sorted order, and the result rounds to 6 decimals. Scale shape:
    bucket stats are two tiny aggregates broadcast back; the scan is
    one pass."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(_tokens()).alias("tok")
    ).withColumn(
        "bucket",
        F.expr(
            "pmod(cast(conv(substr(md5(tok), 1, 15), 16, 10) as bigint),"
            f" {n_buckets})"
        ),
    )
    tgt = toks.where(F.col("lang") == target_lang)
    ct = tgt.groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    cr = toks.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    nt = tgt.agg(F.count(F.lit(1)).alias("n_t"))
    nr = toks.agg(F.count(F.lit(1)).alias("n_r"))
    stats = (
        cr.join(ct, "bucket", "left")
        .na.fill({"ct": 0})
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select(
            "bucket",
            F.log(
                ((F.col("ct") + 1) * (F.col("n_r") + F.lit(n_buckets)))
                .cast("double")
                / ((F.col("cr") + 1) * (F.col("n_t") + F.lit(n_buckets)))
                .cast("double")
            ).alias("lw"),
        )
    )
    per_doc = (
        toks.join(F.broadcast(stats), "bucket")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("lw")).alias("lws"))
    )
    fold = F.expr("aggregate(lws, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
    return per_doc.select(
        "doc_id",
        F.size("lws").cast("long").alias("n_tokens"),
        F.round(fold, 6).alias("log_weight"),
    )


def tfidf_top_terms(
    spark: SparkSession, sf_dir: str, k: int = 3
) -> DataFrame:
    """Per-document top-k TF-IDF terms: tf = in-doc term count,
    idf = ln(N / df), ranked by the 6-decimal-rounded score with an
    alphabetical tiebreak (rounding first makes the ordering identical
    across engines even when ln() differs in the last ulp).

    Scale shape: one (doc, term) groupBy, a term-keyed df aggregate
    joined back on term, a per-doc window over <=vocab-size rows —
    all linear shuffles; N broadcasts as a 1-row scalar."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "doc_id", "term",
            F.col("tf").cast("long").alias("tf"),
            "score",
            F.col("rn").cast("long").alias("rn"),
        )
    )


# Unicode script ranges as literal char-class regexes — literal BMP
# ranges parse identically in Java regex (Spark) and RE2 (DuckDB).
SCRIPT_LATIN = "[A-Za-z]"
SCRIPT_CYRILLIC = "[Ѐ-ӿ]"
SCRIPT_CJK = "[一-鿿]"
SCRIPT_ARABIC = "[؀-ۿ]"

# deterministic doc_id-derived multiscript snippets (the synthetic
# corpus is pure ASCII, so like text_pii_redact the operator injects
# its own ground truth and the oracle replays the same injection)
_CYR_SNIPPET = " привет мир"
_CJK_SNIPPET = " 你好世界数据"
_ARA_SNIPPET = " مرحبا بالعالم"


def text_script_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-script detection: per-document character counts for
    Latin / Cyrillic / CJK / Arabic ranges, script fractions, and the
    dominant script — the writing-system complement to the stopword
    language ID (multilingual corpora route tokenizers and LID models
    by script first; cf. CCNet's fasttext LID preprocessing).

    The ASCII corpus gets a deterministic doc_id-derived multiscript
    suffix (docs ≡ 1, 2, 3 mod 4 gain Cyrillic / CJK / Arabic text) so
    every branch has real matches; the oracle replays the identical
    injection. 100 TB shape: pure regexp_count projections — codegen,
    shuffle-free, embarrassingly parallel. Dominant-script pick is a
    fixed comparison chain (latin ≥ cyrillic ≥ cjk ≥ arabic on ties),
    deterministic on any engine."""
    docs = load_table(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 4 == 1, F.lit(_CYR_SNIPPET))
        .when(F.col("doc_id") % 4 == 2, F.lit(_CJK_SNIPPET))
        .when(F.col("doc_id") % 4 == 3, F.lit(_ARA_SNIPPET))
        .otherwise(F.lit("")),
    )
    n_latin = F.regexp_count(injected, F.lit(SCRIPT_LATIN))
    n_cyr = F.regexp_count(injected, F.lit(SCRIPT_CYRILLIC))
    n_cjk = F.regexp_count(injected, F.lit(SCRIPT_CJK))
    n_ara = F.regexp_count(injected, F.lit(SCRIPT_ARABIC))
    n_all = F.length(injected)
    dominant = (
        F.when((n_latin >= n_cyr) & (n_latin >= n_cjk) & (n_latin >= n_ara),
               F.lit("latin"))
        .when((n_cyr >= n_cjk) & (n_cyr >= n_ara), F.lit("cyrillic"))
        .when(n_cjk >= n_ara, F.lit("cjk"))
        .otherwise(F.lit("arabic"))
    )
    return docs.select(
        "doc_id",
        n_latin.cast("long").alias("n_latin"),
        n_cyr.cast("long").alias("n_cyrillic"),
        n_cjk.cast("long").alias("n_cjk"),
        n_ara.cast("long").alias("n_arabic"),
        n_all.cast("long").alias("n_chars_total"),
        (n_latin.cast("double") / n_all.cast("double")).alias("frac_latin"),
        dominant.alias("dominant_script"),
    )


def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): within
    each language, documents are cut into head / middle / tail terciles
    by their bigram-LM average NLL (lower = more fluent). CCNet keeps
    `head` and drops or down-weights `tail`; the bucket label is the
    routing key for that mixture decision.

    Built on text_bigram_lm_score's engine-portable scores; the
    tercile cut is exact ANSI ntile(3) over the deterministic
    (avg_nll, doc_id) order, which the DuckDB oracle replays exactly.
    Scale shape (round 11 closed the per-language-window deferral):
    ONE global frozen-bin rank in (lang, avg_nll, doc_id) order minus
    each language's preceding-language row offset gives the per-lang
    rank, and scale.ntile_band maps it to the identical tercile — the
    only ordered window left runs over one row per language, so no
    partition ever holds a whole language's documents."""
    from pyspark.sql import Window

    from flapi_spark.operators.scale import global_rank, ntile_band

    lm = text_bigram_lm_score(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    # materialize the scored join ONCE — the per-lang counts and the
    # frozen-bin passes read the same blocks
    j = lm.join(docs, "doc_id").select(
        "doc_id", "lang", "avg_nll"
    ).localCheckpoint(eager=True)
    wl = Window.orderBy("lang").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        j.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            "lang",
            "__n",
            F.coalesce(F.sum("__n").over(wl), F.lit(0)).alias("__off"),
        )
    )
    b = (
        global_rank(j, ["lang", "avg_nll", "doc_id"], "__gr")
        .join(F.broadcast(offs), "lang")
        .withColumn(
            "tercile",
            ntile_band(F.col("__gr") - F.col("__off"), F.col("__n"), 3),
        )
    )
    return b.select(
        "doc_id",
        "lang",
        "avg_nll",
        F.col("tercile").cast("long").alias("tercile"),
        F.when(F.col("tercile") == 1, F.lit("head"))
        .when(F.col("tercile") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def _merge_pair_expr(col: str, left: str, right: str) -> str:
    """SQL expression merging every non-overlapping adjacent
    (left, right) symbol pair in array column `col`, left to right —
    one fold, no UDF. Callers pass ^[a-z]+$ symbols only (no quoting
    hazards)."""
    merged = left + right
    return (
        f"aggregate(sequence(1, size({col})),"
        " CAST(named_struct('arr', CAST(array() AS ARRAY<STRING>),"
        "  'skip', false) AS STRUCT<arr: ARRAY<STRING>, skip: BOOLEAN>),"
        " (acc, i) -> CASE"
        "  WHEN acc.skip THEN named_struct('arr', acc.arr, 'skip', false)"
        f"  WHEN i < size({col}) AND element_at({col}, i) = '{left}'"
        f"   AND element_at({col}, i + 1) = '{right}'"
        f"   THEN named_struct('arr', array_append(acc.arr, '{merged}'),"
        "    'skip', true)"
        f"  ELSE named_struct('arr', array_append(acc.arr,"
        f"   element_at({col}, i)), 'skip', false) END,"
        " acc -> acc.arr)"
    )


def bpe_train_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = 10
) -> DataFrame:
    """Byte-pair-encoding merge training (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units"):
    learn the first `n_merges` merges over the corpus vocabulary —
    each round merges the most frequent adjacent symbol pair
    (frequency-weighted by word counts, deterministic (count desc,
    pair asc) tiebreak).

    Spark-first scale shape: the CORPUS-scale work is one
    groupBy(word) count — BPE then trains on the aggregated
    vocabulary, which grows sublinearly (Heaps' law) and stays tiny
    relative to a 100 TB corpus. Each round is a map-side-combined
    pair-count aggregate over that vocab plus a single-row argmax
    collect (driver coordination like k-means, not a data loop);
    the merge rewrite is a codegen'd array fold, no Python UDF.
    Restricted to ^[a-z]+$ words (standard pre-tokenization).
    Rows-only registry check — the merge literals are data-dependent
    so no static SQL oracle exists; tests/test_round3c.py verifies
    the merge sequence against a pure-Python golden BPE."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(_tokens()).alias("word"))
        .where(F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    syms = vocab.selectExpr(
        "freq",
        "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
        " AS s",
    ).persist()
    syms.count()
    out = []
    for rank in range(1, n_merges + 1):
        best = (
            # single-symbol words contribute no pairs (and sequence(1, 0)
            # would descend, indexing out of bounds)
            syms.where(F.size("s") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1),"
                        " i -> struct(element_at(s, i) AS a,"
                        "  element_at(s, i + 1) AS b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, n = best[0].a, best[0].b, best[0].n
        out.append((rank, a, b, a + b, int(n)))
        nxt = syms.selectExpr(
            "freq", _merge_pair_expr("s", a, b) + " AS s"
        ).persist()
        nxt.count()
        syms.unpersist()
        syms = nxt
    syms.unpersist()
    return spark.createDataFrame(
        out, "rank BIGINT, left STRING, right STRING, merged STRING,"
        " pair_count BIGINT",
    )


def udtf_ngram_profile(
    spark: SparkSession, sf_dir: str, n: int = 2, k: int = 20
) -> DataFrame:
    """Corpus n-gram profile through a Python UDTF (Spark 4's
    user-defined TABLE function extension point): a lateral join
    expands each document into its n-grams, then a groupBy counts the
    top-k with deterministic tiebreak.

    The UDTF here is the EXTENSION-POINT demo — row-at-a-time Python
    is the slow path, and the production n-gram expansion stays
    JVM-side (operators/text.py _gram_expr, used by the repetition
    filters); a custom tokenizer/parser that genuinely needs Python
    is what this hook is for. The oracle replays the expansion in
    SQL, so the UDTF's output contract is exactly verified."""
    from pyspark.sql import Window
    from pyspark.sql.functions import udtf

    @udtf(returnType="gram: string")
    class Ngrams:
        def eval(self, text: str, width: int):
            toks = text.split(" ")
            for i in range(len(toks) - width + 1):
                yield (" ".join(toks[i : i + width]),)

    spark.udtf.register("flapi_ngrams", Ngrams)
    from flapi_spark.session import register_views

    register_views(spark, sf_dir, tables=("documents",))
    norm = (
        "lower(trim(regexp_replace(text, '\\\\s+', ' ')))"
    )
    grams = spark.sql(
        f"SELECT g.gram FROM documents d,"
        f" LATERAL flapi_ngrams({norm}, {n}) g"
    )
    # top-k via orderBy+limit (TakeOrderedAndProject, per-partition
    # heap) — the gram vocabulary scales with the corpus, so a global
    # row_number window over it is a single-task sort; rnk re-derives
    # over the k survivors
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("gram"))
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("gram"))
        .limit(k)
        .select(
            "gram",
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.row_number().over(w).cast("long").alias("rnk"),
        )
    )


CM_DEPTH = 4
CM_WIDTH = 1024


def countmin_token_freq(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over the token
    stream: depth×width integer counters built in ONE map-side-combined
    groupBy (shuffle bounded by depth·width distinct keys, NOT by
    vocabulary — the bounded-memory frequency structure for 100 TB
    streams), then point estimates (min over depth rows) for the top-k
    true tokens beside their exact counts — the estimate ≥ truth
    overestimate guarantee is visible in the output.

    Engine-portable: bucket hashes are the md5-prefix fold (DSIR's),
    counters and minima are integral, top-k tiebreaks on the token —
    the DuckDB oracle replays the sketch bit-for-bit."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens()).alias("tok"))
    with_depth = toks.withColumn(
        "depth", F.explode(F.array(*[F.lit(i) for i in range(CM_DEPTH)]))
    ).withColumn(
        "bucket",
        F.expr(
            "pmod(cast(conv(substr(md5(concat(cast(depth AS STRING),"
            f" ':', tok)), 1, 15), 16, 10) as bigint), {CM_WIDTH})"
        ),
    )
    counters = with_depth.groupBy("depth", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    true_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    # top-k tokens via orderBy+limit (vocabulary-scale input; the
    # re-ranking window runs over the k survivors only)
    wtop = Window.orderBy(F.desc("n"), F.asc("tok"))
    top = (
        true_counts.orderBy(F.desc("n"), F.asc("tok"))
        .limit(k)
        .withColumn("rnk", F.row_number().over(wtop))
    )
    probes = top.withColumn(
        "depth", F.explode(F.array(*[F.lit(i) for i in range(CM_DEPTH)]))
    ).withColumn(
        "bucket",
        F.expr(
            "pmod(cast(conv(substr(md5(concat(cast(depth AS STRING),"
            f" ':', tok)), 1, 15), 16, 10) as bigint), {CM_WIDTH})"
        ),
    )
    est = (
        probes.join(F.broadcast(counters), ["depth", "bucket"])
        .groupBy("tok", "n", "rnk")
        .agg(F.min("c").alias("cm_estimate"))
    )
    return est.select(
        "tok",
        F.col("n").cast("long").alias("true_count"),
        F.col("cm_estimate").cast("long").alias("cm_estimate"),
        F.col("rnk").cast("long").alias("rnk"),
        (F.col("cm_estimate") >= F.col("n")).alias("overestimates"),
    )


def vocab_oov_rate(
    spark: SparkSession, sf_dir: str, k: int = 100
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus-built
    top-k vocabulary (`vocab_top_tokens`) — the coverage check run
    before committing to a tokenizer vocab: documents with high OOV
    rates are either noise (drop candidates) or evidence the vocab
    under-serves a domain.

    Scale shape: the vocab is top-k-small by construction, so
    membership tagging is a BROADCAST left join against the exploded
    token stream — corpus-scale work is one projection + one
    groupBy(doc_id) with map-side combine. oov_rate divides two exact
    BIGINTs once, rounded to 6dp (cross-engine deterministic).
    Exact DuckDB oracle rebuilds the same vocab CTE."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = vocab_top_tokens(spark, sf_dir, k).select("tok")
    toks = docs.select(
        "doc_id", F.explode(F.split(norm_text(), " ")).alias("tok")
    )
    tagged = toks.join(
        F.broadcast(vocab.withColumn("__v", F.lit(1))), "tok", "left"
    )
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__v").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_oov").cast("long").alias("n_oov"),
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
    )


def bpe_encode_tokens(
    spark: SparkSession, sf_dir: str, n_merges: int = 10
) -> DataFrame:
    """Apply corpus-trained BPE merges (`bpe_train_merges`) to encode
    every document — the tokenizer-application half of the BPE pair:
    training learns the merge table once; encoding replays the merges
    IN RANK ORDER over each word. Output: per-doc encoded-symbol
    count, character count, and the compression ratio the merge table
    achieves (chars per symbol, the metric tokenizer quality is judged
    by).

    Scale shape: merges are a tiny driver-held list (the trained
    artifact — exactly how production tokenizers ship); encoding is a
    chain of `n_merges` codegen'd array folds applied per word in one
    linear projection — no shuffle beyond the final groupBy(doc_id),
    no Python UDF. Rows-only registry check (merge literals are
    data-dependent); tests verify against a pure-Python golden
    encoder."""
    merges = [
        (r["left"], r["right"])
        for r in bpe_train_merges(spark, sf_dir, n_merges)
        .orderBy("rank")
        .collect()
    ]
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(_tokens()).alias("word")
    ).where(F.col("word").rlike("^[a-z]+$"))
    expr = (
        "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
    )
    for left, right in merges:
        inner = f"CAST({expr} AS ARRAY<STRING>)"
        # _merge_pair_expr folds over a column name; alias the chain
        # via a lateral-style nested expression instead
        expr = _merge_pair_expr_inline(inner, left, right)
    enc = words.select(
        "doc_id",
        F.length("word").alias("n_chars"),
        F.size(F.expr(expr)).alias("n_symbols"),
    )
    return (
        enc.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.sum("n_symbols").cast("long").alias("n_symbols"),
        )
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            "n_chars",
            "n_symbols",
            F.round(
                F.col("n_chars").cast("double") / F.col("n_symbols"), 6
            ).alias("chars_per_symbol"),
        )
    )


def _merge_pair_expr_inline(arr_expr: str, left: str, right: str) -> str:
    """_merge_pair_expr over an arbitrary array EXPRESSION (not a
    column name): binds it once per row through a single-element
    transform so the chained encode fold never re-evaluates the
    upstream merge chain per element."""
    merged = left + right
    return (
        f"element_at(transform(array({arr_expr}), s ->"
        " aggregate(sequence(1, size(s)),"
        " CAST(named_struct('arr', CAST(array() AS ARRAY<STRING>),"
        "  'skip', false) AS STRUCT<arr: ARRAY<STRING>, skip: BOOLEAN>),"
        " (acc, i) -> CASE"
        "  WHEN acc.skip THEN named_struct('arr', acc.arr, 'skip', false)"
        f"  WHEN i < size(s) AND element_at(s, i) = '{left}'"
        f"   AND element_at(s, i + 1) = '{right}'"
        f"   THEN named_struct('arr', array_append(acc.arr, '{merged}'),"
        "    'skip', true)"
        f"  ELSE named_struct('arr', array_append(acc.arr,"
        "   element_at(s, i)), 'skip', false) END,"
        " acc -> acc.arr)), 1)"
    )


def text_ttr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity metrics per document: type-token ratio (TTR)
    and hapax-legomena fraction (tokens occurring exactly once in the
    doc / distinct types) — the diversity quality signals beside the
    Gopher/repetition gates: low TTR flags templated or repetitive
    text; a high hapax fraction flags noise (OCR junk, random
    strings).

    One explode + one (doc_id, tok) groupBy + one doc_id groupBy —
    linear shuffles, map-side combined. Ratios divide exact BIGINTs
    once, rounded to 6dp; exact DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    per_tok = (
        docs.select("doc_id", F.explode(F.split(norm_text(), " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_tok.groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("n_hapax"),
        )
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_types").cast("long").alias("n_types"),
            F.col("n_hapax").cast("long").alias("n_hapax"),
            F.round(
                F.col("n_types").cast("double") / F.col("n_tokens"), 6
            ).alias("ttr"),
            F.round(
                F.col("n_hapax").cast("double") / F.col("n_types"), 6
            ).alias("hapax_frac"),
        )
    )


SHARD_COUNT = 8
SHARD_SEED = "shard1"


def corpus_shard_assign(
    spark: SparkSession, sf_dir: str, n_shards: int = SHARD_COUNT,
    seed: str = SHARD_SEED,
) -> DataFrame:
    """Deterministic training-order sharding: every document gets a
    shard and a position within it from a seeded md5 rank — the
    global-shuffle step of corpus assembly (training wants an order
    decorrelated from crawl/source order, reproducible across reruns
    and engines; cf. split_train_holdout's md5-bucket split).

    shard = md5("seed:doc_id") mod n_shards; position = rank of the
    SAME md5 within the shard. Changing the seed re-shuffles every
    epoch deterministically. Scale shape: one hash projection + one
    window per shard — n_shards independent sorts, each 1/n_shards of
    the corpus (at 1000 executors raise n_shards so per-shard sorts
    fit an executor; the hash rank makes order independent of
    partitioning). Exact DuckDB oracle (identical md5 arithmetic)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string")))
    hashed = docs.select(
        "doc_id",
        h.alias("h"),
        F.expr(
            f"pmod(cast(conv(substr(md5(concat('{seed}:',"
            f" CAST(doc_id AS STRING))), 1, 15), 16, 10) as bigint),"
            f" {n_shards})"
        ).cast("long").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return hashed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


def gram_novelty_rate(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's DISTINCT
    word n-grams that appear in no other document — the corpus-level
    complement of hapax diversity (near-1 novelty = unique content;
    near-0 = assembled from corpus-common phrasing, a boilerplate /
    template smell that catches duplication finer than whole-chunk
    tiling).

    Scale shape: one explode to distinct (doc, gram) pairs, one
    map-side-combined groupBy(gram) for document frequencies, one
    (gram)-keyed join back, one groupBy(doc) — every shuffle bounded
    by distinct gram-pair counts, never doc×doc. Exact DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split(norm_text(), " ").alias("t"))
    grams = t.select(
        "doc_id",
        F.explode(F.array_distinct(_gram_expr(n))).alias("gram"),
    )
    df_counts = grams.groupBy("gram").agg(
        F.count_distinct("doc_id").alias("gram_df")
    )
    return (
        grams.join(df_counts, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("gram_df") == 1, 1).otherwise(0)).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_novel").cast("long").alias("n_novel"),
            F.round(
                F.col("n_novel").cast("double") / F.col("n_grams"), 6
            ).alias("novelty_rate"),
        )
    )


SAMPLE_W_SEED = "wsample1"
SAMPLE_W_K = 50


def sample_weighted_quality(
    spark: SparkSession, sf_dir: str, k: int = SAMPLE_W_K,
    seed: str = SAMPLE_W_SEED,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-Res,
    Efraimidis & Spirakis 2006): each doc draws key = ln(u)/w from a
    seeded md5-derived uniform u and weight w = n_chars; the k largest
    keys are the sample — longer docs proportionally likelier, yet the
    draw is reproducible across engines, runs and partitionings (the
    corpus-assembly sampler when quality/length should bias
    inclusion).

    Scale shape: one hash projection + one TakeOrdered top-k — no
    shuffle beyond the k-row reduction. Cross-engine exactness: u is
    exact integer arithmetic over the md5 prefix; the single ln() is
    the one libm call, so the key rounds to 9dp with doc_id tiebreak
    (the documented libm-ulp convention); exact DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    two60 = 1 << 60
    u = (
        F.expr(
            f"cast(conv(substr(md5(concat('{seed}:',"
            f" CAST(doc_id AS STRING))), 1, 15), 16, 10) as bigint) + 1"
        ).cast("double")
        / F.lit(float(two60))
    )
    key = F.round(F.log(u) / F.col("n_chars"), 9)
    from pyspark.sql import Window

    # A-Res keeps the k largest keys: orderBy+limit compiles to
    # TakeOrderedAndProject (per-partition heap of k over the corpus,
    # no global sort); rnk re-derives over the k survivors
    w = Window.orderBy(F.desc("key"), F.asc("doc_id"))
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            key.alias("key"),
        )
        .orderBy(F.desc("key"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
    )


def chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared independence test between document language and
    source — the corpus-composition sanity check (are sources
    language-skewed?) and the A/B-testing primitive in general form.

    One groupBy builds the contingency table; expected counts and the
    chi-square statistic derive from EXACT integer marginals, with the
    per-cell (O−E)²/E term computed in a mirrored double shape and
    rounded 6dp (cross-engine deterministic). Output: per-cell
    observed/expected/contribution plus the cell count — the statistic
    is the sum of contributions, df = (R−1)(C−1). Exact oracle."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("observed")
    )
    from pyspark.sql import Window

    wl = Window.partitionBy("lang")
    ws = Window.partitionBy("source")
    wall = Window.partitionBy()
    t = (
        cells.withColumn("row_n", F.sum("observed").over(wl))
        .withColumn("col_n", F.sum("observed").over(ws))
        .withColumn("total_n", F.sum("observed").over(wall))
    )
    expected = (
        F.col("row_n").cast("double")
        * F.col("col_n")
        / F.col("total_n")
    )
    contrib = F.round(
        (F.col("observed") - expected) * (F.col("observed") - expected)
        / expected,
        6,
    )
    return t.select(
        "lang",
        "source",
        F.col("observed").cast("long").alias("observed"),
        F.round(expected, 6).alias("expected"),
        contrib.alias("chi2_contrib"),
    )


def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document with a deterministic
    vowel-group syllable heuristic — the readability quality signal
    (low-ease documents are candidate jargon/noise; unnaturally high
    ease flags template text).

    words = whitespace tokens; sentences = [.!?]+ runs (min 1);
    syllables = [aeiouy]+ group count (min 1 per word approximated
    corpus-wide). regexp_count with these literal classes behaves
    identically in Java regex and RE2, so the counts are engine-exact;
    the two-ratio formula runs in mirrored doubles rounded 6dp.
    Zero-shuffle projection. Exact oracle."""
    docs = load_table(spark, sf_dir, "documents")
    nt = norm_text()
    words = F.size(F.split(nt, " "))
    sentences = F.greatest(
        F.expr("regexp_count(text, '[.!?]+')"), F.lit(1)
    )
    syllables = F.greatest(
        F.expr(
            "regexp_count(lower(trim(regexp_replace(text,"
            " '\\\\s+', ' '))), '[aeiouy]+')"
        ),
        words,
    )
    score = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sentences)
        - F.lit(84.6) * (syllables.cast("double") / words),
        6,
    )
    return docs.select(
        "doc_id",
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        score.alias("flesch_ease"),
    )


def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation report per source: how much of each source is exact-
    duplicate mass ("which crawl is dirtiest") — docs whose normalized
    text occurs more than once corpus-wide, counted per source with
    the duplicate share. One fingerprint groupBy + one source groupBy;
    exact integers + one division (6dp). Exact oracle."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", "source", F.md5(norm_text()).alias("fp")
    )
    sizes = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("n_copies"))
    tagged = fp.join(sizes, "fp")
    return (
        tagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0)).alias(
                "n_in_dup_family"
            ),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_in_dup_family").cast("long").alias("n_in_dup_family"),
            F.round(
                F.col("n_in_dup_family").cast("double") / F.col("n_docs"),
                6,
            ).alias("dup_rate"),
        )
    )


def langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation op: the confusion matrix of the language
    detector (`text_langid`) against the labeled `lang` column — cell
    counts, per-cell share, and the row's recall contribution. The
    eval harness every heuristic/model in the pipeline should carry;
    the detector is deterministic, so the matrix is exact."""
    pred = text_langid(spark, sf_dir).select(
        "doc_id", "predicted_lang", "actual_lang"
    )
    from pyspark.sql import Window

    cells = pred.groupBy("actual_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    wr = Window.partitionBy("actual_lang")
    wall = Window.partitionBy()
    return (
        cells.withColumn("row_n", F.sum("n").over(wr))
        .withColumn("total", F.sum("n").over(wall))
        .select(
            "actual_lang",
            "predicted_lang",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
            F.round(F.col("n").cast("double") / F.col("row_n"), 6).alias(
                "row_recall"
            ),
        )
    )


# --- round 5: sketch / corpus-statistics additions -----------------------

BLOOM_M = 1 << 16          # filter bits
BLOOM_K = 4                # hash functions
# independent affine perms over the md5-prefix token hash (same
# universal-hash family as the portable MinHash pipeline)
BLOOM_PERMS = ((769, 12289), (3079, 49157), (196613, 786433),
               (1572869, 98317))
_MERSENNE_P = 2147483647


def bloom_token_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter construction over the corpus vocabulary — the
    mergeable membership sketch a 100 TB ingest uses for cross-batch
    "have we seen this token/URL?" guards (one bitmap per shard,
    OR-merged on the driver or in a reduce). Token hashing is the
    engine-portable md5-prefix arithmetic (exactly replayable in
    DuckDB), k=4 affine probes into an m=65536-bit space.

    Output is the filter's quality sheet: distinct-token count, bits
    set, fill rate and the analytic false-positive estimate
    fill_rate^k — all from exact integer counts, two mirrored
    double roundings.

    Scale: one vocabulary-grain distinct (the only corpus shuffle),
    then k codegen projections and a <=m-row distinct. The bitmap
    itself is (bit_idx) rows — collectable at m/8 = 8 KiB per shard,
    never corpus-sized."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(_tokens()).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )
    th = F.expr(
        f"pmod(cast(conv(substr(md5(tok), 1, 15), 16, 10) as bigint),"
        f" {_MERSENNE_P})"
    )
    hashed = toks.select(th.alias("h"))
    bits = hashed.select(
        F.explode(
            F.array(*[
                ((F.col("h") * F.lit(a) + F.lit(b)) % _MERSENNE_P
                 % BLOOM_M).alias(f"b{i}")
                for i, (a, b) in enumerate(BLOOM_PERMS)
            ])
        ).alias("bit_idx")
    ).distinct()
    n_tokens = toks.agg(F.count(F.lit(1)).alias("n_distinct_tokens"))
    n_bits = bits.agg(F.count(F.lit(1)).alias("bits_set"))
    fill = F.col("bits_set").cast("double") / F.lit(float(BLOOM_M))
    return n_tokens.crossJoin(n_bits).select(
        F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
        F.col("bits_set").cast("long").alias("bits_set"),
        F.round(fill, 6).alias("fill_rate"),
        F.round(F.pow(fill, F.lit(BLOOM_K)), 6).alias("est_fpr"),
    )


def tokens_zipf_fit(spark: SparkSession, sf_dir: str, top_n: int = 100) -> DataFrame:
    """Zipf-law fit over the vocabulary: OLS of ln(freq) on ln(rank)
    for the top-N tokens — the corpus-statistics dial (slope near -1
    = natural language; a flat or cliff-shaped curve flags synthetic
    or boilerplate-heavy data) used when sizing tokenizers.

    Scale: token counts are one vocabulary-grain groupBy; the top-N
    cut is TakeOrderedAndProject; the rank window and the moment sums
    run over N<=100 survivor rows. Counts are exact BIGINTs;
    ln/regression run in mirrored doubles rounded 6dp (sums of <=100
    ln-terms are far inside double's stable range)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(_tokens()).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("n"), "tok")
    ranked = counts.withColumn("rank", F.row_number().over(w)).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    stats = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / varx
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = (cov * cov) / (varx * vary)
    return stats.select(
        F.col("n").cast("long").alias("n_tokens_fit"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"),
        F.round(r2, 6).alias("r_squared"),
    )


def token_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the share of all token OCCURRENCES
    covered by the top-k most frequent tokens, k in {10, 100, 1000} —
    the tokenizer-sizing primitive (how big must a vocab be before
    OOV collapses).

    Scale: one vocabulary-grain count groupBy; the top-1000 cut is
    TakeOrderedAndProject and the cumulative window runs over those
    <=1000 survivor rows (bounded single-partition work AFTER the
    limit, per the plan-test contract); the total is a scalar
    broadcast. All counts exact BIGINT, one mirrored rounding."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens()).alias("tok")).where(
        F.col("tok") != ""
    )
    counts = (
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(1000)
    )
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    vocab_n = counts.agg(F.count(F.lit(1)).alias("vocab_n"))
    w = Window.orderBy(F.desc("n"), "tok")
    ranked = counts.withColumn("rank", F.row_number().over(w)).withColumn(
        "cum", F.sum("n").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    )
    ks = spark.createDataFrame([(10,), (100,), (1000,)], "k int")
    # a vocabulary smaller than k must still report its point (at full
    # coverage), not silently drop the row — clamp k to the vocab size
    at_k = (
        ks.crossJoin(F.broadcast(vocab_n))
        .join(ranked, F.least(F.col("k"), F.col("vocab_n")) == ranked.rank)
        .crossJoin(F.broadcast(total))
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("cum").cast("long").alias("covered_tokens"),
            F.round(
                F.col("cum").cast("double") / F.col("total").cast("double"),
                6,
            ).alias("coverage"),
        )
    )
    return at_k


# fixed counting alphabet: the letters + space of the normalized
# corpus; everything else lands in the OTHER bucket. Counting uses the
# length-difference trick (len(s) - len(replace(s, ch, ''))) — exact,
# identical in Spark and DuckDB, no split('') semantics to mirror.
ENTROPY_ALPHABET = "abcdefghijklmnopqrstuvwxyz "


def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the gibberish /
    degenerate-text gate (mono-character spam and base64 blobs sit at
    the entropy extremes; natural language clusters ~3.5-4.2 bits).

    Counts per character come from the replace-length trick over a
    fixed 27-symbol alphabet (+ OTHER remainder) — pure codegen
    projections, zero shuffles, exact integers; entropy = -Σ p·log2 p
    in mirrored doubles rounded 6dp. low_entropy flags < 2.5 bits."""
    docs = load_table(spark, sf_dir, "documents")
    norm = norm_text()
    base = docs.select("doc_id", norm.alias("s"), F.length(norm).alias("L"))
    cnt_cols = [
        (F.col("L") - F.length(F.replace(F.col("s"), F.lit(ch)))).alias(
            f"c{i}"
        )
        for i, ch in enumerate(ENTROPY_ALPHABET)
    ]
    counted = base.select("doc_id", "L", *cnt_cols).withColumn(
        "c_other",
        F.col("L") - sum(F.col(f"c{i}") for i in range(len(ENTROPY_ALPHABET))),
    )
    terms = []
    for i in range(len(ENTROPY_ALPHABET)):
        p = F.col(f"c{i}").cast("double") / F.col("L").cast("double")
        terms.append(
            F.when(F.col(f"c{i}") > 0, -p * F.log2(p)).otherwise(F.lit(0.0))
        )
    p_o = F.col("c_other").cast("double") / F.col("L").cast("double")
    terms.append(
        F.when(F.col("c_other") > 0, -p_o * F.log2(p_o)).otherwise(F.lit(0.0))
    )
    ent = sum(terms)
    return counted.where(F.col("L") > 0).select(
        "doc_id",
        F.round(ent, 6).alias("char_entropy"),
        (ent < 2.5).alias("low_entropy"),
    )


def lang_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language conditional bigram entropy H(w2|w1) in nats — the
    information-theoretic corpus-QA dial (low entropy = templated /
    boilerplate-heavy text; a sudden per-language drop after a crawl
    refresh flags duplication the LM will memorize). Reference scope:
    corpus statistics endpoints; the metric itself is the classic
    Shannon conditional entropy over the corpus bigram model.

    Scale shape: ONE bigram-keyed groupBy over the exploded token
    stream (map-side combined), then the w1-marginal and the per-lang
    total derive from the bigram counts (vocab-grain, never a second
    corpus pass); the final agg has one group per language. No UDF,
    no driver loop; shuffles are bounded by distinct (lang, bigram).

    Cross-engine exactness: each distinct bigram contributes term =
    (c2/N)·ln(c1/c2) ≥ 0, a double; terms are snapped to the 1e-12
    grid and summed as DECIMAL(38,12) — order-independent, so
    partition-order float drift cannot leak into the 6dp output (the
    repo's standard double-sum policy, SURVEY §4)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("lang", _tokens().alias("t")).where(F.size("t") >= 2)
    pairs = t.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1,"
                "  element_at(t, i + 1) AS w2))"
            )
        ).alias("b"),
    ).select("lang", "b.w1", "b.w2")
    # materialize the bigram counts ONCE: c1, n, and the final join
    # all derive from c2, and Catalyst does not reuse the (lang,w1,w2)
    # exchange across the three branches — without this the corpus is
    # scanned and the bigram stream exploded 3x (measured: the r7-r8
    # bench drift on this entry was exactly that re-compute cost).
    # c2 is vocab-grain (distinct bigrams), tiny relative to corpus.
    c2 = pairs.groupBy("lang", "w1", "w2").agg(
        F.count(F.lit(1)).alias("c2")
    ).localCheckpoint()
    c1 = c2.groupBy("lang", "w1").agg(F.sum("c2").alias("c1"))
    n = c2.groupBy("lang").agg(F.sum("c2").alias("n"))
    term = (
        F.col("c2").cast("double") / F.col("n").cast("double")
    ) * F.log(F.col("c1").cast("double") / F.col("c2").cast("double"))
    return (
        c2.join(c1, ["lang", "w1"])
        .join(F.broadcast(n), "lang")  # one row per language
        .groupBy("lang")
        .agg(
            F.max("n").cast("long").alias("n_bigrams"),
            F.count(F.lit(1)).cast("long").alias("distinct_bigrams"),
            F.round(
                F.sum(F.round(term, 12).cast("decimal(38,12)"))
                .cast("double"),
                6,
            ).alias("cond_entropy"),
        )
    )


def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the mixture-
    design dial: two crawl sources with near-identical vocabularies
    add redundancy, not diversity, so a pipeline weights them down
    (or dedups across them first). One row per unordered source pair
    sharing at least one token.

    Scale shape: DISTINCT (source, token) bounds everything by
    vocab×sources; the self-join is token-keyed, so per-token work is
    (sources containing it)² ≤ |sources|² — linear in vocabulary with
    a tiny constant, never documents². Jaccard from integer counts is
    a single exact-rounded IEEE division on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    v = docs.select(
        "source", F.explode(_tokens()).alias("w")
    ).distinct()
    nv = v.groupBy("source").agg(F.count(F.lit(1)).alias("nv"))
    a, b = v.alias("a"), v.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    na = nv.select(
        F.col("source").alias("source_a"), F.col("nv").alias("vocab_a")
    )
    nb = nv.select(
        F.col("source").alias("source_b"), F.col("nv").alias("vocab_b")
    )
    # the per-source vocab count table is |sources| rows — broadcast
    return (
        inter.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("vocab_a").cast("long").alias("vocab_a"),
            F.col("vocab_b").cast("long").alias("vocab_b"),
            F.col("common").cast("long").alias("common"),
            F.round(
                F.col("common").cast("double")
                / (
                    F.col("vocab_a") + F.col("vocab_b") - F.col("common")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def token_freq_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequency spectrum (count-of-counts) in log2 buckets:
    how many token TYPES occur between 2^k and 2^(k+1)−1 times — the
    Good-Turing smoothing input and the standard vocabulary-growth /
    crawl-health curve (a shrinking low-frequency mass between
    snapshots means the crawl is re-fetching old content).

    Scale shape: token-keyed count (map-side combined) then a ~64-
    group second agg — the classic two-level aggregation, shuffles
    bounded by vocabulary then by the bucket count. The log2 bucket
    is PURE INTEGER arithmetic (binary digit count, no float log):
    floor(log2(c)) = length(bin(c)) − 1 on both engines, so bucket
    edges can never drift cross-engine. mass_share is each bucket's
    share of all token OCCURRENCES (exact integer ratio, one IEEE
    division)."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(_tokens()).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bucketed = cnt.select(
        (F.length(F.expr("bin(c)")) - 1).cast("long").alias("log2_freq"),
        "c",
    )
    spec = bucketed.groupBy("log2_freq").agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("c").cast("long").alias("mass"),
    )
    total = spec.agg(F.sum("mass").alias("tot"))  # one row
    return (
        spec.crossJoin(F.broadcast(total))
        .select(
            "log2_freq",
            F.expr("shiftleft(1L, CAST(log2_freq AS INT))")
            .cast("long")
            .alias("freq_lo"),
            "n_types",
            "mass",
            F.round(
                F.col("mass").cast("double") / F.col("tot").cast("double"),
                6,
            ).alias("mass_share"),
        )
    )


def quality_gate_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline-health FUNNEL over the Gopher gates: one row per
    gate in application order with its marginal pass count and the
    cumulative survivor count/rate — the view that tells you WHICH
    gate bites (per-doc gate flags say who failed; the funnel says
    where the corpus goes). Stage order mirrors the pipeline:
    n_tokens → token_len → alpha_ratio → stopwords.

    Scale shape: the per-doc gate pass is text_gopher_filters' single
    scan; the funnel adds ONE global aggregate (8 sums → one row) and
    a stack() to 4 rows — nothing per-doc leaves the executors."""
    g = text_gopher_filters(spark, sf_dir)
    c1 = F.col("pass_n_tokens")
    c2 = c1 & F.col("pass_token_len")
    c3 = c2 & F.col("pass_alpha_ratio")
    c4 = c3 & F.col("pass_stopwords")

    def s(c):
        return F.sum(F.when(c, 1).otherwise(0))

    agg = g.agg(
        F.count(F.lit(1)).alias("n_docs"),
        s(F.col("pass_n_tokens")).alias("g1"),
        s(F.col("pass_token_len")).alias("g2"),
        s(F.col("pass_alpha_ratio")).alias("g3"),
        s(F.col("pass_stopwords")).alias("g4"),
        s(c1).alias("c1"), s(c2).alias("c2"),
        s(c3).alias("c3"), s(c4).alias("c4"),
    )
    return agg.select(
        F.expr(
            "stack(4,"
            " 1L, 'n_tokens', g1, c1,"
            " 2L, 'token_len', g2, c2,"
            " 3L, 'alpha_ratio', g3, c3,"
            " 4L, 'stopwords', g4, c4)"
            " AS (stage, gate, n_pass_gate, n_pass_cum)"
        ),
        "n_docs",
    ).select(
        "stage",
        "gate",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_pass_gate").cast("long").alias("n_pass_gate"),
        F.col("n_pass_cum").cast("long").alias("n_pass_cum"),
        F.round(
            F.col("n_pass_cum").cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).alias("cum_rate"),
    )


# --- round 10: HTML / markup main-text extraction ---------------------------
#
# The synthetic corpus is plain text, so (the text_pii_redact pattern)
# each doc is first wrapped in deterministic doc_id-derived markup —
# head/title/style/script, a variable-width nav, two ad divs, a body
# script, a footer — and the operator then runs the extraction a
# web-crawl pipeline runs on real pages: drop head + script blocks,
# strip known boilerplate containers, strip remaining tags, collapse
# whitespace, and gate on text density (the trafilatura/jusText-style
# keep decision). Every regex below is valid and means the same thing
# in Java regex (Spark) and RE2 (DuckDB): no lookaround, no
# backreferences; lazy quantifiers never cross a newline because the
# injected markup is single-line.
HTML_HEAD_RE = "<head>.*?</head>"
HTML_SCRIPT_RE = "<script[^>]*>.*?</script>"
HTML_NAV_RE = "<nav>.*?</nav>"
HTML_FOOTER_RE = "<footer>.*?</footer>"
HTML_AD_RE = "<div class=\"ad\">.*?</div>"
HTML_TAG_RE = "<[^>]+>"
HTML_LINK_RE = "<a [^>]*>"


def _html_wrapped() -> F.Column:
    """The deterministic markup-injection column (shared with the
    oracle SQL in queries.py — same pieces, same order)."""
    return F.concat(
        F.format_string(
            '<html><head><title>doc %d</title>'
            '<style>body{margin:%dpx}</style>'
            '<script>var id=%d;track("p%d");</script></head><body><nav>',
            F.col("doc_id"), F.col("doc_id") % 7, F.col("doc_id"),
            F.col("doc_id") % 13,
        ),
        F.repeat(
            F.lit('<a href="/c">c</a>'),
            (F.lit(1) + F.col("doc_id") % 3).cast("int"),
        ),
        F.format_string(
            '<a href="/about">about</a></nav>'
            '<div class="ad">buy now offer %d</div>'
            '<script>var t="%d";</script><article><p>',
            F.col("doc_id") % 97, F.col("doc_id") % 31,
        ),
        F.col("text"),
        F.format_string(
            '</p></article><div class="ad">subscribe %d</div>'
            '<footer>copyright 2026 site%d</footer></body></html>',
            F.col("doc_id") % 43, F.col("doc_id") % 13,
        ),
    )


# Entity decode table, applied AFTER tag-stripping (decoding first
# would turn '&lt;script&gt;' text into a fake tag the stripper eats)
# and with '&amp;' LAST (so '&amp;lt;' decodes to the literal text
# '&lt;', exactly once — the standard double-escape rule). Literal
# string replaces, identical in Spark replace() and DuckDB replace().
HTML_ENTITIES = (
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", "\""), ("&#39;", "'"), ("&amp;", "&"),
)


def _html_main(html: F.Column) -> F.Column:
    """The extraction chain (order IS the contract — see
    text_html_extract): head → scripts → nav → footer → ad containers
    → remaining tags → entity decode → whitespace collapse. Shared
    with the streaming crawl-gate monitor."""
    h = F.regexp_replace(html, HTML_HEAD_RE, " ")
    h = F.regexp_replace(h, HTML_SCRIPT_RE, " ")
    h = F.regexp_replace(h, HTML_NAV_RE, " ")
    h = F.regexp_replace(h, HTML_FOOTER_RE, " ")
    h = F.regexp_replace(h, HTML_AD_RE, " ")
    h = F.regexp_replace(h, HTML_TAG_RE, " ")
    for ent, ch in HTML_ENTITIES:
        h = F.replace(h, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(h, " +", " "))


def text_html_extract(
    spark: SparkSession, sf_dir: str,
    min_density: float = 0.4, min_text_len: int = 80,
) -> DataFrame:
    """HTML main-text extraction + boilerplate-page gate (round 10 —
    the highest-frequency LLM-pipeline operator a web-crawl corpus
    hits before any other text stage): per document, strip markup
    down to the main text and decide keep/drop by text density.

    Extraction order IS the contract (each step feeds the next, and
    the oracle replays it verbatim): (1) drop the <head> block
    (title/style/head scripts), (2) drop remaining <script> blocks,
    (3) strip <nav>, (4) <footer>, (5) <div class="ad"> boilerplate
    containers, (6) strip every remaining tag to a space, (7)
    collapse runs of spaces and trim. On the injected markup this
    provably recovers the original text byte-for-byte (pinned in
    tests), so main_md5 doubles as an end-to-end extraction check.

    The keep decision gates on ROUNDED text_density (the output
    column itself, so the gate replays identically cross-engine) and
    a minimum extracted length — short texts drown in boilerplate
    (density ~L/(L+330) here), which is exactly the page shape a real
    crawl drops.

    100 TB shape: one scan, pure regexp_replace/length/md5
    projections — JVM-side whole-stage codegen, embarrassingly
    parallel, no shuffle, no Python. Reference parity: the reference
    ships no markup extraction; this is brief-driven LLM-pipeline
    surface (SURVEY §2.3), VERDICT r9 next-round item 2."""
    docs = load_table(spark, sf_dir, "documents")
    html = _html_wrapped()
    main = _html_main(html)
    out = docs.select(
        "doc_id",
        F.length(html).cast("long").alias("html_len"),
        F.length(main).cast("long").alias("text_len"),
        F.regexp_count(html, F.lit(HTML_LINK_RE)).cast("long").alias(
            "n_links"
        ),
        F.md5(main).alias("main_md5"),
    ).withColumn(
        "text_density",
        F.round(
            F.col("text_len").cast("double") / F.col("html_len"), 6
        ),
    )
    return out.select(
        "doc_id", "html_len", "text_len", "text_density", "n_links",
        "main_md5",
        (
            (F.col("text_density") >= F.lit(float(min_density)))
            & (F.col("text_len") >= F.lit(int(min_text_len)))
        ).alias("keep"),
    )


# --- round 10: URL filtering (the stage-0 crawl gate) ------------------------
#
# The corpus carries no URLs, so (the markup-injection pattern above)
# each doc mints a deterministic doc_id-derived URL first; the
# operator then applies the UT1-blocklist-style rules a crawl
# pipeline runs before it even fetches: domain blocklist, URL-keyword
# rules, and tracking-parameter normalization.
URL_DOMAINS = (
    "news.example.com", "blog.example.org", "ads.tracker.net",
    "docs.example.com", "spam.casino.bet", "shop.example.com",
    "adult.bad.site", "forum.example.org",
)
URL_BLOCKED_DOMAINS = ("ads.tracker.net", "spam.casino.bet", "adult.bad.site")
URL_KEYWORD_RE = "casino|lottery|xxx"
URL_QUERY_RE = "[?].*"


def _url_cols() -> tuple[F.Column, F.Column, F.Column, F.Column]:
    """(domain, url, url_norm, block_reason) column builders over a
    doc_id column — shared by text_url_filter and the streaming
    crawl-gate monitor."""
    domain = F.element_at(
        F.array(*[F.lit(d) for d in URL_DOMAINS]),
        (F.col("doc_id") % len(URL_DOMAINS) + 1).cast("int"),
    )
    url = F.concat(
        F.lit("https://"), domain,
        F.format_string("/page%d", F.col("doc_id") % 1000),
        F.when(F.col("doc_id") % 11 == 0, F.lit("/casino-bonus"))
        .otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.format_string("?utm_source=feed&ref=%d", F.col("doc_id") % 17),
        ).otherwise(F.lit("")),
    )
    url_norm = F.regexp_replace(url, URL_QUERY_RE, "")
    reason = (
        F.when(domain.isin(*URL_BLOCKED_DOMAINS), F.lit("domain"))
        .when(url_norm.rlike(URL_KEYWORD_RE), F.lit("keyword"))
        .otherwise(F.lit("none"))
    )
    return domain, url, url_norm, reason


def text_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL filtering — the first gate of a crawl curation pipeline
    (UT1 blocklist / RefinedWeb §3.1 shape): per document, a
    deterministic synthetic URL (domain from an 8-way doc_id ring —
    3 of the 8 blocklisted; a /casino-bonus path segment on the
    doc_id%11 ring; tracking params on the doc_id%5 ring), then:

    1. `url_norm`: strip the query string (tracking params never
       reach the dedup key — two fetches of the same page with
       different utm_source are the same page);
    2. `block_reason`: 'domain' if the host is blocklisted (checked
       FIRST — cheapest rule, and a blocked host is blocked whatever
       the path says), else 'keyword' if the normalized URL matches
       the keyword rule, else 'none';
    3. `keep` = no rule fired.

    100 TB shape: pure string/regex projections over the id column —
    codegen, zero shuffle; the blocklist is a literal IN (at real
    scale: a broadcast join against the UT1 domain table, same
    plan class as the DQ-reference joins). Exact DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    domain, url, url_norm, reason = _url_cols()
    return docs.select(
        "doc_id",
        url.alias("url"),
        domain.alias("domain"),
        url_norm.alias("url_norm"),
        reason.alias("block_reason"),
        (reason == "none").alias("keep"),
    )


def corpus_report(
    spark: SparkSession, sf_dir: str, quality_threshold: float = 0.5,
    keep: DataFrame | None = None,
) -> DataFrame:
    """Per-source corpus DATA CARD — the one-call datasheet rollup a
    dataset release ships (Datasheets for Datasets, Gebru et al.
    2021; Dolma/FineWeb dataset reports): per source, the volume
    (docs, token mass, mean doc length), language mix (distinct
    langs + modal lang with a deterministic count-desc/lang-asc
    tiebreak), exact-duplicate rate (1 - distinct md5 fingerprints /
    docs — the dedup_exact signal at report grain), and the
    quality-gate pass rate (text_quality_score composite >=
    `quality_threshold`).

    Composes two already-oracled operators (text_quality_score, the
    dedup_exact fingerprint) rather than restating their formulas;
    the DuckDB oracle chains the same SQL bodies (the funnel-builder
    pattern, queries.py).

    `keep` restricts the report to a doc_id keep-set (id-grain
    semi-join before any aggregate) — the post-curation data card a
    release ships for the SURVIVING corpus (pipeline_curated_report
    composes this with curate().keep); a source whose docs were all
    dropped disappears from the report.

    100 TB shape: everything rides ONE documents scan — per-doc
    signals are narrow projections, then two linear source-grain
    aggregates (sources are few: the modal-lang window partitions by
    source over a lang-count rollup that is |sources|×|langs| rows,
    driver-small however big the corpus)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    q = text_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    base = docs.select(
        "source", "lang", "doc_id",
        F.size(_tokens()).alias("n_toks"),
        F.md5(norm_text()).alias("fp"),
    ).join(q, "doc_id")
    if keep is not None:
        base = base.join(keep.select("doc_id"), "doc_id", "left_semi")
    agg = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("fp").alias("n_fp"),
        F.sum(
            (F.col("quality_score") >= quality_threshold).cast("long")
        ).alias("nq"),
    )
    lm = base.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("lang"))
    top = (
        lm.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return agg.join(top, "source").select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        "total_tokens",
        F.round(
            F.col("total_tokens").cast("double") / F.col("n_docs"), 6
        ).alias("avg_doc_tokens"),
        F.col("n_langs").cast("long").alias("n_langs"),
        "top_lang",
        F.round(
            F.lit(1.0) - F.col("n_fp").cast("double") / F.col("n_docs"), 6
        ).alias("dup_rate"),
        F.round(
            F.col("nq").cast("double") / F.col("n_docs"), 6
        ).alias("quality_pass_rate"),
    )


MIX_PPM_SCALE = 1_000_000


def mixture_token_plan(
    spark: SparkSession, sf_dir: str,
    weights_ppm: dict[str, int] | None = None,
    budget_ppm: int = 500_000,
) -> DataFrame:
    """Token-budget mixture PLAN across sources (the Pile/DoReMi-style
    planning step a training run does before sampling): given target
    mixture weights and a token budget (budget_ppm of the total
    corpus token mass), allocate tokens per source by a two-round
    waterfall — round 1 gives each source floor(weight * budget)
    capped at its available mass; round 2 redistributes the leftover
    across the sources that still have capacity, proportional to
    their weights. Remaining un-allocated budget (only when nearly
    everything is exhausted) is visible as budget_share summing
    below 1.

    Weights are integer PARTS-PER-MILLION (default: uniform
    1e6 // n_sources) and every allocation step is integer
    arithmetic (floor division) — bit-identical cross-engine, no
    float thresholds anywhere; the two ratio columns are 6-decimal
    presentation only. Products use the split form
    floor(x*p/q) = (x DIV q)*p + ((x%q)*p) DIV q (exactly equal for
    integers), so nothing overflows int64 for ANY int64 token mass
    (p <= q <= 1e6 throughout). Exact DuckDB oracle in queries.py.

    100 TB shape: one documents scan to source-grain token masses
    (linear, map-side combine); everything after is arithmetic over
    |sources| rows with two broadcast scalars."""
    docs = load_table(spark, sf_dir, "documents")
    avail = docs.groupBy("source").agg(
        F.sum(F.size(_tokens())).cast("long").alias("avail")
    )
    n_src = avail.agg(F.count(F.lit(1)).alias("n"))
    total = avail.agg(F.sum("avail").cast("long").alias("total"))
    base = avail.crossJoin(F.broadcast(n_src)).crossJoin(F.broadcast(total))
    if weights_ppm is None:
        w = F.expr(f"CAST({MIX_PPM_SCALE} DIV n AS BIGINT)")
    else:
        # validate eagerly where possible (sum/positivity are pure
        # Python); a source MISSING from the dict would otherwise
        # flow through as NULL allocations, and weights summing over
        # the scale would make round 2 redistribute a NEGATIVE
        # leftover — both fail loudly instead
        if any(int(p) <= 0 for p in weights_ppm.values()):
            raise ValueError(
                "mixture_token_plan: weights_ppm must be positive"
            )
        if sum(int(p) for p in weights_ppm.values()) > MIX_PPM_SCALE:
            raise ValueError(
                "mixture_token_plan: weights_ppm sum exceeds"
                f" {MIX_PPM_SCALE} (parts-per-million)"
            )
        pairs = [
            x for s, p in sorted(weights_ppm.items()) for x in (s, int(p))
        ]
        lookup = F.element_at(
            F.create_map(*[F.lit(v) for v in pairs]), F.col("source")
        ).cast("bigint")
        w = F.when(
            lookup.isNull(),
            F.raise_error(F.concat(
                F.lit("mixture_token_plan: source missing from"
                      " weights_ppm: "), F.col("source")
            )),
        ).otherwise(lookup)
    r1 = base.select(
        "source", "avail", "total",
        w.alias("w_ppm"),
        F.expr(
            f"CAST(total DIV {MIX_PPM_SCALE} * {budget_ppm}"
            f" + (total % {MIX_PPM_SCALE}) * {budget_ppm}"
            f" DIV {MIX_PPM_SCALE} AS BIGINT)"
        ).alias("budget"),
    ).select(
        "source", "avail", "w_ppm", "budget",
        F.least(
            F.col("avail"),
            F.expr(
                f"CAST(budget DIV {MIX_PPM_SCALE} * w_ppm"
                f" + (budget % {MIX_PPM_SCALE}) * w_ppm"
                f" DIV {MIX_PPM_SCALE} AS BIGINT)"
            ),
        ).alias("a1"),
    )
    # leftover + capacity-weighted round 2 (both scalar aggregates
    # broadcast back; rows stay |sources|-sized)
    agg2 = r1.agg(
        F.sum("a1").cast("long").alias("used"),
        F.sum(
            F.when(F.col("avail") > F.col("a1"), F.col("w_ppm"))
            .otherwise(F.lit(0))
        ).cast("long").alias("wcap"),
    )
    out = (
        r1.crossJoin(F.broadcast(agg2))
        .select(
            "source", "avail", "w_ppm", "budget", "a1",
            F.when(
                (F.col("avail") > F.col("a1")) & (F.col("wcap") > 0),
                F.least(
                    F.col("avail") - F.col("a1"),
                    F.expr(
                        "CAST((budget - used) DIV wcap * w_ppm"
                        " + ((budget - used) % wcap) * w_ppm"
                        " DIV wcap AS BIGINT)"
                    ),
                ),
            ).otherwise(F.lit(0)).alias("a2"),
        )
    )
    return out.select(
        "source",
        F.col("w_ppm").alias("weight_ppm"),
        F.col("avail").alias("available_tokens"),
        (F.col("a1") + F.col("a2")).cast("long").alias("allocated_tokens"),
        F.round(
            (F.col("a1") + F.col("a2")).cast("double") / F.col("avail"), 6
        ).alias("fill_rate"),
        F.round(
            (F.col("a1") + F.col("a2")).cast("double") / F.col("budget"), 6
        ).alias("budget_share"),
        (F.col("a1") + F.col("a2") >= F.col("avail")).alias("exhausted"),
    )


def mixture_sample_keepset(
    spark: SparkSession, sf_dir: str,
    weights_ppm: dict[str, int] | None = None,
    budget_ppm: int = 500_000,
) -> DataFrame:
    """MATERIALIZE the mixture plan (round 10b): per source, take
    documents in deterministic md5(doc_id) order until the
    cumulative token count reaches the source's allocated_tokens
    from mixture_token_plan — the sampling pass that turns the plan
    into an actual training keep-set. A doc is kept iff its
    cumulative sum (inclusive) fits the allocation, so per-source
    kept tokens never exceed the plan and the first excluded doc is
    exactly the one that would overflow it.

    Deterministic: the md5-rank order (tiebreak doc_id) and exact
    integer cumulative sums replicate cross-engine. Scale shape
    (round 11 closed the documented per-source-window deferral): ONE
    global frozen-bin prefix sum (scale.global_ordered_prefix) in
    (source, md5, doc_id) order, minus each source's preceding-source
    offset — the offset frame is SOURCE-grain (bounded: one row per
    source), so its tiny cumulative window never sees doc-grain data,
    and no partition anywhere holds a whole source. Exact DuckDB
    oracle (per-source window semantics are identical by
    construction: global prefix − preceding-source totals)."""
    from pyspark.sql import Window

    from flapi_spark.operators.scale import global_ordered_prefix

    docs = load_table(spark, sf_dir, "documents")
    plan = mixture_token_plan(
        spark, sf_dir, weights_ppm=weights_ppm, budget_ppm=budget_ppm
    ).select("source", "allocated_tokens")
    # materialize the tokenized frame ONCE — the prefix machinery's
    # four passes AND the per-source offset rollup read the same
    # blocks (doc-grain but narrow, behind the tokenizer)
    toks = docs.select(
        "doc_id",
        "source",
        F.size(_tokens()).cast("long").alias("n_toks"),
        F.md5(F.col("doc_id").cast("string")).alias("__h"),
    ).localCheckpoint(eager=True)
    pre = global_ordered_prefix(
        toks, ["source", "__h", "doc_id"], rank_col="__r",
        sum_col="n_toks", prefix_col="__gcum",
    )
    # preceding-source token offsets: source-grain, bounded rows —
    # the only ordered window here runs over one row per source
    wsrc = Window.orderBy("source").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        toks.groupBy("source")
        .agg(F.sum("n_toks").alias("__tot"))
        .select(
            "source",
            F.coalesce(F.sum("__tot").over(wsrc), F.lit(0)).alias("__off"),
        )
    )
    return (
        pre.join(F.broadcast(offs), "source")
        .withColumn(
            "cum_tokens", (F.col("__gcum") - F.col("__off")).cast("long")
        )
        .join(plan, "source")
        .select(
            "doc_id",
            "source",
            "n_toks",
            "cum_tokens",
            (F.col("cum_tokens") <= F.col("allocated_tokens")).alias("keep"),
        )
    )


def text_chunk_windows(
    spark: SparkSession, sf_dir: str, size: int = 32, stride: int = 24
) -> DataFrame:
    """Overlapping token-window chunking — the RAG/long-context
    splitting pass (LangChain/LlamaIndex recursive splitters, the
    retrieval-side twin of the training-side `pack_sequences`): each
    document emits windows of `size` tokens every `stride` tokens
    (overlap = size − stride) with full provenance (start offset,
    window length, chunk ordinal, doc token count) so downstream
    embedding/indexing stages can map hits back to character-exact
    document regions.

    Pure codegen projections: tokenize once, explode a
    sequence(0, n−1, stride) of starts, slice the token array per
    start — zero shuffles, linear in corpus tokens, embarrassingly
    parallel at 100 TB. Window starts stay < n so every token is
    covered and trailing windows shorten rather than pad. Exact
    DuckDB oracle replays tokenization, starts and slices."""
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")
    if stride > size:
        # gaps: tokens at positions [start+size, start+stride) of every
        # block would never appear in any chunk — breaks the coverage
        # guarantee above (round-10c review)
        raise ValueError(
            f"stride ({stride}) > size ({size}) leaves token gaps"
        )
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", _tokens().alias("t")).select(
        "doc_id", "t", F.size("t").alias("n_toks")
    )
    starts = t.select(
        "doc_id", "t", "n_toks",
        F.posexplode(
            F.sequence(
                F.lit(0), F.col("n_toks") - 1, F.lit(stride)
            )
        ).alias("chunk_id", "start_tok"),
    )
    chunk = F.slice("t", F.col("start_tok") + 1, F.lit(size))
    return starts.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_chunk_toks"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.col("n_toks").cast("long").alias("n_toks"),
    )


def curriculum_order(
    spark: SparkSession, sf_dir: str, n_buckets: int = 5
) -> DataFrame:
    """Curriculum training order (Bengio et al. ICML'09 as data
    pipelines apply it — easy→hard schedule with in-bucket shuffling):
    rank documents by the heuristic quality score (high = clean =
    'easy' first), cut the ranking into `n_buckets` equal difficulty
    buckets, shuffle WITHIN each bucket by the portable md5 key (the
    mixture/shard discipline), and emit each document's global
    training position.

    Both global orderings run through scale.global_rank (frozen-bin
    distributed ranking — never a single-task window); the bucket cut
    is exact integer arithmetic ((rank−1)·n_buckets DIV n). Output:
    (doc_id, quality_rank, bucket, position); exact DuckDB oracle
    replays score, ranking, cut and shuffle."""
    from flapi_spark.operators.scale import global_rank

    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # materialize the scored frame ONCE — the full quality-score chain
    # runs a single time; the count agg and the first rank's four
    # frozen-bin passes all read the same blocks
    q = text_quality_score(spark, sf_dir).select(
        "doc_id",
        (-F.col("quality_score")).alias("neg_score"),
    ).localCheckpoint(eager=True)
    ranked = global_rank(q, ["neg_score", "doc_id"], rank_col="quality_rank")
    n = q.agg(F.count(F.lit(1)).alias("n"))
    b = (
        ranked.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "quality_rank",
            F.expr(
                f"CAST(((quality_rank - 1) * {n_buckets}) DIV n AS LONG)"
            ).alias("bucket"),
            F.md5(F.col("doc_id").cast("string")).alias("__shuffle"),
        )
    )
    pos = global_rank(
        b, ["bucket", "__shuffle", "doc_id"], rank_col="position",
        checkpoint_input=True,  # first rank's machinery runs once
    )
    return pos.select(
        "doc_id",
        F.col("quality_rank").cast("long").alias("quality_rank"),
        "bucket",
        F.col("position").cast("long").alias("position"),
    )


def source_token_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL divergence to the corpus distribution —
    the mixture-drift dial: D_KL(P_source ‖ P_corpus) over the shared
    vocabulary says how far each source's token distribution sits from
    the blend the model will actually train on (0 = identical; a
    source spiking after a crawl refresh flags a content shift the
    per-source data card's counts can't see). Companion to
    source_vocab_overlap (set-grain) and psi_order_value_drift
    (numeric-grain); reference scope: corpus statistics endpoints.

    Both distributions are add-one smoothed over the corpus vocabulary
    (p = (c_s + 1)/(len_s + V), q = (c + 1)/(N + V)), so tokens a
    source never emits still contribute their mass and the divergence
    is finite term-by-term.

    Scale shape: one (source, tok) groupBy over the exploded stream
    (map-side combined) — everything after is VOCAB-grain: corpus
    counts, lengths, and the sources × vocab grid (|sources| is tiny,
    so the grid is a broadcast fan-out of the vocab, never a second
    corpus pass). Cross-engine exactness: every term is arithmetic on
    identical integers (one ln, two divisions — identical IEEE
    doubles), snapped to the 1e-12 grid and summed as DECIMAL(38,12)
    (order-independent; the repo's standard double-sum policy)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(_tokens()).alias("tok"))
    sc = (
        toks.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c_s"))
        .localCheckpoint()  # reused 3x (corpus counts, lens, grid)
    )
    cc = sc.groupBy("tok").agg(F.sum("c_s").alias("c"))
    lens = sc.groupBy("source").agg(F.sum("c_s").alias("len_s"))
    tot = cc.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    )
    grid = (
        cc.crossJoin(F.broadcast(lens))
        .join(sc, ["source", "tok"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source", "len_s", "v",
            (
                (F.coalesce("c_s", F.lit(0)) + F.lit(1)).cast("double")
                / (F.col("len_s") + F.col("v")).cast("double")
            ).alias("p"),
            (
                (F.col("c") + F.lit(1)).cast("double")
                / (F.col("n") + F.col("v")).cast("double")
            ).alias("q"),
        )
    )
    term = F.col("p") * F.log(F.col("p") / F.col("q"))
    return grid.groupBy("source").agg(
        F.max("len_s").cast("long").alias("n_tokens"),
        F.max("v").cast("long").alias("vocab_size"),
        F.round(
            F.sum(F.round(term, 12).cast("decimal(38,12)")).cast("double"),
            6,
        ).alias("kl_to_corpus"),
    )


def text_unicode_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode/encoding sanitation — the crawl-cleaning pass that runs
    before any tokenizer sees the bytes: strip C0/DEL control
    characters, drop U+FFFD replacement characters (the tombstones a
    lossy charset transcode leaves behind), collapse whitespace, and
    report how much damage each document carried (an ftfy-style
    triage signal: a high replacement-char count means the upstream
    fetch mis-decoded the page and the doc should be re-fetched or
    gated).

    The synthetic corpus is clean ASCII, so — the text_pii_redact
    injection pattern — each doc_id % 7 == 3 row first gets a
    deterministic doc_id-derived damage prefix (1-3 U+FFFD
    tombstones bracketed by two C0 control bytes); the operator then
    has real damage to find and the DuckDB oracle (same injection,
    same regex/replace chain) verifies counts and the md5 of the
    cleaned text exactly.

    100 TB shape: pure codegen projections (regexp_replace / replace
    / length), embarrassingly parallel, zero shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    tomb = "\ufffd"
    damaged = F.when(
        F.col("doc_id") % 7 == 3,
        F.concat(
            F.expr("char(1)"),
            F.expr(
                "repeat('" + tomb + "', CAST(doc_id % 3 + 1 AS INT))"
            ),
            F.expr("char(2)"),
            F.lit(" broken "),
            F.col("text"),
        ),
    ).otherwise(F.col("text"))
    no_ctrl = F.regexp_replace(
        damaged, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""
    )
    no_repl = F.regexp_replace(no_ctrl, tomb, "")
    clean = F.trim(F.regexp_replace(no_repl, "\\s+", " "))
    return docs.select(
        "doc_id",
        (F.length(damaged) - F.length(no_ctrl)).cast("long")
        .alias("n_ctrl_removed"),
        (F.length(no_ctrl) - F.length(no_repl)).cast("long")
        .alias("n_replacement_chars"),
        F.length(clean).cast("long").alias("n_chars_clean"),
        F.md5(clean).alias("clean_md5"),
    )


# reputation floor: a source must pass the Gopher gates on at least
# this percentage of its documents for its remaining docs to be
# trusted — integer percent so the verdict compares exact integers
SOURCE_REPUTATION_PCT = 70


def source_reputation(
    spark: SparkSession, sf_dir: str, min_pass_pct: int = SOURCE_REPUTATION_PCT
) -> DataFrame:
    """Per-source reputation card: Gopher-gate pass rate aggregated
    to the SOURCE (domain) grain, with the reputable verdict at
    `min_pass_pct` — the RefinedWeb/C4 two-level insight that
    document quality is correlated WITHIN a domain, so a domain whose
    sample fails the heuristic gates en masse should lose its
    remaining documents too (cheaper and higher-recall than scoring
    each doc in isolation; Penedo et al. 2023 §3.1 do this with URL
    blocklists + host-grain rules).

    Output: (source, n_docs, n_pass, pass_rate, reputable). The
    verdict compares exact integers (n_pass*100 >= pct*n_docs) —
    no float threshold hazard; pass_rate is reporting only.

    Scale shape: the doc-grain gate verdicts reduce map-side into
    one tiny (source) aggregate — one shuffle at domain cardinality
    (~millions of hosts at crawl scale, trivially partitionable);
    the expensive part is the gate scan the quality stage already
    pays. Exact DuckDB oracle chains the gopher SQL."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    gates = text_gopher_filters(spark, sf_dir).select("doc_id", "keep")
    per_src = docs.join(gates, "doc_id").groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long")
        .alias("n_pass"),
    )
    return per_src.select(
        "source",
        "n_docs",
        "n_pass",
        F.round(F.col("n_pass").cast("double") / F.col("n_docs"), 6)
        .alias("pass_rate"),
        (F.col("n_pass") * 100 >= F.lit(int(min_pass_pct)) * F.col("n_docs"))
        .alias("reputable"),
    )


# license / usage-rights markers (round 10e). The regexes are the
# detection contract, shared verbatim with the DuckDB oracle; the
# synthetic corpus carries no rights language, so the registry entry
# injects deterministic doc_id-derived markers first (the
# text_pii_redact pattern) and the operator has real matches to find.
LICENSE_RESTRICTIVE_RE = (
    "(all rights reserved|copyright [0-9]{4}"
    "|\\(c\\) [0-9]{4}|proprietary and confidential)"
)
LICENSE_PERMISSIVE_RE = (
    "(creative commons|cc-by|public domain"
    "|mit license|apache license)"
)


def text_license_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Usage-rights detection: classify each document's license
    language as restrictive / permissive / none and gate on it — the
    compliance filter every responsibly-sourced crawl corpus runs
    (The Stack's license allow-list, C4's terms-of-use removal; the
    reference serves curated licensed tables, so this surface is
    brief-driven LLM-pipeline scope, not reference parity).

    Injection classes (deterministic, oracle-replayable): doc_id%13
    in {0,3} gets a restrictive notice, {7,11} a permissive license
    line, everything else stays unmarked. Precedence: any restrictive
    marker dominates (a file that says both 'MIT license' and 'all
    rights reserved' is a rights conflict — treat as restricted).

    Output: (doc_id, n_restrictive, n_permissive, license_class,
    keep) with keep = class <> 'restrictive'.

    100 TB shape: pure regexp_count projections over one scan —
    JVM codegen, no shuffle, embarrassingly parallel; the gate
    composes with curate() as the `license_gate` stage."""
    docs = load_table(spark, sf_dir, "documents")
    marked = (
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(
                F.col("text"),
                F.lit(" copyright 2021 example corp"
                      " proprietary and confidential"),
            ),
        )
        .when(
            F.col("doc_id") % 13 == 3,
            F.concat(
                F.col("text"),
                F.lit(" (c) 2023 acme holdings all rights reserved"),
            ),
        )
        .when(
            F.col("doc_id") % 13 == 7,
            F.concat(F.col("text"), F.lit(" released under the mit license")),
        )
        .when(
            F.col("doc_id") % 13 == 11,
            F.concat(
                F.col("text"),
                F.lit(" licensed under creative commons cc-by 4.0"),
            ),
        )
        .otherwise(F.col("text"))
    )
    n_r = F.regexp_count(marked, F.lit(LICENSE_RESTRICTIVE_RE)).cast("long")
    n_p = F.regexp_count(marked, F.lit(LICENSE_PERMISSIVE_RE)).cast("long")
    cls = (
        F.when(n_r > 0, F.lit("restrictive"))
        .when(n_p > 0, F.lit("permissive"))
        .otherwise(F.lit("none"))
    )
    return docs.select(
        "doc_id",
        n_r.alias("n_restrictive"),
        n_p.alias("n_permissive"),
        cls.alias("license_class"),
        (cls != F.lit("restrictive")).alias("keep"),
    )


def keyword_textrank(
    spark: SparkSession, sf_dir: str, topk: int = 20
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): corpus
    keywords ranked by PageRank centrality over the word
    co-occurrence graph — nodes are content words (length ≥ 3,
    alphabetic, non-stopword: the POS filter re-expressed as a
    deterministic surface filter), edges connect words adjacent in
    the FILTERED sequence (the classic window-2 co-occurrence).
    The iteration is the shared fixed-point integer PageRank
    (operators/graph.pagerank_fixed_point) over 60-bit portable md5
    token ids, so the chained-CTE DuckDB oracle replays it
    bit-for-bit; the top-k cut is a deterministic
    (pr desc, token asc) total order.

    Scale shape: edge building is one explode + distinct (linear in
    corpus tokens); each PageRank round is one join + one groupBy on
    the token graph — vocabulary-sized, orders of magnitude smaller
    than the corpus. Top-k is orderBy+limit (TakeOrderedAndProject),
    never a global window; rank re-derives over the k survivors."""
    from pyspark.sql import Window

    from flapi_spark.operators.graph import pagerank_fixed_point

    docs = load_table(spark, sf_dir, "documents")
    content = F.filter(
        _tokens(),
        lambda x: (F.length(x) >= 3)
        & x.rlike("^[a-z]+$")
        & ~x.isin(*STOPWORDS),
    )
    # spread the single-split scan before the per-edge md5 hashing
    # (see session.spread — no-op when the scan already has >= cores
    # splits); doc_id rides along only as the spread key
    ft = spread(
        docs.select("doc_id", content.alias("t")), sf_dir=sf_dir
    ).select("t")
    adj = (
        ft.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), i ->"
                    " named_struct('a', try_element_at(t, i),"
                    " 'b', try_element_at(t, i + 1)))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .where(F.col("a") != F.col("b"))
    )
    # 60-bit portable md5 token id (no modulus: collision chance is
    # negligible at vocabulary scale and any collision would be
    # deterministic AND mirrored in the oracle)
    ha = F.expr("cast(conv(substr(md5(a), 1, 15), 16, 10) as bigint)")
    hb = F.expr("cast(conv(substr(md5(b), 1, 15), 16, 10) as bigint)")
    pairs = adj.select(
        F.least(ha, hb).alias("doc_a"), F.greatest(ha, hb).alias("doc_b")
    ).distinct()
    pr = pagerank_fixed_point(pairs)
    tokmap = (
        ft.select(F.explode("t").alias("tok"))
        .distinct()
        .select(
            F.expr(
                "cast(conv(substr(md5(tok), 1, 15), 16, 10) as bigint)"
            ).alias("h"),
            "tok",
        )
        .groupBy("h")
        .agg(F.min("tok").alias("token"))
    )
    top = (
        pr.join(tokmap, pr.doc_id == tokmap.h)
        .select("token", "pr_scaled")
        .orderBy(F.desc("pr_scaled"), F.asc("token"))
        .limit(topk)
    )
    w = Window.orderBy(F.desc("pr_scaled"), F.asc("token"))
    return top.select(
        "token",
        "pr_scaled",
        F.row_number().over(w).cast("long").alias("rank"),
    )
