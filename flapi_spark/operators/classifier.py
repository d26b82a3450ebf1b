"""Linear quality classifiers over hashed token features (round 10).

Every production LLM-data pipeline gates documents with a cheap
linear text classifier: GPT-3's WebText-vs-CommonCrawl logistic
regression (Brown et al. 2020, Appendix A), CCNet's fastText filter
(Wenzek et al. 2020), FineWeb-Edu's linear scorer. The reference
(flAPI) serves the FEATURES for such models through SQL endpoints
but has no classifier itself — this module is brief-driven
LLM-pipeline surface (SURVEY §2.3), two Spark-first forms:

- `quality_classifier_score` / `quality_classifier_eval`: a
  Naive-Bayes log-odds linear model over engine-portable hashed
  unigram buckets. "Training" is closed-form (two tiny bucket-grain
  aggregates, broadcast back), so scoring AND the learned weights
  are exactly SQL-expressible — both entries carry exact DuckDB
  oracles. This is the production-cheap gate shape: one scan, one
  broadcast join, per-doc sorted-fold sum.
- `quality_classifier_train`: full-batch logistic-regression
  gradient descent, distributed: features live as a (doc, bucket)
  tf table computed once and cached; each iteration is one doc-grain
  fold (margins) + one bucket-grain fold (gradient); the B+1-float
  weight vector is the only thing the driver ever collects (bounded
  scalar collect, the BPE-argmax pattern). Iterative float training
  is not SQL-expressible → rows-only entry, pinned by a pure-Python
  golden twin that replays the same sorted-fold arithmetic
  (tests/test_classifier.py).

Determinism discipline (the DSIR/holt idiom, operators/text.py:592):
the token→bucket hash is the engine-portable md5-prefix fold; NB
probability ratios are exact integer products (< 2^53 up to ~2^22
tokens per bucket per class — beyond that, split the ln) before a
single ln(); every float sum runs over a sort_array'd list so the
result is independent of partitioning; final outputs round to 6
decimals.

Scale shape: bucket stats are two aggregates over B rows broadcast
back — the scan is one pass however large the corpus; LR training
adds 2 linear shuffles per iteration over a cached tf table whose
size is ≤ corpus tokens. Positive class = lang == target_lang (the
target-domain classifier, same target DSIR resamples toward, so the
two compose: DSIR picks the target, the classifier gates toward it).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flapi_spark.operators.text import _tokens
from flapi_spark.session import load_table, spread

# NB gate bucket count. Production would use 2^18+; 256 keeps the
# sf0.01 oracle cheap while exercising real collisions (vocab ≈ 200).
NB_BUCKETS = 256

# LR training bucket count — small enough that the per-iteration
# weight map stays a compact column literal and the golden twin is
# quick; the plan shape is bucket-count-independent.
LR_BUCKETS = 64

# gradient quantum: per-term gradients fold as exact integers of 1e-12
# resolution (round half-away-from-zero, Spark BigDecimal HALF_UP), so
# the per-bucket gradient is a plain order-independent distributed SUM —
# the same discipline as similarity.KMEANS_QUANT
LR_QUANT = 10**12


def _bucket(col, n_buckets: int) -> F.Column:
    """Engine-portable token→bucket hash: fold the first 15 hex chars
    of md5 into a bigint, mod n_buckets (same fold as the portable
    MinHash / DSIR — replicates anywhere md5 exists)."""
    return F.expr(
        f"pmod(cast(conv(substr(md5({col}), 1, 15), 16, 10) as bigint),"
        f" {n_buckets})"
    )


def _doc_token_buckets(
    docs: DataFrame, n_buckets: int, sf_dir: str | None = None
) -> DataFrame:
    """(doc_id, lang, tok, bucket) token stream — the shared input of
    the bucket stats, the scorer, and the persisted-model build.

    `sf_dir` is accepted for signature stability; a spread() exchange
    here measured SLOWER at sf0.1 TWICE: round 11 with the pipelined
    consumers (score 2.45 s -> 3.55 s), and round 12 again after the
    single-hash grouped checkpoint landed (interleaved in-process
    pairs: 2.23 s unspread vs 2.48 s spread) — shuffling the raw
    token arrays costs more than hashing them on the scan's single
    split at this corpus size, even with a materialization behind
    it. Unlike the LR trainer's build (see _lr_features), which
    feeds a persisted two-shuffle chain."""
    del sf_dir  # measured: exchange not worth it on this path (2x)
    return docs.select(
        "doc_id", "lang", F.explode(_tokens()).alias("tok")
    ).withColumn("bucket", _bucket("tok", n_buckets))


def _nb_bucket_stats(
    toks: DataFrame, target_lang: str, n_buckets: int
) -> DataFrame:
    """(bucket, lw) NB log-odds weights from a (lang, bucket) token
    stream: w[b] = ln( P(b|pos) / P(b|neg) ), add-1 smoothed, formed
    from exact integer products before the single ln(). Two tiny
    bucket-grain aggregates — this IS the model build."""
    pos = toks.where(F.col("lang") == target_lang)
    neg = toks.where(F.col("lang") != target_lang)
    cp = pos.groupBy("bucket").agg(F.count(F.lit(1)).alias("cp"))
    cn = neg.groupBy("bucket").agg(F.count(F.lit(1)).alias("cn"))
    np_ = pos.agg(F.count(F.lit(1)).alias("n_p"))
    nn = neg.agg(F.count(F.lit(1)).alias("n_n"))
    return (
        cp.join(cn, "bucket", "full")
        .na.fill({"cp": 0, "cn": 0})
        .crossJoin(F.broadcast(np_))
        .crossJoin(F.broadcast(nn))
        .select(
            "bucket",
            F.log(
                ((F.col("cp") + 1) * (F.col("n_n") + F.lit(n_buckets)))
                .cast("double")
                / ((F.col("cn") + 1) * (F.col("n_p") + F.lit(n_buckets)))
                .cast("double")
            ).alias("lw"),
        )
    )


def _nb_bucket_stats_grouped(
    grouped: DataFrame, target_lang: str, n_buckets: int
) -> DataFrame:
    """_nb_bucket_stats over the collapsed (doc_id, lang, bucket, tf)
    frame: per-bucket/class counts are SUM(tf) instead of COUNT(*)
    over occurrence rows — the identical integers, one shared hashing
    pass (see _nb_scored). Same add-1-smoothed single-ln arithmetic."""
    pos = grouped.where(F.col("lang") == target_lang)
    neg = grouped.where(F.col("lang") != target_lang)
    cp = pos.groupBy("bucket").agg(F.sum("tf").alias("cp"))
    cn = neg.groupBy("bucket").agg(F.sum("tf").alias("cn"))
    np_ = pos.agg(F.coalesce(F.sum("tf"), F.lit(0)).alias("n_p"))
    nn = neg.agg(F.coalesce(F.sum("tf"), F.lit(0)).alias("n_n"))
    return (
        cp.join(cn, "bucket", "full")
        .na.fill({"cp": 0, "cn": 0})
        .crossJoin(F.broadcast(np_))
        .crossJoin(F.broadcast(nn))
        .select(
            "bucket",
            F.log(
                ((F.col("cp") + 1) * (F.col("n_n") + F.lit(n_buckets)))
                .cast("double")
                / ((F.col("cn") + 1) * (F.col("n_p") + F.lit(n_buckets)))
                .cast("double")
            ).alias("lw"),
        )
    )


def _nb_scored(
    spark: SparkSession, sf_dir: str, target_lang: str, n_buckets: int,
    keep_frac: float = 0.5,
    toks: DataFrame | None = None, stats: DataFrame | None = None,
) -> DataFrame:
    """Per-doc NB log-odds score + label — shared by the score and
    eval entries. Columns: doc_id, n_tokens, score, pred, label, keep.

    Two gate forms, because they answer different questions:
    - `pred` is the raw NB argmax (score > 0) — imbalance- and
      length-sensitive (smoothing shifts shared-vocab buckets
      slightly negative, so long mixed-vocab docs drift negative).
    - `keep` is the production gate: the top `keep_frac` of the
      corpus by score (CCNet head/middle cut, FineWeb-Edu threshold
      sweep) with a deterministic (score desc, doc_id asc) tiebreak.
      Ranked via scale.global_rank (frozen-bin distributed ranking —
      never a single-task window; round 11 closed the documented
      "swap in at 100 TB" deferral) over the negated score, the same
      shape curriculum_order uses; the cut boundary
      ceil(n · keep_frac) is one Python double multiply — bit-equal
      to the old window's per-row expression (IEEE-754 both sides).

    `toks`/`stats` let write_classifier_stats pass in its persisted
    copies instead of re-deriving the token explode + bucket stats.
    A corpus where either class is EMPTY (e.g. classifier_gate
    placed after a langid allow-list) raises at execution instead of
    silently NULLing every score into a doc_id-ordered half-cut.

    Single-hash pass (round 11): the stats aggregate and the per-doc
    score are two consumers of the same token→md5→bucket stream, and
    each used to re-run that explode+hash chain from the scan. The
    chain now collapses ONCE into (doc_id, lang, bucket, tf) —
    (doc × distinct-bucket) grain, ≤ n_buckets rows per doc,
    id-grain metadata like the MinHash band checkpoint — which both
    consumers read. Bit-exactness: the stats are integer SUMs of tf
    (the same occurrence counts the per-occurrence groupBys formed),
    and the per-doc fold rebuilds the exact occurrence multiset with
    array_repeat(lw, tf) before the same sort_array + left fold, so
    the sorted double sequence — and hence every rounded score — is
    unchanged (oracle-driven)."""
    docs = load_table(spark, sf_dir, "documents")
    if toks is None:
        grouped = (
            _doc_token_buckets(docs, n_buckets, sf_dir=sf_dir)
            .groupBy("doc_id", "lang", "bucket")
            .agg(F.count(F.lit(1)).alias("tf"))
            .localCheckpoint(eager=True)
        )
    else:
        # caller owns toks' lifecycle (persisted) — no second
        # materialization, just the same grouping on top of it
        grouped = toks.groupBy("doc_id", "lang", "bucket").agg(
            F.count(F.lit(1)).alias("tf")
        )
    if stats is None:
        stats = _nb_bucket_stats_grouped(grouped, target_lang, n_buckets)
    # doc-count prior: bias = ln(n_pos_docs / n_neg_docs), exact ints
    prior = (
        docs.agg(
            F.sum((F.col("lang") == target_lang).cast("long")).alias("dp"),
            F.sum((F.col("lang") != target_lang).cast("long")).alias("dn"),
        )
        .select(
            F.when(
                (F.col("dp") == 0) | (F.col("dn") == 0),
                F.raise_error(F.lit(
                    "quality_classifier: one language class is empty"
                    " (no target-vs-rest contrast) — the NB gate is"
                    " undefined; gate BEFORE any language allow-list"
                )),
            ).otherwise(
                F.log(F.col("dp").cast("double") / F.col("dn"))
            ).alias("bias")
        )
    )
    per_doc = (
        grouped.join(F.broadcast(stats), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.sort_array(
                F.flatten(
                    F.collect_list(
                        F.expr("array_repeat(lw, cast(tf as int))")
                    )
                )
            ).alias("lws")
        )
    )
    fold = F.expr("aggregate(lws, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
    scored = per_doc.crossJoin(F.broadcast(prior)).select(
        "doc_id",
        F.size("lws").cast("long").alias("n_tokens"),
        F.round(fold + F.col("bias"), 6).alias("score"),
        (F.round(fold + F.col("bias"), 6) > 0).alias("pred"),
        (F.col("lang") == target_lang).alias("label"),
    )
    import math

    from flapi_spark.operators.scale import global_rank

    # distributed rank cut: materialize the scored frame once (the
    # count action and the frozen-bin passes read the same blocks),
    # rank ascending by (-score, doc_id) — Spark's double comparator
    # orders ±0.0 identically under negation, so the order matches
    # the old (score desc, doc_id asc) window exactly
    scored = scored.localCheckpoint(eager=True)
    cut = math.ceil(scored.count() * keep_frac)
    return (
        global_rank(
            scored.withColumn("__neg", -F.col("score")),
            ["__neg", "doc_id"],
            "__rk",
        )
        .select(
            "doc_id", "n_tokens", "score", "pred", "label",
            (F.col("__rk") <= F.lit(cut)).alias("keep"),
        )
    )


def quality_classifier_score(
    spark: SparkSession, sf_dir: str, target_lang: str = "en",
    n_buckets: int = NB_BUCKETS,
) -> DataFrame:
    """Per-document linear quality-gate score: Naive-Bayes log-odds
    of the target domain (lang == target_lang) over hashed unigram
    buckets, plus the raw NB decision (pred = score > 0), the
    production rank-gate decision (keep = top half by score), and
    the true label. The cheap linear gate every crawl pipeline runs;
    exact DuckDB oracle (closed-form weights)."""
    return _nb_scored(spark, sf_dir, target_lang, n_buckets)


def quality_classifier_eval(
    spark: SparkSession, sf_dir: str, target_lang: str = "en",
    n_buckets: int = NB_BUCKETS,
) -> DataFrame:
    """Confusion matrix of the production gate (top-keep_frac rank
    cut) vs the true domain label — the held-in eval a pipeline reads
    before trusting the gate (label × keep cells, per-cell doc
    counts)."""
    return (
        _nb_scored(spark, sf_dir, target_lang, n_buckets)
        .groupBy("label", "keep")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def classifier_calibration_bins(
    spark: SparkSession, sf_dir: str, target_lang: str = "en",
    n_buckets: int = NB_BUCKETS, bins: int = 10,
) -> DataFrame:
    """Reliability diagram of the NB quality gate: sigmoid-map the
    log-odds score to a confidence, bin into `bins` fixed-width
    buckets, and compare each bucket's mean confidence to its
    empirical positive rate — the calibration check (Guo et al. 2017,
    ECE's per-bin form) a pipeline runs before treating gate scores
    as probabilities (an over-confident gate silently biases every
    downstream keep_frac cut). ECE = Σ n_docs/N * calib_gap over the
    returned rows.

    Exactness: confidences round to 6 before binning and sum as
    DECIMAL(18,6) (order-independent); rates divide exact integers.
    One narrow aggregate over the scored stream — adds nothing to the
    score plan's shuffle count. Exact oracle."""
    scored = _nb_scored(spark, sf_dir, target_lang, n_buckets)
    conf = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score"))), 6
    )
    b = F.least(
        F.floor(conf * bins).cast("long"), F.lit(bins - 1)
    )
    per = (
        scored.select(
            b.alias("bin"),
            conf.cast("decimal(18,6)").alias("conf"),
            F.col("label").cast("long").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("conf").alias("sconf"),
            F.sum("y").alias("pos"),
        )
    )
    avg_conf = F.round(
        F.col("sconf").cast("double") / F.col("n_docs"), 6
    )
    frac_pos = F.round(
        F.col("pos").cast("double") / F.col("n_docs"), 6
    )
    return per.select(
        "bin",
        "n_docs",
        avg_conf.alias("avg_confidence"),
        frac_pos.alias("frac_positive"),
        F.round(F.abs(avg_conf - frac_pos), 6).alias("calib_gap"),
    )


def _lr_features(
    spark: SparkSession, sf_dir: str, target_lang: str, n_buckets: int
) -> DataFrame:
    """(doc_id, bucket, x, y): L1-normalized hashed-unigram counts
    (x = tf/n_tokens — fastText's mean-of-bucket-embeddings analogue)
    and the binary domain label."""
    # spread the single-split scan BEFORE the per-token md5 work —
    # tokenize once into an array, exchange the narrow (id, y, array)
    # rows, THEN explode+hash on all cores (round 11: the unspread
    # build ran the whole explode+md5 chain on ONE core, 4.3 s of the
    # trainer's 6.2 s fixed cost at sf0.1; the exchange also acts as
    # the CollapseProject barrier so _tokens() evaluates once per doc)
    docs = spread(load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("lang") == target_lang).cast("double").alias("y"),
        _tokens().alias("t"),
    ), sf_dir=sf_dir)
    toks = docs.select(
        "doc_id", "y",
        F.size("t").alias("n_toks"),
        F.explode("t").alias("tok"),
    ).withColumn("bucket", _bucket("tok", n_buckets))
    return toks.groupBy("doc_id", "y", "n_toks", "bucket").agg(
        F.count(F.lit(1)).alias("tf")
    ).select(
        "doc_id", "bucket", "y",
        (F.col("tf").cast("double") / F.col("n_toks")).alias("x"),
    )


def _grad_frame(docfeats: DataFrame, r) -> DataFrame:
    """One iteration's (bucket, g) gradient frame: per-term gradients
    (p - y)·x quantized to round(g·1e12) DECIMAL(38,0) integers, then a
    plain distributed SUM per bucket — map-side partial aggregation,
    bounded state per task regardless of docs-per-bucket (the
    collect_list fold this replaces held the whole bucket in one row).
    The bias gradient rides the SAME aggregate as bucket -1: its
    feature is the constant 1, so its term is prepended to the sparse
    array as (bucket=-1, x=1.0) and ONE explode covers weights and
    bias — bit-exact (r·1.0 ≡ r in IEEE) while scanning docfeats once
    per iteration instead of twice through a union (round 11: the
    union's second branch re-read the persisted frame and widened the
    per-iteration plan for no information). ONE action and ONE
    shuffle per iteration. `r` is the residual column expression over
    a docfeats row."""
    quant = F.lit(float(LR_QUANT))
    bias_term = F.array(
        F.struct(
            F.lit(-1).cast("bigint").alias("bucket"),
            F.lit(1.0).alias("x"),
        )
    )
    return (
        docfeats.select(
            "doc_id",
            r.alias("r"),
            F.explode(F.concat(bias_term, "fs")).alias("f"),
        )
        .select(
            F.col("f.bucket").alias("bucket"),
            F.round(F.col("r") * F.col("f.x") * quant, 0)
            .cast("decimal(38,0)")
            .alias("qg"),
        )
        .groupBy("bucket")
        .agg(F.sum("qg").alias("qs"))
        .select(
            "bucket",
            (F.col("qs").cast("string").cast("double") / quant).alias("g"),
        )
    )


def train_logreg(
    feats: DataFrame, n_buckets: int, iters: int = 12, lr: float = 20.0,
    lr_bias: float = 2.0,
) -> tuple[list[float], float]:
    """Full-batch logistic-regression GD over a (doc_id, bucket, x, y)
    feature table. Returns (weights[n_buckets], bias).

    Distribution contract: `feats` collapses ONCE into a per-doc
    sparse feature row (bucket-sorted array, persisted — bounded by
    the bucket count B per doc, never by corpus size); after that
    each iteration is ONE job with ONE bucket-grain shuffle — the
    margin is a per-row JVM fold against the broadcast weight-map
    literal (no join, no doc-grain shuffle), the gradient a plain
    distributed SUM of per-term quantized integers with the bias
    gradient riding the same aggregate as bucket -1; only the
    B+1-float gradient vector reaches the driver per iteration
    (bounded scalar collect).

    Gradient arithmetic (round 11, VERDICT r10 item 2): each term
    g = (p - y)·x quantizes to round(g·1e12) as DECIMAL(38,0) and the
    per-bucket gradient is SUM of those exact integers — the same
    order-independent discipline as `similarity.KMEANS_QUANT`
    (Lloyd centroid sums). This replaces the earlier
    sort_array(collect_list(struct(doc_id, g))) + fold, whose
    per-bucket row held one struct per (doc × feature-hit): at 100 TB
    a common-token bucket's array would be gigabytes → executor OOM.
    An integer SUM partially aggregates map-side, so per-iteration
    shuffle state is one partial per (bucket, task) regardless of
    docs-per-bucket (plan-asserted: tests/test_classifier.py).
    DECIMAL(38,0) cannot overflow below ~1e26 terms/bucket (|g| < 1,
    so each quantized term is < 1e12); the decimal→double dequantize
    routes through VARCHAR for the single correct rounding (>2^53
    trap). Determinism is preserved — exact integer sums commute — so
    the pure-Python golden twin replays the identical arithmetic
    (tests/test_classifier.py)."""
    w = [0.0] * n_buckets
    bias = 0.0
    # one row per doc with its bucket-SORTED sparse feature vector:
    # built once, so each iteration's margin is a per-row JVM fold
    # (no join, no doc-grain shuffle) and the only shuffle left per
    # iteration is the bucket-grain gradient aggregate.
    # localCheckpoint, not persist (round 12): the persisted frame
    # kept its FULL logical lineage, which every iteration's plan
    # re-analyzed/re-optimized on the driver (~0.17 s/iteration of
    # the measured 0.43 s); the checkpoint truncates the per-
    # iteration tree to a LogicalRDD leaf. Rows are doc-grain with a
    # <= n_buckets-entry sparse array — id-grain metadata, never text.
    docfeats = feats.groupBy("doc_id", "y").agg(
        F.sort_array(F.collect_list(F.struct("bucket", "x"))).alias("fs")
    ).localCheckpoint(eager=True)
    n_docs = docfeats.count()
    for _ in range(iters):
        # O(1) weight lookup: an array literal indexed by bucket
        # (round 12 — element_at on a MAP literal scans all
        # n_buckets entries per lookup: 64 features x 64-entry scan
        # per doc per iteration). Same float values, same fold
        # order, so every margin is bit-identical (golden-twin
        # pinned).
        warr = F.array(*[F.lit(v) for v in w])
        m = F.aggregate(
            "fs",
            F.lit(0.0),
            lambda acc, s: acc
            + s["x"]
            * F.element_at(warr, (s["bucket"] + 1).cast("int")),
        )
        r = (
            F.lit(1.0)
            / (F.lit(1.0) + F.exp(-(m + F.lit(bias))))
            - F.col("y")
        )
        grad_rows = _grad_frame(docfeats, r).collect()
        for row in grad_rows:
            if row["bucket"] == -1:
                # the bias takes its own (smaller) step: its
                # gradient is the mean residual — O(1) per doc,
                # ~n_tokens× the L1-normalized feature gradients —
                # so sharing `lr` makes it oscillate
                bias -= lr_bias * (row["g"] / n_docs)
            else:
                w[row["bucket"]] -= lr * (row["g"] / n_docs)
    return w, bias


def quality_classifier_train(
    spark: SparkSession, sf_dir: str, target_lang: str = "en",
    n_buckets: int = LR_BUCKETS, iters: int = 12, lr: float = 20.0,
    lr_bias: float = 2.0,
) -> DataFrame:
    """Distributed full-batch logistic regression for the domain gate
    (GPT-3 WebText-classifier shape): hashed-unigram features, fixed
    iteration count, deterministic quantized-integer-sum gradients
    (see train_logreg — order-independent, bounded state). Returns
    the learned model as rows — (bucket, weight) for each feature
    plus the bias as bucket = -1 — rounded to 6 decimals. Rows-only
    entry (iterative float training is not SQL-expressible); pinned
    by the pure-Python golden twin in tests/test_classifier.py."""
    # no persist on feats: train_logreg consumes it exactly once (the
    # docfeats eager checkpoint is the only materialization)
    feats = _lr_features(spark, sf_dir, target_lang, n_buckets)
    w, bias = train_logreg(
        feats, n_buckets, iters=iters, lr=lr, lr_bias=lr_bias
    )
    rows = [(-1, round(bias, 6))] + [
        (b, round(w[b], 6)) for b in range(n_buckets)
    ]
    return spark.createDataFrame(rows, schema="bucket BIGINT, weight DOUBLE")


def classifier_gate_keep(
    spark: SparkSession, sf_dir: str, target_lang: str = "en",
    n_buckets: int = NB_BUCKETS, keep_frac: float = 0.5,
) -> DataFrame:
    """doc_id keep-set of the production gate (top keep_frac of the
    corpus by NB score) — the curate() stage body (pipeline.py
    `classifier_gate`)."""
    return (
        _nb_scored(spark, sf_dir, target_lang, n_buckets, keep_frac)
        .where("keep")
        .select("doc_id")
    )


# --- persisted model + ingest-guard scoring (batch/stream shared) ----------


def _score_cols(
    tokens, weights: dict, bias: float, default_lw: float, n_buckets: int
):
    """(n_tokens, score) column pair for a token-array column —
    STATELESS per-row scoring against a driver-resident weight map
    (the deploy-time shape: calibrate in batch, apply as a pure
    projection at ingest). Bit-equal to _nb_scored's join+fold path:
    the per-token lws are array_sort'ed before the fold, so the sum
    runs over the same ascending order the batch path uses. Unseen
    buckets (tokens absent from the build corpus) take `default_lw`
    = the add-1-smoothed zero-count weight ln((n_n+B)/(n_p+B))."""
    wmap = F.create_map(
        *[F.lit(v) for b, lw in sorted(weights.items()) for v in (b, lw)]
    )
    lws = F.array_sort(
        F.transform(
            tokens,
            lambda t: F.coalesce(
                F.element_at(
                    wmap,
                    F.pmod(
                        F.conv(F.substring(F.md5(t), 1, 15), 16, 10)
                        .cast("bigint"),
                        F.lit(n_buckets),
                    ),
                ),
                F.lit(default_lw),
            ),
        )
    )
    score = F.round(
        F.aggregate(lws, F.lit(0.0), lambda a, x: a + x) + F.lit(bias), 6
    )
    return F.size(tokens).cast("long"), score


def write_classifier_stats(
    spark: SparkSession, sf_dir: str, table: str,
    target_lang: str = "en", n_buckets: int = NB_BUCKETS,
    keep_frac: float = 0.5,
) -> None:
    """Persist the NB gate as warehouse tables: `table` holds the
    per-bucket log-odds weights (bucket, lw); `<table>__model` is a
    one-row sidecar (bias, default_lw, threshold, n_buckets,
    target_lang) — the frozen-sidecar contract of the IVF
    `__centroids` table (similarity.write_ivf_index): the deployed
    model NEVER re-derives from a grown corpus.

    `threshold` is calibrated here as the minimum score the batch
    rank cut keeps (top keep_frac) — the batch gate picks the
    threshold, the stream gate applies it; that split is exactly how
    production classifier gates deploy. Boundary note: the batch cut
    breaks score ties by doc_id, the deployed `score >= threshold`
    cannot — with 6-decimal scores ties are rare, and the guard is
    the (slightly) more permissive side."""
    docs = load_table(spark, sf_dir, "documents")
    # the token explode and the bucket stats feed THREE consumers
    # (token-class counts, the calibration scoring pass, the
    # persisted weights) — persist both so the build is one explode
    # scan + one stats aggregate, not three of each
    toks = _doc_token_buckets(docs, n_buckets, sf_dir=sf_dir).persist()
    stats = None
    try:
        stats = _nb_bucket_stats(toks, target_lang, n_buckets).persist()
        pos_n, neg_n = (
            toks.agg(
                F.sum((F.col("lang") == target_lang).cast("long")),
                F.sum((F.col("lang") != target_lang).cast("long")),
            ).collect()[0]
        )
        dp, dn = (
            docs.agg(
                F.sum((F.col("lang") == target_lang).cast("long")),
                F.sum((F.col("lang") != target_lang).cast("long")),
            ).collect()[0]
        )
        if not dp or not dn:
            raise ValueError(
                "write_classifier_stats: one language class is empty"
                f" (target {dp or 0} / rest {dn or 0} docs) — the NB"
                " gate needs a target-vs-rest contrast"
            )
        scored = _nb_scored(
            spark, sf_dir, target_lang, n_buckets, keep_frac,
            toks=toks, stats=stats,
        )
        threshold = (
            scored.where("keep").agg(F.min("score")).collect()[0][0]
        )
        # _rm_table: drops catalog entry AND any orphaned warehouse
        # dir left by a crashed session (LOCATION_ALREADY_EXISTS
        # otherwise)
        from flapi_spark.writes import _rm_table

        _rm_table(spark, table)
        _rm_table(spark, f"{table}__model")
        stats.write.saveAsTable(table)
    finally:
        toks.unpersist()
        if stats is not None:
            stats.unpersist()
    spark.createDataFrame(
        [(
            math.log(dp / dn),
            math.log((neg_n + n_buckets) / (pos_n + n_buckets)),
            float(threshold),
            n_buckets,
            target_lang,
        )],
        schema=(
            "bias DOUBLE, default_lw DOUBLE, threshold DOUBLE,"
            " n_buckets BIGINT, target_lang STRING"
        ),
    ).write.saveAsTable(f"{table}__model")


def load_classifier_model(spark: SparkSession, table: str) -> dict:
    """Load a persisted NB gate (write_classifier_stats) into the
    driver-resident dict the guards consume: weights are ≤ n_buckets
    rows — a bounded scalar collect, never corpus-sized."""
    weights = {
        int(r["bucket"]): float(r["lw"])
        for r in spark.table(table).collect()
    }
    m = spark.table(f"{table}__model").collect()[0]
    return {
        "weights": weights,
        "bias": float(m["bias"]),
        "default_lw": float(m["default_lw"]),
        "threshold": float(m["threshold"]),
        "n_buckets": int(m["n_buckets"]),
        "target_lang": m["target_lang"],
    }


def classifier_guard_batch(docs: DataFrame, model: dict) -> DataFrame:
    """Batch twin of streaming.classifier_guard_stream: score a
    (doc_id, text) DataFrame against a loaded model — (doc_id,
    n_tokens, score, keep). Shares _score_cols with the stream so
    the equality anchor is the same expression tree."""
    n_tokens, score = _score_cols(
        _tokens(), model["weights"], model["bias"],
        model["default_lw"], model["n_buckets"],
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        score.alias("score"),
        (score >= model["threshold"]).alias("keep"),
    )
