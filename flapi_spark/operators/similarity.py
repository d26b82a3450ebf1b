"""Approximate-nearest-neighbor similarity search over embeddings.

- brute-force top-k: exact cosine of a (small) query set against the
  corpus — at scale the query set broadcasts and the corpus streams
  through one narrow projection + TakeOrdered per query; exact DuckDB
  oracle.
- random-hyperplane LSH top-k: bucket the corpus once by sign-bit
  signature (planes joined as a broadcast table — no per-row Python),
  then score only bucket-cohabitants. The 100 TB path: bucketing is
  one linear pass; probe cost is bucket-sized, not corpus-sized.
"""

from __future__ import annotations

import random

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flapi_spark.operators.dedup import cosine_col
from flapi_spark.session import load_table

N_PLANES = 12
_rng = random.Random(7)
# deterministic pseudo-gaussian plane weights (sum of uniforms)
PLANES = [
    [sum(_rng.uniform(-1, 1) for _ in range(4)) for _dim in range(64)]
    for _p in range(N_PLANES)
]


def ann_bruteforce_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Exact cosine top-k: query vectors vec_id <= n_queries against the
    rest of the corpus; rank by cosine desc (vec_id tiebreak)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") <= n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("eq")
    )
    c = emb.where(F.col("vec_id") > n_queries).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ec")
    )
    scored = F.broadcast(q).join(c).select(
        "qid", "cid", cosine_col("eq", "ec").alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("qid", "cid", "cosine", "rnk")
    )


_BUCKET_UDF = None


def _bucket_udf():
    """Sign-bit bucket per Arrow batch: one (batch×64)@(64×N_PLANES)
    float64 matmul, sign-test, bit-fold. Vectorized numpy — C speed,
    no per-row Python. Built lazily: pandas_udf registration needs an
    active SparkSession, which module import must not require."""
    global _BUCKET_UDF
    if _BUCKET_UDF is None:

        def _bucket(emb: pd.Series) -> pd.Series:
            import numpy as np

            if len(emb) == 0:
                return pd.Series([], dtype="int64")
            W = np.asarray(PLANES, dtype=np.float64)          # (N_PLANES, 64)
            X = np.stack(emb.to_numpy()).astype(np.float64)   # (batch, 64)
            bits = (X @ W.T) > 0.0                            # (batch, N_PLANES)
            vals = bits @ (np.int64(1) << np.arange(N_PLANES, dtype=np.int64))
            return pd.Series(vals.astype(np.int64))

        _BUCKET_UDF = F.pandas_udf(_bucket, "long")
    return _BUCKET_UDF


def lsh_buckets(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """Sign-bit bucket id per vector: a single narrow projection whose
    plane dot products run as one vectorized numpy matmul per Arrow
    batch (`_bucket_udf`). ZERO shuffles, embarrassingly parallel —
    at 100 TB this is one linear pass over the corpus.

    Why a Pandas UDF and not built-ins: the unrolled 12-plane ×
    64-dim literal chain (768 terms in one expression) exceeds the
    JVM's 64 KB codegen method limit and Spark falls back to
    interpreted projection (~2× slower than the old
    explode→broadcast-join→groupBy plan, which itself paid 3 shuffles
    of the 64×-exploded corpus); `F.aggregate`/`zip_with` lambdas are
    interpreted per element. Arrow-batched matmul beats all three and
    is the idiomatic Spark shape for dense vector math."""
    return emb.select("vec_id", _bucket_udf()("embedding").alias("bucket"))


def ann_lsh_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """LSH-bucketed ANN top-k (rows-only check; recall vs brute force is
    asserted in tests/test_similarity.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    buckets = lsh_buckets(spark, emb)
    tagged = emb.join(buckets, "vec_id")
    q = tagged.where(F.col("vec_id") <= n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("eq"),
        F.col("bucket").alias("qb"),
    )
    c = tagged.where(F.col("vec_id") > n_queries).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ec"),
        F.col("bucket").alias("cb"),
    )
    # probe: exact bucket match OR Hamming-1 neighbor buckets
    hamming = F.bit_count(F.col("qb").bitwiseXOR(F.col("cb")))
    scored = (
        F.broadcast(q)
        .join(c, hamming <= 1)
        .select("qid", "cid", cosine_col("eq", "ec").alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("qid", "cid", "cosine", "rnk")
    )


# --- IVF (inverted-file) ANN -------------------------------------------

N_CELLS_MOD = 25  # vec_id % 25 == 0 → deterministic ~1/25 centroid sample


def ivf_centroids(emb: DataFrame, mod: int = N_CELLS_MOD) -> DataFrame:
    """Deterministic centroid sample: every `mod`-th corpus vector.

    The 100 TB path: centroids are a broadcast table — raise `mod` with
    corpus size to hold the centroid COUNT fixed (else per-vector
    scoring cost grows with n·n/mod); a k-means refinement would slot
    in here without changing the probe side."""
    return emb.where(F.col("vec_id") % mod == 0).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )


def ivf_assign(vectors: DataFrame, centroids: DataFrame, nprobe: int = 1) -> DataFrame:
    """Assign each vector to its top-`nprobe` nearest centroids by
    cosine: one streamed pass (broadcast-scored + per-vector top-nprobe),
    shuffling only (vec_id, cell_id) pairs. THE assignment plan lives
    in assign_with_sim (round-10d review: a hand-kept copy here would
    have to stay bit-identical for the oracle contract); this wrapper
    just drops the score column."""
    return assign_with_sim(vectors, centroids, nprobe).select(
        "vec_id", "cell_id"
    )


def rowwise_ivf_assign(
    vectors: DataFrame, centroid_rows: list, nprobe: int = 1
) -> DataFrame:
    """STATELESS per-row IVF assignment (round 9): same cell choice as
    `ivf_assign`, but computed entirely inside one projection — the
    centroid set rides along as an array-of-structs LITERAL and each
    vector scores/sorts/slices it per row. No groupBy, no window, so
    the expression is legal on an append-mode STREAM (ivf_assign's
    row_number window is not) — the embedding twin of
    dedup.rowwise_minhash.

    `centroid_rows` is the collect()ed frozen centroid table (the
    `<table>__centroids` sidecar) — bounded by design: centroids are
    the broadcast-sized summary (see ivf_centroids), and freezing
    them driver-side here is the same contract as the broadcast in
    ivf_assign. Arithmetic parity: the dot/norm folds below mirror
    cosine_col's aggregate(zip_with(...)) element order exactly, and
    the (desc sim, asc cell_id) tie-break is reproduced by an
    ascending struct sort on (-sim, cell_id) — equality with
    ivf_assign is asserted bit-for-bit in tests."""

    import math

    def _dot(a, b) -> F.Column:
        return F.aggregate(
            F.zip_with(
                a, b, lambda x, y: x.cast("double") * y.cast("double")
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def _norm(values: list) -> float:
        # the SAME IEEE op sequence as sqrt(_dot(v, v)): left fold of
        # x*x from 0.0, then a correctly-rounded sqrt — bit-identical
        # to the engine-side computation, hoisted to the driver once
        # per frozen centroid instead of once per streamed row
        acc = 0.0
        for x in values:
            acc = acc + x * x
        return math.sqrt(acc)

    cents = F.array(
        *[
            F.struct(
                F.lit(int(r.cell_id)).cast("long").alias("cell_id"),
                F.lit([float(v) for v in r.centroid]).alias("centroid"),
                F.lit(_norm([float(v) for v in r.centroid])).alias("norm"),
            )
            for r in centroid_rows
        ]
    )
    emb = F.col("embedding")
    # query norm computed ONCE per row (it is constant across the
    # centroid transform; inlining it re-ran the O(dim) fold once per
    # centroid — review finding, round 9)
    qn = F.sqrt(_dot(emb, emb))
    scored = F.transform(
        cents,
        lambda c: F.struct(
            (-(_dot(emb, c["centroid"]) / (F.col("_qn") * c["norm"]))).alias(
                "neg_sim"
            ),
            c["cell_id"].alias("cell_id"),
        ),
    )
    probed = F.slice(F.sort_array(scored), 1, nprobe)
    # pass-through shape (round 10d): every input column survives —
    # stream monitors carry event-time columns through the assignment
    return (
        vectors.withColumn("_qn", qn)
        .withColumn("__pc", F.explode(probed))
        .withColumn("cell_id", F.col("__pc.cell_id"))
        .drop("_qn", "__pc")
    )


def ivf_assignments(
    spark: SparkSession, emb: DataFrame, nprobe: int = 1
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assignments) over one vector set — see ivf_centroids
    / ivf_assign for the two halves."""
    centroids = ivf_centroids(emb)
    return centroids, ivf_assign(emb, centroids, nprobe)


def _ivf_topk(
    emb: DataFrame, centroids: DataFrame, n_queries: int, k: int,
    nprobe: int,
) -> DataFrame:
    """The IVF probe against an explicit centroid table (shared by
    ann_ivf_topk and the sampled/refined recall eval): corpus vectors
    live in 1 cell; queries probe their `nprobe` nearest cells; exact
    cosine only among cell-cohabitants."""
    corpus_cells = ivf_assign(emb, centroids, nprobe=1)
    query_cells = ivf_assign(
        emb.where(F.col("vec_id") <= n_queries), centroids, nprobe=nprobe
    )
    c = (
        emb.where(F.col("vec_id") > n_queries)
        .join(corpus_cells, "vec_id")
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ec"),
                "cell_id")
    )
    q = (
        emb.where(F.col("vec_id") <= n_queries)
        .join(query_cells, "vec_id")
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("eq"),
                "cell_id")
    )
    scored = (
        F.broadcast(q)
        .join(c, "cell_id")
        .select("qid", "cid", cosine_col("eq", "ec").alias("cosine"))
        .dropDuplicates(["qid", "cid"])
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("qid", "cid", "cosine", "rnk")
    )


def ann_ivf_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 10,
    nprobe: int = 3,
) -> DataFrame:
    """IVF ANN top-k over the deterministic sampled centroids (see
    _ivf_topk; recall vs brute force asserted in tests)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _ivf_topk(emb, ivf_centroids(emb), n_queries, k, nprobe)


def embedding_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of embeddings with per-vector
    reconstruction error — the storage/bandwidth primitive of a
    100 TB ANN index (4× smaller vectors, cosine on codes during
    probe, exact re-rank on survivors).

    Per vector: affine-map [min, max] onto 0..255, round to the code
    grid, reconstruct, and report the summed squared error plus an md5
    over the code string. All JVM-side higher-order-function
    expressions; the DuckDB oracle replays the identical arithmetic
    (same fold order — list_dot_product matches the sequential
    aggregate, see _COS in queries.py) so mn/mx/sq_err hash-match
    bit-for-bit. Linear, shuffle-free, embarrassingly parallel."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("xs"),
    ).select(
        "vec_id",
        "xs",
        F.array_min("xs").alias("mn"),
        F.array_max("xs").alias("mx"),
    ).withColumn("s", (F.col("mx") - F.col("mn")) / F.lit(255.0))
    codes = F.expr(
        "transform(xs, x -> CASE WHEN s = 0 THEN 0.0"
        " ELSE round((x - mn) / s) END)"
    )
    err = F.expr(
        "transform(xs, x -> x - (mn + (CASE WHEN s = 0 THEN 0.0"
        " ELSE round((x - mn) / s) END) * s))"
    )
    sq_err = F.expr(
        "aggregate(zip_with(err, err, (p, q) -> p * q),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return (
        base.withColumn("err", err)
        .withColumn("codes", codes)
        .select(
            "vec_id",
            "mn",
            "mx",
            sq_err.alias("sq_err"),
            F.md5(
                F.array_join(
                    F.expr(
                        "transform(codes, c -> CAST(CAST(c AS INT) AS STRING))"
                    ),
                    ",",
                )
            ).alias("codes_md5"),
        )
    )


# --- PQ (product quantization) ANN -------------------------------------

PQ_SUBSPACES = 8     # 64 dims -> 8 subspaces x 8 dims
PQ_CODEWORDS = 16    # codewords per subspace codebook
PQ_SAMPLE_MOD = 31   # deterministic codeword sample: every 31st vector


def pq_codebook(emb: DataFrame) -> DataFrame:
    """Deterministic PQ codebook: the first PQ_CODEWORDS corpus
    vectors with vec_id % PQ_SAMPLE_MOD == 0 (vec_id order) provide
    codeword j's slice in EVERY subspace — the sampled-codebook
    analogue of ivf_centroids (a k-means refinement per subspace slots
    in without changing the encode/probe sides). Tiny by construction:
    broadcastable at any corpus size."""
    w = Window.orderBy("vec_id")
    return (
        emb.where(F.col("vec_id") % PQ_SAMPLE_MOD == 0)
        .orderBy("vec_id")
        .limit(PQ_CODEWORDS)
        .select(
            "vec_id",
            F.expr("transform(embedding, e -> CAST(e AS DOUBLE))").alias("c"),
        )
        .withColumn("j", (F.row_number().over(w) - 1).cast("int"))
        .select("j", "c")
    )


# squared-L2 between subspace m's 8-dim slices of x (vector) and c
# (codeword), folded in positional order — the identical IEEE sequence
# DuckDB's list_dot_product(diff, diff) produces, so encode/LUT
# distances match the oracle bit-for-bit
_PQ_DIST = (
    "aggregate(zip_with(slice(x, m * 8 + 1, 8), slice(c, m * 8 + 1, 8),"
    " (p, q) -> (p - q) * (p - q)), CAST(0.0 AS DOUBLE),"
    " (acc, v) -> acc + v)"
)


def _pq_subspace_scores(xs: DataFrame, codebook: DataFrame) -> DataFrame:
    """(id, m, j, dist): distance of every vector's subspace slice to
    every codeword slice — one streamed pass, codebook broadcast."""
    return (
        xs.crossJoin(F.broadcast(codebook))
        .select(
            "vec_id",
            "j",
            F.explode(F.sequence(F.lit(0), F.lit(PQ_SUBSPACES - 1))).alias("m"),
            "x",
            "c",
        )
        .select("vec_id", "m", "j", F.expr(_PQ_DIST).alias("dist"))
    )


def ann_pq_adc_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (Jegou et al. 2011, "Product Quantization for Nearest Neighbor
    Search"): corpus vectors compress to PQ_SUBSPACES 4-bit codes
    (argmin codeword per subspace); a query stays uncompressed and
    scores corpus vectors as the sum of per-subspace lookup-table
    distances (ADC) — the memory-bound trick behind billion-vector
    indexes (16 codes replace 64 floats; distances need only a
    PQ_CODEWORDS x PQ_SUBSPACES LUT per query).

    100 TB shape: encoding is one linear pass with a broadcast
    codebook (shuffle-free); probing joins the tiny LUT (broadcast) to
    corpus codes and needs no raw vectors — the scan reads codes, not
    embeddings. ADC sums fold as a fixed left-associated 8-term chain,
    bit-identical to the DuckDB oracle that replays sampling, encode,
    LUT and ranking (same deterministic tiebreaks)."""
    emb = load_table(spark, sf_dir, "embeddings")
    xs = emb.select(
        "vec_id",
        F.expr("transform(embedding, e -> CAST(e AS DOUBLE))").alias("x"),
    )
    cb = pq_codebook(emb)
    w_enc = Window.partitionBy("vec_id", "m").orderBy("dist", "j")
    codes = (
        _pq_subspace_scores(xs.where(F.col("vec_id") > n_queries), cb)
        .withColumn("r", F.row_number().over(w_enc))
        .where(F.col("r") == 1)
        .select(F.col("vec_id").alias("cid"), "m", "j")
    )
    lut = _pq_subspace_scores(xs.where(F.col("vec_id") <= n_queries), cb).select(
        F.col("vec_id").alias("qid"), "m", "j", "dist"
    )
    part = codes.join(F.broadcast(lut), ["m", "j"])
    piv = part.groupBy("qid", "cid").agg(
        *[
            F.max(F.when(F.col("m") == i, F.col("dist"))).alias(f"d{i}")
            for i in range(PQ_SUBSPACES)
        ]
    )
    adc = F.col("d0")
    for i in range(1, PQ_SUBSPACES):
        adc = adc + F.col(f"d{i}")
    w = Window.partitionBy("qid").orderBy("adc_dist", "cid")
    return (
        piv.select("qid", "cid", adc.alias("adc_dist"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("qid", "cid", "adc_dist", "rnk")
    )


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-magnitude profile per label: five-number summary of L2
    norms — the index-health check before cosine-based ANN (collapsed
    or wildly varying norms break inner-product shortcuts). Norm² is
    the positional dot-product fold (identical to DuckDB's
    list_dot_product); sqrt and the interpolated quartiles are
    mirrored; 6dp. Exact oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.expr(
            "aggregate(zip_with(embedding, embedding,"
            " (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    )
    t = emb.select("label", norm.alias("norm"))
    return t.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.round(F.min("norm"), 6).alias("min_norm"),
        F.round(F.percentile("norm", 0.25), 6).alias("q1"),
        F.round(F.percentile("norm", 0.5), 6).alias("median"),
        F.round(F.percentile("norm", 0.75), 6).alias("q3"),
        F.round(F.max("norm"), 6).alias("max_norm"),
    )


def ann_recall_eval(
    spark: SparkSession, sf_dir: str, k: int = 10
) -> DataFrame:
    """Recall@k of the LSH index against exact brute-force ground
    truth, per query — the evaluation harness an ANN deployment tunes
    its bands/probes with (an index you can't measure is an index you
    can't trust). recall = |lsh∩brute| / |brute| over each query's
    top-k sets; 6dp.

    Scale shape: both sides are the existing bucketed/broadcast ANN
    plans; the eval adds one (qid,cid) equi-join + a per-query
    aggregate over ≤ k rows per query. Exact oracle (composes the two
    entries' own oracle SQL as CTEs)."""
    brute = ann_bruteforce_topk(spark, sf_dir, k=k).select(
        "qid", F.col("cid").alias("bcid")
    )
    lsh = ann_lsh_topk(spark, sf_dir, k=k).select(
        "qid", F.col("cid").alias("lcid")
    )
    hits = brute.join(
        lsh,
        (brute.qid == lsh.qid) & (F.col("bcid") == F.col("lcid")),
        "left",
    ).select(
        brute.qid.alias("qid"),
        F.col("lcid").isNotNull().cast("int").alias("hit"),
    )
    return hits.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.sum("hit").cast("long").alias("n_hits"),
        F.round(
            F.sum("hit").cast("double") / F.count(F.lit(1)), 6
        ).alias("recall"),
    )


def ann_truncation_eval(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    dims: tuple[int, ...] = (8, 16, 32),
    n_queries: int = 5,
) -> DataFrame:
    """Matryoshka/truncation retrieval eval (Kusupati et al. 2022
    shape): recall@k of brute-force cosine over the FIRST d embedding
    components against the full-dimension ground truth, for each
    truncation d — the measurement behind serving truncated vectors
    (d=16 at recall 0.9 means 4× less index memory and bandwidth for
    one point of recall; without this eval the truncation knob is a
    guess). Same harness shape as ann_recall_eval; the truncated arm
    slices the arrays JVM-side before the identical cosine fold.

    Scale shape: one broadcast-query brute pass per configured d
    (dims is configuration-bounded) + a per-query aggregate over ≤ k
    rows. Exact oracle (list-slice cosine replicated per dimension)."""
    emb = load_table(spark, sf_dir, "embeddings")
    full = ann_bruteforce_topk(spark, sf_dir, n_queries, k).select(
        "qid", F.col("cid").alias("bcid")
    )
    out = None
    for d in dims:
        q = emb.where(F.col("vec_id") <= n_queries).select(
            F.col("vec_id").alias("qid"),
            F.slice("embedding", 1, d).alias("eq"),
        )
        c = emb.where(F.col("vec_id") > n_queries).select(
            F.col("vec_id").alias("cid"),
            F.slice("embedding", 1, d).alias("ec"),
        )
        scored = F.broadcast(q).join(c).select(
            "qid", "cid", cosine_col("eq", "ec").alias("cosine")
        )
        w = Window.partitionBy("qid").orderBy(
            F.desc("cosine"), F.asc("cid")
        )
        topk = (
            scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .select("qid", F.col("cid").alias("tcid"))
        )
        hits = full.join(
            topk,
            (full.qid == topk.qid) & (F.col("bcid") == F.col("tcid")),
            "left",
        ).select(
            full.qid.alias("qid"),
            F.col("tcid").isNotNull().cast("int").alias("hit"),
        )
        rec = hits.groupBy("qid").agg(
            F.count(F.lit(1)).cast("long").alias("n_true"),
            F.sum("hit").cast("long").alias("n_hits"),
            F.round(
                F.sum("hit").cast("double") / F.count(F.lit(1)), 6
            ).alias("recall"),
        ).select(
            F.lit(d).cast("long").alias("trunc_dim"),
            "qid", "n_true", "n_hits", "recall",
        )
        out = rec if out is None else out.unionByName(rec)
    return out


def embedding_pca_power(
    spark: SparkSession, sf_dir: str, iters: int = 5
) -> DataFrame:
    """Dominant principal component of the embedding table by POWER
    ITERATION on X^T X — the whitening / ABQ / OOD-scoring primitive a
    training pipeline runs before quantization or semantic dedup
    (top-PC removal is the classic embedding post-process, Mu & Thakoor
    2018 'All-but-the-Top').

    Distributed shape: each iteration is ONE aggregate pass — per row
    the scalar s = x·v (positional zip_with fold, v a frozen literal),
    then w_j = Σ s·x_j via posexplode + groupBy(j) (64 groups). The
    d-vector w collects to the driver (d rows — bounded, the k-means/
    BPE coordination pattern), is normalized, ROUNDED to 9dp and
    frozen into the next iteration's literal. The rounding is
    load-bearing for exactness: both engines re-enter each iteration
    with the IDENTICAL vector, so cross-engine float drift cannot
    compound (the only divergence source is last-ulp sum ordering
    inside one iteration, absorbed by the 1e-9 grid).

    Output: one row per component — loadings sign-fixed (first
    component positive) and the eigenvalue estimate ||X^T X v||,
    rounded 6dp. Exact oracle: the same iterations unrolled as chained
    CTEs in DuckDB."""
    import math

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("emb")
    )
    first = emb.first()
    if first is None:
        # empty table: the declared schema with no rows, not a
        # TypeError from first()[...] (r5 ADVICE)
        return spark.createDataFrame(
            [], "component long, loading double, eigenvalue double"
        )
    d = len(first["emb"])
    v = [0.0] * d
    v[0] = 1.0
    lam = 0.0
    for _ in range(iters):
        v_lit = ", ".join(repr(x) for x in v)
        dot = (
            f"aggregate(zip_with(emb, array({v_lit}),"
            " (x, y) -> x * y), CAST(0 AS DOUBLE), (a, b) -> a + b)"
        )
        ex = emb.select(
            F.expr(dot).alias("s"), F.posexplode("emb").alias("j", "e")
        )
        rows = (
            ex.groupBy("j")
            .agg(F.sum(F.col("s") * F.col("e")).alias("w"))
            .orderBy("j")
            .collect()
        )
        w = [r.w for r in rows]
        lam = math.sqrt(sum(x * x for x in w))
        v = [round(x / lam, 9) for x in w]
    sign = -1.0 if v[0] < 0 else 1.0
    out = [
        (j + 1, round(sign * v[j], 6), round(lam, 6)) for j in range(d)
    ]
    return spark.createDataFrame(
        out, "component long, loading double, eigenvalue double"
    )


def embedding_pc_removal_stats(
    spark: SparkSession, sf_dir: str, iters: int = 5
) -> DataFrame:
    """'All-but-the-top' applied (Mu & Thakoor 2018): project the
    dominant principal component OUT of every embedding and report the
    per-label norm geometry before/after — mean norm, mean |cos| to
    the top PC (anisotropy), and the mean norm retained. The QA sheet
    a pipeline checks before shipping whitened embeddings to ANN /
    semantic-dedup stages (a high pre-removal |cos| = anisotropic
    corpus where cosine similarity saturates).

    Composition shape: the PC comes from embedding_pca_power's
    driver-frozen iteration (d-vector literal), so the removal pass is
    ONE codegen projection + one groupBy(label) — nothing iterative
    touches the corpus twice. Exact oracle: the unrolled-CTE PCA chain
    + the same projection arithmetic, every per-row scalar through the
    identical positional fold, outputs rounded 6dp."""
    import math

    pc_rows = embedding_pca_power(spark, sf_dir, iters=iters).collect()
    v = [r.loading for r in sorted(pc_rows, key=lambda r: r.component)]
    v_lit = ", ".join(repr(x) for x in v)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("emb")
    )
    dot = (
        f"aggregate(zip_with(emb, array({v_lit}),"
        " (x, y) -> x * y), CAST(0 AS DOUBLE), (a, b) -> a + b)"
    )
    sq = (
        "aggregate(emb, CAST(0 AS DOUBLE), (a, b) -> a + b * b)"
    )
    scored = emb.select(
        "label",
        F.expr(sq).alias("sq"),
        F.expr(dot).alias("s"),
    ).select(
        "label",
        F.sqrt("sq").alias("norm"),
        # removing s·v from x leaves squared norm sq - s² (v unit);
        # guard tiny negatives from float cancellation
        F.sqrt(F.greatest(F.col("sq") - F.col("s") * F.col("s"),
                          F.lit(0.0))).alias("norm_removed"),
        (F.abs("s") / F.sqrt("sq")).alias("abs_cos"),
    )
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("norm").alias("sn"),
            F.sum("norm_removed").alias("snr"),
            F.sum("abs_cos").alias("sc"),
        )
        .select(
            F.col("label").cast("long").alias("label"),
            F.col("n").cast("long").alias("n"),
            F.round(F.col("sn") / F.col("n"), 6).alias("mean_norm"),
            F.round(F.col("snr") / F.col("n"), 6).alias(
                "mean_norm_removed"
            ),
            F.round(F.col("sc") / F.col("n"), 6).alias("mean_abs_cos_pc"),
            F.round(F.col("snr") / F.col("sn"), 6).alias("norm_retained"),
        )
    )


def write_ivf_index(
    spark: SparkSession,
    emb: DataFrame,
    table: str = "ann_ivf_index",
    buckets: int = 16,
    refine_iters: int = 0,
) -> None:
    """Materialize the IVF index as a BUCKETED warehouse table on
    cell_id: (cell_id, vec_id, embedding) rows, cell-co-located on
    disk. Probes then join queries' probe cells against a bucketed
    scan — no index-side exchange per query batch; at 100 TB the
    corpus embeddings are shuffled into cells exactly ONCE at
    bootstrap (plus appends), not per probe run. Same persistence
    pattern as the dedup band index (dedup.write_band_index).

    `refine_iters` > 0 runs that many Lloyd k-means rounds over the
    sampled centroids before freezing (kmeans_refine): tighter cells →
    better recall at the same nprobe. Refinement only changes what the
    frozen sidecar CONTAINS — every probe/append/maintainer path reads
    the sidecar, so they inherit refined cells with zero code or plan
    change (the deliberate payoff of the frozen-centroid contract)."""
    if refine_iters:
        centroids = kmeans_refine(emb, iters=refine_iters).select(
            "cell_id", "centroid"
        )
    else:
        centroids = ivf_centroids(emb)
    # FREEZE the centroid set beside the index: appends and probes
    # must use the BOOTSTRAP centroids — re-deriving them from a grown
    # corpus would mint new centroids and leave old index rows filed
    # under stale cells (silent recall loss)
    centroids.write.mode("overwrite").saveAsTable(f"{table}__centroids")
    frozen = spark.table(f"{table}__centroids")
    assigned = ivf_assign(emb, frozen, nprobe=1)
    (
        emb.join(assigned, "vec_id")
        .select("cell_id", "vec_id", "embedding")
        .write.mode("overwrite")
        .bucketBy(buckets, "cell_id")
        .sortBy("cell_id")
        .saveAsTable(table)
    )


def append_ivf_index(
    spark: SparkSession,
    new_emb: DataFrame,
    table: str = "ann_ivf_index",
) -> None:
    """Append a vector batch to the persisted IVF index: assign the
    NEW vectors against the FROZEN bootstrap centroid table (cell
    identity stays stable across appends — review finding: deriving
    centroids from the grown corpus minted new cells and stranded old
    index rows) and insertInto — the bucket spec is preserved,
    appended files land cell-bucketed."""
    centroids = spark.table(f"{table}__centroids")
    assigned = ivf_assign(new_emb, centroids, nprobe=1)
    (
        new_emb.join(assigned, "vec_id")
        .select("cell_id", "vec_id", "embedding")
        .write.insertInto(table)
    )


def ann_ivf_probe_indexed(
    spark: SparkSession,
    queries: DataFrame,
    table: str = "ann_ivf_index",
    k: int = 10,
    nprobe: int = 3,
) -> DataFrame:
    """IVF probe against the PERSISTED index: queries score the
    broadcast centroid set for their nprobe cells, then join the
    bucketed index on cell_id (query side broadcast — the index scan
    never shuffles) and rank exact cosines among cell-cohabitants.
    Equality with the self-contained ann_ivf_topk (same centroid
    arithmetic at bootstrap) is asserted in tests."""
    centroids = spark.table(f"{table}__centroids")
    qcells = ivf_assign(queries, centroids, nprobe=nprobe)
    q = queries.join(qcells, "vec_id").select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("eq"),
        "cell_id",
    )
    index = spark.table(table)
    qids = [r.vec_id for r in queries.select("vec_id").collect()]
    c = index.where(~F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ec"),
        "cell_id",
    )
    scored = (
        F.broadcast(q)
        .join(c, "cell_id")
        .select("qid", "cid", cosine_col("eq", "ec").alias("cosine"))
        .dropDuplicates(["qid", "cid"])
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("qid", "cid", "cosine", "rnk")
    )


# --- k-means refinement of the IVF centroid sample (round 10c) ---------------

# centroid arithmetic quantum: component sums fold as exact integers of
# 1e-12 resolution, so the Lloyd update is order-independent (plain
# distributed SUM — no sorted-fold collect_list) AND bit-reproducible in
# any engine that rounds half-away-from-zero (Spark BigDecimal HALF_UP
# == DuckDB round(); negative values round away from zero in both)
KMEANS_QUANT = 10**12


def _lloyd_update(emb: DataFrame, assign: DataFrame) -> DataFrame:
    """One Lloyd centroid update: new centroid = per-dimension mean of
    the assigned member vectors, computed as quantized-integer sums.

    Scale shape: posexplode fans each vector into (cell_id, pos, qx)
    rows that partially aggregate map-side — the shuffle carries one
    (cell, dim) partial per task, never per-cell member ARRAYS (the
    sorted-fold discipline used by the classifier would collect every
    member vector of a cell into one row — fine for model weights,
    not for 100 TB of embeddings). DECIMAL(38,0) sums cannot overflow
    below ~1e26 members/cell; the decimal→double division routes
    through VARCHAR for the single correct rounding (>2^53 trap).
    Cells that lost every member simply vanish from the GROUP BY —
    the standard drop-empty-cell Lloyd policy, identical in the
    oracle."""
    dims = (
        emb.join(assign, "vec_id")
        .select("cell_id", F.posexplode("embedding").alias("pos", "x"))
        .select(
            "cell_id",
            "pos",
            F.round(F.col("x").cast("double") * KMEANS_QUANT, 0)
            .cast("decimal(38,0)")
            .alias("qx"),
        )
    )
    vals = (
        dims.groupBy("cell_id", "pos")
        .agg(F.sum("qx").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "cell_id",
            "pos",
            (
                F.col("s").cast("string").cast("double")
                / (F.col("n").cast("double") * F.lit(float(KMEANS_QUANT)))
            ).alias("val"),
            "n",
        )
    )
    return vals.groupBy("cell_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, val))),"
            " s -> s.val)"
        ).alias("centroid"),
        F.max("n").cast("long").alias("n_members"),
    )


def _lloyd_chain(
    emb: DataFrame, iters: int, mod: int
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """THE Lloyd assign→update loop, in one place (round-10c review:
    three hand-rolled copies had already diverged on the `mod`
    pass-through). Returns (cent0, assign0, cent_final, assign_final)
    — cent frames are (cell_id, centroid), assigns (vec_id, cell_id).
    iters must be >= 1: zero rounds has no refined centroid table to
    return (callers wanting the raw sample use ivf_centroids)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    cent0 = ivf_centroids(emb, mod=mod)
    a0 = ivf_assign(emb, cent0, nprobe=1)
    cent, assign = cent0, a0
    for _ in range(iters):
        cent = _lloyd_update(emb, assign)
        assign = ivf_assign(
            emb, cent.select("cell_id", "centroid"), nprobe=1
        )
    return cent0, a0, cent, assign


def kmeans_refine(
    emb: DataFrame, iters: int = 2, mod: int = N_CELLS_MOD
) -> DataFrame:
    """Lloyd k-means refinement of the deterministic IVF centroid
    sample (`ivf_centroids` is every `mod`-th vector — a sample, not a
    fit; `iters` assign→update rounds move each centroid to its
    cluster's mean, tightening the cells every IVF consumer probes:
    the ANN index, SemDeDup clustering, the embedding ingest guard).

    Per iteration: one broadcast-scored assignment pass (shuffles only
    (vec_id, cell_id)) + one map-side-combined (cell, dim) integer-sum
    update — 2 linear shuffles, no quadratic term, the textbook
    k-means-on-MapReduce shape (Chu et al. NIPS'06). Returns
    (cell_id, centroid array<double>, n_members); empty cells drop;
    iters < 1 raises. Deterministic end to end: sampled init,
    (sim desc, cell asc) assignment tie-break, order-independent
    quantized update — an exact DuckDB oracle replays the whole
    refinement (q: embedding_kmeans_refine)."""
    _cent0, _a0, cent, _assign = _lloyd_chain(emb, iters, mod)
    return cent


def embedding_kmeans_refine(
    spark: SparkSession, sf_dir: str, iters: int = 2,
    mod: int = N_CELLS_MOD,
) -> DataFrame:
    """Registry entry: per-vector cell assignment before vs after
    `iters` Lloyd refinement rounds — (vec_id, cell_init, cell_final,
    moved). Integer output; the exact DuckDB oracle replays sampled
    init, every assignment and every quantized centroid update.
    `mod` is the sampling modulus (raise with corpus size to hold the
    centroid count — and with it the per-vector scoring cost —
    fixed; the registry default is exact-oracle plumbing)."""
    emb = load_table(spark, sf_dir, "embeddings")
    _cent0, a0, _cent, assign = _lloyd_chain(emb, iters, mod)
    init = a0.select("vec_id", F.col("cell_id").alias("cell_init"))
    return init.join(assign, "vec_id").select(
        "vec_id",
        F.col("cell_init").cast("long").alias("cell_init"),
        F.col("cell_id").cast("long").alias("cell_final"),
        (F.col("cell_init") != F.col("cell_id")).alias("moved"),
    )


def embedding_kmeans_eval(
    spark: SparkSession, sf_dir: str, iters: int = 2,
    mod: int = N_CELLS_MOD,
) -> DataFrame:
    """Clustering-quality read before trusting the refinement: mean
    cosine of every vector to its assigned centroid, init (sampled
    centroids) vs refined (after `iters` Lloyd rounds). The mean folds
    quantized-integer cosines (round(cos·1e12) as DECIMAL(38,0)) so it
    is order-independent and cross-engine exact — no sorted collect.
    Output: (phase, n_cells, n_vectors, mean_cos). Refinement
    monotonicity (refined >= init) is asserted in tests; the exact
    DuckDB oracle replays both phases."""
    emb = load_table(spark, sf_dir, "embeddings")
    cent0, a0, cent, assign = _lloyd_chain(emb, iters, mod)
    cent = cent.select("cell_id", "centroid")

    def _phase(name: str, c: DataFrame, a: DataFrame) -> DataFrame:
        cos = (
            emb.join(a, "vec_id")
            .join(F.broadcast(c), "cell_id")
            .select(
                "cell_id",
                F.round(
                    cosine_col("embedding", "centroid")
                    * F.lit(float(KMEANS_QUANT)),
                    0,
                )
                .cast("decimal(38,0)")
                .alias("qcos"),
            )
        )
        return cos.agg(
            F.countDistinct("cell_id").cast("long").alias("n_cells"),
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.round(
                F.sum("qcos").cast("string").cast("double")
                / (
                    F.count(F.lit(1)).cast("double")
                    * F.lit(float(KMEANS_QUANT))
                ),
                6,
            ).alias("mean_cos"),
        ).select(
            F.lit(name).alias("phase"), "n_cells", "n_vectors", "mean_cos"
        )

    return _phase("init", cent0, a0).unionAll(_phase("refined", cent, assign))


# --- hybrid retrieval: BM25 + vector ranks fused by RRF (round 10c) ----------


def _lex_ranks(
    spark: SparkSession, sf_dir: str, n_queries: int, sys_k: int
) -> DataFrame:
    """Per-query BM25 ranking (query-doc tokens as the term set,
    candidate-corpus df/avglen — the bm25_search arithmetic
    generalized per query): (qid, cid, lex_rnk <= sys_k). Shared by
    hybrid_search_rrf and the rank-metric eval."""
    from flapi_spark.operators.relational import bm25_idf_tfn
    from flapi_spark.operators.text import _tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(_tokens()).alias("tok"))
    qterms = (
        toks.where(F.col("doc_id") <= n_queries)
        .select(F.col("doc_id").alias("qid"), "tok")
        .distinct()
    )
    cand = toks.where(F.col("doc_id") > n_queries)
    lens = cand.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    tf = cand.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        F.broadcast(qterms)
        .join(tf, "tok")
        .join(F.broadcast(df_), "tok")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf, tfn = bm25_idf_tfn()
    lex_scores = (
        scored.select("qid", F.col("doc_id").alias("cid"),
                      (idf * tfn).alias("part"))
        .groupBy("qid", "cid")
        .agg(
            F.round(
                F.expr(
                    "aggregate(sort_array(collect_list(part)),"
                    " CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
                ),
                6,
            ).alias("score")
        )
    )
    wl = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("cid"))
    return (
        lex_scores.withColumn("lex_rnk", F.row_number().over(wl))
        .where(F.col("lex_rnk") <= sys_k)
        .select("qid", "cid", "lex_rnk")
    )


def _vec_ranks(
    spark: SparkSession, sf_dir: str, n_queries: int, sys_k: int
) -> DataFrame:
    """Brute-force cosine ranking: (qid, cid, vec_rnk <= sys_k); swaps
    to the persisted IVF probe at corpus scale. Shared by
    hybrid_search_rrf and the rank-metric eval."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") <= n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("eq")
    )
    c = emb.where(F.col("vec_id") > n_queries).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ec")
    )
    vec_scores = (
        F.broadcast(q)
        .join(c)
        .select("qid", "cid", cosine_col("eq", "ec").alias("cosine"))
    )
    wv = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        vec_scores.withColumn("vec_rnk", F.row_number().over(wv))
        .where(F.col("vec_rnk") <= sys_k)
        .select("qid", "cid", "vec_rnk")
    )


def hybrid_search_rrf(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 5,
    sys_k: int = 20,
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid lexical+vector retrieval with Reciprocal Rank Fusion
    (Cormack, Clarke & Buettcher SIGIR'09 — the fusion behind
    Elasticsearch/OpenSearch hybrid search and most RAG stacks):
    documents doc_id <= `n_queries` act as queries against the rest of
    the corpus; each candidate gets a BM25 rank (query-doc tokens as
    the term set, candidate-corpus df/avglen — the bm25_search
    arithmetic per query) and a cosine rank (doc_id == vec_id: the
    embeddings table carries one vector per document), the top
    `sys_k` list of each system fuses as
    rrf = Σ 1/(rrf_k + rank), absent list contributes 0, and the top
    `k` fused results return per query.

    Cross-engine exactness: BM25 parts fold in sorted order and round
    to 6dp (the bm25_search discipline); cosine is the shared _COS
    fold; ranks are integers, the fusion expression is two exact
    divisions summed in fixed order. Sentinel -1 (not NULL) marks a
    candidate absent from one system's list — integer rendering stays
    engine-identical.

    Scale shape: the lexical side is a postings join bounded by the
    query term sets (one token-explode groupBy for tf, df/avglen are
    broadcast scalars); the vector side here is the brute-force
    ann_bruteforce shape (broadcast queries × corpus stream) and swaps
    to the persisted IVF probe (ann_ivf_probe_indexed) at corpus
    scale; the fusion join carries ≤ 2·sys_k rows per query."""
    lex = _lex_ranks(spark, sf_dir, n_queries, sys_k)
    vec = _vec_ranks(spark, sf_dir, n_queries, sys_k)
    return _rrf_fuse(lex, vec, k, rrf_k)


def _rrf_fuse(
    lex: DataFrame, vec: DataFrame, k: int, rrf_k: int
) -> DataFrame:
    """THE RRF fusion + final rank (round-10c review: two inlined
    copies): full-outer join of (qid, cid, lex_rnk) and (qid, cid,
    vec_rnk), rrf = Σ 1/(rrf_k + rank) with absent lists contributing
    0, -1 sentinels for single-system candidates, (rrf desc, cid asc)
    rank capped at k. Output shape = the hybrid_search_rrf contract."""
    fused = lex.join(vec, ["qid", "cid"], "full_outer").select(
        "qid",
        "cid",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rnk")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(rrf_k) + F.col("vec_rnk")), F.lit(0.0)
            )
        ).alias("rrf"),
        F.coalesce("lex_rnk", F.lit(-1)).alias("lex_rnk"),
        F.coalesce("vec_rnk", F.lit(-1)).alias("vec_rnk"),
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("rrf"), F.asc("cid"))
    return (
        fused.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= k)
        .select(
            "qid",
            "cid",
            F.round("rrf", 6).alias("rrf_score"),
            F.col("lex_rnk").cast("long").alias("lex_rnk"),
            F.col("vec_rnk").cast("long").alias("vec_rnk"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


# --- MMR diversification over a retrieval pool (round 10c) -------------------


def retrieval_mmr_diversify(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 5,
    pool_k: int = 20,
    k: int = 5,
    lam: float = 0.5,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    SIGIR'98 — the standard diversity pass over a retrieval pool
    before stuffing a RAG context window): from each query's cosine
    top-`pool_k` pool, greedily select `k` results maximizing
    lam·rel(c) − (1−lam)·max_{s∈selected} sim(c, s) — relevance
    traded against redundancy with what is already picked.

    The greedy recurrence is inherently sequential in `k`, but every
    step is a BOUNDED dataframe op (pool is pool_k rows per query, the
    pairwise term ≤ pool_k·k rows) — the loop unrolls into one
    declarative plan, no driver collect; at corpus scale the pool
    build is the retrieval system (hybrid_search_rrf / the IVF probe)
    and MMR cost stays queries×pool_k², independent of corpus size.
    Deterministic: cosine folds are the shared _COS shape, max-sim is
    order-independent, ties break on cid asc; lam defaults to 0.5 so
    both engines' (1−lam) literal is exact. The exact DuckDB oracle
    unrolls the k steps as chained CTEs.

    Output: (qid, cid, step, mmr_score) — step 1 scores plain
    relevance (nothing is selected yet), later steps the MMR value at
    selection time, rounded to 6dp for rendering."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") <= n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("eq")
    )
    c = emb.where(F.col("vec_id") > n_queries).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ec")
    )
    scored = (
        F.broadcast(q)
        .join(c)
        .select("qid", "cid", "ec", cosine_col("eq", "ec").alias("rel"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("cid"))
    pool = (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= pool_k)
        .select("qid", "cid", "ec", "rel")
    )
    return _mmr_greedy(pool, k, lam)


def _mmr_greedy(pool: DataFrame, k: int, lam: float) -> DataFrame:
    """THE greedy MMR selection over a (qid, cid, ec, rel) pool
    (round-10c: shared by the cosine-pool entry and the hybrid-pool
    composition): k unrolled bounded steps, (score desc, cid asc)
    tie-break, step-1 score = plain relevance."""
    w = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("cid"))
    # the pool is queries×pool_k rows — checkpoint it so the k-step
    # unrolled plan re-reads a materialized pool instead of replaying
    # the corpus-wide scoring pass per step
    pool = pool.localCheckpoint(eager=True)
    sel = (
        pool.withColumn("r", F.row_number().over(w.orderBy(
            F.desc("rel"), F.asc("cid"))))
        .where(F.col("r") == 1)
        .select(
            "qid", "cid", F.lit(1).alias("step"),
            F.col("rel").alias("mmr_score"),
        )
    )
    for step in range(2, k + 1):
        sel_e = sel.join(
            pool.select("qid", "cid", F.col("ec").alias("es")),
            ["qid", "cid"],
        ).select("qid", F.col("cid").alias("sid"), "es")
        cand = pool.join(sel.select("qid", "cid"), ["qid", "cid"],
                         "left_anti")
        ms = (
            cand.join(sel_e, "qid")
            .select(
                "qid", "cid", "rel",
                cosine_col("ec", "es").alias("sim"),
            )
            .groupBy("qid", "cid")
            .agg(F.max("sim").alias("maxsim"), F.max("rel").alias("rel"))
        )
        mmr = ms.select(
            "qid", "cid",
            (
                F.lit(lam) * F.col("rel")
                - F.lit(1.0 - lam) * F.col("maxsim")
            ).alias("score"),
        )
        wp = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("cid")
        )
        pick = (
            mmr.withColumn("r", F.row_number().over(wp))
            .where(F.col("r") == 1)
            .select(
                "qid", "cid", F.lit(step).alias("step"),
                F.col("score").alias("mmr_score"),
            )
            # one row per query — materialize each step's pick so the
            # unrolled recurrence stays a union of k FLAT frames.
            # Lazily composed, step k re-embedded steps 2..k-1's whole
            # join trees inside its own (the final plan measured
            # ~620 KB formatted; Catalyst planning dominated the
            # query's 5 s wall). Same discipline as the iterative
            # graph ops: truncate lineage at each sequential step.
            .localCheckpoint(eager=True)
        )
        sel = sel.unionAll(pick)
    return sel.select(
        "qid", "cid", F.col("step").cast("long").alias("step"),
        F.round("mmr_score", 6).alias("mmr_score"),
    )


def ann_recall_eval_ivf(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    nprobe: int = 3,
    refine_iters: int = 2,
) -> DataFrame:
    """Does the k-means refinement PAY in retrieval quality? Recall@k
    of the IVF probe against brute-force ground truth, sampled vs
    refined centroids at the SAME nprobe — the measurement that
    justifies `write_ivf_index(refine_iters=)` (0.33 → 0.38 mean at
    sf0.01, nprobe=3). Same harness shape as ann_recall_eval; both
    variants reuse the shared _ivf_topk probe. Exact DuckDB oracle
    composes the kmeans CTEs with the IVF probe and recall join.

    Output: (variant, qid, n_true, n_hits, recall)."""
    emb = load_table(spark, sf_dir, "embeddings")
    brute = ann_bruteforce_topk(spark, sf_dir, k=k).select(
        "qid", F.col("cid").alias("bcid")
    )
    variants = (
        ("sampled", ivf_centroids(emb)),
        (
            "refined",
            kmeans_refine(emb, iters=refine_iters).select(
                "cell_id", "centroid"
            ),
        ),
    )
    out = None
    for name, cent in variants:
        got = _ivf_topk(emb, cent, 5, k, nprobe).select(
            "qid", F.col("cid").alias("lcid")
        )
        hits = brute.join(
            got,
            (brute.qid == got.qid) & (F.col("bcid") == F.col("lcid")),
            "left",
        ).select(
            brute.qid.alias("qid"),
            F.col("lcid").isNotNull().cast("int").alias("hit"),
        )
        r = (
            hits.groupBy("qid")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_true"),
                F.sum("hit").cast("long").alias("n_hits"),
                F.round(
                    F.sum("hit").cast("double") / F.count(F.lit(1)), 6
                ).alias("recall"),
            )
            .select(F.lit(name).alias("variant"), "qid", "n_true",
                    "n_hits", "recall")
        )
        out = r if out is None else out.unionAll(r)
    return out


def retrieval_eval_rankmetrics(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 10
) -> DataFrame:
    """IR rank-quality metrics for the retrieval family — binary-
    relevance nDCG@k and MRR of each system against brute-force cosine
    ground truth (the measurement a hybrid deployment tunes rrf_k /
    sys_k with): `vector` (the truth's own ranking — the nDCG=1 sanity
    anchor), `lexical` (per-query BM25 — how much of the semantic
    truth lexical evidence alone recovers), `hybrid` (RRF fusion).

    DCG terms 1/log2(rank+1) fold in sorted order and the final
    ndcg/mrr round to 6dp (the bm25 ln discipline — log2 via the same
    mirrored libm shape in the oracle). All list joins carry ≤ k rows
    per (system, query). Output: (system, qid, n_hits, mrr, ndcg)."""
    truth = ann_bruteforce_topk(spark, sf_dir, n_queries=n_queries, k=k)
    t = truth.select("qid", F.col("cid").alias("tcid"))
    idcg = truth.groupBy("qid").agg(
        F.expr(
            "aggregate(transform(sequence(1, count(1)),"
            " i -> CAST(1.0 AS DOUBLE) / log2(i + 1)),"
            " CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
        ).alias("idcg")
    )
    # lex/vec rankings computed ONCE at sys_k=20 (round-10c review:
    # the standalone systems and the fusion previously each re-ran the
    # corpus-wide scoring scans): the k-capped system lists and the
    # RRF fusion all derive from these two frames — rank prefixes are
    # rank-stable, so filtering <= k equals ranking at k directly
    lex = _lex_ranks(spark, sf_dir, n_queries, 20)
    vec = _vec_ranks(spark, sf_dir, n_queries, 20)
    systems = (
        ("vector",
         vec.where(F.col("vec_rnk") <= k)
         .select("qid", "cid", F.col("vec_rnk").alias("rnk"))),
        ("lexical",
         lex.where(F.col("lex_rnk") <= k)
         .select("qid", "cid", F.col("lex_rnk").alias("rnk"))),
        ("hybrid",
         _rrf_fuse(lex, vec, k, 60).select("qid", "cid", "rnk")),
    )
    out = None
    for name, ranked in systems:
        hits = ranked.join(
            t, (ranked.qid == t.qid) & (ranked.cid == t.tcid), "left_semi"
        )
        per_q = hits.groupBy("qid").agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.round(F.lit(1.0) / F.min("rnk"), 6).alias("mrr"),
            F.expr(
                "aggregate(sort_array(collect_list("
                " CAST(1.0 AS DOUBLE) / log2(rnk + 1))),"
                " CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
            ).alias("dcg"),
        )
        r = (
            idcg.join(per_q, "qid", "left")
            .select(
                F.lit(name).alias("system"),
                "qid",
                F.coalesce("n_hits", F.lit(0)).cast("long")
                .alias("n_hits"),
                F.coalesce("mrr", F.lit(0.0)).alias("mrr"),
                F.round(
                    F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)),
                    6,
                ).alias("ndcg"),
            )
        )
        out = r if out is None else out.unionAll(r)
    return out


def hybrid_probe_indexed(
    spark: SparkSession,
    sf_dir: str,
    postings_table: str,
    ivf_table: str,
    n_queries: int = 5,
    sys_k: int = 20,
    k: int = 10,
    rrf_k: int = 60,
    nprobe: int = 3,
) -> DataFrame:
    """Hybrid retrieval served ENTIRELY from persisted indexes (round
    10c — the production serving shape): the lexical side probes the
    bucketed BM25 postings index (query terms broadcast against the
    term-bucketed scan, candidate df aggregated bucket-locally, corpus
    constants from the frozen __stats sidecar), the vector side probes
    the bucketed IVF index (ann_ivf_probe_indexed — refined centroids
    from the frozen sidecar, `nprobe` cells per query), and RRF fuses
    the two top-sys_k lists. Per query batch NOTHING corpus-scale
    shuffles: both index scans are bucketed, both probe sides
    broadcast.

    Semantics vs the self-contained hybrid_search_rrf: idf/avglen
    read the index's corpus-GLOBAL frozen stats (the standard
    search-index contract) where the inline twin derives them from
    the candidate set, and the vector ranks are IVF-approximate
    rather than brute-force — this entry carries its own exact
    oracle replaying both."""
    from flapi_spark.operators.relational import bm25_idf_tfn
    from flapi_spark.operators.text import _tokens

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qterms = (
        docs.where(F.col("doc_id") <= n_queries)
        .select(
            F.col("doc_id").alias("qid"),
            F.explode(_tokens()).alias("tok"),
        )
        .distinct()
    )
    matched = (
        spark.table(postings_table)
        .join(F.broadcast(qterms.select("tok").distinct()), "tok")
        .where(F.col("doc_id") > n_queries)
    )
    df_ = matched.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    stats = spark.table(f"{postings_table}__stats")
    scored = (
        F.broadcast(qterms)
        .join(matched, "tok")
        .join(F.broadcast(df_), "tok")
        .crossJoin(F.broadcast(stats))
    )
    idf, tfn = bm25_idf_tfn()
    lex_scores = (
        scored.select("qid", F.col("doc_id").alias("cid"),
                      (idf * tfn).alias("part"))
        .groupBy("qid", "cid")
        .agg(
            F.round(
                F.expr(
                    "aggregate(sort_array(collect_list(part)),"
                    " CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
                ),
                6,
            ).alias("score")
        )
    )
    wl = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("cid"))
    lex = (
        lex_scores.withColumn("lex_rnk", F.row_number().over(wl))
        .where(F.col("lex_rnk") <= sys_k)
        .select("qid", "cid", "lex_rnk")
    )
    queries = emb.where(F.col("vec_id") <= n_queries)
    vec = ann_ivf_probe_indexed(
        spark, queries, ivf_table, k=sys_k, nprobe=nprobe
    ).select("qid", "cid", F.col("rnk").alias("vec_rnk"))
    return _rrf_fuse(lex, vec, k, rrf_k)


def retrieval_mmr_hybrid(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 5,
    pool_k: int = 20,
    k: int = 5,
    lam: float = 0.5,
) -> DataFrame:
    """The full RAG retrieval chain composed (round 10c): hybrid RRF
    retrieval → MMR diversification — relevance is the FUSED rrf
    score (lexical + vector evidence), redundancy is embedding cosine
    against the already-picked set. Same greedy core as
    retrieval_mmr_diversify (_mmr_greedy); the pool is
    hybrid_search_rrf's top-pool_k per query with each candidate's
    embedding joined back for the pairwise term. Exact DuckDB oracle
    chains the hybrid fusion CTEs into the MMR step CTEs."""
    emb = load_table(spark, sf_dir, "embeddings")
    pool = (
        hybrid_search_rrf(
            spark, sf_dir, n_queries=n_queries, k=pool_k
        )
        .select("qid", "cid", F.col("rrf_score").alias("rel"))
        .join(
            emb.select(
                F.col("vec_id").alias("cid"),
                F.col("embedding").alias("ec"),
            ),
            "cid",
        )
        .select("qid", "cid", "ec", "rel")
    )
    return _mmr_greedy(pool, k, lam)


# --- cluster-grain curation (round 10d) --------------------------------------
# Topic cards, prototypicality-capped keep-sets, and centroid-distance
# outlier pruning over the IVF/k-means cell structure. Reference
# parity: flAPI has no embedding operators; these extend the
# training-data curation suite (Sorscher et al. 2022, "Beyond neural
# scaling laws: beating power law scaling via data pruning" — keep the
# most prototypical members per cluster; DataComp-style cluster
# balancing) on top of the same cell machinery SemDeDup and the ANN
# index already use.


def assign_with_sim(
    emb: DataFrame, centroids: DataFrame, nprobe: int = 1
) -> DataFrame:
    """(vec_id, cell_id, sim): top-`nprobe` centroid assignment WITH
    the cosine kept — THE one assignment plan (ivf_assign is a
    column-dropping wrapper; the cluster-curation family ranks on the
    score). Broadcast centroids, one streamed scoring pass, shuffle
    carries only the narrow triple — raise the sampling modulus with
    corpus size to hold the centroid count (and so per-vector scoring
    cost) fixed."""
    scored = emb.repartition(
        emb.sparkSession.sparkContext.defaultParallelism, "vec_id"
    ).crossJoin(F.broadcast(centroids)).select(
        "vec_id", "cell_id", cosine_col("embedding", "centroid").alias("sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cell_id"))
    return (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= nprobe)
        .select("vec_id", "cell_id", "sim")
    )


def _cell_members(
    spark: SparkSession, sf_dir: str, mod: int, refine_iters: int = 0
) -> DataFrame:
    """Shared loader for the cluster-curation entries: embeddings
    assigned to sampled (or Lloyd-refined) cells, with the cosine kept.
    refine_iters=0 is the exact-oracle registry default; > 0 swaps in
    kmeans_refine centroids without changing any consumer's plan."""
    emb = load_table(spark, sf_dir, "embeddings")
    if refine_iters:
        centroids = kmeans_refine(emb, iters=refine_iters, mod=mod).select(
            "cell_id", "centroid"
        )
    else:
        centroids = ivf_centroids(emb, mod=mod)
    return assign_with_sim(emb, centroids)


def cluster_topic_card(
    spark: SparkSession, sf_dir: str, mod: int = 25, refine_iters: int = 0
) -> DataFrame:
    """Per-cluster corpus data card: how big each embedding cell is,
    how source-pure it is, and how long its documents run — the
    cluster-grain view a mixture/pruning decision reads before acting
    (the per-source twin is corpus_report; this is its semantic-topic
    dual). Embeddings carry one vector per document (vec_id == doc_id,
    the testdata contract semantic_dedup and hybrid retrieval use).

    Output: (cell_id, n_docs, n_sources, top_source, top_source_share,
    mean_chars) — dominant source by (count desc, source asc), shares
    and means as single divisions of exact integers (identical doubles
    in any IEEE engine; exact DuckDB oracle).

    Scale shape: one broadcast-scored assignment pass + one equi-join
    to documents on the id + two grouped aggregates — all linear, no
    pairwise term anywhere."""
    assign = _cell_members(spark, sf_dir, mod, refine_iters)
    docs = load_table(spark, sf_dir, "documents")
    return topic_card_rollup(assign, docs)


def topic_card_rollup(assign: DataFrame, docs: DataFrame) -> DataFrame:
    """THE topic-card aggregation over any (vec_id, cell_id)
    membership frame — shared by the inline entry and the
    persisted-IVF-index twin (one rollup plan, two membership
    sources)."""
    j = assign.select("vec_id", "cell_id").join(
        docs.select(F.col("doc_id").alias("vec_id"), "source",
                    "n_chars"),
        "vec_id",
    )
    per_src = j.groupBy("cell_id", "source").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("cell_id").orderBy(
        F.desc("n"), F.asc("source")
    )
    top = (
        per_src.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("cell_id", F.col("source").alias("top_source"),
                F.col("n").alias("n_top"))
    )
    tot = j.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").alias("chars"),
    )
    return tot.join(top, "cell_id").select(
        F.col("cell_id").cast("long").alias("cell_id"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_sources").cast("long").alias("n_sources"),
        "top_source",
        F.round(
            F.col("n_top").cast("double") / F.col("n_docs"), 6
        ).alias("top_source_share"),
        F.round(
            F.col("chars").cast("double") / F.col("n_docs"), 6
        ).alias("mean_chars"),
    )


def cluster_balanced_keepset(
    spark: SparkSession, sf_dir: str, per_cell: int = 20, mod: int = 25,
    refine_iters: int = 0,
) -> DataFrame:
    """Cluster-balanced selection: cap every embedding cell at its
    `per_cell` MOST prototypical members (cosine-to-centroid desc,
    vec_id tiebreak). Bounding each semantic cluster's contribution is
    the embedding-space dual of the per-source mixture cap
    (mixture_sample_keepset) — it stops one over-crawled topic from
    dominating the training mix no matter which sources it arrived
    from (Sorscher et al. 2022 keep-prototypical policy).

    Output: one row per vector — (vec_id, cell_id, proto_rank, kept).
    Exact DuckDB oracle (both engines rank the same IEEE cosine with
    the same integer tiebreak).

    Scale shape: assignment pass + one window over cells — cells are
    the partition key, so the rank never sees more than a cell's
    members; per-cell cap keeps the output linear in the corpus."""
    assign = _cell_members(spark, sf_dir, mod, refine_iters)
    w = Window.partitionBy("cell_id").orderBy(
        F.desc("sim"), F.asc("vec_id")
    )
    return assign.withColumn(
        "proto_rank", F.row_number().over(w)
    ).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("cell_id").cast("long").alias("cell_id"),
        F.col("proto_rank").cast("long").alias("proto_rank"),
        (F.col("proto_rank") <= per_cell).alias("kept"),
    )


def embedding_outlier_prune(
    spark: SparkSession, sf_dir: str, frac: float = 0.25, mod: int = 25,
    refine_iters: int = 0,
) -> DataFrame:
    """Centroid-distance outlier gate: flag the least-prototypical
    `frac` of every embedding cell (floor(frac · cell_n) members with
    the LOWEST cosine to their centroid — mislabeled, off-topic, or
    noisy points sit at cluster edges; Sorscher et al.'s easy-example
    pruning inverted for data cleaning). Cells smaller than 1/frac
    flag nothing (the floor is 0), so tiny clusters are never
    decimated.

    Output: one row per vector — (vec_id, cell_id, cell_n, outlier).
    Exact DuckDB oracle; frac enters as one double product of
    identical operands, so the floor matches cross-engine.

    Scale shape: same as cluster_balanced_keepset — one window per
    cell, nothing pairwise."""
    assign = _cell_members(spark, sf_dir, mod, refine_iters)
    w = Window.partitionBy("cell_id").orderBy(
        F.asc("sim"), F.desc("vec_id")
    )
    wc = Window.partitionBy("cell_id")
    return (
        assign.withColumn("bottom_rank", F.row_number().over(w))
        .withColumn("cell_n", F.count(F.lit(1)).over(wc))
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("cell_id").cast("long").alias("cell_id"),
            F.col("cell_n").cast("long").alias("cell_n"),
            (
                F.col("bottom_rank")
                <= F.floor(F.lit(frac) * F.col("cell_n"))
            ).alias("outlier"),
        )
    )


def ann_filtered_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 10,
    lang: str = "en",
) -> DataFrame:
    """Metadata-FILTERED vector search (the pgvector/Milvus serving
    shape every RAG stack needs: "nearest neighbors among docs
    matching a predicate"): exact cosine top-k restricted to corpus
    vectors whose document (vec_id == doc_id) passes a metadata
    filter. Pre-filtering is the exact strategy — the predicate
    narrows the corpus BEFORE scoring, so recall is 1.0 by
    construction (post-filtering an ANN list can starve k); at scale
    the same narrowing applies to the IVF probe's cell-cohabitant
    stream without changing this contract.

    Scale shape: the metadata filter is an equi-join to the documents
    scan (predicate pushes into the parquet scan), queries broadcast,
    per-query TakeOrdered. Exact DuckDB oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    meta = load_table(spark, sf_dir, "documents").where(
        F.col("lang") == lang
    ).select(F.col("doc_id").alias("cid"))
    q = emb.where(F.col("vec_id") <= n_queries).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("eq")
    )
    c = (
        emb.where(F.col("vec_id") > n_queries)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ec"))
        .join(meta, "cid")
    )
    scored = F.broadcast(q).join(c).select(
        "qid", "cid", cosine_col("eq", "ec").alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("qid", "cid", "cosine", "rnk")
    )


def ivf_cell_report(
    spark: SparkSession, sf_dir: str, mod: int = 25,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF index health report: the cell-size balance numbers an
    operator reads before trusting probe latency (IVF probe cost is
    bounded by the cells a query touches — one runaway cell means one
    runaway tail latency; imbalance = max/mean is the dial, and a
    high value says re-run the Lloyd refinement or raise the
    sampling modulus). Single-row output: (n_cells, n_vectors,
    min_cell, max_cell, mean_cell, imbalance) — divisions of exact
    integers, identical doubles cross-engine; exact oracle.

    Scale shape: one assignment pass + one (cell) groupBy + one
    scalar aggregate."""
    assign = _cell_members(spark, sf_dir, mod, refine_iters)
    sizes = assign.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("n").cast("long").alias("n_vectors"),
        F.min("n").cast("long").alias("min_cell"),
        F.max("n").cast("long").alias("max_cell"),
        F.round(
            F.sum("n").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_cell"),
        F.round(
            F.max("n").cast("double")
            * F.count(F.lit(1)).cast("double")
            / F.sum("n").cast("double"),
            6,
        ).alias("imbalance"),
    )


# deterministic benchmark membership for semantic decontamination:
# every 37th vector plays the held-out eval suite (~2.7% of the
# corpus) — the injected-ground-truth pattern the n-gram decontam
# entry (text.contamination_ngram_overlap) and the recall evals use
BENCHMARK_MOD = 37


def contamination_semantic(
    spark: SparkSession, sf_dir: str, threshold: float = 0.3,
    bench_mod: int = BENCHMARK_MOD,
) -> DataFrame:
    """SEMANTIC decontamination scores: for every non-benchmark
    corpus embedding, the max cosine against the benchmark set
    (vec_id % bench_mod == 0) and the contaminated verdict at
    `threshold` — the embedding-space complement of the n-gram
    decontam gate (paraphrased eval leakage shares no 8-gram but
    sits right next to the benchmark in embedding space; see Yang et
    al. 2023, "Rethinking Benchmark and Contamination"). The default
    threshold (0.3) is deliberately STRICTER than the near-dup
    cosine threshold (0.4): decontamination errs toward dropping.

    Output: (vec_id, max_cosine, contaminated) — one row per
    non-benchmark corpus vector. vec_id == doc_id is the corpus
    contract (same as semantic_dedup / hybrid retrieval).

    Scale shape (the 100 TB story): benchmark suites are TINY
    relative to the corpus (thousands of rows), so the benchmark
    side BROADCASTS without any pre-shuffle — the JOIN itself moves
    no corpus rows (BroadcastNestedLoopJoin); the corpus's only
    exchanges are the deliberate spread of its single-row-group
    input and the id-grain shuffle of the per-vector max, which
    folds map-side in the partial aggregate first. Cosines run as the
    whole-stage-codegen multiply-add chain (_unpacked_embeddings),
    not interpreted array folds. Cost is O(n·b) compares — inherent
    to exact max-similarity — spread over every core; for a
    benchmark too big to broadcast, pre-bucket both sides with the
    hyperplane LSH (dedup_embedding_lsh's machinery) and verify only
    cohabitants, trading exactness for recall like the dedup lane.

    Exact DuckDB oracle: same membership rule, same double-chain
    dot product (list_dot_product bridge), max over identical
    doubles is order-independent."""
    from flapi_spark.operators.dedup import (
        _pair_cosine, _unpacked_embeddings,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = _unpacked_embeddings(
        emb.where(F.pmod(F.col("vec_id"), F.lit(bench_mod)) != 0), "a"
    )
    # no repartition on the broadcast side: shuffling rows that are
    # immediately collected to the driver is wasted I/O
    bench = _unpacked_embeddings(
        emb.where(F.pmod(F.col("vec_id"), F.lit(bench_mod)) == 0),
        "b",
        repartition=False,
    )
    scored = corpus.join(F.broadcast(bench)).select(
        F.col("vec_a").alias("vec_id"), _pair_cosine().alias("cosine")
    )
    return scored.groupBy("vec_id").agg(
        F.max("cosine").alias("max_cosine")
    ).select(
        "vec_id",
        "max_cosine",
        (F.col("max_cosine") >= F.lit(threshold)).alias("contaminated"),
    )
