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


def _planes_df(spark: SparkSession) -> DataFrame:
    rows = [
        (p, d, float(PLANES[p][d]))
        for p in range(N_PLANES)
        for d in range(64)
    ]
    return spark.createDataFrame(rows, "plane_id INT, pos INT, w DOUBLE")


def lsh_buckets(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """Sign-bit bucket id per vector: posexplode the embedding, join the
    broadcast planes table, tally per-plane dot products, fold sign
    bits into one integer bucket. All shuffles are on vec_id.

    The input is spread first — a single-row-group parquet scan would
    otherwise run the whole explode+tally on one core."""
    planes = _planes_df(spark)
    ex = emb.repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    ).select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    )
    dots = (
        ex.join(F.broadcast(planes), "pos")
        .groupBy("vec_id", "plane_id")
        .agg(F.sum(F.col("x").cast("double") * F.col("w")).alias("dot"))
    )
    bucket_bit = F.when(
        F.col("dot") > 0, F.expr("CAST(shiftleft(CAST(1 AS BIGINT), plane_id) AS BIGINT)")
    ).otherwise(F.lit(0).cast("long"))
    return dots.groupBy("vec_id").agg(
        F.sum(bucket_bit).cast("long").alias("bucket")
    )


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


def ivf_centroids(emb: DataFrame) -> DataFrame:
    """Deterministic centroid sample: every 25th corpus vector.

    The 100 TB path: centroids are a broadcast table (corpus/25 rows at
    most — cap or re-sample for a real deployment). A k-means
    refinement would slot in here without changing the probe side."""
    return emb.where(F.col("vec_id") % N_CELLS_MOD == 0).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )


def ivf_assign(vectors: DataFrame, centroids: DataFrame, nprobe: int = 1) -> DataFrame:
    """Assign each vector to its top-`nprobe` nearest centroids by
    cosine: one streamed pass (broadcast-scored + per-vector top-nprobe),
    shuffling only (vec_id, cell_id) pairs."""
    scored = vectors.repartition(
        vectors.sparkSession.sparkContext.defaultParallelism, "vec_id"
    ).crossJoin(F.broadcast(centroids)).select(
        "vec_id", "cell_id", cosine_col("embedding", "centroid").alias("sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cell_id"))
    return (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= nprobe)
        .select("vec_id", "cell_id")
    )


def ivf_assignments(
    spark: SparkSession, emb: DataFrame, nprobe: int = 1
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assignments) over one vector set — see ivf_centroids
    / ivf_assign for the two halves."""
    centroids = ivf_centroids(emb)
    return centroids, ivf_assign(emb, centroids, nprobe)


def ann_ivf_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 10,
    nprobe: int = 3,
) -> DataFrame:
    """IVF ANN top-k: corpus vectors live in 1 cell; queries probe their
    `nprobe` nearest cells; exact cosine only among cell-cohabitants
    (rows-only check; recall vs brute force asserted in tests)."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = ivf_centroids(emb)
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
