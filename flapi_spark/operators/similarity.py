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
    bits into one integer bucket. All shuffles are on vec_id."""
    planes = _planes_df(spark)
    ex = emb.select(
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
