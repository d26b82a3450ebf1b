"""Graph analytics over the near-duplicate pair graph.

Near-dup pair streams (Jaccard / MinHash / SimHash / embedding LSH)
induce a graph whose structure carries curation signal beyond the
connected components already in `dedup.label_components`:

- PageRank identifies the most "central" duplicates — the template a
  boilerplate family radiates from — which is the right canonical
  survivor when clusters are stars rather than cliques.
- Triangle counts / clustering coefficients separate tight clique-like
  duplicate families (every member pairwise similar → safe to collapse
  to one survivor) from chains of borderline pairs (A~B~C with A≁C →
  collapsing to one doc loses content).

Both are classic iterative/multi-join graph computations re-expressed
as DataFrame ops, with deterministic integer arithmetic so a DuckDB
oracle replays them bit-for-bit (reference parity: flAPI has no graph
operators; these extend the training-data pipeline suite the same way
`dedup_connected_components` does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flapi_spark.operators.dedup import dedup_ngram_jaccard

# PageRank mass is tracked in fixed-point integer units (1.0 == SCALE).
# Floating-point PageRank sums neighbor contributions in partition
# order — nondeterministic across engines AND across runs; BIGINT
# sums are exact and associative, so every engine lands on the same
# value. Mass lost to floor-division truncation is deterministic too.
PR_SCALE = 10**12
PR_DAMP_NUM = 85  # damping 0.85 as an integer ratio
PR_DAMP_DEN = 100
PR_ITERATIONS = 5


def _undirected_edges(pairs: DataFrame) -> DataFrame:
    """(u, v) edge list with both directions from a (doc_a, doc_b)
    pair stream; localCheckpoint truncates lineage so iterative
    consumers don't double their plan every round.

    The input is materialized ONCE before the union with its own
    swap (round 12): both union branches embed the full pair lineage,
    so without the checkpoint the candidate chain's expansion joins
    run twice inside the symmetrize job. Id-grain rows only."""
    pairs = pairs.select("doc_a", "doc_b").localCheckpoint()
    return (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct()
        .localCheckpoint()
    )


def pagerank_fixed_point(
    pairs: DataFrame, iterations: int = PR_ITERATIONS
) -> DataFrame:
    """Fixed-point integer PageRank over an undirected pair graph.

    pr_0(u)    = SCALE // N
    pr_k+1(u)  = (SCALE * 15 // 100) // N
                 + (85 * Σ_{v∈nbr(u)} pr_k(v) // deg(v)) // 100

    All arithmetic is BIGINT (floor division, exact sums) — the result
    is identical in any engine, which is what makes the chained-CTE
    DuckDB oracle exact. Every node in a pair graph has degree ≥ 1, so
    there are no dangling nodes and every node receives ≥ 1
    contribution per round (no left-join needed).

    Scale shape: one shuffle per iteration (edges ⋈ ranks on v, then
    groupBy u) — the Pregel message-passing pattern as DataFrame ops.
    Degrees are computed once and PRE-JOINED onto the edge list
    (u, v, deg_v) outside the loop, so each iteration is a single
    join + one groupBy instead of two joins; lineage is truncated per
    round. The driver holds only the node COUNT (one scalar), never
    node data.
    """
    edges = _undirected_edges(pairs)
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    deg = deg.select(F.col("u").alias("node"), "deg").localCheckpoint()
    n = deg.count()
    if n == 0:
        return deg.select(
            F.col("node").alias("doc_id"), F.lit(0).cast("long").alias("pr_scaled")
        )
    init = PR_SCALE // n
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN) // n
    edges_d = (
        edges.join(deg, edges.v == deg.node)
        .select("u", "v", F.col("deg").alias("deg_v"))
        .localCheckpoint()
    )
    pr = deg.select("node", F.lit(init).cast("long").alias("pr"))
    # SHUFFLE_HASH on the node-grain side (round 12, guide §3.1):
    # checkpointed LogicalRDD frames report default stats, so Spark
    # plans SortMergeJoin inside the loop — re-SORTING the full edge
    # list every round. Hashing the rank/label side per partition
    # skips that sort; unlike a broadcast it stays partition-local
    # (node-grain build side sharded by the join key), so it is safe
    # at any scale where partitions are sized sanely. Measured −0.7 s
    # on this entry at sf0.1, bit-identical output.
    for i in range(iterations):
        pr = (
            edges_d.join(pr.hint("shuffle_hash"), edges_d.v == pr.node)
            .select("u", F.expr("pr div deg_v").alias("give"))
            .groupBy("u")
            .agg(F.sum("give").alias("inflow"))
            .select(
                F.col("u").alias("node"),
                (
                    F.lit(base)
                    + F.expr(f"({PR_DAMP_NUM} * inflow) div {PR_DAMP_DEN}")
                ).cast("long").alias("pr"),
            )
        )
        # lineage truncation every OTHER round: one materialization
        # job per two iterations (a 2-deep join/agg plan is still flat
        # for Catalyst; values are exact integers, so checkpoint
        # frequency cannot change the result)
        if i % 2 == 1 or i == iterations - 1:
            pr = pr.localCheckpoint()
    return pr.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("pr").cast("long").alias("pr_scaled"),
    )


def pagerank_neardup_graph(
    spark: SparkSession, sf_dir: str, threshold: float = 0.95
) -> DataFrame:
    """PageRank over the Jaccard near-dup pair graph (the same source
    `dedup_connected_components` uses, so the oracle shares its pair
    CTE). High-PR docs are the cluster templates — the survivor choice
    that keeps the most representative copy."""
    pairs = dedup_ngram_jaccard(spark, sf_dir, threshold).select("doc_a", "doc_b")
    return pagerank_fixed_point(pairs)


def triangle_counts(pairs: DataFrame) -> DataFrame:
    """Per-node triangle participation over a (doc_a < doc_b) pair
    stream, plus degree and the local clustering coefficient.

    Triangles enumerate as a 3-way self-join with the a < b < c
    orientation — each triangle appears exactly once. At 100 TB the
    standard refinement is degree-ordering the orientation so the join
    fans out from low-degree endpoints (same plan shape, bounded
    skew); near-dup graphs are tiny relative to their corpus either
    way (edges ≪ docs after LSH blocking).

    clustering = 2·T / (deg·(deg−1)) for deg ≥ 2 — one double
    division of two exact integers, rounded to 6dp: deterministic
    cross-engine (both engines divide the same two integers).
    """
    p = pairs.select(
        F.col("doc_a").cast("long").alias("a"), F.col("doc_b").cast("long").alias("b")
    ).distinct().localCheckpoint()
    e1 = p.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = p.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = p.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tris = e1.join(e2, "y").join(e3, ["x", "z"])
    members = (
        tris.select(F.col("x").alias("doc_id"))
        .union(tris.select(F.col("y").alias("doc_id")))
        .union(tris.select(F.col("z").alias("doc_id")))
    )
    tri_counts = members.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    deg = (
        p.select(F.col("a").alias("doc_id"))
        .union(p.select(F.col("b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    coef = F.when(
        F.col("degree") >= 2,
        F.round(
            (F.lit(2.0) * F.col("n_triangles"))
            / (F.col("degree") * (F.col("degree") - F.lit(1))),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(tri_counts, "doc_id", "left")
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("degree").cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        )
        .withColumn("clustering", coef)
    )


def triangle_count_neardup(
    spark: SparkSession, sf_dir: str, threshold: float = 0.95
) -> DataFrame:
    """Triangle counts / clustering coefficients over the Jaccard
    near-dup graph — clique-ness of each duplicate family."""
    pairs = dedup_ngram_jaccard(spark, sf_dir, threshold).select("doc_a", "doc_b")
    return triangle_counts(pairs)


def kcore_decompose(pairs: DataFrame, k: int = 2, max_iterations: int = 30) -> DataFrame:
    """k-core of an undirected pair graph: iteratively peel nodes with
    degree < k until a fixpoint — the densest-substructure filter that
    separates genuinely entangled duplicate families (members survive)
    from incidental chains and pendants (peeled away). A near-dup
    cluster's 2-core is its "no doubt" nucleus.

    Each round is one degree aggregate + one semi-join edge filter —
    linear shuffles; rounds needed = peeling depth (shallow for
    near-dup graphs). Lineage truncated per round (localCheckpoint),
    same discipline as label_components. Output: surviving (doc_id,
    degree-in-core). Golden-tested against a pure-Python peeler."""
    edges = _undirected_edges(pairs)
    n_prev = edges.count()  # carried across rounds: one count per round
    for _ in range(max_iterations):
        # TWO peels per materialization round: peeling is idempotent
        # at the fixpoint, so an equal edge count across a double peel
        # proves convergence of both (counts are monotone
        # non-increasing) — halves the driver-side job count without
        # changing the result
        for _peel in range(2):
            deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
            keep = deg.where(F.col("deg") >= k).select("u")
            edges = edges.join(keep, "u", "left_semi").join(
                keep.select(F.col("u").alias("v")), "v", "left_semi"
            )
        edges = edges.localCheckpoint()
        n_now = edges.count()
        if n_now == n_prev:
            break
        n_prev = n_now
    return (
        edges.groupBy("u")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .select(
            F.col("u").cast("long").alias("doc_id"),
            F.col("core_degree").cast("long").alias("core_degree"),
        )
    )


def kcore_neardup_graph(
    spark: SparkSession, sf_dir: str, threshold: float = 0.95, k: int = 2
) -> DataFrame:
    """2-core of the Jaccard near-dup graph (see kcore_decompose)."""
    pairs = dedup_ngram_jaccard(spark, sf_dir, threshold).select("doc_a", "doc_b")
    return kcore_decompose(pairs, k)


# --- label propagation (round 10d) ------------------------------------------

LPA_ITERATIONS = 3


def label_propagation(
    pairs: DataFrame, iterations: int = LPA_ITERATIONS
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over an
    undirected pair graph — community detection at a finer grain than
    connected components: a chain A~B~C where A≁C is ONE component but
    (after propagation) the labels reveal which side each borderline
    member leans toward, and on dense near-dup families the dominant
    label converges in 2-3 rounds. Deterministic variant: every node
    starts as its own label; each round a node adopts the most
    frequent label among its neighbors plus its own current label
    (self-vote — damps 2-cycle oscillation on bipartite-ish
    structures), ties broken toward the SMALLEST label. Fixed
    iteration count + integer tie-breaks ⇒ the unrolled chained-CTE
    DuckDB oracle replays every round bit-for-bit.

    Scale shape: per round, one join (edges ⋈ labels on v) + one
    (node, label) groupBy + one per-node max-struct aggregate — the
    same Pregel message-passing footprint as the integer PageRank.
    The mode pick is MAX over struct(n, -label) (lexicographic struct
    comparison ≡ the (count desc, label asc) total order — label is
    unique within a node after the count aggregate, so the argmax is
    the identical row the row_number window picked; round 11,
    measured: the window re-shuffled AND sorted every (node, label)
    candidate row per round, where the aggregate partial-aggregates
    map-side and exchanges only one row per node). Lineage truncated
    every other round."""
    edges = _undirected_edges(pairs)
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for i in range(iterations):
        votes = edges.join(
            labels.hint("shuffle_hash"), edges.v == labels.node
        ).select(
            "u", "label"
        ).unionAll(labels.select(F.col("node").alias("u"), "label"))
        counts = votes.groupBy("u", "label").agg(
            F.count(F.lit(1)).alias("n")
        )
        labels = (
            counts.groupBy("u")
            .agg(
                F.max(
                    F.struct(
                        F.col("n"), (-F.col("label")).alias("neg_label")
                    )
                ).alias("top")
            )
            .select(
                F.col("u").alias("node"),
                (-F.col("top.neg_label")).alias("label"),
            )
        )
        if i % 2 == 1 or i == iterations - 1:
            labels = labels.localCheckpoint()
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("community_size")
    )
    return labels.join(sizes, "label").select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("label").cast("long").alias("community"),
        F.col("community_size").cast("long").alias("community_size"),
    )


def lpa_neardup_graph(
    spark: SparkSession, sf_dir: str, threshold: float = 0.95
) -> DataFrame:
    """Label-propagation communities over the Jaccard near-dup graph
    (same pair source as the other inline graph entries, so the
    oracle shares its pair CTE)."""
    pairs = dedup_ngram_jaccard(spark, sf_dir, threshold).select(
        "doc_a", "doc_b"
    )
    return label_propagation(pairs)


def lpa_modularity(pairs: DataFrame, iterations: int = LPA_ITERATIONS) -> DataFrame:
    """Newman modularity of the LPA partition — the single number
    that says whether the propagated communities actually carve the
    near-dup graph at its joints (Q ≈ 0: no better than random;
    Q ≳ 0.3: real structure; the eval companion lpa_communities acts
    on, the way ann_recall_eval grades the ANN index):

        Q = Σ_c [ L_c/m − (d_c / 2m)² ]

    with L_c = intra-community edge count, d_c = community degree
    sum, m = distinct undirected edges — all exact integers, so every
    per-community term is one identical IEEE expression cross-engine
    (snapped to the 1e-12 grid, decimal-summed; exact oracle).

    Scale shape: the label pass is label_propagation; on top, one
    edge⋈label⋈label intra count + one degree aggregate — linear,
    keyed shuffles only. `m` is the one driver scalar (the pagerank
    node-count discipline)."""
    p = (
        pairs.select(
            F.col("doc_a").cast("long").alias("a"),
            F.col("doc_b").cast("long").alias("b"),
        )
        .distinct()
        .localCheckpoint()
    )
    labels = label_propagation(p.select(F.col("a").alias("doc_a"),
                                        F.col("b").alias("doc_b")),
                               iterations).select("doc_id", "community")
    m = p.count()
    la = labels.select(F.col("doc_id").alias("a"), F.col("community").alias("ca"))
    lb = labels.select(F.col("doc_id").alias("b"), F.col("community").alias("cb"))
    intra = (
        p.join(la, "a").join(lb, "b")
        .where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("c"))
        .agg(F.count(F.lit(1)).alias("lc"))
    )
    deg = (
        p.select(F.col("a").alias("node"))
        .union(p.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dc = (
        labels.join(deg, labels.doc_id == deg.node)
        .groupBy(F.col("community").alias("c"))
        .agg(F.sum("d").alias("dsum"))
    )
    r = F.col("dsum").cast("double") / F.lit(float(2 * m))
    term = F.col("lc").cast("double") / F.lit(float(m)) - r * r
    return (
        dc.join(intra, "c", "left")
        .select("c", F.coalesce("lc", F.lit(0)).alias("lc"), "dsum")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_communities"),
            F.lit(m).cast("long").alias("n_edges"),
            F.round(
                F.sum(F.round(term, 12).cast("decimal(38,12)"))
                .cast("double"),
                6,
            ).alias("modularity"),
        )
    )


def lpa_modularity_neardup(
    spark: SparkSession, sf_dir: str, threshold: float = 0.95
) -> DataFrame:
    """Modularity of the LPA communities over the Jaccard near-dup
    graph (see lpa_modularity)."""
    pairs = dedup_ngram_jaccard(spark, sf_dir, threshold).select(
        "doc_a", "doc_b"
    )
    return lpa_modularity(pairs)
