"""Deduplication operators over the `documents` table.

Training-data pipeline dedup suite, all expressed as shuffled
DataFrame plans (no Python UDFs, no driver loops):

- exact:      md5(normalized) hash-groupBy — one shuffle on the hash.
- n-gram Jaccard: inverted-index self-join (explode tokens, join on
  token, count shared) — the classic linear-shuffle candidate
  generator; exact DuckDB oracle.
- MinHash+LSH: shingle → xxhash64 → k universal-hash permutations →
  per-doc min-signature → banded bucket join → Jaccard-verify.
  Candidate generation is groupBy(band)-shaped: linear in corpus
  size, never O(n²). Verified against brute force in tests.
- SimHash:    per-bit token-hash voting → 64-bit fingerprint split in
  two 32-bit halves → 16-bit band blocking → Hamming verify.
- embedding cosine: exact pair similarity above a threshold (scale
  path = LSH bucketing in operators/similarity.py).
"""

from __future__ import annotations

import random
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flapi_spark.operators.text import norm_text
from flapi_spark.session import load_table

MERSENNE_P = 2147483647  # 2^31 - 1, universal-hash modulus

_rng = random.Random(42)
NUM_PERM = 64
PERMS = [(_rng.randrange(1, MERSENNE_P), _rng.randrange(0, MERSENNE_P))
         for _ in range(NUM_PERM)]
BANDS = 16  # 16 bands x 4 rows


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split(norm_text(), " ")).alias("toks")
    )


def _exploded_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tok) stream of distinct tokens per doc.

    PERF: explode the token expression directly — exploding a
    previously projected array column makes Spark re-evaluate the
    array-building expression per exploded output row (measured ~8×
    slower at sf0.1)."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(norm_text(), " "))).alias("tok"),
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by md5(normalized text); canonical = min id."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(norm_text()).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def dedup_exact_survivors(
    spark: SparkSession, sf_dir: str, within: DataFrame | None = None
) -> DataFrame:
    """The deduplicated corpus: one doc per fingerprint (min doc_id).
    `within` (round 11 — pipeline survivor_scope="keepset") restricts
    the election to a (doc_id) frame: same min-id policy, grouped over
    only those docs. ONE fingerprint definition for every consumer —
    the corpus entry, the keepset stage, and write_exact_index."""
    docs = load_table(spark, sf_dir, "documents")
    if within is not None:
        docs = docs.join(within.select("doc_id"), "doc_id", "left_semi")
    fp = docs.select("doc_id", F.md5(norm_text()).alias("fingerprint"))
    keep = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    return keep.select("doc_id", "fingerprint")


def dedup_ngram_jaccard(
    spark: SparkSession, sf_dir: str, threshold: float = 0.95
) -> DataFrame:
    """Word-set Jaccard near-dup pairs — EXACT, via AllPairs prefix
    filtering (Bayardo, Ma & Srikant, WWW'07).

    The naive inverted-index self-join generates Σ_token df² candidate
    rows — quadratic in document frequency, which detonates exactly on
    the corpora dedup exists for (boilerplate-heavy, small-vocab). The
    AllPairs identity keeps the result EXACT while indexing only each
    document's PREFIX: order every token set by a global total order
    (document frequency ascending, token as tie-break — rarest first),
    and index the first n − ⌈t·n⌉ + 1 tokens. Any pair with
    J ≥ t must (a) satisfy the size filter t·na ≤ nb ∧ t·nb ≤ na and
    (b) share at least one token inside BOTH prefixes (the smallest-
    ordered common token lies in each side's prefix — overlap ≥ ⌈t·n⌉
    per side under the size filter). Candidates are then verified by
    the true intersection, so over-generation can never change the
    result. At t = 0.95 the prefix is ~5% of each set and lands on the
    rarest tokens, collapsing candidate volume by orders of magnitude
    — at 100 TB this is the difference between a feasible exact-
    Jaccard pass and none.

    The candidate join also applies PPJoin's POSITIONAL filter (Xiao
    et al., WWW'08): a pair matching on prefix tokens at ranks
    (rka, rkb) can share at most 1 + min(na − rka, nb − rkb) tokens,
    because each doc's tokens are sorted by the SAME global (df, tok)
    order — at the pair's smallest common token every other common
    token sits at a strictly later rank on both sides. J ≥ t needs
    overlap ≥ t·(na+nb)/(1+t), so occurrences whose bound falls short
    are dropped; a qualifying pair always survives via its first
    common token (where the bound is valid and met). Round 11,
    measured at sf0.1: candidates 2.14 M → 0.91 M distinct with the
    IDENTICAL 190,925 verified pairs, verify stage ~2× cheaper.

    The ceil guards subtract 1e-9 before ceiling: float error can then
    only ENLARGE a prefix / RELAX the size filter (more candidates,
    still exact), never drop a qualifying pair — and the positional
    bound subtracts 1e-9 from its threshold for the same one-sided
    slack. The emitted jaccard is the same shared/(na+nb−shared)
    division as the all-pairs oracle — bit-identical doubles.

    EXACT-SET COLLAPSE (round 12, guide §8: decide on a lightweight
    proxy): Jaccard is a function of the token SET alone, so docs with
    identical sets are interchangeable — the pair machinery runs over
    one REPRESENTATIVE per distinct set (min doc_id over the set's
    md5 fingerprint, the dedup_exact idiom) and the result expands
    back afterwards: within-group pairs are exactly J = 1.0 (shared =
    na = nb ⇒ na/na), and every cross-group doc pair inherits its
    group pair's jaccard (identical inputs ⇒ identical IEEE division).
    Near-dup corpora are exactly where exact-dup families are large —
    measured at sf0.1: 5,000 docs → 3,935 distinct sets, candidate
    pairs 1.81 M → 0.96 M, verify CPU 69 s → 9 s, the 35,606
    within-family pairs (one 248-doc family alone is 30,628) never
    touch array_intersect at all. The group fingerprint/membership
    checkpoints are id-grain rows (doc_id, fp/rep — never text). The
    df that orders each prefix is counted over representatives; any
    consistent total order keeps AllPairs exact (both sides rank by
    the same order), and verification is unchanged.

    The verify input is hash-repartitioned to defaultParallelism by
    pair id before the array_intersect joins: AQE's byte-based
    coalescing sees ~1 MB partitions of candidate ids and packs this
    compute-dense stage onto 1-2 cores (measured 9 s on 2 tasks —
    the _shingles explicit-exchange lesson)."""
    from pyspark.sql import Window

    t = threshold
    dp = spark.sparkContext.defaultParallelism
    # one fingerprint per doc (id-grain), groups -> min-id representative
    docset = load_table(spark, sf_dir, "documents").repartition(
        dp, "doc_id"
    ).select(
        "doc_id",
        F.md5(
            F.concat_ws(
                "\x1f", F.array_sort(F.array_distinct(F.split(norm_text(), " ")))
            )
        ).alias("fp"),
    )
    reps = docset.groupBy("fp").agg(F.min("doc_id").alias("rep"))
    # ONE checkpoint job covers the whole fingerprint tree (the fp
    # projection evaluates on both join inputs inside the same job —
    # cheaper than a second materialization round-trip)
    mem = docset.join(reps, "fp").select("doc_id", "rep").localCheckpoint()
    rep_ids = mem.where(F.col("doc_id") == F.col("rep")).select("doc_id")

    toks = _doc_tokens(spark, sf_dir).join(rep_ids, "doc_id", "left_semi")
    inv = _exploded_tokens(spark, sf_dir).join(rep_ids, "doc_id", "left_semi")
    df_tok = inv.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = inv.join(df_tok, "tok")
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    wc = Window.partitionBy("doc_id")
    pre = (
        ranked.select(
            "doc_id",
            "tok",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        .where(
            F.col("rk")
            <= F.col("n") - F.ceil(F.col("n") * t - 1e-9) + 1
        )
    )
    a = pre.select(
        F.col("doc_id").alias("doc_a"), "tok",
        F.col("n").alias("na"), F.col("rk").alias("rka"),
    )
    b = pre.select(
        F.col("doc_id").alias("doc_b"), "tok",
        F.col("n").alias("nb"), F.col("rk").alias("rkb"),
    )
    cand = (
        a.join(
            b,
            (a.tok == b.tok)
            & (F.col("doc_a") < F.col("doc_b"))
            & (F.col("nb").cast("double") >= F.col("na") * t - 1e-9)
            & (F.col("na").cast("double") >= F.col("nb") * t - 1e-9)
            # PPJoin positional bound (see docstring): achievable
            # overlap from this occurrence on, vs the J ≥ t minimum
            & (
                (
                    F.lit(1)
                    + F.least(
                        F.col("na") - F.col("rka"),
                        F.col("nb") - F.col("rkb"),
                    )
                ).cast("double")
                >= (F.col("na") + F.col("nb")) * (t / (1.0 + t)) - 1e-9
            ),
        )
        .select("doc_a", "doc_b", "na", "nb")
        .distinct()
        # explicit pair-keyed exchange: pin the verify stage's
        # parallelism (AQE would byte-coalesce these skinny id rows
        # onto 1-2 cores and serialize the array_intersect work)
        .repartition(dp, "doc_a", "doc_b")
    )
    ta = toks.select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta")
    )
    tb = toks.select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb")
    )
    shared = F.size(F.array_intersect("ta", "tb"))
    jac = shared.cast("double") / (
        F.col("na") + F.col("nb") - shared
    )
    rep_pairs = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            F.col("doc_a").alias("ra"),
            F.col("doc_b").alias("rb"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        # collision-grade row count (true group pairs only — 2,049 at
        # sf0.1), id-grain: materialize so consumers whose plans embed
        # the pair stream twice (_undirected_edges' union with its own
        # swap) run the candidate join + verify ONCE
        .localCheckpoint()
    )
    # expand representatives back to doc pairs (see docstring):
    # within-group pairs are exactly 1.0; cross-group pairs inherit
    # their group pair's jaccard
    ma = mem.select(F.col("rep").alias("ra"), F.col("doc_id").alias("da"))
    mb = mem.select(F.col("rep").alias("rb"), F.col("doc_id").alias("db"))
    within = (
        ma.join(mb, ma.ra == mb.rb)
        .where(F.col("da") < F.col("db"))
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    cross = rep_pairs.join(ma, "ra").join(mb, "rb").select(
        F.least("da", "db").alias("doc_a"),
        F.greatest("da", "db").alias("doc_b"),
        "jaccard",
    )
    return within.unionAll(cross)


def _shingles(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """Word n-gram shingles per doc (ordered tokens, then n-grams).

    The documents table often lands as one row-group (one input split),
    which would serialize the whole shingle→signature pipeline onto a
    single core — spread docs across the cluster first. The shuffle is
    tiny (raw text) compared to the exploded shingle stream it unlocks
    parallelism for."""
    # Tokenize BEFORE the exchange, build n-grams AFTER it. The
    # exchange is deliberate and load-bearing twice over:
    # 1. parallelism — an explicit partition count that AQE won't
    #    coalesce spreads the compute-dense gram/hash stages across the
    #    cluster even when the corpus is small in bytes;
    # 2. a CollapseProject barrier — in a single projection the token
    #    array would be inlined into the per-gram lambda, re-running
    #    regexp+split once per shingle (O(tokens²) per doc). Across the
    #    exchange the token array is materialized once per doc.
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(norm_text(), " ").alias("t")).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    grams = F.expr(
        f"array_distinct(transform(sequence(0, greatest(size(t) - {n}, 0)),"
        f" i -> concat_ws(' ', slice(t, i + 1, {n}))))"
    )
    return toks.select("doc_id", grams.alias("shingles"))


def hashed_shingles(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """(doc_id, h32) stream of hashed word n-gram shingles.

    PERF: each token is xxhash64'd ONCE, then every n-gram hash is an
    arithmetic fold of its n token hashes (nested (a_j·h + acc) mod p)
    — no per-shingle string materialization (the concat_ws form
    allocated a string per shingle and re-hashed overlapping tokens
    n times; measured ~2× slower at sf0.1). A different-but-equally-
    uniform shingle fingerprint: Jaccard over these equals Jaccard
    over string shingles up to 2^-31 collisions. Short docs (< n
    tokens) fold their partial gram with OOB positions as 0, matching
    the old slice() semantics of one gram per doc."""
    docs = load_table(spark, sf_dir, "documents")
    return hashed_shingles_from(docs, n)


# portable token hash: md5-prefix — bit-identical in any engine with
# md5 (15 hex chars = 60 bits, fits BIGINT); ~3× slower than xxhash64
MD5_TOK_HASH = (
    f"pmod(cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint), {MERSENNE_P})"
)


def hashed_shingles_from(
    docs: DataFrame, n: int = 3, tok_hash_sql: str | None = None
) -> DataFrame:
    """hashed_shingles over an arbitrary documents DataFrame (lets the
    verify stage hash only candidate docs instead of the corpus).
    `tok_hash_sql` swaps the per-token hash expression (default
    xxhash64; MD5_TOK_HASH for the engine-portable variant)."""
    tok_hash = tok_hash_sql or f"pmod(xxhash64(x), {MERSENNE_P})"
    toks = docs.select("doc_id", F.split(norm_text(), " ").alias("t")).repartition(
        docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    tok_hashes = toks.select(
        "doc_id",
        F.expr(f"transform(t, x -> {tok_hash})").alias("ht"),
    )
    # nested modular fold keeps every intermediate < 2^62 + 2^31
    gram = "0"
    for j in range(n - 1, -1, -1):
        a = PERMS[j][0]
        gram = (
            f"pmod({a} * coalesce(try_element_at(ht, i + {j + 1}), 0)"
            f" + {gram}, {MERSENNE_P})"
        )
    grams = F.expr(
        f"array_distinct(transform(sequence(0, greatest(size(ht) - {n}, 0)),"
        f" i -> {gram}))"
    )
    return tok_hashes.select("doc_id", F.explode(grams).alias("h"))


def minhash_signatures_from_hashed(hashed: DataFrame) -> DataFrame:
    """Per-doc MinHash signature: k universal-hash minima in ONE
    codegen'd groupBy — (a*h + b) mod p per permutation."""
    mins = [
        F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(MERSENNE_P))).alias(f"m{i}")
        for i, (a, b) in enumerate(PERMS)
    ]
    return hashed.groupBy("doc_id").agg(*mins)


def minhash_signatures(shingled: DataFrame) -> DataFrame:
    """Signatures from a (doc_id, shingles array) DF (test/compat path;
    the production pipeline uses hashed_shingles directly)."""
    ex = shingled.select("doc_id", F.explode("shingles").alias("sh"))
    hashed = ex.select(
        "doc_id", F.pmod(F.xxhash64(F.col("sh")), F.lit(MERSENNE_P)).alias("h")
    )
    return minhash_signatures_from_hashed(hashed)


def lsh_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """Banded LSH: hash each r-row band, bucket-join docs per band."""
    r = NUM_PERM // BANDS
    bands = F.array(*[
        F.struct(
            F.lit(band).alias("band_id"),
            F.xxhash64(*[F.col(f"m{band * r + j}") for j in range(r)]).alias("bh"),
        )
        for band in range(BANDS)
    ])
    exploded = sigs.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band_id").alias("band_id"), F.col("b.bh").alias("bh")
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def dedup_minhash_lsh(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """MinHash-LSH near-dup pairs, Jaccard-verified on true shingle sets.

    Pipeline: shingle-hash stream → signature groupBy (codegen'd k-min
    agg, 1 shuffle) → band buckets (1 shuffle) → candidate pairs →
    Jaccard-verify on hashed shingle sets built ONLY for candidate docs
    (semi-join first — at corpus scale candidates are ≪ corpus, so set
    materialization is pair-bounded, not corpus-bounded).
    Hashed-shingle Jaccard equals raw-shingle Jaccard up to 2^-31 hash
    collisions.

    The shingle-hash stream is deliberately NOT persisted: it is read
    twice (signatures, verify sets) but recomputing narrow codegen'd
    hashes from the page-cached scan measures the same as caching the
    exploded stream locally, and at 100 TB materializing the exploded
    stream (10-100× the corpus bytes) is exactly the wrong trade —
    lineage recompute keeps the memory footprint bounded by the scan.
    The SIGNATURE table double-compute is also deliberate (round 8,
    measured): the band self-join recomputes the scan→hash→64-perm
    chain on both aliases, but that is embarrassingly-parallel map
    work over a page-cached scan — materializing the signatures first
    (localCheckpoint) measured 1.5x SLOWER at sf0.1 (2.7 s vs 1.7 s;
    store+reread beats recompute only when the corpus no longer fits
    page cache). The hash-ONCE production path is the persisted band
    index (write_band_index*/pairs_from_band_index), not an in-query
    materialization.

    SIDE EFFECT (round-9 ADVICE note): the candidate materialization
    below is an EAGER localCheckpoint, so merely CONSTRUCTING this
    DataFrame runs the candidate-generation job — explain-only
    callers pay it too. Checkpoint blocks are also unreplicated;
    executor loss mid-query fails the run (fine in this single-JVM
    framework; a multi-executor deploy would pass
    `spark.checkpoint.dir` and use reliable checkpoints here). Both
    are the accepted price of leak-free candidate reuse — see the
    inline comment."""
    hashed = hashed_shingles(spark, sf_dir)
    sigs = minhash_signatures_from_hashed(hashed)
    # candidates materialized ONCE via eager localCheckpoint, not
    # persist(): the pair set is read twice (semi-join arm + final
    # join) but a persist pinned one cached candidate set PER CALL
    # forever (the r5 cache-lifecycle rule the incremental op was
    # fixed for; round 8 closes the same leak here) — checkpoint
    # blocks are released by the ContextCleaner when the plan is
    # GC'd, so repeated invocations cannot accumulate storage
    cands = lsh_candidate_pairs(sigs).localCheckpoint(eager=True)
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # semi-join the RAW docs before hashing: the verify branch then
    # tokenizes+hashes only candidate docs, not the corpus again.
    # UNHINTED: the candidate set is data-dependent (corpus-shaped on a
    # dup-heavy crawl) — AQE broadcasts it only while measured-small; a
    # pinned hint would OOM the driver exactly when dedup matters most.
    cand_texts = load_table(spark, sf_dir, "documents").join(
        cand_docs, "doc_id", "left_semi"
    )
    sets = (
        hashed_shingles_from(cand_texts)
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("hs"))
    )
    wa = sets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha"))
    wb = sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb"))
    inter = F.size(F.array_intersect("ha", "hb")).cast("double")
    union = F.size(F.array_union("ha", "hb"))
    return (
        cands.join(wa, "doc_a")
        .join(wb, "doc_b")
        .select("doc_a", "doc_b", (inter / union).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def _simhash_from_bits(ex: DataFrame, hi_bits: F.Column, lo_bits: F.Column) -> DataFrame:
    """(doc_id, hi, lo) SimHash fingerprints from a (doc_id, tok)
    stream: each token votes ±1 per bit of its hash (bits 0-31 from
    `lo_bits`, 32-63 from `hi_bits`, both unsigned 32-bit values);
    fingerprint bit = sign of the tally. 64 conditional sums in one
    groupBy — wide but fully codegen'd, one shuffle."""
    votes = [
        F.sum(
            F.when(
                F.shiftright(src, bit).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"s{off + bit}")
        for off, src in ((0, lo_bits), (32, hi_bits))
        for bit in range(32)
    ]
    tallied = ex.groupBy("doc_id").agg(*votes)

    def half(lo_bit: int) -> F.Column:
        terms = [
            F.when(F.col(f"s{lo_bit + i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(32)
        ]
        return reduce(lambda x, y: x + y, terms).cast("long")

    return tallied.select(
        "doc_id", half(32).alias("hi"), half(0).alias("lo")
    )


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per doc as two unsigned 32-bit halves (hi, lo),
    token-hashed with xxhash64 (the fast in-Spark default)."""
    ex = _exploded_tokens(spark, sf_dir)
    h = F.xxhash64(F.col("tok"))
    return _simhash_from_bits(
        ex,
        hi_bits=F.shiftright(h, 32).bitwiseAND(F.lit(0xFFFFFFFF)),
        lo_bits=h.bitwiseAND(F.lit(0xFFFFFFFF)),
    )


def simhash_fingerprints_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints with ENGINE-PORTABLE md5-derived hash bits
    (hi/lo = first/second 8 hex chars of md5(token)) — reproducible in
    any engine with md5; exact DuckDB oracle via dedup_simhash_portable."""
    ex = _exploded_tokens(spark, sf_dir)
    return _simhash_from_bits(
        ex,
        hi_bits=F.expr("cast(conv(substr(md5(tok), 1, 8), 16, 10) as bigint)"),
        lo_bits=F.expr("cast(conv(substr(md5(tok), 9, 8), 16, 10) as bigint)"),
    )


def hamming_band_rows(fps: DataFrame, n_bands: int = 4) -> DataFrame:
    """(doc_id, hi, lo, band_id, bv) exploded band rows over (doc_id,
    hi, lo) 64-bit fingerprints — the blocking key stream shared by
    the in-query pair generators (_simhash_pairs) and the persisted
    fingerprint index (multimodal.write_phash_index). Stateless per
    row, so legal on streams.

    n_bands must split the two 32-bit halves evenly (2/4/8/16/32):
    any other count would silently skip fingerprint bits at the hi/lo
    boundary (e.g. 3 bands of 21 bits cover bits 0-20, 21-31-zeropad,
    32-52 — bits 53-63 in NO band), turning the pigeonhole recall
    guarantee into quiet misses."""
    if n_bands not in (2, 4, 8, 16, 32):
        raise ValueError(
            f"hamming_band_rows: n_bands must be one of 2/4/8/16/32,"
            f" got {n_bands}"
        )
    bpb = 64 // n_bands
    mask = F.lit((1 << bpb) - 1)

    def band(i: int) -> F.Column:
        src = F.col("lo") if i * bpb < 32 else F.col("hi")
        return F.struct(
            F.lit(i).alias("band_id"),
            F.shiftright(src, (i * bpb) % 32).bitwiseAND(mask).alias("bv"),
        )

    return fps.select(
        "doc_id", "hi", "lo",
        F.explode(F.array(*[band(i) for i in range(n_bands)])).alias("b"),
    ).select("doc_id", "hi", "lo", "b.band_id", "b.bv")


def hamming_col(a_hi: str, a_lo: str, b_hi: str, b_lo: str) -> F.Column:
    """Full-64-bit Hamming distance between two (hi, lo) fingerprint
    pairs, as BIGINT (the oracles' bit_count arithmetic)."""
    return (
        F.bit_count(F.col(a_hi).bitwiseXOR(F.col(b_hi)))
        + F.bit_count(F.col(a_lo).bitwiseXOR(F.col(b_lo)))
    ).cast("long")


def _simhash_pairs(
    fps: DataFrame, max_hamming: int, n_bands: int = 4
) -> DataFrame:
    """Banded SimHash pair generation + Hamming verify over (doc_id,
    hi, lo) fingerprints: block on any equal (64/n_bands)-bit band,
    verify Hamming distance over the full 64 bits. Default 4 bands of
    16 bits (the oracle-pinned text-SimHash shape); the image/audio
    lanes (multimodal.mm_phash_pairs / mm_audio_fingerprint_pairs)
    use 8 bands of 8 bits — pigeonhole guarantees a matching band
    whenever hamming < n_bands, so wider verify radii need more
    (narrower) bands: recall vs bucket-size trade, same dial as
    MinHash-LSH's band count."""
    banded = hamming_band_rows(fps, n_bands)
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(
        F.col("a.hi").bitwiseXOR(F.col("b.hi"))
    ) + F.bit_count(F.col("a.lo").bitwiseXOR(F.col("b.lo")))
    return (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.bv") == F.col("b.bv"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                # long: the oracle's bit_count arithmetic is BIGINT
                hamming.cast("long").alias("hamming"))
        # filter BEFORE the distinct (round 9): hamming is a function
        # of the pair, so rows are identical either way but the dedup
        # shuffle carries only surviving pairs, not every band
        # coincidence
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def dedup_simhash(
    spark: SparkSession, sf_dir: str, max_hamming: int = 6
) -> DataFrame:
    """SimHash near-dup pairs (xxhash64 token bits — fast default)."""
    return _simhash_pairs(simhash_fingerprints(spark, sf_dir), max_hamming)


def dedup_simhash_portable(
    spark: SparkSession, sf_dir: str, max_hamming: int = 6
) -> DataFrame:
    """SimHash near-dup pairs with ENGINE-PORTABLE md5-derived token
    bits: same ±1-vote fingerprints, same 16-bit band blocking, same
    full-64-bit Hamming verify, but every stage reproducible in any
    engine with md5 — checked by an exact DuckDB oracle. Fingerprints
    computed elsewhere (another engine, a previous corpus snapshot)
    stay comparable."""
    return _simhash_pairs(
        simhash_fingerprints_portable(spark, sf_dir), max_hamming
    )


COSINE_SQL = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def cosine_col(a: str, b: str) -> F.Column:
    """Cosine similarity between two array<float> columns, computed in
    double, fully JVM-side (zip_with + aggregate — no UDF)."""
    dot = F.expr(COSINE_SQL.format(a=a, b=b))
    na = F.sqrt(F.expr(COSINE_SQL.format(a=a, b=a)))
    nb = F.sqrt(F.expr(COSINE_SQL.format(a=b, b=b)))
    return dot / (na * nb)


N_DIMS = 64


def _unpacked_embeddings(
    emb: DataFrame, suffix: str, repartition: bool = True
) -> DataFrame:
    """(vec_<suffix>, norm_<suffix>, 64 double columns).

    PERF: Spark's higher-order array functions (aggregate/zip_with in
    cosine_col) are INTERPRETED per element — fine for thousands of
    pair scores, catastrophic for pairwise dedup (measured ~80 s for
    4M pairs at sf0.1). Unpacking the fixed 64 dims into scalar
    columns turns the per-pair dot product into a whole-stage-codegen
    multiply-add chain (~40× faster). The sum is chained in index
    order from 0.0, so results stay bit-identical to the sequential
    aggregate() fold and the DuckDB list_dot_product oracle."""
    cols = [
        F.element_at("embedding", i + 1).cast("double").alias(f"e{i}{suffix}")
        for i in range(N_DIMS)
    ]
    # embeddings.parquet is a single row-group → one input split; the
    # pairwise join streams this side, so spread it or the whole O(n²)
    # compare runs on one core. Callers about to BROADCAST the result
    # pass repartition=False — shuffling rows that are immediately
    # collected to the driver is pure wasted I/O (round-10e review fix)
    if repartition:
        emb = emb.repartition(
            emb.sparkSession.sparkContext.defaultParallelism, "vec_id"
        )
    df = emb.select(F.col("vec_id").alias(f"vec_{suffix}"), *cols)
    sq = F.lit(0.0)
    for i in range(N_DIMS):
        sq = sq + F.col(f"e{i}{suffix}") * F.col(f"e{i}{suffix}")
    return df.withColumn(f"norm_{suffix}", F.sqrt(sq))


def _pair_cosine() -> F.Column:
    dot = F.lit(0.0)
    for i in range(N_DIMS):
        dot = dot + F.col(f"e{i}a") * F.col(f"e{i}b")
    return dot / (F.col("norm_a") * F.col("norm_b"))


# block count for the exact all-pairs equi-join rewrite: fixed (not
# data-dependent) so the plan is stable; 64 keys keep every core busy
# on local[32] and hash-spread evenly at any corpus size
EXACT_PAIR_BLOCKS = 64


def dedup_embedding_cosine(
    spark: SparkSession, sf_dir: str, threshold: float = 0.4
) -> DataFrame:
    """Embedding near-dup pairs: exact pairwise cosine ≥ threshold.

    This is the exact (quadratic) baseline — correct at any selectivity
    but O(n²) compares; the 100 TB path buckets by random-hyperplane
    LSH first (dedup_embedding_lsh) so only bucket-cohabitant pairs
    are scored. Dot products run as codegen'd scalar chains (see
    _unpacked_embeddings).

    The all-pairs schedule is a BLOCK-REPLICATED EQUI-JOIN, not a
    broadcast nested loop (r7 verdict: the previous pinned
    F.broadcast hard-aborted past Spark's 8 GB broadcast limit
    instead of degrading): the b side is bucketed by vec_id into
    EXACT_PAIR_BLOCKS blocks, the a side replicated once per block,
    and the join is an ordinary shuffled equi-join on the block id
    with vec_a < vec_b as a residual predicate. Replication costs
    O(n·B) rows against the O(n²) compares the operator inherently
    performs; no broadcast, no cartesian product, and work spreads
    over B keys regardless of corpus size."""
    B = EXACT_PAIR_BLOCKS
    emb = load_table(spark, sf_dir, "embeddings")
    a = _unpacked_embeddings(emb, "a").withColumn(
        "blk", F.explode(F.sequence(F.lit(0), F.lit(B - 1)))
    )
    b = _unpacked_embeddings(emb, "b").withColumn(
        "blk_b", F.pmod(F.col("vec_b"), F.lit(B)).cast("int")
    )
    return (
        a.join(
            b,
            (F.col("blk") == F.col("blk_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", _pair_cosine().alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def dedup_embedding_lsh(
    spark: SparkSession, sf_dir: str, threshold: float = 0.4,
    n_bands: int = 3, max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs via banded random-hyperplane LSH — the
    scale path for dedup_embedding_cosine. The 12-bit sign signature is
    split into `n_bands` bands; a candidate pair shares at least one
    whole band (the classic OR-construction). Candidate generation is
    an EQUI-join on (band_id, band_bits) — linear shuffles, no corpus
    broadcast, no theta/nested-loop join — then exact cosine verifies
    each candidate via the codegen'd unpacked columns.

    Selectivity at threshold 0.4: each plane agrees with probability
    1 - arccos(t)/π ≈ 0.63, so a 4-bit band matches with p≈0.157 and
    3 bands give ≈40-47%% recall of true pairs while admitting ~18%% of
    random pairs (measured). Precision is 1.0 — every reported pair is
    exactly verified. Rows-only check; subset-of-exact precision and
    recall vs the exact operator are asserted in tests.

    Candidate volume is DATA-DEPENDENT: on isotropic random vectors
    (the synthetic test corpus — the adversarial case) the admitted
    fraction is a constant of all O(n²) pairs, so verify cost grows
    quadratically; real near-dup corpora cluster, making bucket
    co-membership sparse. For uniform-like data at scale, raise
    selectivity with more/narrower bands (recall trades down) or use
    more planes.

    `max_bucket_size` is the candidate-volume GUARD for such corpora:
    bands whose bucket exceeds it are dropped before the self-join, so
    verify work is bounded by n_buckets * cap² instead of O(n²) —
    overfull buckets on adversarial data carry almost no signal per
    pair. The trade: a genuine near-dup cluster larger than the cap
    loses its intra-cluster pairs from THIS band (another band may
    still catch them); size the cap above the expected max cluster.
    Default None preserves exhaustive banded behavior."""
    from flapi_spark.operators.similarity import N_PLANES, lsh_buckets

    emb = load_table(spark, sf_dir, "embeddings")
    buckets = lsh_buckets(spark, emb)
    band_width = N_PLANES // n_bands
    mask = (1 << band_width) - 1
    bands = buckets.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band_id"),
                    F.shiftright("bucket", band_width * i)
                    .bitwiseAND(F.lit(mask))
                    .alias("bits"),
                )
                for i in range(n_bands)
            ])
        ).alias("b"),
    ).select("vec_id", "b.band_id", "b.bits")
    if max_bucket_size is not None:
        # window count shares the (band_id, bits) partitioning with the
        # candidate self-join below — one logical shuffle, reused
        from pyspark.sql import Window

        w = Window.partitionBy("band_id", "bits")
        bands = (
            bands.withColumn("__bn", F.count(F.lit(1)).over(w))
            .where(F.col("__bn") <= max_bucket_size)
            .drop("__bn")
        )
    # Spread the probe side: the bucket table is narrow (a few longs
    # per vector) and a small-file scan arrives as one partition, so
    # without this the pair explosion runs in a single task.
    # Partitioning on vec_id (not the join key) keeps the spread even
    # when a band bucket is hot.
    par = spark.sparkContext.defaultParallelism
    ca = bands.repartition(par, "vec_id").select(
        F.col("vec_id").alias("vec_a"), "band_id", "bits"
    )
    cb = bands.select(F.col("vec_id").alias("vec_b"), "band_id", "bits")
    cands = (
        ca.join(cb, ["band_id", "bits"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
    )
    a = _unpacked_embeddings(emb, "a")
    b = _unpacked_embeddings(emb, "b")
    # A pair found by several bands is verified once per band and
    # deduped AFTER the cosine filter: distinct on the few survivors
    # (not the full candidate stream) trades ≤n_bands cheap re-verifies
    # (64 FMA each) for skipping a full-candidate-volume shuffle.
    return (
        cands.join(a, "vec_a")
        .join(b, "vec_b")
        .select("vec_a", "vec_b", _pair_cosine().alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .distinct()
    )


def dedup_connected_components(
    spark: SparkSession, sf_dir: str, threshold: float = 0.95,
    max_iterations: int = 20,
) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the Jaccard pair
    graph, labeling every member with its component's minimum doc_id
    (the canonical survivor). Pairwise dedup output (doc_a, doc_b) is
    not directly actionable — keep/drop decisions need the transitive
    closure: if A~B and B~C, all three are one group even when A~C
    scored below threshold.

    Algorithm: alternating large-star/small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — O(log n) rounds
    regardless of graph diameter; see label_components. Near-dup
    clusters are usually shallow (stars/cliques around a template,
    2-4 rounds either way), but chained/serialized boilerplate
    produces long-path components where diameter-bound propagation
    degrades and this does not.

    Output: (doc_id, component_id) for every doc in some dup pair;
    singletons are not emitted (they need no dedup decision).

    The pair GENERATION dominates the cost, not the propagation: the
    default Jaccard inverted-index source is quadratic on tiny-vocab
    corpora (every token is hot — this synthetic corpus has ~31
    distinct tokens). At scale, feed `label_components` from the
    MinHash-LSH pair stream instead; the propagation itself is
    diameter-many linear shuffles either way. The Jaccard source stays
    the registry default because it is SQL-expressible (recursive-CTE
    oracle).
    """
    pairs = dedup_ngram_jaccard(spark, sf_dir, threshold).select("doc_a", "doc_b")
    return label_components(pairs, max_iterations)


def label_components(
    pairs: DataFrame, max_iterations: int = 30, checkpoint_pairs: bool = True
) -> DataFrame:
    """Connected components over an arbitrary (doc_a, doc_b) pair
    stream — compose with any candidate generator (Jaccard, MinHash,
    SimHash, embedding LSH). Labels every node with its component's
    MINIMUM id (the same fixpoint min-label propagation reaches).

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) —
    O(log n) rounds instead of O(graph diameter), with the identical
    per-round shape (one groupBy-min + one join per star operation).
    Min-label propagation needs diameter-many rounds, and near-dup
    corpora DO produce deep components adversarially: serialized /
    chained boilerplate (paginated articles, threaded forums) yields
    long path graphs where each extra round is a full edges⋈labels
    shuffle. Large-star hangs every node's larger neighbors off the
    local minimum (halving long paths each round); small-star
    compacts the smaller neighbors onto it. The edge set converges to
    a star forest whose roots are the component minima.

    Per round: large-star = symmetrize → groupBy(u).min(closed
    neighborhood) → join back (one shuffle pair); small-star = the
    same over the hi→lo-oriented output (large-star output is already
    oriented, so no second symmetrize). Lineage is truncated per round
    with localCheckpoint — mandatory for iterative DataFrame
    algorithms, else the plan doubles every round. Convergence is an
    exact edge-set comparison (both sides distinct, so subtract +
    count); a graph that has not converged within max_iterations
    raises instead of silently emitting truncated (WRONG) labels —
    30 rounds covers components of ~2^30 nodes.

    Output: (doc_id, component_id) for every node that appears in a
    pair; singletons are not emitted (they need no dedup decision).
    """
    # Materialize the pair stream ONCE before deriving nodes and edges
    # from it: callers hand in expensive lineages (band-index probes,
    # Jaccard verifies, levenshtein candidate joins), and two separate
    # checkpoints would re-run that upstream twice. A caller whose
    # pairs are ALREADY materialized (e.g. a filter over an eagerly
    # checkpointed stream) opts out with checkpoint_pairs=False to
    # avoid a pure data copy.
    pairs = pairs.select("doc_a", "doc_b")
    if checkpoint_pairs:
        pairs = pairs.localCheckpoint()
    nodes = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select("doc_b"))
        .distinct()
    )
    # canonical hi→lo orientation, deduped — star operations below
    # preserve this invariant, which keeps the convergence comparison
    # exact (set equality of distinct oriented edges)
    edges = (
        pairs.select(
            F.greatest("doc_a", "doc_b").alias("u"),
            F.least("doc_a", "doc_b").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    # Convergence = the edge set is a STAR FOREST (round 12): a
    # hi→lo-oriented distinct edge set is a fixpoint of
    # large-star∘small-star iff every u appears exactly once (one
    # parent) and no v ever appears as a u (roots are never
    # children). Forward direction by direct evaluation: on a star
    # forest {(c_i, r)} large-star re-emits exactly {(c_i, r)} (each
    # child's closed-neighborhood min is its root; only the root has
    # larger neighbors) and small-star maps it to itself (the
    # join-back leg collapses to (r, r) and is filtered; the smins
    # leg IS the forest). Conversely a duplicated u or a u∩v chain
    # is rewired by the next round, so a non-forest is never a
    # fixpoint. Checking the CURRENT edge set directly replaces the
    # old count + subtract pair with one cheap action over the
    # checkpointed blocks AND drops the extra no-op round the
    # equality test needed to observe new == old (an empty edge set
    # is trivially a forest, covering the old isEmpty fast path).
    def _is_star_forest(e: DataFrame) -> bool:
        dup = (
            e.groupBy("u")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 1)
        )
        chain = e.select("v").join(
            e.select(F.col("u").alias("v")), "v", "left_semi"
        )
        return (
            dup.select(F.lit(1).alias("x"))
            .unionAll(chain.select(F.lit(1).alias("x")))
            .isEmpty()
        )

    converged = False
    for _ in range(max_iterations + 1):
        if _is_star_forest(edges):
            converged = True
            break
        # large-star: every node attaches its strictly-larger
        # neighbors to the minimum of its closed neighborhood
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmins = sym.groupBy("u").agg(
            F.min(F.least(F.col("v"), F.col("u"))).alias("m")
        )
        # shuffle_hash on the node-grain mins side (the graph.py
        # round-join rationale: checkpointed frames default to SMJ,
        # which re-sorts the edge stream every round)
        large = (
            sym.join(lmins.hint("shuffle_hash"), "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: every node attaches its smaller neighbors (and
        # itself) to their minimum; large-star output is already
        # hi→lo oriented (it emits (bigger, closed-min)), so the
        # smaller-neighbor set of u is exactly its v column
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        edges = (
            large.join(smins.hint("shuffle_hash"), "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()  # truncate lineage each round
        )
    if not converged:
        raise RuntimeError(
            f"label_components did not converge in {max_iterations} "
            "large-star/small-star rounds — the pair graph is deeper "
            f"than 2^{max_iterations} nodes or adversarial; raise "
            "max_iterations rather than accept truncated labels"
        )
    # star forest: every non-root points at its component minimum;
    # roots (and nothing else) are absent from the u column
    return (
        nodes.join(edges, nodes.doc_id == edges.u, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("v"), F.col("doc_id"))
            .cast("long")
            .alias("component_id"),
        )
    )


def _doc_tiles(docs: DataFrame, chunk: int) -> DataFrame:
    """(doc_id, chunk) non-overlapping `chunk`-token tiles — the ONE
    tiling shared by dedup_chunk_boilerplate and boilerplate_share
    (and mirrored verbatim in both oracles): docs shorter than one
    tile contribute nothing (the size guard also keeps
    F.sequence(0, -1) from descending)."""
    t = docs.select(
        "doc_id", F.split(norm_text(), " ").alias("t")
    ).where(F.size("t") >= chunk)
    return t.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), (F.size("t") / chunk).cast("int") - 1)
        ).alias("i"),
        "t",
    ).select(
        "doc_id",
        F.array_join(
            F.slice("t", F.col("i") * chunk + 1, F.lit(chunk)), " "
        ).alias("chunk"),
    )


def dedup_chunk_boilerplate(
    spark: SparkSession, sf_dir: str, chunk: int = 5, min_docs: int = 2
) -> DataFrame:
    """Paragraph-level (fixed-size token-chunk) duplicate detection —
    the boilerplate-removal primitive of C4-style corpus cleaning:
    hash every `chunk`-token span (non-overlapping) and report spans
    occurring in >= `min_docs` distinct documents.

    100 TB shape: one narrow projection + explode (linear, no joins),
    then a single groupBy on the chunk text — map-side partial
    aggregation collapses repeats before the shuffle, so shuffle
    volume is bounded by DISTINCT chunk count, not corpus size.
    Exact DuckDB oracle in flapi_spark/queries.py."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = _doc_tiles(docs, chunk)
    return (
        chunks.groupBy("chunk")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occur"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def boilerplate_share(
    spark: SparkSession, sf_dir: str, chunk: int = 5, min_docs: int = 2,
    max_share: float = 0.3,
) -> DataFrame:
    """Per-document CORPUS-boilerplate share (round 10b) — the gate
    form of dedup_chunk_boilerplate: tile each doc into
    non-overlapping `chunk`-token spans (same tiling), mark spans
    appearing in >= `min_docs` distinct docs corpus-wide, and report
    each doc's duplicated-tile fraction plus the keep verdict
    (share <= max_share on the ROUNDED value). This is the
    RefinedWeb line-dedup / C4 duplicated-span document gate: a doc
    that is mostly corpus-boilerplate (headers, footers, templated
    text) gets dropped even when its Gopher-style WITHIN-doc
    repetition stats look clean. Docs shorter than one tile carry
    share 0.0 (nothing measurable, keep).

    100 TB shape: tiling is a linear explode; the duplicated-span
    set aggregates with map-side combine (shuffle bounded by
    DISTINCT chunk count); the share join is equi on the chunk text.
    Exact DuckDB oracle in flapi_spark/queries.py."""
    docs = load_table(spark, sf_dir, "documents")
    tiles = _doc_tiles(docs, chunk)
    dup = (
        tiles.groupBy("chunk")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("chunk", F.lit(1).alias("is_dup"))
    )
    per_doc = (
        tiles.join(dup, "chunk", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tiles"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).alias("nd"),
        )
    )
    share = F.when(
        F.coalesce(F.col("n_tiles"), F.lit(0)) == 0, F.lit(0.0)
    ).otherwise(
        F.col("nd").cast("double") / F.col("n_tiles")
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_tiles"), F.lit(0)).cast("long").alias("n_tiles"),
        F.coalesce(F.col("nd"), F.lit(0)).cast("long").alias("n_dup_tiles"),
        F.round(share, 6).alias("boilerplate_share"),
        (F.round(share, 6) <= max_share).alias("keep"),
    )


def dedup_minhash_portable(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """MinHash-LSH near-dup pairs with ENGINE-PORTABLE hashing: the
    exact pipeline of dedup_minhash_lsh, but (1) tokens hash via an
    md5-prefix universal hash instead of xxhash64 and (2) band buckets
    join on the raw r-row signature tuple instead of an xxhash64 band
    digest. Every stage is then reproducible in any engine with md5 —
    corpus fingerprints can be recomputed outside Spark, and the full
    MinHash algorithm (shingle fold, k-min signatures, banded
    OR-construction, Jaccard verify) is checked against an exact
    DuckDB oracle. ~md5-cost slower than the xxhash64 default; same
    scale shape (linear shuffles, candidate-bounded verify)."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = hashed_shingles_from(docs, tok_hash_sql=MD5_TOK_HASH)
    sigs = minhash_signatures_from_hashed(hashed)
    r = NUM_PERM // BANDS
    bands = F.array(*[
        F.struct(
            F.lit(band).alias("band_id"),
            *[F.col(f"m{band * r + j}").alias(f"b{j}") for j in range(r)],
        )
        for band in range(BANDS)
    ])
    # Band rows are materialized ONCE (eager localCheckpoint) before
    # the self-join. Round 8 measured recompute-on-both-aliases faster
    # for the xxhash64 chain, but the md5 token hash is ~3× costlier —
    # re-measured round 11: recompute 4.3 s vs materialize 2.7 s at
    # sf0.1 (identical pairs). The checkpointed rows are id-grain
    # proxies (doc_id + BANDS×r BIGINTs per doc, never text), so the
    # store stays metadata-sized at 100 TB while the corpus is scanned
    # and hashed exactly once. Same lifecycle note as
    # dedup_minhash_lsh's candidate checkpoint: construction runs the
    # signature job eagerly; blocks are GC-managed.
    ex = sigs.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", "b.band_id",
        *[F.col(f"b.b{j}").alias(f"b{j}") for j in range(r)],
    ).localCheckpoint(eager=True)
    keys = ["band_id"] + [f"b{j}" for j in range(r)]
    ca = ex.select(F.col("doc_id").alias("doc_a"), *keys)
    cb = ex.select(F.col("doc_id").alias("doc_b"), *keys)
    # cands is consumed three times by the verify (both legs of the
    # candidate-doc semi-join source plus the final pair join) — the
    # deduped pair ids are tiny (collision-bounded), so materialize
    # them once instead of re-running the band self-join per consumer
    # (round 11; same lifecycle note as the band rows above)
    cands = (
        ca.join(cb, keys)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    return _verify_jaccard_md5(docs, cands, threshold)


def _verify_jaccard_sets(
    sets: DataFrame, cands: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against
    pre-computed (doc_id, hs) shingle sets — the arithmetic shared by
    the inline md5 verify arm and the persisted shingle-store probe,
    so every pair source stays bit-identical."""
    wa = sets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha"))
    wb = sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb"))
    inter = F.size(F.array_intersect("ha", "hb")).cast("double")
    union = F.size(F.array_union("ha", "hb"))
    return (
        cands.join(wa, "doc_a")
        .join(wb, "doc_b")
        .select("doc_a", "doc_b", (inter / union).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def _verify_jaccard_md5(
    docs: DataFrame, cands: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of a candidate pair set against the
    md5-hashed shingle sets of the candidate documents — the
    dedup_minhash_portable verify arm, shared with the persisted-index
    probe (pairs_from_band_index) so both paths stay bit-identical.
    The doc semi-join is UNHINTED: candidate volume is data-dependent
    (see dedup_minhash_lsh) — AQE picks broadcast only while small."""
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_texts = docs.join(cand_docs, "doc_id", "left_semi")
    sets = (
        hashed_shingles_from(cand_texts, tok_hash_sql=MD5_TOK_HASH)
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("hs"))
    )
    return _verify_jaccard_sets(sets, cands, threshold)


def dedup_keep_best_survivors(
    spark: SparkSession, sf_dir: str, pairs: DataFrame | None = None
) -> DataFrame:
    """Quality-aware survivor selection over near-dup clusters: label
    every document with its MinHash-LSH connected component (portable
    pipeline — exact-oracle-replayable end to end), then keep ONE doc
    per cluster by a quality policy (max token count, doc_id
    tiebreak) instead of the naive min-id. Unclustered docs form their
    own singleton component and survive. This is the keep/drop
    decision layer a production dedup actually ships: cluster, pick
    the best exemplar, drop the rest.

    `pairs` (round 8) overrides the pair source — production passes
    the persisted-index stream (pairs_from_band_index with a shingle
    store: identical rows, zero corpus re-hash); default rebuilds the
    self-contained portable chain, which is what the oracle replays.

    Scale shape: adds one broadcast-sized join (component labels cover
    only docs in some dup pair) and one per-component window over the
    full corpus partitioned by component — a single extra shuffle on
    top of the pair stream + propagation."""
    from pyspark.sql import Window

    from flapi_spark.operators.text import _tokens

    docs = load_table(spark, sf_dir, "documents")
    if pairs is None:
        pairs = dedup_minhash_portable(spark, sf_dir).select(
            "doc_a", "doc_b"
        )
    comps = label_components(pairs)
    base = docs.select(
        "doc_id", F.size(_tokens()).cast("long").alias("n_tokens")
    )
    labeled = (
        base.join(comps, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component_id"), F.col("doc_id"))
            .cast("long")
            .alias("component_id"),
            "n_tokens",
        )
    )
    w = Window.partitionBy("component_id").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    return labeled.select(
        "doc_id",
        "component_id",
        "n_tokens",
        (F.row_number().over(w) == 1).alias("keep"),
    )


def semdedup_clusters(
    spark: SparkSession, sf_dir: str, threshold: float = 0.4,
    cells_mod: int = 25, refine_iters: int = 0,
    within: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the
    embedding corpus, then deduplicate ONLY within clusters — pairs in
    the same cluster with cosine ≥ threshold drop the higher vec_id,
    lowest id survives. Clustering makes semantic dedup linear: the
    pairwise comparison never crosses cluster boundaries, so the
    quadratic term is bounded by the largest cluster, not the corpus.

    Cluster assignment reuses the IVF machinery (deterministic sampled
    centroids; `refine_iters` > 0 swaps in the Lloyd-refined centroids
    — similarity.kmeans_refine — without changing this plan): centroids
    broadcast, each vector scored once, shuffle carries only
    (vec_id, cell_id). The within-cluster self-join is equi-keyed on
    cell_id. Output: one row per vector with its cluster and keep/drop
    verdict (exact DuckDB oracle replays assignment, pairing, and
    verdict bit-for-bit at the refine_iters=0 registry default).

    `within` (round 11 — pipeline survivor_scope="keepset"): a
    (vec_id) frame restricting the PAIRWISE verdicts to those vectors
    — cell assignment (and the returned row set) stays corpus-wide and
    corpus-stable, but only within-`within` pairs can drop a vector,
    so the lowest surviving id per dup pair is the exemplar."""
    from flapi_spark.operators.similarity import (
        cosine_col, ivf_assign, ivf_centroids, kmeans_refine,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    if refine_iters:
        centroids = kmeans_refine(
            emb, iters=refine_iters, mod=cells_mod
        ).select("cell_id", "centroid")
    else:
        centroids = ivf_centroids(emb, mod=cells_mod)
    assign = ivf_assign(emb, centroids, nprobe=1)
    tagged = emb.join(assign, "vec_id")
    if within is not None:
        tagged = tagged.join(
            within.select("vec_id"), "vec_id", "left_semi"
        )
    a = tagged.select(
        F.col("cell_id").alias("ca"),
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
    )
    b = tagged.select(
        F.col("cell_id").alias("cb"),
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
    )
    dropped = (
        a.join(b, (a.ca == b.cb) & (a.va < b.vb))
        .where(cosine_col("ea", "eb") >= threshold)
        .select(F.col("vb").alias("vec_id"))
        .distinct()
        .withColumn("dropped", F.lit(True))
    )
    return (
        assign.join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cell_id").cast("long").alias("cell_id"),
            F.coalesce(~F.col("dropped"), F.lit(True)).alias("keep"),
        )
    )


def dedup_substring_spans(
    spark: SparkSession, sf_dir: str, chunk: int = 5, min_docs: int = 2
) -> DataFrame:
    """Maximal duplicated-substring spans per document — the span view
    of exact-substring deduplication (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better": remove any substring
    duplicated across the corpus, not just whole-document dups).

    Suffix-array substring dedup is inherently sequential; the
    distributed re-expression tiles each doc into non-overlapping
    `chunk`-token windows (the dedup_chunk_boilerplate tiling), marks
    tiles whose text occurs in >= `min_docs` docs corpus-wide, and
    merges ADJACENT duplicated tiles into maximal token spans with the
    classic island trick (tile_index - row_number is constant within a
    run). Output: one row per maximal span with its token interval —
    the cut list a scrubbing pass consumes.

    100 TB shape: tiling is a linear projection; the duplicated-tile
    set re-joins as an UNHINTED left-semi — on a boilerplate-light
    corpus it is small and AQE broadcasts it, but on a dup-heavy crawl
    every ≥2-doc span qualifies and the set is corpus-shaped, where a
    pinned broadcast hint would OOM the driver and an unhinted join
    gracefully shuffles on the chunk key. The island window partitions
    by doc_id — one corpus-scale shuffle. Exact DuckDB oracle replays
    tiling, marking and merging."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.split(norm_text(), " ").alias("t")
    ).where(F.size("t") >= chunk)
    tiles = t.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), (F.size("t") / chunk).cast("int") - 1)
        ).alias("i"),
        "t",
    ).select(
        "doc_id",
        "i",
        F.array_join(
            F.slice("t", F.col("i") * chunk + 1, F.lit(chunk)), " "
        ).alias("chunk"),
    )
    dup_tiles = (
        tiles.groupBy("chunk")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("chunk")
    )
    flagged = tiles.join(dup_tiles, "chunk", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("i")
    islands = flagged.withColumn(
        "island", F.col("i") - F.row_number().over(w)
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("i").alias("i0"),
            F.max("i").alias("i1"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            (F.col("i0") * chunk).cast("long").alias("start_token"),
            ((F.col("i1") + 1) * chunk - 1).cast("long").alias("end_token"),
            F.col("n_chunks").cast("long").alias("n_chunks"),
        )
    )


def dedup_incremental_pairs(
    spark: SparkSession,
    existing_docs: DataFrame,
    new_docs: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental MinHash-LSH maintenance: near-dup pairs introduced
    by a batch of NEW documents against the existing corpus + within
    the batch — the continuous-dedup step a 100 TB ingestion pipeline
    runs per cache append instead of re-deduplicating the corpus.

    Work is delta-proportional: signatures/bands are computed for the
    NEW docs only; the candidate join probes new-doc bands against
    (existing ∪ new) bands, so cost scales with |new| × bucket
    density, never |corpus|². In production the existing side's band
    table is the persisted index (written once at bootstrap, appended
    per batch — exactly the CacheManager append flow); here it is
    recomputed from the existing docs to keep the operator
    self-contained. Verification hashes only candidate members.
    Equality with the full recompute (restricted to pairs touching new
    docs) is asserted in tests."""
    new_bands = band_rows_for(new_docs)
    all_bands = band_rows_for(existing_docs).unionByName(new_bands)
    a, b = new_bands.alias("a"), all_bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        )
        .distinct()
        .persist()
    )
    # cache released before return (eager localCheckpoint severs the
    # lineage): a per-ingest-batch function must not leak one cached
    # pair-set per call (r5 ADVICE on the indexed twin)
    try:
        cand_docs = (
            cands.select(F.col("doc_a").alias("doc_id"))
            .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        # unhinted: delta-batch candidate volume is data-dependent
        cand_texts = existing_docs.unionByName(new_docs).join(
            cand_docs, "doc_id", "left_semi"
        )
        sets = (
            hashed_shingles_from(cand_texts)
            .groupBy("doc_id")
            .agg(F.collect_set("h").alias("hs"))
        )
        wa = sets.select(
            F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha")
        )
        wb = sets.select(
            F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb")
        )
        inter = F.size(F.array_intersect("ha", "hb")).cast("double")
        union = F.size(F.array_union("ha", "hb"))
        return (
            cands.join(wa, "doc_a")
            .join(wb, "doc_b")
            .select("doc_a", "doc_b", (inter / union).alias("jaccard"))
            .where(F.col("jaccard") >= threshold)
            .localCheckpoint(eager=True)
        )
    finally:
        cands.unpersist()


def neardup_pair_evidence(
    spark: SparkSession, sf_dir: str, chunk: int = 5
) -> DataFrame:
    """Explainability for near-dup verdicts: for every portable-
    MinHash pair, the count of distinct 5-token tiles the two
    documents share — concrete evidence a reviewer can read ("these
    two share 14 exact phrases"), where a bare Jaccard score is
    opaque. The audit layer a production dedup pipeline attaches to
    its drop decisions.

    Tiling reuses dedup_chunk_boilerplate's non-overlapping windows;
    the evidence join touches only candidate-pair members (unhinted
    semi-join on the pair set — AQE broadcasts while measured-small).
    Exact DuckDB oracle (reuses the portable-MinHash CTE chain)."""
    pairs = dedup_minhash_portable(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents")
    members = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    t = (
        docs.join(members, "doc_id", "left_semi")
        .select("doc_id", F.split(norm_text(), " ").alias("t"))
        .where(F.size("t") >= chunk)
    )
    tiles = t.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(0, CAST(size(t) / {chunk} AS INT)"
                    f" - 1), i -> array_join(slice(t, i * {chunk} + 1,"
                    f" {chunk}), ' '))"
                )
            )
        ).alias("tile"),
    )
    a = tiles.select(F.col("doc_id").alias("doc_a"), "tile")
    b = tiles.select(F.col("doc_id").alias("doc_b"), "tile")
    shared = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "tile"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_tiles"))
    )
    return pairs.join(shared, ["doc_a", "doc_b"], "left").select(
        "doc_a",
        "doc_b",
        F.coalesce("n_shared_tiles", F.lit(0)).cast("long").alias(
            "n_shared_tiles"
        ),
    )


def dedup_family_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone curation view: one row per near-dup FAMILY (connected
    component over the Jaccard pair graph) with the keep/drop numbers
    a curation report needs — member count, survivor (min doc_id),
    token mass kept vs dropped, and whether the family is a clique
    (every member pairwise-similar ⇒ safe single-survivor collapse)
    or a looser chain.

    Composes label_components with per-doc token counts and the pair
    count per family (a family of n members is a clique iff it holds
    n·(n−1)/2 pairs). Exact oracle: recursive-CTE closure + the same
    joins."""
    pairs = dedup_ngram_jaccard(spark, sf_dir, 0.95).select("doc_a", "doc_b")
    comp = label_components(pairs)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(F.split(norm_text(), " ")).alias("n_tokens")
    )
    members = comp.join(toks, "doc_id")
    fam = members.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("doc_id").alias("survivor_id"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    surv = members.select(
        F.col("doc_id").alias("survivor_id"),
        F.col("n_tokens").alias("survivor_tokens"),
    )
    pc = (
        pairs.join(
            comp.select(
                F.col("doc_id").alias("doc_a"),
                F.col("component_id"),
            ),
            "doc_a",
        )
        .groupBy("component_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    return (
        fam.join(surv, "survivor_id")
        .join(pc, "component_id")
        .select(
            F.col("component_id").cast("long").alias("component_id"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("survivor_id").cast("long").alias("survivor_id"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            (F.col("total_tokens") - F.col("survivor_tokens"))
            .cast("long")
            .alias("tokens_dropped"),
            (
                F.col("n_pairs")
                == (F.col("n_members") * (F.col("n_members") - 1)) / 2
            ).alias("is_clique"),
        )
    )


def minhash_estimate_error(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """Sketch-accuracy evaluation: for every verified near-dup pair
    (the portable MinHash pipeline's output), compare the MinHash
    ESTIMATE of Jaccard — matching signature components / NUM_PERM —
    against the exact shingle-set Jaccard the verify step computed.
    The per-pair |error| is the empirical check of the 1/sqrt(k)
    sketch bound, i.e. the dial a deployment reads before trusting
    signatures alone (skipping verify) at some threshold.

    Scale shape: re-derives signatures (one linear pass) and joins
    them onto the pair stream twice — pair-bounded work on top of the
    existing pipeline. Exact oracle (same arithmetic in DuckDB)."""
    from flapi_spark.session import load_table

    pairs = dedup_minhash_portable(spark, sf_dir, threshold)
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures_from_hashed(
        hashed_shingles_from(docs, tok_hash_sql=MD5_TOK_HASH)
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(NUM_PERM)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(NUM_PERM)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(NUM_PERM)
    )
    est = matches.cast("double") / F.lit(float(NUM_PERM))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round("jaccard", 6).alias("jaccard_exact"),
            F.round(est, 6).alias("jaccard_est"),
            F.round(F.abs(F.col("jaccard") - est), 6).alias("abs_error"),
        )
    )


def rowwise_minhash(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, hs, m0..m63) with EVERY stage a per-row expression —
    no explode, no groupBy. Same arithmetic as hashed_shingles_from +
    minhash_signatures_from_hashed (same PERMS, same fold), so
    signatures are identical; the shape exists for STREAMING
    consumers, where a groupBy would make the query stateful. Batch
    total work is identical (k·|shingles| multiplies per doc, just
    evaluated inside one projection)."""
    toks = docs.select("doc_id", F.split(norm_text(), " ").alias("t"))
    tok_hash = f"pmod(xxhash64(x), {MERSENNE_P})"
    th = toks.select(
        "doc_id", F.expr(f"transform(t, x -> {tok_hash})").alias("ht")
    )
    gram = "0"
    for j in range(n - 1, -1, -1):
        a = PERMS[j][0]
        gram = (
            f"pmod({a} * coalesce(try_element_at(ht, i + {j + 1}), 0)"
            f" + {gram}, {MERSENNE_P})"
        )
    hs = F.expr(
        f"array_distinct(transform(sequence(0, greatest(size(ht) - {n}, 0)),"
        f" i -> {gram}))"
    )
    sigs = [
        F.expr(
            f"array_min(transform(hs, h -> pmod(h * {a} + {b},"
            f" {MERSENNE_P})))"
        ).alias(f"m{i}")
        for i, (a, b) in enumerate(PERMS)
    ]
    return th.select("doc_id", hs.alias("hs")).select("doc_id", "hs", *sigs)


def band_rows(sigs: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, [keep...], band_id, bh) banded rows from signature
    columns — the LSH bucket key stream (generator + projection:
    streaming-safe). `keep` carries extra per-doc columns through the
    explode, which lets STREAMING consumers avoid a join back to the
    signature stream (a stream-stream self-join would be stateful)."""
    r = NUM_PERM // BANDS
    bands = F.array(*[
        F.struct(
            F.lit(band).alias("band_id"),
            F.xxhash64(*[F.col(f"m{band * r + j}") for j in range(r)]).alias("bh"),
        )
        for band in range(BANDS)
    ])
    return sigs.select(
        "doc_id", *keep, F.explode(bands).alias("b")
    ).select(
        "doc_id",
        *keep,
        F.col("b.band_id").alias("band_id"),
        F.col("b.bh").alias("bh"),
    )


def dedup_lsh_recall_eval(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5
) -> DataFrame:
    """Recall of the banded-LSH candidate stage against EXACT shingle
    Jaccard ground truth — the dial that tunes bands×rows (16×4 here):
    of all true near-dup pairs (Jaccard ≥ threshold over md5-hashed
    shingles), what fraction did banding surface as candidates? One
    summary row: (n_true, n_candidates, n_hits, recall, precision).

    The ground-truth generator is the same quadratic inverted-index
    self-join every exact-oracle baseline in this module uses —
    quarantined oracle plumbing; the PRODUCTION signal is recall,
    which only needs the candidate stream (linear) plus the verify
    join on candidates. Exact oracle (composes the portable-minhash
    CTE chain)."""
    from flapi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    hashed = hashed_shingles_from(docs, tok_hash_sql=MD5_TOK_HASH)
    sets = hashed.groupBy("doc_id").agg(F.collect_set("h").alias("hs"))
    sizes = sets.select("doc_id", F.size("hs").alias("n"))
    # exact ground truth: inverted-index pair join + Jaccard
    a = hashed.alias("a")
    b = hashed.alias("b")
    shared = (
        a.join(b, (F.col("a.h") == F.col("b.h"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("s"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("s").cast("double") / (
        F.col("na") + F.col("nb") - F.col("s")
    )
    true_pairs = (
        shared.join(sa, "doc_a").join(sb, "doc_b")
        .where(jac >= threshold)
        .select("doc_a", "doc_b")
    )
    # candidate stage: the banded self-join of the portable pipeline
    sigs = minhash_signatures_from_hashed(hashed)
    r = NUM_PERM // BANDS
    bands = F.array(*[
        F.struct(
            F.lit(band).alias("band_id"),
            *[F.col(f"m{band * r + j}").alias(f"b{j}") for j in range(r)],
        )
        for band in range(BANDS)
    ])
    ex = sigs.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", "b.band_id",
        *[F.col(f"b.b{j}").alias(f"b{j}") for j in range(r)],
    )
    keys = ["band_id"] + [f"b{j}" for j in range(r)]
    ca = ex.select(F.col("doc_id").alias("doc_a"), *keys)
    cb = ex.select(F.col("doc_id").alias("doc_b"), *keys)
    cands = (
        ca.join(cb, keys)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    hits = true_pairs.join(cands, ["doc_a", "doc_b"], "left_semi")
    n_true = true_pairs.count()
    n_cands = cands.count()
    n_hits = hits.count()
    return spark.createDataFrame(
        [(
            n_true,
            n_cands,
            n_hits,
            round(n_hits / n_true, 6) if n_true else 1.0,
            round(n_hits / n_cands, 6) if n_cands else 1.0,
        )],
        "n_true LONG, n_candidates LONG, n_hits LONG,"
        " recall DOUBLE, precision DOUBLE",
    )


def dedup_containment_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.6
) -> DataFrame:
    """ASYMMETRIC near-dup detection: 3-gram shingle containment
    |A∩B| / |A| per direction — the sub-document duplication signal
    Jaccard misses (a paragraph pasted into a longer doc has low
    Jaccard but containment ≈ 1 in one direction). Production dedup
    keeps the SUPERSET doc and drops contained fragments; the
    direction columns here are that decision's input. Shingles, not
    single tokens: token-SET containment saturates on a small shared
    vocabulary (nearly all-pairs on this corpus — measured), while
    3-gram containment stays discriminative.

    Scale: inverted-index self-join on the hashed shingle stream —
    linear in total postings, AQE splits hot-shingle skew; at corpus
    scale the MinHash band stream replaces the index as the candidate
    source and this verify math is unchanged. Counts exact BIGINT
    (portable md5 shingle hashes, collision odds 2^-31); two mirrored
    double divisions rounded 6dp."""
    docs = load_table(spark, sf_dir, "documents")
    hs = (
        hashed_shingles_from(docs, tok_hash_sql=MD5_TOK_HASH)
        .distinct()
    )
    sizes = hs.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = hs.alias("a"), hs.alias("b")
    shared = (
        a.join(b, (F.col("a.h") == F.col("b.h"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    c_ab = F.col("shared").cast("double") / F.col("na").cast("double")
    c_ba = F.col("shared").cast("double") / F.col("nb").cast("double")
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where((c_ab >= threshold) | (c_ba >= threshold))
        .select(
            "doc_a",
            "doc_b",
            F.col("shared").cast("long").alias("shared_shingles"),
            F.round(c_ab, 6).alias("containment_a_in_b"),
            F.round(c_ba, 6).alias("containment_b_in_a"),
        )
    )


def band_rows_for(docs: DataFrame) -> DataFrame:
    """(doc_id, band_id, bh) LSH band rows for a document set — the
    persisted-index unit the continuous-dedup flow stores (one row per
    doc per band; xxhash64 band fingerprints, the
    dedup_incremental_pairs arithmetic)."""
    sigs = minhash_signatures_from_hashed(hashed_shingles_from(docs))
    r = NUM_PERM // BANDS
    arr = F.array(*[
        F.struct(
            F.lit(band).alias("band_id"),
            F.xxhash64(
                *[F.col(f"m{band * r + j}") for j in range(r)]
            ).alias("bh"),
        )
        for band in range(BANDS)
    ])
    return sigs.select("doc_id", F.explode(arr).alias("b")).select(
        "doc_id", F.col("b.band_id").alias("band_id"),
        F.col("b.bh").alias("bh"),
    )


def write_band_index(
    spark: SparkSession,
    docs: DataFrame,
    table: str = "neardup_band_index",
    buckets: int = 16,
) -> None:
    """Materialize the MinHash-LSH band index as a BUCKETED warehouse
    table on (band_id, bh) — the persisted structure the continuous-
    dedup ingestion probes per batch (module docstrings promised it;
    this is the real thing). Bucketing pre-co-locates the index on the
    probe key, so the per-batch candidate join reads the index WITHOUT
    an index-side exchange — at 100 TB the index is re-shuffled ZERO
    times after bootstrap instead of once per ingest batch."""
    (
        band_rows_for(docs)
        .write.mode("overwrite")
        .bucketBy(buckets, "band_id", "bh")
        .sortBy("band_id", "bh")
        .saveAsTable(table)
    )


def append_band_index(
    spark: SparkSession,
    new_docs: DataFrame,
    table: str = "neardup_band_index",
) -> None:
    """Per-batch index maintenance: append the NEW docs' band rows
    (insertInto preserves the table's bucket spec — appended files
    land in the right buckets, keeping the probe exchange-free)."""
    band_rows_for(new_docs).write.insertInto(table)


def write_shingle_store(
    spark: SparkSession,
    docs: DataFrame,
    table: str = "neardup_shingle_store",
    buckets: int = 16,
) -> None:
    """Persist the corpus' hashed shingle sets (doc_id, hs) as a
    bucketed warehouse table — the VERIFY-side sibling of
    write_band_index (round 8). Without it the streaming guard's
    exact-Jaccard arm re-hashes the ENTIRE corpus from raw text every
    micro-batch (the static side re-resolves per batch); with it the
    per-batch verify is a candidate-bounded join against a bucketed
    scan, so steady-state ingest cost is O(delta), not O(corpus).
    Bucketed+sorted by doc_id: the verify join key."""
    (
        rowwise_minhash(docs)
        .select("doc_id", "hs")
        .write.mode("overwrite")
        .bucketBy(buckets, "doc_id")
        .sortBy("doc_id")
        .saveAsTable(table)
    )


def append_shingle_store(
    spark: SparkSession,
    new_docs: DataFrame,
    table: str = "neardup_shingle_store",
) -> None:
    """Per-batch shingle-store maintenance (see write_shingle_store):
    insertInto preserves the bucket spec, same contract as
    append_band_index."""
    rowwise_minhash(new_docs).select("doc_id", "hs").write.insertInto(table)


def band_rows_portable_for(docs: DataFrame) -> DataFrame:
    """(doc_id, band_id, b0..b{r-1}) ENGINE-PORTABLE band rows: the
    raw r-row signature tuple of dedup_minhash_portable (md5 universal
    token hashing, no xxhash64 digest), so a persisted index built
    from these is reproducible in any engine with md5 and the whole
    probe chain stays oracle-checkable end-to-end."""
    sigs = minhash_signatures_from_hashed(
        hashed_shingles_from(docs, tok_hash_sql=MD5_TOK_HASH)
    )
    r = NUM_PERM // BANDS
    bands = F.array(*[
        F.struct(
            F.lit(band).alias("band_id"),
            *[F.col(f"m{band * r + j}").alias(f"b{j}") for j in range(r)],
        )
        for band in range(BANDS)
    ])
    return sigs.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", "b.band_id",
        *[F.col(f"b.b{j}").alias(f"b{j}") for j in range(r)],
    )


def _portable_band_keys() -> list[str]:
    return ["band_id"] + [f"b{j}" for j in range(NUM_PERM // BANDS)]


def write_band_index_portable(
    spark: SparkSession,
    docs: DataFrame,
    table: str = "neardup_band_index_portable",
    buckets: int = 16,
) -> None:
    """Materialize the PORTABLE band index as a warehouse table
    bucketed on the full band key (band_id, b0..b{r-1}) — the
    oracle-checkable sibling of write_band_index. Bucketing
    pre-co-locates the index on the collision key, so both the
    steady-state ingest probe AND the full pair-graph self-join read
    it without an exchange: after bootstrap the index is re-shuffled
    ZERO times, however many consumers probe it."""
    keys = _portable_band_keys()
    (
        band_rows_portable_for(docs)
        .write.mode("overwrite")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )


def write_shingle_store_portable(
    spark: SparkSession,
    docs: DataFrame,
    table: str = "neardup_shingle_store_portable",
    buckets: int = 16,
) -> None:
    """Persist the md5-hashed shingle sets (doc_id, hs) as a bucketed
    warehouse table — the PORTABLE verify-side sibling of
    write_band_index_portable (round 8). With it the persisted-index
    pair stream (pairs_from_band_index) needs NO raw documents at
    all: candidate generation reads the band index, verification
    reads this store — every indexed consumer becomes fully
    index-resident (zero corpus scans, zero re-hashing). The sets are
    exactly what the inline verify arm computes, so rows (and the
    DuckDB oracles) are unchanged. Bucketed+sorted by doc_id, the
    verify join key."""
    (
        hashed_shingles_from(docs, tok_hash_sql=MD5_TOK_HASH)
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("hs"))
        .write.mode("overwrite")
        .bucketBy(buckets, "doc_id")
        .sortBy("doc_id")
        .saveAsTable(table)
    )


def append_shingle_store_portable(
    spark: SparkSession,
    new_docs: DataFrame,
    table: str = "neardup_shingle_store_portable",
) -> None:
    """Per-batch portable shingle-store maintenance (insertInto keeps
    the bucket spec; same contract as append_band_index)."""
    (
        hashed_shingles_from(new_docs, tok_hash_sql=MD5_TOK_HASH)
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("hs"))
        .write.insertInto(table)
    )


def append_band_index_portable(
    spark: SparkSession,
    new_docs: DataFrame,
    table: str = "neardup_band_index_portable",
) -> None:
    """Per-batch PORTABLE band-index maintenance (round 8): append the
    new docs' raw-signature band rows; insertInto preserves the full
    band-key bucket spec, so pairs_from_band_index's self-join stays
    exchange-free after any number of ingest batches."""
    band_rows_portable_for(new_docs).write.insertInto(table)


def write_exact_index(
    spark: SparkSession,
    docs: DataFrame,
    table: str = "dedup_exact_index",
    buckets: int = 16,
) -> None:
    """Persist the exact-dup fingerprint index (doc_id, fingerprint =
    md5 of the normalized text) as a warehouse table bucketed on
    fingerprint — the probe key. The third leg of the delta-curation
    index set (round 10f): a delta batch's exact-dedup stage is a
    fingerprint semi-join against this table instead of a corpus-wide
    re-hash, so steady-state ingest cost is O(delta). Bucketing
    pre-co-locates the index on the join key: the (delta-sized) probe
    side shuffles to the bucket layout, the index side never does."""
    (
        docs.select("doc_id", F.md5(norm_text()).alias("fingerprint"))
        .write.mode("overwrite")
        .bucketBy(buckets, "fingerprint")
        .sortBy("fingerprint")
        .saveAsTable(table)
    )


def append_exact_index(
    spark: SparkSession,
    new_docs: DataFrame,
    table: str = "dedup_exact_index",
) -> None:
    """Per-batch exact-index maintenance: insertInto preserves the
    fingerprint bucket spec (same contract as append_band_index)."""
    new_docs.select(
        "doc_id", F.md5(norm_text()).alias("fingerprint")
    ).write.insertInto(table)


def probe_band_index_portable(
    spark: SparkSession,
    new_docs: DataFrame,
    table: str = "neardup_band_index_portable",
    shingle_store: str = "neardup_shingle_store_portable",
    threshold: float = 0.5,
) -> DataFrame:
    """Delta probe of the PORTABLE band index (round 10f): the
    engine-portable sibling of incremental_pairs_indexed, for batch
    delta curation (pipeline_delta.curate_delta). The new docs' raw-
    signature band rows (delta-sized) probe the bucketed index for
    candidates — the index side reads without an exchange — plus a
    delta-sized new×new arm so intra-batch duplicate pairs surface
    even before append_band_index_portable runs. Verification is the
    shared exact-Jaccard arm over the persisted shingle store
    (index-side sets) unioned with the batch docs' delta-computed
    sets, so the output is bit-identical to dedup_minhash_portable's
    pairs restricted to pairs touching the batch: every row is
    oracle-checkable against the same SQL chain.

    Per-batch work is O(delta): no corpus scan, no corpus re-hash
    anywhere in the plan (plan-asserted in tests). The candidate set
    is cached only for the duration of the call (eager localCheckpoint
    severs lineage; finally-unpersist releases it — the
    incremental_pairs_indexed cache-lifecycle contract)."""
    # the delta band rows feed THREE arms (new×index, both sides of
    # new×new) — materialize them once (round 11; id-grain proxy rows,
    # the delta is hashed for bands exactly once instead of 3×). The
    # lazy _plan twin stays un-checkpointed for the plan tests.
    new_bands = band_rows_portable_for(new_docs).localCheckpoint(eager=True)
    result, cands = _probe_band_index_portable_plan(
        spark, new_docs, table, shingle_store, threshold,
        new_bands=new_bands,
    )
    try:
        return result.localCheckpoint(eager=True)
    finally:
        cands.unpersist()


def _probe_band_index_portable_plan(
    spark: SparkSession,
    new_docs: DataFrame,
    table: str = "neardup_band_index_portable",
    shingle_store: str = "neardup_shingle_store_portable",
    threshold: float = 0.5,
    new_bands: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Lazy plan for probe_band_index_portable: returns (result,
    persisted candidate set). The CALLER owns the cache lifecycle —
    plan tests inspect the un-checkpointed query here (the
    _incremental_pairs_indexed_plan contract). `new_bands` lets the
    eager wrapper hand in a pre-materialized delta band-row frame
    (consumed by three join arms; see probe_band_index_portable)."""
    if new_bands is None:
        new_bands = band_rows_portable_for(new_docs)
    index = spark.table(table)
    keys = _portable_band_keys()

    def _cand(a_df: DataFrame, b_df: DataFrame) -> DataFrame:
        a, b = a_df.alias("a"), b_df.alias("b")
        on = reduce(
            lambda acc, k: acc & (F.col(f"a.{k}") == F.col(f"b.{k}")),
            keys[1:],
            F.col("a.band_id") == F.col("b.band_id"),
        ) & (F.col("a.doc_id") != F.col("b.doc_id"))
        return a.join(b, on).select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        )

    cands = (
        _cand(new_bands, index)
        .unionByName(_cand(new_bands, new_bands))
        .distinct()
        .persist()
    )
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    new_sets = (
        hashed_shingles_from(new_docs, tok_hash_sql=MD5_TOK_HASH)
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("hs"))
    )
    # index-side sets candidate-bounded from the bucketed store;
    # batch docs may not be in the store yet (probe-before-append),
    # so their sets are computed delta-sized and unioned in — the
    # anti-join avoids duplicate doc_id rows after an append (both
    # copies carry identical sets, so precedence cannot matter)
    store_sets = (
        spark.table(shingle_store)
        .join(cand_docs, "doc_id", "left_semi")
        .join(new_docs.select("doc_id"), "doc_id", "left_anti")
    )
    sets = store_sets.unionByName(new_sets)
    # distinct: defense-in-depth against duplicate store doc_id rows
    # (e.g. an at-least-once maintenance crash window fanning the
    # verify join out) — dup rows carry identical sets, so identical
    # pair rows collapse here; delta-bounded, so the extra shuffle is
    # batch-sized (ADVICE r10)
    return _verify_jaccard_sets(sets, cands, threshold).distinct(), cands


def pairs_from_band_index(
    spark: SparkSession,
    docs: DataFrame | None = None,
    table: str = "neardup_band_index_portable",
    threshold: float = 0.5,
    shingle_store: str | None = None,
) -> DataFrame:
    """The near-dup PAIR STREAM served from the persisted portable
    band index instead of recomputing the MinHash chain inline: the
    band-collision arm is a SELF-JOIN of the bucketed table on its
    own bucket keys — both sides arrive pre-co-located, so the join
    plans over two bucketed scans with zero exchanges — followed by
    the shared exact-Jaccard verify (_verify_jaccard_md5, identical
    arithmetic to dedup_minhash_portable, so the output is
    bit-identical to the self-contained chain). This is the
    production shape for every downstream pair-graph consumer
    (components, pagerank, k-core, cross-source matrix): bootstrap
    the index once, then each consumer's candidate generation is an
    exchange-free bucketed read rather than a full corpus re-hash.

    With `shingle_store` (a write_shingle_store_portable table, round
    8) the VERIFY side reads the persisted sets too — `docs` is
    unused (may be None) and the whole pair stream is index-resident:
    no documents scan, no shingle re-hash, candidates-bounded joins
    against two bucketed tables."""
    ex = spark.table(table)
    keys = _portable_band_keys()
    ca = ex.select(F.col("doc_id").alias("doc_a"), *keys)
    cb = ex.select(F.col("doc_id").alias("doc_b"), *keys)
    cands = (
        ca.join(cb, keys)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    if shingle_store is not None:
        return _verify_jaccard_sets(
            spark.table(shingle_store), cands, threshold
        )
    if docs is None:
        raise ValueError(
            "pairs_from_band_index: docs is required unless a "
            "shingle_store table is supplied"
        )
    return _verify_jaccard_md5(docs, cands, threshold)


def source_pair_matrix(pairs: DataFrame, docs: DataFrame) -> DataFrame:
    """Roll an arbitrary (doc_a, doc_b) pair stream up to the
    unordered source-pair matrix with a cross-source flag — shared by
    cross_source_neardup_matrix (inline chain) and its persisted-index
    twin. The doc→source attachment is two doc_id-keyed joins where
    the pair side is candidate-bounded (AQE broadcasts it while
    measured-small, unhinted); the agg has ≤ |sources|² groups."""
    da = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
    )
    db = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
    )
    return (
        pairs.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .withColumn(
            "cross_source", F.col("source_a") != F.col("source_b")
        )
    )


def incremental_pairs_indexed(
    spark: SparkSession,
    all_docs: DataFrame | None,
    new_docs: DataFrame,
    table: str = "neardup_band_index",
    threshold: float = 0.5,
    shingle_store: str | None = None,
) -> DataFrame:
    """dedup_incremental_pairs against the PERSISTED band index: new
    docs' bands (delta-sized) probe the bucketed index for candidates;
    verification hashes only candidate members of `all_docs` (the
    corpus the index covers plus the batch). Work remains delta-
    proportional, and the corpus-side band recompute of the
    self-contained operator disappears — the index read is a bucketed
    scan. A second delta-sized new×new probe arm makes the result
    independent of whether append_band_index ran first. Equality with
    dedup_incremental_pairs is asserted in tests.

    The candidate set is cached only for the duration of the call:
    the (delta-proportional) result is materialized eagerly via
    localCheckpoint and the cache released in a finally — a per-batch
    maintenance function that leaked one cached pair-set per ingest
    batch would exhaust executor storage over a long-running flow
    (r5 ADVICE).

    `shingle_store` (round 8): with the persisted verify-side store
    the corpus never appears in the plan at all — see
    _incremental_pairs_indexed_plan."""
    result, cands = _incremental_pairs_indexed_plan(
        spark, all_docs, new_docs, table, threshold, shingle_store
    )
    try:
        # eager: severs the returned plan's lineage from the cached
        # candidate set so the finally-unpersist is safe
        return result.localCheckpoint(eager=True)
    finally:
        cands.unpersist()


def _incremental_pairs_indexed_plan(
    spark: SparkSession,
    all_docs: DataFrame | None,
    new_docs: DataFrame,
    table: str = "neardup_band_index",
    threshold: float = 0.5,
    shingle_store: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Lazy plan for incremental_pairs_indexed: returns (result,
    persisted candidate set). The CALLER owns the cache lifecycle —
    plan tests inspect the un-checkpointed query here.

    With `shingle_store` (a write_shingle_store table covering the
    CORPUS side, round 8) the verify arm is index-resident for corpus
    candidates — their (doc_id, hs) rows come from the bucketed store
    while the batch docs' sets are computed delta-sized and unioned
    in; `all_docs` is then unused (may be None) and per-batch work is
    fully O(delta): no corpus scan anywhere in the plan."""
    new_bands = band_rows_for(new_docs)
    index = spark.table(table)

    def _cand(a_df: DataFrame, b_df: DataFrame) -> DataFrame:
        a, b = a_df.alias("a"), b_df.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col("a.doc_id") != F.col("b.doc_id")),
            )
            .select(
                F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
                F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias(
                    "doc_b"
                ),
            )
        )

    # two probe arms so the result is ORDER-INDEPENDENT of the
    # append: new×index (the bucketed, exchange-free arm) plus
    # new×new (delta-sized) — probing BEFORE append_band_index would
    # otherwise silently miss intra-batch duplicate pairs (review
    # finding); after an append the union just dedups
    cands = (
        _cand(new_bands, index)
        .unionByName(_cand(new_bands, new_bands))
        .distinct()
        .persist()
    )
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    new_sets = (
        hashed_shingles_from(new_docs)
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("hs"))
    )
    if shingle_store is not None:
        # corpus-side sets from the bucketed store, candidate-bounded
        # by a semi-join; batch docs may not be in the store yet
        # (probe-before-append), so their delta-sized sets are unioned
        # in — the anti-join avoids duplicate doc_id rows after an
        # append (both copies carry identical sets, so precedence
        # cannot matter)
        store_sets = (
            spark.table(shingle_store)
            .join(cand_docs, "doc_id", "left_semi")
            .join(new_docs.select("doc_id"), "doc_id", "left_anti")
        )
        sets = store_sets.unionByName(new_sets)
    else:
        if all_docs is None:
            raise ValueError(
                "incremental_pairs_indexed: all_docs is required "
                "unless a shingle_store table is supplied"
            )
        cand_texts = all_docs.join(cand_docs, "doc_id", "left_semi")
        sets = (
            hashed_shingles_from(cand_texts)
            .groupBy("doc_id")
            .agg(F.collect_set("h").alias("hs"))
        )
    wa = sets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha"))
    wb = sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb"))
    inter = F.size(F.array_intersect("ha", "hb")).cast("double")
    union = F.size(F.array_union("ha", "hb"))
    result = (
        cands.join(wa, "doc_a")
        .join(wb, "doc_b")
        .select("doc_a", "doc_b", (inter / union).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
    return result, cands


def lsh_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH design-dial table: for a (rows-per-band r,
    bands b) grid, the candidate-collision probability
    P(candidate | jaccard = s) = 1 − (1 − s^r)^b over s = 0.1 … 0.9,
    plus each configuration's threshold s* = (1/b)^(1/r) (the
    s-curve's inflection — pairs above it are probably candidates).
    The companion to the MEASURED dials (dedup_lsh_recall_eval,
    minhash_estimate_error): recall evals tell you what a config DID
    on this corpus; this table tells you what any config WOULD do at
    a target similarity before burning a 100 TB pass on it
    (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch. 3).

    Pure closed-form math — 81 rows, no table scan; pow() is libm on
    both engines, absorbed by the 6dp grid. sf_dir accepted for the
    uniform queries() signature."""
    return spark.sql(
        """
        SELECT r, b, s,
               round(1 - pow(1 - pow(s, r), b), 6) AS p_candidate,
               round(pow(1.0 / b, 1.0 / r), 6) AS s_threshold
        FROM (SELECT explode(array(2, 4, 8)) AS r)
        CROSS JOIN (SELECT explode(array(4, 8, 16)) AS b)
        CROSS JOIN (
          SELECT CAST(i AS DOUBLE) / 10 AS s
          FROM (SELECT explode(sequence(1, 9)) AS i)
        )
        """
    ).select(
        F.col("r").cast("long").alias("r"),
        F.col("b").cast("long").alias("b"),
        F.col("s").alias("s"),
        "p_candidate",
        "s_threshold",
    )


def cross_source_neardup_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-duplicate flow BETWEEN sources: portable-MinHash pairs
    rolled up to an unordered source-pair matrix with a cross-source
    flag — the dial that says which crawl sources mirror which (high
    cross-source counts = syndication/plagiarism; dedup those sources
    against each other first) and which duplicate internally.

    Scale shape: the pair stream is LSH-linear (never all-pairs); the
    doc→source attachment is two doc_id-keyed joins where the pair
    side is candidate-bounded — AQE broadcasts it while measured-small,
    unhinted (data-dependent size, the r4/r5 de-hinting rule). The
    matrix agg has ≤ |sources|² groups. The production twin
    (neardup_matrix_indexed) serves the pair stream from the
    persisted bucketed band index instead of re-running this chain —
    this entry stays self-contained because the oracle must replay
    the full chain."""
    pairs = dedup_minhash_portable(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return source_pair_matrix(pairs, docs)


def jaccard_prefix_filter_stats(
    spark: SparkSession, sf_dir: str, threshold: float = 0.95
) -> DataFrame:
    """Audit sheet for the AllPairs prefix filter behind
    dedup_ngram_jaccard (round 6): the naive inverted-index join's
    candidate-row count (Σ_token C(df,2) — what the exact join would
    generate without filtering), the prefix index's bound
    (Σ_token C(prefix_df,2)), the distinct candidates that survive the
    prefix+size filters, the true pairs, and the derived
    precision/row-reduction ratios. The dial that says whether the
    exact-Jaccard pass is feasible at the next scale-up BEFORE running
    it — the same evaluate-the-optimizer pattern as
    dedup_lsh_recall_eval / minhash_estimate_error.

    All counts are exact integers on both engines (the prefix rank is
    a per-doc row_number over the (df, tok) total order; the 1e-9 ceil
    guards are the production operator's); ratios are single IEEE
    divisions rounded 6dp. One row out."""
    from pyspark.sql import Window

    t = threshold
    inv = _exploded_tokens(spark, sf_dir)
    df_tok = inv.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    naive = df_tok.agg(
        F.sum(F.expr("df * (df - 1) div 2")).cast("long")
        .alias("n_naive_rows")
    )
    ranked = inv.join(df_tok, "tok")
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    wc = Window.partitionBy("doc_id")
    pre = (
        ranked.select(
            "doc_id",
            "tok",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        .where(
            F.col("rk") <= F.col("n") - F.ceil(F.col("n") * t - 1e-9) + 1
        )
    )
    prefix_rows = (
        pre.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.expr("c * (c - 1) div 2")).cast("long")
            .alias("n_prefix_rows")
        )
    )
    a = pre.select(F.col("doc_id").alias("doc_a"), "tok",
                   F.col("n").alias("na"))
    b = pre.select(F.col("doc_id").alias("doc_b"), "tok",
                   F.col("n").alias("nb"))
    cand = (
        a.join(
            b,
            (a.tok == b.tok)
            & (F.col("doc_a") < F.col("doc_b"))
            & (F.col("nb").cast("double") >= F.col("na") * t - 1e-9)
            & (F.col("na").cast("double") >= F.col("nb") * t - 1e-9),
        )
        .select("doc_a", "doc_b")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    )
    pairs = dedup_ngram_jaccard(spark, sf_dir, t).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    return (
        naive.crossJoin(prefix_rows)
        .crossJoin(cand)
        .crossJoin(pairs)
        .select(
            "n_naive_rows",
            "n_prefix_rows",
            "n_candidates",
            "n_pairs",
            F.round(
                F.col("n_pairs").cast("double")
                / F.col("n_candidates").cast("double"),
                6,
            ).alias("precision"),
            F.round(
                F.col("n_prefix_rows").cast("double")
                / F.col("n_naive_rows").cast("double"),
                6,
            ).alias("row_reduction"),
        )
    )


def scrub_duplicated_spans(
    spark: SparkSession, sf_dir: str, chunk: int = 5, min_docs: int = 2
) -> DataFrame:
    """APPLY the substring-dedup cut list (round 10c): drop every
    token inside a dedup_substring_spans interval and re-emit the
    scrubbed document — the second half of Lee et al. 2021's
    exact-substring deduplication (the span view finds the duplicated
    regions; this pass actually removes them, keeping the document's
    unique remainder instead of dropping the whole doc like
    keep-best dedup would).

    Scale shape: spans aggregate to a per-doc cut list at doc grain
    (spans are disjoint maximal islands, few per doc), joined back in
    ONE doc-keyed join; the scrub itself is an in-array filter —
    tokens never explode into rows, so the pass adds no token-grain
    shuffle on top of the span computation. Exact DuckDB oracle
    replays spans and scrub (positional explode + ordered re-agg —
    same kept sequence).

    Output: (doc_id, n_toks, n_cut_tokens, scrubbed_n_toks,
    scrubbed_text)."""
    spans = dedup_substring_spans(spark, sf_dir, chunk, min_docs)
    cuts = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("start_token", "end_token")).alias("cuts"),
        F.sum(
            F.col("end_token") - F.col("start_token") + 1
        ).alias("n_cut"),
    )
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split(norm_text(), " ").alias("t"))
    j = t.join(cuts, "doc_id", "left").select(
        "doc_id",
        "t",
        "n_cut",
        F.expr(
            "transform(filter(transform(t, (x, i) ->"
            " struct(x AS tok, i AS pos)),"
            " s -> cuts IS NULL OR NOT exists(cuts,"
            "  c -> s.pos >= c.start_token AND s.pos <= c.end_token)),"
            " s -> s.tok)"
        ).alias("kept"),
    )
    return j.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size("t").cast("long").alias("n_toks"),
        F.coalesce(F.col("n_cut"), F.lit(0)).cast("long")
        .alias("n_cut_tokens"),
        F.size("kept").cast("long").alias("scrubbed_n_toks"),
        F.array_join("kept", " ").alias("scrubbed_text"),
    )


def incremental_components(
    labels: DataFrame, new_pairs: DataFrame, max_iterations: int = 30
) -> DataFrame:
    """Incremental connected-component maintenance (round 10c): merge
    a DELTA pair batch into an existing labeling without re-deriving
    the historical pair stream — the component-level completion of the
    continuous-dedup story (the persisted band index already makes
    pair GENERATION delta-proportional; this makes the cluster labels
    delta-proportional too).

    An existing component is replayed as its STAR FOREST (member →
    root edges from the labeling — diameter 1 by construction), so
    label_components runs over |old labels| + |delta| edges instead of
    the full historical pair stream, and the star inputs converge in
    the first large-star round. Correctness: the star forest of CC(E1)
    has exactly CC(E1)'s connectivity and preserves every member id,
    so CC(star(CC(E1)) ∪ E2) == CC(E1 ∪ E2) — both as a partition and
    in min-id labels; equality with the full recompute is
    oracle-checked (q: dedup_components_incremental) and pytest-pinned.

    `labels` is (doc_id, component_id); `new_pairs` is (doc_a, doc_b).
    Output: (doc_id, component_id) over every labeled or delta-touched
    node."""
    star = labels.where(F.col("doc_id") != F.col("component_id")).select(
        F.col("doc_id").alias("doc_a"),
        F.col("component_id").alias("doc_b"),
    )
    merged = label_components(
        star.unionAll(new_pairs.select("doc_a", "doc_b")),
        max_iterations=max_iterations,
    )
    # singleton input components (doc_id == component_id with no other
    # member) contribute no star edge — re-attach any labeled node the
    # merge did not touch so the output really covers "every labeled or
    # delta-touched node" (round-10c review; label_components output
    # never contains singletons, but this public API must not assume
    # its input does not)
    untouched = labels.join(merged.select("doc_id"), "doc_id", "left_anti")
    return merged.unionAll(
        untouched.select("doc_id", "component_id")
    )
