"""Composable training-data curation pipeline (round 9).

`curate()` promotes scripts/pipeline_demo.py's stage chain —
quality gates → language ID → exact dedup → near-dup keep-best →
decontamination → (optional) split — from a script to a library API
an endpoint/config can invoke: the stage list is DATA (names or
{"stage": ..., params} dicts), each stage is the production operator
from the registry, and the result carries the surviving keep-set
plus a per-stage attrition funnel (the quality_gate_funnel shape:
which stage bites, and how hard).

Scale contract (the demo's, now enforced in one place): the keep-set
flows stage to stage as a doc_id column joined semi-style — at
100 TB the intermediate keep-sets are id-grain, never copied text —
and each stage's result is eagerly localCheckpoint'ed (GC-managed,
the round-8 cache-lifecycle rule) so downstream stages re-read a
materialized id set instead of replaying the whole upstream chain
per action.

Reference parity: the reference has no pipeline composer — this is
brief-driven LLM-data-pipeline surface (SURVEY §2.3), composing the
operators the reference's users would chain by hand.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from time import perf_counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flapi_spark.session import load_table


def _url_filter(spark: SparkSession, sf_dir: str, keep: DataFrame) -> DataFrame:
    """URL filtering gate (round 10): keep docs whose URL clears the
    domain blocklist + keyword rules — the stage-0 gate a crawl
    pipeline runs before fetching, ahead of html_extract."""
    from flapi_spark.operators.text import text_url_filter

    return keep.join(
        text_url_filter(spark, sf_dir).where("keep").select("doc_id"),
        "doc_id",
        "left_semi",
    )


def _html_extract(
    spark: SparkSession, sf_dir: str, keep: DataFrame,
    min_density: float = 0.4, min_text_len: int = 80,
) -> DataFrame:
    """HTML main-text extraction gate (round 10): keep docs whose
    extracted main text clears the text-density and length floors —
    the boilerplate-heavy-page drop a web-crawl pipeline runs BEFORE
    quality scoring (trafilatura/jusText-style decision, re-expressed
    as exact regex extraction over the markup)."""
    from flapi_spark.operators.text import text_html_extract

    return keep.join(
        text_html_extract(
            spark, sf_dir, min_density=min_density,
            min_text_len=min_text_len,
        ).where("keep").select("doc_id"),
        "doc_id",
        "left_semi",
    )


def _classifier_gate(
    spark: SparkSession, sf_dir: str, keep: DataFrame,
    target_lang: str = "en", keep_frac: float = 0.5,
) -> DataFrame:
    """Model-based quality gate (round 10): keep the top `keep_frac`
    of the corpus by the NB log-odds domain score — the CCNet/
    FineWeb-Edu classifier cut, after the heuristic gates. Like the
    dedup stages the rank cut is corpus-wide, then intersected with
    the current keep-set."""
    from flapi_spark.operators.classifier import classifier_gate_keep

    return keep.join(
        classifier_gate_keep(
            spark, sf_dir, target_lang=target_lang, keep_frac=keep_frac
        ),
        "doc_id",
        "left_semi",
    )


def _boilerplate_gate(
    spark: SparkSession, sf_dir: str, keep: DataFrame,
    chunk: int = 5, min_docs: int = 2, max_share: float = 0.3,
) -> DataFrame:
    """Corpus-boilerplate gate (round 10b): drop docs whose
    duplicated-span share exceeds max_share — the RefinedWeb
    line-dedup / C4 span gate, catching templated pages the
    WITHIN-doc repetition stats miss. Like the dedup stages the
    duplicated-span set is computed corpus-wide, then intersected
    with the current keep-set."""
    from flapi_spark.operators.dedup import boilerplate_share

    return keep.join(
        boilerplate_share(
            spark, sf_dir, chunk=chunk, min_docs=min_docs,
            max_share=max_share,
        ).where("keep").select("doc_id"),
        "doc_id",
        "left_semi",
    )


def _quality(spark: SparkSession, sf_dir: str, keep: DataFrame) -> DataFrame:
    """Gopher gates: keep docs passing ALL gates."""
    from flapi_spark.operators.text import text_gopher_filters

    return keep.join(
        text_gopher_filters(spark, sf_dir).where("keep").select("doc_id"),
        "doc_id",
        "left_semi",
    )


def _langid(
    spark: SparkSession, sf_dir: str, keep: DataFrame, langs: list | None = None
) -> DataFrame:
    """Language ID: keep confidently-identified docs; `langs`
    restricts to an allow-list (default: anything but 'unknown')."""
    from flapi_spark.operators.text import text_langid

    ids = text_langid(spark, sf_dir)
    cond = (
        F.col("predicted_lang").isin([str(x) for x in langs])
        if langs
        else F.col("predicted_lang") != "unknown"
    )
    return keep.join(
        ids.where(cond).select("doc_id"), "doc_id", "left_semi"
    )


def _exact_dedup(
    spark: SparkSession, sf_dir: str, keep: DataFrame,
    survivor_scope: str = "corpus",
) -> DataFrame:
    """One survivor per md5 fingerprint (corpus-wide survivor choice,
    intersected with the current keep-set — the demo's semantics).

    CORPUS-WIDE SURVIVOR HAZARD (shared by every dedup stage — see
    curate()): if an EARLIER stage already dropped a group's chosen
    survivor, the other group members are still dropped here, so the
    whole fingerprint group can vanish from the curated output.
    survivor_scope="keepset" (round 11, VERDICT r10 item 5) elects
    the survivor among the CURRENT keep-set's members instead — same
    min-doc_id policy, restricted grouping — so a group whose
    corpus-wide survivor an earlier stage dropped keeps its best
    surviving member."""
    from flapi_spark.operators.dedup import dedup_exact_survivors

    if survivor_scope == "keepset":
        return keep.join(
            dedup_exact_survivors(spark, sf_dir, within=keep)
            .select("doc_id"),
            "doc_id",
            "left_semi",
        )
    _check_scope(survivor_scope)
    return keep.join(
        dedup_exact_survivors(spark, sf_dir).select("doc_id"),
        "doc_id",
        "left_semi",
    )


def _near_dedup(
    spark: SparkSession,
    sf_dir: str,
    keep: DataFrame,
    pairs: DataFrame | None = None,
    band_table: str | None = None,
    shingle_store: str | None = None,
    survivor_scope: str = "corpus",
) -> DataFrame:
    """Quality-aware exemplar per near-dup cluster. Pair source, in
    precedence order: explicit `pairs`; the persisted portable index
    (`band_table` + `shingle_store` — the zero-rehash production
    path); else the inline MinHash-LSH chain.

    CORPUS-WIDE SURVIVOR HAZARD (see curate()): the exemplar is
    chosen over the FULL corpus, then intersected with the current
    keep-set — a cluster whose exemplar an earlier stage dropped
    loses all its members. survivor_scope="keepset" restricts the
    pair graph to edges with BOTH ends in the current keep-set before
    clustering, so exemplars (same max-tokens/min-id policy) are
    elected among survivors and every surviving cluster retains one
    member."""
    from flapi_spark.operators.dedup import (
        dedup_keep_best_survivors, dedup_minhash_portable,
        pairs_from_band_index,
    )

    if pairs is None and band_table is not None:
        pairs = pairs_from_band_index(
            spark, None, band_table, shingle_store=shingle_store
        ).select("doc_a", "doc_b")
    if survivor_scope == "keepset":
        if pairs is None:
            pairs = dedup_minhash_portable(spark, sf_dir).select(
                "doc_a", "doc_b"
            )
        pairs = _pairs_within(pairs, keep)
    else:
        _check_scope(survivor_scope)
    return keep.join(
        dedup_keep_best_survivors(spark, sf_dir, pairs=pairs)
        .where("keep")
        .select("doc_id"),
        "doc_id",
        "left_semi",
    )


def _decontam(
    spark: SparkSession, sf_dir: str, keep: DataFrame
) -> DataFrame:
    """Drop training docs sharing n-grams with the eval split."""
    from flapi_spark.operators.text import contamination_ngram_overlap

    return keep.join(
        contamination_ngram_overlap(spark, sf_dir)
        .select(F.col("train_doc").alias("doc_id"))
        .distinct(),
        "doc_id",
        "left_anti",
    )


def _check_scope(survivor_scope: str) -> None:
    if survivor_scope not in ("corpus", "keepset"):
        raise ValueError(
            f"survivor_scope must be 'corpus' or 'keepset',"
            f" got {survivor_scope!r}"
        )


def _pairs_within(pairs: DataFrame, keep: DataFrame) -> DataFrame:
    """Restrict a (doc_a, doc_b) pair stream to edges with both ends
    in the keep-set — the keepset survivor scope's graph."""
    return (
        pairs.join(
            keep.select(F.col("doc_id").alias("doc_a")), "doc_a",
            "left_semi",
        )
        .join(
            keep.select(F.col("doc_id").alias("doc_b")), "doc_b",
            "left_semi",
        )
    )


def _drop_cluster_non_exemplars(
    keep: DataFrame, pairs: DataFrame, survivor_scope: str = "corpus"
) -> DataFrame:
    """Shared exemplar policy for the perceptual-lane dedup stages:
    connected components over the pair stream, keep the min-doc_id
    exemplar per cluster, docs outside any cluster untouched.

    CORPUS-WIDE SURVIVOR HAZARD (see curate()): clusters and
    exemplars are computed over the full corpus — if an earlier stage
    dropped a cluster's exemplar, the intersection removes the whole
    cluster. survivor_scope="keepset" clusters only the edges with
    both ends still kept, so the min-id SURVIVING member is the
    exemplar."""
    from flapi_spark.operators.dedup import label_components

    if survivor_scope == "keepset":
        pairs = _pairs_within(pairs, keep)
    else:
        _check_scope(survivor_scope)
    comps = label_components(pairs.select("doc_a", "doc_b"))
    dropped = comps.where(
        F.col("doc_id") != F.col("component_id")
    ).select("doc_id")
    return keep.join(dropped, "doc_id", "left_anti")


def _image_near_dedup(
    spark: SparkSession,
    sf_dir: str,
    keep: DataFrame,
    max_hamming: int = 10,
    survivor_scope: str = "corpus",
) -> DataFrame:
    """IMAGE near-dup clusters (round 9): dHash pairs from the
    multimodal lane (mm_phash_pairs) through the shared exemplar
    policy — the image sibling of near_dedup."""
    from flapi_spark.multimodal import mm_phash_pairs

    return _drop_cluster_non_exemplars(
        keep, mm_phash_pairs(spark, sf_dir, max_hamming=max_hamming),
        survivor_scope,
    )


def _audio_near_dedup(
    spark: SparkSession,
    sf_dir: str,
    keep: DataFrame,
    max_hamming: int = 10,
    survivor_scope: str = "corpus",
) -> DataFrame:
    """AUDIO near-dup clusters (round 9): envelope-hash pairs through
    the shared exemplar policy — the audio sibling of
    image_near_dedup."""
    from flapi_spark.multimodal import mm_audio_fingerprint_pairs

    return _drop_cluster_non_exemplars(
        keep,
        mm_audio_fingerprint_pairs(spark, sf_dir, max_hamming=max_hamming),
        survivor_scope,
    )


def _video_near_dedup(
    spark: SparkSession,
    sf_dir: str,
    keep: DataFrame,
    max_hamming: int = 10,
    survivor_scope: str = "corpus",
) -> DataFrame:
    """VIDEO near-dup clusters (round 10, closing the modality set in
    the pipeline: VERDICT r9 item 3): any-frame-match doc pairs from
    the video lane's doc-grain rollup (mm_video_phash_pairs) through
    the shared exemplar policy — trim/reorder-robust by the lane's
    construction."""
    from flapi_spark.multimodal import mm_video_phash_pairs

    return _drop_cluster_non_exemplars(
        keep, mm_video_phash_pairs(spark, sf_dir, max_hamming=max_hamming),
        survivor_scope,
    )


def _semantic_dedup(
    spark: SparkSession,
    sf_dir: str,
    keep: DataFrame,
    threshold: float = 0.4,
    cells_mod: int = 25,
    refine_iters: int = 0,
    survivor_scope: str = "corpus",
) -> DataFrame:
    """SEMANTIC (embedding-space) dedup (round 10c, closing the last
    modality absent from the pipeline): SemDeDup cluster-then-prune
    verdicts (dedup.semdedup_clusters — IVF cells bound the pairwise
    term) applied to the keep-set. The corpus carries one embedding
    per document (vec_id == doc_id, the testdata contract the hybrid
    retrieval entry also relies on).

    CORPUS-WIDE SURVIVOR HAZARD (see curate()): verdicts are computed
    over the full embedding corpus — if an earlier stage dropped a
    cluster's lowest-id survivor, the intersection removes the whole
    cluster. survivor_scope="keepset" restricts the within-cell
    pairwise verdicts to vectors still in the keep-set (cell
    assignment stays corpus-stable), so the lowest SURVIVING id wins
    each dup pair."""
    from flapi_spark.operators.dedup import semdedup_clusters

    within = None
    if survivor_scope == "keepset":
        within = keep.select(F.col("doc_id").alias("vec_id"))
    else:
        _check_scope(survivor_scope)
    survivors = (
        semdedup_clusters(
            spark, sf_dir, threshold=threshold, cells_mod=cells_mod,
            refine_iters=refine_iters, within=within,
        )
        .where("keep")
        .select(F.col("vec_id").alias("doc_id"))
    )
    return keep.join(survivors, "doc_id", "left_semi")


def _cluster_prune(
    spark: SparkSession,
    sf_dir: str,
    keep: DataFrame,
    frac: float = 0.25,
    cells_mod: int = 25,
    refine_iters: int = 0,
) -> DataFrame:
    """Embedding-cluster outlier pruning (round 10d): drop the
    least-prototypical `frac` of every embedding cell
    (similarity.embedding_outlier_prune — lowest cosine to the
    assigned centroid; Sorscher et al. 2022 pruning as a cleaning
    gate). vec_id == doc_id, the same corpus contract as
    semantic_dedup. Unlike the dedup stages there is NO corpus-wide
    survivor hazard here: each document's verdict is independent of
    which other documents earlier stages kept, so intersecting with
    the keep-set is exact."""
    from flapi_spark.operators.similarity import embedding_outlier_prune

    survivors = (
        embedding_outlier_prune(
            spark, sf_dir, frac=frac, mod=cells_mod,
            refine_iters=refine_iters,
        )
        .where(~F.col("outlier"))
        .select(F.col("vec_id").alias("doc_id"))
    )
    return keep.join(survivors, "doc_id", "left_semi")


def _perplexity_gate(
    spark: SparkSession,
    sf_dir: str,
    keep: DataFrame,
    drop_buckets: tuple = ("tail",),
) -> DataFrame:
    """CCNet perplexity gate (round 10d): drop documents whose
    bigram-LM fluency lands in the given per-language terciles
    (ccnet_perplexity_buckets; CCNet keeps head, drops or
    down-weights tail — Wenzek et al. 2020). CORPUS-WIDE verdict
    hazard is mild but real: the tercile CUT POINTS are computed over
    the full corpus, not the surviving keep-set, so a heavily
    pre-filtered keep-set can see slightly more or fewer than a third
    of its members in each corpus-grain bucket (the cut itself never
    moves, which is what makes the funnel reproducible)."""
    from flapi_spark.operators.text import ccnet_perplexity_buckets

    # YAML configs naturally write `drop_buckets: tail` (a bare
    # string) — without this normalization list('tail') would explode
    # into characters and the gate would silently keep everything
    if isinstance(drop_buckets, str):
        drop_buckets = (drop_buckets,)
    drop = list(drop_buckets)
    unknown = set(drop) - {"head", "middle", "tail"}
    if unknown:
        raise ValueError(
            f"perplexity_gate: unknown bucket(s) {sorted(unknown)}"
            " (valid: head, middle, tail)"
        )
    if not drop:
        return keep
    survivors = (
        ccnet_perplexity_buckets(spark, sf_dir)
        .where(~F.col("bucket").isin(*drop))
        .select("doc_id")
    )
    return keep.join(survivors, "doc_id", "left_semi")


def _topic_cap(
    spark: SparkSession,
    sf_dir: str,
    keep: DataFrame,
    per_cell: int = 20,
    cells_mod: int = 25,
    refine_iters: int = 0,
) -> DataFrame:
    """Topic-grain mixture cap (round 10d): keep at most `per_cell`
    most-prototypical members of every embedding cluster
    (similarity.cluster_balanced_keepset) — the embedding-space dual
    of mixture_cap's source-grain budget: an over-crawled topic is
    bounded no matter which sources it arrived through. Verdicts are
    computed corpus-wide (rank within the full cell), but each
    document's verdict does not depend on which other documents
    earlier stages kept, so the keep-set intersection is exact — no
    survivor hazard."""
    from flapi_spark.operators.similarity import cluster_balanced_keepset

    return keep.join(
        cluster_balanced_keepset(
            spark, sf_dir, per_cell=per_cell, mod=cells_mod,
            refine_iters=refine_iters,
        )
        .where("kept")
        .select(F.col("vec_id").alias("doc_id")),
        "doc_id",
        "left_semi",
    )


def _mixture_cap(
    spark: SparkSession, sf_dir: str, keep: DataFrame,
    weights_ppm: dict | None = None, budget_ppm: int = 500_000,
) -> DataFrame:
    """Mixture/token-budget cap (round 10b): keep each source's
    md5-ordered document prefix up to its mixture_token_plan
    allocation — materializes the mixture as the LAST narrowing
    stage before the split. Corpus-wide like the dedup stages: the
    plan and the per-source prefix are computed over the full
    corpus, then intersected with the current keep-set."""
    from flapi_spark.operators.text import mixture_sample_keepset

    return keep.join(
        mixture_sample_keepset(
            spark, sf_dir, weights_ppm=weights_ppm,
            budget_ppm=budget_ppm,
        ).where("keep").select("doc_id"),
        "doc_id",
        "left_semi",
    )


def _license_gate(
    spark: SparkSession, sf_dir: str, keep: DataFrame
) -> DataFrame:
    """Usage-rights gate (round 10e): drop documents whose detected
    license language is restrictive (text_license_detect) — the
    compliance filter a responsibly-sourced corpus runs before any
    quality consideration. Per-document verdict, no survivor
    hazard."""
    from flapi_spark.operators.text import text_license_detect

    return keep.join(
        text_license_detect(spark, sf_dir).where("keep").select("doc_id"),
        "doc_id",
        "left_semi",
    )


def _source_gate(
    spark: SparkSession, sf_dir: str, keep: DataFrame,
    min_pass_pct: int | None = None,
) -> DataFrame:
    """Source-reputation gate (round 10e): drop every document from a
    source whose corpus-wide Gopher pass rate falls below
    `min_pass_pct` — the RefinedWeb host-grain filter: domain quality
    is correlated, so a domain that fails the gates en masse loses
    its remaining docs too. Verdicts are corpus-wide (the reputation
    is a property of the source, not of the current keep-set) but
    per-document independent — no survivor hazard. The reputable
    source list is domain-cardinality tiny and BROADCASTS; the
    keep-set never shuffles for this stage. `min_pass_pct` defaults
    to the operator's own SOURCE_REPUTATION_PCT so stage and
    operator can never silently diverge."""
    from flapi_spark.operators.text import (
        SOURCE_REPUTATION_PCT, source_reputation,
    )

    if min_pass_pct is None:
        min_pass_pct = SOURCE_REPUTATION_PCT
    good = (
        source_reputation(spark, sf_dir, min_pass_pct=min_pass_pct)
        .where("reputable")
        .select("source")
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    kept_docs = docs.join(F.broadcast(good), "source", "left_semi")
    return keep.join(kept_docs.select("doc_id"), "doc_id", "left_semi")


def _semantic_decontam(
    spark: SparkSession, sf_dir: str, keep: DataFrame,
    threshold: float = 0.3,
) -> DataFrame:
    """Embedding-space decontamination (round 10e): drop documents
    whose embedding sits within `threshold` cosine of ANY benchmark
    vector (contamination_semantic; vec_id == doc_id corpus
    contract) — catches the paraphrased eval leakage the n-gram
    decontam stage misses. Benchmark members themselves (vec_id %
    BENCHMARK_MOD == 0) are also dropped: they ARE the held-out eval
    data. Verdicts are corpus-wide but per-document independent — no
    survivor hazard."""
    from flapi_spark.operators.similarity import (
        BENCHMARK_MOD, contamination_semantic,
    )

    # an empty benchmark yields an empty verdict frame, which would
    # read as "everything contaminated" and silently empty the
    # keep-set — fail loudly instead (one tiny filtered count)
    n_bench = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.pmod(F.col("vec_id"), F.lit(BENCHMARK_MOD)) == 0)
        .count()
    )
    if n_bench == 0:
        raise ValueError(
            "semantic_decontam: the benchmark set (vec_id %"
            f" {BENCHMARK_MOD} == 0) is empty for this corpus —"
            " no decontamination verdicts can be computed"
        )
    survivors = (
        contamination_semantic(spark, sf_dir, threshold=threshold)
        .where(~F.col("contaminated"))
        .select(F.col("vec_id").alias("doc_id"))
    )
    return keep.join(survivors, "doc_id", "left_semi")


def _train_split(
    spark: SparkSession, sf_dir: str, keep: DataFrame, split: str = "train"
) -> DataFrame:
    """Deterministic md5 split; keep one side."""
    from flapi_spark.operators.text import split_train_holdout

    return keep.join(
        split_train_holdout(spark, sf_dir)
        .where(F.col("split") == split)
        .select("doc_id"),
        "doc_id",
        "left_semi",
    )


STAGES = {
    "url_filter": _url_filter,
    "html_extract": _html_extract,
    "quality": _quality,
    "boilerplate_gate": _boilerplate_gate,
    "classifier_gate": _classifier_gate,
    "perplexity_gate": _perplexity_gate,
    "langid": _langid,
    "exact_dedup": _exact_dedup,
    "near_dedup": _near_dedup,
    "image_near_dedup": _image_near_dedup,
    "audio_near_dedup": _audio_near_dedup,
    "video_near_dedup": _video_near_dedup,
    "semantic_dedup": _semantic_dedup,
    "cluster_prune": _cluster_prune,
    "topic_cap": _topic_cap,
    "decontam": _decontam,
    "license_gate": _license_gate,
    "source_gate": _source_gate,
    "semantic_decontam": _semantic_decontam,
    "mixture_cap": _mixture_cap,
    "train_split": _train_split,
}

DEFAULT_STAGES = [
    "quality", "langid", "exact_dedup", "near_dedup", "decontam",
]

# stages that elect a survivor/exemplar — the ones curate()'s
# survivor_scope threads into
_DEDUP_STAGES = {
    "exact_dedup", "near_dedup", "image_near_dedup",
    "audio_near_dedup", "video_near_dedup", "semantic_dedup",
}

_FUNNEL_SCHEMA = (
    "stage BIGINT, stage_name STRING, n_in BIGINT, n_out BIGINT,"
    " n_dropped BIGINT"
)

_TOKEN_FUNNEL_SCHEMA = (
    "stage BIGINT, stage_name STRING, tokens_in BIGINT,"
    " tokens_out BIGINT, tokens_dropped BIGINT"
)


@dataclass
class CurationReport:
    """Result of curate(): the surviving keep-set + the attrition
    funnel (list of per-stage dicts incl. wall seconds) and its
    deterministic DataFrame form (counts only — `sec` excluded so the
    funnel is oracle-comparable)."""

    keep: DataFrame
    stages: list[dict] = field(default_factory=list)

    @property
    def funnel_df(self) -> DataFrame:
        rows = [
            (i + 1, s["stage"], s["n_in"], s["n_out"], s["n_in"] - s["n_out"])
            for i, s in enumerate(self.stages)
        ]
        return self.keep.sparkSession.createDataFrame(
            rows, schema=_FUNNEL_SCHEMA
        )

    @property
    def token_funnel_df(self) -> DataFrame:
        """Token-grain attrition (requires curate(token_counts=True)):
        what production curation reports actually publish — an
        aggressive stage that drops 2% of DOCS can still drop 40% of
        TOKENS if it bites the long documents."""
        if not self.stages or "tokens_out" not in self.stages[0]:
            raise ValueError(
                "token_funnel_df requires curate(token_counts=True)"
            )
        rows = [
            (
                i + 1, s["stage"], s["tokens_in"], s["tokens_out"],
                s["tokens_in"] - s["tokens_out"],
            )
            for i, s in enumerate(self.stages)
        ]
        return self.keep.sparkSession.createDataFrame(
            rows, schema=_TOKEN_FUNNEL_SCHEMA
        )


def _parse_stage_spec(
    stages: list | None, caller: str
) -> list[tuple[str, dict]]:
    """The ONE config-shaped stage-list parser (shared by curate and
    curation_drop_attribution): names run with defaults, dict entries
    pass params through; malformed entries fail with the caller's
    name in the message."""
    spec = []
    for s in stages if stages is not None else DEFAULT_STAGES:
        if isinstance(s, str):
            name, params = s, {}
        else:
            params = dict(s)
            if "stage" not in params:
                raise ValueError(
                    f"{caller}: dict-shaped stage {s!r} is missing the"
                    " 'stage' key"
                )
            name = params.pop("stage")
        if name not in STAGES:
            raise ValueError(
                f"{caller}: unknown stage {name!r}"
                f" (available: {sorted(STAGES)})"
            )
        spec.append((name, params))
    return spec


# Verdict-build priority for the §2.6 overlap (lower = submitted
# earlier): the measured long poles — pair-graph dedups, the
# classifier rank cut, the semantic decontam cosine pass — go first
# so FIFO gives them cores from t=0; cheap per-doc gates backfill.
_STAGE_COST_RANK = {
    "video_near_dedup": 0,
    "near_dedup": 0,
    "semantic_decontam": 1,
    "classifier_gate": 1,
    "image_near_dedup": 2,
    "audio_near_dedup": 2,
    "boilerplate_gate": 3,
    "decontam": 3,
    "exact_dedup": 4,
}


def _stage_verdicts(
    spark: SparkSession, sf_dir: str, spec: list, full: DataFrame
) -> list | None:
    """Build every stage's corpus-wide keep-verdict CONCURRENTLY
    (guide §2.6: overlap independent jobs so short stages back-fill
    the executors under the long pole — the near-dup chain).

    Correctness: with corpus-scope survivors every stage is
    `keep ⋈ verdict(corpus)` (semi for gates, anti folded into the
    stage for decontam/exemplar drops), so the chained keep-set is an
    intersection of keep-independent verdict sets — applying each
    stage to the FULL id set and intersecting sequentially is exactly
    the sequential chain (set intersection is associative and the
    funnel counts still fold in chain order). Verdicts that DO depend
    on the incoming keep-set (survivor_scope="keepset") disable the
    overlap — the caller falls back to the sequential chain.

    Each verdict materializes via eager localCheckpoint on its own
    thread: id-grain rows only, so the checkpoint store stays
    metadata-sized at 100 TB while the heavy corpus passes (hashing,
    signatures, classifier scans) run concurrently instead of
    back-to-back. Returns [(verdict_df, build_sec), ...] in stage
    order, or None when any stage opts out."""
    from concurrent.futures import ThreadPoolExecutor

    if any(
        params.get("survivor_scope", "corpus") != "corpus"
        for _name, params in spec
    ):
        return None

    def build(item):
        name, params = item
        t0 = perf_counter()
        v = STAGES[name](spark, sf_dir, full, **params).localCheckpoint(
            eager=True
        )
        return v, round(perf_counter() - t0, 3)

    # Heavy stages submit FIRST (round 12): Spark's FIFO scheduler
    # prioritizes earlier-submitted jobs, so a long-pole verdict
    # (near-dedup chain, classifier rank cut) submitted last starves
    # behind the cheap gates and the funnel wall becomes cheap + long
    # instead of max(long, cheap-backfill). Results return in stage
    # order regardless.
    order = sorted(
        range(len(spec)), key=lambda i: _STAGE_COST_RANK.get(spec[i][0], 5)
    )
    # 4 in flight: enough to fill the long pole's tail, not so many
    # that verdict jobs fight each other for executor slots
    with ThreadPoolExecutor(max_workers=min(4, max(len(spec), 1))) as pool:
        futs = {}
        for i in order:
            futs[i] = pool.submit(build, spec[i])
        return [futs[i].result() for i in range(len(spec))]


def fold_verdict_masks(
    verdicts: list[DataFrame], tokmap: DataFrame | None = None
) -> tuple[DataFrame, list[tuple[int, int | None]]]:
    """Fold k stage verdicts into every funnel count with ONE job
    (round 12, guide §1.2/§2.4): each verdict is span ∩ stage-set
    (unique ids), so the keep-set after stage i is v_1 ∩ … ∩ v_i and
    the counts fall out of one mask histogram — tag each verdict's
    docs with bit 2^i, bit_or per doc, histogram the masks (≤ 2^k
    rows at the driver), and n_out_i = Σ counts of masks whose low
    i+1 bits are all set. `tokmap` (doc_id, n_toks) additionally
    sums token mass per mask for the token funnel. Replaces the
    sequential per-stage semi-join → localCheckpoint → count chain
    (2k+1 driver jobs of id-grain work after the verdicts are built)
    — counts and final keep-set are identical by set algebra.

    Returns (LAZY keep-set DataFrame — its lineage reads only the
    checkpointed verdicts — and per-stage (n_out, tokens_out) with
    tokens_out None when no tokmap)."""
    k = len(verdicts)
    tagged = verdicts[0].select(
        "doc_id", F.lit(1).cast("long").alias("bit")
    )
    for i in range(1, k):
        tagged = tagged.unionAll(
            verdicts[i].select(
                "doc_id", F.lit(1 << i).cast("long").alias("bit")
            )
        )
    mask = tagged.groupBy("doc_id").agg(F.expr("bit_or(bit)").alias("m"))
    aggs = [F.count(F.lit(1)).alias("n")]
    counted = mask
    if tokmap is not None:
        counted = mask.join(tokmap, "doc_id", "left")
        aggs.append(F.coalesce(F.sum("n_toks"), F.lit(0)).alias("t"))
    hist = counted.groupBy("m").agg(*aggs).collect()
    out = []
    for i in range(k):
        pref = (1 << (i + 1)) - 1
        n = sum(r["n"] for r in hist if r["m"] & pref == pref)
        t = (
            sum(int(r["t"]) for r in hist if r["m"] & pref == pref)
            if tokmap is not None
            else None
        )
        out.append((n, t))
    keep = mask.where(F.col("m") == F.lit((1 << k) - 1)).select("doc_id")
    return keep, out


def curate_from_config(
    spark: SparkSession, sf_dir: str, config_path: str
) -> CurationReport:
    """Run curate() from a YAML pipeline config — the endpoint-style
    entry point (an operator chain is config DATA, like an endpoint's
    SQL template). Schema:

        stages:
          - quality
          - stage: langid
            langs: [en]
          - near_dedup

    i.e. the same list shape curate(stages=) takes, in YAML."""
    import yaml

    with open(config_path) as f:
        doc = yaml.safe_load(f) or {}
    stages = doc.get("stages")
    if not isinstance(stages, list) or not stages:
        raise ValueError(
            f"pipeline config {config_path}: requires a non-empty"
            " 'stages' list"
        )
    return curate(
        spark, sf_dir, stages=stages,
        survivor_scope=doc.get("survivor-scope", "corpus"),
    )


def curate(
    spark: SparkSession,
    sf_dir: str,
    stages: list | None = None,
    checkpoint: bool = True,
    token_counts: bool = False,
    survivor_scope: str = "corpus",
) -> CurationReport:
    """Run the curation chain over `documents` at `sf_dir`.

    `stages` is a config-shaped list: each element a stage name from
    STAGES or a dict {"stage": <name>, <param>: <value>, ...} whose
    extra keys pass through to the stage builder (e.g.
    {"stage": "langid", "langs": ["en"]} or {"stage": "near_dedup",
    "band_table": ..., "shingle_store": ...}). Attrition is monotone
    by construction (every stage only narrows the keep-set) and
    enforced at runtime.

    CORPUS-WIDE SURVIVOR SEMANTICS (all dedup stages — exact_dedup,
    near_dedup, image/audio/video_near_dedup): each stage picks
    survivors/exemplars over the FULL corpus, then intersects with
    the current keep-set. This keeps the survivor choice a stable
    corpus-level property (the persisted production indexes compute
    it once at build time, independent of any one pipeline's stage
    order) — but it means a cluster whose chosen survivor an EARLIER
    stage already dropped loses ALL its members: the cluster
    disappears from the curated output rather than electing a new
    exemplar among the survivors. Order dedup stages before lossy
    gates (or accept the stricter drop) if that matters for your
    corpus — or opt into survivor_scope="keepset" (round 11, VERDICT
    r10 item 5): every dedup stage then recomputes its exemplar among
    the CURRENT keep-set's members (same quality/min-id policy,
    restricted graph/grouping), so surviving clusters always retain
    one member. The default stays "corpus" — the stable
    corpus-level survivor choice the persisted production indexes
    (and the pinned funnel oracles) compute. A per-stage
    {"stage": ..., "survivor_scope": ...} dict overrides the
    pipeline-level value.

    `token_counts=True` additionally measures TOKEN attrition per
    stage (one extra sum over the keep-set joined to a persisted
    doc→token-count map — the id-grain contract holds: the map is
    (doc_id, n_toks), never text) and enables report.token_funnel_df.

    Returns a CurationReport; report.keep is the surviving doc_id
    DataFrame, report.stages the per-stage attrition (+ wall
    seconds), report.funnel_df the deterministic funnel."""
    _check_scope(survivor_scope)
    spec = _parse_stage_spec(stages, caller="curate")
    if survivor_scope != "corpus":
        spec = [
            (
                name,
                {"survivor_scope": survivor_scope, **params}
                if name in _DEDUP_STAGES
                else params,
            )
            for name, params in spec
        ]

    keep = load_table(spark, sf_dir, "documents").select("doc_id")
    n_prev = keep.count()
    tokmap = None
    tok_prev = None
    if token_counts:
        from flapi_spark.operators.text import _tokens

        tokmap = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", F.size(_tokens()).alias("n_toks"))
            .persist()
        )
        tok_prev = _token_sum(tokmap, keep)
    report = CurationReport(keep=keep)
    verdicts = (
        _stage_verdicts(spark, sf_dir, spec, keep)
        if checkpoint and survivor_scope == "corpus" and len(spec) <= 62
        else None
    )
    try:
        if verdicts is not None:
            # mask-histogram fast path — see fold_verdict_masks
            keep, outs = fold_verdict_masks(
                [v for v, _sec in verdicts],
                tokmap=tokmap if token_counts else None,
            )
            if checkpoint:
                keep = keep.localCheckpoint(eager=True)
            for (name, _params), (v, build_sec), (n, tok) in zip(
                spec, verdicts, outs
            ):
                entry = {
                    "stage": name,
                    "n_in": n_prev,
                    "n_out": n,
                    # the stage's verdict built on its own thread —
                    # report its build wall (the honest cost)
                    "sec": build_sec,
                }
                if token_counts:
                    entry["tokens_in"] = tok_prev
                    entry["tokens_out"] = tok
                    tok_prev = tok
                report.stages.append(entry)
                if n > n_prev:
                    raise RuntimeError(
                        f"curate: stage {name!r} widened the keep-set"
                        f" ({n_prev} -> {n}) — stages must only"
                        " narrow it"
                    )
                n_prev = n
        else:
            for name, params in spec:
                t0 = perf_counter()
                keep = STAGES[name](spark, sf_dir, keep, **params)
                if checkpoint:
                    keep = keep.localCheckpoint(eager=True)
                n = keep.count()
                entry = {
                    "stage": name,
                    "n_in": n_prev,
                    "n_out": n,
                    "sec": round(perf_counter() - t0, 3),
                }
                if token_counts:
                    tok = _token_sum(tokmap, keep)
                    entry["tokens_in"] = tok_prev
                    entry["tokens_out"] = tok
                    tok_prev = tok
                report.stages.append(entry)
                if n > n_prev:
                    # explicit raise, not assert: the monotone-
                    # attrition invariant must survive `python -O`
                    # (round-10 ADVICE fix)
                    raise RuntimeError(
                        f"curate: stage {name!r} widened the keep-set"
                        f" ({n_prev} -> {n}) — stages must only"
                        " narrow it"
                    )
                n_prev = n
    finally:
        if tokmap is not None:
            tokmap.unpersist()
    report.keep = keep
    return report


def curation_drop_attribution(
    spark: SparkSession,
    sf_dir: str,
    stages: list | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Per-(stage, source) FIRST-DROP attribution (round 10e): for
    every document, which stage removed it — the observability
    surface behind the funnel. The funnel says "near_dedup dropped
    1,200 docs"; this says "90% of them came from src7", which is
    what turns a mysterious attrition cliff into a data-sourcing
    decision. Documents surviving the whole chain land in the final
    'kept' bucket, so the n_docs column sums to the corpus size.

    Output: (stage, stage_name, source, n_docs), one row per
    (stage, source) with a non-zero count; stage len(stages)+1 is
    'kept'.

    Scale shape: the chain runs ONCE (same stage operators, same
    checkpointed id-grain keep-sets as curate()); each stage's drop
    set is keep_prev ANTI-JOIN keep_new at id grain — never text —
    and the final attribution is one map-side-combined groupBy at
    (stage, source) cardinality. Exact DuckDB oracle chains the
    stage predicates as keep-set CTEs and takes per-stage EXCEPTs."""
    spec = _parse_stage_spec(stages, caller="curation_drop_attribution")

    keep = load_table(spark, sf_dir, "documents").select("doc_id")
    # same §2.6 overlap as curate(): stage verdicts are corpus-wide
    # and keep-independent here (this surface has no keepset scope),
    # so they build concurrently and the chain is id-grain joins
    verdicts = (
        _stage_verdicts(spark, sf_dir, spec, keep)
        if checkpoint and len(spec) <= 62
        else None
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    if verdicts is not None:
        # Mask fast path (round 12, the curate() trick): a doc's
        # first-drop stage is the LOWEST UNSET BIT of its per-stage
        # verdict mask (the sequential chain drops a doc at the first
        # stage whose verdict excludes it), and survivors have every
        # bit set — so the whole attribution is one bit_or + one
        # (stage, source)-grain groupBy instead of k anti-joins over
        # k checkpointed keep-sets. Row-identical by set algebra.
        k = len(spec)
        tagged = verdicts[0][0].select(
            "doc_id", F.lit(1).cast("long").alias("bit")
        )
        for i in range(1, k):
            tagged = tagged.unionAll(
                verdicts[i][0].select(
                    "doc_id", F.lit(1 << i).cast("long").alias("bit")
                )
            )
        mask = tagged.groupBy("doc_id").agg(
            F.expr("bit_or(bit)").alias("m")
        )
        # docs in NO verdict are absent from mask: coalesce to 0 so
        # the lowest unset bit is bit 0 — dropped at stage 1
        mm = F.coalesce(F.col("m"), F.lit(0).cast("long"))
        stage_expr = F.lit(k + 1).cast("long")
        name_expr = F.lit("kept")
        for i in range(k - 1, -1, -1):
            unset = mm.bitwiseAND(F.lit(1 << i)) == 0
            stage_expr = F.when(unset, F.lit(i + 1).cast("long")).otherwise(
                stage_expr
            )
            name_expr = F.when(unset, F.lit(spec[i][0])).otherwise(name_expr)
        attributed = docs.join(mask, "doc_id", "left").select(
            "source", stage_expr.alias("stage"), name_expr.alias("stage_name")
        )
        return attributed.groupBy("stage", "stage_name", "source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs")
        )
    tagged = []
    for i, (name, params) in enumerate(spec, 1):
        new = STAGES[name](spark, sf_dir, keep, **params)
        if checkpoint:
            new = new.localCheckpoint(eager=True)
        tagged.append(
            keep.join(new, "doc_id", "left_anti").select(
                "doc_id",
                F.lit(i).cast("long").alias("stage"),
                F.lit(name).alias("stage_name"),
            )
        )
        keep = new
    tagged.append(
        keep.select(
            "doc_id",
            F.lit(len(spec) + 1).cast("long").alias("stage"),
            F.lit("kept").alias("stage_name"),
        )
    )
    union = tagged[0]
    for t in tagged[1:]:
        union = union.unionByName(t)
    return (
        union.join(docs, "doc_id")
        .groupBy("stage", "stage_name", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def _token_sum(tokmap: DataFrame, keep: DataFrame) -> int:
    """Total tokens across a keep-set: id-grain semi-join against the
    persisted doc→token-count map, one scalar out."""
    row = (
        tokmap.join(keep.select("doc_id"), "doc_id", "left_semi")
        .agg(F.coalesce(F.sum("n_toks"), F.lit(0)).alias("t"))
        .collect()[0]
    )
    return int(row["t"])


def materialize_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    keep: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    seed: str = "epoch0",
) -> DataFrame:
    """The last mile of the curation chain (round 10d): write the
    surviving corpus as deterministic, training-ready shards and
    return the shard manifest. Shard identity and within-shard order
    come from corpus_shard_assign's seeded md5 rank — decorrelated
    from crawl/source order, reproducible across reruns and engines,
    re-shuffled per epoch by changing `seed`. Output layout:
    ``out_dir/shard=K/*.parquet`` rows (doc_id, position, text,
    source, lang, n_tokens), sorted by position within each shard's
    files.

    Scale shape: one id-grain semi-join (keep-set, never text,
    flows), the shard/position projection, then ONE shuffle keyed on
    shard with `sortWithinPartitions(position)` — each shard writes
    as one ordered partition; raise n_shards with corpus size so a
    shard fits an executor (the corpus_shard_assign contract).
    Overwrite mode makes re-materialization idempotent. The returned
    manifest (shard, n_docs, n_tokens) is what a trainer's data
    loader reads first — a shard-count or token-budget mismatch is a
    pipeline bug surfaced before any GPU spins."""
    from flapi_spark.operators.text import _tokens, corpus_shard_assign

    assign = corpus_shard_assign(
        spark, sf_dir, n_shards=n_shards, seed=seed
    ).select("doc_id", "shard", F.col("pos").alias("position"))
    docs = (
        load_table(spark, sf_dir, "documents")
        .join(keep.select("doc_id"), "doc_id", "left_semi")
        .join(assign, "doc_id")
        .select(
            "doc_id", "shard", "position", "text", "source", "lang",
            F.size(_tokens()).cast("long").alias("n_tokens"),
        )
    )
    (
        docs.repartition(n_shards, "shard")
        .sortWithinPartitions("position")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(out_dir)
    )
    written = spark.read.parquet(out_dir)
    return written.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
