"""Incremental (delta) curation — round 10f.

`curate()` (flapi_spark.pipeline) is the BATCH curation chain: it
re-computes every corpus-wide verdict from scratch. At 100 TB nobody
re-curates the corpus when a day's crawl lands — the accepted corpus
is frozen behind persisted indexes and only the DELTA is processed:

- per-doc gates (quality, langid, decontam) run on the delta alone —
  the doc_id bound is pushed into the parquet scan, so the batch cost
  is O(delta) rows read, not O(corpus);
- exact dedup probes a persisted fingerprint index
  (dedup.write_exact_index) — a bucketed semi-join, no corpus re-hash;
- near dedup probes the persisted PORTABLE band index + shingle store
  (dedup.probe_band_index_portable) — new×index candidates read the
  bucketed index without an exchange, verification never scans the
  corpus.

Survivor policy (documented, delta-consistent): the ACCEPTED CORPUS
ALWAYS WINS — a delta doc that duplicates any indexed doc is dropped;
within a delta batch the min-doc_id member of each duplicate
cluster/fingerprint survives (the perceptual lanes'
_drop_cluster_non_exemplars exemplar policy). This differs from batch
curate()'s quality-ranked keep_best on purpose: an ingest path must
never evict an already-accepted corpus doc, so "best" is decided once
at batch-curation time and the delta path only ever defends the
index. `curate_base` applies the SAME min-id policy so a base+delta
split is a single coherent world: every verdict either engine-side or
oracle-side is reproducible from doc_ids and md5 alone, keeping the
whole delta funnel exactly DuckDB-checkable.

Reference parity: the reference has no incremental curation — this is
brief-driven LLM-data-pipeline surface (SURVEY §2.3), the batch
sibling of the streaming ingest guards (streaming.py, multimodal.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from time import perf_counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flapi_spark.pipeline import (
    CurationReport,
    _drop_cluster_non_exemplars,
    fold_verdict_masks,
)
from flapi_spark.session import load_table


@dataclass(frozen=True)
class DeltaIndexes:
    """The persisted indexes a delta batch probes: the portable band
    index + shingle store (text near-dup), the exact fingerprint
    index, and optional per-modality perceptual fingerprint indexes
    (one table per modality/hash function — the write_phash_index
    contract). All bucketed warehouse tables written from the
    ACCEPTED corpus by bootstrap_delta_indexes; a perceptual stage
    requires its table to be named."""

    band_table: str = "neardup_band_index_portable"
    shingle_store: str = "neardup_shingle_store_portable"
    exact_table: str = "dedup_exact_index"
    image_table: str | None = None
    audio_table: str | None = None
    video_table: str | None = None


def bootstrap_delta_indexes(
    spark: SparkSession,
    sf_dir: str,
    accepted: DataFrame,
    indexes: DeltaIndexes = DeltaIndexes(),
    buckets: int = 16,
) -> None:
    """Write the delta-curation indexes from the accepted keep-set (a
    doc_id DataFrame, e.g. curate_base(...).keep): the one-time
    bootstrap after batch curation; thereafter every ingest batch
    probes + appends, never rebuilds. Perceptual fingerprint indexes
    are written only for the modalities whose tables are named in
    `indexes` (each from the accepted slice of that modality's
    synthesized corpus — in production, the media actually accepted)."""
    from flapi_spark.operators.dedup import (
        write_band_index_portable,
        write_exact_index,
        write_shingle_store_portable,
    )

    docs = load_table(spark, sf_dir, "documents").join(
        accepted.select("doc_id"), "doc_id", "left_semi"
    )
    write_band_index_portable(spark, docs, indexes.band_table, buckets)
    write_shingle_store_portable(spark, docs, indexes.shingle_store, buckets)
    write_exact_index(spark, docs, indexes.exact_table, buckets)
    if any((indexes.image_table, indexes.audio_table, indexes.video_table)):
        from flapi_spark.multimodal import (
            _audio_fps,
            _image_fps,
            _video_fps,
            synthesize_audio_corpus,
            synthesize_image_corpus,
            synthesize_video_corpus,
            write_phash_index,
        )

        keep_ids = accepted.select("doc_id")
        for table, synth, fps_of in (
            (indexes.image_table, synthesize_image_corpus, _image_fps),
            (indexes.audio_table, synthesize_audio_corpus, _audio_fps),
            (indexes.video_table, synthesize_video_corpus, _video_fps),
        ):
            if table is None:
                continue
            media = synth(spark, sf_dir).join(
                keep_ids, "doc_id", "left_semi"
            )
            write_phash_index(spark, fps_of(media), table, buckets)


def _delta_docs(spark: SparkSession, sf_dir: str, since: int) -> DataFrame:
    """The delta slice, with the bound pushed into the parquet scan
    (PushedFilters: IsNotNull, GreaterThanOrEqual — plan-asserted)."""
    return load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") >= F.lit(int(since))
    )


def _base_docs(spark: SparkSession, sf_dir: str, until: int) -> DataFrame:
    return load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < F.lit(int(until))
    )


# --- span-scoped stage builders (shared by curate_base and the delta
# --- per-doc gates: the operator output is filtered on the SAME
# --- doc_id bound, which Catalyst pushes through the projection into
# --- the scan — correctness is unchanged (per-doc verdicts don't
# --- depend on other rows) and the stage reads only its span) -------


def _span_quality(
    spark: SparkSession, sf_dir: str, keep: DataFrame, cond: F.Column
) -> DataFrame:
    from flapi_spark.operators.text import text_gopher_filters

    gate = text_gopher_filters(spark, sf_dir).where(cond).where("keep")
    return keep.join(gate.select("doc_id"), "doc_id", "left_semi")


def _span_langid(
    spark: SparkSession, sf_dir: str, keep: DataFrame, cond: F.Column
) -> DataFrame:
    from flapi_spark.operators.text import text_langid

    gate = (
        text_langid(spark, sf_dir)
        .where(cond)
        .where(F.col("predicted_lang") != "unknown")
    )
    return keep.join(gate.select("doc_id"), "doc_id", "left_semi")


def _span_decontam(
    spark: SparkSession, sf_dir: str, keep: DataFrame, cond: F.Column
) -> DataFrame:
    """Drop span docs sharing n-grams with the benchmark eval set.
    The eval side is the EXTERNAL benchmark (fixed doc_id % 50 == 0
    sample here) — deliberately era-independent: a benchmark doesn't
    grow with the corpus, so base and delta decontaminate against the
    same set. The span bound on train_doc pushes through the
    aggregation to the train-side scan."""
    from flapi_spark.operators.text import contamination_ngram_overlap

    cont = contamination_ngram_overlap(spark, sf_dir).where(cond)
    return keep.join(
        cont.select(F.col("train_doc").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )


def _span_gate(
    op, spark: SparkSession, sf_dir: str, keep: DataFrame, cond: F.Column
) -> DataFrame:
    """Generic per-doc gate with the span bound pushed into the scan:
    shared by the url/html/license stages (gopher/langid keep their
    named wrappers for the docstring contracts)."""
    gate = op(spark, sf_dir).where(cond).where("keep")
    return keep.join(gate.select("doc_id"), "doc_id", "left_semi")


_MM_LANES = {
    "image_near_dedup": ("synthesize_image_corpus", "_image_fps"),
    "audio_near_dedup": ("synthesize_audio_corpus", "_audio_fps"),
    "video_near_dedup": ("synthesize_video_corpus", "_video_fps"),
}


def _mm_lane(stage: str):
    import flapi_spark.multimodal as M

    synth_name, fps_name = _MM_LANES[stage]
    return getattr(M, synth_name), getattr(M, fps_name)


def _mm_delta_pairs(fps: DataFrame, stage: str, max_hamming: int) -> DataFrame:
    """Within-batch perceptual pairs at the DOC grain: the banded
    Hamming self-join over the batch fingerprints; video composite
    frame keys roll up by any-frame-match (the mm_video_phash_pairs
    semantics)."""
    from flapi_spark.multimodal import VID_FRAME_KEY_SPAN
    from flapi_spark.operators.dedup import _simhash_pairs

    raw = _simhash_pairs(fps, max_hamming, n_bands=8)
    if stage != "video_near_dedup":
        return raw.select("doc_a", "doc_b")
    span = VID_FRAME_KEY_SPAN
    return (
        raw.select(
            F.expr(f"doc_a div {span}").alias("da"),
            F.expr(f"doc_b div {span}").alias("db"),
        )
        .where(F.col("da") != F.col("db"))
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
        )
        .distinct()
    )


def _mm_delta_stage(
    spark: SparkSession,
    sf_dir: str,
    keep: DataFrame,
    since: int,
    stage: str,
    table: str,
    max_hamming: int = 10,
) -> DataFrame:
    """Perceptual delta near-dedup (image/audio/video): hash ONLY the
    batch's media (in production the media frame IS the arriving
    batch; the synthesized corpora stand in here, filtered to the
    delta span), probe the persisted per-modality fingerprint index
    for accepted-corpus hits (corpus wins — any match drops the delta
    doc), and cluster within-batch pairs with the min-id exemplar
    policy. The probe is the stateless guard core
    (multimodal.fingerprint_guard_stream) run as a batch join: one
    (band_id, bv) equi-join against the bucketed index, verify inline
    from the carried fingerprints.

    The index side is bounded to BASE-span keys (the retry guard the
    exact stage carries, round 11): the batch delta lane never appends
    to phash indexes itself, but the STREAMING maintainers
    (multimodal phash maintainer) may share the table — without the
    bound, a batch retried after a concurrent maintainer folded it in
    would drop against its own fingerprints. Video fingerprints key
    frames as doc_id·SPAN + frame, so its bound scales by SPAN."""
    from flapi_spark.multimodal import (
        VID_FRAME_KEY_SPAN,
        fingerprint_guard_stream,
    )

    synth, fps_of = _mm_lane(stage)
    media = synth(spark, sf_dir).where(F.col("doc_id") >= F.lit(since))
    # decode/hash once: the banded self-join + the index probe both
    # consume the fingerprints (the mm lanes' Python-decode rule)
    fps = fps_of(media).localCheckpoint(eager=True)
    bound = (
        since * VID_FRAME_KEY_SPAN
        if stage == "video_near_dedup"
        else since
    )
    index = spark.table(table).where(F.col("doc_id") < F.lit(bound))
    hits = fingerprint_guard_stream(fps, index, max_hamming)
    doc_col = (
        F.expr(f"doc_id div {VID_FRAME_KEY_SPAN}")
        if stage == "video_near_dedup"
        else F.col("doc_id")
    )
    corpus_drop = hits.select(doc_col.alias("doc_id")).distinct()
    keep = _drop_cluster_non_exemplars(
        keep, _mm_delta_pairs(fps, stage, max_hamming)
    )
    return keep.join(corpus_drop, "doc_id", "left_anti")


def _mm_base_stage(
    spark: SparkSession,
    sf_dir: str,
    keep: DataFrame,
    until: int,
    stage: str,
    max_hamming: int = 10,
) -> DataFrame:
    """Perceptual base near-dedup: within-span pairs only (no index
    yet at T0), min-id exemplar — the batch pipeline's perceptual
    stage semantics restricted to the base span."""
    synth, fps_of = _mm_lane(stage)
    media = synth(spark, sf_dir).where(F.col("doc_id") < F.lit(until))
    fps = fps_of(media).localCheckpoint(eager=True)
    return _drop_cluster_non_exemplars(
        keep, _mm_delta_pairs(fps, stage, max_hamming)
    )


def _inline_portable_pairs(
    spark: SparkSession, docs: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """dedup_minhash_portable's verified pair stream over an arbitrary
    docs frame (band collision + exact-Jaccard verify are pairwise
    properties, so pairs over a doc_id span equal the full-corpus
    pairs restricted to that span — the identity the delta oracle
    leans on)."""
    from flapi_spark.operators.dedup import (
        _portable_band_keys,
        _verify_jaccard_md5,
        band_rows_portable_for,
    )

    # materialize the band rows once before the self-join (round 11):
    # same md5-chain double-compute fix as dedup_minhash_portable —
    # id-grain proxy rows, the corpus is hashed exactly once
    bands = band_rows_portable_for(docs).localCheckpoint(eager=True)
    keys = _portable_band_keys()
    ca = bands.select(F.col("doc_id").alias("doc_a"), *keys)
    cb = bands.select(F.col("doc_id").alias("doc_b"), *keys)
    cands = (
        ca.join(cb, keys)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify_jaccard_md5(docs, cands, threshold)


DELTA_STAGES = ["quality", "langid", "exact_dedup", "near_dedup", "decontam"]

# every stage the base/delta chains know, in canonical chain order;
# DELTA_STAGES above is the DEFAULT subset (the batch pipeline's
# default chain), kept for callers that don't configure gates
KNOWN_STAGES = [
    "url_filter", "html_extract", "license_gate",
    "quality", "langid", "exact_dedup", "near_dedup",
    "image_near_dedup", "audio_near_dedup", "video_near_dedup",
    "decontam",
]


def _overlap_verdicts(
    fns: list, full: DataFrame, names: list[str] | None = None
) -> list:
    """Build every stage's span-wide keep-verdict CONCURRENTLY (the
    same guide-§2.6 overlap as pipeline._stage_verdicts): each base/
    delta stage is `keep ∩ span-wide verdict` (semi/anti joins over
    verdicts computed from the span or the persisted indexes, never
    from the incoming keep-set — the module's accepted-corpus-wins /
    min-id-over-the-full-span policy), so the verdict sets are
    independent and short gates back-fill executors under the
    near-dup probe's wall. Returns [(verdict_df, build_sec), ...] in
    stage order; each verdict is an id-grain eager localCheckpoint.
    `names` lets the heavy stages submit first (FIFO priority — see
    pipeline._STAGE_COST_RANK)."""
    from concurrent.futures import ThreadPoolExecutor

    from flapi_spark.pipeline import _STAGE_COST_RANK

    def build(fn):
        t0 = perf_counter()
        v = fn(full).localCheckpoint(eager=True)
        return v, round(perf_counter() - t0, 3)

    order = sorted(
        range(len(fns)),
        key=lambda i: _STAGE_COST_RANK.get(names[i], 5) if names else 5,
    )
    with ThreadPoolExecutor(max_workers=min(4, max(len(fns), 1))) as pool:
        futs = {i: pool.submit(build, fns[i]) for i in order}
        return [futs[i].result() for i in range(len(fns))]


def _select_stages(stages: list[str] | None, caller: str) -> list[str]:
    picked = list(stages) if stages is not None else list(DELTA_STAGES)
    unknown = [s for s in picked if s not in KNOWN_STAGES]
    if unknown:
        raise ValueError(
            f"{caller}: unknown stage(s) {unknown!r}"
            f" (available: {KNOWN_STAGES})"
        )
    return picked


def curate_base(
    spark: SparkSession,
    sf_dir: str,
    until_doc_id: int,
    stages: list[str] | None = None,
    checkpoint: bool = True,
) -> CurationReport:
    """Batch-curate the BASE corpus (doc_id < until_doc_id) with the
    delta-consistent stage chain: quality → langid → exact dedup
    (min-id survivor) → near dedup (min-id exemplar over the portable
    pair graph) → decontam. This is the T0 batch whose accepted set
    seeds bootstrap_delta_indexes; its survivor policy matches
    curate_delta's so the base+delta world is one coherent corpus
    (module docstring). Every stage verdict is engine-portable
    (md5-only), so the whole report is exactly DuckDB-checkable.

    WHOLE-GROUP-LOSS HAZARD (ADVICE r10; deliberate, oracle-mirrored):
    both dedup stages elect the min-doc_id survivor over the FULL
    span regardless of earlier-stage verdicts — if a group's min-id
    member was already dropped by quality/langid, the entire group is
    deleted. This keeps the survivor a stable span-level property
    (the persisted indexes assume it); batch pipeline.curate() offers
    the keep-set-restricted alternative (survivor_scope="keepset")
    when retention matters more than stability."""
    until = int(until_doc_id)
    span = F.col("doc_id") < F.lit(until)
    docs = _base_docs(spark, sf_dir, until)
    keep = docs.select("doc_id")
    report = CurationReport(keep=keep)
    n_prev = keep.count()

    def _run(name: str, fn, build_sec: float = 0.0) -> None:
        nonlocal keep, n_prev
        t0 = perf_counter()
        keep = fn(keep)
        if checkpoint:
            keep = keep.localCheckpoint(eager=True)
        n = keep.count()
        report.stages.append(
            {
                "stage": name,
                "n_in": n_prev,
                "n_out": n,
                # overlapped mode: report the verdict's own build
                # wall, not the near-zero id-grain intersect
                "sec": round(max(perf_counter() - t0, build_sec), 3),
            }
        )
        if n > n_prev:
            raise RuntimeError(
                f"curate_base: stage {name!r} widened the keep-set"
                f" ({n_prev} -> {n})"
            )
        n_prev = n

    from flapi_spark.operators.text import norm_text

    def _exact(keep: DataFrame) -> DataFrame:
        fps = docs.select("doc_id", F.md5(norm_text()).alias("fingerprint"))
        surv = fps.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
        return keep.join(surv.select("doc_id"), "doc_id", "left_semi")

    def _near(keep: DataFrame) -> DataFrame:
        pairs = _inline_portable_pairs(spark, docs)
        return _drop_cluster_non_exemplars(keep, pairs)

    from flapi_spark.operators.text import (
        text_html_extract,
        text_license_detect,
        text_url_filter,
    )

    impls = {
        "url_filter": lambda k: _span_gate(
            text_url_filter, spark, sf_dir, k, span
        ),
        "html_extract": lambda k: _span_gate(
            text_html_extract, spark, sf_dir, k, span
        ),
        "license_gate": lambda k: _span_gate(
            text_license_detect, spark, sf_dir, k, span
        ),
        "quality": lambda k: _span_quality(spark, sf_dir, k, span),
        "langid": lambda k: _span_langid(spark, sf_dir, k, span),
        "exact_dedup": _exact,
        "near_dedup": _near,
        "image_near_dedup": lambda k: _mm_base_stage(
            spark, sf_dir, k, until, "image_near_dedup"
        ),
        "audio_near_dedup": lambda k: _mm_base_stage(
            spark, sf_dir, k, until, "audio_near_dedup"
        ),
        "video_near_dedup": lambda k: _mm_base_stage(
            spark, sf_dir, k, until, "video_near_dedup"
        ),
        "decontam": lambda k: _span_decontam(
            spark, sf_dir, k, F.col("train_doc") < F.lit(until)
        ),
    }
    names = _select_stages(stages, "curate_base")
    if checkpoint:
        # §2.6 overlap: span-wide stage verdicts build concurrently;
        # the keep-set and every funnel count fold in ONE mask job
        # (round 12 — see pipeline.fold_verdict_masks)
        verdicts = _overlap_verdicts(
            [impls[n] for n in names], keep, names=names
        )
        keep, outs = fold_verdict_masks([v for v, _sec in verdicts])
        keep = keep.localCheckpoint(eager=True)
        for name, (_v, bsec), (n, _tok) in zip(names, verdicts, outs):
            report.stages.append(
                {"stage": name, "n_in": n_prev, "n_out": n, "sec": bsec}
            )
            if n > n_prev:
                raise RuntimeError(
                    f"curate_base: stage {name!r} widened the keep-set"
                    f" ({n_prev} -> {n})"
                )
            n_prev = n
    else:
        for name in names:
            _run(name, impls[name])
    report.keep = keep
    return report


def curate_delta(
    spark: SparkSession,
    sf_dir: str,
    since_doc_id: int,
    indexes: DeltaIndexes = DeltaIndexes(),
    stages: list[str] | None = None,
    threshold: float = 0.5,
    checkpoint: bool = True,
    maintain_indexes: bool = False,
    marker_dir: str | None = None,
) -> CurationReport:
    """Curate ONLY the delta (doc_id >= since_doc_id) against the
    persisted index triple — the steady-state ingest batch:

    1. quality / langid: per-doc gates, delta-bounded scans.
    2. exact_dedup: drop delta docs whose fingerprint is already in
       the exact index (accepted corpus wins); within the delta the
       min-doc_id holder of each fingerprint survives.
    3. near_dedup: probe_band_index_portable pairs. Pairs with an
       indexed doc (doc_a < since — index ids are all below the
       threshold) drop the delta side; delta×delta pairs cluster via
       connected components with the min-id exemplar policy.
    4. decontam: n-gram overlap vs the external benchmark set,
       delta-bounded on the train side.

    WHOLE-GROUP-LOSS HAZARD (ADVICE r10; deliberate, oracle-mirrored):
    see curate_base — both dedup stages pick survivors over the full
    span/index regardless of earlier-stage verdicts, so a group whose
    chosen survivor an earlier gate dropped vanishes entirely.

    With maintain_indexes=True the ACCEPTED delta docs are appended
    to all three indexes after the last stage (insertInto preserves
    each table's bucket spec), so the next batch probes a corpus that
    includes this one — the batch sibling of the streaming
    fingerprint maintainers. Per-batch cost is O(delta) throughout:
    the corpus appears only through bucketed index reads.

    Maintenance is REPLAY-SAFE (round 11, VERDICT r10 item 3): a
    re-run of a crashed/retried ingest batch is a no-op on the
    indexes. With `marker_dir` set, the streaming maintainers'
    _SUCCESS-marker contract applies keyed on `since_doc_id` — an O(1)
    skip, with the same documented window (a crash AFTER some appends
    but BEFORE the marker duplicates at most one batch; the probe
    dedups candidate pairs, so correctness holds and only index bytes
    inflate). Without `marker_dir` the appends anti-join the batch
    against each table's existing doc_ids — always exactly-once per
    table (even mid-batch crashes replay cleanly) at the cost of one
    index doc_id-column scan per table per batch; prefer `marker_dir`
    where ingest cost must stay strictly O(delta)."""
    since = int(since_doc_id)
    span = F.col("doc_id") >= F.lit(since)
    docs = _delta_docs(spark, sf_dir, since)
    keep = docs.select("doc_id")
    report = CurationReport(keep=keep)
    n_prev = keep.count()

    def _run(name: str, fn, build_sec: float = 0.0) -> None:
        nonlocal keep, n_prev
        t0 = perf_counter()
        keep = fn(keep)
        if checkpoint:
            keep = keep.localCheckpoint(eager=True)
        n = keep.count()
        report.stages.append(
            {
                "stage": name,
                "n_in": n_prev,
                "n_out": n,
                "sec": round(max(perf_counter() - t0, build_sec), 3),
            }
        )
        if n > n_prev:
            raise RuntimeError(
                f"curate_delta: stage {name!r} widened the keep-set"
                f" ({n_prev} -> {n})"
            )
        n_prev = n

    from flapi_spark.operators.text import norm_text

    def _exact(keep: DataFrame) -> DataFrame:
        fps = docs.select("doc_id", F.md5(norm_text()).alias("fingerprint"))
        # the index side is bounded to the BASE span (doc_id < since):
        # after maintain_indexes appends this batch, a RETRY of the
        # same batch would otherwise find its own fingerprints in the
        # index and drop the entire batch as "already accepted" —
        # the near arm has the same guard via doc_a < since (round-11
        # review fix). On a fresh index the bound is a no-op (every
        # indexed id is below the watermark by construction), so the
        # oracle keep-chain is unchanged.
        corpus_dup = fps.join(
            spark.table(indexes.exact_table)
            .where(F.col("doc_id") < F.lit(since))
            .select("fingerprint"),
            "fingerprint",
            "left_semi",
        ).select("doc_id")
        surv = fps.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
        return keep.join(surv.select("doc_id"), "doc_id", "left_semi").join(
            corpus_dup, "doc_id", "left_anti"
        )

    def _near(keep: DataFrame) -> DataFrame:
        from flapi_spark.operators.dedup import probe_band_index_portable

        pairs = probe_band_index_portable(
            spark,
            docs,
            indexes.band_table,
            indexes.shingle_store,
            threshold,
        )
        corpus_drop = (
            pairs.where(F.col("doc_a") < since)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        dd = pairs.where(F.col("doc_a") >= since)
        keep = _drop_cluster_non_exemplars(keep, dd)
        return keep.join(corpus_drop, "doc_id", "left_anti")

    from flapi_spark.operators.text import (
        text_html_extract,
        text_license_detect,
        text_url_filter,
    )

    def _mm(stage: str, table: str | None):
        if table is None:
            raise ValueError(
                f"curate_delta: stage {stage!r} requires its fingerprint"
                " index table to be named in DeltaIndexes (one table"
                " per modality — the write_phash_index contract)"
            )
        return lambda k: _mm_delta_stage(
            spark, sf_dir, k, since, stage, table
        )

    impls = {
        "url_filter": lambda k: _span_gate(
            text_url_filter, spark, sf_dir, k, span
        ),
        "html_extract": lambda k: _span_gate(
            text_html_extract, spark, sf_dir, k, span
        ),
        "license_gate": lambda k: _span_gate(
            text_license_detect, spark, sf_dir, k, span
        ),
        "quality": lambda k: _span_quality(spark, sf_dir, k, span),
        "langid": lambda k: _span_langid(spark, sf_dir, k, span),
        "exact_dedup": _exact,
        "near_dedup": _near,
        "decontam": lambda k: _span_decontam(
            spark, sf_dir, k, F.col("train_doc") >= F.lit(since)
        ),
    }
    names = _select_stages(stages, "curate_delta")
    fns = []
    for name in names:
        if name in _MM_LANES:
            table = {
                "image_near_dedup": indexes.image_table,
                "audio_near_dedup": indexes.audio_table,
                "video_near_dedup": indexes.video_table,
            }[name]
            fns.append(_mm(name, table))
        else:
            fns.append(impls[name])
    if checkpoint:
        # §2.6 overlap, same shape as curate_base: the probe stages'
        # verdicts (persisted-index reads) and the per-doc gates all
        # build concurrently; the keep-set and every funnel count
        # fold in ONE O(delta) mask job (pipeline.fold_verdict_masks)
        verdicts = _overlap_verdicts(fns, keep, names=names)
        keep, outs = fold_verdict_masks([v for v, _sec in verdicts])
        keep = keep.localCheckpoint(eager=True)
        for name, (_v, bsec), (n, _tok) in zip(names, verdicts, outs):
            report.stages.append(
                {"stage": name, "n_in": n_prev, "n_out": n, "sec": bsec}
            )
            if n > n_prev:
                raise RuntimeError(
                    f"curate_delta: stage {name!r} widened the keep-set"
                    f" ({n_prev} -> {n})"
                )
            n_prev = n
    else:
        for name, fn in zip(names, fns):
            _run(name, fn)
    report.keep = keep

    if maintain_indexes:
        accepted = docs.join(report.keep, "doc_id", "left_semi")
        _maintain_indexes_replay_safe(
            spark, accepted, indexes, since, marker_dir
        )
    return report


def _marker_lane(indexes: DeltaIndexes) -> str:
    """One marker namespace per index triple (= per lane), so a shared
    marker_dir can never skip a different lane's maintenance."""
    import re

    return re.sub(
        r"[^A-Za-z0-9_.-]", "_",
        f"{indexes.band_table}__{indexes.shingle_store}"
        f"__{indexes.exact_table}",
    )


def clear_lane_markers(
    marker_dir: str, indexes: DeltaIndexes = DeltaIndexes()
) -> None:
    """Drop every replay marker for this lane — REQUIRED after
    rebuilding the lane's indexes (bootstrap_delta_indexes overwrites
    them, erasing any appended batches; a stale since-keyed marker
    would then skip re-appending those batches forever). The CLI's
    --bootstrap calls this automatically."""
    import os
    import shutil

    lane_dir = os.path.join(marker_dir, _marker_lane(indexes))
    if os.path.isdir(lane_dir):
        shutil.rmtree(lane_dir)


def _maintain_indexes_replay_safe(
    spark: SparkSession,
    accepted: DataFrame,
    indexes: DeltaIndexes,
    since: int,
    marker_dir: str | None,
) -> None:
    """Idempotent append of the accepted batch to the index triple
    (see curate_delta docstring for the two modes). The marker is
    keyed on the batch's `since` watermark AND the index table names
    (one lane = one DeltaIndexes triple) — a shared marker_dir can
    never skip a DIFFERENT lane's maintenance — mirroring
    replay_maintainer's batch_id=N/_SUCCESS layout so operators can
    inspect either lane the same way. Markers are scoped to ONE
    bootstrapped world: rebuilding the indexes (bootstrap) must clear
    the marker dir, or stale markers would skip re-appending batches
    the overwrite erased (the CLI does this for --bootstrap)."""
    import os

    from flapi_spark.operators.dedup import (
        append_band_index_portable,
        append_exact_index,
        append_shingle_store_portable,
    )

    if marker_dir is not None:
        dst = os.path.join(marker_dir, _marker_lane(indexes), f"since={since}")
        if os.path.exists(os.path.join(dst, "_SUCCESS")):
            return  # replayed batch — already folded into the indexes
    appends = (
        (indexes.band_table, append_band_index_portable),
        (indexes.shingle_store, append_shingle_store_portable),
        (indexes.exact_table, append_exact_index),
    )
    for table, append in appends:
        batch = accepted
        if marker_dir is None:
            # exactly-once per TABLE: only docs the table has never
            # seen append, so even a crash between the three appends
            # replays cleanly
            batch = accepted.join(
                spark.table(table).select("doc_id"), "doc_id", "left_anti"
            )
        append(spark, batch, table)
    if marker_dir is not None:
        os.makedirs(dst, exist_ok=True)
        with open(os.path.join(dst, "_SUCCESS"), "w"):
            pass
