"""Round 10e: curation observability + decontamination depth —
semantic decontam, source reputation, per-stage drop attribution."""

from pyspark.sql import functions as F

from tests.conftest import assert_df_matches_oracle


def _oracle(name):
    from flapi_spark.queries import QUERIES

    return QUERIES[name][1]


# --- contamination_semantic --------------------------------------------------


def test_contamination_semantic_matches_oracle(spark, sf_dir, duck):
    from flapi_spark.operators.similarity import contamination_semantic

    assert_df_matches_oracle(
        contamination_semantic(spark, sf_dir),
        duck,
        _oracle("contamination_semantic"),
    )


def test_contamination_semantic_semantics(spark, sf_dir):
    from flapi_spark.operators.similarity import (
        BENCHMARK_MOD, contamination_semantic,
    )
    from flapi_spark.session import load_table

    rows = contamination_semantic(spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "embeddings").count()
    n_bench = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.pmod("vec_id", F.lit(BENCHMARK_MOD)) == 0)
        .count()
    )
    # one verdict per NON-benchmark vector; benchmark members excluded
    assert len(rows) == n_total - n_bench
    assert all(r.vec_id % BENCHMARK_MOD != 0 for r in rows)
    assert all(-1.0 - 1e-9 <= r.max_cosine <= 1.0 + 1e-9 for r in rows)
    # the default threshold actually bites on the synthetic corpus,
    # without drowning it
    flagged = {r.vec_id for r in rows if r.contaminated}
    assert 0 < len(flagged) < len(rows) / 2
    # threshold monotonicity: stricter tau flags a subset
    stricter = {
        r.vec_id
        for r in contamination_semantic(spark, sf_dir, threshold=0.5).collect()
        if r.contaminated
    }
    assert stricter <= flagged


def test_contamination_semantic_broadcasts_benchmark(spark, sf_dir):
    from flapi_spark.operators.similarity import contamination_semantic

    plan = (
        contamination_semantic(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the benchmark side broadcasts: the corpus never shuffles for
    # the join itself (the only exchange is the id-grain partial max)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


# --- source_reputation -------------------------------------------------------


def test_source_reputation_matches_oracle(spark, sf_dir, duck):
    from flapi_spark.operators.text import source_reputation

    assert_df_matches_oracle(
        source_reputation(spark, sf_dir), duck, _oracle("source_reputation")
    )


def test_source_reputation_semantics(spark, sf_dir):
    from flapi_spark.operators.text import source_reputation

    rows = source_reputation(spark, sf_dir).collect()
    assert all(0 <= r.n_pass <= r.n_docs for r in rows)
    good = {r.source for r in rows if r.reputable}
    # the 70% floor splits the synthetic sources both ways
    assert 0 < len(good) < len(rows)
    # the verdict is the integer compare, not the rounded rate
    for r in rows:
        assert r.reputable == (r.n_pass * 100 >= 70 * r.n_docs)
    # tightening the floor can only shrink the reputable set
    stricter = {
        r.source
        for r in source_reputation(spark, sf_dir, min_pass_pct=85).collect()
        if r.reputable
    }
    assert stricter <= good


def test_source_gate_stage_parity(spark, sf_dir):
    """curate(['source_gate']) == documents from reputable sources."""
    from flapi_spark.operators.text import source_reputation
    from flapi_spark.pipeline import curate
    from flapi_spark.session import load_table

    report = curate(spark, sf_dir, stages=["source_gate"])
    kept = {r.doc_id for r in report.keep.collect()}
    good = {
        r.source
        for r in source_reputation(spark, sf_dir).collect()
        if r.reputable
    }
    want = {
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
        if r.source in good
    }
    assert kept == want


def test_semantic_decontam_stage_parity(spark, sf_dir):
    """curate(['semantic_decontam']) == not-contaminated corpus docs
    (benchmark members drop: they are the eval data)."""
    from flapi_spark.operators.similarity import contamination_semantic
    from flapi_spark.pipeline import curate

    report = curate(spark, sf_dir, stages=["semantic_decontam"])
    kept = {r.doc_id for r in report.keep.collect()}
    want = {
        r.vec_id
        for r in contamination_semantic(spark, sf_dir).collect()
        if not r.contaminated
    }
    assert kept == want


# --- curation_drop_attribution ----------------------------------------------


def test_drop_attribution_matches_oracle(spark, sf_dir, duck):
    from flapi_spark.pipeline import curation_drop_attribution

    assert_df_matches_oracle(
        curation_drop_attribution(spark, sf_dir),
        duck,
        _oracle("curation_drop_attribution"),
    )


def test_drop_attribution_reconciles_with_funnel(spark, sf_dir):
    """The attribution is the funnel's 'why' axis: per-stage n_docs
    sums equal the funnel's n_dropped, the kept bucket equals the
    surviving keep-set, and everything sums to the corpus."""
    from flapi_spark.pipeline import curate, curation_drop_attribution
    from flapi_spark.session import load_table

    rows = curation_drop_attribution(spark, sf_dir).collect()
    report = curate(spark, sf_dir)
    by_stage = {}
    for r in rows:
        by_stage.setdefault((r.stage, r.stage_name), 0)
        by_stage[(r.stage, r.stage_name)] += r.n_docs
    for i, s in enumerate(report.stages, 1):
        dropped = s["n_in"] - s["n_out"]
        assert by_stage.get((i, s["stage"]), 0) == dropped
    n_stages = len(report.stages)
    assert by_stage[(n_stages + 1, "kept")] == report.stages[-1]["n_out"]
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(by_stage.values()) == total
    # no zero-count rows and no negative counts
    assert all(r.n_docs > 0 for r in rows)


def test_drop_attribution_custom_chain(spark, sf_dir):
    """A single-stage chain attributes every doc to that stage or
    'kept' — and unknown stages fail loudly."""
    import pytest

    from flapi_spark.pipeline import curation_drop_attribution
    from flapi_spark.session import load_table

    rows = curation_drop_attribution(
        spark, sf_dir, stages=["quality"]
    ).collect()
    names = {r.stage_name for r in rows}
    assert names == {"quality", "kept"}
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    with pytest.raises(ValueError, match="unknown stage"):
        curation_drop_attribution(spark, sf_dir, stages=["nope"])


# --- text_license_detect ------------------------------------------------------


def test_license_detect_matches_oracle(spark, sf_dir, duck):
    from flapi_spark.operators.text import text_license_detect

    assert_df_matches_oracle(
        text_license_detect(spark, sf_dir),
        duck,
        _oracle("text_license_detect"),
    )


def test_license_detect_semantics(spark, sf_dir):
    from flapi_spark.operators.text import text_license_detect
    from flapi_spark.session import load_table

    rows = text_license_detect(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n
    for r in rows:
        if r.doc_id % 13 in (0, 3):
            assert r.license_class == "restrictive" and not r.keep
            assert r.n_restrictive >= 1
        elif r.doc_id % 13 in (7, 11):
            assert r.license_class == "permissive" and r.keep
            assert r.n_permissive >= 1
        else:
            assert r.license_class == "none" and r.keep
            assert r.n_restrictive == 0 and r.n_permissive == 0


def test_license_detect_zero_shuffle(spark, sf_dir):
    from flapi_spark.operators.text import text_license_detect

    plan = (
        text_license_detect(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure projection over one scan
    assert plan.count("FileScan parquet") == 1


def test_license_gate_stage_parity(spark, sf_dir):
    from flapi_spark.operators.text import text_license_detect
    from flapi_spark.pipeline import curate

    report = curate(spark, sf_dir, stages=["license_gate"])
    kept = {r.doc_id for r in report.keep.collect()}
    want = {
        r.doc_id
        for r in text_license_detect(spark, sf_dir).collect()
        if r.keep
    }
    assert kept == want
    # the gate actually bites: 2 of every 13 docs carry a
    # restrictive notice
    assert report.stages[-1]["n_out"] < report.stages[-1]["n_in"]
