"""Linear quality classifiers (operators/classifier.py, round 10).

- NB score/eval entries: exact-oracle parity (same check the driver
  runs).
- LR training: pure-Python golden twin replaying the same
  sorted-fold arithmetic (the BPE-train pinning pattern), plus a
  learning assertion (final loss beats the zero-weight baseline
  ln 2).
- classifier_gate curate() stage: rank-cut size + keep-set parity.
"""

import math

import pytest

from tests.conftest import assert_df_matches_oracle


def _queries():
    from flapi_spark.queries import QUERIES

    return QUERIES


def test_score_matches_oracle(spark, sf_dir, duck):
    fn, sql = _queries()["quality_classifier_score"]
    assert_df_matches_oracle(fn(spark, sf_dir), duck, sql)


def test_eval_matches_oracle(spark, sf_dir, duck):
    fn, sql = _queries()["quality_classifier_eval"]
    assert_df_matches_oracle(fn(spark, sf_dir), duck, sql)


def test_rank_gate_size_and_enrichment(spark, sf_dir):
    from flapi_spark.operators.classifier import quality_classifier_score

    rows = quality_classifier_score(spark, sf_dir).collect()
    n = len(rows)
    kept = [r for r in rows if r["keep"]]
    assert len(kept) == math.ceil(n * 0.5)
    # the gate must enrich the target domain vs the corpus base rate
    base = sum(r["label"] for r in rows) / n
    gate = sum(r["label"] for r in kept) / len(kept)
    assert gate > base


def _q(v):
    """round(v·1e12) half-away-from-zero as an exact int — the twin of
    Spark's round(double, 0) (BigDecimal HALF_UP over the shortest
    round-trip repr, which Python's repr() also produces)."""
    from decimal import ROUND_HALF_UP, Decimal

    from flapi_spark.operators.classifier import LR_QUANT

    return int(
        Decimal(repr(v * float(LR_QUANT))).quantize(
            Decimal(1), rounding=ROUND_HALF_UP
        )
    )


def _twin_logreg(pdf, n_buckets, iters, lr, lr_bias):
    """Pure-Python replay of train_logreg's arithmetic: same bucket-
    sorted margin folds, same quantized-integer gradient sums (exact,
    so summation order is irrelevant), same op order in the update —
    only exp() may differ by an ulp (JVM Math.exp vs libm), hence the
    1e-9 tolerance at the comparison site."""
    from flapi_spark.operators.classifier import LR_QUANT

    w = [0.0] * n_buckets
    bias = 0.0
    docs = sorted(set(pdf["doc_id"]))
    n_docs = len(docs)
    by_doc = {
        d: g.sort_values("bucket")[["bucket", "x", "y"]].values.tolist()
        for d, g in pdf.groupby("doc_id")
    }
    for _ in range(iters):
        resid = {}
        for d in docs:
            m = 0.0
            for b, x, _y in by_doc[d]:
                m += x * w[int(b)]
            p = 1.0 / (1.0 + math.exp(-(m + bias)))
            resid[d] = p - by_doc[d][0][2]
        grads = {}
        for d in docs:  # exact integer sums — any order works
            for b, x, _y in by_doc[d]:
                grads.setdefault(int(b), 0)
                grads[int(b)] += _q(resid[d] * x)
        gbias = 0
        for d in docs:
            gbias += _q(resid[d])
        for b, qs in grads.items():
            w[b] -= lr * ((float(qs) / float(LR_QUANT)) / n_docs)
        bias -= lr_bias * ((float(gbias) / float(LR_QUANT)) / n_docs)
    return w, bias


def test_grad_frame_plan_bounded_state(spark):
    """VERDICT r10 item 2: per-iteration gradient state must not grow
    with docs-per-bucket. The gradient aggregate is a plain
    partial-aggregating SUM of quantized DECIMAL(38,0) integers — no
    collect_list holding one struct per (doc × feature-hit) in a
    single bucket's row. Feeds _grad_frame a synthetic docfeats frame
    (so the per-doc collect_list of the real feature builder cannot
    mask a regression) and asserts plan shape + exact values."""
    from pyspark.sql import functions as F

    from flapi_spark.operators.classifier import LR_QUANT, _grad_frame

    docfeats = spark.createDataFrame(
        [(i, float(i % 2), [{"bucket": i % 3, "x": 0.25}]) for i in range(12)],
        "doc_id BIGINT, y DOUBLE, fs ARRAY<STRUCT<bucket: INT, x: DOUBLE>>",
    )
    gf = _grad_frame(docfeats, F.lit(0.5) - F.col("y"))
    plan = gf._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    assert "sort_array" not in plan
    # partial + final HashAggregate: map-side combine bounds shuffle
    # state to one partial per (bucket, task)
    assert plan.count("HashAggregate") >= 2
    # exact values: residual is +0.5 for y=0 docs, -0.5 for y=1 docs;
    # each bucket sees 2 docs of each label -> feature gradient sums
    # to 0; the bias gradient (bucket -1) also cancels over 6/6 labels
    got = {r["bucket"]: r["g"] for r in gf.collect()}
    assert got == {-1: 0.0, 0: 0.0, 1: 0.0, 2: 0.0}
    # and a non-cancelling residual: g = sum(round(r*x*1e12))/1e12
    gf2 = _grad_frame(docfeats, F.lit(0.1))
    got2 = {r["bucket"]: r["g"] for r in gf2.collect()}
    per_term = round(0.1 * 0.25 * LR_QUANT)
    assert got2[0] == 4 * per_term / LR_QUANT
    assert got2[-1] == 12 * round(0.1 * LR_QUANT) / LR_QUANT


def test_train_golden_twin(spark, sf_dir):
    from flapi_spark.operators.classifier import (
        LR_BUCKETS, _lr_features, train_logreg,
    )

    feats = _lr_features(spark, sf_dir, "en", LR_BUCKETS)
    feats.persist()
    try:
        w, bias = train_logreg(
            feats, LR_BUCKETS, iters=3, lr=20.0, lr_bias=2.0
        )
        pdf = feats.toPandas()
    finally:
        feats.unpersist()
    tw, tbias = _twin_logreg(pdf, LR_BUCKETS, iters=3, lr=20.0, lr_bias=2.0)
    assert abs(bias - tbias) < 1e-9
    assert max(abs(a - b) for a, b in zip(w, tw)) < 1e-9


def test_train_entry_shape_and_learning(spark, sf_dir):
    import numpy as np

    from flapi_spark.operators.classifier import (
        LR_BUCKETS, _lr_features, quality_classifier_train,
    )

    out = quality_classifier_train(spark, sf_dir).collect()
    assert len(out) == LR_BUCKETS + 1
    w = {r["bucket"]: r["weight"] for r in out}
    assert -1 in w  # bias row
    # learned model beats the zero-weight baseline (loss ln 2)
    pdf = _lr_features(spark, sf_dir, "en", LR_BUCKETS).toPandas()
    wa = np.array([w[b] for b in range(LR_BUCKETS)])
    m = (
        pdf.assign(c=pdf.x * wa[pdf.bucket])
        .groupby(["doc_id", "y"])
        .c.sum()
        + w[-1]
    )
    p = 1.0 / (1.0 + np.exp(-m))
    y = m.index.get_level_values("y").values
    loss = -(y * np.log(p) + (1 - y) * np.log(1 - p)).mean()
    assert loss < math.log(2.0)


def test_classifier_gate_stage(spark, sf_dir):
    from flapi_spark.operators.classifier import classifier_gate_keep
    from flapi_spark.pipeline import curate

    rep = curate(spark, sf_dir, stages=["classifier_gate"])
    direct = classifier_gate_keep(spark, sf_dir)
    assert rep.stages[-1]["n_out"] == direct.count()
    assert rep.stages[-1]["n_out"] < rep.stages[-1]["n_in"]
    kept = {r["doc_id"] for r in rep.keep.collect()}
    assert kept == {r["doc_id"] for r in direct.collect()}


def test_persisted_model_guard_batch_parity(spark, sf_dir):
    """write -> load -> batch guard: scores bit-equal to the batch
    scorer (same sorted-fold over the same weights); the deployed
    `score >= threshold` keep-set equals the batch rank cut except
    possibly boundary-score ties (the guard is the permissive side)."""
    from flapi_spark.operators.classifier import (
        classifier_guard_batch, load_classifier_model,
        quality_classifier_score, write_classifier_stats,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    table = "t_cls_stats_parity"
    try:
        write_classifier_stats(spark, sf_dir, table)
        model = load_classifier_model(spark, table)
        docs = load_table(spark, sf_dir, "documents")
        got = {
            r["doc_id"]: (r["n_tokens"], r["score"], r["keep"])
            for r in classifier_guard_batch(docs, model).collect()
        }
        want = {
            r["doc_id"]: (r["n_tokens"], r["score"], r["keep"])
            for r in quality_classifier_score(spark, sf_dir).collect()
        }
        assert set(got) == set(want)
        for d in want:
            assert got[d][0] == want[d][0]
            assert got[d][1] == want[d][1]  # bit-equal scores
        batch_keep = {d for d in want if want[d][2]}
        guard_keep = {d for d in got if got[d][2]}
        assert guard_keep >= batch_keep
        for d in guard_keep - batch_keep:  # only boundary ties differ
            assert got[d][1] == model["threshold"]
    finally:
        _rm_table(spark, table)
        _rm_table(spark, f"{table}__model")


def test_classifier_guard_stream_equals_batch(
    spark, sf_dir, tmp_path_factory
):
    """availableNow 2-file landing through classifier_guard_stream
    equals classifier_guard_batch row-for-row (shared _score_cols
    expression tree — the stateless-guard equality anchor)."""
    import glob as _glob
    import shutil

    import flapi_spark.streaming as ST
    from flapi_spark.operators.classifier import (
        classifier_guard_batch, load_classifier_model,
        write_classifier_stats,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table
    from pyspark.sql import functions as F

    table = "t_cls_stats_stream"
    try:
        write_classifier_stats(spark, sf_dir, table)
        model = load_classifier_model(spark, table)
        incoming = (
            load_table(spark, sf_dir, "documents")
            .limit(60)
            .select("doc_id", "text")
        )
        d = tmp_path_factory.mktemp("cls_guard_landing")
        halves = incoming.randomSplit([0.5, 0.5], seed=11)
        for i, part in enumerate(halves):
            staging = str(d / f"_stage_{i}")
            part.coalesce(1).write.parquet(staging)
            src = _glob.glob(staging + "/part-*.parquet")[0]
            shutil.copy(src, str(d / f"batch_{i}.parquet"))
            shutil.rmtree(staging)
        stream = (
            spark.readStream.schema("doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        )
        name = "m_cls_guard_" + table
        ST.run_stream_to_memory(
            ST.classifier_guard_stream(stream, model), name,
            output_mode="append",
        )
        got = {tuple(r) for r in spark.table(name).collect()}
        want = {
            tuple(r)
            for r in classifier_guard_batch(incoming, model).collect()
        }
        assert got == want and got
    finally:
        _rm_table(spark, table)
        _rm_table(spark, f"{table}__model")
