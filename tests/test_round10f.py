"""Round 10f property tests: t-closeness (governance quartet) and
classifier calibration bins (reliability diagram). Exact-oracle
verification is the driver's job; these pin the semantic invariants."""

from flapi_spark.operators.classifier import classifier_calibration_bins
from flapi_spark.operators.relational import (
    k_anonymity_orders,
    t_closeness_orders,
)


def test_t_closeness_bounds_and_flag(spark, sf_dir):
    rows = t_closeness_orders(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # total variation distance is bounded by [0, 1]
        assert 0.0 <= r.emd_to_global <= 1.0
        assert r.violates_t == (r.emd_to_global > 0.2)


def test_t_closeness_classes_match_k_anonymity(spark, sf_dir):
    """Same quasi-identifier partitioning as k_anonymity_orders: the
    class keys and sizes agree (one governance surface, four
    metrics)."""
    tc = {
        (r.o_orderpriority, r.o_orderstatus, r.o_year): r.class_size
        for r in t_closeness_orders(spark, sf_dir).collect()
    }
    ka = {
        (r.o_orderpriority, r.o_orderstatus, r.o_year): r.class_size
        for r in k_anonymity_orders(spark, sf_dir).collect()
    }
    assert tc == ka


def test_calibration_bins_partition_the_corpus(spark, sf_dir):
    rows = classifier_calibration_bins(spark, sf_dir).collect()
    assert rows
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.bin <= 9
        # mean confidence of a bin stays inside the bin (rounding
        # slack 1e-6); bin 9 additionally holds conf == 1.0
        lo, hi = r.bin / 10, (r.bin + 1) / 10
        assert lo - 1e-6 <= r.avg_confidence <= (
            1.0 if r.bin == 9 else hi
        ) + 1e-6
        assert 0.0 <= r.frac_positive <= 1.0
        assert abs(
            r.calib_gap - round(abs(r.avg_confidence - r.frac_positive), 6)
        ) < 1e-9


def test_calibration_ece_bounded(spark, sf_dir):
    rows = classifier_calibration_bins(spark, sf_dir).collect()
    total = sum(r.n_docs for r in rows)
    ece = sum(r.n_docs * r.calib_gap for r in rows) / total
    assert 0.0 <= ece <= 1.0


def test_keyword_textrank_shape_and_filter(spark, sf_dir):
    from flapi_spark.operators.text import STOPWORDS, keyword_textrank

    rows = keyword_textrank(spark, sf_dir).collect()
    assert len(rows) == 20
    assert [r.rank for r in rows] == list(range(1, 21))
    prs = [r.pr_scaled for r in rows]
    assert prs == sorted(prs, reverse=True)
    import re

    for r in rows:
        assert len(r.token) >= 3
        assert re.fullmatch(r"[a-z]+", r.token)
        assert r.token not in STOPWORDS


def test_keyword_textrank_deterministic(spark, sf_dir):
    from flapi_spark.operators.text import keyword_textrank

    a = [tuple(r) for r in keyword_textrank(spark, sf_dir).collect()]
    b = [tuple(r) for r in keyword_textrank(spark, sf_dir).collect()]
    assert a == b


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark, sf_dir):
    from flapi_spark.operators.relational import bootstrap_ci_order_value

    a = bootstrap_ci_order_value(spark, sf_dir).collect()[0]
    assert a.ci_lo <= a.ci_hi
    # the percentile interval of resample means brackets the full mean
    # on this data (m >= n draws per replicate)
    assert a.ci_lo <= a.mean_value <= a.ci_hi
    b = bootstrap_ci_order_value(spark, sf_dir).collect()[0]
    assert tuple(a) == tuple(b)


def test_bootstrap_ci_narrows_with_more_draws(spark, sf_dir):
    """Basic bootstrap sanity: quadrupling m shrinks the interval
    (standard error of a mean scales ~1/sqrt(m))."""
    from flapi_spark.operators.relational import bootstrap_ci_order_value

    wide = bootstrap_ci_order_value(spark, sf_dir, n_boot=64, m=250)
    tight = bootstrap_ci_order_value(spark, sf_dir, n_boot=64, m=1000)
    w = wide.collect()[0]
    t = tight.collect()[0]
    assert (t.ci_hi - t.ci_lo) < (w.ci_hi - w.ci_lo)


def test_randomization_test_properties(spark, sf_dir):
    from flapi_spark.operators.relational import (
        randomization_test_order_value,
    )

    r = randomization_test_order_value(spark, sf_dir, n_perm=99).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    assert 0 <= r.n_exceed <= 99
    # add-one p-value bounds
    assert 1 / 100 <= r.p_value <= 1.0
    # same-segment null: relabeling within ONE segment vs itself gives
    # obs_diff == 0 and every permutation exceeds it
    same = randomization_test_order_value(
        spark, sf_dir, n_perm=19, seg_a="AUTOMOBILE", seg_b="AUTOMOBILE"
    ).collect()[0]
    assert same.n_b == 0 or same.p_value >= 0.95 or same.obs_diff == 0.0


def test_mann_whitney_properties(spark, sf_dir):
    from flapi_spark.operators.relational import mann_whitney_order_value

    r = mann_whitney_order_value(spark, sf_dir).collect()[0]
    # U_A + U_B == n_a * n_b (exact identity, half-unit arithmetic)
    assert r.u_a + r.u_b == r.n_a * r.n_b
    assert 0 <= r.u_a <= r.n_a * r.n_b
    # z is finite and consistent with U_A vs its null mean
    import math

    assert math.isfinite(r.z_score)
    assert (r.u_a > r.n_a * r.n_b / 2) == (r.z_score > 0) or r.z_score == 0


def test_ann_truncation_full_dim_is_perfect(spark, sf_dir):
    """Truncating to the FULL dimension is the identity: recall@k
    against the ground truth is exactly 1.0 for every query."""
    from flapi_spark.operators.similarity import ann_truncation_eval

    rows = ann_truncation_eval(spark, sf_dir, dims=(64,)).collect()
    assert rows
    for r in rows:
        assert r.trunc_dim == 64
        assert r.n_true == 10 and r.n_hits == 10 and r.recall == 1.0


def test_ann_truncation_bounds_and_grain(spark, sf_dir):
    from flapi_spark.operators.similarity import ann_truncation_eval

    rows = ann_truncation_eval(spark, sf_dir).collect()
    qids = {r.qid for r in rows}
    dims = {r.trunc_dim for r in rows}
    assert dims == {8, 16, 32}
    assert len(rows) == len(qids) * 3
    for r in rows:
        assert r.n_true == 10 and 0 <= r.n_hits <= 10
        assert 0.0 <= r.recall <= 1.0
