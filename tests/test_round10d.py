"""Round 10d: DP count release and Unicode sanitation."""

import hashlib
import math

from pyspark.sql import functions as F

from tests.conftest import assert_df_matches_oracle


def _oracle(name):
    from flapi_spark.queries import QUERIES

    return QUERIES[name][1]


def _laplace_noise(key: str, epsilon: float) -> float:
    h = int(hashlib.md5(key.encode()).hexdigest()[:13], 16)
    u = (h + 0.5) / float(16 ** 13)
    s = u - 0.5
    return -(1.0 / epsilon) * math.copysign(1.0, s) * math.log(
        1.0 - 2.0 * abs(s)
    )


def test_dp_event_counts_python_replay(spark, sf_dir, duck):
    from flapi_spark.operators.relational import dp_event_counts
    from flapi_spark.session import load_table

    eps = 0.5
    true = {
        (r.event_type, r.day): r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rows = dp_event_counts(spark, sf_dir, epsilon=eps).collect()
    assert len(rows) == len(true)
    n_shifted = 0
    for r in rows:
        key = f"{r.event_type}|{r.day:%Y-%m-%d}"
        want = round(
            true[(r.event_type, r.day)] + _laplace_noise(key, eps), 6
        )
        assert r.noisy_count == want
        assert r.epsilon == eps
        if r.noisy_count != true[(r.event_type, r.day)]:
            n_shifted += 1
    # the release actually noises (md5-uniform u == exactly 0.5 has
    # probability 2^-52 per group)
    assert n_shifted == len(rows)
    assert_df_matches_oracle(
        dp_event_counts(spark, sf_dir), duck, _oracle("dp_event_counts")
    )


def test_dp_event_counts_epsilon_scales_noise(spark, sf_dir):
    from flapi_spark.operators.relational import dp_event_counts
    from flapi_spark.session import load_table

    true = {
        (r.event_type, r.day): r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    def total_abs_noise(eps):
        return sum(
            abs(r.noisy_count - true[(r.event_type, r.day)])
            for r in dp_event_counts(spark, sf_dir, epsilon=eps).collect()
        )

    # weaker privacy (larger epsilon) => strictly less noise, and the
    # deterministic inverse-CDF makes the ratio exactly 1/epsilon
    lo, hi = total_abs_noise(0.5), total_abs_noise(2.0)
    assert lo > hi > 0
    assert abs(lo / hi - 4.0) < 1e-4  # rounding at 6dp only


def test_text_unicode_sanitize_counts(spark, sf_dir, duck):
    from flapi_spark.operators.text import text_unicode_sanitize

    df = text_unicode_sanitize(spark, sf_dir)
    rows = df.collect()
    damaged = clean = 0
    for r in rows:
        if r.doc_id % 7 == 3:
            assert r.n_ctrl_removed == 2  # the two C0 brackets
            assert r.n_replacement_chars == r.doc_id % 3 + 1
            damaged += 1
        else:
            assert r.n_ctrl_removed == 0
            assert r.n_replacement_chars == 0
            clean += 1
        assert r.n_chars_clean > 0
    assert damaged > 0 and clean > 0
    assert_df_matches_oracle(
        df, duck, _oracle("text_unicode_sanitize")
    )


def test_text_unicode_sanitize_idempotent(spark, sf_dir):
    """Sanitizing already-clean text is the identity on counts: the
    clean rows' md5 equals md5(trim(collapsed original))."""
    from flapi_spark.operators.text import text_unicode_sanitize
    from flapi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    want = {
        r.doc_id: r.m
        for r in docs.select(
            "doc_id",
            F.md5(
                F.trim(F.regexp_replace("text", "\\s+", " "))
            ).alias("m"),
        ).collect()
    }
    got = text_unicode_sanitize(spark, sf_dir).collect()
    for r in got:
        if r.doc_id % 7 != 3:
            assert r.clean_md5 == want[r.doc_id]
