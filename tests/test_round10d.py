"""Round 10d: DP count release and Unicode sanitation."""

import hashlib
import math

from pyspark.sql import functions as F

from tests.conftest import assert_df_matches_oracle


def _oracle(name):
    from flapi_spark.queries import QUERIES

    return QUERIES[name][1]


def _laplace_noise(key: str, epsilon: float, seed: str = "") -> float:
    h = int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:13], 16)
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
    # a SECRET seed decorrelates the noise from the public key (the
    # deployment contract) without changing the plan or arithmetic
    seeded = {
        (r.event_type, r.day): r.noisy_count
        for r in dp_event_counts(spark, sf_dir, epsilon=eps,
                                 seed="s3cret").collect()
    }
    public = {(r.event_type, r.day): r.noisy_count for r in rows}
    assert set(seeded) == set(public)
    assert any(seeded[k] != public[k] for k in seeded)
    for (et, day), v in seeded.items():
        want = round(
            true[(et, day)]
            + _laplace_noise(f"{et}|{day:%Y-%m-%d}", eps, seed="s3cret"),
            6,
        )
        assert v == want


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


def test_ann_filtered_topk_matches_python_filter(spark, sf_dir, duck):
    """Pre-filter semantics: the filtered top-k equals the full exact
    ranking filtered to lang='en' docs and re-cut at k."""
    from flapi_spark.operators.dedup import cosine_col
    from flapi_spark.operators.similarity import ann_filtered_topk
    from flapi_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    en = {
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .where("lang = 'en'")
        .collect()
    }
    q = emb.where("vec_id <= 5").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("eq")
    )
    c = emb.where("vec_id > 5").select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ec")
    )
    full = (
        q.crossJoin(c)
        .select("qid", "cid", cosine_col("eq", "ec").alias("cos"))
        .collect()
    )
    want = {}
    for qid in {r.qid for r in full}:
        ranked = sorted(
            (r for r in full if r.qid == qid and r.cid in en),
            key=lambda r: (-r.cos, r.cid),
        )[:10]
        want[qid] = [r.cid for r in ranked]
    got = {}
    for r in sorted(
        ann_filtered_topk(spark, sf_dir).collect(),
        key=lambda r: (r.qid, r.rnk),
    ):
        got.setdefault(r.qid, []).append(r.cid)
        assert r.cid in en  # every hit passes the metadata filter
    assert got == want
    from flapi_spark.queries import QUERIES

    assert_df_matches_oracle(
        ann_filtered_topk(spark, sf_dir), duck,
        QUERIES["ann_filtered_topk"][1],
    )


def test_ivf_cell_report_invariants(spark, sf_dir, duck):
    from flapi_spark.operators.similarity import ivf_cell_report
    from flapi_spark.queries import QUERIES
    from flapi_spark.session import load_table

    r = ivf_cell_report(spark, sf_dir).collect()[0]
    n = load_table(spark, sf_dir, "embeddings").count()
    assert r.n_vectors == n
    assert r.min_cell <= r.mean_cell <= r.max_cell
    assert r.imbalance >= 1.0
    assert abs(r.mean_cell - round(n / r.n_cells, 6)) < 1e-9
    assert_df_matches_oracle(
        ivf_cell_report(spark, sf_dir), duck,
        QUERIES["ivf_cell_report"][1],
    )


def test_perplexity_gate_stage(spark, sf_dir):
    from flapi_spark.operators.text import ccnet_perplexity_buckets
    from flapi_spark.pipeline import curate

    rep = curate(spark, sf_dir, stages=["perplexity_gate"])
    got = {r.doc_id for r in rep.keep.collect()}
    want = {
        r.doc_id
        for r in ccnet_perplexity_buckets(spark, sf_dir)
        .where("bucket <> 'tail'")
        .collect()
    }
    docs = {
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    assert got == (want & docs) and 0 < len(got) < len(docs)
    # an empty drop set keeps everything
    keep_all = curate(
        spark, sf_dir,
        stages=[{"stage": "perplexity_gate", "drop_buckets": ()}],
    ).keep
    assert keep_all.count() == len(docs)


def test_l_diversity_invariants(spark, sf_dir, duck):
    from flapi_spark.operators.relational import (
        k_anonymity_orders, l_diversity_orders,
    )
    from flapi_spark.queries import QUERIES

    rows = l_diversity_orders(spark, sf_dir).collect()
    # same equivalence classes as k-anonymity (shared quasi-identifier)
    kcls = {
        (r.o_orderpriority, r.o_orderstatus, r.o_year): r.class_size
        for r in k_anonymity_orders(spark, sf_dir).collect()
    }
    assert {
        (r.o_orderpriority, r.o_orderstatus, r.o_year): r.class_size
        for r in rows
    } == kcls
    for r in rows:
        assert 1 <= r.n_sensitive <= min(r.class_size, 5)  # 5 segments
        assert r.homogeneity >= round(1.0 / r.n_sensitive, 6) - 1e-9
        assert r.homogeneity <= 1.0
        assert r.violates_l == (r.n_sensitive < 3)
    assert_df_matches_oracle(
        l_diversity_orders(spark, sf_dir), duck,
        QUERIES["l_diversity_orders"][1],
    )
