"""Incremental (delta) curation — round 10f.

Property coverage beyond the driver's exact-oracle check on
pipeline_delta_funnel / dedup_delta_probe_pairs:
- probe pairs == full portable pairs restricted to the delta with the
  base side accepted (the pairwise identity the oracle leans on);
- single-stage base+delta composition == one batch run over the full
  corpus (exact dedup: min-id survivors compose exactly);
- index maintenance round-trip (append, then the next batch sees this
  one);
- plan shape: delta bound pushed into the parquet scan, index side of
  the probe bucketed with zero exchange.
"""

import pytest
from pyspark.sql import functions as F

from flapi_spark.pipeline_delta import (
    DELTA_STAGES,
    DeltaIndexes,
    _inline_portable_pairs,
    bootstrap_delta_indexes,
    curate_base,
    curate_delta,
)
from flapi_spark.session import load_table

SINCE = 400  # testdata documents: doc_id 0..499 at sf0.001


def _rm(spark, *tables):
    from flapi_spark.writes import _rm_table

    for t in tables:
        _rm_table(spark, t)


@pytest.fixture(scope="module")
def world(spark, sf_dir):
    """One bootstrapped base world shared by the module's tests:
    base-curate doc_id < 400, persist the index triple from the
    accepted set."""
    idx = DeltaIndexes(
        band_table="t_delta_bands",
        shingle_store="t_delta_shingles",
        exact_table="t_delta_exact",
    )
    _rm(spark, idx.band_table, idx.shingle_store, idx.exact_table)
    base = curate_base(spark, sf_dir, SINCE)
    bootstrap_delta_indexes(spark, sf_dir, base.keep, idx)
    yield base, idx
    _rm(spark, idx.band_table, idx.shingle_store, idx.exact_table)


def test_base_funnel_monotone_and_stage_names(world):
    base, _ = world
    names = [s["stage"] for s in base.stages]
    assert names == DELTA_STAGES
    ns = [base.stages[0]["n_in"]] + [s["n_out"] for s in base.stages]
    assert ns == sorted(ns, reverse=True)
    assert ns[0] == SINCE  # every base doc enters stage 1
    assert base.keep.count() == ns[-1] > 0


def test_delta_funnel_monotone_and_span(spark, sf_dir, world):
    _, idx = world
    rep = curate_delta(spark, sf_dir, SINCE, idx)
    ns = [rep.stages[0]["n_in"]] + [s["n_out"] for s in rep.stages]
    assert ns == sorted(ns, reverse=True)
    assert ns[0] == 100  # the delta span
    ids = [r.doc_id for r in rep.keep.collect()]
    assert ids and min(ids) >= SINCE


def test_probe_pairs_equal_restricted_full_pairs(spark, sf_dir, world):
    """The probe of the base-accepted index == the full-corpus
    portable pair stream restricted to pairs touching the delta whose
    base side is accepted (band collision and Jaccard verify are
    pairwise, so the restriction is exact, not approximate)."""
    from flapi_spark.operators.dedup import probe_band_index_portable

    base, idx = world
    delta = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") >= SINCE
    )
    got = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in probe_band_index_portable(
            spark, delta, idx.band_table, idx.shingle_store
        ).collect()
    }
    accepted = {r.doc_id for r in base.keep.collect()}
    full = _inline_portable_pairs(
        spark, load_table(spark, sf_dir, "documents")
    )
    expect = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in full.collect()
        if r.doc_b >= SINCE and (r.doc_a >= SINCE or r.doc_a in accepted)
    }
    assert got == expect and got


def test_exact_dedup_composes_with_batch(spark, sf_dir):
    """Single-stage composition: base exact-survivors ∪ delta accepted
    (vs an index of the base survivors) == min-id exact survivors over
    the FULL corpus — the delta path loses nothing and double-keeps
    nothing."""
    idx = DeltaIndexes(
        band_table="t_delta_bands_x",
        shingle_store="t_delta_shingles_x",
        exact_table="t_delta_exact_x",
    )
    _rm(spark, idx.band_table, idx.shingle_store, idx.exact_table)
    try:
        base = curate_base(spark, sf_dir, SINCE, stages=["exact_dedup"])
        bootstrap_delta_indexes(spark, sf_dir, base.keep, idx)
        delta = curate_delta(
            spark, sf_dir, SINCE, idx, stages=["exact_dedup"]
        )
        composed = {r.doc_id for r in base.keep.collect()} | {
            r.doc_id for r in delta.keep.collect()
        }
        from flapi_spark.operators.text import norm_text

        full = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", F.md5(norm_text()).alias("fp"))
            .groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        expect = {r.doc_id for r in full.collect()}
        assert composed == expect
    finally:
        _rm(spark, idx.band_table, idx.shingle_store, idx.exact_table)


def test_maintain_indexes_roundtrip(spark, sf_dir):
    """maintain_indexes=True appends the ACCEPTED delta docs to all
    three indexes: the exact index gains exactly their fingerprints,
    and a follow-up probe of a copied accepted doc hits the appended
    band rows."""
    idx = DeltaIndexes(
        band_table="t_delta_bands_m",
        shingle_store="t_delta_shingles_m",
        exact_table="t_delta_exact_m",
    )
    _rm(spark, idx.band_table, idx.shingle_store, idx.exact_table)
    try:
        base = curate_base(spark, sf_dir, SINCE)
        bootstrap_delta_indexes(spark, sf_dir, base.keep, idx)
        n_exact_before = spark.table(idx.exact_table).count()
        rep = curate_delta(
            spark, sf_dir, SINCE, idx, maintain_indexes=True
        )
        n_accepted = rep.keep.count()
        assert (
            spark.table(idx.exact_table).count()
            == n_exact_before + n_accepted
        )
        # next batch: an exact copy of an accepted delta doc (new id)
        from flapi_spark.operators.dedup import probe_band_index_portable

        some = rep.keep.limit(1).collect()[0].doc_id
        copy = (
            load_table(spark, sf_dir, "documents")
            .where(F.col("doc_id") == some)
            .withColumn("doc_id", F.lit(10_000).cast("long"))
        )
        hits = probe_band_index_portable(
            spark, copy, idx.band_table, idx.shingle_store
        ).collect()
        assert any(
            r.doc_a == some and r.doc_b == 10_000 and r.jaccard == 1.0
            for r in hits
        )
    finally:
        _rm(spark, idx.band_table, idx.shingle_store, idx.exact_table)


@pytest.mark.parametrize("mode", ["antijoin", "marker"])
def test_maintain_indexes_replay_noop(spark, sf_dir, tmp_path, mode):
    """VERDICT r10 item 3: a retried ingest batch is a NO-OP on the
    index triple in both replay modes — the default per-table
    anti-join and the _SUCCESS-marker (marker_dir keyed on `since`).
    Index row counts AND a follow-up probe's pair rows must be
    unchanged after re-running the same batch."""
    from flapi_spark.operators.dedup import probe_band_index_portable

    idx = DeltaIndexes(
        band_table=f"t_delta_bands_rp_{mode}",
        shingle_store=f"t_delta_shingles_rp_{mode}",
        exact_table=f"t_delta_exact_rp_{mode}",
    )
    tables = (idx.band_table, idx.shingle_store, idx.exact_table)
    _rm(spark, *tables)
    try:
        base = curate_base(spark, sf_dir, SINCE)
        bootstrap_delta_indexes(spark, sf_dir, base.keep, idx)
        mdir = str(tmp_path / "markers") if mode == "marker" else None
        rep = curate_delta(
            spark, sf_dir, SINCE, idx,
            maintain_indexes=True, marker_dir=mdir,
        )
        some = rep.keep.limit(1).collect()[0].doc_id
        copy = (
            load_table(spark, sf_dir, "documents")
            .where(F.col("doc_id") == some)
            .withColumn("doc_id", F.lit(10_000).cast("long"))
        )

        def _probe():
            return sorted(
                (r.doc_a, r.doc_b, r.jaccard)
                for r in probe_band_index_portable(
                    spark, copy, idx.band_table, idx.shingle_store
                ).collect()
            )

        counts1 = {t: spark.table(t).count() for t in tables}
        pairs1 = _probe()
        assert pairs1  # the copied accepted doc must hit the index
        # the retry: same batch, same since watermark
        rep2 = curate_delta(
            spark, sf_dir, SINCE, idx,
            maintain_indexes=True, marker_dir=mdir,
        )
        assert {t: spark.table(t).count() for t in tables} == counts1
        assert _probe() == pairs1
        # the retry's KEEP-SET must equal the first run's: the exact
        # stage bounds its index probe to doc_id < since, so the
        # batch's own appended fingerprints never count it as
        # "already accepted" (round-11 review fix — without the bound
        # the retry dropped the whole batch and could overwrite the
        # accepted output with an empty keep-set)
        assert {r.doc_id for r in rep2.keep.collect()} == {
            r.doc_id for r in rep.keep.collect()
        }
        if mode == "marker":
            import os

            from flapi_spark.pipeline_delta import _marker_lane

            assert os.path.exists(
                os.path.join(
                    mdir, _marker_lane(idx), f"since={SINCE}", "_SUCCESS"
                )
            )
    finally:
        _rm(spark, *tables)


def test_delta_bound_pushed_to_scan(spark, sf_dir):
    """The per-doc gates read ONLY the delta span: the doc_id bound
    reaches the parquet scan as a pushed filter (O(delta) stage cost
    at 100 TB, not O(corpus))."""
    from flapi_spark.operators.text import text_gopher_filters

    gate = text_gopher_filters(spark, sf_dir).where(
        F.col("doc_id") >= F.lit(SINCE)
    )
    plan = gate._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(doc_id,400)" in plan


def test_probe_plan_index_side_bucketed(spark, sf_dir, world):
    """The probe's candidate join reads the band index as a bucketed
    scan (zero index-side exchange), even with broadcast disabled."""
    from flapi_spark.operators.dedup import (
        _probe_band_index_portable_plan,
    )

    _, idx = world
    delta = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") >= SINCE
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        lazy, cands = _probe_band_index_portable_plan(
            spark, delta, idx.band_table, idx.shingle_store
        )
        try:
            plan = lazy._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in plan
            # no full documents scan: every documents.parquet read
            # carries the delta bound (the index/store table scans are
            # the only other doc_id sources and are candidate-bounded)
            doc_scans = [
                ln for ln in plan.splitlines()
                if "documents.parquet" in ln and "PushedFilters" in ln
            ]
            assert doc_scans
            for ln in doc_scans:
                assert "GreaterThanOrEqual(doc_id,400)" in ln, ln
        finally:
            cands.unpersist()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unknown_stage_rejected(spark, sf_dir):
    with pytest.raises(ValueError, match="unknown stage"):
        curate_base(spark, sf_dir, SINCE, stages=["nope"])


def test_image_delta_stage_matches_full_pair_graph(spark, sf_dir):
    """The perceptual delta stage == the full-corpus image pair graph
    restricted to the delta: drop a delta doc iff it pairs with an
    accepted (indexed) base doc, else keep the min-id exemplar of its
    within-delta cluster (band collision + Hamming verify are
    pairwise, so the restriction is exact)."""
    from flapi_spark.multimodal import mm_phash_pairs

    idx = DeltaIndexes(
        band_table="t_dimg_b",
        shingle_store="t_dimg_s",
        exact_table="t_dimg_e",
        image_table="t_dimg_i",
    )
    _rm(spark, idx.band_table, idx.shingle_store, idx.exact_table,
        idx.image_table)
    try:
        base_keep = (
            load_table(spark, sf_dir, "documents")
            .where(F.col("doc_id") < SINCE)
            .select("doc_id")
        )
        bootstrap_delta_indexes(spark, sf_dir, base_keep, idx)
        rep = curate_delta(
            spark, sf_dir, SINCE, idx, stages=["image_near_dedup"]
        )
        got = {r.doc_id for r in rep.keep.collect()}

        pairs = [
            (r.doc_a, r.doc_b)
            for r in mm_phash_pairs(spark, sf_dir)
            .select("doc_a", "doc_b")
            .collect()
        ]
        delta_ids = set(range(SINCE, 500))
        corpus_dropped = {
            b for a, b in pairs if a < SINCE and b >= SINCE
        }
        # within-delta components, min-id exemplar
        import itertools

        parent = {d: d for d in delta_ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            if a >= SINCE and b >= SINCE:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        non_exemplar = {
            d for d in delta_ids
            if any(
                (a == d or b == d)
                for a, b in pairs
                if a >= SINCE and b >= SINCE
            )
            and find(d) != d
        }
        expect = delta_ids - corpus_dropped - non_exemplar
        assert got == expect
    finally:
        _rm(spark, idx.band_table, idx.shingle_store, idx.exact_table,
            idx.image_table)


def test_delta_gate_stages_match_batch_gates(spark, sf_dir, world):
    """url/html/license delta gates == the batch operators' verdicts
    restricted to the delta span (per-doc gates; the span bound is a
    scan optimization, never a semantic change)."""
    from flapi_spark.operators.text import (
        text_html_extract,
        text_license_detect,
        text_url_filter,
    )

    _, idx = world
    rep = curate_delta(
        spark, sf_dir, SINCE, idx,
        stages=["url_filter", "html_extract", "license_gate"],
    )
    got = {r.doc_id for r in rep.keep.collect()}
    expect = set(range(SINCE, 500))
    for op in (text_url_filter, text_html_extract, text_license_detect):
        expect &= {
            r.doc_id
            for r in op(spark, sf_dir).where("keep").collect()
        }
    assert got == expect


def test_mm_stage_requires_named_index(spark, sf_dir, world):
    _, idx = world  # image_table is None in the module world
    with pytest.raises(ValueError, match="fingerprint index table"):
        curate_delta(
            spark, sf_dir, SINCE, idx, stages=["image_near_dedup"]
        )


def test_marker_lane_isolation_and_clear(tmp_path):
    """Markers are namespaced per index triple (a shared marker_dir
    cannot skip another lane's maintenance) and clear_lane_markers
    removes exactly one lane's markers (the --bootstrap contract)."""
    import os

    from flapi_spark.pipeline_delta import _marker_lane, clear_lane_markers

    a = DeltaIndexes(band_table="laneA_b", shingle_store="laneA_s",
                     exact_table="laneA_e")
    b = DeltaIndexes(band_table="laneB_b", shingle_store="laneB_s",
                     exact_table="laneB_e")
    assert _marker_lane(a) != _marker_lane(b)
    mdir = str(tmp_path)
    for idx in (a, b):
        d = os.path.join(mdir, _marker_lane(idx), "since=100")
        os.makedirs(d)
        open(os.path.join(d, "_SUCCESS"), "w").close()
    clear_lane_markers(mdir, a)
    assert not os.path.exists(os.path.join(mdir, _marker_lane(a)))
    assert os.path.exists(
        os.path.join(mdir, _marker_lane(b), "since=100", "_SUCCESS")
    )


def test_rebootstrap_with_stale_markers_needs_clear(spark, sf_dir, tmp_path):
    """Round-11 review: bootstrap OVERWRITES the index triple, erasing
    appended batches — a stale since-keyed marker would then skip
    re-appending them forever. clear_lane_markers (which the CLI's
    --bootstrap invokes) restores maintenance."""
    import os

    from flapi_spark.pipeline_delta import _marker_lane, clear_lane_markers

    idx = DeltaIndexes(
        band_table="t_delta_bands_rb",
        shingle_store="t_delta_shingles_rb",
        exact_table="t_delta_exact_rb",
    )
    tables = (idx.band_table, idx.shingle_store, idx.exact_table)
    mdir = str(tmp_path / "markers")
    _rm(spark, *tables)
    try:
        base = curate_base(spark, sf_dir, SINCE)
        bootstrap_delta_indexes(spark, sf_dir, base.keep, idx)
        n_base = spark.table(idx.exact_table).count()
        rep = curate_delta(
            spark, sf_dir, SINCE, idx,
            maintain_indexes=True, marker_dir=mdir,
        )
        n_batch = rep.keep.count()
        assert spark.table(idx.exact_table).count() == n_base + n_batch
        # crash-retry: re-bootstrap erases the appends; the stale
        # marker alone would skip maintenance (the hazard)
        bootstrap_delta_indexes(spark, sf_dir, base.keep, idx)
        curate_delta(
            spark, sf_dir, SINCE, idx,
            maintain_indexes=True, marker_dir=mdir,
        )
        assert spark.table(idx.exact_table).count() == n_base  # skipped!
        # the remedy: clear this lane's markers, then maintain works
        clear_lane_markers(mdir, idx)
        assert not os.path.exists(os.path.join(mdir, _marker_lane(idx)))
        curate_delta(
            spark, sf_dir, SINCE, idx,
            maintain_indexes=True, marker_dir=mdir,
        )
        assert spark.table(idx.exact_table).count() == n_base + n_batch
    finally:
        _rm(spark, *tables)
