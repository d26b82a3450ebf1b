"""Round 9: the composed curation pipeline as a library API
(flapi_spark.pipeline.curate) — config-driven stage lists, monotone
attrition, persisted-index parity, and the funnel shape the registry
entry exposes."""

import pytest
from pyspark.sql import functions as F

from flapi_spark.pipeline import DEFAULT_STAGES, STAGES, curate


def test_default_chain_monotone_and_reported(spark, sf_dir):
    rep = curate(spark, sf_dir)
    names = [s["stage"] for s in rep.stages]
    assert names == DEFAULT_STAGES
    counts = [rep.stages[0]["n_in"]] + [s["n_out"] for s in rep.stages]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] > 0
    assert rep.keep.count() == counts[-1]
    # chaining is consistent: each stage's n_in == previous n_out
    for prev, cur in zip(rep.stages, rep.stages[1:]):
        assert cur["n_in"] == prev["n_out"]


def test_funnel_df_matches_report(spark, sf_dir):
    rep = curate(spark, sf_dir, stages=["quality", "exact_dedup"])
    rows = {r.stage_name: r for r in rep.funnel_df.collect()}
    assert set(rows) == {"quality", "exact_dedup"}
    for s in rep.stages:
        r = rows[s["stage"]]
        assert (r.n_in, r.n_out, r.n_dropped) == (
            s["n_in"], s["n_out"], s["n_in"] - s["n_out"]
        )


def test_config_driven_stage_params(spark, sf_dir):
    """Dict-shaped stages pass params through: a language allow-list
    restricts the langid keep-set, and a split param flips which side
    train_split keeps."""
    broad = curate(spark, sf_dir, stages=["langid"]).keep
    en = curate(
        spark, sf_dir, stages=[{"stage": "langid", "langs": ["en"]}]
    ).keep
    # allow-list keep is a subset of the non-unknown keep (equal at
    # this SF: the n-gram heuristic predicts 'en' for every
    # confidently-identified doc in the tiny corpus)
    assert en.join(broad, "doc_id", "left_anti").count() == 0
    assert en.count() > 0
    train = curate(spark, sf_dir, stages=["train_split"]).keep
    hold = curate(
        spark, sf_dir, stages=[{"stage": "train_split", "split": "holdout"}]
    ).keep
    n_train, n_hold = train.count(), hold.count()
    assert n_train > 0 and n_hold > 0
    assert train.join(hold, "doc_id", "inner").count() == 0  # disjoint
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert n_train + n_hold == docs.count()


def test_near_dedup_indexed_pair_source_parity(spark, sf_dir):
    """near_dedup served from the persisted portable index (band
    table + shingle store) keeps the SAME docs as the inline chain —
    the demo's zero-rehash production path, now a stage param."""
    from flapi_spark.operators.dedup import (
        write_band_index_portable, write_shingle_store_portable,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    band, store = "t_pipe_bands", "t_pipe_shingles"
    docs = load_table(spark, sf_dir, "documents")
    for t in (band, store):
        _rm_table(spark, t)
    try:
        write_band_index_portable(spark, docs, band)
        write_shingle_store_portable(spark, docs, store)
        inline = curate(spark, sf_dir, stages=["near_dedup"]).keep
        indexed = curate(
            spark,
            sf_dir,
            stages=[
                {
                    "stage": "near_dedup",
                    "band_table": band,
                    "shingle_store": store,
                }
            ],
        ).keep
        a = {r.doc_id for r in inline.collect()}
        b = {r.doc_id for r in indexed.collect()}
        assert a == b and a
    finally:
        for t in (band, store):
            _rm_table(spark, t)


def test_unknown_stage_rejected(spark, sf_dir):
    with pytest.raises(ValueError, match="unknown stage"):
        curate(spark, sf_dir, stages=["quality", "nope"])


def test_train_split_stage(spark, sf_dir):
    from flapi_spark.operators.text import split_train_holdout

    rep = curate(spark, sf_dir, stages=["train_split"])
    got = {r.doc_id for r in rep.keep.collect()}
    want = {
        r.doc_id
        for r in split_train_holdout(spark, sf_dir)
        .where(F.col("split") == "train")
        .collect()
    }
    assert got == want


def test_stage_registry_covers_demo_chain(spark):
    # the demo's keep/drop chain is expressible purely from STAGES
    assert {"quality", "langid", "exact_dedup", "near_dedup",
            "decontam", "train_split"} <= set(STAGES)


def test_image_near_dedup_stage(spark, sf_dir):
    """The image lane inside curate(): per dHash cluster exactly the
    min-doc_id exemplar survives; docs outside any cluster are
    untouched."""
    from flapi_spark.multimodal import mm_phash_pairs
    from flapi_spark.operators.dedup import label_components

    rep = curate(spark, sf_dir, stages=["image_near_dedup"])
    got = {r.doc_id for r in rep.keep.collect()}
    comps = label_components(
        mm_phash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    ).collect()
    clustered = {r.doc_id for r in comps}
    exemplars = {r.doc_id for r in comps if r.doc_id == r.component_id}
    docs = {
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").collect()
    }
    assert got == (docs - clustered) | exemplars
    assert len(got) < len(docs)  # the corpus has image near-dups


def test_curate_from_yaml_config(spark, sf_dir, tmp_path):
    from flapi_spark.pipeline import curate_from_config

    cfg = tmp_path / "pipeline.yaml"
    cfg.write_text(
        "stages:\n"
        "  - quality\n"
        "  - stage: langid\n"
        "    langs: [en]\n"
        "  - exact_dedup\n"
    )
    rep = curate_from_config(spark, sf_dir, str(cfg))
    assert [s["stage"] for s in rep.stages] == [
        "quality", "langid", "exact_dedup"
    ]
    # equal to the same chain invoked programmatically
    want = curate(
        spark, sf_dir,
        stages=["quality", {"stage": "langid", "langs": ["en"]},
                "exact_dedup"],
    )
    assert {r.doc_id for r in rep.keep.collect()} == {
        r.doc_id for r in want.keep.collect()
    }


def test_curate_from_config_rejects_missing_stages(spark, sf_dir, tmp_path):
    from flapi_spark.pipeline import curate_from_config

    cfg = tmp_path / "empty.yaml"
    cfg.write_text("name: nothing\n")
    with pytest.raises(ValueError, match="non-empty 'stages'"):
        curate_from_config(spark, sf_dir, str(cfg))


def test_example_curation_config_loads(spark, sf_dir):
    """The shipped example config is runnable as-is."""
    import os

    from flapi_spark.pipeline import curate_from_config

    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "project",
        "pipelines", "curation.yaml",
    )
    rep = curate_from_config(spark, sf_dir, path)
    assert [s["stage"] for s in rep.stages] == [
        "html_extract", "quality", "langid", "exact_dedup",
        "near_dedup", "decontam", "train_split",
    ]
    assert rep.keep.count() > 0


def test_shipped_yaml_funnel_matches_oracle(spark):
    """VERDICT r9 item 7: the SHIPPED curation.yaml, run end-to-end at
    sf0.01, produces the exact funnel the chained-CTE DuckDB oracle
    computes (lang allow-list replayed via the parameterized oracle
    builder); the trailing train_split stage is checked for chain
    consistency."""
    import os

    import duckdb

    from flapi_spark.pipeline import curate_from_config
    from flapi_spark.queries import _curation_funnel_html_sql

    sf01 = "/root/testdata/sf0.01"
    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "project",
        "pipelines", "curation.yaml",
    )
    rep = curate_from_config(spark, sf01, path)
    got = {
        r.stage: (r.stage_name, r.n_in, r.n_out, r.n_dropped)
        for r in rep.funnel_df.collect()
    }
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf01}/{t}.parquet'"
        )
    want = con.execute(
        _curation_funnel_html_sql(lang_cond="predicted_lang = 'en'")
    ).fetchall()
    con.close()
    assert len(got) == 7  # 6 oracle-checked stages + train_split
    for stage, name, n_in, n_out, n_drop in want:
        assert got[stage] == (name, n_in, n_out, n_drop)
    # train_split chains off decontam's survivors and narrows
    name, n_in, n_out, n_drop = got[7]
    assert name == "train_split"
    assert n_in == got[6][2] and 0 < n_out <= n_in
    assert n_drop == n_in - n_out


def test_video_near_dedup_stage(spark, sf_dir):
    """The video lane inside curate() (round 10): per any-frame-match
    cluster exactly the min-doc_id exemplar survives; docs outside
    any cluster untouched — the image-stage contract over the video
    pair rollup."""
    from flapi_spark.multimodal import mm_video_phash_pairs
    from flapi_spark.operators.dedup import label_components

    rep = curate(spark, sf_dir, stages=["video_near_dedup"])
    got = {r.doc_id for r in rep.keep.collect()}
    comps = label_components(
        mm_video_phash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    ).collect()
    clustered = {r.doc_id for r in comps}
    exemplars = {r.doc_id for r in comps if r.doc_id == r.component_id}
    docs = {
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").collect()
    }
    assert got == (docs - clustered) | exemplars
    assert len(got) < len(docs)  # the corpus has video near-dups


def test_html_extract_stage_parity(spark, sf_dir):
    """The html_extract stage keeps exactly the operator's keep=true
    docs, and custom thresholds pass through as stage params."""
    from flapi_spark.operators.text import text_html_extract

    rep = curate(spark, sf_dir, stages=["html_extract"])
    got = {r.doc_id for r in rep.keep.collect()}
    want = {
        r.doc_id
        for r in text_html_extract(spark, sf_dir).where("keep").collect()
    }
    assert got == want and 0 < len(got)
    keep_all = curate(
        spark, sf_dir,
        stages=[{"stage": "html_extract", "min_density": 0.0,
                 "min_text_len": 0}],
    ).keep
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert keep_all.count() == n_docs


def test_full_multimodal_chain(spark, sf_dir):
    """Round 10: the COMPLETE curation chain — crawl gates (url,
    html), text gates (quality, langid), every dedup modality (exact,
    text near-dup, image, audio, video), decontamination — composes
    in one curate() run: monotone funnel, every stage present, and
    the gate families each bite at this SF."""
    stages = [
        "url_filter", "html_extract", "quality", "langid",
        "exact_dedup", "near_dedup", "image_near_dedup",
        "audio_near_dedup", "video_near_dedup", "decontam",
    ]
    rep = curate(spark, sf_dir, stages=stages)
    assert [s["stage"] for s in rep.stages] == stages
    counts = [rep.stages[0]["n_in"]] + [s["n_out"] for s in rep.stages]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] > 0
    dropped = {s["stage"]: s["n_in"] - s["n_out"] for s in rep.stages}
    # each gate family bites somewhere on this corpus
    assert dropped["url_filter"] > 0
    assert dropped["html_extract"] > 0
    assert dropped["quality"] + dropped["langid"] >= 0
    assert dropped["exact_dedup"] + dropped["near_dedup"] > 0
    assert (
        dropped["image_near_dedup"] + dropped["audio_near_dedup"]
        + dropped["video_near_dedup"] > 0
    )
    assert rep.keep.count() == counts[-1]


def test_boilerplate_gate_stage(spark, sf_dir):
    """round 10b: boilerplate_gate drops exactly the docs whose
    corpus-duplicated-span share exceeds the threshold."""
    from flapi_spark.operators.dedup import boilerplate_share
    from flapi_spark.pipeline import curate

    rep = curate(spark, sf_dir, stages=["boilerplate_gate"])
    direct = boilerplate_share(spark, sf_dir).where("keep")
    kept = {r["doc_id"] for r in rep.keep.collect()}
    assert kept == {r["doc_id"] for r in direct.collect()}
    assert rep.stages[-1]["n_out"] <= rep.stages[-1]["n_in"]


def test_token_funnel_matches_doc_funnel_chain(spark, sf_dir):
    """token_counts=True: same keep-chain, token measure — the doc
    funnel and token funnel agree on stage names/order, tokens are
    monotone non-increasing, and the final keep-set is identical to
    a token-less run."""
    from flapi_spark.pipeline import curate

    with_t = curate(spark, sf_dir, token_counts=True)
    rows = with_t.token_funnel_df.collect()
    assert [r["stage_name"] for r in rows] == [
        s["stage"] for s in with_t.stages
    ]
    toks = [rows[0]["tokens_in"]] + [r["tokens_out"] for r in rows]
    assert all(a >= b for a, b in zip(toks, toks[1:]))
    plain = curate(spark, sf_dir)
    assert {r["doc_id"] for r in with_t.keep.collect()} == {
        r["doc_id"] for r in plain.keep.collect()
    }


def test_shipped_full_chain_yaml_runs_monotone(spark, sf_dir):
    """round 10b: the shipped curation_full.yaml (every text gate in
    deployed order, incl. boilerplate_gate and classifier_gate with
    a keep_frac param) runs end-to-end; the funnel is monotone and
    every stage name matches the file's order."""
    import os

    from flapi_spark.pipeline import curate_from_config

    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "project",
        "pipelines", "curation_full.yaml",
    )
    rep = curate_from_config(spark, sf_dir, path)
    assert [s["stage"] for s in rep.stages] == [
        "url_filter", "license_gate", "html_extract", "quality",
        "source_gate", "boilerplate_gate", "classifier_gate",
        "exact_dedup", "near_dedup", "semantic_dedup", "cluster_prune",
        "decontam", "semantic_decontam",
    ]
    ns = [rep.stages[0]["n_in"]] + [s["n_out"] for s in rep.stages]
    assert all(a >= b for a, b in zip(ns, ns[1:]))
    assert rep.stages[-1]["n_out"] > 0


def test_mixture_cap_stage(spark, sf_dir):
    """round 10b: mixture_cap narrows to exactly the plan's keepset
    when it is the only stage."""
    from flapi_spark.operators.text import mixture_sample_keepset
    from flapi_spark.pipeline import curate

    rep = curate(spark, sf_dir, stages=["mixture_cap"])
    want = {
        r["doc_id"]
        for r in mixture_sample_keepset(spark, sf_dir)
        .where("keep").collect()
    }
    assert {r["doc_id"] for r in rep.keep.collect()} == want
    assert rep.stages[-1]["n_out"] < rep.stages[-1]["n_in"]


def test_semantic_dedup_stage(spark, sf_dir):
    """round 10c: the semantic_dedup stage keeps exactly the SemDeDup
    verdict survivors (vec_id == doc_id contract), and the threshold
    passes through as a stage param."""
    from flapi_spark.operators.dedup import semdedup_clusters

    rep = curate(spark, sf_dir, stages=["semantic_dedup"])
    got = {r.doc_id for r in rep.keep.collect()}
    want = {
        r.vec_id
        for r in semdedup_clusters(spark, sf_dir).where("keep").collect()
    }
    docs = {
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id").collect()
    }
    assert got == (want & docs) and 0 < len(got) < len(docs)
    # a permissive threshold drops nothing
    keep_all = curate(
        spark, sf_dir,
        stages=[{"stage": "semantic_dedup", "threshold": 1.1}],
    ).keep
    assert keep_all.count() == len(docs)


def test_full_chain_with_semantic_dedup(spark, sf_dir):
    """The complete chain still composes with the embedding modality
    in its deployed position (after text near-dup, before decontam)."""
    stages = [
        "quality", "langid", "exact_dedup", "near_dedup",
        "semantic_dedup", "decontam",
    ]
    rep = curate(spark, sf_dir, stages=stages)
    assert [s["stage"] for s in rep.stages] == stages
    counts = [rep.stages[0]["n_in"]] + [s["n_out"] for s in rep.stages]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] > 0
    dropped = {s["stage"]: s["n_in"] - s["n_out"] for s in rep.stages}
    assert dropped["semantic_dedup"] > 0  # the embedding modality bites


def test_materialize_training_corpus(spark, sf_dir, tmp_path):
    """round 10d: the last-mile writer — kept docs land once each,
    sharded and ordered by the seeded md5 rank; the manifest matches
    what was written; re-materialization is idempotent; a new seed
    reshuffles shard membership but not the doc set."""
    from flapi_spark.operators.text import corpus_shard_assign
    from flapi_spark.pipeline import curate, materialize_training_corpus

    rep = curate(spark, sf_dir, stages=["quality"])
    kept = {r.doc_id for r in rep.keep.collect()}
    out = str(tmp_path / "shards")
    manifest = materialize_training_corpus(
        spark, sf_dir, rep.keep, out, n_shards=4
    )
    rows = manifest.collect()
    assert {r.shard for r in rows} <= set(range(4))
    assert sum(r.n_docs for r in rows) == len(kept)
    written = spark.read.parquet(out)
    assert {r.doc_id for r in written.collect()} == kept
    # shard+position match the deterministic assignment
    assign = {
        r.doc_id: (r.shard, r.position)
        for r in corpus_shard_assign(spark, sf_dir, n_shards=4,
                                     seed="epoch0")
        .select("doc_id", "shard", F.col("pos").alias("position"))
        .collect()
    }
    for r in written.select("doc_id", "shard", "position").collect():
        assert assign[r.doc_id] == (r.shard, r.position)
    # idempotent re-run (overwrite), identical manifest
    manifest2 = materialize_training_corpus(
        spark, sf_dir, rep.keep, out, n_shards=4
    )
    assert sorted(map(tuple, manifest2.collect())) == sorted(
        map(tuple, rows)
    )
    # epoch reshuffle: same docs, different arrangement
    m3 = materialize_training_corpus(
        spark, sf_dir, rep.keep, out, n_shards=4, seed="epoch1"
    )
    w3 = spark.read.parquet(out)
    assert {r.doc_id for r in w3.collect()} == kept
    a3 = {
        r.doc_id: (r.shard, r.position)
        for r in w3.select("doc_id", "shard", "position").collect()
    }
    assert any(a3[d] != assign[d] for d in kept)


# --- survivor_scope="keepset" (round 11, VERDICT r10 item 5) ---------------


def test_survivor_scope_keepset_retains_neardup_cluster(spark, sf_dir):
    """A near-dup cluster whose corpus-wide exemplar an earlier stage
    dropped: corpus scope deletes the WHOLE cluster; keepset scope
    re-elects exemplar(s) among the surviving members (≥1 — possibly
    one per sub-component if the exemplar was a cut vertex)."""
    from flapi_spark.operators.dedup import dedup_keep_best_survivors
    from flapi_spark.pipeline import _near_dedup
    from flapi_spark.session import load_table

    kb = dedup_keep_best_survivors(spark, sf_dir)
    comp = (
        kb.groupBy("component_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sort_array(F.collect_list("doc_id")).alias("ids"),
            F.max(F.when(F.col("keep"), F.col("doc_id"))).alias("ex"),
        )
        .where("n >= 2")
        .orderBy("component_id")
        .first()
    )
    assert comp is not None, "testdata must contain a near-dup cluster"
    members = set(comp.ids)
    # "earlier stage" drops the corpus-wide exemplar
    keep0 = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") != comp.ex)
    )
    corpus_ids = {
        r.doc_id for r in _near_dedup(spark, sf_dir, keep0).collect()
    }
    keepset_ids = {
        r.doc_id
        for r in _near_dedup(
            spark, sf_dir, keep0, survivor_scope="keepset"
        ).collect()
    }
    assert not members & corpus_ids          # whole cluster lost (hazard)
    survivors = members & keepset_ids
    assert survivors                          # ≥1 member re-elected
    assert len(survivors) < len(members)      # still deduped
    # keepset scope can only ADD survivors relative to corpus scope
    assert corpus_ids <= keepset_ids


def test_survivor_scope_keepset_perceptual_policy(spark):
    """The shared exemplar policy with a synthetic pair graph: corpus
    scope drops every non-exemplar of the FULL-graph component even
    when the exemplar itself is gone; keepset scope re-elects among
    surviving members."""
    from flapi_spark.pipeline import _drop_cluster_non_exemplars

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a LONG, doc_b LONG"
    )
    keep = spark.createDataFrame([(2,), (3,), (9,)], "doc_id LONG")
    corpus = {
        r.doc_id for r in _drop_cluster_non_exemplars(keep, pairs).collect()
    }
    keepset = {
        r.doc_id
        for r in _drop_cluster_non_exemplars(
            keep, pairs, survivor_scope="keepset"
        ).collect()
    }
    assert corpus == {9}        # exemplar 1 was already gone: 2,3 lost
    assert keepset == {2, 9}    # 2 re-elected among survivors


def test_survivor_scope_default_parity_and_keepset_superset(spark, sf_dir):
    """curate() default == explicit survivor_scope='corpus' (keep-set
    AND funnel bit-identical — the pinned oracle world is unchanged);
    keepset scope never keeps fewer docs at any stage."""
    stages = ["quality", "langid", "exact_dedup", "near_dedup"]
    a = curate(spark, sf_dir, stages=stages)
    b = curate(spark, sf_dir, stages=stages, survivor_scope="corpus")
    ka = {r.doc_id for r in a.keep.collect()}
    assert ka == {r.doc_id for r in b.keep.collect()}
    assert [(s["stage"], s["n_in"], s["n_out"]) for s in a.stages] == [
        (s["stage"], s["n_in"], s["n_out"]) for s in b.stages
    ]
    c = curate(spark, sf_dir, stages=stages, survivor_scope="keepset")
    kc = {r.doc_id for r in c.keep.collect()}
    assert ka <= kc
    for sa, sc in zip(a.stages, c.stages):
        assert sc["n_out"] >= sa["n_out"]


def test_survivor_scope_rejects_unknown(spark, sf_dir):
    with pytest.raises(ValueError, match="survivor_scope"):
        curate(spark, sf_dir, stages=["quality"], survivor_scope="x")


def test_fold_verdict_masks_counts_and_keepset(spark):
    """Round 12: the one-job mask histogram must reproduce the
    sequential intersection chain exactly — counts, token sums, and
    the final keep-set — including duplicate verdict rows (bit_or
    idempotence) and docs absent from later verdicts."""
    from flapi_spark.pipeline import fold_verdict_masks

    v1 = spark.createDataFrame(
        [(1,), (2,), (3,), (4,), (4,)], "doc_id LONG"
    )  # duplicate row on purpose
    v2 = spark.createDataFrame([(2,), (3,), (4,), (9,)], "doc_id LONG")
    v3 = spark.createDataFrame([(3,), (9,)], "doc_id LONG")
    tokmap = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40), (9, 90)],
        "doc_id LONG, n_toks LONG",
    )
    keep, outs = fold_verdict_masks([v1, v2, v3], tokmap=tokmap)
    # sequential chain: {1,2,3,4} -> {2,3,4} -> {3}
    assert [n for n, _t in outs] == [4, 3, 1]
    assert [t for _n, t in outs] == [100, 90, 30]
    assert sorted(r["doc_id"] for r in keep.collect()) == [3]
