"""End-to-end training-data curation pipeline — the §2.3 operators
composed into ONE runnable artifact, the way a 100 TB pre-training
data job would chain them:

  1. QUALITY    text_gopher_filters — Gopher gates (length / token
                shape / stopword) over the raw corpus
  2. LANGUAGE   text_langid — keep docs with a confident language ID
  3. EXACT DUP  dedup_exact_survivors — one doc per md5 fingerprint
  4. NEAR DUP   dedup_keep_best_survivors — MinHash-LSH clusters +
                quality-aware exemplar choice (max tokens)
  5. DECONTAM   contamination_ngram_overlap — drop training docs that
                share n-grams with the eval split
  6. SPLIT      split_train_holdout — deterministic md5 split
  7. PACK       pack_sequences — shard + ~budget-token packs
  8. STATS      per-stage attrition + final corpus token counts

Every stage is the PRODUCTION operator from the registry (each with
its own DuckDB oracle driven per-round); this script measures their
composition: per-stage wall time and row attrition over sf0.1. The
keep-set flows stage to stage as a doc_id column joined semi-style
(at 100 TB the intermediate keep-sets are id+metadata-grain, never
copied text). Attrition must be monotone — asserted.

Prints one JSON line with per-stage {rows, sec}.

Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python
     scripts/pipeline_demo.py

Scale-measurement caveat: the word-suffixed replica corpora built by
baseline_multi_sf.py are NOT usable here — suffixed words ("the1")
fail the stopword/Gopher gates by construction, so quality filters
every replica but the original and downstream stages measure sf0.1
again. The dedup-only loop (continuous_dedup_demo.py) is
suffix-compatible; composed-pipeline scaling needs plain replicas or
a real corpus.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from flapi_spark.operators.dedup import (  # noqa: E402
    dedup_exact_survivors,
    dedup_keep_best_survivors,
)
from flapi_spark.operators.text import (  # noqa: E402
    _tokens,
    contamination_ngram_overlap,
    pack_sequences,
    split_train_holdout,
    text_gopher_filters,
    text_langid,
)
from flapi_spark.session import get_spark, load_table  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="pipeline_demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    stages: dict[str, dict] = {}

    def stage(name, build):
        # the thunk runs INSIDE the timer: keep-set joins are eagerly
        # checkpointed, so construction is where the work happens
        t0 = time.perf_counter()
        df = build() if callable(build) else build
        n = df.count()
        stages[name] = {"rows": n, "sec": round(time.perf_counter() - t0, 3)}
        return df

    keep = stage("raw", docs.select("doc_id"))

    # 1. quality gates — keep docs passing ALL Gopher gates
    keep = stage("quality", lambda: keep.join(
        text_gopher_filters(spark, sf_dir).where("keep").select("doc_id"),
        "doc_id", "left_semi").localCheckpoint())

    # 2. language ID — keep confidently-identified docs
    keep = stage("langid", lambda: keep.join(
        text_langid(spark, sf_dir)
        .where(F.col("predicted_lang") != "unknown").select("doc_id"),
        "doc_id", "left_semi").localCheckpoint())

    # 3. exact dedup — one survivor per fingerprint (survivor choice
    # restricted to the current keep-set so earlier gates hold)
    keep = stage("exact_dedup", lambda: keep.join(
        dedup_exact_survivors(spark, sf_dir).select("doc_id"),
        "doc_id", "left_semi").localCheckpoint())

    # 4. near-dup clusters — quality-aware exemplar per MinHash
    # family, pairs served from the PERSISTED index (bootstrap once,
    # zero corpus re-hash — identical rows to the inline chain)
    from flapi_spark.operators.dedup import (
        pairs_from_band_index, write_band_index_portable,
        write_shingle_store_portable,
    )
    from flapi_spark.writes import _rm_table

    band, store = "pipe_bands", "pipe_shingles"

    def _bootstrap():
        for t in (band, store):
            _rm_table(spark, t)
        write_band_index_portable(spark, docs, band)
        write_shingle_store_portable(spark, docs, store)
        return spark.table(band).select(F.lit(1).alias("ok")).limit(1)

    stage("index_bootstrap", _bootstrap)  # one-time, amortized forever

    def _near_dedup():
        pairs = pairs_from_band_index(
            spark, None, band, shingle_store=store
        ).select("doc_a", "doc_b")
        return keep.join(
            dedup_keep_best_survivors(spark, sf_dir, pairs=pairs)
            .where("keep").select("doc_id"),
            "doc_id", "left_semi").localCheckpoint()

    try:
        keep = stage("near_dedup", _near_dedup)
    finally:
        for t in (band, store):
            _rm_table(spark, t)

    # 5. decontamination — drop any training doc sharing eval n-grams
    keep = stage("decontam", lambda: keep.join(
        contamination_ngram_overlap(spark, sf_dir)
        .select(F.col("train_doc").alias("doc_id")).distinct(),
        "doc_id", "left_anti").localCheckpoint())

    # 6. deterministic split
    train = stage("train_split", lambda: keep.join(
        split_train_holdout(spark, sf_dir).select("doc_id", "split"),
        "doc_id").where("split = 'train'").localCheckpoint())

    # 7. pack the surviving training docs into shard/pack assignments
    stage("packed", lambda: pack_sequences(spark, sf_dir).join(
        train.select("doc_id"), "doc_id", "left_semi"))

    # 8. final stats over the surviving corpus text
    t0 = time.perf_counter()
    final = docs.join(train.select("doc_id"), "doc_id", "left_semi")
    row = final.select(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.size(_tokens())).alias("tokens"),
    ).collect()[0]
    stats_sec = round(time.perf_counter() - t0, 3)

    # attrition must be monotone through the keep/drop stages
    order = ["raw", "quality", "langid", "exact_dedup", "near_dedup",
             "decontam", "train_split"]  # index_bootstrap excluded:
    # it reports index rows, not corpus attrition
    counts = [stages[s]["rows"] for s in order]
    assert counts == sorted(counts, reverse=True), counts
    assert counts[-1] > 0

    print(json.dumps({
        "sf_dir": sf_dir,
        "stages": stages,
        "final_train_docs": row.docs,
        "final_train_tokens": int(row.tokens),
        "stats_sec": stats_sec,
        "retention_pct": round(100.0 * row.docs / counts[0], 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
