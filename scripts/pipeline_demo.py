"""End-to-end training-data curation pipeline — the §2.3 operators
composed into ONE runnable artifact, the way a 100 TB pre-training
data job would chain them. Round 9: the chain itself now lives in
the library (flapi_spark.pipeline.curate — config-driven stage list,
per-stage attrition funnel); this script is a thin driver that
bootstraps the persisted index, invokes curate() with the
production (index-served) near-dup stage, and finishes with the
split/pack/stats tail:

  1. QUALITY    text_gopher_filters — Gopher gates
  2. LANGUAGE   text_langid — keep confidently-identified docs
  3. EXACT DUP  dedup_exact_survivors — one doc per md5 fingerprint
  4. NEAR DUP   dedup_keep_best_survivors over the PERSISTED portable
                band index + shingle store (zero corpus re-hash)
  5. DECONTAM   contamination_ngram_overlap
  6. SPLIT      split_train_holdout (curate's train_split stage)
  7. PACK       pack_sequences
  8. STATS      final corpus token counts

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
    write_band_index_portable,
    write_shingle_store_portable,
)
from flapi_spark.operators.text import (  # noqa: E402
    _tokens,
    pack_sequences,
)
from flapi_spark.pipeline import curate  # noqa: E402
from flapi_spark.session import get_spark, load_table  # noqa: E402
from flapi_spark.writes import _rm_table  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="pipeline_demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    stages: dict[str, dict] = {}
    stages["raw"] = {"rows": docs.count(), "sec": 0.0}

    # one-time persisted-index bootstrap (amortized forever: every
    # later near-dup pass probes it with zero corpus re-hash)
    band, store = "pipe_bands", "pipe_shingles"
    t0 = time.perf_counter()
    for t in (band, store):
        _rm_table(spark, t)
    write_band_index_portable(spark, docs, band)
    write_shingle_store_portable(spark, docs, store)
    stages["index_bootstrap"] = {
        "rows": spark.table(band).count(),
        "sec": round(time.perf_counter() - t0, 3),
    }

    try:
        report = curate(
            spark,
            sf_dir,
            stages=[
                "quality",
                "langid",
                "exact_dedup",
                {
                    "stage": "near_dedup",
                    "band_table": band,
                    "shingle_store": store,
                },
                "decontam",
                "train_split",
            ],
        )
    finally:
        for t in (band, store):
            _rm_table(spark, t)
    for s in report.stages:
        stages[s["stage"]] = {"rows": s["n_out"], "sec": s["sec"]}
    train = report.keep

    # pack the surviving training docs into shard/pack assignments
    t0 = time.perf_counter()
    packed = pack_sequences(spark, sf_dir).join(
        train.select("doc_id"), "doc_id", "left_semi"
    )
    stages["packed"] = {
        "rows": packed.count(),
        "sec": round(time.perf_counter() - t0, 3),
    }

    # final stats over the surviving corpus text
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
