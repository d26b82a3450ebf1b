import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from flapi_spark import streaming as ST


@pytest.fixture(scope="module")
def events_stream_dir(sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_landing")
    shutil.copy(f"{sf_dir}/events.parquet", d / "events.parquet")
    return str(d)


def _qname():
    return "t" + uuid.uuid4().hex[:10]


def test_tumbling_stream_equals_batch(spark, sf_dir, events_stream_dir):
    name = _qname()
    events = ST.read_events_stream(spark, events_stream_dir)
    ST.run_stream_to_memory(ST.tumbling_agg_stream(events), name)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table(name).collect()
    }

    from flapi_spark.operators.relational import events_tumbling_agg

    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in events_tumbling_agg(spark, sf_dir).collect()
    }
    assert got == want


def test_sessionize_stream_equals_batch(spark, sf_dir, events_stream_dir):
    name = _qname()
    events = ST.read_events_stream(spark, events_stream_dir)
    ST.run_stream_to_memory(
        ST.sessionize_stream(events), name, output_mode="append"
    )
    got = {
        (r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end)
        for r in spark.table(name).collect()
    }

    from flapi_spark.operators.relational import events_sessionize

    want = {
        (r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end)
        for r in events_sessionize(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_watermark_column_present(spark, events_stream_dir):
    events = ST.read_events_stream(spark, events_stream_dir)
    agg = ST.tumbling_agg_stream(events)
    assert agg.isStreaming
    assert set(agg.columns) == {"window_start", "event_type", "n_events", "sum_value"}


def test_sliding_stream_equals_batch(spark, sf_dir, events_stream_dir):
    name = _qname()
    events = ST.read_events_stream(spark, events_stream_dir)
    ST.run_stream_to_memory(ST.sliding_agg_stream(events), name)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table(name).collect()
    }

    from flapi_spark.operators.relational import events_hopping_agg

    want = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in events_hopping_agg(spark, sf_dir).collect()
    }
    assert got == want


def test_dedup_stream_drops_replayed_batch(spark, sf_dir, tmp_path):
    # landing zone with the same file twice = an at-least-once replay
    import shutil as _sh

    d = tmp_path / "dup_landing"
    d.mkdir()
    _sh.copy(f"{sf_dir}/events.parquet", d / "a.parquet")
    _sh.copy(f"{sf_dir}/events.parquet", d / "b.parquet")
    name = _qname()
    events = ST.read_events_stream(spark, str(d))
    ST.run_stream_to_memory(ST.dedup_stream(events), name, output_mode="append")
    n_distinct = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    got = spark.table(name)
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, events_stream_dir):
    name = _qname()
    events = ST.read_events_stream(spark, events_stream_dir)
    ST.run_stream_to_memory(
        ST.error_purchase_join_stream(events), name, output_mode="append"
    )
    got = {
        (r.error_id, r.purchase_id) for r in spark.table(name).collect()
    }

    from flapi_spark.operators.range_join import range_join_error_purchase

    want = {
        (r.error_id, r.purchase_id)
        for r in range_join_error_purchase(spark, sf_dir).collect()
    }
    assert got == want


def test_sessionize_cross_batch_session(spark, tmp_path):
    """A session spanning micro-batches must keep its true start and
    cumulative count: the last emission per (user, session_id) carries
    corrected totals (state holds session_start + running count)."""
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "landing"
    d.mkdir()
    t0 = 1_700_000_000_000_000_000  # ns
    minute = 60 * 1_000_000_000

    def write(name, rows, mtime):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                # naive micros -> parquet TIMESTAMP(MICROS, notUTC) ->
                # Spark TIMESTAMP_NTZ, same as the testdata nanos files
                "ts": pa.array([r[1] // 1000 for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        path = str(d / name)
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    now = time.time()
    # batch 1: two events 10 min apart (one open session)
    write("a.parquet", [(1, t0, 7), (2, t0 + 10 * minute, 7)], now - 60)
    # batch 2: continues the session (+20 min), then a 3-hour gap opens
    # a second session
    write(
        "b.parquet",
        [(3, t0 + 20 * minute, 7), (4, t0 + 200 * minute, 7)],
        now,
    )

    name = _qname()
    events = ST.read_events_stream(spark, str(d), max_files_per_trigger=1)
    ST.run_stream_to_memory(
        ST.sessionize_stream(events), name, output_mode="append"
    )
    rows = spark.table(name).collect()
    # last-write-wins per (user, session_id)
    final = {}
    for r in sorted(rows, key=lambda r: r.n_events):
        final[(r.user_id, r.session_id)] = (
            r.n_events, r.session_start, r.session_end,
        )
    assert set(final) == {(7, 1), (7, 2)}
    n1, start1, end1 = final[(7, 1)]
    assert n1 == 3  # cumulative across both batches, not batch-local
    assert start1 == pd.Timestamp(t0 // 1000, unit="us")  # true start
    assert end1 == pd.Timestamp((t0 + 20 * minute) // 1000, unit="us")
    n2, start2, end2 = final[(7, 2)]
    assert n2 == 1
    assert start2 == end2 == pd.Timestamp((t0 + 200 * minute) // 1000, unit="us")


def test_sessionize_timeout_flushes_open_session():
    """Direct-drive the group function's timeout branch with a fake
    GroupState: the open session flushes once and state drops."""
    import pandas as pd

    class FakeState:
        def __init__(self, tup):
            self._t = tup
            self.exists = tup is not None
            self.hasTimedOut = True
            self.removed = False

        @property
        def get(self):
            return self._t

        def update(self, t):  # pragma: no cover - not hit on timeout
            self._t = t

        def remove(self):
            self.removed = True

    t0 = 1_700_000_000_000_000  # us
    st = FakeState((t0 + 120_000_000, 3, 5, t0))
    out = list(ST._sessionize_group((42,), iter([]), st))
    assert len(out) == 1
    df = out[0]
    assert len(df) == 1
    row = df.iloc[0]
    assert (row.user_id, row.session_id, row.n_events) == (42, 3, 5)
    assert row.session_start == pd.Timestamp(t0, unit="us")
    assert row.session_end == pd.Timestamp(t0 + 120_000_000, unit="us")
    assert st.removed

    # a timed-out key with no open events emits nothing but still drops
    st2 = FakeState((None, 0, 0, None))
    out2 = list(ST._sessionize_group((7,), iter([]), st2))
    assert len(out2[0]) == 0 and st2.removed


def test_sessionize_stream_timeout_mode_builds(spark, events_stream_dir):
    """The ProcessingTimeTimeout variant builds a valid streaming plan
    (running it under availableNow would block on the wall-clock gap,
    so the flush branch is covered by the direct-drive test above)."""
    events = ST.read_events_stream(spark, events_stream_dir)
    df = ST.sessionize_stream(events, use_timeout=True)
    assert df.isStreaming
    assert set(df.columns) == {
        "user_id", "session_id", "n_events", "session_start", "session_end",
    }


def test_funnel_stream_equals_batch_stages(spark, sf_dir, events_stream_dir):
    from pyspark.sql import functions as F

    name = _qname()
    events = ST.read_events_stream(spark, events_stream_dir)
    ST.run_stream_to_memory(
        ST.funnel_stream(events), name, output_mode="update"
    )
    # update-mode memory sink appends each batch's emissions: keep the
    # final (highest-stage) row per user
    got = {}
    for r in spark.table(name).collect():
        prev = got.get(r.user_id)
        if prev is None or r.stage > prev:
            got[r.user_id] = r.stage

    # batch truth: per-user funnel stages from the same min-ts chain
    # the batch funnel_conversion counts
    from flapi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("view_ts"))
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .join(views, "user_id")
        .where(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id").agg(F.min("ts").alias("click_ts"))
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .where(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id").agg(F.min("ts").alias("purchase_ts"))
    )
    want = {r.user_id: 0 for r in ev.select("user_id").distinct().collect()}
    for r in views.collect():
        want[r.user_id] = 1
    for r in clicks.collect():
        want[r.user_id] = 2
    for r in purchases.collect():
        want[r.user_id] = 3
    assert got == want


def test_funnel_stream_v2_gated(spark, sf_dir, events_stream_dir):
    """The state-v2 path requires protobuf; assert the gate behaves:
    run it when available, raise a clean ImportError when not."""
    events = ST.read_events_stream(spark, events_stream_dir)
    if not ST.HAS_STATE_V2:
        import pytest as _pytest

        with _pytest.raises(ImportError):
            ST.funnel_stream(events, api="v2")
        return
    name = _qname()
    ST.run_stream_to_memory(
        ST.funnel_stream(events, api="v2"), name, output_mode="update"
    )
    assert spark.table(name).count() > 0


def test_ewma_stream_equals_batch_fold(spark, sf_dir, tmp_path_factory):
    """Two time-split landing files -> two availableNow micro-batches;
    the cross-batch EWMA state must make the streamed per-bucket
    values equal a batch-side ordered fold over hourly means."""
    from pyspark.sql import functions as F

    from flapi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).first()
    # split at a day boundary so no hourly bucket straddles the two
    # batches (the op's documented ordering contract)
    split_day = (mn + (mx - mn) / 2).replace(
        hour=0, minute=0, second=0, microsecond=0
    )
    d = tmp_path_factory.mktemp("events_ewma_landing")
    lit_day = F.lit(split_day).cast("timestamp_ntz")
    early = ev.where(F.col("ts") < lit_day)
    late = ev.where(F.col("ts") >= lit_day)
    assert early.count() > 0 and late.count() > 0
    import glob as _glob

    for i, part in enumerate((early, late)):
        staging = str(d / f"_stage_{i}")
        part.coalesce(1).write.parquet(staging)
        src = _glob.glob(staging + "/part-*.parquet")[0]
        shutil.copy(src, str(d / f"batch_{i}.parquet"))
        shutil.rmtree(staging)

    name = _qname()
    stream = ST.read_events_stream(spark, str(d), max_files_per_trigger=1)
    ST.run_stream_to_memory(ST.ewma_stream(stream), name, output_mode="append")
    got = {
        (r.event_type, r.bucket_us): (r.mean_value, r.ewma)
        for r in spark.table(name).collect()
    }

    # batch truth: ordered EWMA fold over hourly means per type
    hourly = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket")
        )
        .agg(F.avg("value").alias("mv"))
        .collect()
    )
    by_type = {}
    for r in sorted(hourly, key=lambda r: (r.event_type, r.bucket)):
        by_type.setdefault(r.event_type, []).append(r)
    import datetime as dt

    n_checked = 0
    for et, rows in by_type.items():
        y = None
        for r in rows:
            y = r.mv if y is None else 0.25 * r.mv + 0.75 * y
            bucket_us = int(
                r.bucket.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
            )
            assert (et, bucket_us) in got
            mv_s, ewma_s = got[(et, bucket_us)]
            assert mv_s == pytest.approx(r.mv, rel=1e-9)
            assert ewma_s == pytest.approx(y, rel=1e-9)
            n_checked += 1
    assert n_checked == len(got)


def test_counter_rate_stream_equals_batch(spark, sf_dir, tmp_path_factory):
    """Two time-split landing files -> two availableNow micro-batches;
    per-user counter state must survive the batch boundary so summed
    streamed partials equal the batch counter_rate_events exactly
    (including resets that straddle the split)."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from flapi_spark.operators.relational import counter_rate_events
    from flapi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).first()
    split_day = (mn + (mx - mn) / 2).replace(
        hour=0, minute=0, second=0, microsecond=0
    )
    d = tmp_path_factory.mktemp("events_counter_landing")
    lit_day = F.lit(split_day).cast("timestamp_ntz")
    import glob as _glob

    for i, part in enumerate(
        (ev.where(F.col("ts") < lit_day), ev.where(F.col("ts") >= lit_day))
    ):
        staging = str(d / f"_stage_{i}")
        part.coalesce(1).write.parquet(staging)
        src = _glob.glob(staging + "/part-*.parquet")[0]
        shutil.copy(src, str(d / f"batch_{i}.parquet"))
        shutil.rmtree(staging)

    name = _qname()
    stream = ST.read_events_stream(spark, str(d), max_files_per_trigger=1)
    ST.run_stream_to_memory(
        ST.counter_rate_stream(stream), name, output_mode="append"
    )
    got = defaultdict(lambda: [0, 0, 0])
    for r in spark.table(name).collect():
        g = got[(r.event_type, r.bucket_us)]
        g[0] += r.total_increase
        g[1] += r.n_samples
        g[2] += r.n_resets

    expect = {
        (
            r.event_type,
            int(r.bucket.timestamp() * 1_000_000),
        ): [r.total_increase, r.n_samples, r.n_resets]
        for r in counter_rate_events(spark, sf_dir).collect()
    }
    assert dict(got) == expect
    # resets genuinely occur in testdata (the modulo wrap is exercised)
    assert sum(v[2] for v in expect.values()) > 0


def test_enrich_stream_equals_batch_join(spark, sf_dir, tmp_path_factory):
    """Stream-static join: availableNow over a 2-file landing equals
    the batch join row-for-row (stateless — no watermark needed)."""
    from pyspark.sql import functions as F

    from flapi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    d = tmp_path_factory.mktemp("events_enrich_landing")
    import glob as _glob

    halves = ev.randomSplit([0.5, 0.5], seed=7)
    for i, part in enumerate(halves):
        staging = str(d / f"_stage_{i}")
        part.coalesce(1).write.parquet(staging)
        src = _glob.glob(staging + "/part-*.parquet")[0]
        shutil.copy(src, str(d / f"batch_{i}.parquet"))
        shutil.rmtree(staging)

    name = _qname()
    stream = ST.read_events_stream(spark, str(d), max_files_per_trigger=1)
    ST.run_stream_to_memory(
        ST.enrich_stream(stream, cust), name, output_mode="append"
    )
    got = {
        (r.event_id, r.c_mktsegment) for r in spark.table(name).collect()
    }
    expect = {
        (r.event_id, r.c_mktsegment)
        for r in ST.enrich_stream(ev, cust).collect()
    }
    assert got == expect and len(got) == ev.count()
    # every event found its segment (user ids are a subset of custkeys)
    assert all(seg is not None for _, seg in got)


def test_session_window_stream_equals_batch(spark, sf_dir, tmp_path_factory):
    """Native session_window under availableNow == the same expression
    evaluated in batch (merging windows + watermark lifecycle handled
    by the engine; append mode emits only watermark-closed sessions,
    which availableNow's final batch closes entirely)."""
    from flapi_spark.session import load_table

    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    d = tmp_path_factory.mktemp("events_sw_landing")
    import glob as _glob

    # time-ordered split: a random split would strand pre-watermark
    # events in the second batch, where the engine rightly drops them
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).first()
    split_day = (mn + (mx - mn) / 2).replace(
        hour=0, minute=0, second=0, microsecond=0
    )
    lit_day = F.lit(split_day).cast("timestamp_ntz")
    import datetime as _dt

    # sentinel far-future event (user -1): advances the final
    # watermark past every real session so append mode flushes them
    # all (otherwise the trailing <watermark+gap> of data never emits)
    sentinel = ev.limit(1).select(
        F.lit(10**9).cast("long").alias("event_id"),
        F.lit(mx + _dt.timedelta(days=7)).cast("timestamp_ntz").alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    parts = (
        ev.where(F.col("ts") < lit_day),
        ev.where(F.col("ts") >= lit_day),
        sentinel,
    )
    for i, part in enumerate(parts):
        staging = str(d / f"_stage_{i}")
        part.coalesce(1).write.parquet(staging)
        src = _glob.glob(staging + "/part-*.parquet")[0]
        shutil.copy(src, str(d / f"batch_{i}.parquet"))
        shutil.rmtree(staging)

    name = _qname()
    stream = ST.read_events_stream(spark, str(d), max_files_per_trigger=1)
    ST.run_stream_to_memory(
        ST.session_window_agg_stream(stream), name, output_mode="append"
    )
    got = {
        (r.session_start, r.session_end, r.user_id): (r.n_events, r.sum_value)
        for r in spark.table(name).collect()
        if r.user_id >= 0
    }
    expect = {
        (r.session_start, r.session_end, r.user_id): (r.n_events, r.sum_value)
        for r in ST.session_window_agg_stream(ev).collect()
    }
    assert got == expect and len(got) > 0


def test_neardup_guard_stream_equals_batch(spark, sf_dir, tmp_path_factory):
    """Ingestion near-dup guard: availableNow over a 2-file landing of
    incoming docs equals the batch twin (distinct pair sets — the
    stream is documented at-least-once per band), and every incoming
    doc that IS a corpus member self-matches at jaccard 1.0."""
    import glob as _glob

    from pyspark.sql import functions as F

    from flapi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    incoming = docs.where(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    d = tmp_path_factory.mktemp("docs_guard_landing")
    halves = incoming.randomSplit([0.5, 0.5], seed=11)
    for i, part in enumerate(halves):
        staging = str(d / f"_stage_{i}")
        part.coalesce(1).write.parquet(staging)
        src = _glob.glob(staging + "/part-*.parquet")[0]
        shutil.copy(src, str(d / f"batch_{i}.parquet"))
        shutil.rmtree(staging)

    name = _qname()
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    ST.run_stream_to_memory(
        ST.neardup_guard_stream(stream, docs), name, output_mode="append"
    )
    got = {
        (r.doc_id, r.corpus_doc_id, r.jaccard)
        for r in spark.table(name).collect()
    }
    expect = {
        (r.doc_id, r.corpus_doc_id, r.jaccard)
        for r in ST.neardup_guard_stream(incoming, docs).collect()
    }
    assert got == expect and got
    # corpus members self-match exactly
    self_pairs = {(a, b) for a, b, _ in got if a == b}
    incoming_ids = {r.doc_id for r in incoming.select("doc_id").collect()}
    assert self_pairs == {(i, i) for i in incoming_ids}
    for a, b, j in got:
        if a == b:
            assert j == 1.0


def test_neardup_guard_stream_probes_persisted_band_index(
    spark, sf_dir, tmp_path_factory
):
    """Round 7: the guard's static band side is the PERSISTED bucketed
    index (dedup.write_band_index) — results equal the self-contained
    guard pair-for-pair, and the micro-batch plan reads the index as
    a bucketed scan (no index-side exchange before the candidate
    join), re-resolved per micro-batch so appends are picked up."""
    import glob as _glob

    from flapi_spark.operators.dedup import write_band_index
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    docs = load_table(spark, sf_dir, "documents")
    table = "t_guard_band_index"
    _rm_table(spark, table)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_band_index(spark, docs, table)
        incoming = docs.where(F.col("doc_id") % 7 == 0).select(
            "doc_id", "text"
        )
        d = tmp_path_factory.mktemp("docs_guard_idx")
        staging = str(d / "_stage")
        incoming.coalesce(1).write.parquet(staging)
        shutil.copy(
            _glob.glob(staging + "/part-*.parquet")[0],
            str(d / "batch_0.parquet"),
        )
        shutil.rmtree(staging)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        stream = (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .parquet(str(d))
        )
        guarded = ST.neardup_guard_stream(
            stream, docs, band_index=spark.table(table)
        )
        name = _qname()
        q = (
            guarded.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        plan = q._jsq.explainInternal(True)
        assert "Bucketed: true" in plan
        got = {
            (r.doc_id, r.corpus_doc_id, r.jaccard)
            for r in spark.table(name).collect()
        }
        expect = {
            (r.doc_id, r.corpus_doc_id, r.jaccard)
            for r in ST.neardup_guard_stream(incoming, docs).collect()
        }
        assert got == expect and got
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        _rm_table(spark, table)


def test_neardup_guard_fully_indexed_no_corpus_rehash(
    spark, sf_dir, tmp_path_factory
):
    """Round 8: with BOTH persisted sides (band index + shingle
    store) the guard needs no corpus_docs at all — results equal the
    self-contained guard pair-for-pair, the micro-batch plan reads
    both tables as bucketed scans, and the raw documents parquet is
    absent from the plan (zero corpus re-hash per batch)."""
    import glob as _glob

    from flapi_spark.operators.dedup import (
        write_band_index, write_shingle_store,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    docs = load_table(spark, sf_dir, "documents")
    btable, stable_ = "t_guard_band_idx8", "t_guard_shingles8"
    for t in (btable, stable_):
        _rm_table(spark, t)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_band_index(spark, docs, btable)
        write_shingle_store(spark, docs, stable_)
        incoming = docs.where(F.col("doc_id") % 7 == 0).select(
            "doc_id", "text"
        )
        d = tmp_path_factory.mktemp("docs_guard_full_idx")
        staging = str(d / "_stage")
        incoming.coalesce(1).write.parquet(staging)
        shutil.copy(
            _glob.glob(staging + "/part-*.parquet")[0],
            str(d / "batch_0.parquet"),
        )
        shutil.rmtree(staging)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        stream = (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .parquet(str(d))
        )
        guarded = ST.neardup_guard_stream(
            stream,
            corpus_docs=None,
            band_index=spark.table(btable),
            shingle_store=spark.table(stable_),
        )
        name = _qname()
        q = (
            guarded.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        plan = q._jsq.explainInternal(True)
        assert plan.count("Bucketed: true") >= 2
        assert "documents.parquet" not in plan  # no raw-corpus rehash
        got = {
            (r.doc_id, r.corpus_doc_id, r.jaccard)
            for r in spark.table(name).collect()
        }
        expect = {
            (r.doc_id, r.corpus_doc_id, r.jaccard)
            for r in ST.neardup_guard_stream(incoming, docs).collect()
        }
        assert got == expect and got
        # corpus_docs required when either side is missing
        import pytest as _pytest
        with _pytest.raises(ValueError, match="corpus_docs"):
            ST.neardup_guard_stream(
                incoming, band_index=spark.table(btable)
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in (btable, stable_):
            _rm_table(spark, t)


def test_band_index_maintainer_also_maintains_shingle_store(
    spark, sf_dir, tmp_path_factory
):
    """Round 8: the maintainer's shingle_table arg folds each batch's
    (doc_id, hs) rows into the persisted verify store under the SAME
    replay marker as the band append — final stores equal the
    batch-built ones over the full corpus; a replayed batch_id
    duplicates neither table."""
    import glob as _glob

    from flapi_spark.operators.dedup import (
        rowwise_minhash, write_band_index, write_shingle_store,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.where("doc_id % 2 = 0")
    new = docs.where("doc_id % 2 = 1")
    btable, stable_ = "t_band_idx_maint8", "t_shingles_maint8"
    for t in (btable, stable_):
        _rm_table(spark, t)
    d = tmp_path_factory.mktemp("maint8_landing")
    markers = str(tmp_path_factory.mktemp("maint8_markers"))
    try:
        write_band_index(spark, old, btable)
        write_shingle_store(spark, old, stable_)
        staging = str(d / "_stage")
        new.coalesce(1).write.parquet(staging)
        shutil.copy(
            _glob.glob(staging + "/part-*.parquet")[0],
            str(d / "batch_0.parquet"),
        )
        shutil.rmtree(staging)
        stream = (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .parquet(str(d))
        )
        writer = ST.band_index_maintainer(
            btable, markers, shingle_table=stable_
        )
        q = (
            stream.writeStream.foreachBatch(writer)
            .option("checkpointLocation", str(d / "_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {(r.doc_id, tuple(sorted(r.hs)))
               for r in spark.table(stable_).collect()}
        expect = {(r.doc_id, tuple(sorted(r.hs)))
                  for r in rowwise_minhash(docs).select(
                      "doc_id", "hs").collect()}
        assert got == expect and got
        nb, ns = spark.table(btable).count(), spark.table(stable_).count()
        writer(new.limit(50), 0)  # replay: marker makes it a no-op
        assert spark.table(btable).count() == nb
        assert spark.table(stable_).count() == ns
    finally:
        for t in (btable, stable_):
            _rm_table(spark, t)


def test_portable_index_maintainer_feeds_index_resident_pairs(
    spark, sf_dir, tmp_path_factory
):
    """Round 8: the PORTABLE maintainer closes the oracle-checkable
    loop — bootstrap both persisted sides on half the corpus, stream
    the other half through portable_index_maintainer, and the fully
    index-resident pair stream (pairs_from_band_index with
    shingle_store, no raw docs) must equal the self-contained
    dedup_minhash_portable chain over the FULL corpus. Replays
    no-op on both tables."""
    import glob as _glob

    from flapi_spark.operators.dedup import (
        dedup_minhash_portable, pairs_from_band_index,
        write_band_index_portable, write_shingle_store_portable,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.where("doc_id % 2 = 0")
    new = docs.where("doc_id % 2 = 1")
    btable, stable_ = "t_pband_maint8", "t_pshingles_maint8"
    for t in (btable, stable_):
        _rm_table(spark, t)
    d = tmp_path_factory.mktemp("pmaint8_landing")
    markers = str(tmp_path_factory.mktemp("pmaint8_markers"))
    try:
        write_band_index_portable(spark, old, btable)
        write_shingle_store_portable(spark, old, stable_)
        staging = str(d / "_stage")
        new.coalesce(1).write.parquet(staging)
        shutil.copy(
            _glob.glob(staging + "/part-*.parquet")[0],
            str(d / "batch_0.parquet"),
        )
        shutil.rmtree(staging)
        stream = (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .parquet(str(d))
        )
        writer = ST.portable_index_maintainer(btable, stable_, markers)
        q = (
            stream.writeStream.foreachBatch(writer)
            .option("checkpointLocation", str(d / "_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got_df = pairs_from_band_index(
            spark, None, btable, shingle_store=stable_
        )
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        assert "documents.parquet" not in plan
        got = {(r.doc_a, r.doc_b, round(r.jaccard, 9))
               for r in got_df.collect()}
        expect = {(r.doc_a, r.doc_b, round(r.jaccard, 9))
                  for r in dedup_minhash_portable(spark, sf_dir).collect()}
        assert got == expect and got
        nb, ns = spark.table(btable).count(), spark.table(stable_).count()
        writer(new.limit(50), 0)  # replayed batch id — no-op
        assert spark.table(btable).count() == nb
        assert spark.table(stable_).count() == ns
    finally:
        for t in (btable, stable_):
            _rm_table(spark, t)


def test_band_index_maintainer_stream_appends_and_dedups_replays(
    spark, sf_dir, tmp_path_factory
):
    """Round 7: streaming index maintenance — bootstrap the bucketed
    band index on half the corpus, stream the other half through the
    foreachBatch maintainer, and the final index must equal the
    batch-built index over the FULL corpus (row set and bucket spec).
    A replayed batch_id is a no-op (idempotent marker)."""
    import glob as _glob

    from flapi_spark.operators.dedup import band_rows_for, write_band_index
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.where("doc_id % 2 = 0")
    new = docs.where("doc_id % 2 = 1")
    table = "t_band_index_stream"
    _rm_table(spark, table)
    d = tmp_path_factory.mktemp("band_index_landing")
    markers = str(tmp_path_factory.mktemp("band_index_markers"))
    try:
        write_band_index(spark, old, table)
        halves = new.randomSplit([0.5, 0.5], seed=5)
        for i, part in enumerate(halves):
            staging = str(d / f"_stage_{i}")
            part.coalesce(1).write.parquet(staging)
            shutil.copy(
                _glob.glob(staging + "/part-*.parquet")[0],
                str(d / f"batch_{i}.parquet"),
            )
            shutil.rmtree(staging)
        stream = (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        )
        writer = ST.band_index_maintainer(table, markers)
        q = (
            stream.writeStream.foreachBatch(writer)
            .option("checkpointLocation", str(d / "_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {(r.doc_id, r.band_id, r.bh)
               for r in spark.table(table).collect()}
        expect = {(r.doc_id, r.band_id, r.bh)
                  for r in band_rows_for(docs).collect()}
        assert got == expect and got
        # replaying a committed batch id must not duplicate rows
        n_before = spark.table(table).count()
        writer(new.limit(50), 0)
        assert spark.table(table).count() == n_before
        # bucket spec survives the appends
        desc = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
        txt = "\n".join(str(r) for r in desc)
        assert "band_id" in txt and "bh" in txt
    finally:
        _rm_table(spark, table)


def test_neardup_guard_plan_has_no_stream_stream_join(spark, sf_dir):
    """The guard must stay stateless: its streaming plan may contain
    stream-static joins only — a stream-stream self-join would retain
    every incoming signature in join state forever."""
    from pyspark.sql import functions as F

    from flapi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    stream = (
        spark.readStream.format("rate").load()
        .select(
            F.col("value").alias("doc_id"),
            F.concat(F.lit("sample text number "),
                     F.col("value").cast("string")).alias("text"),
        )
    )
    guarded = ST.neardup_guard_stream(stream, docs)
    plan = guarded._jdf.queryExecution().analyzed().toString()
    # exactly one side of every join is streaming: no binary node with
    # two streaming children -> Spark would mark the query as
    # requiring state via StreamingSymmetricHashJoin at runtime;
    # analyzed-plan check: the streaming leaf appears ONCE
    assert plan.count("StreamingRelation") == 1


def test_vocab_drift_stream_equals_batch(spark, sf_dir, tmp_path_factory):
    """Vocabulary-drift monitor: availableNow over a 2-file landing
    equals the batch twin window-for-window; a window of all-known
    tokens scores 0 OOV and an injected alien batch scores > 0."""
    import glob as _glob

    from pyspark.sql import functions as F

    from flapi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    # reference vocab: every token of doc_id % 2 == 0 docs
    vocab = (
        docs.where("doc_id % 2 = 0")
        .select(F.explode(F.split(F.lower(F.trim(
            F.regexp_replace("text", "\\s+", " "))), " ")).alias("tok"))
        .where("tok != ''")
        .distinct()
    )
    incoming = (
        docs.where("doc_id % 2 = 1")
        .limit(40)
        .select(
            F.to_timestamp(
                F.concat(F.lit("2026-01-01 00:"),
                         F.lpad((F.col("doc_id") % 50).cast("string"), 2,
                                "0"),
                         F.lit(":00"))
            ).alias("ts"),
            "text",
        )
        .unionByName(spark.createDataFrame(
            [("2026-01-01 02:00:00", "zzalien yyalien xxalien")],
            "ts string, text string",
        ).select(F.to_timestamp("ts").alias("ts"), "text"))
    )
    d = tmp_path_factory.mktemp("vocab_drift_landing")
    halves = incoming.randomSplit([0.5, 0.5], seed=7)
    for i, part in enumerate(halves):
        staging = str(d / f"_stage_{i}")
        part.coalesce(1).write.parquet(staging)
        src = _glob.glob(staging + "/part-*.parquet")[0]
        shutil.copy(src, str(d / f"batch_{i}.parquet"))
        shutil.rmtree(staging)

    name = _qname()
    stream = (
        spark.readStream.schema("ts TIMESTAMP, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    ST.run_stream_to_memory(
        ST.vocab_drift_stream(stream, vocab), name,
        output_mode="complete",
    )
    got = {
        (r.window_start, r.n_tokens, r.n_oov, r.oov_share)
        for r in spark.table(name).collect()
    }
    expect = {
        (r.window_start, r.n_tokens, r.n_oov, r.oov_share)
        for r in ST.vocab_drift_stream(incoming, vocab).collect()
    }
    assert got == expect and got
    # the alien window is pure OOV
    alien = [r for r in spark.table(name).collect()
             if r.window_start.hour == 2]
    assert alien and alien[0].n_oov == 3 and alien[0].oov_share == 1.0


def test_quality_gate_stream_equals_batch_and_gopher(
    spark, sf_dir, tmp_path_factory
):
    """Quality-gate monitor: availableNow over a 2-file landing equals
    the batch twin window-for-window, and the all-time totals equal
    text_gopher_filters' per-doc gates aggregated (the stream applies
    the batch operators' exact thresholds)."""
    import glob as _glob

    from pyspark.sql import functions as F

    from flapi_spark.operators.text import text_gopher_filters
    from flapi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    incoming = docs.limit(60).select(
        F.to_timestamp(
            F.concat(F.lit("2026-01-01 00:"),
                     F.lpad((F.col("doc_id") % 50).cast("string"), 2, "0"),
                     F.lit(":00"))
        ).alias("ts"),
        "text",
        "doc_id",
    )
    d = tmp_path_factory.mktemp("quality_gate_landing")
    halves = incoming.randomSplit([0.5, 0.5], seed=11)
    for i, part in enumerate(halves):
        staging = str(d / f"_stage_{i}")
        part.select("ts", "text").coalesce(1).write.parquet(staging)
        src = _glob.glob(staging + "/part-*.parquet")[0]
        shutil.copy(src, str(d / f"batch_{i}.parquet"))
        shutil.rmtree(staging)

    name = _qname()
    stream = (
        spark.readStream.schema("ts TIMESTAMP, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    ST.run_stream_to_memory(
        ST.quality_gate_stream(stream), name, output_mode="complete"
    )
    got = {tuple(r) for r in spark.table(name).collect()}
    expect = {
        tuple(r)
        for r in ST.quality_gate_stream(
            incoming.select("ts", "text")
        ).collect()
    }
    assert got == expect and got
    # all-time totals equal the per-doc batch gates aggregated
    gates = text_gopher_filters(spark, sf_dir).join(
        incoming.select("doc_id"), "doc_id", "left_semi"
    )
    tot = gates.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("pass_n_tokens"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("keep"),
    ).collect()[0]
    rows = spark.table(name).collect()
    assert sum(r.n_docs for r in rows) == tot.n
    assert sum(r.pass_n_tokens for r in rows) == tot.c1
    assert sum(r.pass_all for r in rows) == tot.keep


class TestEmbeddingGuard:
    """Round 9: streaming embedding-ingest guard over the persisted
    bucketed IVF index — the embedding-lane mirror of the text
    neardup guard."""

    def _setup_index(self, spark, sf_dir, table):
        from flapi_spark.operators.similarity import write_ivf_index
        from flapi_spark.session import load_table
        from flapi_spark.writes import _rm_table

        emb = load_table(spark, sf_dir, "embeddings")
        _rm_table(spark, table)
        _rm_table(spark, f"{table}__centroids")
        write_ivf_index(spark, emb, table)
        return emb, spark.table(f"{table}__centroids").collect()

    def _teardown(self, spark, table):
        from flapi_spark.writes import _rm_table

        _rm_table(spark, table)
        _rm_table(spark, f"{table}__centroids")

    def test_rowwise_assign_equals_windowed(self, spark, sf_dir):
        """rowwise_ivf_assign (stateless, stream-legal) must pick the
        SAME cells as ivf_assign (window-ranked) bit-for-bit — same
        cosine fold order, same (desc sim, asc cell_id) tie-break."""
        from flapi_spark.operators.similarity import (
            ivf_assign, ivf_centroids, rowwise_ivf_assign,
        )
        from flapi_spark.session import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        cent = ivf_centroids(emb)
        rows = cent.collect()
        for nprobe in (1, 3):
            a = {(r.vec_id, r.cell_id)
                 for r in ivf_assign(emb, cent, nprobe).collect()}
            b = {(r.vec_id, r.cell_id)
                 for r in rowwise_ivf_assign(emb, rows, nprobe).collect()}
            assert a == b and len(a) == emb.count() * nprobe

    def test_stream_equals_batch_and_plan_is_index_resident(
        self, spark, sf_dir, tmp_path_factory
    ):
        """availableNow run over a landed vector batch == the batch
        twin pair-for-pair; the micro-batch plan reads the index as a
        bucketed scan (zero index-side exchange) and never touches
        the corpus embedding parquet."""
        import glob as _glob

        table = "t_eguard_ivf"
        emb, cent = self._setup_index(spark, sf_dir, table)
        d = tmp_path_factory.mktemp("eguard_landing")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            incoming = emb.where(F.col("vec_id") % 7 == 0)
            staging = str(d / "_stage")
            incoming.coalesce(1).write.parquet(staging)
            shutil.copy(
                _glob.glob(staging + "/part-*.parquet")[0],
                str(d / "batch_0.parquet"),
            )
            shutil.rmtree(staging)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            stream = spark.readStream.schema(
                "vec_id BIGINT, embedding ARRAY<FLOAT>"
            ).parquet(str(d))
            guarded = ST.embedding_guard_stream(
                stream, spark.table(table), cent
            )
            name = _qname()
            q = (
                guarded.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            plan = q._jsq.explainInternal(True)
            assert "Bucketed: true" in plan
            assert "embeddings.parquet" not in plan
            got = {
                (r.vec_id, r.corpus_vec_id, r.cell_id, r.cosine)
                for r in spark.table(name).collect()
            }
            expect = {
                (r.vec_id, r.corpus_vec_id, r.cell_id, r.cosine)
                for r in ST.embedding_guard_batch(
                    incoming, spark.table(table), cent
                ).collect()
            }
            assert got == expect and got
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            self._teardown(spark, table)

    def test_guard_matches_bruteforce_within_probed_cells(
        self, spark, sf_dir
    ):
        """IVF recall semantics, anchored to an INDEPENDENT path:
        guard pairs == brute-force cosine-threshold pairs restricted
        to (query, corpus) vectors sharing a probed cell, where the
        restriction is computed with the WINDOWED ivf_assign."""
        from flapi_spark.operators.dedup import cosine_col
        from flapi_spark.operators.similarity import ivf_assign
        from flapi_spark.session import load_table

        table = "t_eguard_recall"
        emb, cent = self._setup_index(spark, sf_dir, table)
        try:
            incoming = emb.where(F.col("vec_id") % 7 == 0)
            got = {
                (r.vec_id, r.corpus_vec_id)
                for r in ST.embedding_guard_batch(
                    incoming, spark.table(table), cent, nprobe=3
                ).collect()
            }
            cent_df = spark.createDataFrame(cent)
            qcells = ivf_assign(incoming, cent_df, nprobe=3)
            ccells = ivf_assign(emb, cent_df, nprobe=1)
            q = incoming.join(qcells, "vec_id").select(
                F.col("vec_id").alias("qid"),
                F.col("embedding").alias("eq"), "cell_id",
            )
            c = emb.join(ccells, "vec_id").select(
                F.col("vec_id").alias("cid"),
                F.col("embedding").alias("ec"), "cell_id",
            )
            expect = {
                (r.qid, r.cid)
                for r in q.join(c, "cell_id")
                .where(F.col("qid") != F.col("cid"))
                .select(
                    "qid", "cid",
                    F.round(cosine_col("eq", "ec"), 6).alias("cos"),
                )
                .where(F.col("cos") >= 0.4)
                .collect()
            }
            assert got == expect and got
        finally:
            self._teardown(spark, table)

    def test_ivf_index_maintainer_folds_batches(
        self, spark, sf_dir, tmp_path_factory
    ):
        """Bootstrap the index on half the vectors, stream the other
        half through the maintainer: final index row set == batch
        build over the full set (modulo cell assignment against the
        SAME frozen centroids), replays are no-ops, and a fresh guard
        sees stream-vs-earlier-stream pairs."""
        import glob as _glob

        from flapi_spark.operators.similarity import write_ivf_index
        from flapi_spark.session import load_table
        from flapi_spark.writes import _rm_table

        table = "t_eguard_maint"
        emb = load_table(spark, sf_dir, "embeddings")
        old = emb.where("vec_id % 2 = 0")
        new = emb.where("vec_id % 2 = 1")
        _rm_table(spark, table)
        _rm_table(spark, f"{table}__centroids")
        d = tmp_path_factory.mktemp("eguard_maint_landing")
        markers = str(tmp_path_factory.mktemp("eguard_maint_markers"))
        try:
            write_ivf_index(spark, old, table)
            halves = new.randomSplit([0.5, 0.5], seed=9)
            for i, part in enumerate(halves):
                staging = str(d / f"_stage_{i}")
                part.coalesce(1).write.parquet(staging)
                shutil.copy(
                    _glob.glob(staging + "/part-*.parquet")[0],
                    str(d / f"batch_{i}.parquet"),
                )
                shutil.rmtree(staging)
            stream = (
                spark.readStream.schema(
                    "vec_id BIGINT, embedding ARRAY<FLOAT>"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(str(d))
            )
            writer = ST.ivf_index_maintainer(table, markers)
            q = (
                stream.writeStream.foreachBatch(writer)
                .option("checkpointLocation", str(d / "_ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            assert spark.table(table).count() == emb.count()
            # every vector filed under its frozen-centroid cell
            from flapi_spark.operators.similarity import rowwise_ivf_assign

            cent = spark.table(f"{table}__centroids").collect()
            expect = {
                (r.cell_id, r.vec_id)
                for r in rowwise_ivf_assign(emb, cent, 1).collect()
            }
            got = {
                (r.cell_id, r.vec_id) for r in spark.table(table).collect()
            }
            assert got == expect
            # replay is a no-op
            n = spark.table(table).count()
            writer(new.limit(20), 0)
            assert spark.table(table).count() == n
            # a fresh guard over already-folded vectors finds their
            # own index rows' neighbors (self excluded)
            probe = new.limit(5)
            pairs = ST.embedding_guard_batch(
                probe, spark.table(table), cent, threshold=0.2
            ).collect()
            assert all(r.vec_id != r.corpus_vec_id for r in pairs)
        finally:
            _rm_table(spark, table)
            _rm_table(spark, f"{table}__centroids")

    def test_guard_plan_has_no_stream_stream_join(
        self, spark, sf_dir, tmp_path_factory
    ):
        table = "t_eguard_plan"
        emb, cent = self._setup_index(spark, sf_dir, table)
        d = tmp_path_factory.mktemp("eguard_plan_landing")
        emb.limit(1).write.mode("overwrite").parquet(str(d / "seed"))
        try:
            stream = spark.readStream.schema(
                "vec_id BIGINT, embedding ARRAY<FLOAT>"
            ).parquet(str(d / "seed"))
            guarded = ST.embedding_guard_stream(
                stream, spark.table(table), cent
            )
            plan = guarded._jdf.queryExecution().logical().toString()
            assert "Join" in plan  # stream-static candidate join
            assert guarded.isStreaming
        finally:
            self._teardown(spark, table)


class TestImageGuard:
    """Round 9: streaming image-ingest guard over the persisted
    fingerprint index — the image member of the guard triple."""

    def _setup_index(self, spark, sf_dir, table):
        from flapi_spark import multimodal as M
        from flapi_spark.writes import _rm_table

        _rm_table(spark, table)
        corpus = M.synthesize_image_corpus(spark, sf_dir)
        fps = M.image_hash_batch(corpus).select(
            "doc_id",
            F.col("dhash_hi").alias("hi"),
            F.col("dhash_lo").alias("lo"),
        )
        M.write_phash_index(spark, fps, table)
        return corpus

    def test_stream_equals_batch_and_index_resident(
        self, spark, sf_dir, tmp_path_factory
    ):
        import glob as _glob

        from flapi_spark import multimodal as M
        from flapi_spark.writes import _rm_table

        table = "t_img_guard_idx"
        corpus = self._setup_index(spark, sf_dir, table)
        d = tmp_path_factory.mktemp("img_guard_landing")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # incoming = the noise variants (m==3) re-presented as a
            # crawl batch: each should match its own cluster
            incoming = corpus.where(F.col("doc_id") % M.IMG_GROUP == 3)
            staging = str(d / "_stage")
            incoming.coalesce(1).write.parquet(staging)
            shutil.copy(
                _glob.glob(staging + "/part-*.parquet")[0],
                str(d / "batch_0.parquet"),
            )
            shutil.rmtree(staging)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            stream = spark.readStream.schema(
                "doc_id BIGINT, media_type STRING, payload BINARY,"
                " n_bytes BIGINT"
            ).parquet(str(d))
            guarded = M.image_guard_stream(stream, spark.table(table))
            name = _qname()
            q = (
                guarded.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            plan = q._jsq.explainInternal(True)
            assert "Bucketed: true" in plan
            assert "documents.parquet" not in plan
            got = {
                (r.doc_id, r.corpus_doc_id, r.hamming)
                for r in spark.table(name).collect()
            }
            expect = {
                (r.doc_id, r.corpus_doc_id, r.hamming)
                for r in M.image_guard_stream(
                    incoming, spark.table(table)
                ).collect()
            }
            assert got == expect and got
            # precision: every flagged corpus doc is in the incoming
            # doc's own cluster (cross-cluster hamming >= 18)
            for doc_id, corpus_doc_id, hamming in got:
                assert doc_id // M.IMG_GROUP == corpus_doc_id // M.IMG_GROUP
                assert hamming <= 10
            # recall: every incoming doc matched its cluster leader
            flagged = {doc_id for doc_id, _, _ in got}
            assert flagged == {
                r.doc_id for r in incoming.select("doc_id").collect()
            }
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            _rm_table(spark, table)

    def test_maintainer_folds_batches_and_guard_sees_them(
        self, spark, sf_dir, tmp_path_factory
    ):
        import glob as _glob

        from flapi_spark import multimodal as M
        from flapi_spark.operators.dedup import hamming_band_rows
        from flapi_spark.writes import _rm_table

        table = "t_img_guard_maint"
        _rm_table(spark, table)
        d = tmp_path_factory.mktemp("img_maint_landing")
        markers = str(tmp_path_factory.mktemp("img_maint_markers"))
        try:
            corpus = M.synthesize_image_corpus(spark, sf_dir)
            old = corpus.where("doc_id % 2 = 0")
            new = corpus.where("doc_id % 2 = 1")
            fps_old = M.image_hash_batch(old).select(
                "doc_id",
                F.col("dhash_hi").alias("hi"),
                F.col("dhash_lo").alias("lo"),
            )
            M.write_phash_index(spark, fps_old, table)
            halves = new.randomSplit([0.5, 0.5], seed=3)
            for i, part in enumerate(halves):
                staging = str(d / f"_stage_{i}")
                part.coalesce(1).write.parquet(staging)
                shutil.copy(
                    _glob.glob(staging + "/part-*.parquet")[0],
                    str(d / f"batch_{i}.parquet"),
                )
                shutil.rmtree(staging)
            stream = (
                spark.readStream.schema(
                    "doc_id BIGINT, media_type STRING, payload BINARY,"
                    " n_bytes BIGINT"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(str(d))
            )
            writer = M.phash_index_maintainer(table, markers)
            q = (
                stream.writeStream.foreachBatch(writer)
                .option("checkpointLocation", str(d / "_ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            # final index == batch build over the full corpus
            fps_all = M.image_hash_batch(corpus).select(
                "doc_id",
                F.col("dhash_hi").alias("hi"),
                F.col("dhash_lo").alias("lo"),
            )
            expect = {
                tuple(r)
                for r in hamming_band_rows(fps_all, M.PHASH_BANDS).collect()
            }
            got = {tuple(r) for r in spark.table(table).collect()}
            assert got == expect and got
            # replay is a no-op
            n = spark.table(table).count()
            writer(new.limit(8), 0)
            assert spark.table(table).count() == n
            # bucket spec survived the appends
            desc = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
            txt = "\n".join(str(r) for r in desc)
            assert "band_id" in txt and "bv" in txt
        finally:
            _rm_table(spark, table)

    def test_audio_guard_stream_equals_batch(
        self, spark, sf_dir, tmp_path_factory
    ):
        """The fingerprint index is modality-generic: the audio guard
        is the image guard with the hash stage swapped — stream ==
        batch twin, clusters recovered."""
        import glob as _glob

        from flapi_spark import multimodal as M
        from flapi_spark.writes import _rm_table

        table = "t_aud_guard_idx"
        _rm_table(spark, table)
        try:
            corpus = M.synthesize_audio_corpus(spark, sf_dir)
            fps = M.audio_hash_batch(corpus).select(
                "doc_id",
                F.col("fp_hi").alias("hi"),
                F.col("fp_lo").alias("lo"),
            )
            M.write_phash_index(spark, fps, table)
            incoming = corpus.where(F.col("doc_id") % M.AUD_GROUP == 3)
            d = tmp_path_factory.mktemp("aud_guard_landing")
            staging = str(d / "_stage")
            incoming.coalesce(1).write.parquet(staging)
            shutil.copy(
                _glob.glob(staging + "/part-*.parquet")[0],
                str(d / "batch_0.parquet"),
            )
            shutil.rmtree(staging)
            stream = spark.readStream.schema(
                "doc_id BIGINT, media_type STRING, payload BINARY,"
                " n_bytes BIGINT"
            ).parquet(str(d))
            guarded = M.audio_guard_stream(stream, spark.table(table))
            name = _qname()
            q = (
                guarded.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            got = {
                (r.doc_id, r.corpus_doc_id, r.hamming)
                for r in spark.table(name).collect()
            }
            expect = {
                (r.doc_id, r.corpus_doc_id, r.hamming)
                for r in M.audio_guard_stream(
                    incoming, spark.table(table)
                ).collect()
            }
            assert got == expect and got
            for doc_id, corpus_doc_id, hamming in got:
                assert doc_id // M.AUD_GROUP == corpus_doc_id // M.AUD_GROUP
                assert hamming <= 10
        finally:
            _rm_table(spark, table)

    def test_video_guard_stream_equals_batch(
        self, spark, sf_dir, tmp_path_factory
    ):
        """Frame-grain guard over composite-keyed fingerprints: the
        noise variants re-presented as a crawl batch match their own
        clusters, stream == batch twin, trimmed corpus members still
        matchable (any-frame semantics)."""
        import glob as _glob

        from flapi_spark import multimodal as M
        from flapi_spark.writes import _rm_table

        table = "t_vid_guard_idx"
        _rm_table(spark, table)
        try:
            corpus = M.synthesize_video_corpus(spark, sf_dir)
            M.write_phash_index(spark, M._video_fps(corpus), table)
            incoming = corpus.where(F.col("doc_id") % M.VID_GROUP == 3)
            d = tmp_path_factory.mktemp("vid_guard_landing")
            staging = str(d / "_stage")
            incoming.coalesce(1).write.parquet(staging)
            shutil.copy(
                _glob.glob(staging + "/part-*.parquet")[0],
                str(d / "batch_0.parquet"),
            )
            shutil.rmtree(staging)
            stream = spark.readStream.schema(
                "doc_id BIGINT, media_type STRING, payload BINARY,"
                " n_bytes BIGINT"
            ).parquet(str(d))
            guarded = M.video_guard_stream(stream, spark.table(table))
            name = _qname()
            q = (
                guarded.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            got = {
                (r.doc_id, r.frame_no, r.corpus_doc_id,
                 r.corpus_frame_no, r.hamming)
                for r in spark.table(name).collect()
            }
            expect = {
                (r.doc_id, r.frame_no, r.corpus_doc_id,
                 r.corpus_frame_no, r.hamming)
                for r in M.video_guard_stream(
                    incoming, spark.table(table)
                ).collect()
            }
            assert got == expect and got
            flagged = set()
            for doc_id, _f, corpus_doc_id, _cf, hamming in got:
                assert doc_id // M.VID_GROUP == corpus_doc_id // M.VID_GROUP
                assert hamming <= 10
                flagged.add(doc_id)
            # every incoming clip matched something in its cluster
            assert flagged == {
                r.doc_id for r in incoming.select("doc_id").collect()
            }
            # the TRIMMED corpus member (m==2) is still matchable
            assert any(
                c % M.VID_GROUP == 2 for _d, _f, c, _cf, _h in got
            )
        finally:
            _rm_table(spark, table)


def test_crawl_gate_stream_equals_batch_and_operators(
    spark, sf_dir, tmp_path_factory
):
    """Round 10: the crawl-gate monitor over an availableNow 2-file
    landing equals its batch twin window-for-window, and the all-time
    totals equal the batch operators (text_url_filter keep count;
    url-AND-density keep from text_url_filter x text_html_extract)."""
    import glob as _glob

    from pyspark.sql import functions as F

    from flapi_spark.operators.text import (
        text_html_extract, text_url_filter,
    )
    from flapi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    incoming = docs.limit(80).select(
        F.to_timestamp(
            F.concat(F.lit("2026-01-01 00:"),
                     F.lpad((F.col("doc_id") % 50).cast("string"), 2, "0"),
                     F.lit(":00"))
        ).alias("ts"),
        "doc_id",
        "text",
    )
    d = tmp_path_factory.mktemp("crawl_gate_landing")
    halves = incoming.randomSplit([0.5, 0.5], seed=7)
    for i, part in enumerate(halves):
        staging = str(d / f"_stage_{i}")
        part.coalesce(1).write.parquet(staging)
        src = _glob.glob(staging + "/part-*.parquet")[0]
        shutil.copy(src, str(d / f"batch_{i}.parquet"))
        shutil.rmtree(staging)

    name = _qname()
    stream = (
        spark.readStream.schema("ts TIMESTAMP, doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    ST.run_stream_to_memory(
        ST.crawl_gate_stream(stream), name, output_mode="complete"
    )
    got = {tuple(r) for r in spark.table(name).collect()}
    expect = {
        tuple(r) for r in ST.crawl_gate_stream(incoming).collect()
    }
    assert got == expect and got
    # all-time totals == the batch operators joined on the sample
    ids = incoming.select("doc_id")
    url_keep = text_url_filter(spark, sf_dir).where("keep").join(
        ids, "doc_id", "left_semi"
    )
    both_keep = url_keep.join(
        text_html_extract(spark, sf_dir).where("keep").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    rows = spark.table(name).collect()
    assert sum(r.n_docs for r in rows) == 80
    assert sum(r.pass_url for r in rows) == url_keep.count()
    assert sum(r.pass_all for r in rows) == both_keep.count()
    # the sample is chosen to exercise both gates
    assert sum(r.pass_url for r in rows) < 80
    assert sum(r.pass_all for r in rows) < sum(r.pass_url for r in rows)


def test_crawl_gate_stream_with_model_gate(spark, sf_dir, tmp_path_factory):
    """round 10b: the three-gate crawl monitor (url -> density ->
    deployed classifier) — stream equals batch window-for-window,
    pass_model <= pass_all <= pass_url, and pass_model equals the
    batch guard composed with the two crawl gates."""
    import glob as _glob

    from pyspark.sql import functions as F

    from flapi_spark.operators.classifier import (
        classifier_guard_batch, load_classifier_model,
        write_classifier_stats,
    )
    from flapi_spark.operators.text import (
        text_html_extract, text_url_filter,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    table = "t_cls_stats_crawl"
    try:
        write_classifier_stats(spark, sf_dir, table)
        model = load_classifier_model(spark, table)
        docs = load_table(spark, sf_dir, "documents")
        incoming = docs.limit(80).select(
            F.to_timestamp(
                F.concat(
                    F.lit("2026-01-01 00:"),
                    F.lpad((F.col("doc_id") % 50).cast("string"), 2, "0"),
                    F.lit(":00"),
                )
            ).alias("ts"),
            "doc_id",
            "text",
        )
        d = tmp_path_factory.mktemp("crawl_model_landing")
        halves = incoming.randomSplit([0.5, 0.5], seed=7)
        for i, part in enumerate(halves):
            staging = str(d / f"_stage_{i}")
            part.coalesce(1).write.parquet(staging)
            src = _glob.glob(staging + "/part-*.parquet")[0]
            shutil.copy(src, str(d / f"batch_{i}.parquet"))
            shutil.rmtree(staging)
        name = _qname()
        stream = (
            spark.readStream.schema("ts TIMESTAMP, doc_id LONG, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        )
        ST.run_stream_to_memory(
            ST.crawl_gate_stream(stream, model=model), name,
            output_mode="complete",
        )
        got = {tuple(r) for r in spark.table(name).collect()}
        expect = {
            tuple(r)
            for r in ST.crawl_gate_stream(incoming, model=model).collect()
        }
        assert got == expect and got
        rows = spark.table(name).collect()
        p_url = sum(r.pass_url for r in rows)
        p_all = sum(r.pass_all for r in rows)
        p_model = sum(r.pass_model for r in rows)
        assert p_model <= p_all <= p_url <= 80
        # all-time pass_model == batch operators composed
        ids = incoming.select("doc_id")
        both = (
            text_url_filter(spark, sf_dir).where("keep")
            .join(ids, "doc_id", "left_semi")
            .join(
                text_html_extract(spark, sf_dir).where("keep")
                .select("doc_id"),
                "doc_id", "left_semi",
            )
        )
        model_keep = classifier_guard_batch(docs, model).where("keep")
        want = both.join(
            model_keep.select("doc_id"), "doc_id", "left_semi"
        ).count()
        assert p_model == want
    finally:
        _rm_table(spark, table)
        _rm_table(spark, f"{table}__model")


def test_postings_maintainer_folds_batches_and_probe_matches(
    spark, sf_dir, tmp_path_factory
):
    """round 10c: bootstrap the postings index on half the corpus,
    stream the other half through postings_index_maintainer — the
    probe over the maintained index equals the probe over a batch
    rebuild of the FULL corpus; a replayed batch id is a no-op on
    postings AND the stats sidecar."""
    import glob as _glob

    from flapi_spark.operators.relational import (
        bm25_probe_indexed, write_postings_index,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    table, full = "t_postings_stream", "t_postings_stream_full"
    tables = [t + s for t in (table, full) for s in ("", "__stats")]
    for t in tables:
        _rm_table(spark, t)
    d = tmp_path_factory.mktemp("postings_landing")
    markers = str(tmp_path_factory.mktemp("postings_markers"))
    try:
        write_postings_index(spark, docs.where("doc_id % 2 = 0"), table)
        new = docs.where("doc_id % 2 = 1")
        halves = new.randomSplit([0.5, 0.5], seed=5)
        for i, part in enumerate(halves):
            staging = str(d / f"_stage_{i}")
            part.coalesce(1).write.parquet(staging)
            shutil.copy(
                _glob.glob(staging + "/part-*.parquet")[0],
                str(d / f"batch_{i}.parquet"),
            )
            shutil.rmtree(staging)
        stream = (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        )
        writer = ST.postings_index_maintainer(table, markers)
        q = (
            stream.writeStream.foreachBatch(writer)
            .option("checkpointLocation", str(d / "_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        write_postings_index(spark, docs, full)
        got = [(r.doc_id, r.score, r.n_terms_hit, r.rnk)
               for r in bm25_probe_indexed(spark, table=table).collect()]
        want = [(r.doc_id, r.score, r.n_terms_hit, r.rnk)
                for r in bm25_probe_indexed(spark, table=full).collect()]
        assert sorted(got) == sorted(want) and got
        si = spark.table(f"{table}__stats").collect()[0]
        sf_ = spark.table(f"{full}__stats").collect()[0]
        assert (si.n_docs, si.total_len) == (sf_.n_docs, sf_.total_len)
        # replaying a committed batch id is a no-op on BOTH tables
        n_post = spark.table(table).count()
        writer(new.limit(50), 0)
        assert spark.table(table).count() == n_post
        s2 = spark.table(f"{table}__stats").collect()[0]
        assert (s2.n_docs, s2.total_len) == (si.n_docs, si.total_len)
    finally:
        for t in tables:
            _rm_table(spark, t)


def test_topic_mix_stream_equals_batch(spark, sf_dir, tmp_path_factory):
    """Topic-mix drift monitor (round 10d): availableNow over a 2-file
    landing of timestamped vectors equals the batch twin
    window-for-window; per-window shares sum to 1 and a window drawn
    from a single cell's members shows a positive delta on that
    cell."""
    import glob as _glob

    from pyspark.sql import functions as F

    from flapi_spark.operators.similarity import ivf_centroids
    from flapi_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    centroid_rows = ivf_centroids(emb, mod=50).collect()
    assert len(centroid_rows) >= 2
    ref = ST.topic_ref_shares(emb, centroid_rows)

    # orderBy pins the subset: limit() without an ordering may pick
    # different rows across the three jobs below (round-10d review)
    incoming = emb.orderBy("vec_id").limit(60).select(
        F.to_timestamp(
            F.concat(
                F.lit("2026-01-01 0"),
                (F.col("vec_id") % 2).cast("string"),
                F.lit(":00:00"),
            )
        ).alias("ts"),
        "vec_id",
        "embedding",
    )
    d = tmp_path_factory.mktemp("topic_mix_landing")
    halves = incoming.randomSplit([0.5, 0.5], seed=11)
    for i, part in enumerate(halves):
        staging = str(d / f"_stage_{i}")
        part.coalesce(1).write.parquet(staging)
        src = _glob.glob(staging + "/part-*.parquet")[0]
        shutil.copy(src, str(d / f"batch_{i}.parquet"))
        shutil.rmtree(staging)

    name = _qname()
    stream = (
        spark.readStream.schema(
            "ts TIMESTAMP, vec_id BIGINT, embedding ARRAY<FLOAT>"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    ST.run_stream_to_memory(
        ST.topic_mix_stream(stream, centroid_rows, ref), name,
        output_mode="complete",
    )
    key = lambda r: (
        r.window_start, r.cell_id, r.n_vectors, r.share, r.ref_share,
        r.share_delta,
    )
    got = {key(r) for r in spark.table(name).collect()}
    expect = {
        key(r)
        for r in ST.topic_mix_stream(incoming, centroid_rows, ref)
        .collect()
    }
    assert got == expect and got
    # per window, every cell emits a row and shares sum to ~1
    by_w = {}
    for r in spark.table(name).collect():
        by_w.setdefault(r.window_start, []).append(r)
    for w, rows in by_w.items():
        assert len(rows) == len(centroid_rows)
        assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
        assert all(
            abs(r.share - r.ref_share - r.share_delta) < 1e-5
            for r in rows
        )


def test_dialogue_guard_stream_equals_batch(spark, sf_dir, tmp_path_factory):
    """Round 10e: the stateless SFT ingest guard over an append
    2-file landing equals the rowwise batch verdicts row-for-row,
    the rowwise verdicts are bit-parity with the explode/rollup
    parser, and the guard plan is zero-Exchange."""
    import glob as _glob

    from pyspark.sql import functions as F

    from flapi_spark.operators.sft import (
        _marked_dialogue, dialogue_turns_parse, dialogue_verdicts_rowwise,
    )
    from flapi_spark.session import load_table

    # deterministic sample: an unordered limit() is re-evaluated per
    # action and may pick different rows each time (review fix)
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 90
    )
    transcripts = docs.select(
        "doc_id", _marked_dialogue().alias("transcript")
    )

    # rowwise == explode/rollup parser on the injected corpus (it has
    # no marker-free docs, so the frames align one-to-one)
    rw = {tuple(r) for r in dialogue_verdicts_rowwise(transcripts).collect()}
    batch = {
        tuple(r)
        for r in dialogue_turns_parse(spark, sf_dir)
        .join(docs.select("doc_id"), "doc_id", "left_semi")
        .collect()
    }
    assert rw == batch and rw

    # marker-free rows are FLAGGED, not lost
    empty = spark.createDataFrame(
        [(99, "no markers here")], "doc_id LONG, transcript STRING"
    )
    flagged = dialogue_verdicts_rowwise(empty).collect()
    assert len(flagged) == 1
    assert flagged[0].n_turns == 0 and not flagged[0].well_formed

    # stream == batch over a 2-file availableNow landing
    d = tmp_path_factory.mktemp("dialogue_landing")
    halves = transcripts.randomSplit([0.5, 0.5], seed=7)
    for i, part in enumerate(halves):
        staging = str(d / f"_stage_{i}")
        part.coalesce(1).write.parquet(staging)
        src = _glob.glob(staging + "/part-*.parquet")[0]
        shutil.copy(src, str(d / f"batch_{i}.parquet"))
        shutil.rmtree(staging)
    name = _qname()
    stream = (
        spark.readStream.schema("doc_id LONG, transcript STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    ST.run_stream_to_memory(
        ST.dialogue_guard_stream(stream), name, output_mode="append"
    )
    got = {tuple(r) for r in spark.table(name).collect()}
    assert got == rw

    # stateless: no Exchange anywhere in the guard's batch-twin plan
    plan = (
        dialogue_verdicts_rowwise(transcripts)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
