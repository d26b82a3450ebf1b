"""Structured Streaming pipelines over the events stream.

The reference serves continuously-refreshed caches over changing
sources (schedule-driven sync); the Spark-native generalization is
Structured Streaming: file-source ingest → watermark → windowed /
stateful aggregation → sink. Tested with availableNow micro-batches
whose results must equal the batch twin (events_tumbling_agg).
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

try:  # the state-v2 protocol serializes via protobuf; gate on it
    import google.protobuf  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    HAS_STATE_V2 = True
except ImportError:  # pragma: no cover - environment-dependent
    StatefulProcessor = object
    HAS_STATE_V2 = False
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
    TimestampNTZType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        # TIMESTAMP(NANOS) parquet arrives as TIMESTAMP_NTZ (micro
        # truncation) on Spark >= 4.1.2 — match the batch reader.
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over a directory of events parquet files.
    New files appearing in the directory become micro-batches — the
    standard continuous-ingest pattern at scale (object-store landing
    zone)."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    return raw


def tumbling_agg_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Hourly tumbling-window aggregate with late-data watermark — the
    streaming twin of operators/relational.py:events_tumbling_agg."""
    # ts is TIMESTAMP_NTZ (matching the batch reader) but Spark
    # watermarks require TIMESTAMP — derive an LTZ event-time column
    # (exact under the fixed-offset UTC session) and convert window
    # bounds back to NTZ so outputs equal the batch twin's.
    return (
        events.withColumn("ts_evt", F.col("ts").cast("timestamp"))
        .withWatermark("ts_evt", watermark)
        .groupBy(F.window("ts_evt", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


SESSION_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("session_id", LongType()),
        StructField("n_events", LongType()),
        StructField("session_start_us", LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_id", LongType()),
        StructField("n_events", LongType()),
        StructField("session_start", TimestampNTZType()),
        StructField("session_end", TimestampNTZType()),
    ]
)

GAP_US = 30 * 60 * 1_000_000


def _sessionize_group(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful gap-based sessionization for one user (the custom
    stateful operator the reference has no analogue for — Spark's
    applyInPandasWithState keeps per-key state across micro-batches).

    State carries the OPEN session's start timestamp and running event
    count, so a session spanning micro-batches keeps its true start and
    cumulative total. Each batch emits one row per session active in
    that batch with CUMULATIVE values; a session that spans batches is
    re-emitted with corrected totals, so consumers keep the last row
    per (user_id, session_id) — last-write-wins merge, the same
    convention as the cache manager's upsert.

    With a processing-time timeout configured (sessionize_stream
    use_timeout=True), an idle user's OPEN session is flushed once no
    events arrive for the gap duration and its state is dropped —
    otherwise the final session of a quiet key would sit in state
    forever (state size stays bounded by ACTIVE keys, the requirement
    at scale)."""
    (user_id,) = key
    if state.exists:
        last_ts_us, session_id, n_events, session_start_us = state.get
    else:
        last_ts_us, session_id, n_events, session_start_us = None, 0, 0, None

    if getattr(state, "hasTimedOut", False):
        # idle flush: emit the open session one final time, drop state
        rows = []
        if n_events and session_start_us is not None:
            rows.append(
                {
                    "user_id": user_id,
                    "session_id": session_id,
                    "n_events": n_events,
                    "session_start": pd.Timestamp(session_start_us, unit="us"),
                    "session_end": pd.Timestamp(last_ts_us, unit="us"),
                }
            )
        state.remove()
        yield pd.DataFrame(
            rows, columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields]
        )
        return

    # cumulative (start, end, count) per session touched in this batch,
    # seeded with the open session carried in state
    touched: dict[int, list] = {}
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts in pdf["ts"]:
            ts_us = int(ts.value // 1000)  # pandas Timestamp ns → us
            if last_ts_us is None or ts_us - last_ts_us > GAP_US:
                session_id += 1
                n_events = 0
                session_start_us = ts_us
            n_events += 1
            last_ts_us = ts_us
            touched[session_id] = [session_start_us, ts_us, n_events]

    state.update((last_ts_us, session_id, n_events, session_start_us))
    try:
        # arm the idle flush when a timeout mode is configured; a
        # NoTimeout stream raises here and we keep legacy behavior
        state.setTimeoutDuration(GAP_US // 1000)
    except Exception:
        pass
    rows = []
    for sid in sorted(touched):
        start_us, end_us, count = touched[sid]
        rows.append(
            {
                "user_id": user_id,
                "session_id": sid,
                "n_events": count,
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(end_us, unit="us"),
            }
        )
    yield pd.DataFrame(rows, columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields])


def sessionize_stream(events: DataFrame, use_timeout: bool = False) -> DataFrame:
    """Per-user stateful sessionization over the stream.

    `use_timeout=True` arms a processing-time timeout of one gap: idle
    users' open sessions flush and their state is dropped (bounded
    state). Default off for deterministic availableNow tests — a
    processing-time timeout is wall-clock-dependent."""
    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if use_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drain a stream with availableNow into an in-memory table (test
    and verification harness; production sinks are parquet/Kafka)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon
    (dropDuplicatesWithinWatermark): state for an id is dropped once
    the watermark passes it, so state size is bounded by the horizon —
    the streaming form of dedup_exact for at-least-once sources."""
    return (
        events.withColumn("ts_evt", F.col("ts").cast("timestamp"))
        .withWatermark("ts_evt", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .drop("ts_evt")
    )


def sliding_agg_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """1-hour windows hopping every 30 minutes — streaming twin of
    operators/relational.py:events_hopping_agg."""
    return (
        events.withColumn("ts_evt", F.col("ts").cast("timestamp"))
        .withWatermark("ts_evt", watermark)
        .groupBy(F.window("ts_evt", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def error_purchase_join_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: purchases within 1 hour after an
    error by the same user — streaming twin of
    operators/range_join.py:range_join_error_purchase.

    Both sides carry watermarks and the join range is bounded, so state
    for each side is dropped once the other side's watermark clears the
    interval — bounded state, the requirement for a correct
    stream-stream join at scale."""
    errors = (
        events.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").cast("timestamp").alias("error_ts"),
        )
        .withWatermark("error_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = errors.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("error_ts"))
        & (F.col("purchase_ts") <= F.col("error_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    return joined.select(
        "error_id", "user_id",
        F.col("error_ts").cast("timestamp_ntz").alias("error_ts"),
        "purchase_id",
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        "purchase_value",
    )


FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", LongType()),
        StructField("view_ts_us", LongType()),
        StructField("click_ts_us", LongType()),
        StructField("purchase_ts_us", LongType()),
    ]
)


class FunnelProcessor(StatefulProcessor):
    """Stateful funnel tracker on the Spark 4 state-v2 API
    (`transformWithStateInPandas` + StatefulProcessor): per user,
    advance through view -> click-after-view -> purchase-after-click
    across micro-batches, persisting the stage timestamps in a
    ValueState. Emits the user's cumulative funnel row each batch the
    user appears in (update semantics — consumers keep the last row
    per user), so the stream's final answer equals the batch
    funnel_conversion stages.

    State is one fixed-width tuple per user — bounded by active users,
    the scale requirement; stage timestamps are micros since epoch so
    the state schema stays primitive longs.

    NOTE: the state-v2 python protocol needs google.protobuf, which
    this container lacks — `funnel_stream(api="v2")` is therefore
    availability-gated (HAS_STATE_V2) exactly like the jdbc/iceberg
    sources, and the default funnel_stream runs the identical logic on
    the v1 applyInPandasWithState API, which is fully tested here."""

    def init(self, handle) -> None:
        self.state = handle.getValueState(
            "funnel", "view_ts LONG, click_ts LONG, purchase_ts LONG"
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        cur = self.state.get() if self.state.exists() else None
        view_ts, click_ts, purchase_ts = _advance_funnel(
            cur if cur else (None, None, None), rows
        )
        self.state.update((view_ts, click_ts, purchase_ts))
        stage = (
            3 if purchase_ts is not None
            else 2 if click_ts is not None
            else 1 if view_ts is not None
            else 0
        )
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "stage": stage,
                    "view_ts_us": view_ts,
                    "click_ts_us": click_ts,
                    "purchase_ts_us": purchase_ts,
                }
            ]
        )

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("view_ts_us", LongType()),
        StructField("click_ts_us", LongType()),
        StructField("purchase_ts_us", LongType()),
    ]
)


def _advance_funnel(state_tuple, pdfs):
    """Shared funnel-advance logic for both state APIs: fold this
    batch's (ts, event_type) stream into the (view, click, purchase)
    first-hit timestamps."""
    view_ts, click_ts, purchase_ts = state_tuple
    events = []
    for pdf in pdfs:
        for ts, etype in zip(pdf["ts"], pdf["event_type"]):
            events.append((int(ts.value // 1000), etype))
    events.sort()
    for ts_us, etype in events:
        if etype == "view" and view_ts is None:
            view_ts = ts_us
        elif (
            etype == "click" and click_ts is None
            and view_ts is not None and ts_us > view_ts
        ):
            click_ts = ts_us
        elif (
            etype == "purchase" and purchase_ts is None
            and click_ts is not None and ts_us > click_ts
        ):
            purchase_ts = ts_us
    return view_ts, click_ts, purchase_ts


def _funnel_group_v1(key, pdfs, state: GroupState):
    (user_id,) = key
    cur = state.get if state.exists else (None, None, None)
    view_ts, click_ts, purchase_ts = _advance_funnel(cur, pdfs)
    state.update((view_ts, click_ts, purchase_ts))
    stage = (
        3 if purchase_ts is not None
        else 2 if click_ts is not None
        else 1 if view_ts is not None
        else 0
    )
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "stage": stage,
                "view_ts_us": view_ts,
                "click_ts_us": click_ts,
                "purchase_ts_us": purchase_ts,
            }
        ]
    )


def funnel_stream(events: DataFrame, api: str = "v1") -> DataFrame:
    """Streaming funnel tracking — the streaming twin of
    operators/relational.py:funnel_conversion (its per-user stage
    assignment; the batch op then counts stages). `api="v1"` runs on
    applyInPandasWithState; `api="v2"` runs the same logic as a
    state-v2 StatefulProcessor (requires protobuf, see HAS_STATE_V2)."""
    grouped = events.select("user_id", "ts", "event_type").groupBy("user_id")
    if api == "v1":
        return grouped.applyInPandasWithState(
            _funnel_group_v1,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    if api == "v2":
        if not HAS_STATE_V2:
            raise ImportError(
                "transformWithStateInPandas needs google.protobuf"
            )
        return grouped.transformWithStateInPandas(
            statefulProcessor=FunnelProcessor(),
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    raise ValueError(f"unknown state api: {api!r}")


# --- streaming EWMA (round 3c) --------------------------------------------

EWMA_ALPHA = 0.25

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("bucket_us", LongType()),
        StructField("mean_value", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)

EWMA_STATE_SCHEMA = StructType(
    [
        StructField("last_ewma", DoubleType()),
        StructField("n_buckets", LongType()),
    ]
)


def _ewma_group(key, pdf_iter, state: GroupState):
    """Per-event-type EWMA over hourly bucket means, state carrying the
    running smoothed value across micro-batches."""
    if state.exists:
        last_ewma, n_buckets = state.get
    else:
        last_ewma, n_buckets = None, 0
    frames = [p for p in pdf_iter if len(p)]
    out = []
    if frames:
        pdf = pd.concat(frames)
        pdf = pdf.assign(bucket=pdf["ts"].dt.floor("h"))
        means = (
            pdf.groupby("bucket")["value"].mean().sort_index()
        )
        for bucket, mv in means.items():
            mv = float(mv)
            last_ewma = (
                mv if last_ewma is None
                else EWMA_ALPHA * mv + (1.0 - EWMA_ALPHA) * last_ewma
            )
            n_buckets += 1
            out.append(
                {
                    "event_type": key[0],
                    "bucket_us": int(bucket.value // 1_000),
                    "mean_value": mv,
                    "ewma": last_ewma,
                }
            )
    state.update((last_ewma, n_buckets))
    yield pd.DataFrame(out, columns=[f.name for f in EWMA_OUTPUT_SCHEMA])


def ewma_stream(events: DataFrame) -> DataFrame:
    """Streaming EWMA — the streaming twin of
    operators/relational.py:ewma_daily_revenue's fold, applied per
    event_type over HOURLY bucket means: y_t = 0.25·x_t + 0.75·y_{t-1}
    with y persisting across micro-batches in keyed state (one
    fixed-width tuple per type — bounded state, no timeline buffer).

    Ordering contract (documented, test-enforced): buckets must arrive
    in non-decreasing time order across batches — true for a
    time-ordered landing zone (file streams of append-only logs);
    out-of-order ingest needs the watermarked tumbling agg upstream."""
    grouped = events.select("event_type", "ts", "value").groupBy("event_type")
    return grouped.applyInPandasWithState(
        _ewma_group,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming counter rate (twin of relational.counter_rate_events) ----

COUNTER_MOD = 100000

COUNTER_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("bucket_us", LongType()),
        StructField("total_increase", LongType()),
        StructField("n_samples", LongType()),
        StructField("n_resets", LongType()),
    ]
)

COUNTER_STATE_SCHEMA = StructType(
    [
        StructField("cum", LongType()),
        StructField("n_seen", LongType()),
    ]
)


def _counter_group(key, pdf_iter, state: GroupState):
    """Per-user counter tracking across micro-batches: the running sum
    (whose mod-M wrap IS the counter) persists in one fixed-width
    tuple; each batch emits this user's per-(type, hour) increase
    partials. Downstream summation per (type, hour) reassembles the
    batch-exact totals — partial emission keeps output rows bounded by
    this user's bucket count, not corpus history."""
    import math

    if state.exists:
        cum, n_seen = state.get
    else:
        cum, n_seen = 0, 0
    frames = [p for p in pdf_iter if len(p)]
    out: dict = {}
    if frames:
        pdf = pd.concat(frames).sort_values(["ts", "event_id"])
        prev = (cum % COUNTER_MOD) if n_seen > 0 else None
        for ts, etype, value in zip(pdf["ts"], pdf["event_type"], pdf["value"]):
            v = int(math.floor(value * 100))
            cum += v
            counter = cum % COUNTER_MOD
            if prev is None:
                inc, reset = 0, 0
            elif counter >= prev:
                inc, reset = counter - prev, 0
            else:
                inc, reset = counter, 1
            prev = counter
            n_seen += 1
            bucket_us = int(ts.floor("h").value // 1_000)
            k = (etype, bucket_us)
            tot = out.get(k, (0, 0, 0))
            out[k] = (tot[0] + inc, tot[1] + 1, tot[2] + reset)
    state.update((cum, n_seen))
    yield pd.DataFrame(
        [
            {
                "event_type": et,
                "bucket_us": b,
                "total_increase": t[0],
                "n_samples": t[1],
                "n_resets": t[2],
            }
            for (et, b), t in out.items()
        ],
        columns=[f.name for f in COUNTER_OUTPUT_SCHEMA],
    )


def counter_rate_stream(events: DataFrame) -> DataFrame:
    """Streaming PromQL-style counter increase() — the streaming twin
    of operators/relational.py:counter_rate_events. Per-user counter
    state (one running-sum tuple) survives micro-batches, so resets
    spanning a batch boundary are detected exactly; emitted rows are
    per-user partials a downstream per-(type, hour) sum reassembles.

    Ordering contract (as ewma_stream): each user's events arrive in
    non-decreasing time order across batches — true for time-ordered
    append-only landing zones; out-of-order ingest needs a watermarked
    sort upstream."""
    grouped = events.select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).groupBy("user_id")
    return grouped.applyInPandasWithState(
        _counter_group,
        outputStructType=COUNTER_OUTPUT_SCHEMA,
        stateStructType=COUNTER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def enrich_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join — the standard streaming pattern
    still missing from this suite: each micro-batch joins the static
    dimension (broadcast by Catalyst: stateless, no streaming state at
    all). Keyed user_id -> c_custkey; projecting the segment onto the
    event stream.

    Slowly-changing-dim freshness (round-8 correction, see
    neardup_guard_stream): a V1 file-source static side snapshots its
    FILE LISTING when the plan is analyzed — per-micro-batch
    re-execution re-reads the same files, it does not discover new
    ones. Dim updates are picked up by restarting the query with a
    freshly-resolved dim DataFrame (the availableNow periodic
    pattern), or by backing the dim with a format whose snapshot is
    resolved per batch.

    At 100 TB the dim side must stay broadcast-sized (or become a
    stream-stream join with watermarks, already covered by
    error_purchase_join_stream)."""
    d = F.broadcast(
        dim.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    return events.select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).join(d, "user_id", "left")


def session_window_agg_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """NATIVE session_window streaming aggregation — Spark's built-in
    merging session windows under a watermark (the engine-managed twin
    of the applyInPandasWithState sessionization above: state
    lifecycle, merges of out-of-order fragments and eviction are all
    Catalyst's problem, which is exactly why the native form is the
    default at scale; the custom-state form remains the hook for
    session logic session_window can't express).

    Batch equivalence: the same expression over a batch frame equals
    events_session_window_agg's gap semantics (tests run both)."""
    return (
        events.withColumn("ts_evt", F.col("ts").cast("timestamp"))
        .withWatermark("ts_evt", watermark)
        .groupBy(
            F.session_window("ts_evt", gap).alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def neardup_guard_stream(
    docs_stream: DataFrame,
    corpus_docs: DataFrame | None = None,
    threshold: float = 0.5,
    band_index: DataFrame | None = None,
    shingle_store: DataFrame | None = None,
) -> DataFrame:
    """Ingestion-time near-dup guard: a stream of incoming documents
    checked against a STATIC reference corpus by MinHash-LSH — the
    "is this new crawl page already in my training set?" contamination
    gate, run before data lands.

    Every stage is stateless (append-mode safe, zero streaming
    state): per-row signatures (dedup.rowwise_minhash — no groupBy),
    band explode (generator), stream-static equi-join on the band
    bucket, then the exact-Jaccard verify as another stream-static
    join against the corpus shingle sets with a per-row
    array_intersect. A corpus refresh is picked up at query
    (re)start from a freshly-resolved static DataFrame — see the
    freshness paragraph below.

    Emission is AT-LEAST-ONCE per (incoming, corpus) pair — a pair
    matching in k bands emits k rows (band_id included as evidence);
    dedup happens at the sink (idempotent_batch_writer / pk-merge
    cache), because a streaming distinct would turn the stateless
    guard stateful. The batch twin (same helpers, batch input +
    distinct) is the equality anchor in tests.

    At 100 TB the corpus band table is the PERSISTED bucketed index:
    pass `band_index=spark.table(t)` where `t` was built by
    dedup.write_band_index (same xxhash64 band arithmetic as the
    inline path — band_rows_for == band_rows∘rowwise_minhash). The
    candidate join then reads the index as a bucketed scan with ZERO
    index-side exchange. Static-side FRESHNESS (round-8 correction,
    found by scripts/continuous_dedup_demo.py's equality anchor): a
    V1 file-source static side snapshots its FILE LISTING when the
    DataFrame is analyzed — appends by band_index_maintainer are NOT
    picked up by a long-running query or a restarted plan built from
    a stale DataFrame. To consume maintenance, rebuild the guard from
    a fresh spark.table() per availableNow run (the maintainer
    refreshTable's after each append so the fresh lookup re-lists) —
    the periodic-incremental pattern the demo script measures.
    Without band_index the corpus bands are recomputed from
    `corpus_docs` inside every micro-batch's static-side plan.

    `shingle_store` (round 8) is the verify-side analogue: the
    persisted (doc_id, hs) table from dedup.write_shingle_store.
    Without it the exact-Jaccard arm re-hashes the WHOLE corpus from
    raw text inside every micro-batch (re-resolved static side); with
    it the verify join reads a bucketed scan, so per-batch work is
    delta-proportional — the 100 TB steady-state ingest shape. With
    BOTH indexes supplied `corpus_docs` is unused and may be None."""
    from flapi_spark.operators.dedup import band_rows, rowwise_minhash

    if band_index is None or shingle_store is None:
        if corpus_docs is None:
            raise ValueError(
                "neardup_guard_stream: corpus_docs is required unless "
                "both band_index and shingle_store are supplied"
            )
        corpus_sigs = rowwise_minhash(corpus_docs)
    if band_index is not None:
        corpus_bands = band_index.select(
            F.col("doc_id").alias("corpus_doc_id"), "band_id", "bh"
        )
    else:
        corpus_bands = band_rows(corpus_sigs).select(
            F.col("doc_id").alias("corpus_doc_id"), "band_id", "bh"
        )
    if shingle_store is not None:
        corpus_sets = shingle_store.select(
            F.col("doc_id").alias("corpus_doc_id"),
            F.col("hs").alias("corpus_hs"),
        )
    else:
        corpus_sets = corpus_sigs.select(
            F.col("doc_id").alias("corpus_doc_id"),
            F.col("hs").alias("corpus_hs"),
        )
    s = rowwise_minhash(docs_stream)
    # hs rides THROUGH the band explode (band_rows keep=) — joining
    # the candidates back to the signature stream would be a
    # stream-stream self-join, i.e. unbounded join state; carried
    # columns keep both joins stream-static and the query stateless
    cands = (
        band_rows(s, keep=("hs",))
        .join(corpus_bands, ["band_id", "bh"])
        .select("doc_id", "hs", "corpus_doc_id", "band_id")
    )
    enriched = cands.join(corpus_sets, "corpus_doc_id")
    inter = F.size(F.array_intersect("hs", "corpus_hs")).cast("double")
    union = (
        F.size("hs") + F.size("corpus_hs")
        - F.size(F.array_intersect("hs", "corpus_hs"))
    )
    return enriched.select(
        "doc_id",
        "corpus_doc_id",
        "band_id",
        F.round(inter / union, 6).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


def embedding_guard_stream(
    vec_stream: DataFrame,
    index: DataFrame,
    centroid_rows: list,
    threshold: float = 0.4,
    nprobe: int = 3,
) -> DataFrame:
    """Ingestion-time near-dup guard for the EMBEDDING lane (round 9,
    the mirror of neardup_guard_stream for text): a stream of incoming
    vectors is checked against the persisted bucketed IVF index —
    "is this new embedding already (near-)present in my corpus?" —
    before it lands.

    Every stage is stateless (append-mode safe, zero streaming
    state): per-row cell assignment against the FROZEN bootstrap
    centroids (similarity.rowwise_ivf_assign — the centroid set is a
    driver-side literal, same bounded-summary contract as the
    broadcast in ivf_assign; never re-derive centroids from a grown
    corpus), then a stream-static equi-join on cell_id against the
    bucketed index (similarity.write_ivf_index) — the index side
    reads as a bucketed scan with ZERO exchange — then the exact
    per-candidate cosine verify. Work per micro-batch is
    O(delta x cell-cohabitants), independent of corpus size; the
    corpus embedding parquet is absent from the per-batch plan
    entirely (plan-asserted in tests).

    Recall follows IVF semantics: a corpus vector is found iff its
    (nprobe=1) cell is among the query's nprobe probed cells — the
    same dial as ann_ivf_probe_indexed; raise nprobe for recall, at
    linear candidate cost. Pairs emit at most once per (query,
    corpus) vector: corpus vectors live in exactly one cell.

    Static-side FRESHNESS: same V1 file-source contract as
    neardup_guard_stream — appends by ivf_index_maintainer are seen
    by a guard (re)built from a fresh spark.table() per availableNow
    run (the maintainer refreshTable's after each append)."""
    from flapi_spark.operators.dedup import cosine_col
    from flapi_spark.operators.similarity import rowwise_ivf_assign

    assigned = rowwise_ivf_assign(vec_stream, centroid_rows, nprobe)
    corpus = index.select(
        F.col("cell_id"),
        F.col("vec_id").alias("corpus_vec_id"),
        F.col("embedding").alias("corpus_embedding"),
    )
    cands = assigned.join(corpus, "cell_id").where(
        F.col("vec_id") != F.col("corpus_vec_id")
    )
    return cands.select(
        "vec_id",
        "corpus_vec_id",
        "cell_id",
        F.round(cosine_col("embedding", "corpus_embedding"), 6).alias(
            "cosine"
        ),
    ).where(F.col("cosine") >= threshold)


def embedding_guard_batch(
    vectors: DataFrame,
    index: DataFrame,
    centroid_rows: list,
    threshold: float = 0.4,
    nprobe: int = 3,
) -> DataFrame:
    """Batch twin of embedding_guard_stream — same helpers, batch
    input; the window-for-window equality anchor in tests."""
    return embedding_guard_stream(
        vectors, index, centroid_rows, threshold=threshold, nprobe=nprobe
    )


def er_guard_stream(recs_stream: DataFrame, index: DataFrame) -> DataFrame:
    """Ingestion-time identity guard for the RECORD lane (round 10e,
    the mirror of neardup_guard_stream for entities): a stream of
    incoming records (rec_id, name) checked against the persisted
    bucketed blocking index — "is this customer already in my MDM
    store under a slightly different spelling?" — before it lands.

    Every stage is stateless (append-mode safe, zero streaming
    state): per-row affix block keys (a projection + generator
    explode), a stream-static equi-join on the bucket key (kind, k)
    — the index side reads as a bucketed scan with ZERO exchange
    (linkage.write_er_index) — then the row-local length prefilter +
    levenshtein verify; the name column rides in the index so the
    verify needs no second join. Work per micro-batch is
    O(delta x block-cohabitants), independent of corpus size.

    Emission is at-least-once per (record, index) pair (a pair
    co-blocking under BOTH affix keys emits twice, kind as
    evidence); dedup belongs to the sink, as in every other guard.
    Static-side FRESHNESS: same V1 file-source contract — appends by
    er_index_maintainer are seen by a guard (re)built from a fresh
    spark.table() per availableNow run."""
    from flapi_spark.operators.linkage import er_guard_probe

    return er_guard_probe(recs_stream, index)


def er_guard_batch(recs: DataFrame, index: DataFrame) -> DataFrame:
    """Batch twin of er_guard_stream — same helper, batch input; the
    equality anchor in tests."""
    from flapi_spark.operators.linkage import er_guard_probe

    return er_guard_probe(recs, index)


def er_index_maintainer(table: str, marker_dir: str):
    """Streaming maintenance of the persisted blocking index: fold
    each micro-batch's records into the bucketed index via
    linkage.append_er_index. Same replay/refresh semantics as every
    maintainer built on replay_maintainer (duplicates cost verify
    work, never correctness — the guard emits at-least-once anyway)."""
    from flapi_spark.operators.linkage import append_er_index

    def _do(spark, batch_df):
        append_er_index(spark, batch_df, table)

    return replay_maintainer(marker_dir, _do, (table,))


def ivf_index_maintainer(table: str, marker_dir: str):
    """Streaming maintenance of the persisted IVF index (round 9): a
    ``writeStream.foreachBatch`` callable folding each micro-batch's
    vectors into the bucketed index via similarity.append_ivf_index —
    assignment is against the FROZEN ``<table>__centroids`` sidecar,
    so cell identity stays stable and probes stay exchange-free.
    Completes the continuous-ingest loop for the embedding lane the
    way band_index_maintainer does for text: guard the batch against
    the corpus, then fold it in.

    Same replay/refresh semantics as band_index_maintainer: committed
    batch ids tracked with _SUCCESS markers written AFTER the append
    commits (a crash in the window duplicates one batch in the index;
    duplicates cost verify work, never correctness — consumers rank
    or threshold per pair), and both the micro-batch clone session
    and the constructing session are refreshTable'd so a guard
    rebuilt from a fresh spark.table() re-lists."""
    from flapi_spark.operators.similarity import append_ivf_index

    def _do(spark, batch_df):
        append_ivf_index(spark, batch_df, table)

    return replay_maintainer(marker_dir, _do, (table,))


def replay_maintainer(marker_dir: str, append_fn, tables: tuple):
    """Shared foreachBatch scaffold for every persisted-index
    maintainer (round-9 factoring — band/portable/IVF/fingerprint
    lanes previously carried verbatim copies): idempotent
    _SUCCESS-marker replay skip, `append_fn(spark, batch_df)` for the
    lane-specific appends, then refreshTable on BOTH the micro-batch
    clone session and the constructing session for every maintained
    table (the round-8 V1 relation-cache finding), marker written
    AFTER the appends commit (a crash in the window duplicates at
    most one batch — consumers dedup candidates, never
    correctness)."""
    import os

    origin = SparkSession.getActiveSession()

    def _append(batch_df, batch_id: int) -> None:
        dst = os.path.join(marker_dir, f"batch_id={batch_id}")
        if os.path.exists(os.path.join(dst, "_SUCCESS")):
            return  # replayed batch — already folded into the index
        spark = batch_df.sparkSession
        append_fn(spark, batch_df)
        for s in {spark, origin} - {None}:
            for t in tables:
                s.catalog.refreshTable(t)
        os.makedirs(dst, exist_ok=True)
        with open(os.path.join(dst, "_SUCCESS"), "w"):
            pass

    return _append


def band_index_maintainer(table: str, marker_dir: str,
                          shingle_table: str | None = None):
    """Streaming maintenance of the persisted LSH band index (round
    7): a ``writeStream.foreachBatch`` callable that appends each
    micro-batch's band rows to the bucketed ``write_band_index``
    table via ``append_band_index`` (insertInto preserves the bucket
    spec, so appended files land in the right buckets and every
    consumer's probe stays exchange-free). Combined with
    ``neardup_guard_stream(band_index=...)`` this closes the loop the
    module docstrings promise: new docs are guarded against the
    corpus AND folded into the index, batch by batch, with the index
    never re-shuffled.

    Replay semantics: foreachBatch is at-least-once, so committed
    batch ids are tracked with the same ``_SUCCESS``-marker pattern
    as ``sinks.idempotent_batch_writer`` — a replayed batch_id is
    skipped. The marker is written AFTER the append commits, so a
    crash inside the window leaves a duplicated batch in the index;
    that is deliberate: band rows are candidate-generation input and
    every consumer dedups candidates (``.distinct()``), so duplicates
    cost work, never correctness — the alternative (marker first)
    would LOSE documents from the index, a recall hole.

    `shingle_table` (round 8): also fold the batch's hashed shingle
    sets into the persisted verify-side store
    (dedup.write_shingle_store), under the same replay marker — one
    marker covers both appends, and a crash between them duplicates
    at most one batch in one table (same candidate-dedup argument).

    Replay-skip/refresh mechanics live in replay_maintainer (the
    cloned-session relation-cache finding is documented there)."""
    from flapi_spark.operators.dedup import (
        append_band_index, append_shingle_store,
    )

    def _do(spark, batch_df):
        append_band_index(spark, batch_df, table)
        if shingle_table is not None:
            append_shingle_store(spark, batch_df, shingle_table)

    tables = (table,) if shingle_table is None else (table, shingle_table)
    return replay_maintainer(marker_dir, _do, tables)


def portable_index_maintainer(
    band_table: str, shingle_table: str, marker_dir: str
):
    """Streaming maintenance of the PORTABLE (oracle-checkable) index
    pair: a foreachBatch callable folding each micro-batch's raw-
    signature band rows (append_band_index_portable) AND md5 shingle
    sets (append_shingle_store_portable) under one idempotent replay
    marker — the write half of the fully index-resident pair stream
    (pairs_from_band_index(shingle_store=)) that every indexed
    registry twin consumes. Same replay/refresh semantics as
    band_index_maintainer: marker after commit (duplicates cost
    candidate work, never correctness — consumers .distinct()), both
    sessions refreshTable'd so consumers re-list on their next
    freshly-resolved read."""
    from flapi_spark.operators.dedup import (
        append_band_index_portable, append_shingle_store_portable,
    )

    def _do(spark, batch_df):
        append_band_index_portable(spark, batch_df, band_table)
        append_shingle_store_portable(spark, batch_df, shingle_table)

    return replay_maintainer(marker_dir, _do, (band_table, shingle_table))


def vocab_drift_stream(
    docs_stream: DataFrame,
    vocab: DataFrame,
    window: str = "10 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming vocabulary-drift monitor: per event-time window, the
    share of incoming token OCCURRENCES outside a reference
    vocabulary — the tokenizer-drift alarm for a training-data ingest
    (a rising OOV share means the corpus moved away from the
    tokenizer's training distribution; retrain/revocab signal). The
    streaming twin of the batch `vocab_oov_rate` family, rolled up per
    window instead of per doc.

    Shape: stateless tokenize/explode (whitespace-normalized, the
    batch operators' tokenization), stream-static LEFT join against
    the vocab table (broadcast-small or bucketed on tok at scale; a
    vocab refresh is picked up at query restart from a fresh
    DataFrame — V1 static sides snapshot their file listing at plan
    analysis, see neardup_guard_stream), then ONE watermarked
    windowed aggregate — the only streaming state is the window
    counters. Expects (ts, text)."""
    toks = (
        docs_stream.withWatermark("ts", watermark)
        .select(
            "ts",
            F.explode(
                F.split(
                    F.lower(F.trim(F.regexp_replace("text", "\\s+", " "))),
                    " ",
                )
            ).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    # DISTINCT the vocab side: a refreshed/duplicated vocab table must
    # not fan out in-vocab token rows (that would inflate n_tokens and
    # deflate oov_share — the very alarm this monitor raises)
    marked = toks.join(
        vocab.select("tok").distinct().withColumn("__v", F.lit(1)),
        "tok", "left",
    )
    return (
        marked.groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("__v").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_oov").cast("long").alias("n_oov"),
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens"), 6
            ).alias("oov_share"),
        )
    )


def quality_gate_stream(
    docs_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming quality-gate monitor: per event-time window, the
    Gopher-funnel survivor counts over an incoming document stream —
    the live twin of the batch `quality_gate_funnel` (a falling
    keep_rate window is the crawl-regression alarm; which cumulative
    count drops says WHICH gate started biting). Expects (ts, text).

    Shape: the gates are stateless per-document expressions (the batch
    operators' exact tokenization and thresholds); the only streaming
    state is ONE watermarked windowed aggregate of 5 sums — no
    stream-stream joins, no per-key state store growth."""
    from flapi_spark.operators.text import STOPWORDS

    nt = F.lower(F.trim(F.regexp_replace("text", "\\s+", " ")))
    toks = F.split(nt, " ")
    n_tokens = F.size(toks)
    mean_tok_len = (
        F.length(F.regexp_replace(nt, " ", "")).cast("double") / n_tokens
    )
    alpha_ratio = (
        F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))).cast("double")
        / n_tokens
    )
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    c1 = (n_tokens >= 20) & (n_tokens <= 100000)
    c2 = c1 & (mean_tok_len >= 3.0) & (mean_tok_len <= 10.0)
    c3 = c2 & (alpha_ratio >= 0.8)
    c4 = c3 & (stop_hits >= 2)

    def s(c):
        return F.sum(F.when(c, 1).otherwise(0))

    gated = docs_stream.withWatermark("ts", watermark).select(
        "ts", c1.alias("c1"), c2.alias("c2"), c3.alias("c3"),
        c4.alias("c4"),
    )
    return (
        gated.groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            s(F.col("c1")).alias("pass_n_tokens"),
            s(F.col("c2")).alias("pass_token_len"),
            s(F.col("c3")).alias("pass_alpha_ratio"),
            s(F.col("c4")).alias("pass_all"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("pass_n_tokens").cast("long").alias("pass_n_tokens"),
            F.col("pass_token_len").cast("long").alias("pass_token_len"),
            F.col("pass_alpha_ratio").cast("long").alias(
                "pass_alpha_ratio"
            ),
            F.col("pass_all").cast("long").alias("pass_all"),
            F.round(
                F.col("pass_all").cast("double") / F.col("n_docs"), 6
            ).alias("keep_rate"),
        )
    )


def crawl_gate_stream(
    docs_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "2 hours",
    min_density: float = 0.4,
    min_text_len: int = 80,
    model: dict | None = None,
) -> DataFrame:
    """Streaming crawl-gate monitor (round 10): per event-time
    window, the stage-0 funnel over an incoming crawl stream — URL
    gate (domain blocklist + keyword rule, text_url_filter's exact
    columns) then HTML text-density gate (text_html_extract's exact
    extraction chain and ROUNDED-density predicate) — the live twin
    of the url_filter → html_extract front of the curation pipeline.
    A falling keep_rate window is the crawl-regression alarm; whether
    pass_url or pass_density drops says which gate started biting.
    Expects (ts, doc_id, text).

    `model` (round 10b) extends the funnel with the DEPLOYED
    classifier gate (classifier.load_classifier_model): pass_model
    counts docs clearing url AND density AND `score >= threshold`
    on the extracted document text, and keep_rate moves to the
    model-gated count — the monitor then watches the exact
    three-gate front the ingest path runs.

    Shape (the quality_gate_stream contract): all gates are
    STATELESS per-document expressions — JVM regex/string/fold
    projections inside the stream's map stage (the model rides as a
    literal weight map, classifier_guard_stream's contract); the
    only streaming state is one watermarked windowed aggregate of
    sums. No stream-stream joins, no per-key state store, no
    Python."""
    from flapi_spark.operators.text import (
        _html_main, _html_wrapped, _url_cols,
    )

    _domain, _url, _norm, reason = _url_cols()
    html = _html_wrapped()
    main = _html_main(html)
    density = F.round(
        F.length(main).cast("double") / F.length(html), 6
    )
    pass_url = reason == "none"
    pass_density = pass_url & (
        (density >= F.lit(float(min_density)))
        & (F.length(main) >= F.lit(int(min_text_len)))
    )
    conds = [pass_url.alias("c1"), pass_density.alias("c2")]
    sums = [("pass_url", "c1"), ("pass_all", "c2")]
    if model is not None:
        from flapi_spark.operators.classifier import _score_cols
        from flapi_spark.operators.text import _tokens

        _n, score = _score_cols(
            _tokens(), model["weights"], model["bias"],
            model["default_lw"], model["n_buckets"],
        )
        conds.append(
            (pass_density & (score >= model["threshold"])).alias("c3")
        )
        sums.append(("pass_model", "c3"))

    def s(c):
        return F.sum(F.when(c, 1).otherwise(0))

    gated = docs_stream.withWatermark("ts", watermark).select(
        "ts", *conds
    )
    last = sums[-1][0]
    return (
        gated.groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[s(F.col(c)).alias(name) for name, c in sums],
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col("n_docs").cast("long").alias("n_docs"),
            *[F.col(name).cast("long").alias(name) for name, _c in sums],
            F.round(
                F.col(last).cast("double") / F.col("n_docs"), 6
            ).alias("keep_rate"),
        )
    )


def classifier_guard_stream(docs_stream: DataFrame, model: dict) -> DataFrame:
    """Model-gate ingest guard (round 10b): score an incoming
    (doc_id, text) crawl stream against a PERSISTED NB gate
    (classifier.write_classifier_stats → load_classifier_model) and
    emit (doc_id, n_tokens, score, keep) per document — the deployed
    form of the classifier_gate curate() stage: the batch build
    calibrates the rank-cut threshold once; ingest applies it as
    `score >= threshold`.

    Shape: completely STATELESS — not even a stream-static join: the
    ≤ n_buckets weights ride the plan as a literal map inside one
    codegen'd projection (array_sort'ed fold, bit-equal to the batch
    scorer — classifier_guard_batch is the equality anchor). At a
    production bucket count (2^18+) swap the map literal for a
    broadcast stream-static join against the stats table — same
    columns, same output contract. Unseen tokens take the sidecar's
    default_lw, so novel-vocabulary drift degrades gracefully toward
    the smoothed prior instead of erroring."""
    from flapi_spark.operators.classifier import _score_cols
    from flapi_spark.operators.text import _tokens

    n_tokens, score = _score_cols(
        _tokens(), model["weights"], model["bias"],
        model["default_lw"], model["n_buckets"],
    )
    return docs_stream.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        score.alias("score"),
        (score >= model["threshold"]).alias("keep"),
    )


def postings_index_maintainer(table: str, marker_dir: str):
    """Streaming maintenance of the persisted BM25 postings index
    (round 10c — the lexical lane of the maintainer family): a
    ``writeStream.foreachBatch`` callable appending each document
    micro-batch's postings via ``append_postings_index`` (bucket spec
    preserved; the __stats sidecar rolls forward additively under the
    same replay marker).

    Replay semantics differ from the candidate-generation lanes:
    duplicated POSTING rows are collapsed by the probe's (tok, doc_id)
    MAX dedup, so a crash inside the marker window cannot double-count
    scores — but the sidecar's n_docs/total_len CAN over-count that
    one batch's delta (bounded skew of idf/avglen, not a wrong row
    set); rebuild the index to reconcile after a crash if exact corpus
    constants matter. Expects micro-batches of (doc_id, text) rows."""
    from flapi_spark.operators.relational import append_postings_index

    def _do(spark, batch_df):
        append_postings_index(spark, batch_df, table)

    return replay_maintainer(marker_dir, _do, (table, f"{table}__stats"))


def topic_ref_shares(emb: DataFrame, centroid_rows: list) -> DataFrame:
    """Reference topic mix for topic_mix_stream: the per-cell share of
    a corpus snapshot under the SAME frozen centroids the stream
    monitor assigns against (cell identity must match or the deltas
    are meaningless — the `<table>__centroids` sidecar contract).
    Returns (cell_id, ref_share)."""
    from flapi_spark.operators.similarity import rowwise_ivf_assign

    assigned = rowwise_ivf_assign(emb, centroid_rows, nprobe=1)
    counts = assigned.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("t"))
    return counts.crossJoin(F.broadcast(total)).select(
        F.col("cell_id").cast("long").alias("cell_id"),
        F.round(F.col("n").cast("double") / F.col("t"), 6).alias(
            "ref_share"
        ),
    )


def topic_mix_stream(
    vec_stream: DataFrame,
    centroid_rows: list,
    ref_shares: DataFrame,
    window: str = "10 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming topic-mix drift monitor (round 10d): per event-time
    window, the share of incoming embeddings landing in each IVF cell
    vs a reference corpus mix — the SEMANTIC twin of
    vocab_drift_stream (that one catches token-distribution drift;
    this one catches topic drift a tokenizer never sees: a crawl
    source pivoting to a new content farm shifts cell shares long
    before the vocabulary moves). A sustained share_delta spike on
    one cell is the "re-weight or gate this source" alarm for the
    mixture planner.

    Shape: stateless per-row cell assignment against the FROZEN
    centroid sidecar (similarity.rowwise_ivf_assign — bounded
    driver-side literal, the embedding_guard_stream contract), then
    ONE watermarked windowed aggregate. Because append-mode streams
    cannot re-aggregate an aggregate, the per-cell counts pivot WIDE
    inside that single groupBy (the cell set is the bounded centroid
    summary, known at plan time) and explode back to rows in a
    stateless projection; the reference mix joins stream-static.
    Expects (ts, vec_id, embedding); emits (window_start, window_end,
    cell_id, n_vectors, share, ref_share, share_delta)."""
    from flapi_spark.operators.similarity import rowwise_ivf_assign

    assigned = rowwise_ivf_assign(vec_stream, centroid_rows, nprobe=1)
    cells = sorted(int(r.cell_id) for r in centroid_rows)
    agg = (
        assigned.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            *[
                F.sum(
                    F.when(F.col("cell_id") == c, 1).otherwise(0)
                ).alias(f"c_{c}")
                for c in cells
            ],
        )
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).cast("long").alias("cell_id"),
                F.col(f"c_{c}").cast("long").alias("n"),
            )
            for c in cells
        ]
    )
    rows = agg.select(
        "w", "n_total", F.explode(pairs).alias("p")
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("p.cell_id").alias("cell_id"),
        F.col("p.n").alias("n_vectors"),
        F.round(
            F.col("p.n").cast("double") / F.col("n_total"), 6
        ).alias("share"),
    )
    return rows.join(
        F.broadcast(ref_shares.select("cell_id", "ref_share")),
        "cell_id",
        "left",
    ).select(
        "window_start",
        "window_end",
        "cell_id",
        "n_vectors",
        "share",
        F.coalesce("ref_share", F.lit(0.0)).alias("ref_share"),
        F.round(
            F.col("share") - F.coalesce("ref_share", F.lit(0.0)), 6
        ).alias("share_delta"),
    )


def dialogue_guard_stream(transcripts_stream: DataFrame) -> DataFrame:
    """SFT ingest guard (round 10e): per-transcript structure
    verdicts computed in flight — turn count, per-role content sizes,
    user-first strict-alternation well-formedness — so malformed
    transcripts are flagged BEFORE they land in the SFT store.

    Entirely STATELESS: the verdict is a per-row array-intrinsic
    projection (sft.dialogue_verdicts_rowwise — no aggregation, no
    watermark, no shuffle; zero-Exchange plan asserted in tests), so
    it runs in append mode at any ingest rate and equals the batch
    parser row-for-row (bit-parity pinned)."""
    from flapi_spark.operators.sft import dialogue_verdicts_rowwise

    return dialogue_verdicts_rowwise(transcripts_stream)
