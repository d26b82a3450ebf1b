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
