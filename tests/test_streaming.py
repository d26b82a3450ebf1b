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
