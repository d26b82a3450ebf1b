"""Content negotiation / result serialization (reference:
test_content_negotiation.cpp, test_arrow_serialization.cpp)."""

import json

import pytest

from flapi_spark import results as RZ
from flapi_spark.session import load_table


@pytest.fixture(scope="module")
def small_df(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
        .limit(20)
    )


def test_json_rows(small_df):
    rows = RZ.to_json_rows(small_df)
    assert len(rows) == 20
    assert set(rows[0]) == {"c_custkey", "c_name", "c_acctbal"}
    assert rows[0]["c_custkey"] == 0


def test_csv_bytes(small_df):
    text = RZ.to_csv_bytes(small_df).decode()
    lines = text.strip().splitlines()
    assert lines[0] == "c_custkey,c_name,c_acctbal"
    assert len(lines) == 21


def test_arrow_ipc_roundtrip(small_df):
    data = RZ.to_arrow_ipc(small_df)
    table = RZ.from_arrow_ipc(data)
    assert table.num_rows == 20
    assert table.column_names == ["c_custkey", "c_name", "c_acctbal"]
    assert table.column("c_custkey").to_pylist()[0] == 0


def test_arrow_ipc_zstd_compression(small_df):
    plain = RZ.to_arrow_ipc(small_df)
    zstd = RZ.to_arrow_ipc(small_df, compression="zstd")
    assert RZ.from_arrow_ipc(zstd).equals(RZ.from_arrow_ipc(plain))


@pytest.mark.parametrize(
    "accept,expected_ct",
    [
        ("application/json", RZ.JSON),
        ("text/csv", RZ.CSV),
        ("application/vnd.apache.arrow.stream", RZ.ARROW),
        ("text/csv;q=0.9, application/json", RZ.CSV),  # first match wins
        ("application/xml", RZ.JSON),  # unknown → JSON fallback
        (None, RZ.JSON),
    ],
)
def test_negotiate(small_df, accept, expected_ct):
    body, ct = RZ.negotiate(small_df, accept)
    assert ct == expected_ct
    if ct == RZ.JSON:
        assert len(json.loads(body)) == 20


def test_serializers_enforce_default_cap(spark):
    """Every serializer plans a limit before collecting: an unshaped
    DataFrame cannot materialize unbounded rows on the driver."""
    from flapi_spark import results as R

    df = spark.range(50).withColumnRenamed("id", "v")
    old = R.DEFAULT_MAX_ROWS
    R.DEFAULT_MAX_ROWS = 10
    try:
        assert len(R.to_json_rows(df)) == 10
        csv_lines = R.to_csv_bytes(df).decode().strip().splitlines()
        assert len(csv_lines) == 11  # header + 10
        tbl = R.from_arrow_ipc(R.to_arrow_ipc(df))
        assert tbl.num_rows == 10
        body, _ = R.negotiate(df, "application/json")
        import json as _json

        assert len(_json.loads(body)) == 10
        # explicit opt-out returns everything
        assert len(R.to_json_rows(df, max_rows=R.UNLIMITED)) == 50
    finally:
        R.DEFAULT_MAX_ROWS = old


def test_mask_columns_strategies(spark, tmp_path):
    import hashlib

    from flapi_spark.config import EndpointConfig
    from flapi_spark.executor import QueryExecutor

    spark.createDataFrame(
        [(1, "alice@example.com", "4111111111111111"), (2, "bo@x.io", "123")],
        "id LONG, email STRING, card STRING",
    ).createOrReplaceTempView("mask_src")
    ep = EndpointConfig.from_dict(
        {
            "url-path": "/masked/",
            "template-text": "SELECT id, email, card FROM mask_src",
            "with-pagination": False,
            "response-shape": {
                "mask-columns": {
                    "email": "hash",
                    "card": "partial",
                }
            },
        },
        base_dir=tmp_path,
    )
    res = QueryExecutor(spark).execute(ep)
    rows = {r.id: r for r in res.df.collect()}
    assert res.shaped["masked"] == ["email", "card"]
    assert rows[1].email == hashlib.md5(b"alice@example.com").hexdigest()
    assert rows[1].card == "************1111"
    assert rows[2].card == "***"  # <=4 chars: fully starred
    # schema keeps the columns (mask != redact)
    assert set(res.df.columns) == {"id", "email", "card"}


def test_mask_null_and_unknown_strategy(spark, tmp_path):
    import pytest as _pytest

    from flapi_spark.config import EndpointConfig
    from flapi_spark.executor import QueryExecutor

    spark.createDataFrame(
        [(1, "x")], "id LONG, secret STRING"
    ).createOrReplaceTempView("mask_src2")
    nulled = EndpointConfig.from_dict(
        {
            "url-path": "/nulled/",
            "template-text": "SELECT id, secret FROM mask_src2",
            "with-pagination": False,
            "response-shape": {"mask-columns": {"secret": "null"}},
        },
        base_dir=tmp_path,
    )
    assert QueryExecutor(spark).execute(nulled).df.collect()[0].secret is None
    bad = EndpointConfig.from_dict(
        {
            "url-path": "/bad/",
            "template-text": "SELECT id, secret FROM mask_src2",
            "with-pagination": False,
            "response-shape": {"mask-columns": {"secret": "rot13"}},
        },
        base_dir=tmp_path,
    )
    with _pytest.raises(ValueError, match="rot13"):
        QueryExecutor(spark).execute(bad)


def test_serialization_metrics_per_format(spark):
    """Bytes/rows counters + duration histogram per wire format
    (reference: arrow_metrics.hpp, test_arrow_metrics.cpp)."""
    from flapi_spark.metrics import MetricsRegistry
    from flapi_spark.results import negotiate, to_arrow_ipc

    df = spark.range(5).toDF("id")
    reg = MetricsRegistry()
    body, _ = negotiate(df, "application/json", registry=reg)
    assert reg.counter_value("serialize_rows", {"format": "json"}) == 5
    assert reg.counter_value("serialize_bytes", {"format": "json"}) == len(body)
    body, _ = negotiate(df, "text/csv", registry=reg)
    assert reg.counter_value("serialize_rows", {"format": "csv"}) == 5
    ipc = to_arrow_ipc(df, registry=reg)
    assert reg.counter_value("serialize_bytes", {"format": "arrow"}) == len(ipc)
    zipc = to_arrow_ipc(df, compression="zstd", registry=reg)
    assert reg.counter_value(
        "serialize_bytes", {"format": "arrow+zstd"}
    ) == len(zipc)
    snap = reg.snapshot()
    assert "serialize_duration_seconds" in snap["histograms"]


class TestFormatNegotiation:
    """Reference semantics: docs/features/flapi-09 §5.1 priority order,
    q-values, codec parameter, 406 and malformed-header handling."""

    def test_query_param_override_wins(self):
        from flapi_spark.results import select_format

        assert select_format("application/json", "arrow") == ("arrow", None)
        assert select_format(None, "csv") == ("csv", None)

    def test_quality_values_rank(self):
        from flapi_spark.results import select_format

        fmt, _ = select_format(
            "application/json;q=0.5,"
            "application/vnd.apache.arrow.stream;q=0.9"
        )
        assert fmt == "arrow"
        # tie broken by order
        fmt2, _ = select_format(
            "text/csv, application/json"
        )
        assert fmt2 == "csv"

    def test_codec_parameter_extracted(self):
        from flapi_spark.results import select_format

        fmt, codec = select_format(
            "application/vnd.apache.arrow.stream;codec=zstd"
        )
        assert (fmt, codec) == ("arrow", "zstd")

    def test_wildcard_and_malformed_default(self):
        from flapi_spark.results import select_format

        assert select_format("*/*")[0] == "json"
        assert select_format("garbage-no-slash")[0] == "json"
        assert select_format("application/json;q=abc")[0] == "json"
        assert select_format(None)[0] == "json"
        assert select_format("*/*", default_format="arrow")[0] == "arrow"

    def test_unsupported_only_is_406(self):
        import pytest as _pytest

        from flapi_spark.results import NotAcceptable, select_format

        with _pytest.raises(NotAcceptable):
            select_format("application/xml")
        with _pytest.raises(NotAcceptable):
            select_format(None, "yaml")
        # q=0 on everything supported -> 406 too
        with _pytest.raises(NotAcceptable):
            select_format("application/json;q=0")

    def test_negotiate_full_serializes(self, spark):
        from flapi_spark.results import ARROW, from_arrow_ipc, negotiate_full

        df = spark.range(3).toDF("id")
        body, ctype = negotiate_full(
            df, "application/vnd.apache.arrow.stream;codec=lz4"
        )
        assert ctype == f"{ARROW}; codec=lz4"
        assert from_arrow_ipc(body).num_rows == 3
        body2, ctype2 = negotiate_full(
            df, "application/json", format_override="csv"
        )
        assert ctype2 == "text/csv" and body2.startswith(b"id")


class TestJsonColumnEmbedding:
    """Reference issue #38 (test_json_column.tavern.yaml): a column
    carrying JSON documents must serialize as a NESTED object, not a
    JSON-escaped string; malformed JSON degrades to the raw string.
    DuckDB detects its JSON logical-type alias; Spark has no analogue,
    so the endpoint declares `json-columns`."""

    def test_declared_json_column_embeds_nested(self, spark):
        from flapi_spark.results import to_json_rows

        df = spark.createDataFrame(
            [(1, '{"a": 1, "b": [10, 20], "c": {"nested": true}}')],
            "id long, payload string",
        )
        rows = to_json_rows(df, json_columns=["payload"])
        assert rows == [
            {"id": 1,
             "payload": {"a": 1, "b": [10, 20], "c": {"nested": True}}}
        ]

    def test_undeclared_column_stays_string(self, spark):
        from flapi_spark.results import to_json_rows

        df = spark.createDataFrame(
            [(1, '{"a": 1}')], "id long, payload string"
        )
        rows = to_json_rows(df)
        assert rows == [{"id": 1, "payload": '{"a": 1}'}]

    def test_malformed_json_degrades_to_raw_string(self, spark):
        from flapi_spark.results import to_json_rows

        df = spark.createDataFrame(
            [(1, "{not json"), (2, '{"ok": 2}')],
            "id long, payload string",
        )
        rows = sorted(
            to_json_rows(df, json_columns=["payload"]),
            key=lambda r: r["id"],
        )
        assert rows[0]["payload"] == "{not json"
        assert rows[1]["payload"] == {"ok": 2}

    def test_endpoint_json_columns_threaded_through_executor(self, spark):
        from flapi_spark.config import EndpointConfig
        from flapi_spark.executor import QueryExecutor
        from flapi_spark.results import to_json_rows

        ep = EndpointConfig.from_dict({
            "url-path": "/json-demo",
            "template-text": (
                "SELECT 1 AS id,"
                " '{\"a\": 1, \"b\": [10, 20]}' AS payload"
            ),
            "json-columns": ["payload"],
            "with-pagination": False,
        })
        ex = QueryExecutor(spark, None)
        res = ex.execute(ep, {})
        assert res.json_columns == ["payload"]
        rows = to_json_rows(res.df, json_columns=res.json_columns)
        assert rows[0]["payload"] == {"a": 1, "b": [10, 20]}


def test_binary_columns_render_duckdb_blob_form(spark):
    """query_executor.cpp convertVectorBlobToJson: printable bytes
    as-is, others \\xNN — never base64, never raw invalid UTF-8."""
    from flapi_spark.results import to_json_rows

    df = spark.createDataFrame(
        [(1, bytearray(b"abc\x00\xff"))], "id long, blob binary"
    )
    rows = to_json_rows(df)
    assert rows == [{"id": 1, "blob": "abc\\x00\\xFF"}]


class TestArrowSerializerConfig:
    """Vectors from reference test_arrow_configuration.cpp."""

    def test_defaults(self):
        from flapi_spark.results import ArrowSerializerConfig

        c = ArrowSerializerConfig()
        assert c.batch_size == 8192
        assert c.codec == ""
        assert c.compression_level == 0
        assert c.max_memory_bytes == 256 * 1024 * 1024

    def test_zstd_magic_and_roundtrip(self, spark):
        from flapi_spark.results import (
            ArrowSerializerConfig, from_arrow_ipc, to_arrow_ipc,
        )

        df = spark.range(100).toDF("i")
        out = to_arrow_ipc(
            df, config=ArrowSerializerConfig(codec="zstd")
        )
        t = from_arrow_ipc(out)
        assert t.num_rows == 100

    def test_compression_level_applied(self, spark):
        from flapi_spark.results import ArrowSerializerConfig, to_arrow_ipc

        df = spark.range(5000).selectExpr(
            "id", "repeat('abc', 40) AS s"
        )
        fast = to_arrow_ipc(df, config=ArrowSerializerConfig(
            codec="zstd", compression_level=1))
        best = to_arrow_ipc(df, config=ArrowSerializerConfig(
            codec="zstd", compression_level=9))
        assert len(best) <= len(fast) * 1.1  # reference tolerance

    def test_memory_limit_enforced(self, spark):
        import pytest as _pytest

        from flapi_spark.results import (
            ArrowMemoryLimitError, ArrowSerializerConfig, to_arrow_ipc,
        )

        df = spark.range(10000).selectExpr("id", "repeat('x', 100) AS s")
        with _pytest.raises(ArrowMemoryLimitError, match="memory"):
            to_arrow_ipc(df, config=ArrowSerializerConfig(
                max_memory_bytes=1024))

    def test_batch_size_respected(self, spark):
        import pyarrow.ipc as ipc

        from flapi_spark.results import ArrowSerializerConfig, to_arrow_ipc

        df = spark.range(1000).toDF("i")
        out = to_arrow_ipc(df, config=ArrowSerializerConfig(batch_size=100))
        with ipc.open_stream(out) as r:
            batches = [b for b in r]
        assert all(b.num_rows <= 100 for b in batches)
        assert sum(b.num_rows for b in batches) == 1000


def test_empty_result_returns_valid_arrow_with_schema(spark):
    """test_arrow_streaming.py vector: a zero-row result is still a
    VALID Arrow IPC stream carrying the full schema (consumers learn
    the shape even when nothing matched)."""
    from flapi_spark.results import from_arrow_ipc, to_arrow_ipc

    df = spark.range(5).selectExpr("id", "id * 2 AS dbl").where("id > 100")
    t = from_arrow_ipc(to_arrow_ipc(df))
    assert t.num_rows == 0
    assert t.schema.names == ["id", "dbl"]


def test_arrow_nulls_preserved(spark):
    """test_arrow_streaming.py vector: nulls survive the Arrow path
    as nulls, not empty strings or sentinels."""
    from flapi_spark.results import from_arrow_ipc, to_arrow_ipc

    df = spark.createDataFrame(
        [(1, None, None), (2, "x", 2.5)],
        "id long, v string, d double",
    )
    t = from_arrow_ipc(to_arrow_ipc(df))
    rows = sorted(
        zip(t.column("id").to_pylist(), t.column("v").to_pylist(),
            t.column("d").to_pylist())
    )
    assert rows == [(1, None, None), (2, "x", 2.5)]


def test_arrow_data_matches_json(spark):
    """test_arrow_streaming.py vector: the Arrow body and the JSON
    body of the same result carry identical values."""
    from flapi_spark.results import from_arrow_ipc, to_arrow_ipc, to_json_rows

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, v string, d double"
    )
    jrows = sorted(to_json_rows(df), key=lambda r: r["id"])
    t = from_arrow_ipc(to_arrow_ipc(df))
    arows = sorted(
        ({"id": i, "v": v, "d": d}
         for i, v, d in zip(t.column("id").to_pylist(),
                            t.column("v").to_pylist(),
                            t.column("d").to_pylist())),
        key=lambda r: r["id"],
    )
    assert jrows == arows
