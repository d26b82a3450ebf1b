"""Result serialization / content negotiation.

The reference negotiates response formats (JSON, CSV, Arrow IPC) per
request (reference: test/cpp/test_content_negotiation.cpp,
test_arrow_serialization.cpp, test_arrow_compression.cpp). A Spark
engine's analogue: serialize a bounded result DataFrame into the
requested wire format. Arrow is the natural fast path — Spark 4
collects to Arrow directly (`df.toArrow()`), so the IPC stream is a
zero-copy re-frame of what the JVM already shipped.

All serializers here collect to the driver, which is the correct
place for an API response and the wrong place for anything else — so
every entry point enforces a planned row cap (``df.limit`` →
CollectLimit, never a full materialization) before collecting.
``max_rows=UNLIMITED`` is the explicit opt-out for callers that have
already bounded the result (reference: mcp_response_shaper.cpp
max-rows semantics).
"""

from __future__ import annotations

import io
import json
import time
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame

# explicit opt-out sentinel; None means "apply the default cap"
UNLIMITED = -1
DEFAULT_MAX_ROWS = 10_000

JSON = "application/json"
CSV = "text/csv"
ARROW = "application/vnd.apache.arrow.stream"

_ACCEPTS = {
    JSON: "json",
    "application/*": "json",
    "*/*": "json",
    CSV: "csv",
    "text/*": "csv",
    ARROW: "arrow",
    "application/vnd.apache.arrow.file": "arrow",
}


def _bounded(df: DataFrame, max_rows: int | None) -> DataFrame:
    """Apply the driver-materialization row cap as a planned limit."""
    cap = DEFAULT_MAX_ROWS if max_rows is None else max_rows
    return df if cap == UNLIMITED else df.limit(cap)


def _record(registry, fmt: str, n_bytes: int, n_rows: int, dur_s: float) -> None:
    """Serialization metrics per wire format (reference:
    src/include/arrow_metrics.hpp serialization counters +
    test/cpp/test_arrow_metrics.cpp expectations): bytes out, rows
    out, and a duration histogram, labeled by format."""
    if registry is None:
        return
    labels = {"format": fmt}
    registry.inc("serialize_bytes", labels, by=float(n_bytes))
    registry.inc("serialize_rows", labels, by=float(n_rows))
    registry.observe("serialize_duration_seconds", dur_s, labels)


def _blob_str(raw: bytes) -> str:
    """The reference's BLOB rendering (query_executor.cpp
    convertVectorBlobToJson, matching DuckDB's own blob string form):
    printable ASCII bytes as-is, everything else as \\xNN — arbitrary
    binary can't travel through the plain-string path (invalid UTF-8 /
    invalid JSON)."""
    out = []
    for b in raw:
        if 32 <= b <= 126 and b != 0x5C:  # printable, not backslash
            out.append(chr(b))
        else:
            out.append(f"\\x{b:02X}")
    return "".join(out)


def to_json_rows(
    df: DataFrame,
    max_rows: int | None = None,
    json_columns: list[str] | None = None,
) -> list[dict[str, Any]]:
    """Row dicts with JSON-safe values (JVM-side serialization via
    Dataset.toJSON — no Python per-row conversion of ordinary
    columns). Two reference serialization rules apply on top
    (query_executor.cpp convertVectorEntryToJson):

    - `json_columns` (DuckDB's JSON logical-type alias has no Spark
      analogue, so the endpoint DECLARES them — `json-columns:` in the
      YAML): string values parse into NESTED objects (issue #38);
      malformed JSON degrades to the raw string, never a dropped row.
    - BinaryType columns render in DuckDB's blob string form
      (printable bytes as-is, others \\xNN) instead of Spark's
      base64 — matching CAST(blob AS VARCHAR) on the reference.
    """
    rows = [json.loads(s) for s in _bounded(df, max_rows).toJSON().collect()]
    jset = {c for c in (json_columns or ())}
    from pyspark.sql.types import BinaryType

    bin_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, BinaryType)
    ]
    if jset or bin_cols:
        import base64

        for r in rows:
            for c in jset:
                v = r.get(c)
                if isinstance(v, str):
                    try:
                        r[c] = json.loads(v)
                    except ValueError:
                        pass  # malformed: stays a queryable string
            for c in bin_cols:
                v = r.get(c)
                if isinstance(v, str):
                    r[c] = _blob_str(base64.b64decode(v))
    return rows


def to_json_bytes(
    df: DataFrame,
    max_rows: int | None = None,
    registry=None,
    json_columns: list[str] | None = None,
) -> bytes:
    t0 = time.monotonic()
    rows = to_json_rows(df, max_rows, json_columns=json_columns)
    out = json.dumps(rows).encode()
    _record(registry, "json", len(out), len(rows), time.monotonic() - t0)
    return out


def to_csv_bytes(
    df: DataFrame, max_rows: int | None = None, registry=None
) -> bytes:
    """CSV with header. Arrow-accelerated collect, pandas writer."""
    t0 = time.monotonic()
    buf = io.StringIO()
    pdf = _bounded(df, max_rows).toPandas()
    pdf.to_csv(buf, index=False)
    out = buf.getvalue().encode()
    _record(registry, "csv", len(out), len(pdf), time.monotonic() - t0)
    return out


@dataclass
class ArrowSerializerConfig:
    """reference: ArrowSerializerConfig (test_arrow_configuration.cpp
    defaults: batch 8192, no codec, level 0, 256 MB memory cap)."""

    batch_size: int = 8192
    codec: str = ""
    compression_level: int = 0
    max_memory_bytes: int = 256 * 1024 * 1024


class ArrowMemoryLimitError(MemoryError):
    pass


def to_arrow_ipc(
    df: DataFrame,
    compression: str | None = None,
    max_rows: int | None = None,
    registry=None,
    config: ArrowSerializerConfig | None = None,
) -> bytes:
    """Arrow IPC stream bytes. `compression` may be 'zstd' or 'lz4'
    (reference: test_arrow_compression.cpp negotiates codecs); or pass
    an ArrowSerializerConfig for the full reference surface —
    batch-sized record batches, codec + compression level, and the
    max-memory guard (a result whose Arrow buffers exceed the cap
    fails with a memory error instead of ballooning the driver,
    test_arrow_configuration.cpp 'Custom max memory is enforced')."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    t0 = time.monotonic()
    table = _bounded(df, max_rows).toArrow()
    cfg = config or ArrowSerializerConfig(codec=compression or "")
    if table.nbytes > cfg.max_memory_bytes:
        raise ArrowMemoryLimitError(
            f"arrow serialization exceeds the memory limit:"
            f" {table.nbytes} > {cfg.max_memory_bytes} bytes"
        )
    if cfg.codec and cfg.compression_level:
        codec = pa.Codec(cfg.codec, compression_level=cfg.compression_level)
    else:
        codec = cfg.codec or None
    sink = pa.BufferOutputStream()
    options = ipc.IpcWriteOptions(compression=codec)
    with ipc.new_stream(sink, table.schema, options=options) as w:
        for batch in table.to_batches(max_chunksize=cfg.batch_size):
            w.write_batch(batch)
    out = sink.getvalue().to_pybytes()
    fmt = "arrow" if not cfg.codec else f"arrow+{cfg.codec}"
    _record(registry, fmt, len(out), table.num_rows, time.monotonic() - t0)
    return out


def from_arrow_ipc(data: bytes):
    """Read an IPC stream back to a pyarrow.Table (round-trip tests)."""
    import pyarrow.ipc as ipc

    with ipc.open_stream(data) as r:
        return r.read_all()


def negotiate(
    df: DataFrame,
    accept: str | None,
    max_rows: int | None = None,
    registry=None,
    json_columns: list[str] | None = None,
) -> tuple[bytes, str]:
    """Serialize `df` per an Accept-style header value. Unknown types
    fall back to JSON (the reference's default)."""
    kind = "json"
    for part in (accept or JSON).split(","):
        media = part.split(";")[0].strip().lower()
        if media in _ACCEPTS:
            kind = _ACCEPTS[media]
            break
    if kind == "csv":
        return to_csv_bytes(df, max_rows, registry=registry), CSV
    if kind == "arrow":
        return to_arrow_ipc(df, max_rows=max_rows, registry=registry), ARROW
    return to_json_bytes(
        df, max_rows, registry=registry, json_columns=json_columns
    ), JSON


class NotAcceptable(ValueError):
    """No supported format satisfies the request (HTTP 406 semantics,
    reference: flapi-09 §5.1 edge cases)."""


def select_format(
    accept: str | None,
    format_override: str | None = None,
    default_format: str = "json",
) -> tuple[str, str | None]:
    """Format negotiation per the reference's priority order
    (docs/features/flapi-09-arrow-content-type.md §5.1):

    1. query-param override wins over Accept;
    2. Accept media types ranked by q-value (highest supported wins;
       codec preference read from the media-type `codec=` parameter);
    3. wildcard / absent / malformed Accept -> the default format;
    4. an Accept listing ONLY unsupported concrete types (no
       wildcard, no q=0 escape) -> NotAcceptable (406).

    Returns (format, codec) with format in {json, csv, arrow}.
    """
    if format_override:
        fmt = format_override.strip().lower()
        if fmt not in ("json", "csv", "arrow"):
            raise NotAcceptable(f"unsupported format override: {format_override!r}")
        return fmt, None
    if accept is None or not accept.strip():
        return default_format, None
    candidates = []  # (q, order, fmt, codec)
    any_parsed = False
    for order, part in enumerate(accept.split(",")):
        part = part.strip()
        if not part:
            continue
        pieces = part.split(";")
        media = pieces[0].strip().lower()
        q = 1.0
        codec = None
        for p in pieces[1:]:
            k, _, v = p.partition("=")
            k, v = k.strip().lower(), v.strip().strip('"')
            if k == "q":
                try:
                    q = float(v)
                except ValueError:
                    return default_format, None  # malformed -> */*
            elif k == "codec" and v.lower() in ("zstd", "lz4"):
                codec = v.lower()
        if "/" not in media:
            return default_format, None  # malformed -> */*
        any_parsed = True
        if media in ("*/*", "application/*") :
            candidates.append((q, order, default_format, codec))
        elif media in _ACCEPTS:
            candidates.append((q, order, _ACCEPTS[media], codec))
        elif media == "text/*":
            candidates.append((q, order, "csv", codec))
        # unsupported concrete types contribute nothing
    viable = [c for c in candidates if c[0] > 0]
    if not viable:
        if any_parsed:
            raise NotAcceptable(f"no supported media type in Accept: {accept!r}")
        return default_format, None
    viable.sort(key=lambda c: (-c[0], c[1]))
    _, _, fmt, codec = viable[0]
    return fmt, codec


def negotiate_full(
    df: DataFrame,
    accept: str | None,
    max_rows: int | None = None,
    registry=None,
    format_override: str | None = None,
    default_format: str = "json",
    json_columns: list[str] | None = None,
) -> tuple[bytes, str]:
    """select_format + serialize: the complete reference negotiation
    path (query-param override, q-values, codec parameter, 406)."""
    fmt, codec = select_format(accept, format_override, default_format)
    if fmt == "csv":
        return to_csv_bytes(df, max_rows, registry=registry), CSV
    if fmt == "arrow":
        body = to_arrow_ipc(
            df, compression=codec, max_rows=max_rows, registry=registry
        )
        ctype = ARROW if codec is None else f"{ARROW}; codec={codec}"
        return body, ctype
    return to_json_bytes(
        df, max_rows, registry=registry, json_columns=json_columns
    ), JSON
