"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: media lives as a `binary`
column (or object-store URI) beside typed metadata; decode and
feature-extraction run as Arrow-batched `mapInPandas` stages so the
imperative per-item work streams through executors in columnar
batches — never a row-at-a-time Python UDF, never a driver loop.

The decode step itself is STUBBED: this container has no image/audio
libraries, so `decode_stub` computes a deterministic fake
(content-hash-seeded dimensions + channel stats), and `decode_real`
raises NotImplementedError behind an import-try for PIL. The
Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

from flapi_spark.session import load_table

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("checksum", StringType()),
    ]
)


def attach_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a multimodal table from `documents`: UTF-8 payload
    bytes + media type derived from the source column. In production
    this is the parquet/Iceberg table the media pipeline writes."""
    docs = load_table(spark, sf_dir, "documents")
    media_type = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        media_type.alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def decode_stub(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decode: dimensions/frames seeded by content
    hash. Replace with decode_real when media libs are available."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    n_frames = 1 if not media_type.startswith("video") else 8 + digest[2] % 56
    return {
        "width": int(width),
        "height": int(height),
        "n_frames": int(n_frames),
        "checksum": hashlib.md5(payload).hexdigest(),
    }


def decode_real(payload: bytes, media_type: str) -> dict:  # pragma: no cover
    """Real decode path — requires media libraries not present here."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "media decode requires PIL/av which are not installed; "
            "use decode_stub for plumbing tests"
        ) from exc
    raise NotImplementedError("real decode not implemented in this environment")


def decode_batch(media: DataFrame, decoder=decode_stub) -> DataFrame:
    """Arrow-batched decode/feature-extract over the payload column.

    mapInPandas keeps the binary batches columnar end-to-end; the
    output drops the payload (decoded metadata only) so downstream
    stages never re-shuffle the heavy bytes."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decoder(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "n_frames": [m["n_frames"] for m in meta],
                    "checksum": [m["checksum"] for m in meta],
                }
            )
            yield out

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 256) -> DataFrame:
    """'Frame sampling' over video payloads: slice the byte stream into
    fixed windows and emit one sample hash per window (the real
    implementation would emit decoded frames). Demonstrates fan-out of
    one media row into many sample rows inside mapInPandas."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("frame_hash", StringType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, hashes = [], [], []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if not mt.startswith("video"):
                    continue
                for i in range(0, len(payload), every_n_bytes):
                    ids.append(doc_id)
                    nos.append(i // every_n_bytes)
                    hashes.append(
                        hashlib.md5(payload[i : i + every_n_bytes]).hexdigest()
                    )
            yield pd.DataFrame({"doc_id": ids, "frame_no": nos, "frame_hash": hashes})

    return media.mapInPandas(_sample, schema=schema)


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata projection (oracle-checked: byte length +
    md5 of the payload computed engine-side, no Python)."""
    media = attach_payload(spark, sf_dir)
    return media.select(
        "doc_id", "media_type", "n_bytes", F.md5("payload").alias("payload_md5")
    )


def mm_decoded_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub-decoded feature table (rows-only: decode is a deterministic
    fake, not SQL-expressible)."""
    return decode_batch(attach_payload(spark, sf_dir))


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_payload", BinaryType()),
        StructField("resized_checksum", StringType()),
    ]
)


def resize_stub(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Deterministic fake resize: real decode/resample needs media libs
    (decode_real raises NotImplementedError); the stub keeps the
    Spark-side contract — bytes in, smaller bytes out, content a pure
    function of (payload, target dims) — so batch shape, schema, and
    partitioning are exercised for real."""
    budget = max(64, (target_w * target_h) // 64)
    digest = hashlib.sha256(payload + f"{target_w}x{target_h}".encode()).digest()
    reps = budget // len(digest) + 1
    return (digest * reps)[:budget]


def resize_batch(media: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Arrow-batched image resize over image payloads (mapInPandas).

    Only image rows are resized (video goes through frame_sample
    first); output carries the resized payload so a training pipeline
    can write it straight back to parquet."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = pdf["media_type"].str.startswith("image")
            pdf = pdf[mask]
            resized = [resize_stub(p, target_w, target_h) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": target_w,
                    "height": target_h,
                    "resized_payload": resized,
                    "resized_checksum": [
                        hashlib.md5(r).hexdigest() for r in resized
                    ],
                }
            )

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)
