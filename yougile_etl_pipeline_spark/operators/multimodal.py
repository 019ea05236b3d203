"""Multimodal columns: opaque binary payloads + typed metadata.

Model (SURVEY.md §2.10 E4): media travels as a ``binary`` column with
typed metadata columns beside it; all relational ops (join, filter,
dedup-by-checksum, partition) treat the payload as opaque bytes. Decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` — the only
places Python touches data, and they stream batch-by-batch (never a
whole partition in memory).

The actual image/audio decode is STUBBED: the container has no codec
libraries, so `decode_media` raises ``NotImplementedError`` unless a
decoder is injected; `fake_feature_extract` is the deterministic stand-in
that keeps the Spark-side plumbing (schema, batching, partitioning)
real and testable.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_binary_payload",
    "binary_metadata",
    "decode_media",
    "fake_feature_extract",
]

# Canonical multimodal table shape: payload + typed metadata.
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("media_type", T.StringType()),   # 'image' | 'audio' | ...
    T.StructField("n_bytes", T.LongType()),
    T.StructField("checksum", T.StringType()),     # md5 hex of payload
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.DoubleType())),
    T.StructField("n_bytes", T.LongType()),
])


def attach_binary_payload(df: DataFrame, src_col: str,
                          id_col: str) -> DataFrame:
    """Demo constructor: utf-8-encode a string column into a binary
    payload column with metadata (real pipelines read payloads via
    ``spark.read.format('binaryFile')`` or parquet binary columns)."""
    payload = F.encode(F.col(src_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit("text").alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata over an opaque payload — pure JVM expressions, no
    decode: size, checksum, magic-byte prefix."""
    p = F.col(payload_col)
    return df.withColumns({
        "n_bytes": F.octet_length(p).cast("long"),
        "checksum": F.md5(p),
        "magic": F.hex(F.substring(p, 1, 4)),
    })


def decode_media(df: DataFrame,
                 decoder: Callable[[bytes, str], list[float]] | None = None,
                 batch_size_hint: int = 256) -> DataFrame:
    """Decode payloads into fixed-shape feature vectors via mapInPandas.

    `decoder(payload_bytes, media_type) -> list[float]` is injected; no
    codec libraries ship in this environment, so calling without one
    raises ``NotImplementedError`` (clearly-marked stub per the build
    contract). The Spark-side contract — Arrow batches in, FEATURE_SCHEMA
    out, streaming iterator (constant memory per task) — is real and
    exercised by `fake_feature_extract`."""
    if decoder is None:
        raise NotImplementedError(
            "media decode requires a codec library not present in this "
            "environment; inject `decoder` or use fake_feature_extract()"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p, t) for p, t in
                     zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "feature": feats,
                "n_bytes": pdf["payload"].map(len),
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_offset", T.LongType()),
    T.StructField("frame_checksum", T.StringType()),
])


def fake_frame_sample(df: DataFrame, n_frames: int = 3) -> DataFrame:
    """Frame-sampling plumbing: N output rows per media row (the
    one-to-many decode shape of video frame extraction / audio chunking),
    via the same streaming ``mapInPandas`` contract. The "frame" is a
    deterministic byte-slice stand-in (no codecs in this environment);
    offsets split the payload into `n_frames` even chunks, checksummed
    with md5 so the result is oracle-checkable."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [],
                                    "frame_offset": [], "frame_checksum": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                size = len(payload)
                for i in range(n_frames):
                    off = (size * i) // n_frames
                    end = (size * (i + 1)) // n_frames
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(off)
                    out["frame_checksum"].append(
                        hashlib.md5(payload[off:end]).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)


def fake_feature_extract(df: DataFrame) -> DataFrame:
    """Deterministic stand-in decoder: 4-dim feature from byte statistics
    (length, first byte, last byte, byte sum mod 997). Exercises the real
    mapInPandas path end-to-end."""
    def fake(payload: bytes, _media_type: str) -> list[float]:
        if len(payload) == 0:
            return [0.0, 0.0, 0.0, 0.0]
        return [float(len(payload)), float(payload[0]),
                float(payload[-1]), float(sum(payload) % 997)]

    return decode_media(df, decoder=fake)
