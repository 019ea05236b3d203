"""Multimodal columns: opaque binary payloads + typed metadata.

Model (SURVEY.md §2.10 E4): media travels as a ``binary`` column with
typed metadata columns beside it; all relational ops (join, filter,
dedup-by-checksum, partition) treat the payload as opaque bytes. Decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` — the only
places Python touches data, and they stream batch-by-batch (never a
whole partition in memory).

Decode: formats that decode with nothing beyond the spec — RIFF/WAVE
PCM16, uncompressed/RLE8/palette BMP, and (since r11) zlib-DEFLATE
PNG — decode FOR REAL via the pure-Python codecs in
`operators.media_codec` (the `decode_media` default since round 6,
retiring the original stub); transform-coded formats (JPEG/MP3/H.264)
genuinely need codec libraries this environment doesn't ship and
still raise ``NotImplementedError``. `fake_feature_extract` remains
the format-agnostic deterministic stand-in.
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
    "bmp_pal8_stats",
    "bmp_rle8_stats",
    "bmp_rowsum_stats",
    "bmp_stats",
    "decode_media",
    "fake_feature_extract",
    "mulaw_roundtrip_stats",
    "gif_flip_crop_stats",
    "gif_resize_stats",
    "gif_rowsum_stats",
    "gif_stats",
    "png_flip_crop_stats",
    "png_rcsum_stats",
    "png_resize_stats",
    "png_stats",
    "synth_bmp_pal8_payloads",
    "synth_bmp_topdown_payloads",
    "synth_mulaw_payloads",
    "synth_bmp_payloads",
    "synth_bmp_rle8_payloads",
    "synth_wav_stereo_payloads",
    "synth_gif_interlaced_payloads",
    "synth_gif_payloads",
    "synth_png_adam7_payloads",
    "synth_png_gray_payloads",
    "synth_png_pal8_payloads",
    "synth_png_payloads",
    "synth_png_rgba_payloads",
    "synth_wav_payloads",
    "wav_channel_stats",
    "wav_resample_stats",
    "wav_stats",
    "wav_trim_stats",
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

    `decoder(payload_bytes, media_type) -> list[float]` defaults to
    `media_codec.default_media_decoder`: WAV (RIFF PCM16) and BMP
    (uncompressed 24-bpp) payloads decode for real in pure Python;
    compressed formats raise ``NotImplementedError`` from inside the
    decoder (codec libraries absent from this environment — the gate
    is per-payload and honest, not a stub). The Spark-side contract —
    Arrow batches in, FEATURE_SCHEMA out, streaming iterator (constant
    memory per task) — is exercised by both the real codecs and
    `fake_feature_extract`."""
    if decoder is None:
        from yougile_etl_pipeline_spark.operators.media_codec import (
            default_media_decoder,
        )

        decoder = default_media_decoder

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


# ---------------------------------------------------------------------------
# Real-codec stats operators (round-6 addition, r07 staging bank)
# ---------------------------------------------------------------------------

WAV_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("sum_sq", T.LongType()),
    T.StructField("s_min", T.IntegerType()),
    T.StructField("s_max", T.IntegerType()),
])

BMP_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("px_sum", T.LongType()),
    T.StructField("px_min", T.IntegerType()),
    T.StructField("px_max", T.IntegerType()),
])


def wav_stats(df: DataFrame, id_col: str = "media_id",
              payload_col: str = "payload") -> DataFrame:
    """Exact integer audio statistics from RIFF/WAVE PCM16 payloads —
    the REAL decode path (`media_codec.wav_decode`): magic/chunk/size
    validation, format gate, padding-aware parsing. One streaming
    mapInPandas pass, map-only (no shuffle); all outputs exact ints so
    the op is oracle-pairable when the payload's signal is known."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import wav_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [wav_decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "channels": np.array([r["channels"] for r in rows], "int32"),
                "sample_rate": np.array(
                    [r["sample_rate"] for r in rows], "int32"),
                "n_frames": np.array([r["n_frames"] for r in rows], "int64"),
                "sum_sq": np.array([r["sum_sq"] for r in rows], "int64"),
                # Nullable Int32: wav_decode documents s_min/s_max=None
                # for legal 0-frame payloads — plain np.int32 would
                # TypeError on one empty file and kill the whole job.
                "s_min": pd.array([r["s_min"] for r in rows], dtype="Int32"),
                "s_max": pd.array([r["s_max"] for r in rows], dtype="Int32"),
            })

    return df.mapInPandas(run, WAV_STATS_SCHEMA)


WAV_TRIM_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("first_loud", T.LongType()),
    T.StructField("last_loud", T.LongType()),
    T.StructField("trimmed_len", T.LongType()),
    T.StructField("trimmed_abs_sum", T.LongType()),
])


def wav_trim_stats(df: DataFrame, *, threshold: int = 24576,
                   id_col: str = "media_id",
                   payload_col: str = "payload") -> DataFrame:
    """Leading/trailing silence trim over REAL-decoded WAV payloads —
    the preprocessing step every speech pipeline runs before feature
    extraction, under bit-exact verification: frames with
    |sample| < threshold at the edges are cut, and the op reports the
    kept range's bounds, length, and exact |sample| sum. first/last =
    -1 and zero lengths for all-quiet payloads (no row is dropped —
    the caller decides the fate of silent media). Map-only
    mapInPandas pass on the same decode path as `wav_stats`."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import wav_samples

    def one(payload: bytes) -> tuple[int, int, int, int, int]:
        _ch, _rate, s = wav_samples(payload)
        a = np.abs(s.astype(np.int64))
        loud = np.nonzero(a >= threshold)[0]
        if len(loud) == 0:
            return (len(s), -1, -1, 0, 0)
        lo, hi = int(loud[0]), int(loud[-1])
        return (len(s), lo, hi, hi - lo + 1,
                int(a[lo:hi + 1].sum()))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "n_frames": np.array([r[0] for r in rows], "int32"),
                "first_loud": np.array([r[1] for r in rows], "int64"),
                "last_loud": np.array([r[2] for r in rows], "int64"),
                "trimmed_len": np.array([r[3] for r in rows], "int64"),
                "trimmed_abs_sum": np.array(
                    [r[4] for r in rows], "int64"),
            })

    return df.mapInPandas(run, WAV_TRIM_SCHEMA)


def bmp_stats(df: DataFrame, id_col: str = "media_id",
              payload_col: str = "payload") -> DataFrame:
    """Exact integer image statistics from uncompressed 24-bpp BMP
    payloads — the REAL decode path (`media_codec.bmp_decode`),
    including the bottom-up row order and 4-byte row padding the
    format requires a decoder to undo. Map-only streaming pass."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import bmp_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [bmp_decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "width": np.array([r["width"] for r in rows], "int32"),
                "height": np.array([r["height"] for r in rows], "int32"),
                "px_sum": np.array([r["px_sum"] for r in rows], "int64"),
                # Nullable Int32: bmp_decode yields None extremes for a
                # legal zero-area image (see wav_stats note above).
                "px_min": pd.array([r["px_min"] for r in rows], dtype="Int32"),
                "px_max": pd.array([r["px_max"] for r in rows], dtype="Int32"),
            })

    return df.mapInPandas(run, BMP_STATS_SCHEMA)


def mulaw_roundtrip_stats(df: DataFrame, id_col: str = "media_id",
                          payload_col: str = "payload") -> DataFrame:
    """Exact integer statistics of G.711 µ-law DECODED samples
    (`media_codec.mulaw_decode`) — the engine's first lossy codec,
    kept hash-exact oracle-pairable because the quantizer is pure
    integer math a SQL oracle can state in closed form. Map-only
    streaming pass."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        mulaw_decode,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [mulaw_decode(p).astype(np.int64)
                    for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "n_samples": np.array([len(r) for r in rows], "int64"),
                "dec_sum": np.array([int(r.sum()) for r in rows],
                                    "int64"),
                "dec_min": np.array([int(r.min()) for r in rows],
                                    "int64"),
                "dec_max": np.array([int(r.max()) for r in rows],
                                    "int64"),
            })

    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("n_samples", T.LongType()),
                           T.StructField("dec_sum", T.LongType()),
                           T.StructField("dec_min", T.LongType()),
                           T.StructField("dec_max", T.LongType())])
    return df.mapInPandas(run, schema)


def synth_mulaw_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic µ-law corpus from the SAME closed-form signal as
    `synth_wav_payloads` (n = 50 + id % 100, s[i] = (id·31 + i·17)
    mod 65536 − 32768), compressed through `mulaw_encode` — one byte
    per sample, no container."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        mulaw_encode,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for mid in ids:
                n = 50 + mid % 100
                i = np.arange(n, dtype=np.int64)
                s = (mid * 31 + i * 17) % 65536 - 32768
                payloads.append(mulaw_encode(s))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema)


def synth_wav_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic WAV corpus: one PCM16 mono payload per
    row, generated from the id by a fixed integer formula::

        n        = 50 + id % 100           frames
        rate     = 8000 + (id % 8) * 1000  Hz
        s[i]     = (id*31 + i*17) % 65536 - 32768

    The formula is the point: a SQL oracle can compute the decoded
    statistics in closed form, so `wav_stats` over these payloads
    proves encode → container → decode end-to-end with a hash-exact
    oracle and no binary fixtures."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import wav_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for mid in ids:
                n = 50 + mid % 100
                rate = 8000 + (mid % 8) * 1000
                i = np.arange(n, dtype=np.int64)
                s = ((mid * 31 + i * 17) % 65536 - 32768).astype("<i2")
                payloads.append(wav_encode(s, int(rate)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    # synth + codec work is compute-fanning Python: spread the (tiny)
    # id column across cores before the mapInPandas stage — a no-op at
    # real scale where the scan already has many splits
    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema)


def synth_bmp_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic BMP corpus (24-bpp): per id::

        w            = 4 + id % 5
        h            = 3 + id % 4
        byte(r,c,ch) = (id + 7r + 3c + ch) % 256   (logical top-down,
                                                    ch = B,G,R)

    Encoded through the spec's bottom-up + padded layout, so decoding
    back to the logical grid is a real parse (see `synth_wav_payloads`
    for why the closed-form signal matters)."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import bmp_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for mid in ids:
                w = int(4 + mid % 5)
                h = int(3 + mid % 4)
                r = np.arange(h, dtype=np.int64)[:, None, None]
                c = np.arange(w, dtype=np.int64)[None, :, None]
                ch = np.arange(3, dtype=np.int64)[None, None, :]
                px = ((mid + 7 * r + 3 * c + ch) % 256).astype(np.uint8)
                payloads.append(bmp_encode(px))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    # synth + codec work is compute-fanning Python: spread the (tiny)
    # id column across cores before the mapInPandas stage — a no-op at
    # real scale where the scan already has many splits
    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Round-7 additions: audio resampling + RLE8-compressed image decode
# ---------------------------------------------------------------------------

WAV_RESAMPLE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_in", T.LongType()),
    T.StructField("n_out", T.LongType()),
    T.StructField("rate_out_num", T.LongType()),
    T.StructField("sum_out", T.LongType()),
    T.StructField("sum_sq_out", T.LongType()),
    T.StructField("r_min", T.IntegerType()),
    T.StructField("r_max", T.IntegerType()),
])


def wav_resample_stats(df: DataFrame, up: int, down: int,
                       id_col: str = "media_id",
                       payload_col: str = "payload") -> DataFrame:
    """Decode RIFF/WAVE PCM16 mono, resample by the rational ratio
    ``up/down`` with zero-order hold (`media_codec.pcm_resample_zoh`
    — pure integer index math, the property that keeps the op
    oracle-pairable), and emit exact integer statistics of the
    RESAMPLED signal. ``rate_out_num`` is ``sample_rate · up`` (the
    exact output rate is rate_out_num / down — kept rational so no
    precision is lost when down ∤ rate·up). One streaming mapInPandas
    pass, map-only; nullable extremes for 0-frame inputs, like
    `wav_stats`."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        pcm_resample_zoh,
        wav_samples,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for payload in pdf[payload_col]:
                channels, rate, s = wav_samples(payload)
                if channels != 1:
                    raise ValueError("wav_resample_stats is mono-only")
                r = pcm_resample_zoh(s, up, down)
                r64 = r.astype(np.int64)
                outs.append({
                    "n_in": int(s.size),
                    "n_out": int(r.size),
                    "rate_out_num": rate * up,
                    "sum_out": int(r64.sum()),
                    "sum_sq_out": int((r64 ** 2).sum()),
                    "r_min": int(r.min()) if r.size else None,
                    "r_max": int(r.max()) if r.size else None,
                })
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "n_in": np.array([o["n_in"] for o in outs], "int64"),
                "n_out": np.array([o["n_out"] for o in outs], "int64"),
                "rate_out_num": np.array(
                    [o["rate_out_num"] for o in outs], "int64"),
                "sum_out": np.array([o["sum_out"] for o in outs], "int64"),
                "sum_sq_out": np.array(
                    [o["sum_sq_out"] for o in outs], "int64"),
                "r_min": pd.array([o["r_min"] for o in outs],
                                  dtype="Int32"),
                "r_max": pd.array([o["r_max"] for o in outs],
                                  dtype="Int32"),
            })

    return df.mapInPandas(run, WAV_RESAMPLE_SCHEMA)


def bmp_rle8_stats(df: DataFrame, id_col: str = "media_id",
                   payload_col: str = "payload") -> DataFrame:
    """Exact integer image statistics from BI_RLE8-compressed 8-bpp
    palette BMPs — the engine's first REAL compressed-format decode
    (`media_codec.bmp_rle8_decode`: run/absolute/EOL/EOB escapes, no
    codec library needed). Statistics are over palette indices (the
    synth corpus writes the grayscale identity palette, so index ==
    gray). Map-only streaming pass; the decoder folds runs in O(1)
    per run, so a pathological flat image costs O(w) not O(w·h)."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        bmp_rle8_decode,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [bmp_rle8_decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "width": np.array([r["width"] for r in rows], "int32"),
                "height": np.array([r["height"] for r in rows], "int32"),
                "px_sum": np.array([r["px_sum"] for r in rows], "int64"),
                "px_min": pd.array([r["px_min"] for r in rows],
                                   dtype="Int32"),
                "px_max": pd.array([r["px_max"] for r in rows],
                                   dtype="Int32"),
            })

    return df.mapInPandas(run, BMP_STATS_SCHEMA)


def bmp_pal8_stats(df: DataFrame, id_col: str = "media_id",
                   payload_col: str = "payload") -> DataFrame:
    """Exact integer image statistics from UNCOMPRESSED 8-bpp palette
    BMPs with a real (non-identity) color table
    (`media_codec.bmp_pal8_decode`): every index resolves through the
    palette and statistics cover the resolved (B, G, R) bytes — the
    color-table walk the RLE8 entry's identity palette never
    exercises. Map-only streaming pass."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        bmp_pal8_decode,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [bmp_pal8_decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "width": np.array([r["width"] for r in rows], "int32"),
                "height": np.array([r["height"] for r in rows], "int32"),
                "px_sum": np.array([r["px_sum"] for r in rows], "int64"),
                "px_min": pd.array([r["px_min"] for r in rows],
                                   dtype="Int32"),
                "px_max": pd.array([r["px_max"] for r in rows],
                                   dtype="Int32"),
            })

    return df.mapInPandas(run, BMP_STATS_SCHEMA)


def synth_bmp_pal8_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic palette-BMP corpus: per id::

        w           = 5 + id % 6
        h           = 2 + id % 4
        idx(r,c)    = (id + 3*r + 2*c) % 256      (logical top-down)
        palette[i]  = ((3i+1)%256, (5i+2)%256, (7i+3)%256)  as (B,G,R)

    The palette is closed-form but NON-identity, so decode statistics
    differ from index statistics exactly when the color-table lookup
    is honored — a SQL oracle computes the resolved-channel stats
    from the two formulas without seeing a byte (the
    `synth_wav_payloads` proof pattern)."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        bmp_encode_pal8,
    )

    i = np.arange(256, dtype=np.int64)
    palette = np.stack([(3 * i + 1) % 256,
                        (5 * i + 2) % 256,
                        (7 * i + 3) % 256], axis=1).astype(np.uint8)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for mid in ids:
                w = int(5 + mid % 6)
                h = int(2 + mid % 4)
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                px = ((mid + 3 * r + 2 * c) % 256).astype(np.uint8)
                payloads.append(bmp_encode_pal8(px, palette))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema)


def synth_bmp_rle8_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic RLE8 BMP corpus: per id::

        w           = 6 + id % 7
        h           = 2 + id % 5
        run_len     = 1 + id % 4
        pixel(r,c)  = (id + 5*r + c div run_len) % 23   (logical
                      top-down palette indices)

    Horizontal runs of `run_len` equal indices make the RLE encoding
    non-trivial (multi-pixel encoded runs, not just literal pairs),
    and the closed-form index formula lets a SQL oracle compute the
    decoded statistics without seeing a byte — same proof pattern as
    `synth_wav_payloads`."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        bmp_encode_rle8,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for mid in ids:
                w = int(6 + mid % 7)
                h = int(2 + mid % 5)
                rl = int(1 + mid % 4)
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                px = ((mid + 5 * r + c // rl) % 23).astype(np.uint8)
                payloads.append(bmp_encode_rle8(px))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    # synth + codec work is compute-fanning Python: spread the (tiny)
    # id column across cores before the mapInPandas stage — a no-op at
    # real scale where the scan already has many splits
    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Round-10 additions: nearest-neighbor image resize + framed audio energy
# ---------------------------------------------------------------------------

BMP_RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("src_w", T.IntegerType()),
    T.StructField("src_h", T.IntegerType()),
    T.StructField("out_sum", T.LongType()),
    T.StructField("out_min", T.IntegerType()),
    T.StructField("out_max", T.IntegerType()),
])


def bmp_resize_stats(df: DataFrame, dst_h: int, dst_w: int,
                     id_col: str = "media_id",
                     payload_col: str = "payload") -> DataFrame:
    """Decode 24-bpp BMP payloads, nearest-neighbor resize to a fixed
    ``dst_h x dst_w`` thumbnail (`media_codec.resize_nearest` — pure
    integer floor-index selection, no interpolation), and report exact
    integer statistics of the RESIZED grid. The thumbnail/preprocess
    step of an image training pipeline, with the resize itself under
    bit-exact oracle verification because the index map is closed-form
    integer arithmetic.

    Map-only streaming `mapInPandas` pass — no shuffle; at 100 TB this
    is a single scan-transform stage whose parallelism is the input
    split count."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        bmp_decode_pixels,
        resize_nearest,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs = [bmp_decode_pixels(p) for p in pdf[payload_col]]
            outs = [resize_nearest(px, dst_h, dst_w) for px in srcs]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "src_w": np.array([p.shape[1] for p in srcs], "int32"),
                "src_h": np.array([p.shape[0] for p in srcs], "int32"),
                "out_sum": np.array(
                    [int(o.astype(np.int64).sum()) for o in outs],
                    "int64"),
                "out_min": np.array([int(o.min()) for o in outs],
                                    "int32"),
                "out_max": np.array([int(o.max()) for o in outs],
                                    "int32"),
            })

    return df.mapInPandas(run, BMP_RESIZE_SCHEMA)


WAV_FRAME_ENERGY_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("e_max", T.LongType()),
    T.StructField("f_argmax", T.LongType()),
    T.StructField("n_quiet", T.LongType()),
])


def wav_frame_energy(df: DataFrame, frame: int = 32,
                     quiet_threshold: int = 10_000_000_000,
                     id_col: str = "media_id",
                     payload_col: str = "payload") -> DataFrame:
    """Framed audio energy over RIFF/WAVE PCM16 payloads — the feature
    extraction behind voice-activity detection and silence trimming:
    split the decoded signal into fixed non-overlapping frames (the
    final frame may be short), per-frame energy = exact int64 sum of
    squared samples, then per media the frame count, the peak energy,
    the FIRST peak frame index, and the count of "quiet" frames below
    ``quiet_threshold``.

    Everything is integer (energy of a 32-sample PCM16 frame is
    <= 32·32768² ≈ 3.4·10¹⁰, far under int64), so the whole feature is
    oracle-pairable in closed form over the synthetic signal. Map-only
    streaming pass, no shuffle."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        wav_samples,
    )

    def one(payload: bytes) -> tuple[int, int, int, int, int]:
        _ch, _rate, s = wav_samples(payload)
        s = s.astype(np.int64)
        n = len(s)
        n_frames = -(-n // frame) if n else 0
        if n_frames == 0:
            return 0, 0, 0, 0, 0
        pad = n_frames * frame - n
        sq = np.pad(s * s, (0, pad))
        en = sq.reshape(n_frames, frame).sum(axis=1)
        return (n, n_frames, int(en.max()), int(np.argmax(en)),
                int((en < quiet_threshold).sum()))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "n_samples": np.array([r[0] for r in rows], "int64"),
                "n_frames": np.array([r[1] for r in rows], "int64"),
                "e_max": np.array([r[2] for r in rows], "int64"),
                "f_argmax": np.array([r[3] for r in rows], "int64"),
                "n_quiet": np.array([r[4] for r in rows], "int64"),
            })

    return df.mapInPandas(run, WAV_FRAME_ENERGY_SCHEMA)


def bmp_flip_crop_stats(df: DataFrame, crop_h: int, crop_w: int,
                        id_col: str = "media_id",
                        payload_col: str = "payload") -> DataFrame:
    """Horizontal mirror + centered crop over decoded 24-bpp BMPs —
    the augmentation pair every image training pipeline runs, with
    both transforms pure index arithmetic (flip: c' = w−1−c; crop:
    offset (dim − crop) div 2) so the transformed grid stays
    bit-exactly oracle-pairable like `bmp_resize_stats`. Map-only
    streaming pass; raises if any image is smaller than the crop."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        bmp_decode_pixels,
    )

    def one(payload: bytes) -> tuple[int, int, int, int, int]:
        px = bmp_decode_pixels(payload)
        h, w = px.shape[0], px.shape[1]
        if h < crop_h or w < crop_w:
            raise ValueError(
                f"image {w}x{h} smaller than crop {crop_w}x{crop_h}")
        r0 = (h - crop_h) // 2
        c0 = (w - crop_w) // 2
        out = px[:, ::-1][r0:r0 + crop_h, c0:c0 + crop_w]
        o64 = out.astype(np.int64)
        return (w, h, int(o64.sum()), int(out.min()), int(out.max()))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "src_w": np.array([r[0] for r in rows], "int32"),
                "src_h": np.array([r[1] for r in rows], "int32"),
                "out_sum": np.array([r[2] for r in rows], "int64"),
                "out_min": np.array([r[3] for r in rows], "int32"),
                "out_max": np.array([r[4] for r in rows], "int32"),
            })

    return df.mapInPandas(run, BMP_RESIZE_SCHEMA)


WAV_PEAKNORM_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("peak", T.LongType()),
    T.StructField("norm_sum", T.LongType()),
    T.StructField("norm_max", T.LongType()),
])


def wav_peak_normalize_stats(df: DataFrame,
                             id_col: str = "media_id",
                             payload_col: str = "payload") -> DataFrame:
    """Peak (magnitude) normalization audit over RIFF/WAVE PCM16
    payloads — the gain-staging preprocess before audio feature
    extraction: each sample magnitude rescales to the int16 full
    scale, ``|s|·32767 div peak`` with ``peak = max(|s|)``, all in
    exact non-negative int64 (floor division on non-negative operands
    is identical in Spark, DuckDB, and numpy — signed division is NOT,
    so the op normalizes magnitudes by design). Reports per media the
    peak and the normalized-magnitude sum/max (max = 32767 whenever
    the payload is non-silent). Map-only streaming pass."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        wav_samples,
    )

    def one(payload: bytes) -> tuple[int, int, int, int]:
        _ch, _rate, s = wav_samples(payload)
        a = np.abs(s.astype(np.int64))
        n = len(a)
        if n == 0:
            return 0, 0, 0, 0
        peak = int(a.max())
        if peak == 0:
            return n, 0, 0, 0
        norm = (a * 32767) // peak
        return n, peak, int(norm.sum()), int(norm.max())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "n_samples": np.array([r[0] for r in rows], "int64"),
                "peak": np.array([r[1] for r in rows], "int64"),
                "norm_sum": np.array([r[2] for r in rows], "int64"),
                "norm_max": np.array([r[3] for r in rows], "int64"),
            })

    return df.mapInPandas(run, WAV_PEAKNORM_SCHEMA)


# ---------------------------------------------------------------------------
# Round-11: PNG — real DEFLATE-compressed image decode (VERDICT r10 #6)
# ---------------------------------------------------------------------------

PNG_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("px_sum", T.LongType()),
    T.StructField("px_min", T.IntegerType()),
    T.StructField("px_max", T.IntegerType()),
    T.StructField("n_filter_kinds", T.IntegerType()),
])


def synth_png_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic PNG corpus (8-bit truecolor). Per id::

        w             = 5 + id % 4
        h             = 3 + id % 4
        byte(r,c,ch)  = (id + 11r + 5c + 3ch) % 256   (logical
                                                       top-down, RGB)
        row r filter  = (r + id) % 5

    The id-seeded filter cycle means every spec filter (None, Sub, Up,
    Average, Paeth) appears across the corpus even on 3-row images, so
    the zlib-inflate + per-filter reconstruction path is what the
    closed-form oracle actually certifies (see `synth_wav_payloads`
    for why the closed-form signal matters)."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import png_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for mid in ids:
                w = int(5 + mid % 4)
                h = int(3 + mid % 4)
                r = np.arange(h, dtype=np.int64)[:, None, None]
                c = np.arange(w, dtype=np.int64)[None, :, None]
                ch = np.arange(3, dtype=np.int64)[None, None, :]
                px = ((mid + 11 * r + 5 * c + 3 * ch) % 256).astype(np.uint8)
                payloads.append(png_encode(px, filter_seed=int(mid)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema)


def synth_bmp_topdown_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic TOP-DOWN BMP corpus (negative height
    field, rows stored in logical order — the in-the-wild orientation
    variant). Per id::

        w             = 5 + id % 4
        h             = 4 + id % 3
        byte(r,c,ch)  = (id + 8r + 5c + 2ch) % 256
    """
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import bmp_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for mid in ids:
                w = int(5 + mid % 4)
                h = int(4 + mid % 3)
                r = np.arange(h, dtype=np.int64)[:, None, None]
                c = np.arange(w, dtype=np.int64)[None, :, None]
                ch = np.arange(3, dtype=np.int64)[None, None, :]
                px = ((mid + 8 * r + 5 * c + 2 * ch) % 256).astype(np.uint8)
                payloads.append(bmp_encode(px, topdown=True))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema)


BMP_ROWSUM_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("px_sum", T.LongType()),
    T.StructField("row_weighted_sum", T.LongType()),
])


def bmp_rowsum_stats(df: DataFrame, id_col: str = "media_id",
                     payload_col: str = "payload") -> DataFrame:
    """BMP decode to ROW-SENSITIVE statistics (Σ (r+1)·byte over the
    LOGICAL grid): a plain pixel sum cannot distinguish correct
    orientation handling from reading the rows as stored, which is
    precisely what the top-down/bottom-up branch changes. Map-only
    mapInPandas pass."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        bmp_decode_pixels,
    )

    def one(payload: bytes) -> tuple[int, int, int, int]:
        px = bmp_decode_pixels(payload).astype(np.int64)
        h, w = px.shape[0], px.shape[1]
        rw = np.arange(1, h + 1, dtype=np.int64)[:, None, None]
        return (w, h, int(px.sum()), int((rw * px).sum()))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "width": np.array([r[0] for r in rows], "int32"),
                "height": np.array([r[1] for r in rows], "int32"),
                "px_sum": np.array([r[2] for r in rows], "int64"),
                "row_weighted_sum": np.array(
                    [r[3] for r in rows], "int64"),
            })

    return df.mapInPandas(run, BMP_ROWSUM_SCHEMA)


def synth_wav_stereo_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic STEREO WAV corpus (PCM16, 2 channels,
    frame-major interleave). Per id::

        n     = 40 + id % 60                      frames
        L[i]  = (id*13 + i*11) % 65536 - 32768
        R[i]  = (id*17 + i*23) % 65536 - 32768

    Distinct per-channel formulas so a de-interleave that swaps or
    merges channels cannot alias into a hash match."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import wav_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for mid in ids:
                n = int(40 + mid % 60)
                i = np.arange(n, dtype=np.int64)
                left = (mid * 13 + i * 11) % 65536 - 32768
                right = (mid * 17 + i * 23) % 65536 - 32768
                inter = np.empty(2 * n, dtype=np.int64)
                inter[0::2] = left
                inter[1::2] = right
                payloads.append(
                    wav_encode(inter.astype("<i2"), 16000, channels=2))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema)


WAV_CHANNEL_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("left_sum", T.LongType()),
    T.StructField("right_sum", T.LongType()),
    T.StructField("left_sumsq", T.LongType()),
    T.StructField("right_sumsq", T.LongType()),
])


def wav_channel_stats(df: DataFrame, id_col: str = "media_id",
                      payload_col: str = "payload") -> DataFrame:
    """Per-CHANNEL exact statistics over stereo WAV payloads: the
    frame-major de-interleave (s[0::2] / s[1::2]) is what this proves
    — `wav_stats`' whole-stream sums are interleave-invariant and
    could not catch a channel mix-up. Map-only mapInPandas pass."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import wav_samples

    def one(payload: bytes) -> tuple[int, int, int, int, int]:
        ch, _rate, s = wav_samples(payload)
        if ch != 2:
            raise ValueError(f"expected stereo payload, got {ch} channel(s)")
        s64 = s.astype(np.int64)
        left, right = s64[0::2], s64[1::2]
        return (len(left), int(left.sum()), int(right.sum()),
                int((left * left).sum()), int((right * right).sum()))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "n_frames": np.array([r[0] for r in rows], "int64"),
                "left_sum": np.array([r[1] for r in rows], "int64"),
                "right_sum": np.array([r[2] for r in rows], "int64"),
                "left_sumsq": np.array([r[3] for r in rows], "int64"),
                "right_sumsq": np.array([r[4] for r in rows], "int64"),
            })

    return df.mapInPandas(run, WAV_CHANNEL_SCHEMA)


def synth_png_gray_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic PNG corpus (8-bit GRAYSCALE, color type
    0 — one byte per pixel, so the Sub/Paeth left-neighbor distance is
    1 instead of 3). Per id::

        w          = 6 + id % 5
        h          = 3 + id % 3
        byte(r,c)  = (id + 13r + 7c) % 256   (logical top-down)
        row r filter = (r + id) % 5

    Distinct dimension/signal constants from the truecolor corpus so a
    dispatch bug between the profiles cannot alias into a hash match."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import png_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for mid in ids:
                w = int(6 + mid % 5)
                h = int(3 + mid % 3)
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                px = ((mid + 13 * r + 7 * c) % 256).astype(np.uint8)
                payloads.append(png_encode(px, filter_seed=int(mid)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema)


def synth_png_rgba_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic PNG corpus (8-bit RGBA, color type 6 —
    four bytes per pixel; the alpha channel rides the same filter
    reconstruction as the color bytes). Per id::

        w             = 4 + id % 3
        h             = 3 + id % 4
        byte(r,c,ch)  = (id + 11r + 5c + 3ch) % 256   (ch ∈ 0..3)
        row r filter  = (r + id) % 5
    """
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import png_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for mid in ids:
                w = int(4 + mid % 3)
                h = int(3 + mid % 4)
                r = np.arange(h, dtype=np.int64)[:, None, None]
                c = np.arange(w, dtype=np.int64)[None, :, None]
                ch = np.arange(4, dtype=np.int64)[None, None, :]
                px = ((mid + 11 * r + 5 * c + 3 * ch) % 256).astype(np.uint8)
                payloads.append(png_encode(px, filter_seed=int(mid)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema)


def synth_png_adam7_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic ADAM7-interlaced PNG corpus (8-bit
    grayscale, IHDR interlace byte 1 — seven independently filtered
    pass groups). Per id::

        w          = 9 + id % 4     (>= 9: every pass has columns)
        h          = 6 + id % 5     (>= 6: every pass has rows)
        byte(r,c)  = (id + 11r + 6c) % 256
        scanline s filter = (s + id) % 5   (GLOBAL counter across passes)
    """
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import png_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for mid in ids:
                w = int(9 + mid % 4)
                h = int(6 + mid % 5)
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                px = ((mid + 11 * r + 6 * c) % 256).astype(np.uint8)
                payloads.append(png_encode(px, filter_seed=int(mid),
                                           interlaced=True))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema)


def synth_png_pal8_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic PALETTE PNG corpus (color type 3, PLTE
    chunk + 1-byte-per-pixel filtered scanlines). Per id::

        w            = 6 + id % 5
        h            = 3 + id % 4
        index(r, c)  = (id + 7r + 5c) % 256
        palette[i]   = ((3i) % 256, (5i) % 256, (7i) % 256)
        row r filter = (r + id) % 5

    The palette is deliberately NON-identity so a decode that skips
    the PLTE lookup (returning raw indices) cannot alias into a hash
    match."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        png_encode_pal8,
    )

    i = np.arange(256, dtype=np.int64)
    pal = np.stack([(3 * i) % 256, (5 * i) % 256, (7 * i) % 256],
                   axis=1).astype(np.uint8)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for mid in ids:
                w = int(6 + mid % 5)
                h = int(3 + mid % 4)
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                idx = ((mid + 7 * r + 5 * c) % 256).astype(np.uint8)
                payloads.append(
                    png_encode_pal8(idx, pal, filter_seed=int(mid)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema)


PNG_RCSUM_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("px_sum", T.LongType()),
    T.StructField("rc_weighted_sum", T.LongType()),
    T.StructField("n_filter_kinds", T.IntegerType()),
])


def png_rcsum_stats(df: DataFrame, id_col: str = "media_id",
                    payload_col: str = "payload") -> DataFrame:
    """PNG decode to POSITION-SENSITIVE statistics:
    ``rc_weighted_sum`` = Σ (r+1)·(c+1)·value over every channel byte
    of the logical grid. Adam7 permutes pixels in BOTH dimensions, so
    neither a plain sum nor a row-weighted sum can prove the
    seven-pass scatter landed every pixel at its true (r, c) — the
    bilinear weighting can. Map-only mapInPandas pass."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        png_decode_pixels,
    )

    def one(payload: bytes) -> tuple[int, int, int, int, int]:
        px, kinds = png_decode_pixels(payload)
        g = px.astype(np.int64)
        h, w = g.shape[0], g.shape[1]
        rw = np.arange(1, h + 1, dtype=np.int64)[:, None, None]
        cw = np.arange(1, w + 1, dtype=np.int64)[None, :, None]
        return (w, h, int(g.sum()), int((rw * cw * g).sum()), kinds)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "width": np.array([r[0] for r in rows], "int32"),
                "height": np.array([r[1] for r in rows], "int32"),
                "px_sum": np.array([r[2] for r in rows], "int64"),
                "rc_weighted_sum": np.array(
                    [r[3] for r in rows], "int64"),
                "n_filter_kinds": np.array(
                    [r[4] for r in rows], "int32"),
            })

    return df.mapInPandas(run, PNG_RCSUM_SCHEMA)


def png_stats(df: DataFrame, id_col: str = "media_id",
              payload_col: str = "payload") -> DataFrame:
    """Exact integer image statistics from PNG payloads — the REAL
    decode path (`media_codec.png_decode`: chunk walk with CRC32
    verification, zlib inflate, all five scanline-filter
    reconstructions). `n_filter_kinds` counts the distinct filter
    types undone per payload, so the oracle hash-checks that the
    filter machinery ran. Map-only streaming pass."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import png_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [png_decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "width": np.array([r["width"] for r in rows], "int32"),
                "height": np.array([r["height"] for r in rows], "int32"),
                "px_sum": np.array([r["px_sum"] for r in rows], "int64"),
                "px_min": np.array([r["px_min"] for r in rows], "int32"),
                "px_max": np.array([r["px_max"] for r in rows], "int32"),
                "n_filter_kinds": np.array(
                    [r["n_filter_kinds"] for r in rows], "int32"),
            })

    return df.mapInPandas(run, PNG_STATS_SCHEMA)


def png_resize_stats(df: DataFrame, dst_h: int, dst_w: int,
                     id_col: str = "media_id",
                     payload_col: str = "payload") -> DataFrame:
    """Decode PNG payloads (real chunk/CRC/inflate/filter path),
    nearest-neighbor resize to a fixed thumbnail, and report exact
    integer statistics of the RESIZED grid — the compressed-input
    twin of `bmp_resize_stats`, proving the decode output feeds the
    transform tier like any uncompressed grid. Map-only mapInPandas
    pass."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        png_decode_pixels,
        resize_nearest,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs = [png_decode_pixels(p)[0] for p in pdf[payload_col]]
            outs = [resize_nearest(px, dst_h, dst_w) for px in srcs]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "src_w": np.array([p.shape[1] for p in srcs], "int32"),
                "src_h": np.array([p.shape[0] for p in srcs], "int32"),
                "out_sum": np.array(
                    [int(o.astype(np.int64).sum()) for o in outs],
                    "int64"),
                "out_min": np.array([int(o.min()) for o in outs],
                                    "int32"),
                "out_max": np.array([int(o.max()) for o in outs],
                                    "int32"),
            })

    return df.mapInPandas(run, BMP_RESIZE_SCHEMA)


def png_flip_crop_stats(df: DataFrame, crop_h: int, crop_w: int,
                        id_col: str = "media_id",
                        payload_col: str = "payload") -> DataFrame:
    """Horizontal mirror + centered crop over REAL-decoded PNGs — the
    augmentation pair of `bmp_flip_crop_stats` fed by the
    DEFLATE-compressed decode path (CRC walk, inflate, all five
    scanline filters). Same pure index arithmetic (flip: c' = w−1−c;
    crop offset (dim − crop) div 2), so the transformed grid stays
    bit-exactly oracle-pairable. Map-only streaming pass; raises if
    any image is smaller than the crop."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        png_decode_pixels,
    )

    def one(payload: bytes) -> tuple[int, int, int, int, int]:
        px, _kinds = png_decode_pixels(payload)
        h, w = px.shape[0], px.shape[1]
        if h < crop_h or w < crop_w:
            raise ValueError(
                f"image {w}x{h} smaller than crop {crop_w}x{crop_h}")
        r0 = (h - crop_h) // 2
        c0 = (w - crop_w) // 2
        out = px[:, ::-1][r0:r0 + crop_h, c0:c0 + crop_w]
        o64 = out.astype(np.int64)
        return (w, h, int(o64.sum()), int(out.min()), int(out.max()))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "src_w": np.array([r[0] for r in rows], "int32"),
                "src_h": np.array([r[1] for r in rows], "int32"),
                "out_sum": np.array([r[2] for r in rows], "int64"),
                "out_min": np.array([r[3] for r in rows], "int32"),
                "out_max": np.array([r[4] for r in rows], "int32"),
            })

    return df.mapInPandas(run, BMP_RESIZE_SCHEMA)


GIF_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("px_sum", T.LongType()),
    T.StructField("px_min", T.IntegerType()),
    T.StructField("px_max", T.IntegerType()),
    T.StructField("used_dict", T.BooleanType()),
])


def synth_gif_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic grayscale GIF corpus (round 12 — the
    LZW class, after r11's DEFLATE/PNG). Per id::

        w          = 10 + id % 6
        h          = 3 + id % 4
        gray(r, c) = (id + 7r + 3·(c div 5)) % 256

    The ``c div 5`` term builds 5-pixel runs inside every row, so the
    LZW dictionary genuinely compresses (and the decoder's
    dictionary-reconstruction path provably runs — `used_dict` in
    `gif_stats`); the closed-form signal is what the SQL oracle
    computes directly (the `synth_wav_payloads` scheme)."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import gif_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for mid in ids:
                w = int(10 + mid % 6)
                h = int(3 + mid % 4)
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                px = ((mid + 7 * r + 3 * (c // 5)) % 256).astype(np.uint8)
                payloads.append(gif_encode(px))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema)


def synth_gif_interlaced_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic INTERLACED GIF corpus (Appendix-E
    four-pass row order, image-descriptor flag 0x40). Per id::

        w          = 8 + id % 5
        h          = 5 + id % 6      (>= 5, so all four passes carry rows)
        gray(r, c) = (id + 9r + 3·(c div 4)) % 256

    The ``c div 4`` runs keep the LZW dictionary genuinely compressing
    (the `synth_gif_payloads` device); distinct dimension/signal
    constants from the sequential corpus so a deinterlacing bug cannot
    alias into a hash match."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import gif_encode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for mid in ids:
                w = int(8 + mid % 5)
                h = int(5 + mid % 6)
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(w, dtype=np.int64)[None, :]
                px = ((mid + 9 * r + 3 * (c // 4)) % 256).astype(np.uint8)
                payloads.append(gif_encode(px, interlaced=True))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    from yougile_etl_pipeline_spark.sources.tables import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema)


GIF_ROWSUM_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("px_sum", T.LongType()),
    T.StructField("row_weighted_sum", T.LongType()),
    T.StructField("used_dict", T.BooleanType()),
])


def gif_rowsum_stats(df: DataFrame, id_col: str = "media_id",
                     payload_col: str = "payload") -> DataFrame:
    """GIF decode to ROW-SENSITIVE statistics: ``row_weighted_sum`` =
    Σ (r+1)·gray(r, c) over the logical grid. A plain px_sum is
    row-permutation-INVARIANT, so it cannot distinguish a correct
    Appendix-E deinterlace from reading the storage order as-is — the
    row weighting is exactly what makes an interlaced decode
    hash-provable. Map-only mapInPandas pass."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        gif_decode_pixels,
    )

    def one(payload: bytes) -> tuple[int, int, int, int, bool]:
        grid, palette, n_dict = gif_decode_pixels(payload)
        gray = palette[grid, 0].astype(np.int64)
        h, w = gray.shape
        weights = np.arange(1, h + 1, dtype=np.int64)[:, None]
        return (w, h, int(gray.sum()), int((weights * gray).sum()),
                n_dict > 0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "width": np.array([r[0] for r in rows], "int32"),
                "height": np.array([r[1] for r in rows], "int32"),
                "px_sum": np.array([r[2] for r in rows], "int64"),
                "row_weighted_sum": np.array(
                    [r[3] for r in rows], "int64"),
                "used_dict": [r[4] for r in rows],
            })

    return df.mapInPandas(run, GIF_ROWSUM_SCHEMA)


def gif_stats(df: DataFrame, id_col: str = "media_id",
              payload_col: str = "payload") -> DataFrame:
    """Exact integer image statistics from GIF payloads — the REAL
    decode path (`media_codec.gif_decode`: header/screen-descriptor
    parse, global color table, variable-width LZW expansion with
    dictionary reconstruction, trailer check). `used_dict` is true
    when the payload's LZW stream consumed at least one
    dictionary-built code — the per-payload proof the Welch machinery
    ran, not just literal passthrough. Map-only streaming pass."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import gif_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [gif_decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "width": np.array([r["width"] for r in rows], "int32"),
                "height": np.array([r["height"] for r in rows], "int32"),
                "px_sum": np.array([r["px_sum"] for r in rows], "int64"),
                "px_min": np.array([r["px_min"] for r in rows], "int32"),
                "px_max": np.array([r["px_max"] for r in rows], "int32"),
                "used_dict": np.array(
                    [r["n_dict_codes"] > 0 for r in rows], "bool"),
            })

    return df.mapInPandas(run, GIF_STATS_SCHEMA)


GIF_GRID_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("px_sum", T.LongType()),
    T.StructField("px_min", T.IntegerType()),
    T.StructField("px_max", T.IntegerType()),
])


def _gif_grid_stats(df: DataFrame, transform, out_w: int, out_h: int,
                    id_col: str, payload_col: str) -> DataFrame:
    """Shared map-only pass: real GIF decode → a pure-index-arithmetic
    grid transform → exact integer stats (the PNG-tier template)."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        gif_decode_pixels,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sums, mins, maxs = [], [], []
            for p in pdf[payload_col]:
                grid, palette, _ = gif_decode_pixels(p)
                gray = palette[grid, 0]
                t = transform(gray).astype(np.int64)
                sums.append(int(t.sum()))
                mins.append(int(t.min()))
                maxs.append(int(t.max()))
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "width": np.full(len(pdf), out_w, "int32"),
                "height": np.full(len(pdf), out_h, "int32"),
                "px_sum": np.array(sums, "int64"),
                "px_min": np.array(mins, "int32"),
                "px_max": np.array(maxs, "int32"),
            })

    return df.mapInPandas(run, GIF_GRID_STATS_SCHEMA)


def gif_resize_stats(df: DataFrame, dst_h: int, dst_w: int,
                     id_col: str = "media_id",
                     payload_col: str = "payload") -> DataFrame:
    """Decode GIF payloads (real LZW path) and nearest-neighbor resize
    to a fixed thumbnail — output cell (r, c) takes source cell
    ``((r·h) div dst_h, (c·w) div dst_w)``, the same floor-index map
    the SQL oracle states (`media_codec.resize_nearest` semantics on
    the gray grid). Exact integer stats of the RESIZED grid."""
    from yougile_etl_pipeline_spark.operators.media_codec import (
        resize_nearest,
    )

    return _gif_grid_stats(
        df, lambda g: resize_nearest(g, dst_h, dst_w),
        dst_w, dst_h, id_col, payload_col)


def gif_flip_crop_stats(df: DataFrame, crop_h: int, crop_w: int,
                        id_col: str = "media_id",
                        payload_col: str = "payload") -> DataFrame:
    """Decode GIF payloads, mirror horizontally, then take the
    centered (crop_h, crop_w) window — the augmentation pair of the
    PNG tier (`mm_png_flip_crop`), on the LZW decode path. Output
    pixel (r, c) is source ``(r0 + r, w − 1 − (c0 + c))`` with
    ``r0 = (h − crop_h) div 2, c0 = (w − crop_w) div 2`` — pure index
    arithmetic, so the closed-form oracle states the same cells."""
    def t(gray):
        h, w = gray.shape
        if h < crop_h or w < crop_w:
            raise ValueError(
                f"crop {crop_h}x{crop_w} exceeds image {h}x{w}")
        r0 = (h - crop_h) // 2
        c0 = (w - crop_w) // 2
        return gray[:, ::-1][r0:r0 + crop_h, c0:c0 + crop_w]

    return _gif_grid_stats(df, t, crop_w, crop_h, id_col, payload_col)
