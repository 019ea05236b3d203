"""Pure-Python WAV/BMP codecs (operators/media_codec.py) + the Spark
decode operators over them (operators/multimodal.py) — the round-6
retirement of the tree's decode stub, staged for r07 registration as
`mm_wav_stats` / `mm_bmp_stats`.

Proof structure: payloads are BUILT from a closed-form integer signal,
pushed through the real container layout (RIFF chunk walk; BMP
bottom-up rows + 4-byte padding), DECODED back, and the recovered
statistics must equal what DuckDB computes directly from the signal
formula — encode → container → decode proven end-to-end with a
hash-exact oracle and zero binary fixtures.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.media_codec import (
    bmp_decode,
    bmp_encode,
    default_media_decoder,
    wav_decode,
    wav_encode,
)
from yougile_etl_pipeline_spark.operators.multimodal import (
    bmp_stats,
    decode_media,
    synth_bmp_payloads,
    synth_wav_payloads,
    wav_stats,
)
from yougile_etl_pipeline_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# codec units (no Spark)
# ---------------------------------------------------------------------------

def test_wav_round_trip_exact():
    s = np.array([0, 100, -32768, 32767, -1], dtype=np.int16)
    d = wav_decode(wav_encode(s, 44100))
    assert d == {"channels": 1, "sample_rate": 44100,
                 "bits_per_sample": 16, "n_frames": 5,
                 "sum_sq": int((s.astype(np.int64) ** 2).sum()),
                 "s_min": -32768, "s_max": 32767}


def test_wav_stereo_frames():
    s = np.arange(8, dtype=np.int16)          # 4 stereo frames
    d = wav_decode(wav_encode(s, 8000, channels=2))
    assert (d["channels"], d["n_frames"]) == (2, 4)


def test_wav_tolerates_extra_chunks():
    s = np.array([3, -3], dtype=np.int16)
    raw = bytearray(wav_encode(s, 8000))
    # splice a LIST chunk between fmt and data (offset 36 = end of fmt)
    extra = b"LIST" + (7).to_bytes(4, "little") + b"INFOabc" + b"\x00"
    raw[36:36] = extra
    raw[4:8] = (len(raw) - 8).to_bytes(4, "little")
    assert wav_decode(bytes(raw))["sum_sq"] == 18


def test_wav_strict_on_malformed():
    s = np.array([1], dtype=np.int16)
    good = wav_encode(s, 8000)
    with pytest.raises(ValueError):
        wav_decode(b"RIFX" + good[4:])         # bad magic
    with pytest.raises(ValueError):
        wav_decode(good[:-1])                  # truncated
    bad_fmt = bytearray(good)
    bad_fmt[20] = 3                            # IEEE-float encoding
    with pytest.raises(ValueError):
        wav_decode(bytes(bad_fmt))


def test_bmp_round_trip_padding_and_flip():
    # w=3 -> 9 row bytes -> 3 pad bytes per row: padding must not
    # leak into stats, bottom-up storage must be undone
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    d = bmp_decode(bmp_encode(px))
    assert d == {"width": 3, "height": 2, "bits_per_pixel": 24,
                 "px_sum": int(px.sum()), "px_min": 0, "px_max": 17}


def test_bmp_top_down_variant():
    px = np.full((2, 2, 3), 9, dtype=np.uint8)
    raw = bytearray(bmp_encode(px))
    # flip the height sign -> top-down file; rows are uniform so the
    # stats must not change
    h = int.from_bytes(raw[22:26], "little", signed=True)
    raw[22:26] = (-h).to_bytes(4, "little", signed=True)
    assert bmp_decode(bytes(raw))["px_sum"] == 9 * 12


def test_bmp_strict_on_malformed():
    px = np.zeros((1, 1, 3), dtype=np.uint8)
    good = bmp_encode(px)
    with pytest.raises(ValueError):
        bmp_decode(b"XX" + good[2:])
    bad_bpp = bytearray(good)
    bad_bpp[28] = 8                            # 8-bpp palette BMP
    with pytest.raises(ValueError):
        bmp_decode(bytes(bad_bpp))


def test_wav_zero_frames_contract():
    d = wav_decode(wav_encode(np.array([], dtype=np.int16), 8000))
    assert (d["n_frames"], d["sum_sq"]) == (0, 0)
    assert d["s_min"] is None and d["s_max"] is None


def test_bmp_negative_width_is_strict():
    # A negative width used to flip the stride negative, pass the
    # truncation check vacuously, and die later inside np.frombuffer
    # with an unrelated message — now a strict ValueError up front.
    good = bytearray(bmp_encode(np.zeros((2, 2, 3), dtype=np.uint8)))
    good[18:22] = (-2).to_bytes(4, "little", signed=True)
    with pytest.raises(ValueError, match="invalid BMP width"):
        bmp_decode(bytes(good))


def test_bmp_zero_area_contract():
    d = bmp_decode(bmp_encode(np.zeros((0, 3, 3), dtype=np.uint8)))
    assert (d["height"], d["px_sum"]) == (0, 0)
    assert d["px_min"] is None and d["px_max"] is None


def test_default_decoder_dispatch_and_honest_gate():
    wav = wav_encode(np.array([2, 2], dtype=np.int16), 8000)
    assert default_media_decoder(wav, "audio")[3] == 8.0   # sum_sq
    bmp = bmp_encode(np.ones((1, 2, 3), dtype=np.uint8))
    assert default_media_decoder(bmp, "image")[:2] == [2.0, 1.0]
    with pytest.raises(NotImplementedError):
        default_media_decoder(b"\xff\xd8\xff\xe0JFIF....", "image/jpeg")


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def test_decode_media_default_decodes_wav_payloads(spark):
    wav = wav_encode(np.array([5, -5], dtype=np.int16), 16000)
    df = spark.createDataFrame(
        [(1, bytearray(wav), "audio")],
        "media_id long, payload binary, media_type string")
    row = decode_media(df).collect()[0]
    assert row["feature"] == [2.0, 16000.0, 1.0, 50.0]


# Closed-form oracles for the synthetic corpora. The engine side
# decodes BYTES it built through the real container layout; the oracle
# never sees a byte — it evaluates the signal formula. Equality proves
# the codec, not just the plumbing.
WAV_ORACLE = """
SELECT event_id AS media_id,
  CAST(1 AS INTEGER) AS channels,
  CAST(8000 + (event_id % 8) * 1000 AS INTEGER) AS sample_rate,
  CAST(50 + event_id % 100 AS BIGINT) AS n_frames,
  CAST(list_sum(list_transform(range(0, CAST(50 + event_id % 100 AS BIGINT)),
       i -> ((event_id*31 + i*17) % 65536 - 32768)
          * ((event_id*31 + i*17) % 65536 - 32768))) AS BIGINT) AS sum_sq,
  CAST(list_min(list_transform(range(0, CAST(50 + event_id % 100 AS BIGINT)),
       i -> (event_id*31 + i*17) % 65536 - 32768)) AS INTEGER) AS s_min,
  CAST(list_max(list_transform(range(0, CAST(50 + event_id % 100 AS BIGINT)),
       i -> (event_id*31 + i*17) % 65536 - 32768)) AS INTEGER) AS s_max
FROM events
"""

BMP_ORACLE = """
SELECT p_partkey AS media_id,
  CAST(4 + p_partkey % 5 AS INTEGER) AS width,
  CAST(3 + p_partkey % 4 AS INTEGER) AS height,
  CAST(list_sum(list_transform(
       range(0, CAST((3 + p_partkey % 4) * (4 + p_partkey % 5) * 3
                     AS BIGINT)),
       i -> (p_partkey
             + 7 * (i // ((4 + p_partkey % 5) * 3))
             + 3 * ((i % ((4 + p_partkey % 5) * 3)) // 3)
             + (i % 3)) % 256)) AS BIGINT) AS px_sum,
  CAST(list_min(list_transform(
       range(0, CAST((3 + p_partkey % 4) * (4 + p_partkey % 5) * 3
                     AS BIGINT)),
       i -> (p_partkey
             + 7 * (i // ((4 + p_partkey % 5) * 3))
             + 3 * ((i % ((4 + p_partkey % 5) * 3)) // 3)
             + (i % 3)) % 256)) AS INTEGER) AS px_min,
  CAST(list_max(list_transform(
       range(0, CAST((3 + p_partkey % 4) * (4 + p_partkey % 5) * 3
                     AS BIGINT)),
       i -> (p_partkey
             + 7 * (i // ((4 + p_partkey % 5) * 3))
             + 3 * ((i % ((4 + p_partkey % 5) * 3)) // 3)
             + (i % 3)) % 256)) AS INTEGER) AS px_max
FROM part
"""


def test_media_stats_survive_degenerate_payloads(spark):
    # One legal empty file must not kill the whole job: wav_decode /
    # bmp_decode document None extremes for 0-frame / zero-area
    # payloads, so the stats operators build min/max with pandas
    # nullable Int32 (plain np.int32 would TypeError inside
    # mapInPandas on the None).
    wav_empty = wav_encode(np.array([], dtype=np.int16), 8000)
    wav_full = wav_encode(np.array([7, -7], dtype=np.int16), 8000)
    wdf = spark.createDataFrame(
        [(1, bytearray(wav_empty)), (2, bytearray(wav_full))],
        "media_id long, payload binary")
    rows = {r["media_id"]: r for r in wav_stats(wdf).collect()}
    assert rows[1]["n_frames"] == 0
    assert rows[1]["s_min"] is None and rows[1]["s_max"] is None
    assert (rows[2]["s_min"], rows[2]["s_max"]) == (-7, 7)

    bmp_empty = bmp_encode(np.zeros((0, 2, 3), dtype=np.uint8))
    bmp_full = bmp_encode(np.full((1, 1, 3), 9, dtype=np.uint8))
    bdf = spark.createDataFrame(
        [(1, bytearray(bmp_empty)), (2, bytearray(bmp_full))],
        "media_id long, payload binary")
    rows = {r["media_id"]: r for r in bmp_stats(bdf).collect()}
    assert rows[1]["px_sum"] == 0
    assert rows[1]["px_min"] is None and rows[1]["px_max"] is None
    assert (rows[2]["px_min"], rows[2]["px_max"]) == (9, 9)


def test_wav_stats_duckdb_parity(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("event_id")
    got = wav_stats(synth_wav_payloads(ev, "event_id"))
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, WAV_ORACLE)
    assert not issues, issues


def test_bmp_stats_duckdb_parity(spark):
    parts = load_table(spark, SF_SMOKE, "part").select("p_partkey")
    got = bmp_stats(synth_bmp_payloads(parts, "p_partkey"))
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, BMP_ORACLE)
    assert not issues, issues


def test_media_stats_plan_is_map_only(spark):
    from yougile_etl_pipeline_spark.operators.diagnostics import (
        plan_profile,
    )

    ev = load_table(spark, SF_SMOKE, "events").select("event_id")
    p = plan_profile(wav_stats(synth_wav_payloads(ev, "event_id")))
    # r07: the synth generators spread the (tiny) id column across
    # cores via ensure_parallelism before the compute-fanning Python
    # stage — at most ONE round-robin exchange of ids, and a no-op at
    # real scale where the scan already has enough splits. The decode
    # chain itself must add no further shuffle.
    assert p["shuffle_exchanges"] <= 1, (
        "synth+decode grew beyond the single parallelism-guard "
        "exchange — the codec chain itself must stay map-only")


# ---------------------------------------------------------------------------
# decode_media itself over a MIXED corpus — certifies the default
# magic-dispatched decoder (the stub retirement), not just the typed
# stats operators. Features are integral doubles, so the array crosses
# the oracle boundary as a comma-joined BIGINT string (array outputs
# stringify at the query boundary; float formatting differs between
# engines, exact integers do not).
# ---------------------------------------------------------------------------

MIXED_ORACLE = """
SELECT event_id AS media_id,
  CAST(50 + event_id % 100 AS BIGINT) || ',' ||
  CAST(8000 + (event_id % 8) * 1000 AS BIGINT) || ',1,' ||
  CAST(CAST(list_sum(list_transform(
       range(0, CAST(50 + event_id % 100 AS BIGINT)),
       i -> ((event_id*31 + i*17) % 65536 - 32768)
          * ((event_id*31 + i*17) % 65536 - 32768))) AS BIGINT)
       AS VARCHAR) AS feature_csv,
  CAST(44 + 2 * (50 + event_id % 100) AS BIGINT) AS n_bytes
FROM events
UNION ALL
SELECT 10000000 + p_partkey AS media_id,
  CAST(4 + p_partkey % 5 AS BIGINT) || ',' ||
  CAST(3 + p_partkey % 4 AS BIGINT) || ',' ||
  CAST(3 * (4 + p_partkey % 5) * (3 + p_partkey % 4) AS BIGINT)
    || ',' ||
  CAST(CAST(list_sum(list_transform(
       range(0, CAST((3 + p_partkey % 4) * (4 + p_partkey % 5) * 3
                     AS BIGINT)),
       i -> (10000000 + p_partkey
             + 7 * (i // ((4 + p_partkey % 5) * 3))
             + 3 * ((i % ((4 + p_partkey % 5) * 3)) // 3)
             + (i % 3)) % 256)) AS BIGINT) AS VARCHAR) AS feature_csv,
  CAST(54 + (3 * (4 + p_partkey % 5)
             + (4 - (3 * (4 + p_partkey % 5)) % 4) % 4)
           * (3 + p_partkey % 4) AS BIGINT) AS n_bytes
FROM part
"""
# ^ the BMP branch synthesizes from the OFFSET id (10**7 + p_partkey),
# so the pixel-byte formula must too (10**7 % 256 = 128 shifts every
# byte); width/height/stride are unaffected because 10**7 is a
# multiple of both 4 and 5.


def _mixed_media_features(spark, sf):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf, "events").select("event_id")
    parts = load_table(spark, sf, "part").select("p_partkey")
    wav = synth_wav_payloads(ev, "event_id") \
        .withColumn("media_type", F.lit("audio"))
    bmp = synth_bmp_payloads(
        parts.select((F.col("p_partkey") + 10_000_000)
                     .alias("media_id")), "media_id") \
        .withColumn("media_type", F.lit("image"))
    feats = decode_media(wav.unionByName(bmp))
    return feats.select(
        "media_id",
        F.concat_ws(",", F.transform(
            "feature", lambda x: x.cast("bigint").cast("string")))
         .alias("feature_csv"),
        "n_bytes")


def test_decode_media_mixed_duckdb_parity(spark):
    got = _mixed_media_features(spark, SF_SMOKE)
    con = duck_connect(SF_SMOKE)
    issues = compare(got, con, MIXED_ORACLE)
    assert not issues, issues


# ---------------------------------------------------------------------------
# G.711 µ-law (r10 staging bank: mm_wav_mulaw)
# ---------------------------------------------------------------------------

def test_mulaw_roundtrip_quantization_properties():
    """The lossy round trip must (a) be idempotent on already-decoded
    values, (b) bound the error by the segment step, (c) preserve
    sign and ordering of magnitudes across segment boundaries."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        mulaw_decode,
        mulaw_encode,
    )

    s = np.array([0, 1, -1, 100, -100, 1000, -1000, 8191, -8192,
                  32635, -32635, 32767, -32768], dtype=np.int64)
    dec = mulaw_decode(mulaw_encode(s)).astype(np.int64)
    # sign preserved wherever the decoded magnitude is non-zero
    # (inputs below half the first quantization step — |s| < 4 —
    # legitimately decode to 0, G.711's dead zone)
    nz = dec != 0
    assert ((dec[nz] > 0) == (s[nz] > 0)).all()
    assert (np.abs(s[(dec == 0) & (s != 0)]) < 4).all()
    # error bounded by half the segment step (step = 2^(seg+3)), and
    # the clip region saturates at the top quantization level
    mag = np.minimum(np.abs(s), 32635) + 132
    seg = np.zeros_like(mag)
    for t in (256, 512, 1024, 2048, 4096, 8192, 16384):
        seg += (mag >= t).astype(np.int64)
    step = 1 << (seg + 3)
    assert (np.abs(np.abs(dec) - np.minimum(np.abs(s), 32635))
            <= step).all()
    # idempotence: decode(encode(decode(encode(x)))) == decode(encode(x))
    dec2 = mulaw_decode(mulaw_encode(dec)).astype(np.int64)
    assert (dec2 == dec).all()


def test_mulaw_decode_matches_closed_form():
    """The decoder must equal the closed form the SQL oracle states:
    ((mant*8 + 132) << seg) - 132, signed."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        mulaw_decode,
        mulaw_encode,
    )

    rng = np.arange(-32768, 32768, 257, dtype=np.int64)
    dec = mulaw_decode(mulaw_encode(rng)).astype(np.int64)
    mag = np.minimum(np.abs(rng), 32635) + 132
    seg = np.zeros_like(mag)
    for t in (256, 512, 1024, 2048, 4096, 8192, 16384):
        seg += (mag >= t).astype(np.int64)
    mant = (mag >> (seg + 3)) & 0xF
    want = np.where(rng < 0, -1, 1) * (((mant * 8 + 132) << seg) - 132)
    assert (dec == want).all()
