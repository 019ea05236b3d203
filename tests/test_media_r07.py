"""Round-7 media additions: BI_RLE8 compressed-BMP decode and integer
zero-order-hold PCM resampling (media_codec.py), plus their registered
queries `mm_bmp_rle8` / `mm_wav_resample` — same proof pattern as
tests/test_media_codec.py: payloads built from closed-form integer
signals through the real byte layouts, decoded back, hash-compared
against an oracle that evaluates the formula and never sees a byte.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connect
from yougile_etl_pipeline_spark.operators.media_codec import (
    bmp_encode_rle8,
    bmp_rle8_decode,
    pcm_resample_zoh,
    wav_encode,
    wav_samples,
)


# ---------------------------------------------------------------------------
# codec units (no Spark)
# ---------------------------------------------------------------------------

def test_rle8_round_trip_runs_and_rows():
    # horizontal runs of 3 -> multi-pixel encoded runs; bottom-up
    # storage undone; stats over indices
    px = ((np.arange(4)[:, None] * 5 + np.arange(9)[None, :] // 3) % 23) \
        .astype(np.uint8)
    d = bmp_rle8_decode(bmp_encode_rle8(px))
    assert d == {"width": 9, "height": 4, "bits_per_pixel": 8,
                 "px_sum": int(px.sum()), "px_min": int(px.min()),
                 "px_max": int(px.max())}


def test_rle8_absolute_mode_decodes():
    # splice an absolute-mode row in by hand: 00 03 a b c (padded to
    # word) covers a 3-wide row
    px = np.array([[7, 7, 7]], dtype=np.uint8)
    good = bytearray(bmp_encode_rle8(px))
    # encoded body for 1x3 run row: (03 07) EOL EOB = 6 bytes at tail
    body_off = len(good) - 6
    assert good[body_off:body_off + 2] == bytes((3, 7))
    new_body = bytes((0, 3, 5, 6, 7, 0)) + b"\x00\x00" + b"\x00\x01"
    payload = bytes(good[:body_off]) + new_body
    # fix the size fields (file size + biSizeImage)
    payload = bytearray(payload)
    payload[2:6] = len(payload).to_bytes(4, "little")
    d = bmp_rle8_decode(bytes(payload))
    assert (d["px_sum"], d["px_min"], d["px_max"]) == (18, 5, 7)


def test_rle8_strictness():
    px = np.full((2, 4), 9, dtype=np.uint8)
    good = bytearray(bmp_encode_rle8(px))
    with pytest.raises(ValueError, match="delta"):
        bad = bytearray(good)
        body_off = len(bad) - 10      # (04 09) EOL (04 09) EOL EOB
        bad[body_off:body_off + 2] = bytes((0, 2))
        bmp_rle8_decode(bytes(bad))
    with pytest.raises(ValueError, match="end-of-bitmap"):
        trunc = bytearray(good[:-2])          # drop the EOB marker
        trunc[2:6] = len(trunc).to_bytes(4, "little")
        bmp_rle8_decode(bytes(trunc))
    with pytest.raises(ValueError, match="not a BI_RLE8"):
        from yougile_etl_pipeline_spark.operators.media_codec import (
            bmp_encode,
        )
        bmp_rle8_decode(bmp_encode(np.zeros((1, 1, 3), dtype=np.uint8)))


def test_rle8_zero_area_contract():
    d = bmp_rle8_decode(bmp_encode_rle8(
        np.zeros((0, 3), dtype=np.uint8)))
    assert (d["height"], d["px_sum"]) == (0, 0)
    assert d["px_min"] is None and d["px_max"] is None


def test_resample_zoh_formulas():
    s = np.array([10, -20, 30, -40, 50], dtype=np.int16)
    assert list(pcm_resample_zoh(s, 1, 1)) == list(s)       # identity
    up = pcm_resample_zoh(s, 3, 2)                          # 1.5x
    assert list(up) == [s[(j * 2) // 3] for j in range(8)]
    down = pcm_resample_zoh(s, 1, 2)                        # 0.5x
    assert list(down) == [10, 30, 50]
    assert pcm_resample_zoh(np.array([], dtype=np.int16), 3, 2).size == 0
    with pytest.raises(ValueError):
        pcm_resample_zoh(s, 0, 2)


def test_wav_samples_round_trip():
    s = np.array([1, -2, 3], dtype=np.int16)
    ch, rate, out = wav_samples(wav_encode(s, 16000))
    assert (ch, rate, list(out)) == (1, 16000, [1, -2, 3])


# ---------------------------------------------------------------------------
# registered-query parity (the registry copies, against DuckDB)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["mm_wav_resample", "mm_bmp_rle8"])
def test_media_r07_registry_parity(spark, name):
    from yougile_etl_pipeline_spark.registry import ORACLES, QUERIES

    con = duck_connect(SF_SMOKE)
    issues = compare(QUERIES[name](spark, SF_SMOKE), con, ORACLES[name])
    assert not issues, f"{name}: {issues}"
