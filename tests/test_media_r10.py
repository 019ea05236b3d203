"""Round-10 media operators: nearest-neighbor BMP resize + framed WAV
energy — hand-checked codec-level cases plus the mapInPandas
plumbing (the registry entries pin sf parity against closed-form
DuckDB oracles)."""

from __future__ import annotations

import numpy as np
import pytest

from yougile_etl_pipeline_spark.operators.media_codec import (
    bmp_decode_pixels,
    bmp_encode,
    resize_nearest,
    wav_encode,
)


def test_bmp_decode_pixels_roundtrip():
    # 3x2 image, distinct bytes: encode -> decode must return the
    # logical top-down grid exactly (padding + bottom-up undone)
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    got = bmp_decode_pixels(bmp_encode(px))
    assert got.shape == (2, 3, 3)
    assert np.array_equal(got, px)


def test_bmp_decode_pixels_rejects_garbage():
    with pytest.raises(ValueError, match="not a BMP"):
        bmp_decode_pixels(b"JUNK" * 20)


def test_resize_nearest_hand_checked():
    # 4x4 grid of values 0..15 -> 2x2 picks rows/cols 0 and 2:
    # [[0, 2], [8, 10]]
    g = np.arange(16, dtype=np.uint8).reshape(4, 4)
    got = resize_nearest(g, 2, 2)
    assert got.tolist() == [[0, 2], [8, 10]]
    # upscale 2x2 -> 4x4 repeats each cell 2x2
    small = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    up = resize_nearest(small, 4, 4)
    assert up.tolist() == [[1, 1, 2, 2], [1, 1, 2, 2],
                           [3, 3, 4, 4], [3, 3, 4, 4]]
    with pytest.raises(ValueError, match="invalid target"):
        resize_nearest(g, 0, 2)


def test_bmp_resize_stats_spark(spark):
    from yougile_etl_pipeline_spark.operators.multimodal import (
        bmp_resize_stats,
        synth_bmp_payloads,
    )

    ids = spark.createDataFrame([(i,) for i in range(12)], "media_id long")
    out = {r["media_id"]: r for r in bmp_resize_stats(
        synth_bmp_payloads(ids, "media_id"), 6, 8).collect()}
    # closed-form check in python for each id
    for mid in range(12):
        w, h = 4 + mid % 5, 3 + mid % 4
        r = np.arange(h, dtype=np.int64)[:, None, None]
        c = np.arange(w, dtype=np.int64)[None, :, None]
        ch = np.arange(3, dtype=np.int64)[None, None, :]
        px = ((mid + 7 * r + 3 * c + ch) % 256).astype(np.uint8)
        want = resize_nearest(px, 6, 8)
        row = out[mid]
        assert (row["src_w"], row["src_h"]) == (w, h)
        assert row["out_sum"] == int(want.astype(np.int64).sum())
        assert row["out_min"] == int(want.min())
        assert row["out_max"] == int(want.max())


def test_wav_frame_energy_hand_checked(spark):
    from yougile_etl_pipeline_spark.operators.multimodal import (
        wav_frame_energy,
    )

    # 5 samples, frame=2 -> frames [3,4],[0,-2],[1]: energies 25, 4, 1
    s = np.array([3, 4, 0, -2, 1], dtype="<i2")
    payload = wav_encode(s, 8000)
    df = spark.createDataFrame([(7, bytearray(payload))],
                               "media_id long, payload binary")
    row = wav_frame_energy(df, frame=2, quiet_threshold=5).collect()[0]
    assert (row["n_samples"], row["n_frames"]) == (5, 3)
    assert row["e_max"] == 25
    assert row["f_argmax"] == 0
    assert row["n_quiet"] == 2  # energies 4 and 1 are below 5


def test_wav_frame_energy_argmax_is_first_peak(spark):
    from yougile_etl_pipeline_spark.operators.multimodal import (
        wav_frame_energy,
    )

    # two frames with the SAME peak energy -> first index wins
    s = np.array([2, 0, 2, 0], dtype="<i2")
    df = spark.createDataFrame(
        [(1, bytearray(wav_encode(s, 8000)))],
        "media_id long, payload binary")
    row = wav_frame_energy(df, frame=2, quiet_threshold=1).collect()[0]
    assert (row["e_max"], row["f_argmax"], row["n_quiet"]) == (4, 0, 0)


def test_bmp_flip_crop_hand_checked(spark):
    """Independent of the closed-form oracle (which shares the index
    derivation with the implementation): an explicit 3x4 grid, flip
    then center-crop 2x3, expected cells written out by hand.

    Grid rows (values = 10*r + c, channels all equal):
      r0: 0 1 2 3 / r1: 10 11 12 13 / r2: 20 21 22 23
    Flipped horizontally: r0: 3 2 1 0 / r1: 13 12 11 10 / ...
    Crop 2 rows x 3 cols centered: r0 offset (3-2)//2 = 0,
    c0 = (4-3)//2 = 0 -> rows 0..1, cols 0..2 of the FLIPPED grid:
      [3 2 1] / [13 12 11]  -> sum*3 channels = 42*3 = 126,
      min 1, max 13."""
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import bmp_encode
    from yougile_etl_pipeline_spark.operators.multimodal import (
        bmp_flip_crop_stats,
    )

    r = np.arange(3)[:, None]
    c = np.arange(4)[None, :]
    base = (10 * r + c).astype(np.uint8)
    px = np.repeat(base[:, :, None], 3, axis=2)
    df = spark.createDataFrame(
        [(1, bytearray(bmp_encode(px)))],
        "media_id long, payload binary")
    row = bmp_flip_crop_stats(df, crop_h=2, crop_w=3).collect()[0]
    assert (row["src_w"], row["src_h"]) == (4, 3)
    assert row["out_sum"] == (3 + 2 + 1 + 13 + 12 + 11) * 3
    assert (row["out_min"], row["out_max"]) == (1, 13)
