"""PNG codec (8-bit truecolor, non-interlaced) — the first
DEFLATE-compressed image format (round 11, VERDICT r10 #6).

The decode path is proven the same way as the WAV/BMP codecs: encode a
known integer pixel grid through the REAL container (chunk CRCs, zlib
stream, per-row spec filters), decode it back, and the recovered grid
must equal the input bit-for-bit — for EVERY filter type, since the
Sub/Up/Average/Paeth reconstruction rules are where a decoder can be
silently wrong."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from yougile_etl_pipeline_spark.operators.media_codec import (
    png_decode,
    png_decode_pixels,
    png_encode,
)


def _grid(h: int, w: int, seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("filter_seed", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter_type(filter_seed):
    # filter_seed shifts which filter row 0 gets; a 1-row image then
    # exercises exactly that one filter, isolating each rule.
    px = _grid(1, 7, seed=filter_seed)
    got, kinds = png_decode_pixels(png_encode(px, filter_seed=filter_seed))
    assert (got == px).all()
    assert kinds == 1


def test_roundtrip_mixed_filters_and_shapes():
    for seed in range(5):
        for h, w in [(1, 1), (3, 5), (6, 8), (5, 2), (17, 9)]:
            px = _grid(h, w, seed=seed)
            got, kinds = png_decode_pixels(png_encode(px, filter_seed=seed))
            assert (got == px).all(), (h, w, seed)
            assert kinds == min(h, 5)


def test_stats_match_grid():
    px = _grid(4, 6, seed=9)
    d = png_decode(png_encode(px))
    assert d["width"] == 6 and d["height"] == 4
    assert d["px_sum"] == int(px.astype(np.int64).sum())
    assert d["px_min"] == int(px.min())
    assert d["px_max"] == int(px.max())
    assert d["n_filter_kinds"] == 4


def test_multiple_idat_chunks_concatenate():
    # The spec allows the zlib stream to split across IDAT chunks at
    # ANY byte boundary; rebuild the encoder's single-IDAT output as
    # two chunks and the decode must be unchanged.
    px = _grid(5, 4, seed=2)
    payload = png_encode(px)
    sig, rest = payload[:8], payload[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (length,) = struct.unpack_from(">I", rest, pos)
        chunks.append((rest[pos + 4:pos + 8],
                       rest[pos + 8:pos + 8 + length]))
        pos += 12 + length
    [ihdr] = [d for t, d in chunks if t == b"IHDR"]
    [idat] = [d for t, d in chunks if t == b"IDAT"]

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    cut = len(idat) // 2
    rebuilt = (sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat[:cut])
               + chunk(b"IDAT", idat[cut:]) + chunk(b"IEND", b""))
    got, _ = png_decode_pixels(rebuilt)
    assert (got == px).all()


def test_crc_corruption_raises():
    payload = bytearray(png_encode(_grid(3, 3)))
    payload[40] ^= 0xFF  # somewhere inside IDAT data
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(payload))


def test_truncated_payload_raises():
    payload = png_encode(_grid(3, 3))
    with pytest.raises(ValueError):
        png_decode(payload[:30])


def test_not_png_raises():
    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"BM" + b"\x00" * 60)


def test_unsupported_profile_raises():
    # Hand-build IHDRs for profiles the decoder genuinely does not
    # implement (honest gates, not guesses): 16-bit depth and an
    # invalid color type. Grayscale (0), palette (3) and RGBA (6)
    # stopped raising in r13 — they decode for real now, covered by
    # test_gray_rgba_roundtrip / test_palette_roundtrip below.
    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    for depth, ctype_i in ((16, 2), (8, 5)):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ctype_i, 0, 0, 0)
        payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", zlib.compress(b"\x00" * 6))
                   + chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="unsupported PNG profile"):
            png_decode(payload)


def test_gray_rgba_roundtrip():
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        png_decode_pixels,
        png_encode,
    )

    rng = np.random.RandomState(13)
    for ch in (1, 4):
        for seed in range(8):
            h, w = int(rng.randint(1, 7)), int(rng.randint(1, 7))
            px = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
            back, kinds = png_decode_pixels(png_encode(px, filter_seed=seed))
            assert back.shape == (h, w, ch)
            assert (back == px).all()
            assert kinds == min(h, 5)
    # 2-D grayscale input is the (h, w, 1) shorthand
    g = rng.randint(0, 256, size=(3, 4)).astype(np.uint8)
    assert png_encode(g) == png_encode(g[:, :, None])


def test_interlaced_decodes_and_strict_paths():
    # Adam7 stopped raising in r13 — it decodes for real.
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        png_decode_pixels,
    )

    px = _grid(6, 7)
    back, kinds = png_decode_pixels(png_encode(px, interlaced=True))
    assert (back == px).all()

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    # a 2x2 truecolor Adam7 stream needs exactly 15 bytes (passes
    # 1/6/7 = 4+4+7); 14 zero bytes must be a hard truncation error
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
               + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="truncated|trailing"):
        png_decode(payload)
    # and exactly 15 zero bytes decodes to an all-zero grid
    ok = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
          + chunk(b"IDAT", zlib.compress(b"\x00" * 15))
          + chunk(b"IEND", b""))
    grid, _k = png_decode_pixels(ok)
    assert grid.shape == (2, 2, 3) and int(grid.sum()) == 0
    # unknown interlace method stays a hard error
    bad = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 2)
    payload2 = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", bad)
                + chunk(b"IDAT", zlib.compress(b"\x00" * 15))
                + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlace"):
        png_decode(payload2)


def test_wrong_scanline_length_raises():
    # Valid container, wrong inflate size: a 3x3 stream inside a 3x4
    # header must be a hard error, never a partial decode.
    px = _grid(3, 3)
    payload = png_encode(px)
    sig, rest = payload[:8], payload[8:]
    (length,) = struct.unpack_from(">I", rest, 0)
    ihdr = bytearray(rest[8:8 + length])
    ihdr[0:4] = struct.pack(">I", 4)  # claim width 4

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    pos = 12 + length
    (ilen,) = struct.unpack_from(">I", rest, pos)
    idat = rest[pos + 8:pos + 8 + ilen]
    bad = (sig + chunk(b"IHDR", bytes(ihdr)) + chunk(b"IDAT", idat)
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="scanline stream"):
        png_decode(bad)


def test_default_media_decoder_dispatches_png():
    from yougile_etl_pipeline_spark.operators.media_codec import (
        default_media_decoder,
    )
    px = _grid(3, 5, seed=4)
    out = default_media_decoder(png_encode(px), "image")
    assert out == [5.0, 3.0, 45.0, float(px.astype(np.int64).sum())]


def test_paeth_tie_breaking_order():
    # Spec 9.4: ties resolve a, then b, then c. a == b == c → a; the
    # p-distance ties are the classic off-by-one spot.
    from yougile_etl_pipeline_spark.operators.media_codec import _paeth
    assert _paeth(5, 5, 5) == 5    # all tie → a
    assert _paeth(3, 3, 1) == 3    # pa == pb == 2 < pc == 4 → a wins
    assert _paeth(1, 3, 2) == 2    # pc == 0 beats pa == pb == 1 → c
    assert _paeth(10, 0, 5) == 5   # p=5: pa=pb=5, pc=0 → c


def test_png_stats_spark(spark):
    from yougile_etl_pipeline_spark.operators.multimodal import (
        png_stats,
        synth_png_payloads,
    )

    ids = spark.createDataFrame([(i,) for i in range(12)], "media_id long")
    out = {r["media_id"]: r for r in png_stats(
        synth_png_payloads(ids, "media_id")).collect()}
    assert len(out) == 12
    for mid in range(12):
        w, h = 5 + mid % 4, 3 + mid % 4
        r = np.arange(h, dtype=np.int64)[:, None, None]
        c = np.arange(w, dtype=np.int64)[None, :, None]
        ch = np.arange(3, dtype=np.int64)[None, None, :]
        px = (mid + 11 * r + 5 * c + 3 * ch) % 256
        row = out[mid]
        assert (row["width"], row["height"]) == (w, h)
        assert row["px_sum"] == int(px.sum())
        assert row["px_min"] == int(px.min())
        assert row["px_max"] == int(px.max())
        assert row["n_filter_kinds"] == min(h, 5)


def test_palette_roundtrip():
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        png_decode_pixels,
        png_encode_pal8,
    )

    rng = np.random.RandomState(9)
    pal = np.stack([(np.arange(256) * 3) % 256,
                    (np.arange(256) * 5) % 256,
                    (np.arange(256) * 7) % 256], axis=1).astype(np.uint8)
    for seed in range(8):
        h, w = int(rng.randint(1, 8)), int(rng.randint(1, 8))
        idx = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        back, kinds = png_decode_pixels(
            png_encode_pal8(idx, pal, filter_seed=seed))
        assert back.shape == (h, w, 3)
        assert (back == pal[idx]).all()
        assert kinds == min(h, 5)
    # an index past the palette is a hard error at encode time...
    with pytest.raises(ValueError, match="palette"):
        png_encode_pal8(np.array([[20]], dtype=np.uint8), pal[:16])
    # ...and a missing PLTE at decode time
    from yougile_etl_pipeline_spark.operators.media_codec import png_decode
    payload = bytearray(png_encode_pal8(np.zeros((2, 2), np.uint8), pal))
    plte_start = payload.find(b"PLTE") - 4
    plte_len = 4 + 4 + 768 + 4
    with pytest.raises(ValueError, match="PLTE"):
        png_decode(bytes(payload[:plte_start]
                         + payload[plte_start + plte_len:]))
