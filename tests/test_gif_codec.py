"""GIF codec (grayscale, single frame) — the second compressed class
(round 12, VERDICT r11 #5): variable-width LZW with decoder-rebuilt
dictionary, after r11's DEFLATE/PNG.

Proven the WAV/BMP/PNG way: encode a known integer grid through the
REAL container (screen descriptor, 256-entry global color table, LZW
sub-blocks, trailer), decode it back, bit-equal — plus the LZW-specific
corners a decoder can silently botch: the KwKwK self-referential code,
the 9→10→11→12-bit width ladder, mid-stream CLEARs when the table
fills, and deferred clear (full table, no CLEAR code)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from yougile_etl_pipeline_spark.operators.media_codec import (
    _gif_lzw_decode,
    gif_decode,
    gif_decode_pixels,
    gif_encode,
)


def _grid(h: int, w: int, seed: int = 0, hi: int = 256) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, hi, (h, w)).astype(np.uint8)


@pytest.mark.parametrize("shape", [(1, 1), (3, 7), (6, 8), (17, 13)])
def test_roundtrip_random(shape):
    px = _grid(*shape, seed=sum(shape))
    got, palette, _ = gif_decode_pixels(gif_encode(px))
    assert (got == px).all()
    # identity-gray global table: palette[i] == (i, i, i)
    assert (palette == np.arange(256, dtype=np.uint8)[:, None]).all()


def test_kwkwk_chains_roundtrip():
    # constant image: the stream is literal, dict, KwKwK, KwKwK, ...
    px = np.full((40, 33), 42, np.uint8)
    got, _, n_dict = gif_decode_pixels(gif_encode(px))
    assert (got == px).all()
    assert n_dict > 0


def test_width_ladder_and_table_overflow_clears():
    # 60k random bytes build >4096 dictionary entries: the encoder
    # must climb 9->12 bits and emit mid-stream CLEARs; the decoder
    # must follow the same trajectory
    px = _grid(200, 300, seed=9)
    payload = gif_encode(px)
    got, _, n_dict = gif_decode_pixels(payload)
    assert (got == px).all()
    assert n_dict > 0


def test_dictionary_actually_compresses_runs():
    # 5-pixel runs (the synth corpus signal shape): LZW must beat the
    # 1-byte-per-pixel floor by a wide margin
    c = np.arange(60, dtype=np.int64)[None, :]
    r = np.arange(30, dtype=np.int64)[:, None]
    px = ((7 * r + 3 * (c // 5)) % 256).astype(np.uint8)
    payload = gif_encode(px)
    overhead = 13 + 768 + 10 + 1 + 2  # header+GCT+desc+mcs+trailer
    # a literal-only stream costs >= 9 bits/pixel = 1.125 bytes/px;
    # well under 0.8 proves dictionary codes carried multi-pixel runs
    assert len(payload) - overhead < px.size * 0.8
    got, _, n_dict = gif_decode_pixels(payload)
    assert (got == px).all()
    assert n_dict > 0


def test_deferred_clear_decodes():
    """A spec-legal stream whose encoder STOPS adding entries at 4096
    without emitting CLEAR (deferred clear) — our encoder never writes
    this shape, so build the code stream by hand: all-literal codes
    with the width ladder driven by the decoder's own table growth."""
    mcs = 8
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    rng = np.random.RandomState(3)
    data = rng.randint(0, 256, 6000).astype(np.uint8)  # > 4096 entries
    bits = bytearray()
    bitbuf, nbits = [0], [0]
    size = [mcs + 1]

    def emit(code):
        bitbuf[0] |= code << nbits[0]
        nbits[0] += size[0]
        while nbits[0] >= 8:
            bits.append(bitbuf[0] & 0xFF)
            bitbuf[0] >>= 8
            nbits[0] -= 8

    emit(clear)
    dec_next = eoi + 1
    for i, b in enumerate(data):
        emit(int(b))
        if i > 0 and dec_next < 4096:  # decoder adds from 2nd code on
            dec_next += 1
            if dec_next == (1 << size[0]) and size[0] < 12:
                size[0] += 1
    emit(eoi)
    if nbits[0]:
        bits.append(bitbuf[0] & 0xFF)
    out, n_dict = _gif_lzw_decode(bytes(bits), mcs, len(data))
    assert out == data.tobytes()
    assert n_dict == 0  # all-literal stream used no dictionary codes


def test_stats_match_closed_form():
    px = _grid(5, 11, seed=4)
    d = gif_decode(gif_encode(px))
    assert d["width"] == 11 and d["height"] == 5
    assert d["px_sum"] == int(px.astype(np.int64).sum())
    assert d["px_min"] == int(px.min())
    assert d["px_max"] == int(px.max())


def test_strict_error_paths():
    px = _grid(4, 6, seed=1)
    payload = bytearray(gif_encode(px))
    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode_pixels(b"JIF89a" + bytes(payload[6:]))
    with pytest.raises(ValueError, match="trailer"):
        gif_decode_pixels(bytes(payload[:-1]))
    # Interlace stopped raising in r13 — it decodes for real. A
    # sequential payload with the flag FORCED on (offset: 13 header
    # + 768 GCT + 1 separator + 8 of the descriptor) must decode to
    # the Appendix-E scatter of the original rows — the exact
    # permutation, not a guess.
    import numpy as np

    from yougile_etl_pipeline_spark.operators.media_codec import (
        gif_interlace_order,
    )

    forced = bytearray(payload)
    forced[13 + 768 + 9] |= 0x40
    grid, _pal, _nd = gif_decode_pixels(bytes(forced))
    expect = np.empty_like(px)
    expect[np.array(gif_interlace_order(px.shape[0]))] = px
    assert (grid == expect).all()
    # and the genuine interlaced roundtrip is exact
    rt, _pal2, _nd2 = gif_decode_pixels(gif_encode(px, interlaced=True))
    assert (rt == px).all()
    with pytest.raises(ValueError):
        gif_encode(np.zeros((0, 3), np.uint8))
    with pytest.raises(ValueError):
        gif_encode(np.zeros((2, 2, 3), np.uint8))  # not grayscale 2-D


def test_extension_blocks_are_skipped():
    """GIF89a files in the wild carry graphic-control extensions
    before the image descriptor; the parser must skip any extension's
    sub-block chain."""
    px = _grid(3, 5, seed=2)
    payload = gif_encode(px)
    head_end = 13 + 768  # header + screen descriptor + GCT
    gce = bytes([0x21, 0xF9, 0x04]) + struct.pack("<BHB", 0, 0, 0) \
        + bytes([0x00])
    patched = payload[:head_end] + gce + payload[head_end:]
    got, _, _ = gif_decode_pixels(patched)
    assert (got == px).all()
