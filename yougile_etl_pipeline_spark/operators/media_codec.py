"""Pure-Python media codecs: RIFF/WAVE PCM and BMP (24-bit).

These retire the tree's one stub (`multimodal.decode_media`'s
codec-less ``NotImplementedError``) for the formats that are pure
container parsing — a WAV or BMP payload is a documented byte layout,
no compression, so a real decoder needs nothing beyond ``struct``.
Compressed formats (JPEG, MP3, H.264, ...) genuinely need codec
libraries this environment doesn't ship and still raise.

Both decoders are strict: they validate magic bytes, chunk sizes, and
supported encodings (PCM16 mono/stereo WAV; uncompressed 24-bpp BMP)
and raise ``ValueError`` on malformed input rather than guessing —
at 100 TB a silently-misparsed payload poisons downstream features.

The encoders exist so the decode path is PROVABLE without binary
fixtures: build a payload from a known integer signal, decode it, and
the recovered statistics must equal the closed-form answer a SQL
oracle computes directly from the signal formula (see
``tests/test_media_codec.py`` and the `mm_wav_stats` /
`mm_bmp_stats` staged queries). Everything is exact integer
arithmetic — no floats anywhere in the codec, so cross-engine parity
is bit-trivial.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "bmp_decode",
    "bmp_encode",
    "bmp_encode_pal8",
    "bmp_encode_rle8",
    "bmp_pal8_decode",
    "bmp_rle8_decode",
    "default_media_decoder",
    "gif_decode",
    "gif_decode_pixels",
    "gif_encode",
    "mulaw_decode",
    "mulaw_encode",
    "pcm_resample_zoh",
    "png_decode",
    "png_decode_pixels",
    "png_encode",
    "png_encode_pal8",
    "wav_decode",
    "wav_encode",
    "wav_samples",
]


# ---------------------------------------------------------------------------
# RIFF/WAVE PCM16
# ---------------------------------------------------------------------------

def wav_encode(samples: np.ndarray, sample_rate: int,
               channels: int = 1) -> bytes:
    """Canonical RIFF/WAVE container around PCM16 samples.

    `samples` is int16, interleaved when stereo (frame-major). Layout:
    RIFF header, ``fmt `` chunk (PCM, 16-bit), ``data`` chunk."""
    s = np.asarray(samples, dtype="<i2")
    if channels not in (1, 2):
        raise ValueError(f"channels must be 1 or 2, got {channels}")
    if s.size % channels:
        raise ValueError("sample count not divisible by channel count")
    data = s.tobytes()
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      byte_rate, block_align, 16)
    out = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
           + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    return out


def _wav_parse(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Shared RIFF chunk walk: validate the container and return
    (channels, sample_rate, samples) — the strictness contract
    documented on `wav_decode`."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    riff_size = struct.unpack_from("<I", payload, 4)[0]
    if riff_size + 8 != len(payload):
        raise ValueError(
            f"RIFF size {riff_size} inconsistent with payload "
            f"{len(payload)}")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        csz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + csz]
        if len(body) != csz:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + csz + (csz & 1)          # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    (audio_fmt, channels, sample_rate, _byte_rate,
     block_align, bits) = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_fmt != 1 or bits != 16:
        raise ValueError(
            f"unsupported encoding (fmt={audio_fmt}, bits={bits}); "
            "only PCM16 decodes without codec libraries")
    if block_align != channels * 2:
        raise ValueError("block align inconsistent with PCM16")
    if len(data) % block_align:
        raise ValueError("data chunk not frame-aligned")
    return int(channels), int(sample_rate), np.frombuffer(data, dtype="<i2")


def wav_samples(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a RIFF/WAVE PCM16 payload to its raw samples:
    ``(channels, sample_rate, int16 array)`` — interleaved
    frame-major when stereo. Same strict validation as `wav_decode`
    (which is this walk + statistics)."""
    return _wav_parse(payload)


def wav_decode(payload: bytes) -> dict:
    """Parse a RIFF/WAVE PCM16 payload into exact integer statistics.

    Walks the chunk list (tolerating extra chunks like LIST/INFO in
    the wild), requires a PCM ``fmt `` chunk with 16-bit samples, and
    returns::

        {channels, sample_rate, bits_per_sample, n_frames,
         sum_sq, s_min, s_max}

    ``sum_sq`` is the exact int64 sum of squared samples across all
    channels (the loudness/energy primitive — RMS is sqrt(sum_sq/n),
    left to the caller so the decoder stays float-free); ``s_min`` /
    ``s_max`` the exact sample extremes (0 frames → sum_sq 0 and
    None extremes)."""
    channels, sample_rate, s = _wav_parse(payload)
    bits = 16
    return {
        "channels": int(channels),
        "sample_rate": int(sample_rate),
        "bits_per_sample": int(bits),
        "n_frames": len(s) // channels,
        "sum_sq": int((s.astype(np.int64) ** 2).sum()),
        "s_min": int(s.min()) if s.size else None,
        "s_max": int(s.max()) if s.size else None,
    }


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bpp, bottom-up, 4-byte row padding)
# ---------------------------------------------------------------------------

def bmp_encode(pixels: np.ndarray, *, topdown: bool = False) -> bytes:
    """Canonical Windows BMP (BITMAPINFOHEADER, 24 bpp, BI_RGB).

    `pixels` is (height, width, 3) uint8 in LOGICAL order: row 0 =
    top, channels (B, G, R) as BMP stores them. The encoder writes the
    spec's bottom-up row order with rows padded to 4 bytes — exactly
    the layout quirks a decoder must undo. With ``topdown=True`` it
    writes the spec's OTHER orientation: a negative height field and
    rows in logical order (the in-the-wild variant the decoders'
    ``h_raw < 0`` branch exists for)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3) uint8")
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    order = range(h) if topdown else range(h - 1, -1, -1)
    rows = [px[r].tobytes() + b"\x00" * pad for r in order]
    img = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if topdown else h,
                       1, 24, 0, len(img), 2835, 2835, 0, 0)
    off = 14 + len(info)
    head = struct.pack("<2sIHHI", b"BM", off + len(img), 0, 0, off)
    return head + info + img


def bmp_decode(payload: bytes) -> dict:
    """Parse an uncompressed 24-bpp BMP into exact integer statistics.

    Handles the format's two layout quirks — bottom-up row order
    (negative-height top-down files too) and 4-byte row padding, which
    must be EXCLUDED from statistics — and returns::

        {width, height, bits_per_pixel, px_sum, px_min, px_max}

    ``px_sum`` is the exact integer sum over every channel byte of
    every pixel (padding excluded); min/max likewise."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _magic, fsize, _r1, _r2, off = struct.unpack_from("<2sIHHI", payload, 0)
    if fsize != len(payload):
        raise ValueError(f"BMP size field {fsize} != payload {len(payload)}")
    hsize, w, h_raw, planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if hsize < 40 or planes != 1:
        raise ValueError("unsupported BMP header")
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"unsupported BMP encoding (bpp={bpp}, compression={comp}); "
            "only uncompressed 24-bpp decodes without codec libraries")
    if w < 0:
        # A negative width would flip the stride negative, letting the
        # truncation check below pass vacuously and the failure surface
        # later inside np.frombuffer with an unrelated message.
        raise ValueError(f"invalid BMP width {w}")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if off + stride * h > len(payload):
        raise ValueError("pixel array truncated")
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, :row_bytes]      # drop padding
    if not top_down:
        rows = rows[::-1]                             # undo bottom-up
    return {
        "width": int(w),
        "height": int(h),
        "bits_per_pixel": int(bpp),
        "px_sum": int(rows.astype(np.int64).sum()),
        "px_min": int(rows.min()) if rows.size else None,
        "px_max": int(rows.max()) if rows.size else None,
    }


# ---------------------------------------------------------------------------
# BMP BI_RLE8 (8-bpp palette, run-length encoded) — a REAL compressed
# format that decodes with nothing beyond the spec: runs are
# (count, index) byte pairs plus EOL/EOB/absolute-mode escapes, so the
# "compressed formats need codec libraries" gate genuinely does not
# apply to it. Round-6 retired the decode stub for the two
# container-only formats; this extends the honest-decode surface to
# its first compression scheme (r07).
# ---------------------------------------------------------------------------

def bmp_encode_rle8(pixels: np.ndarray) -> bytes:
    """Canonical 8-bpp palette BMP with BI_RLE8 compression.

    `pixels` is (height, width) uint8 palette INDICES in logical
    order (row 0 = top); the palette written is the 256-entry
    grayscale identity (index i → (i, i, i)), so index statistics and
    gray statistics coincide. Rows are run-length encoded bottom-up
    per the spec: maximal runs as (count ≤ 255, index) pairs, EOL
    (00 00) after every row, EOB (00 01) at the end."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError("pixels must be (h, w) uint8 palette indices")
    h, w = px.shape
    body = bytearray()
    for r in range(h - 1, -1, -1):          # bottom-up storage
        row = px[r]
        c = 0
        while c < w:
            run = 1
            while (c + run < w and run < 255
                   and row[c + run] == row[c]):
                run += 1
            body += bytes((run, int(row[c])))
            c += run
        body += b"\x00\x00"                 # EOL
    body += b"\x00\x01"                     # EOB
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1,
                       len(body), 2835, 2835, 256, 0)
    off = 14 + len(info) + len(palette)
    head = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    return head + info + palette + body


def bmp_encode_pal8(pixels: np.ndarray, palette: np.ndarray) -> bytes:
    """Canonical UNCOMPRESSED 8-bpp palette BMP (BITMAPINFOHEADER,
    BI_RGB) with an arbitrary 256-entry palette.

    `pixels` is (height, width) uint8 palette indices in logical
    order (row 0 = top); `palette` is (256, 3) uint8 (B, G, R)
    entries, written as the spec's BGRX quads between the header and
    the pixel array. Rows are stored bottom-up, each padded to a
    4-byte boundary — for 1-byte pixels the pad is (-w) mod 4, a
    DIFFERENT stride rule than the 24-bpp encoder's (-3w) mod 4,
    which is exactly what `bmp_pal8_decode` must undo."""
    px = np.asarray(pixels, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError("pixels must be (h, w) uint8 palette indices")
    if pal.shape != (256, 3):
        raise ValueError("palette must be (256, 3) uint8 BGR")
    h, w = px.shape
    pad = (-w) % 4
    rows = [px[r].tobytes() + b"\x00" * pad for r in range(h - 1, -1, -1)]
    img = b"".join(rows)
    quads = b"".join(bytes((int(b), int(g), int(r), 0))
                     for b, g, r in pal)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0,
                       len(img), 2835, 2835, 256, 0)
    off = 14 + len(info) + len(quads)
    head = struct.pack("<2sIHHI", b"BM", off + len(img), 0, 0, off)
    return head + info + quads + img


def bmp_pal8_decode(payload: bytes) -> dict:
    """Parse an uncompressed 8-bpp palette BMP into exact integer
    statistics over the PALETTE-RESOLVED channel bytes — unlike
    `bmp_rle8_decode` (whose synth corpus uses the identity palette,
    so it reads indices), this decoder genuinely walks the color
    table: every index is looked up to its (B, G, R) entry and the
    statistics cover the resolved bytes.

    Handles bottom-up and top-down (negative height) files and the
    1-byte-pixel stride rule (rows padded to 4 bytes, padding
    excluded from statistics). Returns ``{width, height,
    bits_per_pixel, px_sum, px_min, px_max}`` where ``px_sum`` is the
    exact integer sum of every resolved channel byte and min/max
    range over resolved channel bytes (None for zero-area)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _magic, fsize, _r1, _r2, off = struct.unpack_from("<2sIHHI", payload, 0)
    if fsize != len(payload):
        raise ValueError(f"BMP size field {fsize} != payload {len(payload)}")
    hsize, w, h_raw, planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if hsize < 40 or planes != 1:
        raise ValueError("unsupported BMP header")
    if bpp != 8 or comp != 0:
        raise ValueError(
            f"not an uncompressed 8-bpp palette BMP (bpp={bpp}, "
            f"compression={comp})")
    if w < 0:
        raise ValueError(f"invalid BMP width {w}")
    n_colors = struct.unpack_from("<I", payload, 14 + 32)[0] or 256
    pal_off = 14 + hsize
    if pal_off + 4 * n_colors > off:
        raise ValueError("palette overlaps pixel array")
    quads = np.frombuffer(payload, dtype=np.uint8,
                          count=4 * n_colors, offset=pal_off)
    pal = quads.reshape(n_colors, 4)[:, :3]        # BGR, X dropped
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    stride = w + ((-w) % 4)
    if off + stride * h > len(payload):
        raise ValueError("pixel array truncated")
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=stride * h, offset=off)
    idx = raw.reshape(h, stride)[:, :w]            # drop padding
    if not top_down:
        idx = idx[::-1]
    if idx.size and int(idx.max()) >= n_colors:
        raise ValueError("palette index out of range")
    resolved = pal[idx]                            # (h, w, 3) bytes
    return {
        "width": int(w),
        "height": int(h),
        "bits_per_pixel": int(bpp),
        "px_sum": int(resolved.astype(np.int64).sum()),
        "px_min": int(resolved.min()) if resolved.size else None,
        "px_max": int(resolved.max()) if resolved.size else None,
    }


def bmp_rle8_decode(payload: bytes) -> dict:
    """Parse a BI_RLE8 8-bpp palette BMP into exact integer statistics
    over the palette INDICES (the encoder's palette is the grayscale
    identity, so these equal gray statistics for its output).

    Implements the spec's escape codes: encoded runs, EOL (00 00),
    EOB (00 01), and absolute mode (00 n≥3: n literal indices padded
    to a word boundary). Delta (00 02) repositions the cursor with
    undefined gap pixels — strictly rejected rather than guessed.
    Returns ``{width, height, bits_per_pixel, px_sum, px_min,
    px_max}`` (None extremes for zero-area, like `bmp_decode`)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _magic, fsize, _r1, _r2, off = struct.unpack_from("<2sIHHI", payload, 0)
    if fsize != len(payload):
        raise ValueError(f"BMP size field {fsize} != payload {len(payload)}")
    hsize, w, h_raw, planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if hsize < 40 or planes != 1:
        raise ValueError("unsupported BMP header")
    if bpp != 8 or comp != 1:
        raise ValueError(
            f"not a BI_RLE8 BMP (bpp={bpp}, compression={comp})")
    if w < 0:
        raise ValueError(f"invalid BMP width {w}")
    if h_raw < 0:
        raise ValueError("top-down BI_RLE8 BMPs are invalid per spec")
    h = h_raw
    # decode into per-row counters — statistics only, so no pixel
    # buffer is materialized; RLE runs fold in O(1) per run
    pos = off
    x = y = 0                               # y counts rows from bottom
    n_px = 0
    px_sum = 0
    px_min: int | None = None
    px_max: int | None = None

    def fold(idx: int, count: int) -> None:
        nonlocal n_px, px_sum, px_min, px_max
        n_px += count
        px_sum += idx * count
        px_min = idx if px_min is None else min(px_min, idx)
        px_max = idx if px_max is None else max(px_max, idx)

    ended = False
    while pos + 2 <= len(payload) and not ended:
        b0, b1 = payload[pos], payload[pos + 1]
        pos += 2
        if b0 > 0:                          # encoded run
            if x + b0 > w or y >= h:
                raise ValueError("RLE run overflows row")
            fold(b1, b0)
            x += b0
        elif b1 == 0:                       # EOL
            x, y = 0, y + 1
        elif b1 == 1:                       # EOB
            ended = True
        elif b1 == 2:                       # delta — undefined gaps
            raise ValueError("RLE8 delta escape not supported (leaves "
                             "undefined pixels)")
        else:                               # absolute mode: b1 literals
            if x + b1 > w or y >= h:
                raise ValueError("RLE absolute run overflows row")
            lit = payload[pos:pos + b1]
            if len(lit) != b1:
                raise ValueError("truncated absolute run")
            for v in lit:
                fold(v, 1)
            x += b1
            pos += b1 + (b1 & 1)            # word-aligned
    if not ended:
        raise ValueError("missing RLE8 end-of-bitmap marker")
    if n_px != w * h:
        raise ValueError(
            f"RLE8 stream decoded {n_px} pixels for a {w}x{h} bitmap")
    return {
        "width": int(w),
        "height": int(h),
        "bits_per_pixel": int(bpp),
        "px_sum": int(px_sum),
        "px_min": px_min,
        "px_max": px_max,
    }


# ---------------------------------------------------------------------------
# G.711 µ-law companding (8-bit log-PCM telephony codec)
# ---------------------------------------------------------------------------

_MULAW_BIAS = 0x84      # 132
_MULAW_CLIP = 32635


def mulaw_encode(samples: np.ndarray) -> bytes:
    """G.711 µ-law compression of int16 PCM — the engine's first
    LOSSY codec, and still pure integer math: bias, clip, segment
    (position of the leading bit), 4-bit mantissa, ones-complement.
    One byte per sample.

    Vectorized: the segment search is eight integer comparisons, not
    a per-sample Python loop."""
    s = np.asarray(samples, dtype=np.int64)
    sign = (s < 0).astype(np.int64)
    mag = np.minimum(np.abs(s), _MULAW_CLIP) + _MULAW_BIAS
    # seg = floor(log2(mag)) - 7  for mag in [0x84, 0x7F9B+0x84]
    seg = np.zeros_like(mag)
    for threshold in (256, 512, 1024, 2048, 4096, 8192, 16384):
        seg += (mag >= threshold).astype(np.int64)
    mant = (mag >> (seg + 3)) & 0xF
    code = (~((sign << 7) | (seg << 4) | mant)) & 0xFF
    return code.astype(np.uint8).tobytes()


def mulaw_decode(payload: bytes) -> np.ndarray:
    """Exact integer G.711 µ-law expansion (the inverse of
    `mulaw_encode`'s quantizer): int16 samples out, bit-identical to
    the closed-form ``((mant·8 + 132) << seg) − 132`` a SQL oracle
    can state — which is what makes a lossy codec's output still
    hash-exact oracle-pairable."""
    code = (~np.frombuffer(payload, dtype=np.uint8).astype(np.int64)) & 0xFF
    sign = (code >> 7) & 1
    seg = (code >> 4) & 7
    mant = code & 0xF
    mag = (((mant << 3) + _MULAW_BIAS) << seg) - _MULAW_BIAS
    return np.where(sign == 1, -mag, mag).astype(np.int16)


# ---------------------------------------------------------------------------
# Integer PCM resampling
# ---------------------------------------------------------------------------

def pcm_resample_zoh(samples: np.ndarray, up: int, down: int) -> np.ndarray:
    """Zero-order-hold (sample-and-hold) resampling by the rational
    ratio ``up/down``: ``out[j] = in[(j·down) div up]`` with
    ``n_out = ceil(n·up/down)`` — pure integer index math, so the
    result is bit-deterministic and closed-form expressible in SQL
    (the property the media family's oracles are built on; a
    windowed-sinc resampler would be float-ordering-dependent and
    unpairable). Mono PCM16 in, PCM16 out."""
    if up < 1 or down < 1:
        raise ValueError(f"need up, down >= 1; got {up}, {down}")
    s = np.asarray(samples, dtype=np.int16)
    n = s.size
    n_out = (n * up + down - 1) // down
    if n_out == 0:
        return np.empty(0, dtype=np.int16)
    j = np.arange(n_out, dtype=np.int64)
    return s[(j * down) // up]


# ---------------------------------------------------------------------------
# decode_media default decoder
# ---------------------------------------------------------------------------

def default_media_decoder(payload: bytes, media_type: str) -> list[float]:
    """Magic-byte-dispatched decoder for `multimodal.decode_media`:
    WAV → [n_frames, sample_rate, channels, sum_sq], BMP/PNG →
    [width, height, 3·w·h, px_sum], GIF → [width, height, w·h,
    px_sum]. Formats that need real codec libraries (DCT/
    entropy-coded: JPEG, MP3, H.264) still raise
    ``NotImplementedError`` — honestly gated, not faked."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        d = wav_decode(payload)
        return [float(d["n_frames"]), float(d["sample_rate"]),
                float(d["channels"]), float(d["sum_sq"])]
    if payload[:2] == b"BM":
        d = bmp_decode(payload)
        return [float(d["width"]), float(d["height"]),
                float(3 * d["width"] * d["height"]), float(d["px_sum"])]
    if payload[:8] == _PNG_SIG:
        d = png_decode(payload)
        return [float(d["width"]), float(d["height"]),
                float(3 * d["width"] * d["height"]), float(d["px_sum"])]
    if payload[:6] in (b"GIF89a", b"GIF87a"):
        d = gif_decode(payload)
        return [float(d["width"]), float(d["height"]),
                float(d["width"] * d["height"]), float(d["px_sum"])]
    raise NotImplementedError(
        f"no pure-Python decoder for media_type={media_type!r} "
        f"(magic={payload[:4]!r}); transform-coded formats need codec "
        "libraries not present in this environment")


def bmp_decode_pixels(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bpp BMP into the logical TOP-DOWN
    ``(h, w, 3)`` uint8 pixel grid (stored channel order B,G,R),
    undoing the format's bottom-up row order and 4-byte row padding.

    Deliberately a standalone parse rather than a refactor of
    `bmp_decode`: that function backs a long-stable certified entry
    (``mm_bmp_stats``) and the certification contract treats any
    implementation change as a recertification event — the ~15
    duplicated validation lines are cheaper than churning a certified
    operator."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _magic, fsize, _r1, _r2, off = struct.unpack_from("<2sIHHI", payload, 0)
    if fsize != len(payload):
        raise ValueError(f"BMP size field {fsize} != payload {len(payload)}")
    hsize, w, h_raw, planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if hsize < 40 or planes != 1:
        raise ValueError("unsupported BMP header")
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"unsupported BMP encoding (bpp={bpp}, compression={comp}); "
            "only uncompressed 24-bpp decodes without codec libraries")
    if w < 0:
        raise ValueError(f"invalid BMP width {w}")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if off + stride * h > len(payload):
        raise ValueError("pixel array truncated")
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, :row_bytes]      # drop padding
    if not top_down:
        rows = rows[::-1]                             # undo bottom-up
    return rows.reshape(h, w, 3)


def resize_nearest(pixels: np.ndarray, dst_h: int, dst_w: int) -> np.ndarray:
    """Nearest-neighbor resample of an ``(h, w, ...)`` pixel grid to
    ``(dst_h, dst_w, ...)``: output cell (r, c) takes source cell
    ``((r·h) // dst_h, (c·w) // dst_w)`` — the floor-index map every
    engine (and a SQL oracle) computes identically in integer
    arithmetic, which is what makes a resize verifiable bit-exactly.
    Pure index selection: no interpolation, no float math."""
    if dst_h < 1 or dst_w < 1:
        raise ValueError(f"invalid target size {dst_h}x{dst_w}")
    h, w = pixels.shape[0], pixels.shape[1]
    if h == 0 or w == 0:
        raise ValueError("cannot resize a zero-area image")
    ri = (np.arange(dst_h, dtype=np.int64) * h) // dst_h
    ci = (np.arange(dst_w, dtype=np.int64) * w) // dst_w
    return pixels[ri][:, ci]


# ---------------------------------------------------------------------------
# PNG (8-bit truecolor, non-interlaced) — the engine's first
# DEFLATE-compressed image format (r11, VERDICT r10 #6). A PNG is a
# chunk stream (length/type/data/CRC32) whose IDAT payload is a zlib
# stream of per-row filtered scanlines; stdlib `zlib` decompresses it
# and the five spec filters (None/Sub/Up/Average/Paeth) reconstruct in
# pure integer arithmetic — so, like BI_RLE8, the "compressed formats
# need codec libraries" gate genuinely does not apply. JPEG/H.264
# (DCT/entropy-coded) still raise honestly.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    # PNG spec 9.4: the predictor closest to p = a + b - c, ties
    # resolved a, then b, then c — tie order is part of the format.
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


_PNG_CTYPE_BY_CHANNELS = {1: 0, 3: 2, 4: 6}  # gray / truecolor / RGBA

# Adam7 pass grid: (x-origin, y-origin, x-stride, y-stride), spec §8.2.
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized `_paeth` (PNG spec 9.4, tie order a→b→c). int16
    lanes hold every intermediate exactly (a+b−2c ∈ [−510, 510]):
    pa = |p−a| = |b−c|, pb = |p−b| = |a−c|, pc = |p−c| = |a+b−2c|."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    pa = np.abs(b16 - c16)
    pb = np.abs(a16 - c16)
    pc = np.abs(a16 + b16 - 2 * c16)
    take_a = (pa <= pb) & (pa <= pc)
    take_b = ~take_a & (pb <= pc)
    return np.where(take_a, a, np.where(take_b, b, c))


# Row-length cutoff between the per-byte loop and the numpy paths:
# measured crossover is ~50 bytes (tiny rows pay numpy call/alloc
# overhead: Paeth-filter 26 µs numpy vs 11 µs loop at 21 B; at 3 kB
# the numpy path is 40–130× faster). The synthetic bench corpus uses
# 15–32 B rows (loop side); real images land on the numpy side.
_PNG_VEC_MIN = 64


def _png_filter_row(raw: bytes, prior: bytes, bpp: int,
                    ftype: int) -> bytes:
    """Apply spec filter `ftype` to one raw scanline (shared by the
    sequential and Adam7 encoders — identical arithmetic).

    r17: rows ≥ `_PNG_VEC_MIN` bytes go through numpy — the FILTER
    side has no sequential dependency (every predictor reads the raw
    row and the prior row, never the output), so each type is one
    vector pass; uint8 wraparound is the byte loop's `& 0xFF`. Short
    rows keep the loop (numpy overhead dominates below the cutoff).
    Byte equivalence across both paths, all five types, is pinned in
    tests/test_r17_optimizations.py."""
    if ftype == 0:
        return bytes(raw)
    if len(raw) >= _PNG_VEC_MIN:
        r = np.frombuffer(raw, dtype=np.uint8)
        a = np.zeros_like(r)
        a[bpp:] = r[:-bpp]  # a[i] = raw[i-bpp], 0 for i < bpp
        if ftype == 1:
            return (r - a).tobytes()
        p = np.frombuffer(prior, dtype=np.uint8)
        if ftype == 2:
            return (r - p).tobytes()
        if ftype == 3:
            pred = ((a.astype(np.uint16) + p) >> 1).astype(np.uint8)
            return (r - pred).tobytes()
        c = np.zeros_like(p)
        c[bpp:] = p[:-bpp]
        return (r - _paeth_vec(a, p, c).astype(np.uint8)).tobytes()
    out = bytearray(len(raw))
    for i in range(len(raw)):
        a = raw[i - bpp] if i >= bpp else 0
        b = prior[i]
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            pred = _paeth(a, b, prior[i - bpp] if i >= bpp else 0)
        out[i] = (raw[i] - pred) & 0xFF
    return bytes(out)


def _png_recon_row(filt: bytes, prior: bytes, bpp: int,
                   ftype: int) -> bytes:
    """Undo spec filter `ftype` for one scanline (shared by the
    sequential and Adam7 decoders).

    r17: long rows (≥ `_PNG_VEC_MIN`) of types 0/2 are elementwise
    numpy, and type 1's recurrence ``recon[i] = (filt[i] +
    recon[i-bpp]) & 0xFF`` is a per-byte-LANE running sum, i.e. a
    cumsum mod 256 (mod distributes over addition) — one vector pass.
    Types 3/4 keep the byte loop at every length: their predictors
    read the row being reconstructed through a nonlinear step
    (>>1 / Paeth), so no closed vector form exists; the loop bodies
    are specialized per type (no per-byte branch chain). Short rows
    keep the loop everywhere (numpy overhead dominates below the
    cutoff)."""
    n = len(filt)
    if ftype == 0:
        return bytes(filt)
    if ftype == 2 and n >= _PNG_VEC_MIN:
        f = np.frombuffer(filt, dtype=np.uint8)
        return (f + np.frombuffer(prior, dtype=np.uint8)).tobytes()
    if ftype == 1 and n >= _PNG_VEC_MIN and n % bpp == 0:
        f = np.frombuffer(filt, dtype=np.uint8)
        lanes = f.reshape(-1, bpp).astype(np.uint64)
        return (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8) \
            .reshape(-1).tobytes()
    recon = bytearray(n)
    if ftype == 1:
        for i in range(n):
            a = recon[i - bpp] if i >= bpp else 0
            recon[i] = (filt[i] + a) & 0xFF
    elif ftype == 2:
        for i in range(n):
            recon[i] = (filt[i] + prior[i]) & 0xFF
    elif ftype == 3:
        for i in range(n):
            a = recon[i - bpp] if i >= bpp else 0
            recon[i] = (filt[i] + ((a + prior[i]) >> 1)) & 0xFF
    else:
        for i in range(n):
            if i >= bpp:
                a = recon[i - bpp]
                c = prior[i - bpp]
            else:
                a = c = 0
            b = prior[i]
            pa = b - c if b >= c else c - b
            pb = a - c if a >= c else c - a
            s = a + b - 2 * c
            pc = s if s >= 0 else -s
            if pa <= pb and pa <= pc:
                pred = a
            elif pb <= pc:
                pred = b
            else:
                pred = c
            recon[i] = (filt[i] + pred) & 0xFF
    return bytes(recon)
_PNG_CHANNELS_BY_CTYPE = {v: k for k, v in _PNG_CTYPE_BY_CHANNELS.items()}


def png_encode(pixels: np.ndarray, *, filter_seed: int = 0,
               interlaced: bool = False) -> bytes:
    """Canonical PNG (8-bit, non-interlaced). The color type follows
    the channel count: (h, w) or (h, w, 1) → grayscale (color type 0),
    (h, w, 3) → truecolor RGB (type 2, byte-identical to the r11
    encoder), (h, w, 4) → RGBA (type 6).

    `pixels` is uint8 in logical order (row 0 = top, channels in PNG
    storage order). Row r is written through spec filter
    ``(r + filter_seed) % 5`` — cycling all five filter types so a
    decoder must implement every reconstruction rule, not just filter
    0 (the seed varies WHICH rows get Paeth across a synthetic
    corpus). IDAT is a single zlib stream. With ``interlaced=True``
    the image writes as Adam7 (IHDR interlace byte 1): seven passes,
    each an independently filtered scanline group over its
    (x0, y0, sx, sy) sub-grid, empty passes omitted, the filter cycle
    running on a GLOBAL scanline counter so every reconstruction rule
    still appears."""
    import zlib

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in _PNG_CTYPE_BY_CHANNELS:
        raise ValueError("pixels must be (h, w[, 1|3|4]) uint8")
    h, w, bpp = px.shape
    if h < 1 or w < 1:
        raise ValueError("PNG requires positive dimensions")
    lines = []
    if interlaced:
        sl = 0  # global scanline counter drives the filter cycle
        for ox, oy, sx, sy in _ADAM7:
            sub = px[oy::sy, ox::sx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            prior = bytes(sub.shape[1] * bpp)
            for r in range(sub.shape[0]):
                raw = np.ascontiguousarray(sub[r]).tobytes()
                ftype = (sl + filter_seed) % 5
                lines.append(bytes([ftype])
                             + _png_filter_row(raw, prior, bpp, ftype))
                prior = raw
                sl += 1
    else:
        prior = bytes(w * bpp)
        for r in range(h):
            raw = px[r].tobytes()
            ftype = (r + filter_seed) % 5
            lines.append(bytes([ftype])
                         + _png_filter_row(raw, prior, bpp, ftype))
            prior = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8,
                       _PNG_CTYPE_BY_CHANNELS[bpp], 0, 0,
                       1 if interlaced else 0)
    return (_PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _png_chunk(b"IEND", b""))


def png_encode_pal8(indices: np.ndarray, palette: np.ndarray,
                    *, filter_seed: int = 0) -> bytes:
    """Canonical palette-indexed PNG (color type 3, 8-bit indices,
    non-interlaced): a PLTE chunk of RGB triples + 1-byte-per-pixel
    scanlines through the same five-filter machinery (bpp = 1).
    `indices` is (h, w) uint8; `palette` is (n, 3) uint8, n ≤ 256."""
    import zlib

    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError("indices must be (h, w) uint8")
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
        raise ValueError("palette must be (n<=256, 3) uint8")
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("index exceeds palette size")
    h, w = idx.shape
    if h < 1 or w < 1:
        raise ValueError("PNG requires positive dimensions")
    bpp = 1
    prior = bytes(w)
    lines = []
    for r in range(h):
        raw = idx[r].tobytes()
        ftype = (r + filter_seed) % 5
        lines.append(bytes([ftype])
                     + _png_filter_row(raw, prior, bpp, ftype))
        prior = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    return (_PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", pal.tobytes())
            + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _png_chunk(b"IEND", b""))


def _png_chunks(payload: bytes):
    """Yield (type, data) for every chunk, verifying structure and
    CRC32 — a flipped bit anywhere in a chunk is a hard error, exactly
    what you want before a payload feeds 100 TB of features."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("PNG chunk header truncated")
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4:pos + 8]
        end = pos + 8 + length
        if end + 4 > len(payload):
            raise ValueError(f"PNG chunk {ctype!r} truncated")
        data = payload[pos + 8:end]
        (crc,) = struct.unpack_from(">I", payload, end)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos = end + 4
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND chunk")


def png_decode_pixels(payload: bytes) -> tuple[np.ndarray, int]:
    """Full PNG decode to the logical (h, w, channels) uint8 grid,
    plus the count of DISTINCT filter types seen — evidence the
    payload actually exercised the reconstruction rules. Decodes all
    four 8-bit color types (0 grayscale, 2 truecolor, 3 palette via
    PLTE lookup, 6 RGBA), both sequential and Adam7-interlaced (the
    per-filter reconstruction is byte-general, only `bpp` varies);
    sub-byte/16-bit depths, unknown color types, and unknown
    interlace methods raise with the reason."""
    import zlib

    ihdr = None
    idat = bytearray()
    seen_idat = False
    plte = None
    for ctype, data in _png_chunks(payload):
        if ihdr is None:
            if ctype != b"IHDR":
                raise ValueError("PNG first chunk must be IHDR")
            if len(data) != 13:
                raise ValueError("PNG IHDR length must be 13")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if len(data) % 3 or not 3 <= len(data) <= 768:
                raise ValueError("PNG PLTE length invalid")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
            seen_idat = True
    if ihdr is None:
        raise ValueError("PNG has no IHDR")
    if not seen_idat:
        raise ValueError("PNG has no IDAT")
    w, h, depth, ctype_i, comp, fmethod, interlace = ihdr
    if depth != 8 or (ctype_i not in _PNG_CHANNELS_BY_CTYPE
                      and ctype_i != 3):
        raise ValueError(
            f"unsupported PNG profile (bit_depth={depth}, "
            f"color_type={ctype_i}); only 8-bit grayscale/truecolor/"
            "palette/RGBA decode here")
    if ctype_i == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    if comp != 0 or fmethod != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if w < 1 or h < 1:
        raise ValueError(f"invalid PNG dimensions {w}x{h}")
    raw = zlib.decompress(bytes(idat))
    bpp = 1 if ctype_i == 3 else _PNG_CHANNELS_BY_CTYPE[ctype_i]
    filters_seen: set[int] = set()
    if interlace == 1:
        out7 = np.zeros((h, w, bpp), dtype=np.uint8)
        pos = 0
        for ox, oy, sx, sy in _ADAM7:
            pw = len(range(ox, w, sx))
            ph = len(range(oy, h, sy))
            if pw == 0 or ph == 0:
                continue
            rb = pw * bpp
            prior = bytes(rb)
            for r in range(ph):
                if pos + 1 + rb > len(raw):
                    raise ValueError("Adam7 scanline stream truncated")
                ftype = raw[pos]
                if ftype > 4:
                    raise ValueError(f"invalid PNG filter type {ftype}")
                filters_seen.add(ftype)
                recon = _png_recon_row(
                    raw[pos + 1:pos + 1 + rb], prior, bpp, ftype)
                out7[oy + r * sy, ox::sx] = np.frombuffer(
                    recon, dtype=np.uint8).reshape(pw, bpp)
                prior = recon
                pos += 1 + rb
        if pos != len(raw):
            raise ValueError(
                f"Adam7 stream has {len(raw) - pos} trailing bytes")
        if ctype_i == 3:
            if int(out7.max(initial=0)) >= plte.shape[0]:
                raise ValueError("PNG palette index out of range")
            out7 = plte[out7[:, :, 0]]
        return out7, len(filters_seen)
    row_bytes = w * bpp
    if len(raw) != h * (1 + row_bytes):
        raise ValueError(
            f"PNG scanline stream is {len(raw)} bytes, "
            f"expected {h * (1 + row_bytes)}")
    out = np.empty((h, row_bytes), dtype=np.uint8)
    prior = bytes(row_bytes)
    for r in range(h):
        ftype = raw[r * (1 + row_bytes)]
        if ftype > 4:
            raise ValueError(f"invalid PNG filter type {ftype}")
        filters_seen.add(ftype)
        filt = raw[r * (1 + row_bytes) + 1:(r + 1) * (1 + row_bytes)]
        recon = _png_recon_row(bytes(filt), prior, bpp, ftype)
        out[r] = np.frombuffer(recon, dtype=np.uint8)
        prior = recon
    grid = out.reshape(h, w, bpp)
    if ctype_i == 3:
        if int(grid.max(initial=0)) >= plte.shape[0]:
            raise ValueError("PNG palette index out of range")
        grid = plte[grid[:, :, 0]]
    return grid, len(filters_seen)


def png_decode(payload: bytes) -> dict:
    """Parse a PNG into exact integer statistics::

        {width, height, bit_depth, px_sum, px_min, px_max,
         n_filter_kinds}

    ``px_sum`` is the exact integer sum over every channel byte of
    every RECONSTRUCTED pixel; ``n_filter_kinds`` counts the distinct
    scanline filter types undone — the hash-checkable proof that the
    Sub/Up/Average/Paeth rules actually ran, not just filter 0."""
    px, kinds = png_decode_pixels(payload)
    return {
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
        "bit_depth": 8,
        "px_sum": int(px.astype(np.int64).sum()),
        "px_min": int(px.min()),
        "px_max": int(px.max()),
        "n_filter_kinds": int(kinds),
    }


# ---------------------------------------------------------------------------
# GIF87a/89a grayscale, REAL LZW (round 12 — the second compressed
# class after r11's DEFLATE/PNG): a GIF image is a palette-indexed
# pixel stream compressed with variable-width LZW (9→12-bit codes,
# dictionary rebuilt by the decoder as it reads — the classic
# Welch 1984 scheme). Pure integer arithmetic end to end, so the
# "compressed formats need codec libraries" gate does not apply;
# JPEG/MP3/H.264 (DCT/entropy-coded) still raise honestly.
# ---------------------------------------------------------------------------

_GIF_SIG = b"GIF89a"
_LZW_MAX_CODE = 4096  # 12-bit ceiling, per spec


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_interlace_order(h: int) -> list[int]:
    """GIF89a Appendix E row order: pass 1 rows 0,8,16…, pass 2 rows
    4,12…, pass 3 rows 2,6,10…, pass 4 the odd rows. Storage row j of
    an interlaced image holds ORIGINAL row ``order[j]``."""
    order: list[int] = []
    for start, step in _GIF_INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def gif_encode(pixels: np.ndarray, *, interlaced: bool = False) -> bytes:
    """Canonical grayscale GIF89a: one frame, 256-entry identity-gray
    global color table (palette[i] = (i, i, i)), 8-bit LZW minimum
    code size, REAL LZW compression (greedy longest-match dictionary,
    variable code width 9→12 bits, CLEAR emitted when the table
    fills). `pixels` is (h, w) uint8 of palette indices == gray
    values. With ``interlaced=True`` the rows are written in the
    four-pass Appendix-E order and the image descriptor sets the
    interlace flag (0x40).

    The emitted code widths follow the DECODER's table trajectory
    (which lags the encoder's by one entry — the decoder learns the
    entry for code k only while processing code k+1), so any
    spec-compliant decoder reads every code at the width it was
    written."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError("pixels must be (h, w) uint8 gray indices")
    h, w = px.shape
    if h < 1 or w < 1:
        raise ValueError("GIF requires positive dimensions")
    if interlaced:
        px = px[np.array(gif_interlace_order(h), dtype=np.int64)]

    mcs = 8
    clear, eoi = 1 << mcs, (1 << mcs) + 1

    bits = bytearray()
    bitbuf, nbits = 0, 0

    # decoder-trajectory width bookkeeping (see docstring)
    state = {"size": mcs + 1, "dec_next": eoi + 1, "first": True}

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += state["size"]
        while nbits >= 8:
            bits.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    def emit_data(code: int) -> None:
        # a data (or EOI) code: after the decoder consumes it, it adds
        # one table entry (except for the first code after a clear)
        emit(code)
        if state["first"]:
            state["first"] = False
        else:
            if state["dec_next"] < _LZW_MAX_CODE:
                state["dec_next"] += 1
                if (state["dec_next"] == (1 << state["size"])
                        and state["size"] < 12):
                    state["size"] += 1

    def emit_clear() -> None:
        emit(clear)
        state["size"] = mcs + 1
        state["dec_next"] = eoi + 1
        state["first"] = True

    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << mcs)}
    next_code = eoi + 1
    emit_clear()
    cur = b""
    for b in px.tobytes():
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        emit_data(table[cur])
        if next_code < _LZW_MAX_CODE:
            table[cand] = next_code
            next_code += 1
        if next_code == _LZW_MAX_CODE:
            # table full: reset both sides (simple-clear policy; the
            # decoder also supports deferred clear, tested separately)
            emit_clear()
            table = {bytes([i]): i for i in range(1 << mcs)}
            next_code = eoi + 1
        cur = bytes([b])
    if cur:
        emit_data(table[cur])
    emit_data(eoi)
    if nbits:
        bits.append(bitbuf & 0xFF)

    palette = bytes(v for i in range(256) for v in (i, i, i))
    out = bytearray()
    out += _GIF_SIG
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0x00, 0x00])  # GCT present, 8-bit, 256 entries
    out += palette
    out += (b"\x2C" + struct.pack("<HHHH", 0, 0, w, h)
            + bytes([0x40 if interlaced else 0x00]))
    out += bytes([mcs])
    for i in range(0, len(bits), 255):
        block = bits[i:i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3B"
    return bytes(out)


def _gif_lzw_decode(data: bytes, mcs: int,
                    n_expected: int) -> tuple[bytes, int]:
    """Variable-width LZW decode (GIF flavor, LSB-first bit packing).
    Returns (index bytes, n_dict_codes) where `n_dict_codes` counts
    consumed codes that name DICTIONARY-BUILT entries (code > EOI) —
    the hash-checkable proof the Welch reconstruction actually ran,
    the `n_filter_kinds` device of the PNG tier. Handles the KwKwK
    case (a code naming the entry being defined) and deferred clear
    (full table, no CLEAR: decoding continues with the frozen
    table)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    base = [bytes([i]) for i in range(1 << mcs)]

    out = bytearray()
    table = list(base)
    size = mcs + 1
    prev: bytes | None = None
    n_dict_codes = 0

    bitbuf, nbits, pos = 0, 0, 0
    while True:
        while nbits < size:
            if pos >= len(data):
                raise ValueError("GIF LZW stream ended before EOI")
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << size) - 1)
        bitbuf >>= size
        nbits -= size

        if code == clear:
            table = list(base)
            size = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        # codes 0..clear-1 are literals at table[code]; clear/eoi are
        # not stored, so dictionary code k (k > eoi) lives at
        # table[k - 2]; len(table) + 2 is the next code to be defined
        if prev is None:
            if code >= clear:
                raise ValueError("first GIF LZW code must be a literal")
            entry = table[code]
        else:
            if code > eoi:
                n_dict_codes += 1
            idx = code if code < clear else code - 2
            if idx < len(table):
                entry = table[idx]
            elif idx == len(table):
                entry = prev + prev[:1]  # KwKwK: defined by this code
            else:
                raise ValueError(f"GIF LZW code {code} beyond table")
            if len(table) + 2 < _LZW_MAX_CODE:
                table.append(prev + entry[:1])
                if (len(table) + 2 == (1 << size)) and size < 12:
                    size += 1
        out += entry
        prev = entry
        if len(out) > n_expected:
            raise ValueError(
                f"GIF LZW produced {len(out)} indices, expected "
                f"{n_expected}")
    if len(out) != n_expected:
        raise ValueError(
            f"GIF LZW produced {len(out)} indices, expected {n_expected}")
    return bytes(out), n_dict_codes


def gif_decode_pixels(payload: bytes) -> tuple[np.ndarray, np.ndarray, int]:
    """Full GIF decode: header + logical screen descriptor, global
    color table, extension-block skipping, image descriptor, REAL
    variable-width LZW expansion, trailer check. Returns
    ``(index grid (h, w) uint8, palette (256, 3) uint8,
    n_dict_codes)``. Supports the profile the encoder writes (single
    non-interlaced frame, global color table, no local table);
    interlaced / local-table / multi-frame files raise with the
    reason — strict, like the PNG/BMP decoders."""
    if payload[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("GIF header truncated")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    if not packed & 0x80:
        raise ValueError("GIF without a global color table not supported")
    gct_n = 2 << (packed & 0x07)
    if pos + 3 * gct_n > len(payload):
        raise ValueError("GIF global color table truncated")
    palette = np.frombuffer(
        payload[pos:pos + 3 * gct_n], dtype=np.uint8).reshape(gct_n, 3)
    pos += 3 * gct_n

    while True:
        if pos >= len(payload):
            raise ValueError("GIF ended before an image descriptor")
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("GIF extension truncated")
                n = payload[pos]
                pos += 1
                if n == 0:
                    break
                pos += n
        elif block == 0x2C:
            break
        elif block == 0x3B:
            raise ValueError("GIF trailer before any image data")
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")

    if pos + 9 > len(payload):
        raise ValueError("GIF image descriptor truncated")
    left, top, w, h = struct.unpack_from("<HHHH", payload, pos)
    iflags = payload[pos + 8]
    pos += 9
    if iflags & 0x80:
        raise ValueError("GIF local color tables not supported")
    interlaced = bool(iflags & 0x40)
    if (left, top) != (0, 0) or (w, h) != (sw, sh):
        raise ValueError("GIF sub-rectangle frames not supported")
    if w < 1 or h < 1:
        raise ValueError(f"invalid GIF dimensions {w}x{h}")

    if pos >= len(payload):
        raise ValueError("GIF missing LZW minimum code size")
    mcs = payload[pos]
    pos += 1
    if not 2 <= mcs <= 8:
        raise ValueError(f"invalid GIF LZW minimum code size {mcs}")
    data = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("GIF image data truncated")
        n = payload[pos]
        pos += 1
        if n == 0:
            break
        data += payload[pos:pos + n]
        pos += n
    if pos >= len(payload) or payload[pos] != 0x3B:
        raise ValueError("GIF missing trailer")

    idx, n_dict_codes = _gif_lzw_decode(bytes(data), mcs, w * h)
    grid = np.frombuffer(idx, dtype=np.uint8).reshape(h, w)
    if interlaced:
        out = np.empty_like(grid)
        out[np.array(gif_interlace_order(h), dtype=np.int64)] = grid
        grid = out
    return grid, palette, n_dict_codes


def gif_decode(payload: bytes) -> dict:
    """Parse a GIF into exact integer statistics::

        {width, height, px_sum, px_min, px_max, n_dict_codes}

    Pixel values are the palette-mapped RED channel (== the gray
    value under the encoder's identity-gray table); ``n_dict_codes``
    counts LZW codes that named dictionary-built entries — the proof
    the Welch reconstruction ran, not just literal passthrough."""
    grid, palette, n_dict = gif_decode_pixels(payload)
    gray = palette[grid, 0].astype(np.int64)
    return {
        "width": int(grid.shape[1]),
        "height": int(grid.shape[0]),
        "px_sum": int(gray.sum()),
        "px_min": int(gray.min()),
        "px_max": int(gray.max()),
        "n_dict_codes": int(n_dict),
    }
