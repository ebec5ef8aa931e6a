"""Pure-Python (stdlib + numpy) PNG and WAV codecs for the multimodal
stages — this container ships no image/audio libraries, but PNG is just
zlib (stdlib) + per-row filters and WAV PCM is a struct parse, so the
"real" decode backend can be genuinely real for those two formats.
Video stays an honest stub (no codec exists in the stdlib).

Scope (asserted, never silently wrong): PNG 8-bit depth, color types
0 (grey) / 2 (RGB) / 6 (RGBA), non-interlaced — all five scanline
filters on decode; encode always writes filter 0. WAV: PCM 16-bit.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """uint8 image array → PNG bytes. Shapes: (H, W) grey, (H, W, 3) RGB,
    (H, W, 4) RGBA. Filter 0 (None) on every scanline."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
        flat = img
    elif img.ndim == 3 and img.shape[2] == 4:
        color_type, channels = 6, 4
        flat = img
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = flat.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.concatenate(
        [
            np.concatenate([[0], row.reshape(-1)]).astype(np.uint8)
            for row in flat
        ]
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Undo per-scanline PNG filters. None/Up are vectorized; Sub is a
    per-channel-lane cumsum; Average/Paeth fall back to a per-byte loop
    (correctness over speed — scale comes from the actor pool, not from
    optimizing a filter mode our own encoder never emits)."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    for y in range(h):
        ftype = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = line + prev
        elif ftype == 1:  # Sub: per-lane prefix sum
            rec = line.copy()
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(rec[lane::bpp])
        else:  # Average (3) / Paeth (4): left-dependent, per byte
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                up = prev[i]
                ul = prev[i - bpp] if i >= bpp else 0
                if ftype == 3:
                    rec[i] = (line[i] + (left + up) // 2) & 0xFF
                elif ftype == 4:
                    rec[i] = (
                        line[i] + _paeth(int(left), int(up), int(ul))
                    ) & 0xFF
                else:
                    raise ValueError(f"unknown PNG filter {ftype}")
            out[y] = (rec & 0xFF).astype(np.uint8)
            continue
        out[y] = (rec & 0xFF).astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (H, W) for grey, (H, W, C) otherwise."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color_type not in _COLOR_CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color_type}, "
            f"interlace={interlace}); supported: 8-bit grey/RGB/RGBA"
        )
    channels = _COLOR_CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    expect = h * (w * channels + 1)
    if len(raw) != expect:
        raise ValueError(f"PNG data length {len(raw)} != expected {expect}")
    out = _unfilter(raw, h, w, channels)
    img = out.reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img


def nearest_resize(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (pure indexing — deterministic)."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(height) * h) // max(height, 1), h - 1)
    xs = np.minimum((np.arange(width) * w) // max(width, 1), w - 1)
    return img[ys][:, xs]


def wav_encode(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono samples → canonical 44-byte-header PCM WAV."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """PCM-16 WAV bytes → (int16 sample array [n] or [n, channels], rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif tag == b"data":
            pcm = payload
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV (format={audio_format}, bits={bits}); "
            "supported: PCM 16-bit"
        )
    samples = np.frombuffer(pcm, dtype="<i2")
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return samples, rate
