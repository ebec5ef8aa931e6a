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


# ---- AVI (uncompressed 24-bit BI_RGB, 'DIB ' handler) ---------------------
#
# Video gets the same treatment as PNG/WAV: a genuinely-parsed container
# with an asserted scope. Uncompressed AVI is pure struct — RIFF chunks,
# BITMAPINFOHEADER, bottom-up BGR scanlines padded to 4 bytes — so the
# "real" video backend can decode actual pixels without any codec library.
# Scope: one 'vids' stream, biBitCount=24, biCompression=0 (BI_RGB).


def avi_encode(frames: np.ndarray, fps: int = 10) -> bytes:
    """uint8 frames (N, H, W, 3) RGB → uncompressed AVI bytes."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"expected (N, H, W, 3) RGB frames, got {frames.shape}")
    n, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    frame_bytes = stride * h

    def lst(tag: bytes, payload: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", 4 + len(payload)) + tag + payload

    def chk(tag: bytes, payload: bytes) -> bytes:
        out = tag + struct.pack("<I", len(payload)) + payload
        return out + (b"\x00" if len(payload) & 1 else b"")

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        frame_bytes * fps,         # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        0x10,                      # AVIF_HASINDEX off; 0x10 = was-capture-file
        n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                                        n, frame_bytes, 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl", chk(b"avih", avih) + lst(b"strl", chk(b"strh", strh) + chk(b"strf", strf))
    )
    movi_payload = b""
    pad = stride - w * 3
    for f in frames:
        bgr = f[::-1, :, ::-1]  # bottom-up rows, BGR channel order
        if pad:
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, : w * 3] = bgr.reshape(h, w * 3)
            movi_payload += chk(b"00db", rows.tobytes())
        else:
            movi_payload += chk(b"00db", bgr.tobytes())
    movi = lst(b"movi", movi_payload)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_walk(data: bytes, pos: int, end: int):
    """Yield (tag, payload_start, payload_len) for chunks in [pos, end)."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield tag, pos + 8, length
        pos += 8 + length + (length & 1)


def avi_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Uncompressed AVI bytes → (uint8 frames (N, H, W, 3) RGB, fps)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    w = h = bits = comp = None
    rate = scale = None
    frames = []
    for tag, p, ln in _riff_walk(data, 12, 12 + struct.unpack("<I", data[4:8])[0] - 4):
        if tag != b"LIST":
            continue
        kind = data[p : p + 4]
        if kind == b"hdrl":
            for t2, p2, l2 in _riff_walk(data, p + 4, p + ln):
                if t2 == b"LIST" and data[p2 : p2 + 4] == b"strl":
                    for t3, p3, l3 in _riff_walk(data, p2 + 4, p2 + l2):
                        if t3 == b"strh" and data[p3 : p3 + 4] == b"vids":
                            scale, rate = struct.unpack(
                                "<II", data[p3 + 20 : p3 + 28]
                            )
                        elif t3 == b"strf":
                            (_sz, w, h, _pl, bits, comp) = struct.unpack(
                                "<IiiHHI", data[p3 : p3 + 20]
                            )
        elif kind == b"movi":
            for t2, p2, l2 in _riff_walk(data, p + 4, p + ln):
                if t2 in (b"00db", b"00dc"):
                    frames.append((p2, l2))
    if w is None or not frames:
        raise ValueError("AVI missing stream header or frames")
    if bits != 24 or comp != 0:
        raise ValueError(
            f"unsupported AVI (bits={bits}, compression={comp}); "
            "supported: 24-bit BI_RGB"
        )
    flip = h > 0  # positive height = bottom-up rows (the normal case)
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for i, (p2, l2) in enumerate(frames):
        if l2 < stride * h or p2 + stride * h > len(data):
            raise ValueError(f"AVI frame {i} truncated ({l2} < {stride * h})")
        rows = np.frombuffer(data[p2 : p2 + stride * h], dtype=np.uint8)
        bgr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        rgb = bgr[:, :, ::-1]
        out[i] = rgb[::-1] if flip else rgb
    fps = int(round(rate / scale)) if scale else 0
    return out, fps
