"""Pure-Python PNG/WAV codecs + the real multimodal decode backend."""

import struct
import zlib

import numpy as np
import pytest
import ray.data

from engine import codecs, multimodal


@pytest.mark.parametrize("shape", [(7, 5), (6, 9, 3), (4, 4, 4)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=shape).astype(np.uint8)
    back = codecs.png_decode(codecs.png_encode(img))
    np.testing.assert_array_equal(back, img)


def test_png_all_filters_decode():
    """Our encoder emits filter 0 only; hand-filter scanlines with types
    1-4 (Sub/Up/Average/Paeth) and check the decoder reconstructs."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(5, 6, 3)).astype(np.uint8)
    h, w, bpp = img.shape
    recon = img.reshape(h, w * bpp).astype(np.int64)
    raws = []
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        line = recon[y]
        prev = recon[y - 1] if y else np.zeros(w * bpp, np.int64)
        filt = np.zeros(w * bpp, np.int64)
        for i in range(w * bpp):
            left = line[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                filt[i] = line[i]
            elif ftype == 1:
                filt[i] = line[i] - left
            elif ftype == 2:
                filt[i] = line[i] - up
            elif ftype == 3:
                filt[i] = line[i] - (left + up) // 2
            else:
                filt[i] = line[i] - codecs._paeth(int(left), int(up), int(ul))
        raws.append(bytes([ftype]) + (filt & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        codecs._PNG_SIG
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(b"".join(raws)))
        + codecs._chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(codecs.png_decode(data), img)


def test_wav_roundtrip():
    rng = np.random.default_rng(5)
    samples = rng.integers(-(1 << 15), 1 << 15, size=777).astype(np.int16)
    back, rate = codecs.wav_decode(codecs.wav_encode(samples, 22_050))
    assert rate == 22_050
    np.testing.assert_array_equal(back, samples)


@pytest.mark.parametrize("shape,fps", [((1, 1, 1, 3), 1), ((3, 5, 7, 3), 10),
                                        ((4, 16, 9, 3), 25)])
def test_avi_roundtrip(shape, fps):
    """Odd widths exercise the 4-byte scanline padding."""
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=shape).astype(np.uint8)
    back, back_fps = codecs.avi_decode(codecs.avi_encode(frames, fps=fps))
    assert back_fps == fps
    np.testing.assert_array_equal(back, frames)


def test_avi_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        codecs.avi_decode(b"not an avi at all")
    good = codecs.avi_encode(
        np.zeros((2, 4, 4, 3), dtype=np.uint8), fps=10
    )
    with pytest.raises(ValueError):
        codecs.avi_decode(good[:-20])  # truncated last frame


def test_nearest_resize_shape():
    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    out = codecs.nearest_resize(img, width=3, height=8)
    assert out.shape == (8, 3)
    # nearest mapping: y -> (y*4)//8, x -> (x*6)//3
    assert out[0, 0] == img[0, 0]
    assert out[-1, -1] == img[(7 * 4) // 8, (2 * 6) // 3]


def test_real_decode_featurize_end_to_end():
    """Actor-pool featurize with the REAL backend over genuine PNG/WAV
    payloads — image/audio features come from actual pixels/samples."""
    tbl = multimodal.synthetic_media_table(n=12, real_payloads=True)
    media = ray.data.from_arrow(tbl).filter(
        lambda r: r["kind"] in ("image", "audio")
    )
    feats = media.map_batches(
        multimodal.DecodeAndFeaturize,
        fn_constructor_kwargs=dict(feature_dim=12, decode_backend="real"),
        batch_format="pyarrow",
        batch_size=4,
        concurrency=2,
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(feats) == 8  # 4 images + 4 audio of the 12 rows
    # image rows: leading feature fields are (h, w, channels) of the real
    # decode — check one against a direct decode of the same payload
    row = feats[feats["kind"] == "image"].iloc[0]
    payload = tbl.filter(
        np.asarray(
            [m == row["media_id"] for m in tbl.column("media_id").to_pylist()]
        )
    ).column("payload").to_pylist()[0]
    img = codecs.png_decode(payload)
    f = np.asarray(row["features"])
    assert (f[0], f[1], f[2]) == (img.shape[0], img.shape[1], 3)
    np.testing.assert_allclose(f[3], img.astype(np.float64).mean())


def test_real_video_featurize_and_frame_sample():
    """REAL backend over genuine AVI payloads: features come from actual
    decoded frames, and FrameSample emits true PNG-encoded frames."""
    tbl = multimodal.synthetic_media_table(n=12, real_payloads=True)
    videos = ray.data.from_arrow(tbl).filter(lambda r: r["kind"] == "video")
    feats = videos.map_batches(
        multimodal.DecodeAndFeaturize,
        fn_constructor_kwargs=dict(feature_dim=12, decode_backend="real"),
        batch_format="pyarrow",
        batch_size=4,
        concurrency=1,
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(feats) == 4
    row = feats.iloc[0]
    payload = tbl.filter(
        np.asarray(
            [m == row["media_id"] for m in tbl.column("media_id").to_pylist()]
        )
    ).column("payload").to_pylist()[0]
    frames, fps = codecs.avi_decode(payload)
    f = np.asarray(row["features"])
    assert (f[0], f[1], f[2], f[3]) == (
        frames.shape[0], frames.shape[1], frames.shape[2], fps
    )
    np.testing.assert_allclose(f[4], frames.astype(np.float64).mean())

    out = videos.map_batches(
        multimodal.FrameSample,
        fn_constructor_kwargs=dict(frames_per_video=2, decode_backend="real"),
        batch_format="pyarrow",
        batch_size=4,
        concurrency=1,
    ).to_pandas().sort_values(["media_id", "frame_no"]).reset_index(drop=True)
    assert len(out) == 8  # 2 frames × 4 videos
    # sampled frame 0 of this video is the actual frame at idx (0.5*n/2)
    first = out[out["media_id"] == row["media_id"]].iloc[0]
    idx = min(int(0.5 * frames.shape[0] / 2), frames.shape[0] - 1)
    np.testing.assert_array_equal(
        codecs.png_decode(bytes(first["frame_png"])), frames[idx]
    )
    assert first["ts_ms"] == int(idx * 1000 / fps)


def test_real_resize_end_to_end():
    tbl = multimodal.synthetic_media_table(n=6, real_payloads=True)
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(
            multimodal.Resize,
            fn_constructor_kwargs=dict(width=10, height=7, decode_backend="real"),
            batch_format="pyarrow",
            batch_size=3,
            concurrency=1,
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    img_rows = out[out["kind"] == "image"]
    assert len(img_rows) > 0
    for p in img_rows["payload"]:
        assert codecs.png_decode(bytes(p)).shape == (7, 10, 3)
