"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches`` stages.

``decode_backend="real"`` performs a GENUINE decode for all three
modalities via the pure-Python codecs in ``engine.codecs``: PNG images
(zlib is stdlib), PCM WAV audio and uncompressed 24-bit BI_RGB AVI video
(both pure struct parses) — features and sampled frames come from actual
pixel/sample values, and ``Resize`` re-encodes real resized pixels. The
default ``"fake"`` backend keeps producing a deterministic pseudo-decode
from the payload's sha256 for plumbing tests on arbitrary bytes.

Large-binary guidance encoded here: small ``batch_size`` (payloads are
wide rows), ``batch_format="pyarrow"`` throughout (binary columns do not
round-trip pandas cleanly), one actor pool per stage sized by
``concurrency × num_cpus``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_duration_ms", pa.int32()),
    ]
)


def synthetic_media_table(
    n: int = 64, seed: int = 42, real_payloads: bool = False
) -> pa.Table:
    """Deterministic media corpus. ``real_payloads=True`` encodes genuine
    PNG images, PCM WAV clips and uncompressed-AVI videos so the "real"
    decode backend has true fixtures (metadata then reflects the actual
    encoded dims/durations)."""
    from . import codecs

    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        width = int(rng.integers(64, 1920)) if kind != "audio" else 0
        height = int(rng.integers(64, 1080)) if kind != "audio" else 0
        duration_ms = int(rng.integers(1000, 60000)) if kind != "image" else 0
        if real_payloads and kind == "image":
            img = rng.integers(
                0, 256, size=(int(rng.integers(8, 24)), int(rng.integers(8, 24)), 3)
            ).astype(np.uint8)
            payload = codecs.png_encode(img)
            height, width = img.shape[:2]
        elif real_payloads and kind == "audio":
            samples = rng.integers(
                -(1 << 15), 1 << 15, size=int(rng.integers(200, 800))
            ).astype(np.int16)
            payload = codecs.wav_encode(samples, sample_rate=16_000)
            duration_ms = int(len(samples) * 1000 / 16_000)
        elif real_payloads and kind == "video":
            fps = 10
            frames = rng.integers(
                0,
                256,
                size=(
                    int(rng.integers(4, 12)),
                    int(rng.integers(6, 16)),
                    int(rng.integers(6, 16)),
                    3,
                ),
            ).astype(np.uint8)
            payload = codecs.avi_encode(frames, fps=fps)
            height, width = frames.shape[1:3]
            duration_ms = int(frames.shape[0] * 1000 / fps)
        else:
            payload = rng.bytes(256 + int(rng.integers(0, 512)))
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["mime"].append(
            {
                "image": "image/png",
                "audio": "audio/wav",
                "video": "video/x-msvideo" if real_payloads else "video/mp4",
            }[kind]
        )
        rows["payload"].append(payload)
        rows["meta_width"].append(width)
        rows["meta_height"].append(height)
        rows["meta_duration_ms"].append(duration_ms)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-decode: features seeded from sha256(payload)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    return np.random.default_rng(seed).standard_normal(dim)


class DecodeAndFeaturize:
    """Actor-pool stage: payload → fixed-dim feature vector + basic props.

    ``__init__`` is where a real backend would load models/codecs once per
    actor; ``__call__`` handles one Arrow batch of binary rows.
    """

    def __init__(self, feature_dim: int = 16, decode_backend: str = "fake"):
        self.dim = feature_dim
        self.backend = decode_backend
        self.init_count = 1  # observable by tests: init ran once per actor

    def _real_features(self, payload: bytes, kind: str) -> np.ndarray:
        """Genuine decode → fixed-dim stats vector: leading shape/rate
        fields, then mean/std, then a value histogram padded to ``dim``."""
        from . import codecs

        if kind == "image":
            img = codecs.png_decode(payload)
            vals = img.reshape(-1).astype(np.float64)
            head = [
                float(img.shape[0]),
                float(img.shape[1]),
                float(img.shape[2] if img.ndim == 3 else 1),
                float(vals.mean()),
                float(vals.std()),
            ]
            hist = np.histogram(vals, bins=max(self.dim - len(head), 1),
                                range=(0, 255))[0]
        elif kind == "audio":
            samples, rate = codecs.wav_decode(payload)
            vals = samples.reshape(-1).astype(np.float64)
            head = [
                float(len(vals)),
                float(rate),
                float(vals.mean()),
                float(vals.std()),
                float(np.sqrt(np.mean(vals**2))),
            ]
            hist = np.histogram(
                vals, bins=max(self.dim - len(head), 1),
                range=(-(1 << 15), 1 << 15),
            )[0]
        else:
            frames, fps = codecs.avi_decode(payload)
            vals = frames.reshape(-1).astype(np.float64)
            head = [
                float(frames.shape[0]),
                float(frames.shape[1]),
                float(frames.shape[2]),
                float(fps),
                float(vals.mean()),
                float(vals.std()),
            ]
            hist = np.histogram(vals, bins=max(self.dim - len(head), 1),
                                range=(0, 255))[0]
        feat = np.concatenate([head, hist / max(len(vals), 1)])
        return feat[: self.dim] if len(feat) >= self.dim else np.concatenate(
            [feat, np.zeros(self.dim - len(feat))]
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        if self.backend == "real":
            kinds = batch.column("kind").to_pylist()
            feats = (
                np.stack(
                    [self._real_features(p, k) for p, k in zip(payloads, kinds)]
                )
                if payloads
                else np.zeros((0, self.dim))
            )
        else:
            feats = np.stack([_fake_features(p, self.dim) for p in payloads]) if payloads else np.zeros((0, self.dim))
        sizes = np.array([len(p) for p in payloads], dtype=np.int64)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "payload_bytes": pa.array(sizes),
                "features": pa.array(list(feats), type=pa.list_(pa.float64())),
            }
        )


class Resize:
    """Actor-pool stage: image resize. ``decode_backend="real"`` decodes
    PNG payloads, nearest-neighbor-resizes the actual pixels and
    re-encodes (non-image rows pass through untouched); the default
    "fake" backend only rewrites the metadata dims (plumbing tests on
    arbitrary bytes)."""

    def __init__(self, width: int = 224, height: int = 224,
                 decode_backend: str = "fake"):
        self.w, self.h = width, height
        self.backend = decode_backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if self.backend == "real":
            from . import codecs

            payloads = batch.column("payload").to_pylist()
            kinds = batch.column("kind").to_pylist()
            out_payloads = [
                codecs.png_encode(
                    codecs.nearest_resize(codecs.png_decode(p), self.w, self.h)
                )
                if k == "image"
                else p
                for p, k in zip(payloads, kinds)
            ]
            batch = batch.set_column(
                batch.schema.get_field_index("payload"),
                "payload",
                pa.array(out_payloads, type=pa.binary()),
            )
        return (
            batch.set_column(
                batch.schema.get_field_index("meta_width"),
                "meta_width",
                pa.array(np.full(n, self.w, dtype=np.int32), type=pa.int32()),
            )
            .set_column(
                batch.schema.get_field_index("meta_height"),
                "meta_height",
                pa.array(np.full(n, self.h, dtype=np.int32), type=pa.int32()),
            )
        )


class FrameSample:
    """Actor-pool stage: sample K frames per video row → one output row
    per frame (flat_map shape). ``decode_backend="real"`` parses the AVI
    payload and samples ACTUAL frames, re-encoding each as a PNG row
    (``frame_png``) with its true timestamp; the default "fake" backend
    emits the same (media_id, frame_no, ts_ms) plumbing from metadata
    alone, for arbitrary bytes."""

    def __init__(self, frames_per_video: int = 4, decode_backend: str = "fake"):
        self.k = frames_per_video
        self.backend = decode_backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_no, ts = [], [], []
        pngs = [] if self.backend == "real" else None
        if self.backend == "real":
            from . import codecs
        for mid, kind, dur, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("meta_duration_ms").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "video":
                continue
            if self.backend == "real":
                frames, fps = codecs.avi_decode(payload)
                n = frames.shape[0]
                for f in range(self.k):
                    idx = min(int((f + 0.5) * n / self.k), n - 1)
                    ids.append(mid)
                    frame_no.append(f)
                    ts.append(int(idx * 1000 / fps) if fps else 0)
                    pngs.append(codecs.png_encode(frames[idx]))
            else:
                for f in range(self.k):
                    ids.append(mid)
                    frame_no.append(f)
                    ts.append(int(dur * (f + 0.5) / self.k))
        cols = {
            "media_id": pa.array(ids, type=pa.int64()),
            "frame_no": pa.array(frame_no, type=pa.int32()),
            "ts_ms": pa.array(ts, type=pa.int32()),
        }
        if pngs is not None:
            cols["frame_png"] = pa.array(pngs, type=pa.binary())
        return pa.table(cols)


def featurize(
    ds: ray.data.Dataset,
    feature_dim: int = 16,
    concurrency: int | tuple = 2,
    batch_size: int = 16,
) -> ray.data.Dataset:
    """Media dataset → features. Small batch_size on purpose: binary rows
    are wide; batch × concurrency must fit worker heaps."""
    return ds.map_batches(
        DecodeAndFeaturize,
        fn_constructor_kwargs=dict(feature_dim=feature_dim),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
