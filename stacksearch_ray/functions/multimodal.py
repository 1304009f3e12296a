"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The decode kernels themselves are STUBBED (image/audio libraries are not
in this environment): ``DecodeImageFeatures`` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder (seeded
by payload bytes) produces stable feature vectors. Everything Ray-side —
schema, batch sizing, actor signature, broadcast of stage config, output
layout — is real and tested, so swapping in a real PIL/libav decoder is a
one-function change.

Batch-size guidance (SURVEY.md memory notes): with B-byte payloads pick
``batch_size ≈ target_batch_bytes / B`` so batch × concurrency fits the
worker heap; blocks stay Arrow binary (zero-copy) end to end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),           # image | audio | video
    ("format", pa.string()),         # png, wav, mp4, ...
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
    ("payload", pa.binary()),
])


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows (payload = seeded pseudo-bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in ("media_id", "kind", "format", "width",
                            "height", "duration_ms", "payload")}
    fmts = {"image": "png", "audio": "wav", "video": "mp4"}
    for i in range(n):
        kind = kinds[i % 3]
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["format"].append(fmts[kind])
        rows["width"].append(int(rng.integers(16, 512)) if kind != "audio" else 0)
        rows["height"].append(int(rng.integers(16, 512)) if kind != "audio" else 0)
        rows["duration_ms"].append(int(rng.integers(100, 60000)) if kind != "image" else 0)
        rows["payload"].append(rng.integers(0, 256, payload_bytes,
                                            dtype=np.uint8).tobytes())
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeImageFeatures:
    """Actor-pool stage: 'model' load once per actor, decode per batch.

    Real deployment: __init__ loads the decoder/model; __call__ decodes
    payloads and emits feature vectors. Here the decode is stubbed."""

    FEATURE_DIM = 16

    def __init__(self, fake: bool = False, resize_to: int = 64):
        self.fake = fake
        self.resize_to = resize_to
        # real impl: self.model = load_image_model(); here: nothing to load.

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires an image library not present in this "
                "environment; construct with fake=True for plumbing tests")
        # deterministic fake: features derived from sha256 of the payload
        h = hashlib.sha256(payload).digest()
        return (np.frombuffer(h[:self.FEATURE_DIM], dtype=np.uint8)
                .astype(np.float32) / 255.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.stack([self._decode_one(p) for p in payloads])
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), self.FEATURE_DIM),
            "payload_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        })


class ExtractAudioFeatures:
    """Actor-pool stage for audio: emits one fixed-dim feature row per
    ``window_ms`` of audio (duration-aware), decode stubbed like the
    image path (a real impl swaps _features_one for a resample+FFT)."""

    FEATURE_DIM = 12

    def __init__(self, window_ms: int = 10_000, fake: bool = False):
        self.window_ms = window_ms
        self.fake = fake

    def _features_one(self, payload: bytes, t: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "audio decode requires an audio library not present in this "
                "environment; construct with fake=True for plumbing tests")
        h = hashlib.sha256(payload + t.to_bytes(8, "little")).digest()
        return (np.frombuffer(h[:self.FEATURE_DIM], dtype=np.uint8)
                .astype(np.float32) / 255.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        durs = batch["duration_ms"].to_pylist()
        payloads = batch["payload"].to_pylist()
        m_out, w_out, f_out = [], [], []
        for mid, kind, dur, payload in zip(ids, kinds, durs, payloads):
            if kind != "audio":
                continue
            for w, t in enumerate(range(0, dur, self.window_ms)):
                m_out.append(mid)
                w_out.append(w)
                f_out.append(self._features_one(payload, t))
        feats = (np.stack(f_out) if f_out
                 else np.zeros((0, self.FEATURE_DIM), dtype=np.float32))
        return pa.table({
            "media_id": pa.array(m_out, pa.int64()),
            "window_idx": pa.array(w_out, pa.int32()),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), self.FEATURE_DIM),
        })


class SampleVideoFrames:
    """Actor-pool stage for frame sampling: emits one row per sampled frame
    index (every ``stride_ms``), payload decode stubbed the same way."""

    def __init__(self, stride_ms: int = 1000, fake: bool = False):
        self.stride_ms = stride_ms
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds = batch["media_id"].to_pylist(), batch["kind"].to_pylist()
        durs = batch["duration_ms"].to_pylist()
        payloads = batch["payload"].to_pylist()
        m_out, f_out, t_out, h_out = [], [], [], []
        for mid, kind, dur, payload in zip(ids, kinds, durs, payloads):
            if kind != "video":
                continue
            if not self.fake:
                raise NotImplementedError(
                    "video decode requires libav; use fake=True for tests")
            for j, t in enumerate(range(0, dur, self.stride_ms)):
                m_out.append(mid)
                f_out.append(j)
                t_out.append(t)
                h_out.append(hashlib.sha256(
                    payload + t.to_bytes(8, "little")).hexdigest()[:16])
        return pa.table({
            "media_id": pa.array(m_out, pa.int64()),
            "frame_idx": pa.array(f_out, pa.int32()),
            "ts_ms": pa.array(t_out, pa.int32()),
            "frame_sha": pa.array(h_out, pa.string()),
        })


def decode_features(ds: Dataset, fake: bool = False,
                    batch_size: int = 64, concurrency: int = 2) -> Dataset:
    """Image feature extraction as an actor-pool stage; small batch size
    because payloads are large binaries."""
    return ds.map_batches(
        DecodeImageFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, fn_constructor_kwargs={"fake": fake})


def sample_frames(ds: Dataset, stride_ms: int = 1000, fake: bool = False,
                  batch_size: int = 32, concurrency: int = 2) -> Dataset:
    return ds.map_batches(
        SampleVideoFrames, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"stride_ms": stride_ms, "fake": fake})
