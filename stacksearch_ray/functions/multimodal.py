"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

Decode is REAL for the public formats reachable without codec
libraries: BMP and PNG payloads decode to pixels (PNG via stdlib zlib
+ the filter algebra in media_codec.py), WAV payloads to PCM samples,
and DIB or MJPEG AVI payloads to frame arrays; features and frame
fingerprints are computed from the actual pixels/samples. Formats
whose entropy coders need external libraries (mp4) remain
honestly stubbed —
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded by payload bytes) produces stable
rows for plumbing tests.

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


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 4096,
                      audio_rate: int = 4000) -> pa.Table:
    """Deterministic media rows with REAL payloads across all three
    modalities: images rotate valid 24-bit BMPs, PNGs (mixed
    per-row filters) and baseline JPEGs (jpeg_codec.py), so every
    decoder path runs; audio is valid mono
    16-bit PCM WAV (sine + noise), video alternates uncompressed-DIB
    and MJPEG AVI (random frames) — every payload decodes with the pure-NumPy/stdlib
    codecs in media_codec.py."""
    from .jpeg_codec import encode_jpeg
    from .media_codec import (encode_avi, encode_bmp,
                              encode_mjpeg_avi, encode_png,
                              encode_wav)

    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in ("media_id", "kind", "format", "width",
                            "height", "duration_ms", "payload")}
    n_images = 0
    for i in range(n):
        kind = kinds[i % 3]
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        if kind == "image":
            fmt = ("bmp", "png", "jpeg")[n_images % 3]
            n_images += 1
            rows["format"].append(fmt)
            w, h = int(rng.integers(16, 96)), int(rng.integers(16, 96))
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["duration_ms"].append(0)
            rows["payload"].append(
                encode_bmp(img) if fmt == "bmp"
                else encode_png(img, filter_type="mixed")
                if fmt == "png" else encode_jpeg(img, quality=90))
        elif kind == "audio":
            rows["format"].append("wav")
            dur = int(rng.integers(500, 30_000))
            t = np.arange(int(audio_rate * dur / 1000))
            freq = float(rng.uniform(50, audio_rate / 4))
            x = (0.5 * np.sin(2 * np.pi * freq * t / audio_rate)
                 + 0.1 * rng.standard_normal(len(t)))
            samples = np.clip(x * 32767, -32768, 32767).astype(np.int16)
            rows["width"].append(0)
            rows["height"].append(0)
            rows["duration_ms"].append(dur)
            rows["payload"].append(encode_wav(samples, audio_rate))
        else:
            rows["format"].append("avi")
            fps = 4
            n_frames = int(rng.integers(2, 12))
            w, h = int(rng.integers(16, 48)), int(rng.integers(16, 48))
            frames = rng.integers(0, 256, (n_frames, h, w, 3),
                                  dtype=np.uint8)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["duration_ms"].append(n_frames * 1000 // fps)
            # alternate uncompressed DIB and MJPEG (decode_avi handles
            # both by the stream handler fourcc)
            rows["payload"].append(
                encode_avi(frames, fps) if i % 2 == 0
                else encode_mjpeg_avi(frames, fps))
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeImageFeatures:
    """Actor-pool stage: decoder state built once per actor, decode per
    batch. BMP payloads decode to REAL pixels (media_codec.decode_bmp)
    and features come from them; other formats raise unless
    ``fake=True`` (hash-seeded plumbing features)."""

    FEATURE_DIM = 16

    def __init__(self, fake: bool = False, resize_to: int = 64):
        self.fake = fake
        self.resize_to = resize_to

    def _decode_one(self, payload: bytes, fmt: str) -> np.ndarray:
        if self.fake:
            # deterministic fake: features derived from sha256(payload)
            h = hashlib.sha256(payload).digest()
            return (np.frombuffer(h[:self.FEATURE_DIM], dtype=np.uint8)
                    .astype(np.float32) / 255.0)
        if fmt == "bmp":
            from .media_codec import decode_bmp, image_features

            return image_features(decode_bmp(payload), self.FEATURE_DIM,
                                  self.resize_to)
        if fmt == "png":
            from .media_codec import decode_png, image_features, png_to_rgb

            return image_features(png_to_rgb(decode_png(payload)),
                                  self.FEATURE_DIM, self.resize_to)
        if fmt in ("jpeg", "jpg"):
            from .jpeg_codec import decode_jpeg
            from .media_codec import image_features

            return image_features(decode_jpeg(payload),
                                  self.FEATURE_DIM, self.resize_to)
        raise NotImplementedError(
            f"image format {fmt!r} needs a decoder library not present "
            "in this environment (bmp, png and baseline jpeg decode "
            "natively; fake=True for plumbing tests)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch["kind"], "image"))
        payloads = batch["payload"].to_pylist()
        fmts = batch["format"].to_pylist()
        feats = (np.stack([self._decode_one(p, f)
                           for p, f in zip(payloads, fmts)])
                 if payloads else
                 np.zeros((0, self.FEATURE_DIM), dtype=np.float32))
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), self.FEATURE_DIM),
            "payload_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        })


class ExtractAudioFeatures:
    """Actor-pool stage for audio: one fixed-dim feature row per
    ``window_ms`` of audio. WAV payloads decode to REAL PCM samples
    (media_codec.decode_wav) and each window's features (RMS,
    zero-crossings, band powers) come from them; other formats raise
    unless ``fake=True`` (hash-seeded, duration-metadata-driven)."""

    FEATURE_DIM = 12

    def __init__(self, window_ms: int = 10_000, fake: bool = False):
        self.window_ms = window_ms
        self.fake = fake

    def _fake_features(self, payload: bytes, t: int) -> np.ndarray:
        h = hashlib.sha256(payload + t.to_bytes(8, "little")).digest()
        return (np.frombuffer(h[:self.FEATURE_DIM], dtype=np.uint8)
                .astype(np.float32) / 255.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .media_codec import audio_window_features, decode_wav

        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        fmts = batch["format"].to_pylist()
        durs = batch["duration_ms"].to_pylist()
        payloads = batch["payload"].to_pylist()
        m_out, w_out, f_out = [], [], []
        for mid, kind, fmt, dur, payload in zip(ids, kinds, fmts, durs,
                                                payloads):
            if kind != "audio":
                continue
            if self.fake:
                for w, t in enumerate(range(0, dur, self.window_ms)):
                    m_out.append(mid)
                    w_out.append(w)
                    f_out.append(self._fake_features(payload, t))
                continue
            if fmt != "wav":
                raise NotImplementedError(
                    f"audio format {fmt!r} needs a decoder library not "
                    "present in this environment (wav decodes natively; "
                    "fake=True for plumbing tests)")
            samples, rate = decode_wav(payload)
            step = max(1, rate * self.window_ms // 1000)
            for w, s in enumerate(range(0, len(samples), step)):
                m_out.append(mid)
                w_out.append(w)
                f_out.append(audio_window_features(
                    samples[s:s + step], self.FEATURE_DIM))
        feats = (np.stack(f_out) if f_out
                 else np.zeros((0, self.FEATURE_DIM), dtype=np.float32))
        return pa.table({
            "media_id": pa.array(m_out, pa.int64()),
            "window_idx": pa.array(w_out, pa.int32()),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1), pa.float32()), self.FEATURE_DIM),
        })


class SampleVideoFrames:
    """Actor-pool stage for frame sampling: emits one row per sampled
    frame (every ``stride_ms``). AVI payloads decode to REAL frames
    (media_codec.decode_avi — DIB or MJPEG) and ``frame_sha``
    fingerprints the actual pixel bytes; compressed containers (mp4)
    raise unless ``fake=True`` (hash-seeded plumbing rows)."""

    def __init__(self, stride_ms: int = 1000, fake: bool = False):
        self.stride_ms = stride_ms
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds = batch["media_id"].to_pylist(), batch["kind"].to_pylist()
        fmts = batch["format"].to_pylist()
        durs = batch["duration_ms"].to_pylist()
        payloads = batch["payload"].to_pylist()
        m_out, f_out, t_out, h_out = [], [], [], []
        for mid, kind, fmt, dur, payload in zip(ids, kinds, fmts, durs,
                                                payloads):
            if kind != "video":
                continue
            if self.fake:
                for j, t in enumerate(range(0, dur, self.stride_ms)):
                    m_out.append(mid)
                    f_out.append(j)
                    t_out.append(t)
                    h_out.append(hashlib.sha256(
                        payload + t.to_bytes(8, "little")).hexdigest()[:16])
                continue
            if fmt != "avi":
                raise NotImplementedError(
                    f"video format {fmt!r} needs a decoder library not "
                    "present in this environment (uncompressed avi decodes "
                    "natively; fake=True for plumbing tests)")
            from .media_codec import decode_avi

            frames, fps = decode_avi(payload)
            for t in range(0, dur, self.stride_ms):
                idx = min(t * fps // 1000, len(frames) - 1)
                m_out.append(mid)
                f_out.append(int(idx))
                t_out.append(t)
                h_out.append(hashlib.sha256(
                    frames[idx].tobytes()).hexdigest()[:16])
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
