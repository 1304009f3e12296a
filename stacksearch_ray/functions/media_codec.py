"""Pure-NumPy / stdlib media codecs for the multimodal stages.

No image/audio libraries exist in this environment, so the two
uncompressed public formats that need none are implemented from their
public specs:

- BMP (Windows BITMAPINFOHEADER, 24-bit BI_RGB): 14-byte file header +
  40-byte info header + bottom-up BGR rows padded to 4 bytes.
- WAV (RIFF PCM, mono 16-bit): via the stdlib ``wave`` module.

These give DecodeImageFeatures / ExtractAudioFeatures real pixels and
samples to compute features from; compressed formats (png/jpeg/mp4)
remain honestly stubbed in multimodal.py.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ---------------- BMP ----------------

_BMP_HEADER = struct.Struct("<2sIHHI")          # magic, size, r1, r2, offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")       # BITMAPINFOHEADER


def encode_bmp(img: np.ndarray) -> bytes:
    """RGB uint8 (H, W, 3) → 24-bit uncompressed BMP bytes."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w, _ = img.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    data_size = stride * h
    offset = _BMP_HEADER.size + _BMP_INFO.size
    header = _BMP_HEADER.pack(b"BM", offset + data_size, 0, 0, offset)
    info = _BMP_INFO.pack(_BMP_INFO.size, w, h, 1, 24, 0, data_size,
                          2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = img[::-1, :, ::-1].reshape(h, row_bytes)  # bottom-up BGR
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → RGB uint8 (H, W, 3)."""
    magic, _, _, _, offset = _BMP_HEADER.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size, w, h, _, bpp, comp, *_rest) = _BMP_INFO.unpack_from(
        payload, _BMP_HEADER.size)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=offset).reshape(h, stride)[:, :row_bytes]
    img = rows.reshape(h, w, 3)[:, :, ::-1]                       # BGR → RGB
    return img[::-1] if bottom_up else img


# ---------------- WAV (mono 16-bit PCM) ----------------

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM bytes (stdlib wave)."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 mono samples, frame rate). Multi-channel
    input is averaged down to mono."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        n_ch = f.getnchannels()
        if f.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        raw = np.frombuffer(f.readframes(f.getnframes()), dtype=np.int16)
    if n_ch > 1:
        raw = raw.reshape(-1, n_ch).mean(axis=1).astype(np.int16)
    return raw, rate


# ---------------- feature kernels ----------------

def image_features(img: np.ndarray, dim: int = 16,
                   resize_to: int = 64) -> np.ndarray:
    """Deterministic 16-dim feature vector from real pixels: per-channel
    mean/std, 8-bin gray histogram, aspect, mean |horizontal gradient|.
    Nearest-neighbor downsample bounds per-image compute at
    resize_to²."""
    h, w, _ = img.shape
    if max(h, w) > resize_to:
        yi = (np.arange(resize_to) * h // resize_to)
        xi = (np.arange(resize_to) * w // resize_to)
        img = img[yi][:, xi]
    x = img.astype(np.float32) / 255.0
    gray = x.mean(axis=2)
    hist = np.histogram(gray, bins=8, range=(0.0, 1.0))[0]
    hist = hist.astype(np.float32) / max(gray.size, 1)
    grad = (np.abs(np.diff(gray, axis=1)).mean()
            if gray.shape[1] > 1 else 0.0)
    f = np.concatenate([
        x.mean(axis=(0, 1)),                      # 3
        x.std(axis=(0, 1)),                       # 3
        hist,                                     # 8
        [w / (w + h), grad],                      # 2
    ]).astype(np.float32)
    assert len(f) == dim
    return f


def audio_window_features(samples: np.ndarray, dim: int = 12) -> np.ndarray:
    """Deterministic 12-dim features from real PCM samples: RMS,
    zero-crossing fraction, 10-band power-spectrum fractions."""
    if len(samples) == 0:
        return np.zeros(dim, dtype=np.float32)
    x = samples.astype(np.float64) / 32768.0
    rms = float(np.sqrt((x * x).mean()))
    zc = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) \
        if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x)) ** 2
    n_bands = dim - 2
    edges = np.unique(np.round(
        np.geomspace(1, len(spec), n_bands + 1)).astype(np.int64))
    bands = np.zeros(n_bands, dtype=np.float64)
    total = spec[1:].sum()
    if total > 0 and len(edges) > 1:
        sums = np.add.reduceat(spec, np.minimum(edges[:-1], len(spec) - 1))
        bands[:len(edges) - 1] = sums[:len(edges) - 1] / total
    return np.concatenate([[rms, zc], bands]).astype(np.float32)
