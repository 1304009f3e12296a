import numpy as np
import pyarrow as pa
import pytest

from stacksearch_ray.functions.multimodal import (
    MEDIA_SCHEMA,
    DecodeImageFeatures,
    ExtractAudioFeatures,
    SampleVideoFrames,
    synth_media_table,
)


def test_synth_media_schema():
    t = synth_media_table(9)
    assert t.schema.equals(MEDIA_SCHEMA)
    assert t.num_rows == 9
    assert synth_media_table(9).equals(t)  # deterministic
    # image payloads are real BMPs, audio payloads real WAVs
    fmts = dict(zip(t["media_id"].to_pylist(), t["format"].to_pylist()))
    pays = dict(zip(t["media_id"].to_pylist(), t["payload"].to_pylist()))
    for mid, fmt in fmts.items():
        if fmt == "bmp":
            assert pays[mid][:2] == b"BM"
        elif fmt == "png":
            assert pays[mid][:8] == b"\x89PNG\r\n\x1a\n"
        elif fmt == "wav":
            assert pays[mid][:4] == b"RIFF"
        elif fmt == "avi":
            assert pays[mid][:4] == b"RIFF"
            assert pays[mid][8:12] == b"AVI "


def test_bmp_roundtrip():
    from stacksearch_ray.functions.media_codec import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    for h, w in ((1, 1), (2, 3), (17, 5), (64, 33)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_wav_roundtrip():
    from stacksearch_ray.functions.media_codec import decode_wav, encode_wav

    rng = np.random.default_rng(4)
    s = rng.integers(-32768, 32767, 5000).astype(np.int16)
    back, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000
    assert np.array_equal(back, s)


def test_image_features_golden():
    """Features computed from KNOWN pixels, not payload hashes."""
    from stacksearch_ray.functions.media_codec import encode_bmp

    # 2x2: pure red, pure red, black, black → mean R = 0.5, G = B = 0
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, :, 0] = 255
    d = DecodeImageFeatures(fake=False)
    t = pa.table({
        "media_id": pa.array([7], pa.int64()),
        "kind": pa.array(["image"]),
        "format": pa.array(["bmp"]),
        "width": pa.array([2], pa.int32()),
        "height": pa.array([2], pa.int32()),
        "duration_ms": pa.array([0], pa.int32()),
        "payload": pa.array([encode_bmp(img)], pa.binary()),
    })
    f = np.asarray(t and d(t)["features"].combine_chunks().flatten())
    assert f[0] == pytest.approx(0.5)       # mean R
    assert f[1] == 0.0 and f[2] == 0.0      # mean G, B
    assert f[3] == pytest.approx(0.5)       # std R
    # gray histogram: gray = 1/3 for red rows, 0 for black rows
    assert f[6] == pytest.approx(0.5)       # bin [0, .125): the black half
    assert f[6 + 2] == pytest.approx(0.5)   # bin [.25, .375): gray 1/3
    assert f[14] == pytest.approx(0.5)      # square aspect


def test_audio_features_real_samples():
    """Silence → zero RMS; a loud sine → high RMS and energy in the
    right band. Windows counted from actual sample length."""
    from stacksearch_ray.functions.media_codec import (
        audio_window_features,
        encode_wav,
    )

    silent = audio_window_features(np.zeros(4000, dtype=np.int16))
    assert silent[0] == 0.0 and silent[1] == 0.0

    rate = 4000
    t = np.arange(rate * 2)  # 2 s
    sine = (0.9 * 32767 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int16)
    f = audio_window_features(sine)
    assert f[0] == pytest.approx(0.9 / np.sqrt(2), rel=1e-2)  # RMS
    assert f[1] == pytest.approx(2 * 440 / rate, rel=1e-2)    # ZCR
    assert f[2:].sum() == pytest.approx(1.0, abs=1e-6)        # band fractions

    a = ExtractAudioFeatures(window_ms=500, fake=False)
    tbl = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "kind": pa.array(["audio"]),
        "format": pa.array(["wav"]),
        "width": pa.array([0], pa.int32()),
        "height": pa.array([0], pa.int32()),
        "duration_ms": pa.array([2000], pa.int32()),
        "payload": pa.array([encode_wav(sine, rate)], pa.binary()),
    })
    out = a(tbl)
    assert out.num_rows == 4  # 2 s / 500 ms windows from real samples
    fm = np.asarray(out["features"].combine_chunks().flatten()).reshape(-1, 12)
    assert (fm[:, 0] > 0.6).all()


def test_decode_stub_raises_on_compressed_format():
    d = DecodeImageFeatures(fake=False)
    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "kind": pa.array(["image"]),
        "format": pa.array(["webp"]),  # jpeg decodes natively now
        "width": pa.array([4], pa.int32()),
        "height": pa.array([4], pa.int32()),
        "duration_ms": pa.array([0], pa.int32()),
        "payload": pa.array([b"RIFF fake"], pa.binary()),
    })
    with pytest.raises(NotImplementedError):
        d(t)
    with pytest.raises(NotImplementedError):
        ExtractAudioFeatures(fake=False)(pa.table({
            "media_id": pa.array([0], pa.int64()),
            "kind": pa.array(["audio"]),
            "format": pa.array(["mp3"]),
            "width": pa.array([0], pa.int32()),
            "height": pa.array([0], pa.int32()),
            "duration_ms": pa.array([100], pa.int32()),
            "payload": pa.array([b"ID3 fake"], pa.binary()),
        }))


def test_real_decode_deterministic():
    d = DecodeImageFeatures(fake=False)
    t1, t2 = d(synth_media_table(9)), d(synth_media_table(9))
    assert t1.equals(t2)
    f = np.asarray(t1["features"].combine_chunks().flatten()).reshape(-1, 16)
    assert f.shape == (3, 16)  # image rows only (every 3rd of 9)
    assert np.isfinite(f).all()


def test_fake_decode_still_works_for_plumbing():
    d = DecodeImageFeatures(fake=True)
    t1, t2 = d(synth_media_table(6)), d(synth_media_table(6))
    assert t1.equals(t2)
    f = np.asarray(t1["features"].combine_chunks().flatten()).reshape(-1, 16)
    assert (0 <= f).all() and (f <= 1).all()


def test_sample_frames_counts():
    s = SampleVideoFrames(stride_ms=1000, fake=True)
    t = synth_media_table(9)
    out = s(t)
    vids = {m: d for m, k, d in zip(t["media_id"].to_pylist(),
                                    t["kind"].to_pylist(),
                                    t["duration_ms"].to_pylist()) if k == "video"}
    import pandas as pd

    counts = pd.Series(out["media_id"].to_pylist()).value_counts().to_dict()
    for mid, dur in vids.items():
        assert counts[mid] == int(np.ceil(dur / 1000))
    assert set(out["media_id"].to_pylist()) == set(vids)


def test_sample_frames_real_decode():
    """fake=False decodes the AVI payloads: frame_sha fingerprints the
    ACTUAL pixel bytes, so it matches a direct decode of the payload."""
    import hashlib

    from stacksearch_ray.functions.media_codec import decode_avi

    s = SampleVideoFrames(stride_ms=500, fake=False)
    t = synth_media_table(9)
    out = s(t)
    pays = {m: p for m, k, p in zip(t["media_id"].to_pylist(),
                                    t["kind"].to_pylist(),
                                    t["payload"].to_pylist())
            if k == "video"}
    assert set(out["media_id"].to_pylist()) == set(pays)
    for mid, fidx, sha in zip(out["media_id"].to_pylist(),
                              out["frame_idx"].to_pylist(),
                              out["frame_sha"].to_pylist()):
        frames, fps = decode_avi(pays[mid])
        assert fps == 4
        assert sha == hashlib.sha256(
            frames[fidx].tobytes()).hexdigest()[:16]
    assert s(t).equals(out)  # deterministic


def test_actor_pool_pipeline(ray_session):
    import ray.data as rd

    from stacksearch_ray.functions.multimodal import decode_features, sample_frames

    ds = rd.from_arrow(synth_media_table(30))
    feats = decode_features(ds, fake=False, batch_size=8, concurrency=2).to_pandas()
    assert len(feats) == 10  # image rows only
    frames = sample_frames(rd.from_arrow(synth_media_table(30)), fake=True).to_pandas()
    assert (frames["frame_idx"] >= 0).all() and len(frames) > 0


def test_audio_windows_real(ray_session):
    import ray.data as rd

    t = synth_media_table(9)
    a = ExtractAudioFeatures(window_ms=10_000, fake=False)
    out = a(t)
    # windows counted from actual PCM length == duration metadata
    audio = {m: d for m, k, d in zip(t["media_id"].to_pylist(),
                                     t["kind"].to_pylist(),
                                     t["duration_ms"].to_pylist()) if k == "audio"}
    import pandas as pd

    counts = pd.Series(out["media_id"].to_pylist()).value_counts().to_dict()
    for mid, dur in audio.items():
        assert counts[mid] == int(np.ceil(dur / 10_000))
    f = np.asarray(out["features"].combine_chunks().flatten()).reshape(-1, 12)
    assert (f[:, 0] > 0).all()  # sine+noise payloads are not silent
    assert a(t).equals(out)     # deterministic


# ---------------- property tests (hypothesis) ----------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**31 - 1))
def test_bmp_roundtrip_property(h, w, seed):
    """decode(encode(img)) == img for ANY shape (incl. odd widths whose
    rows need BMP 4-byte padding)."""
    from stacksearch_ray.functions.media_codec import decode_bmp, encode_bmp

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                               dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 5000), st.integers(0, 2**31 - 1),
       st.sampled_from([4000, 8000, 16000]))
def test_wav_roundtrip_property(n, seed, rate):
    from stacksearch_ray.functions.media_codec import decode_wav, encode_wav

    s = np.random.default_rng(seed).integers(-32768, 32768, n) \
        .astype(np.int16)
    back, r = decode_wav(encode_wav(s, rate))
    assert r == rate
    assert np.array_equal(back, s)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 8), st.integers(1, 24), st.integers(1, 24),
       st.integers(0, 2**31 - 1), st.sampled_from([1, 4, 25]))
def test_avi_roundtrip_property(n, h, w, seed, fps):
    """decode(encode(frames)) == frames for ANY frame count/shape/fps
    (incl. odd widths whose DIB rows need 4-byte padding)."""
    from stacksearch_ray.functions.media_codec import decode_avi, encode_avi

    frames = np.random.default_rng(seed).integers(
        0, 256, (n, h, w, 3), dtype=np.uint8)
    back, f = decode_avi(encode_avi(frames, fps))
    assert f == fps
    assert np.array_equal(back, frames)


def test_png_roundtrip_all_filters_and_channels():
    from stacksearch_ray.functions.media_codec import decode_png, encode_png

    rng = np.random.default_rng(9)
    for ch in (1, 3, 4):
        img = rng.integers(0, 256, (13, 7, ch), dtype=np.uint8)
        for ft in (0, 1, 2, 3, 4, "mixed"):
            assert np.array_equal(decode_png(encode_png(img, ft)), img)
    # 2-D grayscale input → (H, W, 1) out
    g = rng.integers(0, 256, (5, 5), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(g))[:, :, 0], g)


def test_png_bmp_feature_parity():
    """Same pixels through either container → identical features: the
    PNG path decodes REAL pixels, not payload-derived fakes."""
    from stacksearch_ray.functions.media_codec import (
        decode_png, encode_bmp, encode_png, image_features, png_to_rgb)

    img = np.random.default_rng(11).integers(0, 256, (40, 24, 3),
                                             dtype=np.uint8)
    d = DecodeImageFeatures(fake=False)
    rows = {"media_id": pa.array([0, 1], pa.int64()),
            "kind": pa.array(["image", "image"]),
            "format": pa.array(["bmp", "png"]),
            "width": pa.array([24, 24], pa.int32()),
            "height": pa.array([40, 40], pa.int32()),
            "duration_ms": pa.array([0, 0], pa.int32()),
            "payload": pa.array([encode_bmp(img),
                                 encode_png(img, "mixed")], pa.binary())}
    out = d(pa.table(rows))
    f = np.asarray(out["features"].combine_chunks().flatten()).reshape(-1, 16)
    assert np.array_equal(f[0], f[1])
    assert np.array_equal(
        f[1], image_features(png_to_rgb(decode_png(encode_png(img)))))


def test_png_rejects_corruption_and_unsupported():
    import struct
    import zlib

    from stacksearch_ray.functions.media_codec import decode_png, encode_png

    img = np.random.default_rng(13).integers(0, 256, (6, 6, 3),
                                             dtype=np.uint8)
    payload = bytearray(encode_png(img))
    payload[20] ^= 0xFF                      # flip a byte inside IHDR
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM not a png")
    # a well-formed 16-bit-depth IHDR is rejected as unsupported
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    chunk = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    idat = zlib.compress(b"\x00" * 26)
    chunk += (struct.pack(">I", len(idat)) + b"IDAT" + idat
              + struct.pack(">I", zlib.crc32(b"IDAT" + idat)))
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 32), st.integers(1, 32), st.integers(0, 2**31 - 1),
       st.sampled_from([0, 1, 2, 3, 4, "mixed"]))
def test_png_roundtrip_property(h, w, seed, ft):
    """decode(encode(img, any filter)) == img for ANY shape."""
    from stacksearch_ray.functions.media_codec import decode_png, encode_png

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                               dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img, ft)), img)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 64), st.integers(1, 64), st.integers(0, 2**31 - 1))
def test_image_features_bounded_property(h, w, seed):
    """Features are finite; histogram fractions sum to 1; means in
    [0, 1] — for any image."""
    from stacksearch_ray.functions.media_codec import image_features

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                               dtype=np.uint8)
    f = image_features(img)
    assert np.isfinite(f).all()
    assert (0.0 <= f[:3]).all() and (f[:3] <= 1.0).all()
    assert abs(f[6:14].sum() - 1.0) < 1e-5


# ---- baseline JPEG codec (jpeg_codec.py, pure numpy + stdlib) ----


def test_jpeg_roundtrip_quality_and_structure():
    import numpy as np

    from stacksearch_ray.functions.jpeg_codec import (decode_jpeg,
                                                      encode_jpeg)

    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        xx * 255 // (w - 1),
        yy * 255 // (h - 1),
        ((xx // 8 + yy // 8) % 2) * 200 + 20,
    ], axis=-1).astype(np.uint8)
    data = encode_jpeg(img, quality=85)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    out = decode_jpeg(data)
    assert out.shape == img.shape and out.dtype == np.uint8
    mse = float(((out.astype(np.float64) - img) ** 2).mean())
    assert 10 * np.log10(255 ** 2 / mse) > 35.0  # PSNR
    # flat block survives exactly (DC-only path)
    flat = np.full((16, 16, 3), 130, np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, 90)) == 130).all()
    # quality knob monotone in size
    assert len(encode_jpeg(img, 95)) > len(encode_jpeg(img, 30))
    # non-multiple-of-8 dims round-trip at the right size, both samplings
    odd = img[:41, :53]
    assert decode_jpeg(encode_jpeg(odd, 80)).shape == odd.shape
    assert decode_jpeg(encode_jpeg(odd, 80, subsampling="420")
                       ).shape == odd.shape
    # 4:2:0 keeps luma detail: smooth image stays high-PSNR
    smooth = np.stack([xx * 255 // (w - 1)] * 3, axis=-1).astype(np.uint8)
    s2 = decode_jpeg(encode_jpeg(smooth, 85, subsampling="420"))
    mse2 = float(((s2.astype(np.float64) - smooth) ** 2).mean())
    assert 10 * np.log10(255 ** 2 / mse2) > 35.0
    # progressive marker rejected with a clear error
    import pytest as _pytest

    bad = bytearray(data)
    sof = bad.find(b"\xff\xc0")
    bad[sof + 1] = 0xC2
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(bad))


def test_jpeg_feeds_multimodal_features(ray_session):
    import numpy as np

    from stacksearch_ray.functions.jpeg_codec import encode_jpeg
    from stacksearch_ray.functions.multimodal import DecodeImageFeatures

    rng = np.random.default_rng(2)
    img = (rng.integers(0, 8, (32, 32, 3)) * 32).astype(np.uint8)
    payload = encode_jpeg(img, 90)
    dec = DecodeImageFeatures()
    feats = dec._decode_one(payload, "jpeg")
    assert feats.shape == (DecodeImageFeatures.FEATURE_DIM,)
    assert np.isfinite(feats).all()


def test_jpeg_roundtrip_fuzz():
    """Hypothesis: arbitrary small images at arbitrary quality
    round-trip without crashing, at the right shape, with bounded
    per-pixel error at high quality."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from stacksearch_ray.functions.jpeg_codec import (decode_jpeg,
                                                      encode_jpeg)

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 40),
           st.integers(1, 100), st.integers(0, 2**32 - 1),
           st.sampled_from(["444", "420"]))
    def inner(h, w, q, seed, sub):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, q, subsampling=sub))
        assert out.shape == img.shape and out.dtype == np.uint8

    inner()


def test_mjpeg_avi_roundtrip_and_frame_sampling():
    import numpy as np

    from stacksearch_ray.functions.media_codec import (decode_avi,
                                                       encode_mjpeg_avi)

    rng = np.random.default_rng(6)
    frames = np.stack([
        np.full((24, 32, 3), 40 + 30 * i, np.uint8)
        + rng.integers(0, 16, (24, 32, 3), dtype=np.uint8)
        for i in range(6)])
    data = encode_mjpeg_avi(frames, fps=3, quality=90)
    out, fps = decode_avi(data)
    assert out.shape == frames.shape and fps == 3
    # intra-only lossy: every frame close to its source
    err = np.abs(out.astype(int) - frames.astype(int)).mean(axis=(1, 2, 3))
    assert (err < 8).all()
    # frames stay ORDERED (brightness ramp survives)
    means = out.astype(np.float64).mean(axis=(1, 2, 3))
    assert (np.diff(means) > 10).all()


def test_mjpeg_decode_ignores_later_stream_headers():
    """Regression (review finding): a second strl (e.g. an audio
    stream) AFTER the video strl must not overwrite the codec handler
    — frame chunks still decode as MJPEG, not as raw DIB garbage."""
    import struct

    import numpy as np

    from stacksearch_ray.functions.media_codec import (_STRH, decode_avi,
                                                       encode_mjpeg_avi)

    frames = np.full((3, 16, 16, 3), 90, np.uint8)
    b = encode_mjpeg_avi(frames, 4)
    strh = b"strh" + struct.pack("<I", _STRH.size) + _STRH.pack(
        b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0, 1, 8000, 0, 100, 4,
        0, 0, 0, 0, 0, 0)
    strl = b"LIST" + struct.pack("<I", 4 + len(strh)) + b"strl" + strh
    pos = 12
    while pos + 12 <= len(b):
        if b[pos:pos + 4] == b"LIST" and b[pos + 8:pos + 12] == b"movi":
            break
        pos += 1
    new = b[:pos] + strl + b[pos:]
    new = b"RIFF" + struct.pack("<I", len(new) - 8) + new[8:]
    out, _fps = decode_avi(new)
    assert out.shape == frames.shape
    assert abs(float(out.mean()) - 90.0) < 5.0  # real pixels, not noise
    import pytest as _pytest
    with _pytest.raises(ValueError):
        encode_mjpeg_avi(np.zeros((0, 8, 8, 3), np.uint8))
