import numpy as np
import pyarrow as pa
import pytest

from stacksearch_ray.functions.multimodal import (
    MEDIA_SCHEMA,
    DecodeImageFeatures,
    SampleVideoFrames,
    synth_media_table,
)


def test_synth_media_schema():
    t = synth_media_table(9)
    assert t.schema.equals(MEDIA_SCHEMA)
    assert t.num_rows == 9
    assert synth_media_table(9).equals(t)  # deterministic


def test_decode_stub_raises_without_fake():
    d = DecodeImageFeatures(fake=False)
    with pytest.raises(NotImplementedError):
        d(synth_media_table(3))


def test_fake_decode_deterministic():
    d = DecodeImageFeatures(fake=True)
    t1, t2 = d(synth_media_table(6)), d(synth_media_table(6))
    assert t1.equals(t2)
    f = np.asarray(t1["features"].combine_chunks().flatten()).reshape(-1, 16)
    assert f.shape == (6, 16) and (0 <= f).all() and (f <= 1).all()
    assert t1["payload_bytes"].to_pylist() == [4096] * 6


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


def test_actor_pool_pipeline(ray_session):
    import ray.data as rd

    from stacksearch_ray.functions.multimodal import decode_features, sample_frames

    ds = rd.from_arrow(synth_media_table(30))
    feats = decode_features(ds, fake=True, batch_size=8, concurrency=2).to_pandas()
    assert len(feats) == 30
    frames = sample_frames(rd.from_arrow(synth_media_table(30)), fake=True).to_pandas()
    assert (frames["frame_idx"] >= 0).all() and len(frames) > 0


def test_audio_features_windows():
    from stacksearch_ray.functions.multimodal import ExtractAudioFeatures

    t = synth_media_table(9)
    a = ExtractAudioFeatures(window_ms=10_000, fake=True)
    out = a(t)
    audio = {m: d for m, k, d in zip(t["media_id"].to_pylist(),
                                     t["kind"].to_pylist(),
                                     t["duration_ms"].to_pylist()) if k == "audio"}
    import pandas as pd

    counts = pd.Series(out["media_id"].to_pylist()).value_counts().to_dict()
    for mid, dur in audio.items():
        assert counts[mid] == int(np.ceil(dur / 10_000))
    f = np.asarray(out["features"].combine_chunks().flatten()).reshape(-1, 12)
    assert (0 <= f).all() and (f <= 1).all()
    # deterministic + raises without fake
    assert a(t).equals(out)
    with pytest.raises(NotImplementedError):
        ExtractAudioFeatures(fake=False)(t)
