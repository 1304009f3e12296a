"""F8 trainable autoencoder: tied-weight linear DAE trained by exact
data-parallel gradient descent, with the reference's decreasing-noise
curriculum (T6)."""

import numpy as np
import pyarrow as pa
import pytest


def _emb_ds(n=200, dim=16, seed=5):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    # low-rank structure + noise: an autoencoder has something to learn
    basis = rng.standard_normal((4, dim))
    x = rng.standard_normal((n, 4)) @ basis + 0.05 * rng.standard_normal((n, dim))
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(x.reshape(-1), pa.float64()), dim),
    })), x


def test_tied_weight_gradient_numerical():
    """Analytic gradient 2(x̃ᵀE + Eᵀx̃)W == finite differences."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((7, 5))
    xt = x + 0.1 * rng.standard_normal((7, 5))
    w = rng.standard_normal((5, 3))

    def loss(wm):
        e = (xt @ wm) @ wm.T - x
        return float((e * e).sum())

    e = (xt @ w) @ w.T - x
    g = 2.0 * (xt.T @ e + e.T @ xt) @ w
    eps = 1e-6
    for i in range(5):
        for j in range(3):
            wp = w.copy(); wp[i, j] += eps
            wm_ = w.copy(); wm_[i, j] -= eps
            num = (loss(wp) - loss(wm_)) / (2 * eps)
            assert num == pytest.approx(g[i, j], rel=1e-4, abs=1e-6)


def test_curriculum_noise_deterministic_and_decaying():
    from stacksearch_ray.functions.autoencoder import curriculum_noise

    ids = np.arange(50, dtype=np.int64)
    a = curriculum_noise(ids, 8, epoch=3, scale=0.5)
    b = curriculum_noise(ids, 8, epoch=3, scale=0.5)
    assert np.array_equal(a, b)                      # counter-based
    c = curriculum_noise(ids, 8, epoch=4, scale=0.5)
    assert not np.array_equal(a, c)                  # varies by epoch
    assert abs(a.mean()) < 0.05                      # ~zero-mean
    assert a.std() == pytest.approx(0.5, rel=0.1)    # ~unit-var × scale
    # batch-layout independence: a slice equals the full computation
    sub = curriculum_noise(ids[10:20], 8, epoch=3, scale=0.5)
    assert np.array_equal(sub, a[10:20])


def test_training_converges_and_is_deterministic(ray_session, tmp_path):
    from stacksearch_ray.functions.autoencoder import (
        AutoencoderEncoder,
        train_linear_autoencoder,
    )

    ds, x = _emb_ds()
    art = str(tmp_path / "ae")
    path = train_linear_autoencoder(ds, art, dim_out=4, epochs=15, lr=0.05)
    enc = AutoencoderEncoder(path)
    # loss curve decreases (allowing small curriculum-noise wiggle)
    lc = enc.loss_curve
    assert lc[-1] < lc[0] * 0.7
    # trained weights beat the random init on clean reconstruction
    rng = np.random.default_rng(29)
    w0 = rng.standard_normal((16, 4)) / np.sqrt(16)
    e0 = (x @ w0) @ w0.T - x
    assert enc.reconstruction_mse(x) < float((e0 * e0).sum() / len(x))

    # determinism: retrain → bitwise-identical weights
    path2 = train_linear_autoencoder(_emb_ds()[0], str(tmp_path / "ae2"),
                                     dim_out=4, epochs=15, lr=0.05)
    w_a = np.load(f"{path}/weights.npy")
    w_b = np.load(f"{path2}/weights.npy")
    assert np.array_equal(w_a, w_b)


def test_actor_pool_encode(ray_session, tmp_path):
    from stacksearch_ray.functions.autoencoder import (
        AutoencoderEncoder,
        train_linear_autoencoder,
    )

    ds, _ = _emb_ds()
    art = str(tmp_path / "ae")
    train_linear_autoencoder(ds, art, dim_out=4, epochs=5)
    out = (ds.map_batches(AutoencoderEncoder, batch_format="pyarrow",
                          batch_size=64, concurrency=2,
                          fn_constructor_kwargs={"artifact_dir": art})
           .to_pandas())
    assert len(out) == 200
    m = np.stack([np.asarray(v) for v in out["code"]])
    assert m.shape == (200, 4)
    assert np.allclose(np.linalg.norm(m, axis=1), 1.0)


# ---- conv DAE (the reference's CNN topology, numpy exact GD) ----


def test_conv_dae_gradients_match_finite_differences():
    from stacksearch_ray.functions.autoencoder import conv_dae_grads

    rng = np.random.default_rng(3)
    n, d, K, S, C, k = 5, 10, 3, 2, 2, 3
    L = (d - K) // S + 1
    x = rng.standard_normal((n, d))
    xt = x + 0.1 * rng.standard_normal((n, d))
    wc = rng.standard_normal((K, C)) * 0.5
    w1 = rng.standard_normal((L * C, k)) * 0.5
    w2 = rng.standard_normal((k, d)) * 0.5
    loss, gwc, gw1, gw2 = conv_dae_grads(x, xt, wc, w1, w2, K, S)
    eps = 1e-6
    for w, g in ((wc, gwc), (w1, gw1), (w2, gw2)):
        it = np.nditer(w, flags=["multi_index"])
        for _ in range(6):  # spot-check several coordinates
            i = it.multi_index
            old = w[i]
            w[i] = old + eps
            lp = conv_dae_grads(x, xt, wc, w1, w2, K, S)[0]
            w[i] = old - eps
            lm = conv_dae_grads(x, xt, wc, w1, w2, K, S)[0]
            w[i] = old
            num = (lp - lm) / (2 * eps)
            assert abs(num - g[i]) <= 1e-4 * max(1.0, abs(num)), (i, num, g[i])
            next(it, None)


def test_conv_dae_trains_deterministically_and_converges(ray_session,
                                                         tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from stacksearch_ray.functions.autoencoder import (
        ConvAutoencoderEncoder, train_conv_autoencoder)

    rng = np.random.default_rng(5)
    base = rng.standard_normal((4, 16))
    rows = [(base[i % 4] + 0.1 * rng.standard_normal(16)).tolist()
            for i in range(200)]
    src = str(tmp_path / "emb.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array(rows, pa.list_(pa.float32())),
    }), src)
    p1 = train_conv_autoencoder(rd.read_parquet(src),
                                str(tmp_path / "a1"), ksize=5,
                                stride=2, channels=3, dim_out=4,
                                epochs=10)
    p2 = train_conv_autoencoder(rd.read_parquet(src),
                                str(tmp_path / "a2"), ksize=5,
                                stride=2, channels=3, dim_out=4,
                                epochs=10)
    import json as _json

    c1 = _json.load(open(p1 + "/config.json"))
    c2 = _json.load(open(p2 + "/config.json"))
    assert c1["loss_curve"] == c2["loss_curve"]  # determinism
    assert c1["loss_curve"][-1] < c1["loss_curve"][0]  # converges
    w1 = np.load(p1 + "/weights.npz")
    w2 = np.load(p2 + "/weights.npz")
    for key in ("wc", "w1", "w2"):
        assert (w1[key] == w2[key]).all()
    enc = ConvAutoencoderEncoder(str(tmp_path / "a1"))
    out = (rd.read_parquet(src)
           .map_batches(enc.__class__, batch_format="pyarrow",
                        batch_size=64, concurrency=2,
                        fn_constructor_kwargs={
                            "artifact_dir": str(tmp_path / "a1")})
           .to_pandas())
    assert len(out) == 200 and len(out["code"].iloc[0]) == 4
    norms = np.linalg.norm(np.stack(out["code"].to_numpy()), axis=1)
    assert np.allclose(norms, 1.0)
