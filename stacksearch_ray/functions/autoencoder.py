"""F8 proper: a trainable autoencoder, trained as a distributed Ray
Data pipeline (the reference trains TF/Keras conv autoencoders with a
per-epoch decreasing-noise curriculum,
/root/reference/models/SimpleCnnAutoencoder.py:17-77 and
models/train.py:160-201,190-193; TF is neither available nor needed to
close the capability: the public-knowledge equivalent is a tied-weight
LINEAR denoising autoencoder trained by exact data-parallel gradient
descent).

Training shape (synchronous data-parallel GD):

- every epoch broadcasts the weight matrix once (``ray.put``),
- each batch computes its partial gradient of
  ``L = Σ ||x̃ W Wᵀ − x||²`` (x̃ = x + curriculum noise) — a (d, k)
  matrix plus a loss/row-count scalar,
- partials are summed and the driver applies one exact full-batch
  update. Deterministic: same data + seed → bitwise same weights, no
  matter how Ray batches the input.

Curriculum (the reference's T6): ``noise_scale(epoch) = noise0 ·
decay^epoch`` — noise is counter-based (pd.util.hash_array over
(vec_id, feature, epoch)), so it is reproducible across workers and
independent of batch boundaries.

The trained artifact persists under the restore-latest layout and
serves through ``AutoencoderEncoder`` — an actor-pool map_batches
stage, like every other encoder in this package.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

_SQRT3 = float(np.sqrt(3.0))


def _emb_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    col = batch[emb_col].combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.float64)
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
    else:
        off = col.offsets.to_numpy(zero_copy_only=False)
        dim = int(off[1] - off[0])
    return flat.reshape(-1, dim)


def curriculum_noise(ids: np.ndarray, dim: int, epoch: int,
                     scale: float) -> np.ndarray:
    """Deterministic zero-mean unit-variance-×scale noise per
    (row, feature, epoch): counter-based uniform from
    pd.util.hash_array — reproducible across workers and batch
    layouts (no stateful RNG)."""
    if scale == 0.0:
        return np.zeros((len(ids), dim))
    keys = (ids[:, None] * np.int64(1_000_003)
            + np.arange(dim, dtype=np.int64)[None, :]
            + np.int64(epoch) * np.int64(7_777_777))
    h = pd.util.hash_array(keys.reshape(-1)).astype(np.float64)
    u = h / float(2**64)                     # uniform [0, 1)
    return ((u - 0.5) * 2.0 * _SQRT3 * scale).reshape(len(ids), dim)


def _grad_partial(batch: pa.Table, w_ref, emb_col: str, id_col: str,
                  epoch: int, scale: float) -> pa.Table:
    w = ray.get(w_ref)
    x = _emb_matrix(batch, emb_col)
    ids = np.asarray(batch[id_col].combine_chunks()).astype(np.int64)
    xt = x + curriculum_noise(ids, x.shape[1], epoch, scale)
    z = xt @ w                               # (n, k)
    e = z @ w.T - x                          # (n, d) reconstruction error
    # tied-weight gradient of Σ‖x̃WWᵀ − x‖²: 2(x̃ᵀE + Eᵀx̃)W
    g = 2.0 * (xt.T @ e + e.T @ xt) @ w
    return pa.table({
        "g": pa.FixedSizeListArray.from_arrays(
            pa.array(g.reshape(-1), pa.float64()), g.size),
        "loss": pa.array([float((e * e).sum())], pa.float64()),
        "n": pa.array([len(x)], pa.int64()),
        "first_id": pa.array([int(ids.min()) if len(ids) else -1],
                             pa.int64()),
    })


def train_linear_autoencoder(ds: Dataset, artifact_dir: str,
                             emb_col: str = "embedding",
                             id_col: str = "vec_id",
                             dim_out: int = 8, epochs: int = 20,
                             lr: float = 0.05, noise0: float = 0.3,
                             noise_decay: float = 0.8, seed: int = 29,
                             version: int | None = None) -> str:
    """Train and persist; returns the versioned artifact path. The
    artifact records the per-epoch loss curve (mean squared error per
    row) so convergence is auditable."""
    sample = ds.limit(1).take(1)[0][emb_col]
    dim_in = len(sample)
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((dim_in, dim_out)) / np.sqrt(dim_in)

    ds = ds.materialize()  # consumed once per epoch
    losses = []
    for epoch in range(epochs):
        scale = noise0 * (noise_decay ** epoch)
        w_ref = ray.put(w)

        def partial(b: pa.Table, _w=w_ref, _e=epoch, _s=scale) -> pa.Table:
            return _grad_partial(b, _w, emb_col, id_col, _e, _s)

        parts = (ds.map_batches(partial, batch_format="pyarrow")
                 .to_pandas()
                 .sort_values("first_id"))  # arrival-order-proof fold
        n = int(parts["n"].sum())
        g = np.add.reduce(
            [np.asarray(v).reshape(dim_in, dim_out)
             for v in parts["g"]])
        losses.append(float(np.add.reduce(parts["loss"].to_numpy()))
                      / max(n, 1))
        # normalized GD: relative step lr·‖W‖/‖∇‖ — scale-free in the
        # data (a fixed lr/n step diverges when ‖x‖² is large, since
        # the tied gradient grows ~‖x‖⁴), deterministic, monotone in
        # practice for this convex-in-direction objective
        gn = float(np.linalg.norm(g))
        if gn > 0:
            w = w - lr * (float(np.linalg.norm(w)) / gn) * g

    if version is None:
        version = 1 + max(
            (int(d[1:]) for d in os.listdir(artifact_dir)
             if d.startswith("v") and d[1:].isdigit()),
            default=0) if os.path.isdir(artifact_dir) else 1
    path = os.path.join(artifact_dir, f"v{version}")
    os.makedirs(path, exist_ok=True)
    np.save(os.path.join(path, "weights.npy"), w)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"dim_in": dim_in, "dim_out": dim_out, "epochs": epochs,
                   "lr": lr, "noise0": noise0, "noise_decay": noise_decay,
                   "seed": seed, "version": version,
                   "loss_curve": losses, "kind": "linear_dae"}, f)
    return path


class AutoencoderEncoder:
    """Actor-pool encode stage over a trained autoencoder artifact:
    restore once per actor (__init__), encode = x @ W per batch."""

    def __init__(self, artifact_dir: str, emb_col: str = "embedding",
                 id_col: str = "vec_id", normalize: bool = True):
        from .embedding import latest_artifact

        path = artifact_dir
        if not os.path.exists(os.path.join(path, "config.json")):
            path = latest_artifact(artifact_dir)
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        self.w = np.load(os.path.join(path, "weights.npy"))
        self.dim_out = int(cfg["dim_out"])
        self.version = int(cfg["version"])
        self.loss_curve = list(cfg.get("loss_curve", []))
        self.emb_col = emb_col
        self.id_col = id_col
        self.normalize = normalize

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _emb_matrix(batch, self.emb_col)
        z = x @ self.w
        if self.normalize:
            nrm = np.linalg.norm(z, axis=1, keepdims=True)
            z = z / np.maximum(nrm, 1e-30)
        return pa.table({
            self.id_col: batch[self.id_col].combine_chunks(),
            "code": pa.FixedSizeListArray.from_arrays(
                pa.array(z.reshape(-1), pa.float64()), self.dim_out),
        })

    def reconstruction_mse(self, x: np.ndarray) -> float:
        e = (x @ self.w) @ self.w.T - x
        return float((e * e).sum() / len(x))


# ---- 1-D convolutional DAE (F8's conv topology — the reference's ----
# SimpleCnnAutoencoder/DabaCnnAutoencoder analog, pure NumPy exact GD)

def _im2col(x: np.ndarray, ksize: int, stride: int) -> np.ndarray:
    """(n, d) signal → (n, L, K) sliding windows, L = (d−K)//S + 1."""
    L = (x.shape[1] - ksize) // stride + 1
    idx = np.arange(L)[:, None] * stride + np.arange(ksize)[None, :]
    return x[:, idx]


def conv_dae_grads(x: np.ndarray, xt: np.ndarray, wc: np.ndarray,
                   w1: np.ndarray, w2: np.ndarray, ksize: int,
                   stride: int):
    """One exact forward + backward for the conv DAE on a batch:
    encoder = ReLU(conv1d(x̃, Wc)) flattened → latent via W1; decoder =
    latent @ W2; loss = Σ‖x̂ − x‖². Returns (loss_sum, gWc, gW1, gW2)
    — pure matmul/einsum backprop, numerically gradient-checked by
    pytest (finite differences)."""
    n = len(x)
    if n == 0:  # empty block: exact-zero partials, no reshape crash
        return (0.0, np.zeros_like(wc), np.zeros_like(w1),
                np.zeros_like(w2))
    C = wc.shape[1]
    xc = _im2col(xt, ksize, stride)          # (n, L, K)
    a = xc @ wc                              # (n, L, C)
    z = np.maximum(a, 0.0)                   # ReLU
    zf = z.reshape(n, -1)                    # (n, L·C)
    h = zf @ w1                              # (n, k)
    xh = h @ w2                              # (n, d)
    e = xh - x
    loss = float((e * e).sum())
    gxh = 2.0 * e
    gw2 = h.T @ gxh
    gh = gxh @ w2.T
    gw1 = zf.T @ gh
    gz = (gh @ w1.T).reshape(a.shape) * (a > 0.0)
    gwc = np.einsum("nlk,nlc->kc", xc, gz)
    return loss, gwc, gw1, gw2


def train_conv_autoencoder(ds: Dataset, artifact_dir: str,
                           emb_col: str = "embedding",
                           id_col: str = "vec_id",
                           channels: int = 4, ksize: int = 5,
                           stride: int = 2, dim_out: int = 8,
                           epochs: int = 15, lr: float = 0.05,
                           noise0: float = 0.3,
                           noise_decay: float = 0.8, seed: int = 31,
                           version: int | None = None) -> str:
    """The conv sibling of train_linear_autoencoder: identical
    distributed shape (per-epoch weight broadcast → per-batch exact
    gradient partials in map_batches → driver fold + normalized GD
    step per weight matrix) and the same decreasing-noise curriculum
    (T6). Closes the reference's CNN-autoencoder topology
    (models/SimpleCnnAutoencoder.py:17-77) without TF: conv encoder →
    ReLU → dense latent → linear decoder, all-NumPy exact GD."""
    sample = ds.limit(1).take(1)[0][emb_col]
    dim_in = len(sample)
    L = (dim_in - ksize) // stride + 1
    rng = np.random.default_rng(seed)
    wc = rng.standard_normal((ksize, channels)) / np.sqrt(ksize)
    w1 = rng.standard_normal((L * channels, dim_out)) / np.sqrt(L * channels)
    w2 = rng.standard_normal((dim_out, dim_in)) / np.sqrt(dim_out)

    ds = ds.materialize()  # consumed once per epoch
    losses = []
    for epoch in range(epochs):
        scale = noise0 * (noise_decay ** epoch)
        refs = ray.put((wc, w1, w2))

        def partial(b: pa.Table, _r=refs, _e=epoch, _s=scale) -> pa.Table:
            _wc, _w1, _w2 = ray.get(_r)
            x = _emb_matrix(b, emb_col)
            ids = np.asarray(b[id_col].combine_chunks()).astype(np.int64)
            xt = x + curriculum_noise(ids, x.shape[1], _e, _s)
            loss, gwc, gw1, gw2 = conv_dae_grads(
                x, xt, _wc, _w1, _w2, ksize, stride)
            flat = np.concatenate([gwc.ravel(), gw1.ravel(), gw2.ravel()])
            return pa.table({
                "g": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat, pa.float64()), flat.size),
                "loss": pa.array([loss], pa.float64()),
                "n": pa.array([len(x)], pa.int64()),
                "first_id": pa.array([int(ids.min()) if len(ids)
                                      else -1], pa.int64()),
            })

        parts = (ds.map_batches(partial, batch_format="pyarrow")
                 .to_pandas()
                 .sort_values("first_id"))  # arrival-order-proof fold
        n = int(parts["n"].sum())
        flat = np.add.reduce([np.asarray(v, dtype=np.float64)
                              for v in parts["g"]])
        losses.append(float(np.add.reduce(parts["loss"].to_numpy()))
                      / max(n, 1))
        cut1 = wc.size
        cut2 = cut1 + w1.size
        for w, g in ((wc, flat[:cut1].reshape(wc.shape)),
                     (w1, flat[cut1:cut2].reshape(w1.shape)),
                     (w2, flat[cut2:].reshape(w2.shape))):
            gn = float(np.linalg.norm(g))
            if gn > 0:  # normalized GD per matrix (the linear DAE rule)
                w -= lr * (float(np.linalg.norm(w)) / gn) * g

    if version is None:
        version = 1 + max(
            (int(d[1:]) for d in os.listdir(artifact_dir)
             if d.startswith("v") and d[1:].isdigit()),
            default=0) if os.path.isdir(artifact_dir) else 1
    path = os.path.join(artifact_dir, f"v{version}")
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, "weights.npz"), wc=wc, w1=w1, w2=w2)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"dim_in": dim_in, "dim_out": dim_out,
                   "channels": channels, "ksize": ksize,
                   "stride": stride, "epochs": epochs, "lr": lr,
                   "noise0": noise0, "noise_decay": noise_decay,
                   "seed": seed, "version": version,
                   "loss_curve": losses, "kind": "conv_dae"}, f)
    return path


class ConvAutoencoderEncoder:
    """Actor-pool encode stage over a trained CONV autoencoder
    artifact: restore once per actor (__init__), encode =
    ReLU(conv1d(x)) flattened @ W1 per batch."""

    def __init__(self, artifact_dir: str, emb_col: str = "embedding",
                 id_col: str = "vec_id", normalize: bool = True):
        from .embedding import latest_artifact

        path = artifact_dir
        if not os.path.exists(os.path.join(path, "config.json")):
            path = latest_artifact(artifact_dir)
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        wz = np.load(os.path.join(path, "weights.npz"))
        self.wc, self.w1 = wz["wc"], wz["w1"]
        self.ksize = int(cfg["ksize"])
        self.stride = int(cfg["stride"])
        self.dim_out = int(cfg["dim_out"])
        self.version = int(cfg["version"])
        self.loss_curve = list(cfg.get("loss_curve", []))
        self.emb_col = emb_col
        self.id_col = id_col
        self.normalize = normalize

    def encode(self, x: np.ndarray) -> np.ndarray:
        if len(x) == 0:
            return np.zeros((0, self.dim_out))
        xc = _im2col(x, self.ksize, self.stride)
        z = np.maximum(xc @ self.wc, 0.0).reshape(len(x), -1)
        h = z @ self.w1
        if self.normalize:
            nrm = np.linalg.norm(h, axis=1, keepdims=True)
            h = h / np.maximum(nrm, 1e-30)
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = self.encode(_emb_matrix(batch, self.emb_col))
        return pa.table({
            self.id_col: batch[self.id_col].combine_chunks(),
            "code": pa.FixedSizeListArray.from_arrays(
                pa.array(h.reshape(-1), pa.float64()), self.dim_out),
        })
