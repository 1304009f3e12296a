"""Text→embedding operators (F2–F6): hashing determinism, the raw-text →
vector → kNN loop, and the persisted-encoder restore pattern."""

import hashlib
import struct

import numpy as np
import pyarrow as pa


TEXTS = [
    "merge sort algorithms and streaming joins",
    "merge sort algorithms and streaming joins",   # exact dup of 0
    "window functions over event streams and joins",
    "completely unrelated cooking recipe with butter and flour",
    "",                                            # zero-norm doc
]


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_hashed_encoder_deterministic_and_md5_anchored():
    from stacksearch_ray.functions.embedding import HashedTextEncoder

    enc = HashedTextEncoder(dim=16, normalize=False)
    v1 = enc.encode_texts(["merge sort merge"])
    v2 = HashedTextEncoder(dim=16, normalize=False).encode_texts(
        ["merge sort merge"])
    assert np.array_equal(v1, v2)
    # anchor the hash convention: bucket/sign of 'merge' from raw md5
    h = struct.unpack("<Q", hashlib.md5(b"merge").digest()[8:16])[0]
    hs = struct.unpack("<Q", hashlib.md5(b"sort").digest()[8:16])[0]
    expect = np.zeros(16)
    expect[h % 16] += 2.0 * (1.0 if not (h >> 63) & 1 else -1.0)  # 'merge' ×2
    expect[hs % 16] += 1.0 if not (hs >> 63) & 1 else -1.0
    assert np.array_equal(v1[0], expect)


def test_text_to_knn_loop(ray_session):
    """Raw text in → embeddings → brute-force kNN: the exact dup is the
    nearest neighbor, the related doc beats the unrelated one."""
    from stacksearch_ray.functions.embedding import HashedTextEncoder
    from stacksearch_ray.functions.similarity import knn_brute_force

    emb = _docs_ds(TEXTS).map_batches(
        HashedTextEncoder, batch_format="pyarrow",
        fn_constructor_kwargs={"dim": 64}, concurrency=1)
    q = HashedTextEncoder(dim=64).encode_texts([TEXTS[0]])
    out = knn_brute_force(emb, q, k=4, id_col="doc_id").to_pandas()
    ranked = out.sort_values("rank")["vec_id"].tolist()
    assert set(ranked[:2]) == {0, 1}          # self + exact dup on top
    assert ranked.index(2) < ranked.index(3)  # related beats unrelated


def test_projection_artifact_roundtrip(ray_session, tmp_path):
    """Save → restore in fresh actors → identical vectors; restore-latest
    picks the highest version (models/api.py:60-78 analog)."""
    from stacksearch_ray.functions.embedding import (
        ProjectionEncoder,
        latest_artifact,
        save_projection_artifact,
    )

    adir = str(tmp_path / "enc")
    p1 = save_projection_artifact(adir, dim_in=64, dim_out=8, seed=5)
    p2 = save_projection_artifact(adir, dim_in=64, dim_out=8, seed=9)
    assert latest_artifact(adir) == p2 != p1

    a = (_docs_ds(TEXTS).map_batches(
        ProjectionEncoder, batch_format="pyarrow",
        fn_constructor_kwargs={"artifact_dir": adir}, concurrency=1)
        .to_pandas())
    b = (_docs_ds(TEXTS).map_batches(
        ProjectionEncoder, batch_format="pyarrow",
        fn_constructor_kwargs={"artifact_dir": adir}, concurrency=2)
        .to_pandas())
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    ma = np.stack(a["embedding"].to_numpy())
    mb = np.stack(b["embedding"].to_numpy())
    assert np.array_equal(ma, mb)
    assert ma.shape == (len(TEXTS), 8)
    # unit vectors (except the zero-norm doc)
    nrm = np.linalg.norm(ma, axis=1)
    assert np.allclose(nrm[:4], 1.0)
    # explicit version restore differs from latest (different seed)
    c = (_docs_ds(TEXTS).map_batches(
        ProjectionEncoder, batch_format="pyarrow",
        fn_constructor_kwargs={"artifact_dir": p1}, concurrency=1)
        .to_pandas()).sort_values("doc_id").reset_index(drop=True)
    mc = np.stack(c["embedding"].to_numpy())
    assert not np.array_equal(ma, mc)
