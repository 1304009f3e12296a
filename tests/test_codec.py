"""Codec round-trip + skip-block properties (SURVEY.md §7 step 5).

Seeded property-style loops (no external deps) mirroring the reference's
multi-block spill test style (/root/reference/tests/index_test.py:11-32)."""

import numpy as np

from stacksearch_ray.codec import (
    bm25_tf_part,
    decode_block,
    decode_doc_ids,
    decode_tfs,
    encode_segment,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_edges():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**63 - 1, 2**64 - 1],
                    dtype=np.uint64)
    buf, nbytes = varint_encode(vals)
    assert nbytes.tolist() == [1, 1, 1, 2, 2, 2, 3, 5, 9, 10]
    out = varint_decode(buf)
    assert out.tolist() == vals.tolist()


def test_varint_roundtrip_random():
    rng = np.random.default_rng(42)
    for _ in range(20):
        n = int(rng.integers(0, 5000))
        vals = rng.integers(0, 2**62, size=n, dtype=np.uint64)
        buf, _ = varint_encode(vals)
        assert varint_decode(buf).tolist() == vals.tolist()


def _random_postings(rng, n):
    ids = np.sort(rng.choice(np.arange(1, n * 20, dtype=np.int64), size=n, replace=False))
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    lens = rng.integers(1, 500, size=n).astype(np.int64)
    return ids, tfs, lens


def test_segment_roundtrip_and_skips():
    rng = np.random.default_rng(7)
    for n in [0, 1, 127, 128, 129, 1000, 4096]:
        ids, tfs, lens = _random_postings(rng, max(n, 1))
        ids, tfs, lens = ids[:n], tfs[:n], lens[:n]
        seg = encode_segment(ids, tfs, lens, avgdl=120.0, block_size=128)
        assert seg.df == n and seg.cf == int(tfs.sum())
        assert decode_doc_ids(seg.doc_ids, block_size=128).tolist() == ids.tolist()
        assert decode_tfs(seg.tfs).tolist() == tfs.tolist()
        n_blocks = (n + 127) // 128
        assert len(seg.skip_first_doc) == n_blocks
        for blk in range(n_blocks):
            b_ids, b_tfs = decode_block(seg.doc_ids, seg.tfs, seg.skip_doc_offset,
                                        seg.skip_tf_offset, blk, n, block_size=128)
            lo, hi = blk * 128, min(n, (blk + 1) * 128)
            assert b_ids.tolist() == ids[lo:hi].tolist()
            assert b_tfs.tolist() == tfs[lo:hi].tolist()
            assert seg.skip_first_doc[blk] == ids[lo]
            assert seg.block_max_tf[blk] == tfs[lo:hi].max()
            # block-max upper bound dominates every true score in the block
            scores = bm25_tf_part(tfs[lo:hi], lens[lo:hi], 120.0)
            assert seg.block_max_score[blk] >= scores.max() - 1e-12


def test_block_max_is_tight():
    ids = np.arange(1, 257, dtype=np.int64)
    tfs = np.ones(256, dtype=np.int64)
    lens = np.full(256, 100, dtype=np.int64)
    seg = encode_segment(ids, tfs, lens, avgdl=100.0, block_size=128)
    expect = bm25_tf_part(np.array([1]), np.array([100]), 100.0)[0]
    assert np.allclose(seg.block_max_score, expect)


def test_batched_decode_matches_per_row():
    """decode_doc_ids_batch / decode_tfs_batch == per-row decodes on
    random segment rows (incl. multi-block rows and empties)."""
    import numpy as np

    from stacksearch_ray.codec import (
        decode_doc_ids,
        decode_doc_ids_batch,
        decode_tfs,
        decode_tfs_batch,
        encode_segment,
    )

    rng = np.random.default_rng(21)
    bufs_d, bufs_t, exp_i, exp_t = [], [], [], []
    for _ in range(300):
        n = int(rng.integers(1, 500))
        ids = np.sort(rng.choice(10**7, n, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 9, n).astype(np.int64)
        seg = encode_segment(ids, tfs, np.full(n, 40, np.int64),
                             avgdl=40.0, k1=1.2, b=0.75, block_size=128)
        bufs_d.append(seg.doc_ids)
        bufs_t.append(seg.tfs)
        exp_i.append(decode_doc_ids(seg.doc_ids, 128))
        exp_t.append(decode_tfs(seg.tfs))
    fi, offs = decode_doc_ids_batch(bufs_d, 128)
    ft, offs2 = decode_tfs_batch(bufs_t)
    assert np.array_equal(offs, offs2)
    for i in range(len(bufs_d)):
        assert np.array_equal(fi[offs[i]:offs[i + 1]], exp_i[i]), i
        assert np.array_equal(ft[offs[i]:offs[i + 1]], exp_t[i]), i
    fe, oe = decode_doc_ids_batch([b"", b""], 128)
    assert len(fe) == 0 and oe.tolist() == [0, 0, 0]
