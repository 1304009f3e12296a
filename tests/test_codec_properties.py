"""Property-based codec tests (hypothesis): round-trips hold for ANY
sorted posting list, not just the seeded samples in test_codec.py."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from stacksearch_ray.codec import (
    decode_block,
    decode_doc_ids,
    decode_tfs,
    encode_segment,
    varint_decode,
    varint_encode,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varint_roundtrip_any(values):
    vals = np.array(values, dtype=np.uint64)
    buf, nbytes = varint_encode(vals)
    assert varint_decode(buf).tolist() == vals.tolist()
    assert int(nbytes.sum()) == len(buf)


@settings(max_examples=100, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=64),
    st.data(),
)
def test_segment_roundtrip_any(id_set, block_size, data):
    ids = np.array(sorted(id_set), dtype=np.int64)
    n = len(ids)
    tfs = np.array(data.draw(st.lists(st.integers(1, 10_000),
                                      min_size=n, max_size=n)), dtype=np.int64)
    lens = np.array(data.draw(st.lists(st.integers(1, 100_000),
                                       min_size=n, max_size=n)), dtype=np.int64)
    seg = encode_segment(ids, tfs, lens, avgdl=123.4, block_size=block_size)
    assert seg.df == n and seg.cf == int(tfs.sum())
    assert decode_doc_ids(seg.doc_ids, block_size).tolist() == ids.tolist()
    assert decode_tfs(seg.tfs).tolist() == tfs.tolist()
    n_blocks = (n + block_size - 1) // block_size
    assert len(seg.skip_first_doc) == n_blocks
    # random block decodes independently and matches the slice
    blk = data.draw(st.integers(0, n_blocks - 1))
    b_ids, b_tfs = decode_block(seg.doc_ids, seg.tfs, seg.skip_doc_offset,
                                seg.skip_tf_offset, blk, n, block_size)
    lo, hi = blk * block_size, min(n, (blk + 1) * block_size)
    assert b_ids.tolist() == ids[lo:hi].tolist()
    assert b_tfs.tolist() == tfs[lo:hi].tolist()
