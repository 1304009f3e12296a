import numpy as np
import pyarrow as pa

from stacksearch_ray.functions.features import (
    binary_expansion,
    char_histogram_batch,
    to_binary_threshold,
)


def _batch(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_char_histogram():
    t = char_histogram_batch(_batch(["aabc", "A1 \n", ""]), normalize=False)
    f = np.asarray(t["features"].combine_chunks().flatten()).reshape(-1, 32)
    assert f[0][0] == 2 and f[0][1] == 1 and f[0][2] == 1  # a,b,c
    assert f[1][0] == 1      # 'A' case-folded to a
    assert f[1][26] == 1     # digit
    assert f[1][27] == 1     # space
    assert f[1][28] == 1     # newline
    assert f[2].sum() == 0   # empty doc


def test_char_histogram_normalized():
    t = char_histogram_batch(_batch(["aaab"]))
    f = np.asarray(t["features"].combine_chunks().flatten()).reshape(-1, 32)
    assert f[0][0] == 1.0 and abs(f[0][1] - 1 / 3) < 1e-6


def test_binary_threshold():
    out = to_binary_threshold(np.array([0.2, 0.5, 0.7, 1.0]))
    assert out.tolist() == [0, 0, 1, 1]


def test_binary_expansion():
    out = binary_expansion(np.array([5, 0, 255]), bits=8)
    assert out[0].tolist() == [0, 0, 0, 0, 0, 1, 0, 1]
    assert out[1].sum() == 0 and out[2].sum() == 8
