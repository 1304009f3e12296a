"""Execution-order independence (SURVEY.md §2.9/§4): the index must not
depend on batch sizing or partition layout, and doc-id sharding must keep
hot-term groups balanced."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from stacksearch_ray.corpus import write_corpus
from stacksearch_ray.schema import shard_of


def _seg_table(idx):
    return (pq.read_table(os.path.join(idx, "segments"))
            .sort_by([("term", "ascending"), ("shard", "ascending")]))


def test_index_independent_of_batch_and_partition_layout(ray_session, tmp_path_factory):
    from stacksearch_ray.build import build_index

    root = tmp_path_factory.mktemp("det")
    c1, c2 = str(root / "c1"), str(root / "c2")
    write_corpus(c1, 300, rows_per_file=300)   # one file
    write_corpus(c2, 300, rows_per_file=37)    # nine ragged files
    i1, i2 = str(root / "i1"), str(root / "i2")
    build_index(c1, i1, num_shards=4, batch_size=64)
    build_index(c2, i2, num_shards=4, batch_size=2048)
    t1, t2 = _seg_table(i1), _seg_table(i2)
    assert t1.equals(t2)  # byte-identical segment content


def test_hot_term_shard_balance(ray_session, tmp_path_factory):
    """A term present in EVERY doc (maximal skew) must split evenly across
    shards — doc-id sharding IS the salt (SURVEY.md §4)."""
    from stacksearch_ray.build import build_index

    root = tmp_path_factory.mktemp("skew")
    corpus = str(root / "c")
    write_corpus(corpus, 1000, rows_per_file=250)
    idx = str(root / "i")
    build_index(corpus, idx, num_shards=8)
    seg = pq.read_table(os.path.join(idx, "segments"),
                        columns=["term", "shard", "df"])
    import pandas as pd

    df = seg.to_pandas()
    hot = df[df["term"] == "def"]
    assert len(hot) == 8  # present in every shard
    per_shard = hot["df"].to_numpy()
    assert per_shard.sum() >= 700  # 'def' is near-universal in the corpus
    # balanced: no shard holds more than 2x the mean
    assert per_shard.max() <= 2 * per_shard.mean()


def test_shard_of_spreads_sequential_ids():
    shards = shard_of(np.arange(10_000, dtype=np.int64), 16)
    counts = np.bincount(shards, minlength=16)
    assert counts.min() > 0.7 * counts.mean()
    assert counts.max() < 1.3 * counts.mean()


def test_corpus_generator_deterministic():
    from stacksearch_ray.corpus import generate_corpus

    a = generate_corpus(120, seed=42)
    b = generate_corpus(120, seed=42)
    assert a.equals(b)
    c = generate_corpus(120, seed=43)
    assert not a.equals(c)
    # heavier variant is deterministic too and distinct from the default
    h1 = generate_corpus(50, lines=(10, 80))
    h2 = generate_corpus(50, lines=(10, 80))
    assert h1.equals(h2) and not h1.equals(generate_corpus(50))
