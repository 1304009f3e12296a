"""Resumable-build test (FIXTURES.md F6): interrupt after k partitions,
resume, assert finished partitions are not recomputed and the final index
equals an uninterrupted build AND the streamed build."""

import os

import pyarrow.parquet as pq
import pytest

from stacksearch_ray.corpus import write_corpus


def _segments_table(index_dir):
    t = pq.read_table(os.path.join(index_dir, "segments"))
    return t.sort_by([("term", "ascending"), ("shard", "ascending")])


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("resume") / "corpus")
    write_corpus(d, 300, rows_per_file=40)  # 8 partitions
    return d


def test_interrupt_and_resume(ray_session, corpus_dir, tmp_path_factory):
    from stacksearch_ray.checkpoint import BuildInterrupted, build_index_resumable

    root = tmp_path_factory.mktemp("resume_out")
    idx_a = str(root / "interrupted")
    idx_b = str(root / "clean")

    with pytest.raises(BuildInterrupted):
        build_index_resumable(corpus_dir, idx_a, num_shards=4,
                              stop_after_partitions=3)

    done_files = [os.path.join(idx_a, "docs", f"part-{i:05d}.parquet") for i in range(3)]
    for f in done_files:
        assert os.path.exists(f)
    mtimes = {f: os.path.getmtime(f) for f in done_files}
    assert not os.path.exists(os.path.join(idx_a, "stats.json"))

    stats_resumed = build_index_resumable(corpus_dir, idx_a, num_shards=4)
    for f, m in mtimes.items():  # finished partitions were not recomputed
        assert os.path.getmtime(f) == m

    stats_clean = build_index_resumable(corpus_dir, idx_b, num_shards=4)
    assert stats_resumed == stats_clean
    assert _segments_table(idx_a).equals(_segments_table(idx_b))


def test_checkpointed_equals_streamed(ray_session, corpus_dir, tmp_path_factory):
    from stacksearch_ray.build import build_index
    from stacksearch_ray.checkpoint import build_index_resumable
    from stacksearch_ray.query import QueryEngine

    root = tmp_path_factory.mktemp("modes")
    idx_s = str(root / "streamed")
    idx_c = str(root / "checkpointed")
    s1 = build_index(corpus_dir, idx_s, num_shards=4)
    s2 = build_index_resumable(corpus_dir, idx_c, num_shards=4)
    assert {k: s1[k] for k in ("n_docs", "total_len", "avgdl")} == \
           {k: s2[k] for k in ("n_docs", "total_len", "avgdl")}
    a, b = QueryEngine(idx_s), QueryEngine(idx_c)
    for q in ["Determine a user's timezone", "def return var_1",
              "numpy python", "helper_3 field_7 import"]:
        assert a.search(q, 10) == b.search(q, 10), q
    # segment rows are BITWISE identical across build paths (also guards
    # the batched shard-encode: combined-scan row order == per-shard scan)
    import pyarrow.parquet as pq

    sa = pq.read_table(os.path.join(idx_s, "segments")).to_pandas() \
        .sort_values(["term", "shard"]).reset_index(drop=True)
    sb = pq.read_table(os.path.join(idx_c, "segments")).to_pandas() \
        .sort_values(["term", "shard"]).reset_index(drop=True)
    assert list(sa.columns) == list(sb.columns)
    for col in sa.columns:
        assert sa[col].tolist() == sb[col].tolist(), col


def test_rerun_completed_build_is_noop(ray_session, corpus_dir, tmp_path_factory):
    from stacksearch_ray.checkpoint import build_index_resumable

    idx = str(tmp_path_factory.mktemp("noop") / "idx")
    build_index_resumable(corpus_dir, idx, num_shards=2)
    seg = os.path.join(idx, "segments", "shard-00000.parquet")
    m = os.path.getmtime(seg)
    build_index_resumable(corpus_dir, idx, num_shards=2)
    assert os.path.getmtime(seg) == m
