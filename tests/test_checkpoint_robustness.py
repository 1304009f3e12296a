"""Checkpoint crash-debris recovery: leftover temp files and
manifest/output disagreements must heal on resume."""

import json
import os

import pytest

from stacksearch_ray.corpus import write_corpus


@pytest.fixture()
def corpus_dir(tmp_path):
    d = str(tmp_path / "corpus")
    write_corpus(d, 200, rows_per_file=50)
    return d


def test_leftover_tmp_file_is_overwritten(ray_session, corpus_dir, tmp_path):
    from stacksearch_ray.checkpoint import build_index_resumable
    from stacksearch_ray.query import QueryEngine

    idx = str(tmp_path / "idx")
    os.makedirs(os.path.join(idx, "docs"), exist_ok=True)
    # simulate a crash mid-write: garbage .tmp where a partition will write
    with open(os.path.join(idx, "docs", "part-00000.parquet.tmp"), "w") as f:
        f.write("garbage from a crashed writer")
    build_index_resumable(corpus_dir, idx, num_shards=2)
    eng = QueryEngine(idx)
    assert len(eng.search("def return", 5)) == 5
    # the garbage tmp was replaced by the real atomic write
    assert not os.path.exists(os.path.join(idx, "docs", "part-00000.parquet.tmp"))


def test_manifest_done_but_output_missing_recomputes(ray_session, corpus_dir, tmp_path):
    from stacksearch_ray.checkpoint import build_index_resumable

    idx = str(tmp_path / "idx")
    build_index_resumable(corpus_dir, idx, num_shards=2)
    victim = os.path.join(idx, "segments", "shard-00001.parquet")
    os.remove(victim)  # output lost after manifest marked done
    build_index_resumable(corpus_dir, idx, num_shards=2)
    assert os.path.exists(victim)


def test_corrupt_manifest_fails_loudly(ray_session, corpus_dir, tmp_path):
    from stacksearch_ray.checkpoint import build_index_resumable

    idx = str(tmp_path / "idx")
    os.makedirs(idx, exist_ok=True)
    with open(os.path.join(idx, "manifest.json"), "w") as f:
        f.write("{not json")
    with pytest.raises(json.JSONDecodeError):
        build_index_resumable(corpus_dir, idx, num_shards=2)


def test_resume_config_mismatch_rejected(ray_session, corpus_dir, tmp_path):
    from stacksearch_ray.checkpoint import BuildInterrupted, build_index_resumable

    idx = str(tmp_path / "idx")
    with pytest.raises(BuildInterrupted):
        build_index_resumable(corpus_dir, idx, num_shards=4,
                              stop_after_partitions=1)
    with pytest.raises(ValueError, match="config mismatch"):
        build_index_resumable(corpus_dir, idx, num_shards=8)  # changed knob
    # original config resumes fine
    build_index_resumable(corpus_dir, idx, num_shards=4)


def test_resume_input_file_list_change_rejected(ray_session, corpus_dir,
                                                tmp_path):
    """ADVICE: pid→files is positional over the sorted file list; a file
    added (or removed) between interrupt and resume must fail loudly,
    not silently remap done pids to different file groups."""
    import shutil

    from stacksearch_ray.checkpoint import BuildInterrupted, build_index_resumable

    idx = str(tmp_path / "idx")
    with pytest.raises(BuildInterrupted):
        build_index_resumable(corpus_dir, idx, num_shards=2,
                              stop_after_partitions=1)
    # a new file sorts into the middle of the list → pid remap
    src = os.path.join(corpus_dir, "part-00000.parquet")
    shutil.copy(src, os.path.join(corpus_dir, "part-00000a.parquet"))
    with pytest.raises(ValueError, match="config mismatch"):
        build_index_resumable(corpus_dir, idx, num_shards=2)
    # restoring the original inputs resumes fine
    os.remove(os.path.join(corpus_dir, "part-00000a.parquet"))
    build_index_resumable(corpus_dir, idx, num_shards=2)


def test_empty_source_rejected(ray_session, tmp_path):
    from stacksearch_ray.checkpoint import build_index_resumable

    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(FileNotFoundError):
        build_index_resumable(empty, str(tmp_path / "idx"))
