"""fsck_index: clean indexes pass through every lifecycle state;
seeded corruptions are detected (stats drift, missing docs, decode
mismatches, illegal duplicate segment rows, term_dict drift)."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def fsck_idx(ray_session, tmp_path_factory):
    from stacksearch_ray.build import build_index

    root = tmp_path_factory.mktemp("fsck")
    idx = str(root / "idx")
    build_index(DOCS, idx, content_col="text", id_col="doc_id",
                num_shards=4, term_buckets=8, store_positions=True)
    return idx


def _copy(idx, tmp_path, name):
    dst = str(tmp_path / name)
    shutil.copytree(idx, dst)
    return dst


def test_fsck_clean_through_lifecycle(fsck_idx, ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa

    from stacksearch_ray.append import (
        append_to_index,
        compact_index,
        delete_from_index,
    )
    from stacksearch_ray.fsck import fsck_index

    rep = fsck_index(fsck_idx)
    assert rep.ok, rep.errors
    assert rep.checked_segment_rows > 0 and rep.checked_docs == 500

    idx = _copy(fsck_idx, tmp_path, "life")
    delta = pa.table({
        "doc_id": pa.array(np.arange(10_000, 10_050, dtype=np.int64)),
        "text": pa.array(["fresh appended doc merge sort"] * 50),
    })
    dp = str(tmp_path / "delta.parquet")
    pq.write_table(delta, dp)
    append_to_index(dp, idx)
    assert fsck_index(idx).ok  # appended: duplicate keys legal
    delete_from_index(idx, list(range(0, 100, 3)))
    assert fsck_index(idx).ok  # tombstoned: stats alive-adjusted
    compact_index(idx, term_buckets=8)
    assert fsck_index(idx).ok  # compacted + purged


def test_fsck_detects_corruptions(fsck_idx, ray_session, tmp_path):
    from stacksearch_ray.fsck import fsck_index

    # a) stats drift
    c = _copy(fsck_idx, tmp_path, "c_stats")
    st = json.load(open(os.path.join(c, "stats.json")))
    st["n_docs"] += 7
    json.dump(st, open(os.path.join(c, "stats.json"), "w"))
    rep = fsck_index(c)
    assert not rep.ok and any("n_docs" in e for e in rep.errors)

    # b) missing docs rows -> postings point at unknown docs
    c = _copy(fsck_idx, tmp_path, "c_docs")
    docs_files = os.listdir(os.path.join(c, "docs"))
    os.remove(os.path.join(c, "docs", docs_files[0]))
    rep = fsck_index(c)
    assert not rep.ok
    assert any("not in the docs table" in e or "n_docs" in e
               or "docs table unreadable" in e for e in rep.errors)

    # c) df tampered in a segment row
    c = _copy(fsck_idx, tmp_path, "c_df")
    seg_dir = os.path.join(c, "segments")
    f = sorted(os.listdir(seg_dir))[0]
    t = pq.read_table(os.path.join(seg_dir, f))
    df = t["df"].to_pylist()
    df[0] += 1
    import pyarrow as pa

    t = t.set_column(t.schema.get_field_index("df"), "df",
                     pa.array(df, pa.int64()))
    pq.write_table(t, os.path.join(seg_dir, f))
    rep = fsck_index(c)
    assert not rep.ok and any("decode" in e for e in rep.errors)

    # d) duplicate (term, shard) rows on a NON-appended index
    c = _copy(fsck_idx, tmp_path, "c_dup")
    seg_dir = os.path.join(c, "segments")
    f = sorted(os.listdir(seg_dir))[0]
    shutil.copyfile(os.path.join(seg_dir, f),
                    os.path.join(seg_dir, "dup-" + f))
    rep = fsck_index(c)
    assert not rep.ok
    assert any("duplicate (term, shard)" in e for e in rep.errors)

    # e) term_dict drift
    c = _copy(fsck_idx, tmp_path, "c_td")
    td_dir = os.path.join(c, "term_dict")
    f = os.listdir(td_dir)[0]
    t = pq.read_table(os.path.join(td_dir, f))
    cf = t["cf"].to_pylist()
    cf[0] += 5
    import pyarrow as pa

    t = t.set_column(t.schema.get_field_index("cf"), "cf",
                     pa.array(cf, pa.int64()))
    pq.write_table(t, os.path.join(td_dir, f))
    rep = fsck_index(c)
    assert not rep.ok and any("term_dict" in e for e in rep.errors)
