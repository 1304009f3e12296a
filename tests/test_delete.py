"""Deletion lifecycle: tombstone masking makes every query path equal a
rebuild WITHOUT the deleted docs (bitwise — global stats are recomputed
at delete time), compaction purges physically and restores pruning, and
appends into a tombstoned index keep stats exact."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

DOCS = "/root/testdata/sf0.001/documents.parquet"
QUERIES = ["merge sort join stream window", "merge sort", "dup stream",
           "zzz_missing"]


@pytest.fixture(scope="module")
def deleted_setup(ray_session, tmp_path_factory):
    from stacksearch_ray.append import delete_from_index
    from stacksearch_ray.build import build_index

    root = tmp_path_factory.mktemp("delete")
    t = pq.read_table(DOCS)
    del_ids = [i for i in t["doc_id"].to_pylist() if i % 7 == 0]
    surv = t.filter(pc.invert(pc.is_in(
        t["doc_id"], value_set=pa.array(del_ids, pa.int64()))))
    surv_p = str(root / "surv.parquet")
    pq.write_table(surv, surv_p)
    kw = dict(content_col="text", id_col="doc_id", num_shards=4,
              term_buckets=8, store_positions=True)
    idx = str(root / "idx")
    build_index(DOCS, idx, **kw)
    delete_from_index(idx, del_ids)
    ref = str(root / "ref")
    build_index(surv_p, ref, **kw)
    return idx, ref, del_ids, kw, surv_p


def test_delete_masks_equal_rebuild(deleted_setup):
    from stacksearch_ray.build import load_stats
    from stacksearch_ray.query import QueryEngine

    idx, ref, del_ids, _, _ = deleted_setup
    si, sr = load_stats(idx), load_stats(ref)
    # global stats recomputed at delete time == rebuilt corpus, bitwise
    assert si["n_docs"] == sr["n_docs"]
    assert si["total_len"] == sr["total_len"]
    assert si["avgdl"] == sr["avgdl"]
    e, r = QueryEngine(idx), QueryEngine(ref)
    for q in QUERIES:
        want = r.search(q, 10, "exhaustive")
        # appended flag routes every method to the masked exhaustive path
        for m in ("auto", "exhaustive", "wand", "bmax"):
            assert e.search(q, 10, m) == want, (q, m)
    # positional, wildcard, candidate and doc-store paths all mask
    assert (e.phrase_occurrences("merge sort")[0].tolist()
            == r.phrase_occurrences("merge sort")[0].tolist())
    na, ga = e.near_min_gaps("merge", "sort")
    nb, gb = r.near_min_gaps("merge", "sort")
    assert na.tolist() == nb.tolist() and ga.tolist() == gb.tolist()
    wa = e.search_wildcard("mer")
    wb = r.search_wildcard("mer")
    for x, y in zip(wa, wb):
        assert x.tolist() == y.tolist()
    assert e.term_doc_ids("merge").tolist() == r.term_doc_ids("merge").tolist()
    assert e.get_docs(del_ids[:5]) == []
    # filtered search never resurrects deleted docs
    allowed = np.asarray(del_ids[:20] + [d for d in e.doclens.ids[:50]
                                         if d % 7 != 0], dtype=np.int64)
    for plan in ("dense", "selective"):
        res = e.search_filtered(QUERIES[0], 10, allowed_doc_ids=allowed,
                                plan=plan)
        assert all(d % 7 != 0 for d, _ in res)
    # idempotent: re-deleting + unknown ids changes nothing
    from stacksearch_ray.append import delete_from_index

    st2 = delete_from_index(idx, del_ids[:3] + [10**15])
    assert st2["n_docs"] == si["n_docs"]
    assert st2["n_tombstones"] == si["n_tombstones"]


def test_compact_purges_tombstones(deleted_setup, tmp_path):
    import os
    import shutil

    from stacksearch_ray.append import compact_index
    from stacksearch_ray.build import load_stats
    from stacksearch_ray.query import QueryEngine

    idx, ref, del_ids, _, _ = deleted_setup
    c = str(tmp_path / "compacted")
    shutil.copytree(idx, c)
    stats = compact_index(c, term_buckets=8)
    assert stats["appended"] is False
    assert "tombstones_file" not in stats
    assert not [n for n in os.listdir(c) if n.startswith("tombstones-")]
    # physical purge: docs table == rebuild's rows; segments bitwise ==
    a = pq.read_table(os.path.join(c, "segments")).to_pandas()
    b = pq.read_table(os.path.join(ref, "segments")).to_pandas()
    a = a.sort_values(["term", "shard"]).reset_index(drop=True)
    b = b.sort_values(["term", "shard"]).reset_index(drop=True)
    assert len(a) == len(b)
    for col in ("term", "shard", "df", "cf", "doc_ids", "tfs", "positions"):
        assert (a[col] == b[col]).all(), col
    assert (pq.read_table(os.path.join(c, "docs")).num_rows
            == pq.read_table(os.path.join(ref, "docs")).num_rows)
    # pruning restored and still identical to the rebuild
    ec, er = QueryEngine(c), QueryEngine(ref)
    assert not ec.has_deletes
    for q in QUERIES:
        want = er.search(q, 10, "exhaustive")
        for m in ("auto", "exhaustive", "bmax"):
            assert ec.search(q, 10, m) == want, (q, m)


def test_delete_random_sets_match_bm25_oracle(ray_session, tmp_path):
    """Randomized delete shapes vs the ground-truth oracle: for several
    seeded random delete sets, the tombstoned index's top-10 (ids AND
    bitwise scores) equals a from-scratch OracleBM25 over exactly the
    surviving docs."""
    import shutil

    from stacksearch_ray.append import delete_from_index
    from stacksearch_ray.build import build_index
    from stacksearch_ray.corpus import generate_corpus, write_corpus
    from stacksearch_ray.oracle import OracleBM25
    from stacksearch_ray.query import QueryEngine
    from stacksearch_ray.schema import doc_id_for

    corpus = str(tmp_path / "c")
    write_corpus(corpus, 200, rows_per_file=100)
    base_idx = str(tmp_path / "base")
    build_index(corpus, base_idx, num_shards=4)
    tbl = generate_corpus(200)
    docs = {doc_id_for(r, p, c): t for r, p, c, t in
            zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist(),
                tbl["commit"].to_pylist(), tbl["content"].to_pylist())}
    all_ids = np.array(sorted(docs), dtype=np.int64)
    queries = ["def return var_1", "helper_3 field_7 import",
               "numpy python", "Determine a user's timezone"]
    for seed in (3, 17, 99):
        rng = np.random.default_rng(seed)
        frac = rng.uniform(0.05, 0.6)
        dels = rng.choice(all_ids, size=int(len(all_ids) * frac),
                          replace=False)
        idx = str(tmp_path / f"idx{seed}")
        shutil.rmtree(idx, ignore_errors=True)
        shutil.copytree(base_idx, idx)
        delete_from_index(idx, dels)
        surviving = {d: t for d, t in docs.items()
                     if d not in set(dels.tolist())}
        oracle = OracleBM25(surviving)
        eng = QueryEngine(idx)
        for q in queries:
            assert eng.search(q, 10) == oracle.search(q, 10), (seed, q)


def test_deleted_df_distributed_equals_driver(deleted_setup, ray_session):
    """The deleted-df sidecar scan has two execution strategies (driver
    Arrow stream vs Ray map_batches partials); both must produce the
    identical per-term counts."""
    import os

    from stacksearch_ray.append import _deleted_df_counts, load_tombstones
    from stacksearch_ray.build import load_stats

    idx, _, _, _, _ = deleted_setup
    st = load_stats(idx)
    allt = load_tombstones(idx, st)
    seg = os.path.join(idx, "segments")
    bs = int(st["block_size"])
    a = _deleted_df_counts(seg, allt, bs, threshold=10**9)  # driver path
    b = _deleted_df_counts(seg, allt, bs, threshold=0)      # Ray path
    assert a == b and len(a) > 0


def test_sharded_engine_with_deletes(deleted_setup, ray_session):
    """Sharded serving under tombstones: each worker masks its subset
    and the global deleted-df correction keeps idf identical — fan-out
    results bitwise equal the single tombstoned engine (and hence the
    rebuild)."""
    from stacksearch_ray.query import QueryEngine, ShardedQueryEngine

    idx, ref, _, _, _ = deleted_setup
    single = QueryEngine(idx)
    sharded = ShardedQueryEngine(idx, num_workers=4)
    for q in QUERIES:
        assert sharded.search(q, 10) == single.search(q, 10), q


def test_upsert_equals_rebuild(ray_session, tmp_path):
    """upsert_to_index (delete → compact → append) over modified + new
    docs equals a from-scratch rebuild of the merged corpus."""
    import pandas as pd

    from stacksearch_ray.append import upsert_to_index
    from stacksearch_ray.build import build_index, load_stats
    from stacksearch_ray.query import QueryEngine

    df = pq.read_table(DOCS).to_pandas()[["doc_id", "text"]]
    mod = df[df.doc_id % 5 == 0].copy()
    mod["text"] = mod["text"] + " upserted marker xqtoken"
    new = pd.DataFrame({
        "doc_id": np.arange(10_000_000, 10_000_050, dtype=np.int64),
        "text": [f"fresh upsert doc {i} xqtoken merge sort"
                 for i in range(50)],
    })
    delta = pd.concat([mod, new], ignore_index=True)
    delta_p = str(tmp_path / "delta.parquet")
    pq.write_table(pa.Table.from_pandas(delta, preserve_index=False),
                   delta_p)
    merged = pd.concat([df[df.doc_id % 5 != 0], delta], ignore_index=True)
    merged_p = str(tmp_path / "merged.parquet")
    pq.write_table(pa.Table.from_pandas(merged, preserve_index=False),
                   merged_p)
    base_p = str(tmp_path / "base.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), base_p)

    kw = dict(content_col="text", id_col="doc_id", num_shards=4,
              term_buckets=8)
    idx = str(tmp_path / "idx")
    build_index(base_p, idx, **kw)
    upsert_to_index(delta_p, idx)
    ref = str(tmp_path / "ref")
    build_index(merged_p, ref, **kw)
    si, sr = load_stats(idx), load_stats(ref)
    assert si["n_docs"] == sr["n_docs"]
    assert si["total_len"] == sr["total_len"]
    assert si["avgdl"] == sr["avgdl"]
    e, r = QueryEngine(idx), QueryEngine(ref)
    for q in QUERIES + ["xqtoken", "upserted marker"]:
        assert e.search(q, 10, "auto") == r.search(q, 10, "exhaustive"), q
    # the updated content actually serves (old version gone)
    top = e.search("xqtoken", 200)
    assert len(top) == len(mod) + len(new)


def test_delete_then_append_stats_exact(ray_session, tmp_path):
    """Appending into a tombstoned index must subtract the tombstoned
    rows from the refreshed global stats — avgdl stays bitwise equal to
    a rebuild over (survivors + delta)."""
    from stacksearch_ray.append import append_to_index, delete_from_index
    from stacksearch_ray.build import build_index, load_stats
    from stacksearch_ray.query import QueryEngine

    t = pq.read_table(DOCS)
    del_ids = [i for i in t["doc_id"].to_pylist() if i % 5 == 0]
    delta = pa.table({
        "doc_id": pc.add(t["doc_id"], 10_000_000),
        "text": t["text"],
    })
    delta_p = str(tmp_path / "delta.parquet")
    pq.write_table(delta, delta_p)
    surv = t.filter(pc.invert(pc.is_in(
        t["doc_id"], value_set=pa.array(del_ids, pa.int64()))))
    ref_tbl = pa.concat_tables([surv.select(["doc_id", "text"]), delta])
    ref_p = str(tmp_path / "ref.parquet")
    pq.write_table(ref_tbl, ref_p)

    kw = dict(content_col="text", id_col="doc_id", num_shards=4,
              term_buckets=8)
    idx = str(tmp_path / "idx")
    build_index(DOCS, idx, **kw)
    delete_from_index(idx, del_ids)
    append_to_index(delta_p, idx)
    ref = str(tmp_path / "ref_idx")
    build_index(ref_p, ref, **kw)
    si, sr = load_stats(idx), load_stats(ref)
    assert si["n_docs"] == sr["n_docs"]
    assert si["total_len"] == sr["total_len"]
    assert si["avgdl"] == sr["avgdl"]
    e, r = QueryEngine(idx), QueryEngine(ref)
    for q in QUERIES:
        assert e.search(q, 10, "auto") == r.search(q, 10, "exhaustive"), q


def test_delete_by_query_equals_manual(ray_session, tmp_path):
    """delete_by_query(expr) == delete_from_index(matched set): same
    tombstones, same stats, same search results; idempotent on re-run;
    a no-match expression is a stats no-op."""
    from stacksearch_ray.append import delete_by_query, delete_from_index
    from stacksearch_ray.build import build_index, load_stats
    from stacksearch_ray.query import QueryEngine

    kw = dict(content_col="text", id_col="doc_id", num_shards=4,
              term_buckets=8)
    idx = str(tmp_path / "idx")
    ref = str(tmp_path / "ref")
    build_index(DOCS, idx, **kw)
    build_index(DOCS, ref, **kw)

    expr = "merge AND sort"
    matched = QueryEngine(ref).search_boolean_dsl(expr)
    assert len(matched) > 0  # the probe must actually delete something
    s1 = delete_by_query(idx, expr)
    delete_from_index(ref, matched.tolist())
    s2 = load_stats(ref)
    for k in ("n_docs", "total_len", "avgdl", "n_tombstones"):
        assert s1[k] == s2[k], k
    e, r = QueryEngine(idx), QueryEngine(ref)
    for q in QUERIES:
        assert e.search(q, 10, "auto") == r.search(q, 10, "auto"), q

    # idempotent: matched docs are tombstoned -> second run finds nothing
    s3 = delete_by_query(idx, expr)
    assert s3["n_tombstones"] == s1["n_tombstones"]
    assert s3["n_docs"] == s1["n_docs"]

    # no-match expression: stats unchanged (and no new sidecars)
    s4 = delete_by_query(idx, "zzzmissingterm")
    assert s4["n_tombstones"] == s1["n_tombstones"]
    assert s4["tombstones_file"] == s1["tombstones_file"]
