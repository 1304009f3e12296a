import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from stacksearch_ray.corpus import write_corpus
from stacksearch_ray.functions.training_export import (
    PAD_ID,
    UNK_ID,
    build_vocab,
    encode_sequences,
    export_training_data,
)
from stacksearch_ray.text import clean_query


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from stacksearch_ray.build import build_index

    root = tmp_path_factory.mktemp("texport")
    corpus = str(root / "c")
    write_corpus(corpus, 200, rows_per_file=50)
    idx = str(root / "i")
    build_index(corpus, idx, num_shards=2)
    return corpus, idx


def test_vocab_deterministic_and_ranked(built):
    _, idx = built
    v1 = build_vocab(idx + "/term_dict", vocab_size=50)
    v2 = build_vocab(idx + "/term_dict", vocab_size=50)
    assert v1.equals(v2)
    ids = v1["token_id"].to_pylist()
    assert ids == list(range(2, 2 + len(ids)))  # reserved 0/1
    # hot code terms rank first
    assert set(v1["term"].to_pylist()[:8]) & {"def", "import", "return", "self"}


def test_encode_sequences_roundtrip(built, ray_session):
    import ray.data as rd

    corpus, idx = built
    vocab = build_vocab(idx + "/term_dict", vocab_size=1000)
    vmap = dict(zip(vocab["term"].to_pylist(), vocab["token_id"].to_pylist()))
    ds = rd.read_parquet(corpus, columns=["path", "content"]).limit(20)
    # use path-derived int ids for the test
    ds = ds.map_batches(lambda t: pa.table({
        "doc_id": pa.array(range(t.num_rows), pa.int64()),
        "text": t["content"]}), batch_format="pyarrow")
    out = encode_sequences(ds, vocab, seq_len=32).to_pandas()
    src = rd.read_parquet(corpus, columns=["content"]).limit(20).to_pandas()
    for i in range(len(out)):
        toks = clean_query(src["content"].iloc[i])[:32]
        expect = [vmap.get(t, UNK_ID) for t in toks]
        expect += [PAD_ID] * (32 - len(expect))
        got = list(np.asarray(out["input_ids"].iloc[i]))
        assert got == expect, i
        assert out["n_tokens"].iloc[i] == len(toks)


def test_export_training_data(built, ray_session, tmp_path):
    import ray.data as rd

    corpus, idx = built
    ds = rd.read_parquet(corpus, columns=["path", "content"]).map_batches(
        lambda t: pa.table({"doc_id": pa.array(range(t.num_rows), pa.int64()),
                            "text": t["content"]}), batch_format="pyarrow")
    out_dir = str(tmp_path / "export")
    vocab = export_training_data(ds, idx + "/term_dict", out_dir,
                                 vocab_size=500, seq_len=64)
    seqs = pq.read_table(out_dir + "/sequences")
    assert seqs.num_rows == 200
    assert pq.read_table(out_dir + "/vocab.parquet").equals(vocab)
    arr = np.asarray(seqs["input_ids"].combine_chunks().flatten()).reshape(-1, 64)
    assert arr.dtype == np.int32 and (arr >= 0).all()
