import numpy as np
import pyarrow as pa

from stacksearch_ray.functions.textstats import (
    LangIdScorer,
    fingerprint_batch,
    token_stats_batch,
)
from stacksearch_ray.text import clean_query


def _batch(texts, ids=None):
    ids = ids or list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_token_stats():
    t = token_stats_batch(_batch(["The quick brown fox", "the the the", ""]))
    assert t["n_tokens"].to_pylist() == [4, 3, 0]
    assert t["n_kept"].to_pylist() == [len(clean_query("The quick brown fox")), 0, 0]
    # stopword ratio: 1/4 dropped
    assert t["stopword_ratio_micros"].to_pylist() == [250000, 1000000, 0]


def test_langid():
    s = LangIdScorer()
    t = s(_batch([
        "the cat is on the mat and it is happy",
        "der Hund ist nicht mit der Katze und",
        "le chat est dans la maison avec le chien",
        "el perro es un animal y no es una persona",
        "zzz qqq www",
    ]))
    assert t["lang_pred"].to_pylist()[:4] == ["en", "de", "fr", "es"]
    assert t["lang_pred"].to_pylist()[4] == "und"


def test_fingerprint_deterministic_and_order_sensitive():
    a = fingerprint_batch(_batch(["alpha beta gamma delta"]))
    b = fingerprint_batch(_batch(["alpha beta gamma delta"]))
    c = fingerprint_batch(_batch(["delta gamma beta alpha"]))
    assert a["fingerprint"].to_pylist() == b["fingerprint"].to_pylist()
    assert a["fingerprint"].to_pylist() != c["fingerprint"].to_pylist()
    assert a["doc_len"].to_pylist() == [4]


def test_fingerprint_empty():
    t = fingerprint_batch(_batch(["", "the of"]))
    assert t["fingerprint"].to_pylist()[0] == t["fingerprint"].to_pylist()[1]


def test_quality_filter_discriminates(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import os

    from stacksearch_ray.pipelines.documents import quality_filter

    docs = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta epsilon tokens aplenty here",  # passes
            "the of and to in is that it for on",                  # all stopwords
            "just two",                                            # too few kept
            "the the the the the the real words here live five",   # ratio too high
        ]),
    })
    sf = str(tmp_path)
    pq.write_table(docs, os.path.join(sf, "documents.parquet"))
    out = quality_filter(sf).to_pandas()
    assert out["doc_id"].tolist() == [0]


def test_bpe_token_counts():
    import pyarrow as pa

    from stacksearch_ray.functions.textstats import bpe_token_counts_batch

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["Hello world, it's 2026!", "",
                          "  \n tabs\tand  spaces ", "a'b's c't"]),
    })
    out = bpe_token_counts_batch(t)
    # counted by the GPT-2-style pre-tokenizer pattern (RE2, verified
    # identical to DuckDB regexp_extract_all in the driver oracle)
    assert out["n_bpe_tokens"].to_pylist() == [7, 0, 7, 6]
