"""PPMI+SVD semantic embeddings (F3/F5 proper): synonym pairs that
never co-occur but share contexts must land near each other — the
capability the hashed encoder structurally cannot have (distinct terms
hash independently). Mirrors the reference's train→persist→restore
flow (models/train.py:209-223, models/api.py:30-78)."""

import numpy as np
import pyarrow as pa
import pytest


def _corpus():
    import ray.data as rd

    # "cat" and "feline" share contexts but NEVER co-occur; "query"
    # lives in a disjoint context set. Every content word appears
    # often enough to clear min_count.
    docs = (
        ["cat chased mouse across garden yesterday evening"] * 6
        + ["feline chased mouse across garden yesterday evening"] * 6
        + ["cat sleeps near warm window during afternoon"] * 6
        + ["feline sleeps near warm window during afternoon"] * 6
        + ["query planner joins tables using index statistics"] * 6
        + ["query optimizer scans index pages during execution"] * 6
    )
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(docs))), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }))


def _cos(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(a @ b / (na * nb))


@pytest.fixture(scope="module")
def artifact(ray_session, tmp_path_factory):
    from stacksearch_ray.functions.semantic import train_semantic_artifact

    art = str(tmp_path_factory.mktemp("sem") / "artifact")
    path = train_semantic_artifact(_corpus(), art, vocab_size=64,
                                   min_count=2, window=4, dim=16)
    return art, path


def test_synonyms_close_unrelated_far(ray_session, artifact):
    from stacksearch_ray.functions.embedding import HashedTextEncoder
    from stacksearch_ray.functions.semantic import SemanticEncoder

    art, _ = artifact
    enc = SemanticEncoder(art)
    cat, feline = enc.word_vector("cat"), enc.word_vector("feline")
    query = enc.word_vector("query")
    assert cat is not None and feline is not None and query is not None
    syn = _cos(cat, feline)
    far = _cos(cat, query)
    assert syn > 0.8, f"synonyms should align, cos={syn}"
    assert syn > far + 0.3, f"synonym {syn} vs unrelated {far}"

    # the hashed encoder cannot do this: distinct terms hash to
    # independent buckets, so 'cat' vs 'feline' is ~orthogonal there
    h = HashedTextEncoder(dim=16)
    hv = h.encode_texts(["cat", "feline"])
    hashed_syn = _cos(hv[0], hv[1])
    assert syn > hashed_syn + 0.3


def test_artifact_restore_and_actor_pool_encode(ray_session, artifact):
    from stacksearch_ray.functions.semantic import SemanticEncoder

    art, path = artifact
    # restore-latest == explicit versioned path
    a = SemanticEncoder(art)
    b = SemanticEncoder(path)
    assert a.version == b.version
    assert np.array_equal(a.emb, b.emb)

    out = (_corpus()
           .map_batches(SemanticEncoder, batch_format="pyarrow",
                        batch_size=16, concurrency=2,
                        fn_constructor_kwargs={"artifact_dir": art})
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 36
    m = np.stack([np.asarray(v) for v in out["embedding"]])
    # doc-level: cat-doc ~ feline-doc (same contexts), far from query-doc
    assert _cos(m[0], m[6]) > _cos(m[0], m[24]) + 0.2
    # unit-norm embeddings
    assert np.allclose(np.linalg.norm(m, axis=1), 1.0)


def test_oov_only_doc_is_zero_vector(ray_session, artifact):
    from stacksearch_ray.functions.semantic import SemanticEncoder

    art, _ = artifact
    enc = SemanticEncoder(art)
    v = enc.encode_texts(["zzz unseen wordsoup entirely"])
    assert np.allclose(v, 0.0)
