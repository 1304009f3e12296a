"""Semantic pins for the session-5 search surfaces: ES rescore
(windowed two-phase re-rank), Lucene coord factor, multiplicative
function-score (linear decay), and TPC-H Q3. The oracle pins exact
values; these pin the MEANING."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def P(ray_session):
    from stacksearch_ray.pipelines import documents as P

    return P


def test_rescore_window_semantics(P):
    """Docs outside the window are never promoted; window docs combine
    exactly qw·bm25 + rw·prox; rescore_weight=0 reproduces the plain
    top-k bitwise."""
    from stacksearch_ray.text import clean_query

    eng = P._index_for(SF)
    q = P.BM25_QUERY
    # rw=0: identical to plain search (scores AND order)
    assert eng.search_rescore(q, 10, window_size=30, rescore_weight=0.0) \
        == eng.search(q, 10, method="exhaustive")

    window = eng.search(q, 30, method="exhaustive")
    win_ids = {d for d, _ in window}
    plain = dict(window)
    terms = sorted(set(clean_query(q)))
    ids, w = eng.min_cover_windows(terms)
    wins = dict(zip(ids.tolist(), w.tolist()))
    got = eng.search_rescore(q, 10, window_size=30,
                             query_weight=1.0, rescore_weight=2.0)
    assert len(got) == 10
    for d, s in got:
        assert d in win_ids  # never promoted from outside the window
        prox = 1.0 / (1.0 + wins[d]) if d in wins else 0.0
        assert s == 1.0 * plain[d] + 2.0 * prox

    # a smaller window is a strict constraint: every result doc of the
    # w=5 run must come from the plain top-5
    top5 = {d for d, _ in eng.search(q, 5, method="exhaustive")}
    for d, _ in eng.search_rescore(q, 5, window_size=5, rescore_weight=2.0):
        assert d in top5


def test_min_cover_windows_within_filter(P):
    """within= restricts output to the given ids, values unchanged."""
    from stacksearch_ray.text import clean_query

    eng = P._index_for(SF)
    terms = sorted(set(clean_query(P.BM25_QUERY)))
    ids, w = eng.min_cover_windows(terms)
    assert len(ids) >= 3
    sub = ids[::2]
    ids2, w2 = eng.min_cover_windows(terms, within=sub)
    assert set(ids2.tolist()) == set(sub.tolist())
    full = dict(zip(ids.tolist(), w.tolist()))
    for d, x in zip(ids2.tolist(), w2.tolist()):
        assert full[d] == x
    # empty restriction
    e_ids, _ = eng.min_cover_windows(terms, within=np.array([], np.int64))
    assert e_ids.size == 0


def test_coord_factor_semantics(P):
    """coord = bm25 · matched/|q|: full-match docs keep their bm25
    score exactly (factor 1.0 multiplies bitwise-neutrally only when
    matched == |q| — check the expression directly)."""
    from stacksearch_ray.text import clean_query

    eng = P._index_for(SF)
    q = P.BM25_QUERY
    terms = sorted(set(clean_query(q)))
    nq = float(len(terms))
    plain = dict(eng.search(q, len(eng.doclens.ids), method="exhaustive"))
    per_term = {t: set(eng.term_doc_ids(t).tolist()) for t in terms}
    got = eng.search_coord(q, len(eng.doclens.ids))
    assert got == sorted(got, key=lambda kv: (-kv[1], kv[0]))
    for d, s in got:
        matched = sum(1 for t in terms if d in per_term[t])
        assert s == plain[d] * (matched / nq)
    # at least one full-match and one partial-match doc exercised
    counts = {sum(1 for t in terms if d in per_term[t]) for d, _ in got}
    assert len(counts) > 1


def test_feature_scale_multiplicative(P):
    """search_feature_scale: missing rows scale by exactly 1.0; present
    rows multiply; zero factor sinks a doc to score 0."""
    eng = P._index_for(SF)
    q = P.BM25_QUERY
    plain = eng.search(q, 20, method="exhaustive")
    # empty feature table == plain search bitwise
    assert eng.search_feature_scale(
        q, 20, feature_ids=np.array([], np.int64),
        feature_vals=np.array([], np.float64)) == plain
    # scale the top doc by 0.5: its new score is exactly half
    d0, s0 = plain[0]
    got = eng.search_feature_scale(
        q, len(eng.doclens.ids), feature_ids=np.array([d0], np.int64),
        feature_vals=np.array([0.5], np.float64))
    new = dict(got)
    assert new[d0] == s0 * 0.5
    # every other doc unchanged
    for d, s in plain[1:]:
        assert new[d] == s


def test_decay_factor_range(P):
    """decay_search scores are bounded by the undecayed bm25 scores
    (factor ∈ [0, 1]) and ranks by the decayed value."""
    eng = P._index_for(SF)
    plain = dict(eng.search(P.BM25_QUERY, len(eng.doclens.ids),
                            method="exhaustive"))
    out = P.decay_search(SF).to_pandas()
    assert len(out) == 10
    assert (out["rank"] == np.arange(1, 11)).all()
    from stacksearch_ray.micros import to_micros
    for d, sm in zip(out["doc_id"], out["score_micros"]):
        assert sm <= to_micros(plain[int(d)]) and sm >= 0


def test_shipping_priority_brute_force(P):
    """Q3 against a pure-pandas replay of the same filters/joins."""
    import pandas as pd
    import pyarrow.parquet as pq

    cust = pq.read_table(os.path.join(SF, "customer.parquet")).to_pandas()
    orders = pq.read_table(os.path.join(SF, "orders.parquet")).to_pandas()
    li = pq.read_table(os.path.join(SF, "lineitem.parquet")).to_pandas()
    cut = pd.Timestamp(P.Q3_CUTOFF)
    ck = set(cust[cust["c_mktsegment"] == P.Q3_SEGMENT]["c_custkey"])
    o = orders[(orders["o_custkey"].isin(ck))
               & (orders["o_orderdate"] < cut)]
    l = li[li["l_shipdate"] > cut].copy()
    l["rev"] = np.floor(l["l_extendedprice"].to_numpy()
                        * (1.0 - l["l_discount"].to_numpy())
                        * 1e6 + 0.5).astype(np.int64)
    j = l.merge(o[["o_orderkey", "o_orderdate"]], left_on="l_orderkey",
                right_on="o_orderkey")
    g = j.groupby("l_orderkey", as_index=False)["rev"].sum()
    g = g.sort_values(["rev", "l_orderkey"],
                      ascending=[False, True]).head(10)
    got = P.shipping_priority(SF).to_pandas()
    assert got["l_orderkey"].tolist() == g["l_orderkey"].tolist()
    assert got["revenue_micros"].tolist() == g["rev"].tolist()


def test_cross_fields_term_centric(P):
    """Cross-fields: per-term best FIELD wins (term-centric) — build a
    brute-force replay from the title/body token split and compare
    doc ids + micros exactly."""
    import math

    import pyarrow.parquet as pq

    from stacksearch_ray.micros import to_micros
    from stacksearch_ray.text import clean_query

    K1, B = P.BM25F_K1, P.BM25F_B
    t = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text"])
    title, body = {}, {}
    for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = clean_query(txt, max_tokens=None)
        if toks:
            title[d] = toks[:P.TITLE_K]
            if toks[P.TITLE_K:]:
                body[d] = toks[P.TITLE_K:]
    avt = sum(map(len, title.values())) / len(title)
    avb = sum(map(len, body.values())) / len(body)
    n = float(len(title))
    terms = sorted(set(clean_query(P.BM25_QUERY)))
    scores = {}
    for term in terms:
        dft = float(sum(1 for v in title.values() if term in v))
        dfb = float(sum(1 for v in body.values() if term in v))
        df = max(dft, dfb)
        if df == 0:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for d in title:
            tft = float(title[d].count(term))
            tfb = float(body.get(d, []).count(term))
            if tft == 0 and tfb == 0:
                continue
            dlt, dlb = float(len(title[d])), float(len(body.get(d, [])))
            pt = (K1 + 1.0) * tft / (tft + K1 * (1.0 - B + B * (dlt / avt)))
            pb = (K1 + 1.0) * tfb / (tfb + K1 * (1.0 - B + B * (dlb / avb)))
            scores[d] = scores.get(d, 0.0) + idf * max(P.XF_WT * pt,
                                                       P.XF_WB * pb)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = P.cross_fields_search(SF).to_pandas()
    assert got["doc_id"].tolist() == [d for d, _ in want]
    assert got["score_micros"].tolist() == [to_micros(s) for _, s in want]


def test_returned_items_brute_force(P):
    """Q10 against a pure-pandas replay."""
    import pandas as pd
    import pyarrow.parquet as pq

    orders = pq.read_table(os.path.join(SF, "orders.parquet")).to_pandas()
    li = pq.read_table(os.path.join(SF, "lineitem.parquet")).to_pandas()
    cust = pq.read_table(os.path.join(SF, "customer.parquet")).to_pandas()
    lo, hi = pd.Timestamp(P.Q10_LO), pd.Timestamp(P.Q10_HI)
    o = orders[(orders["o_orderdate"] >= lo) & (orders["o_orderdate"] < hi)]
    l = li[li["l_returnflag"] == "R"].copy()
    l["rev"] = np.floor(l["l_extendedprice"].to_numpy()
                        * (1.0 - l["l_discount"].to_numpy())
                        * 1e6 + 0.5).astype(np.int64)
    j = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    g = j.groupby("o_custkey", as_index=False)["rev"].sum()
    g = g.sort_values(["rev", "o_custkey"],
                      ascending=[False, True]).head(20)
    got = P.returned_items(SF).to_pandas()
    assert got["c_custkey"].tolist() == g["o_custkey"].tolist()
    assert got["revenue_micros"].tolist() == g["rev"].tolist()
    names = dict(zip(cust["c_custkey"], cust["c_name"]))
    assert got["c_name"].tolist() == [names[c] for c in got["c_custkey"]]
