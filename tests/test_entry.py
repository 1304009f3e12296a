"""Driver-contract safety net: __ray_entry__.entry()/queries()/oracle_sql()
stay importable, runnable, and consistent (the driver's t1 smoke + a
sample of t2 comparisons, in CI form)."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as E

    return E


def test_entry_smoke(entry_mod):
    df = entry_mod.entry()
    assert isinstance(df, pd.DataFrame)
    assert list(df.columns) == ["query", "rank", "doc_id", "score"]
    assert len(df) >= 0
    # deterministic across calls
    df2 = entry_mod.entry()
    assert df.equals(df2)


def test_queries_oracle_keys_consistent(entry_mod):
    qs, sqls = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(sqls) <= set(qs)  # every oracle has a pipeline
    assert len(qs) >= 30
    for name, fn in qs.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", ["term_df", "exact_dedup", "bm25_topk",
                                  "docs_range", "knn_cosine"])
def test_sampled_entries_match_oracle(entry_mod, name):
    import duckdb

    res = entry_mod.queries()[name](SF)
    mine = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events", "lineitem", "orders",
              "customer"]:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = con.sql(entry_mod.oracle_sql()[name]).df()
    assert len(mine) == len(oracle), name
    assert sorted(mine.columns) == sorted(oracle.columns), name
    a = mine[sorted(mine.columns)].astype(str).apply("|".join, axis=1)
    b = oracle[sorted(oracle.columns)].astype(str).apply("|".join, axis=1)
    assert sorted(a) == sorted(b), name
