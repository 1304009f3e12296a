"""BPE tokenizer training over a distributed word-frequency table.

The scale split is the one production BPE trainers use (Sennrich et al.
2016 — learning happens on the word-count table, not the corpus): the
corpus-scale pass is a distributed word count (term_counts — one
combiner-backed aggregate over every token occurrence); merge learning
then runs over the vocab-sized (term, cf) table with fully vectorized
pair counting — one flat symbol array for the whole vocab, numpy
unique/bincount per round, no per-word Python in the loop.

Semantics (pinned, mirrored bit-for-bit by the SQL oracle):
- pair counts are OVERLAPPING adjacent counts weighted by word cf
  (standard), but identical-symbol pairs (a == b) are NOT merge
  candidates — this keeps left-greedy application order-free (adjacent
  matches cannot overlap when a != b), which is what makes a
  deterministic one-pass vectorized apply (and a SQL mirror) exact.
  Documented deviation from Sennrich's run-collapsing.
- merge choice: max count, ties broken (lhs asc, rhs asc).
- application replaces every match position (disjoint by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def learn_bpe(terms, cf, n_merges: int) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges from a (term, cf) word-frequency
    table. Returns a DataFrame (step, lhs, rhs, pair_count); may return
    fewer rows if the vocab runs out of mergeable pairs."""
    sym_ids: dict[str, int] = {}
    sym_str: list[str] = []

    def intern(s: str) -> int:
        i = sym_ids.get(s)
        if i is None:
            i = len(sym_str)
            sym_ids[s] = i
            sym_str.append(s)
        return i

    flat_l, wid_l = [], []
    for w_i, t in enumerate(terms):
        for ch in t:
            flat_l.append(intern(ch))
            wid_l.append(w_i)
    flat = np.array(flat_l, dtype=np.int64)
    wid = np.array(wid_l, dtype=np.int64)
    cfv = np.asarray(cf, dtype=np.int64)
    rows = []
    for step in range(1, n_merges + 1):
        if len(flat) < 2:
            break
        a, b = flat[:-1], flat[1:]
        valid = (wid[:-1] == wid[1:]) & (a != b)
        if not valid.any():
            break
        m = np.int64(len(sym_str))
        key = a[valid] * m + b[valid]
        weights = cfv[wid[:-1][valid]]
        uk, inv = np.unique(key, return_inverse=True)
        cnt = np.zeros(len(uk), dtype=np.int64)  # int64-exact weights
        np.add.at(cnt, inv, weights)
        top = cnt.max()
        cand = uk[cnt == top]
        pairs = sorted((sym_str[int(k // m)], sym_str[int(k % m)])
                       for k in cand)
        lhs, rhs = pairs[0]
        ai, bi = sym_ids[lhs], sym_ids[rhs]
        rows.append((step, lhs, rhs, int(top)))
        new_id = intern(lhs + rhs)
        hit = valid & (a == ai) & (b == bi)
        pos = np.flatnonzero(hit)
        flat[pos] = new_id
        keep = np.ones(len(flat), dtype=bool)
        keep[pos + 1] = False
        flat = flat[keep]
        wid = wid[keep]
    return pd.DataFrame(rows, columns=["step", "lhs", "rhs", "pair_count"])


def bpe_segment(term: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned merges IN ORDER to one word (left-greedy per
    merge; matches are disjoint because lhs != rhs). The per-word
    reference used by tests and by vocab-sized encode tables."""
    syms = list(term)
    for lhs, rhs in merges:
        out: list[str] = []
        j = 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == lhs and syms[j + 1] == rhs:
                out.append(lhs + rhs)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms
