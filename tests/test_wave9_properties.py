"""Property tests for the wave-9 kernels: the vectorized BPE learner
equals a naive reference implementation on arbitrary vocabularies, and
the merged-stream min-gap kernel equals brute force on arbitrary
position sets."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from stacksearch_ray.functions.bpe import bpe_segment, learn_bpe

WORD = st.text(alphabet="abcd", min_size=1, max_size=8)


def _naive_bpe(words, cfs, n_merges):
    """Trivially-correct reference: dict counting + per-word rescan."""
    symbols = [list(w) for w in words]
    out = []
    for step in range(1, n_merges + 1):
        counts = {}
        for syms, w in zip(symbols, cfs):
            for a, b in zip(syms, syms[1:]):
                if a != b:
                    counts[(a, b)] = counts.get((a, b), 0) + w
        if not counts:
            break
        (lhs, rhs), cnt = min(counts.items(),
                              key=lambda kv: (-kv[1], kv[0]))
        out.append((step, lhs, rhs, cnt))
        for i, syms in enumerate(symbols):
            new, j = [], 0
            while j < len(syms):
                if (j + 1 < len(syms) and syms[j] == lhs
                        and syms[j + 1] == rhs):
                    new.append(lhs + rhs)
                    j += 2
                else:
                    new.append(syms[j])
                    j += 1
            symbols[i] = new
    return out, symbols


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(WORD, st.integers(1, 50)),
                min_size=1, max_size=12, unique_by=lambda t: t[0]))
def test_learn_bpe_equals_naive(word_cfs):
    words = [w for w, _ in word_cfs]
    cfs = [c for _, c in word_cfs]
    got = learn_bpe(words, cfs, 6)
    want, final_syms = _naive_bpe(words, cfs, 6)
    assert list(got.itertuples(index=False, name=None)) == want
    # applying the learned merges per word reproduces the naive final
    # segmentation (segment-then-apply == learn-state)
    merges = [(l, r) for _, l, r, _ in want]
    for w, syms in zip(words, final_syms):
        assert bpe_segment(w, merges) == syms


def _merged_min_gap(pa_, pb_):
    """The near_search kernel shape: min adjacent opposite-label gap
    over the merged sorted stream."""
    ev = sorted([(p, 0) for p in pa_] + [(p, 1) for p in pb_])
    best = None
    for (p1, l1), (p2, l2) in zip(ev, ev[1:]):
        if l1 != l2:
            g = p2 - p1
            best = g if best is None else min(best, g)
    return best


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(1, 60), min_size=1, max_size=15),
       st.lists(st.integers(1, 60), min_size=1, max_size=15))
def test_min_gap_adjacent_equals_brute(pa_raw, pb_raw):
    # distinct positions per term (token positions are unique); the two
    # sets may still overlap — drop collisions (one token = one term)
    pa_ = sorted(set(pa_raw))
    pb_ = sorted(set(pb_raw) - set(pa_))
    if not pb_:
        return
    brute = min(abs(i - j) for i in pa_ for j in pb_)
    assert _merged_min_gap(pa_, pb_) == brute


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 1_000_000), min_size=1, max_size=50))
def test_allowed_mask_probe(ids_raw):
    """The search_filtered membership probe (searchsorted + equality
    check) marks exactly the intersection."""
    local = np.unique(np.asarray(ids_raw, dtype=np.int64))
    rng = np.random.default_rng(7)
    allowed = np.unique(rng.integers(0, 1_000_000, size=30))
    amask = np.zeros(len(local), dtype=bool)
    pos = np.searchsorted(local, allowed)
    ok = pos < len(local)
    pos = pos[ok]
    amask[pos[local[pos] == allowed[ok]]] = True
    assert set(local[amask]) == set(local) & set(allowed)
