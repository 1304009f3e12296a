"""Training-data curation operators: benchmark decontamination,
Gopher-style repetition signals, PII redaction, and edit-distance
near-dup pairs.

These are the text-curation steps a 100-TB pretraining pipeline runs
between raw ingest and training export (alongside dedup.py's
exact/MinHash/SimHash family):

- **Decontamination** (Brown et al. 2020 §C, "Language Models are
  Few-Shot Learners"): drop training docs sharing token n-grams with a
  held-out benchmark set. The blocklist side is benchmark-sized —
  tiny relative to the corpus — so it broadcasts (`ray.put` once, read
  zero-copy per task); the corpus side streams. Production uses
  n = 8–13; the driver entry runs n = 3 because the synthetic
  testdata vocabulary is ~40 words (an 8-gram never collides there).
- **Repetition stats** (Rae et al. 2021 "Gopher" §A1.1 quality
  heuristics): per-doc fraction of tokens inside the most common
  2-gram and inside duplicated 3-grams. Per-doc quantities — computed
  exactly inside one map_batches, nothing shuffles.
- **PII redaction**: RE2 regexp replace (email / SSN / phone) via
  pyarrow's C++ kernels; DuckDB's regexp_replace is RE2 too, so the
  oracle runs the identical regexes.
- **Edit-distance near-dup pairs**: Levenshtein over 64-char prefixes
  inside (lang, length-bucket) blocks, computed with Myers' (1999)
  bit-parallel algorithm — a 64-char pattern is exactly one uint64
  word, and the word ops vectorize ACROSS candidate pairs, giving
  O(prefix_len) numpy steps per block regardless of pair count.

All float outputs travel as *_micros int64 (micros.py convention).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from ..micros import to_micros
from ..text import tokenize_array
from .dedup import md5_low64_arrow

# ---------------- token n-grams (shared, vectorized) ----------------


def _ngrams_from_flat(flat: pa.Array, doc_idx: np.ndarray,
                      n: int) -> tuple[pa.Array, np.ndarray]:
    """(flat tokens, row index) → (n-gram strings, row index), fully
    vectorized: n shifted slices of the flat token array joined
    element-wise; windows crossing a row boundary are masked out.
    Tokens contain no spaces, so the space-join is injective."""
    m = len(flat) - n + 1
    if m <= 0:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    valid = doc_idx[:m] == doc_idx[n - 1:]
    parts = [flat.slice(k, m) for k in range(n)]
    ng = pc.binary_join_element_wise(*parts, " ")
    return ng.filter(pa.array(valid)), doc_idx[:m][valid]


def doc_ngram_hashes(batch: pa.Table, n: int, text_col: str = "text",
                     id_col: str = "doc_id") -> tuple[np.ndarray, np.ndarray]:
    """Per-batch DISTINCT (doc_id, md5-low64(n-gram)) pairs. Exact per
    doc because a doc never spans batches."""
    flat, doc_idx, _ = tokenize_array(batch[text_col].combine_chunks())
    ng, rows = _ngrams_from_flat(flat, doc_idx, n)
    ids = np.asarray(batch[id_col].combine_chunks()).astype(np.int64)
    if len(ng) == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    h = md5_low64_arrow(ng)
    doc = ids[rows]
    order = np.lexsort((h, doc))
    doc, h = doc[order], h[order]
    keep = np.ones(len(h), dtype=bool)
    keep[1:] = (doc[1:] != doc[:-1]) | (h[1:] != h[:-1])
    return doc[keep], h[keep]


# ---------------- benchmark decontamination ----------------


def remove_duplicate_spans(ds: Dataset, n: int = 8,
                           text_col: str = "text", id_col: str = "doc_id",
                           num_buckets: int = 16) -> Dataset:
    """Exact duplicated-SPAN removal — the Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better")
    exact-substring dedup as a corpus TRANSFORM (dup_ngram_stats is the
    metric twin): every token covered by an ``n``-gram that occurs in
    ≥2 DISTINCT documents is dropped; the doc survives with its
    uncovered analyzer-stream tokens re-joined. Returns (doc_id,
    n_tokens, n_covered, kept_text) for EVERY input doc.

    Pass 1 builds the duplicated-gram set exactly like dup_ngram_stats
    (distinct (doc, md5-low64 gram) pairs → per-batch partials → 16
    hash buckets → count ≥ 2), broadcast sorted via ray.put (dup-set
    sized; route through the bloom semi-join above ~10⁸ entries).
    Pass 2 streams the corpus once: member gram starts found by one
    searchsorted, token coverage by a ±1 delta array + cumsum over the
    flat token stream (spans never cross doc boundaries), kept text
    re-joined per doc (output-sized work). Gram identity is md5-low64
    == DuckDB md5_number_lower, so the entry is fully SQL-oracled."""
    import ray as _ray

    def pair_counts(b: pa.Table) -> pa.Table:
        doc, h = doc_ngram_hashes(b, n, text_col, id_col)
        # doc_ngram_hashes returns DISTINCT (doc, gram) pairs, so
        # counting hashes counts distinct docs per gram
        u, cnt = np.unique(h, return_counts=True)
        return pa.table({
            "h": pa.array(u.view(np.int64), pa.int64()),
            "c": pa.array(cnt.astype(np.int64)),
            "__b": pa.array((u % np.uint64(num_buckets)).view(np.int64)),
        })

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("h", as_index=False)["c"].sum()
        return agg[agg["c"] >= 2][["h"]]

    dup = (ds.map_batches(pair_counts, batch_format="pyarrow")
           .groupby("__b").map_groups(reduce_bucket, batch_format="pandas")
           .to_pandas())  # duplicated-gram-set-sized (see docstring)
    dup_sorted = np.sort(dup["h"].to_numpy(np.int64).view(np.uint64))
    dref = _ray.put(dup_sorted)

    def transform(b: pa.Table) -> pa.Table:
        dupset = _ray.get(dref)
        ids = np.asarray(b[id_col].combine_chunks()).astype(np.int64)
        flat, doc_idx, doc_lens = tokenize_array(b[text_col].combine_chunks())
        nrows = len(ids)
        L = len(flat)
        covered = np.zeros(L, dtype=bool)
        m = L - n + 1
        if m > 0 and len(dupset):
            valid = doc_idx[:m] == doc_idx[n - 1:]
            starts_g = np.flatnonzero(valid)
            ng, _rows = _ngrams_from_flat(flat, doc_idx, n)
            h = md5_low64_arrow(ng)
            pos = np.searchsorted(dupset, h)
            ok = pos < len(dupset)
            mem = np.zeros(len(h), dtype=bool)
            mem[ok] = dupset[pos[ok]] == h[ok]
            mstarts = starts_g[mem]
            delta = np.zeros(L + n, dtype=np.int64)
            np.add.at(delta, mstarts, 1)
            np.add.at(delta, mstarts + n, -1)
            covered = np.cumsum(delta[:L]) > 0
        kept_texts = [""] * nrows
        n_cov = np.zeros(nrows, dtype=np.int64)
        if L:
            n_cov = np.bincount(doc_idx[covered],
                                minlength=nrows).astype(np.int64)
            keep = ~covered
            toks = flat.to_numpy(zero_copy_only=False)[keep]
            kdoc = doc_idx[keep]
            # per-doc string assembly is output-sized (one join per doc)
            for ri, txt in pd.Series(toks).groupby(kdoc).agg(" ".join).items():
                kept_texts[int(ri)] = txt
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(doc_lens.astype(np.int64), pa.int64()),
            "n_covered": pa.array(n_cov, pa.int64()),
            "kept_text": pa.array(kept_texts, pa.string()),
        })

    return ds.map_batches(transform, batch_format="pyarrow")


def contamination_flags(ds: Dataset, n: int = 3, bench_mod: int = 97,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> Dataset:
    """Docs sharing ≥1 token n-gram with the benchmark set
    (doc_id % bench_mod == 0), with the count of DISTINCT contaminated
    n-grams. Benchmark docs themselves are excluded from the output.

    Scale shape: the blocklist is collected to the driver and broadcast
    — it is benchmark-sized (10⁴–10⁵ docs → ~10⁶ hashes ≈ 8 MB), not
    corpus-sized, which is what makes decontamination a broadcast
    semi-join rather than a shuffle. The corpus side is one streaming
    map_batches with a searchsorted membership probe per batch.
    """
    def bench_hashes(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks()).astype(np.int64)
        batch = batch.filter(pa.array(ids % bench_mod == 0))
        _, h = doc_ngram_hashes(batch, n, text_col, id_col)
        return pa.table({"h": pa.array(np.unique(h), pa.uint64())})

    parts = ds.map_batches(bench_hashes, batch_format="pyarrow").to_pandas()
    blocklist = np.unique(parts["h"].to_numpy().astype(np.uint64))
    bl_ref = ray.put(blocklist)

    def flag(batch: pa.Table) -> pa.Table:
        bl = ray.get(bl_ref)  # zero-copy plasma read, shared per node
        doc, h = doc_ngram_hashes(batch, n, text_col, id_col)
        if len(doc) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "hits": pa.array([], pa.int64())})
        pos = np.searchsorted(bl, h)
        hit = (pos < len(bl)) & (bl[np.minimum(pos, len(bl) - 1)] == h)
        hit &= (doc % bench_mod) != 0
        uniq, counts = np.unique(doc[hit], return_counts=True)
        return pa.table({"doc_id": pa.array(uniq, pa.int64()),
                         "hits": pa.array(counts, pa.int64())})

    return ds.map_batches(flag, batch_format="pyarrow")


# ---------------- Gopher-style repetition signals ----------------


def repetition_stats_batch(batch: pa.Table, text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """Per-doc repetition signals, exact within one batch:

    - ``top2_count``: occurrences of the doc's most common 2-gram;
      ``top2_frac`` = 2·top2_count / n_tokens.
    - ``dup3_count``: total occurrences of 3-grams appearing ≥2 times;
      ``dup3_frac`` = 3·dup3_count / n_tokens (overlapping windows, so
      the fraction can exceed 1 on degenerate docs — the signal is a
      threshold gate, not a measure).
    """
    content = batch[text_col].combine_chunks()
    flat, doc_idx, doc_lens = tokenize_array(content)
    n_docs = len(content)
    ids = np.asarray(batch[id_col].combine_chunks()).astype(np.int64)
    agg = {2: np.zeros(n_docs, np.int64), 3: np.zeros(n_docs, np.int64)}
    for n in (2, 3):
        ng, rows = _ngrams_from_flat(flat, doc_idx, n)
        if len(ng) == 0:
            continue
        d = ng.dictionary_encode()
        codes = np.asarray(d.indices).astype(np.int64)
        vocab_n = len(d.dictionary)
        key = rows * vocab_n + codes  # rows, codes < 2^31 per batch
        uniq, counts = np.unique(key, return_counts=True)
        urows = (uniq // vocab_n).astype(np.int64)
        if n == 2:
            np.maximum.at(agg[2], urows, counts)
        else:
            dup = counts >= 2
            np.add.at(agg[3], urows[dup], counts[dup])
    denom = np.maximum(doc_lens, 1).astype(np.float64)
    top2_frac = np.where(doc_lens > 0, agg[2] * 2.0 / denom, 0.0)
    dup3_frac = np.where(doc_lens > 0, agg[3] * 3.0 / denom, 0.0)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_tokens": pa.array(doc_lens, pa.int64()),
        "top2_count": pa.array(agg[2], pa.int64()),
        "top2_frac_micros": pa.array(to_micros(top2_frac), pa.int64()),
        "dup3_count": pa.array(agg[3], pa.int64()),
        "dup3_frac_micros": pa.array(to_micros(dup3_frac), pa.int64()),
    })


def repetition_stats(ds: Dataset, text_col: str = "text",
                     id_col: str = "doc_id") -> Dataset:
    return ds.map_batches(
        lambda b: repetition_stats_batch(b, text_col, id_col),
        batch_format="pyarrow")


# ---------------- PII redaction ----------------

# Order matters: SSN before phone (an SSN's digit-dash body also
# matches the looser phone pattern). Both engines apply the same order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\d{3}-\d{2}-\d{4}", "<SSN>"),
    ("phone", r"[+(]?\d[\d\-\s()]{6,}\d", "<PHONE>"),
]


def redact_pii_batch(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """RE2 scrub of email/SSN/phone patterns (non-overlapping global
    replace, same engine family as DuckDB's regexp_replace). Returns
    per-doc redacted text + per-pattern match counts."""
    s = batch[text_col].combine_chunks()
    cols: dict[str, pa.Array] = {
        "doc_id": batch[id_col].combine_chunks().cast(pa.int64())}
    for name, pat, repl in PII_PATTERNS:
        cols[f"n_{name}"] = pc.count_substring_regex(s, pat).cast(pa.int64())
        s = pc.replace_substring_regex(s, pat, repl)
    cols["redacted"] = s
    return pa.table(cols)


def redact_pii(ds: Dataset, text_col: str = "text",
               id_col: str = "doc_id") -> Dataset:
    return ds.map_batches(lambda b: redact_pii_batch(b, text_col, id_col),
                          batch_format="pyarrow")


# ---------------- edit-distance near-dup pairs ----------------


def _peq_table(codes: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Myers Peq: (m, 256) uint64 — bit j of peq[s, c] set iff string
    s has byte c at position j. Built with ≤64 vectorized scatters."""
    m, width = codes.shape
    weights = np.uint64(1) << np.arange(width, dtype=np.uint64)
    peq = np.zeros((m, 256), dtype=np.uint64)
    rows = np.arange(m)
    for j in range(width):
        live = j < lens
        np.bitwise_or.at(peq, (rows[live], codes[live, j]), weights[j])
    return peq


def _myers_core(peq: np.ndarray, a_len: np.ndarray, ia: np.ndarray,
                b_codes: np.ndarray, b_len_all: np.ndarray,
                ib: np.ndarray) -> np.ndarray:
    """Myers 1999 bit-parallel Levenshtein for P pairs at once: pattern
    = string ia[p], text = string ib[p]. One uint64 word per pattern
    (≤64 chars); each text step is pure vectorized word ops + one Peq
    gather — no per-character work proportional to pattern length."""
    w = np.uint64
    a_len = a_len[ia]
    b_len = b_len_all[ib]
    p = len(ia)
    score = a_len.astype(np.int64).copy()
    Pv = np.full(p, ~w(0), dtype=w)
    Mv = np.zeros(p, dtype=w)
    has_a = a_len > 0
    shift = np.maximum(a_len - 1, 0).astype(np.uint64)
    bit = np.where(has_a, np.uint64(1) << shift, w(0)).astype(w)
    for i in range(b_codes.shape[1]):
        active = i < b_len
        if not active.any():
            break
        Eq = peq[ia, b_codes[ib, i]]
        Xv = Eq | Mv
        Xh = (((Eq & Pv) + Pv) ^ Pv) | Eq
        Ph = Mv | ~(Xh | Pv)
        Mh = Pv & Xh
        upd = active & has_a
        score += ((Ph & bit) != 0) & upd
        score -= ((Mh & bit) != 0) & upd
        Ph = (Ph << w(1)) | w(1)
        Mh = Mh << w(1)
        Pv = np.where(active, Mh | ~(Xv | Ph), Pv)
        Mv = np.where(active, Ph & Xv, Mv)
    return np.where(has_a, score, b_len.astype(np.int64))


def myers_levenshtein(a_codes: np.ndarray, a_len: np.ndarray,
                      b_codes: np.ndarray, b_len: np.ndarray) -> np.ndarray:
    """Levenshtein distance for P independent (a, b) pairs at once;
    pattern a must fit one machine word (≤64 chars). ``a_codes`` /
    ``b_codes``: (P, ≤64) uint8 zero-padded; lens: true lengths."""
    if a_codes.shape[1] > 64:
        raise ValueError("Myers pattern side must be ≤ 64 chars")
    idx = np.arange(len(a_len))
    return _myers_core(_peq_table(a_codes, a_len), a_len, idx,
                       b_codes, b_len, idx)


def myers_pairs(codes: np.ndarray, lens: np.ndarray, ia: np.ndarray,
                ib: np.ndarray) -> np.ndarray:
    """Levenshtein for (ia[p], ib[p]) index pairs over ONE string set —
    the all-pairs-in-a-block shape. Peq is built once per unique string
    (m scatters), not once per pair, so P pairs cost O(64) vectorized
    steps of P-sized gathers regardless of block size."""
    if codes.shape[1] > 64:
        raise ValueError("Myers pattern side must be ≤ 64 chars")
    return _myers_core(_peq_table(codes, lens), lens, ia, codes, lens, ib)


def _low_bits(n: np.ndarray) -> np.ndarray:
    """uint64 masks with bits 0..n-1 set, for n in [0, 64]."""
    full = np.uint64(0xFFFFFFFFFFFFFFFF)
    n = n.astype(np.uint64)
    small = (np.uint64(1) << (n & np.uint64(63))) - np.uint64(1)
    return np.where(n >= 64, full, small)


def jaro_winkler_pairs_kernel(codes: np.ndarray, lens: np.ndarray,
                              ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
    """Jaro-Winkler similarity for (ia[p], ib[p]) index pairs over one
    string set, vectorized ACROSS pairs (strings ≤ 64 chars → one
    uint64 matched-bitmask per pair; each of the O(width) steps is a
    P-sized numpy op). Bitwise-identical to DuckDB's
    ``jaro_winkler_similarity`` (empirically exact over random pairs):
    match window ``max(max(la,lb)//2 - 1, 0)``, transpositions
    floor-halved, prefix bonus 0.1·l·(1-j) only when j > 0.7, formula
    evaluated left-associatively in double.
    """
    if codes.shape[1] > 64:
        raise ValueError("jaro-winkler pattern side must be ≤ 64 chars")
    w = np.uint64
    width = codes.shape[1]
    p = len(ia)
    la = lens[ia]
    lb = lens[ib]
    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    peq = _peq_table(codes, lens)
    matched_b = np.zeros(p, dtype=w)
    cnt = np.zeros(p, dtype=np.int64)
    abuf = np.zeros((p, width), dtype=np.uint8)
    for i in range(width):
        active = i < la
        if not active.any():
            break
        ca = codes[ia, i]
        lo = np.maximum(i - window, 0)
        hi = np.minimum(lb, i + window + 1)
        wmask = _low_bits(hi) & ~_low_bits(lo)
        cand = peq[ib, ca] & wmask & ~matched_b
        cand[~active] = w(0)
        found = cand != 0
        first = cand & (~cand + w(1))
        matched_b |= np.where(found, first, w(0))
        idx = np.flatnonzero(found)
        abuf[idx, cnt[idx]] = ca[idx]
        cnt[idx] += 1
    m = cnt
    bbuf = np.zeros((p, width), dtype=np.uint8)
    bcnt = np.zeros(p, dtype=np.int64)
    for j in range(width):
        has = (matched_b >> w(j)) & w(1) != 0
        if not has.any():
            continue
        idx = np.flatnonzero(has)
        bbuf[idx, bcnt[idx]] = codes[ib, j][idx]
        bcnt[idx] += 1
    posmask = np.arange(width) < m[:, None]
    k = ((abuf != bbuf) & posmask).sum(axis=1)
    t = k // 2
    mf = m.astype(np.float64)
    ok = m > 0
    safe_la = np.maximum(la, 1).astype(np.float64)
    safe_lb = np.maximum(lb, 1).astype(np.float64)
    safe_m = np.maximum(m, 1).astype(np.float64)
    j = (mf / safe_la + mf / safe_lb + (mf - t) / safe_m) / 3.0
    # common prefix (≤ 4) via cumulative AND of per-position equality
    pref = np.zeros(p, dtype=np.int64)
    still = np.ones(p, dtype=bool)
    for i in range(min(4, width)):
        still &= (i < la) & (i < lb) & (codes[ia, i] == codes[ib, i])
        pref += still
    jw = np.where(j > 0.7, j + 0.1 * pref * (1.0 - j), j)
    return np.where(ok, jw, 0.0)


def _block_pair_indices(g: pd.DataFrame, max_block_rows: int,
                        neighbor_window: int) -> tuple[pd.DataFrame, np.ndarray, np.ndarray, bool]:
    """Candidate pair indices for one (lang, len-bucket) block.

    Blocks up to ``max_block_rows`` get the exact all-pairs triangle
    (the oracle semantics). Over-full blocks — the 100-TB hot-block
    case ("python", common length band, 10⁸ docs → 10¹⁶ pairs) — fall
    back to SORTED NEIGHBORHOOD: rows sorted by prefix, each row paired
    with its next ``neighbor_window`` neighbors, bounding the block at
    m·W pairs. Prefix-similar near-dups sort adjacent, so recall for
    the tight-threshold pairs these operators exist for stays high;
    the trade-off is documented at each caller. Returns the (possibly
    re-sorted) block, index arrays, and whether the exact path ran."""
    m = len(g)
    if m <= max_block_rows:
        g = g.sort_values("doc_id")
        ia, ib = np.triu_indices(m, k=1)
        return g, ia, ib, True
    g = g.sort_values(["prefix", "doc_id"], kind="mergesort")
    base = np.arange(m, dtype=np.int64)
    ia_parts, ib_parts = [], []
    for d in range(1, min(neighbor_window, m - 1) + 1):
        ia_parts.append(base[:-d])
        ib_parts.append(base[d:])
    return g, np.concatenate(ia_parts), np.concatenate(ib_parts), False


def jaro_winkler_sim_pairs(ds: Dataset, min_sim: float,
                           prefix_len: int = 64, text_col: str = "text",
                           id_col: str = "doc_id", lang_col: str = "lang",
                           len_col: str = "n_chars",
                           len_bucket: int = 32,
                           max_block_rows: int = 8192,
                           neighbor_window: int = 8) -> Dataset:
    """Near-dup pairs by Jaro-Winkler ≥ ``min_sim`` over
    ``prefix_len``-char prefixes, blocked by (lang, n_chars //
    len_bucket) exactly like edit_distance_pairs — one blocking
    shuffle, all pairs per block in one vectorized kernel pass.
    Similarity ships as ``jw_micros`` (bitwise vs DuckDB, so the
    threshold cut is engine-identical). ASCII-equivalent inputs only:
    the kernel compares bytes while SQL substr counts characters.

    Blocks larger than ``max_block_rows`` switch from the exact
    all-pairs triangle to a sorted-neighborhood scan (each row vs its
    ``neighbor_window`` prefix-sorted successors, m·W pairs) — high
    recall for the ≥0.9-similarity pairs this gate targets (such pairs
    share long prefixes and sort adjacent), bounded cost on a 10⁸-doc
    hot block. The default cap never triggers at conformance scales,
    so the DuckDB oracle sees the exact path."""
    if prefix_len > 64:
        raise ValueError("prefix_len > 64 breaks the bitmask kernel")

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch[id_col].combine_chunks().cast(pa.int64()),
            "blk_lang": batch[lang_col].combine_chunks(),
            "blk_len": pc.divide(batch[len_col], len_bucket).cast(pa.int64()),
            "prefix": pc.utf8_slice_codeunits(
                batch[text_col].combine_chunks(), 0, prefix_len),
        })

    empty = {"doc_id_a": pd.Series(dtype=np.int64),
             "doc_id_b": pd.Series(dtype=np.int64),
             "jw_micros": pd.Series(dtype=np.int64)}

    def pairs_in_block(g: pd.DataFrame) -> pd.DataFrame:
        m = len(g)
        if m < 2:
            return pd.DataFrame(empty)
        g, ia, ib, exact = _block_pair_indices(g, max_block_rows, neighbor_window)
        codes, lens = _encode_ascii(g["prefix"], prefix_len)
        ids = g["doc_id"].to_numpy()
        jw = jaro_winkler_pairs_kernel(codes, lens, ia, ib)
        keep = jw >= min_sim
        a, b = ids[ia[keep]], ids[ib[keep]]
        if not exact:  # neighborhood pairs aren't id-ordered
            a, b = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"doc_id_a": a, "doc_id_b": b,
                             "jw_micros": to_micros(jw[keep])})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby(["blk_lang", "blk_len"])
            .map_groups(pairs_in_block, batch_format="pandas"))


def _encode_ascii(strs: pd.Series, width: int) -> tuple[np.ndarray, np.ndarray]:
    """Strings → (codes (m, width) uint8 zero-padded, lengths). Uses a
    fixed-width numpy bytes view — no per-char Python loop."""
    b = strs.str.slice(0, width).str.encode("utf-8", errors="replace")
    lens = b.str.len().to_numpy().astype(np.int64)
    buf = np.zeros((len(b), width), dtype=np.uint8)
    for i, s in enumerate(b):       # per-string memcpy, not per-char
        buf[i, :len(s)] = np.frombuffer(s, dtype=np.uint8)
    return buf, lens


def edit_distance_pairs(ds: Dataset, max_dist: int, prefix_len: int = 64,
                        text_col: str = "text", id_col: str = "doc_id",
                        lang_col: str = "lang", len_col: str = "n_chars",
                        len_bucket: int = 32,
                        max_block_rows: int = 8192,
                        neighbor_window: int = 8) -> Dataset:
    """Near-duplicate pairs by Levenshtein over ``prefix_len``-char
    prefixes, blocked by (lang, n_chars // len_bucket) — the blocking
    IS the operator contract (edit distance is only meaningful between
    similar-length same-language docs, and it bounds each block's
    all-pairs cost). One shuffle (the blocking groupby); within each
    block all candidate pairs run through one vectorized Myers pass.

    Blocks larger than ``max_block_rows`` fall back to a
    sorted-neighborhood scan (see ``_block_pair_indices``): m·W pairs
    instead of m²/2, high recall for small-``max_dist`` pairs (a
    ≤max_dist-edit prefix pair diverges late and sorts adjacent). The
    default cap never triggers at conformance scales, so the DuckDB
    oracle sees the exact path."""
    if prefix_len > 64:
        raise ValueError("prefix_len > 64 breaks the single-word Myers path")

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch[id_col].combine_chunks().cast(pa.int64()),
            "blk_lang": batch[lang_col].combine_chunks(),
            "blk_len": pc.divide(batch[len_col], len_bucket).cast(pa.int64()),
            "prefix": pc.utf8_slice_codeunits(
                batch[text_col].combine_chunks(), 0, prefix_len),
        })

    empty = {"doc_id_a": pd.Series(dtype=np.int64),
             "doc_id_b": pd.Series(dtype=np.int64),
             "lev": pd.Series(dtype=np.int64)}

    def pairs_in_block(g: pd.DataFrame) -> pd.DataFrame:
        m = len(g)
        if m < 2:
            return pd.DataFrame(empty)
        g, ia, ib, exact = _block_pair_indices(g, max_block_rows, neighbor_window)
        codes, lens = _encode_ascii(g["prefix"], prefix_len)
        ids = g["doc_id"].to_numpy()
        lev = myers_pairs(codes, lens, ia, ib)
        keep = lev <= max_dist
        a, b = ids[ia[keep]], ids[ib[keep]]
        if not exact:  # neighborhood pairs aren't id-ordered
            a, b = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"doc_id_a": a, "doc_id_b": b,
                             "lev": lev[keep].astype(np.int64)})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby(["blk_lang", "blk_len"])
            .map_groups(pairs_in_block, batch_format="pandas"))
