"""Mergeable sketches: HyperLogLog approximate distinct counting and
Misra-Gries heavy hitters (with an exact-rescoring wrapper).

The canonical pre-aggregation pattern for wide counts at scale: each
``map_batches`` call emits ONE serialized sketch row per batch (registers
are an order-insensitive max — perfectly mergeable), the reduce merges a
handful of tiny rows, and no (value → count) shuffle ever happens.
Standard public HLL algorithm (Flajolet et al. 2007) with linear-counting
small-range correction; register maximum/merge fully NumPy-vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


class HLL:
    """HyperLogLog with 2^p registers (p=12 → ~1.6% standard error)."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    def add_hashes(self, h: np.ndarray) -> "HLL":
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | (np.uint64(1) << np.uint64(self.p - 1))
        # rank = position of first set bit in the remaining 64-p bits + 1
        rank = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        found = np.zeros(len(h), dtype=bool)
        for r in range(1, 64 - self.p + 2):
            hit = (~found) & ((cur & mask) != 0)
            rank[hit] = r
            found |= hit
            if found.all():
                break
            cur = cur << np.uint64(1)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        """HLL estimate with the harmonic denominator as an EXACT
        integer: Σ 2^(−M_j) = (Σ 2^(53−M_j)) / 2^53 with M_j ≤ 53
        guaranteed by the sentinel bit in add_hashes, so S is an exact
        (Python) integer and the whole estimate is ONE float divide on
        identical inputs in both engines — no 4096-term float
        summation whose order could differ. This is what makes
        approx_vocab SQL-oracleable (DuckDB mirrors S as a HUGEINT
        sum of shifts); the linear-counting branch is m·ln(m/V) on
        identical integers (np.log == DuckDB ln bitwise, NOTES rule 9)."""
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        s_exact = sum(1 << (53 - int(r)) for r in self.registers)
        e = alpha * m * m * 9007199254740992.0 / float(s_exact)
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HLL":
        return cls(p, np.frombuffer(b, dtype=np.uint8).copy())


def _hash_column(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    if pa.types.is_integer(arr.type):
        return pd.util.hash_array(np.asarray(arr).astype(np.int64))
    return pd.util.hash_array(np.asarray(arr.to_pylist(), dtype=object))


def approx_distinct(ds: Dataset, col: str, p: int = 12) -> float:
    """Approximate count-distinct of ``col``: one HLL row per batch, tiny
    driver merge. Error ~1.04/sqrt(2^p) (~1.6% at p=12)."""
    def sketch(batch: pa.Table) -> pa.Table:
        h = HLL(p).add_hashes(_hash_column(batch, col))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow").take_all()
    acc = HLL(p)
    for row in parts:
        acc.merge(HLL.from_bytes(row["sketch"], p))
    return acc.estimate()


class CountMin:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): a d×w int64
    counter matrix; point estimate = min over the d rows. Estimates
    only ever OVERCOUNT, by ≤ ⌈e/w⌉·N with probability ≥ 1 − e^{−d}
    (N = total added weight). Counters are plain sums → element-wise
    add merges exactly, so it follows the same map-side shape as HLL:
    one serialized sketch row per batch, tiny driver merge, no
    (value → count) shuffle. Row hashes derive from one base 64-bit
    hash via fixed odd multipliers (seeded, deterministic)."""

    def __init__(self, w: int = 2048, d: int = 4,
                 table: np.ndarray | None = None):
        if w & (w - 1):
            raise ValueError("w must be a power of two")
        self.w, self.d = w, d
        rng = np.random.default_rng(13)
        self._mul = (rng.integers(1, 2**63, size=d, dtype=np.uint64)
                     * np.uint64(2) + np.uint64(1))  # odd multipliers
        self._add = rng.integers(0, 2**63, size=d, dtype=np.uint64)
        self._shift = np.uint64(64 - int(np.log2(w)))
        self.table = (table if table is not None
                      else np.zeros((d, w), dtype=np.int64))

    def _rows(self, h: np.ndarray) -> np.ndarray:
        h = h.astype(np.uint64)
        return np.stack([((h * self._mul[i] + self._add[i])
                          >> self._shift).astype(np.int64)
                         for i in range(self.d)])

    def add_hashes(self, h: np.ndarray,
                   weights: np.ndarray | None = None) -> "CountMin":
        w = (weights.astype(np.int64) if weights is not None
             else np.ones(len(h), dtype=np.int64))
        for i, idx in enumerate(self._rows(h)):
            np.add.at(self.table[i], idx, w)  # int64 scatter-add
        return self

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        idx = self._rows(h)
        return np.min(np.stack([self.table[i, idx[i]]
                                for i in range(self.d)]), axis=0)

    def merge(self, other: "CountMin") -> "CountMin":
        self.table += other.table
        return self

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, w: int = 2048, d: int = 4) -> "CountMin":
        return cls(w, d, np.frombuffer(b, dtype=np.int64)
                   .reshape(d, w).copy())


def cms_token_counts(ds: Dataset, text_col: str = "text",
                     w: int = 2048, d: int = 4) -> CountMin:
    """Distributed Count-Min over the kept-token stream: each batch
    tokenizes map-side and emits ONE sketch row weighted by per-term
    tf; the driver merges d·w counters per batch. Probe frequencies
    afterwards with ``estimate_hashes(md5/pd hashes of terms)`` — the
    streaming frequency-oracle for corpora whose exact term counts
    would be a full shuffle."""
    from ..text import term_frequencies

    def sketch(batch: pa.Table) -> pa.Table:
        tf = term_frequencies(batch[text_col].combine_chunks())
        h = pd.util.hash_array(
            np.asarray(tf.vocab.to_pylist(), dtype=object))
        cm = CountMin(w, d).add_hashes(
            h[tf.codes], np.asarray(tf.tf, dtype=np.int64))
        return pa.table({"sketch": pa.array([cm.to_bytes()], pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow").take_all()
    acc = CountMin(w, d)
    for row in parts:
        acc.merge(CountMin.from_bytes(row["sketch"], w, d))
    return acc


def cms_estimate_terms(cm: CountMin, terms: list[str]) -> np.ndarray:
    h = pd.util.hash_array(np.asarray(terms, dtype=object))
    return cm.estimate_hashes(h)


def mg_compress(vals: np.ndarray, cnts: np.ndarray,
                k: int) -> tuple[np.ndarray, np.ndarray]:
    """Misra-Gries compression of exact (value, count) pairs to at most
    ``k`` counters: subtract the (k+1)-th largest count from every
    counter and drop the non-positive ones. Each surviving counter
    undercounts its true total by at most total_weight/(k+1), and any
    dropped value's true total is at most that same bound — the
    standard mergeable-summary guarantee (Misra & Gries 1982; Agarwal
    et al. 2013)."""
    if len(vals) <= k:
        return vals, cnts
    kth = np.partition(cnts, len(cnts) - k - 1)[len(cnts) - k - 1]
    keep = cnts > kth
    return vals[keep], cnts[keep] - kth


def heavy_hitters_exact(ds: Dataset, col: str,
                        weight_col: str | None = None,
                        threshold_frac: float = 0.001,
                        k: int = 4000) -> Dataset:
    """All values whose total weight is ≥ floor(n * threshold_frac) + 1,
    with EXACT counts — certified complete, no full (value → count)
    shuffle. Two streaming passes:

    1. Candidates: each batch emits a ≤``k``-row Misra-Gries summary
       (vectorized np.unique + compress); summaries merge by a
       groupby-sum whose shuffle carries ≤ k rows per batch. Summed MG
       counts undercount any value by at most n/(k+1), so every truly
       heavy value survives the candidate cut at
       threshold - n//(k+1). Requires n//(k+1) < threshold (raise
       ``k`` for smaller thresholds — checked at runtime).
    2. Exact rescoring: the (small) candidate set broadcasts via
       ray.put; one more pass counts ONLY candidates exactly, then the
       final filter applies the true threshold. Output (col, cf) is
       deterministic and equal to the brute-force GROUP BY ... HAVING.

    The candidates + exact re-rank shape mirrors the engine's T2 query
    pattern (reference results.py top-k re-ranking) at corpus scale.
    """
    import ray
    from ray.data.aggregate import Sum

    def summarize(batch: pa.Table) -> pa.Table:
        arr = batch[col].combine_chunks()
        vals = np.asarray(arr.to_pylist(), dtype=object) \
            if not pa.types.is_integer(arr.type) else np.asarray(arr)
        if weight_col is not None:
            w = np.asarray(batch[weight_col].combine_chunks()).astype(np.int64)
            uniq, inv = np.unique(vals, return_inverse=True)
            cnts = np.bincount(inv, weights=w).astype(np.int64)
        else:
            uniq, cnts = np.unique(vals, return_counts=True)
            cnts = cnts.astype(np.int64)
        n_batch = int(cnts.sum())
        carrier = uniq[:1]  # keeps n alive if compression empties
        uniq, cnts = mg_compress(uniq, cnts, k)
        if n_batch and not len(uniq):
            uniq = carrier
            cnts = np.zeros(1, dtype=np.int64)
        n_col = np.zeros(len(uniq), dtype=np.int64)
        if len(n_col):
            n_col[0] = n_batch
        return pa.table({col: pa.array(uniq.tolist()),
                         "cnt": pa.array(cnts, pa.int64()),
                         "n": pa.array(n_col, pa.int64())})

    merged = (ds.map_batches(summarize, batch_format="pyarrow")
              .groupby(col)
              .aggregate(Sum("cnt", alias_name="cnt"),
                         Sum("n", alias_name="n"))
              .materialize())
    n_total = int(merged.sum("n") or 0)
    threshold = int(n_total * threshold_frac) + 1
    slack = n_total // (k + 1)
    if slack >= threshold:
        raise ValueError(
            f"k={k} too small for threshold {threshold} at n={n_total}: "
            f"MG slack {slack} would lose heavy values; raise k above "
            f"{int(1 / threshold_frac) + 1}")
    cand = merged.map_batches(
        lambda t: t.filter(pc.greater_equal(t["cnt"],
                                            threshold - slack)),
        batch_format="pyarrow").to_pandas()
    cand_ref = ray.put(set(cand[col].tolist()))

    def exact(batch: pa.Table) -> pa.Table:
        cset = ray.get(cand_ref)
        arr = batch[col].combine_chunks()
        vals = np.asarray(arr.to_pylist(), dtype=object) \
            if not pa.types.is_integer(arr.type) else np.asarray(arr)
        if weight_col is not None:
            w = np.asarray(batch[weight_col].combine_chunks()).astype(np.int64)
        else:
            w = np.ones(len(vals), dtype=np.int64)
        mask = pd.Series(vals).isin(cset).to_numpy() \
            if len(vals) else np.zeros(0, dtype=bool)
        uniq, inv = np.unique(vals[mask], return_inverse=True)
        cf = np.bincount(inv, weights=w[mask]).astype(np.int64) \
            if len(uniq) else np.zeros(0, dtype=np.int64)
        return pa.table({col: pa.array(uniq.tolist()),
                         "cf": pa.array(cf, pa.int64())})

    return (ds.map_batches(exact, batch_format="pyarrow")
            .groupby(col).aggregate(Sum("cf", alias_name="cf"))
            .map_batches(
                lambda t: t.filter(pc.greater_equal(t["cf"], threshold)),
                batch_format="pyarrow"))


def approx_distinct_tokens(ds: Dataset, text_col: str = "text",
                           p: int = 12) -> float:
    """Approximate distinct-term count over tokenized text (the vocabulary
    size of a corpus without a term shuffle)."""
    from ..text import tokenize_array

    def sketch(batch: pa.Table) -> pa.Table:
        from .dedup import md5_low64_arrow

        flat, _, _ = tokenize_array(batch[text_col].combine_chunks())
        h = HLL(p)
        if len(flat):
            # md5-low64 (== DuckDB md5_number_lower) instead of the
            # pandas hash: same uniformity, and it makes every HLL
            # register — and with the exact-integer estimate, the
            # whole approx_vocab entry — SQL-reproducible
            h.add_hashes(md5_low64_arrow(flat))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow").take_all()
    acc = HLL(p)
    for row in parts:
        acc.merge(HLL.from_bytes(row["sketch"], p))
    return acc.estimate()


# ---------------- KMV (k-minimum values) distinct counting ----------------
#
# The DETERMINISTIC cardinality sketch (Bar-Yossef et al. 2002 / the
# "bottom-k" estimator): keep the k smallest distinct md5-low64 hashes;
# estimate N̂ = (k-1)·2⁶⁴ / h_(k). Unlike HLL this is exactly
# reproducible in SQL — the hash is DuckDB's md5_number_lower bit for
# bit (functions/dedup.md5_low64) and the estimator is one IEEE divide
# in a pinned expression order — so the driver entry is fully
# hash-oracled, where approx_vocab (HLL) is rows-only. Mergeable:
# union the kept sets, re-take the k smallest — order-insensitive, so
# per-batch partials shuffle k·8 bytes each and no value ever moves.

TWO64 = 18446744073709551616.0  # 2^64, exactly representable


def kmv_k_smallest(h: np.ndarray, k: int) -> np.ndarray:
    """k smallest DISTINCT hashes, ascending (np.unique sorts)."""
    return np.unique(h.astype(np.uint64))[:k]


def kmv_estimate(kept: np.ndarray, k: int) -> float:
    """Exact count when the universe was smaller than k, else the
    bottom-k estimator. Expression order is the cross-engine contract:
    (k-1)·2⁶⁴ first (both factors exact in float64), ONE divide by the
    round-to-nearest float of h_(k) — mirrored literally in the SQL
    oracle (pipelines/sql.py kmv CTE)."""
    if len(kept) < k:
        return float(len(kept))
    return (k - 1.0) * TWO64 / float(kept[k - 1])


def kmv_distinct(ds: Dataset, string_cols: list[str], k: int = 64
                 ) -> dict[str, tuple[int, float]]:
    """Distinct-count estimates for several derived string columns in
    ONE pass: each batch emits a single row holding every column's
    k-smallest-distinct partial; the driver merges a handful of tiny
    rows. Returns {col: (kept_count, estimate)}."""
    from .dedup import md5_low64_arrow

    def sketch(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in string_cols:
            h = md5_low64_arrow(batch[c].combine_chunks())
            cols[c] = pa.array([kmv_k_smallest(h, k)],
                               pa.list_(pa.uint64()))
        return pa.table(cols)

    rows = ds.map_batches(sketch, batch_format="pyarrow").take_all()
    out = {}
    for c in string_cols:
        merged = kmv_k_smallest(np.concatenate(
            [np.asarray(r[c], dtype=np.uint64) for r in rows])
            if rows else np.array([], np.uint64), k)
        out[c] = (len(merged), kmv_estimate(merged, k))
    return out


def kmv_distinct_grouped(ds: Dataset, group_col: str, value_col: str,
                         k: int = 64) -> dict[str, tuple[int, float]]:
    """Per-GROUP bottom-k distinct sketches in one pass (the ES
    cardinality agg under a terms agg): each batch emits one
    (group, k-smallest-distinct hash partial) row per group present —
    ≤ k·8 bytes per group per batch, values never shuffle; the driver
    merges O(batches · |groups|) tiny list rows. Same estimator and
    expression-order contract as kmv_distinct, so the grouped entry is
    hash-oracled too. Returns {group: (kept, estimate)}."""
    from .dedup import md5_low64_arrow

    def sketch(batch: pa.Table) -> pa.Table:
        gcol = batch[group_col].combine_chunks()
        g = np.asarray(gcol, dtype=object)
        h = md5_low64_arrow(batch[value_col].combine_chunks())
        # null groups are dropped (ES missing-bucket semantics would
        # need an explicit missing= value; None breaks object sort)
        valid = np.asarray(gcol.is_valid())
        g, h = g[valid], h[valid]
        out_g, out_l = [], []
        for grp in np.unique(g):  # groups per batch — bounded
            out_g.append(str(grp))
            out_l.append(kmv_k_smallest(h[g == grp], k))
        return pa.table({
            "grp": pa.array(out_g, pa.string()),
            "part": pa.array(out_l, pa.list_(pa.uint64())),
        })

    t = ds.map_batches(sketch, batch_format="pyarrow").to_pandas()
    out: dict[str, tuple[int, float]] = {}
    for grp, sub in t.groupby("grp"):
        merged = kmv_k_smallest(
            np.concatenate([np.asarray(x, dtype=np.uint64)
                            for x in sub["part"]]), k)
        out[str(grp)] = (len(merged), kmv_estimate(merged, k))
    return out
