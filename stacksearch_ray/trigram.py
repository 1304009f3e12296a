"""Trigram content index: substring and regex search over RAW text.

Token/phrase search (query.py) can only match at analyzer-token
granularity — it cannot serve ``WHERE contains(text, 'rt ba')`` or a
content regex. The classic scale answer (Google Code Search; the same
design GitHub's code search builds on — public via R. Cox, "Regular
Expression Matching with a Trigram Index", 2012) is an inverted index
over character TRIGRAMS: a pattern match must contain every trigram of
every literal it requires, so the AND of a few rare trigram posting
lists prunes the corpus to a candidate set that one exact verification
pass confirms. False positives are filtered by verify; false negatives
are impossible (trigram containment is a necessary condition), so the
result is EXACT.

Reuse, not reinvention: a trigram is just a term. Each doc's distinct
byte-level trigrams are hex-encoded (6 lowercase hex chars — the
analyzer keeps them verbatim: alnum, no stopword collisions, pinned by
test) and space-joined into a derived ``tri_text`` column; the standard
``build_index`` over that column yields sharded, bucketed, file-pruned
trigram postings with a df-bearing term_dict for free — the whole
segment/pruning/lifecycle stack applies unchanged. The ORIGINAL text
rides along as a docstore meta column, so candidate verification is a
doc-id-pushdown read of the index's own docs table.

Scale shape (SCALE.md "Trigram content index"): the trigram
vocabulary is bounded (≤2^24)
but Zipf-hot ("e t" class trigrams appear in nearly every doc). The
searcher therefore probes only the ``max_probe`` RAREST trigrams of
the pattern (df-ordered via one term_dict filter read) and intersects
smallest-first with early exit — hot posting lists are never decoded.
Patterns too short (<3 bytes) or regexes with no required literal fall
back to a streaming Ray full-scan verify (map_batches over the docs
table), which is the honest cost of an unprunable query.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from .build import build_index
from .query import QueryEngine

TRIGRAM_N = 3
# probe only the k rarest trigrams of a pattern: pruning saturates fast
# (each extra AND can only shrink candidates) while every extra probe
# costs a posting-list decode of a possibly-hot trigram.
DEFAULT_MAX_PROBE = 8

_HEX_LUT = np.array([format(i, "02x") for i in range(256)], dtype="U2")


def _doc_trigram_hexes(data: bytes) -> list[str]:
    """Distinct byte-trigrams of one document, hex-encoded (sorted —
    order is irrelevant to set-membership postings, and sorted output
    keeps the derived text deterministic)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if len(arr) < TRIGRAM_N:
        return []
    codes = (arr[:-2].astype(np.int64) << 16) | (arr[1:-1].astype(np.int64) << 8) \
        | arr[2:].astype(np.int64)
    uniq = np.unique(codes)
    h = _HEX_LUT
    return [h[c >> 16] + h[(c >> 8) & 0xFF] + h[c & 0xFF] for c in uniq]


def pattern_trigram_hexes(literal: str | bytes) -> list[str]:
    """Every trigram a match of this literal must contain (deduped)."""
    b = literal.encode("utf-8") if isinstance(literal, str) else literal
    return _doc_trigram_hexes(b)


def tri_text_batch(batch: pa.Table, content_col: str, id_col: str) -> pa.Table:
    """Derive (id, tri_text, <content_col>) for the index build: tri_text
    is the space-joined distinct-trigram hex encoding; the raw content
    column rides along into the docstore for verification."""
    texts = batch[content_col].combine_chunks()
    tri = [" ".join(_doc_trigram_hexes(
        (texts[i].as_py() or "").encode("utf-8")))
        for i in range(len(texts))]
    return pa.table({
        id_col: batch[id_col].combine_chunks(),
        "tri_text": pa.array(tri, pa.string()),
        content_col: texts,
    })


def build_trigram_index(source, index_dir: str, content_col: str = "text",
                        id_col: str = "doc_id", **cfg_overrides) -> dict:
    """Build the trigram index: derive tri_text in map_batches (one
    streaming pass, fused into the standard build's single source scan)
    then run the ordinary index build over it. Docs shorter than 3
    bytes have no trigrams and are dropped by the empty-doc filter —
    correct, since they cannot contain any ≥3-byte pattern (shorter
    patterns take the full-scan fallback, which reads the SOURCE docs
    table, not the index)."""
    if isinstance(source, rd.Dataset):
        ds = source.select_columns([id_col, content_col])
    else:
        ds = rd.read_parquet(source, columns=[id_col, content_col])
    derived = ds.map_batches(
        lambda b: tri_text_batch(b, content_col, id_col),
        batch_format="pyarrow")
    cfg_overrides.setdefault("store_positions", False)
    return build_index(derived, index_dir, content_col="tri_text",
                       id_col=id_col, meta_cols=(content_col,),
                       **cfg_overrides)


def append_to_trigram_index(source, index_dir: str,
                            content_col: str = "text",
                            id_col: str = "doc_id",
                            **cfg_overrides) -> dict:
    """Append documents to an existing trigram index: same derive step,
    then the journaled staged append (append.py — crash-safe, disjoint
    id check). The searcher's candidate sets over the appended index are
    identical to a from-scratch build's (term_doc_ids is stats-free;
    tested), so substring/regex results are exactly equal."""
    from .append import append_to_index

    if isinstance(source, rd.Dataset):
        ds = source.select_columns([id_col, content_col])
    else:
        ds = rd.read_parquet(source, columns=[id_col, content_col])
    derived = ds.map_batches(
        lambda b: tri_text_batch(b, content_col, id_col),
        batch_format="pyarrow")
    cfg_overrides.setdefault("meta_cols", (content_col,))
    return append_to_index(derived, index_dir, **cfg_overrides)


# ---------------- regex → required literals ----------------

_QUANTS = set("*+?")


def required_literals(pattern: str) -> list[str]:
    """Conservative required-literal extraction from a regex: literal
    runs in the TOP-LEVEL concatenation that every match must contain.
    Any construct that could make characters optional or alternative —
    groups, classes, alternation, quantifiers, ``.``, anchors, escapes
    other than escaped punctuation — ends the current run and
    contributes nothing. A top-level ``|`` means NO literal is required
    at all (either branch may match) → []. Soundness is the only
    contract: we may return fewer literals than a smarter parser (cost:
    weaker pruning), never a literal that some match lacks."""
    runs: list[str] = []
    cur: list[str] = []
    i, n = 0, len(pattern)
    depth = 0

    def flush():
        if cur:
            runs.append("".join(cur))
            cur.clear()

    while i < n:
        c = pattern[i]
        if c == "|" and depth == 0:
            return []  # top-level alternation: nothing is required
        if c == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if not nxt.isalnum():  # escaped punctuation = literal char
                if i + 2 < n and pattern[i + 2] in _QUANTS:
                    flush()
                    i += 3
                    continue
                cur.append(nxt)
                i += 2
                continue
            flush()  # \d, \w, \b... — not a fixed char
            i += 2
            continue
        if c == "(":
            depth += 1
            flush()
            i += 1
            continue
        if c == ")":
            depth = max(0, depth - 1)
            flush()
            i += 1
            continue
        if c == "[":
            flush()
            j = i + 1
            if j < n and pattern[j] == "^":
                j += 1
            if j < n and pattern[j] == "]":
                j += 1
            while j < n and pattern[j] != "]":
                j += 2 if pattern[j] == "\\" else 1
            i = j + 1
            continue
        if c == "{":  # {m,n} quantifier on the previous atom
            if cur:
                cur.pop()
            flush()
            j = i
            while j < n and pattern[j] != "}":
                j += 1
            i = j + 1
            continue
        if c in _QUANTS:
            if cur:
                cur.pop()  # previous char may repeat or vanish
            flush()
            i += 1
            continue
        if c in ".^$" or depth > 0:
            # wildcard/anchor, or inside a group (group may sit under a
            # later quantifier we haven't seen — treat as optional)
            flush()
            i += 1
            continue
        if i + 1 < n and pattern[i + 1] in _QUANTS:
            flush()  # this char is quantified — not required once
            i += 1
            continue
        cur.append(c)
        i += 1
    flush()
    return [r for r in runs if len(r.encode("utf-8")) >= TRIGRAM_N]


class TrigramSearcher:
    """Two-stage exact content search over a trigram index: candidate
    generation by rarest-trigram posting intersection, then verification
    against the original text stored in the index's docstore.

    ``last_plan`` exposes the decision for observability/tests:
    {"mode": "pruned"|"scan", "n_probed": int, "n_candidates": int}.
    """

    def __init__(self, index_dir: str, content_col: str = "text",
                 max_probe: int = DEFAULT_MAX_PROBE):
        self.eng = QueryEngine(index_dir)
        self.index_dir = index_dir
        self.content_col = content_col
        self.max_probe = max_probe
        self.last_plan: dict = {}

    # ---- candidate generation ----

    def _trigram_dfs(self, hexes: list[str]) -> dict[str, int]:
        t = pq.read_table(os.path.join(self.index_dir, "term_dict"),
                          columns=["term", "df"],
                          filters=[("term", "in", hexes)])
        return dict(zip(t["term"].to_pylist(),
                        (int(x) for x in t["df"].to_pylist())))

    def _candidates_for(self, literals: list[str]) -> np.ndarray | None:
        """Sorted candidate doc ids containing every trigram of every
        literal, or None when no literal yields a trigram (→ caller
        must full-scan). Probes the ``max_probe`` rarest trigrams,
        smallest posting list first, early exit on empty."""
        hexes = sorted({h for lit in literals
                        for h in pattern_trigram_hexes(lit)})
        if not hexes:
            return None
        dfs = self._trigram_dfs(hexes)
        # a trigram absent from the term_dict ⇒ no doc contains it
        if any(h not in dfs for h in hexes):
            self.last_plan = {"mode": "pruned", "n_probed": 0,
                              "n_candidates": 0}
            return np.empty(0, np.int64)
        probe = sorted(hexes, key=lambda h: (dfs[h], h))[: self.max_probe]
        ids: np.ndarray | None = None
        probed = 0
        for h in probe:
            s = self.eng.term_doc_ids(h)
            probed += 1
            ids = s if ids is None else np.intersect1d(
                ids, s, assume_unique=True)
            if len(ids) == 0:
                break
        self.last_plan = {"mode": "pruned", "n_probed": probed,
                          "n_candidates": int(len(ids))}
        return ids

    # ---- verification ----

    def _fetch_texts(self, ids: np.ndarray) -> pa.Table:
        """(doc_id, text) for the candidate set: doc-id predicate
        pushdown over the index's docs table (row-group pruned — docs
        part-files are written in doc_id order). Chunked so the filter
        expression stays bounded for large candidate sets."""
        if len(ids) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             self.content_col: pa.array([], pa.string())})
        docs_dir = os.path.join(self.index_dir, "docs")
        parts = []
        for lo in range(0, len(ids), 65536):
            chunk = [int(x) for x in ids[lo:lo + 65536]]
            parts.append(pq.read_table(
                docs_dir, columns=["doc_id", self.content_col],
                filters=[("doc_id", "in", chunk)]))
        t = pa.concat_tables(parts)
        return t.sort_by("doc_id")

    def _scan_source(self) -> "rd.Dataset":
        return rd.read_parquet(os.path.join(self.index_dir, "docs"),
                               columns=["doc_id", self.content_col])

    # ---- public API ----

    def search_substring(self, pattern: str) -> pa.Table:
        """All docs whose raw content contains ``pattern`` (exact, byte
        semantics) with the non-overlapping occurrence count.
        Returns (doc_id asc, n_occurrences)."""
        if len(pattern.encode("utf-8")) >= TRIGRAM_N:
            cands = self._candidates_for([pattern])
            t = self._fetch_texts(cands)
            n = pc.count_substring(t[self.content_col], pattern)
            keep = pc.greater(n, 0)
            return pa.table({
                "doc_id": t["doc_id"].filter(keep),
                "n_occurrences": pc.cast(n.filter(keep), pa.int64()),
            })
        # sub-trigram pattern: streaming full-scan verify (map-side
        # filter+count; only matches cross the shuffle-free collect)
        self.last_plan = {"mode": "scan", "n_probed": 0,
                          "n_candidates": -1}

        def verify(b: pa.Table) -> pa.Table:
            n = pc.count_substring(b[self.content_col], pattern)
            keep = pc.greater(n, 0)
            return pa.table({
                "doc_id": b["doc_id"].filter(keep),
                "n_occurrences": pc.cast(n.filter(keep), pa.int64()),
            })

        out = (self._scan_source()
               .map_batches(verify, batch_format="pyarrow").to_pandas())
        if len(out) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_occurrences": pa.array([], pa.int64())})
        out = out.sort_values("doc_id")
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(np.int64)),
            "n_occurrences": pa.array(
                out["n_occurrences"].to_numpy(np.int64)),
        })

    def search_wildcard(self, pattern: str) -> pa.Table:
        """Glob search over raw content: ``*`` matches any (possibly
        empty) character run, every other character is literal —
        ``'sort*dup'`` finds docs where 'dup' occurs after 'sort'.
        Served by regex translation (pieces re.escape'd, joined with
        ``[\\s\\S]*``), so candidate pruning sees every ≥3-byte literal
        piece and verification is exact. n_matches counts the greedy
        regex's non-overlapping matches (≥1 iff the glob matches)."""
        pieces = pattern.split("*")
        return self.search_regex(
            "[\\s\\S]*".join(re.escape(p) for p in pieces))

    def search_regex(self, pattern: str) -> pa.Table:
        """All docs whose raw content matches ``pattern`` (Python ``re``
        semantics) with the non-overlapping match count. Candidates come
        from the AND of every required literal's trigrams; regexes with
        no ≥3-byte required literal full-scan with a vectorized
        pre-filter (match_substring_regex) so the Python counting loop
        only ever touches MATCHING rows."""
        rx = re.compile(pattern)
        lits = required_literals(pattern)
        if lits:
            cands = self._candidates_for(lits)
            t = self._fetch_texts(cands)
            ids_out, n_out = [], []
            ids = t["doc_id"].to_pylist()
            for i, s in enumerate(t[self.content_col].to_pylist()):
                k = len(rx.findall(s or ""))
                if k:
                    ids_out.append(ids[i])
                    n_out.append(k)
            return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                             "n_matches": pa.array(n_out, pa.int64())})
        self.last_plan = {"mode": "scan", "n_probed": 0,
                          "n_candidates": -1}

        def verify(b: pa.Table) -> pa.Table:
            try:  # RE2 pre-filter; Python-only constructs fall through
                sub = b.filter(
                    pc.match_substring_regex(b[self.content_col], pattern))
            except pa.ArrowInvalid:
                sub = b
            n = [len(rx.findall(s or ""))
                 for s in sub[self.content_col].to_pylist()]
            keep = pa.array([k > 0 for k in n], pa.bool_())
            return pa.table({
                "doc_id": sub["doc_id"].filter(keep),
                "n_matches": pa.array(
                    [k for k in n if k > 0], pa.int64()),
            })

        out = (self._scan_source()
               .map_batches(verify, batch_format="pyarrow").to_pandas())
        if len(out) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_matches": pa.array([], pa.int64())})
        out = out.sort_values("doc_id")
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(np.int64)),
            "n_matches": pa.array(out["n_matches"].to_numpy(np.int64)),
        })


class ShardedTrigramSearcher(TrigramSearcher):
    """Distributed candidate generation: the trigram AND is exactly a
    boolean-DSL conjunction, so it rides ShardedQueryEngine's fan-out —
    each worker intersects its shard subset's (smaller) posting lists
    locally and the union of disjoint shard results is the global
    candidate set. df-ordering still picks the rarest trigrams from the
    shared term_dict; verification stays driver-side over the pruned
    candidate fetch (worker-local at cluster scale — each shard's
    docstore slice holds its own candidates' text)."""

    def __init__(self, index_dir: str, content_col: str = "text",
                 max_probe: int = DEFAULT_MAX_PROBE, num_workers: int = 4):
        super().__init__(index_dir, content_col, max_probe)
        from .query import ShardedQueryEngine

        self.sharded = ShardedQueryEngine(index_dir,
                                          num_workers=num_workers)

    def _candidates_for(self, literals: list[str]) -> np.ndarray | None:
        hexes = sorted({h for lit in literals
                        for h in pattern_trigram_hexes(lit)})
        if not hexes:
            return None
        dfs = self._trigram_dfs(hexes)
        if any(h not in dfs for h in hexes):
            self.last_plan = {"mode": "pruned", "n_probed": 0,
                              "n_candidates": 0}
            return np.empty(0, np.int64)
        probe = sorted(hexes, key=lambda h: (dfs[h], h))[: self.max_probe]
        ids = self.sharded.search_boolean_dsl(" AND ".join(probe))
        self.last_plan = {"mode": "pruned", "n_probed": len(probe),
                          "n_candidates": int(len(ids))}
        return np.asarray(ids, dtype=np.int64)
