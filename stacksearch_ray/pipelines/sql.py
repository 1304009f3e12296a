"""DuckDB oracle SQL builders mirroring the engine's semantics exactly.

The canonical tokenization CTE replicates clean_query
(/root/reference/dataprocess/cleaners.py:38-41): drop
non-[a-zA-Z0-9 \\n] → lower → whitespace split → drop '' → drop English
stopwords (strip BEFORE lowercasing, mirroring the engine's order — they
diverge on non-ASCII uppercase whose lowercase is ASCII, e.g. U+212A).
Validated token-for-token against the Python tokenizer in tests.
"""

from __future__ import annotations

from ..stopwords import ENGLISH_STOPWORDS
from ..text import clean_query


def sql_stopword_list() -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in ENGLISH_STOPWORDS)


def kept_tokens_cte(table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id",
                    names: tuple[str, str] = ("toks", "kept")) -> str:
    """``names`` renames the (raw, kept) CTE pair so a second
    tokenization of a DIFFERENT relation can coexist in one WITH chain
    (e.g. a delete-predicate over ``documents`` ahead of a bm25 chain
    over the survivor relation)."""
    tname, kname = names
    return f"""
{tname} AS (
  SELECT {id_col} AS doc_id,
         unnest(string_split_regex(
             lower(regexp_replace({text_col}, '[^a-zA-Z0-9 \n]+', '', 'g')),
             '\\s+')) AS term
  FROM {table}
),
{kname} AS (
  SELECT doc_id, term FROM {tname}
  WHERE term <> '' AND term NOT IN ({sql_stopword_list()})
)"""


def token_list_cte(table: str = "documents", text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    """Per-doc ORDERED kept-token ARRAY (the list form of kept_tokens_cte,
    for n-gram construction where token order matters)."""
    return f"""
doc_toks AS (
  SELECT {id_col} AS doc_id, list_filter(
    string_split_regex(
        lower(regexp_replace({text_col}, '[^a-zA-Z0-9 \n]+', '', 'g')),
        '\\s+'),
    t -> t <> '' AND t NOT IN ({sql_stopword_list()})) AS toks
  FROM {table})"""


def ngram_cte(n: int, name: str) -> str:
    """CTE ``name(doc_id, ng)``: every ORDER-PRESERVING token n-gram per
    doc, space-joined (injective: tokens contain no spaces). Expects
    ``doc_toks`` from token_list_cte in scope."""
    return f"""
{name} AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - {n} + 2),
                 i -> array_to_string(toks[i:i+{n - 1}], ' '))) AS ng
  FROM doc_toks)"""


def bm25_scores_sql(query: str, k1: float = 1.2, b: float = 0.75,
                    table: str = "documents", pre: str = "") -> str:
    """CTE chain ending in ``scores(doc_id, score)`` for a query string.
    ``table`` points the tokenize mirror at another relation; ``pre``
    injects CTEs before it (e.g. a filtered ``surv`` corpus)."""
    terms = sorted(set(clean_query(query)))
    terms_values = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH {pre}{kept_tokens_cte(table=table)},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM kept GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM kept GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
qterms(term) AS (VALUES {terms_values}),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM kept
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * (({k1} + 1.0) * tf.tf
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * (dl.dl / stats.avgdl)))) )
           AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)"""


def bm25_topk_sql(query: str, k: int = 10) -> str:
    return bm25_scores_sql(query) + f"""
SELECT doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def tfidf_topk_sql(query: str, k: int = 10) -> str:
    """Mirror of the registry ``tfidf`` scorer through the exhaustive
    path: score = Σ_t ln(n_docs/df) · ln(1.0 + tf) — same expression
    order as registry.tfidf_scorer (df > 0 for every joined term, so
    Python's max(df, 1) never bites)."""
    terms = sorted(set(clean_query(query)))
    terms_values = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH {kept_tokens_cte()},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM kept GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM kept GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n_docs FROM dl),
qterms(term) AS (VALUES {terms_values}),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM kept
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
scores AS (
  SELECT tf.doc_id,
         sum( ln(stats.n_docs / df.df) * ln(1.0 + tf.tf) ) AS score
  FROM tf
  JOIN df USING (term)
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def bm25plus_topk_sql(query: str, k: int = 10, k1: float = 1.2,
                      b: float = 0.75, delta: float = 1.0) -> str:
    """Mirror of the registry ``bm25_plus`` scorer (Lv & Zhai 2011):
    per (doc, term) ln((n_docs+1)/df) · (bm25_tf_part + δ), summed per
    doc — identical float expression order to registry.bm25_plus_scorer
    (idf · (part + δ), part spelled exactly like bm25_scores_sql)."""
    terms = sorted(set(clean_query(query)))
    terms_values = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH {kept_tokens_cte()},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM kept GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM kept GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
qterms(term) AS (VALUES {terms_values}),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM kept
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs + 1.0) / df.df)
              * ((({k1} + 1.0) * tf.tf
                  / (tf.tf + {k1} * (1.0 - {b} + {b} * (dl.dl / stats.avgdl))))
                 + {delta!r}) )
           AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def lm_dirichlet_topk_sql(query: str, k: int = 10,
                          mu: float = 2000.0) -> str:
    """Mirror of the registry ``lm_dirichlet`` collection-stats scorer
    (Zhai & Lafferty 2001): per (doc, term)
    max(0, ln(1 + tf/((mu·cf)/total_len)) + ln(mu/(dl+mu))), summed per
    doc — identical float expression order to registry.lm_dirichlet_
    scorer. cf = collection frequency over kept tokens; total_len =
    Σ dl (integer-valued doubles, exact under any summation order)."""
    terms = sorted(set(clean_query(query)))
    terms_values = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH {kept_tokens_cte()},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM kept GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM kept GROUP BY 1),
stats AS (SELECT sum(dl) AS total_len FROM dl),
qterms(term) AS (VALUES {terms_values}),
cf AS (
  SELECT term, count(*)::DOUBLE AS cf FROM kept
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
scores AS (
  SELECT tf.doc_id,
         sum( greatest(0.0,
              ln(1.0 + tf.tf / (({mu} * cf.cf) / stats.total_len))
              + ln({mu} / (dl.dl + {mu}))) ) AS score
  FROM tf
  JOIN cf USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def msearch_topk_sql(queries: list[str], k: int = 10,
                     k1: float = 1.2, b: float = 0.75) -> str:
    """Multi-query mirror of QueryEngine.search_many: ONE chain computes
    every query's bm25 top-k. The tf/dl/stats CTEs are shared and df is
    scanned once over the UNION of all query terms; per-query ranking is
    a single PARTITION BY query_id window. The per-(query, doc) score is
    the single-query chain's exact float expression."""
    pairs = []
    for qi, q in enumerate(queries):
        for t in sorted(set(clean_query(q))):
            pairs.append((qi, t))
    values = ", ".join(f"({qi}, '{t}')" for qi, t in pairs)
    return f"""
WITH {kept_tokens_cte()},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM kept GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM kept GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
qterms(query_id, term) AS (VALUES {values}),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM kept
  WHERE term IN (SELECT DISTINCT term FROM qterms) GROUP BY 1
),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * (({k1} + 1.0) * tf.tf
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * (dl.dl / stats.avgdl)))) )
           AS score
  FROM tf
  JOIN qterms q ON q.term = tf.term
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scores)
SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank"""


def feature_boost_topk_sql(query: str, k: int = 10,
                           weight: float = 0.25) -> str:
    """Mirror of QueryEngine.search_feature_boost with feature =
    ln(1 + n_chars) from the documents table: combined =
    bm25_score + weight·ln(1.0 + n_chars) per matched doc — identical
    float expression order to the engine's acc + weight·feat."""
    return bm25_scores_sql(query) + f"""
SELECT s.doc_id,
       CAST(floor((s.score + {weight!r} * ln(1.0 + d.n_chars)) * 1e6 + 0.5)
            AS BIGINT) AS score_micros,
       CAST(row_number() OVER (
            ORDER BY (s.score + {weight!r} * ln(1.0 + d.n_chars)) DESC,
                     s.doc_id ASC) AS BIGINT) AS rank
FROM scores s
JOIN documents d ON d.doc_id = s.doc_id
ORDER BY (s.score + {weight!r} * ln(1.0 + d.n_chars)) DESC, s.doc_id ASC
LIMIT {k}"""


def stemmed_topk_sql(query: str, k: int = 10,
                     k1: float = 1.2, b: float = 0.75) -> str:
    """Mirror of the stemmed_search entry: kept tokens run the same
    3-rule suffix stemmer (nested regexp_replace in rule order — RE2
    semantics on both engines), tokens that stem INTO a stopword are
    re-dropped (the build re-tokenizes the joined stemmed text), then
    the plain bm25 chain over the stemmed query terms."""
    from ..stopwords import ENGLISH_STOPWORD_SET
    from ..text import STEM_RULES, stem_token

    r1, r2, r3 = (p for p, _ in STEM_RULES)
    assert (r1, r2, r3) == (r"^([a-z0-9]{3,})ing$", r"^([a-z0-9]{3,})ed$",
                            r"^([a-z0-9]{3,}[a-rt-z0-9])s$"), \
        "SQL literal below must be regenerated if STEM_RULES change"
    terms = sorted({stem_token(t) for t in clean_query(query)}
                   - set(ENGLISH_STOPWORD_SET))
    terms_values = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH {kept_tokens_cte()},
stemmed AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(term,
             '^([a-z0-9]{{3,}})ing$', '\\1'),
             '^([a-z0-9]{{3,}})ed$', '\\1'),
             '^([a-z0-9]{{3,}}[a-rt-z0-9])s$', '\\1') AS term
  FROM kept),
kept2 AS (
  SELECT doc_id, term FROM stemmed
  WHERE term NOT IN ({sql_stopword_list()})
),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM kept2 GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM kept2 GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
qterms(term) AS (VALUES {terms_values}),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM kept2
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * (({k1} + 1.0) * tf.tf
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * (dl.dl / stats.avgdl)))) )
           AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def min_match_topk_sql(query: str, min_match: int, k: int = 10,
                       k1: float = 1.2, b: float = 0.75) -> str:
    """Mirror of QueryEngine.search_min_should_match: the plain bm25
    chain with HAVING count(DISTINCT term) >= m — survivors keep their
    full accumulated scores (identical float expression order)."""
    terms = sorted(set(clean_query(query)))
    terms_values = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH {kept_tokens_cte()},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM kept GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM kept GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
qterms(term) AS (VALUES {terms_values}),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM kept
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * (({k1} + 1.0) * tf.tf
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * (dl.dl / stats.avgdl)))) )
           AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
  HAVING count(DISTINCT tf.term) >= {min_match}
)
SELECT doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def ir_eval_sql(queries: tuple[str, ...], k: int = 10,
                k1: float = 1.2, b: float = 0.75) -> str:
    """Mirror of the ir_eval entry: one bm25 chain per (qid, doc) —
    the proven per-query chain with a qid column — ranked per qid by
    (score desc, doc_id asc); conjunctive relevance (doc has EVERY
    query term); RR / DCG@k / IDCG@k in per-row-rounded micros so the
    sums are exact int64 on both engines."""
    qmap = {qi: sorted(set(clean_query(q)))
            for qi, q in enumerate(sorted(queries))}
    qterms_values = ", ".join(f"('{t}', {qi})"
                              for qi, ts in qmap.items() for t in ts)
    queries_values = ", ".join(f"({qi}, '{q}')"
                               for qi, q in enumerate(sorted(queries)))
    return f"""
WITH {kept_tokens_cte()},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM kept GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM kept GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
qterms(term, qid) AS (VALUES {qterms_values}),
queries(qid, query) AS (VALUES {queries_values}),
qsize AS (SELECT qid, count(*)::BIGINT AS nt FROM qterms GROUP BY 1),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM kept
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
scores AS (
  SELECT q.qid, tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * (({k1} + 1.0) * tf.tf
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * (dl.dl / stats.avgdl)))) )
           AS score
  FROM tf
  JOIN qterms q USING (term)
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY 1, 2
),
topk AS (
  SELECT qid, doc_id, rank FROM (
    SELECT qid, doc_id, row_number() OVER (
        PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS rank
    FROM scores) WHERE rank <= {k}
),
rel AS (
  SELECT q.qid, tf.doc_id
  FROM tf JOIN qterms q USING (term) JOIN qsize s ON s.qid = q.qid
  GROUP BY q.qid, tf.doc_id, s.nt
  HAVING count(DISTINCT tf.term) = s.nt
),
relcount AS (SELECT qid, count(*)::BIGINT AS n_rel FROM rel GROUP BY 1),
hits AS (
  SELECT t.qid, t.rank FROM topk t
  JOIN rel r ON r.qid = t.qid AND r.doc_id = t.doc_id
),
agg AS (
  SELECT qid, count(*)::BIGINT AS hits_at_10,
         CAST(floor(1.0 / min(rank) * 1e6 + 0.5) AS BIGINT) AS rr_micros,
         sum(CAST(floor(1.0 / ln(rank + 1.0) * 1e6 + 0.5) AS BIGINT))
           AS dcg_micros
  FROM hits GROUP BY 1
),
ideal AS (
  SELECT qid,
         sum(CAST(floor(1.0 / ln(i + 1.0) * 1e6 + 0.5) AS BIGINT))
           AS idcg_micros
  FROM (SELECT qid, unnest(range(1, least(n_rel, {k}) + 1)) AS i
        FROM relcount)
  GROUP BY 1
)
SELECT q.query,
       coalesce(rc.n_rel, 0) AS n_rel,
       coalesce(a.hits_at_10, 0) AS hits_at_10,
       coalesce(a.rr_micros, 0) AS rr_micros,
       CAST(coalesce(a.dcg_micros, 0) AS BIGINT) AS dcg_micros,
       CAST(coalesce(i.idcg_micros, 0) AS BIGINT) AS idcg_micros
FROM queries q
LEFT JOIN relcount rc ON rc.qid = q.qid
LEFT JOIN agg a ON a.qid = q.qid
LEFT JOIN ideal i ON i.qid = q.qid
ORDER BY q.query"""


def spellfix_topk_sql(probes: tuple[str, ...], k: int = 10,
                      k1: float = 1.2, b: float = 0.75) -> str:
    """Mirror of the spellfix_search entry: per probe, the best vocab
    term within levenshtein ≤ 2 — (dist asc, df desc, term asc) —
    then the plain bm25 chain over the DISTINCT corrected terms.
    DuckDB's levenshtein == the entry's Myers kernel (exact edit
    distance); vocab df == count(DISTINCT doc_id) == the term_dict df."""
    probes_values = ", ".join(f"('{p}')" for p in probes)
    return f"""
WITH {kept_tokens_cte()},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM kept GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM kept GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
vocab AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS vdf
          FROM kept GROUP BY 1),
probes(probe) AS (VALUES {probes_values}),
cand AS (
  SELECT p.probe, v.term, v.vdf,
         levenshtein(p.probe, v.term)::BIGINT AS dist
  FROM probes p JOIN vocab v ON levenshtein(p.probe, v.term) <= 2
),
best AS (
  SELECT probe, term FROM (
    SELECT probe, term, row_number() OVER (
        PARTITION BY probe ORDER BY dist ASC, vdf DESC, term ASC) AS rn
    FROM cand) WHERE rn = 1
),
qterms AS (SELECT DISTINCT term FROM best),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM kept
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * (({k1} + 1.0) * tf.tf
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * (dl.dl / stats.avgdl)))) )
           AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def lm_jm_topk_sql(query: str, k: int = 10, lam: float = 0.1) -> str:
    """Mirror of the registry ``lm_jelinek_mercer`` collection-stats
    scorer: per (doc, term) ln(1 + coef·(tf/dl) / (cf/total_len)) with
    coef = (1-λ)/λ computed in Python and injected as a literal —
    identical float expression order to registry.lm_jelinek_mercer_
    scorer."""
    terms = sorted(set(clean_query(query)))
    terms_values = ", ".join(f"('{t}')" for t in terms)
    coef = (1.0 - lam) / lam
    return f"""
WITH {kept_tokens_cte()},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM kept GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM kept GROUP BY 1),
stats AS (SELECT sum(dl) AS total_len FROM dl),
qterms(term) AS (VALUES {terms_values}),
cf AS (
  SELECT term, count(*)::DOUBLE AS cf FROM kept
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + ({coef!r} * (tf.tf / dl.dl))
                 / (cf.cf / stats.total_len)) ) AS score
  FROM tf
  JOIN cf USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def synonym_topk_sql(groups: list[list[str]], k: int = 10) -> str:
    """Mirror of QueryEngine.search_synonym_groups: per (doc, group)
    MAX of the member terms' idf·part contributions, summed over groups
    — same float expression order as the bm25 chain; max is order-free."""
    norm = []
    for g in groups:
        terms = sorted({t for raw in g for t in clean_query(raw)})
        if terms:
            norm.append(terms)
    rows = ", ".join(
        f"('{t}', {gi})"
        for gi, g in enumerate(sorted(norm, key=lambda g: g[0]))
        for t in g)
    return f"""
WITH {kept_tokens_cte()},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM kept GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM kept GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
syn(term, grp) AS (VALUES {rows}),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM kept
  WHERE term IN (SELECT term FROM syn) GROUP BY 1
),
gmax AS (
  SELECT tf.doc_id, syn.grp,
         max( ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * ((1.2 + 1.0) * tf.tf
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl / stats.avgdl)))) )
           AS gc
  FROM tf
  JOIN df USING (term)
  JOIN syn USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY 1, 2
),
scores AS (SELECT doc_id, sum(gc) AS score FROM gmax GROUP BY 1)
SELECT doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def fielded_topk_sql(query: str, k: int = 10, title_k: int = 8,
                     wt: float = 2.0, wb: float = 1.0) -> str:
    """Mirror of the fielded_search entry: title = first ``title_k``
    kept tokens, body = the rest; each field gets its own full bm25
    chain (own n_docs/avgdl/df over docs where the field is non-empty);
    combined = wt·title + wb·body with missing fields coalesced to 0.0
    — identical float expression order to the entry."""
    terms = sorted(set(clean_query(query)))
    terms_values = ", ".join(f"('{t}')" for t in terms)

    def chain(p: str, kept: str) -> str:
        return f"""
{p}tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM {kept} GROUP BY 1, 2),
{p}dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM {kept} GROUP BY 1),
{p}stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM {p}dl),
{p}df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM {kept}
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
{p}scores AS (
  SELECT tf.doc_id,
         sum( ln(({p}stats.n_docs - {p}df.df + 0.5) / ({p}df.df + 0.5) + 1.0)
              * ((1.2 + 1.0) * tf.tf
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl / {p}stats.avgdl)))) )
           AS score
  FROM {p}tf tf
  JOIN {p}df USING (term)
  JOIN {p}dl dl ON dl.doc_id = tf.doc_id
  CROSS JOIN {p}stats
  GROUP BY tf.doc_id
)"""

    combined = (f"{float(wt)!r} * coalesce(t.score, 0.0)\n"
                f"         + {float(wb)!r} * coalesce(b.score, 0.0)")
    return _two_field_sql(chain, terms_values, title_k, combined, k)


def _two_field_sql(chain, terms_values: str, title_k: int,
                   combined_expr: str, k: int) -> str:
    """Shared tail of the two-field oracles (fielded weighted-sum and
    dis-max): title/body kept splits, two bm25 chains, a combiner
    expression over (t.score, b.score), micros top-k."""
    return f"""
WITH {token_list_cte()},
qterms(term) AS (VALUES {terms_values}),
tkept AS (SELECT doc_id, unnest(toks[1:{title_k}]) AS term FROM doc_toks),
bkept AS (SELECT doc_id, unnest(toks[{title_k + 1}:]) AS term FROM doc_toks),
{chain('t', 'tkept')},
{chain('b', 'bkept')},
fsc AS (
  SELECT coalesce(t.doc_id, b.doc_id) AS doc_id,
         {combined_expr} AS score
  FROM tscores t FULL OUTER JOIN bscores b ON t.doc_id = b.doc_id
)
SELECT doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM fsc
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def dismax_topk_sql(query: str, k: int = 10, title_k: int = 8,
                    tie: float = 0.3) -> str:
    """Mirror of the dismax_search entry (Lucene DisjunctionMaxQuery):
    combined = greatest(t, b) + tie·(t + b - greatest(t, b)) with
    missing fields coalesced to 0.0 — identical float expression order
    to the entry's mx + tie·(t + b - mx)."""
    # reuse fielded_topk_sql's chain by regenerating it here (the inner
    # helper is scoped to that builder; the SQL text must stay bitwise
    # in sync, so both builders share _two_field_sql for everything
    # outside the combiner expression)
    terms = sorted(set(clean_query(query)))
    terms_values = ", ".join(f"('{t}')" for t in terms)

    def chain(p: str, kept: str) -> str:
        return f"""
{p}tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM {kept} GROUP BY 1, 2),
{p}dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM {kept} GROUP BY 1),
{p}stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM {p}dl),
{p}df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM {kept}
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
{p}scores AS (
  SELECT tf.doc_id,
         sum( ln(({p}stats.n_docs - {p}df.df + 0.5) / ({p}df.df + 0.5) + 1.0)
              * ((1.2 + 1.0) * tf.tf
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl / {p}stats.avgdl)))) )
           AS score
  FROM {p}tf tf
  JOIN {p}df USING (term)
  JOIN {p}dl dl ON dl.doc_id = tf.doc_id
  CROSS JOIN {p}stats
  GROUP BY tf.doc_id
)"""

    combined = (
        "greatest(coalesce(t.score, 0.0), coalesce(b.score, 0.0))\n"
        f"         + {float(tie)!r} * (coalesce(t.score, 0.0)"
        " + coalesce(b.score, 0.0)\n"
        "            - greatest(coalesce(t.score, 0.0),"
        " coalesce(b.score, 0.0)))")
    return _two_field_sql(chain, terms_values, title_k, combined, k)


def bm25f_topk_sql(query: str, k: int = 10, title_k: int = 8,
                   wt: float = 2.0, wb: float = 1.0, k1: float = 1.2,
                   b: float = 0.75) -> str:
    """Mirror of the bm25f_search entry (Robertson/Zaragoza BM25F):
    per-field tfs are weight-scaled and length-normalized FIRST (each
    field's own dl/avgdl), the combined pseudo-frequency saturates ONCE
    through the shared k1 curve, idf is DOCUMENT-level (df over
    title ∪ body = whole-doc df; n_docs from the title chain — every
    doc with ≥1 kept token has a non-empty title). A field the doc
    lacks contributes exactly 0.0 (coalesce of tf/norm); float
    expression order matches the entry's numpy forms term for term."""
    terms = sorted(set(clean_query(query)))
    terms_values = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH {token_list_cte()},
qterms(term) AS (VALUES {terms_values}),
tkept AS (SELECT doc_id, unnest(toks[1:{title_k}]) AS term FROM doc_toks),
bkept AS (SELECT doc_id, unnest(toks[{title_k + 1}:]) AS term FROM doc_toks),
ttf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tkept
        WHERE term IN (SELECT term FROM qterms) GROUP BY 1, 2),
btf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM bkept
        WHERE term IN (SELECT term FROM qterms) GROUP BY 1, 2),
tdl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tkept GROUP BY 1),
bdl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM bkept GROUP BY 1),
tstats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM tdl),
bstats AS (SELECT avg(dl) AS avgdl FROM bdl),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
  FROM (SELECT * FROM tkept UNION ALL SELECT * FROM bkept)
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
wtf AS (
  SELECT coalesce(t.doc_id, bb.doc_id) AS doc_id,
         coalesce(t.term, bb.term) AS term,
         {float(wt)!r} * coalesce(t.tf
             / (1.0 - {float(b)!r} + {float(b)!r} * (tdl.dl / tstats.avgdl)), 0.0)
       + {float(wb)!r} * coalesce(bb.tf
             / (1.0 - {float(b)!r} + {float(b)!r} * (bdl.dl / bstats.avgdl)), 0.0)
           AS wtf
  FROM ttf t FULL OUTER JOIN btf bb
    ON t.doc_id = bb.doc_id AND t.term = bb.term
  LEFT JOIN tdl ON tdl.doc_id = coalesce(t.doc_id, bb.doc_id)
  LEFT JOIN bdl ON bdl.doc_id = coalesce(t.doc_id, bb.doc_id)
  CROSS JOIN tstats CROSS JOIN bstats
),
scores AS (
  SELECT wtf.doc_id,
         sum( ln((tstats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * (({float(k1)!r} + 1.0) * wtf.wtf
                 / (wtf.wtf + {float(k1)!r})) ) AS score
  FROM wtf JOIN df USING (term) CROSS JOIN tstats
  GROUP BY 1
)
SELECT doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def cross_fields_topk_sql(query: str, k: int = 10, title_k: int = 8,
                          wt: float = 2.0, wb: float = 1.0,
                          k1: float = 1.2, b: float = 0.75) -> str:
    """Mirror of the cross_fields_search entry (ES cross_fields /
    Lucene BlendedTermQuery): per term, contribution = idf_blend ·
    greatest(wt·part_title, wb·part_body) — the term's best field wins
    per TERM; df blends as the MAX per-field df; part_f is the
    standard per-field bm25 saturation with a missing field coalescing
    to exactly 0.0. Same per-field CTE scaffolding as bm25f_topk_sql;
    float expression order matches the entry's numpy forms."""
    terms = sorted(set(clean_query(query)))
    terms_values = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH {token_list_cte()},
qterms(term) AS (VALUES {terms_values}),
tkept AS (SELECT doc_id, unnest(toks[1:{title_k}]) AS term FROM doc_toks),
bkept AS (SELECT doc_id, unnest(toks[{title_k + 1}:]) AS term FROM doc_toks),
ttf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tkept
        WHERE term IN (SELECT term FROM qterms) GROUP BY 1, 2),
btf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM bkept
        WHERE term IN (SELECT term FROM qterms) GROUP BY 1, 2),
tdl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tkept GROUP BY 1),
bdl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM bkept GROUP BY 1),
tstats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM tdl),
bstats AS (SELECT avg(dl) AS avgdl FROM bdl),
tdf AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tkept
        WHERE term IN (SELECT term FROM qterms) GROUP BY 1),
bdf AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM bkept
        WHERE term IN (SELECT term FROM qterms) GROUP BY 1),
df AS (SELECT coalesce(t.term, bb.term) AS term,
              greatest(coalesce(t.df, 0.0), coalesce(bb.df, 0.0)) AS df
       FROM tdf t FULL OUTER JOIN bdf bb ON t.term = bb.term),
part AS (
  SELECT coalesce(t.doc_id, bb.doc_id) AS doc_id,
         coalesce(t.term, bb.term) AS term,
         greatest(
           {float(wt)!r} * coalesce(({float(k1)!r} + 1.0) * t.tf
             / (t.tf + {float(k1)!r} * (1.0 - {float(b)!r} + {float(b)!r}
                * (tdl.dl / tstats.avgdl))), 0.0),
           {float(wb)!r} * coalesce(({float(k1)!r} + 1.0) * bb.tf
             / (bb.tf + {float(k1)!r} * (1.0 - {float(b)!r} + {float(b)!r}
                * (bdl.dl / bstats.avgdl))), 0.0)
         ) AS p
  FROM ttf t FULL OUTER JOIN btf bb
    ON t.doc_id = bb.doc_id AND t.term = bb.term
  LEFT JOIN tdl ON tdl.doc_id = coalesce(t.doc_id, bb.doc_id)
  LEFT JOIN bdl ON bdl.doc_id = coalesce(t.doc_id, bb.doc_id)
  CROSS JOIN tstats CROSS JOIN bstats
),
scores AS (
  SELECT part.doc_id,
         sum( ln((tstats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * part.p ) AS score
  FROM part JOIN df USING (term) CROSS JOIN tstats
  GROUP BY 1
)
SELECT doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def term_vectors_sql(doc_id: int, k1: float = 1.2, b: float = 0.75) -> str:
    """Mirror of the term_vectors entry (the Elasticsearch
    ``_termvectors`` analog): per kept term of one doc — tf, corpus df,
    and the term's exact BM25 score contribution for that doc (the same
    idf·part chain as bm25_scores_sql, so term_vectors rows sum to the
    doc's search score for a query of exactly those terms)."""
    return f"""
WITH {kept_tokens_cte()},
tf AS (SELECT doc_id, term, count(*) AS tf FROM kept GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM kept GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
dterms AS (SELECT term, tf FROM tf WHERE doc_id = {doc_id}),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM kept
  WHERE term IN (SELECT term FROM dterms) GROUP BY 1
)
SELECT d.term AS term,
       CAST(d.tf AS BIGINT) AS tf,
       CAST(df.df AS BIGINT) AS df,
       CAST(floor( ln((stats.n_docs - df.df::DOUBLE + 0.5)
                      / (df.df::DOUBLE + 0.5) + 1.0)
                   * (({float(k1)!r} + 1.0) * d.tf::DOUBLE
                      / (d.tf::DOUBLE + {float(k1)!r}
                         * (1.0 - {float(b)!r} + {float(b)!r}
                            * (dl.dl / stats.avgdl))))
                   * 1e6 + 0.5) AS BIGINT) AS contrib_micros
FROM dterms d
JOIN df USING (term)
JOIN dl ON dl.doc_id = {doc_id}
CROSS JOIN stats
ORDER BY term ASC"""


def dsir_weights_sql(target_lang: str = "en", k: int = 50) -> str:
    """Mirror of the dsir_weights entry (DSIR, Xie et al. 2023,
    unigram-feature form): per-doc importance weight
    Σ_tokens ln(p_target(t)) − ln(p_raw(t)) with add-1 smoothing over
    the corpus vocab; target = docs whose lang = '{target_lang}', raw =
    the whole corpus. The per-TERM log-ratio is micros-rounded once,
    then per-doc sums are exact int64 (tf · lr_micros) — rule-4
    round-then-sum, so engines never compare float sums."""
    return f"""
WITH {kept_tokens_cte()},
all_c AS (SELECT term, count(*)::DOUBLE AS c FROM kept GROUP BY 1),
en_ids AS (SELECT doc_id FROM documents WHERE lang = '{target_lang}'),
en_c AS (
  SELECT term, count(*)::DOUBLE AS c FROM kept
  WHERE doc_id IN (SELECT doc_id FROM en_ids) GROUP BY 1
),
tot AS (
  SELECT (SELECT count(*) FROM kept)::DOUBLE AS n_all,
         (SELECT count(*) FROM kept
          WHERE doc_id IN (SELECT doc_id FROM en_ids))::DOUBLE AS n_en,
         (SELECT count(DISTINCT term) FROM kept)::DOUBLE AS v
),
lr AS (
  SELECT a.term,
         CAST(floor((ln((coalesce(e.c, 0.0) + 1.0) / (tot.n_en + tot.v))
                     - ln((a.c + 1.0) / (tot.n_all + tot.v)))
                    * 1e6 + 0.5) AS BIGINT) AS lr_micros
  FROM all_c a LEFT JOIN en_c e USING (term) CROSS JOIN tot
),
doc_tf AS (SELECT doc_id, term, count(*) AS tf FROM kept GROUP BY 1, 2),
w AS (
  SELECT doc_id, CAST(sum(tf * lr_micros) AS BIGINT) AS weight_micros
  FROM doc_tf JOIN lr USING (term) GROUP BY 1
)
SELECT doc_id, weight_micros,
       CAST(row_number() OVER (ORDER BY weight_micros DESC, doc_id ASC)
            AS BIGINT) AS rank
FROM w
ORDER BY weight_micros DESC, doc_id ASC
LIMIT {k}"""


def prf_expansion_cte(query: str, fb_docs: int = 5,
                      fb_terms: int = 3) -> str:
    """CTE chain (appended to bm25_scores_sql's) ending in
    ``expn(term)`` + ``cw(term, wm)``: Rocchio pseudo-relevance-feedback
    expansion terms. fb = top-``fb_docs`` docs of the base query
    (score desc, doc_id asc — the engine's tie-break); candidate weight
    = Σ over fb docs of idf·part, micros-rounded BEFORE ranking exactly
    as QueryEngine.prf_expansion_terms does."""
    return f""",
fb AS (SELECT doc_id FROM scores ORDER BY score DESC, doc_id ASC LIMIT {fb_docs}),
cand AS (
  SELECT kept.term, kept.doc_id, count(*)::DOUBLE AS tf
  FROM kept JOIN fb USING (doc_id)
  WHERE kept.term NOT IN (SELECT term FROM qterms)
  GROUP BY 1, 2
),
cdf AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM kept
  WHERE term IN (SELECT DISTINCT term FROM cand) GROUP BY 1
),
cw AS (
  SELECT cand.term,
         CAST(floor(sum( ln((stats.n_docs - cdf.df + 0.5) / (cdf.df + 0.5) + 1.0)
              * ((1.2 + 1.0) * cand.tf
                 / (cand.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl / stats.avgdl)))) )
              * 1e6 + 0.5) AS BIGINT) AS wm
  FROM cand
  JOIN cdf USING (term)
  JOIN dl ON dl.doc_id = cand.doc_id
  CROSS JOIN stats
  GROUP BY 1
),
expn AS (SELECT term FROM cw ORDER BY wm DESC, term ASC LIMIT {fb_terms})"""


def prf_terms_sql(query: str, fb_docs: int = 5, fb_terms: int = 3) -> str:
    """The chosen expansion terms + their weight micros (mirror of
    QueryEngine.prf_expansion_terms)."""
    return (bm25_scores_sql(query)
            + prf_expansion_cte(query, fb_docs, fb_terms) + """
SELECT term, wm AS weight_micros FROM cw
ORDER BY wm DESC, term ASC
LIMIT """ + str(fb_terms))


def prf_topk_sql(query: str, k: int = 10, fb_docs: int = 5,
                 fb_terms: int = 3, beta: float = 0.4) -> str:
    """Full Rocchio PRF retrieval mirror: base top-fb_docs → expansion
    term selection (micros-ranked) → boosted re-search with original
    terms at 1.0 and expansion terms at ``beta``, in the boosted
    scorer's (idf · boost) · part expression order."""
    return (bm25_scores_sql(query)
            + prf_expansion_cte(query, fb_docs, fb_terms) + f""",
boosts AS (SELECT term, 1.0 AS boost FROM qterms
           UNION ALL SELECT term, {float(beta)!r} FROM expn),
bdf AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM kept
  WHERE term IN (SELECT term FROM boosts) GROUP BY 1
),
fscores AS (
  SELECT tf.doc_id,
         sum( (ln((stats.n_docs - bdf.df + 0.5) / (bdf.df + 0.5) + 1.0)
               * boosts.boost)
              * ((1.2 + 1.0) * tf.tf
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl / stats.avgdl)))) )
           AS score
  FROM tf
  JOIN bdf USING (term)
  JOIN boosts USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM fscores
ORDER BY score DESC, doc_id ASC
LIMIT {k}""")


def terms_set_topk_sql(query: str, mod: int, k: int = 10,
                       k1: float = 1.2, b: float = 0.75) -> str:
    """Mirror of QueryEngine.search_terms_set: the plain bm25 chain with
    a PER-DOC minimum-should-match — HAVING count(DISTINCT term) >=
    1 + doc_id % mod (the doc-values threshold both engines derive from
    the id); survivors keep their full accumulated scores."""
    terms = sorted(set(clean_query(query)))
    terms_values = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH {kept_tokens_cte()},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM kept GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM kept GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
qterms(term) AS (VALUES {terms_values}),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM kept
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
scores AS (
  SELECT tf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * (({k1} + 1.0) * tf.tf
                 / (tf.tf + {k1} * (1.0 - {b} + {b} * (dl.dl / stats.avgdl)))) )
           AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
  HAVING count(DISTINCT tf.term) >= 1 + tf.doc_id % {mod}
)
SELECT doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def dfi_topk_sql(query: str, k: int = 10) -> str:
    """Mirror of the registry ``dfi`` collection-stats scorer (Lucene
    DFISimilarity, standardized independence measure): per (doc, term)
    log2(1 + greatest(tf − e, 0)/sqrt(e)) with e = (cf·dl)/total_len,
    summed per doc — identical float expression order to
    registry.dfi_scorer."""
    terms = sorted(set(clean_query(query)))
    terms_values = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH {kept_tokens_cte()},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM kept GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM kept GROUP BY 1),
stats AS (SELECT sum(dl) AS total_len FROM dl),
qterms(term) AS (VALUES {terms_values}),
cf AS (
  SELECT term, count(*)::DOUBLE AS cf FROM kept
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
scores AS (
  SELECT tf.doc_id,
         sum( log2(1.0 + greatest(tf.tf - (cf.cf * dl.dl) / stats.total_len,
                                  0.0)
                   / sqrt((cf.cf * dl.dl) / stats.total_len)) ) AS score
  FROM tf
  JOIN cf USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def combined_fields_topk_sql(query: str, k: int = 10, title_k: int = 8,
                             wt: float = 2.0, wb: float = 1.0,
                             k1: float = 1.2, b: float = 0.75) -> str:
    """Mirror of the combined_fields_search entry (Lucene
    CombinedFieldQuery): the fields merge into ONE pseudo-field BEFORE
    scoring — tf* = wt·tf_title + wb·tf_body, dl* = wt·dl_title +
    wb·dl_body, avgdl* = (wt·Σdl_title + wb·Σdl_body)/n_docs — then
    plain BM25 runs once on the merged quantities with DOCUMENT-level
    df. All weighted sums are exact (integer counts × small weights);
    float expression order matches the entry's numpy forms."""
    terms = sorted(set(clean_query(query)))
    terms_values = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH {token_list_cte()},
qterms(term) AS (VALUES {terms_values}),
tkept AS (SELECT doc_id, unnest(toks[1:{title_k}]) AS term FROM doc_toks),
bkept AS (SELECT doc_id, unnest(toks[{title_k + 1}:]) AS term FROM doc_toks),
ttf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tkept
        WHERE term IN (SELECT term FROM qterms) GROUP BY 1, 2),
btf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM bkept
        WHERE term IN (SELECT term FROM qterms) GROUP BY 1, 2),
tdl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tkept GROUP BY 1),
bdl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM bkept GROUP BY 1),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs,
         ({float(wt)!r} * sum(dl)
          + {float(wb)!r} * (SELECT coalesce(sum(dl), 0.0) FROM bdl))
         / count(*)::DOUBLE AS avgdl
  FROM tdl
),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
  FROM (SELECT * FROM tkept UNION ALL SELECT * FROM bkept)
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
ctf AS (
  SELECT coalesce(t.doc_id, bb.doc_id) AS doc_id,
         coalesce(t.term, bb.term) AS term,
         {float(wt)!r} * coalesce(t.tf, 0.0)
         + {float(wb)!r} * coalesce(bb.tf, 0.0) AS ctf,
         {float(wt)!r} * tdl.dl
         + {float(wb)!r} * coalesce(bdl.dl, 0.0) AS cdl
  FROM ttf t FULL OUTER JOIN btf bb
    ON t.doc_id = bb.doc_id AND t.term = bb.term
  LEFT JOIN tdl ON tdl.doc_id = coalesce(t.doc_id, bb.doc_id)
  LEFT JOIN bdl ON bdl.doc_id = coalesce(t.doc_id, bb.doc_id)
),
scores AS (
  SELECT ctf.doc_id,
         sum( ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * (({float(k1)!r} + 1.0) * ctf.ctf
                 / (ctf.ctf + {float(k1)!r}
                    * (1.0 - {float(b)!r}
                       + {float(b)!r} * (ctf.cdl / stats.avgdl)))) )
           AS score
  FROM ctf JOIN df USING (term) CROSS JOIN stats
  GROUP BY 1
)
SELECT doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""


def dfr_topk_sql(query: str, k: int = 10) -> str:
    """Mirror of the registry ``dfr`` scorer (Lucene DFRSimilarity
    G/L/H2): per (doc, term) max(0, (log2(1/(1+λ)) +
    tfn·log2((1+λ)/λ)) / (tfn+1)) with tfn = tf·log2(1 + avgdl/dl) and
    λ = cf/n_docs, summed per doc — identical float expression order;
    λ and tfn appear as repeated copies of the SAME subexpression, so
    every occurrence evaluates to the identical double."""
    terms = sorted(set(clean_query(query)))
    terms_values = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH {kept_tokens_cte()},
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM kept GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM kept GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
qterms(term) AS (VALUES {terms_values}),
cf AS (
  SELECT term, count(*)::DOUBLE AS cf FROM kept
  WHERE term IN (SELECT term FROM qterms) GROUP BY 1
),
scores AS (
  SELECT tf.doc_id,
         sum( greatest(0.0,
              (log2(1.0 / (1.0 + (cf.cf / stats.n_docs)))
               + (tf.tf * log2(1.0 + stats.avgdl / dl.dl))
                 * log2((1.0 + (cf.cf / stats.n_docs))
                        / (cf.cf / stats.n_docs)))
              / ((tf.tf * log2(1.0 + stats.avgdl / dl.dl)) + 1.0)) )
           AS score
  FROM tf
  JOIN cf USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       CAST(floor(score * 1e6 + 0.5) AS BIGINT) AS score_micros,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scores
ORDER BY score DESC, doc_id ASC
LIMIT {k}"""
