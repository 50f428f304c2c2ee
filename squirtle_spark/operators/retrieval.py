"""Sparse retrieval over the ``documents`` table: BM25 ranking and an
inverted index — the lexical side of the similarity-search family
(operators/similarity.py is the dense side). Beyond-parity: the reference
engine has no text operators at all.

Both operators are pure SQL built-ins (JVM-side, whole-stage codegen) and
share the token fan-out shape with text.py/dedup.py, so at 100 TB they ride
the same shuffle-by-token the dedup/decontamination family already pays:

- **BM25**: the score needs only (tf per doc-term, df per term, doc length,
  corpus avgdl). tf is computed over tokens FILTERED to the query terms
  before the shuffle — the grouped state is |query| rows per doc, not
  |vocab|; df/avgdl are term- and corpus-grain scalars. Per-term scores
  assemble through a conditional-aggregation pivot and sum in a FIXED
  left-associative order, so the double result is bit-identical across
  engines/partitionings (the lm_perplexity determinism pattern).
- **Inverted index**: token -> (df, total tf, capped posting list). The
  posting list is the first ``POSTINGS_CAP`` doc_ids in sorted order —
  bounded per-group state (sort + slice), never an unbounded collect; a
  production index would shard postings by (token, doc_id range), which is
  exactly what the shuffle key already provides.
"""

from __future__ import annotations

from .. import dialect as dl
from ..registry import register_df, register_sql

#: Fixed lexical query — terms chosen from the synthetic corpus vocabulary.
BM25_TERMS = ["hash", "join", "window", "stream"]
BM25_K1 = "CAST(1.2 AS DOUBLE)"
BM25_B = "CAST(0.75 AS DOUBLE)"
BM25_TOPK = 50

POSTINGS_CAP = 20


def _bm25_topk(d: str, tf_src: str | None = None, dl_src: str | None = None) -> str:
    toks = dl.split_tokens("lower(text)", d)
    un = dl.unnest_fn(d)
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    # Okapi BM25: idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dlen/avgdl)).
    idf = "LN(CAST(1 AS DOUBLE) + (c.n_docs - df.df + 0.5) / (df.df + 0.5))"
    score = (
        f"{idf} * (tf.tf * ({BM25_K1} + 1)) "
        f"/ (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dlen / c.avgdl))"
    )
    per_term = "\n".join(
        f"           COALESCE(MAX(CASE WHEN tok = '{t}' THEN s END), CAST(0 AS DOUBLE)) AS s_{t},"
        for t in BM25_TERMS
    )
    total = " + ".join(f"s_{t}" for t in BM25_TERMS)  # fixed fold order
    if dl_src is None:
        dl_src = (
            f"SELECT doc_id, CAST({dl.array_len(toks, d)} AS BIGINT) AS dlen "
            f"FROM documents"
        )
    if tf_src is None:
        # self-contained: tokens filtered to the query terms BEFORE the
        # grouped count, so grouped state is |query| rows per doc
        tf_src = f"""SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (
        SELECT doc_id, tok
        FROM (SELECT doc_id, {un}({toks}) AS tok FROM documents) x
        WHERE tok IN ({terms})
    ) hits GROUP BY doc_id, tok"""
    return f"""
WITH dl AS (
    {dl_src}
),
tf AS (
    {tf_src}
),
df AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
),
c AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dlen) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
    FROM dl
),
scored AS (
    SELECT tf.doc_id, tf.tok, {score} AS s
    FROM tf
    JOIN df ON tf.tok = df.tok
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN c
),
pivoted AS (
    SELECT doc_id,
{per_term}
           CAST(COUNT(*) AS BIGINT) AS n_matched_terms
    FROM scored GROUP BY doc_id
)
SELECT doc_id,
       n_matched_terms,
       ROUND({total}, 6) AS bm25_score
FROM pivoted
ORDER BY ROUND({total}, 6) DESC, doc_id
LIMIT {BM25_TOPK}
"""


def _bm25_view_srcs(spark, sf_dir) -> tuple[str, str]:
    """(tf_src, dl_src) over the session-materialized corpus token
    statistics: bm25's filtered tf is a `tok IN (terms)` slice of the
    full ret_tf relation (grouping before vs after the doc-level filter
    is the same relation — tf is per (doc, tok))."""
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    tf_v, dln_v, _ = corpus_token_views(spark, sf_dir)
    return (
        f"SELECT doc_id, tok, tf FROM {tf_v} WHERE tok IN ({terms})",
        f"SELECT doc_id, dlen FROM {dln_v}",
    )


def _bm25_topk_spark(spark, sf_dir):
    tf_src, dl_src = _bm25_view_srcs(spark, sf_dir)
    return spark.sql(_bm25_topk(dl.SPARK, tf_src=tf_src, dl_src=dl_src))


register_df(
    "bm25_topk",
    _bm25_topk_spark,
    oracle_body=_bm25_topk(dl.DUCK),
    doc="Okapi BM25 top-k lexical retrieval (fixed query terms): filtered "
    "token tf + term df + corpus avgdl; fixed-order score fold for "
    "cross-engine bit-equality.",
    bench=True,
)


def _inverted_index(d: str) -> str:
    toks = dl.split_tokens("lower(text)", d)
    un = dl.unnest_fn(d)
    if d == dl.SPARK:
        postings = (
            "concat_ws(',', transform("
            f"slice(sort_array(collect_set(doc_id)), 1, {POSTINGS_CAP}), "
            "x -> CAST(x AS STRING)))"
        )
    else:
        postings = (
            "array_to_string(list_transform("
            f"list_slice(list_sort(list(DISTINCT doc_id)), 1, {POSTINGS_CAP}), "
            "x -> CAST(x AS VARCHAR)), ',')"
        )
    return f"""
WITH hits AS (
    SELECT doc_id, tok
    FROM (SELECT doc_id, {un}({toks}) AS tok FROM documents) x
)
SELECT tok,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(COUNT(*) AS BIGINT) AS tf_total,
       {postings} AS postings_head
FROM hits
GROUP BY tok
"""


register_sql(
    "inverted_index",
    _inverted_index,
    doc="Inverted index build: token -> document frequency, total term "
    "frequency, and a capped sorted posting-list head (bounded per-group "
    "state).",
)


RRF_K = 60  # reciprocal-rank-fusion damping (Cormack et al. 2009's default)
HYBRID_TOPK = 10
DENSE_QUERY_ID = 0  # the dense leg's query vector (embeddings.vec_id)


def _hybrid_rrf(d: str, bm25_sql: str | None = None) -> str:
    """Hybrid retrieval via reciprocal-rank fusion — the standard RAG
    two-leg retriever: the BM25 lexical top-{BM25_TOPK} (fixed query
    terms, the full `bm25_topk` pipeline inlined as a subquery) fused
    with a dense cosine top-{BM25_TOPK} against a fixed query embedding,
    scored RRF(doc) = Σ_legs 1/({RRF_K} + rank) over the UNION of both
    lists (Cormack et al. 2009). Rank fusion needs no score calibration
    between legs — exactly why it ships in production hybrid search.

    Determinism: both legs rank on rounded scores with doc-id
    tie-breaks, and the fused score is a fixed two-term fold of exact
    reciprocals — identical IEEE ops in both engines. The ROW_NUMBER
    rankings run over the two BOUNDED top-K lists (≤{BM25_TOPK} rows
    each, already reduced by TakeOrderedAndProject), the whitelisted
    bounded-global class — never over the corpus.

    100 TB: each leg is its own pruned retrieval (BM25 posting scan /
    ANN index); fusion touches 2·K rows per query regardless of corpus
    size.
    """
    bm25 = bm25_sql or _bm25_topk(d)
    if d == dl.SPARK:
        q_arr = "CAST(embedding AS ARRAY<DOUBLE>)"
        sim = (
            "aggregate(zip_with(ev, qv, (a, b) -> a * b), 0D, (acc, x) -> acc + x)"
            " / (SQRT(aggregate(ev, 0D, (acc, x) -> acc + x * x))"
            " * SQRT(aggregate(qv, 0D, (acc, x) -> acc + x * x)))"
        )
    else:
        q_arr = "CAST(embedding AS DOUBLE[])"
        sim = "list_cosine_similarity(ev, qv)"
    rrf = (
        f"COALESCE(1.0 / ({RRF_K} + lex.r_lex), CAST(0 AS DOUBLE))"
        f" + COALESCE(1.0 / ({RRF_K} + dense.r_dense), CAST(0 AS DOUBLE))"
    )
    return f"""
WITH lex AS (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY bm25_score DESC, doc_id) AS BIGINT)
               AS r_lex
    FROM ({bm25}) b
),
qv AS (
    SELECT qv FROM (
        SELECT {q_arr} AS qv FROM embeddings WHERE vec_id = {DENSE_QUERY_ID}
    ) q0 WHERE {dl.norm_positive('qv', d)}
),
dense_top AS (
    SELECT doc_id, sim FROM (
        SELECT e.vec_id AS doc_id, ROUND({sim}, 4) AS sim
        FROM (SELECT vec_id, {q_arr} AS ev FROM embeddings
              WHERE {dl.norm_positive(q_arr, d)}) e CROSS JOIN qv
        WHERE e.vec_id <> {DENSE_QUERY_ID}
    ) s
    ORDER BY sim DESC, doc_id
    LIMIT {BM25_TOPK}
),
dense AS (
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS BIGINT)
               AS r_dense
    FROM dense_top
),
fused AS (
    SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
           lex.r_lex,
           dense.r_dense,
           ROUND({rrf}, 8) AS rrf_score
    FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
)
SELECT doc_id, r_lex, r_dense, rrf_score
FROM fused
ORDER BY rrf_score DESC, doc_id
LIMIT {HYBRID_TOPK}
"""


def _hybrid_rrf_spark(spark, sf_dir):
    """Spark side over the materialized token statistics: the BM25 leg
    slices the session tf/dlen matviews (like bm25_topk itself) instead
    of re-tokenizing the corpus inside the fused plan (r10; 4 -> 1
    documents scans)."""
    return spark.sql(
        _hybrid_rrf(
            dl.SPARK,
            bm25_sql=_bm25_topk(dl.SPARK, *_bm25_view_srcs(spark, sf_dir)),
        )
    )


register_df(
    "hybrid_retrieval_rrf",
    _hybrid_rrf_spark,
    oracle_body=_hybrid_rrf(dl.DUCK),
    doc="Hybrid lexical+dense retrieval fused by reciprocal rank "
    "(BM25 top-K ⊕ cosine top-K, RRF k=60) — the standard RAG retriever.",
)


#: Hard-negative mining knobs: every HN_QUERY_MOD'th doc is a training
#: query; terms present in more than HN_DF_FRAC of the corpus are pruned
#: from candidate generation (stopword postings are the one thing that
#: can blow the token join up toward all-pairs); HN_TOPK negatives kept.
HN_QUERY_MOD = 10
HN_DF_FRAC = 0.3
HN_TOPK = 5


def _hard_negatives(d: str) -> str:
    """BM25 hard-negative mining for retriever training (DPR, Karpukhin
    et al., arXiv:2004.04906 §4.2: the strongest negatives for a query
    are the top BM25 passages that are NOT the positive). Every
    {HN_QUERY_MOD}th document plays the training query; candidates meet
    it ONLY through shared tokens (the inverted-index equi-join — never
    query x corpus), terms with df > {HN_DF_FRAC} x corpus are pruned so
    no stopword posting list can quadratically explode the join, the
    query doc itself and its exact-content duplicates (same md5
    fingerprint) are excluded as positives, and the top {HN_TOPK}
    remaining docs per query ship as negatives.

    Determinism: each (query, candidate, term) BM25 contribution rounds
    to DECIMAL(18,9) before the per-pair sum accumulates through DECIMAL
    (term order cannot perturb the total — the lm_perplexity pattern),
    and ranking ties break on doc_id. Scale shape: tf/df/dlen are the
    corpus-wide token aggregates every text operator already pays ONE
    shuffle for; the candidate join is keyed on token with both sides
    df-capped; the final top-k is a per-query window over candidate
    rows only.
    """
    toks = dl.split_tokens("lower(text)", d)
    un = dl.unnest_fn(d)
    return f"""
WITH tk AS (
    SELECT doc_id, {toks} AS tk FROM documents
),
dln AS (
    SELECT doc_id, CAST({dl.array_len('tk', d)} AS BIGINT) AS dlen FROM tk
),
tf AS (
    SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, {un}(tk) AS tok FROM tk) x
    GROUP BY doc_id, tok
),
fp AS (
    SELECT doc_id, md5(lower(trim(text))) AS content_fp FROM documents
),
{_hard_negatives_core(d)}
"""


def _hard_negatives_core(d: str) -> str:
    """Candidate join + scoring over the ``tf``/``dln``/``fp`` base
    relations (c → df → kept → qterms → pair_scores → negs → ranked →
    final SELECT) — shared verbatim by the self-contained oracle text
    and the Spark side's materialized-view form."""
    idf = "LN(CAST(1 AS DOUBLE) + (c.n_docs - df.df + 0.5) / (df.df + 0.5))"
    sat = (
        f"(tf.tf * ({BM25_K1} + 1)) "
        f"/ (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dln.dlen / c.avgdl))"
    )
    contrib = f"CAST(ROUND({idf} * {sat}, 9) AS DECIMAL(18,9))"
    return f"""c AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dlen) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
    FROM dln
),
df AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
),
kept AS (
    SELECT df.tok, df.df FROM df CROSS JOIN c
    WHERE df.df <= CAST({HN_DF_FRAC} * c.n_docs AS BIGINT)
),
qterms AS (
    SELECT DISTINCT tf.doc_id AS q_id, tf.tok
    FROM tf JOIN kept k ON k.tok = tf.tok
    WHERE tf.doc_id % {HN_QUERY_MOD} = 0
),
pair_scores AS (
    SELECT q.q_id, tf.doc_id AS cand_id,
           CAST(SUM({contrib}) AS DOUBLE) AS score,
           CAST(COUNT(*) AS BIGINT) AS n_shared_terms
    FROM qterms q
    JOIN tf ON tf.tok = q.tok AND tf.doc_id <> q.q_id
    JOIN df ON df.tok = tf.tok
    JOIN dln ON dln.doc_id = tf.doc_id
    CROSS JOIN c
    GROUP BY q.q_id, tf.doc_id
),
negs AS (
    SELECT p.q_id, p.cand_id, p.score, p.n_shared_terms
    FROM pair_scores p
    JOIN fp fq ON fq.doc_id = p.q_id
    JOIN fp fc ON fc.doc_id = p.cand_id
    WHERE fq.content_fp <> fc.content_fp
),
ranked AS (
    SELECT q_id, cand_id, score, n_shared_terms,
           ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY score DESC, cand_id ASC) AS rank
    FROM negs
)
SELECT q_id AS query_doc,
       rank,
       cand_id AS negative_doc,
       n_shared_terms,
       -- no final re-round: the score is an exact 9-dp DECIMAL sum cast
       -- to double, and exact decimals land on ROUND()'s half-way points
       -- where the engines' rounding diverges (the dsir_select lesson)
       score AS bm25_score
FROM ranked WHERE rank <= {HN_TOPK}
"""


def corpus_token_views(spark, sf_dir) -> tuple[str, str, str]:
    """(tf, dln, fp) temp-view names over the session-materialized
    corpus token statistics — the inverted-index artifact a retrieval
    deployment persists (token frequencies, doc lengths, content
    fingerprints), built once per (session, table) via
    catalog.session_matview and reused by every retrieval query."""
    from .. import catalog

    d = dl.SPARK
    toks = dl.split_tokens("lower(text)", d)
    un = dl.unnest_fn(d)
    tf = catalog.session_matview(
        spark,
        "ret_tf",
        sf_dir,
        f"SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf "
        f"FROM (SELECT doc_id, {un}({toks}) AS tok FROM documents) x "
        f"GROUP BY doc_id, tok",
    )
    dln = catalog.session_matview(
        spark,
        "ret_dlen",
        sf_dir,
        f"SELECT doc_id, CAST({dl.array_len(toks, d)} AS BIGINT) AS dlen "
        f"FROM documents",
    )
    fp = catalog.session_matview(
        spark,
        "ret_fp",
        sf_dir,
        "SELECT doc_id, md5(lower(trim(text))) AS content_fp FROM documents",
    )
    return tf, dln, fp


def _hard_negatives_spark(spark, sf_dir):
    """Spark side of hard_negatives over the session-materialized corpus
    token statistics: the tokenize + (doc, tok) aggregation builds once
    and every reference (df derivation, query terms, candidate join)
    scans the checkpointed rows — the inline form re-executed it per
    reference (9 corpus scans in the plan)."""
    tf_v, dln_v, fp_v = corpus_token_views(spark, sf_dir)
    return spark.sql(
        f"""
WITH tf AS (SELECT * FROM {tf_v}),
dln AS (SELECT * FROM {dln_v}),
fp AS (SELECT * FROM {fp_v}),
{_hard_negatives_core(dl.SPARK)}
"""
    )


register_df(
    "hard_negatives",
    _hard_negatives_spark,
    oracle_body=_hard_negatives(dl.DUCK),
    doc="DPR-style BM25 hard-negative mining: inverted-token candidate "
    "join (df-pruned, never query x corpus), exact-dup positives "
    "excluded, DECIMAL-exact scores, top-k per query.",
    bench=True,
)
