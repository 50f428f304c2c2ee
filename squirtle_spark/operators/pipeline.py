"""Training-data pipeline operators: split / sample / chunk / pack.

The four dataset-preparation steps every LLM training pipeline runs after
dedup + quality filtering, each expressed as dialect-shared SQL (pure
built-ins, zero Python) so the DuckDB oracle value-checks them:

- **split_train_val_test** — deterministic hash split. Membership is a
  pure function of (doc_id, salt), so it is stable under re-runs,
  repartitioning and incremental appends — the property that matters when
  the corpus is rebuilt weekly at 100 TB. No shuffle (per-row projection).
- **sample_domain_cap** — per-domain quota sampling (cap each source at K
  docs, chosen by hash order, not arrival order — an unbiased within-
  domain sample). One bounded shuffle on source; Spark's WindowGroupLimit
  prunes to K per key map-side before the exchange.
- **chunk_documents** — fixed-size token windows with overlap (stride <
  size), the context-window chunking step. Per-row lateral fan-out, no
  shuffle; output is (doc, start) keyed so downstream joins stay local.
- **pack_sequences** — greedy contiguous bin packing of docs into fixed
  token budgets per source shard (running token count DIV budget). One
  window pass per shard — the distributed form of sequential packing;
  packing never crosses a source boundary, so shards parallelize.
"""

from __future__ import annotations

from .. import dialect as dl
from ..registry import register_df, register_sql

#: Split fractions are encoded as 256ths via the first hex byte of
#: md5(doc_id || salt): 0x00-0xcc train (205/256 ~ 80%), 0xcd-0xe5 val
#: (25/256 ~ 10%), 0xe6-0xff test (26/256 ~ 10%).
_SPLIT_SALT = "squirtle-split-v1"

#: Per-domain sample cap.
_DOMAIN_CAP = 5

#: Chunking: window size / stride in tokens (stride < size => overlap).
_CHUNK_SIZE = 64
_CHUNK_STRIDE = 48

#: Packing: tokens per training sequence bin.
_PACK_BUDGET = 512


def _split_case(key_expr: str) -> str:
    """The 80/10/10 salted-hash CASE over an arbitrary key expression
    (identical text in both dialects — md5 of the same string is the
    same hex everywhere, which IS the determinism claim)."""
    h = f"substring(md5(CAST({key_expr} AS STRING) || ':{_SPLIT_SALT}'), 1, 2)"
    return (
        f"CASE WHEN {h} < 'cd' THEN 'train' "
        f"WHEN {h} < 'e6' THEN 'val' "
        f"ELSE 'test' END"
    )


def _split(d: str) -> str:
    return f"""
SELECT doc_id,
       lang,
       source,
       {_split_case('doc_id')} AS split
FROM documents
"""


register_sql(
    "split_train_val_test",
    _split,
    doc="Deterministic salted-hash 80/10/10 split (stable under re-runs/appends).",
)


def _split_leakage(d: str) -> str:
    """Train/test split LEAKAGE audit: near-duplicate document pairs that
    straddle a split boundary — the in-corpus contamination check run
    before training (Lee et al. arXiv:2107.06499 §6.2 found ~1% of
    standard benchmarks' test sets near-duplicated in train; the fix is
    auditing the split, not just decontaminating against external
    benchmarks, which decontaminate_ngram_overlap covers).

    Composition, all shared machinery: the MinHash-LSH pipeline +
    candidate→exact-Jaccard verify core (dedup.verified_pairs_ctes — the
    same CTEs dedup_minhash_lsh emits, so a pair leaks here iff that
    entry reports it) joined to the deterministic salted-hash split
    (split_train_val_test's exact CASE). Emits each cross-split pair with
    its splits, verified Jaccard, and a severity tier: 'dup' at >=
    LSH_DUP_THRESHOLD (past the banding knee — confidently the same doc),
    'near' in [NEARDUP_JACCARD_FLOOR, knee).

    Scale shape: everything up to ``pairs`` is the never-all-pairs LSH
    plan (|bucket|² candidates, shingle equi-join verify); the split
    join adds two doc_id-keyed equi-joins against a projection of the
    base table — no new shuffle key, and at 100 TB the splits relation
    is derivable in the same scan that feeds the shingle fan-out. An
    empty result IS the audit passing; rows are the docs to re-assign
    or drop before training.
    """
    import textwrap

    from .dedup import (
        LSH_DUP_THRESHOLD,
        NEARDUP_JACCARD_FLOOR,
        _mh_pipeline_ctes,
        verified_pairs_ctes,
    )

    return textwrap.dedent(f"""
        WITH {_mh_pipeline_ctes(d)},
        {verified_pairs_ctes()},
        splits AS ({_split(d)})
        SELECT p.doc_a, p.doc_b,
               sa.split AS split_a, sb.split AS split_b,
               round(p.jac, 4) AS jaccard,
               CASE WHEN p.jac >= {LSH_DUP_THRESHOLD} THEN 'dup'
                    ELSE 'near' END AS severity
        FROM pairs p
        JOIN splits sa ON sa.doc_id = p.doc_a
        JOIN splits sb ON sb.doc_id = p.doc_b
        WHERE p.jac >= {NEARDUP_JACCARD_FLOOR} AND sa.split <> sb.split
        """)


def _split_leakage_spark(spark, sf_dir):
    """Spark side over the session-materialized MinHash pipeline
    (dedup._mh_pipeline_views): identical candidate/verify/split text,
    with `sh`/`sig`/`bands` aliased to checkpointed views so the
    shingle → minhash pipeline runs once, not once per CTE reference."""
    import textwrap

    from .dedup import (
        LSH_DUP_THRESHOLD,
        NEARDUP_JACCARD_FLOOR,
        mh_alias_ctes,
        verified_pairs_ctes,
    )

    d = dl.SPARK
    return spark.sql(
        textwrap.dedent(f"""
        WITH {mh_alias_ctes(spark, sf_dir)},
        {verified_pairs_ctes()},
        splits AS ({_split(d)})
        SELECT p.doc_a, p.doc_b,
               sa.split AS split_a, sb.split AS split_b,
               round(p.jac, 4) AS jaccard,
               CASE WHEN p.jac >= {LSH_DUP_THRESHOLD} THEN 'dup'
                    ELSE 'near' END AS severity
        FROM pairs p
        JOIN splits sa ON sa.doc_id = p.doc_a
        JOIN splits sb ON sb.doc_id = p.doc_b
        WHERE p.jac >= {NEARDUP_JACCARD_FLOOR} AND sa.split <> sb.split
        """)
    )


register_df(
    "split_leakage_audit",
    _split_leakage_spark,
    oracle_body=_split_leakage(dl.DUCK),
    doc="Near-dup pairs straddling the train/val/test split (LSH candidates, "
    "exact-Jaccard verified, severity-tiered) — in-corpus contamination audit.",
)


def _domain_cap(d: str) -> str:
    return f"""
SELECT doc_id, source, lang
FROM (
    SELECT doc_id, source, lang,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rn
    FROM documents
)
WHERE rn <= {_DOMAIN_CAP}
"""


register_sql(
    "sample_domain_cap",
    _domain_cap,
    doc=f"Quota sampling: hash-ordered cap of {_DOMAIN_CAP} docs per source domain.",
)


def _chunks(d: str) -> str:
    # r15 opt: tokenize ONCE per document (tk subquery) and count chunk
    # tokens as the SLICE length instead of re-splitting each chunk's
    # rebuilt string. Tokens are \s+-split non-empty strings, so
    # len(split_tokens(concat_ws(' ', slice))) == len(slice) exactly —
    # the old form paid one string join + one regex re-split per CHUNK.
    toks = dl.split_tokens("text", d)
    n = dl.array_len("tk", d)
    if d == dl.SPARK:
        # Spark's sequence(1, 0) raises (illegal boundaries) where
        # DuckDB's generate_series(1, 0) is simply empty — a zero-token
        # document must yield zero chunks in both engines, not crash one
        # (r12 randomized differential lane: empty-text docs).
        fanout = (
            f"LATERAL VIEW explode(CASE WHEN {n} >= 1 THEN "
            f"sequence(1, CAST({n} AS INT), {_CHUNK_STRIDE}) "
            f"ELSE array() END) _c AS start"
        )
        sl = f"slice(tk, start, {_CHUNK_SIZE})"
        chunk = f"concat_ws(' ', {sl})"
    else:
        fanout = f", unnest(generate_series(1, CAST({n} AS INT), {_CHUNK_STRIDE})) AS _c(start)"
        sl = f"list_slice(tk, start, start + {_CHUNK_SIZE - 1})"
        chunk = f"array_to_string({sl}, ' ')"
    return f"""
SELECT doc_id,
       CAST(start AS BIGINT) AS chunk_start,
       CAST(({dl.array_len(sl, d)}) AS BIGINT) AS chunk_tokens,
       {chunk} AS chunk_text
FROM (SELECT doc_id, {toks} AS tk FROM documents) t
{fanout}
"""


register_sql(
    "chunk_documents",
    _chunks,
    doc=f"Overlapping token chunks (size {_CHUNK_SIZE}, stride {_CHUNK_STRIDE}), per-row fan-out.",
    bench=True,
)


def _pack(d: str) -> str:
    n_tok = dl.array_len(dl.split_tokens("text", d), d)
    cum = f"""SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
    return f"""
WITH sized AS (
    SELECT doc_id, source, {n_tok} AS n_tokens
    FROM documents
),
running AS (
    SELECT doc_id, source, n_tokens,
           CAST({cum} AS BIGINT) - n_tokens AS tokens_before
    FROM sized
)
SELECT doc_id,
       source,
       n_tokens,
       {dl.intdiv('tokens_before', str(_PACK_BUDGET), d)} AS bin_id,
       tokens_before % {_PACK_BUDGET} AS bin_offset
FROM running
"""


register_sql(
    "pack_sequences",
    _pack,
    doc=f"Greedy sequence packing into {_PACK_BUDGET}-token bins per source shard.",
)


#: Fixed context length for concat-split packing (tokens per sequence).
_SEQ_LEN = 128


def _pack_concat_split(d: str) -> str:
    """GPT-style pretraining packing: per source shard, documents are
    CONCATENATED into one token stream (deterministic doc_id order) and
    the stream is cut every {_SEQ_LEN} tokens; a document crossing a cut
    contributes a span to EACH sequence it intersects. Output is the
    span manifest — (source, seq_id, doc_id, seq_off, doc_off, n_toks) —
    exactly what a loader needs to materialize sequences AND build
    block-diagonal attention masks at document boundaries
    (pack_sequences is the no-split greedy-bin form; this is the
    no-padding form every token position is used by).

    Scale shape: the only shuffle is the per-source cumulative-offset
    window (sources pack independently, so shards parallelize — the
    pack_sequences precedent); the sequence fan-out is a per-row lateral
    over ceil(n/{_SEQ_LEN}) + 1 values; span arithmetic is pure integer
    projection, so both engines agree bit-for-bit. Invariant (pytest +
    oracle): within every (source, seq) the spans tile [0, {_SEQ_LEN})
    exactly — no gaps, no overlaps — except the shard's final sequence,
    which ends at the stream's last token.
    """
    n_tok = dl.array_len(dl.split_tokens("text", d), d)
    L = _SEQ_LEN
    if d == dl.SPARK:
        fan = "LATERAL VIEW explode(sequence(first_seq, last_seq)) s AS seq"
    else:
        fan = ", unnest(generate_series(first_seq, last_seq)) AS s(seq)"
    return f"""
WITH sized AS (
    SELECT doc_id, source, {n_tok} AS n FROM documents
),
offs AS (
    SELECT doc_id, source, n,
           CAST(SUM(n) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) - n AS off
    FROM sized WHERE n > 0
),
bounds AS (
    SELECT doc_id, source, n, off,
           {dl.intdiv('off', str(L), d)} AS first_seq,
           {dl.intdiv('(off + n - 1)', str(L), d)} AS last_seq
    FROM offs
),
spans AS (
    SELECT doc_id, source, n, off, CAST(seq AS BIGINT) AS seq_id
    FROM bounds {fan}
)
SELECT source,
       seq_id,
       doc_id,
       GREATEST(off, seq_id * {L}) - seq_id * {L} AS seq_off,
       GREATEST(off, seq_id * {L}) - off AS doc_off,
       LEAST(off + n, (seq_id + 1) * {L}) - GREATEST(off, seq_id * {L}) AS n_toks
FROM spans
"""


register_sql(
    "pack_concat_split",
    _pack_concat_split,
    doc=f"GPT-style concat-and-split packing into {_SEQ_LEN}-token "
    "sequences per source shard: span manifest with per-sequence offsets "
    "for boundary-aware attention masks; docs crossing cuts span both.",
)


def _split_by_cluster_df(spark, sf_dir):
    """Cluster-aware train/val/test split: the FIX for what
    split_leakage_audit detects. Every near-duplicate connected component
    (dedup_clusters' min-label propagation over the exact n-gram-Jaccard
    pair graph) is assigned as a UNIT, keyed by its canonical label
    (min doc_id), so no near-dup pair can ever straddle a split boundary
    — structural leak-freedom, not an audited-after-the-fact property
    (Lee et al. arXiv:2107.06499 §6.2's contamination fixed at split
    time). Docs in no cluster key by their own doc_id with the SAME salt
    as split_train_val_test, so only clustered docs move relative to the
    plain split, and the canonical doc of each cluster never moves.

    Scale shape: the cluster labels relation holds only CLUSTERED docs
    (the duplicate minority); attaching it is one doc_id-keyed equi-join
    (unique key, no skew) on top of the CC rounds dedup_clusters already
    costs, and the split itself stays a per-row projection.
    """
    from .dedup import _dedup_clusters

    labels = _dedup_clusters(spark, sf_dir)
    return (
        spark.table("documents")
        .select("doc_id")
        .join(labels, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "COALESCE(cluster_id, doc_id) AS cluster_id",
            f"{_split_case('COALESCE(cluster_id, doc_id)')} AS split",
        )
    )


def _split_by_cluster_oracle() -> str:
    from .dedup import _clusters_ctes

    return (
        _clusters_ctes(dl.DUCK)
        + f"""
SELECT d.doc_id,
       COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
       {_split_case('COALESCE(c.cluster_id, d.doc_id)')} AS split
FROM documents d
LEFT JOIN clusters c ON d.doc_id = c.doc_id
"""
    )


register_df(
    "split_by_cluster",
    _split_by_cluster_df,
    oracle_body=_split_by_cluster_oracle(),
    doc="Leak-free split: near-dup connected components assigned to "
    "train/val/test as units (cluster-canonical salted hash); "
    "singletons keep their split_train_val_test assignment.",
)
