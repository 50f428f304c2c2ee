"""Corpus-curation operators: decontamination / incremental dedup /
sharding / stratified sampling.

The corpus-maintenance steps a production training-data pipeline runs
around the dedup + quality core, each as dialect-shared SQL (pure
built-ins, zero Python) so the DuckDB oracle value-checks them:

- **decontaminate_ngram_overlap** — flag training docs sharing any word
  5-gram with the held-out eval set (the benchmark-leakage scrub every
  LLM pipeline runs before training). The only join is a shingle
  equi-join with the DISTINCT eval-shingle set — at 100 TB the eval side
  is a few thousand docs, so Spark broadcasts it and the scan stays
  one-pass with no wide shuffle.
- **dedup_incremental** — near-dup check of a NEW batch against an
  EXISTING corpus shingle index (the incremental form of dedup: weekly
  crawls land against last week's corpus without re-pairing the world).
  A batch doc is rejected when >= 50% of its 5-gram shingles already
  appear in the index. Equi-join on shingle + one grouped count — never
  all-pairs; batch-internal dups are the existing dedup_exact/LSH path.
- **shard_corpus** — deterministic pseudo-random shard assignment + a
  stable position within each shard (the global-shuffle step before
  writing training shards). Shard id is a pure hash function of doc_id
  (re-run/append stable, like split_train_val_test); position is one
  bounded per-shard window — 16 independent sorts, not a global one.
- **sample_stratified** — exact-quota stratified sample: ceil(10%) of
  each language by hash order, the unbiased per-stratum downsample used
  for eval slices. Per-stratum ROW_NUMBER (WindowGroupLimit prunes
  map-side) joined to per-stratum counts (broadcast: one row per lang).
"""

from __future__ import annotations

import textwrap

from .. import dialect as dl
from ..registry import register_df, register_sql

#: Word-shingle width for decontamination / incremental dedup. 5-grams
#: are the classic eval-overlap unit (loose enough to catch paraphrase
#: fragments, tight enough that random collisions are rare).
SHINGLE_W = 5

#: Every 10th doc stands in for the held-out eval set / the new batch —
#: deterministic, so both engines derive the identical subset.
EVAL_MOD = 10
BATCH_MOD = 4

#: A batch doc is a dup of the corpus when this fraction of its shingles
#: already appears in the corpus index.
CONTAIN_THRESHOLD = 0.5

#: Number of output shards (one hex digit of md5).
N_SHARDS = 16

#: Stratified sample fraction per language.
STRATUM_FRAC = 0.10


def shingle_rows(d: str, pred: str, w: int = SHINGLE_W) -> str:
    """CTE body: DISTINCT (doc_id, shingle) for docs matching ``pred``.

    The fan-out explodes integer POSITIONS and renders one shingle per
    output row (one slice+concat each, like chunk_documents), NOT
    ``explode(transform(...))``: Spark evaluates that shape ~6x slower
    (the array lambda's work is re-done per exploded row — quadratic in
    tokens per doc; measured 4.4s vs 0.7s end-to-end on 5k docs). Docs
    shorter than the shingle width explode an empty sequence and drop
    out here; consumers LEFT JOIN where they must survive.
    """
    toks = dl.split_tokens("lower(trim(text))", d)
    fanout, one = dl.pos_shingle_fanout(w, d)
    return f"""
        SELECT DISTINCT doc_id, shingle
        FROM (
            SELECT doc_id, {one} AS shingle
            FROM (SELECT doc_id, {toks} AS tk FROM documents WHERE {pred}) t
            {fanout}
        ) u
    """


def corpus_shingle_view(spark, sf_dir) -> str:
    """Temp-view name over the session-materialized corpus-wide word
    {SHINGLE_W}-gram shingle relation (DISTINCT (doc_id, shingle), all
    docs) — built once per (session, table) via catalog.session_matview
    and sliced by doc_id predicates at the consumers
    (dedup_incremental's batch/corpus split, decontamination's
    train/eval split, source_overlap_matrix's source tagging): Spark
    inlines multi-referenced CTEs, so the self-contained forms were
    re-tokenizing the corpus once per slice."""
    from .. import catalog

    return catalog.session_matview(
        spark, "cur_sh5", sf_dir, shingle_rows(dl.SPARK, "TRUE")
    )


def _decontaminate_body(train_sh: str, eval_sh: str) -> str:
    """Overlap count over pre-sliced train/eval shingle relations —
    shared verbatim by the self-contained oracle text and the Spark
    side's materialized-view form (slices are pure doc_id predicates, so
    pre- vs post-shingling filtering is the same relation)."""
    return textwrap.dedent(f"""
        WITH train_sh AS ({train_sh}),
        eval_sh AS (
            SELECT DISTINCT shingle FROM ({eval_sh}) e
        )
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
        FROM train_sh t
        JOIN eval_sh e ON t.shingle = e.shingle
        GROUP BY t.doc_id
    """)


def _decontaminate(d: str) -> str:
    return _decontaminate_body(
        shingle_rows(d, f"doc_id % {EVAL_MOD} <> 0"),
        shingle_rows(d, f"doc_id % {EVAL_MOD} = 0"),
    )


def _decontaminate_spark(spark, sf_dir):
    sh5 = corpus_shingle_view(spark, sf_dir)
    return spark.sql(
        _decontaminate_body(
            f"SELECT doc_id, shingle FROM {sh5} WHERE doc_id % {EVAL_MOD} <> 0",
            f"SELECT doc_id, shingle FROM {sh5} WHERE doc_id % {EVAL_MOD} = 0",
        )
    )


register_df(
    "decontaminate_ngram_overlap",
    _decontaminate_spark,
    oracle_body=_decontaminate(dl.DUCK),
    doc=f"Training docs sharing a word {SHINGLE_W}-gram with the eval set "
    "(benchmark-leakage scrub; eval shingle set broadcasts at scale).",
    bench=True,
)


def _dedup_incremental_body(corpus_idx: str, batch_sh: str) -> str:
    """Containment verdicts over pre-sliced corpus/batch shingle
    relations — shared verbatim by the oracle text and the Spark side's
    materialized-view form.

    One pass (r15): `sizes` and `hits` each aggregated batch_sh by
    doc_id — two shuffles over the same rows plus a second join back to
    `d`. Because corpus_idx is DISTINCT, a batch shingle LEFT-joins at
    most one index row, so COUNT(*) still counts shingles and
    COUNT(i.shingle) counts the matched ones — both per-doc numbers fall
    out of ONE aggregation over the probe join. DuckDB replay of old vs
    new text is row-identical at sf0.01/sf0.1."""
    return textwrap.dedent(f"""
        WITH corpus_idx AS (
            SELECT DISTINCT shingle FROM ({corpus_idx}) c
        ),
        batch_sh AS ({batch_sh}),
        per_doc AS (
            SELECT b.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_shingles,
                   CAST(COUNT(i.shingle) AS BIGINT) AS n_in_corpus
            FROM batch_sh b
            LEFT JOIN corpus_idx i ON b.shingle = i.shingle
            GROUP BY b.doc_id
        )
        SELECT d.doc_id,
               COALESCE(p.n_shingles, 0) AS n_shingles,
               COALESCE(p.n_in_corpus, 0) AS n_in_corpus,
               CASE WHEN COALESCE(p.n_shingles, 0) = 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE CAST(COALESCE(p.n_in_corpus, 0) AS DOUBLE)
                         / CAST(p.n_shingles AS DOUBLE) END AS containment,
               CASE WHEN COALESCE(p.n_shingles, 0) > 0
                         AND CAST(COALESCE(p.n_in_corpus, 0) AS DOUBLE)
                             / CAST(p.n_shingles AS DOUBLE) >= {CONTAIN_THRESHOLD}
                    THEN 'dup_of_corpus' ELSE 'accepted' END AS status
        FROM (SELECT doc_id FROM documents WHERE doc_id % {BATCH_MOD} = 0) d
        LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    """)


def _dedup_incremental(d: str) -> str:
    return _dedup_incremental_body(
        shingle_rows(d, f"doc_id % {BATCH_MOD} <> 0"),
        shingle_rows(d, f"doc_id % {BATCH_MOD} = 0"),
    )


def _dedup_incremental_spark(spark, sf_dir):
    sh5 = corpus_shingle_view(spark, sf_dir)
    return spark.sql(
        _dedup_incremental_body(
            f"SELECT doc_id, shingle FROM {sh5} WHERE doc_id % {BATCH_MOD} <> 0",
            f"SELECT doc_id, shingle FROM {sh5} WHERE doc_id % {BATCH_MOD} = 0",
        )
    )


register_df(
    "dedup_incremental",
    _dedup_incremental_spark,
    oracle_body=_dedup_incremental(dl.DUCK),
    doc="New-batch docs vs existing corpus shingle index "
    f"(reject at >= {CONTAIN_THRESHOLD} containment; incremental dedup).",
    bench=True,
)


#: Shard assignment, shared VERBATIM by _shard_corpus and _shard_manifest
#: so manifest and shards can never disagree on membership. One hex digit
#: of md5 → 16 shards; POSITION is ANSI (both engines).
SHARD_HASH = "md5('shard:' || CAST(doc_id AS STRING))"
SHARD_EXPR = (
    f"CAST(position(substring({SHARD_HASH}, 1, 1) IN '0123456789abcdef') - 1 AS INT)"
)


def _shard_corpus(d: str) -> str:
    h = SHARD_HASH
    shard = SHARD_EXPR
    return textwrap.dedent(f"""
        SELECT doc_id,
               shard_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY shard_id ORDER BY h, doc_id) AS BIGINT) AS shard_pos
        FROM (SELECT doc_id, {shard} AS shard_id, {h} AS h FROM documents) t
    """)


register_sql(
    "shard_corpus",
    _shard_corpus,
    doc=f"Deterministic pseudo-random assignment to {N_SHARDS} training "
    "shards with stable in-shard order (global-shuffle step).",
)


def _sample_stratified(d: str) -> str:
    return textwrap.dedent(f"""
        WITH sized AS (
            SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
        ),
        ranked AS (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rn
            FROM documents
        )
        SELECT r.doc_id, r.lang
        FROM ranked r
        JOIN sized s ON s.lang = r.lang
        WHERE r.rn <= CEIL({STRATUM_FRAC} * s.n)
    """)


register_sql(
    "sample_stratified",
    _sample_stratified,
    doc=f"Exact-quota stratified sample: ceil({STRATUM_FRAC:.0%}) of each "
    "language by hash order.",
)


SAMPLE_WEIGHTED_K = 50


def _sample_weighted(d: str) -> str:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    each doc draws u ~ U(0,1] from a hash of its id and gets key =
    ln(u)/weight; the K LARGEST keys are the sample, biased toward heavy
    docs (weight = n_chars — stand-in for a quality/importance score).

    The A-ES reduction turns "weighted sample" into "global top-K",
    expressed as ORDER BY + LIMIT so Spark plans TakeOrderedAndProject
    (per-partition top-K, tiny driver merge — no single-partition window
    exchange, no full sort of the corpus); no driver-side randomness, and
    re-runs are reproducible because u comes from md5(doc_id), not an
    RNG. Both engines compute ln/division in IEEE double, so the oracle
    replays the exact ranking; the LIMIT boundary is tie-broken on doc_id.
    """
    u = f"((({dl.md5_i64('CAST(doc_id AS STRING)', d)}) % 1073741824) + 1) / 1073741824.0"
    return textwrap.dedent(f"""
        SELECT doc_id, lang, source, n_chars
        FROM (
            SELECT doc_id, lang, source, n_chars,
                   ln({u}) / n_chars AS es_key
            FROM documents
            WHERE n_chars > 0
        ) keyed
        ORDER BY es_key DESC, doc_id ASC
        LIMIT {SAMPLE_WEIGHTED_K}
    """)


register_sql(
    "sample_weighted",
    _sample_weighted,
    doc=f"Efraimidis–Spirakis weighted sample (K={SAMPLE_WEIGHTED_K}, "
    "weight = n_chars): deterministic hash-randomness, distributes as top-K.",
)


#: Target language mixture for training (shares must sum to 1); the
#: operator computes per-language resampling weights against it.
MIXTURE_TARGET = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}


def _mixture_weights(d: str) -> str:
    """Dataset-mixing weights: given the corpus's actual per-language
    token (char) shares and a target mixture, emit the per-language
    resampling weight target_share / actual_share (the factor a sampler
    or loader applies per document of that language). One tiny grouped
    aggregate + a scalar total — the 100 TB cost is one pass.

    Zero-char languages (empty/NULL-text shards) are dropped by the
    HAVING: their share is undefined and an all-zero corpus divided
    0/0 under ANSI (r12 degenerate differential probe).
    """
    case = " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(MIXTURE_TARGET.items()))
    return textwrap.dedent(f"""
        WITH per_lang AS (
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS n_chars
            FROM documents GROUP BY lang
            HAVING CAST(SUM(n_chars) AS BIGINT) > 0
        ),
        tot AS (SELECT CAST(SUM(n_chars) AS DOUBLE) AS total_chars FROM per_lang)
        SELECT lang, n_docs, n_chars,
               round(n_chars / total_chars, 6) AS actual_share,
               round((CASE lang {case} ELSE 0.0 END)
                     / (n_chars / total_chars), 6) AS weight
        FROM per_lang, tot
    """)


register_sql(
    "mixture_weights",
    _mixture_weights,
    doc="Per-language dataset-mixing weights: target share / actual share "
    "from one grouped pass over the corpus.",
)


MIXTURE_ALPHA = "CAST(0.3 AS DOUBLE)"  # mT5/XLM-R temperature exponent


def _mixture_temperature(d: str) -> str:
    """Temperature-scaled sampling shares — the multilingual-LM mixing
    rule (mT5 / XLM-R): q_i = p_i^alpha / sum_j p_j^alpha with alpha=0.3,
    which upsamples low-resource languages without a hand-written target
    mixture (``mixture_weights``'s explicit-target sibling).

    Determinism across engines: p^alpha is written EXP(alpha * LN(p)) —
    the LN/EXP pair this repo's perplexity entries already prove
    IEEE-identical in both engines (bare POWER is not guaranteed
    correctly-rounded in either) — and the denominator accumulates
    through DECIMAL after rounding, so the handful-of-languages sum is
    fold-order-free. One grouped pass + a languages-sized scalar (the
    whitelisted corpus-scalar class).
    """
    a = MIXTURE_ALPHA
    pa = f"EXP({a} * LN(n_chars / total_chars))"
    return textwrap.dedent(f"""
        WITH per_lang AS (
            SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS n_chars
            FROM documents GROUP BY lang
            HAVING CAST(SUM(n_chars) AS BIGINT) > 0
        ),
        tot AS (SELECT CAST(SUM(n_chars) AS DOUBLE) AS total_chars FROM per_lang),
        powed AS (
            SELECT lang, n_chars,
                   n_chars / total_chars AS p,
                   ROUND({pa}, 12) AS p_alpha
            FROM per_lang, tot
        ),
        z AS (
            SELECT CAST(SUM(CAST(p_alpha AS DECIMAL(20,12))) AS DOUBLE) AS z
            FROM powed
        )
        SELECT lang, n_chars,
               round(p, 6) AS actual_share,
               round(p_alpha / z, 6) AS sampled_share,
               round((p_alpha / z) / p, 6) AS upsample_factor
        FROM powed, z
    """)


register_sql(
    "mixture_temperature",
    _mixture_temperature,
    doc="Temperature-scaled (alpha=0.3) language sampling shares — the "
    "mT5/XLM-R low-resource upsampling rule.",
)


def write_training_shards(spark, sf_dir: str, path: str, fmt: str = "parquet"):
    """Terminal pipeline step: materialize the corpus as training shards.

    Joins the deterministic shard assignment (shard_corpus) back onto the
    full documents and writes shards partitioned by shard_id, with rows
    sorted by shard_pos inside each file — so a loader streams any shard
    in its stable global-shuffle order without a sort of its own.
    repartition(N, shard_id) + sortWithinPartitions keeps it one file per
    shard per task at any scale (a 100 TB run raises N to bound file
    size, the layout contract is unchanged). ``fmt="json"`` writes JSON
    Lines — the interchange format training corpora actually ship in —
    with the identical layout contract; because the shard checksum in
    shard_manifest is order-independent content hashing, the manifest
    computed from the source verifies a JSONL EXPORT byte-for-byte
    (tests prove the round-trip reproduces every checksum). Returns the
    written row count.
    """
    from pyspark.sql import functions as F

    from .. import catalog

    catalog.register_all(spark, sf_dir)
    assign = spark.sql(_shard_corpus(dl.SPARK))
    out = spark.table("documents").join(assign, "doc_id")
    writer = (
        out.repartition(N_SHARDS, F.col("shard_id"))
        .sortWithinPartitions("shard_id", "shard_pos")
        .write.mode("overwrite")
        .partitionBy("shard_id")
    )
    if fmt == "json":
        writer.json(path)
        return spark.read.json(path).count()
    writer.parquet(path)
    return spark.read.parquet(path).count()


def _source_overlap_matrix(d: str) -> str:
    """Pairwise cross-dataset contamination matrix: for every pair of
    sources, how many DISTINCT word {SHINGLE_W}-gram shingles they share,
    plus the containment coefficient (shared / smaller side) — the
    dataset-level version of decontaminate_ngram_overlap, answering "which
    corpora overlap enough to distort mixture_weights' dedup assumptions"
    before mixing (beyond-parity; reference has no text ops).

    Scale shape: DISTINCT (source, shingle) is one shuffle keyed on the
    shingle; the pair join meets only rows sharing a shingle, so cost is
    sum over shingles of (sources containing it choose 2) — bounded by
    source count squared per shingle, never |corpus|^2. A viral shingle
    appearing in all S sources contributes S^2 rows: at production scale
    drop stop-shingles (document frequency above a cap) first, the same
    guard decontamination uses.
    """
    toks = dl.split_tokens("lower(trim(text))", d)
    fanout, one = dl.pos_shingle_fanout(SHINGLE_W, d)
    sh = f"""
    SELECT DISTINCT source, shingle
    FROM (
        SELECT source, {one} AS shingle
        FROM (SELECT source, {toks} AS tk FROM documents) t
        {fanout}
    ) u"""
    return _source_overlap_body(sh)


def _source_overlap_body(sh: str) -> str:
    """Pair/containment computation over a (source, shingle) relation —
    shared verbatim by the oracle text and the Spark side's
    materialized-view form."""
    return f"""
WITH sh AS ({sh}
),
tot AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_shingles
    FROM sh GROUP BY source
),
pairs AS (
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(COUNT(*) AS BIGINT) AS shared_shingles
    FROM sh a
    JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
    GROUP BY a.source, b.source
)
SELECT p.src_a, p.src_b, p.shared_shingles,
       ta.n_shingles AS n_a,
       tb.n_shingles AS n_b,
       ROUND(CAST(p.shared_shingles AS DOUBLE)
             / CAST(LEAST(ta.n_shingles, tb.n_shingles) AS DOUBLE), 4)
           AS containment
FROM pairs p
JOIN tot ta ON p.src_a = ta.source
JOIN tot tb ON p.src_b = tb.source
"""


def _source_overlap_spark(spark, sf_dir):
    """Spark side over a session-materialized (source, shingle) relation
    (derived from the shared doc-level shingle view + one doc_id join):
    the self-contained form references `sh` three times and Spark would
    re-tokenize the corpus per reference."""
    from .. import catalog

    sh5 = corpus_shingle_view(spark, sf_dir)
    src_sh = catalog.session_matview(
        spark,
        "src_sh5",
        sf_dir,
        f"SELECT DISTINCT d.source, s.shingle FROM {sh5} s "
        f"JOIN documents d ON d.doc_id = s.doc_id",
    )
    return spark.sql(
        _source_overlap_body(f"SELECT source, shingle FROM {src_sh}")
    )


register_df(
    "source_overlap_matrix",
    _source_overlap_spark,
    oracle_body=_source_overlap_matrix(dl.DUCK),
    doc="Pairwise source-contamination matrix: distinct shared shingles + "
    "containment per source pair, met only through the shingle key.",
)


# ---------------------------------------------------------------------------
# Streaming curation: the incremental ingest form of the batch pipeline —
# new documents arrive, pass the quality gate, dedup against everything
# already accepted, and append to the curated store. The batch formulation
# (gate -> exact dedup, min-id survivor) is the equality oracle in tests.
# ---------------------------------------------------------------------------

#: Quality gate for the streaming curation path (kept to one cheap
#: predicate; the full battery is text_quality/quality_classifier).
CURATION_MIN_CHARS = 64


def stream_curation(
    spark,
    docs_path: str,
    accept_path: str,
    *,
    checkpoint: str,
    files_per_trigger: int = 2,
    timeout_s: int = 300,
    redact_pii: bool = False,
) -> None:
    """Curate a document STREAM incrementally: per micro-batch, (1) drop
    docs under the length gate, (2) collapse within-batch exact dups to
    the min doc_id, (3) anti-join the accumulated accepted-fingerprint
    index so nothing ever re-admits a seen fingerprint, (4) append
    survivors to the curated store. The index is the store itself (a
    fingerprint column on accepted rows) — no driver state, no state
    store; dedup state lives on storage exactly like dedup_incremental's
    corpus index, so a year-long ingest holds nothing in memory.

    At-least-once note: a retried batch would re-append rows it already
    wrote (its fingerprints aren't visible to its own retry's anti-join
    read in all FS implementations); production routes the append through
    upsert_sink keyed on content_fp for idempotence. Replay order defines
    survivorship (first accepted wins); the batch-equality test feeds
    epochs in doc_id order so first-arrival == min doc_id, making the
    stream comparable to the batch min-id rule.

    ``redact_pii=True`` masks emails/phones/IPv4 (operators.pii) in the
    STORED text only, after fingerprinting: dedup keys on the raw
    content, so two docs differing only in their PII still collapse the
    same way redaction-off would, and the fingerprint index never holds
    unmasked text either way (it is an md5). The mask is a per-row
    codegen projection — adding it to the lane costs no extra shuffle
    or state.
    """
    from pyspark.sql import functions as F

    from .. import dialect as _dl
    from .. import streaming as st
    from .pii import redact_expr

    stream = st.replay_stream(spark, docs_path, files_per_trigger=files_per_trigger)
    if "epoch" in stream.columns:
        stream = stream.drop("epoch")

    def process(df, _epoch_id):
        batch = (
            df.where(F.length("text") >= CURATION_MIN_CHARS)
            .withColumn("content_fp", F.md5(F.lower(F.trim(F.col("text")))))
        )
        w = "(PARTITION BY content_fp ORDER BY doc_id)"
        batch = (
            batch.withColumn("rn", F.expr(f"ROW_NUMBER() OVER {w}"))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        # Existence via Hadoop FS (not try/except) so real read errors
        # propagate instead of silently re-admitting duplicates — the
        # upsert_sink pattern.
        sess = df.sparkSession
        jvm = sess._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(accept_path)
        fs = hpath.getFileSystem(sess._jsc.hadoopConfiguration())
        if fs.exists(hpath):
            seen = sess.read.parquet(accept_path).select("content_fp")
            batch = batch.join(seen, "content_fp", "left_anti")
        if redact_pii:
            batch = batch.withColumn(
                "text", F.expr(redact_expr("text", _dl.SPARK))
            )
        batch.write.mode("append").parquet(accept_path)

    q = st.foreach_batch_sink(stream, process, checkpoint=checkpoint)
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"stream_curation still running after {timeout_s}s")


def _shard_manifest(d: str) -> str:
    """Per-shard integrity manifest for shard_corpus's assignment: doc
    count, token volume, id bounds, and an ORDER-INDEPENDENT content
    checksum (bit_xor of a per-doc 60-bit content hash — XOR commutes, so
    any partitioning/replay order yields the same value). This is the
    reproducibility artifact a training run records next to its shards:
    re-exporting must reproduce every row bit-for-bit, and a single
    flipped document flips its shard's checksum.

    One scan + one 16-group aggregate; at 100 TB it rides the same
    hash-assignment expression as shard_corpus so manifest and shards can
    never disagree on membership.
    """
    shard = SHARD_EXPR
    toks = dl.split_tokens("text", d)
    ck = dl.md5_i64("'ck:' || CAST(doc_id AS STRING) || ':' || text", d)
    return textwrap.dedent(f"""
        SELECT shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM({dl.array_len(toks, d)}) AS BIGINT) AS n_tokens,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
               CAST(MAX(doc_id) AS BIGINT) AS max_doc_id,
               CAST(bit_xor({ck}) AS BIGINT) AS content_xor
        FROM (SELECT doc_id, text, {shard} AS shard_id FROM documents) t
        GROUP BY shard_id
    """)


register_sql(
    "shard_manifest",
    _shard_manifest,
    doc="Per-shard integrity manifest: counts, token volume, id bounds + "
    "order-independent XOR content checksum (bit-identical on re-export; "
    "one flipped doc flips its shard's checksum).",
)


#: Negatives per anchor document.
_NEG_K = 4


def _contrastive_pairs(d: str) -> str:
    """Deterministic negative sampling for contrastive training pairs:
    each document draws _NEG_K pseudo-random negatives via the md5
    universal hash over (doc_id, k) mod corpus size — reproducible across
    runs/engines, uniform over the corpus, no RNG state anywhere. Pairs
    whose draw lands on the anchor itself are dropped (the standard
    rejection; K is a target, not a guarantee, as in word2vec-style
    samplers).

    Shape: a constant K-row lateral fan-out, one corpus-size scalar
    (whitelisted global agg), and an equi-join back to ``documents`` to
    resolve the drawn id — fully partitioned, no global ordering. Relies
    on the fixtures' dense doc_id space (0..N-1, asserted by the join
    resolving every draw); production corpora index docs the same way or
    join through a rank table.
    """
    fan = dl.lateral_series(_NEG_K, "k", d)
    draw = dl.md5_i64("'neg:' || CAST(a.doc_id AS STRING) || ':' || CAST(k AS STRING)", d)
    return textwrap.dedent(f"""
        WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        draws AS (
            SELECT a.doc_id AS anchor_id, k,
                   ({draw} % n.n_docs) AS neg_id
            FROM documents a CROSS JOIN n {fan}
        )
        SELECT d2.anchor_id, d2.k, d2.neg_id, neg.source AS neg_source
        FROM (SELECT * FROM draws WHERE neg_id != anchor_id) d2
        JOIN documents neg ON d2.neg_id = neg.doc_id
    """)


register_sql(
    "contrastive_pairs",
    _contrastive_pairs,
    doc=f"Deterministic negative sampling ({_NEG_K} negatives/doc via the "
    "md5 universal hash mod corpus size): reproducible contrastive "
    "training pairs, K-row fan-out + equi-join, no RNG state.",
)


def _dataset_diff(d: str) -> str:
    """Snapshot diff — the regression check between two pipeline runs:
    full outer join of two corpus versions on doc_id, comparing a content
    fingerprint, emitting only added / removed / changed rows (unchanged
    docs — the overwhelming majority — are filtered before anything
    leaves the join). The two snapshots here are deterministic slices of
    the fixture corpus (run A drops doc_id % 10 == 0, run B drops
    doc_id % 13 == 0 and re-processes doc_id % 7 == 0 docs), so both
    engines derive identical inputs; production diffs two real manifest
    paths with the same plan.

    Scale shape: one equi-join on the id key + a fingerprint comparison —
    the cheapest possible diff; fingerprints mean the wide text column
    never crosses the shuffle.
    """
    fp = dl.md5_i64("text", d)
    fp_b = dl.md5_i64("upper(text)", d)
    return textwrap.dedent(f"""
        WITH snap_a AS (
            SELECT doc_id, {fp} AS fp FROM documents WHERE doc_id % 10 != 0
        ),
        snap_b AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN {fp_b} ELSE {fp} END AS fp
            FROM documents WHERE doc_id % 13 != 0
        )
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
               CASE
                 WHEN a.doc_id IS NULL THEN 'added'
                 WHEN b.doc_id IS NULL THEN 'removed'
                 ELSE 'changed'
               END AS status
        FROM snap_a a
        FULL OUTER JOIN snap_b b ON a.doc_id = b.doc_id
        WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.fp != b.fp
    """)


register_sql(
    "dataset_diff",
    _dataset_diff,
    doc="Snapshot diff between two corpus versions: full outer join on id "
    "+ fingerprint compare, emitting only added/removed/changed rows "
    "(the run-over-run regression check).",
)
