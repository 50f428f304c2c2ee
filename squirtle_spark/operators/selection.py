"""Data-selection operators: importance resampling and repetition filters.

Quality filtering (text_quality / quality_classifier / lm_perplexity)
scores documents in isolation; *data selection* scores them against a
TARGET distribution — "keep the raw-crawl docs that look like the
high-quality corpus we actually want to train on". The canonical
published method is DSIR, Data Selection with Importance Resampling
(Xie et al., NeurIPS 2023, arXiv:2302.03169): fit two bag-of-hashed-
n-gram models — one on the target corpus, one on the raw pool — and
weight every raw document by its log likelihood ratio between them.

Beyond-parity (the reference engine has no text ops); dialect-shared
SQL, zero Python, so the DuckDB oracle value-checks the whole pipeline.
"""

from __future__ import annotations

import textwrap

from .. import dialect as dl
from ..registry import register_df

#: Hashed-feature space size. The paper uses 10k buckets at web scale;
#: 2048 keeps every bucket populated at test SF while preserving the
#: structure (collisions ARE the method — hashing is the model).
DSIR_BUCKETS = 2048

#: Feature salt: versions the hash so a model rebuild never silently
#: mixes with an old one.
_DSIR_SALT = "dsir-v1"


def _gram_rows(d: str, w: int) -> str:
    """All word w-grams (with multiplicity — counts are the model) per doc."""
    toks = dl.split_tokens("lower(trim(text))", d)
    fanout, one = dl.pos_shingle_fanout(w, d)
    return f"""
        SELECT doc_id, {one} AS gram
        FROM (SELECT doc_id, {toks} AS tk FROM documents) t
        {fanout}
    """


def _dsir_select(d: str) -> str:
    """DSIR importance weights for the raw pool against a target corpus.

    Target = the 'src0' documents (standing in for the curated corpus);
    raw pool = every other source (the crawl to select from). Features
    are word unigrams AND bigrams hashed into {DSIR_BUCKETS} buckets
    (arXiv:2302.03169 §3: hashed n-gram generative model). Per-bucket
    probabilities are Laplace-smoothed over the full bucket space; each
    raw doc's importance weight is

        log w(x) = sum_f  c_f(x) * ( ln p_target(f) - ln p_raw(f) )

    and the deterministic selection rule keeps docs with log w >= 0
    (more target-like than raw-like). The paper samples with Gumbel
    noise; the threshold form is the reproducible variant a pipeline
    can re-run and diff (RNG-free, like split_train_val_test).

    Scale shape: the gram fan-out is a per-row projection; per-(doc,
    feature) counts are ONE shuffle keyed on doc_id (map-side partial
    agg); both models collapse to <= {DSIR_BUCKETS} rows each, so the
    log-ratio table is a BROADCAST join against the scoring pass —
    at 100 TB the model fit is two bounded reductions and scoring never
    shuffles anything wider than (doc_id, bucket). Per-feature log
    ratios round to DECIMAL(18,9) before the per-doc sum accumulates
    through DECIMAL (the lm_perplexity pattern), so partition/merge
    order cannot perturb the result and DuckDB replays it exactly.
    The sum is emitted at full 9-dp precision with NO final re-round:
    the exact decimal sums frequently land on .5e-6 half-way points,
    where Spark's exact HALF_UP and DuckDB's double-math round()
    disagree — decimal→nearest-double is deterministic, a second
    rounding of that double is not.
    """
    return textwrap.dedent(f"""
        WITH {_dsir_tagged_ctes(d)},
        {_dsir_scoring_body(d)}
    """)


def _dsir_tagged_ctes(d: str) -> str:
    """CTE chain ``grams``/``feats``/``tagged``: the DSIR feature table —
    per-(doc, hashed-n-gram-bucket) counts tagged with the doc's source.
    This is the relation a real DSIR deployment persists (the paper's
    feature-extraction artifact); the registered Spark side materializes
    it once per session via catalog.session_matview, because the scoring
    body references it twice and Spark would inline (re-execute) the
    gram fan-out per reference."""
    f_expr = dl.md5_i64(f"'{_DSIR_SALT}|' || gram", d)
    b = DSIR_BUCKETS
    return textwrap.dedent(f"""\
        grams AS (
            {_gram_rows(d, 1)}
            UNION ALL
            {_gram_rows(d, 2)}
        ),
        feats AS (
            -- hash per OCCURRENCE then one (doc_id, f)-keyed agg: A/B'd
            -- against hashing the distinct-gram vocabulary and joining
            -- back (2.4-3.0s vs 3.0-3.2s at sf0.1) — the join's extra
            -- gram-keyed shuffle costs more than the md5 calls it saves,
            -- and this form is ONE shuffle. xxhash64 is the production
            -- drop-in hash; md5 keeps the oracle replay bit-identical.
            SELECT doc_id, f, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT doc_id, ({f_expr}) % {b} AS f FROM grams) x
            GROUP BY doc_id, f
        ),
        tagged AS (
            SELECT ft.doc_id, ft.f, ft.n, dc.source
            FROM feats ft JOIN documents dc ON dc.doc_id = ft.doc_id
        )""")


def _dsir_scoring_body(d: str) -> str:
    """Model fit + scoring over ``tagged`` (models → llr → scored →
    final SELECT) — shared verbatim by the self-contained oracle text
    and the Spark side's materialized-view form."""
    b = DSIR_BUCKETS
    return textwrap.dedent(f"""\
        models AS (
            -- BOTH models in one conditional-aggregation pass over
            -- tagged. The earlier tgt/raw/DISTINCT-f formulation
            -- referenced the gram fan-out FOUR times, and Spark INLINES
            -- CTEs (DuckDB materializes them) — so the fan-out + its
            -- (doc_id, f) shuffle executed 4x on the Spark side.
            -- Equivalence: tagged's f domain == feats' (every doc has a
            -- documents row), absent-in-source buckets aggregate to 0
            -- exactly as the old COALESCE(c, 0) did, and the LN inputs
            -- are the same integers.
            SELECT f,
                   CAST(SUM(CASE WHEN source = 'src0' THEN n ELSE 0 END) AS BIGINT) AS tc,
                   CAST(SUM(CASE WHEN source <> 'src0' THEN n ELSE 0 END) AS BIGINT) AS rc
            FROM tagged
            GROUP BY f
        ),
        totals AS (
            SELECT CAST(SUM(tc) AS DOUBLE) AS t_total,
                   CAST(SUM(rc) AS DOUBLE) AS r_total
            FROM models
        ),
        llr AS (
            SELECT m.f,
                   CAST(ROUND(
                       LN((m.tc + 1.0) / (tt.t_total + {b}))
                     - LN((m.rc + 1.0) / (tt.r_total + {b})),
                   9) AS DECIMAL(18,9)) AS llr
            FROM models m CROSS JOIN totals tt
        ),
        scored AS (
            -- BROADCAST(l): llr is <= {b} rows by construction (one per
            -- hashed bucket) but flows out of a checkpointed matview
            -- aggregation whose size estimate Spark can't see, so the
            -- planner fell back to a SortMergeJoin that re-shuffled the
            -- whole tagged relation by f (r15 before-plan, Exchange +
            -- 2 Sorts). The hint pins the join shape the docstring
            -- promises; DuckDB reads the hint as a comment.
            SELECT /*+ BROADCAST(l) */ t.doc_id,
                   {dl.bsum("t.n", d)} AS n_grams,
                   -- count bounded to DECIMAL(10,0): BIGINT * DECIMAL(18,9)
                   -- would need precision 39 > 38, making Spark silently
                   -- drop the 9th decimal (precision-loss scale reduction)
                   -- while DuckDB keeps it — the one place the two engines'
                   -- decimal type algebra diverges.
                   {dl.dsum("CAST(t.n AS DECIMAL(10,0)) * l.llr", d, "DECIMAL(28,9)")} AS log_w
            FROM tagged t
            JOIN llr l ON l.f = t.f
            WHERE t.source <> 'src0'
            GROUP BY t.doc_id
        )
        SELECT doc_id,
               n_grams,
               log_w AS dsir_log_weight,
               CASE WHEN log_w >= 0 THEN 1 ELSE 0 END AS selected
        FROM scored
    """)


def _dsir_select_spark(spark, sf_dir):
    """Spark side of dsir_select over the session-materialized feature
    table: ``tagged`` builds once (gram fan-out + ONE (doc_id, f)
    shuffle) and both its references — the model fit and the scoring
    join — scan the checkpointed rows; the previous inline form
    re-executed the fan-out per reference (9 corpus scans in the plan)."""
    from .. import catalog

    view = catalog.session_matview(
        spark,
        "dsir_tagged",
        sf_dir,
        f"WITH {_dsir_tagged_ctes(dl.SPARK)}\nSELECT * FROM tagged",
    )
    return spark.sql(
        f"WITH tagged AS (SELECT * FROM {view}),\n{_dsir_scoring_body(dl.SPARK)}"
    )


register_df(
    "dsir_select",
    _dsir_select_spark,
    oracle_body=_dsir_select(dl.DUCK),
    doc="DSIR data selection (arXiv:2302.03169): hashed-n-gram importance "
    "weight of each raw-pool doc vs the target corpus, DECIMAL-exact.",
    bench=True,
)


#: Gopher repetition gates (Rae et al., arXiv:2112.11446 Table A1): max
#: fraction of characters in the single most frequent word n-gram, and
#: max fraction of tokens covered by word 5-grams repeated WITHIN the doc.
GOPHER_TOP2_MAX = 0.20
GOPHER_TOP3_MAX = 0.18
GOPHER_DUP5_MAX = 0.15


def _top_gram_ctes(d: str, w: int) -> str:
    """CTEs ``cnt{w}``/``top{w}``: per-doc count of every word w-gram, then
    the single most frequent one (ties: longest gram, then lexicographic —
    deterministic so both engines pick the same winner) with the
    characters it accounts for (count x gram length, the paper's measure;
    overlaps are not de-overlapped, matching the published definition)."""
    fanout, one = dl.pos_shingle_fanout(w, d)
    return f"""
        cnt{w} AS (
            SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT doc_id, {one} AS gram FROM tk {fanout}) g
            GROUP BY doc_id, gram
        ),
        top{w} AS (
            SELECT doc_id, c * length(gram) AS top_chars
            FROM (
                SELECT doc_id, gram, c,
                       ROW_NUMBER() OVER (
                           PARTITION BY doc_id
                           ORDER BY c DESC, length(gram) DESC, gram ASC) AS rn
                FROM cnt{w}
            ) r WHERE rn = 1
        )"""


def _gopher_repetition(d: str, tk_src: str | None = None) -> str:
    """Gopher repetition filters (arXiv:2112.11446 §A.1.1): per document,
    the fraction of characters in the most frequent word {{2,3}}-gram and
    the fraction of tokens covered by word 5-grams that repeat WITHIN the
    document, gated at the paper's thresholds ({GOPHER_TOP2_MAX}/
    {GOPHER_TOP3_MAX}/{GOPHER_DUP5_MAX}). The paper's remaining signals
    (line/paragraph duplication, n in {{4,6..10}}) are the same two plan
    shapes at other widths — elided, not hard. text.text_repetition is
    the cheap count-based screen of the same idea (top-token/top-bigram
    OCCURRENCE fractions, one pass); this entry is the paper-faithful
    character-based gate plus the span-coverage signal the screen lacks.

    The intra-doc duplicated-5-gram coverage reuses dedup_spans'
    gaps-and-islands interval union, but keyed on repeats inside one doc
    (catching loops/babble) where dedup_spans keys on cross-doc sharing
    (catching boilerplate) — complementary signals, same 100 TB shape:
    positional fan-out is linear, every aggregation is keyed on doc_id
    or (doc_id, gram), no shuffle wider than the shingle pass, and the
    per-doc character base is length of the single-space-normalized
    token join, so the ratios are integer-derived and engine-exact.
    """
    toks = dl.split_tokens("lower(trim(text))", d)
    if tk_src is None:
        tk_src = f"SELECT doc_id, {toks} AS tk FROM documents"
    join_sp = "concat_ws(' ', tk)" if d == dl.SPARK else "array_to_string(tk, ' ')"
    fanout5, one5 = dl.pos_shingle_fanout(5, d)
    return textwrap.dedent(f"""
        WITH tk AS (
            {tk_src}
        ),
        base AS (
            SELECT doc_id,
                   {dl.array_len("tk", d)} AS n_tok,
                   CAST(length({join_sp}) AS BIGINT) AS n_chars
            FROM tk
        ),
        {_top_gram_ctes(d, 2)},
        {_top_gram_ctes(d, 3)},
        pos5 AS (
            SELECT doc_id, pos, {one5} AS sh FROM tk {fanout5}
        ),
        rep5 AS (
            SELECT doc_id, sh FROM pos5
            GROUP BY doc_id, sh HAVING COUNT(*) >= 2
        ),
        dup AS (
            SELECT p.doc_id, p.pos
            FROM pos5 p JOIN rep5 r ON r.doc_id = p.doc_id AND r.sh = p.sh
        ),
        brk AS (
            SELECT doc_id, pos,
                   CASE WHEN pos > LAG(pos) OVER (
                            PARTITION BY doc_id ORDER BY pos) + 4
                        THEN 1 ELSE 0 END AS new_island
            FROM dup
        ),
        grp AS (
            SELECT doc_id, pos,
                   SUM(new_island) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
            FROM brk
        ),
        spans AS (
            SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 4 AS e
            FROM grp GROUP BY doc_id, island
        ),
        cov AS (
            SELECT doc_id, CAST(SUM(e - s + 1) AS BIGINT) AS dup5_tokens
            FROM spans GROUP BY doc_id
        )
        SELECT b.doc_id,
               b.n_tok,
               ROUND(CAST(COALESCE(t2.top_chars, 0) AS DOUBLE) / b.n_chars, 4)
                   AS top2_char_frac,
               ROUND(CAST(COALESCE(t3.top_chars, 0) AS DOUBLE) / b.n_chars, 4)
                   AS top3_char_frac,
               ROUND(CAST(COALESCE(c.dup5_tokens, 0) AS DOUBLE) / b.n_tok, 4)
                   AS dup5_token_frac,
               CAST(
                 CAST(COALESCE(t2.top_chars, 0) AS DOUBLE) / b.n_chars
                     <= {GOPHER_TOP2_MAX}
                 AND CAST(COALESCE(t3.top_chars, 0) AS DOUBLE) / b.n_chars
                     <= {GOPHER_TOP3_MAX}
                 AND CAST(COALESCE(c.dup5_tokens, 0) AS DOUBLE) / b.n_tok
                     <= {GOPHER_DUP5_MAX}
               AS INT) AS gate_pass
        FROM base b
        LEFT JOIN top2 t2 ON t2.doc_id = b.doc_id
        LEFT JOIN top3 t3 ON t3.doc_id = b.doc_id
        LEFT JOIN cov c ON c.doc_id = b.doc_id
        WHERE b.n_tok > 0
    """)


def _gopher_repetition_spark(spark, sf_dir):
    """Spark side over the session-materialized token-array relation:
    `tk` is referenced by the char base, both top-gram widths and the
    5-gram positional fan-out, and Spark inlines multi-referenced CTEs —
    the self-contained form re-tokenized the corpus 5x per run."""
    from .. import catalog

    toks = dl.split_tokens("lower(trim(text))", dl.SPARK)
    view = catalog.session_matview(
        spark,
        "tok_arr",
        sf_dir,
        f"SELECT doc_id, {toks} AS tk FROM documents",
        # r15 opt (guide §2.4): every downstream stage — both top-gram
        # count+argmax chains, the 5-gram repeat/coverage chain, the
        # final joins — clusters on doc_id or (doc_id, gram); a
        # doc_id-partitioned matview makes all 6 Exchanges disappear.
        distribute_by="doc_id",
    )
    return spark.sql(
        _gopher_repetition(
            dl.SPARK, tk_src=f"SELECT doc_id, tk FROM {view}"
        )
    )


register_df(
    "gopher_repetition",
    _gopher_repetition_spark,
    oracle_body=_gopher_repetition(dl.DUCK),
    doc="Gopher repetition filters (arXiv:2112.11446): top-{2,3}-gram "
    "character fraction + intra-doc duplicated-5-gram token coverage, "
    "gated at the paper's thresholds.",
    bench=True,
)


#: Deterministic "held-out" subset for threshold fitting: CCNet fits its
#: perplexity cutoffs on a sample, then scores the corpus against them.
CCNET_SAMPLE_MOD = 5


def _ccnet_buckets(d: str, dt_src: str | None = None) -> str:
    """CCNet perplexity bucketing (Wenzek et al., arXiv:1911.00359 §4.3):
    per language, split documents into head/middle/tail quality buckets
    by LM perplexity. Mirrors the paper's two-phase shape — tercile
    THRESHOLDS are fitted on a deterministic held-out sample (doc_id %
    {CCNET_SAMPLE_MOD} = 0, the paper's held-out split made replayable),
    then the WHOLE corpus is assigned by comparison against them.

    That split is also the 100 TB shape: the only sort is a ROW_NUMBER
    over the per-lang sample (bounded; at cluster scale a fraction-of-a-
    percent sample), the threshold table is languages x 2 rows and
    BROADCASTS into the scoring pass, and corpus assignment is a pure
    projection — no per-lang global sort of the full data, which is what
    a naive NTILE(3) formulation would cost (one task per language).
    Perplexities come from the shared lm_perplexity entry (unigram LM,
    DECIMAL-exact NLL, 4-dp rounding) so thresholds and scores are the
    same engine-identical numbers on both sides of the comparison.
    ``dt_src`` routes the Spark side's LM through the ret_tf matview
    (lm_perplexity's own conversion), cutting the corpus re-tokenize.
    """
    from .text import _lm_perplexity

    m = CCNET_SAMPLE_MOD
    return textwrap.dedent(f"""
        WITH perp AS (
            SELECT p.doc_id, dc.lang, p.perplexity
            FROM ({_lm_perplexity(d, dt_src=dt_src)}) p
            JOIN documents dc ON dc.doc_id = p.doc_id
        ),
        ranked AS (
            SELECT lang, perplexity,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY perplexity, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS n
            FROM perp WHERE doc_id % {m} = 0
        ),
        cuts AS (
            SELECT lang,
                   MAX(CASE WHEN rn = CAST(CEIL(n / 3.0) AS INT)
                            THEN perplexity END) AS t_head,
                   MAX(CASE WHEN rn = CAST(CEIL(2 * n / 3.0) AS INT)
                            THEN perplexity END) AS t_middle
            FROM ranked GROUP BY lang
        )
        SELECT p.doc_id, p.lang, p.perplexity,
               -- LEFT JOIN + explicit 'unsampled': a language with no doc
               -- in the held-out sample has no thresholds, and an inner
               -- join would silently DROP its documents (round-6 review
               -- finding); they surface with an honest bucket instead.
               CASE WHEN c.t_head IS NULL THEN 'unsampled'
                    WHEN p.perplexity <= c.t_head THEN 'head'
                    WHEN p.perplexity <= c.t_middle THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM perp p LEFT JOIN cuts c ON c.lang = p.lang
    """)


def _ccnet_buckets_spark(spark, sf_dir):
    from .text import lm_unigram_dt_src

    return spark.sql(
        _ccnet_buckets(dl.SPARK, dt_src=lm_unigram_dt_src(spark, sf_dir))
    )


register_df(
    "ccnet_buckets",
    _ccnet_buckets_spark,
    oracle_body=_ccnet_buckets(dl.DUCK),
    doc="CCNet head/middle/tail perplexity buckets per language: tercile "
    "thresholds fitted on a deterministic held-out sample, corpus "
    "assigned by broadcast comparison (no per-lang global sort).",
)


def _quality_scorecard(d: str) -> str:
    """One row per document with every selection gate's verdict and the
    composed keep decision — the audit table a curation run publishes so
    a rejected doc is always explainable (which gate, what value). Joins
    four independent signal families: quality_classifier (model margin),
    gopher_repetition (paper gate), ccnet_buckets (corpus-relative
    perplexity tier), dsir_select (target-likeness; target-corpus docs
    aren't scored by DSIR and pass that gate by definition). Composed
    keep = classifier AND repetition AND not perplexity-tail AND
    DSIR-selected. Every non-classifier leg is a LEFT JOIN with an
    explicit pass default: a doc a gate cannot score (zero tokens -> no
    repetition row; no LM row; unsampled language) must still appear in
    the audit table — REJECTED rows you can explain, never rows that
    vanish (round-6 review finding). Each family is its own
    oracle-checked registry entry; this entry proves they COMPOSE —
    doc_id equi-joins only, so the composition adds joins but no new
    shuffle shapes, and the whole scorecard remains value-replayable.

    This is the DuckDB oracle text (self-contained; DuckDB materializes
    the multi-referenced CTEs). The Spark side composes the REGISTERED
    leg builders instead (_quality_scorecard_spark below) so the gopher
    and DSIR legs read their session matviews — inlining this text on
    the Spark side re-derived each leg's corpus relations from scratch
    (16 documents scans; the vacuous-gate class r10 surfaced)."""
    from .text import _quality_classifier

    return textwrap.dedent(f"""
        WITH qc AS ({_quality_classifier(d)}),
        rep AS ({_gopher_repetition(d)}),
        ppl AS ({_ccnet_buckets(d)}),
        ds AS ({_dsir_select(d)})
        SELECT qc.doc_id,
               qc.keep AS classifier_keep,
               COALESCE(rep.gate_pass, 1) AS repetition_pass,
               COALESCE(ppl.bucket, 'unscored') AS perplexity_bucket,
               COALESCE(ds.selected, 1) AS dsir_selected,
               CAST(qc.keep = 1
                    AND COALESCE(rep.gate_pass, 1) = 1
                    AND COALESCE(ppl.bucket, 'unscored') <> 'tail'
                    AND COALESCE(ds.selected, 1) = 1 AS INT) AS keep
        FROM qc
        LEFT JOIN rep ON rep.doc_id = qc.doc_id
        LEFT JOIN ppl ON ppl.doc_id = qc.doc_id
        LEFT JOIN ds ON ds.doc_id = qc.doc_id
    """)


def _quality_scorecard_spark(spark, sf_dir):
    """Spark composition over the registered (matview-backed) legs —
    same joins and defaults as the oracle text, 16 -> 5 corpus scans."""
    from pyspark.sql import functions as F

    from .text import _quality_classifier

    qc = spark.sql(_quality_classifier(dl.SPARK))
    rep = _gopher_repetition_spark(spark, sf_dir)
    ppl = _ccnet_buckets_spark(spark, sf_dir)
    ds = _dsir_select_spark(spark, sf_dir)
    rep_pass = F.coalesce(F.col("gate_pass"), F.lit(1))
    ppl_bucket = F.coalesce(F.col("bucket"), F.lit("unscored"))
    ds_sel = F.coalesce(F.col("selected"), F.lit(1))
    return (
        qc.select("doc_id", "keep")
        .join(rep.select("doc_id", "gate_pass"), "doc_id", "left")
        .join(ppl.select("doc_id", "bucket"), "doc_id", "left")
        .join(ds.select("doc_id", "selected"), "doc_id", "left")
        .select(
            "doc_id",
            F.col("keep").alias("classifier_keep"),
            rep_pass.alias("repetition_pass"),
            ppl_bucket.alias("perplexity_bucket"),
            ds_sel.alias("dsir_selected"),
            (
                (F.col("keep") == 1)
                & (rep_pass == 1)
                & (ppl_bucket != "tail")
                & (ds_sel == 1)
            )
            .cast("int")
            .alias("keep"),
        )
    )


register_df(
    "quality_scorecard",
    _quality_scorecard_spark,
    oracle_body=_quality_scorecard(dl.DUCK),
    doc="Per-doc audit table composing classifier, Gopher repetition, "
    "CCNet bucket, and DSIR gates into one explainable keep decision "
    "(matview-backed legs on Spark, doc_id equi-joins only).",
)
