"""End-to-end corpus curation: the composed keep/drop/split manifest.

Every stage exists as its own registry entry; this operator is the proof
they COMPOSE — one declarative plan producing the final training
manifest a data pipeline actually ships (beyond-parity; the reference
has no text/curation surface at all):

1. exact dedup — deterministic min-doc_id survivor per content hash,
2. fuzzy dedup — drop the greater-id side of every verified
   MinHash-LSH near-dup pair (the practical pairwise shortcut to full
   cluster survivorship; `dedup_survivorship` is the cluster-canonical
   variant),
3. eval-set removal + decontamination — the eval slice and every
   training doc sharing a word 3-gram with it are excluded,
4. quality gates — hard length gate + unigram-LM perplexity cut,
5. deterministic 80/10/10 salted-hash split assignment.

Scale shape: strictly the union of its stages' shapes — banded LSH
self-join, broadcastable eval-shingle set, two bounded perplexity
shuffles, and pure-hash split/gating; composing them adds only doc_id
equi-joins (the manifest key), so no new shuffle class appears. The
Spark side (r10) cuts the fuzzy-dedup and decontamination legs from the
session-materialized shingle/minhash relations — the "materialize the
shingle relation once, join the persisted stage outputs" deployment
shape, held on the session's block manager instead of parquet (the
pre-r10 single-text form re-derived them per CTE reference: 10 corpus
scans, now 5 — the real scan gate pins the count). The DuckDB oracle
keeps the self-contained text, so the END-TO-END manifest stays
value-checked, not just the stages.

The whole composition renders in both dialects, so the driver
value-checks the END-TO-END manifest, not just the stages.
"""

from __future__ import annotations

from .. import dialect as dl
from ..registry import register_df
from .curation import EVAL_MOD, _decontaminate
from .dedup import NEARDUP_JACCARD_FLOOR, _dedup_exact, _minhash_lsh
from .pipeline import _SPLIT_SALT
from .text import _lm_perplexity, _quality

#: Perplexity cut: generous enough to keep the bulk of the corpus while
#: still exercising the gate (fixture ppl range ≈ 29–40).
PPL_MAX = 38.0


def _pipeline_tail(d: str) -> str:
    """The manifest SELECT over the staged CTEs — shared verbatim by the
    self-contained oracle text and the Spark matview-backed form, so the
    two can never drift."""
    split_h = f"substring(md5(CAST(d.doc_id AS STRING) || ':{_SPLIT_SALT}'), 1, 2)"
    return f"""SELECT d.doc_id,
       d.lang,
       p.n_tokens,
       p.perplexity,
       CASE WHEN {split_h} < 'cd' THEN 'train'
            WHEN {split_h} < 'e6' THEN 'val'
            ELSE 'test' END AS split
FROM documents d
JOIN exact_keep k ON k.doc_id = d.doc_id
JOIN quality q ON q.doc_id = d.doc_id
JOIN ppl p ON p.doc_id = d.doc_id
LEFT JOIN near_losers nl ON nl.doc_id = d.doc_id
LEFT JOIN contaminated c ON c.doc_id = d.doc_id
WHERE nl.doc_id IS NULL
  AND c.doc_id IS NULL
  AND d.doc_id % {EVAL_MOD} <> 0
  AND q.passes_length_gate = 1
  AND p.perplexity <= {PPL_MAX}
"""


def _curation_pipeline(d: str) -> str:
    """Self-contained form: the DuckDB oracle (it materializes the
    multi-referenced CTEs) and any single-shot caller."""
    return f"""
WITH exact_keep AS ({_dedup_exact(d)}),
near_pairs AS ({_minhash_lsh(d)}),
near_losers AS (SELECT DISTINCT doc_b AS doc_id FROM near_pairs),
contaminated AS (SELECT DISTINCT doc_id FROM ({_decontaminate(d)}) c),
quality AS ({_quality(d)}),
ppl AS ({_lm_perplexity(d)})
{_pipeline_tail(d)}"""


def _curation_pipeline_spark(spark, sf_dir):
    """Spark side over the session-materialized relations: the fuzzy-dedup
    leg cuts from the shared sh/sig/bands matviews (mh_alias_ctes) and
    decontamination slices the corpus shingle matview, so the composed
    manifest executes the shingle → minhash pipeline ONCE instead of once
    per CTE reference (10 -> ~6 corpus scans; Spark inlines
    multi-referenced CTEs — the class the r10 scan gate now counts for
    real). Stage semantics and the manifest tail are byte-shared with
    the oracle text."""
    from .curation import _decontaminate_body, corpus_shingle_view
    from .dedup import mh_alias_ctes, verified_pairs_ctes
    from .text import lm_unigram_dt_src

    d = dl.SPARK
    sh5 = corpus_shingle_view(spark, sf_dir)
    decon = _decontaminate_body(
        f"SELECT doc_id, shingle FROM {sh5} WHERE doc_id % {EVAL_MOD} <> 0",
        f"SELECT doc_id, shingle FROM {sh5} WHERE doc_id % {EVAL_MOD} = 0",
    )
    return spark.sql(
        f"""
WITH {mh_alias_ctes(spark, sf_dir)},
{verified_pairs_ctes()},
exact_keep AS ({_dedup_exact(d)}),
near_losers AS (
    SELECT DISTINCT doc_b AS doc_id FROM pairs
    WHERE jac >= {NEARDUP_JACCARD_FLOOR}
),
contaminated AS (SELECT DISTINCT doc_id FROM ({decon}) c),
quality AS ({_quality(d)}),
ppl AS ({_lm_perplexity(d, dt_src=lm_unigram_dt_src(spark, sf_dir))})
{_pipeline_tail(d)}"""
    )


register_df(
    "curation_pipeline",
    _curation_pipeline_spark,
    oracle_body=_curation_pipeline(dl.DUCK),
    doc="End-to-end curation manifest: exact+fuzzy dedup, eval removal + "
    "decontamination, length/perplexity gates, 80/10/10 split — one plan "
    "over the session-materialized shingle/minhash relations.",
)
