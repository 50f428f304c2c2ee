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
equi-joins (the manifest key), so no new shuffle class appears. Spark
INLINES CTEs, so the single-plan form re-derives the shared shingle/
token relations per reference (cheap at test scale; measured ~3 s at
sf0.1). At 100 TB a pipeline materializes the shingle relation and each
stage's keep/drop list once and joins the persisted outputs — exactly
the per-stage entries this operator composes, run individually with a
checkpoint between them; this entry is the semantics contract for that
composition, value-checked end-to-end.

The whole composition renders in both dialects, so the driver
value-checks the END-TO-END manifest, not just the stages.
"""

from __future__ import annotations

from ..registry import register_sql
from .curation import EVAL_MOD, _decontaminate
from .dedup import _dedup_exact, _minhash_lsh
from .pipeline import _SPLIT_SALT
from .text import _lm_perplexity, _quality

#: Perplexity cut: generous enough to keep the bulk of the corpus while
#: still exercising the gate (fixture ppl range ≈ 29–40).
PPL_MAX = 38.0


def _curation_pipeline(d: str) -> str:
    split_h = f"substring(md5(CAST(d.doc_id AS STRING) || ':{_SPLIT_SALT}'), 1, 2)"
    return f"""
WITH exact_keep AS ({_dedup_exact(d)}),
near_pairs AS ({_minhash_lsh(d)}),
near_losers AS (SELECT DISTINCT doc_b AS doc_id FROM near_pairs),
contaminated AS (SELECT DISTINCT doc_id FROM ({_decontaminate(d)}) c),
quality AS ({_quality(d)}),
ppl AS ({_lm_perplexity(d)})
SELECT d.doc_id,
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


register_sql(
    "curation_pipeline",
    _curation_pipeline,
    doc="End-to-end curation manifest: exact+fuzzy dedup, eval removal + "
    "decontamination, length/perplexity gates, 80/10/10 split — one plan.",
)
