"""Query registry: one place every implemented operator/query signs in.

``__spark_entry__.queries()`` / ``oracle_sql()`` and the pytest oracle
harness all iterate this registry, so adding a query here automatically
wires it into the correctness gate, the test suite and (if flagged) the
benchmark.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from . import catalog
from .dialect import DUCK, SPARK


@dataclass
class Query:
    name: str
    #: (spark, sf_dir) -> DataFrame; must register whatever views it needs.
    spark_fn: Callable[[SparkSession, str], DataFrame]
    #: Self-contained DuckDB SQL over the driver's pre-registered parquet
    #: views, or None for non-SQL-expressible ops (rows-only check).
    oracle: str | None
    doc: str = ""
    #: Include in bench.py's headline run.
    bench: bool = False
    tags: list[str] = field(default_factory=list)


QUERIES: dict[str, Query] = {}


def _add(q: Query) -> Query:
    if q.name in QUERIES:
        raise ValueError(f"duplicate query name: {q.name}")
    QUERIES[q.name] = q
    return q


def register_sql(
    name: str,
    body_fn: Callable[[str], str],
    doc: str = "",
    bench: bool = False,
    tags: list[str] | None = None,
) -> Query:
    """Register a dialect-parameterized SQL query.

    ``body_fn(dialect)`` must render the same semantics in Spark SQL (run
    against the temp views catalog.register_all creates) and DuckDB (run
    against the parquet views + derived-view CTE prefix).
    """

    def spark_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        catalog.register_all(spark, sf_dir)
        return spark.sql(body_fn(SPARK))

    return _add(
        Query(
            name=name,
            spark_fn=spark_fn,
            oracle=catalog.wrap_oracle(body_fn(DUCK)),
            doc=doc,
            bench=bench,
            tags=tags or [],
        )
    )


def register_df(
    name: str,
    df_fn: Callable[[SparkSession, str], DataFrame],
    oracle_body: str | None = None,
    doc: str = "",
    bench: bool = False,
    tags: list[str] | None = None,
) -> Query:
    """Register a DataFrame-API query with an optional hand-written oracle."""

    def spark_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        catalog.register_all(spark, sf_dir)
        return df_fn(spark, sf_dir)

    return _add(
        Query(
            name=name,
            spark_fn=spark_fn,
            oracle=catalog.wrap_oracle(oracle_body) if oracle_body else None,
            doc=doc,
            bench=bench,
            tags=tags or [],
        )
    )


#: Round-5 budget spend: every slot of the 50-entry driver budget goes to
#: registry entries that have NEVER had a driver row in any round — the
#: 16 never-checked entries VERDICT r4 listed, plus every round-5
#: addition (each r2–r4-green entry rotated out keeps its pytest oracle
#: and an in-budget family sibling, see _DEFER). Entries registered after
#: the budget filled (k_anonymity, dataset_diff, winsorize_values,
#: equidepth_histogram, cdc_merge_apply, salted_join_agg) take their
#: first driver row next round; see the tail of _DEFER.
_PROMOTE = [
    "tpch_q2",  # partsupp-view unlock (min-cost supplier correlated subq)
    "tpch_q9",  # partsupp product-profit 6-way join
    "tpch_q11",  # partsupp group HAVING vs global scalar
    "tpch_q16",  # partsupp NOT IN + count-distinct
    "tpch_q20",  # partsupp nested IN-subquery chain
    "tpch_q21",  # lineitem_ext multi-EXISTS (receipt/commit dates)
    "tpch_q12_shipmode",  # lineitem_ext date-arith conditional agg
    "nexmark_q12_invariant",  # proc-time q12's checkable invariant form
    "set_ops",  # UNION/INTERSECT/EXCEPT
    "subq_scalar_in",  # scalar + IN subqueries
    "token_count",  # whitespace+BPE-ish tokenization
    "unpivot_event_matrix",  # stack() unpivot
    "win_cumulative",  # running-total frame
    "win_elementwise_epoch",  # per-epoch elementwise window class
    "kmeans_lloyd",  # iterative Lloyd loop (rows-only: iterative, no SQL oracle)
    "multimodal_framesample",  # mapInPandas N→M frame explosion
    # Round-5 additions that register late in import order: pinned here so
    # further registrations can't push them past the budget before their
    # first driver row.
    "bm25_topk",
    "inverted_index",
    "ann_pq_topk",
    "agg_grouping_sets",
    "bpe_merge_step",
    # Remaining round-5 additions that had never had a driver row; ten
    # r2–r4-green entries rotate into _DEFER to fund these slots.
    "lm_score_new_batch",
    "zipf_slope",
    "curation_pipeline",
    "embedding_profile",
    "corpus_report",
    "join_skew_report",
    "ann_sq8_topk",
    "session_paths",
    "event_transitions",
    "ts_anomaly",
    # Session-2 round-5 additions (never driver-checked; funded by rotating
    # r4-green re-check slots into _DEFER).
    "textrank_keywords",
    "collocation_pmi",
    "scd2_dimension",
    "interval_overlap_join",
    "benford_digits",
    "incremental_agg_merge",
    "quality_calibration",
    "psi_drift",
    "shard_manifest",
    "contrastive_pairs",
]

#: Entries deferred past the budget: each was driver-green in r2–r4 or is
#: redundant with a stronger in-budget representative of the same
#: operator class, and keeps its full pytest oracle/contract regardless
#: of order.
_DEFER = [
    # Rows-only by nature (engine-specific sketches): their driver row can
    # only prove rows>0, while the real evidence is the pytest error-bound
    # contracts — don't let them displace oracle-bearing entries.
    "sketch_merge_distinct",
    "approx_topk_tokens",
    "approx_sketch_stats",
    "dq_profile_approx",  # bound-tested vs the exact dq_profile entry
    # Evidence subsumed since dedup_minhash_lsh became fully oracle-checked:
    # its verify stage embeds the identical exact-Jaccard computation.
    "dedup_ngram_jaccard",
    # Same plan/evidence class as an in-budget sibling: sample_domain_cap
    # is the per-group hash-quota shape sample_stratified evidences, and
    # pivot is conditional aggregation the multi-key agg family evidences.
    "sample_domain_cap",
    "pivot_event_matrix",
    # shard_corpus evidences the same pure-hash assignment shape (and adds
    # the in-shard order window).
    "split_train_val_test",
    # Driver-green in r4 and redundant with in-budget siblings (pure
    # codegen per-row projections: dedup_exact's md5 fingerprint /
    # text_stats+text_quality's regex-count shape) — deferred so the
    # round-5 additions bm25_topk and inverted_index, which have never
    # had a driver row, fit inside the 50-entry budget.
    "doc_fingerprint",
    "lang_id",
    # r4-green; multimodal_decode drives the same binary-column path plus
    # the Arrow-batched codec, so meta's projection-only row is redundant.
    "multimodal_meta",
    # r4-green; dq_profile (in-budget) evidences the same single-wide-agg
    # profiling class.
    "value_histogram",
    # r4-green rotations funding first driver rows for round-5 additions
    # (each keeps its pytest oracle and an in-budget family sibling:
    # rangejoin for asof, kmeans_lloyd for assign, sample_weighted for
    # stratified, chunk_documents for pack_sequences, dedup_exact +
    # survivor joins elsewhere for survivorship/incremental, text_quality
    # family for length-quantiles).
    "asof_join_events",
    "kmeans_assign",
    "decontaminate_ngram_overlap",
    "dedup_incremental",
    "shard_corpus",
    "sample_stratified",
    "mixture_weights",
    "dedup_survivorship",
    "pack_sequences",
    "text_length_quantiles",
    # r4-green; the pure-projection text class keeps three in-budget
    # representatives (text_quality, quality_classifier, and the promoted
    # token_count) — stats' row is redundant with them.
    "text_stats",
    # r4-green rotations funding the session-2 round-5 additions above
    # (sample_weighted's A-ES top-K shape stays evidenced by
    # sample_stratified's pytest oracle + the r4 row; chunk_documents'
    # lateral fan-out is the same shape the promoted token/shingle
    # operators re-evidence).
    "sample_weighted",
    "chunk_documents",
    # r4-green; corpus-grain scalar/agg shape stays in-budget via
    # zipf_slope + corpus_report, regex-projection shape via text_quality
    # + quality_classifier.
    "tfidf_top_terms",
    "pii_scrub",
    "text_repetition",
    # r4-green; the hash-group dedup shape stays evidenced in-budget by
    # dedup_minhash_lsh's verify stage and curation_pipeline's exact-dedup
    # stage.
    "dedup_exact",
    # r4-green; minhash stays in-budget as the stronger banded-LSH
    # representative, and the quality family keeps quality_classifier +
    # quality_calibration + token_count in-budget.
    "dedup_simhash",
    "text_quality",
    # r4-green; the banded-LSH pipeline stays in-budget through
    # lsh_quality_report (which embeds the identical signature/bucket
    # stages plus the recall contract) and the clusters' component logic
    # through neardup_transitive_pairs.
    "dedup_minhash_lsh",
    "dedup_clusters",
    # Registered after the round-5 budget filled (50 never-checked entries
    # already occupy every slot). Deferring them EXPLICITLY — rather than
    # letting import order decide — keeps the 50 head slots on the entries
    # the round's evidence plan chose; these six take their first driver
    # row next round. Each keeps its full pytest oracle meanwhile.
    "k_anonymity",
    "dataset_diff",
    "winsorize_values",
    "equidepth_histogram",
    "cdc_merge_apply",
    "salted_join_agg",
    "dq_constraints",
    "win_time_range",
]

#: Budget-ordered registry, computed on the first load_all() call. Later
#: calls find every module already imported, so the "registered before
#: nexmark" snapshot below would swallow the whole registry and silently
#: revert to insertion order — the order must be pinned once.
_ORDERED: dict[str, Query] | None = None


def load_all() -> dict[str, Query]:
    """Import every query module (each registers itself) and return the registry.

    Iteration order IS driver-check order: the driver walks ``queries()``
    in insertion order and (round 2) truncated after 50 entries, so order
    is evidence allocation. Round 5 spends the budget on the 16 entries
    that have never had a driver row (_PROMOTE, pinned inside the first
    50 by construction); the rest of the budget re-checks novel operators.
    Rotated-out entries stay covered by the pytest DuckDB-oracle sweep.
    """
    global _ORDERED
    if _ORDERED is not None:
        return _ORDERED

    from .operators import (  # noqa: F401
        asof,
        clustering,
        curation,
        dedup,
        e2e,
        graphrank,
        multimodal,
        pipeline,
        profiling,
        rangejoin,
        retrieval,
        similarity,
        sketches,
        text,
        timeseries,
        warehouse,
    )
    from .queries import analytics, windows, ysb  # noqa: F401

    novel = [n for n in QUERIES if n not in _DEFER and n not in _PROMOTE]

    from .queries import nexmark  # noqa: F401  (declared queries before basics)
    from .queries import core  # noqa: F401  (nexmark already evidences §2.2-2.6)
    from .queries import generators, tpch  # noqa: F401

    # Validate AFTER every module has registered: _DEFER may name entries
    # from any import block (late-block names order past the head anyway;
    # listing them still documents the explicit deferral).
    missing = [n for n in _DEFER if n not in QUERIES]
    assert not missing, f"_DEFER names unknown queries: {missing}"
    missing = [n for n in _PROMOTE if n not in QUERIES]
    assert not missing, f"_PROMOTE names unknown queries: {missing}"
    # Pin the promoted headliners at the END of the 50-entry check budget
    # BY CONSTRUCTION so new operator registrations can never push them
    # past it; the novel tail continues right after them.
    cut = 50 - len(_PROMOTE)
    head = novel[:cut] + _PROMOTE + novel[cut:]
    ordered = {n: QUERIES[n] for n in head}
    ordered.update((n, q) for n, q in QUERIES.items() if n not in ordered)
    assert len(ordered) == len(QUERIES)
    _ORDERED = ordered
    return ordered
