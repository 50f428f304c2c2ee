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


#: Round-6 budget: ordering is now COMPUTED from the driver's own
#: CORRECTNESS_r*.json artifacts (squirtle_spark/budget.py — VERDICT r5
#: "Next round" item 6): never-driver-checked entries first (this round:
#: the 9 backlog entries VERDICT r5 listed plus every round-6 addition),
#: then checked entries oldest-evidence-first so nothing coasts forever
#: on an early-round row. The hand ledgers are reduced to pins.
#: Pinned to the head regardless of history — judgment-call re-checks.
#: Round 9: EMPTY. Round 8's generator pins did their job (all four
#: value-oracle upgrades were driver-recorded green in CORRECTNESS_r08)
#: and holding them would burn 4 of the 50 slots on the freshest
#: evidence in the registry while the r5 cohort is the oldest; the
#: mechanical rotation now allocates every slot.
_PIN_HEAD: list[str] = []

#: Pinned last: rows-only-by-nature sketches whose driver row can only
#: prove rows>0 (their real evidence is the pytest error-bound
#: contracts, and each already holds a cumulative driver row) — they
#: must not displace an oracle-bearing entry from the budget.
_PIN_TAIL = [
    "sketch_merge_distinct",
    "approx_topk_tokens",
    "approx_sketch_stats",
    # r11: every rows-only-by-nature entry now has an oracle-green
    # deterministic twin (*_contract / nexmark_q12_virtual_clock), so the
    # engine-native forms all move here — their driver row can only ever
    # prove rows>0 and must not displace an oracle-bearing re-check.
    "dq_profile_approx",
    "nexmark_q12",
]

#: Budget-ordered registry, computed on the first load_all() call. Later
#: calls find every module already imported, so the "registered before
#: nexmark" snapshot below would swallow the whole registry and silently
#: revert to insertion order — the order must be pinned once.
_ORDERED: dict[str, Query] | None = None


def load_all() -> dict[str, Query]:
    """Import every query module (each registers itself) and return the registry.

    Iteration order IS driver-check order: the driver walks ``queries()``
    in insertion order and truncates after 50 entries, so order is
    evidence allocation. The order is computed from the recorded
    CORRECTNESS_r*.json history (budget.budget_order): never-checked
    entries head the list, then oldest-evidence-first rotation.
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
        pii,
        pipeline,
        profiling,
        rangejoin,
        retrieval,
        selection,
        similarity,
        sketches,
        text,
        timeseries,
        warehouse,
    )
    from .queries import analytics, windows, ysb  # noqa: F401

    from .queries import nexmark  # noqa: F401  (declared queries before basics)
    from .queries import core  # noqa: F401  (nexmark already evidences §2.2-2.6)
    from .queries import generators, tpch  # noqa: F401

    from . import budget as _budget

    for pins in (_PIN_HEAD, _PIN_TAIL):
        missing = [n for n in pins if n not in QUERIES]
        assert not missing, f"pins name unknown queries: {missing}"
    hist = _budget.evidence_history()
    order = _budget.budget_order(
        list(QUERIES),
        hist,
        pin_head=_PIN_HEAD,
        pin_tail=_PIN_TAIL,
        # pin-tail refresh policy (VERDICT r13 #6): pin-tail entries are
        # rows-only by nature and normally never spend budget, but the
        # stalest one takes ONE slot per round once its last driver row
        # is >= budget.TAIL_REFRESH_STALENESS rounds old — a periodic
        # rows>0 re-confirmation that the engine-native paths still run
        # under the driver harness, without displacing more than one
        # oracle-bearing re-check per round.
        current_round=max(hist.values(), default=0) + 1,
    )
    ordered = {n: QUERIES[n] for n in order}
    assert len(ordered) == len(QUERIES)
    _ORDERED = ordered
    return ordered
