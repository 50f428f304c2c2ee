#!/usr/bin/env python
"""Plan audit: .explain("formatted") every headline query and flag scale
anti-patterns.

Checks per plan:
- parquet scans carry PushedFilters / a pruned ReadSchema (not SELECT *),
- dimension joins are BroadcastHashJoin (not shuffle) where expected,
- WholeStageCodegen spans exist (expressions stayed JVM-side),
- no CartesianProduct / BroadcastNestedLoopJoin outside the known
  crossJoin-by-design queries.

Run: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPECT_BROADCAST = {
    "nexmark_q3",
    "tpch_q3",
    "tpch_q5",
    "tpch_q9",
    "ysb_campaign_views",
    "nexmark_q13",
}
#: broadcast crossJoin by design: the broadcast side is tiny and FIXED —
#: 10 query vectors (ann_*/knn), K=8 centroids (kmeans), a K×M-row
#: codebook lookup table (ann_pq), or a 1-row corpus-scalar aggregate
#: (bm25's n_docs/avgdl, dq_profile's single wide stats row). A
#: BroadcastNestedLoopJoin against a constant-size side is the correct
#: plan for these; what the audit must catch is a DATA×DATA nested loop,
#: which none of them is (the registry-wide pytest gate separately
#: forbids CartesianProduct everywhere, tests/test_plans.py).
CROSS_BY_DESIGN = {
    "ann_cosine_topk",
    "ann_sq8_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",  # probe selection: 10 queries x a 16-row centroid view
    "knn_classify",
    "kmeans_assign",
    "bm25_topk",
    "dq_profile",
    # constant bin-grid fan-out: DISTINCT event_type × a fixed 20-row
    # bucket series (profiling.py _psi_drift) — the nested-loop side is
    # a literal VALUES relation, never data-sized.
    "psi_drift",
    # 1-row broadcast scalars (round 6): dsir's two model-total rows,
    # hard_negatives' corpus n_docs/avgdl row (the bm25 shape), and
    # bpe_train_merges' per-round 1-row argmax winner — the broadcast
    # side is a single row in every case.
    "dsir_select",
    "hard_negatives",
    "bpe_train_merges",
    # train x broadcast(eval) scoring (r13 audit sweep — benched since
    # r11 but the audit had not been re-run past the r10 entry set):
    # the eval split is ~1% by construction (vec_id % 97) and broadcasts;
    # BroadcastNestedLoopJoin against that bounded side IS the documented
    # 100 TB plan, and the bucketed fallback exists for when it isn't
    # (decontaminate_embedding_bucketed, which is plan-GATED to have no
    # cross product at all — tests/test_plans.py).
    "decontaminate_embedding",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from squirtle_spark.registry import load_all
    from squirtle_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    problems: list[str] = []
    for name, q in sorted(load_all().items()):
        if not (q.bench or name in EXPECT_BROADCAST):
            continue
        df = q.spark_fn(spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        print(f"\n{'=' * 70}\n## {name}\n{plan}")
        # AQE only reveals codegen spans ("*(N)" operator prefixes) in the
        # final plan after THIS DataFrame's own execution — collect() (small
        # at audit SF) then re-read the executed plan.
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()
        if "*(" not in executed and "WholeStageCodegen" not in executed:
            # Distinguish the benign AQE artifact from a real codegen miss:
            # when a query legitimately returns 0 rows at audit SF, AQE
            # collapses the executed plan to LocalTableScan/EmptyRelation
            # and no codegen span can exist (r14: tpch_q20's then-empty
            # sf0.1 fixture was mis-reported as a codegen miss here).
            if "EmptyRelation" in executed or (
                "LocalTableScan" in executed and df.count() == 0
            ):
                print(
                    f"note: {name} executed as AQE EmptyRelation "
                    "(0 rows at audit SF) - codegen check not applicable"
                )
            else:
                problems.append(
                    f"{name}: no whole-stage codegen span in executed plan"
                )
        if "PushedFilters: [" in plan and "PushedFilters: []" in plan and "Filter (" in plan:
            # informational: some filters (post-window/post-agg) can't push
            print(f"note: {name} has scans with empty PushedFilters")
        if name in EXPECT_BROADCAST and "BroadcastHashJoin" not in plan:
            problems.append(f"{name}: expected a broadcast join, none in plan")
        if name not in CROSS_BY_DESIGN and (
            "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
        ):
            problems.append(f"{name}: cartesian/nested-loop join in plan")

    print("\n" + "=" * 70)
    if problems:
        print("PROBLEMS:")
        for p in problems:
            print(" -", p)
        sys.exit(1)
    print("plan audit clean")


if __name__ == "__main__":
    main()
