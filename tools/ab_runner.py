"""One fresh-session measurement sample for the A/B adjudication lane.

Usage: PYTHONPATH=<tree> python tools/ab_runner.py q1,q2 [reps]

Starts a FRESH SparkSession (own JVM), registers the catalog at
$SPARK_GRAFT_SF_DIR, warms every table (footers + JIT), then times each
named query min-of-<reps> with a noop sink — the same measurement core as
bench.py but isolated from bench's alphabetical run order, so a wall here
reflects the query alone, not its predecessors' GC/JIT residue.

Prints one JSON line {query: min_sec}. Intentionally dependency-light so
the identical file runs against any past commit's tree via PYTHONPATH
(VERDICT r12 item 1: fresh-session A/B at r12 HEAD vs r11 f98eda6).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    # default to this file's repo when PYTHONPATH doesn't name another tree
    if "PYTHONPATH" not in os.environ:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from squirtle_spark import catalog
    from squirtle_spark.registry import load_all
    from squirtle_spark.session import get_spark

    spark = get_spark(app_name="squirtle-ab")
    catalog.register_all(spark, sf_dir)
    for t in catalog.TABLES:
        spark.table(t).count()

    queries = load_all()
    out: dict[str, dict] = {}
    for name in names:
        q = queries[name]
        # untimed warm runs: plan compilation + C2 JIT out of the number
        # (high-rep mode exists because the adjudicated deltas are ~40 ms
        # on a ~200 ms wall — a fresh-session min-of-3 ruler is coarser
        # than the question)
        warm = max(1, reps // 3)
        for _ in range(warm):
            q.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            q.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        s = sorted(samples)
        out[name] = {
            "min": round(s[0], 4),
            "p25": round(s[len(s) // 4], 4),
            "med": round(s[len(s) // 2], 4),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
