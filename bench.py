#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "headline_total_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Execution is measured with the noop sink (full pipeline runs, nothing
crosses back to the driver) — the same shape as the reference's blackhole
sink benchmarks (flock/src/datasink/mod.rs:47-72, README.md:186-195).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from squirtle_spark.registry import load_all
    from squirtle_spark.session import get_spark

    spark = get_spark(app_name="squirtle-bench")
    queries = {n: q for n, q in load_all().items() if q.bench}

    # Warm the JVM + parquet footers so per-query times measure the plan,
    # not first-touch overhead.
    from squirtle_spark import catalog

    catalog.register_all(spark, sf_dir)
    for t in catalog.TABLES:
        spark.table(t).count()

    times: dict[str, float] = {}
    for name, q in sorted(queries.items()):
        t0 = time.perf_counter()
        df = q.spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {times[name]:.3f}s", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
