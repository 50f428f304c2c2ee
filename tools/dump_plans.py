#!/usr/bin/env python
"""Dump .explain("formatted") for every benched query to plans/<tag>/.

Usage: python tools/dump_plans.py <outdir> [suffix] [sf_dir] [--only q1,q2]

Writes <outdir>/<query>_<suffix>.txt (suffix default "before"). The
optimization rounds commit these so plan claims in OPTIMIZATION_r*.md
are checkable without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--only")]
    only: set[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    outdir = args[0] if args else "plans/r15"
    suffix = args[1] if len(args) > 1 else "before"
    sf_dir = args[2] if len(args) > 2 else "/root/testdata/sf0.1"

    from squirtle_spark.registry import load_all
    from squirtle_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    os.makedirs(outdir, exist_ok=True)
    # untruncated metadata so PushedFilters/ReadSchema are fully visible
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    n = 0
    for name, q in sorted(load_all().items()):
        if not q.bench:
            continue
        if only is not None and name not in only:
            continue
        df = q.spark_fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n += 1
        print(f"# wrote {path}", file=sys.stderr)
    print(f"# {n} plans -> {outdir}", file=sys.stderr)


if __name__ == "__main__":
    main()
