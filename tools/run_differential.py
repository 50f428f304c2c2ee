"""Artifact runner for the randomized differential lane: N seeds, full
registry, one committed JSON (DIFFERENTIAL_r{N}.json) recording seeds,
pass counts and any finding — the committed evidence VERDICT r11 #2
asks for. The pytest lane (tests/test_differential.py) runs a 2-seed
subset on every suite run; this runner goes wider when invoked.

Usage: python tools/run_differential.py [--round N] [seed ...]
(default: 5 seeds; round defaults to newest CORRECTNESS round + 1)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile


def _round_number(repo: str) -> int:
    """Current build round — DELEGATES to bench._round_number so the two
    stampers can never disagree (ADVICE r13: the local
    ``newest(CORRECTNESS) or newest(BENCH) - 1`` formula yielded round 0
    in an artifact-less repo and diverged from bench's
    ``max(CORRECTNESS + 1, BENCH)`` whenever bench rounds ran ahead).
    bench resolves artifact globs against its own directory (the repo
    root), which is the same ``repo`` passed here. ``--round N``
    overrides.
    """
    if repo not in sys.path:
        sys.path.insert(0, repo)
    import bench

    return bench._round_number()


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from pyspark.sql import SparkSession

    from tools.differential import EXCLUSIONS, run_degenerate, run_seed

    argv = sys.argv[1:]
    round_override = None
    if "--round" in argv:
        i = argv.index("--round")
        round_override = int(argv[i + 1])
        del argv[i : i + 2]
    seeds = [int(a) for a in argv] or [11, 23, 37, 59, 97]
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .appName("differential")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("FATAL")
    base = tempfile.mkdtemp(prefix="randfix-")
    per_seed: dict[str, dict] = {}
    findings: list[dict] = []
    for seed in seeds:
        res = run_seed(spark, seed, base)
        bad = {k: v for k, v in res.items() if v["status"] != "ok"}
        per_seed[str(seed)] = {
            "checked": len(res),
            "ok": len(res) - len(bad),
            "bad": {k: v["msg"] for k, v in bad.items()},
            "wall_s": round(sum(v["sec"] for v in res.values()), 1),
        }
        findings.extend({"seed": seed, "query": k, **v} for k, v in bad.items())
        print(
            f"# seed {seed}: {len(res) - len(bad)}/{len(res)} ok "
            f"({per_seed[str(seed)]['wall_s']}s)",
            file=sys.stderr,
        )
    dres = run_degenerate(spark, base)
    dbad = {k: v for k, v in dres.items() if v["status"] != "ok"}
    per_seed["degenerate"] = {
        "checked": len(dres),
        "ok": len(dres) - len(dbad),
        "bad": {k: v["msg"] for k, v in dbad.items()},
        "wall_s": round(sum(v["sec"] for v in dres.values()), 1),
    }
    findings.extend({"seed": "degenerate", "query": k, **v} for k, v in dbad.items())
    print(
        f"# degenerate: {len(dres) - len(dbad)}/{len(dres)} ok",
        file=sys.stderr,
    )
    art = {
        "round": round_override or _round_number(repo),
        "seeds": seeds,
        "excluded": EXCLUSIONS,
        "per_seed": per_seed,
        "findings": findings,
    }
    path = os.path.join(repo, f"DIFFERENTIAL_r{art['round']:02d}.json")
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({"written": path, "total_findings": len(findings)}))


if __name__ == "__main__":
    main()
