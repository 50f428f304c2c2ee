"""One-off headline timing under each matview mode (VERDICT r10 item 5).

The `reliable` knob (catalog.configure_matview / $SPARK_GRAFT_MATVIEW_MODE)
is value-identity-tested in tests/test_matviews.py, but until r11 no
committed artifact measured what the checkpoint write+read actually costs
on the headline path — SCALING.md's deployment rule carried a guess.
This script runs the bench query set (same registry order, same warm-up
as bench.py's headline) once per mode in a FRESH subprocess each, so the
two sessions have the same shape: nothing from the local-mode pass (JIT
depth, matview blocks, PQ codebooks) can leak into the reliable-mode
pass. Single sample per query — the point is the mode delta on the
session total, which is dominated by the matview-building queries; the
committed row lives in SCALING.md ("Matview reliability").

Writes matview_mode_bench.json into the CWD (NOT a BENCH_* artifact —
this must never shadow the driver's own bench record).

Usage: python3 tools/matview_mode_bench.py            # both modes
       python3 tools/matview_mode_bench.py --child local  # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time


def child(mode: str) -> None:
    # running by path puts tools/ on sys.path, not the repo root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ["SPARK_GRAFT_MATVIEW_MODE"] = mode
    if mode == "reliable":
        os.environ.setdefault(
            "SPARK_GRAFT_CHECKPOINT_DIR",
            tempfile.mkdtemp(prefix="matview-reliable-"),
        )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from squirtle_spark import catalog
    from squirtle_spark.registry import load_all
    from squirtle_spark.session import get_spark

    spark = get_spark(app_name=f"matview-mode-{mode}")
    queries = {n: q for n, q in load_all().items() if q.bench}
    catalog.register_all(spark, sf_dir)
    for t in catalog.TABLES:
        spark.table(t).count()

    walls: dict[str, float] = {}
    t_total = time.monotonic()
    for name, q in queries.items():
        t0 = time.monotonic()
        df = q.spark_fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        walls[name] = round(time.monotonic() - t0, 3)
    total = round(time.monotonic() - t_total, 3)
    print(json.dumps({"mode": mode, "total_sec": total, "queries": walls}))


def main() -> None:
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
        return
    here = os.path.dirname(os.path.abspath(__file__))
    out: dict[str, dict] = {}
    for mode in ("local", "reliable"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", mode],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(here),
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        out[mode] = json.loads(line)
        print(f"# {mode}: {out[mode]['total_sec']}s", file=sys.stderr)
    loc, rel = out["local"], out["reliable"]
    # the overhead statement the SCALING.md row records: total + the
    # biggest per-query deltas (the matview/index builders)
    deltas = {
        n: round(rel["queries"][n] - loc["queries"][n], 3)
        for n in loc["queries"]
        if n in rel["queries"]
    }
    top = dict(sorted(deltas.items(), key=lambda kv: -abs(kv[1]))[:8])
    summary = {
        "local_total_sec": loc["total_sec"],
        "reliable_total_sec": rel["total_sec"],
        "overhead_pct": round(
            100 * (rel["total_sec"] - loc["total_sec"]) / loc["total_sec"], 1
        ),
        "top_query_deltas_sec": top,
        "local": loc,
        "reliable": rel,
    }
    with open("matview_mode_bench.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("local_total_sec", "reliable_total_sec", "overhead_pct")}))


if __name__ == "__main__":
    main()
