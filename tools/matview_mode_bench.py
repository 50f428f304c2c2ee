"""One-off headline timing under each matview mode (VERDICT r10 item 5).

The `reliable` knob (catalog.configure_matview / $SPARK_GRAFT_MATVIEW_MODE)
is value-identity-tested in tests/test_matviews.py, but until r11 no
committed artifact measured what the checkpoint write+read actually costs
on the headline path — SCALING.md's deployment rule carried a guess.
This script runs the bench query set (same registry order, same warm-up
as bench.py's headline) in a FRESH subprocess per sample, so one mode's
session state (JIT depth, matview blocks, PQ codebooks) cannot leak
into another's. All three modes, interleaved samples, one discarded
warmup child first (the cold-sequence OS page-cache penalty is ~40s and
would otherwise be misattributed to whichever mode runs first); the
committed row lives in SCALING.md ("Matview reliability").

Writes matview_mode_bench.json into the CWD (NOT a BENCH_* artifact —
this must never shadow the driver's own bench record).

Usage: python3 tools/matview_mode_bench.py  # all three modes: 1 warmup
       child + 2 interleaved samples per mode = 7 subprocesses (~8 min)
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


MODES = ("local", "reliable", "persist")
SAMPLES_PER_MODE = 2


def _run_child(mode: str) -> dict:
    here = os.path.dirname(os.path.abspath(__file__))
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", mode],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(here),
    )
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    if r.returncode != 0 or not lines:
        # surface the child's actual traceback, not an opaque IndexError
        sys.stderr.write(r.stderr[-4000:])
        raise RuntimeError(
            f"child --child {mode} failed (rc={r.returncode}, "
            f"{len(lines)} JSON lines on stdout) — its stderr is above"
        )
    return json.loads(lines[-1])


def main() -> None:
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
        return
    # one discarded warmup child: the FIRST subprocess of a cold sequence
    # pays ~40s of OS page-cache warmup that would otherwise be
    # misattributed to whichever mode runs first (measured r11: local
    # read 104s cold vs 54-57s warm)
    warm = _run_child("local")
    print(f"# warmup (discarded): {warm['total_sec']}s", file=sys.stderr)
    samples: dict[str, list[float]] = {m: [] for m in MODES}
    last_run: dict[str, dict] = {}
    for i in range(SAMPLES_PER_MODE):
        for mode in MODES:  # interleaved, so host drift hits modes evenly
            r = _run_child(mode)
            samples[mode].append(r["total_sec"])
            last_run[mode] = r
            print(f"# {mode} sample {i + 1}: {r['total_sec']}s", file=sys.stderr)
    mins = {m: min(s) for m, s in samples.items()}
    summary = {
        "method": (
            f"one discarded warmup child, then {SAMPLES_PER_MODE} fresh-subprocess "
            "samples per mode, interleaved; min per mode. Warm-sample spread within "
            "a mode reaches ~6-19% at ~60s totals (host weather) — only deltas "
            "clearing that floor are attributable to the mode."
        ),
        "samples_sec": samples,
        "min_sec": mins,
        "overhead_vs_local_pct": {
            m: round(100 * (v - mins["local"]) / mins["local"], 1)
            for m, v in mins.items()
        },
        "queries_last_run": {m: r["queries"] for m, r in last_run.items()},
    }
    with open("matview_mode_bench.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"min_sec": mins,
                      "overhead_vs_local_pct": summary["overhead_vs_local_pct"]}))


if __name__ == "__main__":
    main()
