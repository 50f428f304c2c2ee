"""Measure the HDFSBacked-vs-RocksDB state-store crossover (VERDICT r11 #4).

The r11 lane walls showed RocksDB LOSING at every measured scale (+5%
to +104%) because every store fit comfortably in heap — the "RocksDB is
the large-state answer" recommendation rested on memory-bounds
reasoning, not a measured crossover. This probe creates the missing
condition: a heap-BOUNDED JVM (local mode, ``spark.driver.memory`` set
before launch) running a q8-shaped stream-stream inner join whose state
grows without eviction (unique keys, no watermark — Spark allows
unwatermarked inner joins precisely because state then retains every
row), padded to realistic row weight. As state approaches the heap, the
HDFSBacked provider's in-heap version maps first GC-thrash (per-batch
wall inflation) and then OOM; RocksDB allocates off-heap and stays flat.
The state size where the HDFS per-batch wall crosses RocksDB's IS the
crossover.

Each (provider, target-rows) cell runs in a FRESH subprocess — heap
bounds and state-store choice are per-JVM, and an OOMing cell must not
take the harness down. Results land in ROCKSDB_CROSSOVER_r{N}.json.

Usage:
    python tools/rocksdb_crossover.py            # full grid -> artifact
    python tools/rocksdb_crossover.py --cell hdfs 2000000   # one cell
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HEAP = os.environ.get("CROSSOVER_HEAP", "1g")
ROWS_PER_BATCH = 250_000
#: ~200 B payload per row so a few million rows of join state reach the
#: bounded heap (two sides retain everything: rows_total ≈ 2 × input).
PAD_BYTES = 200
#: State-rows ladder. With ~450 B/row estimated state weight, the last
#: rungs push HDFSBacked's retained version maps past a 1 GiB heap.
GRID = [500_000, 1_000_000, 2_000_000, 3_000_000]
CELL_TIMEOUT_S = 900


def run_cell(provider: str, target_rows: int) -> dict:
    """Child process: grow join state to target_rows, report batch walls."""
    import tempfile

    from pyspark.sql import SparkSession, functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from squirtle_spark import session as sq_session

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.driver.memory", HEAP)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName(f"crossover-{provider}-{target_rows}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sq_session.configure_state_store(spark, provider)

    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", ROWS_PER_BATCH)
        .load()
        .select(
            F.col("value").alias("k"),
            F.expr(f"repeat('x', {PAD_BYTES})").alias("pad"),
        )
    )
    left = src.select(F.col("k"), F.col("pad").alias("lpad"))
    right = src.select(F.col("k"), F.col("pad").alias("rpad"))
    joined = left.join(right, "k")  # unwatermarked inner: state keeps all

    ckpt = tempfile.mkdtemp(prefix=f"xover-{provider}-")
    q = (
        joined.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    batches: list[dict] = []
    seen = set()
    t0 = time.time()
    try:
        while time.time() - t0 < CELL_TIMEOUT_S - 60:
            time.sleep(0.5)
            p = q.lastProgress
            if not p or p["batchId"] in seen or not p.get("stateOperators"):
                continue
            seen.add(p["batchId"])
            st = p["stateOperators"][0]
            batches.append(
                {
                    "batch": p["batchId"],
                    "duration_ms": p["durationMs"].get("triggerExecution"),
                    "state_rows": st["numRowsTotal"],
                    "state_bytes": st["memoryUsedBytes"],
                }
            )
            if st["numRowsTotal"] >= target_rows:
                break
        q.stop()
    finally:
        try:
            q.stop()
        except Exception:
            pass
    # steady-state cost = median of the last 3 batches (startup excluded).
    # A progress event can lack durationMs.triggerExecution (None) — drop
    # those rather than letting sorted() TypeError discard the whole cell's
    # measured batches (ADVICE r12).
    tail = sorted(
        d for b in batches[-3:] if (d := b["duration_ms"]) is not None
    )
    return {
        "provider": provider,
        "target_rows": target_rows,
        "heap": HEAP,
        "reached_rows": batches[-1]["state_rows"] if batches else 0,
        "state_bytes": batches[-1]["state_bytes"] if batches else 0,
        "tail_batch_ms": tail[len(tail) // 2] if tail else None,
        "batches": batches,
    }


def main() -> None:
    if "--cell" in sys.argv:
        i = sys.argv.index("--cell")
        print(json.dumps(run_cell(sys.argv[i + 1], int(sys.argv[i + 2]))))
        return

    here = os.path.dirname(os.path.abspath(__file__))
    results: list[dict] = []
    for rows in GRID:
        for provider in ("hdfs", "rocksdb"):
            cmd = [
                sys.executable,
                os.path.abspath(__file__),
                "--cell",
                provider,
                str(rows),
            ]
            t = time.time()
            try:
                out = subprocess.run(
                    cmd,
                    capture_output=True,
                    text=True,
                    timeout=CELL_TIMEOUT_S,
                    cwd=os.path.dirname(here),
                )
                line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
                cell = json.loads(line) if line.startswith("{") else {
                    "provider": provider,
                    "target_rows": rows,
                    "heap": HEAP,
                    "failed": True,
                    "rc": out.returncode,
                    "stderr_tail": out.stderr[-1500:],
                }
            except subprocess.TimeoutExpired:
                cell = {
                    "provider": provider,
                    "target_rows": rows,
                    "heap": HEAP,
                    "failed": True,
                    "rc": "timeout",
                }
            cell["wall_s"] = round(time.time() - t, 1)
            cell.pop("batches", None)  # keep the artifact compact
            results.append(cell)
            print(
                f"# {provider} @{rows}: "
                + (
                    f"tail_batch {cell.get('tail_batch_ms')}ms, "
                    f"state {cell.get('state_bytes', 0)/1e6:.0f}MB"
                    if not cell.get("failed")
                    else f"FAILED rc={cell.get('rc')}"
                ),
                file=sys.stderr,
            )
    art = {"heap": HEAP, "rows_per_batch": ROWS_PER_BATCH, "pad_bytes": PAD_BYTES,
           "grid": GRID, "cells": results}
    path = os.path.join(os.path.dirname(here), "ROCKSDB_CROSSOVER_r12.json")
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({"written": path, "cells": len(results)}))


if __name__ == "__main__":
    main()
