"""Decade-scale streaming-state probe (VERDICT r13 item 5).

The batch side has measured sf10 scaling exponents; the streaming
stress lanes stop at 10x rate over 60 s, where every store fits in
heap. This probe creates the missing condition for the "RocksDB is the
long-retention answer" claim on SESSION-WINDOW state (the r12 crossover
measured join state): a session-window aggregation whose watermark lags
30 days behind the data, so no session ever closes during the run —
the shape of a decade-retention pipeline where keys recur on
month-scale gaps and the store must hold every open session.

Two cells, each a fresh heap-bounded (1g) subprocess:

* ``hdfs`` at 600k open sessions — calibrates bytes/session-row for
  the in-heap provider (measured r14: 1118 B/row, 2.2x the r12
  join-state weight — the window struct + agg buffers ride along).
* ``hdfs`` at 1.2M — past the wall: needs ~1.34 GB of version-map
  state vs the 1 GiB heap; measured r14 outcome is JVM death (gateway
  ConnectionRefused), the crossover's capacity-wall mechanism at 40%
  fewer rows than join state.
* ``rocksdb`` at 6M open sessions — the decade cell: ~6.7 GB of
  HDFS-equivalent logical state, 6.7x the heap (652 MB as compressed
  SSTs off-heap/on-disk). The artifact records the full growth curve
  (per-batch state rows, provider-reported bytes, RocksDB SST custom
  metrics, and rows/s), so flat-vs-degrading throughput is readable
  directly rather than inferred from endpoints.

Results land in ``STREAM_STATE_r{N}.json``; the scale sentence lives in
SCALING.md ("decade-state" note). Reference intent: the reference keeps
windowed state in its distributed object store with no per-node bound
(flock arena/state docs); on Spark the equivalent posture is the
RocksDB provider + checkpoint store, and this is the measurement.

Usage:
    python tools/stream_state_decade.py [--round N]   # both cells
    python tools/stream_state_decade.py --cell rocksdb 6000000
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HEAP = os.environ.get("DECADE_HEAP", "1g")
ROWS_PER_BATCH = 200_000
PAD_BYTES = 200
CELL_TIMEOUT_S = 900
#: (provider, target open sessions): in-heap ruler cell, past-the-wall
#: cell (expected JVM death on a 1 GiB heap), decade cell.
GRID = [("hdfs", 600_000), ("hdfs", 1_200_000), ("rocksdb", 6_000_000)]

#: RocksDB custom metrics worth keeping in the curve (the provider's
#: memoryUsedBytes reports only memtable+block-cache residency; SST
#: files on disk are where decade state actually lives).
_ROCKS_KEYS = (
    "rocksdbSstFileSize",
    "rocksdbTotalSstFilesSize",
    "rocksdbMemtableSize",
    "rocksdbTotalMemtableSize",
    "rocksdbPinnedBlocksMemoryUsage",
)


def run_cell(provider: str, target_rows: int) -> dict:
    """Child: grow open-session state to ``target_rows``, report curve."""
    import tempfile

    from pyspark.sql import SparkSession, functions as F

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from squirtle_spark import session as sq_session

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.driver.memory", HEAP)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName(f"decade-{provider}-{target_rows}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sq_session.configure_state_store(spark, provider)

    # Unique key per row -> every row opens a session that the 30-day
    # watermark lag keeps open for the whole run; pad gives each session
    # row a realistic agg payload (max(pad) retains one copy).
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", ROWS_PER_BATCH)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            F.col("value").alias("k"),
            # hash-derived pad: ~PAD_BYTES of high-entropy hex per key, so
            # RocksDB's SST compression can't flatter the on-disk number
            # the way a constant pad does (measured: 'x'*200 compressed
            # to 28 B/row of SST)
            F.expr(
                f"substring(repeat(sha2(cast(value as string), 256), "
                f"{PAD_BYTES // 64 + 1}), 1, {PAD_BYTES})"
            ).alias("pad"),
        )
        .withWatermark("ts", "30 days")
    )
    sessions = src.groupBy(
        F.col("k"), F.session_window(F.col("ts"), "10 seconds")
    ).agg(F.count("*").alias("n"), F.max("pad").alias("pad"))

    ckpt = tempfile.mkdtemp(prefix=f"decade-{provider}-")
    q = (
        sessions.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    batches: list[dict] = []
    seen: set[int] = set()
    t0 = time.time()
    try:
        while time.time() - t0 < CELL_TIMEOUT_S - 120:
            time.sleep(0.5)
            p = q.lastProgress
            if not p or p["batchId"] in seen or not p.get("stateOperators"):
                continue
            seen.add(p["batchId"])
            st = p["stateOperators"][0]
            dur = p["durationMs"].get("triggerExecution")
            row = {
                "batch": p["batchId"],
                "duration_ms": dur,
                "input_rows": p.get("numInputRows"),
                "rows_per_sec": (
                    round(1000 * p["numInputRows"] / dur, 1)
                    if dur and p.get("numInputRows")
                    else None
                ),
                "state_rows": st["numRowsTotal"],
                "state_bytes": st["memoryUsedBytes"],
            }
            cm = st.get("customMetrics") or {}
            for key in _ROCKS_KEYS:
                if key in cm:
                    row[key] = cm[key]
            batches.append(row)
            if st["numRowsTotal"] >= target_rows:
                break
        q.stop()
    finally:
        try:
            q.stop()
        except Exception:
            pass
    measured = [b for b in batches if b["duration_ms"] is not None]
    tail = sorted(b["duration_ms"] for b in measured[-3:])
    last = batches[-1] if batches else {}
    return {
        "provider": provider,
        "target_rows": target_rows,
        "heap": HEAP,
        "reached_rows": last.get("state_rows", 0),
        "state_bytes": last.get("state_bytes", 0),
        "sst_bytes": last.get("rocksdbSstFileSize")
        or last.get("rocksdbTotalSstFilesSize"),
        "tail_batch_ms": tail[len(tail) // 2] if tail else None,
        "batches": batches,
    }


def _round_number() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    return bench._round_number()


def main() -> None:
    if "--cell" in sys.argv:
        i = sys.argv.index("--cell")
        print(json.dumps(run_cell(sys.argv[i + 1], int(sys.argv[i + 2]))))
        return

    rnd = (
        int(sys.argv[sys.argv.index("--round") + 1])
        if "--round" in sys.argv
        else _round_number()
    )
    here = os.path.dirname(os.path.abspath(__file__))
    results: list[dict] = []
    for provider, rows in GRID:
        cmd = [sys.executable, os.path.abspath(__file__), "--cell", provider, str(rows)]
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
            cell = (
                json.loads(line)
                if line.startswith("{")
                else {
                    "provider": provider,
                    "target_rows": rows,
                    "heap": HEAP,
                    "failed": True,
                    "rc": out.returncode,
                    "stderr_tail": out.stderr[-1500:],
                }
            )
        except subprocess.TimeoutExpired:
            cell = {
                "provider": provider,
                "target_rows": rows,
                "heap": HEAP,
                "failed": True,
                "rc": "timeout",
            }
        cell["wall_s"] = round(time.time() - t, 1)
        # Keep the curve, thinned: every 2nd batch plus the last — the
        # growth shape survives, the artifact stays reviewable.
        curve = cell.pop("batches", None)
        if curve:
            cell["curve"] = curve[::2] + ([curve[-1]] if len(curve) % 2 == 0 else [])
        results.append(cell)
        print(
            f"# {provider} @{rows}: "
            + (
                f"reached {cell.get('reached_rows')}, "
                f"tail_batch {cell.get('tail_batch_ms')}ms, "
                f"bytes {cell.get('state_bytes', 0)/1e6:.0f}MB, "
                f"sst {(cell.get('sst_bytes') or 0)/1e6:.0f}MB"
                if not cell.get("failed")
                else f"FAILED rc={cell.get('rc')}"
            ),
            file=sys.stderr,
        )
    # bytes/session-row ruler from the in-heap provider -> logical size
    # of the RocksDB cell's state in HDFS-equivalent terms.
    hdfs = next((c for c in results if c["provider"] == "hdfs" and not c.get("failed")), None)
    rocks = next((c for c in results if c["provider"] == "rocksdb" and not c.get("failed")), None)
    ruler = (
        round(hdfs["state_bytes"] / hdfs["reached_rows"], 1)
        if hdfs and hdfs.get("reached_rows")
        else None
    )
    art = {
        "round": rnd,
        "heap": HEAP,
        "rows_per_batch": ROWS_PER_BATCH,
        "pad_bytes": PAD_BYTES,
        "shape": "session_window open-session growth, watermark 30 days behind",
        "hdfs_bytes_per_row": ruler,
        "rocksdb_logical_state_bytes": (
            int(ruler * rocks["reached_rows"]) if ruler and rocks else None
        ),
        "cells": results,
    }
    path = os.path.join(os.path.dirname(here), f"STREAM_STATE_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({"written": path, "cells": len(results)}))


if __name__ == "__main__":
    main()
