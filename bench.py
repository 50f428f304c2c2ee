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

    # Two timed runs per query, min taken: the host shows transient
    # multi-second stalls (shared VM), and min-of-2 keeps those out of the
    # plan-cost signal. Cold-run JIT cost amortizes at real scale anyway.
    times: dict[str, float] = {}
    for name, q in sorted(queries.items()):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = q.spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
        print(f"# {name}: {times[name]:.3f}s", file=sys.stderr)

    streaming_stats = _stream_q5_bench(spark)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "streaming": streaming_stats,
            }
        )
    )


def _stream_q5_bench(spark, events_per_sec: int = 1000, seconds: int = 10) -> dict:
    """Streaming anchor vs BASELINE.md: the reference processes 10 s of
    1,000 ev/s NEXMark q5 (hopping window) in ~1.18 s source wall time
    (reference README.md:250). Here: generate the same 10 s of bids, replay
    them as micro-batches, run the hopping-window hot-items aggregation to
    a blackhole sink, and report effective events/sec."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from squirtle_spark import sources, streaming

    tmp = tempfile.mkdtemp(prefix="bench-stream-")
    try:
        bids = sources.nexmark_bids(spark, events_per_sec, seconds)
        n = bids.count()
        staged = bids.withColumn(
            "epoch", F.unix_timestamp(F.col("b_date_time").cast("timestamp")) % 100000
        )
        streaming.write_epoch_files(staged, f"{tmp}/bids")
        stream = streaming.replay_stream(spark, f"{tmp}/bids", files_per_trigger=5).drop(
            "epoch"
        )
        agg = streaming.hopping_agg(
            stream, "b_date_time", "auction", size="10 seconds", slide="5 seconds"
        )
        t0 = time.perf_counter()
        q = streaming.noop_sink(agg, checkpoint=f"{tmp}/ckpt")
        q.awaitTermination(300)
        wall = time.perf_counter() - t0
        return {
            "q5_events": n,
            "q5_wall_sec": round(wall, 3),
            "q5_events_per_sec": round(n / wall, 1),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
