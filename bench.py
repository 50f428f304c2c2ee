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

    # Three timed runs per query, min taken: the host shows transient
    # multi-second stalls and up to ~2x run-to-run drift (shared VM /
    # steal time), and the min keeps that out of the plan-cost signal.
    # Cold-run JIT cost amortizes at real scale anyway.
    times: dict[str, float] = {}
    for name, q in sorted(queries.items()):
        best = float("inf")
        for _ in range(3):
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


def _stream_q5_bench(spark, events_per_sec: int = 1000, seconds: int = 60) -> dict:
    """Streaming anchor vs BASELINE.md: the reference processes 1,000 ev/s
    NEXMark q5 (hopping window) at ~8.5k ev/s effective (10 s of data in
    ~1.18 s source wall, reference README.md:250). Over 60 s of generated
    bids:

    - throughput: large triggers → effective events/sec (hopping agg);
    - latency: small triggers → per-micro-batch wall (the sub-second
      latency target);
    - full q5: the DECLARED query end-to-end (hopping counts + per-window
      max join-on-aggregate, streaming.run_nexmark_q5_stream).

    A warmup stream runs first: the first streaming query in a fresh JVM
    pays ~10 s of one-time codegen/init, which belongs to JVM startup, not
    the per-event cost (the batch side amortizes the same way via
    min-of-2). Steady-state is what the reference's number measures too.

    Streaming runs use few shuffle partitions: state-store commit cost
    scales with partition count, so partitions should track state volume,
    not core count (at cluster scale AQE/state rebalancing takes over)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from squirtle_spark import sources, streaming

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    tmp = tempfile.mkdtemp(prefix="bench-stream-")
    try:
        bids = sources.nexmark_bids(spark, events_per_sec, seconds)
        n = bids.count()
        staged = bids.withColumn(
            "epoch", F.unix_timestamp(F.col("b_date_time").cast("timestamp")) % 100000
        )
        streaming.write_epoch_files(staged, f"{tmp}/bids")

        def run(files_per_trigger: int, ckpt: str) -> float:
            stream = streaming.replay_stream(
                spark, f"{tmp}/bids", files_per_trigger=files_per_trigger
            ).drop("epoch")
            agg = streaming.hopping_agg(
                stream, "b_date_time", "auction", size="10 seconds", slide="5 seconds"
            )
            t0 = time.perf_counter()
            q = streaming.noop_sink(agg, checkpoint=f"{tmp}/{ckpt}")
            q.awaitTermination(300)
            return time.perf_counter() - t0

        run(30, "ckpt-warm")  # one-time streaming-path init, not per-event cost
        wall_tp = run(15, "ckpt-tp")
        n_batches_lat = (seconds + 3) // 4
        wall_lat = run(4, "ckpt-lat")

        t0 = time.perf_counter()
        streaming.run_nexmark_q5_stream(
            spark, f"{tmp}/bids", checkpoint=f"{tmp}/ckpt-full", files_per_trigger=15
        )
        wall_full = time.perf_counter() - t0

        # Full q8: genuine stream-stream windowed join (person ⋈ auction)
        # over generated entity streams at the same event-time span.
        persons = sources.nexmark_persons(spark, 10 * events_per_sec, seconds)
        auctions = sources.nexmark_auctions(spark, 10 * events_per_sec, seconds)
        n_q8 = persons.count() + auctions.count()
        for df, ts, sub in (
            (persons, "p_date_time", "p"),
            (auctions, "a_date_time", "a"),
        ):
            streaming.write_epoch_files(
                df.withColumn(
                    "epoch", F.unix_timestamp(F.col(ts).cast("timestamp")) % 100000
                ),
                f"{tmp}/{sub}",
            )
        def run_q8(ckpt: str) -> float:
            t0 = time.perf_counter()
            streaming.run_nexmark_q8_stream(
                spark,
                f"{tmp}/p",
                f"{tmp}/a",
                checkpoint=f"{tmp}/{ckpt}",
                size_s=10,
                files_per_trigger=30,
            )
            return time.perf_counter() - t0

        run_q8("ckpt-q8-warm")  # stream-stream join path init, like the q5 warmup
        wall_q8 = run_q8("ckpt-q8")

        # YSB end-to-end stream (filter + broadcast campaign join + tumbling
        # counts) at the same generated scale.
        ads = sources.ysb_ad_events(spark, events_per_sec, seconds)
        n_ads = ads.count()
        staged_ads = ads.withColumn(
            "epoch", F.unix_timestamp(F.col("event_time").cast("timestamp")) % 100000
        )
        streaming.write_epoch_files(staged_ads, f"{tmp}/ads")
        campaigns = sources.ysb_campaigns(spark)
        ysb = streaming.ysb_campaign_stream(
            spark, f"{tmp}/ads", campaigns, files_per_trigger=15
        )
        t0 = time.perf_counter()
        q = streaming.noop_sink(ysb, checkpoint=f"{tmp}/ckpt-ysb", mode="complete")
        q.awaitTermination(300)
        wall_ysb = time.perf_counter() - t0
        return {
            "q5_events": n,
            "q5_wall_sec": round(wall_tp, 3),
            "q5_events_per_sec": round(n / wall_tp, 1),
            "q5_microbatch_latency_sec": round(wall_lat / n_batches_lat, 3),
            "q5_full_query_wall_sec": round(wall_full, 3),
            "q5_full_query_events_per_sec": round(n / wall_full, 1),
            "q8_events": n_q8,
            "q8_full_query_wall_sec": round(wall_q8, 3),
            "q8_full_query_events_per_sec": round(n_q8 / wall_q8, 1),
            "ysb_events": n_ads,
            "ysb_wall_sec": round(wall_ysb, 3),
            "ysb_events_per_sec": round(n_ads / wall_ysb, 1),
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
