"""Continuous-coverage slice of the streaming degenerate lane.

The full grid (3 shapes x 6 runners + crash cells) lives in
tools/stream_degenerate.py and records STREAM_DEGENERATE_r{N}.json per
round; these tests pin the two highest-value cells on every suite run so
a regression in degenerate-stream handling fails CI the day it lands,
not at the next artifact sweep:

- q5 over an EMPTY-EPOCH replay (a planted zero-row parquet file = a
  micro-batch with no rows, plus event-time gaps) must equal the batch
  twin — the streaming face of the r12 empty-shard class;
- q11-append over a SINGLE-KEY stream with a mid-replay crash + restart
  (crash_after_s through the real runner) must still emit each closed
  session exactly once — checkpoint recovery + sink commit log under
  maximum key skew.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from squirtle_spark import sources, streaming
from tools.stream_degenerate import _write_empty_epoch_file


def _epochify(df, ts_col):
    return df.withColumn(
        "epoch", F.unix_timestamp(F.col(ts_col).cast("timestamp")) % 100000
    )


def test_q5_stream_survives_empty_epoch_file(spark, tmp_path):
    bids = sources.nexmark_bids(spark, 200, 8)
    kept = bids.where(
        F.unix_timestamp(F.col("b_date_time").cast("timestamp")) % 4 != 1
    )
    d = str(tmp_path / "bids")
    streaming.write_epoch_files(_epochify(kept, "b_date_time"), d)
    _write_empty_epoch_file(d)

    got = streaming.run_nexmark_q5_stream(
        spark, d, checkpoint=str(tmp_path / "ckpt"), files_per_trigger=3
    ).collect()

    b = kept.withColumn("b_date_time", F.col("b_date_time").cast("timestamp"))
    counts = b.groupBy(
        F.window("b_date_time", "10 seconds", "5 seconds"), "auction"
    ).agg(F.count("*").alias("num"))
    maxes = counts.groupBy("window").agg(F.max("num").alias("maxn"))
    expected = (
        counts.join(maxes, "window")
        .where(F.col("num") >= F.col("maxn"))
        .select("auction", "num", F.col("window.start").alias("starttime"))
        .collect()
    )
    assert len(got) > 0
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_q11_append_skewed_stream_recovers_from_crash(spark, tmp_path):
    bids = (
        sources.nexmark_bids(spark, 200, 8)
        .withColumn("auction", F.lit(7))
        .withColumn("bidder", F.lit(3))
    )
    d = str(tmp_path / "bids")
    streaming.write_epoch_files(_epochify(bids, "b_date_time"), d)

    metrics: dict = {}
    got = streaming.run_nexmark_q11_append_stream(
        spark,
        d,
        checkpoint=str(tmp_path / "ckpt"),
        gap_s=3,
        delay="5 seconds",
        files_per_trigger=1,
        crash_after_s=30,
        metrics=metrics,
    ).collect()

    # ADVICE r13: the injected stop must have interrupted an ACTIVE query
    # — otherwise the "restart" replays nothing and the checkpoint-recovery
    # path is silently untested (the pre-fix wall-clock sleep was vacuous
    # on a fast host)
    assert metrics["crash"]["interrupted_active"], metrics["crash"]
    # ADVICE r14: the stop must land after >= 1 COMMITTED batch, or the
    # restart adopts an empty checkpoint and the test proves nothing
    assert metrics["crash"]["batches_before_crash"] >= 1, metrics["crash"]

    b = bids.withColumn("b_date_time", F.col("b_date_time").cast("timestamp"))
    expected = (
        b.groupBy("bidder", F.session_window("b_date_time", "3 seconds"))
        .agg(F.count("*").alias("bid_count"))
        .select(
            "bidder",
            "bid_count",
            F.col("session_window.start").alias("starttime"),
            F.col("session_window.end").alias("endtime"),
        )
        .collect()
    )
    assert len(got) > 0
    # exactly-once across the crash: equality, not superset
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))
