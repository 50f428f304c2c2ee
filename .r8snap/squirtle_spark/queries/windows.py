"""Window operators over the ``events`` table (SURVEY.md §2.9 / §2.5).

The reference implements windowing as its own layer (tumbling/hopping/
session/global handlers at flock-function/src/aws/window/*.rs; epoch
bucketing at flock/src/stream/window.rs:80-113). Spark expresses the same
semantics natively: ``window()`` / ``session_window()`` for event-time,
``Window`` frame specs for OVER clauses. The Spark side here uses the
native DataFrame API (the idiomatic, streaming-compatible scale path); the
DuckDB oracle replays the identical bucketing with epoch arithmetic.

Window sizes are scaled to fixture density (~10k events / 30 days).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import dialect as dl
from ..registry import register_df, register_sql

TUMBLE_S = 21_600  # 6 hours
HOP_SIZE_S = 43_200  # 12-hour window …
HOP_SLIDE_S = 21_600  # … sliding by 6 hours
SESSION_GAP_S = 86_400  # 1-day gap


def _win_tumbling_df(spark, sf_dir):
    ev = spark.table("events")
    return (
        ev.groupBy(F.window("ts", f"{TUMBLE_S} seconds"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(20,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def _win_tumbling_oracle(d: str = dl.DUCK) -> str:
    w = dl.tumble_start("ts", TUMBLE_S, d)
    return f"""
SELECT {w} AS win_start,
       event_type,
       COUNT(*) AS cnt,
       {dl.dsum('value', d)} AS sum_value
FROM events
GROUP BY {w}, event_type
"""


register_df(
    "win_tumbling",
    _win_tumbling_df,
    oracle_body=_win_tumbling_oracle(),
    doc="Tumbling event-time window (native window()) — parity: flock tumbling.rs:31-188.",
    bench=True,
)


def _win_hopping_df(spark, sf_dir):
    ev = spark.table("events")
    return (
        ev.groupBy(F.window("ts", f"{HOP_SIZE_S} seconds", f"{HOP_SLIDE_S} seconds"))
        .agg(F.count("*").alias("cnt"), F.countDistinct("user_id").alias("users"))
        .select(F.col("window.start").alias("win_start"), "cnt", "users")
    )


def _win_hopping_oracle(d: str = dl.DUCK) -> str:
    b = dl.hop_bucket("ts", HOP_SLIDE_S, d)
    start = dl.ts_from_s(f"(bucket * {HOP_SLIDE_S})", d)
    return f"""
WITH hopped AS (
    SELECT user_id, {b} AS bucket FROM events
    UNION ALL
    SELECT user_id, {b} - 1 AS bucket FROM events
)
SELECT {start} AS win_start,
       COUNT(*) AS cnt,
       COUNT(DISTINCT user_id) AS users
FROM hopped
GROUP BY bucket
"""


register_df(
    "win_hopping",
    _win_hopping_df,
    oracle_body=_win_hopping_oracle(),
    doc="Hopping window (size=2·slide) — parity: flock hopping.rs:31-99.",
)


def _win_session_df(spark, sf_dir):
    ev = spark.table("events")
    return (
        ev.groupBy("user_id", F.session_window("ts", f"{SESSION_GAP_S} seconds"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,4)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def _win_session_oracle(d: str = dl.DUCK) -> str:
    gap = SESSION_GAP_S
    lag = "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)"
    return f"""
WITH flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN {dl.epoch_s('ts', d)} - {dl.epoch_s(lag, d)} > {gap}
                     OR {lag} IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
),
sessions AS (
    SELECT user_id, ts, value,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       {dl.secadd('MAX(ts)', str(gap), d)} AS session_end,
       COUNT(*) AS n_events,
       {dl.dsum('value', d)} AS sum_value
FROM sessions
GROUP BY user_id, session_id
"""


register_df(
    "win_session",
    _win_session_df,
    oracle_body=_win_session_oracle(),
    doc="Gap-based session window per key — parity: flock session.rs:42-271.",
    bench=True,
)


def _win_rows_frame(d: str) -> str:
    """ROWS BETWEEN 10 PRECEDING AND CURRENT ROW frame average (q6's declared
    form, flock/src/datasource/nexmark/queries/q6.sql:11-13); exact SUM/COUNT
    so the sliding-frame accumulation order can't skew doubles."""
    frame = """PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 10 PRECEDING AND CURRENT ROW"""
    return f"""
SELECT event_id,
       user_id,
       (CAST(SUM(CAST(value AS DECIMAL(20,4))) OVER ({frame}) AS DOUBLE)
        / COUNT(*) OVER ({frame})) AS avg_last10
FROM events
"""


register_sql(
    "win_rows_frame",
    _win_rows_frame,
    doc="OVER frame spec: trailing-10-rows average per key.",
)


def _win_sliding_epoch(d: str) -> str:
    """ElementWise/per-epoch micro-batch shape (flock elementwise.rs:30-186):
    per-second epochs collapse here to per-minute buckets with per-epoch
    counts — the degenerate 'window' the reference defaults to."""
    w = dl.tumble_start("ts", 60, d)
    return f"""
SELECT {w} AS epoch_start, COUNT(*) AS n, {dl.dsum('value', d)} AS sum_value
FROM events
GROUP BY {w}
"""


register_sql(
    "win_elementwise_epoch",
    _win_sliding_epoch,
    doc="Per-epoch micro-batch bucketing (ElementWise window parity).",
)


def _win_time_range(d: str) -> str:
    """Time-based RANGE frame: per ROW, aggregate every event of the same
    user in the trailing hour — the continuous sliding-window shape that
    bucketed tumbling/hopping windows approximate (no bucket boundary
    artifacts; each row gets ITS exact trailing window). Ordering is
    epoch seconds so the numeric RANGE frame is dialect-shared; rows with
    equal timestamps are frame PEERS (standard RANGE semantics, identical
    in both engines, so ties cannot skew values). Exact DECIMAL sums keep
    the frame accumulation order irrelevant.

    100 TB shape: one keyed shuffle + sort per user (same exchange the
    ROWS frame uses); the frame is evaluated by a sliding accumulator
    over the sorted run, never by self-join fan-out.
    """
    sec = dl.epoch_s("ts", d)
    frame = f"""PARTITION BY user_id ORDER BY {sec}
            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW"""
    return f"""
SELECT event_id,
       user_id,
       CAST(COUNT(*) OVER ({frame}) AS BIGINT) AS n_trailing_hour,
       CAST(SUM(CAST(value AS DECIMAL(20,4))) OVER ({frame}) AS DOUBLE)
           AS sum_trailing_hour
FROM events
"""


register_sql(
    "win_time_range",
    _win_time_range,
    doc="Per-row trailing-hour RANGE frame (continuous sliding window): "
    "numeric RANGE on epoch seconds, equal-ts rows as frame peers, "
    "exact DECIMAL sums.",
)
