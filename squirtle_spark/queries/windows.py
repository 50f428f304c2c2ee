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
       {dl.gsum('value', d)} AS sum_value
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
       {dl.gsum('value', d)} AS sum_value
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
SELECT {w} AS epoch_start, COUNT(*) AS n, {dl.gsum('value', d)} AS sum_value
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


STAGGER_S = TUMBLE_S  # 6-hour stagger windows, same grain as tumbling


def _win_stagger(d: str) -> str:
    """Stagger window, keyed-offset form — the reference DECLARES a
    Stagger variant (flock/src/stream/window.rs:104-110: "addresses the
    issue of related records not falling into the same time-restricted
    window") but never implements it anywhere in its codebase; this and
    ``stagger_reanchored`` below close even that declared-only gap.

    Keyed-offset semantics: each key's window grid is anchored at ITS
    first event (win k = [t0 + k*S, t0 + (k+1)*S)), so a burst that
    straddles the global tumbling boundary stays together as long as it
    started with the key's grid. Fully declarative — one keyed window
    pass for the per-key MIN, then a grouped count on the derived
    bucket; the same single (user_id)-keyed shuffle the frame windows
    pay, no recursion, no fan-out. This is the form that runs unchanged
    at 100 TB, and the one to prefer when the "first event after close
    re-anchors" subtlety doesn't matter.
    """
    t = dl.epoch_s("ts", d)
    idx = dl.intdiv("(t - t0)", str(STAGGER_S), d)
    return f"""
WITH anchored AS (
    SELECT user_id, {t} AS t,
           MIN({t}) OVER (PARTITION BY user_id) AS t0
    FROM events
)
SELECT user_id,
       CAST(t0 + {idx} * {STAGGER_S} AS BIGINT) AS win_start_s,
       CAST(t0 + ({idx} + 1) * {STAGGER_S} AS BIGINT) AS win_end_s,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM anchored
GROUP BY user_id, t0, {idx}
"""


register_sql(
    "win_stagger",
    _win_stagger,
    doc="Stagger window (keyed-offset tumbling): per-key grid anchored "
    "at the key's first event — the declarative scale form of the "
    "reference's declared-but-unimplemented Stagger variant.",
)


#: Count-window width: every N events per key emit one window.
ROWS_PER_WINDOW = 25


def _win_rows_tumble(d: str) -> str:
    """Count-based tumbling window (``Schedule::Rows(usize)``,
    flock/src/stream/window.rs:75) — the LAST window form the reference
    declares and never implements anywhere (same declared-only class as
    Stagger, closed in r9): per key, every N events form one window,
    regardless of how much wall time they span. The standard
    Kinesis/Flink count window.

    Declarative scale form: one keyed ROW_NUMBER (total-ordered by
    (ts, event_id) — event_id is globally unique, so both engines
    assign every row the identical bucket) → ``(rn-1) DIV N`` window id
    → grouped aggregate. The groupBy keys (user_id, win_id) are
    clustered by the window's (user_id) hash partitioning, so the whole
    operator costs ONE keyed shuffle — the same bound as the frame
    windows. Emitted open/close timestamps are the bucket's MIN/MAX
    event time (count windows have data-dependent, not grid, bounds).
    """
    t = dl.epoch_s("ts", d)
    win = dl.intdiv("rn", str(ROWS_PER_WINDOW), d)
    return f"""
WITH numbered AS (
    SELECT user_id, {t} AS t,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
    FROM events
)
SELECT user_id,
       CAST({win} AS BIGINT) AS win_id,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(MIN(t) AS BIGINT) AS open_s,
       CAST(MAX(t) AS BIGINT) AS close_s
FROM numbered
GROUP BY user_id, {win}
"""


register_sql(
    "win_rows_tumble",
    _win_rows_tumble,
    doc="Count-based tumbling window (every N events per key), the "
    "reference's declared-only Schedule::Rows — 0-based keyed "
    "ROW_NUMBER DIV N buckets, one shuffle.",
    # bench'd from r10 (the round it landed): keeps the new window
    # class wall-timed alongside the time/session window entries.
    bench=True,
)


def _stagger_reanchored_spark(spark, sf_dir):
    """Stagger window, strict RE-ANCHORING form (the Kinesis Analytics
    semantic): a key's first event OPENS a window [t, t+S); events
    inside it join that window; the first event AT OR AFTER the close
    opens a new window anchored at ITS time — so window starts are
    data-dependent (a recurrence over the key's ordered history), not a
    grid. Not expressible as a fixed composition of Spark window
    functions; implemented as the sanctioned custom-operator fallback —
    an Arrow-batched ``applyInPandas`` per-key scan (one (user_id)-keyed
    shuffle; per-key cost linear in its history; NOT row-at-a-time
    Python — the plan shows FlatMapGroupsInPandas, and the
    BatchEvalPython gate stays green). Per-key history must fit an
    executor, the stated bound every per-key-ordered operator here
    shares. The DuckDB oracle replays the recurrence exactly with a
    recursive CTE (anchors: seed = MIN(t), step = MIN(t >= a + S)),
    which is viable at oracle scale and proves the Python scan's
    verdicts value-for-value.
    """
    import pandas as pd

    ev = spark.table("events").selectExpr(
        "user_id", f"{dl.epoch_s('ts', dl.SPARK)} AS t"
    )

    def assign(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("t", kind="mergesort")
        anchor = None
        counts: dict[int, int] = {}
        for x in pdf["t"].to_numpy():
            x = int(x)
            if anchor is None or x >= anchor + STAGGER_S:
                anchor = x
            counts[anchor] = counts.get(anchor, 0) + 1
        uid = int(pdf["user_id"].iloc[0])
        return pd.DataFrame(
            {
                "user_id": uid,
                "win_start_s": list(counts.keys()),
                "win_end_s": [a + STAGGER_S for a in counts.keys()],
                "cnt": list(counts.values()),
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        assign,
        "user_id BIGINT, win_start_s BIGINT, win_end_s BIGINT, cnt BIGINT",
    )


def _stagger_reanchored_oracle() -> str:
    t = dl.epoch_s("ts", dl.DUCK)
    return f"""
WITH RECURSIVE pts AS (
    SELECT user_id, {t} AS t FROM events
),
anchors AS (
    SELECT user_id, MIN(t) AS a FROM pts GROUP BY user_id
    UNION ALL
    SELECT nxt.user_id, nxt.next_a AS a FROM (
        SELECT x.user_id AS user_id,
               (SELECT MIN(p.t) FROM pts p
                WHERE p.user_id = x.user_id AND p.t >= x.a + {STAGGER_S}) AS next_a
        FROM anchors x
    ) nxt WHERE nxt.next_a IS NOT NULL
)
SELECT p.user_id,
       CAST(x.a AS BIGINT) AS win_start_s,
       CAST(x.a + {STAGGER_S} AS BIGINT) AS win_end_s,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM pts p JOIN anchors x
  ON x.user_id = p.user_id AND p.t >= x.a AND p.t < x.a + {STAGGER_S}
GROUP BY p.user_id, x.a
"""


register_df(
    "stagger_reanchored",
    _stagger_reanchored_spark,
    oracle_body=_stagger_reanchored_oracle(),
    doc="Stagger window, strict re-anchoring semantics (first event "
    "after close opens the next window): Arrow-batched per-key scan on "
    "Spark, recursive-CTE replay as the DuckDB value oracle.",
)
