"""Bucketed time-range join.

The reference's winning-bid queries already pair an equi key with a range
residual (q4/q6/q9: ``b_date_time BETWEEN a_date_time AND expires``); this
operator covers the harder shape — a PURE range predicate with a bounded
span (``r.ts BETWEEN l.ts AND l.ts + W``) where a naive plan degenerates
into BroadcastNestedLoopJoin / cartesian: O(|L|·|R|) comparisons, the
classic 100 TB killer.

Scale strategy (the standard interval-bucketing distribution): quantize
time into W-second buckets; each left row owns the two buckets its
window can overlap ([b, b+1] — the window spans at most 2 buckets when
W == bucket size), each right row lives in exactly one bucket, equi-join
on (key, bucket) + residual filter. Each matching pair meets in exactly
ONE bucket (the right row's), so no dedup pass is needed. The join is a
plain shuffled hash join on (user_id, bucket): partitionable, AQE/skew
eligible, no nested loop anywhere (plan-asserted in tests/test_plans.py).

Oracle: DuckDB runs the naive inequality join — same rows, quadratic plan
it can afford at fixture scale (DuckDB also implements IEJoin natively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..registry import register_df

#: Window width (and bucket size), seconds.
_W = 3600


def range_join_window(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_s: int,
) -> DataFrame:
    """All (l, r) with same key and ``l.ts <= r.ts <= l.ts + window_s``.

    Both inputs must be narrow already (select before calling); the
    expansion factor is exactly 2 on the left side only.
    """
    lb = F.expr(f"unix_timestamp(CAST({left_ts} AS TIMESTAMP)) DIV {window_s}")
    rb = F.expr(f"unix_timestamp(CAST({right_ts} AS TIMESTAMP)) DIV {window_s}")
    l2 = left.withColumn("_b0", lb).withColumn(
        "_bucket", F.explode(F.array(F.col("_b0"), F.col("_b0") + 1))
    )
    r2 = right.withColumn("_bucket", rb)
    joined = l2.join(r2, on=[key, "_bucket"]).where(
        (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {window_s} SECOND"))
    )
    return joined.drop("_b0", "_bucket")


def _range_join_events(spark, sf_dir) -> DataFrame:
    """Purchases within 1h after a click by the same user (conversion join)."""
    ev = spark.table("events")
    clicks = ev.where("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    out = range_join_window(
        clicks, purchases, key="user_id", left_ts="click_ts", right_ts="purchase_ts", window_s=_W
    )
    return out.select(
        "click_id", "user_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value"
    )


_RANGE_ORACLE = f"""
SELECT c.event_id AS click_id,
       c.user_id,
       c.ts AS click_ts,
       p.event_id AS purchase_id,
       p.ts AS purchase_ts,
       p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL {_W} SECOND
"""


register_df(
    "range_join_conversions",
    _range_join_events,
    oracle_body=_RANGE_ORACLE,
    doc="Bounded time-range join via interval bucketing (no nested loop).",
    bench=True,
)


#: Interval lengths for the overlap-join query (seconds). The bucket width
#: is the larger of the two.
_VIEW_LEN = 900
_PURCH_LEN = 1800


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    max_len_s: int,
) -> DataFrame:
    """All (l, r) pairs with the same key whose intervals OVERLAP
    (``l.start <= r.end AND r.start <= l.end``) — the two-interval
    generalization of :func:`range_join_window`'s point-in-interval shape.

    ``max_len_s`` must bound BOTH interval lengths; it becomes the bucket
    width. Every overlapping right interval starts within
    ``[l.start - max_len, l.end]``, so the left side explodes to that
    bucket span (at most 3 buckets when lengths <= max_len) while the
    right side keeps its single start bucket — each qualifying pair meets
    in EXACTLY one bucket (no dedup pass), and the join stays a plain
    shuffled hash join on (key, bucket): partitionable, skew/AQE eligible,
    never a nested loop.
    """
    us = "unix_timestamp(CAST({c} AS TIMESTAMP))"
    lo = F.expr(f"({us.format(c=left_start)} - {max_len_s}) DIV {max_len_s}")
    hi = F.expr(f"{us.format(c=left_end)} DIV {max_len_s}")
    l2 = left.withColumn("_bucket", F.explode(F.sequence(lo, hi)))
    r2 = right.withColumn("_bucket", F.expr(f"{us.format(c=right_start)} DIV {max_len_s}"))
    joined = l2.join(r2, on=[key, "_bucket"]).where(
        (F.col(left_start) <= F.col(right_end)) & (F.col(right_start) <= F.col(left_end))
    )
    return joined.drop("_bucket")


def _interval_overlap_events(spark, sf_dir) -> DataFrame:
    """Per-user attention overlap: view windows [ts, ts+15m) overlapping
    purchase windows [ts, ts+30m) — counts aggregated per user."""
    ev = spark.table("events")
    views = ev.where("event_type = 'view'").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("v_start"),
        F.expr(f"ts + INTERVAL {_VIEW_LEN} SECOND").alias("v_end"),
    )
    purchases = ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_start"),
        F.expr(f"ts + INTERVAL {_PURCH_LEN} SECOND").alias("p_end"),
    )
    pairs = interval_overlap_join(
        views,
        purchases,
        key="user_id",
        left_start="v_start",
        left_end="v_end",
        right_start="p_start",
        right_end="p_end",
        max_len_s=_PURCH_LEN,
    )
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("view_id").alias("n_views"),
        F.countDistinct("purchase_id").alias("n_purchases"),
    )


_OVERLAP_ORACLE = f"""
SELECT v.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT v.event_id) AS BIGINT) AS n_views,
       CAST(COUNT(DISTINCT p.event_id) AS BIGINT) AS n_purchases
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND v.ts <= p.ts + INTERVAL {_PURCH_LEN} SECOND
 AND p.ts <= v.ts + INTERVAL {_VIEW_LEN} SECOND
GROUP BY v.user_id
"""


register_df(
    "interval_overlap_join",
    _interval_overlap_events,
    oracle_body=_OVERLAP_ORACLE,
    doc="Interval-overlap join (two interval sets, overlap predicate) via "
    "single-meeting-bucket quantization; per-user overlap counts.",
    bench=True,
)
