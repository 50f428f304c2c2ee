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
