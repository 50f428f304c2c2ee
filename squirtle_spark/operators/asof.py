"""Temporal as-of join.

The reference *declares* this shape (q13's Flink-dialect ``FOR SYSTEM_TIME
AS OF`` temporal join, flock/src/datasource/nexmark/queries/q13.sql:20-27)
but executes a plain equi join; here it is implemented for real as a
Spark-native composition: union both sides with a marker, then one window
pass per key carrying the last known right-side value forward
(``last(..., ignorenulls=True)``). No per-key loops, no range explosion —
one shuffle on (key), one sort within partitions, which is exactly how a
sort-merge as-of join distributes at 100 TB.

Semantics: for each left row (probe), attach the most recent right row
(quote) with ``quote.ts <= probe.ts`` for the same key. DuckDB's native
``ASOF JOIN`` is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..registry import register_df


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Generic as-of join: latest right ROW at-or-before each left row.

    The value columns ride in ONE struct and ``last(ignorenulls)`` skips
    only the struct-NULL left rows — never a right row whose value
    happens to be NULL. The first cut carried each value column through
    its own ``last(col, ignorenulls=True)``, which silently rewrote
    "most recent quote's value is NULL" into "older quote's non-null
    value" — as-of must return the latest ROW's fields verbatim, nulls
    included (caught by the r12 randomized differential lane vs DuckDB
    ASOF JOIN on a fixture with ~3% null values; the fixed fixtures had
    no nulls, so the bug was invisible for eleven rounds).
    """
    l = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("_ts"),
            F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_r"),
        )
        .withColumn("_side", F.lit(0))
    )
    l = l.withColumn("_r", F.lit(None).cast(r.schema["_r"].dataType))
    unioned = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at equal ts (side 0 < 1), so an
    # exactly-simultaneous quote is visible to the probe (<= semantics).
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_asof")
    )
    filled = filled.select(
        "*",
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in value_cols],
    )
    return filled.where(F.col("_side") == 1).drop("_side", "_ts", "_r", "_asof")


def _asof_events(spark, sf_dir) -> DataFrame:
    """For every click, the most recent signup `value` of the same user."""
    ev = spark.table("events")
    clicks = ev.where("event_type = 'click'").select("event_id", "user_id", "ts", "value")
    signups = ev.where("event_type = 'signup'").select("user_id", "ts", "value")
    out = asof_join(
        clicks, signups, key="user_id", left_ts="ts", right_ts="ts", value_cols=["value"]
    )
    return out.select(
        "event_id", "user_id", "ts", F.col("asof_value").alias("signup_value")
    )


_ASOF_ORACLE = """
SELECT c.event_id,
       c.user_id,
       c.ts,
       s.value AS signup_value
FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'signup') s
  ON c.user_id = s.user_id AND c.ts >= s.ts
"""


register_df(
    "asof_join_events",
    _asof_events,
    oracle_body=_ASOF_ORACLE,
    doc="Temporal as-of join (FOR SYSTEM_TIME AS OF shape) vs DuckDB native ASOF JOIN.",
)
