"""Time-series densification: gap-fill + last-observation-carried-forward.

The missing member of the temporal family (windows aggregate EXISTING
rows, as-of joins align two series) — this one *creates* the regular
grid: per user, every hour between their first and last event exists in
the output, counts zero-filled and the hourly mean value
LOCF-interpolated across the gaps. The standard shape for feeding
regularly-sampled models from irregular event streams.

Distribution: one grouped agg for the per-key span, a per-row lateral
fan-out to grid points (bounded by span/step — no cross join against a
calendar table), one equi-join back on (key, hour), one window pass for
LOCF. Everything keyed on user_id — partitions like any keyed agg.
"""

from __future__ import annotations

from .. import dialect as dl
from ..registry import register_df, register_sql

_STEP_S = 3600


def _grid_fanout(d: str) -> str:
    """FROM-clause fan-out producing every grid hour in [h_lo, h_hi]."""
    if d == dl.SPARK:
        return "LATERAL VIEW explode(sequence(h_lo, h_hi)) _g AS hour_idx"
    return ", unnest(generate_series(h_lo, h_hi)) AS _g(hour_idx)"


def _locf(x: str, d: str) -> str:
    """Last non-null value up to the current row (per key, in grid order)."""
    over = "OVER (PARTITION BY user_id ORDER BY hour_idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    if d == dl.SPARK:
        return f"last({x}, true) {over}"
    return f"last_value({x} IGNORE NULLS) {over}"


def _gapfill(d: str) -> str:
    hour = dl.intdiv(dl.epoch_s("ts", d), str(_STEP_S), d)
    return f"""
WITH hourly AS (
    SELECT user_id,
           {hour} AS hour_idx,
           COUNT(*) AS cnt,
           {dl.davg('value', d)} AS avg_value
    FROM events
    GROUP BY user_id, {hour}
),
spans AS (
    SELECT user_id, MIN(hour_idx) AS h_lo, MAX(hour_idx) AS h_hi
    FROM hourly
    GROUP BY user_id
),
grid AS (
    SELECT user_id, CAST(hour_idx AS BIGINT) AS hour_idx
    FROM spans {_grid_fanout(d)}
),
joined AS (
    SELECT g.user_id,
           g.hour_idx,
           COALESCE(h.cnt, 0) AS cnt,
           h.avg_value
    FROM grid g
    LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour_idx = h.hour_idx
)
SELECT user_id,
       {dl.ts_from_s(f'hour_idx * {_STEP_S}', d)} AS hour_start,
       CAST(cnt AS BIGINT) AS cnt,
       {_locf('avg_value', d)} AS value_locf
FROM joined
"""


register_sql(
    "timeseries_gapfill_locf",
    _gapfill,
    doc="Per-user hourly grid: zero-filled counts + LOCF-interpolated values.",
)


def _resample_ohlc(d: str) -> str:
    """Downsample the irregular event stream to hourly OHLC bars per
    event_type (open/high/low/close + volume — the canonical time-series
    resample). Open/close are FIRST/LAST_VALUE over the bar's event-time
    order (ties broken on event_id, so both engines pick the same row);
    high/low/volume are plain aggregates. The window and the GROUP BY
    share the (event_type, bar) key, so Catalyst plans ONE exchange and
    reuses its sort — resampling costs a single keyed shuffle at any
    scale.
    """
    bar = dl.tumble_start("ts", 3600, d)
    order = "ORDER BY ts ASC, event_id ASC"
    frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
    return f"""
SELECT event_type, bar_start,
       MIN(open_v) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MIN(close_v) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM (
    SELECT event_type, {bar} AS bar_start, value,
           FIRST_VALUE(value) OVER (
               PARTITION BY event_type, {bar} {order} {frame}) AS open_v,
           LAST_VALUE(value) OVER (
               PARTITION BY event_type, {bar} {order} {frame}) AS close_v
    FROM events
) bars
GROUP BY event_type, bar_start
"""


register_sql(
    "resample_ohlc",
    _resample_ohlc,
    doc="Hourly OHLC downsampling per event_type: FIRST/LAST_VALUE bars + "
    "plain aggs on one shared keyed shuffle.",
)


def _rollup_multires(d: str) -> str:
    """Hypertable-style multi-resolution rollup (continuous aggregate):
    per-type counts/sums at HOUR grain, with the DAY grain re-aggregated
    from the hour partials rather than the raw stream — the hierarchical
    re-aggregation that makes multi-grain dashboards affordable at 100 TB
    (the day branch aggregates 24x fewer rows, and Spark's ReuseExchange
    shares the hourly shuffle between the two output branches). Sums ride
    DECIMAL so re-aggregated partials are exactly associative — the same
    totals in any grouping order, which also makes the day==sum(hours)
    invariant bitwise checkable.
    """
    hour = dl.tumble_start("ts", 3600, d)
    day = dl.tumble_start("bucket_start", 86_400, d)
    return f"""
WITH hourly AS (
    SELECT event_type,
           {hour} AS bucket_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           SUM(CAST(value AS DECIMAL(20,4))) AS sum_value
    FROM events
    GROUP BY event_type, {hour}
),
daily AS (
    SELECT event_type,
           {day} AS bucket_start,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           SUM(sum_value) AS sum_value
    FROM hourly
    GROUP BY event_type, {day}
)
SELECT 'hour' AS grain, event_type, bucket_start, n_events,
       CAST(sum_value AS DOUBLE) AS sum_value
FROM hourly
UNION ALL
SELECT 'day' AS grain, event_type, bucket_start, n_events,
       CAST(sum_value AS DOUBLE) AS sum_value
FROM daily
"""


register_sql(
    "rollup_multires",
    _rollup_multires,
    doc="Hypertable-style continuous aggregate: hour grain + day grain "
    "re-aggregated from hour partials (shared shuffle, exact DECIMAL sums).",
    bench=True,
)


#: Incremental merge: everything before the cutoff is the "already
#: materialized" base table; everything at/after it is the late batch.
MERGE_CUTOFF = "2024-01-25 00:00:00"


def _incremental_agg_merge(d: str) -> str:
    """Incremental materialized-aggregate maintenance: a daily metrics
    table built from the pre-cutoff history MERGES with partials from a
    late batch — re-aggregating mergeable state (count-sum / sum-sum /
    min-min / max-max) instead of rescanning history. The query output is
    the merged table; the ORACLE is the from-scratch recompute over all
    of ``events``, so a green row proves the merge identity itself
    (merge(partials) == recompute), not just cross-engine agreement.

    100 TB shape: the nightly pattern — history partials are read back
    from the materialized table (a bounded day × type grain), only the
    new batch is scanned; the merge shuffles the day-grain partials, not
    the event grain. Exact-distinct is deliberately absent (not
    mergeable); the HLL path for it is sketch_merge_distinct.
    """
    day = dl.tumble_start("ts", 86_400, d)
    cut = dl.ts_lit(MERGE_CUTOFF, d)

    def partial(pred: str) -> str:
        return f"""
    SELECT {day} AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(value AS DECIMAL(20,4))) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events WHERE {pred}
    GROUP BY {day}, event_type"""

    return f"""
WITH base AS ({partial(f"ts < {cut}")}),
late AS ({partial(f"ts >= {cut}")}),
merged AS (
    SELECT day, event_type,
           CAST(SUM(n) AS BIGINT) AS n,
           SUM(sum_value) AS sum_value,
           MIN(min_value) AS min_value,
           MAX(max_value) AS max_value
    FROM (SELECT * FROM base UNION ALL SELECT * FROM late) p
    GROUP BY day, event_type
)
SELECT day, event_type, n,
       CAST(CAST(sum_value AS DECIMAL(38,6)) AS DOUBLE) AS sum_value,
       min_value, max_value
FROM merged
"""


def _recompute_oracle() -> str:
    """From-scratch daily recompute (DuckDB dialect) — the merge's ground truth."""
    day = dl.tumble_start("ts", 86_400, dl.DUCK)
    return f"""
SELECT {day} AS day,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY {day}, event_type
"""


register_df(
    "incremental_agg_merge",
    lambda spark, sf_dir: spark.sql(_incremental_agg_merge(dl.SPARK)),
    oracle_body=_recompute_oracle(),
    doc="Incremental materialized-aggregate maintenance: day-grain "
    "partials + late batch merged by re-aggregation; oracle is the "
    "from-scratch recompute, proving merge(partials) == recompute.",
)


_DAY_S = 86400


def _time_weighted_avg(d: str) -> str:
    """Time-weighted average per (user, day) over irregular samples —
    the TimescaleDB `time_weight('LOCF', ...)` composition, the member
    of the temporal family the grid ops don't cover (gapfill densifies
    COUNTS onto a grid; this integrates the VALUE as a step function,
    so a sensor that reports rarely but holds a level for hours is
    averaged by TIME HELD, not by sample count).

    Each sample's value is held from its arrival to the next sample
    (LEAD over (user, day), ties broken by event_id — deterministic
    under any partitioning) and the day's last sample holds to day end;
    the span before the first sample has no prior observation and is
    excluded, like the bucket-local LOCF form. The integral accumulates
    as DECIMAL(18,6) x DECIMAL(10,0) seconds — exact, so both engines
    agree bit-for-bit — and converts to DOUBLE once, with NO re-round
    (one decimal->double conversion, one IEEE division).

    Scale shape: one window pass and one grouped agg, both keyed on
    (user_id, day) — the same single keyed shuffle every other member
    of this family pays; no fan-out, no grid join.
    """
    t = dl.epoch_s("ts", d)
    return f"""
WITH samples AS (
    SELECT user_id,
           {dl.intdiv(t, str(_DAY_S), d)} AS day_idx,
           {t} AS t,
           event_id,
           value
    FROM events
),
held AS (
    SELECT user_id, day_idx, value,
           COALESCE(
               LEAD(t) OVER (PARTITION BY user_id, day_idx
                             ORDER BY t, event_id),
               (day_idx + 1) * {_DAY_S}
           ) - t AS dt
    FROM samples
)
SELECT user_id,
       day_idx,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       {dl.bsum('dt', d)} AS held_seconds,
       CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(dt AS DECIMAL(10,0)))
            AS DOUBLE) / SUM(dt) AS twa
FROM held
GROUP BY user_id, day_idx
"""


register_sql(
    "time_weighted_avg",
    _time_weighted_avg,
    doc="Per-(user, day) time-weighted average of irregular samples "
    "(LOCF hold to next sample / day end; exact DECIMAL integral).",
)


def _counter_delta_sum(d: str) -> str:
    """Reset-aware counter aggregation per (user, day) — the
    TimescaleDB/Prometheus `counter_agg`/`increase()` semantics, the
    monotonic-counter companion to time_weighted_avg's gauge integral.

    Counters (bytes sent, requests served) only grow, except when the
    emitting process restarts and the series drops to near zero. The
    true increase over a bucket is the sum of positive deltas: a drop
    (LAG > current) marks a reset, contributing the post-reset value
    (current counts from 0) instead of a negative delta. Each day's
    first sample contributes nothing (no prior observation — bucket-
    local, like the TWA's leading span). n_resets is reported so a
    flapping emitter is visible, not silently smoothed.

    Exactness: deltas are DECIMAL(18,6) differences summed exactly,
    one DOUBLE conversion at the end — both engines bit-agree. Scale
    shape: the family's single (user_id, day) keyed shuffle — one
    window pass, one grouped agg, nothing else.
    """
    t = dl.epoch_s("ts", d)
    return f"""
WITH samples AS (
    SELECT user_id,
           {dl.intdiv(t, str(_DAY_S), d)} AS day_idx,
           {t} AS t,
           event_id,
           CAST(value AS DECIMAL(18,6)) AS v
    FROM events
),
deltas AS (
    SELECT user_id, day_idx, v,
           LAG(v) OVER (PARTITION BY user_id, day_idx
                        ORDER BY t, event_id) AS prev
    FROM samples
)
SELECT user_id,
       day_idx,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(CASE WHEN prev IS NULL THEN 0 ELSE 1 END) AS BIGINT)
           AS n_deltas,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND v < prev THEN 1 ELSE 0 END)
            AS BIGINT) AS n_resets,
       CAST(SUM(CASE WHEN prev IS NULL THEN CAST(0 AS DECIMAL(18,6))
                     WHEN v >= prev THEN v - prev
                     ELSE v END) AS DOUBLE) AS counter_increase
FROM deltas
GROUP BY user_id, day_idx
"""


register_sql(
    "counter_delta_sum",
    _counter_delta_sum,
    doc="Reset-aware counter increase per (user, day): sum of positive "
    "deltas, drops counted as restarts from zero (counter_agg/"
    "increase() semantics; exact DECIMAL deltas).",
)
