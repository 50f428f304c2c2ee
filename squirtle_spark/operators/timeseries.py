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
from ..registry import register_sql

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
