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
           {dl.gavg('value', d)} AS avg_value
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
    (the day branch aggregates 24x fewer rows; both engines run the
    two-branch text — the r15 single-derivation Spark fork was measured
    slower at every scale and reverted in r16, see below). Sums ride
    DECIMAL so re-aggregated partials are exactly associative — the same
    totals in any grouping order, which also makes the day==sum(hours)
    invariant bitwise checkable.
    """
    hour = dl.tumble_start("ts", 3600, d)
    day = dl.tumble_start("bucket_start", 86_400, d)
    # r16 REVERT of the r15 single-derivation Spark fork (a53fdda), per
    # VERDICT r15 #7's measured-crossover criterion: the window-over-
    # hours form lost at EVERY measured scale (sf0.1 +9%, 10x fixture
    # +6%, 30x fixture +2-18% across position-swapped fresh-session
    # A/Bs — OPTIMIZATION_r16.md). The duplicated scan+partial-agg leg
    # is vectorized and collapses map-side to ~3.6k hour rows, so
    # re-reading the corpus stays cheaper than the added window +
    # explode at any measurable scale; both dialects share the
    # two-branch text again (byte-identical to the pre-r15 form).
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
    excluded, like the bucket-local LOCF form. BUCKET-LOCAL means
    exactly that: a level held across midnight is credited to the day
    it was SET in (the last sample holds to ITS day's end and the next
    day starts fresh at its own first sample), so this is the
    independent-buckets composition, not TimescaleDB's rollup-across-
    buckets `time_weight` — `time_weighted_avg_continuous` below is
    that rollup form, crediting every day a hold covers with its in-day
    fraction. The integral accumulates
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


def _day_fanout(d: str) -> str:
    """FROM-clause fan-out producing every day in [d_lo, d_hi] — the
    per-row lateral the gapfill grid uses, at day grain. Bounded by the
    days a single hold spans, never a calendar cross join."""
    if d == dl.SPARK:
        return "LATERAL VIEW explode(sequence(d_lo, d_hi)) _g AS day_idx"
    return ", unnest(generate_series(d_lo, d_hi)) AS _g(day_idx)"


def _time_weighted_avg_continuous(d: str) -> str:
    """Time-weighted average with CROSS-BOUNDARY attribution — the
    TimescaleDB rollup-across-buckets composition, completing the pair
    with `time_weighted_avg` the same way `counter_delta_sum_continuous`
    completes `counter_delta_sum`: a level held ACROSS midnight credits
    every day it covers, each with its in-day fraction of the hold.

    Each sample's value is held from its time to the user's NEXT sample
    over the FULL series (LAG/LEAD over user_id alone, ties broken by
    event_id); the user's last sample holds to its own day's end (no
    extrapolation past observed data), and the span before the first
    sample is excluded as before. Each hold [t, t_end) is clipped to the
    days it spans via a bounded lateral fan-out (days-per-hold rows, not
    a calendar join), so day coverage is exact: a day fully inside a
    hold reports held_seconds = 86400. The WHERE t_end > t guard drops
    zero-length holds (duplicate timestamps) BEFORE the fan-out — Spark's
    sequence(lo, hi) generates a DESCENDING sequence when lo > hi rather
    than an empty one, so an unguarded zero-length hold would fan out to
    a phantom negative-width span.

    Exactness: DECIMAL(18,6) value x DECIMAL(10,0) clipped seconds,
    summed exactly, one DOUBLE conversion, one IEEE division — both
    engines bit-agree. Scale shape: one user-keyed window pass, a
    bounded per-row fan-out, one (user, day) grouped agg — the window
    partitions by user_id alone (coarser than the bucket-local form's
    (user, day)), the stated price of cross-boundary semantics.
    """
    t = dl.epoch_s("ts", d)
    return f"""
WITH samples AS (
    SELECT user_id, {t} AS t, event_id,
           CAST(value AS DECIMAL(18,6)) AS v
    FROM events
),
held AS (
    SELECT user_id, v, t,
           COALESCE(
               LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id),
               ({dl.intdiv('t', str(_DAY_S), d)} + 1) * {_DAY_S}
           ) AS t_end
    FROM samples
),
bounded AS (
    SELECT user_id, v, t, t_end,
           {dl.intdiv('t', str(_DAY_S), d)} AS d_lo,
           {dl.intdiv('(t_end - 1)', str(_DAY_S), d)} AS d_hi
    FROM held
    WHERE t_end > t
),
spans AS (
    SELECT user_id, v,
           CAST(day_idx AS BIGINT) AS day_idx,
           GREATEST(t, day_idx * {_DAY_S}) AS s,
           LEAST(t_end, (day_idx + 1) * {_DAY_S}) AS e
    FROM bounded {_day_fanout(d)}
)
SELECT user_id,
       day_idx,
       {dl.bsum('e - s', d)} AS held_seconds,
       CAST(SUM(v * CAST(e - s AS DECIMAL(10,0))) AS DOUBLE)
           / SUM(e - s) AS twa
FROM spans
GROUP BY user_id, day_idx
"""


register_sql(
    "time_weighted_avg_continuous",
    _time_weighted_avg_continuous,
    doc="Time-weighted average with cross-midnight holds credited to "
    "every day they cover (bounded per-hold day fan-out; exact DECIMAL "
    "integral — the rollup-across-buckets TWA).",
)


def _counter_delta_sum(d: str) -> str:
    """Reset-aware counter aggregation per (user, day) — the BUCKET-
    LOCAL form of Prometheus `increase()` / TimescaleDB `counter_agg`
    reset handling, the monotonic-counter companion to
    time_weighted_avg's gauge integral.

    Counters (bytes sent, requests served) only grow, except when the
    emitting process restarts and the series drops to near zero. The
    true increase over a bucket is the sum of positive deltas: a drop
    (LAG > current) marks a reset, contributing the post-reset value
    (current counts from 0) instead of a negative delta. Each day's
    first sample contributes nothing (no prior observation — bucket-
    local, like the TWA's leading span), so an increase that CROSSES
    midnight is not attributed to either day here — that is a stated
    difference from Prometheus, whose range vectors extrapolate across
    the boundary; `counter_delta_sum_continuous` below keeps the
    cross-boundary deltas by lagging over the full per-user series.
    n_resets is reported so a flapping emitter is visible, not
    silently smoothed.

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
    doc="Reset-aware counter increase per (user, day), bucket-local: "
    "sum of positive deltas within the day, drops counted as restarts "
    "from zero (exact DECIMAL deltas; cross-midnight deltas excluded "
    "by construction — see counter_delta_sum_continuous).",
)


def _counter_delta_sum_continuous(d: str) -> str:
    """Reset-aware counter increase with CROSS-BOUNDARY attribution —
    the closer match to Prometheus `increase()`: deltas are computed
    over the full per-user series (LAG over (user_id), not (user_id,
    day)), so an increase spanning midnight is kept, attributed to the
    day of the EARLIER sample (the delta accrued starting there; any
    fixed attribution rule is defensible, this one needs no
    apportioning arithmetic and stays exact). Every sample after a
    user's first contributes exactly one delta to exactly one day —
    unlike the bucket-local form, which silently drops one delta per
    (user, day) after the first.

    Scale shape: the window partitions by user_id alone — a coarser
    key than (user_id, day), still a single keyed shuffle; days for
    one user land in one partition's window pass, which is the price
    of cross-boundary semantics and is bounded by per-user history
    (salt by time-range first if one user's history outgrows an
    executor).
    """
    t = dl.epoch_s("ts", d)
    return f"""
WITH samples AS (
    SELECT user_id,
           {t} AS t,
           event_id,
           CAST(value AS DECIMAL(18,6)) AS v
    FROM events
),
deltas AS (
    SELECT user_id, v,
           LAG(v) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev,
           LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev_t
    FROM samples
)
SELECT user_id,
       {dl.intdiv('prev_t', str(_DAY_S), d)} AS day_idx,
       CAST(COUNT(*) AS BIGINT) AS n_deltas,
       CAST(SUM(CASE WHEN v < prev THEN 1 ELSE 0 END) AS BIGINT)
           AS n_resets,
       CAST(SUM(CASE WHEN v >= prev THEN v - prev ELSE v END)
            AS DOUBLE) AS counter_increase
FROM deltas
WHERE prev IS NOT NULL
GROUP BY user_id, {dl.intdiv('prev_t', str(_DAY_S), d)}
"""


register_sql(
    "counter_delta_sum_continuous",
    _counter_delta_sum_continuous,
    doc="Reset-aware counter increase with cross-midnight deltas kept "
    "(LAG over the full per-user series; each delta attributed to the "
    "earlier sample's day — the Prometheus increase()-shaped variant).",
)
