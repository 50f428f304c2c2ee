"""Analytic (OVER) functions, statistical aggregates, subqueries, pivot.

Widens SURVEY §2.5 beyond ROW_NUMBER/frames (the reference inherits the
full DataFusion window-function surface — LAG/LEAD/RANK/NTILE etc., see
flock's datafusion dependency; queries q5/q6/q9 exercise only a slice of
it) and §2.4 beyond the five basic aggregates.

Determinism rules for the cross-engine oracle:

- Every ORDER BY inside an OVER() ends with a unique key (event_id) so
  value-returning functions (LAG/NTILE/FIRST_VALUE) are well-defined.
- RANK/DENSE_RANK/PERCENT_RANK/CUME_DIST deliberately order by a
  low-cardinality expression so ties actually occur — their outputs are
  tie-invariant, so both engines agree.
- Running/windowed SUMs over DOUBLE route through DECIMAL (exact, hence
  association-order-independent: DuckDB evaluates window aggregates with
  segment trees, Spark incrementally — double would drift by ulps).
- Moment statistics (VAR/STDDEV/CORR/COVAR) are computed from exact
  DECIMAL power sums cast to DOUBLE, then combined with plain IEEE double
  arithmetic — bitwise-identical in both engines, unlike the engines'
  native streaming (Welford-style) implementations whose accumulation
  order differs.
"""

from __future__ import annotations

from .. import dialect as dl
from ..registry import register_df, register_sql


def _win_analytics(d: str) -> str:
    # Ranking family over a deliberately tie-heavy ordering (price bands).
    # All windows partition on user_id (high-cardinality at scale — a
    # low-cardinality key like event_type would cap parallelism at its
    # distinct count); ties per user still occur (10 bands per ~70 events).
    # NULLS LAST is EXPLICIT: Spark's ASC default is NULLS FIRST,
    # DuckDB's is NULLS LAST, so one NULL value in a partition silently
    # shifted every rank/percentile in it (r12 randomized differential
    # lane — the fixed fixtures have no NULL values, hiding the default).
    band = "CAST(FLOOR(value / 50) AS INT)"
    by_band = f"ORDER BY {band} NULLS LAST"
    return f"""
SELECT event_id,
       user_id,
       {band} AS price_band,
       CAST(RANK() OVER (PARTITION BY user_id {by_band}) AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER (PARTITION BY user_id {by_band}) AS BIGINT) AS drnk,
       PERCENT_RANK() OVER (PARTITION BY user_id {by_band}) AS prnk,
       CUME_DIST() OVER (PARTITION BY user_id {by_band}) AS cdist,
       CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS quartile,
       LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
       LEAD(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next2_value,
       LAG(value, 1, -1.0) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_by_user
FROM events
"""


register_sql(
    "win_analytics",
    _win_analytics,
    doc="RANK/DENSE_RANK/PERCENT_RANK/CUME_DIST/NTILE/LAG/LEAD (§2.5 depth).",
    bench=True,
)


def _win_cumulative(d: str) -> str:
    dec = "CAST(value AS DECIMAL(20,4))"
    return f"""
SELECT event_id,
       user_id,
       CAST(SUM({dec}) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
       CAST(COUNT(*) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n,
       FIRST_VALUE(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS first_val,
       LAST_VALUE(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_val,
       CAST(SUM({dec}) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS DOUBLE) AS centered_sum7
FROM events
"""


register_sql(
    "win_cumulative",
    _win_cumulative,
    doc="Running/centered frames + FIRST/LAST_VALUE (decimal-exact sums).",
)


def _stats_moments(d: str) -> str:
    # Exact decimal power sums -> DOUBLE -> closed-form moments. DECIMAL(14,4)
    # keeps products inside both engines' 38-digit cap (value<=1e10 fits).
    # The power sums are exact, but the DECIMAL→DOUBLE cast itself is
    # engine-dependent at the last ulp (measured r12: an 8-fractional-digit
    # sum converted 107751494.94989571 in Spark vs ...572 in DuckDB —
    # DuckDB's int128/scale path rounds twice), so the closed forms are
    # ROUNDed to 6 dp: coarse enough that 1-ulp input jitter can't flip
    # a digit, fine enough to keep the moments meaningful. Degenerate
    # groups match var_samp/corr SQL semantics instead of crashing
    # (r12 degenerate probe): n=1 → sample moments NULL (the /(n-1)
    # divided by zero under ANSI); a CONSTANT column → corr NULL (its
    # sqrt(variance) denominator is 0).
    x = "CAST(value AS DECIMAL(14,4))"
    y = "CAST(user_id AS DECIMAL(14,4))"
    return f"""
WITH m AS (
    SELECT event_type,
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM({x}) AS DOUBLE) AS sx,
           CAST(SUM({x} * {x}) AS DOUBLE) AS sxx,
           CAST(SUM({y}) AS DOUBLE) AS sy,
           CAST(SUM({y} * {y}) AS DOUBLE) AS syy,
           CAST(SUM({x} * {y}) AS DOUBLE) AS sxy
    FROM events
    GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CASE WHEN n > 1 THEN ROUND((sxx - sx * sx / n) / (n - 1), 6) END AS var_value,
       CASE WHEN n > 1 THEN ROUND(SQRT((sxx - sx * sx / n) / (n - 1)), 6) END AS stddev_value,
       ROUND((sxx - sx * sx / n) / n, 6) AS var_pop_value,
       CASE WHEN n > 1 THEN ROUND((sxy - sx * sy / n) / (n - 1), 6) END AS covar_value_user,
       CASE WHEN n > 1 AND (sxx - sx * sx / n) > 0 AND (syy - sy * sy / n) > 0
            THEN ROUND(((sxy - sx * sy / n) / (n - 1))
                       / (SQRT((sxx - sx * sx / n) / (n - 1))
                          * SQRT((syy - sy * sy / n) / (n - 1))), 6)
       END AS corr_value_user
FROM m
"""


register_sql(
    "agg_stats_moments",
    _stats_moments,
    doc="VAR/STDDEV/COVAR/CORR from exact decimal power sums (order-independent).",
)


def _mode_listagg(d: str) -> str:
    # MODE with a deterministic tie-break (smallest band among max counts) —
    # the engines' native mode() both break ties arbitrarily.
    if d == dl.SPARK:
        listagg = "array_join(array_sort(collect_set(event_type)), ',')"
    else:
        listagg = "string_agg(DISTINCT event_type, ',' ORDER BY event_type)"
    return f"""
WITH bands AS (
    SELECT user_id % 10 AS user_bucket,
           CAST(FLOOR(value / 50) AS INT) AS band,
           event_type
    FROM events
),
counts AS (
    SELECT user_bucket, band, COUNT(*) AS n
    FROM bands
    GROUP BY user_bucket, band
),
modes AS (
    -- NULLS LAST pinned: a NULL band (NULL value) must not win the
    -- mode on a tie — and the engines' default NULL placement under
    -- ASC differs (Spark FIRST, DuckDB LAST; r12 degenerate probe)
    SELECT user_bucket, band AS mode_band,
           ROW_NUMBER() OVER (
               PARTITION BY user_bucket
               ORDER BY n DESC, band ASC NULLS LAST) AS rn
    FROM counts
),
lists AS (
    SELECT user_bucket, {listagg} AS type_list
    FROM bands
    GROUP BY user_bucket
)
SELECT m.user_bucket, m.mode_band, l.type_list
FROM modes m
JOIN lists l ON m.user_bucket = l.user_bucket
WHERE m.rn = 1
"""


register_sql(
    "agg_mode_listagg",
    _mode_listagg,
    doc="Deterministic MODE + sorted LISTAGG/string_agg per group.",
)


def _subq_scalar_in(d: str) -> str:
    return f"""
SELECT event_id, user_id, event_type, value
FROM events
WHERE value > (SELECT {dl.gavg('value', d)} FROM events)
  AND event_type IN (SELECT DISTINCT event_type FROM events
                     WHERE event_type LIKE 'c%' OR event_type LIKE 's%')
"""


register_sql(
    "subq_scalar_in",
    _subq_scalar_in,
    doc="Uncorrelated scalar subquery + IN-subquery (semi-join rewrite).",
)


def _subq_correlated(d: str) -> str:
    # Correlated scalar aggregate: Catalyst/DuckDB both decorrelate this to
    # an aggregate + join — no per-row re-execution at scale.
    return f"""
SELECT e.event_id, e.user_id, e.value
FROM events e
WHERE e.value > 2.5 * (SELECT {dl.gavg('value', d)}
                       FROM events e2
                       WHERE e2.user_id = e.user_id)
"""


register_sql(
    "subq_correlated",
    _subq_correlated,
    doc="Correlated scalar-aggregate subquery (decorrelated to join).",
)


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _pivot_spark(spark, sf_dir):
    """Spark-native PIVOT; the oracle proves it equals conditional
    aggregation (which is also the 100 TB plan both engines compile to:
    one grouped aggregate, no extra shuffle per pivot column). Absent
    cells COALESCE to 0: a count over an empty set is 0, but Spark's
    PIVOT leaves the cell NULL where conditional aggregation's FILTER
    counts 0 (invisible on the full fixture where every cell occurs;
    r12 degenerate probe)."""
    cols = ", ".join(f"'{t}'" for t in _EVENT_TYPES)
    zeroed = ", ".join(
        f"CAST(COALESCE(`{t}`, 0) AS BIGINT) AS `{t}`" for t in _EVENT_TYPES
    )
    return spark.sql(
        f"""
        SELECT user_bucket, {zeroed} FROM (
            SELECT user_id % 10 AS user_bucket, event_type FROM events
        )
        PIVOT (COUNT(*) FOR event_type IN ({cols}))
        ORDER BY user_bucket
        """
    )


def _pivot_oracle() -> str:
    arms = ",\n       ".join(
        f"COUNT(*) FILTER (WHERE event_type = '{t}') AS \"{t}\""
        for t in _EVENT_TYPES
    )
    return f"""
SELECT user_id % 10 AS user_bucket,
       {arms}
FROM events
GROUP BY user_id % 10
ORDER BY user_bucket
"""


register_df(
    "pivot_event_matrix",
    _pivot_spark,
    oracle_body=_pivot_oracle(),
    doc="PIVOT to per-type count columns (== conditional aggregation).",
)


def _unpivot_spark(spark, sf_dir):
    """UNPIVOT (melt) the pivoted matrix back to long form via stack().

    The melt of a DENSE matrix carries its zero cells: every
    (bucket, type) combination appears, absent ones with cnt 0 — the
    shape a loss-weights or sampling consumer indexes by both keys
    without existence checks (the oracle builds the same dense frame by
    cross-joining observed buckets × the type list; on the full fixture
    every cell occurs so the two forms coincide — r12 degenerate
    probe)."""
    cols = ", ".join(f"'{t}'" for t in _EVENT_TYPES)
    stack_args = ", ".join(f"'{t}', `{t}`" for t in _EVENT_TYPES)
    return spark.sql(
        f"""
        WITH wide AS (
            SELECT * FROM (
                SELECT user_id % 10 AS user_bucket, event_type FROM events
            )
            PIVOT (COUNT(*) FOR event_type IN ({cols}))
        )
        SELECT user_bucket, event_type, CAST(COALESCE(cnt, 0) AS BIGINT) AS cnt
        FROM wide
        LATERAL VIEW stack({len(_EVENT_TYPES)}, {stack_args}) s AS event_type, cnt
        """
    )


_UNPIVOT_TYPE_LIST = ", ".join(f"('{t}')" for t in _EVENT_TYPES)

register_df(
    "unpivot_event_matrix",
    _unpivot_spark,
    oracle_body=f"""
WITH buckets AS (SELECT DISTINCT user_id % 10 AS user_bucket FROM events),
types(event_type) AS (VALUES {_UNPIVOT_TYPE_LIST}),
observed AS (
    SELECT user_id % 10 AS user_bucket, event_type, COUNT(*) AS cnt
    FROM events
    GROUP BY user_id % 10, event_type
)
SELECT b.user_bucket, t.event_type,
       CAST(COALESCE(o.cnt, 0) AS BIGINT) AS cnt
FROM buckets b
CROSS JOIN types t
LEFT JOIN observed o
  ON o.user_bucket = b.user_bucket AND o.event_type = t.event_type
""",
    doc="UNPIVOT/stack back to long form (dense melt: zero cells carried).",
)


def _funnel(d: str) -> str:
    """view → click → purchase conversion funnel, strictly ordered per
    user with a 7-day conversion window per step.

    The distributed shape is three grouped MINs joined on user_id (each a
    bounded shuffle on the same key, so AQE co-locates them) — never a
    per-user sort of full event history. Semantics: earliest view, then
    earliest click AFTER it within 7 days, then earliest purchase after
    that within 7 days; COUNTs are tie-invariant so both engines agree.
    """
    week = str(7 * 86400)
    return f"""
WITH v AS (
    SELECT user_id, MIN(ts) AS t1
    FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click'
      AND e.ts > v.t1 AND e.ts <= {dl.secadd('v.t1', week, d)}
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase'
      AND e.ts > c.t2 AND e.ts <= {dl.secadd('c.t2', week, d)}
    GROUP BY e.user_id
)
SELECT stage, stage_ord, n_users FROM (
    SELECT 'view' AS stage, 1 AS stage_ord, COUNT(*) AS n_users FROM v
    UNION ALL
    SELECT 'click' AS stage, 2 AS stage_ord, COUNT(*) AS n_users FROM c
    UNION ALL
    SELECT 'purchase' AS stage, 3 AS stage_ord, COUNT(*) AS n_users FROM p
) f
"""


register_sql(
    "funnel_conversion",
    _funnel,
    doc="3-stage ordered conversion funnel (7-day step window), "
    "grouped-MIN joins on user_id — no per-user history sort.",
)


def _cohort_retention(d: str) -> str:
    """Weekly cohort retention: users bucketed by first-seen week, counted
    as retained in each later week they are active.

    cohort = tumble(first event, 7d); offset = whole weeks between the
    activity week and the cohort week. One grouped MIN (cohort), one
    DISTINCT user-week projection, one join on user_id, one grouped
    COUNT(DISTINCT) — all shuffles keyed on user_id or the tiny
    (cohort, offset) pair; nothing is per-user sorted.
    """
    week_s = 7 * 86400
    cohort = dl.tumble_start("f.first_ts", week_s, d)
    actweek = dl.tumble_start("e.ts", week_s, d)
    offset = dl.intdiv(
        f"({dl.epoch_s('w.act_week', d)} - {dl.epoch_s('w.cohort_week', d)})",
        str(week_s),
        d,
    )
    return f"""
WITH f AS (
    SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
),
w AS (
    SELECT DISTINCT e.user_id,
           {cohort} AS cohort_week,
           {actweek} AS act_week
    FROM events e JOIN f ON e.user_id = f.user_id
)
SELECT cohort_week,
       CAST({offset} AS INT) AS week_offset,
       COUNT(DISTINCT user_id) AS n_active
FROM w
GROUP BY cohort_week, CAST({offset} AS INT)
"""


register_sql(
    "cohort_retention",
    _cohort_retention,
    doc="Weekly cohort retention matrix (first-seen week × week offset).",
)


SESSION_GAP_S = 1800  # matches win_session's gap: ~10k events / 30 days


def _session_paths(d: str) -> str:
    """Top user-journey paths: sessionize per user (gaps-and-islands, the
    same 30-min-gap rule win_session's oracle pins), render each session's
    ordered event-type sequence as a path string, rank paths by frequency.
    The classic product-analytics query downstream of sessionization —
    beyond-parity (the reference stops at the session window itself).

    Ordered aggregation is the cross-engine trap: Spark has no ORDER BY
    inside string_agg, so the path assembles via
    array_sort(collect_list(struct(ts, event_id, type))) — struct order
    makes the sort total (event_id tiebreak), identical to DuckDB's
    string_agg(... ORDER BY ts, event_id). Top-20 rides
    TakeOrderedAndProject (no global sort materialization).
    """
    if d == dl.SPARK:
        path = (
            "array_join(transform(array_sort(collect_list("
            "struct(ts, event_id, event_type))), x -> x.event_type), '>')"
        )
    else:
        path = "string_agg(event_type, '>' ORDER BY ts, event_id)"
    lag = "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    return f"""
WITH flagged AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN {dl.epoch_s('ts', d)} - {dl.epoch_s(lag, d)} > {SESSION_GAP_S}
                     OR {lag} IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
),
sessions AS (
    SELECT user_id, ts, event_id, event_type,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM flagged
),
paths AS (
    SELECT user_id, session_id, {path} AS path,
           CAST(COUNT(*) AS BIGINT) AS path_len
    FROM sessions
    GROUP BY user_id, session_id
)
SELECT path,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(MAX(path_len) AS BIGINT) AS path_len
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
"""


register_sql(
    "session_paths",
    _session_paths,
    doc="Top user-journey paths per session (gaps-and-islands sessionize + "
    "order-deterministic path assembly + frequency top-k).",
)


def _event_transitions(d: str) -> str:
    """First-order Markov transition matrix over each user's event stream:
    (previous type -> type) counts and the conditional probability
    P(next | prev) — the Sankey/flow-diagram aggregate. One keyed window
    pass for LAG, one grouped count; the probability joins back the
    per-prev totals (integer counts → the division is bit-identical).
    """
    lag = "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    return f"""
WITH steps AS (
    SELECT {lag} AS prev_type, event_type AS next_type
    FROM events
),
pairs AS (
    SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM steps
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
),
totals AS (
    SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_total
    FROM pairs GROUP BY prev_type
)
SELECT p.prev_type, p.next_type, p.n,
       ROUND(CAST(p.n AS DOUBLE) / CAST(t.n_total AS DOUBLE), 4) AS p_next
FROM pairs p
JOIN totals t ON p.prev_type = t.prev_type
"""


register_sql(
    "event_transitions",
    _event_transitions,
    doc="First-order event-type transition matrix with P(next|prev) — one "
    "LAG pass + one grouped count.",
)


ANOM_WINDOW = 7  # trailing hourly buckets per rolling baseline
ANOM_K = 3.0  # flag beyond mean ± 3 sigma


def _ts_anomaly(d: str) -> str:
    """Rolling-baseline anomaly flags on the hourly event-type series:
    mean/std of the {ANOM_WINDOW} STRICTLY-PRIOR buckets (the frame ends
    at 1 PRECEDING — a frame including the current row lets a spike
    inflate its own baseline and mask itself), from INTEGER power sums
    inside the frame (counts are BIGINT, so sum and sum-of-squares are
    exact and association-order-free — the agg_stats_moments determinism
    trick); flag buckets beyond mean ± {ANOM_K}σ once a full baseline
    exists. One keyed shuffle for the hourly rollup, one window pass per
    series — the monitoring query a pipeline runs over its own
    throughput/quality metrics at any scale.
    """
    hour = dl.tumble_start("ts", 3600, d)
    frame = f"ROWS BETWEEN {ANOM_WINDOW} PRECEDING AND 1 PRECEDING"
    win = f"OVER (PARTITION BY event_type ORDER BY bucket_hour {frame})"
    return f"""
WITH hourly AS (
    SELECT event_type, {hour} AS bucket_hour, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY event_type, {hour}
),
rolled AS (
    SELECT event_type, bucket_hour, cnt,
           CAST(SUM(cnt) {win} AS BIGINT) AS s1,
           CAST(SUM(cnt * cnt) {win} AS BIGINT) AS s2,
           CAST(COUNT(*) {win} AS BIGINT) AS n
    FROM hourly
)
SELECT event_type, bucket_hour, cnt,
       ROUND(CAST(s1 AS DOUBLE) / n, 4) AS roll_mean,
       ROUND(SQRT(GREATEST(CAST(s2 AS DOUBLE) / n
                 - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
                 CAST(0 AS DOUBLE))), 4) AS roll_std,
       (n >= {ANOM_WINDOW}
        AND ABS(cnt - CAST(s1 AS DOUBLE) / n)
            > {ANOM_K} * SQRT(GREATEST(CAST(s2 AS DOUBLE) / n
                  - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
                  CAST(0 AS DOUBLE)))) AS is_anomaly
FROM rolled
"""


register_sql(
    "ts_anomaly",
    _ts_anomaly,
    doc="Rolling mean±3σ anomaly flags on hourly event-type series "
    "(integer power sums in the frame — exact, order-free).",
)
