"""Core relational operator coverage (SURVEY.md §2.2/§2.4/§2.6).

Each query exercises one operator family end to end over the ``events``
fixture table: scan, projection+arithmetic, filter (AND/OR/BETWEEN/MOD),
CAST, grouped aggregation (COUNT/COUNT DISTINCT/MIN/MAX/SUM/AVG), global
aggregate, global sort + LIMIT, top-k per group, DISTINCT.

Reference parity: these are DataFusion-inherited operators in flock
(ProjectionExec/FilterExec/HashAggregateExec/SortExec — see
flock/src/distributed_plan/stage.rs:277-355 for how flock stages them);
Spark's Catalyst owns the same semantics here.
"""

from __future__ import annotations

from .. import dialect as dl
from ..registry import register_sql


def _scan(d: str) -> str:
    return "SELECT event_id, ts, user_id, event_type, value, props FROM events"


register_sql(
    "events_scan",
    _scan,
    doc="Full scan / pass-through projection (parity: nexmark q0 shape).",
)


def _project_arith(d: str) -> str:
    return """
SELECT event_id,
       user_id,
       CAST(0.42 AS DOUBLE) * value AS adj_value,
       value * 2.0 + 1.0 AS scaled,
       event_id % 7 AS bucket_id,
       MOD(user_id, 13) AS user_mod
FROM events
"""


register_sql(
    "events_project_arith",
    _project_arith,
    doc="Projection + arithmetic + MOD (parity: nexmark q1/q2 expressions).",
)


def _filter(d: str) -> str:
    return """
SELECT event_id, user_id, event_type, value
FROM events
WHERE value BETWEEN 10.0 AND 200.0
  AND event_type = 'click'
  AND (user_id % 2 = 0 OR value > 150.0)
"""


register_sql(
    "events_filter",
    _filter,
    doc="Filter: comparison, AND/OR, BETWEEN (FilterExec parity).",
)


def _cast(d: str) -> str:
    return f"""
SELECT event_id,
       {dl.to_int('value', d)} AS value_floor,
       CAST(event_id AS STRING) AS id_str,
       CAST(user_id AS DOUBLE) AS uid_d,
       CAST(value > 100.0 AS INT) AS is_big
FROM events
"""


register_sql(
    "events_cast",
    _cast,
    doc="CAST across int/string/double/bool (CastExpr parity).",
)


def _agg_groups(d: str) -> str:
    return f"""
SELECT event_type,
       COUNT(*) AS cnt,
       COUNT(DISTINCT user_id) AS users,
       CAST(MIN(value) AS DOUBLE) AS min_value,
       CAST(MAX(value) AS DOUBLE) AS max_value,
       {dl.gsum('value', d)} AS sum_value,
       {dl.gavg('value', d)} AS avg_value,
       {dl.bsum('CASE WHEN value > 100 THEN 1 ELSE 0 END', d)} AS n_big
FROM events
GROUP BY event_type
"""


register_sql(
    "agg_event_stats",
    _agg_groups,
    doc="Two-phase grouped agg: COUNT/COUNT DISTINCT/MIN/MAX/SUM/AVG + conditional.",
    bench=True,
)


def _agg_multikey(d: str) -> str:
    return f"""
SELECT event_type,
       user_id % 10 AS user_bucket,
       COUNT(*) AS cnt,
       {dl.gsum('value', d)} AS sum_value
FROM events
GROUP BY event_type, user_id % 10
"""


register_sql(
    "agg_multikey",
    _agg_multikey,
    doc="Multi-key GROUP BY incl. computed key (parity: q4 GROUP BY a_id, category).",
)


def _agg_grouping_sets(d: str) -> str:
    """Arbitrary (non-hierarchical) grouping-set lattice in ONE pass —
    widens agg_rollup, whose ROLLUP can only emit prefix sets: the lone
    (cohort) set here is unreachable by ROLLUP. Spark's Expand operator
    fans each input row to one row per set before the shuffle, so all four
    levels share a single scan + aggregate; GROUPING() flags distinguish
    "NULL because rolled up" from a genuine NULL key. The fan-out is 4x
    before partial aggregation — at 100 TB prefer restricting to the sets
    a dashboard needs over a full CUBE's 2^k."""
    return f"""
SELECT CASE WHEN GROUPING(event_type) = 1 THEN 'ALL' ELSE event_type END AS type_lvl,
       CASE WHEN GROUPING(cohort) = 1 THEN -1 ELSE cohort END AS cohort_lvl,
       CAST(GROUPING(event_type) * 2 + GROUPING(cohort) AS BIGINT) AS lattice_lvl,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {dl.gsum('value', d)} AS sum_value
FROM (SELECT event_type, user_id % 4 AS cohort, user_id, value FROM events) e
GROUP BY GROUPING SETS ((event_type, cohort), (event_type), (cohort), ())
"""


register_sql(
    "agg_grouping_sets",
    _agg_grouping_sets,
    doc="GROUPING SETS rollup lattice: 4 aggregation levels in one "
    "Expand+aggregate pass, GROUPING() flags disambiguating rolled-up NULLs.",
)


def _agg_global(d: str) -> str:
    return f"""
SELECT COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types,
       {dl.gsum('value', d)} AS total_value,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM events
"""


register_sql(
    "agg_global",
    _agg_global,
    doc="Global (ungrouped) aggregate.",
)


def _orderby_limit(d: str) -> str:
    return """
SELECT event_id, user_id, value
FROM events
ORDER BY value DESC, event_id ASC
LIMIT 100
"""


register_sql(
    "orderby_limit",
    _orderby_limit,
    doc="Global sort + LIMIT with a total-order tiebreak (SortExec+LimitExec parity).",
)


def _topk_per_group(d: str) -> str:
    return """
SELECT event_type, event_id, user_id, value
FROM (
    SELECT event_type, event_id, user_id, value,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
    FROM events
)
WHERE rn <= 3
"""


register_sql(
    "topk_per_group",
    _topk_per_group,
    doc="Top-k per group via ROW_NUMBER (parity: nexmark q9 k=1 / q6 k=10 pattern).",
)


def _distinct(d: str) -> str:
    return """
SELECT DISTINCT event_type, user_id % 5 AS user_bucket
FROM events
"""


register_sql(
    "distinct_pairs",
    _distinct,
    doc="DISTINCT as aggregate-based dedup (parity: nexmark q8 GROUP BY dedup).",
)


def _repartition_ctrl(spark, sf_dir):
    """Explicit partitioning control (§2.8 RepartitionExec/CoalesceBatchesExec
    parity; flock/src/transmute.rs:77-108): hash-repartition on the grouping
    key so the aggregation is shuffle-free, then coalesce the output. Row
    semantics are partitioning-invariant — the oracle checks exactly that."""
    from pyspark.sql import functions as F

    ev = spark.table("events")
    return (
        ev.repartition(16, "user_id")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .coalesce(4)
    )


from ..registry import register_df  # noqa: E402

register_df(
    "repartition_ctrl",
    _repartition_ctrl,
    oracle_body="SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id",
    doc="repartition(k, col) + coalesce: partitioning control with invariant results.",
)


def _rollup(d: str) -> str:
    """GROUP BY ROLLUP — multi-level aggregates in one pass (SURVEY §2.4
    notes grouping sets are 'free via cube()/rollup() if extended')."""
    return f"""
SELECT event_type,
       CAST(user_id % 5 AS INT) AS user_bucket,
       COUNT(*) AS cnt,
       {dl.gsum('value', d)} AS sum_value
FROM events
GROUP BY ROLLUP (event_type, CAST(user_id % 5 AS INT))
"""


register_sql(
    "agg_rollup",
    _rollup,
    doc="ROLLUP grouping sets: per-key, per-group and grand totals in one pass.",
)


def _json_extract(d: str) -> str:
    """JSON column decode (the Kafka connector's payload path,
    flock/src/datasource/kafka.rs:48-101: bytes → JSON → typed columns)."""
    if d == dl.SPARK:
        k = "CAST(get_json_object(props, '$.k') AS INT)"
    else:
        k = "CAST(json_extract_string(props, '$.k') AS INT)"
    return f"""
SELECT event_id,
       {k} AS prop_k,
       event_type
FROM events
WHERE {k} > 50
"""


register_sql(
    "events_json_extract",
    _json_extract,
    doc="JSON string column → typed value extraction + filter (Kafka payload path).",
)


def _salted_agg(spark, sf_dir):
    """Skew-safe two-phase aggregation: pre-aggregate on (key, salt) so one
    hot key spreads over N reducers, then combine partials. Results are
    salt-invariant — the oracle checks exactly that. At 100 TB this is the
    manual fallback when AQE skew-split can't help (e.g. single mega-key
    aggregations); normally AQE's skewJoin/partition coalescing handles it."""
    from pyspark.sql import functions as F

    ev = spark.table("events")
    n_salt = 16
    partial = (
        ev.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salt)))
        .groupBy("event_type", "_salt")
        .agg(
            F.count("*").alias("pc"),
            F.sum(F.col("value").cast("decimal(20,4)")).alias("ps"),
        )
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pc").alias("cnt"),
            F.sum("ps").cast("double").alias("sum_value"),
        )
        .withColumn("cnt", F.col("cnt").cast("bigint"))
    )


register_df(
    "salted_agg",
    _salted_agg,
    oracle_body=(
        "SELECT event_type, COUNT(*) AS cnt, "
        "CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sum_value "
        "FROM events GROUP BY event_type"
    ),
    doc="Salted two-phase aggregation for skewed keys (salt-invariant results).",
)


def _salted_join_agg(spark, sf_dir):
    """Two-sided salted SHUFFLE join — the manual skew mitigation
    ``join_skew_report`` diagnoses toward: spread a hot probe-side key
    over N_SALT reducers by salting the probe rows deterministically and
    replicating each build row once per salt value, joining on
    (key, salt). Build-side growth is N_SALT× but only on the BUILD rows
    of hot keys' partitions (here all, for a checkable demo); at 100 TB
    salt only the diagnosed hot keys and union with a plain join of the
    rest — AQE's skew-split does this automatically for sort-merge
    plans, this operator is the fallback when the skew lives in a
    single key that AQE can't subdivide further. Results are
    salt-invariant; the oracle is the UNSALTED join+aggregate.

    shuffle_hash hint pins a shuffled hash join (no broadcast, no sort):
    the plan shape the mitigation targets."""
    from pyspark.sql import functions as F

    li = spark.table("lineitem")
    orders = spark.table("orders")
    n_salt = 8
    probe = li.withColumn(
        "_salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salt))
    )
    build = orders.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    # hint the BUILD side: the replicated dimension is what each reducer
    # should hash; hinting the fact side would build on the huge relation
    joined = probe.join(
        build.hint("shuffle_hash"),
        (probe.l_orderkey == build.o_orderkey) & (probe._salt == build._salt),
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
                    "decimal(20,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
        .withColumn("n_items", F.col("n_items").cast("bigint"))
    )


register_df(
    "salted_join_agg",
    _salted_join_agg,
    oracle_body=(
        "SELECT o_orderpriority, COUNT(*) AS n_items, "
        "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4))) "
        "AS DOUBLE) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY o_orderpriority"
    ),
    doc="Two-sided salted shuffle join for skewed join keys: deterministic "
    "probe-side salt + build-side replication, joined on (key, salt); "
    "salt-invariant results checked against the unsalted join.",
    bench=True,
)


def _set_ops(d: str) -> str:
    """UNION / INTERSECT / EXCEPT in one result (SURVEY §2.7: available,
    no reference query uses them). Identical syntax in both dialects;
    Spark plans INTERSECT/EXCEPT as left-semi/left-anti aggregates."""
    return """
SELECT 'click_and_purchase' AS tag, user_id FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
) b
UNION ALL
SELECT 'view_never_bought' AS tag, user_id FROM (
    SELECT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
) n
"""


register_sql(
    "set_ops",
    _set_ops,
    doc="Set operations: INTERSECT + EXCEPT + UNION ALL over event cohorts.",
)
