"""Warehouse-style dimension maintenance over the ``events`` change log.

Beyond-parity: the reference engine's surface stops at DataFusion's
relational operators (SURVEY §2.10); a training-data platform additionally
maintains slowly-changing metadata tables (source catalogs, license
states, domain labels) that downstream joins must see AS OF a given time.

``scd2_dimension`` builds a Type-2 slowly-changing dimension from an
append-only change log: collapse consecutive runs of the same attribute
value (gaps-and-islands), emit one row per run with a
``[valid_from, valid_to)`` validity interval, a per-key version number,
and an ``is_current`` flag on the open-ended run.

100 TB shape: two window passes over the SAME (user_id × time) ordering —
Catalyst plans ONE keyed shuffle + sort and reuses it for LAG, LEAD and
ROW_NUMBER (no second exchange); the change-collapse filter runs between
them, so the second pass only sorts the (usually far smaller) change rows.
Nothing is corpus-global: every partition key is the dimension's natural
key, so the build scales with the busiest key's history, not the log size.
The output joins against facts with the as-of pattern
(``operators/asof.py``) or a plain BETWEEN on the validity interval
(``operators/rangejoin.py``).

The SQL is engine-shared (no dialect splits): window functions, ordered
by the (ts, event_id) total order so ties can't flip versions between
engines.
"""

from __future__ import annotations

from ..registry import register_sql


def _scd2_dimension(d: str) -> str:
    # ``d`` unused: the body is identical in Spark SQL and DuckDB.
    return """
WITH log AS (
    SELECT user_id, ts, event_type, event_id,
           LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_type,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS rn
    FROM events
),
changes AS (
    -- keep the first row plus rows where the tracked attribute actually
    -- changed. NULL-safe comparison: with `prev_type != event_type` a
    -- value->NULL transition evaluates to NULL and is DROPPED (the NULL
    -- period silently inherits the prior run), and the first-row test
    -- `prev_type IS NULL` conflates with NULL-valued attributes — the
    -- explicit rn=1 keeps a first row even when its value is NULL.
    SELECT user_id, ts, event_type, event_id
    FROM log
    WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type
)
SELECT user_id,
       event_type AS attr_value,
       ts AS valid_from,
       LEAD(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
       ) AS valid_to,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts, event_id
       ) AS BIGINT) AS version,
       CAST(CASE WHEN LEAD(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
       ) IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
FROM changes
"""


register_sql(
    "scd2_dimension",
    _scd2_dimension,
    doc="Type-2 slowly-changing dimension from an append-only change log: "
    "run-collapse (gaps-and-islands) + [valid_from, valid_to) validity "
    "intervals, version numbers and is_current flags; one reused keyed "
    "shuffle for all three window functions.",
    bench=True,
)


def _cdc_merge_apply(d: str) -> str:
    # ``d`` unused: the body is identical in Spark SQL and DuckDB.
    return """
WITH ranked AS (
    SELECT o_custkey, o_orderstatus, o_totalprice, o_orderkey,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC
           ) AS rn
    FROM orders
),
-- changelog compaction: the NET effect per key is its latest change
net AS (
    SELECT o_custkey AS key,
           CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
           o_totalprice AS new_balance
    FROM ranked WHERE rn = 1
),
-- insert stream: keys absent from the base dimension (offset far past
-- any real custkey so the demo insert path can't collide with updates)
inserts AS (
    SELECT o_custkey + 100000000 AS key, 'I' AS op,
           o_totalprice AS new_balance
    FROM ranked WHERE rn = 1 AND o_orderkey % 97 = 0
),
changelog AS (
    SELECT * FROM net UNION ALL SELECT * FROM inserts
),
merged AS (
    SELECT COALESCE(c.c_custkey, g.key) AS key,
           c.c_name AS name,
           COALESCE(g.new_balance, c.c_acctbal) AS balance,
           CASE WHEN c.c_custkey IS NULL THEN 'insert'
                WHEN g.key IS NULL THEN 'keep'
                ELSE 'update' END AS action,
           g.op AS op
    FROM customer c
    FULL OUTER JOIN changelog g ON c.c_custkey = g.key
)
SELECT key, name, balance, action
FROM merged
WHERE op IS NULL OR op != 'D'
"""


register_sql(
    "cdc_merge_apply",
    _cdc_merge_apply,
    doc="MERGE INTO semantics (Delta/Iceberg-style CDC apply) as pure "
    "relational ops: compact the changelog to its net effect per key "
    "(one keyed window — latest change wins), then ONE full-outer "
    "shuffle join against the base dimension routes every key to "
    "insert/update/delete/keep. At 100 TB the merge pairs with "
    "maintenance.forget_keys' footer-span pruning so only files that "
    "can hold a changed key are rewritten; the join itself shuffles "
    "changelog + base once on the natural key, no driver state.",
    bench=True,
)
