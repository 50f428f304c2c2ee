"""Generator sources as registry entries — with FULL value-level oracles.

Through round 7 these were the registry's only rows-only-by-design
entries ("generated data has no parquet oracle"). Round 8 removed the
design constraint instead: generation hashes through ``dialect.md5_i64``
(sources.py), which DuckDB computes bit-identically, so the oracle
RE-GENERATES every event from the same closed forms — ``range(n)`` ids,
dense (epoch, slot) entity ids, seeded md5 attribute streams — and the
value-hash comparison covers the generators exactly like every other
entry. Determinism/mix/referential-integrity stay separately asserted in
tests/test_sources.py.

The oracle bodies below are the DuckDB rendering of the formulas in
``sources.py`` (flock nexmark.rs:285-390 / ysb/generator.rs parity);
the value-level compare is what keeps the two renderings honest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import dialect as dl
from .. import sources
from ..registry import register_df

#: Registry-entry generation parameters (5,000 events).
_EPS, _SECS, _SEED = 1000, 5, 42


def _persons(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sources.nexmark_persons(spark, events_per_sec=_EPS, seconds=_SECS)


def _auctions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sources.nexmark_auctions(spark, events_per_sec=_EPS, seconds=_SECS)


def _bids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sources.nexmark_bids(spark, events_per_sec=_EPS, seconds=_SECS)


def _ysb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sources.ysb_ad_events(spark, events_per_sec=_EPS, seconds=_SECS)


def _r(tag: int) -> str:
    """DuckDB rendering of the generator's seeded per-id hash stream."""
    return dl.md5_i64(sources._hash_input(_SEED, tag), dl.DUCK)


def _base_cte() -> str:
    """ids 0..n-1 with the enrichment columns (epoch/slot/kilo/ts/r1/r2).

    ``//`` floor division mirrors Spark's CAST(id / eps AS LONG) for
    non-negative ids (a plain ``/`` + CAST would ROUND in DuckDB — the
    documented cross-engine cast divergence)."""
    n = _EPS * _SECS
    return f"""
WITH ids AS (SELECT CAST(k AS BIGINT) AS id FROM range({n}) t(k)),
e AS (
    SELECT id,
           id // {_EPS} AS epoch,
           id % 1000 AS slot,
           id // 1000 AS kilo,
           TIMESTAMP '{sources.BASE_TS}'
             + (id // {_EPS}) * INTERVAL 1 SECOND
             + (id % {_EPS}) * INTERVAL 1 MILLISECOND AS ts,
           ({_r(1)}) AS r1,
           ({_r(2)}) AS r2
    FROM ids
)"""


_STATE_LIST = "[" + ",".join(f"'{s}'" for s in sources._STATES) + "]"

_PERSONS_ORACLE = f"""{_base_cte()}
SELECT kilo * {sources.PERSONS_PER_K} + slot AS p_id,
       'person_' || (kilo * {sources.PERSONS_PER_K} + slot) AS name,
       'user_' || (kilo * {sources.PERSONS_PER_K} + slot) || '@example.com'
           AS email_address,
       CAST(r1 % 10000 AS VARCHAR) AS credit_card,
       'city_' || (r1 % 37) AS city,
       ({_STATE_LIST})[CAST(r2 % 10 AS INT) + 1] AS state,
       ts AS p_date_time
FROM e
WHERE slot < {sources.PERSONS_PER_K}
"""

_AUCTIONS_ORACLE = f"""{_base_cte()}
SELECT kilo * {sources.AUCTIONS_PER_K} + (slot - {sources.PERSONS_PER_K}) AS a_id,
       'item_' || (r1 % 1000) AS item_name,
       'desc_' || (r1 % 101) AS description,
       CAST(r1 % 1000 + 1 AS INT) AS initial_bid,
       CAST(r1 % 1000 + 1 + r2 % 500 AS INT) AS reserve,
       ts AS a_date_time,
       ts + (CAST(r2 % 20 AS INT) + 5) * INTERVAL 1 SECOND AS expires,
       ({_r(3)}) % greatest((kilo + 1) * {sources.PERSONS_PER_K}, 1) AS seller,
       CAST(r2 % 20 AS INT) AS category
FROM e
WHERE slot >= {sources.PERSONS_PER_K}
  AND slot < {sources.PERSONS_PER_K + sources.AUCTIONS_PER_K}
"""

_BIDS_ORACLE = f"""{_base_cte()}
SELECT ({_r(4)}) % greatest((kilo + 1) * {sources.AUCTIONS_PER_K}, 1) AS auction,
       ({_r(5)}) % greatest((kilo + 1) * {sources.PERSONS_PER_K}, 1) AS bidder,
       CAST(r1 % 10000 + 1 AS INT) AS price,
       ts AS b_date_time
FROM e
WHERE slot >= {sources.PERSONS_PER_K + sources.AUCTIONS_PER_K}
"""

_YSB_TYPES = "['banner','modal','sponsored-search','mail','mobile']"
_YSB_ETYPES = "['view','click','purchase']"

_YSB_ORACLE = f"""{_base_cte()}
SELECT CAST(r1 % 100000 AS VARCHAR) AS ysb_user_id,
       'page_' || (r1 % 100) AS page_id,
       CAST(r2 % 1000 AS VARCHAR) AS ad_id,
       ({_YSB_TYPES})[CAST(r1 % 5 AS INT) + 1] AS ad_type,
       ({_YSB_ETYPES})[CAST(r2 % 3 AS INT) + 1] AS event_type,
       ts AS event_time,
       '10.0.0.' || (r1 % 256) AS ip_address
FROM e
"""


register_df(
    "gen_nexmark_persons",
    _persons,
    oracle_body=_PERSONS_ORACLE,
    doc="Deterministic NEXMark person generator (nexmark.rs:285-390 "
    "parity), value-oracled: DuckDB re-generates all 100 events.",
)
register_df(
    "gen_nexmark_auctions",
    _auctions,
    oracle_body=_AUCTIONS_ORACLE,
    doc="Deterministic NEXMark auction generator, value-oracled.",
)
register_df(
    "gen_nexmark_bids",
    _bids,
    oracle_body=_BIDS_ORACLE,
    doc="Deterministic NEXMark bid generator (20/60/920 mix per 1000 "
    "events), value-oracled.",
)
register_df(
    "gen_ysb_ad_events",
    _ysb,
    oracle_body=_YSB_ORACLE,
    doc="Deterministic YSB ad-event generator, value-oracled.",
)
