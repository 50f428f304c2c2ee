"""Generator sources as registry entries (rows-only checks: generated data
never touches parquet, so there is no DuckDB side — the driver records the
weaker ≥0-rows check; determinism itself is asserted in tests/test_sources.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import sources
from ..registry import register_df


def _persons(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sources.nexmark_persons(spark, events_per_sec=1000, seconds=5)


def _auctions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sources.nexmark_auctions(spark, events_per_sec=1000, seconds=5)


def _bids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sources.nexmark_bids(spark, events_per_sec=1000, seconds=5)


def _ysb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sources.ysb_ad_events(spark, events_per_sec=1000, seconds=5)


register_df(
    "gen_nexmark_persons",
    _persons,
    doc="Deterministic NEXMark person generator (nexmark.rs:285-390 parity).",
)
register_df(
    "gen_nexmark_auctions",
    _auctions,
    doc="Deterministic NEXMark auction generator.",
)
register_df(
    "gen_nexmark_bids",
    _bids,
    doc="Deterministic NEXMark bid generator (20/60/920 mix per 1000 events).",
)
register_df(
    "gen_ysb_ad_events",
    _ysb,
    doc="Deterministic YSB ad-event generator.",
)
