"""Declared entity schemas (SURVEY.md §1.3).

The reference declares every entity schema statically in code
(flock/src/datasource/nexmark/event.rs:130-148 person, :220-246 auction,
:336-353 bid, :375-385 side_input; ysb/event.rs:43-59 ad_event, :76-83
campaign). These StructTypes are the Spark equivalents and the single
source of truth the generators and derived views are checked against
(tests/test_schemas.py).

Type mapping per SURVEY §1.2: Int32→IntegerType (ids/prices kept BIGINT
where the fixture's event_id/user_id are int64), Utf8→StringType,
Timestamp(ms)→TimestampNTZType (naive UTC wall-clock end to end).
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


def _s(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


PERSON = _s(
    ("p_id", LongType()),
    ("name", StringType()),
    ("email_address", StringType()),
    ("credit_card", StringType()),
    ("city", StringType()),
    ("state", StringType()),
    ("p_date_time", TimestampNTZType()),
)

AUCTION = _s(
    ("a_id", LongType()),
    ("item_name", StringType()),
    ("description", StringType()),
    ("initial_bid", IntegerType()),
    ("reserve", IntegerType()),
    ("a_date_time", TimestampNTZType()),
    ("expires", TimestampNTZType()),
    ("seller", LongType()),
    ("category", IntegerType()),
)

BID = _s(
    ("auction", LongType()),
    ("bidder", LongType()),
    ("price", IntegerType()),
    ("b_date_time", TimestampNTZType()),
)

SIDE_INPUT = _s(
    ("key", LongType()),
    ("value", StringType()),
)

AD_EVENT = _s(
    ("ysb_user_id", StringType()),
    ("page_id", StringType()),
    ("ad_id", StringType()),
    ("ad_type", StringType()),
    ("event_type", StringType()),
    ("event_time", TimestampNTZType()),
    ("ip_address", StringType()),
)

CAMPAIGN = _s(
    ("c_ad_id", StringType()),
    ("campaign_id", StringType()),
)
