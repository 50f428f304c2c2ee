"""Yahoo Streaming Benchmark: campaign view-counts.

Reference: benchmarks/src/ysb/ysb.sql — filter ad events to views, join the
static 1000-ad → 100-campaign map, count per campaign. The campaign table is
broadcast-size by construction (flock ships it to every worker as a side
input; Spark broadcasts it under autoBroadcastJoinThreshold).
"""

from __future__ import annotations

from ..registry import register_sql


def _ysb(d: str) -> str:
    return """
SELECT C.campaign_id,
       COUNT(*) AS n_views
FROM ad_event E
JOIN campaign C ON E.ad_id = C.c_ad_id
WHERE E.event_type = 'view'
GROUP BY C.campaign_id
"""


register_sql(
    "ysb_campaign_views",
    _ysb,
    doc="YSB campaign CTR counts: filter + broadcast join + count.",
    bench=True,
)
