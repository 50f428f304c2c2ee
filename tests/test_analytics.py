"""Behavioral checks for the product-analytics operators where the uniform
fixtures can't exercise a branch (the anomaly flag: synthetic events are
too steady to breach 3 sigma — correct, but the flag path needs proof)."""

from datetime import datetime, timedelta

from squirtle_spark import catalog
from squirtle_spark import dialect as dl
from squirtle_spark.queries import analytics


def test_ts_anomaly_flags_injected_spike(spark):
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(30):  # steady series: 3 events/hour
        for _ in range(3):
            rows.append((eid, base + timedelta(hours=h, minutes=eid % 50), "x"))
            eid += 1
    for _ in range(40):  # hour 30: the spike
        rows.append((eid, base + timedelta(hours=30, minutes=eid % 50), "x"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP_NTZ, event_type STRING"
    )
    df.createOrReplaceTempView("events")
    catalog.invalidate(spark)  # this test clobbered the fixture view
    try:
        out = spark.sql(analytics._ts_anomaly(dl.SPARK)).collect()
    finally:
        spark.catalog.dropTempView("events")
        catalog.invalidate(spark)

    flagged = [r for r in out if r["is_anomaly"]]
    assert len(flagged) == 1
    assert flagged[0]["cnt"] == 40
    # steady hours stay quiet
    assert all(r["cnt"] == 3 for r in out if not r["is_anomaly"])
