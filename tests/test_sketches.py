"""Error bounds for the sketch-based (approximate) aggregates.

approx_sketch_stats is rows-only in the driver gate; its quality evidence
is here: HLL++ distinct counts within 5% of exact, t-digest medians
within 10% of the exact median, per group.
"""

from squirtle_spark.registry import load_all


def test_sketch_error_bounds(spark, sf_dir):
    approx = {
        r["event_type"]: r
        for r in load_all()["approx_sketch_stats"].spark_fn(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r
        for r in spark.sql(
            """
            SELECT event_type,
                   COUNT(DISTINCT user_id) AS users,
                   percentile(value, 0.5) AS median_value
            FROM events GROUP BY event_type
            """
        ).collect()
    }
    assert set(approx) == set(exact)
    for et, e in exact.items():
        a = approx[et]
        assert abs(a["approx_users"] - e["users"]) / e["users"] <= 0.05, et
        assert abs(a["approx_median_value"] - e["median_value"]) / e["median_value"] <= 0.10, et
