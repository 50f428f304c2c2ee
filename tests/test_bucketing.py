"""Bucketed co-located joins: the zero-shuffle join technique for 100 TB.

SURVEY §2.8 maps flock's consistent-hash payload routing to Spark
shuffles; the way to AVOID that shuffle for recurring big-big joins is
bucketing both sides on the join key at write time — the join then reads
co-located buckets with no Exchange on either side.
"""

import pytest


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    # explicit per-table paths: the (static) warehouse dir never comes into play
    wh = tmp_path_factory.mktemp("warehouse")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(wh / "orders_b"))
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "lineitem_b"))
        .saveAsTable("lineitem_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, warehouse):
    """orders ⋈ lineitem on the bucket key: no Exchange on either side."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.sql(
            """
            SELECT o.o_orderkey, COUNT(*) AS n
            FROM orders_b o JOIN lineitem_b l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey
            """
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan
        # the join's inputs come straight from bucketed scans — no exchange
        assert "Exchange hashpartitioning" not in join_part, plan
        # and results are right
        expected = spark.sql(
            f"""
            SELECT o_orderkey, COUNT(*) AS n
            FROM parquet.`{sf_dir}/orders.parquet` o
            JOIN parquet.`{sf_dir}/lineitem.parquet` l ON o_orderkey = l_orderkey
            GROUP BY o_orderkey
            """
        ).collect()
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expected))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
