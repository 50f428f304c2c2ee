"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``squirtle_spark``; this module only adapts the
query registry (squirtle_spark/registry.py) to the driver's calling
convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H q3 shape: customer⋈orders⋈lineitem with filter, grouped revenue
    (the multi-join + shuffle-agg core every OLAP engine lives on).
    """
    from squirtle_spark.registry import load_all

    return load_all()["tpch_q3"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    from squirtle_spark.registry import load_all

    return {name: q.spark_fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """Self-contained DuckDB SQL per query (omitted → rows-only check)."""
    from squirtle_spark.registry import load_all

    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
