"""SparkSession factory.

Local test profile runs ``local[$SPARK_GRAFT_CPUS]`` (default 32) but every
knob is chosen so the same code lands well on a 1000-executor cluster:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy) —
  at 100 TB the static ``shuffle.partitions`` is always wrong somewhere, AQE
  re-plans per stage.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real cluster
  leave it high (AQE coalesces down) — never hand-tuned per query.
- Arrow enabled for every Python<->JVM hop (Pandas UDFs, toPandas).
- Session timezone pinned UTC so event-time semantics are deployment-invariant
  (and comparable against the DuckDB oracle, which is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "squirtle_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession."""
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "90g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
