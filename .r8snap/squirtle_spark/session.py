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
- The master is only set when none is configured, so ``spark-submit
  --master`` / cluster managers win over the local default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: Confs that are runtime-settable and load-bearing for correctness; applied
#: even when getOrCreate() returns a pre-existing session (which silently
#: ignores builder configs).
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.filterPushdown": "true",
}


#: Streaming state-store providers. The default HDFS-backed provider keeps
#: all state on the JVM heap — right for local tests and small state; the
#: RocksDB provider spills keyed state off-heap/to disk and is the cluster
#: choice for large session/dedup state (SCALING.md cluster change #3).
#: Both jars ship with stock Spark, so this is a pure config switch.
STATE_STORE_PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}

_STATE_STORE_KEY = "spark.sql.streaming.stateStore.providerClass"


def configure_state_store(spark: SparkSession, provider: str | None = None) -> str | None:
    """Select the streaming state-store provider ("hdfs" | "rocksdb").

    With no argument, reads ``$SPARK_GRAFT_STATE_STORE`` (unset → leave
    Spark's default in place and return None). The conf is read at
    streaming-query START, so flipping it affects queries started after
    this call — running queries keep the provider they checkpointed with
    (provider choice is baked into the checkpoint's state format).
    """
    provider = provider or os.environ.get("SPARK_GRAFT_STATE_STORE")
    if not provider:
        return None
    cls = STATE_STORE_PROVIDERS[provider.lower()]
    spark.conf.set(_STATE_STORE_KEY, cls)
    return cls


def _master_preconfigured() -> bool:
    """True when a cluster manager / spark-submit already chose a master."""
    from pyspark import SparkConf

    try:
        return SparkConf(loadDefaults=True).contains("spark.master")
    except Exception:  # gateway not yet up and unlaunchable — no master set
        return False


def get_spark(
    app_name: str = "squirtle_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession."""
    cpus = cpus or DEFAULT_CPUS
    builder = SparkSession.builder.appName(app_name)
    # Let an externally configured master (spark-submit/cluster) win; only
    # default to local[] when nothing else is set. Under spark-submit the
    # --master lands in the gateway JVM's system properties, which
    # SparkConf(loadDefaults=True) reads — the env is NOT a reliable signal.
    master = os.environ.get("SPARK_GRAFT_MASTER")
    if master:
        builder = builder.master(master)
    elif SparkSession.getActiveSession() is None and not _master_preconfigured():
        builder = builder.master(f"local[{cpus}]")
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Only effective when the JVM is launched from this process (plain
        # `python`); under spark-submit the submit-time value wins.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate() ignores configs on a reused session — re-assert the
    # runtime-settable ones that correctness depends on.
    for k, v in RUNTIME_CONFS.items():
        spark.conf.set(k, v)
    configure_state_store(spark)  # env-gated ($SPARK_GRAFT_STATE_STORE)
    spark.sparkContext.setLogLevel("WARN")
    return spark
