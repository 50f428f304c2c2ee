"""Storage-layout maintenance: small-file compaction and range-clustered
writes. Not queries — table-maintenance operators a 100 TB deployment runs
on a schedule, the way the reference's arena/checkpoint management keeps
its state files usable (flock's equivalents are internal; here the "state"
is open parquet, so the maintenance is too). Evidence is behavioral
(tests/test_maintenance.py): data equality plus the layout property each
op exists to create.

Why they matter at scale:

- **Compaction**: streaming sinks (stream_curation, stream_lsh_index_build,
  upsert_sink) append per micro-batch; a month of 10-second batches is
  ~260k files per partition — enough to stall any scan on listing + footer
  reads alone. Compaction rewrites a partition to size-targeted files.
- **Range clustering**: parquet prunes row groups on min/max stats, but
  stats only help if values are clustered. repartitionByRange + in-file
  sort gives every file a disjoint key span, so a point/range predicate
  touches one file instead of all of them.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

#: Default compaction target. Small for tests; production uses 128-1024 MB
#: aligned with ``spark.sql.files.maxPartitionBytes`` so one task reads one
#: file.
TARGET_FILE_BYTES = 128 * 1024 * 1024


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via Hadoop FS (works on any scheme)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Rewrite ``src_path``'s parquet into ~``target_file_bytes`` files at
    ``dst_path``; returns the output file count. Sizing comes from the
    source's actual on-disk bytes (compression survives the rewrite to a
    first approximation), not row counts — the quantity scans care about.

    The rewrite is one narrow job: read → repartition(n) → write, no
    wide shuffle key, so cost is IO-bound. Production swaps dst into
    place atomically (rename or metastore pointer flip) and vacuums src;
    the swap protocol is deployment-specific, so this operator stops at
    the rewrite.
    """
    total = _dir_bytes(spark, src_path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_path)
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    out = [f for f in spark.read.parquet(dst_path).inputFiles()]
    return len(out)


def clustered_write(
    df: DataFrame, path: str, cluster_cols: list[str], n_files: int
) -> None:
    """Write ``df`` with disjoint per-file ranges of ``cluster_cols``:
    repartitionByRange assigns each file a contiguous key span (sampled
    range boundaries), sortWithinPartitions orders rows inside, so
    min/max footer stats are tight and a key predicate prunes to the one
    file holding its span — the poor-man's Z-order for single-dimension
    locality (true multi-dim interleaving needs a space-filling-curve
    column: add ``F.expr`` interleaving bits of the dims and range-write
    on that).
    """
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def backfill_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Reprocess a slice of a partitioned table IDEMPOTENTLY: dynamic
    partition overwrite replaces exactly the partitions present in ``df``
    and leaves every other partition's files untouched — the backfill
    primitive for "re-run day X with the fixed pipeline" against a
    petabyte table without rewriting it (static overwrite mode would drop
    the whole table first; the option scopes this write only).

    Idempotence is the operational property: re-running the same backfill
    converges to the same table state, so a failed backfill is retried,
    never reconciled.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    # Readers in this session may hold the pre-backfill file listing in the
    # shared InMemoryFileIndex cache — without the refresh they fail on the
    # replaced files (FAILED_READ_FILE), exactly what a backfill must not do.
    df.sparkSession.catalog.refreshByPath(path)
