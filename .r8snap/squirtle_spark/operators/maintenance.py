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
import os

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


def _morton2(a: str, b: str, bits: int) -> str:
    """SQL expression interleaving the low ``bits`` bits of two BIGINT
    bucket columns into one Morton (Z-curve) value. The summed terms
    occupy disjoint bit positions, so ``+`` is exactly bitwise OR."""
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright({a}, {i}) & 1, {2 * i + 1})")
        terms.append(f"shiftleft(shiftright({b}, {i}) & 1, {2 * i})")
    return " + ".join(terms)


def zorder_write(
    df: DataFrame, path: str, dim_cols: list[str], n_files: int, bits: int = 8
) -> None:
    """Write ``df`` clustered on a Z-order (Morton) curve over TWO numeric
    dimensions — the multi-dim upgrade clustered_write's docstring points
    at. Each dimension is quantized to 2^bits buckets against its global
    min/max (ONE 4-scalar agg — index-training-class driver state, not
    data), the buckets bit-interleave into a Morton value, and the write
    range-partitions + sorts on it. Because contiguous Morton ranges are
    axis-aligned boxes, every file's parquet footer carries a TIGHT
    min/max box in BOTH dimensions — so a predicate on EITHER column
    alone prunes files, which no single-column range clustering can give
    (its files each span the full range of the other column).

    At 100 TB this is a layout job like compact_parquet: a full shuffle
    write, amortized across every subsequent scan of either dimension.
    """
    assert len(dim_cols) == 2, "zorder_write interleaves exactly 2 dims"
    a, b = dim_cols
    stats = df.agg(F.min(a), F.max(a), F.min(b), F.max(b)).first()
    if any(x is None for x in stats):
        # empty input or an all-NULL dimension: no curve to sort on —
        # write as-is rather than crash (NULL dim values elsewhere get a
        # NULL _z and range-partition together deterministically).
        df.write.mode("overwrite").parquet(path)
        return
    lo_a, hi_a, lo_b, hi_b = (float(x) for x in stats)
    top = (1 << bits) - 1

    def bucket(c: str, lo: float, hi: float):
        span = (hi - lo) or 1.0
        scaled = (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * (1 << bits)
        return F.least(F.lit(top).cast("long"), F.floor(scaled).cast("long"))

    (
        df.withColumn("_za", bucket(a, lo_a, hi_a))
        .withColumn("_zb", bucket(b, lo_b, hi_b))
        .withColumn("_z", F.expr(_morton2("_za", "_zb", bits)))
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_za", "_zb", "_z")
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


def _file_key_spans(
    spark: SparkSession, path: str, key_col: str
) -> dict[str, tuple | None]:
    """Per-file [min, max] span of ``key_col`` from parquet footer stats.

    A file maps to ``None`` when its key column carries no statistics —
    parquet stats cover non-NULL values only, so a no-stats file's keys
    are entirely NULL and can never match a key predicate. A file whose
    footer lacks the column ENTIRELY (schema evolution: old files written
    before the column was added) maps to ``None`` the same way — its keys
    read back as all-NULL. Only a column present in NO file's footer is
    an error: that is a hive-partition column (lives in directory names)
    or a typo, and footer spans cannot prune on it. The sweep reads
    footers only (the metastore/file-index role at cluster scale); it is
    the shared substrate of targeted deletes (``forget_keys``) and
    skipping reads (``pruned_read``).
    """
    import pyarrow.parquet as pq

    spans: dict[str, tuple | None] = {}
    seen_in_any_footer = False
    for f in (f.replace("file:", "") for f in spark.read.parquet(path).inputFiles()):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        in_this_footer = False
        for rg in range(md.num_row_groups):
            col = next(
                (
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == key_col
                ),
                None,
            )
            if col is None:
                continue
            in_this_footer = True
            if col.statistics is not None and col.statistics.min is not None:
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
        seen_in_any_footer = seen_in_any_footer or in_this_footer
        spans[f] = (min(mins), max(maxs)) if mins else None
    if spans and not seen_in_any_footer:
        # hive-partition columns live in directory names, not in ANY file
        # footer — footer spans cannot prune on them (Spark's own
        # partition pruning already does, for free)
        raise ValueError(
            f"{key_col!r} is not a data column of any file under {path} — "
            "footer-span pruning needs a column with parquet statistics; "
            "use a partition filter for partition columns"
        )
    return spans


def pruned_read(
    spark: SparkSession, path: str, key_col: str, lo, hi
) -> tuple[DataFrame, int, int]:
    """Data-skipping scan: read ONLY the files whose footer span can
    intersect ``key_col BETWEEN lo AND hi``, then apply the exact filter
    on top. Returns (df, files_read, files_total).

    Spark's parquet reader already skips ROW GROUPS via pushed filters,
    but it still lists, opens and footers every file in the scan; this is
    the FILE-level skip a table format's stats index (Delta/Iceberg data
    skipping) provides, made explicit and measurable. On a clustered
    table (clustered_write/zorder_write) a narrow key range reads a
    handful of files regardless of table size — the read-side dividend of
    the same layout that bounds forget_keys' write amplification.

    NULL keys never satisfy a BETWEEN, so no-stats (all-NULL-key) files
    are skipped correctly, and the residual filter keeps the result exact
    even if spans were stale.
    """
    spans = _file_key_spans(spark, path, key_col)
    keep = [
        f
        for f, span in spans.items()
        if span is not None and not (span[1] < lo or span[0] > hi)
    ]
    if not keep:
        return (
            spark.read.parquet(path).where(F.lit(False)),
            0,
            len(spans),
        )
    # basePath keeps hive-partition columns (a leaf-file read without it
    # would silently drop them and diverge from the full-scan schema)
    df = (
        spark.read.option("basePath", path)
        .parquet(*keep)
        .where(F.col(key_col).between(lo, hi))
    )
    return df, len(keep), len(spans)


def forget_keys(
    spark: SparkSession, path: str, key_col: str, keys: list
) -> tuple[int, int]:
    """Targeted deletion (right-to-be-forgotten): remove every row whose
    ``key_col`` is in ``keys`` by rewriting ONLY the files whose footer
    min/max span can contain a target key — on a clustered table
    (clustered_write/zorder_write) that is a handful of files, not the
    table. Returns (files_rewritten, files_total).

    This is the layout dividend in action: the same footer stats that
    prune scans bound the DELETE's write amplification. Mechanics are
    append-then-delete (replacement files land first, then the touched
    originals are removed and the file-listing cache refreshed), so a
    crash mid-operation leaves extra copies of untouched rows rather than
    data loss; production wraps the swap in a transactional table format
    (Delta/Iceberg DELETE does exactly this file-granular rewrite under a
    log), and the deletion itself is what GDPR pipelines schedule.

    The footer sweep reads per-file metadata only (the metastore/file
    index role at cluster scale); target keys are a driver-side list —
    bounded, like every deletion request queue.
    """
    spans = _file_key_spans(spark, path, key_col)
    touched = [
        f
        for f, span in spans.items()
        if span is not None and any(span[0] <= k <= span[1] for k in keys)
    ]
    if not touched:
        return 0, len(spans)

    # NULL-key rows must SURVIVE the rewrite: ~isin() is NULL (hence
    # dropped by WHERE) for NULL keys — the isNull() disjunct keeps them.
    replacement = spark.read.parquet(*touched).where(
        F.col(key_col).isNull() | ~F.col(key_col).isin(keys)
    )
    replacement.write.mode("append").parquet(path)

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for f in touched:
        hpath = jvm.org.apache.hadoop.fs.Path(f)
        hpath.getFileSystem(conf).delete(hpath, False)
    spark.catalog.refreshByPath(path)
    return len(touched), len(spans)


def _commit_pointer(spark: SparkSession, table_path: str, version: int) -> None:
    """Atomically point ``_LATEST`` at ``version``: write-temp + replace,
    so readers always observe either the old or the new pointer, never a
    missing or torn one.

    Local paths replace via ``os.replace`` — a single POSIX rename(2),
    genuinely atomic. (The previous FileContext.rename(OVERWRITE) route
    is NOT: Hadoop's local AbstractFileSystem implements OVERWRITE as
    delete-then-rename, and the round-6 concurrent-reader test caught a
    reader hitting the in-between window where _LATEST did not exist.)
    Non-local schemes keep the FileContext route — atomic on HDFS, whose
    NameNode rename honors OVERWRITE as one operation; on object stores
    neither rename is atomic and the production answer is a commit log /
    conditional-put, which is exactly what Delta/Iceberg layer on top of
    this same pointer idea."""
    # "Local" is decided by the RESOLVED FileSystem scheme, not the raw
    # string: a scheme-less path resolves through fs.defaultFS, and on a
    # cluster with defaultFS=hdfs:// the parquet versions land on HDFS —
    # committing the pointer to the driver's local disk there would
    # split-brain the table (round-6 review finding). Only a path that
    # actually resolves to the local FS takes the os.replace fast path.
    _jvm = spark._jvm
    _conf = spark._jsc.hadoopConfiguration()
    _hpath = _jvm.org.apache.hadoop.fs.Path(table_path)
    _fs = _hpath.getFileSystem(_conf)
    # getUri().getScheme(), not getScheme(): the latter's Hadoop base
    # implementation throws for FileSystems that never overrode it.
    if _fs.getUri().getScheme() == "file":
        local = _fs.makeQualified(_hpath).toUri().getPath()
        os.makedirs(local, exist_ok=True)
        tmp = os.path.join(local, "_LATEST.tmp")
        with open(tmp, "w") as f:
            f.write(str(version))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(local, "_LATEST"))
        return
    tmp = _jvm.org.apache.hadoop.fs.Path(f"{table_path}/_LATEST.tmp")
    out = _fs.create(tmp, True)
    out.write(bytearray(str(version).encode()))
    out.close()
    fc = _jvm.org.apache.hadoop.fs.FileContext.getFileContext(_conf)
    overwrite = spark.sparkContext._gateway.new_array(
        _jvm.org.apache.hadoop.fs.Options.Rename, 1
    )
    overwrite[0] = _jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
    fc.rename(tmp, _jvm.org.apache.hadoop.fs.Path(f"{table_path}/_LATEST"), overwrite)


def _next_free_version(spark: SparkSession, table_path: str) -> int:
    """Next unused v=N: max(committed, any staged-but-unpublished dir) + 1."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = root.getFileSystem(conf)
    version = latest_version(spark, table_path) + 1
    if fs.exists(root):
        staged = [
            int(st.getPath().getName()[2:])
            for st in fs.listStatus(root)
            if st.getPath().getName().startswith("v=")
        ]
        if staged:
            version = max(version, max(staged) + 1)
    return version


def versioned_write(spark: SparkSession, df: DataFrame, table_path: str) -> int:
    """Append-only snapshot versioning — the minimal transactional-table
    pattern (what Delta/Iceberg formalize with logs): each write lands in
    a fresh ``v=N`` directory, then a ``_LATEST`` pointer file is swapped
    ATOMICALLY (write-temp + rename, the classic HDFS/POSIX commit
    primitive). Readers resolve the pointer first, so they only ever see
    fully-written snapshots — a crash mid-write leaves an orphan
    directory, never a torn table. Returns the new version number.

    Pair with read_version/dataset_diff: pipelines keep the last K
    snapshots for run-over-run regression diffs and instant rollback
    (flip the pointer back), then vacuum older versions.
    """
    version = _next_free_version(spark, table_path)
    df.write.mode("errorifexists").parquet(f"{table_path}/v={version}")
    _commit_pointer(spark, table_path, version)
    return version


def latest_version(spark: SparkSession, table_path: str) -> int:
    """Current committed version per the ``_LATEST`` pointer (0 = none)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    ptr = jvm.org.apache.hadoop.fs.Path(f"{table_path}/_LATEST")
    fs = ptr.getFileSystem(conf)
    if not fs.exists(ptr):
        return 0
    stream = fs.open(ptr)
    try:
        data = []
        b = stream.read()
        while b != -1:
            data.append(b)
            b = stream.read()
        return int(bytes(data).decode())
    finally:
        stream.close()


def rollback(spark: SparkSession, table_path: str, version: int) -> None:
    """Point the committed table back (or forward) to an existing
    snapshot — the instant-recovery path versioned_write's docstring
    promises. Validates the target exists, then the same atomic pointer
    commit as a publish."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    target = jvm.org.apache.hadoop.fs.Path(f"{table_path}/v={version}")
    if not target.getFileSystem(conf).exists(target):
        raise FileNotFoundError(f"no snapshot v={version} at {table_path}")
    _commit_pointer(spark, table_path, version)


def read_version(spark: SparkSession, table_path: str, version: int | None = None) -> DataFrame:
    """Read a specific snapshot (or the committed latest): time travel for
    the run-over-run workflows dataset_diff serves."""
    v = version if version is not None else latest_version(spark, table_path)
    if v <= 0:
        raise FileNotFoundError(f"no committed version at {table_path}")
    return spark.read.parquet(f"{table_path}/v={v}")


def publish_if(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    checks: list,
) -> tuple[int | None, list[str]]:
    """Write-audit-publish: stage the snapshot as an UNCOMMITTED version
    directory, run every check against the staged data (each check is
    ``fn(staged_df) -> bool``), and flip the ``_LATEST`` pointer ONLY if
    all pass — the Iceberg-WAP pattern on the versioned_write primitive.
    Returns (published_version | None, failed_check_names). A failed
    audit leaves the staged directory for inspection and the pointer on
    the previous good snapshot, so downstream readers never see
    unaudited data.
    """
    version = _next_free_version(spark, table_path)
    staged_path = f"{table_path}/v={version}"
    df.write.mode("errorifexists").parquet(staged_path)
    staged = spark.read.parquet(staged_path)
    failed = [
        getattr(c, "__name__", repr(c)) for c in checks if not c(staged)
    ]
    if failed:
        return None, failed
    _commit_pointer(spark, table_path, version)
    return version, []


def vacuum_versions(
    spark: SparkSession,
    table_path: str,
    keep: int = 3,
    *,
    min_age_s: float = 0.0,
) -> list[int]:
    """Delete snapshot directories older than the last ``keep`` versions,
    never touching the committed version or anything newer — the storage
    bound that makes versioned_write sustainable (without it a daily
    publish retains the table's whole history forever). Returns the
    removed version numbers. The committed version is always retained
    even if it falls outside the keep window (a stale pointer must keep
    resolving).

    ``min_age_s`` is the READER-ISOLATION retention window (Delta's
    deletedFileRetentionDuration): a snapshot is only deleted once its
    directory is at least this old, so an in-flight reader that resolved
    the pointer to a version and is still scanning it cannot have the
    files deleted underneath it — provided queries finish inside the
    window. The default 0 keeps vacuum eager for single-writer batch
    use; under concurrent readers set it to comfortably exceed the
    longest query (tests/test_maintenance.py exercises the contract).
    """
    import time

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = root.getFileSystem(conf)
    if not fs.exists(root):
        return []
    stats = {
        int(st.getPath().getName()[2:]): st.getModificationTime()
        for st in fs.listStatus(root)
        if st.getPath().getName().startswith("v=")
    }
    versions = sorted(stats)
    committed = latest_version(spark, table_path)
    # never the committed version or anything newer: after a rollback the
    # newer snapshots are the roll-forward targets (and possibly staged
    # audits-in-progress) — only history strictly older than the pointer
    # ages out.
    keep_set = set(versions[-keep:]) | {v for v in versions if v >= committed}
    horizon_ms = (time.time() - min_age_s) * 1000.0
    removed = []
    for v in versions:
        if v not in keep_set and stats[v] <= horizon_ms:
            p = jvm.org.apache.hadoop.fs.Path(f"{table_path}/v={v}")
            fs.delete(p, True)
            removed.append(v)
    return removed
