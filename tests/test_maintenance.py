"""Storage-maintenance behavior: compaction shrinks file counts without
touching data; clustered writes give files disjoint, prunable key spans."""

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from squirtle_spark import catalog
from squirtle_spark.operators import maintenance


def test_compact_parquet_preserves_data_and_shrinks_files(spark, sf_dir, tmp_path):
    catalog.register_all(spark, sf_dir)
    ev = spark.table("events")
    src = str(tmp_path / "frag")
    # simulate a micro-batch-fragmented sink: many tiny files
    ev.repartition(64).write.parquet(src)
    assert len(spark.read.parquet(src).inputFiles()) >= 64

    dst = str(tmp_path / "compact")
    n_out = maintenance.compact_parquet(
        spark, src, dst, target_file_bytes=16 * 1024 * 1024
    )
    assert n_out < 64
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_clustered_write_has_disjoint_prunable_spans(spark, sf_dir, tmp_path):
    catalog.register_all(spark, sf_dir)
    ev = spark.table("events").select("event_id", "user_id", "value")
    path = str(tmp_path / "clustered")
    maintenance.clustered_write(ev, path, ["user_id"], n_files=8)

    out = spark.read.parquet(path)
    assert out.count() == ev.count()

    # per-file min/max spans of the cluster key must not overlap
    spans = []
    for f in out.inputFiles():
        md = pq.ParquetFile(f.replace("file:", "")).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "user_id"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append((min(mins), max(maxs)))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"overlapping file spans: ({lo1},{hi1}) vs ({lo2},{hi2})"

    # and the key predicate actually prunes: only files whose span holds
    # the key need reading
    key = spans[0][0]
    holding = [1 for lo, hi in spans if lo <= key <= hi]
    assert len(holding) == 1


def test_backfill_overwrites_only_touched_partitions(spark, sf_dir, tmp_path):
    catalog.register_all(spark, sf_dir)
    ev = spark.table("events").selectExpr(
        "event_id", "user_id", "value", "CAST(ts AS DATE) AS dt"
    )
    path = str(tmp_path / "table")
    maintenance.backfill_partitions(ev, path, ["dt"])
    before = spark.read.parquet(path)
    n_total = before.count()
    days = [r["dt"] for r in before.select("dt").distinct().collect()]
    target = sorted(days)[1]

    # reprocess ONE day with a corrected value
    fixed = ev.where(F.col("dt") == target).withColumn(
        "value", F.col("value") * 2
    )
    n_day = fixed.count()
    maintenance.backfill_partitions(fixed, path, ["dt"])

    after = spark.read.parquet(path)
    assert after.count() == n_total  # no other partition lost or duplicated
    assert after.where(F.col("dt") == target).count() == n_day
    # the touched day carries the fix; untouched days are byte-identical rows
    orig_day = ev.where(F.col("dt") == target).agg(F.sum("value")).first()[0]
    new_day = after.where(F.col("dt") == target).agg(F.sum("value")).first()[0]
    assert abs(new_day - 2 * orig_day) < 1e-6
    others_before = ev.where(F.col("dt") != target)
    others_after = after.where(F.col("dt") != target)
    assert others_before.exceptAll(others_after).count() == 0
    assert others_after.exceptAll(others_before).count() == 0

    # idempotence: the same backfill again converges to the same state
    # (materialize first — a DataFrame over the replaced files is stale)
    after_rows = sorted(map(tuple, after.collect()))
    maintenance.backfill_partitions(fixed, path, ["dt"])
    again = spark.read.parquet(path)
    assert again.count() == n_total
    assert sorted(map(tuple, again.collect())) == after_rows
