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
