"""The correctness gate, locally: every registry query vs its DuckDB oracle.

Mirrors the reference's per-query semantic tests
(flock/src/datasource/nexmark/queries/*.rs run the LocalLauncher path and
assert batch contents; here the assertion is equality with an independent
engine instead of golden strings).
"""

import zlib

import pytest

from squirtle_spark.oracle import check_query
from squirtle_spark.registry import load_all

ALL = sorted(load_all())

#: The full-registry sweep is ~4 min sequential and grows with the
#: registry; shard markers let it run as N parallel pytest invocations
#: (`pytest tests/test_oracle.py -m oracle_shard1` … shard4) with the
#: SAME coverage — shard assignment is a stable hash of the entry name,
#: so an entry keeps its shard as the registry grows and the union of
#: shards is always exactly ALL.
N_SHARDS = 4


def _shard(name: str) -> int:
    return zlib.crc32(name.encode()) % N_SHARDS + 1


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=getattr(pytest.mark, f"oracle_shard{_shard(n)}"))
        for n in ALL
    ],
)
def test_query_matches_oracle(spark, sf_dir, name):
    res = check_query(spark, name, sf_dir)
    assert res.ok, res.message()
    assert res.rows_spark >= 0


def test_shards_partition_registry():
    """The shards are a partition of the registry: disjoint by
    construction, and their union misses nothing at any size."""
    counts = {s: sum(1 for n in ALL if _shard(n) == s) for s in range(1, N_SHARDS + 1)}
    assert sum(counts.values()) == len(ALL)
    # crc32 spreads evenly enough that no shard degenerates
    assert all(c >= len(ALL) // (N_SHARDS * 2) for c in counts.values()), counts


def test_comparator_detects_value_drift(spark, sf_dir):
    """Meta-test: the gate itself has teeth. A single perturbed value,
    a dropped row, and a renamed column must each fail the comparison
    that identical frames pass."""
    from squirtle_spark.oracle import compare_frames, run_oracle
    from squirtle_spark.registry import load_all

    q = load_all()["tpch_q1"]
    spark_pdf = q.spark_fn(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(q.oracle, sf_dir)
    assert compare_frames("q1", spark_pdf, oracle_pdf).ok

    drifted = oracle_pdf.copy()
    num_cols = [c for c in drifted.columns if drifted[c].dtype.kind in "if"]
    drifted.loc[drifted.index[0], num_cols[0]] += 1e-6
    assert not compare_frames("q1-drift", spark_pdf, drifted).ok

    assert not compare_frames("q1-dropped", spark_pdf, oracle_pdf.iloc[1:]).ok

    renamed = oracle_pdf.rename(columns={oracle_pdf.columns[0]: "zz_renamed"})
    assert not compare_frames("q1-renamed", spark_pdf, renamed).ok


#: Entries whose docstrings claim partition/merge-order independence via
#: DECIMAL accumulation or deterministic tie-breaks — the claim only
#: matters if the result is bit-identical under a DIFFERENT partitioning.
_PARTITION_SENSITIVE = [
    "dsir_select",
    "lm_perplexity",
    "psi_drift",
    "hard_negatives",
    "embedding_profile",
    "textrank_keywords",
]


@pytest.mark.parametrize("name", _PARTITION_SENSITIVE)
def test_partition_count_invariance(spark, sf_dir, name):
    """The decimal-exactness claims, executed: the same query at 3 vs the
    session's shuffle partitions must return BIT-IDENTICAL values (float
    repr equality via the strict comparator), or the 1000-executor story
    is luck."""
    from squirtle_spark.oracle import compare_frames
    from squirtle_spark.registry import load_all

    q = load_all()[name]
    base = q.spark_fn(spark, sf_dir).toPandas()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        alt = q.spark_fn(spark, sf_dir).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    res = compare_frames(f"{name}@3parts", base, alt)
    assert res.ok, res.message()
