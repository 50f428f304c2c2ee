"""Distributed k-means over the ``embeddings`` table.

The clustering step a training-data pipeline runs between embedding and
IVF-index building (operators/similarity.py's N_CELLS centroids are
exactly what this trains), and the standard iterative-algorithm shape on
Spark: per iteration, assignment is a broadcast join of the corpus
against K centroid rows (all JVM-side expression math), and the centroid
update is posexplode → two bounded groupBys — NO 64-wide aggregate (wide
agg rows cost ~20-30 s of one-time codegen per JVM) and no data-scale
driver state: only the K×dim centroid matrix ever reaches the driver,
which is also how the loop distributes at 100 TB.

Two registry entries:

- ``kmeans_assign`` — ONE Lloyd assignment step from deterministic seed
  centroids, fully value-checked: DuckDB replays it with list_distance
  (distances rounded to 4 decimals before the argmin on both sides, so
  float fold order cannot flip the winner; ties break on cell id).
- ``kmeans_lloyd`` — N_ITERS full iterations (rows-only: the fixpoint is
  not SQL-expressible); pytest asserts the contract instead — inertia is
  monotonically non-increasing and iteration 1 equals kmeans_assign.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register_df

K_CLUSTERS = 8
#: Seed centroids: the vectors with these ids (deterministic farthest-first
#: would also work; a fixed id range keeps both engines trivially agreed).
SEED_LO = 10
N_ITERS = 4
EMB_DIM = 64


def _corpus(spark: SparkSession) -> DataFrame:
    return spark.table("embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def _seed_centroids(emb: DataFrame) -> DataFrame:
    return emb.where(
        (F.col("vec_id") >= SEED_LO) & (F.col("vec_id") < SEED_LO + K_CLUSTERS)
    ).select((F.col("vec_id") - SEED_LO).alias("cell"), F.col("v").alias("cv"))


def assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: corpus × broadcast(K rows), Euclidean
    distance rounded to 4 decimals, argmin with cell-id tie-break."""
    dist = F.round(
        F.sqrt(
            F.expr(
                "aggregate(zip_with(v, cv, (a, b) -> (a - b) * (a - b)), 0D,"
                " (acc, x) -> acc + x)"
            )
        ),
        4,
    )
    scored = emb.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "v", "cell", dist.alias("dist")
    )
    w = "(PARTITION BY vec_id ORDER BY dist ASC, cell ASC)"
    return (
        scored.withColumn("rn", F.expr(f"ROW_NUMBER() OVER {w}"))
        .where(F.col("rn") == 1)
        .select("vec_id", "v", F.col("cell").alias("cluster"), "dist")
    )


def update_centroids(assigned: DataFrame) -> DataFrame:
    """Element-wise mean per cluster via posexplode (bounded shuffles on
    (cluster, dim); no wide agg, no driver-side data)."""
    return (
        assigned.select(F.col("cluster"), F.posexplode("v").alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(F.avg("x").alias("mx"))
        .groupBy("cluster")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, mx))), s -> s.mx)"
            ).alias("cv")
        )
        .select(F.col("cluster").alias("cell"), "cv")
    )


def _kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _corpus(spark)
    return assign(emb, _seed_centroids(emb)).select("vec_id", "cluster", "dist")


_ASSIGN_ORACLE = f"""
WITH emb AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cents AS (
    SELECT vec_id - {SEED_LO} AS cell, v AS cv
    FROM emb
    WHERE vec_id >= {SEED_LO} AND vec_id < {SEED_LO + K_CLUSTERS}
),
scored AS (
    SELECT emb.vec_id,
           cents.cell,
           round(list_distance(emb.v, cents.cv), 4) AS dist
    FROM emb CROSS JOIN cents
)
SELECT vec_id, cell AS cluster, dist
FROM (
    SELECT vec_id, cell, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn
    FROM scored
)
WHERE rn = 1
"""


register_df(
    "kmeans_assign",
    _kmeans_assign,
    oracle_body=_ASSIGN_ORACLE,
    doc=f"One Lloyd assignment step ({K_CLUSTERS} seed centroids) vs DuckDB list_distance.",
    bench=True,
)


def kmeans(
    spark: SparkSession, emb: DataFrame, n_iters: int = N_ITERS
) -> tuple[DataFrame, list[float]]:
    """Full Lloyd loop; returns (final assignment, per-iteration inertia).

    The driver loop is control flow only: each iteration collects the K×dim
    centroid matrix (bounded) and re-broadcasts it as literal rows so the
    assignment join needs no shuffle of the corpus side.
    """
    cents_rows = [
        (int(r["cell"]), [float(x) for x in r["cv"]])
        for r in _seed_centroids(emb).collect()
    ]
    inertia: list[float] = []
    assigned = None
    for _ in range(n_iters):
        cents = spark.createDataFrame(cents_rows, "cell INT, cv ARRAY<DOUBLE>")
        assigned = assign(emb, cents)
        inertia.append(
            assigned.agg(F.sum(F.col("dist") * F.col("dist"))).first()[0]
        )
        cents_rows = [
            (int(r["cell"]), [float(x) for x in r["cv"]])
            for r in update_centroids(assigned).collect()
        ]
    return assigned.select("vec_id", "cluster", "dist"), inertia


def _kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    final, _ = kmeans(spark, _corpus(spark))
    return final


register_df(
    "kmeans_lloyd",
    _kmeans_lloyd,
    doc=f"{N_ITERS} full Lloyd iterations (broadcast assign + posexplode update); "
    "inertia contract pytest-asserted.",
)
