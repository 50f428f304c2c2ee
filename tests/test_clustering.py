"""k-means contract: Lloyd iterations must monotonically improve inertia,
iteration 1 must equal the oracle-checked single assignment step, and no
cluster may dominate (the seed spread keeps the partition non-trivial)."""

from pyspark.sql import functions as F

from squirtle_spark import catalog
from squirtle_spark.operators import clustering


def test_kmeans_inertia_non_increasing(spark, sf_dir):
    catalog.register_all(spark, sf_dir)
    emb = clustering._corpus(spark)
    final, inertia = clustering.kmeans(spark, emb, n_iters=3)
    assert len(inertia) == 3
    for a, b in zip(inertia, inertia[1:]):
        assert b <= a + 1e-6, inertia
    # a real partition: every cluster non-empty, none holding everything
    sizes = {r["cluster"]: r["n"] for r in final.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
    total = sum(sizes.values())
    assert len(sizes) == clustering.K_CLUSTERS
    assert max(sizes.values()) < total


def test_kmeans_first_iteration_matches_assign_query(spark, sf_dir):
    catalog.register_all(spark, sf_dir)
    emb = clustering._corpus(spark)
    one = clustering.assign(emb, clustering._seed_centroids(emb)).select(
        "vec_id", "cluster"
    )
    first, _ = clustering.kmeans(spark, emb, n_iters=1)
    got = sorted(map(tuple, first.select("vec_id", "cluster").collect()))
    want = sorted(map(tuple, one.collect()))
    assert got == want
