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

import os

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
    # The zip_with fold stays (r15 A/B): unrolling the 64-term squared-L2
    # into plain codegen arithmetic measured as a wash here (pooled mins
    # 0.410 vs 0.415 s assign, 3.16 vs 2.92 s lloyd over 2×15 reps) — the
    # corpus × K fan-out is only K=8 rows wide, so the interpreted-fold
    # cost never dominates and the bigger expression tree costs planning.
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
    (cluster, dim); no wide agg, no driver-side data). The mean routes
    through DECIMAL (exact, order-independent — dialect.py's dsum
    pattern), which is what lets DuckDB replay the WHOLE Lloyd loop for
    kmeans_lloyd's value oracle: identical centroids each iteration →
    identical assignments."""
    return (
        assigned.select(F.col("cluster"), F.posexplode("v").alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(
            F.expr(
                "CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)"
            ).alias("mx")
        )
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
    spark: SparkSession,
    emb: DataFrame,
    n_iters: int = N_ITERS,
    compute_inertia: bool = True,
) -> tuple[DataFrame, list[float]]:
    """Full Lloyd loop; returns (final assignment, per-iteration inertia).

    The driver loop is control flow only: each iteration collects the K×dim
    centroid matrix (bounded) and re-broadcasts it as literal rows so the
    assignment join needs no shuffle of the corpus side.
    ``compute_inertia=False`` skips the per-iteration inertia job (one
    extra corpus pass each round) — the convergence-diagnostic the pytest
    contract needs but a production index build doesn't.
    """
    cents_rows = [
        (int(r["cell"]), [float(x) for x in r["cv"]])
        for r in _seed_centroids(emb).collect()
    ]
    inertia: list[float] = []
    assigned = None
    for i in range(n_iters):
        cents = spark.createDataFrame(cents_rows, "cell INT, cv ARRAY<DOUBLE>")
        assigned = assign(emb, cents)
        if compute_inertia:
            inertia.append(
                assigned.agg(F.sum(F.col("dist") * F.col("dist"))).first()[0]
            )
        if i < n_iters - 1:  # the last update feeds no further assignment
            cents_rows = [
                (int(r["cell"]), [float(x) for x in r["cv"]])
                for r in update_centroids(assigned).collect()
            ]
    return assigned.select("vec_id", "cluster", "dist"), inertia


def _kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    final, _ = kmeans(spark, _corpus(spark), compute_inertia=False)
    return final


def _lloyd_oracle() -> str:
    """DuckDB replay of the FULL Lloyd loop, unrolled: N_ITERS assignment
    steps with N_ITERS-1 centroid updates between them. Possible because
    every cross-engine-fragile quantity is pinned — distances round to 4
    decimals before the (dist, cell) argmin, and centroid means are
    DECIMAL-exact (update_centroids), so both engines walk identical
    centroid sequences. Empty clusters drop out of the update on both
    sides identically."""

    def assign_cte(cents: str, out: str) -> str:
        return f"""{out} AS (
    SELECT vec_id, v, cell AS cluster, dist FROM (
        SELECT e.vec_id, e.v, c.cell,
               round(list_distance(e.v, c.cv), 4) AS dist,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY round(list_distance(e.v, c.cv), 4) ASC, c.cell ASC
               ) AS rn
        FROM e CROSS JOIN {cents} c
    ) WHERE rn = 1
)"""

    def update_cte(assigned: str, out: str) -> str:
        return f"""{out} AS (
    SELECT cluster AS cell, list(mx ORDER BY pos) AS cv FROM (
        SELECT cluster, pos,
               CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS mx
        FROM (SELECT cluster, unnest(v) AS x,
                     unnest(range(1, len(v) + 1)) AS pos FROM {assigned}) u
        GROUP BY cluster, pos
    ) m GROUP BY cluster
)"""

    ctes = []
    for i in range(1, N_ITERS + 1):
        ctes.append(assign_cte(f"c{i - 1}", f"a{i}"))
        if i < N_ITERS:
            ctes.append(update_cte(f"a{i}", f"c{i}"))
    body = ",\n".join(ctes)
    return f"""
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
c0 AS (
    SELECT vec_id - {SEED_LO} AS cell, v AS cv
    FROM e WHERE vec_id >= {SEED_LO} AND vec_id < {SEED_LO + K_CLUSTERS}
),
{body}
SELECT vec_id, cluster, dist FROM a{N_ITERS}
"""


register_df(
    "kmeans_lloyd",
    _kmeans_lloyd,
    oracle_body=_lloyd_oracle(),
    doc=f"{N_ITERS} full Lloyd iterations (broadcast assign + posexplode "
    "update); DuckDB replays the whole unrolled loop (DECIMAL-exact "
    "centroid means), plus the pytest inertia contract.",
)


#: Cosine cutoff for "semantically duplicate" — the fixture's random
#: 64-dim vectors top out near cosine 0.44 (COVERAGE.md), so 0.35 keeps
#: the gate exercised while dropping a small, meaningful fraction.
SEM_THRESHOLD = 0.35

#: Salt factor for the cluster-mate pair join: multiplies the K-valued
#: join key so each cluster's quadratic pair fan-out spreads over
#: K × _PAIR_SALT reducers instead of K. Results are salt-invariant
#: (every a_id < b_id pair still joins exactly once); the value only
#: sets parallelism, so production sizes it to cores/K via the env var.
_PAIR_SALT = max(1, int(os.environ.get("SQUIRTLE_SEMDEDUP_PAIR_SALT", "4")))


def _semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv 2303.09540): semantic dedup via
    cluster-scoped cosine pruning. Candidate generation is the k-means
    assignment — pairs are only formed WITHIN a cluster, the published
    alternative to LSH bucketing (operators/dedup.py) for embedding-space
    dedup. Every dropped vector reports its surviving duplicate
    (keep-lowest-id rule, the same survivorship convention as dedup_exact).

    Scale shape: assignment is the broadcast K-row join kmeans_assign
    evidences; the pair join is an equi-join on cluster id, so the
    quadratic term is bounded by cluster size, never corpus size — at
    100 TB k grows with N (SemDeDup uses k ~ sqrt(N)) precisely to hold
    that bound, and the cosine math stays in JVM higher-order functions.
    Deterministic end-to-end (seeded centroids, 4-decimal rounding before
    the threshold), so DuckDB replays the full pipeline value-level.
    """
    from .similarity import EMB_DIM, unrolled_fold

    emb = _corpus(spark)
    # r15 opt: norms hoisted to one fold per VECTOR before the
    # cluster-mate pair join — bit-identical to _cosine (same fold,
    # sqrt'd once; dot/(sqrt(n1)*sqrt(n2)) == dot/(an*bn)), but the
    # per-pair kernel is one 64-term dot instead of three, and the
    # un-hoisted 3-fold form blew Janino's 64 KB method limit inside
    # the join's codegen consume (whole-stage interpretation fallback).
    nrm = unrolled_fold([f"v[{i}] * v[{i}]" for i in range(EMB_DIM)])
    # Materialized ONCE per run (eager localCheckpoint, the transient-
    # materialization class api.py documents): the salted a/b sides below
    # are no longer identical subtrees, so ReuseExchange can't collapse
    # them — without this checkpoint the corpus scan, the broadcast
    # assignment AND the rn=1 window would each execute twice (the
    # scan-budget gate caught exactly that after the salting change).
    # Recomputed on every invocation — nothing persists across runs.
    assigned = (
        assign(emb, _seed_centroids(emb))
        .select("vec_id", "v", "cluster")
        .withColumn("nrm", F.sqrt(F.expr(nrm)))
        .localCheckpoint(eager=True)
    )
    # r15 opt: the pair join's only key is the K-valued cluster id, so
    # every cluster's quadratic pair fan-out landed on one of K reducers
    # — K=8 partitions on a 32-core host, 4x parallelism lost exactly
    # where the cost is quadratic (guide §2.5: too few distinct key
    # values). Salting by a_id spreads each cluster's pairs over
    # _PAIR_SALT reducers; b replicates per salt value, a carries one,
    # so each (a_id < b_id) pair still joins exactly once — the same
    # pair multiset, (K × _PAIR_SALT)-way parallel.
    a = assigned.select(
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("av"),
        F.col("nrm").alias("an"),
        "cluster",
        F.pmod(F.col("vec_id"), F.lit(_PAIR_SALT)).alias("_salt"),
    )
    b = assigned.select(
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
        F.col("cluster").alias("b_cluster"),
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.lit(_PAIR_SALT - 1).cast("bigint"))
        ).alias("b_salt"),
    )
    # r16 (guide §4.2): the salted equi-join scored each of the ~|cluster|²/2
    # pairs with the interpreted aggregate(zip_with(...)) fold — 62.7 s at
    # the 10x corpus (25M pairs), ~95% of the operator's wall. The pair
    # generation is now a COGROUP on the same (cluster, salt) keys (same
    # two shuffles, same bytes — b still replicates per salt), and the
    # scoring inside each group is ONE NumPy float64 block matmul instead
    # of per-pair folds. The kernel emits only pairs whose RAW cosine can
    # survive the declared round-then-threshold gate (cutoff loosened by
    # 1e-9 below the exact HALF_UP boundary 0.349950, plus every NaN pair
    # — Spark's NaN >= x is TRUE, probe-verified); the exact
    # `round(cos, 4) >= SEM_THRESHOLD` filter still runs in the JVM, so
    # the only divergence window vs the fold is the dot's accumulation
    # order, beneath the declared 4-decimal rounding exactly as the
    # DuckDB oracle's own fold order already is. NULL/ragged vectors
    # score no pairs (parity: their folded cosine is NULL, which never
    # passes the threshold). Per-group memory is bounded by cluster size
    # (the operator's own k ~ sqrt(N) bound) and the matmul runs in
    # 1024-row a-side chunks.
    raw_cut = SEM_THRESHOLD - 0.5 * 1e-4 - 1e-9

    def _score_block(left, right):
        import numpy as np
        import pandas as pd

        cols = ["cluster", "a_id", "b_id", "cos_raw"]
        if left.empty or right.empty:
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in zip(
                cols, ("int64", "int64", "int64", "float64"))})

        def block(df, vcol, ncol, icol):
            ok = df[vcol].map(
                lambda v: v is not None and len(v) == EMB_DIM
            ) & df[ncol].notna()
            d = df[ok]
            if d.empty:
                return None
            return (
                d[icol].to_numpy(dtype=np.int64),
                np.stack(d[vcol].to_numpy()).astype(np.float64),
                d[ncol].to_numpy(dtype=np.float64),
            )

        lb = block(left, "av", "an", "a_id")
        rb = block(right, "bv", "bn", "b_id")
        if lb is None or rb is None:
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in zip(
                cols, ("int64", "int64", "int64", "float64"))})
        a_ids, A, an = lb
        b_ids, B, bn = rb
        cl = int(left["cluster"].iloc[0])
        out_a, out_b, out_c = [], [], []
        for s in range(0, len(a_ids), 1024):
            Ac, aidc, anc = A[s : s + 1024], a_ids[s : s + 1024], an[s : s + 1024]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (Ac @ B.T) / (anc[:, None] * bn[None, :])
            keep = (np.less.outer(aidc, b_ids)) & (
                (cos >= raw_cut) | np.isnan(cos)
            )
            ii, jj = np.nonzero(keep)
            out_a.append(aidc[ii])
            out_b.append(b_ids[jj])
            out_c.append(cos[ii, jj])
        return pd.DataFrame(
            {
                "cluster": np.full(sum(map(len, out_a)), cl, dtype=np.int64),
                "a_id": np.concatenate(out_a) if out_a else [],
                "b_id": np.concatenate(out_b) if out_b else [],
                "cos_raw": np.concatenate(out_c) if out_c else [],
            }
        )

    pairs = (
        a.groupBy("cluster", "_salt")
        .cogroup(b.groupBy("b_cluster", "b_salt"))
        .applyInPandas(
            _score_block,
            "cluster bigint, a_id bigint, b_id bigint, cos_raw double",
        )
        .select(
            "a_id",
            "b_id",
            "cluster",
            F.round("cos_raw", 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= SEM_THRESHOLD)
    )
    return pairs.groupBy(F.col("b_id").alias("vec_id"), "cluster").agg(
        F.count("*").alias("n_dups"),
        F.min("a_id").alias("survivor"),
        F.max("cos_sim").alias("max_cos"),
    )


_SEMDEDUP_ORACLE = f"""
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
           emb.v,
           cents.cell,
           round(list_distance(emb.v, cents.cv), 4) AS dist
    FROM emb CROSS JOIN cents
),
assigned AS (
    SELECT vec_id, v, cell AS cluster
    FROM (
        SELECT vec_id, v, cell, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn
        FROM scored
    )
    WHERE rn = 1
),
pairs AS (
    SELECT x.vec_id AS a_id,
           y.vec_id AS b_id,
           x.cluster,
           round(list_cosine_similarity(x.v, y.v), 4) AS cos_sim
    FROM assigned x
    JOIN assigned y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
)
SELECT b_id AS vec_id,
       cluster,
       CAST(COUNT(*) AS BIGINT) AS n_dups,
       MIN(a_id) AS survivor,
       MAX(cos_sim) AS max_cos
FROM pairs
WHERE cos_sim >= {SEM_THRESHOLD}
GROUP BY b_id, cluster
"""


register_df(
    "semdedup",
    _semdedup,
    oracle_body=_SEMDEDUP_ORACLE,
    doc="SemDeDup: k-means-cluster-scoped cosine near-dup pruning over "
    "embeddings (pairs bounded by cluster size, keep-lowest-id survivor).",
    # benched from r16 (VERDICT r15 #3): the heaviest LLM-pipeline
    # operator (r15's largest win, 7.68->1.77 s warm) was invisible to
    # the driver's numbers without this.
    bench=True,
)
