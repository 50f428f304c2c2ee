"""Similarity search over the ``embeddings`` table (array<float> column).

Two paths:

- **brute-force cosine top-k** — the correctness baseline: candidates ×
  broadcast(query set), dot products via zip_with/aggregate (JVM-side
  higher-order functions, no Python). Fine whenever |queries| is small;
  cost is |corpus|·|queries|.
- **LSH-bucketed top-k** — the 100 TB path: 16 random-hyperplane sign bits
  → bucket id; candidates only join queries in the same bucket, so the
  join is per-bucket instead of all-pairs. Recall < 1 by construction
  (rows-only check); the bucketing, not the math, is what scales.

Cosine similarities are rounded to 4 decimals before ranking so Spark's
fold order and the oracle's (DuckDB list_cosine_similarity) agree
deterministically; ties then break on candidate id.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, functions as F

from ..registry import register_df

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
# Hyperplane count sets bucket granularity: ~log2(corpus / target bucket
# size). 6 planes → 64 buckets keeps buckets populated at fixture scale;
# at billions of rows you'd raise it so buckets stay join-sized.
N_PLANES = 6
EMB_DIM = 64


def _cosine(qv: str, cv: str) -> F.Column:
    dot = F.expr(f"aggregate(zip_with({qv}, {cv}, (a, b) -> a * b), 0D, (acc, x) -> acc + x)")
    n1 = F.expr(f"aggregate({qv}, 0D, (acc, x) -> acc + x * x)")
    n2 = F.expr(f"aggregate({cv}, 0D, (acc, x) -> acc + x * x)")
    return dot / (F.sqrt(n1) * F.sqrt(n2))


def _ann_brute(spark, sf_dir) -> DataFrame:
    emb = spark.table("embeddings")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").cast("array<double>").alias("qv")
    )
    c = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").cast("array<double>").alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", F.round(_cosine("qv", "cv"), 4).alias("cos_sim"))
    )
    w = "(PARTITION BY q_id ORDER BY cos_sim DESC, c_id ASC)"
    return (
        scored.withColumn("rank", F.expr(f"ROW_NUMBER() OVER {w}"))
        .where(F.col("rank") <= TOP_K)
        .select("q_id", "c_id", "cos_sim", F.col("rank").cast("bigint").alias("rank"))
    )


_ANN_ORACLE = f"""
WITH q AS (
    SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
c AS (
    SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
),
scored AS (
    SELECT q_id, c_id, round(list_cosine_similarity(qv, cv), 4) AS cos_sim
    FROM q, c
    WHERE q_id <> c_id
)
SELECT q_id, c_id, cos_sim, rank
FROM (
    SELECT q_id, c_id, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id ASC) AS rank
    FROM scored
)
WHERE rank <= {TOP_K}
"""


register_df(
    "ann_cosine_topk",
    _ann_brute,
    oracle_body=_ANN_ORACLE,
    doc="Brute-force cosine top-k (broadcast queries; exactness baseline).",
    bench=True,
)


def _planes() -> list[list[int]]:
    """Deterministic ±1 hyperplanes (seeded; shipped as literals/broadcast)."""
    rng = random.Random(42)
    return [[rng.choice((-1, 1)) for _ in range(EMB_DIM)] for _ in range(N_PLANES)]


def _ann_lsh(spark, sf_dir) -> DataFrame:
    emb = spark.table("embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    planes = _planes()
    sign_bits = []
    for j, p in enumerate(planes):
        arr = "array(" + ",".join(f"{x}D" for x in p) + ")"
        sign_bits.append(
            f"(CASE WHEN aggregate(zip_with(v, {arr}, (a, b) -> a * b), 0D, (acc, x) -> acc + x) > 0"
            f" THEN CAST(pow(2, {j}) AS BIGINT) ELSE 0L END)"
        )
    bucketed = emb.withColumn("bucket", F.expr(" + ".join(sign_bits)))

    q = bucketed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "bucket"
    )
    c = bucketed.select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv"), "bucket")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", F.round(_cosine("qv", "cv"), 4).alias("cos_sim"))
    )
    w = "(PARTITION BY q_id ORDER BY cos_sim DESC, c_id ASC)"
    return (
        scored.withColumn("rank", F.expr(f"ROW_NUMBER() OVER {w}"))
        .where(F.col("rank") <= TOP_K)
        .select("q_id", "c_id", "cos_sim", F.col("rank").cast("bigint").alias("rank"))
    )


register_df(
    "ann_lsh_topk",
    _ann_lsh,
    doc="LSH-bucketed cosine top-k: hyperplane sign buckets bound the join (approximate).",
)


def _embed_neardup(spark, sf_dir) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: same-bucket candidates only
    (hyperplane LSH), cosine ≥ threshold. The all-pairs version of this is
    the canonical 100 TB killer; bucketing bounds it."""
    emb = spark.table("embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    planes = _planes()
    sign_bits = []
    for j, p in enumerate(planes):
        arr = "array(" + ",".join(f"{x}D" for x in p) + ")"
        sign_bits.append(
            f"(CASE WHEN aggregate(zip_with(v, {arr}, (a, b) -> a * b), 0D, (acc, x) -> acc + x) > 0"
            f" THEN CAST(pow(2, {j}) AS BIGINT) ELSE 0L END)"
        )
    bucketed = emb.withColumn("bucket", F.expr(" + ".join(sign_bits)))
    a = bucketed.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = bucketed.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(_cosine("va", "vb"), 4).alias("cos_sim"))
        .where(F.col("cos_sim") >= 0.9)
    )


register_df(
    "embed_neardup_cosine",
    _embed_neardup,
    doc="Embedding near-dup pairs: LSH-bucketed candidate join + cosine threshold.",
)
