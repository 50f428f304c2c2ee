"""Similarity search over the ``embeddings`` table (array<float> column).

Two paths:

- **brute-force cosine top-k** — the correctness baseline: candidates ×
  broadcast(query set), dot products via zip_with/aggregate (JVM-side
  higher-order functions, no Python). Fine whenever |queries| is small;
  cost is |corpus|·|queries|.
- **multi-table LSH top-k** — L independent hash tables of k hyperplane
  sign bits each; candidates are the union of same-(table, bucket) pairs.
  Multiple tables are what make hyperplane LSH usable when neighbors are
  weak (P[hit] = 1-(1-p^k)^L): one table's miss is another's hit. Scan
  fraction ≈ L/2^k of the corpus. Approximate → rows-only check; recall
  vs the exact baseline is pytest-asserted (tests/test_similarity.py).
- **IVF top-k** — coarse-centroid cells + N_PROBE-cell probing; the
  partition-pruning design real vector stores use at scale.

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
# k planes/table sets bucket granularity (~log2(corpus/target bucket size));
# L tables set the recall (1-(1-p^k)^L). 4×4 keeps buckets populated AND
# recall clear of the floor at fixture scale; at billions of rows raise k
# with corpus size and L with desired recall.
N_PLANES = 4
L_TABLES = 4
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


def _planes(n: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes (seeded; shipped as literals/broadcast)."""
    rng = random.Random(42)
    return [[rng.choice((-1, 1)) for _ in range(EMB_DIM)] for _ in range(n)]


def _lsh_tables(df: DataFrame, vcol: str) -> DataFrame:
    """Attach (table, bucket) rows: L tables × k sign bits per vector."""
    planes = _planes(L_TABLES * N_PLANES)
    entries = []
    for t in range(L_TABLES):
        bits = []
        for j in range(N_PLANES):
            p = planes[t * N_PLANES + j]
            arr = "array(" + ",".join(f"{x}D" for x in p) + ")"
            bits.append(
                f"(CASE WHEN aggregate(zip_with({vcol}, {arr}, (a, b) -> a * b), 0D,"
                f" (acc, x) -> acc + x) > 0 THEN CAST(pow(2, {j}) AS BIGINT) ELSE 0L END)"
            )
        entries.append(f"struct({t} AS tbl, ({' + '.join(bits)}) AS bucket)")
    return df.withColumn(
        "tb", F.explode(F.expr("array(" + ", ".join(entries) + ")"))
    ).select(*df.columns, F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))


def _ann_lsh(spark, sf_dir) -> DataFrame:
    emb = spark.table("embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    tables = _lsh_tables(emb, "v")
    q = tables.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "tbl", "bucket"
    )
    c = tables.select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv"), "tbl", "bucket"
    )
    scored = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .where(F.col("q_id") != F.col("c_id"))
        # a pair can collide in several tables — dedupe before ranking
        .dropDuplicates(["q_id", "c_id"])
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
    doc="Multi-table hyperplane-LSH cosine top-k: L tables bound the join (approximate).",
)


N_CELLS = 16  # IVF coarse cells; at scale ~sqrt(|corpus|), kmeans-trained
N_PROBE = 8  # cells scanned per query (recall/scan-fraction knob)


def _ann_ivf(spark, sf_dir) -> DataFrame:
    """IVF (inverted-file) ANN top-k — the partition-pruned scale path.

    Index build: N_CELLS coarse centroids (here a deterministic sample of
    corpus vectors — the kmeans-training step of a real IVF — collected to
    the driver ONCE; K rows, not data-scale). Assignment: every vector's
    nearest centroid by cosine, all JVM-side expression math. Search: each
    query probes its N_PROBE nearest cells only, so the candidate join
    touches ~N_PROBE/N_CELLS of the corpus instead of all of it — the
    IVF pruning that makes brute force unnecessary at 100 TB. Approximate
    by construction (rows-only check); recall vs the exact baseline is
    pytest-asserted.
    """
    emb = spark.table("embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # index build: deterministic centroid sample (vec_ids just past the
    # query range), one bounded collect — this is index training, not query
    cents = (
        emb.where(
            (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + N_CELLS)
        )
        .orderBy("vec_id")
        .collect()
    )

    def cell_sims(vcol: str) -> str:
        """Array of (cos_sim, cell_id) structs against every centroid."""
        entries = []
        for i, row in enumerate(cents):
            arr = "array(" + ",".join(f"{x}D" for x in row["v"]) + ")"
            norm = sum(x * x for x in row["v"]) ** 0.5
            entries.append(
                f"struct(aggregate(zip_with({vcol}, {arr}, (a, b) -> a * b), 0D,"
                f" (acc, x) -> acc + x) / {norm}D AS sim, {i} AS cell)"
            )
        return "array(" + ", ".join(entries) + ")"

    sims = cell_sims("v")
    # candidates: one home cell each (argmax sim = lexicographic array_max)
    c = emb.select(
        F.col("vec_id").alias("c_id"),
        F.col("v").alias("cv"),
        F.expr(f"array_max({sims}).cell").alias("cell"),
    )
    # queries: probe the N_PROBE nearest cells
    q = (
        emb.where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.expr(
                f"transform(slice(reverse(array_sort({sims})), 1, {N_PROBE}),"
                " s -> s.cell)"
            ).alias("probes"),
        )
        .select("q_id", "qv", F.explode("probes").alias("cell"))
    )
    scored = (
        c.join(F.broadcast(q), "cell")
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
    "ann_ivf_topk",
    _ann_ivf,
    doc="IVF ANN top-k: coarse-cell assignment + N_PROBE cell pruning (approximate).",
)


def _embed_neardup(spark, sf_dir) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: same-(table, bucket)
    candidates only (multi-table hyperplane LSH), cosine ≥ threshold. The
    all-pairs version of this is the canonical 100 TB killer; bucketing
    bounds it, and near-dups (cosine ≥ 0.9 ⇒ tiny plane-disagreement
    probability) are exactly the pairs multi-table LSH rarely misses."""
    emb = spark.table("embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    tables = _lsh_tables(emb, "v")
    a = tables.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), "tbl", "bucket")
    b = tables.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), "tbl", "bucket")
    return (
        a.join(b, ["tbl", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", F.round(_cosine("va", "vb"), 4).alias("cos_sim"))
        .where(F.col("cos_sim") >= 0.9)
    )


register_df(
    "embed_neardup_cosine",
    _embed_neardup,
    doc="Embedding near-dup pairs: LSH-bucketed candidate join + cosine threshold.",
)
