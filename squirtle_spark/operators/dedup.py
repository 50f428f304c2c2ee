"""Deduplication operators over the ``documents`` table.

Three tiers, all shuffle-bounded (never all-pairs):

- **exact**: hash-key dedup — group on a content fingerprint, keep the
  smallest doc_id (deterministic, unlike ``dropDuplicates`` which keeps an
  arbitrary row per key).
- **MinHash-LSH**: word-shingle → 32 minhashes (one grouped aggregation —
  no 32× explode; kept at 32 because wider agg rows cost ~20-30s of one-time
  codegen per JVM) → 8 bands × 4 rows (candidate threshold ≈ 0.59 Jaccard)
  → bucket self-join → exact-Jaccard verification on the candidates only.
  Candidate generation is banded, so the join is |bucket|², never |corpus|²
  — the property that keeps this runnable at 100 TB.
- **SimHash**: 32-bit signature from token-hash bit votes; candidates from
  4×8-bit band buckets; Hamming-distance verification via bit_count(xor).

All hashing is Spark's xxhash64 (JVM-side, codegen'd); no Python in the hot
path. Oracle note: xxhash64 isn't reproducible in DuckDB, so the fuzzy ops
use the driver's rows-only check; exact dedup is fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import dialect as dl
from ..registry import register_df, register_sql

N_MINHASH = 32
N_BANDS = 8  # 8 bands × 4 rows/band; candidate threshold ≈ (1/8)^(1/4) ≈ 0.59
ROWS_PER_BAND = N_MINHASH // N_BANDS
SHINGLE_W = 3  # word 3-grams

SIMHASH_BITS = 32  # stays well within positive BIGINT; 32 bit-vote aggs
SIMHASH_BANDS = 4  # 4 × 8-bit chunks
HAMMING_MAX = 4


def _dedup_exact(d: str) -> str:
    return """
SELECT doc_id, content_fp
FROM (
    SELECT doc_id,
           md5(lower(trim(text))) AS content_fp,
           ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
    FROM documents
)
WHERE rn = 1
"""


register_sql(
    "dedup_exact",
    _dedup_exact,
    doc="Exact dedup: content-hash groups, deterministic survivor (min doc_id).",
    bench=True,
)


def _ngram_jaccard(d: str) -> str:
    """Exact word-3-gram Jaccard near-dup pairs, dialect-shared SQL.

    This is the exact ground truth the MinHash-LSH pipeline approximates —
    and unlike the xxhash64-based entries it renders in DuckDB, so the
    driver gets a VALUE-LEVEL check on the near-dup family (same 0.2
    threshold as the LSH verify stage). jaccard is a single IEEE division
    of two integers — bitwise identical across engines, no rounding needed.

    Scale: the only joins are shingle equi-joins (narrow rows) + a grouped
    count — the sort-merge/hash distribution of set intersection. Hot
    (stopword-heavy) shingles are the skew risk at 100 TB; AQE skew-join
    splits them (session.py), and the LSH variant is the cheap path anyway.
    """
    import textwrap

    from .curation import shingle_rows

    return textwrap.dedent(f"""
        WITH sh_rows AS ({shingle_rows(d, "TRUE", SHINGLE_W)}),
        sizes AS (
            SELECT doc_id, COUNT(*) AS n_sh FROM sh_rows GROUP BY doc_id
        ),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
            FROM sh_rows a
            JOIN sh_rows b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b, jaccard
        FROM (
            SELECT doc_a, doc_b,
                   CAST(n_inter AS DOUBLE)
                   / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
        ) j
        WHERE jaccard >= 0.2
        """)


register_sql(
    "dedup_ngram_jaccard",
    _ngram_jaccard,
    doc="Exact n-gram Jaccard near-dup pairs (value-level oracle for the LSH path).",
)


def _dedup_clusters(spark, sf_dir) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the exact
    n-gram-Jaccard pair graph, labels = min doc_id per component — the
    step a real dedup pipeline runs after pair-finding (keep one canonical
    doc per cluster).

    Spark has no recursive CTE; the idiomatic scale algorithm is iterative
    min-label propagation (GraphFrames'/large-scale-CC style): every
    iteration each node takes the min label among itself and its
    neighbors — two bounded shuffles per iteration, converging in
    O(log(component diameter)) rounds. The driver-side loop is control
    flow only (one tiny count per round); all data movement stays
    distributed. DuckDB's recursive CTE is the oracle.
    """
    pairs = spark.sql(_ngram_jaccard(dl.SPARK)).select("doc_a", "doc_b")
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("doc_a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # Plain min-label propagation advances a component's min label at least
    # one hop per round, so worst case is O(component DIAMETER) rounds, not
    # O(log diameter) — the cap must be validated, never trusted.
    max_rounds = 256
    converged = False
    for _ in range(max_rounds):
        neigh = (
            edges.join(labels, edges["doc_b"] == labels["node"])
            .groupBy("doc_a")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, labels["node"] == neigh["doc_a"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
            # Truncate lineage each round: without this, every `changed`
            # count re-executes the whole 2-joins-per-iteration history
            # (quadratic recompute, unbounded plan depth).
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dedup_clusters: min-label propagation not converged after "
            f"{max_rounds} rounds (component diameter exceeds the cap)"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def _clusters_oracle(d: str = dl.DUCK) -> str:
    return f"""
WITH RECURSIVE pairs AS (
    {_ngram_jaccard(d)}
),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION ALL
    SELECT doc_b, doc_a FROM pairs
),
reach(node, r) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.b, reach.r FROM reach JOIN edges e ON reach.node = e.a
)
SELECT node AS doc_id, MIN(r) AS cluster_id
FROM reach
GROUP BY node
"""


register_df(
    "dedup_clusters",
    _dedup_clusters,
    oracle_body=_clusters_oracle(),
    doc="Near-dup connected components (min-label propagation vs recursive-CTE oracle).",
)


def _shingled(spark) -> DataFrame:
    """documents → (doc_id, shingle) — word w-grams of normalized text.

    Positions are exploded and ONE shingle rendered per output row —
    explode(transform(...)) re-does the whole array lambda per exploded
    row, quadratic in tokens per doc (see curation.shingle_rows). Unlike
    the SQL path, sub-width docs keep one truncated shingle (sequence
    floor of 1), preserving this pipeline's historical signatures.
    """
    docs = spark.table("documents")
    return (
        docs.select(
            "doc_id",
            F.expr(r"filter(split(lower(trim(text)), '\\s+'), x -> x != '')").alias("toks"),
        )
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.expr(f"sequence(1, greatest(size(toks) - {SHINGLE_W - 1}, 1))")
            ).alias("pos"),
        )
        .select(
            "doc_id",
            F.expr(f"concat_ws(' ', slice(toks, pos, {SHINGLE_W}))").alias("shingle"),
        )
        .distinct()
    )


def _minhash_pairs(spark, sf_dir) -> DataFrame:
    sh = _shingled(spark)
    # All permutations in ONE grouped aggregation: min(xxhash64(seed_i, shingle)),
    # plus the per-doc shingle count for the Jaccard denominator — folding it
    # here saves a full recompute of the shingle relation (sh rows are
    # distinct, so count(*) == |shingle set|). (Wide-agg codegen has a fixed
    # JIT cost; per-row cost stays O(n_perm).)
    sig = sh.groupBy("doc_id").agg(
        F.count("*").alias("n_sh"),
        *[
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh{i}")
            for i in range(N_MINHASH)
        ],
    )
    # Band signatures: hash each band's minhashes together; rows stay narrow
    # (doc_id, band, band_hash) so the bucket join shuffles no payload.
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"mh{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
                        ).alias("band_hash"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.band_hash")

    cand = (
        bands.select(F.col("doc_id").alias("doc_a"), "band", "band_hash")
        .join(
            bands.select(F.col("doc_id").alias("doc_b"), "band", "band_hash"),
            ["band", "band_hash"],
        )
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    # Exact-Jaccard verification on candidates only, via shingle equi-joins —
    # no per-doc arrays are materialized or shuffled, so the same plan holds
    # when documents are billions of rows. (At that scale the shingle
    # relation — still referenced twice below — would be checkpointed once
    # rather than recomputed; locally recompute is cheaper than the write.)
    sizes = sig.select("doc_id", "n_sh")
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4
            ),
        )
        .where(F.col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", "jaccard")
    )


register_df(
    "dedup_minhash_lsh",
    _minhash_pairs,
    doc="MinHash-LSH near-dup pairs: banded buckets → candidate join → exact-Jaccard verify.",
    bench=True,
)


def _simhash_pairs(spark, sf_dir) -> DataFrame:
    docs = spark.table("documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr(r"filter(split(lower(trim(text)), '\\s+'), x -> x != '')")
        ).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(h >> {k}) & 1 = 1"), F.lit(1)).otherwise(F.lit(-1))
            ).alias(f"v{k}")
            for k in range(SIMHASH_BITS)
        ]
    )
    bit_sum = " + ".join(
        f"(CASE WHEN v{k} > 0 THEN CAST(pow(2, {k}) AS BIGINT) ELSE 0L END)"
        for k in range(SIMHASH_BITS)
    )
    sig = votes.select("doc_id", F.expr(f"({bit_sum})").alias("simhash"))

    chunk_bits = SIMHASH_BITS // SIMHASH_BANDS
    mask = (1 << chunk_bits) - 1
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"(simhash >> {b * chunk_bits}) & {mask}").alias("chunk"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", "simhash", "bs.band", "bs.chunk")

    left = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "band", "chunk"
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "band", "chunk"
    )
    return (
        left.join(right, ["band", "chunk"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.expr("bit_count(sh_a ^ sh_b)").alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= HAMMING_MAX)
    )


register_df(
    "dedup_simhash",
    _simhash_pairs,
    doc="SimHash near-dup pairs: bit-vote signatures, banded buckets, Hamming verify.",
)
