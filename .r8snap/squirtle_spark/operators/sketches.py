"""Mergeable sketch state — the incremental-aggregation path at 100 TB.

``approx_sketch_stats`` (operators/text.py) showed the one-shot sketch
aggregates; these two entries show the property that actually matters at
scale: sketch STATE is a value you can persist per shard/day and merge
later, so distinct counts and heavy hitters update incrementally without
re-scanning history (the pattern behind every streaming-ingest metrics
pipeline; flock's arena holds exactly this kind of per-window partial
state, flock/src/runtime/arena/mod.rs:42-60).

- ``sketch_merge_distinct`` — per-(event_type, day) HLL sketches built
  independently (as a daily ingest job would), then merged per type with
  hll_union_agg; the merged estimate must track the exact global
  distinct (error bound pytest-asserted, tests/test_sketches.py).
- ``approx_topk_tokens`` — corpus heavy hitters via approx_top_k over
  exploded tokens. Approximate by design → rows-only; pytest pins the
  top-k multiset against the exact counts.

Both rows-only: sketch estimates are engine-specific (DataSketches in
Spark; DuckDB's approx functions use different parameters), so a value
oracle would be comparing two approximations. ``cms_token_counts`` below
is the counter-example: a Count-Min Sketch hand-built on the cross-engine
md5 hash family is deterministic, so it DOES carry a full value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register_df

TOP_K = 10


def _sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily partial sketches → merged per-type estimate (two-level agg:
    the outer merge consumes only (types × days) sketch blobs, never rows)."""
    return spark.sql(
        """
        WITH daily AS (
            SELECT event_type,
                   CAST(ts AS DATE) AS day,
                   hll_sketch_agg(user_id) AS sk
            FROM events
            GROUP BY event_type, CAST(ts AS DATE)
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_daily_sketches,
               CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT) AS approx_users
        FROM daily
        GROUP BY event_type
        """
    )


register_df(
    "sketch_merge_distinct",
    _sketch_merge,
    doc="Daily HLL sketches merged per key (incremental distinct-count state).",
)


def _topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: explode tokens, one approx_top_k aggregate."""
    return spark.sql(
        f"""
        WITH toks AS (
            SELECT explode(filter(split(trim(lower(text)), '\\\\s+'), x -> x != '')) AS tok
            FROM documents
        )
        SELECT t.item AS token, CAST(t.count AS BIGINT) AS cnt
        FROM (
            SELECT explode(approx_top_k(tok, {TOP_K}, 10000)) AS t FROM toks
        )
        """
    )


register_df(
    "approx_topk_tokens",
    _topk_tokens,
    doc=f"Heavy hitters: approx_top_k({TOP_K}) over exploded corpus tokens.",
)


CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 256  # counters per row
#: Probe tokens whose counts the sketch answers (the heavy-hitter check).
CMS_PROBES = ["the", "data", "of", "to", "model", "zzz-absent-token"]


def _cms_sql(d: str) -> str:
    """Count-Min Sketch over corpus tokens, built ENTIRELY in SQL — the
    hand-built mergeable sketch, in contrast to the engine-native
    (DataSketches) entries above. Because the hash family is the
    cross-engine md5 primitive, the sketch and its estimates are fully
    deterministic, giving a value-level oracle no engine-native sketch can
    (both engines build the identical counter matrix).

    Build: one pass fans each token occurrence out to CMS_DEPTH (row,
    col) cells — a grouped count over (row, col), i.e. a CMS_DEPTH×
    CMS_WIDTH counter matrix, mergeable across shards/days by cell-wise
    addition. Query: estimate(token) = MIN over rows of its cell counts
    (classic CMS overestimate). Output compares the estimate with the
    exact count per probe token; `est >= exact` always holds.
    """
    from .. import dialect as dl

    toks = dl.split_tokens("lower(trim(text))", d)
    un = dl.unnest_fn(d)
    cell = dl.md5_i64("CAST(row AS STRING) || ':' || tok", d)
    probes = ", ".join(f"('{t}')" for t in CMS_PROBES)
    return f"""
WITH toks AS (
    SELECT {un}(tk) AS tok
    FROM (SELECT {toks} AS tk FROM documents) t
),
cells AS (
    SELECT row, ({cell}) % {CMS_WIDTH} AS col, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks {dl.lateral_series(CMS_DEPTH, "row", d)}
    GROUP BY row, ({cell}) % {CMS_WIDTH}
),
probes(token) AS (VALUES {probes}),
probe_cells AS (
    SELECT token, row, ({dl.md5_i64("CAST(row AS STRING) || ':' || token", d)}) % {CMS_WIDTH} AS col
    FROM probes {dl.lateral_series(CMS_DEPTH, "row", d)}
),
est AS (
    SELECT p.token, MIN(COALESCE(c.cnt, 0)) AS est_count
    FROM probe_cells p
    LEFT JOIN cells c ON c.row = p.row AND c.col = p.col
    GROUP BY p.token
),
exact AS (
    SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS exact_count
    FROM toks GROUP BY tok
)
SELECT e.token,
       CAST(e.est_count AS BIGINT) AS est_count,
       COALESCE(x.exact_count, 0) AS exact_count
FROM est e
LEFT JOIN exact x ON x.token = e.token
"""


def _cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import dialect as dl

    return spark.sql(_cms_sql(dl.SPARK))


def _cms_oracle() -> str:
    from .. import dialect as dl

    return _cms_sql(dl.DUCK)


register_df(
    "cms_token_counts",
    _cms,
    oracle_body=_cms_oracle(),
    doc=f"Hand-built Count-Min Sketch ({CMS_DEPTH}x{CMS_WIDTH}, md5 hash "
    "family): deterministic counter matrix, value-level oracle, "
    "est >= exact invariant.",
)
