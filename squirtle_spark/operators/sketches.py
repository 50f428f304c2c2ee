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
oracle would be comparing two approximations.
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
