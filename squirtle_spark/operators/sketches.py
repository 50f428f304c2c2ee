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


# --------------------------------------------------------------------------
# Driver-checkable CONTRACT twins (VERDICT r10 item 6). The three
# engine-native sketch entries above/in text.py are rows-only by nature:
# their estimates are DataSketches-/HLL++-parameter-specific, so a DuckDB
# value oracle would compare two different approximations. Each now gets
# a twin whose OUTPUT is deterministic and DuckDB-expressible — exact
# values plus boolean within-error judgments that the sketch's error
# guarantee (pinned by tests/test_sketches.py at the same bounds) makes
# always-true. The driver's value hash then proves both the exact legs
# AND that the live sketch met its bound — the same move that upgraded
# nexmark_q12 via its deterministic virtual-clock twin. The originals
# stay registered as the engine-native forms.
# --------------------------------------------------------------------------

HLL_REL_ERR = 0.05  # test_sketches.py bound; HLL++ default rsd is 5%
TDIGEST_REL_ERR = 0.10  # t-digest median bound from test_sketches.py


def _approx_stats_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_sketch_stats' contract twin: exact distinct per type plus
    bool within-bound rows for the HLL++ count and t-digest median."""
    return spark.sql(
        f"""
        WITH approx AS (
            SELECT event_type,
                   approx_count_distinct(user_id) AS au,
                   CAST(approx_percentile(value, 0.5) AS DOUBLE) AS amed
            FROM events GROUP BY event_type
        ),
        exact AS (
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
                   percentile(value, 0.5) AS emed
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               e.exact_users,
               abs(a.au - e.exact_users) <= {HLL_REL_ERR} * e.exact_users
                   AS users_within_5pct,
               abs(a.amed - e.emed) <= {TDIGEST_REL_ERR} * abs(e.emed)
                   AS median_within_10pct
        FROM exact e JOIN approx a USING (event_type)
        """
    )


register_df(
    "approx_sketch_stats_contract",
    _approx_stats_contract,
    oracle_body="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS users_within_5pct,
       TRUE AS median_within_10pct
FROM events GROUP BY event_type
""",
    doc="Deterministic within-error contract for approx_sketch_stats "
    "(HLL++ 5%, t-digest median 10%): full value oracle.",
)


def _sketch_merge_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sketch_merge_distinct's contract twin: the merged daily-HLL
    estimate must track the exact global distinct within 5% per type;
    the daily-sketch count and exact distinct are oracle-exact."""
    return spark.sql(
        f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   hll_sketch_agg(user_id) AS sk
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        merged AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_daily_sketches,
                   hll_sketch_estimate(hll_union_agg(sk)) AS approx_users
            FROM daily GROUP BY event_type
        ),
        exact AS (
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, m.n_daily_sketches, e.exact_users,
               abs(m.approx_users - e.exact_users)
                   <= {HLL_REL_ERR} * e.exact_users AS merged_within_5pct
        FROM exact e JOIN merged m USING (event_type)
        """
    )


register_df(
    "sketch_merge_distinct_contract",
    _sketch_merge_contract,
    oracle_body="""
SELECT event_type,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_daily_sketches,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS merged_within_5pct
FROM events GROUP BY event_type
""",
    doc="Deterministic contract for sketch_merge_distinct: merged daily "
    "HLL union within 5% of exact global distinct; full value oracle.",
)


def _topk_contract_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_topk_tokens' contract twin: for each EXACT top-k token
    (ties broken by token text — deterministic in both engines), the
    live approx_top_k(2k) must contain it with the exact count. With
    maxItemsTracked (10000) >= the corpus vocabulary the DataSketches
    frequent-items map never evicts, so both booleans are guaranteed —
    the hash check proves the sketch really behaved that way."""
    from .. import dialect as dl

    toks = dl.split_tokens("lower(text)", dl.SPARK)
    return spark.sql(
        f"""
        WITH toks AS (
            SELECT explode({toks}) AS tok FROM documents
        ),
        exact AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_cnt
            FROM toks GROUP BY tok
        ),
        topk AS (
            SELECT tok, exact_cnt FROM exact
            ORDER BY exact_cnt DESC, tok ASC LIMIT {TOP_K}
        ),
        approx AS (
            SELECT t.item AS tok, CAST(t.count AS BIGINT) AS acnt
            FROM (SELECT explode(approx_top_k(tok, {2 * TOP_K}, 10000)) AS t
                  FROM toks)
        )
        SELECT k.tok AS token, k.exact_cnt,
               a.tok IS NOT NULL AS in_approx_top2k,
               COALESCE(a.acnt = k.exact_cnt, FALSE) AS count_exact
        FROM topk k LEFT JOIN approx a ON a.tok = k.tok
        """
    )


def _topk_contract_oracle() -> str:
    from .. import dialect as dl

    toks = dl.split_tokens("lower(text)", dl.DUCK)
    return f"""
WITH toks AS (
    SELECT unnest({toks}) AS tok FROM documents
),
exact AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_cnt
    FROM toks GROUP BY tok
)
SELECT tok AS token, exact_cnt,
       TRUE AS in_approx_top2k,
       TRUE AS count_exact
FROM exact ORDER BY exact_cnt DESC, token ASC LIMIT {TOP_K}
"""


register_df(
    "approx_topk_tokens_contract",
    _topk_contract_spark,
    oracle_body=_topk_contract_oracle(),
    doc=f"Deterministic contract for approx_topk_tokens: every exact "
    f"top-{TOP_K} token present in approx_top_k({2 * TOP_K}) with its "
    "exact count; full value oracle.",
)
