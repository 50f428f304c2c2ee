"""Error bounds for the sketch-based (approximate) aggregates.

approx_sketch_stats is rows-only in the driver gate; its quality evidence
is here: HLL++ distinct counts within 5% of exact, t-digest medians
within 10% of the exact median, per group.
"""

from squirtle_spark.registry import load_all


def test_sketch_error_bounds(spark, sf_dir):
    approx = {
        r["event_type"]: r
        for r in load_all()["approx_sketch_stats"].spark_fn(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r
        for r in spark.sql(
            """
            SELECT event_type,
                   COUNT(DISTINCT user_id) AS users,
                   percentile(value, 0.5) AS median_value
            FROM events GROUP BY event_type
            """
        ).collect()
    }
    assert set(approx) == set(exact)
    for et, e in exact.items():
        a = approx[et]
        assert abs(a["approx_users"] - e["users"]) / e["users"] <= 0.05, et
        assert abs(a["approx_median_value"] - e["median_value"]) / e["median_value"] <= 0.10, et


def test_merged_daily_sketches_track_exact_distinct(spark, sf_dir):
    """Per-day sketches merged per type must estimate the global distinct
    within HLL error — the incremental-aggregation contract (merging
    partials == aggregating the whole, the property flock's arena relies
    on for its partial-state collection)."""
    merged = {
        r["event_type"]: r
        for r in load_all()["sketch_merge_distinct"].spark_fn(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["users"]
        for r in spark.sql(
            "SELECT event_type, COUNT(DISTINCT user_id) AS users FROM events GROUP BY event_type"
        ).collect()
    }
    assert set(merged) == set(exact)
    for et, users in exact.items():
        assert merged[et]["n_daily_sketches"] > 1, et  # the merge is real
        assert abs(merged[et]["approx_users"] - users) / users <= 0.05, et


def test_approx_topk_matches_exact_heavy_hitters(spark, sf_dir):
    """approx_top_k with headroom over the fixture vocabulary is exact:
    the returned counts must equal the true top-k token counts."""
    from squirtle_spark.operators.sketches import TOP_K

    got = load_all()["approx_topk_tokens"].spark_fn(spark, sf_dir).collect()
    exact = spark.sql(
        f"""
        WITH toks AS (
            SELECT explode(filter(split(trim(lower(text)), '\\\\s+'), x -> x != '')) AS tok
            FROM documents
        )
        SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
        ORDER BY cnt DESC, tok ASC LIMIT {TOP_K}
        """
    ).collect()
    assert len(got) == TOP_K
    assert sorted((r["cnt"] for r in got), reverse=True) == [r["cnt"] for r in exact]
    # every token whose count strictly beats the k-th is guaranteed present
    kth = exact[-1]["cnt"]
    must_have = {r["tok"] for r in exact if r["cnt"] > kth}
    assert must_have <= {r["token"] for r in got}


def test_cms_overestimate_invariant(spark, sf_dir):
    """Count-Min estimates can only overestimate (hash collisions add),
    and the absent probe token must estimate below the CMS error bound."""
    from squirtle_spark.registry import load_all

    rows = {
        r["token"]: r
        for r in load_all()["cms_token_counts"].spark_fn(spark, sf_dir).collect()
    }
    assert "zzz-absent-token" in rows
    for tok, r in rows.items():
        assert r["est_count"] >= r["exact_count"], tok
    # absent token's estimate is pure collision mass: bounded well below
    # the heavy hitters' true counts
    present = [r["exact_count"] for t, r in rows.items() if r["exact_count"] > 0]
    if present:
        assert rows["zzz-absent-token"]["est_count"] <= max(present)


def test_dq_profile_approx_tracks_exact_profile(spark, sf_dir):
    """The 100 TB profiler (approx_count_distinct, no Expand) must agree
    with the exact dq_profile on every non-estimated stat and keep each
    approximate distinct count within HLL++'s 5% default rsd (3 sigma
    gives a hard deterministic-seed bound of ~15%; the fixtures land well
    inside 5%)."""
    qs = load_all()
    exact = {r["col_name"]: r for r in qs["dq_profile"].spark_fn(spark, sf_dir).collect()}
    approx = {
        r["col_name"]: r
        for r in qs["dq_profile_approx"].spark_fn(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for col, e in exact.items():
        a = approx[col]
        assert a["n_rows"] == e["n_rows"], col
        assert a["n_nulls"] == e["n_nulls"], col
        assert a["min_num"] == e["min_num"], col
        assert a["max_num"] == e["max_num"], col
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(1, 0.05 * e["n_distinct"]), col


def test_dq_constraints_counts_injected_violations(spark, sf_dir):
    """The constraint suite must be SENSITIVE: a corrupted events view
    (NULL user, duplicate id, out-of-domain type, negative value, stale
    ts) yields exactly the injected per-rule violation counts — the
    all-zero fixture result is not a vacuous pass."""
    from squirtle_spark import catalog
    from squirtle_spark.dialect import SPARK
    from squirtle_spark.operators.profiling import _dq_constraints

    catalog.register_all(spark, sf_dir)
    ev = spark.table("events")
    # 4 rows violating every scan rule at once (fresh ids, so the only
    # duplicates are the 2 re-appended originals below)
    bad = ev.limit(4).selectExpr(
        "event_id + 1000000000 AS event_id",
        "TIMESTAMP '2023-12-31 00:00:00' AS ts",
        "CAST(NULL AS BIGINT) AS user_id",
        "'bogus' AS event_type",
        "CAST(-1.0 AS DOUBLE) AS value",
        "props",
    )
    dup = ev.limit(2)  # re-appended rows: 2 duplicate event_ids
    corrupted = ev.unionByName(bad).unionByName(dup)
    corrupted.createOrReplaceTempView("events")
    try:
        got = {
            r["rule"]: r["violations"]
            for r in spark.sql(_dq_constraints(SPARK)).collect()
        }
    finally:
        spark.catalog.dropTempView("events")
        catalog.invalidate(spark)
    assert got["null_user_id"] == 4
    assert got["duplicate_event_id"] == 2
    assert got["event_type_domain"] == 4
    assert got["negative_value"] == 4
    assert got["ts_before_epoch"] == 4
    assert got["orphan_lineitem_fk"] == 0


def test_constraints_gate_blocks_publication(spark, sf_dir, tmp_path):
    """Write-audit-publish x constraint suite: a staged snapshot with a
    rule breach must never become the committed version; a clean one
    publishes and the catalog's events view survives the shadow."""
    from squirtle_spark import catalog
    from squirtle_spark.operators import maintenance
    from squirtle_spark.operators.profiling import constraints_gate

    catalog.register_all(spark, sf_dir)
    ev = spark.table("events")
    n_events = ev.count()
    table = str(tmp_path / "gated")

    v, failed = maintenance.publish_if(spark, ev, table, [constraints_gate()])
    assert v == 1 and failed == []

    corrupted = ev.unionByName(
        ev.limit(3).selectExpr(
            "event_id + 1000000000 AS event_id",
            "ts",
            "user_id",
            "event_type",
            "CAST(-5.0 AS DOUBLE) AS value",
            "props",
        )
    )
    v2, failed2 = maintenance.publish_if(
        spark, corrupted, table, [constraints_gate()]
    )
    assert v2 is None and failed2 == ["dq_constraints_gate"]
    # pointer still on the clean snapshot; staged dir kept for inspection
    assert maintenance.latest_version(spark, table) == 1
    assert maintenance.read_version(spark, table).count() == n_events
    # after the shadow, the catalog re-registers cleanly (the gate
    # invalidated it, so a stale empty shadow can't leak into later runs)
    catalog.register_all(spark, sf_dir)
    assert spark.table("events").count() == n_events
