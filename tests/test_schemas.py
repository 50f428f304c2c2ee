"""Generators and derived views conform to the declared entity schemas
(parity with flock's static schema declarations, event.rs §1.3)."""

from squirtle_spark import catalog, schemas, sources


def _names_types(schema):
    return [(f.name, f.dataType) for f in schema.fields]


def test_generator_schemas(spark):
    assert _names_types(sources.nexmark_persons(spark, 100, 1).schema) == _names_types(
        schemas.PERSON
    )
    assert _names_types(sources.nexmark_auctions(spark, 100, 1).schema) == _names_types(
        schemas.AUCTION
    )
    assert _names_types(sources.nexmark_bids(spark, 100, 1).schema) == _names_types(
        schemas.BID
    )
    assert _names_types(sources.ysb_ad_events(spark, 100, 1).schema) == _names_types(
        schemas.AD_EVENT
    )
    assert _names_types(sources.ysb_campaigns(spark).schema) == _names_types(
        schemas.CAMPAIGN
    )


def test_derived_view_schemas(spark, sf_dir):
    """Derived views carry extra provenance columns (extra) but must agree
    with the declared schema on every declared field."""
    catalog.register_all(spark, sf_dir)
    for view, declared in [
        ("person", schemas.PERSON),
        ("auction", schemas.AUCTION),
        ("bid", schemas.BID),
        ("side_input", schemas.SIDE_INPUT),
        ("ad_event", schemas.AD_EVENT),
        ("campaign", schemas.CAMPAIGN),
    ]:
        actual = {f.name: f.dataType for f in spark.table(view).schema.fields}
        for f in declared.fields:
            assert f.name in actual, f"{view}: missing {f.name}"
            assert actual[f.name] == f.dataType, (
                f"{view}.{f.name}: {actual[f.name]} != {f.dataType}"
            )


def test_partsupp_spreads_over_all_suppliers(spark, sf_dir):
    """The partsupp bridge must reference the FULL supplier key space at
    whatever sf is registered (TPC-H's (partkey + i*(S/4)) % S spread).
    The pre-r15 hard-coded mod-100 covered only 10% of suppliers at
    sf0.1 — which emptied tpch_q20's semi-join at bench scale (VERDICT
    r14 #2) — and every part must still get 4 distinct suppliers."""
    catalog.register_all(spark, sf_dir, force=True)
    s_cnt = spark.table("supplier").count()
    lo, hi, n = (
        spark.sql(
            "SELECT MIN(ps_suppkey), MAX(ps_suppkey), "
            "COUNT(DISTINCT ps_suppkey) FROM partsupp"
        ).first()
    )
    assert lo == 0 and hi == s_cnt - 1 and n == s_cnt
    per_part = spark.sql(
        "SELECT MIN(c), MAX(c) FROM (SELECT ps_partkey, "
        "COUNT(DISTINCT ps_suppkey) AS c FROM partsupp GROUP BY ps_partkey)"
    ).first()
    assert tuple(per_part) == (4, 4)


def test_tpch_q20_nonempty_at_bench_scale(spark):
    """tpch_q20 must return rows at sf0.1: an empty result collapses
    the benched plan to an AQE EmptyRelation, so the bench wall would
    measure empty-relation propagation instead of the nested-IN
    semi-join chain the entry exists to time (VERDICT r14 #2)."""
    import os

    from squirtle_spark.registry import load_all

    sf01 = "/root/testdata/sf0.1"
    if not os.path.isdir(sf01):
        import pytest

        pytest.skip("sf0.1 fixtures not present")
    assert load_all()["tpch_q20"].spark_fn(spark, sf01).count() > 0
