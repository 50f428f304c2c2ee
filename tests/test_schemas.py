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
