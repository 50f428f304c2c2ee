"""Generator determinism + schema/mix conformance
(parity with flock's generator tests, event.rs:389-434)."""

from pyspark.sql import functions as F

from squirtle_spark import sources


def test_nexmark_mix(spark):
    n_sec, eps = 4, 1000
    p = sources.nexmark_persons(spark, eps, n_sec).count()
    a = sources.nexmark_auctions(spark, eps, n_sec).count()
    b = sources.nexmark_bids(spark, eps, n_sec).count()
    assert p == n_sec * sources.PERSONS_PER_K
    assert a == n_sec * sources.AUCTIONS_PER_K
    assert b == n_sec * sources.BIDS_PER_K


def test_determinism(spark):
    a1 = sources.nexmark_bids(spark, 500, 2, seed=7).collect()
    a2 = sources.nexmark_bids(spark, 500, 2, seed=7).collect()
    assert a1 == a2
    a3 = sources.nexmark_bids(spark, 500, 2, seed=8).collect()
    assert a1 != a3


def test_referential_integrity(spark):
    """Every bid references an auction/person that already exists."""
    bids = sources.nexmark_bids(spark, 1000, 3)
    auctions = sources.nexmark_auctions(spark, 1000, 3)
    persons = sources.nexmark_persons(spark, 1000, 3)
    n_a = auctions.count()
    n_p = persons.count()
    mx = bids.agg(F.max("auction").alias("a"), F.max("bidder").alias("b")).collect()[0]
    assert mx["a"] < n_a
    assert mx["b"] < n_p


def test_person_schema(spark):
    df = sources.nexmark_persons(spark, 100, 1)
    assert [f.name for f in df.schema.fields] == [
        "p_id", "name", "email_address", "credit_card", "city", "state", "p_date_time",
    ]


def test_ysb(spark):
    ev = sources.ysb_ad_events(spark, 500, 2)
    camp = sources.ysb_campaigns(spark)
    assert ev.count() == 1000
    assert camp.count() == 1000
    joined = ev.join(camp, ev.ad_id == camp.c_ad_id)
    assert joined.count() == 1000  # every ad_id resolves


def test_jsonl_batch_roundtrip(spark, sf_dir, tmp_path):
    """Batch JSONL lane (the interchange format corpora actually ship in):
    documents written as JSON lines and read back through the same
    first-record-family schema inference the streaming path uses must
    reproduce the parquet original value-for-value."""
    from squirtle_spark import sources

    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "docs-jsonl")
    src.write.json(path)

    schema = sources.infer_json_schema(spark, path)
    back = spark.read.schema(schema).json(path)

    cols = sorted(src.columns)
    assert sorted(back.columns) == cols
    a = sorted(map(tuple, src.select(*cols).collect()))
    b = sorted(map(tuple, back.select(*cols).collect()))
    assert a == b
