"""Deterministic NEXMark / YSB event generators.

Parity target: flock's seeded generators
(flock/src/datasource/nexmark/nexmark.rs:285-390, generator.rs:25-45;
ysb/generator.rs) — per-second epochs, configurable events/sec, and the
NEXMark 1:3:46 entity mix (20 persons / 60 auctions / 920 bids per 1000
events, reference README.md:219-228).

Spark-first design: instead of a driver-side RNG loop, events are a pure
function of ``spark.range(n)`` — every attribute derives from the row id
via a seeded hash, so generation is fully distributed (any executor can
produce any slice), reproducible under any partitioning, and scales to
billions of events with zero driver memory. Entity ids are dense closed
forms of (epoch, slot), so bids always reference persons/auctions that
exist — same invariant flock's generator maintains.

The hash is ``dialect.md5_i64`` (round 8; was xxhash64): bit-identical
in DuckDB, so the ``gen_*`` registry entries carry FULL value-level
oracles — the oracle re-generates every event from the same closed
forms and the hashes agree byte-for-byte. At production scale the same
structure runs on xxhash64 (cheaper, same width) when oracle replay
isn't needed — the dialect module's standing trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dialect as dl

# NEXMark mix per 1000 events (README.md:219-228): slots 0-19 → person,
# 20-79 → auction, 80-999 → bid.
PERSONS_PER_K = 20
AUCTIONS_PER_K = 60
BIDS_PER_K = 920

BASE_TS = "2024-01-01 00:00:00"

_STATES = ["OR", "ID", "CA", "WA", "NY", "TX", "FL", "MA", "AZ", "NV"]


def _hash_input(seed: int, tag: int) -> str:
    """The exact string hashed per (event id, stream-of-randomness tag) —
    one rendering, used verbatim by the Spark generator AND the DuckDB
    oracle, so both engines hash the same bytes."""
    return f"'{seed}|' || CAST(id AS STRING) || '|{tag}'"


def _rand(seed: int, tag: int, mod: str) -> F.Column:
    """Deterministic pseudo-random in [0, mod): md5_i64 of (seed, id, tag).

    md5_i64 is already positive (60-bit), so no abs() is needed and the
    modulus is bias-free for mod << 2^60."""
    return F.expr(dl.md5_i64(_hash_input(seed, tag), dl.SPARK)) % F.expr(mod)


def _enrich(ids: DataFrame, events_per_sec: int, seed: int) -> DataFrame:
    """Attach the derived generator columns to a DataFrame of event ``id``s.

    Works identically on a bounded ``spark.range`` and on an unbounded
    streaming id source (the rate connector) — every attribute is a pure
    per-row function of id, so batch and stream emit byte-identical events.
    """
    return (
        ids
        .withColumn("epoch", (F.col("id") / events_per_sec).cast("long"))
        .withColumn("slot", F.col("id") % 1000)
        .withColumn("kilo", (F.col("id") / 1000).cast("long"))
        .withColumn(
            "ts",
            F.expr(
                f"timestampadd(SECOND, epoch, TIMESTAMP_NTZ '{BASE_TS}')"
                f" + make_interval(0, 0, 0, 0, 0, 0, (id % {events_per_sec}) * 0.001)"
            ),
        )
        .withColumn("r1", F.expr(dl.md5_i64(_hash_input(seed, 1), dl.SPARK)))
        .withColumn("r2", F.expr(dl.md5_i64(_hash_input(seed, 2), dl.SPARK)))
    )


def _base(spark: SparkSession, events_per_sec: int, seconds: int, seed: int) -> DataFrame:
    return _enrich(spark.range(events_per_sec * seconds), events_per_sec, seed)


def nexmark_persons(spark, events_per_sec=1000, seconds=10, seed=42) -> DataFrame:
    """person stream (schema: flock/src/datasource/nexmark/event.rs:130-148)."""
    b = _base(spark, events_per_sec, seconds, seed).where(F.col("slot") < PERSONS_PER_K)
    p_id = F.col("kilo") * PERSONS_PER_K + F.col("slot")
    state_arr = "array(" + ",".join(f"'{s}'" for s in _STATES) + ")"
    return b.select(
        p_id.cast("long").alias("p_id"),
        F.concat(F.lit("person_"), p_id).alias("name"),
        F.concat(F.lit("user_"), p_id, F.lit("@example.com")).alias("email_address"),
        (F.col("r1") % 10000).cast("string").alias("credit_card"),
        F.concat(F.lit("city_"), F.col("r1") % 37).alias("city"),
        F.expr(f"element_at({state_arr}, CAST(r2 % 10 AS INT) + 1)").alias("state"),
        F.col("ts").alias("p_date_time"),
    )


def nexmark_auctions(spark, events_per_sec=1000, seconds=10, seed=42) -> DataFrame:
    """auction stream (schema: event.rs:220-246); seller references an
    already-generated person (dense id < persons emitted so far)."""
    b = _base(spark, events_per_sec, seconds, seed).where(
        (F.col("slot") >= PERSONS_PER_K) & (F.col("slot") < PERSONS_PER_K + AUCTIONS_PER_K)
    )
    a_id = F.col("kilo") * AUCTIONS_PER_K + (F.col("slot") - PERSONS_PER_K)
    persons_so_far = f"greatest((kilo + 1) * {PERSONS_PER_K}, 1)"
    return b.select(
        a_id.cast("long").alias("a_id"),
        F.concat(F.lit("item_"), F.col("r1") % 1000).alias("item_name"),
        F.concat(F.lit("desc_"), F.col("r1") % 101).alias("description"),
        (F.col("r1") % 1000 + 1).cast("int").alias("initial_bid"),
        (F.col("r1") % 1000 + 1 + F.col("r2") % 500).cast("int").alias("reserve"),
        F.col("ts").alias("a_date_time"),
        F.expr("timestampadd(SECOND, CAST(r2 % 20 AS INT) + 5, ts)").alias("expires"),
        _rand(seed, 3, mod=persons_so_far).cast("long").alias("seller"),
        (F.col("r2") % 20).cast("int").alias("category"),
    )


def _bid_projection(b: DataFrame, seed: int, include_id: bool = False) -> DataFrame:
    """Enriched ids → bid rows; auction/bidder reference already-generated
    entities (dense ids below the per-kilo high-water mark)."""
    bids = b.where(F.col("slot") >= PERSONS_PER_K + AUCTIONS_PER_K)
    auctions_so_far = f"greatest((kilo + 1) * {AUCTIONS_PER_K}, 1)"
    persons_so_far = f"greatest((kilo + 1) * {PERSONS_PER_K}, 1)"
    cols = [
        _rand(seed, 4, mod=auctions_so_far).cast("long").alias("auction"),
        _rand(seed, 5, mod=persons_so_far).cast("long").alias("bidder"),
        (F.col("r1") % 10000 + 1).cast("int").alias("price"),
        F.col("ts").alias("b_date_time"),
    ]
    if include_id:
        cols = [F.col("id")] + cols
    return bids.select(*cols)


def nexmark_bids(spark, events_per_sec=1000, seconds=10, seed=42) -> DataFrame:
    """bid stream (schema: event.rs:336-353)."""
    return _bid_projection(_base(spark, events_per_sec, seconds, seed), seed)


def rate_bid_stream(
    spark: SparkSession,
    events_per_sec: int = 1000,
    seed: int = 42,
    include_id: bool = False,
) -> DataFrame:
    """UNBOUNDED rate-limited bid stream — the broker-source stand-in.

    Parity with flock's Kinesis/Kafka generators feeding a broker at a
    configured events/sec (flock/src/datasource/kinesis.rs:42-91): Spark's
    ``rate`` source emits a monotonically increasing ``value`` at
    ``rowsPerSecond``; the same pure per-id projection the batch generator
    uses turns it into bid events, so the stream is byte-identical to
    ``nexmark_bids`` over the same id range — swap in format("kafka") +
    the same projection against a real broker.
    """
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", events_per_sec)
        .load()
        .select(F.col("value").alias("id"))
    )
    return _bid_projection(_enrich(raw, events_per_sec, seed), seed, include_id)


def ysb_ad_events(spark, events_per_sec=1000, seconds=10, seed=42) -> DataFrame:
    """YSB ad-event stream (flock/src/datasource/ysb/event.rs:43-59)."""
    b = _base(spark, events_per_sec, seconds, seed)
    types = "array('banner','modal','sponsored-search','mail','mobile')"
    etypes = "array('view','click','purchase')"
    return b.select(
        (F.col("r1") % 100000).cast("string").alias("ysb_user_id"),
        F.concat(F.lit("page_"), F.col("r1") % 100).alias("page_id"),
        (F.col("r2") % 1000).cast("string").alias("ad_id"),
        F.expr(f"element_at({types}, CAST(r1 % 5 AS INT) + 1)").alias("ad_type"),
        F.expr(f"element_at({etypes}, CAST(r2 % 3 AS INT) + 1)").alias("event_type"),
        F.col("ts").alias("event_time"),
        F.concat(F.lit("10.0.0."), F.col("r1") % 256).alias("ip_address"),
    )


def ysb_campaigns(spark, n_ads: int = 1000, n_campaigns: int = 100) -> DataFrame:
    """Static ad→campaign map (ysb/event.rs:76-83)."""
    return spark.range(n_ads).select(
        F.col("id").cast("string").alias("c_ad_id"),
        F.concat(F.lit("campaign_"), F.col("id") % n_campaigns).alias("campaign_id"),
    )


# ---------------------------------------------------------------------------
# External connectors (flock §2.1: kafka.rs / kinesis.rs / s3.rs / csv side input)
# ---------------------------------------------------------------------------


def infer_json_schema(spark: SparkSession, sample_path: str):
    """Infer a schema from JSON records — parity with flock's Kafka connector,
    which infers the schema from the first record
    (flock/src/datasource/kafka.rs:91-101)."""
    return spark.read.json(sample_path).schema


def json_stream(
    spark: SparkSession, path: str, schema=None, files_per_trigger: int = 1
) -> DataFrame:
    """Streaming JSON source with flock-style first-record schema inference.

    File-based here; against a real broker the identical decode path is
    ``spark.readStream.format("kafka")`` + ``from_json(value, schema)`` with
    the same inferred schema.
    """
    if schema is None:
        schema = infer_json_schema(spark, path)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .json(path)
    )


def kafka_stream(
    spark: SparkSession, bootstrap: str, topic: str, schema
) -> DataFrame:
    """Kafka source → parsed columns (flock kafka.rs:48-101 parity).

    Requires the spark-sql-kafka package on the classpath; the decode path
    (bytes → JSON → columns) is the same one json_stream exercises in tests.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("rec")
    ).select("rec.*")


def kinesis_stream(
    spark: SparkSession,
    stream_name: str,
    region: str,
    schema,
    *,
    endpoint: str | None = None,
) -> DataFrame:
    """Kinesis source → parsed columns (flock kinesis.rs:42-91 parity).

    Requires a Kinesis connector package on the classpath (e.g. the
    spark-sql-kinesis connector registering format("kinesis")); none ships
    with OSS Spark, so in this environment ``rate_bid_stream`` /
    ``replay_stream`` stand in. The decode path (bytes → JSON → columns)
    is identical to the Kafka/json_stream path that IS tested.
    """
    reader = (
        spark.readStream.format("kinesis")
        .option("streamName", stream_name)
        .option("region", region)
        .option("startingPosition", "TRIM_HORIZON")
    )
    if endpoint:
        reader = reader.option("endpointUrl", endpoint)
    raw = reader.load()
    return raw.select(
        F.from_json(F.col("data").cast("string"), schema).alias("rec")
    ).select("rec.*")


def socket_json_stream(spark: SparkSession, host: str, port: int, schema) -> DataFrame:
    """Push-based network source: newline-delimited JSON over a TCP socket,
    decoded through the SAME bytes → JSON → columns path as the Kafka and
    Kinesis wiring above. This is the one broker-shaped connector that can
    run end-to-end in a broker-less environment (a localhost server stands
    in for the broker; tests/test_connectors.py drives it live), so it
    evidences the whole push-ingest pipeline: connect, receive, parse,
    window. Spark's socket source is not fault-tolerant (no replay) — for
    production brokers use kafka_stream/kinesis_stream, which differ only
    in the reader options.
    """
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return raw.select(F.from_json(F.col("value"), schema).alias("rec")).select("rec.*")


def csv_side_input(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Bounded CSV side input (q13's register_csv path,
    flock/src/datasource/nexmark/queries/q13.rs): read once, broadcast into
    the enrichment join."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_evolving_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet dir whose files were written under EVOLVING schemas
    (columns added over time — the normal life of a long-lived ingest
    path): ``mergeSchema`` unions all file footers into one wide schema;
    files missing a column surface NULLs. Spark's default reads ONE
    footer for speed (at 100 TB, merging a million footers is a real
    cost — production pins the merged schema in a catalog and passes it
    explicitly; this helper is the discovery step that builds it).
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def json_lines_tolerant(
    spark: SparkSession, path: str, schema
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines with broken records QUARANTINED, not dropped or
    fatal (kafka.rs's decode path panics the worker on bad payloads; a
    100 TB ingest treats malformed input as data, not as an error):
    PERMISSIVE mode routes unparseable lines into a corrupt-record
    column. Returns (good_rows, quarantine) — quarantine keeps the raw
    line for replay after a parser fix.

    The corrupt column must be materialized (cached) before filtering on
    it — Spark refuses a filter referencing ONLY the corrupt column on a
    lazy scan (internal-corrupt-record restriction).
    """
    from pyspark.sql.types import StringType, StructType

    full = StructType(schema.fields[:]).add("_corrupt_record", StringType())
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    df = df.cache()
    good = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, bad
