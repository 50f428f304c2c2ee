"""Behavioral checks for the product-analytics operators where the uniform
fixtures can't exercise a branch (the anomaly flag: synthetic events are
too steady to breach 3 sigma — correct, but the flag path needs proof)."""

from datetime import datetime, timedelta

from squirtle_spark import catalog
from squirtle_spark import dialect as dl
from squirtle_spark.queries import analytics


def test_ts_anomaly_flags_injected_spike(spark):
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(30):  # steady series: 3 events/hour
        for _ in range(3):
            rows.append((eid, base + timedelta(hours=h, minutes=eid % 50), "x"))
            eid += 1
    for _ in range(40):  # hour 30: the spike
        rows.append((eid, base + timedelta(hours=30, minutes=eid % 50), "x"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP_NTZ, event_type STRING"
    )
    df.createOrReplaceTempView("events")
    catalog.invalidate(spark)  # this test clobbered the fixture view
    try:
        out = spark.sql(analytics._ts_anomaly(dl.SPARK)).collect()
    finally:
        spark.catalog.dropTempView("events")
        catalog.invalidate(spark)

    flagged = [r for r in out if r["is_anomaly"]]
    assert len(flagged) == 1
    assert flagged[0]["cnt"] == 40
    # steady hours stay quiet
    assert all(r["cnt"] == 3 for r in out if not r["is_anomaly"])


def test_session_assignment_native_equals_gaps_islands(spark):
    """Property: for ANY timestamp multiset (duplicates, exact-gap
    boundaries, singletons), native session_window and the gaps-and-islands
    formulation assign identical sessions — the equivalence every
    session-window oracle in this repo rests on. Hypothesis hunts the
    boundary cases (an event at EXACTLY gap distance MERGES into the
    running session — native session_window extends through the boundary,
    which the first draft of this test got backwards)."""
    from hypothesis import given, settings, strategies as st

    gap = 10

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=120), min_size=1, max_size=25)
    )
    def check(offsets):
        rows = [
            (i, datetime(2024, 1, 1) + timedelta(seconds=o))
            for i, o in enumerate(offsets)
        ]
        df = spark.createDataFrame(rows, "event_id BIGINT, ts TIMESTAMP_NTZ")
        df.createOrReplaceTempView("sess_prop")

        from pyspark.sql import functions as F

        native = sorted(
            (r["start"], r["n"])
            for r in df.groupBy(F.session_window("ts", f"{gap} seconds"))
            .agg(F.count("*").alias("n"))
            .select(F.col("session_window.start").alias("start"), "n")
            .collect()
        )
        islands = sorted(
            (r["start"], r["n"])
            for r in spark.sql(f"""
                WITH flagged AS (
                    SELECT ts,
                           CASE WHEN unix_timestamp(lag(ts) OVER (ORDER BY ts, event_id))
                                     + {gap} < unix_timestamp(ts)
                                     OR lag(ts) OVER (ORDER BY ts, event_id) IS NULL
                                THEN 1 ELSE 0 END AS new_session
                    FROM sess_prop
                ),
                sess AS (
                    SELECT ts, SUM(new_session) OVER (
                        ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) AS sid
                    FROM flagged
                )
                SELECT MIN(ts) AS start, COUNT(*) AS n FROM sess GROUP BY sid
            """).collect()
        )
        assert native == islands, (offsets, native, islands)

    check()


def test_neardup_transitive_finds_two_hop_chain(spark):
    """The fixture's near-dup pairs are all mutual (exact-ish copies), so
    min_hops is 1 everywhere there; this pins the recursion actually
    TRAVERSES: A shares a half with B, B's other half with C, A and C
    share nothing — (A, C) must surface with min_hops = 2."""
    x = "alpha beta gamma delta epsilon zeta eta theta"
    y = "one two three four five six seven eight"
    docs = [(0, x), (1, x + " " + y), (2, y)]
    spark.createDataFrame(docs, "doc_id BIGINT, text STRING").createOrReplaceTempView(
        "documents"
    )
    catalog.invalidate(spark)
    try:
        from squirtle_spark.operators.dedup import _neardup_transitive

        out = {
            (r["doc_a"], r["doc_b"]): r["min_hops"]
            for r in spark.sql(_neardup_transitive(dl.SPARK)).collect()
        }
    finally:
        spark.catalog.dropTempView("documents")
        catalog.invalidate(spark)

    assert out[(0, 1)] == 1 and out[(1, 2)] == 1
    assert out[(0, 2)] == 2  # the chain A~B~C, invisible to direct Jaccard


def test_tumble_assignment_native_equals_floor(spark):
    """Property: dialect.tumble_start's floor arithmetic must bucket every
    timestamp exactly like native F.window() — including events landing on
    the exact window boundary (they open the NEXT window: [start, end))."""
    from hypothesis import given, settings, strategies as st

    from pyspark.sql import functions as F

    size = 10

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=120), min_size=1, max_size=25)
    )
    def check(offsets):
        rows = [
            (i, datetime(2024, 1, 1) + timedelta(seconds=o))
            for i, o in enumerate(offsets)
        ]
        df = spark.createDataFrame(rows, "event_id BIGINT, ts TIMESTAMP_NTZ")
        df.createOrReplaceTempView("tumble_prop")

        native = sorted(
            (r["start"], r["n"])
            for r in df.groupBy(F.window("ts", f"{size} seconds"))
            .agg(F.count("*").alias("n"))
            .select(F.col("window.start").alias("start"), "n")
            .collect()
        )
        floored = sorted(
            (r["start"], r["n"])
            for r in spark.sql(f"""
                SELECT {dl.tumble_start('ts', size, dl.SPARK)} AS start,
                       COUNT(*) AS n
                FROM tumble_prop GROUP BY 1
            """).collect()
        )
        assert native == floored, (offsets, native, floored)

    check()


def test_hopping_assignment_native_equals_bucket_fanout(spark):
    """Property: the hop-bucket fan-out (each event belongs to size/slide
    slide-aligned windows, derived by integer arithmetic from
    dialect.hop_bucket) must reproduce native F.window(size, slide)
    assignment exactly, boundaries included."""
    from hypothesis import given, settings, strategies as st

    from pyspark.sql import functions as F

    size, slide = 10, 5
    nwin = size // slide

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=120), min_size=1, max_size=25)
    )
    def check(offsets):
        rows = [
            (i, datetime(2024, 1, 1) + timedelta(seconds=o))
            for i, o in enumerate(offsets)
        ]
        df = spark.createDataFrame(rows, "event_id BIGINT, ts TIMESTAMP_NTZ")
        df.createOrReplaceTempView("hop_prop")

        native = sorted(
            (r["start"], r["n"])
            for r in df.groupBy(F.window("ts", f"{size} seconds", f"{slide} seconds"))
            .agg(F.count("*").alias("n"))
            .select(F.col("window.start").alias("start"), "n")
            .collect()
        )
        bucket = dl.hop_bucket("ts", slide, dl.SPARK)
        fanout = sorted(
            (r["start"], r["n"])
            for r in spark.sql(f"""
                SELECT CAST(timestamp_seconds(({bucket} - j) * {slide}) AS TIMESTAMP_NTZ) AS start,
                       COUNT(*) AS n
                FROM hop_prop
                LATERAL VIEW explode(sequence(0, {nwin - 1})) g AS j
                GROUP BY 1
            """).collect()
        )
        assert native == fanout, (offsets, native, fanout)

    check()


def test_asof_join_equals_bruteforce(spark):
    """Property: asof_join attaches the latest right value at-or-BEFORE
    each left timestamp — boundary equality (quote and probe at the same
    instant) must resolve to the simultaneous quote, per the documented
    <= semantics. Right timestamps are unique per key (the join is
    undefined under duplicate quotes, in DuckDB's native ASOF too)."""
    from hypothesis import given, settings, strategies as st
    from pyspark.sql import functions as F

    from squirtle_spark.operators.asof import asof_join

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=12),
        st.sets(st.integers(min_value=0, max_value=40), min_size=1, max_size=8),
    )
    def check(left_offs, right_offs):
        base = datetime(2024, 1, 1)
        left_rows = [
            (i, base + timedelta(seconds=o)) for i, o in enumerate(left_offs)
        ]
        right_rows = [
            (base + timedelta(seconds=o), float(o)) for o in sorted(right_offs)
        ]
        left = spark.createDataFrame(left_rows, "event_id BIGint, ts TIMESTAMP_NTZ")
        left = left.withColumn("user_id", F.lit(1))
        right = spark.createDataFrame(right_rows, "ts TIMESTAMP_NTZ, value DOUBLE")
        right = right.withColumn("user_id", F.lit(1))

        got = {
            r["event_id"]: r["asof_value"]
            for r in asof_join(
                left, right, key="user_id", left_ts="ts", right_ts="ts",
                value_cols=["value"],
            ).collect()
        }
        for i, o in enumerate(left_offs):
            eligible = [ro for ro in right_offs if ro <= o]
            want = float(max(eligible)) if eligible else None
            assert got[i] == want, (left_offs, sorted(right_offs), i, got[i], want)

    check()


def test_range_join_equals_bruteforce(spark):
    """Property: the interval-bucketed range join must return exactly the
    pairs with l.ts <= r.ts <= l.ts + W — inclusive on BOTH ends, and
    robust to sub-second timestamps (bucket math truncates to seconds;
    a fractional right row near the window edge must neither leak in nor
    fall out)."""
    from hypothesis import given, settings, strategies as st
    from pyspark.sql import functions as F

    from squirtle_spark.operators.rangejoin import range_join_window

    W = 10
    tenth = st.integers(min_value=0, max_value=400)  # tenths of a second

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(tenth, min_size=1, max_size=10),
        st.lists(tenth, min_size=1, max_size=10),
    )
    def check(left_t, right_t):
        base = datetime(2024, 1, 1)
        left = spark.createDataFrame(
            [(i, base + timedelta(milliseconds=100 * t)) for i, t in enumerate(left_t)],
            "l_id BIGINT, l_ts TIMESTAMP_NTZ",
        ).withColumn("k", F.lit(1))
        right = spark.createDataFrame(
            [(i, base + timedelta(milliseconds=100 * t)) for i, t in enumerate(right_t)],
            "r_id BIGINT, r_ts TIMESTAMP_NTZ",
        ).withColumn("k", F.lit(1))

        got = sorted(
            (r["l_id"], r["r_id"])
            for r in range_join_window(
                left, right, key="k", left_ts="l_ts", right_ts="r_ts", window_s=W
            ).collect()
        )
        want = sorted(
            (i, j)
            for i, lt in enumerate(left_t)
            for j, rt in enumerate(right_t)
            if lt <= rt <= lt + 10 * W
        )
        assert got == want, (left_t, right_t, got, want)

    check()


def test_time_weighted_avg_planted_holds(spark):
    """Constructed series with known integrals: user 1 holds 10.0 for 30s
    then 20.0 until day end; user 2 samples once mid-day. The TWA must be
    the time-held integral, not the sample mean — the operator's reason
    to exist (sample mean of user 1 would be 15.0)."""
    from datetime import datetime, timedelta

    from squirtle_spark.operators import timeseries

    base = datetime(2024, 1, 1)  # day_idx boundary (epoch % 86400 == 0)
    day_end = base + timedelta(days=1)
    rows = [
        # user 1: value 10 at +100s, value 20 at +130s (held to day end)
        (0, base + timedelta(seconds=100), 7, "e", 10.0),
        (1, base + timedelta(seconds=130), 7, "e", 20.0),
        # user 2: a single sample at noon, held 12h
        (2, base + timedelta(hours=12), 8, "e", 4.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    )
    df.createOrReplaceTempView("events")
    catalog.invalidate(spark)
    try:
        out = {
            r["user_id"]: r
            for r in spark.sql(timeseries._time_weighted_avg(dl.SPARK)).collect()
        }
    finally:
        spark.catalog.dropTempView("events")
        catalog.invalidate(spark)

    u1 = out[7]
    held = int((day_end - (base + timedelta(seconds=100))).total_seconds())
    assert u1["held_seconds"] == held
    expected = (10.0 * 30 + 20.0 * (held - 30)) / held
    assert abs(u1["twa"] - expected) < 1e-9
    assert u1["twa"] != 15.0  # NOT the sample mean

    u2 = out[8]
    assert u2["n_samples"] == 1
    assert u2["held_seconds"] == 12 * 3600
    assert abs(u2["twa"] - 4.0) < 1e-12


def test_stagger_variants_differ_on_reanchor(spark):
    """The two stagger forms must agree while events stay on the first
    window and diverge exactly at re-anchoring: events at offsets
    {0, 0.5S, 1.2S, 1.4S}. Keyed-offset keeps the t0 grid (second
    window STARTS at t0+S even though nothing arrived then); strict
    re-anchoring opens the second window at 1.2S, the first event after
    the close — the Kinesis stagger semantic. Both must partition the
    events."""
    from datetime import datetime, timedelta

    from squirtle_spark.queries import windows as W

    S = W.STAGGER_S
    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(seconds=off), 7, "e", 1.0)
        for i, off in enumerate([0, S // 2, S + S // 5, S + 2 * S // 5])
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    )
    df.createOrReplaceTempView("events")
    catalog.invalidate(spark)
    try:
        grid = {
            (r["win_start_s"], r["cnt"])
            for r in spark.sql(W._win_stagger(dl.SPARK)).collect()
        }
        rean = {
            (r["win_start_s"], r["cnt"])
            for r in W._stagger_reanchored_spark(spark, None).collect()
        }
    finally:
        spark.catalog.dropTempView("events")
        catalog.invalidate(spark)

    t0 = int(base.timestamp())
    assert grid == {(t0, 2), (t0 + S, 2)}
    assert rean == {(t0, 2), (t0 + S + S // 5, 2)}


def test_time_weighted_avg_continuous_credits_midnight_span(spark):
    """The two TWA variants differ EXACTLY at a bucket boundary: a level
    of 10.0 set at 23:00 and held until the next sample (20.0 at 01:00
    next day). Bucket-local credits day 1 only from its own first
    sample (23h of 20.0, held_seconds 82,800); the continuous rollup
    credits day 1 the full 24h — one midnight-crossing hour of 10.0
    plus 23h of 20.0 — and both agree on day 0 (10.0 for its last
    hour). Exact integrals, so the expected values are closed-form."""
    from datetime import datetime, timedelta

    from squirtle_spark.operators import timeseries

    base = datetime(2024, 1, 1)
    rows = [
        (0, base + timedelta(hours=23), 7, "e", 10.0),
        (1, base + timedelta(hours=25), 7, "e", 20.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    )
    df.createOrReplaceTempView("events")
    catalog.invalidate(spark)
    try:
        local = {
            r["day_idx"]: r
            for r in spark.sql(timeseries._time_weighted_avg(dl.SPARK)).collect()
        }
        cont = {
            r["day_idx"]: r
            for r in spark.sql(
                timeseries._time_weighted_avg_continuous(dl.SPARK)
            ).collect()
        }
    finally:
        spark.catalog.dropTempView("events")
        catalog.invalidate(spark)

    day0 = int(base.timestamp()) // 86400

    # day 0: identical in both variants — 10.0 held for its last hour
    for out in (local, cont):
        assert out[day0]["held_seconds"] == 3600
        assert abs(out[day0]["twa"] - 10.0) < 1e-12

    # day 1 bucket-local: starts at its own first sample (01:00)
    assert local[day0 + 1]["held_seconds"] == 23 * 3600
    assert abs(local[day0 + 1]["twa"] - 20.0) < 1e-12

    # day 1 continuous: full coverage — 1h of 10.0 carried across
    # midnight + 23h of 20.0
    assert cont[day0 + 1]["held_seconds"] == 86400
    expected = (10.0 * 3600 + 20.0 * 23 * 3600) / 86400
    assert abs(cont[day0 + 1]["twa"] - expected) < 1e-12


def test_counter_delta_sum_handles_resets(spark):
    """Constructed counter with one restart: 100 -> 150 -> 10 -> 40.
    True increase = 50 (+150-100) + 10 (restart: counts from 0) + 30 =
    90; a naive last-minus-first would report -60."""
    from datetime import datetime, timedelta

    from squirtle_spark.operators import timeseries

    base = datetime(2024, 1, 1)
    vals = [100.0, 150.0, 10.0, 40.0]
    rows = [
        (i, base + timedelta(seconds=10 * (i + 1)), 7, "e", v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    )
    df.createOrReplaceTempView("events")
    catalog.invalidate(spark)
    try:
        out = spark.sql(timeseries._counter_delta_sum(dl.SPARK)).collect()
    finally:
        spark.catalog.dropTempView("events")
        catalog.invalidate(spark)

    assert len(out) == 1
    r = out[0]
    assert r["n_samples"] == 4 and r["n_deltas"] == 3
    assert r["n_resets"] == 1
    assert abs(r["counter_increase"] - 90.0) < 1e-12


def test_counter_delta_sum_continuous_keeps_midnight_delta(spark):
    """The two counter variants differ EXACTLY at a bucket boundary: a
    counter stepping 100 -> 160 across midnight. Bucket-local drops the
    +60 (day 2's first sample has no in-day prior); the continuous
    variant keeps it, attributed to the EARLIER sample's day. A reset
    across the boundary must likewise count as a restart on the earlier
    day, not vanish."""
    from datetime import datetime, timedelta

    from squirtle_spark.operators import timeseries

    base = datetime(2024, 1, 1)
    rows = [
        # user 7: +50 within day 0, then +60 ACROSS midnight
        (0, base + timedelta(hours=23), 7, "e", 100.0),
        (1, base + timedelta(hours=23, minutes=30), 7, "e", 150.0),
        (2, base + timedelta(hours=24, minutes=30), 7, "e", 210.0),
        # user 8: restart ACROSS midnight (200 -> 5)
        (3, base + timedelta(hours=23), 8, "e", 200.0),
        (4, base + timedelta(hours=25), 8, "e", 5.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    )
    df.createOrReplaceTempView("events")
    catalog.invalidate(spark)
    try:
        local = spark.sql(timeseries._counter_delta_sum(dl.SPARK)).collect()
        cont = spark.sql(
            timeseries._counter_delta_sum_continuous(dl.SPARK)
        ).collect()
    finally:
        spark.catalog.dropTempView("events")
        catalog.invalidate(spark)

    day0 = int((base + timedelta(hours=23)).timestamp()) // 86400

    # bucket-local: user 7 day 0 sees only the +50; the midnight +60 and
    # user 8's cross-boundary reset are invisible (one-delta days drop out
    # entirely for user 8 and day 1 of user 7 — prev IS NULL rows)
    loc = {(r["user_id"], r["day_idx"]): r for r in local}
    assert abs(loc[(7, day0)]["counter_increase"] - 50.0) < 1e-12
    assert loc[(7, day0 + 1)]["counter_increase"] == 0.0
    assert loc[(8, day0)]["counter_increase"] == 0.0
    assert sum(r["n_resets"] for r in local) == 0

    # continuous: the +60 lands on day 0 (earlier sample's day) and the
    # user-8 restart is a counted reset contributing the post-reset value
    con = {(r["user_id"], r["day_idx"]): r for r in cont}
    assert abs(con[(7, day0)]["counter_increase"] - 110.0) < 1e-12
    assert (7, day0 + 1) not in con  # no post-midnight start sample pair
    assert con[(8, day0)]["n_resets"] == 1
    assert abs(con[(8, day0)]["counter_increase"] - 5.0) < 1e-12


def test_count_window_disagrees_with_time_window_both_ways(spark, monkeypatch):
    """Planted proof that win_rows_tumble is a genuinely different window
    form (VERDICT r9 item 4): events for one key at offsets
    {0, 2S, 2S+1s} with N=2. The count window groups the FIRST TWO
    events together even though 2S of wall time separates them (cnt
    2 + 1), while the keyed time grid (win_stagger, same anchor) puts
    event 1 alone in window 0 and the later pair together (1 + 2) —
    each form splits a group the other keeps whole."""
    from datetime import datetime, timedelta

    from squirtle_spark.queries import windows as W

    monkeypatch.setattr(W, "ROWS_PER_WINDOW", 2)
    S = W.STAGGER_S
    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(seconds=off), 7, "e", 1.0)
        for i, off in enumerate([0, 2 * S, 2 * S + 1])
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
        "event_type STRING, value DOUBLE",
    )
    df.createOrReplaceTempView("events")
    catalog.invalidate(spark)
    try:
        cnt_win = {
            (r["win_id"], r["cnt"], r["open_s"], r["close_s"])
            for r in spark.sql(W._win_rows_tumble(dl.SPARK)).collect()
        }
        grid = {
            (r["win_start_s"], r["cnt"])
            for r in spark.sql(W._win_stagger(dl.SPARK)).collect()
        }
    finally:
        spark.catalog.dropTempView("events")
        catalog.invalidate(spark)

    t0 = int(base.timestamp())
    # count form: [e0, e1] spanning 2S of wall time, then [e2]
    assert cnt_win == {(0, 2, t0, t0 + 2 * S), (1, 1, t0 + 2 * S + 1, t0 + 2 * S + 1)}
    # time form: e0 alone on the grid, [e1, e2] together two grid steps on
    assert grid == {(t0, 1), (t0 + 2 * S, 2)}
