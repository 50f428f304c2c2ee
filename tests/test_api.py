"""The user-facing Query/CLI surface (flock query.rs + flock-cli parity):
OLAP queries run over the catalog, streaming queries fire the user's SQL
once per window over exactly that window's rows, and the CLI resolves,
runs and oracle-checks registry queries."""

from pyspark.sql import functions as F

import pytest

from squirtle_spark import api, cli, sources, streaming
from squirtle_spark.api import Query, Window, run_olap, run_streaming


def _write_bids(spark, tmp_path, eps=200, secs=8):
    bids = sources.nexmark_bids(spark, eps, secs).withColumn(
        "epoch", F.unix_timestamp(F.col("b_date_time").cast("timestamp")) % 100000
    )
    data_dir = str(tmp_path / "bids")
    streaming.write_epoch_files(bids, data_dir)
    batch = bids.drop("epoch").withColumn(
        "b_date_time", F.col("b_date_time").cast("timestamp")
    )
    return data_dir, batch


def test_olap_query_matches_direct_sql(spark, sf_dir):
    q = Query(sql="SELECT auction, price FROM bid WHERE MOD(auction, 123) = 0")
    got = run_olap(spark, q, sf_dir).collect()
    want = spark.sql(
        "SELECT auction, price FROM bid WHERE MOD(auction, 123) = 0"
    ).collect()
    assert len(got) > 0
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_streaming_tumbling_fires_sql_per_window(spark, tmp_path):
    """Arbitrary SQL (an agg the native runners don't special-case) fired
    per tumbling window must equal the batch per-window computation."""
    data_dir, batch = _write_bids(spark, tmp_path)
    q = Query(
        sql="SELECT bidder, MAX(price) AS maxp, COUNT(*) AS n FROM bid GROUP BY bidder",
        window=Window.tumbling(2),
    )
    got = run_streaming(
        spark, q, data_dir, workdir=str(tmp_path / "wd-tumble")
    ).collect()

    expected = (
        batch.groupBy(F.window("b_date_time", "2 seconds"), "bidder")
        .agg(F.max("price").alias("maxp"), F.count("*").alias("n"))
        .select("bidder", "maxp", "n", F.col("window.start").alias("win_start"))
        .collect()
    )
    assert len(got) > 0
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_streaming_hopping_q5_sql_per_window(spark, tmp_path):
    """The DECLARED q5 SQL (hot items: count per auction, join on the max —
    benchmarks/src/nexmark/query/q5.sql) through the generic per-window
    runner over Hopping(4, 2), checked against batch hop windows."""
    data_dir, batch = _write_bids(spark, tmp_path)
    q5_sql = """
        WITH counts AS (
            SELECT auction, COUNT(*) AS num FROM bid GROUP BY auction
        )
        SELECT auction, num FROM counts
        WHERE num = (SELECT MAX(num) FROM counts)
    """
    q = Query(sql=q5_sql, window=Window.hopping(4, 2))
    got = run_streaming(spark, q, data_dir, workdir=str(tmp_path / "wd-hop")).collect()

    counts = batch.groupBy(
        F.window("b_date_time", "4 seconds", "2 seconds"), "auction"
    ).agg(F.count("*").alias("num"))
    maxes = counts.groupBy("window").agg(F.max("num").alias("maxn"))
    expected = (
        counts.join(maxes, "window")
        .where(F.col("num") >= F.col("maxn"))
        .select("auction", "num", F.col("window.start").alias("win_start"))
        .collect()
    )
    assert len(got) > 0
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_streaming_elementwise_fires_per_microbatch(spark, tmp_path):
    """ElementWise: the SQL runs independently per micro-batch; the union
    over all firings must cover exactly the filtered batch rows."""
    data_dir, batch = _write_bids(spark, tmp_path, eps=100, secs=4)
    q = Query(
        sql="SELECT auction, bidder, price FROM bid WHERE price > 500",
        window=Window.elementwise(),
    )
    got = run_streaming(
        spark, q, data_dir, workdir=str(tmp_path / "wd-ew"), files_per_trigger=2
    )
    got_rows = [(r["auction"], r["bidder"], r["price"]) for r in got.collect()]
    expected = [
        (r["auction"], r["bidder"], r["price"])
        for r in batch.where("price > 500").select("auction", "bidder", "price").collect()
    ]
    assert len(got_rows) > 0
    assert sorted(got_rows) == sorted(expected)


def test_streaming_q8_two_streams_per_window(spark, tmp_path):
    """The DECLARED q8 (new users: person ⋈ auction, deduped — flock
    queries/q8.rs:33-44) through the multi-stream per-window runner over
    Tumbling(4): both streams window-assigned on their own event time,
    the SQL fired per window over both slices; equals the batch
    same-window join."""
    persons = sources.nexmark_persons(spark, 200, 12).withColumn(
        "epoch", F.unix_timestamp(F.col("p_date_time").cast("timestamp")) % 100000
    )
    auctions = sources.nexmark_auctions(spark, 200, 12).withColumn(
        "epoch", F.unix_timestamp(F.col("a_date_time").cast("timestamp")) % 100000
    )
    p_dir, a_dir = str(tmp_path / "p"), str(tmp_path / "a")
    streaming.write_epoch_files(persons, p_dir)
    streaming.write_epoch_files(auctions, a_dir)

    q8_sql = """
        SELECT p_id, name
        FROM person JOIN auction ON p_id = seller
        GROUP BY p_id, name
    """
    q = Query(sql=q8_sql, window=Window.tumbling(4))
    got = run_streaming(
        spark,
        q,
        {"person": (p_dir, "p_date_time"), "auction": (a_dir, "a_date_time")},
        workdir=str(tmp_path / "wd-q8"),
    ).collect()

    bp = persons.drop("epoch").withColumn(
        "p_date_time", F.col("p_date_time").cast("timestamp")
    ).withColumn("w", F.window("p_date_time", "4 seconds"))
    ba = auctions.drop("epoch").withColumn(
        "a_date_time", F.col("a_date_time").cast("timestamp")
    ).withColumn("w", F.window("a_date_time", "4 seconds"))
    expected = (
        bp.join(ba, (bp["p_id"] == ba["seller"]) & (bp["w"] == ba["w"]))
        .select("p_id", "name", bp["w"].getField("start").alias("win_start"))
        .distinct()
        .collect()
    )
    assert len(got) > 0
    assert sorted(map(tuple, got)) == sorted(
        (r["p_id"], r["name"], r["win_start"]) for r in expected
    )


def test_empty_elementwise_replay_does_not_clobber_catalog(spark, sf_dir, tmp_path):
    """A checkpoint-restart with no new data fires ZERO micro-batches; the
    elementwise fallback then derives its output schema by planning the
    SQL over an EMPTY temp view named after the stream table. That view
    must not survive into the session, or the next OLAP query would
    silently resolve `bid` to an empty table."""
    count_sql = Query(sql="SELECT COUNT(*) AS n FROM bid")
    before = sorted(map(tuple, run_olap(spark, count_sql, sf_dir).collect()))
    assert before[0][0] > 0

    data_dir, _ = _write_bids(spark, tmp_path, eps=50, secs=3)
    q = Query(
        sql="SELECT auction, price FROM bid", window=Window.elementwise()
    )
    first = run_streaming(
        spark, q, data_dir, workdir=str(tmp_path / "wd-empty")
    )
    assert first.count() > 0

    # same workdir → checkpoint resumes, no new files → zero batches
    rerun = run_streaming(
        spark, q, data_dir, workdir=str(tmp_path / "wd-empty")
    )
    assert rerun.count() == 0  # typed empty result, correct schema
    assert [f.name for f in rerun.schema.fields] == ["auction", "price", "win_start"]

    after = sorted(map(tuple, run_olap(spark, count_sql, sf_dir).collect()))
    assert after == before


def test_streaming_run_does_not_clobber_catalog(spark, sf_dir, tmp_path):
    """run_streaming binds window slices under the stream table name; the
    catalog's derived view must come back for the next OLAP query."""
    q2 = "SELECT auction, price FROM bid WHERE MOD(auction, 123) = 0"
    before = sorted(map(tuple, run_olap(spark, Query(sql=q2), sf_dir).collect()))

    data_dir, _ = _write_bids(spark, tmp_path, eps=100, secs=4)
    run_streaming(
        spark,
        Query(sql="SELECT COUNT(*) AS n FROM bid", window=Window.tumbling(2)),
        data_dir,
        workdir=str(tmp_path / "wd-clobber"),
    )

    after = sorted(map(tuple, run_olap(spark, Query(sql=q2), sf_dir).collect()))
    assert after == before


def test_cli_list_and_run(spark, sf_dir, capsys):
    assert cli.main(["list"]) == 0
    out = capsys.readouterr().out
    assert "nexmark_q5" in out and "dedup_minhash_lsh" in out

    assert cli.main(["run", "-q", "events_filter", "--sf-dir", sf_dir], spark=spark) == 0
    assert "event_id" in capsys.readouterr().out

    assert cli.main(["nexmark", "-q", "2", "--sf-dir", sf_dir], spark=spark) == 0
    capsys.readouterr()
    assert cli.main(["run", "-q", "nope"], spark=spark) == 2
    capsys.readouterr()

    # the fsql surface: arbitrary SQL over fixture tables AND derived views
    assert (
        cli.main(
            ["sql", "SELECT COUNT(*) AS n_auctions FROM auction", "--sf-dir", sf_dir],
            spark=spark,
        )
        == 0
    )
    assert "n_auctions" in capsys.readouterr().out


def test_cli_oracle_gate(spark, sf_dir, capsys):
    rc = cli.main(
        ["run", "-q", "agg_event_stats", "--sf-dir", sf_dir, "--oracle"], spark=spark
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "OK" in out


def test_cli_table_lifecycle(spark, tmp_path, capsys):
    """The table subcommand drives the versioned lifecycle end-to-end:
    versions -> rollback -> vacuum -> compact, against a real table."""
    from squirtle_spark.operators import maintenance

    path = str(tmp_path / "t")
    for n in (10, 20, 30):
        maintenance.versioned_write(spark, spark.range(n), path)

    assert cli.main(["table", "versions", "--path", path], spark=spark) == 0
    assert "committed version: 3" in capsys.readouterr().out

    assert (
        cli.main(["table", "rollback", "--path", path, "-v", "2"], spark=spark) == 0
    )
    capsys.readouterr()
    assert maintenance.read_version(spark, path).count() == 20
    # missing -v is a usage error, not a crash
    assert cli.main(["table", "rollback", "--path", path], spark=spark) == 2
    capsys.readouterr()

    assert (
        cli.main(["table", "vacuum", "--path", path, "--keep", "1"], spark=spark)
        == 0
    )
    assert "removed versions: [1]" in capsys.readouterr().out

    src = str(tmp_path / "frag")
    spark.range(1000).repartition(16).write.parquet(src)
    dst = str(tmp_path / "packed")
    assert (
        cli.main(
            ["table", "compact", "--path", src, "--dst", dst, "--target-mb", "64"],
            spark=spark,
        )
        == 0
    )
    assert "compacted to" in capsys.readouterr().out
    assert spark.read.parquet(dst).count() == 1000


def test_cli_repl(spark, sf_dir, capsys):
    """The fsql-parity shell: multi-line SQL, dot-commands, error recovery."""
    lines = [
        "SELECT COUNT(*) AS n\n",
        "FROM events;\n",
        ".explain\n",
        "SELECT 1 AS one;\n",
        ".explain\n",
        "SELECT definitely_broken FROM nowhere;\n",
        ".list events_filter\n",
        ".run events_filter\n",
        ".quit\n",
    ]
    rc = cli.main(["repl", "--sf-dir", sf_dir], spark=spark, stdin=lines)
    out = capsys.readouterr().out
    assert rc == 0
    assert "error:" in out  # bad statement reported, loop survived
    assert "one" in out
    assert "events_filter" in out
    assert "== Physical Plan ==" in out  # .explain toggled a formatted plan


def test_cli_repl_eof_exits(spark, sf_dir):
    assert cli.main(["repl", "--sf-dir", sf_dir], spark=spark, stdin=[]) == 0


def test_streaming_restart_fires_only_new_windows(spark, tmp_path):
    """Re-running the SAME query over the same consumed workdir must fire
    nothing (elementwise's documented rerun contract now shared by the
    windowed paths — previously every historical window re-fired), and a
    DIFFERENT query sharing the workdir gets its own state, not the
    first query's consumed checkpoint and buffered windows."""
    data_dir, _ = _write_bids(spark, tmp_path)
    wd = str(tmp_path / "wd-restart")
    q = Query(
        sql="SELECT COUNT(*) AS n FROM bid",
        window=Window.tumbling(2),
    )
    first = run_streaming(spark, q, data_dir, workdir=wd).collect()
    assert len(first) > 0
    rerun = run_streaming(spark, q, data_dir, workdir=wd).collect()
    assert rerun == []  # no new data -> no windows fired

    q4 = Query(sql="SELECT COUNT(*) AS n FROM bid", window=Window.tumbling(4))
    other = run_streaming(spark, q4, data_dir, workdir=wd).collect()
    assert len(other) > 0  # different spec -> own state, fires fully
    assert {r["win_start"] for r in other} != {r["win_start"] for r in first}


def test_streaming_null_literal_column_survives_sink(spark, tmp_path):
    """SELECT NULL AS col must survive the parquet result sink (NullType
    is cast to string) in both the windowed and elementwise paths."""
    data_dir, _ = _write_bids(spark, tmp_path)
    q = Query(
        sql="SELECT bidder, NULL AS flag FROM bid",
        window=Window.tumbling(2),
    )
    rows = run_streaming(
        spark, q, data_dir, workdir=str(tmp_path / "wd-null")
    ).collect()
    assert len(rows) > 0 and all(r["flag"] is None for r in rows)

    q2 = Query(sql="SELECT NULL AS flag FROM bid", window=Window.elementwise())
    rows2 = run_streaming(
        spark, q2, data_dir, workdir=str(tmp_path / "wd-null-ew")
    ).collect()
    assert len(rows2) > 0 and all(r["flag"] is None for r in rows2)


def test_run_olap_rejects_windowed_query(spark, sf_dir):
    q = Query(sql="SELECT 1", window=Window.tumbling(2))
    with pytest.raises(ValueError, match="Window"):
        run_olap(spark, q, sf_dir)


def test_sink_result_dispatch(spark, sf_dir, tmp_path):
    """The flock sink surface: memory returns rows, noop returns None,
    parquet lands files under the workdir."""
    from squirtle_spark.api import sink_result

    df = spark.range(5).selectExpr("id AS v")
    assert len(sink_result(df, Query(sql="", sink="memory"), workdir=str(tmp_path))) == 5
    assert sink_result(df, Query(sql="", sink="noop"), workdir=str(tmp_path)) is None
    out = sink_result(df, Query(sql="", sink="parquet"), workdir=str(tmp_path))
    assert spark.read.parquet(str(tmp_path / "out")).count() == 5 or out is not None


def test_streaming_rows_window_fires_per_n_events(spark, tmp_path):
    """Window.rows(n) (flock's declared-only Schedule::Rows as a Query
    API kind): the SQL fires once per n consecutive replay events —
    every fired window carries exactly n rows, window ids are dense from
    0, the trailing partial stays open, and a rerun over consumed data
    fires nothing while NEW epochs fire only the newly closed windows."""
    data_dir, batch = _write_bids(spark, tmp_path, eps=50, secs=4)
    total = batch.count()
    n = 60
    wd = str(tmp_path / "wd-rows")
    q = Query(sql="SELECT COUNT(*) AS cnt FROM bid", window=Window.rows(n))
    first = run_streaming(spark, q, data_dir, workdir=wd).collect()
    assert {r["cnt"] for r in first} == {n}  # every window exactly n rows
    assert sorted(r["win_start"] for r in first) == list(range(total // n))

    rerun = run_streaming(spark, q, data_dir, workdir=wd).collect()
    assert rerun == []  # consumed replay -> nothing newly closed

    # append later epochs: only the windows the new rows close may fire
    extra = sources.nexmark_bids(spark, 50, 8).withColumn(
        "epoch",
        F.unix_timestamp(F.col("b_date_time").cast("timestamp")) % 100000
        + 100000,  # strictly after every already-buffered epoch
    )
    n_extra = extra.count()
    # append-mode write: write_epoch_files overwrites the whole dir
    extra.repartition(F.col("epoch")).write.mode("append").partitionBy(
        "epoch"
    ).parquet(data_dir)
    more = run_streaming(spark, q, data_dir, workdir=wd).collect()
    grand_total = total + n_extra
    assert {r["cnt"] for r in more} == {n}
    assert sorted(r["win_start"] for r in more) == list(
        range(total // n, grand_total // n)
    )


def test_windowed_rerun_recovers_unfired_windows(spark, tmp_path, monkeypatch):
    """A failure between buffer-commit and firing must not lose windows
    (ADVICE r10): the replay checkpoint has already consumed the epoch
    files, but the fired-window LEDGER hasn't recorded the windows, so a
    plain rerun emits them — previously the pre-run buffer count marked
    them as fired history and they were silently unrecoverable."""
    data_dir, _ = _write_bids(spark, tmp_path)
    wd = str(tmp_path / "wd-recover")
    q = Query(sql="SELECT COUNT(*) AS n FROM bid", window=Window.tumbling(2))
    # patch the CONCRETE DataFrame class (pyspark 4 splits the abstract
    # base from the classic implementation; patching the base is a no-op)
    DF = type(spark.range(1))
    orig = DF.createOrReplaceTempView

    def boom(self, name):
        if name == "bid":  # the firing loop's per-window view bind
            raise RuntimeError("injected fire-phase failure")
        return orig(self, name)

    monkeypatch.setattr(DF, "createOrReplaceTempView", boom)
    with pytest.raises(RuntimeError, match="injected"):
        run_streaming(spark, q, data_dir, workdir=wd)
    monkeypatch.undo()

    recovered = run_streaming(spark, q, data_dir, workdir=wd).collect()
    fresh = run_streaming(
        spark, q, data_dir, workdir=str(tmp_path / "wd-recover-fresh")
    ).collect()
    # the rerun fired every buffered-but-unfired window, over its FULL
    # window contents — identical to a clean end-to-end run
    assert sorted((r["win_start"], r["n"]) for r in recovered) == sorted(
        (r["win_start"], r["n"]) for r in fresh
    ) and len(recovered) > 0
    # and the ledger is now complete: a further rerun fires nothing
    assert run_streaming(spark, q, data_dir, workdir=wd).collect() == []


def test_rows_rerun_recovers_unfired_windows(spark, tmp_path, monkeypatch):
    """Rows-path twin of the recovery contract: a lost localCheckpoint
    block (or any fire-phase error) fails the invocation AFTER the
    buffer sink committed; the rerun must re-derive the un-emitted
    windows from the fired ledger, not from the buffer row count."""
    data_dir, batch = _write_bids(spark, tmp_path, eps=50, secs=4)
    total = batch.count()
    n = 60
    wd = str(tmp_path / "wd-rows-recover")
    q = Query(sql="SELECT COUNT(*) AS cnt FROM bid", window=Window.rows(n))

    def boom(self, eager=True):
        raise RuntimeError("injected localCheckpoint loss")

    monkeypatch.setattr(type(spark.range(1)), "localCheckpoint", boom)
    with pytest.raises(RuntimeError, match="injected"):
        run_streaming(spark, q, data_dir, workdir=wd)
    monkeypatch.undo()

    recovered = run_streaming(spark, q, data_dir, workdir=wd).collect()
    assert {r["cnt"] for r in recovered} == {n}
    assert sorted(r["win_start"] for r in recovered) == list(range(total // n))
    assert run_streaming(spark, q, data_dir, workdir=wd).collect() == []


def test_windowed_rerun_adopts_windows_fired_by_dead_invocation(
    spark, tmp_path, monkeypatch
):
    """A crash AFTER some windows fired (review r11): those windows are
    in the ledger (so the rerun won't re-fire them) and in the dead
    invocation's results dir (which its caller never received) — the
    rerun must ADOPT them, returning the full window set a clean run
    would."""
    data_dir, _ = _write_bids(spark, tmp_path)
    wd = str(tmp_path / "wd-adopt")
    q = Query(sql="SELECT COUNT(*) AS n FROM bid", window=Window.tumbling(2))
    DF = type(spark.range(1))
    orig = DF.createOrReplaceTempView
    binds = {"n": 0}

    def boom(self, name):
        if name == "bid":
            binds["n"] += 1
            if binds["n"] == 2:  # window 1 fired; die binding window 2
                raise RuntimeError("injected mid-fire-loop failure")
        return orig(self, name)

    monkeypatch.setattr(DF, "createOrReplaceTempView", boom)
    with pytest.raises(RuntimeError, match="injected"):
        run_streaming(spark, q, data_dir, workdir=wd)
    monkeypatch.undo()

    recovered = run_streaming(spark, q, data_dir, workdir=wd).collect()
    fresh = run_streaming(
        spark, q, data_dir, workdir=str(tmp_path / "wd-adopt-fresh")
    ).collect()
    # first window adopted from the dead invocation's dir, the rest
    # re-derived — together exactly a clean end-to-end run
    assert sorted((r["win_start"], r["n"]) for r in recovered) == sorted(
        (r["win_start"], r["n"]) for r in fresh
    ) and len(recovered) > 1
    # adoption is once: a further rerun returns nothing
    assert run_streaming(spark, q, data_dir, workdir=wd).collect() == []


def test_rows_rerun_adopts_windows_fired_by_dead_invocation(
    spark, tmp_path, monkeypatch
):
    """Rows-path twin of the adoption contract: crash after the first
    count-window fired — the rerun must return the adopted window plus
    everything it fires itself, i.e. the clean-run set."""
    data_dir, batch = _write_bids(spark, tmp_path, eps=50, secs=4)
    total = batch.count()
    n = 60
    wd = str(tmp_path / "wd-rows-adopt")
    q = Query(sql="SELECT COUNT(*) AS cnt FROM bid", window=Window.rows(n))
    DF = type(spark.range(1))
    orig = DF.createOrReplaceTempView
    binds = {"n": 0}

    def boom(self, name):
        if name == "bid":
            binds["n"] += 1
            if binds["n"] == 2:
                raise RuntimeError("injected mid-fire-loop failure")
        return orig(self, name)

    monkeypatch.setattr(DF, "createOrReplaceTempView", boom)
    with pytest.raises(RuntimeError, match="injected"):
        run_streaming(spark, q, data_dir, workdir=wd)
    monkeypatch.undo()

    recovered = run_streaming(spark, q, data_dir, workdir=wd).collect()
    assert {r["cnt"] for r in recovered} == {n}
    assert sorted(r["win_start"] for r in recovered) == list(range(total // n))
    assert run_streaming(spark, q, data_dir, workdir=wd).collect() == []


def test_elementwise_rerun_adopts_epochs_fired_by_dead_invocation(
    spark, tmp_path, monkeypatch
):
    """Elementwise twin: the replay checkpoint commits after each
    foreachBatch, so epochs fired before a mid-stream crash live only in
    the dead invocation's results dir — the rerun must adopt them and
    fire the remainder, matching a clean run."""
    data_dir, _ = _write_bids(spark, tmp_path)
    wd = str(tmp_path / "wd-ew-adopt")
    q = Query(
        sql="SELECT COUNT(*) AS n FROM bid", window=Window.elementwise()
    )
    calls = {"n": 0}
    # crash inside the SECOND micro-batch's fire, after its predecessor
    # committed: patch the parquet append via DataFrameWriter.parquet
    from pyspark.sql.readwriter import DataFrameWriter

    orig_pq = DataFrameWriter.parquet

    def boom(self, path, **kw):
        if "results-" in path:
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("injected mid-stream failure")
        return orig_pq(self, path, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", boom)
    with pytest.raises(Exception, match="injected"):
        run_streaming(spark, q, data_dir, workdir=wd, files_per_trigger=1)
    monkeypatch.undo()

    recovered = run_streaming(
        spark, q, data_dir, workdir=wd, files_per_trigger=1
    ).collect()
    fresh = run_streaming(
        spark,
        q,
        data_dir,
        workdir=str(tmp_path / "wd-ew-adopt-fresh"),
        files_per_trigger=1,
    ).collect()
    # Adoption keys elementwise windows by foreachBatch epoch_id. The
    # rerun resumes from the SHARED checkpoint, so its batch ids
    # CONTINUE the dead predecessor's numbering rather than restarting
    # at 0 — that is what makes the keys collision-free (a renumbered
    # rerun's epoch 0 would collide with the orphaned epoch-0 window
    # and own-firings-win would silently drop the orphan; ADVICE r11
    # corrected this comment, which used to claim renumbering). Epoch
    # ids still differ from the FRESH run's (different batch carve-up
    # after the mid-stream crash), so values compare content-wise.
    assert sorted(r["n"] for r in recovered) == sorted(r["n"] for r in fresh)
    assert len(recovered) > 1
    # collision-freedom made observable: the adopted (orphan) and
    # re-fired portions occupy disjoint epoch keys, so no win_start
    # repeats in the recovered union
    rec_wins = [r["win_start"] for r in recovered]
    assert len(rec_wins) == len(set(rec_wins))
    assert run_streaming(
        spark, q, data_dir, workdir=wd, files_per_trigger=1
    ).collect() == []


def test_adoption_twice_fired_window_keeps_newest_firing(
    spark, tmp_path, monkeypatch
):
    """Two crashed predecessors can both hold the SAME window: A fires
    it over k rows and dies; more rows arrive for that window; B
    re-fires it over k+m and also dies. The successful rerun must
    return that window exactly once, from B's firing (the one the
    ledger count describes) — not twice, and not A's stale rows."""
    data_dir, batch = _write_bids(spark, tmp_path)
    wd = str(tmp_path / "wd-twice")
    q = Query(sql="SELECT COUNT(*) AS n FROM bid", window=Window.tumbling(2))
    DF = type(spark.range(1))
    orig = DF.createOrReplaceTempView

    def crash_on_second_bind():
        binds = {"n": 0}

        def boom(self, name):
            if name == "bid":
                binds["n"] += 1
                if binds["n"] == 2:
                    raise RuntimeError("injected")
            return orig(self, name)

        return boom

    # invocation A: fires the first window, dies on the second
    monkeypatch.setattr(DF, "createOrReplaceTempView", crash_on_second_bind())
    with pytest.raises(RuntimeError, match="injected"):
        run_streaming(spark, q, data_dir, workdir=wd)
    monkeypatch.undo()

    # more rows arrive INSIDE the already-fired first window's span (new
    # epoch partitions so the replay consumes them), growing its count
    first_ts = batch.agg(F.min("b_date_time")).first()[0]
    extra = (
        batch.limit(40)
        .withColumn("b_date_time", F.lit(first_ts))
        .withColumn("epoch", F.lit(900000))
    )
    extra.write.mode("append").partitionBy("epoch").parquet(data_dir)

    # invocation B: re-fires the grown first window, dies on the next
    monkeypatch.setattr(DF, "createOrReplaceTempView", crash_on_second_bind())
    with pytest.raises(RuntimeError, match="injected"):
        run_streaming(spark, q, data_dir, workdir=wd)
    monkeypatch.undo()

    recovered = run_streaming(spark, q, data_dir, workdir=wd).collect()
    fresh = run_streaming(
        spark, q, data_dir, workdir=str(tmp_path / "wd-twice-fresh")
    ).collect()
    rec = sorted((r["win_start"], r["n"]) for r in recovered)
    # exactly once per window (no orphan-vs-orphan duplicate) ...
    assert len({w for w, _ in rec}) == len(rec)
    # ... and the twice-fired window carries B's k+m count, matching a
    # clean end-to-end run over the full data
    assert rec == sorted((r["win_start"], r["n"]) for r in fresh)
    assert run_streaming(spark, q, data_dir, workdir=wd).collect() == []
