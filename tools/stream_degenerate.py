"""Streaming degenerate lane: replay adversarial stream shapes through the
Tier B runners (VERDICT r12 stretch #8).

The r12 degenerate fixtures exercised BATCH entries; at 100 TB a stream
hits the same classes live: a second with no events (empty epoch), a
burst arriving entirely behind the watermark (all-late), and one hot key
carrying the whole stream (single-key skew). Each cell replays one shape
through one REAL runner (the exact functions the stream==batch tests and
stress lanes run — no reimplemented pipelines) and checks the runner's
own contract:

- q5/q7/q11-append/q8: drained result equals the batch twin over the
  rows the watermark semantics say survive (everything for empty-epoch
  and skew; the frontier-advancing burst only for all-late);
- q10 partitioned sink: no watermark, so EVERY row must land (late rows
  included — they partition into old dt= dirs) with real dt=/hm= dirs;
- q12 proc-time: env-gated here (transformWithState needs protobuf,
  absent in this sandbox) — recorded as a named skip, not silence;
- q5/q11 skew ALSO run with a mid-replay crash + restart from the same
  checkpoint (crash_after_s through the runner itself): state stores
  recover and the sink commit log keeps the union exactly-once, the same
  adoption contract the q4 recovery test pins.

Writes STREAM_DEGENERATE_r{N}.json. Usage:
    python tools/stream_degenerate.py [--round N]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _repo() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fix_mtimes(path: str, old_epochs: set[int]) -> None:
    """Force replay order: files under epoch=<old> dirs get strictly older
    mtimes than the rest (FileStreamSource batches oldest-first), so the
    frontier-advancing burst is processed before the late rows."""
    t0 = time.time() - 50_000
    rest = sorted(
        d for d in os.listdir(path)
        if d.startswith("epoch=") and int(d.split("=")[1]) not in old_epochs
    )
    order = {d: i for i, d in enumerate(rest)}
    for d in os.listdir(path):
        if not d.startswith("epoch="):
            continue
        is_adv = int(d.split("=")[1]) in old_epochs
        ts = t0 if is_adv else t0 + 1_000 + order[d]
        full = os.path.join(path, d)
        for f in os.listdir(full):
            os.utime(os.path.join(full, f), (ts, ts))


def _write_empty_epoch_file(path: str) -> None:
    """Plant a genuinely ZERO-ROW parquet file as its own epoch partition
    — a micro-batch with no rows, the empty-shard class made streaming."""
    import pyarrow.parquet as pq

    part_dirs = sorted(d for d in os.listdir(path) if d.startswith("epoch="))
    src_dir = os.path.join(path, part_dirs[0])
    src = next(
        f for f in os.listdir(src_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    schema = pq.read_schema(os.path.join(src_dir, src))
    empty_dir = os.path.join(path, f"epoch={int(part_dirs[-1].split('=')[1]) + 7}")
    os.makedirs(empty_dir, exist_ok=True)
    pq.write_table(schema.empty_table(), os.path.join(empty_dir, "part-empty.parquet"))


def main() -> None:  # noqa: C901 — a flat grid of independent cells
    sys.path.insert(0, _repo())
    from pyspark.sql import functions as F

    from squirtle_spark import sources, streaming
    from squirtle_spark.session import get_spark

    argv = sys.argv[1:]
    round_override = None
    if "--round" in argv:
        round_override = int(argv[argv.index("--round") + 1])

    spark = get_spark(app_name="stream-degenerate", cpus=8)
    base = tempfile.mkdtemp(prefix="sdegen-")
    cells: list[dict] = []

    def epochify(df, ts_col):
        # RAW unix seconds, not the tests' % 100000: a +100000 s advancer
        # burst would alias onto the base's epoch values under the modulus
        # and land in the SAME partition files as the late rows
        return df.withColumn(
            "epoch", F.unix_timestamp(F.col(ts_col).cast("timestamp"))
        )

    def stage(df, ts_col, sub):
        d = os.path.join(base, sub)
        streaming.write_epoch_files(epochify(df, ts_col), d)
        return d

    def shift(df, ts_col, ids):
        out = df.withColumn(ts_col, F.col(ts_col) + F.expr("INTERVAL 100000 SECONDS"))
        for c in ids:
            out = out.withColumn(c, F.col(c) + F.lit(9000))
        return out

    def bids_for(shape):
        """(replay_dir, surviving_batch_df, n_input_rows) for one shape."""
        bids = sources.nexmark_bids(spark, 200, 8)
        if shape == "single_key_skew":
            bids = bids.withColumn("auction", F.lit(7)).withColumn("bidder", F.lit(3))
            return stage(bids, "b_date_time", f"b-{shape}"), bids, bids.count()
        if shape == "empty_epoch":
            kept = bids.where(F.unix_timestamp(F.col("b_date_time").cast("timestamp")) % 4 != 1)
            d = stage(kept, "b_date_time", f"b-{shape}")
            _write_empty_epoch_file(d)
            return d, kept, kept.count()
        # all_late: a small far-future burst advances the frontier FIRST;
        # the full base stream then arrives 100000 s behind it. eps must
        # clear the NEXMark slot layout (bids are slots >= 80 per 1000 —
        # an eps=20 burst contains ZERO bids, found by this lane's own
        # first run: no advancer, no drop, every cell red)
        adv = shift(sources.nexmark_bids(spark, 200, 2, seed=7), "b_date_time", ["auction", "bidder"])
        both = bids.unionByName(adv)
        d = stage(both, "b_date_time", f"b-{shape}")
        adv_epochs = {
            r["epoch"] for r in epochify(adv, "b_date_time").select("epoch").distinct().collect()
        }
        _fix_mtimes(d, adv_epochs)
        return d, adv, both.count()

    def q5_twin(surviving):
        b = surviving.withColumn("b_date_time", F.col("b_date_time").cast("timestamp"))
        counts = b.groupBy(F.window("b_date_time", "10 seconds", "5 seconds"), "auction").agg(
            F.count("*").alias("num")
        )
        maxes = counts.groupBy("window").agg(F.max("num").alias("maxn"))
        return (
            counts.join(maxes, "window")
            .where(F.col("num") >= F.col("maxn"))
            .select("auction", "num", F.col("window.start").alias("starttime"))
        )

    def q7_twin(surviving):
        b = surviving.withColumn("b_date_time", F.col("b_date_time").cast("timestamp")).withColumn(
            "w", F.window("b_date_time", "10 seconds")
        )
        maxes = b.groupBy("w").agg(F.max("price").alias("maxprice"))
        return b.join(
            maxes, (b["w"] == maxes["w"]) & (b["price"] == maxes["maxprice"])
        ).select("auction", "price", "bidder", "b_date_time")

    def q11_twin(surviving, gap_s=3):
        b = surviving.withColumn("b_date_time", F.col("b_date_time").cast("timestamp"))
        return (
            b.groupBy("bidder", F.session_window("b_date_time", f"{gap_s} seconds"))
            .agg(F.count("*").alias("bid_count"))
            .select(
                "bidder",
                "bid_count",
                F.col("session_window.start").alias("starttime"),
                F.col("session_window.end").alias("endtime"),
            )
        )

    def record(runner, shape, fn, note=""):
        t0 = time.time()
        row = {"runner": runner, "shape": shape}
        try:
            got, expected = fn()
            gs, es = sorted(map(tuple, got)), sorted(map(tuple, expected))
            row.update(
                rows_stream=len(gs),
                rows_expected=len(es),
                match=gs == es,
                passed=bool(gs == es and (len(gs) > 0 or shape == "all_late")),
            )
        except Exception as e:  # a crash IS the finding
            row.update(passed=False, error=f"{type(e).__name__}: {e}"[:400])
        row["wall_s"] = round(time.time() - t0, 1)
        if note:
            row["note"] = note
        cells.append(row)
        print(f"# {runner}/{shape}: {row}", file=sys.stderr)

    ck = lambda tag: os.path.join(base, f"ckpt-{tag}")  # noqa: E731

    # ---- q5 hopping hot items (B1) + crash-recovery adoption on skew
    for shape in ("empty_epoch", "all_late", "single_key_skew"):
        d, surv, _ = bids_for(shape)
        fpt = 1 if shape == "all_late" else 3

        def cell(d=d, surv=surv, shape=shape, fpt=fpt):
            got = streaming.run_nexmark_q5_stream(
                spark, d, checkpoint=ck(f"q5-{shape}"), files_per_trigger=fpt
            ).collect()
            return got, q5_twin(surv).collect()

        record("q5_hopping", shape, cell)

    d, surv, _ = bids_for("single_key_skew")

    def q5_crash(d=d, surv=surv):
        m: dict = {}
        got = streaming.run_nexmark_q5_stream(
            spark,
            d,
            checkpoint=ck("q5-crash"),
            files_per_trigger=1,
            crash_after_s=30,
            metrics=m,
        ).collect()
        # ADVICE r13: a stop that landed on an already-terminated query
        # tests nothing — fail the cell rather than pass vacuously
        assert m["crash"]["interrupted_active"], f"vacuous crash: {m['crash']}"
        # ADVICE r14: and it must land after >= 1 COMMITTED batch, or
        # recovery restarts from an empty checkpoint
        assert m["crash"]["batches_before_crash"] >= 1, m["crash"]
        return got, q5_twin(surv).collect()

    record(
        "q5_hopping", "single_key_skew+crash", q5_crash,
        note="mid-replay stop + restart from the same checkpoint; exactly-once via sink commit log; stop asserted to interrupt an ACTIVE query",
    )

    # ---- q7 tumbling max (B2)
    for shape in ("empty_epoch", "all_late", "single_key_skew"):
        d, surv, _ = bids_for(shape)
        fpt = 1 if shape == "all_late" else 3

        def cell(d=d, surv=surv, shape=shape, fpt=fpt):
            got = streaming.run_nexmark_q7_stream(
                spark, d, checkpoint=ck(f"q7-{shape}"), files_per_trigger=fpt
            ).collect()
            return got, q7_twin(surv).collect()

        record("q7_tumbling", shape, cell)

    # ---- q11 session windows, append mode (B4) + crash-recovery on skew
    for shape in ("empty_epoch", "all_late", "single_key_skew"):
        d, surv, _ = bids_for(shape)
        fpt = 1 if shape == "all_late" else 3

        def cell(d=d, surv=surv, shape=shape, fpt=fpt):
            got = streaming.run_nexmark_q11_append_stream(
                spark,
                d,
                checkpoint=ck(f"q11-{shape}"),
                gap_s=3,
                delay="5 seconds",
                files_per_trigger=fpt,
            ).collect()
            return got, q11_twin(surv).collect()

        record("q11_session_append", shape, cell)

    d, surv, _ = bids_for("single_key_skew")

    def q11_crash(d=d, surv=surv):
        m: dict = {}
        got = streaming.run_nexmark_q11_append_stream(
            spark,
            d,
            checkpoint=ck("q11-crash"),
            gap_s=3,
            delay="5 seconds",
            files_per_trigger=1,
            crash_after_s=30,
            metrics=m,
        ).collect()
        assert m["crash"]["interrupted_active"], f"vacuous crash: {m['crash']}"
        # ADVICE r14: and it must land after >= 1 COMMITTED batch, or
        # recovery restarts from an empty checkpoint
        assert m["crash"]["batches_before_crash"] >= 1, m["crash"]
        return got, q11_twin(surv).collect()

    record(
        "q11_session_append", "single_key_skew+crash", q11_crash,
        note="session state recovers across the restart; one emit per closed session; stop asserted to interrupt an ACTIVE query",
    )

    # ---- q8 stream-stream join (B3)
    def q8_fixture(shape):
        persons = sources.nexmark_persons(spark, 200, 6)
        auctions = sources.nexmark_auctions(spark, 400, 6)
        if shape == "single_key_skew":
            # every auction opened by one seller: the join's hot key
            auctions = auctions.withColumn(
                "seller", F.lit(persons.agg(F.min("p_id")).first()[0])
            )
        if shape == "empty_epoch":
            persons = persons.where(
                F.unix_timestamp(F.col("p_date_time").cast("timestamp")) % 4 != 1
            )
            auctions = auctions.where(
                F.unix_timestamp(F.col("a_date_time").cast("timestamp")) % 4 != 1
            )
        if shape == "all_late":
            padv = shift(sources.nexmark_persons(spark, 100, 2, seed=7), "p_date_time", ["p_id"])
            aadv = shift(
                sources.nexmark_auctions(spark, 200, 2, seed=7), "a_date_time", ["a_id", "seller"]
            )
            pd_ = stage(persons.unionByName(padv), "p_date_time", f"p-{shape}")
            ad_ = stage(auctions.unionByName(aadv), "a_date_time", f"a-{shape}")
            for dd, adv, ts in ((pd_, padv, "p_date_time"), (ad_, aadv, "a_date_time")):
                eps = {
                    r["epoch"]
                    for r in epochify(adv, ts).select("epoch").distinct().collect()
                }
                _fix_mtimes(dd, eps)
            return pd_, ad_, padv, aadv
        pd_ = stage(persons, "p_date_time", f"p-{shape}")
        ad_ = stage(auctions, "a_date_time", f"a-{shape}")
        if shape == "empty_epoch":
            _write_empty_epoch_file(pd_)
            _write_empty_epoch_file(ad_)
        return pd_, ad_, persons, auctions

    def q8_twin(persons, auctions):
        bp = persons.withColumn("p_date_time", F.col("p_date_time").cast("timestamp")).select(
            "p_id", "name", F.window("p_date_time", "10 seconds")["start"].alias("starttime")
        ).distinct()
        ba = auctions.withColumn("a_date_time", F.col("a_date_time").cast("timestamp")).select(
            "seller", F.window("a_date_time", "10 seconds")["start"].alias("starttime")
        ).distinct()
        return bp.join(
            ba, (bp["p_id"] == ba["seller"]) & (bp["starttime"] == ba["starttime"])
        ).select("p_id", "name", bp["starttime"])

    for shape in ("empty_epoch", "single_key_skew"):
        pd_, ad_, ps, au = q8_fixture(shape)

        def cell(pd_=pd_, ad_=ad_, ps=ps, au=au, shape=shape):
            got = streaming.run_nexmark_q8_stream(
                spark,
                pd_,
                ad_,
                checkpoint=ck(f"q8-{shape}"),
                size_s=10,
                files_per_trigger=3,
            ).collect()
            return got, q8_twin(ps, au).collect()

        record("q8_stream_stream_join", shape, cell)

    # q8 all_late is a SANDWICH, not an equality: Spark only GUARANTEES
    # keeping rows within the watermark delay — dropping older join input
    # is best-effort (the docs' "late data" contract for stream-stream
    # joins), so the deterministic contract is: every frontier-side match
    # present, nothing outside the full-input match set, no duplicates.
    pd_, ad_, padv, aadv = q8_fixture("all_late")
    pall = sources.nexmark_persons(spark, 200, 6).unionByName(padv)
    aall = sources.nexmark_auctions(spark, 400, 6).unionByName(aadv)

    def q8_late_cell():
        got = sorted(
            map(
                tuple,
                streaming.run_nexmark_q8_stream(
                    spark,
                    pd_,
                    ad_,
                    checkpoint=ck("q8-all_late"),
                    size_s=10,
                    watermark="600 seconds",
                    files_per_trigger=1,
                ).collect(),
            )
        )
        must = sorted(map(tuple, q8_twin(padv, aadv).collect()))
        may = set(map(tuple, q8_twin(pall, aall).collect()))
        ok = (
            len(got) == len(set(got))  # exactly-once
            and set(must) <= set(got) <= may
            and len(must) > 0
        )
        # shape the record: equality against itself iff the sandwich holds
        return got, (got if ok else must)

    record(
        "q8_stream_stream_join", "all_late", q8_late_cell,
        note="sandwich contract: advancer matches <= result <= all matches, no dups "
        "(join late-drop is best-effort per Spark's semantics; only the keep side is guaranteed)",
    )

    # ---- q10 partitioned file sink (B6): no watermark — EVERY row lands
    for shape in ("empty_epoch", "all_late", "single_key_skew"):
        d, _, n_in = bids_for(shape)
        out = os.path.join(base, f"q10-{shape}-out")

        def cell(d=d, out=out, n_in=n_in, shape=shape):
            stream = streaming.replay_stream(spark, d, files_per_trigger=3).drop("epoch")
            q = streaming.partitioned_file_sink(
                stream.select("auction", "bidder", "price", "b_date_time"),
                out,
                checkpoint=ck(f"q10-{shape}"),
            )
            assert q.awaitTermination(300), "q10 sink still running"
            parts = [p for p in os.listdir(out) if p.startswith("dt=")]
            assert parts, "no dt= partitions"
            n_got = spark.read.csv(out).count()
            # expected = every input row (late ones included) as 1-tuples
            return [(i,) for i in range(n_got)], [(i,) for i in range(n_in)]

        record(
            "q10_partitioned_sink", shape, cell,
            note="no watermark: all rows land, late ones into their old dt= partitions",
        )

    # ---- q12 proc-time (B5): runs on the LEGACY stateful API
    # (stateful_proc_window_count_legacy + per-key flush sweep), which
    # needs no protobuf — closing the r13 skips; the
    # transformWithStateInPandas variant stays env-gated in pytest.
    # Window placement is wall-clock, so the cell's value check is q12's
    # partition INVARIANT: per-key emitted window counts sum to the
    # per-key input count (the reference's own q12 check is count-based,
    # SURVEY §2.11 B5).
    def q12_fixture(shape):
        bids = sources.nexmark_bids(spark, 200, 8)
        if shape == "single_key_skew":
            bids = bids.withColumn("auction", F.lit(7)).withColumn(
                "bidder", F.lit(3)
            )
        elif shape == "empty_epoch":
            bids = bids.where(
                F.unix_timestamp(F.col("b_date_time").cast("timestamp")) % 4 != 1
            )
        elif shape == "all_late":
            # proc-time windows ignore event time, so "late" can't drop
            # rows — the cell feeds the same disordered union anyway and
            # requires every row counted exactly once
            adv = shift(
                sources.nexmark_bids(spark, 200, 2, seed=7),
                "b_date_time",
                ["auction", "bidder"],
            )
            bids = bids.unionByName(adv)
        d = os.path.join(base, f"q12-{shape}")
        streaming.write_epoch_files(
            epochify(bids.withColumn("is_flush", F.lit(False)), "b_date_time"), d
        )
        if shape == "empty_epoch":
            _write_empty_epoch_file(d)
        streaming.write_keyed_flush_epoch(spark, d, "bidder")
        return d, bids

    for shape in ("empty_epoch", "all_late", "single_key_skew"):

        def q12_cell(shape=shape):
            d, inp = q12_fixture(shape)
            res = streaming.run_nexmark_q12_proc_stream(
                spark,
                d,
                checkpoint=ck(f"q12-{shape}"),
                window_s=1,
                files_per_trigger=2,
            )
            emitted = res.collect()
            assert all(r["n"] >= 1 for r in emitted), "empty window emitted"
            got = sorted(
                (int(r["key"]), int(r["total"]))
                for r in res.groupBy("key")
                .agg(F.sum("n").alias("total"))
                .collect()
            )
            exp = sorted(
                (int(r["bidder"]), int(r["count"]))
                for r in inp.groupBy("bidder").count().collect()
            )
            return got, exp

        record(
            "q12_proc_time", shape, q12_cell,
            note="legacy stateful API (applyInPandasWithState) + per-key flush sweep; "
            "value check = partition invariant (per-key window counts sum to input)",
        )

    ran = [c for c in cells if c.get("passed") is not None]
    art = {
        "round": round_override or _round_from_artifacts(),
        "cells": cells,
        "n_cells": len(cells),
        "n_ran": len(ran),
        "n_pass": sum(1 for c in ran if c["passed"]),
        "n_skipped": len(cells) - len(ran),
    }
    path = os.path.join(_repo(), f"STREAM_DEGENERATE_r{art['round']:02d}.json")
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({"written": path, "n_pass": art["n_pass"], "n_ran": art["n_ran"]}))
    shutil.rmtree(base, ignore_errors=True)


def _round_from_artifacts() -> int:
    from tools.run_differential import _round_number

    return _round_number(_repo())


if __name__ == "__main__":
    main()
