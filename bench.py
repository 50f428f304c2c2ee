#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line (kept under ~2,000 chars — the driver captures a
bounded tail of stdout, and round 7's full per-query canary stamps
pushed the line to ~5 KB, leaving BENCH_r07.json unparseable):
  {"metric": "headline_total_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, "canary": {summary},
   "streaming": {ev/s one-liner}, "drift": {summary},
   "detail": "BENCH_DETAIL_r{N}.json"}

The FULL record — per-query canary stamps, normalized plan
fingerprints, and drift attribution vs the previous recorded round —
goes to ``BENCH_DETAIL_r{N}.json`` next to this file. Any per-query
delta beyond DRIFT_TOLERANCE vs the previous round is re-timed
(best-of-2 measurement windows) and classified with evidence:
``noise`` (plan fingerprint unchanged and/or the retime reverts),
``plan-change`` (fingerprint differs), or ``regressed-same-plan``
(same plan, delta survives the retime — a real regression to chase).

Execution is measured with the noop sink (full pipeline runs, nothing
crosses back to the driver) — the same shape as the reference's blackhole
sink benchmarks (flock/src/datasink/mod.rs:47-72, README.md:186-195).

Noise defense (the round-4 artifact was contaminated by a sustained host
stall that min-of-3 could not survive): a fixed CANARY — one full-scan
hash-agg over `events`, constant work independent of the query under
test — is calibrated at startup and re-timed around every measured run.
If any canary sample in a query's measurement window exceeds
CANARY_FACTOR x calibration, the whole measurement is discarded and the
query re-run (bounded retries). The emitted JSON carries the canary
calibration, p50/max of all samples, and the rerun count, so a
contaminated run is self-identifying instead of silently wrong.

`--stress` runs the 10x-rate streaming stress (q5 full pipeline, q11
session store, q8 stream-stream join, q4 chained three-stateful
pipeline) and prints its own JSON line — the machine-readable form of
SCALING.md's headroom claim.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

CANARY_FACTOR = 3.0  # a canary sample beyond this x calibration voids the window
MAX_RERUNS_PER_QUERY = 2
DRIFT_TOLERANCE = 0.20  # per-query delta vs previous round that triggers a retime


def _round_number() -> int:
    """Next round index: 1 + the highest recorded BENCH_r{N}.json.

    The driver writes BENCH_r{N}.json AFTER running this script, so at
    run time the highest existing artifact is the PREVIOUS round."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for f in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.match(r"BENCH_r(\d+)\.json$", os.path.basename(f))
        if m:
            rounds.append(int(m.group(1)))
    return (max(rounds) + 1) if rounds else 1


def _prev_record(sf: float) -> tuple[int, dict, dict]:
    """(round, {name: sec}, {name: fingerprint}) of the newest usable record
    AT THE SAME SCALE FACTOR.

    Prefers BENCH_DETAIL_r*.json (carries fingerprints); falls back to
    the newest BENCH_r*.json whose driver-side ``parsed`` is non-null
    (fingerprints empty there — drift then classifies by retime alone).
    Records at a different sf are skipped: comparing sf0.01 seconds
    against an sf0.1 run would flag every query as drifted and poison
    every classification (a stray local run at another sf must not
    become the baseline)."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    details = sorted(
        glob.glob(os.path.join(here, "BENCH_DETAIL_r*.json")),
        key=lambda f: int(re.search(r"_r(\d+)\.json$", f).group(1)),
    )
    for f in reversed(details):
        try:
            d = json.load(open(f))
            rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        except (json.JSONDecodeError, OSError):
            continue
        if d.get("sf") == sf and d.get("queries"):
            return rnd, d["queries"], d.get("plan_fingerprints", {})
    benches = sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda f: int(re.search(r"_r(\d+)\.json$", f).group(1)),
    )
    for f in reversed(benches):
        try:
            d = json.load(open(f))
        except (json.JSONDecodeError, OSError):
            continue
        parsed = d.get("parsed")
        if parsed and parsed.get("queries") and parsed.get("sf") == sf:
            rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
            return rnd, parsed["queries"], {}
    return 0, {}, {}


def _plan_fingerprint(df) -> str:
    """Stable hash of the physical plan, ephemeral ids stripped.

    Two rounds with the same fingerprint ran the same plan shape, so a
    wall-clock swing between them is host noise (or data change — the
    bench corpus is fixed), not a regression introduced by a code edit.
    Normalization removes expression ids (``#123``), plan/exchange ids
    (``[id=#45]``, ``[plan_id=67]``) and absolute temp paths, which
    differ run-to-run with identical plans."""
    import hashlib

    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = re.sub(r"#\d+", "#", plan)
    plan = re.sub(r"\[(?:plan_)?id=#?\d+\]", "[id=]", plan)
    plan = re.sub(r"file:[^\s,\]]+|/tmp/[^\s,\]]+", "<path>", plan)
    return hashlib.sha1(plan.encode()).hexdigest()[:12]


def _pctl(sorted_vals: list[float], p: float) -> float:
    """Nearest-rank percentile of an already-sorted list."""
    if not sorted_vals:
        return 0.0
    k = max(0, min(len(sorted_vals) - 1, int(round(p * (len(sorted_vals) - 1)))))
    return sorted_vals[k]


class Canary:
    """Fixed-cost probe of host health: full scan + hash-agg over `events`.

    Constant work (no dependence on the query under test), touches the
    same scan/agg machinery as real queries, cheap enough to interleave
    (~tens of ms at sf0.1). Calibration = median of 5 warmed startup
    runs (the typical-host cost); any later sample > CANARY_FACTOR x
    that marks its measurement window as contaminated. The factor is
    sized so ordinary shared-VM jitter (~2-3x on single samples) never
    trips it while a genuine multi-second stall — the round-4 failure
    mode, 8x+ inflation — always does.
    """

    def __init__(self, spark):
        self.spark = spark
        self.samples: list[float] = []
        self._time()  # warmup: first run pays codegen, not host cost
        self.calibration = sorted(self._time() for _ in range(5))[2]

    def _time(self) -> float:
        t0 = time.perf_counter()
        self.spark.sql(
            "SELECT sum(hash(event_id, user_id, event_type)) FROM events"
        ).collect()
        return time.perf_counter() - t0

    def sample(self) -> float:
        dt = self._time()
        self.samples.append(dt)
        return dt

    def _effective_cal(self) -> float:
        """Startup calibration, tightened by the running median.

        If the 5 calibration runs landed in a busy window (seen in
        practice: calibration 0.19 s vs whole-run p50 0.08 s), a static
        calibration loosens the stall gate by the same factor. The
        running median of all samples so far can only tighten it —
        stalls inflate the max, not the median."""
        s = sorted(self.samples)
        return min(self.calibration, _pctl(s, 0.50)) if s else self.calibration

    def clean(self, window_samples: list[float]) -> bool:
        return max(window_samples) <= CANARY_FACTOR * self._effective_cal()

    def stats(self, reruns: int) -> dict:
        s = sorted(self.samples)
        return {
            "calibration_sec": round(self.calibration, 4),
            "effective_calibration_sec": round(self._effective_cal(), 4),
            "n_samples": len(s),
            "p50_sec": round(_pctl(s, 0.50), 4),
            "max_sec": round(s[-1], 4) if s else 0.0,
            "factor": CANARY_FACTOR,
            "reruns": reruns,
        }


def _measure_query(spark, q, sf_dir: str, canary: Canary) -> tuple[float, dict]:
    """Min-of-3 noop-sink wall for one query, canary-guarded.

    Canary runs before rep 1 and after every rep; if any of those 4
    samples is hot, the whole min-of-3 is discarded and retried (the min
    of a stalled window is still a stalled number — r4's failure mode).
    After MAX_RERUNS the last measurement is kept and stamped dirty.

    Returns (best, stamp) where ``stamp`` records THIS query's own
    canary window — reruns, the window's max sample, and whether the
    kept measurement was still contaminated. Round 6's artifact could
    not attribute a 20-64% delta to host noise vs a real regression
    because contamination was only recorded globally; the per-query
    stamp makes each number individually adjudicable.
    """
    reruns = 0
    while True:
        window = [canary.sample()]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = q.spark_fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            window.append(canary.sample())
        clean = canary.clean(window)
        if clean or reruns >= MAX_RERUNS_PER_QUERY:
            return best, {
                "reruns": reruns,
                "window_max_sec": round(max(window), 4),
                "dirty": not clean,
            }
        reruns += 1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from squirtle_spark.registry import load_all
    from squirtle_spark.session import get_spark

    spark = get_spark(app_name="squirtle-bench")
    queries = {n: q for n, q in load_all().items() if q.bench}

    # Warm the JVM + parquet footers so per-query times measure the plan,
    # not first-touch overhead.
    from squirtle_spark import catalog

    catalog.register_all(spark, sf_dir)
    for t in catalog.TABLES:
        spark.table(t).count()

    if "--stress" in sys.argv:
        stress = _stress_bench(spark)
        # Same bounded-stdout discipline as the headline line: the
        # stress payload crossed 1,600 chars when the 30x ANN point
        # landed, and one more lane would overflow a 2,000-char tail
        # capture. Full record always on disk; the printed line sheds
        # the bulkiest section first if it must.
        rnd = _round_number()
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, f"STRESS_DETAIL_r{rnd:02d}.json"), "w") as f:
            json.dump(stress, f, indent=1)
        print(_compact_line(stress, shed_order=("state_operators",)))
        return

    canary = Canary(spark)
    times: dict[str, float] = {}
    stamps: dict[str, dict] = {}
    fingerprints: dict[str, str] = {}
    total_reruns = 0
    for name, q in sorted(queries.items()):
        best, stamp = _measure_query(spark, q, sf_dir, canary)
        total_reruns += stamp["reruns"]
        times[name] = round(best, 3)
        stamps[name] = stamp
        fingerprints[name] = _plan_fingerprint(q.spark_fn(spark, sf_dir))
        flag = f" [reran {stamp['reruns']}x]" if stamp["reruns"] else ""
        flag += " [DIRTY]" if stamp["dirty"] else ""
        print(f"# {name}: {times[name]:.3f}s{flag}", file=sys.stderr)

    # Drift attribution: any >DRIFT_TOLERANCE swing vs the previous
    # recorded round gets ONE more measurement window (best-of-2); the
    # recorded time is the min, and the classification carries evidence.
    prev_round, prev_times, prev_fps = _prev_record(sf)
    drift: dict[str, dict] = {}
    for name, q in sorted(queries.items()):
        prev = prev_times.get(name)
        if not prev:
            continue
        delta = (times[name] - prev) / prev
        if abs(delta) <= DRIFT_TOLERANCE:
            continue
        first = times[name]
        retime, restamp = _measure_query(spark, q, sf_dir, canary)
        total_reruns += restamp["reruns"]
        # min over CLEAN windows only: a contaminated retime must not be
        # laundered into the headline with a clean-looking stamp (and a
        # stalled window's min can be wrong in either direction once the
        # running calibration has moved).
        candidates = [
            (first, stamps[name]["dirty"]),
            (round(retime, 3), restamp["dirty"]),
        ]
        clean = [v for v, dirty in candidates if not dirty]
        kept = min(clean) if clean else min(v for v, _ in candidates)
        kept_window_dirty = not clean  # recorded value came from a hot window
        times[name] = kept
        kept_delta = (kept - prev) / prev
        prev_fp = prev_fps.get(name)
        if prev_fp and prev_fp != fingerprints[name]:
            cls = "plan-change"
        elif abs(kept_delta) <= DRIFT_TOLERANCE:
            cls = "noise"  # the retime reverted the swing on an unchanged plan
        elif kept_delta < 0:
            cls = "improved"  # sustained speedup, same plan (or no prior plan)
        elif prev_fp:
            cls = "regressed-same-plan"
        else:
            # No prior fingerprint (first detail round) and the delta
            # survived the retime: can't separate plan change from real
            # regression without the prior plan — flag for next round.
            cls = "regressed-no-prior-fingerprint"
        drift[name] = {
            "prev_round": prev_round,
            "prev_sec": prev,
            "first_sec": first,
            "retime_sec": round(retime, 3),
            "retime_stamp": restamp,
            "kept_window_dirty": kept_window_dirty,
            "kept_sec": kept,
            "delta_pct": round(100 * kept_delta, 1),
            "fingerprint_prev": prev_fp,
            "fingerprint_now": fingerprints[name],
            "class": cls,
        }
        print(f"# drift {name}: {prev}s -> {kept}s [{cls}]", file=sys.stderr)

    streaming_stats = _stream_q5_bench(spark, canary=canary)

    total = round(sum(times.values()), 3)
    rnd = _round_number()
    detail_name = f"BENCH_DETAIL_r{rnd:02d}.json"
    detail = {
        "round": rnd,
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "queries": times,
        "query_canary": stamps,
        "plan_fingerprints": fingerprints,
        "drift": drift,
        "canary": canary.stats(total_reruns),
        "streaming": streaming_stats,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, detail_name), "w") as f:
        json.dump(detail, f, indent=1)

    # Compact stdout line (driver-parseable; full record in the detail file).
    c = canary.stats(total_reruns)
    payload = {
            "metric": "headline_total_sec",
            "value": total,
            "unit": "sec",
            "queries": times,
            "sf": sf,
            "canary": {
                "cal_sec": c["effective_calibration_sec"],
                "max_sec": c["max_sec"],
                "reruns": c["reruns"],
                # dirtiness of the window the RECORDED value came from:
                # a drift retime that replaced a dirty first window with
                # a clean measurement cleans the query; a discarded dirty
                # retime doesn't contaminate it
                "dirty_queries": sum(
                    1
                    for n, s in stamps.items()
                    if (
                        drift[n]["kept_window_dirty"]
                        if n in drift
                        else s["dirty"]
                    )
                ),
            },
            "streaming": {
                k: streaming_stats[k]
                for k in (
                    "q5_events_per_sec",
                    "q5_full_query_events_per_sec",
                    "q5_microbatch_latency_p50_sec",
                    "q5_microbatch_latency_p95_sec",
                    "q8_full_query_events_per_sec",
                    "ysb_events_per_sec",
                    "q4_full_query_events_per_sec",
                )
                if k in streaming_stats
            },
            "drift": {
                "checked": len(drift),
                "noise": sum(1 for d in drift.values() if d["class"] == "noise"),
                "plan_change": sum(
                    1 for d in drift.values() if d["class"] == "plan-change"
                ),
                "improved": sum(
                    1 for d in drift.values() if d["class"] == "improved"
                ),
                "other": sorted(
                    n for n, d in drift.items() if d["class"].startswith("regressed")
                ),
            },
            "detail": detail_name,
    }
    print(_compact_line(payload))


def _compact_line(
    payload: dict,
    cap: int = 2000,
    shed_order: tuple[str, ...] = ("drift", "streaming", "canary", "queries"),
) -> str:
    """Render the stdout line, shedding optional sections to stay under
    the driver's bounded stdout-tail capture (~2,000 chars; the r7 line
    overflowed it and left BENCH_r07.json unparseable). If the payload
    ever grows the line past the cap, optional sections drop in order —
    the detail file keeps everything — rather than crash or overflow;
    what was shed is recorded in the line itself. The caller's dict is
    left untouched (shedding works on a copy), so the full payload can
    still be persisted after rendering."""
    payload = dict(payload)
    line = json.dumps(payload)
    for shed in shed_order:
        if len(line) <= cap:
            break
        payload.pop(shed, None)
        payload["shed_to_detail"] = payload.get("shed_to_detail", []) + [shed]
        line = json.dumps(payload)
    return line


def _progress_latency(q) -> dict:
    """p50/p95 per-micro-batch latency from StreamingQueryProgress.

    `triggerExecution` is the full micro-batch wall as the engine itself
    recorded it, per batch — robust to driver-side timing noise in a way
    wall/n_batches is not (one stalled perf_counter window inflated the
    whole r4 artifact; per-batch engine timings localize a stall to the
    batches it actually hit).
    """
    durs = sorted(
        p.durationMs["triggerExecution"] / 1000.0
        for p in q.recentProgress
        if p.numInputRows > 0 and "triggerExecution" in p.durationMs
    )
    return {
        "n_batches": len(durs),
        "p50_sec": round(_pctl(durs, 0.50), 3),
        "p95_sec": round(_pctl(durs, 0.95), 3),
    }


def _stream_q5_bench(spark, events_per_sec: int = 1000, seconds: int = 60, canary=None) -> dict:
    """Streaming anchor vs BASELINE.md: the reference processes 1,000 ev/s
    NEXMark q5 (hopping window) at ~8.5k ev/s effective (10 s of data in
    ~1.18 s source wall, reference README.md:250). Over 60 s of generated
    bids:

    - throughput: large triggers → effective events/sec (hopping agg),
      canary-guarded (rerun once if the window was hot);
    - latency: small triggers → per-micro-batch p50/p95 from
      StreamingQueryProgress (engine-recorded, host-noise-robust);
    - full q5: the DECLARED query end-to-end (hopping counts + per-window
      max join-on-aggregate, streaming.run_nexmark_q5_stream).

    A warmup stream runs first: the first streaming query in a fresh JVM
    pays ~10 s of one-time codegen/init, which belongs to JVM startup, not
    the per-event cost (the batch side amortizes the same way via
    min-of-2). Steady-state is what the reference's number measures too.

    Streaming runs use few shuffle partitions: state-store commit cost
    scales with partition count, so partitions should track state volume,
    not core count (at cluster scale AQE/state rebalancing takes over)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from squirtle_spark import sources, streaming

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    tmp = tempfile.mkdtemp(prefix="bench-stream-")

    def guarded(fn):
        """Run fn() → wall; rerun once if the canary saw a host stall."""
        for attempt in range(2):
            pre = canary.sample() if canary else 0.0
            wall = fn()
            post = canary.sample() if canary else 0.0
            if canary is None or canary.clean([pre, post]) or attempt:
                return wall
        return wall

    try:
        bids = sources.nexmark_bids(spark, events_per_sec, seconds)
        n = bids.count()
        staged = bids.withColumn(
            "epoch", F.unix_timestamp(F.col("b_date_time").cast("timestamp")) % 100000
        )
        streaming.write_epoch_files(staged, f"{tmp}/bids")

        def run(files_per_trigger: int, ckpt: str) -> tuple[float, dict]:
            stream = streaming.replay_stream(
                spark, f"{tmp}/bids", files_per_trigger=files_per_trigger
            ).drop("epoch")
            agg = streaming.hopping_agg(
                stream, "b_date_time", "auction", size="10 seconds", slide="5 seconds"
            )
            t0 = time.perf_counter()
            q = streaming.noop_sink(agg, checkpoint=_fresh(tmp, ckpt))
            q.awaitTermination(300)
            return time.perf_counter() - t0, _progress_latency(q)

        run(30, "ckpt-warm")  # one-time streaming-path init, not per-event cost
        wall_tp = guarded(lambda: run(15, "ckpt-tp")[0])
        _, lat = run(4, "ckpt-lat")

        # The runner returns a LAZY DataFrame over its parquet result sink
        # (round-7: no driver-side collect); the noop write materializes
        # the hot-items join so the timed wall covers the whole query.
        wall_full = guarded(
            lambda: _timed(
                lambda: streaming.run_nexmark_q5_stream(
                    spark,
                    f"{tmp}/bids",
                    checkpoint=_fresh(tmp, "ckpt-full"),
                    files_per_trigger=15,
                )
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
        )

        # Full q8: genuine stream-stream windowed join (person ⋈ auction)
        # over generated entity streams at the same event-time span.
        # Production-shaped: flush sentinels push the frontier past the
        # tail windows and the FINITE watermark evicts both sides' join
        # state at drain (test_nexmark_q8_stream_evicts_state_with_flush
        # asserts result parity + eviction for this exact configuration).
        persons = sources.nexmark_persons(spark, 10 * events_per_sec, seconds)
        auctions = sources.nexmark_auctions(spark, 10 * events_per_sec, seconds)
        n_q8 = persons.count() + auctions.count()
        for df, ts, sub in (
            (persons, "p_date_time", "p"),
            (auctions, "a_date_time", "a"),
        ):
            streaming.write_epoch_files(
                df.withColumn(
                    "epoch", F.unix_timestamp(F.col(ts).cast("timestamp")) % 100000
                ),
                f"{tmp}/{sub}",
            )
        for sub, ts, keys in (
            ("p", "p_date_time", ["p_id"]),
            ("a", "a_date_time", ["a_id", "seller"]),
        ):
            streaming.write_flush_epoch(spark, f"{tmp}/{sub}", ts, 3_600, keys)

        def run_q8(ckpt: str) -> float:
            return _timed(
                lambda: streaming.run_nexmark_q8_stream(
                    spark,
                    f"{tmp}/p",
                    f"{tmp}/a",
                    checkpoint=_fresh(tmp, ckpt),
                    size_s=10,
                    watermark="600 seconds",
                    files_per_trigger=30,
                )
            )

        run_q8("ckpt-q8-warm")  # stream-stream join path init, like the q5 warmup
        wall_q8 = guarded(lambda: run_q8("ckpt-q8"))

        # YSB end-to-end stream (filter + broadcast campaign join + tumbling
        # counts) at the same generated scale.
        ads = sources.ysb_ad_events(spark, events_per_sec, seconds)
        n_ads = ads.count()
        staged_ads = ads.withColumn(
            "epoch", F.unix_timestamp(F.col("event_time").cast("timestamp")) % 100000
        )
        streaming.write_epoch_files(staged_ads, f"{tmp}/ads")
        campaigns = sources.ysb_campaigns(spark)

        def run_ysb() -> float:
            ysb = streaming.ysb_campaign_stream(
                spark, f"{tmp}/ads", campaigns, files_per_trigger=15
            )
            t0 = time.perf_counter()
            q = streaming.noop_sink(
                ysb, checkpoint=_fresh(tmp, "ckpt-ysb"), mode="complete"
            )
            q.awaitTermination(300)
            return time.perf_counter() - t0

        wall_ysb = guarded(run_ysb)

        # Full q4: the chained three-stateful-operator append pipeline
        # (stream-stream interval join → windowed per-auction max →
        # chained per-category partials). The bids dir is ALREADY
        # sentinel-flushed by the q5 full-query lane above (round 7: the
        # q5 runner writes its own flush epoch), so dir mutation is no
        # longer ordering-critical: every consumer either filters
        # sentinels (q5 result, q11 sessions) or rejects them via join
        # residuals (the winning-bid interval join — the sentinel's
        # copied `expires` lies in the past). q4 still runs last so only
        # IT pays the auction-dir flush.
        q4_aucs = sources.nexmark_auctions(spark, events_per_sec, seconds)
        n_q4 = n + q4_aucs.count()
        streaming.write_epoch_files(
            q4_aucs.withColumn(
                "epoch",
                F.unix_timestamp(F.col("a_date_time").cast("timestamp")) % 100000,
            ),
            f"{tmp}/a4",
        )

        def run_q4(ckpt: str) -> float:
            return _timed(
                lambda: streaming.run_nexmark_q4_stream(
                    spark,
                    f"{tmp}/bids",
                    f"{tmp}/a4",
                    checkpoint=_fresh(tmp, ckpt),
                    files_per_trigger=30,
                )
            )

        run_q4("ckpt-q4-warm")  # chained-stateful path init
        wall_q4 = guarded(lambda: run_q4("ckpt-q4"))
        return {
            "q5_events": n,
            "q5_wall_sec": round(wall_tp, 3),
            "q5_events_per_sec": round(n / wall_tp, 1),
            "q5_microbatch_latency_p50_sec": lat["p50_sec"],
            "q5_microbatch_latency_p95_sec": lat["p95_sec"],
            "q5_latency_batches": lat["n_batches"],
            "q5_full_query_wall_sec": round(wall_full, 3),
            "q5_full_query_events_per_sec": round(n / wall_full, 1),
            "q8_events": n_q8,
            "q8_full_query_wall_sec": round(wall_q8, 3),
            "q8_full_query_events_per_sec": round(n_q8 / wall_q8, 1),
            "ysb_events": n_ads,
            "ysb_wall_sec": round(wall_ysb, 3),
            "ysb_events_per_sec": round(n_ads / wall_ysb, 1),
            "q4_events": n_q4,
            "q4_full_query_wall_sec": round(wall_q4, 3),
            "q4_full_query_events_per_sec": round(n_q4 / wall_q4, 1),
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _fresh(tmp: str, name: str) -> str:
    """A never-used checkpoint dir (guarded reruns must not resume)."""
    import uuid

    return os.path.join(tmp, f"{name}-{uuid.uuid4().hex[:8]}")


def _stress_bench(spark, events_per_sec: int = 10_000, seconds: int = 60) -> dict:
    """10x-rate streaming stress — SCALING.md's headroom claim as data.

    Runs the q5 full pipeline, the q11 session-window store, the q8
    stream-stream windowed join, the q4 chained three-stateful
    pipeline, and the CDC versioned-snapshot apply over 10x the bench
    event rate (~552k bids / 480k entities / 552k changes)
    and reports sustained ev/s. The expected
    shape: throughput RISES vs the 1x numbers because per-event cost
    amortizes fixed micro-batch overhead — state-store-bound pipelines
    get cheaper per event with volume until state exceeds memory (the
    RocksDB provider is the cluster answer there).
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from squirtle_spark import sources, streaming

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    tmp = tempfile.mkdtemp(prefix="bench-stress-")
    try:
        bids = sources.nexmark_bids(spark, events_per_sec, seconds)
        n = bids.count()
        staged = bids.withColumn(
            "epoch", F.unix_timestamp(F.col("b_date_time").cast("timestamp")) % 100000
        )
        streaming.write_epoch_files(staged, f"{tmp}/bids")

        state_metrics: dict[str, dict] = {}

        def run_q5(ckpt: str) -> float:
            m: dict = {}
            wall = _timed(
                lambda: streaming.run_nexmark_q5_stream(
                    spark,
                    f"{tmp}/bids",
                    checkpoint=_fresh(tmp, ckpt),
                    files_per_trigger=15,
                    metrics=m,
                )
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            state_metrics["q5"] = m.get("state_operators", {})
            return wall

        run_q5("w")  # streaming-path init
        wall_q5 = min(run_q5("a"), run_q5("b"))

        def run_q11(ckpt: str) -> float:
            m: dict = {}
            wall = _timed(
                lambda: streaming.run_nexmark_q11_stream(
                    spark,
                    f"{tmp}/bids",
                    checkpoint=_fresh(tmp, ckpt),
                    files_per_trigger=15,
                    metrics=m,
                )
            )
            state_metrics["q11"] = m.get("state_operators", {})
            return wall

        wall_q11 = min(run_q11("c"), run_q11("d"))

        # q8: genuine two-sided stream-stream join state at 10x volume —
        # production-shaped (flush sentinels + finite watermark), so a
        # run of this lane records EVICTION in its state metrics (final
        # rows ≈ the two sentinels, not the peak — STRESS_r07.json
        # predates this configuration and shows final == peak), matching
        # test_nexmark_q8_stream_evicts_state_with_flush.
        persons = sources.nexmark_persons(spark, 10 * events_per_sec, seconds)
        auctions = sources.nexmark_auctions(spark, 10 * events_per_sec, seconds)
        n_q8 = persons.count() + auctions.count()
        for df, ts, sub in (
            (persons, "p_date_time", "p"),
            (auctions, "a_date_time", "a"),
        ):
            streaming.write_epoch_files(
                df.withColumn(
                    "epoch", F.unix_timestamp(F.col(ts).cast("timestamp")) % 100000
                ),
                f"{tmp}/{sub}",
            )
        for sub, ts, keys in (
            ("p", "p_date_time", ["p_id"]),
            ("a", "a_date_time", ["a_id", "seller"]),
        ):
            streaming.write_flush_epoch(spark, f"{tmp}/{sub}", ts, 3_600, keys)

        def run_q8(ckpt: str) -> float:
            m: dict = {}
            wall = _timed(
                lambda: streaming.run_nexmark_q8_stream(
                    spark,
                    f"{tmp}/p",
                    f"{tmp}/a",
                    checkpoint=_fresh(tmp, ckpt),
                    size_s=10,
                    watermark="600 seconds",
                    files_per_trigger=30,
                    metrics=m,
                )
            )
            state_metrics["q8"] = m.get("state_operators", {})
            return wall

        run_q8("e")  # stream-stream path init
        wall_q8 = min(run_q8("f"), run_q8("g"))

        # q4 chained three-stateful pipeline at 10x. The bids dir was
        # already flushed by run_q5 above (its sentinel is filtered or
        # residual-rejected by every later consumer — see
        # _stream_q5_bench); q4 last keeps the auction-dir flush its own.
        q4_aucs = sources.nexmark_auctions(spark, events_per_sec, seconds)
        n_q4 = n + q4_aucs.count()
        streaming.write_epoch_files(
            q4_aucs.withColumn(
                "epoch",
                F.unix_timestamp(F.col("a_date_time").cast("timestamp")) % 100000,
            ),
            f"{tmp}/a4",
        )

        def run_q4(ckpt: str) -> float:
            m: dict = {}
            wall = _timed(
                lambda: streaming.run_nexmark_q4_stream(
                    spark,
                    f"{tmp}/bids",
                    f"{tmp}/a4",
                    checkpoint=_fresh(tmp, ckpt),
                    files_per_trigger=30,
                    metrics=m,
                )
            )
            state_metrics["q4"] = m.get("state_operators", {})
            return wall

        run_q4("h")  # chained-stateful path init
        wall_q4 = min(run_q4("i"), run_q4("j"))

        # CDC apply at 10x volume: a 552k-change stream (100k keys, ~10%
        # deletes) merged into the versioned snapshot table — ~22 atomic
        # commits of a tombstoned max-seq merge, the warehouse sink's
        # sustained apply rate.
        n_keys = 100_000
        chunk = max(1, n // 22)
        changes = spark.range(n).selectExpr(
            f"id % {n_keys} AS key",
            "id AS seq",
            "CASE WHEN id % 10 = 7 THEN 'D' ELSE 'U' END AS op",
            "CAST(id AS DOUBLE) AS val",
            f"CAST(id DIV {chunk} AS INT) AS epoch",
        )
        streaming.write_epoch_files(changes, f"{tmp}/cdc")

        def run_cdc(tag: str) -> float:
            table = _fresh(tmp, f"cdc-table-{tag}")

            def go():
                q = streaming.cdc_sink(
                    streaming.replay_stream(spark, f"{tmp}/cdc", 1).drop("epoch"),
                    table,
                    keys=["key"],
                    seq_col="seq",
                    op_col="op",
                    checkpoint=_fresh(tmp, f"cdc-ckpt-{tag}"),
                )
                assert q.awaitTermination(600)

            return _timed(go)

        run_cdc("w")  # foreachBatch/versioned-write path init
        wall_cdc = min(run_cdc("m"), run_cdc("n"))

        # Same changelog through the merge-on-read lane: raw delta-log
        # appends + periodic compaction + one final fold (cdc_mor_sink),
        # the high-rate shape for uniform-key CDC where snapshot-per-batch
        # spends each batch rewriting unchanged rows.
        def run_mor(tag: str) -> float:
            table = _fresh(tmp, f"mor-table-{tag}")

            def go():
                q = streaming.cdc_mor_sink(
                    streaming.replay_stream(spark, f"{tmp}/cdc", 1).drop("epoch"),
                    table,
                    keys=["key"],
                    seq_col="seq",
                    op_col="op",
                    checkpoint=_fresh(tmp, f"mor-ckpt-{tag}"),
                    compact_every=12,
                )
                assert q.awaitTermination(600)
                streaming.compact_cdc_mor(spark, table, ["key"], "seq")

            return _timed(go)

        run_mor("w")
        wall_mor = min(run_mor("m"), run_mor("n"))

        # Curation ingest lane: the training-data pipeline under volume.
        # sf0.1 documents replicated 10x (1 in 5 replicas keeps the
        # original text, so exact-dup detection does real work; the rest
        # get a replica-unique suffix), streamed through the FULL
        # stream_curation lane — length gate, within-batch dedup,
        # anti-join vs the accumulated accepted store (which GROWS as the
        # run proceeds, the honest part), and PII-masked storage.
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        from pyspark.sql import functions as FF
        from squirtle_spark.operators import curation

        base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        docs10 = (
            base.withColumn("r", FF.explode(FF.sequence(FF.lit(0), FF.lit(9))))
            .select(
                (FF.col("doc_id") * 10 + FF.col("r")).alias("doc_id"),
                FF.when(FF.col("r") % 5 == 0, FF.col("text"))
                .otherwise(FF.concat_ws(" ", "text", FF.concat(FF.lit("rep"), FF.col("r"))))
                .alias("text"),
            )
            .withColumn("epoch", FF.col("doc_id") % 10)
        )
        n_docs = docs10.count()
        streaming.write_epoch_files(docs10, f"{tmp}/cur-docs")

        def run_cur(tag: str) -> float:
            return _timed(
                lambda: curation.stream_curation(
                    spark,
                    f"{tmp}/cur-docs",
                    _fresh(tmp, f"cur-accept-{tag}"),
                    checkpoint=_fresh(tmp, f"cur-ckpt-{tag}"),
                    files_per_trigger=1,
                    redact_pii=True,
                )
            )

        run_cur("w")
        wall_cur = min(run_cur("a"), run_cur("b"))

        # IVF-PQ vs plain-PQ crossover at 10x corpus (VERDICT r6 item 4):
        # at sf0.1 the probe overhead exceeds the pruning win (1.28 s vs
        # 1.00 s), so the pruning claim rested on structure. Here the
        # corpus is replicated 10x (deterministic component perturbation,
        # |delta| <= 0.096 so the IVF packed-argmin bound holds) while
        # the query set stays N_QUERIES — the ADC scan grows 10x for PQ
        # but only ~N_PROBE/N_CELLS of that for IVF-PQ, which is where
        # the FAISS-style composition pays. Recall control: IVF-PQ's
        # top-k overlap vs plain PQ's isolates what pruning loses.
        from squirtle_spark import catalog
        from squirtle_spark.operators import similarity
        from squirtle_spark.registry import load_all

        qs = load_all()

        def ann_dir(mult: int) -> tuple[str, int]:
            """{tmp}/sf{mult}x: embeddings replicated mult x with the
            deterministic component perturbation (|delta| <= 0.096
            regardless of r, so the IVF packed-argmin bound holds)."""
            d = f"{tmp}/sf{mult}x"
            os.makedirs(d, exist_ok=True)
            for t in catalog.TABLES:
                if t != "embeddings":
                    os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
            base_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            n_emb = base_emb.count()
            (
                base_emb.withColumn(
                    "r", FF.explode(FF.sequence(FF.lit(0), FF.lit(mult - 1)))
                )
                .selectExpr(
                    f"r * {n_emb} + vec_id AS vec_id",
                    "transform(embedding, (x, i) -> CAST(x + "
                    "((vec_id * 131 + i * 17 + r * 7) % 97 - 48) * 0.002 AS FLOAT)) "
                    "AS embedding",
                    "label",
                )
                .write.mode("overwrite")
                .parquet(f"{d}/embeddings.parquet")
            )
            return d, n_emb * mult

        def ann_point(d: str, n_cells: int, n_probe: int) -> tuple[float, float, float]:
            """(pq_wall, ivfpq_scaled_wall, recall_vs_pq) at one corpus,
            min-of-3 (the 10x margin proved run-noisy at min-of-2 — the
            first/second r8 recordings put the scaled-IVF win at 17% and
            4% respectively; min-of-3 plus the 30x point below separate
            structure from host noise)."""

            def run_pq() -> float:
                return _timed(
                    lambda: qs["ann_pq_topk"]
                    .spark_fn(spark, d)
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )

            def run_ivfpq() -> float:
                return _timed(
                    lambda: similarity.ann_ivfpq_topk_at(
                        spark, d, n_cells=n_cells, n_probe=n_probe
                    )
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )

            run_pq()  # index builds (cached per session+dir+geometry)
            run_ivfpq()
            wall_pq = min(run_pq() for _ in range(3))
            wall_ivf = min(run_ivfpq() for _ in range(3))
            pq_top = qs["ann_pq_topk"].spark_fn(spark, d).select("q_id", "c_id")
            ivf_top = similarity.ann_ivfpq_topk_at(
                spark, d, n_cells=n_cells, n_probe=n_probe
            ).select("q_id", "c_id")
            overlap = pq_top.join(ivf_top, ["q_id", "c_id"]).count()
            return wall_pq, wall_ivf, overlap / max(pq_top.count(), 1)

        # 10x point (round-7 comparable): cells ~ sqrt(20k) -> 128,
        # probe 32 -> ~25% scan fraction (the registered entry's 16/8
        # defaults scan 50%, sized for the 2k-row oracle fixture).
        dir10, n_emb10 = ann_dir(10)

        def run_ann10(name: str) -> float:
            return _timed(
                lambda: qs[name]
                .spark_fn(spark, dir10)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )

        run_ann10("ann_ivfpq_topk")  # default-geometry build
        wall_ivfpq10 = min(run_ann10("ann_ivfpq_topk"), run_ann10("ann_ivfpq_topk"))
        wall_pq10, wall_ivfpq10s, recall_vs_pq = ann_point(dir10, 128, 32)

        # 30x point: at 60k vectors the full ADC scan is 3x the 10x one
        # while the probed fraction stays ~25% (256 cells / 64 probed) —
        # the pruning win becomes structural, beyond host-noise reach.
        dir30, n_emb30 = ann_dir(30)
        wall_pq30, wall_ivfpq30s, recall30 = ann_point(dir30, 256, 64)

        return {
            "metric": "stress_events_per_sec",
            "value": round(n / wall_q5, 1),
            "unit": "events/sec",
            "events": n,
            "rate_multiplier": events_per_sec // 1000,
            "q5_full_wall_sec": round(wall_q5, 3),
            "q5_full_events_per_sec": round(n / wall_q5, 1),
            "q11_session_wall_sec": round(wall_q11, 3),
            "q11_session_events_per_sec": round(n / wall_q11, 1),
            "q8_events": n_q8,
            "q8_join_wall_sec": round(wall_q8, 3),
            "q8_join_events_per_sec": round(n_q8 / wall_q8, 1),
            "q4_events": n_q4,
            "q4_chained_wall_sec": round(wall_q4, 3),
            "q4_chained_events_per_sec": round(n_q4 / wall_q4, 1),
            "cdc_changes": n,
            "cdc_apply_wall_sec": round(wall_cdc, 3),
            "cdc_apply_changes_per_sec": round(n / wall_cdc, 1),
            "cdc_mor_wall_sec": round(wall_mor, 3),
            "cdc_mor_changes_per_sec": round(n / wall_mor, 1),
            "curation_docs": n_docs,
            "curation_wall_sec": round(wall_cur, 3),
            "curation_docs_per_sec": round(n_docs / wall_cur, 1),
            "ann_corpus_10x_rows": n_emb10,
            "ann_pq_10x_wall_sec": round(wall_pq10, 3),
            "ann_ivfpq_10x_wall_sec": round(wall_ivfpq10, 3),
            "ann_ivfpq_scaled_10x_wall_sec": round(wall_ivfpq10s, 3),
            "ann_ivfpq_scaled_cells_probe": [128, 32],
            "ann_ivfpq_scaled_recall_vs_pq": round(recall_vs_pq, 4),
            "ann_corpus_30x_rows": n_emb30,
            "ann_pq_30x_wall_sec": round(wall_pq30, 3),
            "ann_ivfpq_scaled_30x_wall_sec": round(wall_ivfpq30s, 3),
            "ann_ivfpq_30x_cells_probe": [256, 64],
            "ann_ivfpq_30x_recall_vs_pq": round(recall30, 4),
            "state_operators": state_metrics,
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
