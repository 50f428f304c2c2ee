"""Pure-python bench.py helpers (no Spark): the stdout-line shedding
contract and the round/record discovery that drift attribution relies on.
The measurement paths themselves are exercised by the per-round bench
runs; these guard the plumbing the driver's parse depends on."""

import json

import bench


def _payload(n_queries: int) -> dict:
    return {
        "metric": "headline_total_sec",
        "value": 1.0,
        "unit": "sec",
        "queries": {f"query_{i:03d}": 0.123 for i in range(n_queries)},
        "sf": 0.1,
        "canary": {"cal_sec": 0.1, "max_sec": 0.2, "reruns": 0, "dirty_queries": 0},
        "streaming": {"q5_events_per_sec": 10000.0},
        "drift": {"checked": 0, "noise": 0, "plan_change": 0, "other": []},
        "detail": "BENCH_DETAIL_r99.json",
    }


def test_compact_line_under_cap_sheds_nothing():
    line = bench._compact_line(_payload(40))
    assert len(line) <= 2000
    parsed = json.loads(line)
    assert "queries" in parsed and "shed_to_detail" not in parsed


def test_compact_line_sheds_in_order_until_under_cap():
    # ~400 queries -> ~10 KB of per-query times: queries must survive
    # only if the line fits; optional sections go first, in order.
    line = bench._compact_line(_payload(400))
    assert len(line) <= 2000
    parsed = json.loads(line)
    # mandatory keys always survive
    for key in ("metric", "value", "unit", "sf", "detail"):
        assert key in parsed
    shed = parsed["shed_to_detail"]
    assert shed == ["drift", "streaming", "canary", "queries"][: len(shed)]
    # and the line parses as one JSON object — the driver's whole ask
    assert json.loads(line)["metric"] == "headline_total_sec"


def test_compact_line_does_not_mutate_caller_and_takes_custom_order():
    # the stress path persists the SAME payload dict after rendering —
    # shedding must work on a copy, and the shed order is caller-chosen
    p = {
        "metric": "stress_events_per_sec",
        "value": 1.0,
        "state_operators": {"q8": {"peak_rows": 1}},
        "big": "y" * 3000,
    }
    line = bench._compact_line(p, shed_order=("state_operators", "big"))
    assert len(line) <= 2000
    assert "state_operators" in p and "big" in p  # caller dict intact
    parsed = json.loads(line)
    assert parsed["shed_to_detail"] == ["state_operators", "big"]
    assert parsed["metric"] == "stress_events_per_sec"


def test_round_number_is_stable_across_same_round_reruns():
    # r13 rule: max(newest CORRECTNESS + 1, newest BENCH). Must be past
    # every COMPLETED round (CORRECTNESS is the driver's round-end stamp)
    # and must NOT advance just because this round's own bench record
    # already landed (the r13 --stress rerun stamped r14 under the old
    # BENCH+1 rule).
    import glob
    import os
    import re

    here = os.path.dirname(os.path.abspath(bench.__file__))

    def newest(pat):
        # skip names the round regex doesn't match (e.g. the r15 8-core
        # record BENCH_r15_c8.json), mirroring bench._rounds_glob
        matches = (
            re.search(r"_r(\d+)\.json$", f)
            for f in glob.glob(os.path.join(here, pat))
        )
        return max(int(m.group(1)) for m in matches if m)

    rnd = bench._round_number()
    assert rnd == max(newest("CORRECTNESS_r*.json") + 1, newest("BENCH_r*.json"))
    assert rnd > newest("CORRECTNESS_r*.json")


def test_prev_record_prefers_detail_and_carries_fingerprints():
    rnd, times, fps, aux, watch, fp_ver = bench._prev_record(sf=0.1)
    # a comparable record reports its fingerprint version (a
    # dual-recorded older version or current)
    assert fp_ver in (0, 2, 3, bench.FINGERPRINT_VERSION)
    assert rnd >= 6  # r6 is the oldest parseable full record in the repo
    # never a FUTURE round; its own round is legitimate after this
    # round's first record lands (intra-round re-record drift, as r12's
    # idle-host re-record flow used)
    assert rnd <= bench._round_number()
    assert times  # some per-query seconds
    # once a BENCH_DETAIL exists (written this round), fingerprints ride
    # along; before that the BENCH_r fallback has none — either way the
    # shapes line up
    assert all(isinstance(v, (int, float)) for v in times.values())
    assert all(isinstance(v, str) for v in fps.values())
    assert all(isinstance(v, str) for v in aux.values())
    # the watchlist carries only regressed-* classes from the prior
    # round's drift section (VERDICT r10 item 1)
    assert all(str(c).startswith("regressed") for c in watch.values())


def test_prev_record_skips_other_scale_factors():
    # an sf nobody ever benched at: no record may match — a stray
    # local run at another sf must never poison drift attribution
    rnd, times, fps, aux, watch, fp_ver = bench._prev_record(sf=123.456)
    assert (rnd, times, fps, aux, watch, fp_ver) == (0, {}, {}, {}, {}, 0)


def test_rounds_glob_skips_nonnumeric_names(tmp_path, monkeypatch):
    # an editor backup or hand-named file matching the glob must be
    # SKIPPED, not crash the sort key (ADVICE r8: the unguarded
    # re.search(...).group(1) aborted the whole run post-measurement)
    for n in ("BENCH_r03.json", "BENCH_rX.json", "BENCH_r.json"):
        (tmp_path / n).write_text("{}")
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    got = bench._rounds_glob("BENCH_r*.json")
    assert got == [(3, str(tmp_path / "BENCH_r03.json"))]


def test_plan_fingerprint_v3_stable_under_session_aging(spark, sf_dir):
    """Multi-COUNT(DISTINCT) plans render with permuted Expand gid slots
    as session state moves (r11: dq_profile/interval_overlap_join showed
    v2 'plan-changes' that were pure permutations of the identical
    plan). The gid canonicalization (v3-legacy and v4) must hash those
    renders identically; for gid-free plans v4 == the v2 text hash BY
    CONSTRUCTION — the load-bearing invariant the fp_gid_artifact
    gating depends on (ADVICE r11: v3 broke it by dropping the plan's
    trailing newline, so v3 != v2 for every plan and the gate was
    vacuously true; this assertion would have caught it)."""
    from squirtle_spark.registry import load_all

    qs = load_all()
    before = {
        n: bench._plan_fingerprint(qs[n].spark_fn(spark, sf_dir))
        for n in ("dq_profile", "interval_overlap_join", "tpch_q6")
    }
    # age the session: plan+run a few unrelated queries
    for other in ("tfidf_top_terms", "bm25_topk", "agg_event_stats"):
        qs[other].spark_fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    after = {
        n: bench._plan_fingerprint(qs[n].spark_fn(spark, sf_dir))
        for n in ("dq_profile", "interval_overlap_join", "tpch_q6")
    }
    for n in before:
        assert before[n]["v3"] == after[n]["v3"], n
        assert before[n]["v4"] == after[n]["v4"], n
    # a gid-free plan is untouched by the gid pass: v4 must equal the
    # v2 text hash byte-for-byte (trailing newline preserved), v2 must
    # stay stable, and has_gid must say the pass didn't touch it
    assert before["tpch_q6"]["v2"] == after["tpch_q6"]["v2"]
    assert before["tpch_q6"]["v4"] == before["tpch_q6"]["v2"]
    assert not before["tpch_q6"]["has_gid"]
    # the gid-bearing plans ARE touched: v4 != v2 there, and has_gid
    # records it (the artifact gate keys on this boolean, not on hash
    # inequality, which the newline bug proved too blunt)
    assert before["dq_profile"]["has_gid"]
    assert before["interval_overlap_join"]["has_gid"]


def test_stress_classifier_noise_floor_comes_from_canary():
    """VERDICT r11 #6: with a canary window recorded, the noise
    adjudication must key on the canary's relative spread (host
    evidence), not the lane's own 2-3-sample min/max; without one
    (pre-r12 artifacts) the legacy spread rule still applies."""
    prev = {"x_wall_sec": 10.0}

    def stats(mn, mx, canary_spread=None):
        s = {
            "n_samples": 3,
            "samples_sec": [mx, (mn + mx) / 2, mn],
            "min_sec": mn,
            "max_sec": mx,
            "dirty": False,
        }
        if canary_spread is not None:
            s["canary_rel_spread"] = canary_spread
        return s

    # delta -30%; canary window spread 16% -> floor 32% >= 30% -> noise
    d = bench._classify_stress_drift(
        11, prev, {"x": stats(7.0, 7.2, canary_spread=0.16)}, changed={}
    )
    row = d["beyond_tolerance"]["x"]
    assert row["class"] == "noise" and "canary noise floor" in row["evidence"]
    assert row["canary_noise_floor_pct"] == 32.0

    # same delta; canary quiet (2%) -> floor 4% < 30% -> improved, even
    # though the lane's OWN spread (7.0..7.2 vs a hypothetical wide one)
    # no longer gets a say
    d = bench._classify_stress_drift(
        11, prev, {"x": stats(7.0, 9.9, canary_spread=0.02)}, changed={}
    )
    assert d["beyond_tolerance"]["x"]["class"] == "improved"

    # no canary window recorded (legacy artifact): spread rule applies
    d = bench._classify_stress_drift(11, prev, {"x": stats(7.0, 9.9)}, changed={})
    row = d["beyond_tolerance"]["x"]
    assert row["class"] == "noise" and "legacy rule" in row["evidence"]


def test_stress_noise_watch_carries_baseline_and_catches_launder():
    """Stress/stream lanes record min-of-N directly, so a real
    regression classed 'noise' in a hot window would become the next
    round's comparison base. A prior noise row on a large delta must
    force a row even when the new delta is within tolerance, adjudicated
    against the PRE-NOISE baseline: reverted -> noise-reverted; still
    elevated on a quiet canary -> regressed-vs-baseline; still elevated
    on a jittery canary -> noise-sustained (watch renews)."""

    def prev_record(prev_wall, noise_delta_pct):
        return {
            "x_wall_sec": prev_wall,
            "drift": {
                "beyond_tolerance": {
                    "x": {
                        "class": "noise",
                        "delta_pct": noise_delta_pct,
                        "prev_round": 11,
                        "prev_wall_sec": 10.0,  # the pre-noise baseline
                    }
                }
            },
        }

    def stats(mn, canary_spread):
        return {
            "n_samples": 3,
            "samples_sec": [mn, mn, mn],
            "min_sec": mn,
            "max_sec": mn,
            "dirty": False,
            "canary_rel_spread": canary_spread,
        }

    # prior round: 10.0 -> 12.5 classed noise. Now 12.4 (within tol of
    # 12.5) on a QUIET canary but still +24% over the 10.0 baseline:
    # the launder is caught.
    d = bench._classify_stress_drift(
        12, prev_record(12.5, 25.0), {"x": stats(12.4, 0.02)}, changed={}
    )
    row = d["beyond_tolerance"]["x"]
    assert row["class"] == "regressed-vs-baseline"
    assert row["baseline_wall_sec"] == 10.0 and row["baseline_round"] == 11

    # same but the wall reverted to the baseline: debt closed
    d = bench._classify_stress_drift(
        12, prev_record(12.5, 25.0), {"x": stats(10.2, 0.02)}, changed={}
    )
    assert d["beyond_tolerance"]["x"]["class"] == "noise-reverted"

    # still elevated but THIS window's canary is jittery too (floor 2 x
    # 0.15 = 30% >= the 24% baseline delta, raw floor under the cap): renew
    d = bench._classify_stress_drift(
        12, prev_record(12.5, 25.0), {"x": stats(12.4, 0.15)}, changed={}
    )
    assert d["beyond_tolerance"]["x"]["class"] == "noise-sustained"

    # ADVICE r13: raw floor BEYOND the cap (2 x 0.5 = 100% > 50%) can
    # certify nothing — not "regressed on a QUIET canary", not noise via
    # the capped floor; the forced row must say so and renew the watch
    d = bench._classify_stress_drift(
        12, prev_record(12.5, 25.0), {"x": stats(12.4, 0.5)}, changed={}
    )
    row = d["beyond_tolerance"]["x"]
    assert row["class"] == "unmeasurable"
    assert "QUIET" not in row["evidence"]

    # ...and an unmeasurable slowdown row carries the watch next round
    # exactly like a noise one (it recorded min-of-N as the new base too)
    prev = prev_record(12.5, 25.0)
    prev["drift"]["beyond_tolerance"]["x"]["class"] = "unmeasurable"
    d = bench._classify_stress_drift(12, prev, {"x": stats(12.4, 0.02)}, changed={})
    assert d["beyond_tolerance"]["x"]["class"] == "regressed-vs-baseline"

    # a prior noise row on an IMPROVEMENT (or small delta) forces nothing
    d = bench._classify_stress_drift(
        12, prev_record(10.3, 3.0), {"x": stats(10.2, 0.02)}, changed={}
    )
    assert "x" not in d["beyond_tolerance"]


def test_stress_watch_rebases_artifact_baselines():
    """VERDICT r13 #4: the q5_full/q11_session watch carried r11 baseline
    walls the r13 interleaved A/B proved unreproducible even by r11 code
    (fast-window artifact) — a watch that could never close. The watch
    must adjudicate against the A/B-certified band (STRESS_BASELINE_REBASE)
    and record that it did."""
    prev = {
        "q5_full_wall_sec": 4.652,
        "drift": {
            "beyond_tolerance": {
                "q5_full": {
                    "class": "noise-sustained",
                    "delta_pct": 5.4,
                    "prev_round": 12,
                    "prev_wall_sec": 4.415,
                    "baseline_round": 11,
                    "baseline_wall_sec": 3.489,  # the artifact record
                    "baseline_delta_pct": 33.3,
                }
            }
        },
    }
    stats = {
        "q5_full": {
            "n_samples": 3,
            "samples_sec": [4.6, 4.62, 4.65],
            "min_sec": 4.6,
            "max_sec": 4.65,
            "dirty": False,
            "canary_rel_spread": 0.02,
        }
    }
    d = bench._classify_stress_drift(13, prev, stats, changed={})
    row = d["beyond_tolerance"]["q5_full"]
    # vs the rebased 4.05s band, 4.6 is +13.6% — inside tolerance: the
    # watch finally closes instead of renewing against the dead 3.489
    assert row["baseline_round"] == 13
    assert row["baseline_wall_sec"] == 4.05
    assert row["class"] == "noise-reverted"
    assert "AB_ADJUDICATION_r13" in row["baseline_rebased"]

    # a lane NOT in the rebase map keeps its carried baseline
    prev2 = {
        "other_wall_sec": 4.652,
        "drift": {
            "beyond_tolerance": {
                "other": dict(
                    prev["drift"]["beyond_tolerance"]["q5_full"]
                )
            }
        },
    }
    stats2 = {"other": dict(stats["q5_full"])}
    d2 = bench._classify_stress_drift(13, prev2, stats2, changed={})
    row2 = d2["beyond_tolerance"]["other"]
    assert row2["baseline_round"] == 11 and "baseline_rebased" not in row2


def test_host_load_stamp_reads_proc_loadavg():
    """_host_load reads real /proc/loadavg and applies the settled-host
    thresholds the measurement discipline documents (1m < 0.3, 5m < 0.5)
    — the stamp that makes an unsettled record machine-visible instead
    of letting it masquerade as a quiet one (r14: the first bench run at
    5-min load 0.84 convicted four queries the settled re-run acquitted).
    """
    h = bench._host_load()
    assert h is not None  # CI runs on Linux
    assert set(h) == {"load_1m", "load_5m", "settled"}
    assert h["load_1m"] >= 0.0 and h["load_5m"] >= 0.0
    assert h["settled"] == (
        h["load_1m"] < bench._SETTLED_1M and h["load_5m"] < bench._SETTLED_5M
    )


def test_settle_gate_settled_start_no_wait():
    """A settled start passes through instantly with the gate stamped
    settled-at-start (VERDICT r14 #1: the gate exists so driver-run
    records are settled by construction, not by luck)."""
    load = {"load_1m": 0.0, "load_5m": 0.1, "settled": True}
    out, stamp = bench._settle_gate(load)
    assert out is load
    assert stamp == {"waited_s": 0, "outcome": "settled-at-start"}


def test_settle_gate_times_out_with_honest_stamp(monkeypatch):
    """An unsettled host that never quiets inside the bound proceeds —
    the gate must not hang the driver — but stamps wait-timeout so the
    record can't masquerade as quiet."""
    monkeypatch.setenv("SPARK_GRAFT_SETTLE_WAIT_S", "0.05")
    monkeypatch.setattr(bench, "_SETTLE_POLL_S", 0.01)
    busy = {"load_1m": 9.0, "load_5m": 9.0, "settled": False}
    monkeypatch.setattr(bench, "_host_load", lambda: dict(busy))
    out, stamp = bench._settle_gate(dict(busy))
    assert out["settled"] is False
    assert stamp["outcome"] == "wait-timeout"
    assert stamp["waited_s"] >= 0.05


def test_settle_gate_returns_when_host_quiets(monkeypatch):
    """The gate polls and returns the first settled reading."""
    monkeypatch.setenv("SPARK_GRAFT_SETTLE_WAIT_S", "5")
    monkeypatch.setattr(bench, "_SETTLE_POLL_S", 0.01)
    readings = iter(
        [
            {"load_1m": 2.0, "load_5m": 1.0, "settled": False},
            {"load_1m": 0.1, "load_5m": 0.2, "settled": True},
        ]
    )
    monkeypatch.setattr(bench, "_host_load", lambda: next(readings))
    busy = {"load_1m": 3.0, "load_5m": 2.0, "settled": False}
    out, stamp = bench._settle_gate(busy)
    assert out["settled"] is True
    assert stamp["outcome"] == "settled-after-wait"


def test_settle_gate_disabled_and_unavailable(monkeypatch):
    """SPARK_GRAFT_NO_SETTLE_WAIT=1 skips the wait (CI); a None load
    (off-Linux) is stamped load-unavailable, never waited on."""
    monkeypatch.setenv("SPARK_GRAFT_NO_SETTLE_WAIT", "1")
    busy = {"load_1m": 9.0, "load_5m": 9.0, "settled": False}
    out, stamp = bench._settle_gate(dict(busy))
    assert stamp["outcome"] == "disabled" and out["settled"] is False
    monkeypatch.delenv("SPARK_GRAFT_NO_SETTLE_WAIT")
    out, stamp = bench._settle_gate(None)
    assert out is None and stamp["outcome"] == "load-unavailable"


def test_settled_verdict_distinguishes_unknown_from_unsettled():
    """host_settled must be None (unknown) when /proc/loadavg was
    unavailable, not False — ADVICE r14: a valid record taken on a
    non-Linux host must not be permanently classed as suspect."""
    assert bench._settled_verdict(None) is None
    assert (
        bench._settled_verdict({"load_1m": 0.0, "load_5m": 0.0, "settled": True})
        is True
    )
    assert (
        bench._settled_verdict({"load_1m": 9.0, "load_5m": 9.0, "settled": False})
        is False
    )


def test_round_flag_rejects_missing_or_bad_value(monkeypatch):
    """--round with no value or a non-integer exits with a usable error
    message instead of a bare IndexError/ValueError (ADVICE r14)."""
    import pytest

    monkeypatch.setattr(bench.sys, "argv", ["bench.py", "--round"])
    with pytest.raises(SystemExit, match="--round requires an integer"):
        bench._round_number()
    monkeypatch.setattr(bench.sys, "argv", ["bench.py", "--round", "abc"])
    with pytest.raises(SystemExit, match="--round requires an integer"):
        bench._round_number()


def test_canary_p50_ratio_reads_prior_record_and_handles_missing(
    tmp_path, monkeypatch
):
    """The r15 throughput-floor stamp: ratio of this run's canary p50 to
    the drift baseline record's, using _prev_record's selection rule
    (newest same-sf, earlier-round BENCH_DETAIL). A degraded host reads
    well above 1.0 even when loadavg says settled — the class the r15
    closing record exhibited (p50 0.084 vs 0.063-0.071).

    Hermetic (ADVICE r15): a synthetic prior-round record in a tmp dir
    via a monkeypatched _rounds_glob, so pruning historical artifacts or
    running pytest from another cwd can't break the test."""
    import json

    class _FakeCanary:
        def __init__(self, p50):
            self._p50 = p50

        def stats(self, reruns):
            return {"p50_sec": self._p50}

    prior = tmp_path / "BENCH_DETAIL_r07.json"
    prior.write_text(json.dumps({"sf": 0.1, "canary": {"p50_sec": 0.07}}))
    current = tmp_path / "BENCH_DETAIL_r08.json"  # own-round: must be skipped
    current.write_text(json.dumps({"sf": 0.1, "canary": {"p50_sec": 0.5}}))

    def fake_glob(pattern):
        if pattern.startswith("BENCH_DETAIL"):
            return [(7, str(prior)), (8, str(current))]
        return []

    monkeypatch.setattr(bench, "_rounds_glob", fake_glob)
    monkeypatch.setattr(bench, "_round_number", lambda: 8)
    # ratio is literally p50 / prior-record p50 (own-round record ignored)
    assert bench._canary_p50_ratio(_FakeCanary(0.084), sf=0.1) == round(
        0.084 / 0.07, 3
    )
    # no prior record at a never-benched sf -> None, not a crash
    assert bench._canary_p50_ratio(_FakeCanary(0.084), sf=123.456) is None
    # a canary with no samples (p50 absent/zero) -> None
    assert bench._canary_p50_ratio(_FakeCanary(0.0), sf=0.1) is None
