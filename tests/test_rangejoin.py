"""Bucketed range join vs the naive theta join on adversarial boundaries.

The interval-bucketing rewrite is only correct if a pair can never (a)
fall outside both buckets the left row owns, or (b) meet in two buckets
at once. The killer inputs are timestamps exactly ON bucket edges and
pairs exactly W apart (inclusive end) or W±1µs — the sf-fixture oracle
rarely produces those, so they are constructed here and checked against
the straightforward inequality join Spark itself plans (BNLJ is fine at
200 rows; the operator exists precisely so that plan never runs at scale).
"""

import datetime as dt
import random

from pyspark.sql import functions as F

from squirtle_spark.operators.rangejoin import range_join_window

W = 3600


def _frame(spark, rows, ts_name, id_name):
    return spark.createDataFrame(
        [(i, t, i % 7) for i, t in enumerate(rows)],
        f"{id_name} LONG, {ts_name} TIMESTAMP_NTZ, key LONG",
    )


def test_bucketed_range_join_equals_naive_on_boundaries(spark):
    rng = random.Random(11)
    base = dt.datetime(2024, 3, 1)
    lefts, rights = [], []
    for k in range(40):
        edge = base + dt.timedelta(seconds=k * W)
        lefts += [edge, edge - dt.timedelta(microseconds=1)]
        rights += [
            edge,
            edge + dt.timedelta(seconds=W),  # exactly W after an edge left
            edge + dt.timedelta(seconds=W, microseconds=1),  # just outside
            edge + dt.timedelta(seconds=W, microseconds=-1),  # just inside
        ]
    lefts += [
        base + dt.timedelta(seconds=rng.randrange(0, 50 * W), microseconds=rng.randrange(10**6))
        for _ in range(60)
    ]
    rights += [
        base + dt.timedelta(seconds=rng.randrange(0, 50 * W), microseconds=rng.randrange(10**6))
        for _ in range(60)
    ]
    left = _frame(spark, lefts, "l_ts", "l_id")
    right = _frame(spark, rights, "r_ts", "r_id")

    got = range_join_window(left, right, "key", "l_ts", "r_ts", W).select(
        "l_id", "r_id"
    )
    naive = left.join(
        right,
        (left["key"] == right["key"])
        & (right["r_ts"] >= left["l_ts"])
        & (right["r_ts"] <= left["l_ts"] + F.expr(f"INTERVAL {W} SECOND")),
    ).select("l_id", "r_id")

    got_rows = sorted(map(tuple, got.collect()))
    naive_rows = sorted(map(tuple, naive.collect()))
    assert len(got_rows) == len(set(got_rows)), "duplicate pairs from bucketing"
    assert got_rows == naive_rows
    assert len(got_rows) > 0


def test_interval_overlap_join_equals_naive_on_boundaries(spark):
    """Overlap join: adversarial interval sets — endpoints ON bucket edges,
    intervals exactly touching (closed-endpoint overlap), 1µs apart, and
    zero-length intervals — must match the naive theta join pair-for-pair,
    with no pair produced twice (single-meeting-bucket property)."""
    from squirtle_spark.operators.rangejoin import interval_overlap_join

    rng = random.Random(23)
    base = dt.datetime(2024, 3, 1)
    max_len = 1800

    def mk(n_edge, n_rand, len_choices):
        out = []
        for k in range(n_edge):
            edge = base + dt.timedelta(seconds=k * max_len)
            ln = len_choices[k % len(len_choices)]
            # start on the edge, just before, and ending exactly on an edge
            out += [
                (edge, edge + dt.timedelta(seconds=ln)),
                (edge - dt.timedelta(microseconds=1), edge + dt.timedelta(seconds=ln)),
                (edge - dt.timedelta(seconds=ln), edge),  # touches the edge
                (edge, edge),  # zero-length
            ]
        for _ in range(n_rand):
            s = base + dt.timedelta(
                seconds=rng.randrange(0, 30 * max_len), microseconds=rng.randrange(10**6)
            )
            out.append((s, s + dt.timedelta(seconds=rng.choice(len_choices))))
        return out

    def frame(intervals, pre):
        return spark.createDataFrame(
            [(i, s, e, i % 5) for i, (s, e) in enumerate(intervals)],
            f"{pre}_id LONG, {pre}_start TIMESTAMP_NTZ, {pre}_end TIMESTAMP_NTZ, key LONG",
        )

    left = frame(mk(20, 50, [900, 1800]), "l")
    right = frame(mk(20, 50, [450, 1800]), "r")

    got = interval_overlap_join(
        left, right, "key", "l_start", "l_end", "r_start", "r_end", max_len
    ).select("l_id", "r_id")
    naive = left.join(
        right,
        (left["key"] == right["key"])
        & (left["l_start"] <= right["r_end"])
        & (right["r_start"] <= left["l_end"]),
    ).select("l_id", "r_id")

    got_rows = sorted(map(tuple, got.collect()))
    naive_rows = sorted(map(tuple, naive.collect()))
    assert len(got_rows) == len(set(got_rows)), "duplicate pairs from bucketing"
    assert got_rows == naive_rows
    assert len(got_rows) > 0
