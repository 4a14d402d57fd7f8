"""Event-time operator suite: semantics + physical-plan pins.

Semantics are checked against brute-force pandas/numpy references on
synthetic frames with adversarial boundaries (exact-gap sessions,
tied-timestamp as-of matches, interval edges on bucket boundaries).
Plan pins assert the scale-critical shapes: as-of join and
sessionization cost ONE exchange, the range join never degrades to a
nested-loop join, and the HLL sketch's shuffle carries registers, not
values.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rifflux_spark.operators.events import (
    asof_join,
    hll_distinct,
    micros,
    range_join_buckets,
    rollup_chain,
    sessionize,
    vmicro,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    """rows: (event_id, user_id, offset_sec, event_type, value)."""
    data = [
        (eid, uid, T0 + dt.timedelta(seconds=off), etype, val)
        for (eid, uid, off, etype, val) in rows
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def explain_str(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_exchanges(plan: str) -> int:
    return len(set(re.findall(r"Exchange \(\d+\)", plan)))


# ---------------------------------------------------------------- sessionize


def test_sessionize_gap_semantics(spark) -> None:
    gap = 60
    rows = [
        # user 1: events at 0, exactly-gap 60 (same session: strictly >),
        # 121 (gap 61 -> new session), 150
        (1, 1, 0, "view", 1.0),
        (2, 1, 60, "view", 2.0),
        (3, 1, 121, "view", 3.0),
        (4, 1, 150, "view", 4.0),
        # user 2: single event
        (5, 2, 10, "view", 0.5),
    ]
    out = (
        sessionize(_ev(spark, rows), gap_sec=gap)
        .orderBy("user_id", "session_seq")
        .collect()
    )
    assert [(r.user_id, r.session_seq, r.n_events) for r in out] == [
        (1, 1, 2),
        (1, 2, 2),
        (2, 1, 1),
    ]
    s11 = out[0]
    assert s11.duration_sec == 60.0 and s11.sum_value == 3.0
    assert out[2].duration_sec == 0.0


def test_sessionize_single_exchange(spark) -> None:
    rows = [(i, i % 3, i * 7, "view", 1.0) for i in range(30)]
    plan = explain_str(sessionize(_ev(spark, rows)))
    # ONE exchange total: hashpartitioning(k) also satisfies the
    # (k, session_seq) groupBy's ClusteredDistribution, so the final
    # aggregate runs in place
    assert n_exchanges(plan) == 1, plan


# ----------------------------------------------------------------- asof join


def _brute_asof(left, right):
    # left/right: list of dicts; returns {left_event_id: right row or None}
    out = {}
    for l in left:
        cands = [
            r
            for r in right
            if r["user_id"] == l["user_id"] and r["ts_us"] <= l["ts_us"]
        ]
        if not cands:
            out[l["event_id"]] = None
        else:
            best_ts = max(r["ts_us"] for r in cands)
            at_ts = [r for r in cands if r["ts_us"] == best_ts]
            out[l["event_id"]] = max(at_ts, key=lambda r: r["pevent"])
    return out


def test_asof_join_matches_bruteforce_with_ties(spark) -> None:
    # right rows at 100 and 200; left rows BEFORE any right, exactly AT a
    # right instant (tie -> inclusive match), between, and after; plus two
    # right rows at the same instant (tiebreak -> max event id).
    left_rows = [
        (1, 1, 50, "click", 0.0),
        (2, 1, 100, "click", 0.0),
        (3, 1, 150, "click", 0.0),
        (4, 1, 250, "click", 0.0),
        (5, 2, 100, "click", 0.0),
    ]
    right_rows = [
        (10, 1, 100, "purchase", 1.5),
        (11, 1, 200, "purchase", 2.5),
        (12, 2, 100, "purchase", 3.5),
        (13, 2, 100, "purchase", 4.5),  # same instant as 12: must win
    ]
    left = _ev(spark, left_rows).select(
        "event_id", "user_id", micros("ts").alias("ts_us")
    )
    right = _ev(spark, right_rows).select(
        "user_id",
        micros("ts").alias("ts_us"),
        F.col("event_id").alias("pevent"),
        F.col("value").alias("pvalue"),
    )
    out = asof_join(
        left,
        right,
        key="user_id",
        ts_us="ts_us",
        right_payload=["pevent", "pvalue"],
        right_tiebreak="pevent",
    ).collect()
    got = {
        r.event_id: (None if r._asof is None else r._asof.pevent) for r in out
    }
    brute = _brute_asof(
        [r.asDict() for r in left.collect()],
        [r.asDict() for r in right.collect()],
    )
    want = {k: (None if v is None else v["pevent"]) for k, v in brute.items()}
    assert got == want
    assert got[1] is None  # before any right row
    assert got[2] == 10  # tie at the same instant matches (<=)
    assert got[5] == 13  # same-instant right rows resolve to max tiebreak


def test_sessionize_bucketed_identity(spark) -> None:
    """sessionize_bucketed is bit-identical to sessionize for every
    bucket size — including buckets that slice sessions mid-flight
    (every session crosses boundaries, exercising the chain merge),
    exact-gap events straddling a bucket edge, and one giant bucket."""
    import random

    from rifflux_spark.operators.events import sessionize_bucketed

    rng = random.Random(23)
    # hot key 1 with dense + sparse stretches; keys 2-4 sparse
    rows = []
    t, eid = 0, 0
    for _ in range(300):
        t += rng.choice([1, 5, 40, 99, 100, 101, 350])
        rows.append((eid, 1, t, "click", rng.random()))
        eid += 1
    for u in (2, 3, 4):
        t = rng.randrange(0, 500)
        for _ in range(40):
            t += rng.choice([2, 60, 100, 101, 250])
            rows.append((eid, u, t, "click", rng.random()))
            eid += 1
    # exact-gap pair straddling the 7-second bucket edge: ts 6 and 106
    # with gap_sec=100 must stay ONE session at every bucket size
    rows += [(eid, 5, 6, "click", 1.0), (eid + 1, 5, 106, "click", 2.0)]
    ev = _ev(spark, rows)
    want = sorted(
        tuple(r)
        for r in sessionize(ev, gap_sec=100).collect()
    )
    for bucket_sec in (7, 100, 311, 100_000):
        got = sorted(
            tuple(r)
            for r in sessionize_bucketed(
                ev, gap_sec=100, bucket_sec=bucket_sec
            ).collect()
        )
        assert got == want, f"bucket_sec={bucket_sec}"


def test_sessionize_bucketed_windows_over_bucket(spark) -> None:
    from rifflux_spark.operators.events import sessionize_bucketed

    ev = _ev(spark, [(i, 1, i * 9, "click", 0.5) for i in range(40)])
    plan = explain_str(sessionize_bucketed(ev, gap_sec=30, bucket_sec=60))
    assert re.search(r"windowspecdefinition\(k\S*, _b", plan), plan
    assert "CartesianProduct" not in plan


def test_asof_join_bucketed_identity(spark) -> None:
    """asof_join_bucketed is semantics-identical to asof_join for EVERY
    bucket size — including buckets smaller than event spacing (every
    match crosses buckets, exercising the fallback carry), buckets that
    split tied instants from their left rows, and one giant bucket
    (pure stage-1)."""
    import random

    from rifflux_spark.operators.events import asof_join_bucketed

    rng = random.Random(17)
    # hot key 1 carries half the corpus; keys 2-5 share the rest.
    left_rows = [
        (i, 1 if i % 2 == 0 else 2 + (i % 4), rng.randrange(0, 5000), "click", 0.0)
        for i in range(160)
    ]
    right_rows = [
        (1000 + i, 1 if i % 2 == 0 else 2 + (i % 4), rng.randrange(0, 5000), "purchase", float(i))
        for i in range(120)
    ]
    # adversarial: tied instants across the two sides and inside right
    left_rows += [(500, 1, 1234, "click", 0.0), (501, 9, 50, "click", 0.0)]
    right_rows += [(2000, 1, 1234, "purchase", 9.0), (2001, 1, 1234, "purchase", 8.0)]
    left = _ev(spark, left_rows).select(
        "event_id", "user_id", micros("ts").alias("ts_us")
    )
    right = _ev(spark, right_rows).select(
        "user_id",
        micros("ts").alias("ts_us"),
        F.col("event_id").alias("pevent"),
        F.col("value").alias("pvalue"),
    )
    args = (left, right, "user_id", "ts_us", ["pevent", "pvalue"], "pevent")
    want = sorted(
        (r.event_id, None if r._asof is None else (r._asof.pevent, r._asof.pvalue))
        for r in asof_join(*args).collect()
    )
    for bucket_sec in (1, 7, 311, 10_000):
        got = sorted(
            (r.event_id, None if r._asof is None else (r._asof.pevent, r._asof.pvalue))
            for r in asof_join_bucketed(*args, bucket_sec=bucket_sec).collect()
        )
        assert got == want, f"bucket_sec={bucket_sec}"


def test_asof_join_bucketed_parallelizes_hot_key(spark) -> None:
    """The scale contract: stage 1 windows over (key, bucket) — visible
    in the plan as a window partition spec that includes the bucket
    column — and nothing degrades to a nested-loop join."""
    from rifflux_spark.operators.events import asof_join_bucketed

    left = _ev(spark, [(i, 1, i * 3, "click", 0.0) for i in range(30)]).select(
        "event_id", "user_id", micros("ts").alias("ts_us")
    )
    right = _ev(
        spark, [(100 + i, 1, i * 5, "purchase", 1.0) for i in range(30)]
    ).select(
        "user_id",
        micros("ts").alias("ts_us"),
        F.col("event_id").alias("pevent"),
        F.col("value").alias("pvalue"),
    )
    df = asof_join_bucketed(
        left, right, "user_id", "ts_us", ["pevent", "pvalue"], "pevent", bucket_sec=10
    )
    plan = explain_str(df)
    assert re.search(r"windowspecdefinition\(k\S*, _b", plan), plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_single_exchange(spark) -> None:
    left = _ev(spark, [(i, i % 4, i * 3, "click", 0.0) for i in range(20)]).select(
        "event_id", "user_id", micros("ts").alias("ts_us")
    )
    right = _ev(
        spark, [(100 + i, i % 4, i * 5, "purchase", 1.0) for i in range(20)]
    ).select(
        "user_id",
        micros("ts").alias("ts_us"),
        F.col("event_id").alias("pevent"),
        F.col("value").alias("pvalue"),
    )
    plan = explain_str(
        asof_join(left, right, "user_id", "ts_us", ["pevent", "pvalue"], "pevent")
    )
    assert n_exchanges(plan) == 1, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------- range join


def test_range_join_boundary_semantics(spark) -> None:
    win_us = 60_000_000  # 60 s window, bucket width == window width
    ev = _ev(
        spark,
        [
            (1, 1, 100, "error", 0.0),  # interval [100s, 160s)
            # probes: at start (in), 1us before end (in), exactly end (out),
            # before start (out), different user (out)
            (2, 1, 100, "click", 1.0),
            (3, 1, 159, "click", 2.0),
            (4, 1, 160, "click", 4.0),
            (5, 1, 99, "click", 8.0),
            (6, 2, 120, "click", 16.0),
            # second interval with zero hits must still appear
            (7, 1, 1000, "error", 0.0),
        ],
    )
    intervals = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        micros("ts").alias("start_us"),
        (micros("ts") + F.lit(win_us)).alias("end_us"),
    )
    # nudge probe 3 to 1us before the window end to hit the exclusive edge
    probe = (
        ev.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            # event 3 sits at offset 159 s; push it to 1 us before the
            # window end (offset 160 s) to hit the exclusive edge
            F.when(F.col("event_id") == 3, micros("ts") + F.lit(999_999))
            .otherwise(micros("ts"))
            .alias("ts_us"),
            vmicro("value").alias("vmic"),
        )
    )
    out = {
        r.interval_id: (r.n_hits, r.sum_value)
        for r in range_join_buckets(
            intervals, probe, key="user_id", bucket_us=win_us
        ).collect()
    }
    assert out[1] == (2, 3.0)  # probes 2 and 3 only
    assert out[7] == (0, 0.0)  # zero-hit interval preserved


def test_range_join_is_hash_join_not_nested_loop(spark) -> None:
    ev = _ev(spark, [(i, i % 5, i * 11, ("error" if i % 3 == 0 else "click"), 1.0) for i in range(60)])
    intervals = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        micros("ts").alias("start_us"),
        (micros("ts") + F.lit(60_000_000)).alias("end_us"),
    )
    probe = ev.filter(F.col("event_type") == "click").select(
        "user_id", micros("ts").alias("ts_us"), vmicro("value").alias("vmic")
    )
    plan = explain_str(
        range_join_buckets(intervals, probe, key="user_id", bucket_us=60_000_000)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# -------------------------------------------------------------- rollup chain


def test_rollup_chain_equals_direct_aggregation(spark) -> None:
    import random

    rng = random.Random(7)
    rows = [
        (
            i,
            i % 4,
            rng.randrange(0, 3 * 86_400),
            rng.choice(["a", "b"]),
            round(rng.uniform(0, 10), 2),
        )
        for i in range(400)
    ]
    ev = _ev(spark, rows)
    chained = rollup_chain(ev)
    day_us = 86_400_000_000
    direct_day = (
        ev.select(
            F.col("event_type"),
            ((micros("ts") - micros("ts") % day_us) ).alias("bucket_start_us"),
            vmicro("value").alias("vmic"),
        )
        .groupBy("event_type", "bucket_start_us")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (F.sum("vmic") / F.lit(1e6)).alias("sum_value"),
        )
    )
    got = {
        (r.event_type, r.bucket_start_us): (r.n_events, r.sum_value)
        for r in chained.filter(F.col("level") == "day").collect()
    }
    want = {
        (r.event_type, r.bucket_start_us): (r.n_events, r.sum_value)
        for r in direct_day.collect()
    }
    assert got == want
    # hour level sums to the day level exactly
    hours = chained.filter(F.col("level") == "hour").collect()
    by_day: dict[tuple, float] = {}
    for r in hours:
        k = (r.event_type, r.bucket_start_us - r.bucket_start_us % day_us)
        by_day[k] = by_day.get(k, 0.0) + r.sum_value
    for k, v in by_day.items():
        assert math.isclose(v, want[k][1], rel_tol=0, abs_tol=1e-9)


# ------------------------------------------------------------------- HLL


def _hll_reference(values, p=9):
    m = 1 << p
    regs = [0] * m
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        v1 = int(h[:8], 16)
        w = int(h[8:16], 16)
        rho = 33 if w == 0 else 33 - w.bit_length()
        b = v1 % m
        regs[b] = max(regs[b], rho)
    s_scaled = sum(1 << (33 - r) for r in regs)
    n_nonzero = sum(1 for r in regs if r > 0)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = round(alpha * m * m * float(1 << 33) / s_scaled, 3)
    return n_nonzero, s_scaled, est


def test_hll_matches_reference_and_linear_count_is_accurate(spark) -> None:
    rows = [(i, i % 97, i, "t", 1.0) for i in range(600)]  # 97 distinct users
    ev = _ev(spark, rows)
    out = hll_distinct(ev, group="event_type", col="user_id", p=9).collect()
    assert len(out) == 1
    r = out[0]
    n_nonzero, s_scaled, est = _hll_reference(list({u % 97 for u in range(600)}))
    assert (r.n_nonzero, r.s_scaled, r.est_raw) == (n_nonzero, s_scaled, est)
    # corrected linear-counting estimate (the regime for 97 << 512)
    lin = 512 * math.log(512 / (512 - r.n_nonzero))
    assert abs(lin - 97) / 97 < 0.10


def test_hll_shuffle_carries_registers_not_values(spark) -> None:
    rows = [(i, i % 50, i, "t" if i % 2 else "u", 1.0) for i in range(200)]
    df = hll_distinct(_ev(spark, rows), group="event_type", col="user_id", p=9)
    plan = explain_str(df)
    # two aggregations (group,bucket max-rho; group rollup), each with a
    # map-side partial: at most two exchanges, and the first one is keyed
    # on the register bucket, not the raw value
    assert n_exchanges(plan) <= 2, plan
    first_exchange = plan.split(") Exchange", 1)[1][:300]
    assert "bucket" in first_exchange
    assert "user_id" not in first_exchange


def test_idiv_floors_negative_timestamps(spark) -> None:
    """Pre-1970 micros must bucket by FLOOR (DuckDB `//` semantics),
    not truncate-toward-zero (regression: `%` sign-of-dividend)."""
    from rifflux_spark.operators.events import _idiv

    df = spark.createDataFrame(
        [(-1,), (-60_000_001,), (0,), (59_999_999,), (-120_000_000,)],
        "us long",
    )
    got = {
        r["us"]: r["b"]
        for r in df.select("us", _idiv(F.col("us"), 60_000_000).alias("b")).collect()
    }
    assert got == {
        -1: -1,
        -60_000_001: -2,
        0: 0,
        59_999_999: 0,
        -120_000_000: -2,
    }
