"""Randomized differential gate for the hot-key-safe event-op twins.

Mirrors the repo's fuzz style (test_fts_fuzz): seeded random frames —
a hot key plus sparse keys, clustered and uniform timestamps, tied
instants on and across the two as-of sides, and PRE-1970 timestamps
(negative epoch micros exercise the floor-division bucketing, which a
truncate-toward-zero bug would mis-bucket) — checked for exact
equality between the plain operators and their bucketed twins at a
random bucket size per seed, including bucket sizes smaller than the
session gap (every session/match crosses buckets).
"""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from rifflux_spark.operators.events import (
    asof_join,
    asof_join_bucketed,
    micros,
    sessionize,
    sessionize_bucketed,
)

T0 = dt.datetime(2024, 1, 1)


def _frame(spark, rng: random.Random, n: int):
    rows = []
    eid = 0
    for _ in range(n):
        key = rng.choice([1, 1, 1, 1, 2, 3, 7])  # key 1 is hot
        # mixed regimes: dense bursts, session-scale gaps, huge jumps,
        # and a pre-1970 cluster (negative epoch micros)
        base = rng.choice([0, 0, 5_000, 500_000, -1_800_000_000])
        off = base + rng.randrange(0, 10_000)
        rows.append((eid, key, off, "click", rng.random()))
        eid += 1
    # exact ties: same instant, same key, distinct event ids
    t = rng.randrange(0, 10_000)
    rows += [(eid, 1, t, "click", 0.5), (eid + 1, 1, t, "click", 0.7)]
    data = [
        (e, u, T0 + dt.timedelta(seconds=off), et, v)
        for (e, u, off, et, v) in rows
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_sessionize_bucketed_fuzz(spark, seed) -> None:
    rng = random.Random(1000 + seed)
    ev = _frame(spark, rng, 400)
    gap = rng.choice([60, 600, 1800])
    bucket = rng.choice([7, gap // 2 + 1, gap, gap * 10, 1_000_000])
    want = sorted(tuple(r) for r in sessionize(ev, gap_sec=gap).collect())
    got = sorted(
        tuple(r)
        for r in sessionize_bucketed(ev, gap_sec=gap, bucket_sec=bucket).collect()
    )
    assert got == want, f"seed={seed} gap={gap} bucket={bucket}"


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_asof_join_bucketed_fuzz(spark, seed) -> None:
    rng = random.Random(2000 + seed)
    ev = _frame(spark, rng, 300)
    left = ev.filter(F.col("event_id") % 3 != 0).select(
        "event_id", "user_id", micros("ts").alias("ts_us")
    )
    right = ev.filter(F.col("event_id") % 3 == 0).select(
        "user_id",
        micros("ts").alias("ts_us"),
        F.col("event_id").alias("pevent"),
        F.col("value").alias("pvalue"),
    )
    bucket = rng.choice([7, 311, 86_400, 10_000_000])
    args = (left, right, "user_id", "ts_us", ["pevent", "pvalue"], "pevent")
    key = lambda r: (  # noqa: E731
        r.event_id,
        None if r._asof is None else (r._asof.pevent, r._asof.pvalue),
    )
    want = sorted(key(r) for r in asof_join(*args).collect())
    got = sorted(
        key(r) for r in asof_join_bucketed(*args, bucket_sec=bucket).collect()
    )
    assert got == want, f"seed={seed} bucket={bucket}"
