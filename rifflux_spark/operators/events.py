"""Event-time operators: sessionization, as-of join, bucketed range
join, hierarchical rollup, and a deterministic HLL distinct sketch.

The reference engine has no event-time surface (its corpus is static
markdown; SURVEY §2.G notes the absence of windows/as-of/range joins).
These are the beyond-reference operators the build brief names
explicitly — the ones a web-scale training-data pipeline runs against
its crawl/event logs — each expressed as a composition of Catalyst
built-ins so the 100 TB plan is shuffle-minimal:

- ``sessionize``: ONE shuffle on the entity key; gap detection and
  session numbering are window functions inside that partitioning.
- ``asof_join``: the union+window formulation — both sides share ONE
  exchange on the key, the "most recent right row" is a running
  ``last(ignorenulls)`` — no join explosion, no range condition that
  would force a BroadcastNestedLoopJoin.
- ``sessionize_bucketed`` / ``asof_join_bucketed``: hot-key-safe
  twins — the carry window splits by time bucket and a bucket-level
  boundary stage (O(active buckets) rows) repairs the seams, so one
  pathological key parallelizes instead of serializing; identity-
  pinned against the plain operators across bucket sizes.
- ``range_join_buckets``: interval join via time-bucket equi-join
  (intervals replicated to the <=2 buckets they overlap, exact
  predicate refines after the hash join) — the standard trick that
  keeps Spark off the O(N*M) nested-loop path.
- ``rollup_chain``: minute aggregates from raw, hour FROM minute, day
  FROM hour — the TimescaleDB continuous-aggregate shape; each level
  reads the (much smaller) previous level, never the raw table.
- ``hll_distinct``: HyperLogLog registers as a groupBy(group, bucket)
  MAX — distinct counting whose shuffle carries at most
  ``groups * 2^p`` rows regardless of corpus size. The md5-derived
  register math is engine-portable, so the DuckDB oracle computes
  bit-identical registers (unlike approx_count_distinct, whose sketch
  is engine-private).

All time arithmetic is integer microseconds via
``timestampdiff(MICROSECOND, epoch, ts)`` on TIMESTAMP_NTZ — exact and
session-timezone-independent — and all value sums are 1e-6-quantized
integers, so every aggregate is associative and cross-engine
hash-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _idiv(col: Column, n: int) -> Column:
    """Exact integer FLOOR-division for longs (negative-safe).

    ``(col / n).cast("long")`` routes through IEEE double division and
    truncates toward zero; subtracting the POSITIVE modulo (pmod)
    first makes the numerator exactly divisible and the quotient the
    true floor — exact whenever it is representable (< 2^53), matching
    the DuckDB oracle's native integer ``//`` for pre-1970 timestamps
    too (Spark's ``%`` takes the dividend's sign and would mis-bucket
    them).
    """
    return ((col - F.pmod(col, F.lit(n))) / F.lit(n)).cast("long")


def micros(ts_col: str) -> Column:
    """Integer microseconds since epoch for a TIMESTAMP_NTZ column.

    ``unix_micros`` is only defined for instant timestamps (and is
    session-timezone-dependent for naive parquet data); ``timestampdiff``
    on NTZ is pure integer arithmetic.
    """
    return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, {ts_col})")


def vmicro(value_col: str) -> Column:
    """Value quantized to integer micro-units (exact, associative sums)."""
    return F.round(F.col(value_col) * 1e6).cast("long")


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    value: str = "value",
    gap_sec: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the previous event of the same ``key`` exceeds ``gap_sec``.

    Scale shape: ONE shuffle (hash on ``key``); ``lag`` + running-sum
    session numbering + the per-session aggregate all execute inside
    that partitioning (the groupBy on (key, session_seq) is a
    sub-grouping of the window partitioning, so AQE keeps it local).
    A pathological single key serializes on one task (session
    continuity needs the key's full ordered history); when one key
    dominates, :func:`sessionize_bucketed` computes the identical
    result with per-task work bounded by the densest time bucket.

    Returns one row per session:
    ``(key, session_seq, n_events, start_us, end_us, duration_sec,
    sum_value)``.
    """
    gap_us = int(gap_sec) * 1_000_000
    e = events.select(
        F.col(key).alias("k"),
        F.col(order_tiebreak).alias("tie"),
        micros(ts).alias("ts_us"),
        vmicro(value).alias("vmic"),
    )
    w = Window.partitionBy("k").orderBy("ts_us", "tie")
    prev = F.lag("ts_us").over(w)
    is_new = (prev.isNull() | ((F.col("ts_us") - prev) > F.lit(gap_us))).cast(
        "long"
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        e.withColumn("session_seq", F.sum(is_new).over(wsum))
        .groupBy("k", "session_seq")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            F.sum("vmic").alias("sum_vmic"),
        )
        .select(
            F.col("k").alias(key),
            "session_seq",
            "n_events",
            "start_us",
            "end_us",
            ((F.col("end_us") - F.col("start_us")) / F.lit(1e6)).alias(
                "duration_sec"
            ),
            (F.col("sum_vmic") / F.lit(1e6)).alias("sum_value"),
        )
    )


def sessionize_bucketed(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    value: str = "value",
    gap_sec: int = 1800,
    bucket_sec: int = 86400,
) -> DataFrame:
    """Hot-key-safe variant of :func:`sessionize` — identical output,
    but gap detection windows over ``(key, time bucket)`` so one
    pathological key's events parallelize across buckets instead of
    serializing on a single task.

    Why it's exact: a global session never splits INSIDE a bucket
    (stage 1 applies the same gap rule there), and local sessions
    within a bucket are separated by gaps > ``gap_sec`` by
    construction, so the ONLY repairs needed are at bucket boundaries
    — the tail session of one active bucket merges with the head
    session of the next iff the boundary gap is <= ``gap_sec``.
    Transitive chains (a session spanning many buckets) resolve by a
    running segment sum over head/tail rows.

    Stage frames shrink at each step:

    1. per-event window over ``(key, bucket)`` → local sessions
       (per-task work bounded by the densest bucket);
    2. boundary repair over only each bucket's HEAD and TAIL session
       rows (<=2 per active bucket — a key with B active buckets costs
       O(B) serial work here, never O(events)); interior sessions pass
       through untouched;
    3. per-key session numbering over the final session aggregates
       (one row per session — the output's own size).

    All merged aggregates are associative integer math, so the result
    is bit-identical to ``sessionize`` (pinned across bucket sizes).
    """
    gap_us = int(gap_sec) * 1_000_000
    bucket_us = int(bucket_sec) * 1_000_000
    e = events.select(
        F.col(key).alias("k"),
        F.col(order_tiebreak).alias("tie"),
        micros(ts).alias("ts_us"),
        vmicro(value).alias("vmic"),
    ).withColumn("_b", _idiv(F.col("ts_us"), bucket_us))

    # stage 1: local sessions within (key, bucket)
    w = Window.partitionBy("k", "_b").orderBy("ts_us", "tie")
    prev = F.lag("ts_us").over(w)
    is_new = (prev.isNull() | ((F.col("ts_us") - prev) > F.lit(gap_us))).cast("long")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = (
        e.withColumn("ls", F.sum(is_new).over(wsum))
        .groupBy("k", "_b", "ls")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            F.sum("vmic").alias("sum_vmic"),
        )
        .withColumn(
            "_nloc", F.max("ls").over(Window.partitionBy("k", "_b"))
        )
    )
    boundary = local.filter((F.col("ls") == 1) | (F.col("ls") == F.col("_nloc")))
    interior = local.filter((F.col("ls") > 1) & (F.col("ls") < F.col("_nloc")))

    # stage 2: merge across bucket boundaries. In (bucket, ls) order the
    # boundary frame alternates ... T_{i-1}, H_i[, T_i], H_{i+1} ...;
    # a row starts a new chain unless it is the HEAD of a NEW bucket
    # within gap of the previous bucket's tail (same-bucket neighbors
    # are head→tail pairs whose interior gap already exceeded gap_sec).
    wb = Window.partitionBy("k").orderBy("_b", "ls")
    prev_end = F.lag("end_us").over(wb)
    prev_b = F.lag("_b").over(wb)
    is_new_chain = (
        prev_end.isNull()
        | (prev_b == F.col("_b"))
        | ((F.col("start_us") - prev_end) > F.lit(gap_us))
    ).cast("long")
    chained = boundary.withColumn(
        "chain",
        F.sum(is_new_chain).over(
            wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    merged = chained.groupBy("k", "chain").agg(
        F.sum("n_events").alias("n_events"),
        F.min("start_us").alias("start_us"),
        F.max("end_us").alias("end_us"),
        F.sum("sum_vmic").alias("sum_vmic"),
    )

    # stage 3: number the global sessions per key by start time (starts
    # are strictly increasing: sessions are disjoint with gaps between)
    allsess = merged.select("k", "n_events", "start_us", "end_us", "sum_vmic").unionByName(
        interior.select("k", "n_events", "start_us", "end_us", "sum_vmic")
    )
    wn = Window.partitionBy("k").orderBy("start_us")
    return (
        allsess.withColumn("session_seq", F.row_number().over(wn).cast("long"))
        .select(
            F.col("k").alias(key),
            "session_seq",
            "n_events",
            "start_us",
            "end_us",
            ((F.col("end_us") - F.col("start_us")) / F.lit(1e6)).alias(
                "duration_sec"
            ),
            (F.col("sum_vmic") / F.lit(1e6)).alias("sum_value"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_us: str,
    right_payload: list[str],
    right_tiebreak: str,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts_us <= left.ts_us`` on the same ``key`` (DuckDB
    ``ASOF JOIN`` / pandas ``merge_asof`` semantics, ties included).

    Spark lacks this operator; the naive formulation (equi-join on key
    + inequality + per-left max) re-joins every left row against the
    key's full right history. This is the union+window formulation:
    tag right rows 0 and left rows 1, sort by (ts, tag, right
    tiebreak) within each key, and carry the right payload forward
    with ``last(ignorenulls)``. At equal timestamps the right row
    sorts first (tag 0 < 1), giving the inclusive <= match; multiple
    right rows at the same instant resolve to the max ``right_tiebreak``
    (the running last). Cost: ONE shuffle on ``key`` shared by both
    sides, zero row amplification.

    Hot-key bound: like sessionize, a single key's full timeline
    serializes on one task by construction — fine while key cardinality
    (users) dwarfs any one key's history. When it doesn't, use
    :func:`asof_join_bucketed`: the same semantics with the carry
    window split by time bucket, bounding per-task work by the densest
    bucket instead of the hottest key.

    Returns the left rows with a ``_asof`` struct column holding the
    matched right payload (null when no right row precedes).
    """
    payload = F.struct(*[F.col(c) for c in right_payload]).alias("_rp")
    r = right.select(
        F.col(key).alias("k"),
        F.col(ts_us).alias("t"),
        F.lit(0).alias("_tag"),
        F.col(right_tiebreak).cast("long").alias("_rtie"),
        payload,
    )
    left_cols = [c for c in left.columns]
    l = left.select(
        F.col(key).alias("k"),
        F.col(ts_us).alias("t"),
        F.lit(1).alias("_tag"),
        F.lit(0).cast("long").alias("_rtie"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
    )
    u = r.unionByName(l, allowMissingColumns=True)
    w = (
        Window.partitionBy("k")
        .orderBy("t", "_tag", "_rtie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_asof", F.last("_rp", ignorenulls=True).over(w))
    return matched.filter(F.col("_tag") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols], "_asof"
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_us: str,
    right_payload: list[str],
    right_tiebreak: str,
    bucket_sec: int = 3600,
) -> DataFrame:
    """Hot-key-safe variant of :func:`asof_join` — identical semantics,
    but the running-carry window partitions by (key, time bucket), so a
    pathological key parallelizes across its time buckets instead of
    serializing its entire ordered history on one task.

    Two stages:

    1. **In-bucket**: the same union+window carry as ``asof_join``,
       windowed within ``(key, bucket)`` — per-task work is bounded by
       the densest single bucket, not the hottest key.
    2. **Cross-bucket fallback**: each ``(key, bucket)``'s LAST right
       payload (max ``(t, tiebreak)``) is a one-row-per-active-bucket
       aggregate; a second union+window carry — over BUCKETS, ordered
       so a left bucket sees only strictly-earlier right buckets —
       hands every left bucket the payload it should inherit when no
       in-bucket right row precedes. A key with B active buckets costs
       O(B) serial work here, never O(events).

    The final answer is ``coalesce(in_bucket, fallback)``. Exchanges:
    one hash on (key, bucket), one hash on key over the bucket-level
    frame (#distinct buckets rows — tiny), and the join back on
    (key, bucket). Pick ``bucket_sec`` so a bucket's events fit a task;
    semantics never depend on the choice (pinned by identity tests
    against ``asof_join`` across bucket sizes).
    """
    bucket_us = int(bucket_sec) * 1_000_000
    payload = F.struct(*[F.col(c) for c in right_payload]).alias("_rp")
    r = right.select(
        F.col(key).alias("k"),
        F.col(ts_us).alias("t"),
        F.lit(0).alias("_tag"),
        F.col(right_tiebreak).cast("long").alias("_rtie"),
        payload,
    ).withColumn("_b", _idiv(F.col("t"), bucket_us))
    rp_type = r.schema["_rp"].dataType
    left_cols = [c for c in left.columns]
    l = left.select(
        F.col(key).alias("k"),
        F.col(ts_us).alias("t"),
        F.lit(1).alias("_tag"),
        F.lit(0).cast("long").alias("_rtie"),
        F.lit(None).cast(rp_type).alias("_rp"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
    ).withColumn("_b", _idiv(F.col("t"), bucket_us))

    # stage 1: in-bucket carry — asof_join's window, partitioned finer
    u = r.unionByName(l, allowMissingColumns=True)
    w = (
        Window.partitionBy("k", "_b")
        .orderBy("t", "_tag", "_rtie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_bucket = u.withColumn(
        "_in", F.last("_rp", ignorenulls=True).over(w)
    ).filter(F.col("_tag") == 1)

    # stage 2: bucket-level fallback carry. Left bucket markers sort
    # BEFORE right last-payload rows within the same bucket (_ct 0 < 1),
    # so the running last a left bucket sees is from strictly earlier
    # buckets — same-bucket right rows are stage 1's job (and must not
    # leak to left rows that precede them).
    r_last = r.groupBy("k", "_b").agg(
        F.max_by("_rp", F.struct(F.col("t"), F.col("_rtie"))).alias("_rpl")
    )
    lb = l.select("k", "_b").distinct()
    cu = r_last.select("k", "_b", F.lit(1).alias("_ct"), "_rpl").unionByName(
        lb.select(
            "k", "_b", F.lit(0).alias("_ct"), F.lit(None).cast(rp_type).alias("_rpl")
        )
    )
    cw = (
        Window.partitionBy("k")
        .orderBy("_b", "_ct")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fallback = (
        cu.withColumn("_fb", F.last("_rpl", ignorenulls=True).over(cw))
        .filter(F.col("_ct") == 0)
        .select("k", "_b", "_fb")
    )

    out = in_bucket.join(fallback, on=["k", "_b"], how="left")
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        F.coalesce("_in", "_fb").alias("_asof"),
    )


def range_join_buckets(
    intervals: DataFrame,
    probe: DataFrame,
    key: str,
    bucket_us: int,
) -> DataFrame:
    """Interval join: count/sum probe rows falling inside each
    half-open interval ``[start_us, end_us)`` of the same ``key``.

    ``intervals`` needs ``(interval_id, key, start_us, end_us)``;
    ``probe`` needs ``(key, ts_us, vmic)``.

    Scale shape: each interval is exploded to the time buckets it
    overlaps (``sequence`` over bucket ids — with ``bucket_us`` >= the
    typical interval width that is <= 2 rows), the probe side gets its
    single bucket id, and the join is a plain hash equi-join on
    ``(key, bucket)`` refined by the exact range predicate. Catalyst
    would otherwise plan the pure-inequality join as a
    BroadcastNestedLoopJoin — O(N*M) at web scale (pinned in
    tests/test_physical_plans.py).
    """
    iv = intervals.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                _idiv(F.col("start_us"), bucket_us),
                # end is exclusive: the bucket of the last contained
                # microsecond, so an interval ending exactly on a
                # boundary does not visit the next bucket
                _idiv(F.col("end_us") - 1, bucket_us),
            )
        ),
    )
    pr = probe.select(
        F.col(key).alias("pk"),
        "ts_us",
        "vmic",
        _idiv(F.col("ts_us"), bucket_us).alias("bucket"),
    )
    hits = (
        iv.join(
            pr,
            (iv[key] == pr.pk)
            & (iv.bucket == pr.bucket)
            & (pr.ts_us >= iv.start_us)
            & (pr.ts_us < iv.end_us),
            "inner",
        )
        .groupBy("interval_id")
        .agg(
            F.count("*").cast("long").alias("n_hits"),
            F.sum("vmic").alias("sum_vmic"),
        )
    )
    return (
        intervals.join(hits, "interval_id", "left")
        .select(
            "interval_id",
            key,
            "start_us",
            "end_us",
            F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
            (
                F.coalesce("sum_vmic", F.lit(0).cast("long")) / F.lit(1e6)
            ).alias("sum_value"),
        )
    )


def rollup_chain(
    events: DataFrame,
    group: str = "event_type",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Hierarchical time rollup: minute aggregates from raw events,
    hour aggregates FROM the minute level, day aggregates FROM the
    hour level (the hypertable continuous-aggregate shape — each
    refresh reads the previous level, ~60x smaller, never the raw
    table). Integer micro-sums keep every level exact and associative,
    so "day from hour from minute" equals "day from raw" bit-for-bit.

    Returns the hour and day levels unioned with a ``level`` column:
    ``(level, group, bucket_start_us, n_events, sum_value)``.
    """
    minute_us = 60_000_000
    minute = (
        events.select(
            F.col(group).alias("g"),
            _idiv(micros(ts), minute_us).alias("b"),
            vmicro(value).alias("vmic"),
        )
        .groupBy("g", "b")
        .agg(F.count("*").cast("long").alias("n"), F.sum("vmic").alias("v"))
    )
    hour = (
        minute.withColumn("b", _idiv(F.col("b"), 60))
        .groupBy("g", "b")
        .agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
    )
    day = (
        hour.withColumn("b", _idiv(F.col("b"), 24))
        .groupBy("g", "b")
        .agg(F.sum("n").alias("n"), F.sum("v").alias("v"))
    )
    hour_us = 3_600_000_000
    day_us = 24 * hour_us

    def _fmt(df: DataFrame, level: str, width_us: int) -> DataFrame:
        return df.select(
            F.lit(level).alias("level"),
            F.col("g").alias(group),
            (F.col("b") * F.lit(width_us)).alias("bucket_start_us"),
            F.col("n").alias("n_events"),
            (F.col("v") / F.lit(1e6)).alias("sum_value"),
        )

    return _fmt(hour, "hour", hour_us).unionByName(_fmt(day, "day", day_us))


def hll_distinct(
    df: DataFrame,
    group: str,
    col: str,
    p: int = 9,
) -> DataFrame:
    """Deterministic HyperLogLog distinct-count sketch per ``group``.

    Register math is engine-portable by construction: bucket and
    leading-zero rank derive from the md5 hex of the value's string
    form (two independent 32-bit words), the harmonic sum is kept as
    the exact integer ``sum(2^(33 - rho))`` scaled by ``2^33``, and the
    raw estimate ``alpha_m * m^2 * 2^33 / S`` is one IEEE division —
    so a DuckDB twin reproduces every column bit-for-bit, which
    engine-private sketches (approx_count_distinct) cannot.

    Scale shape: distinct values collapse map-side into at most
    ``2^p`` registers per group before the ONE shuffle — the classic
    sketch win over exact countDistinct (whose shuffle carries every
    distinct value). The raw estimator is biased low when the true
    cardinality is small relative to ``m = 2^p`` (the linear-counting
    regime); callers needing the corrected estimate apply
    ``m * ln(m / n_zero)`` — kept out of this column set because libm
    ``ln`` is not bit-portable across engines.

    Returns ``(group, m, n_nonzero, s_scaled, est_raw)``.
    """
    m = 1 << p
    h = F.md5(F.col(col).cast("string"))
    v1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    w = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    # rank of the first set bit of the 32-bit word w, MSB-first:
    # bin(w) drops leading zeros, so rho = 33 - bit_length(w); w == 0
    # (probability 2^-32) maps to the max rank 33.
    rho = F.when(w == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.bin(w))
    )
    regs = (
        df.select(
            F.col(group).alias("g"),
            (v1 % F.lit(m)).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # empty registers contribute 2^33 each (rho = 0)
    per_group = regs.groupBy("g").agg(
        F.count("*").cast("long").alias("n_nonzero"),
        # shiftleft's python wrapper only takes a literal bit count —
        # go through the SQL function for a column-valued shift
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(33 - rho AS INT))")
        ).alias("s_present"),
    )
    s_scaled = (
        F.col("s_present")
        + (F.lit(m) - F.col("n_nonzero")) * F.lit(1 << 33).cast("long")
    ).alias("s_scaled")
    return per_group.select(
        F.col("g").alias(group),
        F.lit(m).cast("long").alias("m"),
        "n_nonzero",
        s_scaled,
        F.round(
            F.lit(alpha * m * m * float(1 << 33)) / F.col("s_scaled"), 3
        ).alias("est_raw"),
    )
