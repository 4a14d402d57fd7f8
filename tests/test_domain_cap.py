"""Per-domain cap: salted-two-stage == unsalted top-N, plus plan pins."""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from rifflux_spark.operators.dedup import domain_cap


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def corpus(spark):
    # Zipf-ish skew: domain d0 has 60 docs, d1 20, d2 5, d3 1
    rows = []
    i = 0
    for dom, n in (("d0", 60), ("d1", 20), ("d2", 5), ("d3", 1)):
        for _ in range(n):
            rows.append((i, dom, f"doc body {i} unique words {i * 7}"))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def unsalted(df, cap: int):
    w = Window.partitionBy("source").orderBy(F.md5("text"), "doc_id")
    return (
        df.withColumn("domain_rank", F.row_number().over(w))
        .filter(F.col("domain_rank") <= cap)
        .select("doc_id", "source", F.col("domain_rank").cast("long"))
    )


@pytest.mark.parametrize("cap", [1, 7, 25])
def test_salted_equals_unsalted(spark, corpus, cap) -> None:
    got = sorted(map(tuple, domain_cap(corpus, cap=cap).collect()))
    want = sorted(map(tuple, unsalted(corpus, cap).collect()))
    assert got == want
    # the cap binds on the skewed domain and not on the tiny one
    per_dom = {}
    for _, dom, _rk in got:
        per_dom[dom] = per_dom.get(dom, 0) + 1
    assert per_dom["d0"] == min(cap, 60)
    assert per_dom["d3"] == 1


def test_two_stage_plan_shape(spark, corpus) -> None:
    plan = explain_str(domain_cap(corpus, cap=5))
    # stage 1 partitions by (source, salt) — the skew-splitting slice —
    # and stage 2 by source alone, over the bounded survivor set
    keys = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    names = [tuple(p.strip().split("#")[0] for p in k.split(",")[:-1]) for k in keys]
    assert ("source", "salt") in names, names
    assert ("source",) in names, names
    # stage 2's input is rank-filtered BEFORE the source-only exchange:
    # the slice filter (r1 <= cap) must appear under the first window
    assert "r1" in plan
