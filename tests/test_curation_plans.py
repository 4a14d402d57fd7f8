"""Physical-plan pins for the web-curation operators.

The scale claims in their docstrings must be visible in ``explain``
output, not asserted in prose:

- ``decontaminate_flags`` broadcasts the benchmark gram set; the corpus
  is NEVER shuffled on the gram key (only the tiny bench-side distinct
  is), and the per-doc overlap agg has a map-side partial phase;
- ``source_mix_sample`` / ``gopher_quality_flags`` / ``pii_scrub`` are
  map-only — zero exchanges end to end;
- ``boilerplate_segment_stats`` stays at a bounded number of exchanges
  (segment agg + join-back + per-doc re-agg), all with partial
  aggregation, and never shuffles the corpus more than once per stage.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

import rifflux_spark.functions.text_analysis as TA
from rifflux_spark.operators.dedup import boilerplate_segment_stats, decontaminate_flags


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_exchanges(df) -> int:
    return len(set(re.findall(r"Exchange \(\d+\)", explain_str(df))))


def exchange_keys(plan: str) -> list[tuple[str, ...]]:
    """Key tuples of every hash-partitioned exchange, parsed from the
    formatted plan's ``Arguments: hashpartitioning(a#1L, b#2, 4), ...``
    lines (names only, #ids and the partition count stripped)."""
    keys = []
    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        parts = [p.strip().split("#")[0] for p in m.group(1).split(",")]
        keys.append(tuple(p for p in parts if p and not p.isdigit()))
    return keys


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, f"src{i % 3}", "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8)
        for i in range(30)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_decontaminate_broadcasts_bench_grams(spark, corpus) -> None:
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")], "doc_id long, text string"
    )
    plan = explain_str(decontaminate_flags(corpus, bench, gram_n=8))
    # the gram join is a broadcast hash join (corpus side streams)
    assert "BroadcastHashJoin" in plan
    # the ONLY gram-keyed exchange is the tiny bench-side distinct; the
    # corpus is never repartitioned on the gram key
    gram_keyed = [k for k in exchange_keys(plan) if k == ("gram",)]
    assert len(gram_keyed) == 1, plan
    # per-doc overlap count aggregates with a map-side partial phase
    assert "partial_count" in plan


def test_source_mix_sample_is_map_only(corpus) -> None:
    kept = TA.source_mix_sample(corpus, {"src0": 0.25, "src1": 0.75}, default_rate=0.5)
    assert n_exchanges(kept) == 0


def test_gopher_flags_map_only(corpus) -> None:
    cols = TA.gopher_quality_flags(F.col("text"))
    df = corpus.select("doc_id", *[c.alias(k) for k, c in cols.items()])
    assert n_exchanges(df) == 0


def test_pii_scrub_map_only(corpus) -> None:
    cols = TA.pii_scrub(F.col("text"))
    df = corpus.select("doc_id", *[c.alias(k) for k, c in cols.items()])
    assert n_exchanges(df) == 0


def test_boilerplate_stats_bounded_exchanges(corpus) -> None:
    df = boilerplate_segment_stats(corpus, seg_len=10, min_docs=3)
    plan = explain_str(df)
    # segment-df agg, join-back, per-doc re-agg, final id join: the whole
    # pipeline fits in <= 5 exchanges regardless of corpus size, and the
    # heavy aggs all have map-side partials
    assert n_exchanges(df) <= 5, plan
    assert "partial_count" in plan
    # no exchange is keyed on raw text (only seg / id keys)
    assert all(
        set(k) <= {"seg", "id"} for k in exchange_keys(plan)
    ), exchange_keys(plan)


def test_substring_dedup_bounded_exchanges_and_no_python(corpus) -> None:
    """substring_dedup's corpus-wide coordination must be exactly the
    window-hash aggregation plus the join-back and per-doc agg — a
    bounded number of hash exchanges (plus AQE join planning), never a
    cartesian product and never a Python eval node (the fingerprint is
    an ARRAY expression, not a UDF). The exchanges must all key on
    whash or id."""
    from rifflux_spark.operators.dedup import substring_dedup

    df = substring_dedup(corpus, k=8)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan
    assert n_exchanges(df) <= 6, plan
    for keys in exchange_keys(plan):
        assert set(keys) <= {"whash", "id"}, keys


def test_quality_classifier_is_map_only_and_exact(spark) -> None:
    """The hashed-linear classifier (functions/classifier.py) must be
    map-only — zero exchanges, no Python eval — and its integer logit
    must equal a driver-side recomputation (exactness of the
    per-token micro-weight sum under any partitioning)."""
    import hashlib

    from rifflux_spark.functions.classifier import quality_scores

    rows = [
        (0, "alpha beta gamma alpha"),
        (1, ""),
        (2, "Mixed CASE tokens, with punct!"),
        (3, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = quality_scores(df)
    plan = explain_str(out)
    assert n_exchanges(out) == 0, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def w(tok: str) -> int:
        v = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
        return round((v / 4294967296.0 - 0.5) * 1e6)

    import re as _re

    got = {r["doc_id"]: r for r in out.collect()}
    for doc_id, text in rows:
        toks = _re.findall(r"[0-9a-z]+", text.lower())
        lm = sum(w(t) for t in toks)
        assert got[doc_id]["n_tokens"] == len(toks)
        assert abs(got[doc_id]["logit"] - lm / 1e6) < 1e-12
        assert got[doc_id]["keep"] == (lm > 20_000 * len(toks))
