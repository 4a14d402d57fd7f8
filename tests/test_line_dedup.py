"""C4-style line-dedup: semantics + physical-plan pins."""

from __future__ import annotations

import contextlib
import hashlib
import io
import re

import pytest

from rifflux_spark.operators.dedup import line_dedup


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "alpha\nbeta\ngamma"),
        (1, "beta\ndelta"),          # 'beta' first seen in doc 0
        (2, "gamma\nalpha\nepsilon"),  # both dups of doc 0
        (3, "  beta \n\n  \nzeta"),  # trims to dup + blank lines + new
        (4, "alpha"),                # fully duplicated doc
        (5, ""),                     # no lines at all
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_occurrence_wins_and_reassembly(spark, corpus) -> None:
    out = {r["id"]: r for r in line_dedup(corpus).collect()}
    assert len(out) == 6

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    # doc 0 is first for all its lines — survives intact
    assert (out[0]["n_lines"], out[0]["n_kept"]) == (3, 3)
    assert out[0]["cleaned_md5"] == md5("alpha\nbeta\ngamma")
    # doc 1 loses 'beta', keeps 'delta'
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (2, 1)
    assert out[1]["cleaned_md5"] == md5("delta")
    # doc 2 keeps only its novel line, original order preserved
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (3, 1)
    assert out[2]["cleaned_md5"] == md5("epsilon")
    # doc 3: whitespace-only lines dropped from both counts; 'beta' trims
    # to a dup of doc 0's
    assert (out[3]["n_lines"], out[3]["n_kept"]) == (2, 1)
    assert out[3]["cleaned_md5"] == md5("zeta")
    # fully-duplicated and empty docs still get a row
    assert (out[4]["n_kept"], out[4]["cleaned_md5"]) == (0, md5(""))
    assert (out[5]["n_lines"], out[5]["n_kept"]) == (0, 0)


def test_line_dedup_plan_shape(spark, corpus) -> None:
    plan = explain_str(line_dedup(corpus))
    # the keeper selection is a struct-min AGG, not a window (a window
    # would funnel every copy of a hot line through one reducer)
    assert "Window" not in plan, plan
    # exactly one line-keyed exchange (the keeper agg), with a map-side
    # partial phase
    assert len(re.findall(r"hashpartitioning\(line", plan)) == 1, plan
    assert "partial_min" in plan
    # bounded overall: keeper agg + per-doc re-agg + base join
    n_ex = len(set(re.findall(r"Exchange \(\d+\)", plan)))
    assert n_ex <= 4, plan
