"""Unit + physical-plan tests for the unigram-LM perplexity scorer and
the sequence-packing manifest.

Plan claims pinned here, not just asserted in docstrings:

- ``unigram_perplexity`` joins the LM via BROADCAST — the corpus is
  never hash-shuffled on the term key; the only corpus-sized exchange is
  the per-doc agg, which has a map-side partial phase;
- ``train_unigram_lm`` takes its top-V via TakeOrderedAndProject (a
  distributed partial top-k), NOT a single-partition global window;
- ``pack_sequences`` keeps the two-phase-cumsum shape: no exchange is a
  single-partition global sort over the corpus.
"""

from __future__ import annotations

import contextlib
import io
import math
import re

import pytest
from pyspark.sql import functions as F

from rifflux_spark.functions.lm import train_unigram_lm, unigram_perplexity
from rifflux_spark.functions.text_analysis import pack_sequences, token_budget_sample


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "xylophone quartz jigsaw vortex"),  # all rare -> OOV at small V
        (3, ""),  # zero tokens
        (4, "the the the the"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lm_training_top_v_and_ties(spark, corpus) -> None:
    lm = train_unigram_lm(corpus, vocab_size=3)
    rows = {r["term"]: r["cnt"] for r in lm.collect()}
    # 'the' x8, 'sat'/'on' x2 each, ties below break lexicographically
    assert rows == {"the": 8, "on": 2, "sat": 2}


def test_perplexity_values_and_oov(spark, corpus) -> None:
    lm = train_unigram_lm(corpus, vocab_size=3)
    out = {r["doc_id"]: r for r in unigram_perplexity(corpus, lm).collect()}
    # N=12, V=3, denom = 12 + 1*(3+1) = 16
    denom = 16.0
    p_the = math.log10(9 / denom)
    p_on = math.log10(3 / denom)
    p_sat = math.log10(3 / denom)
    p_oov = math.log10(1 / denom)
    exp0 = -(2 * p_the + p_sat + p_on + 2 * p_oov) / 6  # cat, mat OOV
    assert out[0]["n_tokens"] == 6
    assert out[0]["n_oov"] == 2
    assert abs(out[0]["cross_entropy"] - exp0) < 1e-6
    # all-OOV doc
    assert out[2]["n_oov"] == 4
    assert abs(out[2]["cross_entropy"] - (-p_oov)) < 1e-6
    # zero-token doc present with NULL score
    assert out[3]["n_tokens"] == 0
    assert out[3]["cross_entropy"] is None
    # single repeated in-vocab term
    assert out[4]["n_oov"] == 0
    assert abs(out[4]["cross_entropy"] - (-p_the)) < 1e-6


def test_lm_scoring_broadcasts_term_table(spark, corpus) -> None:
    lm = train_unigram_lm(corpus, vocab_size=3)
    plan = explain_str(unigram_perplexity(corpus, lm))
    assert "BroadcastHashJoin" in plan
    # exactly ONE term-keyed exchange: the LM-side count agg (bounded by
    # the vocabulary). The scoring-side corpus explode reaches the join
    # through the broadcast, never through a term-keyed shuffle.
    assert len(re.findall(r"hashpartitioning\(term", plan)) == 1, plan
    # per-doc agg has a map-side partial phase
    assert "partial_count" in plan or "partial_sum" in plan


def test_lm_training_uses_take_ordered_top_k(spark, corpus) -> None:
    plan = explain_str(train_unigram_lm(corpus, vocab_size=3))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_pack_sequences_manifest(spark, corpus) -> None:
    out = {r["doc_id"]: r for r in pack_sequences(corpus, seq_len=4).collect()}
    assert len(out) == 5
    # offsets: every doc's start_tok is the sum of n_tokens of docs that
    # hash-sort before it; the concatenated stream is gap-free
    rows = sorted(out.values(), key=lambda r: r["start_tok"])
    acc = 0
    for r in rows:
        assert r["start_tok"] == acc
        acc += r["n_tokens"]
    # example arithmetic: floor bounds at seq_len=4
    for r in rows:
        if r["n_tokens"] == 0:
            assert r["example_start"] is None and r["example_end"] is None
        else:
            assert r["example_start"] == r["start_tok"] // 4
            assert r["example_end"] == (r["start_tok"] + r["n_tokens"] - 1) // 4
            assert r["example_end"] >= r["example_start"]


def test_pack_sequences_no_global_sort(spark, corpus) -> None:
    plan = explain_str(pack_sequences(corpus, seq_len=4))
    # the cumsum must stay bucket-parallel: no single-partition exchange
    assert "SinglePartition" not in plan, plan


def test_pack_matches_naive_reference(spark) -> None:
    """Randomized corpora (identical texts → hash ties, empty docs,
    single-token docs) against a collected-and-recomputed naive
    packing: the two-phase bucket cumsum must equal the sequential
    cumsum in (md5, doc_id) order exactly."""
    import hashlib
    import random

    rng = random.Random(20260817)
    words = ["ant", "bee", "cat", "dog", "elk", "fox"]
    rows = []
    for i in range(200):
        kind = rng.random()
        if kind < 0.1:
            text = ""
        elif kind < 0.3:
            text = "dup dup shared text"  # forced ties across many docs
        else:
            text = " ".join(rng.choice(words) for _ in range(rng.randint(1, 12)))
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def ntok(t: str) -> int:
        return len([w for w in re.split(r"[^0-9a-z]+", t.lower()) if w])

    order = sorted(rows, key=lambda r: (hashlib.md5(r[1].encode()).hexdigest(), r[0]))
    naive, acc = {}, 0
    for doc_id, text in order:
        n = ntok(text)
        naive[doc_id] = (n, acc)  # (n_tokens, start)
        acc += n

    got = {r["doc_id"]: r for r in pack_sequences(df, seq_len=16).collect()}
    assert len(got) == 200
    for doc_id, (n, start) in naive.items():
        r = got[doc_id]
        assert (r["n_tokens"], r["start_tok"]) == (n, start), doc_id
        if n == 0:
            assert r["example_start"] is None
        else:
            assert r["example_start"] == start // 16
            assert r["example_end"] == (start + n - 1) // 16


def test_budget_sample_is_pack_prefix(spark, corpus) -> None:
    """token_budget_sample == the docs of the packing manifest whose
    inclusive cumsum fits the budget (shared helper, same order)."""
    budget = 10
    sample = {r["doc_id"] for r in token_budget_sample(corpus, budget=budget).collect()}
    manifest = pack_sequences(corpus, seq_len=4).collect()
    expect = {
        r["doc_id"] for r in manifest if r["start_tok"] + r["n_tokens"] <= budget
    }
    assert sample == expect
