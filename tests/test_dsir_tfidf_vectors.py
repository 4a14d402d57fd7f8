"""Unit + physical-plan tests for the round-4 curation additions:
DSIR importance weights (functions/dsir), TF-IDF keyword extraction
(functions/text_analysis.tfidf_keywords) and int8 embedding
quantization (functions/vectors)."""

from __future__ import annotations

import contextlib
import io
import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from rifflux_spark.functions import vectors as V
from rifflux_spark.functions.dsir import dsir_weights, gram_buckets
from rifflux_spark.functions.text_analysis import tfidf_keywords


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_exchanges(df) -> int:
    return len(set(re.findall(r"Exchange \(\d+\)", explain_str(df))))


# ------------------------------------------------------------------ DSIR


@pytest.fixture(scope="module")
def dsir_corpus(spark):
    # target slice talks about cats; raw background talks about taxes
    rows = [(i, "tgt" if i < 5 else "raw",
             ("cat purr whisker feline meow " * 6) if i < 5
             else ("tax form ledger audit invoice " * 6))
            for i in range(25)]
    # two probe docs: one cat-like, one tax-like, both in the raw pool
    rows.append((100, "raw", "cat purr whisker feline meow " * 6))
    rows.append((101, "raw", "tax form ledger audit invoice " * 6))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_dsir_ranks_target_like_docs_higher(dsir_corpus) -> None:
    out = dsir_weights(dsir_corpus, F.col("source") == "tgt").collect()
    w = {r["doc_id"]: r["dsir_logweight"] for r in out}
    # the cat-like probe must out-weigh the tax-like probe decisively
    assert w[100] > w[101]
    # and target docs score identically to the identical-text probe
    assert w[0] == w[100]


def test_dsir_zero_gram_doc_gets_null_weight(spark) -> None:
    df = spark.createDataFrame(
        [(1, "a", "real words here live"), (2, "a", "!!! ... ???")],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in dsir_weights(df, F.lit(False)).collect()}
    assert out[2]["n_grams"] == 0 and out[2]["dsir_logweight"] is None
    assert out[1]["n_grams"] == 4 + 3  # 4 unigrams + 3 bigrams


def test_dsir_matches_numpy_reference(dsir_corpus) -> None:
    """Cross-check the full pipeline against a from-scratch numpy/hashlib
    implementation of the paper's estimator on the same rows."""
    import hashlib

    rows = dsir_corpus.select("doc_id", "source", "text").collect()
    B, a = 1024, 1.0

    def buckets(text: str) -> list[int]:
        toks = [t for t in re.split(r"[^0-9a-z]+", text.lower()) if t]
        grams = toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        return [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B for g in grams
        ]

    raw = np.zeros(B)
    tgt = np.zeros(B)
    per_doc = {}
    for r in rows:
        bs = buckets(r["text"])
        per_doc[r["doc_id"]] = bs
        for b in bs:
            raw[b] += 1
            if r["source"] == "tgt":
                tgt[b] += 1
    lr = np.log((tgt + a) / (tgt.sum() + a * B)) - np.log(
        (raw + a) / (raw.sum() + a * B)
    )
    micro = np.floor(lr * 1e6 + 0.5).astype(np.int64)  # round-half-up
    expect = {
        d: float(sum(int(micro[b]) for b in bs)) / 1e6 for d, bs in per_doc.items()
    }
    got = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_weights(dsir_corpus, F.col("source") == "tgt").collect()
    }
    for d, e in expect.items():
        assert got[d] == pytest.approx(e, abs=2e-6), d


def test_dsir_plan_shape(dsir_corpus) -> None:
    """No Python eval, no cartesian product, the ratio join is a
    broadcast (the corpus is never shuffled on the bucket key), and the
    gram-bucket expression is pure Catalyst."""
    df = dsir_weights(dsir_corpus, F.col("source") == "tgt")
    plan = explain_str(df)
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # corpus-side exchanges: the groupBy(doc) agg + the join-back on id;
    # the <=B-row distribution agg is the only bucket-keyed exchange.
    assert n_exchanges(df) <= 5, plan


def test_gram_buckets_range(spark) -> None:
    out = spark.createDataFrame([("alpha beta gamma",)], "text string").select(
        gram_buckets(F.col("text"), 64).alias("b")
    ).collect()[0]["b"]
    assert len(out) == 5  # 3 unigrams + 2 bigrams
    assert all(0 <= b < 64 for b in out)


# ---------------------------------------------------------------- TF-IDF


def test_tfidf_keywords_basic(spark) -> None:
    df = spark.createDataFrame(
        [
            (1, "apple apple banana shared shared shared"),
            (2, "cherry shared shared shared durian cherry"),
            (3, "shared shared shared elder fig grape"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_keywords(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["tfidf"]))
    # 'shared' appears in every doc -> idf = ln(4/4)+1 = 1.0 exactly,
    # so its score is its tf; rare doubled terms (idf = ln(2)+1) win.
    assert by_doc[1][0][1] == "apple"
    assert by_doc[2][0][1] == "cherry"
    top1 = {d: ks[0][2] for d, ks in by_doc.items()}
    assert top1[1] == pytest.approx(2 * (math.log(2.0) + 1.0), abs=1e-5)
    # rank 2 in doc 1: 'shared' tf=3 idf=1 -> 3.0 beats 'banana' (~1.69)
    assert by_doc[1][1][1] == "shared" and by_doc[1][1][2] == 3.0
    assert all(len(ks) == 2 for ks in by_doc.values())


def test_tfidf_plan_no_python_no_cartesian(spark) -> None:
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = explain_str(tfidf_keywords(df, k=3))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------- quantization


def test_int8_quantize_roundtrip_bound(spark) -> None:
    rng = np.random.default_rng(7)
    vecs = [(i, rng.standard_normal(16).astype("float32").tolist()) for i in range(8)]
    vecs.append((99, [0.0] * 16))  # zero vector
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    scale = V.int8_scale(F.col("embedding"))
    out = (
        df.select("vec_id", "embedding", scale.alias("s"))
        .withColumn("q", V.int8_quantize(F.col("embedding"), F.col("s")))
        .withColumn(
            "err", V.int8_sq_err_micro(F.col("embedding"), F.col("q"), F.col("s"))
        )
        .collect()
    )
    for r in out:
        v = np.array(r["embedding"], dtype=np.float64)
        q = np.array(r["q"])
        assert q.min() >= -127 and q.max() <= 127
        if r["vec_id"] == 99:
            assert r["s"] == 0.0 and (q == 0).all() and r["err"] == 0
            continue
        # max |error| per element is scale/2 -> bound the total sq err
        assert r["err"] / 1e12 <= len(v) * (r["s"] / 2) ** 2 + 1e-9
        # dequantization actually reconstructs
        assert np.abs(v - q * r["s"]).max() <= r["s"] / 2 + 1e-12


def test_quantize_plan_is_map_only(spark) -> None:
    """The 100 TB re-encode claim: zero exchanges, zero Python — one
    whole-stage-codegen projection over the scan."""
    df = spark.createDataFrame(
        [(1, [0.5, -0.25])], "vec_id long, embedding array<float>"
    )
    scale = V.int8_scale(F.col("embedding"))
    out = df.select(
        "vec_id",
        scale.alias("s"),
        V.int8_quantize(F.col("embedding"), scale).alias("q"),
    )
    plan = explain_str(out)
    assert n_exchanges(out) == 0
    assert "EvalPython" not in plan
