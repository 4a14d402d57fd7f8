"""Spark-side operator tests: xxhash64 twin, RRF rank-window join,
semantic kNN semantics (reference parity), dense/sparse ordinals, text
analysis columns."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rifflux_spark.functions.embedder import hash_embed
from rifflux_spark.functions.xxhash64 import spark_xxhash64, term_bucket
from rifflux_spark.operators.doc_ids import assign_doc_ords, sparse_ordinals
from rifflux_spark.operators.fusion import add_rank, rrf_fuse, rrf_fuse_df
from rifflux_spark.operators.semantic import semantic_topk


def test_xxhash64_matches_spark(spark) -> None:
    words = ["cache", "ttl", "the", "dup", "café", "Ελλάδα", "日本語", "", "x" * 100]
    df = spark.createDataFrame([(w,) for w in words], "term string").select(
        "term",
        F.xxhash64("term").alias("h"),
        F.pmod(F.xxhash64("term"), F.lit(32)).alias("b"),
    )
    for r in df.collect():
        assert spark_xxhash64(r["term"]) == r["h"], r["term"]
        assert term_bucket(r["term"], 32) == r["b"], r["term"]


def test_rrf_fuse_df_matches_pure(spark) -> None:
    lex_ids = ["a", "b", "c", "e"]
    sem_ids = ["b", "d", "a"]
    lex = spark.createDataFrame(
        [(i, r + 1) for r, i in enumerate(lex_ids)], "chunk_id string, rank int"
    )
    sem = spark.createDataFrame(
        [(i, r + 1) for r, i in enumerate(sem_ids)], "chunk_id string, rank int"
    )
    fused = rrf_fuse_df({"lexical": lex, "semantic": sem}, k=60).collect()
    expected = rrf_fuse({"lexical": lex_ids, "semantic": sem_ids}, k=60)
    got = {r["chunk_id"]: r["rrf"] for r in fused}
    assert set(got) == set(expected)
    for cid, score in expected.items():
        assert abs(got[cid] - score) < 1e-12
    ranks = {r["chunk_id"]: (r["lexical_rank"], r["semantic_rank"]) for r in fused}
    assert ranks["a"] == (1, 3)
    assert ranks["d"] == (None, 2)
    assert ranks["e"] == (4, None)


def test_add_rank_is_one_based(spark) -> None:
    df = spark.createDataFrame([("x", 0.5), ("y", 0.9), ("z", 0.1)], "id string, s double")
    ranked = {r["id"]: r["rank"] for r in add_rank(df, [F.desc("s")]).collect()}
    assert ranked == {"y": 1, "x": 2, "z": 3}


def test_semantic_topk_reference_semantics(spark) -> None:
    # reference semantic.py:10-40: cosine desc, zero-norm -> 0.0, None -> []
    rows = [
        (0, "c0", [1.0, 0.0, 0.0]),
        (1, "c1", [0.5, 0.5, 0.0]),
        (2, "c2", [0.0, 0.0, 0.0]),  # zero vector -> cosine 0.0
        (3, "c3", [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "doc_ord long, chunk_id string, vec array<float>")
    got = semantic_topk(emb, np.array([1.0, 0.0, 0.0]), top_k=4).collect()
    ids = [r["chunk_id"] for r in got]
    assert ids == ["c0", "c1", "c2", "c3"]
    by_id = {r["chunk_id"]: r["cosine"] for r in got}
    assert abs(by_id["c0"] - 1.0) < 1e-6
    assert by_id["c2"] == 0.0
    assert abs(by_id["c3"] + 1.0) < 1e-6
    # None query vector -> empty (reference semantic.py:21-22)
    assert semantic_topk(emb, None, top_k=4).count() == 0
    # zero-norm QUERY vector -> all cosines 0.0
    zeros = semantic_topk(emb, np.zeros(3), top_k=2).collect()
    assert all(r["cosine"] == 0.0 for r in zeros)


def test_semantic_topk_matches_reference_python(spark) -> None:
    """Brute-force kNN distributed == the reference's driver loop."""
    rng = np.random.RandomState(3)
    texts = [f"doc number {i} about topic {i % 7}" for i in range(50)]
    vecs = [hash_embed(t, dim=32) for t in texts]
    emb = spark.createDataFrame(
        [(i, f"c{i}", v.tolist()) for i, (t, v) in enumerate(zip(texts, vecs))],
        "doc_ord long, chunk_id string, vec array<float>",
    )
    q = hash_embed("topic 3 doc", dim=32)

    def ref_cosine(a, b):
        denom = float(np.linalg.norm(a) * np.linalg.norm(b))
        return 0.0 if denom == 0.0 else float(np.dot(a, b) / denom)

    expected = sorted(
        ((ref_cosine(q, v), -i, f"c{i}") for i, v in enumerate(vecs)), reverse=True
    )[:5]
    got = semantic_topk(emb, q, top_k=5).collect()
    assert [r["chunk_id"] for r in got] == [e[2] for e in expected]
    for r, e in zip(got, expected):
        assert abs(r["cosine"] - e[0]) < 1e-6


def test_sparse_ordinals_monotone_in_partition_order(spark) -> None:
    df = (
        spark.createDataFrame([(f"u{i:03d}", i) for i in range(100)], "url string, x int")
        .repartitionByRange(4, "url")
        .sortWithinPartitions("url")
    )
    got = sparse_ordinals(df).orderBy("url").collect()
    ords = [r["doc_ord"] for r in got]
    assert all(a < b for a, b in zip(ords, ords[1:]))


def test_assign_doc_ords_dense(spark) -> None:
    df = spark.createDataFrame(
        [(f"u{i:03d}", i % 3) for i in range(50)], "url string, chunk_index int"
    )
    got = assign_doc_ords(df, ["url", "chunk_index"], n_partitions=4).collect()
    got.sort(key=lambda r: (r["url"], r["chunk_index"]))
    assert [r["doc_ord"] for r in got] == list(range(50))


def test_text_analysis_columns(spark) -> None:
    from rifflux_spark.functions import text_analysis as TA

    df = spark.createDataFrame(
        [
            (0, "The quick brown fox, with the dog!"),
            (1, ""),
            (2, "!!! ,,,"),
        ],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        TA.token_count(F.col("text")).alias("tc"),
        TA.whitespace_token_count(F.col("text")).alias("ws"),
        TA.stopword_ratio(F.col("text")).alias("sw"),
        TA.punct_ratio(F.col("text")).alias("pr"),
        TA.lang_guess(F.col("text")).alias("lang"),
        TA.fingerprint(F.col("text"), 2).alias("fp"),
    ).collect()
    r0 = out[0]
    assert r0["tc"] == 7
    assert r0["ws"] == 7
    assert abs(r0["sw"] - 3 / 7) < 1e-9  # the, with, the
    assert r0["lang"] == "en"
    assert len(r0["fp"]) == 32
    r1, r2 = out[1], out[2]
    assert r1["tc"] == 0 and r1["lang"] == "und" and r1["sw"] == 0.0
    assert r2["tc"] == 0 and r2["pr"] > 0.5


def test_glob_filter_matches_fnmatch(spark) -> None:
    """glob_filter == the reference's any-include-and-no-exclude fnmatch
    semantics, for LIKE-translatable and character-class globs alike."""
    from fnmatch import fnmatch

    from rifflux_spark.operators.filters import glob_filter

    paths = [
        "docs/intro.md", "docs/deep/guide.md", "src/main.py", "readme.MD",
        "docs/skip7.md", "notes/a1.md", "notes/a2.md", "under_score.md",
        "100%true.md",
    ]
    df = spark.createDataFrame([(p,) for p in paths], "url string")
    include = ("docs/*.md", "notes/a[12].md", "*%true.md", "under?score.md")
    exclude = ("*7*",)
    got = {r["url"] for r in glob_filter(df, "url", include, exclude).collect()}
    want = {
        p for p in paths
        if any(fnmatch(p, g) for g in include) and not any(fnmatch(p, g) for g in exclude)
    }
    assert got == want and got  # non-empty, exact parity
