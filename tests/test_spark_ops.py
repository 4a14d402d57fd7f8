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


def test_gopher_quality_flags(spark) -> None:
    """Edge semantics of the Gopher-rule columns: empty text, a fully
    repetitive text (dup fractions -> 1 - 1/total), a clean passing text,
    and a non-alpha-heavy text failing ok_alpha."""
    from rifflux_spark.functions import text_analysis as TA

    passing = " ".join(f"alpha{i} beta{i} gamma{i} delta{i} the" for i in range(12))
    df = spark.createDataFrame(
        [
            (0, ""),
            (1, "spam spam spam spam spam spam"),
            (2, passing),
            (3, "1 2 3 4 5 the 6 7 8 9 10 11 12 13 14 15 16 17 18 19"),
        ],
        "doc_id long, text string",
    )
    flags = TA.gopher_quality_flags(F.col("text"))
    rows = {r["doc_id"]: r for r in df.select("doc_id", *[v.alias(k) for k, v in flags.items()]).collect()}

    r0 = rows[0]
    assert r0["n_tokens"] == 0 and r0["dup_2gram_frac"] == 0.0 and not r0["pass_all"]

    r1 = rows[1]  # 6 tokens -> 5 identical 2-grams, 4 identical 3-grams
    assert abs(r1["dup_2gram_frac"] - (1 - 1 / 5)) < 1e-6
    assert abs(r1["dup_3gram_frac"] - (1 - 1 / 4)) < 1e-6
    assert not r1["ok_rep"] and not r1["pass_all"]

    r2 = rows[2]  # 60 unique-ish tokens, mwl in band, all-alpha, has stopword
    assert r2["ok_len"] and r2["ok_word_len"] and r2["ok_rep"] and r2["ok_alpha"] and r2["ok_stop"]
    assert r2["pass_all"]

    r3 = rows[3]  # digits dominate -> alpha fraction 1/20
    assert abs(r3["alpha_frac"] - 1 / 20) < 1e-6
    assert not r3["ok_alpha"] and not r3["pass_all"]


def test_dup_ngram_fraction_matches_python(spark) -> None:
    from rifflux_spark.functions import text_analysis as TA

    texts = [
        "a b a b a b c",
        "x y z x y z",
        "one two three four",
        "w w w",
        "solo",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["d2"], r["d3"])
        for r in df.select(
            "doc_id",
            TA.dup_ngram_fraction(F.col("text"), 2).alias("d2"),
            TA.dup_ngram_fraction(F.col("text"), 3).alias("d3"),
        ).collect()
    }

    def py_dup(t: str, n: int) -> float:
        toks = [w for w in t.lower().split() if w]
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        if not grams:
            return 0.0
        return round(1 - len(set(grams)) / len(grams), 6)

    for i, t in enumerate(texts):
        assert abs(got[i][0] - py_dup(t, 2)) < 1e-9, (i, got[i][0], py_dup(t, 2))
        assert abs(got[i][1] - py_dup(t, 3)) < 1e-9, (i, got[i][1], py_dup(t, 3))


def test_ngram_strings_zipwith_matches_python(spark) -> None:
    """ngrams_from_tokens builds grams via a zip_with chain (the 15×
    faster formulation) — the output must stay byte-identical to the
    definition (all in-order space-joined n-grams of the ascii tokens)
    across NULL/empty/short/repeat/unicode texts and every n used
    anywhere in the engine, shingles' distinct included. Guards the
    slice(start, Int.MaxValue) overflow that silently nulls the chain."""
    import re

    from rifflux_spark.functions import text_analysis as TA

    texts = [
        None, "", "  ", "a", "a b", "a b c", "the the the",
        "A, b! c? d; e", "x" * 5, "dup dup dup dup", "héllo wörld a b c",
        "a  b\t\nc", "7 8 9 10", "a-b_c d.e",
        "one two three four five six seven eight nine ten",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )

    def py_ngrams(t: str | None, n: int) -> list[str]:
        toks = [x for x in re.split(r"[^0-9a-z]+", (t or "").lower()) if x]
        if len(toks) < n:
            return []
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    for n in (1, 2, 3, 5):
        got = {
            r["i"]: r["g"]
            for r in df.select(
                "i", TA.ngram_strings(F.col("text"), n).alias("g")
            ).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == py_ngrams(t, n), (n, t, got[i])

    for n in (3, 5):
        got = {
            r["i"]: r["g"]
            for r in df.select("i", TA.shingles(F.col("text"), n).alias("g")).collect()
        }
        for i, t in enumerate(texts):
            want = list(dict.fromkeys(py_ngrams(t, n)))
            assert got[i] == want, (n, t, got[i])


def test_boilerplate_segment_stats(spark) -> None:
    """Segments are 10-token non-overlapping windows; a segment in >=3
    distinct docs is boilerplate; short docs yield zero segments."""
    from rifflux_spark.operators.dedup import boilerplate_segment_stats

    boiler = "subscribe to our newsletter follow us on social media today"  # 10 toks
    uniq = lambda d, n: " ".join(f"word{d}x{i}" for i in range(n))  # noqa: E731
    df = spark.createDataFrame(
        [
            (0, boiler + " " + uniq(0, 10)),   # boiler + 1 unique segment
            (1, boiler + " " + uniq(1, 10)),
            (2, boiler + " " + uniq(2, 15)),   # 15 toks after boiler -> tail dropped
            (3, uniq(3, 25)),                  # no boiler, 2 full segments
            (4, "too short"),                  # < 10 toks -> 0 segments
        ],
        "doc_id long, text string",
    )
    rows = {
        r["id"]: r
        for r in boilerplate_segment_stats(df, seg_len=10, min_docs=3).collect()
    }
    assert (rows[0]["n_segments"], rows[0]["n_boiler_segments"], rows[0]["kept_tokens"]) == (2, 1, 10)
    assert (rows[1]["n_segments"], rows[1]["n_boiler_segments"]) == (2, 1)
    assert (rows[2]["n_segments"], rows[2]["n_boiler_segments"]) == (2, 1)
    assert (rows[3]["n_segments"], rows[3]["n_boiler_segments"], rows[3]["kept_tokens"]) == (2, 0, 20)
    assert (rows[4]["n_segments"], rows[4]["n_boiler_segments"], rows[4]["kept_tokens"]) == (0, 0, 0)


def test_decontaminate_flags(spark) -> None:
    from rifflux_spark.operators.dedup import decontaminate_flags

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains benchmark grams (first 9 tokens -> two 8-grams)
            (0, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (1, "totally unrelated words nothing shared here at all really truly"),
            (2, "short"),
        ],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in decontaminate_flags(corpus, bench, gram_n=8).collect()}
    assert rows[0]["n_overlap_grams"] == 2 and rows[0]["contaminated"]
    assert rows[1]["n_overlap_grams"] == 0 and not rows[1]["contaminated"]
    assert rows[2]["n_overlap_grams"] == 0 and not rows[2]["contaminated"]


def test_pii_scrub_matches_python_re(spark) -> None:
    import hashlib
    import re as pyre

    from rifflux_spark.functions import text_analysis as TA

    texts = [
        "write to bob@example.com or alice.smith@sub.domain.org today",
        "call 415-555-0199 x2 or 212-555-0100",
        "no pii here at all",
        "mixed: a@b.co and 999-111-2222 end",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    cols = TA.pii_scrub(F.col("text"))
    rows = {r["doc_id"]: r for r in df.select("doc_id", *[v.alias(k) for k, v in cols.items()]).collect()}

    for i, t in enumerate(texts):
        red = pyre.sub(TA.EMAIL_PATTERN, "<EMAIL>", t)
        red = pyre.sub(TA.PHONE_PATTERN, "<PHONE>", red)
        assert rows[i]["n_emails"] == len(pyre.findall(TA.EMAIL_PATTERN, t)), i
        assert rows[i]["n_phones"] == len(pyre.findall(TA.PHONE_PATTERN, t)), i
        assert rows[i]["redacted_len"] == len(red), (i, red)
        assert rows[i]["redacted_md5"] == hashlib.md5(red.encode()).hexdigest(), i


def test_source_mix_sample_deterministic(spark) -> None:
    """Rate 1.0 keeps all, 0.0 keeps none, and the draw is the md5-based
    16-bit value — identical across repartitionings (content-keyed)."""
    import hashlib

    from rifflux_spark.functions import text_analysis as TA

    rows = [(i, "srcA" if i % 2 == 0 else "srcB", f"text number {i} payload") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = TA.source_mix_sample(df, {"srcA": 1.0, "srcB": 0.0}).collect()
    assert {r["source"] for r in kept} == {"srcA"} and len(kept) == 20
    for r in kept:
        h = int(hashlib.md5(f"text number {r['doc_id']} payload".encode()).hexdigest()[:4], 16)
        assert r["mix_draw"] == h

    half = TA.source_mix_sample(df.repartition(7), {}, default_rate=0.5)
    half_ids = sorted(r["doc_id"] for r in half.collect())
    half_ids2 = sorted(
        r["doc_id"] for r in TA.source_mix_sample(df.coalesce(1), {}, default_rate=0.5).collect()
    )
    assert half_ids == half_ids2  # partitioning-invariant


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
