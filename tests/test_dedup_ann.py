"""Training-data ops: exact/MinHash-LSH/SimHash dedup, brute-force + LSH
ANN, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rifflux_spark.operators.ann import ann_topk, brute_force_topk, bucketize
from rifflux_spark.operators.dedup import (
    exact_dupes,
    lsh_candidate_pairs,
    minhash_lsh_dedup,
    minhash_signatures,
    simhash64,
    simhash_near_dupes,
)
from rifflux_spark.operators.multimodal import (
    extract_media_meta,
    media_features,
    real_decode,
    sample_frames,
)

TEXTS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near-dup of 0
    (2, "completely different content about spark posting lists and compression"),
    (3, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
    (4, "another unrelated document mentioning streaming watermarks and state"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def test_exact_dupes(docs) -> None:
    d = exact_dupes(docs).collect()
    assert len(d) == 1
    assert d[0]["n_dups"] == 2
    assert d[0]["keep_id"] == 0


def test_minhash_lsh_finds_near_dup_pair(docs) -> None:
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in minhash_lsh_dedup(docs, threshold=0.5).collect()}
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0  # exact dup
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.5  # near dup
    assert all(not (a in (2, 4) or b in (2, 4)) for a, b in pairs)


def test_minhash_signatures_deterministic(docs, spark) -> None:
    s1 = {r["id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    s2 = {r["id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    assert s1 == s2
    assert s1[0] == s1[3]  # identical text → identical signature
    assert len(s1[0]) == 8


def test_lsh_candidates_subset_property(docs) -> None:
    sigs = minhash_signatures(docs)
    cands = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs).collect()}
    assert (0, 3) in cands  # identical docs always collide
    for a, b in cands:
        assert a < b


def test_simhash_near_dupes(docs) -> None:
    sims = simhash64(docs)
    rows = {r["id"]: r["simhash"] for r in sims.collect()}
    assert rows[0] == rows[3]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_dupes(sims, max_hamming=10).collect()}
    assert pairs.get((0, 3)) == 0
    assert (0, 1) in pairs  # near-dup within hamming 10
    assert (0, 2) not in pairs


def test_brute_force_ann_matches_numpy(spark) -> None:
    rng = np.random.RandomState(0)
    vecs = rng.normal(size=(100, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    q = rng.normal(size=16)
    got = [r["vec_id"] for r in brute_force_topk(df, q, top_k=5).collect()]
    cos = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    exp = np.argsort(-cos, kind="stable")[:5].tolist()
    assert got == exp


def test_lsh_ann_recall(spark) -> None:
    rng = np.random.RandomState(1)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    q = vecs[42].astype(np.float64)  # query near a known vector
    bucketed = bucketize(df, dim=16, n_planes=6)
    approx = [r["vec_id"] for r in ann_topk(bucketed, q, top_k=5, n_planes=6, n_probe=8).collect()]
    exact = [r["vec_id"] for r in brute_force_topk(df, q, top_k=5).collect()]
    assert approx[0] == 42  # its own bucket always probed first
    # decent recall on the rest
    assert len(set(approx) & set(exact)) >= 3
    # approx scans fewer rows than the corpus
    buckets_scanned = bucketed.filter(F.col("lsh_bucket").isin(
        __import__("rifflux_spark.operators.ann", fromlist=["probe_buckets"]).probe_buckets(q, 6, 7, 8)
    )).count()
    assert buckets_scanned < 300


def test_ivf_ann_exact_when_probing_all_cells(spark) -> None:
    """n_probe >= n_centroids degenerates to exact brute force — the IVF
    correctness invariant."""
    from rifflux_spark.operators.ann import ivf_index, ivf_topk, train_centroids

    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    q = rng.normal(size=16)
    cent = train_centroids(df, n_centroids=8, sample_n=200)
    indexed = ivf_index(df, cent)
    exact = [r["vec_id"] for r in brute_force_topk(df, q, top_k=5).collect()]
    allprobe = [r["vec_id"] for r in ivf_topk(indexed, cent, q, top_k=5, n_probe=8).collect()]
    assert allprobe == exact


def test_ivf_ann_recall_and_pruning(spark) -> None:
    from rifflux_spark.operators.ann import ivf_index, ivf_topk, train_centroids

    rng = np.random.RandomState(4)
    # clustered data: IVF's home turf
    centers = rng.normal(size=(6, 16)) * 4
    vecs = np.concatenate(
        [c + rng.normal(size=(50, 16)) * 0.4 for c in centers]
    ).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    q = vecs[17].astype(np.float64)
    cent = train_centroids(df, n_centroids=6, sample_n=300)
    indexed = ivf_index(df, cent)
    approx = [r["vec_id"] for r in ivf_topk(indexed, cent, q, top_k=5, n_probe=2).collect()]
    exact = [r["vec_id"] for r in brute_force_topk(df, q, top_k=5).collect()]
    assert approx[0] == 17
    assert len(set(approx) & set(exact)) >= 4
    # probing 2 of 6 cells scans a fraction of the corpus
    import numpy as _np
    d = ((cent - q[None, :]) ** 2).sum(axis=1)
    cells = [int(i) for i in _np.argsort(d, kind="stable")[:2]]
    scanned = indexed.filter(F.col("ivf_cell").isin(cells)).count()
    assert scanned < len(vecs)


def test_multimodal_meta_and_features(spark) -> None:
    rows = [
        (0, b"\x89PNG fake image bytes", "image"),
        (1, b"RIFF fake wav bytes", "audio"),
        (2, b"\x00\x00ftyp fake mp4", "video"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary, media_type string")
    meta = {r["doc_id"]: r["meta"] for r in extract_media_meta(df).collect()}
    assert meta[0]["media_type"] == "image" and meta[0]["width"] is not None
    assert meta[1]["duration_ms"] is not None and meta[1]["width"] is None
    assert meta[0]["n_bytes"] == len(rows[0][1])

    feats = {r["doc_id"]: r["feature"] for r in media_features(df, dim=8).collect()}
    assert len(feats[0]) == 8
    assert abs(float(np.linalg.norm(feats[0])) - 1.0) < 1e-5
    # deterministic
    feats2 = {r["doc_id"]: r["feature"] for r in media_features(df, dim=8).collect()}
    assert feats == feats2

    frames = sample_frames(df.filter(F.col("media_type") == "video")).collect()
    assert len(frames) >= 1
    assert all(f["frame_ts_ms"] % 1000 == 0 for f in frames)


def test_real_decode_parses_png_ihdr(spark) -> None:
    """A REAL committed PNG byte string (1×1 transparent pixel, full
    valid file): real_decode must read width/height straight from the
    IHDR header, and extract_media_meta must prefer those over the
    deterministic fake. Non-PNG media still raise (explicit stub)."""
    import struct

    png_1x1 = bytes.fromhex(
        "89504e470d0a1a0a0000000d49484452000000010000000108060000001f15c489"
        "0000000d49444154789c626001000000ffff03000006000557bfabd4000000004945"
        "4e44ae426082"
    )
    d = real_decode(png_1x1, "image")
    assert d == {"format": "png", "width": 1, "height": 1}
    # synthetic header with arbitrary dims parses too
    hdr = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", 320, 200, 8, 2, 0, 0, 0)
    )
    assert real_decode(hdr, "image") == {"format": "png", "width": 320, "height": 200}

    df = spark.createDataFrame(
        [(0, png_1x1, "image"), (1, b"not a png", "image")],
        "doc_id long, payload binary, media_type string",
    )
    meta = {r["doc_id"]: r["meta"] for r in extract_media_meta(df).collect()}
    assert (meta[0]["width"], meta[0]["height"], meta[0]["format"]) == (1, 1, "png")
    assert meta[1]["width"] is not None  # fake fallback still fills dims

    with pytest.raises(NotImplementedError):
        real_decode(b"x", "image")
    with pytest.raises(NotImplementedError):
        real_decode(png_1x1, "audio")


def test_real_decode_parses_jpeg_sof_and_wav_riff() -> None:
    """JPEG dims from the SOFn frame header (marker-segment walk, ITU
    T.81 §B.2.2) and WAV duration from the RIFF fmt/data chunks — both
    stdlib-only; truncated/malformed streams fall back to the stub."""
    import struct

    def jpeg(w, h, marker=b"\xff\xc0", fill=b""):
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        sof = marker + struct.pack(">HBHHB", 17, 8, h, w, 3) + b"\x01\x22\x00" * 3
        return b"\xff\xd8" + app0 + fill + sof + b"\xff\xd9"

    assert real_decode(jpeg(640, 480), "image") == {
        "format": "jpeg", "width": 640, "height": 480,
    }
    # progressive (SOF2) and fill bytes before a marker are legal
    assert real_decode(jpeg(33, 7, marker=b"\xff\xc2", fill=b"\xff"), "image") == {
        "format": "jpeg", "width": 33, "height": 7,
    }
    # DHT (C4) is NOT a frame header — must be skipped, not misparsed
    dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"
    assert real_decode(
        b"\xff\xd8" + dht + jpeg(99, 88)[2:], "image"
    ) == {"format": "jpeg", "width": 99, "height": 88}
    # truncated stream / EOI before SOF → stub
    with pytest.raises(NotImplementedError):
        real_decode(b"\xff\xd8\xff\xd9", "image")
    with pytest.raises(NotImplementedError):
        real_decode(jpeg(1, 1)[:10], "image")

    def gif(w, h, sig=b"GIF89a"):
        return sig + struct.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"

    assert real_decode(gif(320, 200), "image") == {
        "format": "gif", "width": 320, "height": 200,
    }
    assert real_decode(gif(1, 1, sig=b"GIF87a"), "image") == {
        "format": "gif", "width": 1, "height": 1,
    }
    # truncated screen descriptor / wrong signature → stub
    with pytest.raises(NotImplementedError):
        real_decode(b"GIF89a\x01\x00", "image")
    with pytest.raises(NotImplementedError):
        real_decode(gif(2, 2, sig=b"GIF88a"), "image")
    # a GIF presented as audio keeps the explicit stub
    with pytest.raises(NotImplementedError):
        real_decode(gif(2, 2), "audio")

    def wav(byte_rate, data_size):
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, byte_rate, byte_rate, 1, 8)
        data = b"data" + struct.pack("<I", data_size) + b"\x00" * data_size
        body = b"WAVE" + fmt + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    assert real_decode(wav(8000, 16000), "audio") == {
        "format": "wav", "duration_ms": 2000,
    }
    assert real_decode(wav(44100, 44100), "audio") == {
        "format": "wav", "duration_ms": 1000,
    }
    # a WAV payload presented as image keeps the explicit stub
    with pytest.raises(NotImplementedError):
        real_decode(wav(8000, 8), "image")
    # zero byte rate → stub (no division)
    with pytest.raises(NotImplementedError):
        real_decode(wav(0, 8), "audio")


def test_lsh_bucket_cap_bounds_pathological_corpus(spark) -> None:
    """A boilerplate corpus (many docs with identical text) lands in one
    LSH bucket on every band; without a cap the within-bucket self-join
    is quadratic. With max_bucket_size the hot bucket is dropped and the
    pair count stays bounded; distinct docs are still paired normally."""
    n = 120
    boiler = [(i, "identical boilerplate text repeated across the crawl snapshot") for i in range(n)]
    distinct = [
        (1000, "a unique document about varbyte compression of posting blocks"),
        (1001, "a unique document about varbyte compression of posting block"),  # near-dup of 1000
    ]
    df = spark.createDataFrame(boiler + distinct, "doc_id long, text string")

    sigs = minhash_signatures(df)
    capped = lsh_candidate_pairs(sigs, max_bucket_size=50).collect()
    # the n=120 boilerplate bucket (> cap) contributes zero pairs;
    # the near-dup pair in a small bucket survives
    ids = {(r["id_a"], r["id_b"]) for r in capped}
    assert (1000, 1001) in ids
    assert len(ids) == 1

    uncapped = lsh_candidate_pairs(sigs, max_bucket_size=None).count()
    assert uncapped >= n * (n - 1) // 2  # quadratic without the cap

    sims = simhash64(df)
    capped_sim = simhash_near_dupes(sims, max_hamming=12, max_bucket_size=50).collect()
    sim_ids = {(r["id_a"], r["id_b"]) for r in capped_sim}
    assert (1000, 1001) in sim_ids
    assert all(a >= 1000 for a, _ in sim_ids)


def test_token_budget_sample_two_phase_cumsum(spark) -> None:
    """The bucket-parallel cumulative sum must equal a naive global
    window, select a strict prefix of the hash order, and stay within
    budget; the next doc in hash order must overflow it."""
    from pyspark.sql import Window

    from rifflux_spark.functions.text_analysis import token_budget_sample, token_count

    rows = [(i, f"document number {i} " + "tok " * (5 + i % 17)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    budget = 1500
    got = token_budget_sample(df, budget).orderBy("cum_tokens").collect()
    assert got and got[-1]["cum_tokens"] <= budget

    naive = (
        df.select(
            "doc_id",
            token_count(F.col("text")).cast("long").alias("n_tokens"),
            F.md5("text").alias("h"),
        )
        .withColumn(
            "cum_tokens",
            F.sum("n_tokens").over(Window.orderBy("h", "doc_id")),
        )
        .filter(F.col("cum_tokens") <= budget)
        .orderBy("cum_tokens")
        .collect()
    )
    assert [(r["doc_id"], r["cum_tokens"]) for r in got] == [
        (r["doc_id"], r["cum_tokens"]) for r in naive
    ]
    # selective: a strict subset, and adding any next doc would overflow
    assert 0 < len(got) < 300


def test_semdedup_clusters_and_canonicals(spark) -> None:
    """SemDeDup (hyperplane-LSH candidates → exact-cosine verify →
    connected components): exact copies, positively-scaled copies
    (cosine exactly 1.0 — scaling never flips a sign bit) and a tiny
    perturbation cluster together; orthogonal and zero-norm vectors
    never enter the output."""
    from rifflux_spark.operators.dedup import semdedup

    rows = [
        (0, [1.0, 0, 0, 0, 0, 0, 0, 0]),
        (1, [1.0, 0, 0, 0, 0, 0, 0, 0]),        # exact copy
        (2, [2.0, 0, 0, 0, 0, 0, 0, 0]),        # scaled copy
        (3, [1.0, 0.05, 0, 0, 0, 0, 0, 0]),     # cosine ~0.99875
        (10, [0, 1.0, 0, 0, 0, 0, 0, 0]),
        (11, [0, 1.0, 0.01, 0, 0, 0, 0, 0]),    # near-dup pair
        (20, [0, 0, 0, 1.0, 0, 0, 0, 0]),       # unique
        (30, [0.0] * 8),                         # zero-norm
        (31, [0.0] * 8),                         # zero-norm copy: cosine 0.0
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: (r["component"], r["cluster_size"], r["is_canonical"])
        for r in semdedup(df, dim=8, threshold=0.95).collect()
    }
    assert out == {
        0: (0, 4, True),
        1: (0, 4, False),
        2: (0, 4, False),
        3: (0, 4, False),
        10: (10, 2, True),
        11: (10, 2, False),
    }


def test_semdedup_pairs_plan_is_bucketed_not_cartesian(spark) -> None:
    """The SemDeDup candidate join must be an equi-join on the band key
    (shuffles on (band, band_val)) — never a cartesian/broadcast-NL
    product — and the exact-cosine verify must be a Catalyst expression
    (no Python eval beyond the one Arrow signature UDF)."""
    from rifflux_spark.operators.dedup import semdedup_pairs

    rng = np.random.RandomState(5)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(rng.normal(size=(60, 8)).astype(np.float32))],
        "vec_id long, embedding array<float>",
    )
    plan = (
        semdedup_pairs(df, dim=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_substring_dedup_removes_repeated_passages(spark) -> None:
    """ExactSubstr at k=8 token windows: a 10-token passage shared by two
    docs is removed from BOTH (all-occurrences variant) with the
    surrounding original text intact (straddling windows are unique in
    context); an 8-token passage repeated WITHIN one doc is removed
    twice; docs below k tokens and unique docs pass through."""
    from rifflux_spark.operators.dedup import substring_dedup

    lit = "one two three four five six seven eight nine ten"
    lit2 = "aa bb cc dd ee ff gg hh"
    rows = [
        (0, "unique opening words here " + lit),
        (1, lit + " distinct closing remarks follow now"),
        (2, "totally unrelated text that has nothing repeated inside it at all"),
        (3, "short doc"),
        (4, lit2 + " " + lit2),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in substring_dedup(df, k=8).collect()
    }
    assert out[0] == ("unique opening words here", 14, 10)
    assert out[1] == ("distinct closing remarks follow now", 15, 10)
    assert out[2] == (rows[2][1], 11, 0)
    assert out[3] == ("short doc", 2, 0)
    assert out[4] == ("", 16, 16)
