"""Positional FTS/NEAR gate: the full MATCH language on an index with
poslists (``store_positions=True``) must stay rank+score-identical to
real SQLite FTS5 on BOTH engines — phrase units, prefix members
(vocabulary-expanded; markers carry no positions), anchors, column
filters, and NEAR participation all evaluated from position
intersection (operators/ftsquery._PositionalCtx and the
``_*_frame_positional`` distributed twins), with the text-recheck path
as the standing fallback."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from rifflux_spark.config import EngineConfig
from rifflux_spark.plans.build import build_index
from rifflux_spark.service import SearchService
from rifflux_spark.sources.tables import IndexStore

from tests.sqlite_oracle import SqliteOracle

CONFIG = EngineConfig(
    block_size=16,
    salt_range=64,
    n_term_buckets=8,
    n_build_shards=1,
    embedding_dim=16,
    store_positions=True,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "xray"]


def _dense_pages(spark, n_docs: int, seed: int):
    rng = random.Random(seed)
    base_ts = dt.datetime(2026, 1, 1)
    rows = []
    for i in range(n_docs):
        n = rng.randrange(24, 48)
        text = " ".join(rng.choice(VOCAB) for _ in range(n))
        rows.append(
            (
                f"https://dense.example.com/page/{i:05d}",
                base_ts,
                f"<html><body>{text}</body></html>".encode(),
                text,
                "en",
            )
        )
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


@pytest.fixture(scope="module")
def built_index(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("posnearidx"))
    build_index(
        spark, _dense_pages(spark, 80, seed=31), index_dir, CONFIG, with_embeddings=False
    )
    store = IndexStore(spark, index_dir, CONFIG.n_term_buckets)
    assert store.has_positions()
    chunk_rows = (
        store.chunks()
        .orderBy("doc_ord")
        .select("doc_ord", "url", "chunk_id", "chunk_index", "heading_path", "content")
        .collect()
    )
    oracle = SqliteOracle()
    oracle.seed([r.asDict() for r in chunk_rows])
    yield index_dir, oracle
    oracle.close()


FIXED = [
    "NEAR(alpha beta)",
    "NEAR(alpha beta, 0)",
    "NEAR(alpha beta, 1)",
    "NEAR(alpha beta gamma, 2)",
    "NEAR(alpha alpha, 1)",          # self-NEAR: repeated phrase
    "NEAR(alpha bet*, 1)",           # prefix member -> expansion
    '"alpha beta" gamma',            # phrase unit in boolean context
    'NEAR("alpha beta" gamma, 2)',   # phrase member
    "NEAR(alpha beta, 0) OR gamma",
    "delta NOT NEAR(alpha beta, 0)",
    "content:NEAR(alpha beta, 1)",   # column-filtered group
    "NEAR(alpha zznever, 3)",        # unknown member -> []
    "^alpha beta",                   # anchored phrase
    'content:"alpha beta"',          # column-filtered phrase
    '"alpha beta" OR xr* NOT gamma',
]


def _check(service, oracle, q: str, engine: str) -> bool:
    got = service.fts(q, top_k=10, engine=engine)
    want = oracle.match_search(q, top_k=10)
    assert [r["chunk_id"] for r in got] == [r["chunk_id"] for r in want], (
        f"rank mismatch for MATCH {q!r} ({engine}, positional)"
    )
    for g, w in zip(got, want):
        assert abs(g["bm25_score"] - w["bm25_score"]) < 1e-6, (
            f"score mismatch for {q!r} ({engine}, positional)"
        )
    return bool(want)


@pytest.mark.parametrize("engine", ["local", "spark"])
def test_positional_fts_fixed_battery(built_index, spark, engine) -> None:
    index_dir, oracle = built_index
    service = SearchService(spark, index_dir, CONFIG)
    nonempty = sum(_check(service, oracle, q, engine) for q in FIXED)
    assert nonempty >= 9, "battery mostly vacuous"


def test_positional_near_randomized_differential(built_index, spark) -> None:
    """60 random NEAR queries on the positional index, local path (the
    spark path shares the same instance/participation kernels and is
    covered by the fixed battery)."""
    index_dir, oracle = built_index
    service = SearchService(spark, index_dir, CONFIG)
    rng = random.Random(77)
    nonempty = 0
    for _ in range(60):
        k = rng.randrange(2, 4)
        members = []
        for _ in range(k):
            r = rng.random()
            if r < 0.55:
                members.append(rng.choice(VOCAB))
            elif r < 0.8:
                members.append(rng.choice(VOCAB)[:3] + "*")
            else:
                members.append(f'"{rng.choice(VOCAB)} {rng.choice(VOCAB)}"')
        n = rng.randrange(0, 5)
        q = f"NEAR({' '.join(members)}, {n})"
        nonempty += _check(service, oracle, q, "local")
    assert nonempty >= 15, f"only {nonempty}/60 queries matched anything"
