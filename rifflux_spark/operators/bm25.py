"""BM25 top-k over the block-compressed posting index, with optional
block-max pruning.

Reproduces FTS5 bm25 exactly (verified against SQLite in
tests/test_bm25_rank_identity.py; reference sqlite_store.py:150-182):

    idf(t)  = ln((N - df_t + 0.5) / (df_t + 0.5)), clamped to 1e-6 if <= 0
    wtf     = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),  k1=1.2 b=0.75
    score   = Σ_t idf(t) * wtf          (returned negated, FTS5 convention)

``dl`` is the summed token length of both indexed columns (content +
heading_path, unit weights) — stored inline in the blocks, so scoring
needs **no join against a doc-length table**: only the scalars N and
avgdl ship with the query. Ranking ties break on ``doc_ord`` ascending =
SQLite rowid order (SURVEY.md §4).

Block-max pruning (SURVEY.md §2 Q3): per-term per-block upper bounds
``UB(B_t) = idf_t * block_max_wtf(B_t)``. For a disjunctive query any
doc touching block ``B_t`` has total score ≤ UB(B_t) + Σ_{t'≠t}
max_B UB(B_t'). If that bound is below a threshold θ that itself lower-
bounds the true k-th best score, every doc in the block is globally out
of the top-k — so skipped blocks cannot affect membership *or* the exact
scores of survivors. θ comes from fully scoring the highest-impact blocks
per term. Pruning on/off is correctness-invariant (tested).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rifflux_spark.config import EngineConfig
from rifflux_spark.functions.tokenizer import compile_query
from rifflux_spark.operators import wand
from rifflux_spark.operators.codec import bm25_wtf, decode_blocks_batch
from rifflux_spark.sources.tables import IndexStore

_SCORE_ROW = T.StructType(
    [
        T.StructField("doc_ord", T.LongType(), False),
        T.StructField("partial", T.DoubleType(), False),
    ]
)


def idf_for_terms(store: IndexStore, terms: list[str], n_docs: int) -> dict[str, float]:
    """FTS5 ln-idf with the observed 1e-6 clamp; terms absent from the
    index simply contribute nothing (df lookup returns no row)."""
    if not terms:
        return {}
    stats = (
        store.term_stats()
        .filter(F.col("term").isin(terms))
        .select("term", "df_docs")
        .collect()
    )
    out: dict[str, float] = {}
    for row in stats:
        df_t = int(row["df_docs"])
        idf = math.log((n_docs - df_t + 0.5) / (df_t + 0.5))
        out[row["term"]] = idf if idf > 0 else 1e-6
    return out


def _score_blocks(blocks: DataFrame, idf: dict[str, float], avgdl: float, k1: float, b: float) -> DataFrame:
    """Decode blocks → per-(doc, term) partial scores, pre-aggregated per
    Arrow batch to shrink the shuffle."""
    idf_b = dict(idf)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            # one vectorized decode of EVERY block in the Arrow batch
            # (LEB128 self-delimits, so the byte concatenation decodes in
            # one pass; per-posting idf is an np.repeat per block)
            ns = pdf["n_docs"].to_numpy(dtype=np.int64)
            docs, tf, dl = decode_blocks_batch(
                [bytes(x) for x in pdf["gaps"]],
                [bytes(x) for x in pdf["tfs"]],
                [bytes(x) for x in pdf["dls"]],
                ns,
                pdf["first_doc"].to_numpy(dtype=np.int64),
            )
            idf_per = np.repeat(np.array([idf_b[t] for t in pdf["term"]]), ns)
            partials = bm25_wtf(tf, dl, avgdl, k1, b) * idf_per
            agg = pd.DataFrame({"doc_ord": docs, "partial": partials}).groupby(
                "doc_ord", as_index=False
            )["partial"].sum()
            yield agg

    cols = ["term", "gaps", "tfs", "dls", "n_docs", "first_doc"]
    return blocks.select(*cols).mapInPandas(score, schema=_SCORE_ROW)


def bm25_topk(
    spark,
    store: IndexStore,
    query: str,
    top_k: int = 10,
    config: EngineConfig | None = None,
    prune: bool = True,
    cstats: dict | None = None,
    min_blocks_to_prune: int = 64,
) -> DataFrame:
    """Top-k lexical search → (doc_ord, bm25_score) with FTS5's negated
    score convention, best first.

    Physical shape: posting scan (partition+rowgroup pruned by term) →
    decode/score mapInPandas → groupBy(doc_ord).sum → TakeOrderedAndProject.
    """
    config = config or EngineConfig()
    terms = compile_query(query)
    if not terms:
        return spark.createDataFrame(
            [], "doc_ord long, bm25_score double"
        )
    cstats = cstats or store.corpus_stats()
    n_docs, avgdl = int(cstats["n_docs"]), float(cstats["avgdl"])
    idf = idf_for_terms(store, sorted(set(terms)), n_docs)
    # FTS5 scores every phrase instance: a term repeated in the query
    # contributes once per occurrence (observed vs the oracle), so weight
    # idf by query-term multiplicity.
    mult: dict[str, int] = {}
    for t in terms:
        mult[t] = mult.get(t, 0) + 1
    idf = {t: v * mult[t] for t, v in idf.items()}
    terms = sorted(idf)
    if not terms:
        return spark.createDataFrame([], "doc_ord long, bm25_score double")

    blocks = store.postings_for_terms(terms)

    if prune:
        blocks = _prune_blocks(blocks, idf, top_k, avgdl, config, min_blocks_to_prune, store=store)

    scored = _score_blocks(blocks, idf, avgdl, config.bm25_k1, config.bm25_b)
    agg = scored.groupBy("doc_ord").agg(F.sum("partial").alias("score"))
    # incremental deletes: drop tombstoned docs (set is small between
    # compactions — broadcast anti-join; compaction clears it)
    if store.exists("tombstones"):
        agg = agg.join(F.broadcast(store.tombstones()), on="doc_ord", how="left_anti")
    topk = agg.orderBy(F.desc("score"), F.asc("doc_ord")).limit(top_k)
    return topk.select("doc_ord", (-F.col("score")).alias("bm25_score"))


def _prune_blocks(
    blocks: DataFrame,
    idf: dict[str, float],
    top_k: int,
    avgdl: float,
    config: EngineConfig,
    min_blocks_to_prune: int = 64,
    store: IndexStore | None = None,
) -> DataFrame:
    """Drop blocks that provably cannot host any top-k doc.

    Driver-side on block *metadata* only (one row per block for the query's
    terms). Falls back to no-op when there are fewer blocks than the seed
    pass would cost to justify, and also when there are MORE than
    ``max_blocks_to_prune``: a six-figure block count means stopword-class
    terms whose clamped idfs make every bound uniform — WAND cannot prune,
    and collecting that much metadata to the driver plus the extra seed
    job costs more than the decode it would save.
    """
    max_blocks_to_prune = 20_000
    # one job for both guards AND the metadata: collect at most cap+1 rows
    # — hitting the cap means stopword-class terms (no-op), and a short
    # result gives the block count for the min guard for free
    meta = (
        blocks.select("term", "salt", "block_seq", "n_docs", "block_max_tf", "block_min_dl")
        .limit(max_blocks_to_prune + 1)
        .collect()
    )
    n_blocks = len(meta)
    if n_blocks < min_blocks_to_prune or n_blocks > max_blocks_to_prune:
        return blocks
    # shared WAND math (operators/wand.py) — identical bound/seed/keep
    # logic as the coordinator path (local_exec), by construction
    terms_arr = [r["term"] for r in meta]
    keys = [(r["term"], int(r["salt"]), int(r["block_seq"])) for r in meta]
    ub = wand.block_upper_bounds(
        terms_arr,
        [r["block_max_tf"] for r in meta],
        [r["block_min_dl"] for r in meta],
        idf, avgdl, config.bm25_k1, config.bm25_b,
    )
    seed, total_other = wand.seed_blocks_and_slack(
        terms_arr, ub, [int(r["n_docs"]) for r in meta], top_k
    )
    # if the seed set is everything, skip the extra pass
    if len(seed) >= n_blocks:
        return blocks
    seed_keys = {keys[i] for i in seed}

    seed_blocks = blocks.filter(
        F.concat_ws("\x00", "term", F.col("salt").cast("string"), F.col("block_seq").cast("string")).isin(
            ["\x00".join((t, str(s), str(q))) for t, s, q in seed_keys]
        )
    )
    seed_agg = (
        _score_blocks(seed_blocks, idf, avgdl, config.bm25_k1, config.bm25_b)
        .groupBy("doc_ord")
        .agg(F.sum("partial").alias("score"))
    )
    # θ must lower-bound the k-th best LIVE score: a tombstoned doc in the
    # seed would inflate it and over-prune blocks holding live survivors
    if store is not None and store.exists("tombstones"):
        seed_agg = seed_agg.join(F.broadcast(store.tombstones()), on="doc_ord", how="left_anti")
    seed_scores = seed_agg.orderBy(F.desc("score")).limit(top_k).collect()
    if len(seed_scores) < top_k:
        return blocks  # not enough docs to justify pruning
    theta = float(seed_scores[-1]["score"])

    keep_keys = [
        "\x00".join((keys[i][0], str(keys[i][1]), str(keys[i][2])))
        for i in wand.keep_indices(terms_arr, ub, seed, total_other, theta)
    ]
    return blocks.filter(
        F.concat_ws("\x00", "term", F.col("salt").cast("string"), F.col("block_seq").cast("string")).isin(keep_keys)
    )


def rehydrate(topk: DataFrame, store: IndexStore) -> DataFrame:
    """Join-back of the tiny top-k against chunks (SURVEY.md §2 Q4).

    The doc_ord set is ≤ top_k, so Catalyst broadcast-joins it; the chunks
    scan prunes row groups on the sorted doc_ord column.
    """
    return topk.join(store.chunks(), on="doc_ord", how="inner")
