"""End-to-end index build: pages → chunks → postings/stats/embeddings, with
per-shard lineage records and checkpoint resume.

This is the Spark analog of the reference's reindex path (reference
src/rifflux/indexing/indexer.py:46-139 + the FTS trigger index build):
one declarative DAG instead of a per-file loop. The background-queue
machinery (reference src/rifflux/indexing/background.py:75-218) maps to
job-level resumability: each stage appends a lineage row with row/byte
metrics on success, and a re-run of the same ``build_id`` skips completed
stages — combined with deterministic chunk ids (chunker.py) re-runs are
idempotent. Task-level transient failures are Spark's own retries
(spark.task.maxFailures), replacing the reference's 3×-backoff loop.

Posting shards: term buckets are processed in ``n_build_shards`` groups —
each group is an independent job + lineage row, so a killed build resumes
from the last completed shard (north_rule "resumable from checkpoint").
"""

from __future__ import annotations

import datetime as dt
import hashlib
from pathlib import Path

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

import pandas as pd

from rifflux_spark.config import EngineConfig
from rifflux_spark.functions.embedder import embed_series
from rifflux_spark.operators.doc_ids import assign_doc_ords
from rifflux_spark.operators.postings import (
    chunk_pages,
    corpus_stats,
    encode_postings,
    term_frequencies,
    term_stats,
    with_tokens,
)
from rifflux_spark.sources.tables import CORPUS_STATS_SCHEMA, IndexStore


def _dir_bytes(path: str) -> int:
    p = Path(path)
    if not p.exists():
        return 0
    return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())


def make_build_id(pages: DataFrame, config: EngineConfig) -> str:
    """Deterministic id over the input fingerprint + physical config, so a
    re-run of the same build resumes rather than restarts."""
    n = pages.count()
    sig = f"{n}:{config.block_size}:{config.salt_range}:{config.n_term_buckets}:{config.max_chunk_chars}:{config.min_chunk_chars}"
    return hashlib.sha256(sig.encode()).hexdigest()[:16]


def completed_stages(store: IndexStore, build_id: str) -> set[str]:
    if not store.exists("lineage"):
        return set()
    rows = (
        store.lineage()
        .filter((F.col("build_id") == build_id) & (F.col("status") == "completed"))
        .select("stage")
        .collect()
    )
    return {r["stage"] for r in rows}


def _now() -> dt.datetime:
    return dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    config: EngineConfig | None = None,
    embedding_dim: int | None = None,
    build_id: str | None = None,
    with_embeddings: bool = True,
) -> dict:
    """Build the full index under ``index_dir``. Returns metrics."""
    config = config or EngineConfig()
    dim = embedding_dim or config.embedding_dim
    store = IndexStore(spark, index_dir, config.n_term_buckets)
    build_id = build_id or make_build_id(pages, config)
    done = completed_stages(store, build_id)
    metrics: dict = {"build_id": build_id, "skipped_stages": sorted(done)}

    # --- stage: chunks (chunk UDF + explode + dense doc ordinals) ---
    if "chunks" not in done:
        chunks = chunk_pages(pages, config)
        chunks = assign_doc_ords(chunks, ["url", "chunk_index"])
        chunks = with_tokens(chunks).persist(StorageLevel.MEMORY_AND_DISK)
        store.write_chunks(chunks)
        n_chunks = store.chunks().count()
        store.append_lineage(
            [
                {
                    "build_id": build_id,
                    "stage": "chunks",
                    "status": "completed",
                    "rows": n_chunks,
                    "bytes": _dir_bytes(store.path("chunks")),
                    "detail": None,
                    "finished_at": _now(),
                }
            ]
        )
        chunks.unpersist()
        metrics["n_chunks"] = n_chunks

    # re-derive tokenized chunks from the persisted table (cheap, columnar)
    tokenized = with_tokens(store.chunks().select("doc_ord", "url", "chunk_id", "chunk_index", "heading_path", "content", "token_count"))

    # --- stage: corpus stats ---
    if "stats" not in done:
        cs = corpus_stats(tokenized)
        store.write_small(cs.select([f.name for f in CORPUS_STATS_SCHEMA.fields]), "corpus_stats")
        store.append_lineage(
            [
                {
                    "build_id": build_id,
                    "stage": "stats",
                    "status": "completed",
                    "rows": 1,
                    "bytes": _dir_bytes(store.path("corpus_stats")),
                    "detail": None,
                    "finished_at": _now(),
                }
            ]
        )
    avgdl = float(store.corpus_stats()["avgdl"])

    # --- stages: posting shards (checkpoint unit) + term stats ---
    tf = term_frequencies(tokenized).persist(StorageLevel.MEMORY_AND_DISK)
    shard_stages = [f"postings_shard_{s}" for s in range(config.n_build_shards)]
    if any(st not in done for st in shard_stages):
        for s, stage in enumerate(shard_stages):
            if stage in done:
                continue
            shard_tf = tf.filter(
                F.pmod(F.xxhash64("term"), F.lit(config.n_term_buckets)) % config.n_build_shards == s
            )
            blocks = encode_postings(shard_tf, avgdl, config)
            store.write_postings(blocks, mode="overwrite")  # dynamic partition overwrite
            store.append_lineage(
                [
                    {
                        "build_id": build_id,
                        "stage": stage,
                        "status": "completed",
                        "rows": None,
                        "bytes": _dir_bytes(store.path("postings")),
                        "detail": f"shard {s}/{config.n_build_shards}",
                        "finished_at": _now(),
                    }
                ]
            )

    if "term_stats" not in done:
        store.write_term_stats(term_stats(tf))
        store.append_lineage(
            [
                {
                    "build_id": build_id,
                    "stage": "term_stats",
                    "status": "completed",
                    "rows": None,
                    "bytes": _dir_bytes(store.path("term_stats")),
                    "detail": None,
                    "finished_at": _now(),
                }
            ]
        )
    tf.unpersist()

    # --- stage: embeddings ---
    if with_embeddings and "embeddings" not in done:
        @pandas_udf(T.ArrayType(T.FloatType()))
        def embed_udf(texts: pd.Series) -> pd.Series:
            return embed_series(texts, dim=dim)

        emb = store.chunks().select(
            "doc_ord",
            "chunk_id",
            F.lit(f"hash-{dim}").alias("model"),
            F.lit(dim).alias("dim"),
            embed_udf("content").alias("vec"),
        )
        store.write_embeddings(emb)
        store.append_lineage(
            [
                {
                    "build_id": build_id,
                    "stage": "embeddings",
                    "status": "completed",
                    "rows": None,
                    "bytes": _dir_bytes(store.path("embeddings")),
                    "detail": f"hash-{dim}",
                    "finished_at": _now(),
                }
            ]
        )

    # --- stage: catalog (for incremental diffing) ---
    if "catalog" not in done:
        cat = (
            pages.select(
                "url",
                F.col("warc_ts") if "warc_ts" in pages.columns else F.lit(None).cast("timestamp").alias("warc_ts"),
                F.length("text").cast("long").alias("size_bytes"),
                F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).alias("sha256"),
            )
            .join(
                store.chunks().groupBy("url").agg(F.count("*").cast("int").alias("n_chunks")),
                on="url",
                how="left",
            )
            .withColumn("n_chunks", F.coalesce("n_chunks", F.lit(0)))
        )
        store.write_small(cat, "catalog")
        store.append_lineage(
            [
                {
                    "build_id": build_id,
                    "stage": "catalog",
                    "status": "completed",
                    "rows": None,
                    "bytes": _dir_bytes(store.path("catalog")),
                    "detail": None,
                    "finished_at": _now(),
                }
            ]
        )

    metrics["n_docs"] = int(store.corpus_stats()["n_docs"])
    metrics["avgdl"] = avgdl
    return metrics
