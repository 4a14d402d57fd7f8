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

Pipeline economics: the chunk/tokenize UDF output is persisted ONCE and
feeds every downstream stage (chunk sink, corpus stats, tf, embeddings) —
the expensive Python stages run exactly one pass over the corpus.
"""

from __future__ import annotations

import datetime as dt
import hashlib
from pathlib import Path

import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from rifflux_spark.config import EngineConfig
from rifflux_spark.functions.embedder import embed_series
from rifflux_spark.operators.doc_ids import sparse_ordinals
from rifflux_spark.operators.postings import (
    chunk_pages,
    encode_postings,
    term_frequencies,
    term_stats,
    with_tokens,
)
from rifflux_spark.sources.tables import IndexStore


def _dir_bytes(path: str) -> int:
    p = Path(path)
    if not p.exists():
        return 0
    return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())


def make_build_id(pages: DataFrame, config: EngineConfig) -> str:
    """Deterministic id over the input fingerprint + physical config, so a
    re-run of the same build resumes rather than restarts."""
    n = pages.count()
    sig = (
        f"{n}:{config.block_size}:{config.salt_range}:{config.n_term_buckets}:"
        f"{config.max_chunk_chars}:{config.min_chunk_chars}"
    )
    return hashlib.sha256(sig.encode()).hexdigest()[:16]


def completed_stages(store: IndexStore, build_id: str) -> set[str]:
    return {
        r["stage"]
        for r in store.read_lineage_rows()
        if r.get("build_id") == build_id and r.get("status") == "completed"
    }


def _now() -> dt.datetime:
    return dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)


def _mark(store: IndexStore, build_id: str, stage: str, rows: int | None, path: str, detail: str | None = None) -> None:
    store.append_lineage(
        [
            {
                "build_id": build_id,
                "stage": stage,
                "status": "completed",
                "rows": rows,
                "bytes": _dir_bytes(path),
                "detail": detail,
                "finished_at": _now(),
            }
        ]
    )


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
    import time as _time

    config = config or EngineConfig()
    dim = embedding_dim or config.embedding_dim
    store = IndexStore(spark, index_dir, config.n_term_buckets)
    build_id = build_id or make_build_id(pages, config)
    done = completed_stages(store, build_id)
    metrics: dict = {"build_id": build_id, "skipped_stages": sorted(done)}
    stage_sec: dict[str, float] = {}
    metrics["stage_sec"] = stage_sec
    _t = _time.perf_counter()

    def _lap(name: str) -> None:
        nonlocal _t
        now = _time.perf_counter()
        stage_sec[name] = round(now - _t, 2)
        _t = now

    # --- tokenized chunks: ONE Python-UDF pass, staged to parquet ---
    # Range-partition the PAGES by url (the sampling job prunes to one
    # small column — never runs the chunk UDF), then chunk + tokenize +
    # sort + sparse ordinals as one narrow stage written straight to a
    # staging table. No DataFrame cache anywhere: caching array<string>
    # columns pays heavy columnar-compression CPU under concurrency;
    # parquet staging is cheaper and column-prunes for every consumer.
    resuming_chunks = "chunks" in done
    if not resuming_chunks:
        n_part = spark.sparkContext.defaultParallelism
        pages_parted = pages.repartitionByRange(n_part, "url")
        chunks = chunk_pages(pages_parted, config).sortWithinPartitions("url", "chunk_index")
        tokenized = sparse_ordinals(with_tokens(chunks))
        store.write_chunks(tokenized, ordered=True)
    _lap("chunks_udf_write")
    staged = store.chunks()

    # one cheap column-pruned agg: chunk count + token totals
    agg = staged.agg(F.count("*").alias("n"), F.sum("dl").alias("sdl")).collect()[0]
    n_chunks, total_tokens = int(agg["n"]), int(agg["sdl"] or 0)
    _lap("stats_agg")
    metrics["n_chunks"] = n_chunks
    if not resuming_chunks:
        _mark(store, build_id, "chunks", n_chunks, store.path("chunks"))

    # --- corpus stats (driver-side) ---
    if "stats" not in done:
        avgdl = total_tokens / n_chunks if n_chunks else 0.0
        store.write_corpus_stats(n_chunks, total_tokens, avgdl)
        _mark(store, build_id, "stats", 1, store.path("corpus_stats"))
    avgdl = float(store.corpus_stats()["avgdl"])
    tokenized = staged

    # --- posting shards (checkpoint/resume unit) + term stats ---
    shard_stages = [f"postings_shard_{s}" for s in range(config.n_build_shards)]
    need_tf = any(st not in done for st in shard_stages) or "term_stats" not in done
    if need_tf:
        # tf reads column-pruned (doc_ord, dl, tokens) from staging; the
        # aggregated (term, doc, tf) frame is small enough to cache
        tf = term_frequencies(tokenized).persist(StorageLevel.MEMORY_AND_DISK)
        for s, stage in enumerate(shard_stages):
            if stage in done:
                continue
            shard_tf = tf.filter(
                F.pmod(F.xxhash64("term"), F.lit(config.n_term_buckets)) % config.n_build_shards == s
            )
            blocks = encode_postings(shard_tf, config)
            store.write_postings(blocks, mode="overwrite")  # dynamic partition overwrite
            _lap(f"postings_{s}")
            _mark(
                store, build_id, stage, None, store.path("postings"),
                detail=f"shard {s}/{config.n_build_shards}",
            )
        if "term_stats" not in done:
            store.write_term_stats(term_stats(tf))
            _lap("term_stats")
            _mark(store, build_id, "term_stats", None, store.path("term_stats"))
        tf.unpersist()

    # --- embeddings (reuses the cached content column) ---
    if with_embeddings and "embeddings" not in done:
        @pandas_udf(T.ArrayType(T.FloatType()))
        def embed_udf(texts: pd.Series) -> pd.Series:
            return embed_series(texts, dim=dim)

        emb = tokenized.select(
            "doc_ord",
            "chunk_id",
            F.lit(f"hash-{dim}").alias("model"),
            F.lit(dim).alias("dim"),
            embed_udf("content").alias("vec"),
        )
        store.write_embeddings(emb, ordered=True)
        _lap("embeddings")
        _mark(store, build_id, "embeddings", n_chunks, store.path("embeddings"), detail=f"hash-{dim}")

    # --- catalog (for incremental diffing) ---
    if "catalog" not in done:
        per_url = tokenized.groupBy("url").agg(F.count("*").cast("int").alias("n_chunks"))
        cat = (
            pages.select(
                "url",
                F.col("warc_ts") if "warc_ts" in pages.columns else F.lit(None).cast("timestamp").alias("warc_ts"),
                F.length("text").cast("long").alias("size_bytes"),
                F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).alias("sha256"),
            )
            .join(per_url, on="url", how="left")
            .withColumn("n_chunks", F.coalesce("n_chunks", F.lit(0)))
        )
        store.write_small(cat, "catalog")
        _lap("catalog")
        _mark(store, build_id, "catalog", None, store.path("catalog"))

    metrics["n_docs"] = int(store.corpus_stats()["n_docs"])
    metrics["avgdl"] = avgdl
    return metrics
