"""Incremental index maintenance: diff → append runs → tombstones →
compaction.

The reference maintains freshness row-at-a-time (FTS5 triggers on
chunk delete/insert — reference src/rifflux/db/schema.sql:44-59 — driven
by the mtime/sha diff loop in indexer.py:59-131). The Spark rebuild makes
each piece an explicit set operation, exploiting the salted-run physical
layout (operators/postings.py):

- **diff**: catalog vs snapshot joins (sources/catalog.py, reference
  I1-I4);
- **new/changed docs**: chunk+tokenize only those pages, assign doc_ords
  ABOVE the current maximum (new salt ranges!) and append their posting
  blocks — because salt runs are disjoint contiguous doc ranges, appended
  runs slot into each term's block sequence without touching existing
  blocks (no decode-merge);
- **deleted/changed docs' old postings**: tombstoned by doc_ord.
  Query-time scoring drops tombstoned docs (an exact filter applied
  after block decode); a **compaction** pass rewrites only the term
  buckets that contain tombstoned postings and clears the tombstones —
  the Spark analog of FTS5's 'delete' trigger amortized into batches;
- corpus stats / term stats are recomputed incrementally (cheap aggs).

Invariant (tested): after incremental apply + compaction, the index is
byte-equivalent in query results to a from-scratch rebuild over the new
snapshot, except doc_ord numbering of re-chunked docs (ranking ties can
differ only where BM25 scores tie across a changed/unchanged doc pair —
the same caveat the reference has for rowid reuse).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from rifflux_spark.functions.embedder import embed_series_packed

from rifflux_spark.config import EngineConfig
from rifflux_spark.operators.doc_ids import PARTITION_ORD_STRIDE, sparse_ordinals
from rifflux_spark.operators.postings import (
    chunk_pages,
    encode_postings,
    term_frequencies,
    with_tokens,
)
from rifflux_spark.sources.catalog import diff_snapshot, snapshot_of
from rifflux_spark.sources.tables import TOMBSTONES_SCHEMA, IndexStore


def apply_incremental(
    spark: SparkSession,
    store: IndexStore,
    new_pages: DataFrame,
    config: EngineConfig | None = None,
    with_embeddings: bool = True,
    full_snapshot: bool = True,
) -> dict:
    """Bring the index in line with ``new_pages``.

    ``full_snapshot=True``: new_pages IS the next crawl — catalog urls
    absent from it are deletions (reference prune-missing, I4).
    ``full_snapshot=False``: new_pages is an upsert batch (streaming
    micro-batch) — absent urls are untouched.
    Returns counts per status."""
    config = config or EngineConfig()

    catalog = store.catalog()
    snap = snapshot_of(new_pages)
    d = diff_snapshot(catalog, snap).persist()
    if not full_snapshot:
        d = d.filter(F.col("status") != "deleted")
    counts = {r["status"]: r["n"] for r in d.groupBy("status").agg(F.count("*").alias("n")).collect()}

    changed_or_new = d.filter(F.col("status").isin(["new", "changed"])).select("url")
    gone_or_changed = d.filter(F.col("status").isin(["deleted", "changed"])).select("url")

    # --- tombstone old postings of deleted/changed docs ---
    old_doc_ords = (
        store.chunks()
        .join(F.broadcast(gone_or_changed), on="url", how="inner")
        .select("doc_ord")
    )
    n_tombstoned = _append_tombstones(store, old_doc_ords)

    # --- build appended runs for new/changed docs, ords above current max ---
    n_appended = 0
    if counts.get("new", 0) or counts.get("changed", 0):
        pages_to_index = new_pages.join(F.broadcast(changed_or_new), on="url", how="inner")
        cur_max = store.chunks().agg(F.max("doc_ord").alias("m")).collect()[0]["m"] or 0
        # base offset at the next stride boundary above everything existing
        base = ((cur_max // PARTITION_ORD_STRIDE) + 1) * PARTITION_ORD_STRIDE

        n_part = max(1, spark.sparkContext.defaultParallelism // 2)
        parted = pages_to_index.repartitionByRange(n_part, "url")
        chunks = chunk_pages(parted, config).sortWithinPartitions("url", "chunk_index")
        tokenized = sparse_ordinals(with_tokens(chunks)).withColumn(
            "doc_ord", F.col("doc_ord") + F.lit(base)
        )
        # append to the chunks table (doc_ord ranges are disjoint from old)
        tokenized.select([f.name for f in store.chunks().schema.fields]).write.mode(
            "append"
        ).parquet(store.path("chunks"))

        # append posting runs (corpus stats refresh at the end of apply)
        tf = term_frequencies(
            tokenized.select("doc_ord", "dl", "tokens")
        )
        blocks = encode_postings(tf, config)
        store.write_postings(blocks, mode="append")
        n_appended = int(
            tokenized.agg(F.count("*").alias("n")).collect()[0]["n"]
        )

        if with_embeddings:
            dim = config.embedding_dim

            @pandas_udf(T.BinaryType())
            def embed_udf(texts: pd.Series) -> pd.Series:
                return embed_series_packed(texts, dim=dim)

            emb = tokenized.select(
                "doc_ord",
                "chunk_id",
                F.lit(f"hash-{dim}").alias("model"),
                F.lit(dim).alias("dim"),
                embed_udf("content").alias("vec"),
            )
            emb.write.mode("append").parquet(store.path("embeddings"))

    # --- refresh catalog + stats ---
    if full_snapshot:
        next_catalog = snap
    else:
        untouched = catalog.join(snap.select("url"), on="url", how="left_anti").select(
            "url", "warc_ts", "size_bytes", "sha256"
        )
        next_catalog = untouched.unionByName(snap)
    store.write_small(
        next_catalog.join(
            store.chunks().groupBy("url").agg(F.count("*").cast("int").alias("n_chunks")),
            on="url",
            how="left",
        ).withColumn("n_chunks", F.coalesce("n_chunks", F.lit(0))),
        "catalog_next",
    )
    _swap_dir(store, "catalog_next", "catalog")
    _refresh_stats_and_term_stats(store)
    d.unpersist()

    return {
        "counts": counts,
        "tombstoned": n_tombstoned,
        "appended_chunks": n_appended,
    }


def _append_tombstones(store: IndexStore, doc_ords: DataFrame) -> int:
    rows = doc_ords.select("doc_ord").distinct()
    n = rows.count()
    if n:
        rows.coalesce(1).write.mode("append").parquet(store.path("tombstones"))
    return int(n)


def _live_chunks(store: IndexStore) -> DataFrame:
    t = store.tombstones()
    return store.chunks().join(t, on="doc_ord", how="left_anti")


def _live_stats(store: IndexStore) -> dict:
    agg = _live_chunks(store).agg(
        F.count("*").alias("n"), F.sum("dl").alias("sdl")
    ).collect()[0]
    n, sdl = int(agg["n"]), int(agg["sdl"] or 0)
    return {"n_docs": n, "total_tokens": sdl, "avgdl": (sdl / n) if n else 0.0}


def _refresh_stats_and_term_stats(store: IndexStore) -> None:
    stats = _live_stats(store)
    store.write_corpus_stats(stats["n_docs"], stats["total_tokens"], stats["avgdl"])
    live = _live_chunks(store).select("doc_ord", "tokens")
    tf = (
        live.select("doc_ord", F.explode(F.split("tokens", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term", "doc_ord")
        .agg(F.count("*").alias("tf"))
    )
    ts = tf.groupBy("term").agg(F.count("*").alias("df_docs"), F.sum("tf").alias("cf"))
    # write-aside then swap (readers never see a half-written table)
    store.write_term_stats(ts, name="term_stats_next")
    _swap_dir(store, "term_stats_next", "term_stats")


def _swap_dir(store: IndexStore, src: str, dst: str) -> None:
    """Directory-level atomic-ish swap (the parquet seam's stand-in for an
    Iceberg snapshot commit)."""
    import shutil
    from pathlib import Path

    src_p, dst_p = Path(store.path(src)), Path(store.path(dst))
    tmp = dst_p.with_suffix(".old")
    if dst_p.exists():
        dst_p.rename(tmp)
    src_p.rename(dst_p)
    shutil.rmtree(tmp, ignore_errors=True)


def compact(spark: SparkSession, store: IndexStore, config: EngineConfig | None = None) -> dict:
    """Rewrite posting blocks to purge tombstoned docs, then clear the
    tombstone set. Only blocks whose doc range intersects a tombstone
    need decoding; at web scale the rewrite is per-term-bucket and this
    runs as a periodic maintenance job (the FTS5 'merge' analog)."""
    config = config or EngineConfig()
    tombs = store.tombstones()
    n_tombs = tombs.count()
    if n_tombs == 0:
        return {"rewritten": 0, "purged": 0}

    # rebuild postings from live chunks (bucket-parallel, same encode path)
    live = _live_chunks(store).select("doc_ord", "dl", "tokens")
    tf = term_frequencies(live)
    blocks = encode_postings(tf, config)
    blocks.withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(store.n_term_buckets))
    ).repartition(store.n_term_buckets, "term_bucket").sortWithinPartitions(
        "term", "salt", "block_seq"
    ).write.mode("overwrite").partitionBy("term_bucket").parquet(
        store.path("postings_next")
    )
    _swap_dir(store, "postings_next", "postings")

    # live chunks/embeddings tables (anti-join copy), then clear tombstones
    live_chunks = _live_chunks(store)
    live_chunks.write.mode("overwrite").parquet(store.path("chunks_next"))
    _swap_dir(store, "chunks_next", "chunks")
    if store.exists("embeddings"):
        emb = store.embeddings().join(tombs, on="doc_ord", how="left_anti")
        emb.write.mode("overwrite").parquet(store.path("embeddings_next"))
        _swap_dir(store, "embeddings_next", "embeddings")

    import shutil
    from pathlib import Path

    shutil.rmtree(Path(store.path("tombstones")), ignore_errors=True)
    _refresh_stats_and_term_stats(store)
    return {"rewritten": 1, "purged": int(n_tombs)}
