"""Structured-Streaming freshness surface.

The reference's freshness machinery is a file watcher + background thread
queue (reference src/rifflux/indexing/watcher.py:35-243,
background.py:75-218) — operational glue, not dataflow (SURVEY.md §2.E).
The Spark-native analog is a Structured Streaming file source with
``Trigger.AvailableNow``: each activation drains newly-arrived page files
and hands every micro-batch to the SAME batch incremental plan
(plans/incremental.apply_incremental with ``full_snapshot=False`` —
micro-batches are upserts, deletions come from full-snapshot runs) via
``foreachBatch``. The streaming checkpoint gives exactly-once file pickup
(the debounce/coalescing role of the watcher); deterministic chunk ids
make replays idempotent anyway.

Watermarks/event-time operators are intentionally absent HERE: the
reference has no event-time semantics to reproduce (SURVEY.md §2.E).
Custom stateful streaming lives in streaming/dedup.py
(applyInPandasWithState re-crawl suppression, beyond-reference §2.H).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from rifflux_spark.config import EngineConfig
from rifflux_spark.plans.incremental import apply_incremental
from rifflux_spark.sources.tables import IndexStore

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def run_available_now(
    spark: SparkSession,
    pages_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    config: EngineConfig | None = None,
    with_embeddings: bool = True,
    max_files_per_trigger: int = 64,
) -> list[dict]:
    """Drain all unprocessed page files into the index; returns one
    metrics dict per micro-batch. Re-invoking picks up only files added
    since the last run (streaming checkpoint), mirroring the reference's
    watcher→reindex loop as declarative streaming."""
    config = config or EngineConfig()
    store = IndexStore(spark, index_dir, config.n_term_buckets)
    results: list[dict] = []

    stream = (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )

    def handle(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        metrics = apply_incremental(
            spark,
            store,
            batch_df,
            config,
            with_embeddings=with_embeddings,
            full_snapshot=False,
        )
        metrics["batch_id"] = batch_id
        results.append(metrics)

    query = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return results


def run_continuous(
    spark: SparkSession,
    pages_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    config: EngineConfig | None = None,
    with_embeddings: bool = True,
    processing_interval: str = "1 second",
    max_files_per_trigger: int = 64,
    stop_after_batches: int | None = None,
    timeout_s: float = 120.0,
):
    """The ALWAYS-ON watcher analog (reference watcher.py:35-243 live
    loop): a ``processingTime`` trigger keeps polling ``pages_dir`` and
    every non-empty micro-batch runs the same O(delta) incremental plan
    — the drain-once semantics of :func:`run_available_now`, unattended.

    ``stop_after_batches=N`` bounds the run (tests, maintenance
    windows): the query stops after N applied batches or ``timeout_s``
    and the per-batch metrics are returned. With ``None`` the live
    StreamingQuery is returned immediately and the caller owns its
    lifecycle (``session.graceful_shutdown`` stops it on driver exit,
    S5)."""
    import time

    config = config or EngineConfig()
    store = IndexStore(spark, index_dir, config.n_term_buckets)
    results: list[dict] = []

    stream = (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )

    def handle(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        metrics = apply_incremental(
            spark,
            store,
            batch_df,
            config,
            with_embeddings=with_embeddings,
            full_snapshot=False,
        )
        metrics["batch_id"] = batch_id
        results.append(metrics)

    query = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=processing_interval)
        .start()
    )
    if stop_after_batches is None:
        return query
    try:
        t0 = time.monotonic()
        while len(results) < stop_after_batches and time.monotonic() - t0 < timeout_s:
            time.sleep(0.2)
    finally:
        query.stop()
        query.awaitTermination(30)
    return results
