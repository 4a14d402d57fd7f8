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


def watch_iceberg(
    spark: SparkSession,
    table_location: str,
    index_dir: str,
    config: EngineConfig | None = None,
    with_embeddings: bool = True,
    poll_interval_s: float = 1.0,
    stop_after_applies: int | None = None,
    timeout_s: float = 120.0,
    stop_event=None,
):
    """The reference's file watcher pointed at the north rule's INPUT
    TABLE: poll the Iceberg table's current snapshot id — a
    version-hint file read, no Spark job — and when it moves, run
    :func:`rifflux_spark.plans.incremental.apply_from_iceberg`, which
    reads only the appended files (metadata-planned incremental append
    scan) and applies them through the O(delta) index update. The
    debounce role of the reference watcher falls out of the snapshot
    granularity: however many files land, one commit is one apply.

    ``stop_after_applies=N`` runs inline until N applies (or
    ``timeout_s``) and returns their metrics — the test/maintenance
    shape. With ``None`` a daemon thread is started and
    ``(thread, stop_event)`` is returned; the caller owns the
    lifecycle (set the event to stop; ``session.graceful_shutdown``
    stops Structured Streaming queries, not this poller)."""
    import logging
    import threading
    import time

    from rifflux_spark.plans.incremental import apply_from_iceberg
    from rifflux_spark.sources.iceberg import current_snapshot_id

    # config=None must auto-detect the index's persisted layout (pass
    # None buckets), not impose EngineConfig's default bucket count on
    # an index built with a different one
    store = IndexStore(
        spark, index_dir, config.n_term_buckets if config is not None else None
    )
    config = config or EngineConfig()
    results: list[dict] = []
    stop_event = stop_event or threading.Event()
    last_seen: int | None = None

    def tick() -> bool:
        nonlocal last_seen
        cur = current_snapshot_id(table_location)
        if cur is None or cur == last_seen:
            return False
        out = apply_from_iceberg(
            spark, store, table_location, config, with_embeddings=with_embeddings
        )
        last_seen = cur
        if out.get("applied"):
            results.append(out)
            return True
        return False

    if stop_after_applies is not None:
        t0 = time.monotonic()
        while (
            len(results) < stop_after_applies
            and time.monotonic() - t0 < timeout_s
            and not stop_event.is_set()
        ):
            tick()
            if len(results) >= stop_after_applies:
                break
            stop_event.wait(poll_interval_s)
        return results

    def loop() -> None:
        while not stop_event.is_set():
            try:
                tick()
            except Exception:
                logging.getLogger(__name__).exception("iceberg watcher tick failed")
            stop_event.wait(poll_interval_s)

    thread = threading.Thread(target=loop, name="rifflux-iceberg-watch", daemon=True)
    thread.start()
    return thread, stop_event
