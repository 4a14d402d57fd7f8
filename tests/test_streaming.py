"""Structured-Streaming freshness: AvailableNow drain → incremental
upserts, checkpointed file pickup across activations."""

from __future__ import annotations

from pyspark.sql import functions as F

from rifflux_spark.config import EngineConfig
from rifflux_spark.plans.build import build_index
from rifflux_spark.service import SearchService
from rifflux_spark.sources.pages import synthetic_pages
from rifflux_spark.streaming.incremental import run_available_now

CONFIG = EngineConfig(
    block_size=16, salt_range=64, n_term_buckets=8, n_build_shards=1, embedding_dim=32
)


def test_available_now_upserts_and_checkpoints(spark, tmp_path_factory) -> None:
    base = tmp_path_factory.mktemp("stream")
    pages_dir = str(base / "pages")
    ckpt = str(base / "ckpt")
    index_dir = str(base / "idx")

    # initial index from 30 pages
    initial = synthetic_pages(spark, 30, seed=11)
    build_index(spark, initial, index_dir, CONFIG)
    svc = SearchService(spark, index_dir, CONFIG)
    n0 = svc.index_status()["chunks"]

    # drop a first batch of new pages into the stream dir
    batch1 = synthetic_pages(spark, 8, seed=77).withColumn(
        "url", F.concat(F.lit("https://stream1.example.com/"), F.col("url"))
    )
    batch1.coalesce(1).write.mode("append").parquet(pages_dir)

    res1 = run_available_now(spark, pages_dir, index_dir, ckpt, CONFIG)
    assert sum(r["counts"].get("new", 0) for r in res1) == 8
    n1 = SearchService(spark, index_dir, CONFIG).index_status()["chunks"]
    assert n1 > n0

    # second activation with no new files: nothing processed (checkpoint)
    res2 = run_available_now(spark, pages_dir, index_dir, ckpt, CONFIG)
    assert sum(r["counts"].get("new", 0) for r in res2) == 0

    # third: more files arrive; only they are processed
    batch2 = synthetic_pages(spark, 5, seed=88).withColumn(
        "url", F.concat(F.lit("https://stream2.example.com/"), F.col("url"))
    )
    batch2.coalesce(1).write.mode("append").parquet(pages_dir)
    res3 = run_available_now(spark, pages_dir, index_dir, ckpt, CONFIG)
    assert sum(r["counts"].get("new", 0) for r in res3) == 5

    # streamed docs are searchable
    svc = SearchService(spark, index_dir, CONFIG)
    assert svc.index_status()["chunks"] > n1
    assert svc.lexical("the data", top_k=5)


def test_continuous_trigger_applies_batches_unattended(spark, tmp_path_factory) -> None:
    """processingTime-trigger watcher analog (S2 beyond drain-once): files
    dropped WHILE the query runs are picked up and applied without any
    re-invocation; stop-after-N bounds the run."""
    from rifflux_spark.streaming.incremental import run_continuous

    base = tmp_path_factory.mktemp("cont")
    pages_dir = str(base / "pages")
    ckpt = str(base / "ckpt")
    index_dir = str(base / "idx")

    build_index(spark, synthetic_pages(spark, 20, seed=31), index_dir, CONFIG)
    n0 = SearchService(spark, index_dir, CONFIG).index_status()["chunks"]

    # first batch exists before the stream starts; second lands mid-run
    synthetic_pages(spark, 6, seed=91).withColumn(
        "url", F.concat(F.lit("https://cont1.example.com/"), F.col("url"))
    ).coalesce(1).write.mode("append").parquet(pages_dir)

    import threading
    import time

    def late_writer() -> None:
        time.sleep(3.0)
        synthetic_pages(spark, 4, seed=92).withColumn(
            "url", F.concat(F.lit("https://cont2.example.com/"), F.col("url"))
        ).coalesce(1).write.mode("append").parquet(pages_dir)

    t = threading.Thread(target=late_writer, daemon=True)
    t.start()
    res = run_continuous(
        spark, pages_dir, index_dir, ckpt, CONFIG,
        processing_interval="1 second", stop_after_batches=2, timeout_s=90.0,
    )
    t.join()
    assert sum(r["counts"].get("new", 0) for r in res) == 10
    assert len(res) == 2
    svc = SearchService(spark, index_dir, CONFIG)
    assert svc.index_status()["chunks"] > n0
    assert not spark.streams.active  # stopped cleanly
