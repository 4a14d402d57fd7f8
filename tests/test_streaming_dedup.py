"""Stateful streaming dedup (streaming/dedup.py): cross-micro-batch and
cross-activation re-crawl suppression via applyInPandasWithState."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from rifflux_spark.streaming.dedup import run_changed_pages

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


@pytest.fixture()
def dirs():
    pages = tempfile.mkdtemp(prefix="rifflux_sd_pages_")
    ckpt = tempfile.mkdtemp(prefix="rifflux_sd_ckpt_")
    yield pages, ckpt
    shutil.rmtree(pages, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)


def _write(spark, pages_dir: str, rows: list[tuple[str, str]]) -> None:
    import datetime

    ts = datetime.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [(u, ts, b"", t, "en") for u, t in rows], PAGES_DDL
    )
    df.coalesce(1).write.mode("append").parquet(pages_dir)


def test_changed_pages_suppresses_unchanged_recrawls(spark, dirs) -> None:
    pages, ckpt = dirs
    # activation 1: two urls, url a fetched twice with identical content
    _write(spark, pages, [("a", "v1"), ("b", "x"), ("a", "v1")])
    got1 = run_changed_pages(spark, pages, ckpt)
    emitted1 = {(r["url"], r["text"], r["n_seen"]) for r in got1}
    assert emitted1 == {("a", "v1", 1), ("b", "x", 1)}

    # activation 2 (same checkpoint → state survives): a unchanged,
    # b changed, c new
    _write(spark, pages, [("a", "v1"), ("b", "y"), ("c", "z")])
    got2 = run_changed_pages(spark, pages, ckpt)
    emitted2 = {(r["url"], r["text"], r["n_seen"]) for r in got2}
    assert emitted2 == {("b", "y", 2), ("c", "z", 1)}


def test_changed_pages_reverting_content_reemits(spark, dirs) -> None:
    """State stores only the LAST hash: a page that flips back to an old
    version is a change relative to the previous fetch and must re-emit."""
    pages, ckpt = dirs
    _write(spark, pages, [("a", "v1")])
    run_changed_pages(spark, pages, ckpt)
    _write(spark, pages, [("a", "v2")])
    run_changed_pages(spark, pages, ckpt)
    _write(spark, pages, [("a", "v1")])
    got = run_changed_pages(spark, pages, ckpt)
    assert [(r["url"], r["text"], r["n_seen"]) for r in got] == [("a", "v1", 3)]


def test_store_sink_two_activations_exactly_once(spark, dirs) -> None:
    """Production sink (run_changed_pages_to_store): two activations
    drain into the manifest store with NO driver materialization;
    exactly-once rows across activations, and a replayed batch id is
    skipped (idempotent append)."""
    from rifflux_spark.sources.tables import IndexStore
    from rifflux_spark.streaming.dedup import (
        _committed_batches,
        run_changed_pages_to_store,
    )

    pages, ckpt = dirs
    store_dir = tempfile.mkdtemp(prefix="rifflux_sd_store_")
    try:
        _write(spark, pages, [("a", "v1"), ("b", "x"), ("a", "v1")])
        r1 = run_changed_pages_to_store(spark, pages, ckpt, store_dir)
        assert r1["rows"] == 2  # a(v1), b(x) — duplicate a suppressed

        _write(spark, pages, [("a", "v1"), ("b", "y"), ("c", "z")])
        r2 = run_changed_pages_to_store(spark, pages, ckpt, store_dir)
        assert r2["rows"] == 4  # + b(y), c(z); unchanged a suppressed

        store = IndexStore(spark, store_dir)
        rows = {
            (r["url"], r["text"], r["n_seen"])
            for r in spark.read.parquet(
                *[str(f) for f in store.data_files("changed_pages")]
            ).collect()
        }
        assert rows == {
            ("a", "v1", 1), ("b", "x", 1), ("b", "y", 2), ("c", "z", 1)
        }

        # replay idempotence: re-committing an already-committed batch id
        # must be a no-op (foreachBatch re-runs the last batch on crash)
        from rifflux_spark.streaming.dedup import commit_changed_batch

        committed = _committed_batches(store)
        assert committed
        replay = spark.createDataFrame(
            [("a", "v1", "deadbeef", 1)],
            "url string, text string, content_sha string, n_seen long",
        )
        assert commit_changed_batch(store, replay, max(committed)) is False
        assert store.count_rows("changed_pages") == 4
        # a genuinely new batch id still commits
        assert commit_changed_batch(store, replay, max(committed) + 100) is True
        assert store.count_rows("changed_pages") == 5
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)
