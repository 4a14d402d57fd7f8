"""Operational glue: auto-reindex throttle (S3) and graceful shutdown (S5).

Reference semantics: mcp/tools.py:287-326 (atomic check-and-claim with
min_interval throttling) and mcp/tools.py:258-284 (atexit teardown:
stop watcher first, then workers)."""

from __future__ import annotations

import dataclasses
import tempfile

from rifflux_spark.config import EngineConfig
from rifflux_spark.plans.build import build_index
from rifflux_spark.service import SearchService
from rifflux_spark.session import graceful_shutdown
from rifflux_spark.sources.pages import synthetic_pages

CFG = EngineConfig(
    block_size=32,
    salt_range=256,
    n_term_buckets=8,
    n_build_shards=2,
    embedding_dim=32,
)


def _built_index(spark, tmp_index_dir, n=60):
    pages = synthetic_pages(spark, n, seed=11)
    build_index(spark, pages, tmp_index_dir, CFG)
    return tmp_index_dir


def test_auto_reindex_claims_then_throttles(spark, tmp_index_dir) -> None:
    idx = _built_index(spark, tmp_index_dir)
    pages_dir = tempfile.mkdtemp(prefix="rifflux_pages_")
    # next crawl: 10 extra pages
    synthetic_pages(spark, 70, seed=11).write.mode("overwrite").parquet(pages_dir)

    cfg = dataclasses.replace(
        CFG, auto_reindex_on_search=True, auto_reindex_min_interval_seconds=3600.0
    )
    svc = SearchService(spark, idx, cfg, pages_path=pages_dir)
    SearchService._last_auto_reindex.pop(idx, None)

    first = svc.maybe_auto_reindex(background=False)
    assert first["executed"] is True
    assert first["metrics"]["counts"].get("new", 0) == 10

    # inside min_interval: the claim is already taken
    second = svc.maybe_auto_reindex(background=False)
    assert second == {
        "enabled": True,
        "executed": False,
        "reason": "throttled",
        "min_interval_seconds": 3600.0,
    }

    # the reindexed corpus is searchable (70 files in the catalog now)
    assert svc.index_status()["files"] == 70

    # interval elapsed → a new claim succeeds (simulate by clearing)
    SearchService._last_auto_reindex.pop(idx, None)
    third = svc.maybe_auto_reindex(background=False)
    assert third["executed"] is True
    assert third["metrics"]["counts"].get("unchanged", 0) == 70


def test_auto_reindex_disabled_without_pages_path(spark, tmp_index_dir) -> None:
    idx = _built_index(spark, tmp_index_dir)
    svc = SearchService(spark, idx, CFG)  # no pages_path
    out = svc.maybe_auto_reindex()
    assert out["enabled"] is False
    # search() must not attempt a reindex either
    assert isinstance(svc.search("cache", top_k=2, mode="lexical"), list)


def test_graceful_shutdown_stops_streams_then_session() -> None:
    calls: list[str] = []

    class FakeQuery:
        def stop(self):
            calls.append("query.stop")

        def awaitTermination(self, timeout):
            calls.append("query.await")

    class FakeStreams:
        active = [FakeQuery(), FakeQuery()]

    class FakeSession:
        streams = FakeStreams()

        def stop(self):
            calls.append("session.stop")

    graceful_shutdown(FakeSession())
    assert calls == [
        "query.stop", "query.await", "query.stop", "query.await", "session.stop",
    ]
    # idempotent on a dead session (streams access raises)
    class DeadSession:
        @property
        def streams(self):
            raise RuntimeError("JVM gone")

        def stop(self):
            raise RuntimeError("already stopped")

    graceful_shutdown(DeadSession())  # must not raise
