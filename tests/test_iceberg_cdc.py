"""Iceberg incremental append scan + CDC index-freshness loop.

The reference keeps the index fresh with a filesystem watcher feeding
its O(changed-files) reindex loop (reference indexing/watcher.py:35-243
→ indexer.py:59-131). The rebuild's north-rule analog watches the INPUT
TABLE instead: `iceberg_appends` derives the appended-files delta
between two snapshots purely from Iceberg metadata (the incremental
append scan Iceberg's own readers expose), and `apply_from_iceberg`
feeds exactly those rows to the O(delta) incremental index update,
advancing a snapshot cursor in the store's KV metadata.

Scale property under test: the delta derivation opens only the
manifests whose manifest-list entry says the in-range snapshot added
files — a 10-file append to a 10M-file table reads one manifest, so the
freshness loop stays O(delta) end to end.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from rifflux_spark.config import EngineConfig
from rifflux_spark.plans.incremental import apply_from_iceberg, record_iceberg_cursor
from rifflux_spark.sources.iceberg import (
    IcebergTableWriter,
    _data_file,
    iceberg_appends,
    iceberg_schema_from_parquet,
    read_iceberg,
    read_iceberg_appends,
)

from tests.test_iceberg_writer import _tiny_parquet, _writer


# ------------------------------------------------- metadata-only delta


def test_appends_between_snapshots(tmp_path):
    w = _writer(tmp_path)
    f1 = _tiny_parquet(tmp_path / "f1.parquet", 10, start=0)
    f2 = _tiny_parquet(tmp_path / "f2.parquet", 10, start=100)
    f3 = _tiny_parquet(tmp_path / "f3.parquet", 10, start=200)
    s1 = w.commit(added=[_data_file(f1, schema_fields=w.schema_fields)])
    s2 = w.commit(added=[_data_file(f2, schema_fields=w.schema_fields)])
    s3 = w.commit(added=[_data_file(f3, schema_fields=w.schema_fields)])

    # strictly-after semantics: (s1, s3] = f2 + f3; (s2, s3] = f3 only
    assert set(iceberg_appends(w.location, s1["snapshot-id"])) == {f2, f3}
    assert set(iceberg_appends(w.location, s2["snapshot-id"])) == {f3}
    assert set(iceberg_appends(w.location, s3["snapshot-id"])) == set()
    # from=None walks to the root: the full appended history
    assert set(iceberg_appends(w.location)) == {f1, f2, f3}
    # bounded end snapshot
    assert set(
        iceberg_appends(w.location, s1["snapshot-id"], s2["snapshot-id"])
    ) == {f2}


def test_appends_rejects_non_append_in_range(tmp_path):
    w = _writer(tmp_path)
    f1 = _tiny_parquet(tmp_path / "f1.parquet", 10, start=0)
    f2 = _tiny_parquet(tmp_path / "f2.parquet", 10, start=100)
    s1 = w.commit(added=[_data_file(f1, schema_fields=w.schema_fields)])
    w.commit(
        added=[_data_file(f2, schema_fields=w.schema_fields)],
        deleted_paths={f1},
        operation="overwrite",
    )
    with pytest.raises(ValueError, match="overwrite"):
        iceberg_appends(w.location, s1["snapshot-id"])
    # a range that stops BEFORE the overwrite stays readable
    assert set(iceberg_appends(w.location, None, s1["snapshot-id"])) == {f1}


def test_appends_unrelated_from_snapshot_raises(tmp_path):
    w = _writer(tmp_path)
    f1 = _tiny_parquet(tmp_path / "f1.parquet", 10, start=0)
    w.commit(added=[_data_file(f1, schema_fields=w.schema_fields)])
    with pytest.raises(KeyError):
        iceberg_appends(w.location, from_snapshot_id=999999999)


def test_appends_opens_only_delta_manifests(tmp_path, monkeypatch):
    """O(delta) evidence: deriving the (s2, s3] delta on a 3-snapshot
    table must open s3's manifest list + exactly ONE manifest (the one
    s3 added) — never the carried manifests of earlier snapshots."""
    import rifflux_spark.sources.iceberg as ice

    w = _writer(tmp_path)
    paths = [
        _tiny_parquet(tmp_path / f"f{i}.parquet", 5, start=i * 100) for i in range(3)
    ]
    snaps = [w.commit(added=[_data_file(p, schema_fields=w.schema_fields)]) for p in paths]

    opened: list[str] = []
    real = ice.read_ocf

    def counting(path, *a, **kw):
        opened.append(str(path))
        return real(path, *a, **kw)

    monkeypatch.setattr(ice, "read_ocf", counting)
    got = iceberg_appends(w.location, snaps[1]["snapshot-id"])
    assert set(got) == {paths[2]}
    manifest_lists = [p for p in opened if "snap-" in Path(p).name or "ml-" in Path(p).name]
    manifests = [p for p in opened if p not in manifest_lists]
    assert len(manifests) == 1, f"expected 1 manifest opened, got {opened}"


def test_read_appends_restores_partition_columns(spark, tmp_path):
    fields = [{"id": 1, "name": "doc_ord", "required": False, "type": "long"}]
    w = IcebergTableWriter(
        str(tmp_path / "t"),
        schema_fields=fields + [{"id": 2, "name": "bucket", "required": False, "type": "int"}],
        partition_fields=[
            {"name": "bucket", "transform": "identity", "transform-type": "int",
             "source-id": 2, "field-id": 1000}
        ],
        clock=lambda: 1_755_000_000.0,
    )
    f1 = _tiny_parquet(tmp_path / "f1.parquet", 4, start=0)
    f2 = _tiny_parquet(tmp_path / "f2.parquet", 4, start=100)
    s1 = w.commit(added=[_data_file(f1, {"bucket": 1}, fields)])
    w.commit(added=[_data_file(f2, {"bucket": 2}, fields)])
    delta = read_iceberg_appends(spark, w.location, s1["snapshot-id"])
    rows = {(r["doc_ord"], r["bucket"]) for r in delta.collect()}
    assert rows == {(i, 2) for i in range(100, 104)}


def test_partition_restore_is_one_scan_plus_broadcast(spark, tmp_path):
    """Scale shape of the metadata-planned read: restoring stripped
    partition columns must NOT union one scan relation per partition —
    the plan is ONE parquet scan over all surviving files plus a
    broadcast input_file_name() join against the manifest's partition
    values, so a 10k-partition table plans the same as a 4-partition
    one."""
    fields = [{"id": 1, "name": "doc_ord", "required": False, "type": "long"}]
    w = IcebergTableWriter(
        str(tmp_path / "t"),
        schema_fields=fields + [{"id": 2, "name": "bucket", "required": False, "type": "int"}],
        partition_fields=[
            {"name": "bucket", "transform": "identity", "transform-type": "int",
             "source-id": 2, "field-id": 1000}
        ],
        clock=lambda: 1_755_000_000.0,
    )
    for b in range(4):
        f = _tiny_parquet(tmp_path / f"f{b}.parquet", 3, start=b * 10)
        w.commit(added=[_data_file(f, {"bucket": b}, fields)])

    df = read_iceberg(spark, w.location)
    rows = {(r["doc_ord"], r["bucket"]) for r in df.collect()}
    assert rows == {(b * 10 + i, b) for b in range(4) for i in range(3)}

    from tests.test_physical_plans import explain_str

    # AQE echoes the initial plan after the final one — pin the final
    plan = explain_str(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Union" not in plan, plan


# --------------------------------------------------- CDC freshness loop


def _pages_table(spark, base: Path, n: int, seed: int = 7) -> tuple:
    from rifflux_spark.sources.pages import synthetic_pages

    data_dir = base / "pages_data"
    synthetic_pages(spark, n, seed=seed).coalesce(1).write.parquet(str(data_dir))
    pfiles = sorted(str(p) for p in data_dir.glob("*.parquet"))
    w = IcebergTableWriter(
        str(base / "pages_iceberg"),
        schema_fields=iceberg_schema_from_parquet(pfiles[0]),
        clock=lambda: 1_755_000_000.0,
    )
    w.commit(added=[_data_file(p, schema_fields=w.schema_fields) for p in pfiles])
    return w, data_dir


def test_apply_from_iceberg_keeps_index_fresh(spark, tmp_path_factory):
    """Build from snapshot 1, append new pages as snapshot 2, sync:
    only the delta is applied, new docs become searchable, and the
    cursor makes the next sync a no-op."""
    from rifflux_spark.plans.build import build_index
    from rifflux_spark.service import SearchService
    from rifflux_spark.sources.pages import synthetic_pages
    from rifflux_spark.sources.tables import IndexStore

    base = tmp_path_factory.mktemp("cdc")
    w, data_dir = _pages_table(spark, base, 60)
    cfg = EngineConfig(
        block_size=32, salt_range=256, n_term_buckets=2, n_build_shards=1,
        embedding_dim=16,
    )
    idx = str(tmp_path_factory.mktemp("cdcidx"))
    build_index(spark, read_iceberg(spark, w.location), idx, cfg)
    store = IndexStore(spark, idx)
    cursor = record_iceberg_cursor(store, w.location)
    assert cursor == w.current_snapshot()["snapshot-id"]

    # cursor at current → no-op, no Spark job
    out = apply_from_iceberg(spark, store, w.location, cfg)
    assert out == {"applied": False, "reason": "cursor at current snapshot"}

    # append 20 NEW pages: synthetic_pages derives every page from its
    # index, so pages 60..79 of an 80-page corpus are genuinely new urls
    new_dir = base / "delta_data"
    synthetic_pages(spark, 80, seed=7).filter(
        "CAST(substring(url, -8, 8) AS INT) >= 60"
    ).coalesce(1).write.parquet(str(new_dir))
    dfiles = sorted(str(p) for p in new_dir.glob("*.parquet"))
    w.commit(added=[_data_file(p, schema_fields=w.schema_fields) for p in dfiles])

    out = apply_from_iceberg(spark, store, w.location, cfg)
    assert out["applied"] is True
    assert out["counts"].get("new") == 20
    assert not out["counts"].get("changed") and not out["counts"].get("deleted")

    store2 = IndexStore(spark, idx)
    svc = SearchService(spark, idx, cfg)
    assert svc.index_status()["files"] == 80

    # the synced index answers queries over the union corpus
    hits = svc.search("cache ttl", top_k=5, mode="lexical")
    assert hits

    # idempotent: cursor advanced, second sync applies nothing
    out2 = apply_from_iceberg(spark, store2, w.location, cfg)
    assert out2 == {"applied": False, "reason": "cursor at current snapshot"}


def test_watch_iceberg_applies_on_snapshot_move(spark, tmp_path_factory):
    """The watcher analog over the input table: an unbounded poller
    thread picks up an Iceberg append within its poll interval and the
    index answers queries over the grown corpus; a bounded run with no
    table movement returns empty."""
    import threading
    import time

    from rifflux_spark.plans.build import build_index
    from rifflux_spark.service import SearchService
    from rifflux_spark.sources.pages import synthetic_pages
    from rifflux_spark.sources.tables import IndexStore
    from rifflux_spark.streaming.incremental import watch_iceberg

    base = tmp_path_factory.mktemp("watch")
    w, _ = _pages_table(spark, base, 30, seed=3)
    cfg = EngineConfig(
        block_size=32, salt_range=256, n_term_buckets=2, n_build_shards=1,
        embedding_dim=16,
    )
    idx = str(tmp_path_factory.mktemp("watchidx"))
    build_index(spark, read_iceberg(spark, w.location), idx, cfg)
    record_iceberg_cursor(IndexStore(spark, idx), w.location)

    # bounded run, nothing new: returns [] after the timeout
    assert (
        watch_iceberg(
            spark, w.location, idx, cfg,
            poll_interval_s=0.05, stop_after_applies=1, timeout_s=0.5,
        )
        == []
    )

    thread, stop = watch_iceberg(spark, w.location, idx, cfg, poll_interval_s=0.2)
    try:
        new_dir = base / "delta"
        synthetic_pages(spark, 40, seed=3).filter(
            "CAST(substring(url, -8, 8) AS INT) >= 30"
        ).coalesce(1).write.parquet(str(new_dir))
        dfiles = sorted(str(p) for p in new_dir.glob("*.parquet"))
        w.commit(added=[_data_file(p, schema_fields=w.schema_fields) for p in dfiles])

        svc = SearchService(spark, idx, cfg)
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            if svc.index_status()["files"] == 40:
                break
            time.sleep(0.25)
        assert svc.index_status()["files"] == 40
    finally:
        stop.set()
        thread.join(timeout=10)
    assert not thread.is_alive()


def test_auto_reindex_uses_cdc_for_iceberg_pages_path(spark, tmp_path_factory):
    """SearchService(pages_path=<iceberg table>) auto-reindex runs the
    CDC apply: after an append, an inline maybe_auto_reindex reports the
    applied snapshot range and the new pages become searchable."""
    from rifflux_spark.plans.build import build_index
    from rifflux_spark.service import SearchService
    from rifflux_spark.sources.pages import synthetic_pages
    from rifflux_spark.sources.tables import IndexStore

    base = tmp_path_factory.mktemp("autocdc")
    w, _ = _pages_table(spark, base, 25, seed=9)
    cfg = EngineConfig(
        block_size=32, salt_range=256, n_term_buckets=2, n_build_shards=1,
        embedding_dim=16, auto_reindex_min_interval_seconds=0.0,
    )
    idx = str(tmp_path_factory.mktemp("autocdcidx"))
    build_index(spark, read_iceberg(spark, w.location), idx, cfg)
    record_iceberg_cursor(IndexStore(spark, idx), w.location)

    new_dir = base / "delta"
    synthetic_pages(spark, 35, seed=9).filter(
        "CAST(substring(url, -8, 8) AS INT) >= 25"
    ).coalesce(1).write.parquet(str(new_dir))
    dfiles = sorted(str(p) for p in new_dir.glob("*.parquet"))
    snap = w.commit(added=[_data_file(p, schema_fields=w.schema_fields) for p in dfiles])

    svc = SearchService(spark, idx, cfg, pages_path=w.location)
    out = svc.maybe_auto_reindex(background=False)
    assert out["executed"] is True
    assert out["metrics"]["applied"] is True
    assert out["metrics"]["to_snapshot"] == snap["snapshot-id"]
    assert out["metrics"]["counts"].get("new") == 10
    assert svc.index_status()["files"] == 35


def test_apply_from_iceberg_overwrite_falls_back_to_full_rediff(spark, tmp_path_factory):
    """Routine table maintenance (an overwrite snapshot) has no
    derivable append delta: the sync must fall back ONCE to a
    full-snapshot re-diff — pruned urls become deletions — and re-pin
    the cursor past the rewrite, instead of raising on every poll
    forever."""
    from rifflux_spark.plans.build import build_index
    from rifflux_spark.service import SearchService
    from rifflux_spark.sources.pages import synthetic_pages
    from rifflux_spark.sources.tables import IndexStore

    base = tmp_path_factory.mktemp("cdcow")
    w, data_dir = _pages_table(spark, base, 30, seed=5)
    cfg = EngineConfig(
        block_size=32, salt_range=256, n_term_buckets=2, n_build_shards=1,
        embedding_dim=16,
    )
    idx = str(tmp_path_factory.mktemp("cdcowidx"))
    build_index(spark, read_iceberg(spark, w.location), idx, cfg)
    store = IndexStore(spark, idx)
    record_iceberg_cursor(store, w.location)

    # overwrite: the corpus shrinks to pages 0..19 (10 urls pruned)
    keep_dir = base / "keep"
    synthetic_pages(spark, 30, seed=5).filter(
        "CAST(substring(url, -8, 8) AS INT) < 20"
    ).coalesce(1).write.parquet(str(keep_dir))
    kfiles = sorted(str(p) for p in keep_dir.glob("*.parquet"))
    old_files = set(w.live_files())
    snap = w.commit(
        added=[_data_file(p, schema_fields=w.schema_fields) for p in kfiles],
        deleted_paths=old_files,
        operation="overwrite",
    )

    out = apply_from_iceberg(spark, store, w.location, cfg)
    assert out["applied"] is True
    assert "full-snapshot" in out.get("fallback", "")
    assert out["to_snapshot"] == snap["snapshot-id"]
    assert out["counts"].get("deleted") == 10
    assert out["counts"].get("unchanged") == 20
    assert SearchService(spark, idx, cfg).index_status()["files"] == 20

    # cursor re-pinned past the rewrite: next sync is a metadata no-op
    assert apply_from_iceberg(spark, store, w.location, cfg)["applied"] is False


def test_cursor_binding_normalizes_location_spelling(spark, tmp_path_factory):
    """A trailing slash or relative spelling of the SAME table must not
    trip the cursor-binding guard."""
    from rifflux_spark.plans.build import build_index
    from rifflux_spark.sources.tables import IndexStore

    base = tmp_path_factory.mktemp("cdcnorm")
    w, _ = _pages_table(spark, base, 10, seed=13)
    cfg = EngineConfig(
        block_size=32, salt_range=256, n_term_buckets=2, n_build_shards=1,
        embedding_dim=16,
    )
    idx = str(tmp_path_factory.mktemp("cdcnormidx"))
    build_index(spark, read_iceberg(spark, w.location), idx, cfg)
    store = IndexStore(spark, idx)
    record_iceberg_cursor(store, w.location)

    out = apply_from_iceberg(spark, store, w.location + "/", cfg)
    assert out == {"applied": False, "reason": "cursor at current snapshot"}


def test_cdc_loop_matches_rebuild_fuzz(spark, tmp_path_factory):
    """Randomized CDC maintenance vs ground truth: a table evolved
    through appends AND an overwrite (which exercises the full-re-diff
    fallback), synced step by step through apply_from_iceberg, must
    serve lexical results IDENTICAL to a from-scratch build over the
    final snapshot — the same equivalence invariant the plain
    incremental path pins, here across the whole CDC loop."""
    import random

    from rifflux_spark.plans.build import build_index
    from rifflux_spark.service import SearchService
    from rifflux_spark.sources.pages import synthetic_pages
    from rifflux_spark.sources.tables import IndexStore

    rng = random.Random(99)
    base = tmp_path_factory.mktemp("cdcfuzz")
    cfg = EngineConfig(
        block_size=16, salt_range=64, n_term_buckets=2, n_build_shards=1,
        embedding_dim=16,
    )

    def slice_parquet(lo: int, hi: int, name: str, keep=None) -> list[str]:
        d = base / name
        df = synthetic_pages(spark, 140, seed=17).filter(
            f"CAST(substring(url, -8, 8) AS INT) >= {lo} AND "
            f"CAST(substring(url, -8, 8) AS INT) < {hi}"
        )
        if keep is not None:
            df = df.filter(
                F.col("url").substr(-8, 8).cast("int").isin(list(keep))
            )
        df.coalesce(1).write.parquet(str(d))
        return sorted(str(p) for p in d.glob("*.parquet"))

    from pyspark.sql import functions as F

    w = IcebergTableWriter(
        str(base / "table"),
        schema_fields=iceberg_schema_from_parquet(
            slice_parquet(0, 40, "seed_slice")[0]
        ),
        clock=lambda: 1_755_000_000.0,
    )
    w.commit(
        added=[
            _data_file(p, schema_fields=w.schema_fields)
            for p in sorted(str(p) for p in (base / "seed_slice").glob("*.parquet"))
        ]
    )
    live_ids = set(range(40))

    idx = str(tmp_path_factory.mktemp("cdcfuzzidx"))
    build_index(spark, read_iceberg(spark, w.location), idx, cfg)
    store = IndexStore(spark, idx)
    record_iceberg_cursor(store, w.location)

    # evolve: append, append, overwrite-drop, append — syncing after each
    for step, (lo, hi) in enumerate([(40, 70), (70, 100)]):
        files = slice_parquet(lo, hi, f"app{step}")
        w.commit(added=[_data_file(p, schema_fields=w.schema_fields) for p in files])
        live_ids |= set(range(lo, hi))
        out = apply_from_iceberg(spark, store, w.location, cfg)
        assert out["applied"] and out["counts"].get("new") == hi - lo

    dropped = set(rng.sample(sorted(live_ids), 15))
    live_ids -= dropped
    survivors = slice_parquet(0, 100, "overwrite", keep=live_ids)
    w.commit(
        added=[_data_file(p, schema_fields=w.schema_fields) for p in survivors],
        deleted_paths=set(w.live_files()),
        operation="overwrite",
    )
    out = apply_from_iceberg(spark, store, w.location, cfg)
    assert out["applied"] and "full-snapshot" in out.get("fallback", "")
    assert out["counts"].get("deleted") == 15

    files = slice_parquet(100, 140, "app_final")
    w.commit(added=[_data_file(p, schema_fields=w.schema_fields) for p in files])
    live_ids |= set(range(100, 140))
    out = apply_from_iceberg(spark, store, w.location, cfg)
    assert out["applied"] and out["counts"].get("new") == 40

    # ground truth: from-scratch build over the final snapshot
    full_dir = str(tmp_path_factory.mktemp("cdcfuzzfull"))
    build_index(spark, read_iceberg(spark, w.location), full_dir, cfg)

    cdc_svc = SearchService(spark, idx, cfg)
    full_svc = SearchService(spark, full_dir, cfg)
    assert cdc_svc.index_status()["files"] == len(live_ids)
    assert cdc_svc.index_status()["chunks"] == full_svc.index_status()["chunks"]

    def results(svc, q):
        return [
            (r["chunk_id"], round(r["bm25_score"], 6))
            for r in svc.lexical(q, top_k=10)
        ]

    for q in ["cache ttl", "custom instructions", "the data", "varbyte delta fusion"]:
        assert results(cdc_svc, q) == results(full_svc, q), q


def test_apply_from_iceberg_catchup_without_cursor(spark, tmp_path_factory):
    """An index built before CDC was enabled (no cursor) catches up from
    the table root: already-indexed pages classify unchanged via the
    content-hash fast path, so the apply is a correct no-op upsert."""
    from rifflux_spark.plans.build import build_index
    from rifflux_spark.sources.tables import IndexStore

    base = tmp_path_factory.mktemp("cdc2")
    w, _ = _pages_table(spark, base, 40, seed=11)
    cfg = EngineConfig(
        block_size=32, salt_range=256, n_term_buckets=2, n_build_shards=1,
        embedding_dim=16,
    )
    idx = str(tmp_path_factory.mktemp("cdc2idx"))
    build_index(spark, read_iceberg(spark, w.location), idx, cfg)
    store = IndexStore(spark, idx)

    out = apply_from_iceberg(spark, store, w.location, cfg)
    assert out["applied"] is True
    assert out["counts"].get("unchanged") == 40
    assert not out["counts"].get("new") and not out["counts"].get("changed")
    # cursor is now pinned; the next run is metadata-only
    assert apply_from_iceberg(spark, store, w.location, cfg)["applied"] is False

    # the cursor is bound to ITS table: syncing the same index from a
    # different table location must refuse, not misread the cursor
    other, _ = _pages_table(spark, tmp_path_factory.mktemp("cdc3"), 5, seed=12)
    with pytest.raises(ValueError, match="bound to table"):
        apply_from_iceberg(spark, store, other.location, cfg)
