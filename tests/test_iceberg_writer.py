"""Iceberg v2 writer (sources/iceberg.py) + Avro OCF codec.

Evidence layers, strongest first:
1. JVM read-back — every Avro file the writer emits is read through
   the REAL Java Avro library Spark bundles (avro-1.12.1.jar, driven
   over py4j). Schema parse, codec, sync markers, and every field
   value are validated by code we did not write, so the OCF bytes are
   proven to be genuine Avro, not a private dialect that only our own
   reader accepts.
2. Iceberg snapshot semantics — the engine's on-disk manifest history
   replays through mirror_store_history and each Iceberg snapshot's
   live file set must equal the stand-in manifest's referenced files
   at that version, including time travel to non-current snapshots.
3. O(delta) commit cost — an append to a table carries every previous
   manifest by path (no rewrite) and adds exactly one new manifest:
   the property that keeps a 10-file commit cheap on a 10M-file table.
"""

from __future__ import annotations

import json
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rifflux_spark.sources.avro_ocf import read_ocf, write_ocf
from rifflux_spark.sources.iceberg import (
    ADDED,
    DELETED,
    EXISTING,
    IcebergTableWriter,
    iceberg_schema_from_parquet,
    mirror_store_history,
)
from rifflux_spark.sources.tables import IndexStore, TOMBSTONES_SCHEMA


# --------------------------------------------------------------- helpers


def _jvm_read(spark, path: str):
    """Read an Avro OCF through the bundled Java Avro library. Returns
    (records, metadata) with records as plain Python dicts."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    schema = reader.getSchema()

    def conv(value, field_schema):
        if value is None:
            return None
        t = field_schema.getType().getName()
        if t == "union":
            for branch in field_schema.getTypes():
                if branch.getType().getName() != "null":
                    return conv(value, branch)
            return None
        if t == "record":
            return {
                f.name(): conv(value.get(f.name()), f.schema())
                for f in field_schema.getFields()
            }
        if t == "string":
            return value.toString()
        if t == "bytes":
            bb = value  # java.nio.ByteBuffer
            out = bytearray()
            while bb.hasRemaining():
                out.append(bb.get() & 0xFF)
            return bytes(out)
        if t == "array":
            return [conv(v, field_schema.getElementType()) for v in value]
        if t == "map":
            return {
                k.toString(): conv(value.get(k), field_schema.getValueType())
                for k in value.keySet()
            }
        return value  # int/long/float/double/boolean arrive converted

    records = []
    while reader.hasNext():
        rec = reader.next()
        records.append(
            {f.name(): conv(rec.get(f.name()), f.schema()) for f in schema.getFields()}
        )
    meta = {}
    for key in ("avro.codec", "format-version", "content", "snapshot-id"):
        v = reader.getMetaString(key)
        if v is not None:
            meta[key] = v
    reader.close()
    return records, meta


def _tiny_parquet(path: Path, n: int, start: int = 0) -> str:
    pq.write_table(
        pa.table({"doc_ord": pa.array(range(start, start + n), pa.int64())}), path
    )
    return str(path)


TYPED_SCHEMA = {
    "type": "record",
    "name": "zoo",
    "fields": [
        {"name": "a_long", "type": "long"},
        {"name": "an_int", "type": "int"},
        {"name": "a_string", "type": "string"},
        {"name": "a_bool", "type": "boolean"},
        {"name": "a_double", "type": "double"},
        {"name": "opt_set", "type": ["null", "long"], "default": None},
        {"name": "opt_null", "type": ["null", "string"], "default": None},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "inner",
                "fields": [
                    {"name": "path", "type": "string"},
                    {"name": "size", "type": "long"},
                ],
            },
        },
        {"name": "arr", "type": {"type": "array", "items": "int"}},
        {"name": "a_map", "type": {"type": "map", "values": "string"}},
    ],
}

TYPED_ROWS = [
    {
        "a_long": -(2**40) - 7,
        "an_int": -1,
        "a_string": "héllo wörld ☃",
        "a_bool": True,
        "a_double": 3.140625,
        "opt_set": 99,
        "opt_null": None,
        "nested": {"path": "s3://bucket/part-0.parquet", "size": 12345},
        "arr": [0, 1, -2, 300000],
        "a_map": {"k1": "v1", "k2": "v2"},
    },
    {
        "a_long": 0,
        "an_int": 2**31 - 1,
        "a_string": "",
        "a_bool": False,
        "a_double": -0.5,
        "opt_set": None,
        "opt_null": "present",
        "nested": {"path": "x", "size": 0},
        "arr": [],
        "a_map": {},
    },
]


# ----------------------------------------------------------- OCF codec


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_ocf_jvm_roundtrip(spark, tmp_path, codec):
    """The strongest claim: Java Avro reads our bytes and sees our
    values, for both supported codecs, across every type the Iceberg
    schemas use (incl. negative varints, unicode, unions, nesting)."""
    path = str(tmp_path / f"zoo-{codec}.avro")
    write_ocf(path, TYPED_SCHEMA, TYPED_ROWS, codec=codec, metadata={"who": "test"})
    records, meta = _jvm_read(spark, path)
    assert meta["avro.codec"] == codec
    assert len(records) == 2
    for got, want in zip(records, TYPED_ROWS):
        for k, v in want.items():
            if isinstance(v, float):
                assert abs(got[k] - v) < 1e-12, k
            else:
                assert got[k] == v, k


def test_avro_ocf_python_roundtrip(tmp_path):
    path = str(tmp_path / "zoo.avro")
    write_ocf(path, TYPED_SCHEMA, TYPED_ROWS)
    schema, meta, records = read_ocf(path)
    assert schema == TYPED_SCHEMA
    assert records == TYPED_ROWS
    assert meta["avro.codec"] == b"deflate"


def test_avro_ocf_empty_file(tmp_path):
    path = str(tmp_path / "empty.avro")
    write_ocf(path, TYPED_SCHEMA, [])
    _, _, records = read_ocf(path)
    assert records == []


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False


if _HAVE_HYPOTHESIS:

    _FUZZ_ROW = st.fixed_dictionaries(
        {
            "a_long": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "an_int": st.integers(min_value=-(2**31), max_value=2**31 - 1),
            "a_string": st.text(max_size=80),
            "a_bool": st.booleans(),
            "a_double": st.floats(allow_nan=False, width=64),
            "opt_set": st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62)),
            "opt_null": st.one_of(st.none(), st.text(max_size=20)),
            "nested": st.fixed_dictionaries(
                {"path": st.text(max_size=40), "size": st.integers(0, 2**50)}
            ),
            "arr": st.lists(st.integers(-(2**31), 2**31 - 1), max_size=10),
            "a_map": st.dictionaries(st.text(min_size=1, max_size=10), st.text(max_size=10), max_size=5),
        }
    )

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=st.lists(_FUZZ_ROW, max_size=6), deflate=st.booleans())
    def test_avro_ocf_jvm_property_fuzz(spark, rows, deflate):
        """Property fuzz: arbitrary values over every type Iceberg
        metadata uses must survive write_ocf → Java Avro read, both
        codecs — varint boundaries (Long.MIN/MAX), unicode, empty
        collections, null unions. Java Avro is the arbiter."""
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            path = f"{d}/fuzz.avro"
            write_ocf(
                path, TYPED_SCHEMA, rows, codec="deflate" if deflate else "null"
            )
            records, _ = _jvm_read(spark, path)
            assert len(records) == len(rows)
            for got, want in zip(records, rows):
                for k, v in want.items():
                    if isinstance(v, float):
                        assert got[k] == v or abs(got[k] - v) < 1e-12, k
                    else:
                        assert got[k] == v, (k, got[k], v)
            # and the pure-Python reader agrees with what was written
            _, _, py_records = read_ocf(path)
            assert py_records == rows


# ------------------------------------------------------ Iceberg writer


def _writer(tmp_path: Path) -> IcebergTableWriter:
    ticker = iter(range(1_000_000, 2_000_000))
    return IcebergTableWriter(
        str(tmp_path / "table"),
        schema_fields=[{"id": 1, "name": "doc_ord", "required": False, "type": "long"}],
        clock=lambda: 1_755_000_000.0,
        snapshot_ids=lambda: next(ticker),
    )


def _df(path: str, n: int) -> dict:
    import os

    return {
        "content": 0,
        "file_path": path,
        "file_format": "PARQUET",
        "partition": {},
        "record_count": n,
        "file_size_in_bytes": os.path.getsize(path),
    }


def test_iceberg_append_delete_overwrite_and_time_travel(tmp_path):
    w = _writer(tmp_path)
    f1 = _tiny_parquet(tmp_path / "f1.parquet", 10)
    f2 = _tiny_parquet(tmp_path / "f2.parquet", 20, start=10)
    f3 = _tiny_parquet(tmp_path / "f3.parquet", 5, start=30)

    s1 = w.commit(added=[_df(f1, 10)])
    s2 = w.commit(added=[_df(f2, 20)])
    s3 = w.commit(added=[_df(f3, 5)], deleted_paths={f1}, operation="overwrite")

    # live file set now and at every past snapshot (time travel)
    assert set(w.live_files()) == {f2, f3}
    assert set(w.live_files(s1["snapshot-id"])) == {f1}
    assert set(w.live_files(s2["snapshot-id"])) == {f1, f2}
    assert set(w.live_files(s3["snapshot-id"])) == {f2, f3}

    # record counts survive through metadata (no parquet read needed)
    assert sum(df["record_count"] for df in w.live_files().values()) == 25

    # metadata.json: required v2 keys, contiguous versions, atomic hint
    root = Path(w.location)
    assert (root / "version-hint.text").read_text() == "3"
    meta = json.loads((root / "metadata" / "v3.metadata.json").read_text())
    for key in (
        "format-version", "table-uuid", "location", "last-sequence-number",
        "last-updated-ms", "last-column-id", "schemas", "current-schema-id",
        "partition-specs", "default-spec-id", "sort-orders", "snapshots",
        "current-snapshot-id", "snapshot-log", "metadata-log", "refs",
    ):
        assert key in meta, key
    assert meta["format-version"] == 2
    assert meta["last-sequence-number"] == 3
    assert [s["snapshot-id"] for s in meta["snapshot-log"]] == [
        s["snapshot-id"] for s in (s1, s2, s3)
    ]
    assert meta["refs"]["main"]["snapshot-id"] == s3["snapshot-id"]
    assert meta["snapshots"][2]["summary"]["operation"] == "overwrite"
    assert meta["snapshots"][2]["summary"]["deleted-data-files"] == "1"
    # prior metadata files are linked (metadata-log) and still present
    assert len(meta["metadata-log"]) == 2
    assert (root / "metadata" / "v1.metadata.json").exists()


def test_iceberg_append_is_o_delta(tmp_path, monkeypatch):
    """An append must NOT rewrite prior manifests: snapshot N+1's
    manifest list references snapshot N's manifests by identical path
    and adds exactly one new manifest. It must also not READ them —
    metadata reads during an append are O(delta), never O(table)."""
    import rifflux_spark.sources.iceberg as ice

    w = _writer(tmp_path)
    f1 = _tiny_parquet(tmp_path / "f1.parquet", 10)
    f2 = _tiny_parquet(tmp_path / "f2.parquet", 20, start=10)
    s1 = w.commit(added=[_df(f1, 10)])

    reads: list[str] = []
    orig = ice.read_ocf
    monkeypatch.setattr(ice, "read_ocf", lambda p: (reads.append(p) or orig(p)))
    s2 = w.commit(added=[_df(f2, 20)])
    monkeypatch.undo()
    assert reads == [s1["manifest-list"]], (
        "append must read ONLY the previous manifest list, no manifest entries"
    )
    _, _, l1 = read_ocf(s1["manifest-list"])
    _, _, l2 = read_ocf(s2["manifest-list"])
    assert len(l1) == 1 and len(l2) == 2
    assert l2[0]["manifest_path"] == l1[0]["manifest_path"], "append rewrote a manifest"
    assert l2[1]["added_files_count"] == 1 and l2[1]["existing_files_count"] == 0


def test_iceberg_delete_rewrites_only_touched_manifest(tmp_path):
    w = _writer(tmp_path)
    f1 = _tiny_parquet(tmp_path / "f1.parquet", 10)
    f2 = _tiny_parquet(tmp_path / "f2.parquet", 20, start=10)
    f3 = _tiny_parquet(tmp_path / "f3.parquet", 5, start=30)
    w.commit(added=[_df(f1, 10)])
    s2 = w.commit(added=[_df(f2, 20), _df(f3, 5)])
    s3 = w.commit(added=[], deleted_paths={f2}, operation="delete")
    _, _, l2 = read_ocf(s2["manifest-list"])
    _, _, l3 = read_ocf(s3["manifest-list"])
    paths2 = {m["manifest_path"] for m in l2}
    # f1's manifest carried untouched; f2/f3's manifest rewritten
    assert l3[0]["manifest_path"] in paths2
    rewritten = [m for m in l3 if m["manifest_path"] not in paths2]
    assert len(rewritten) == 1
    _, _, entries = read_ocf(rewritten[0]["manifest_path"])
    statuses = {e["data_file"]["file_path"]: e["status"] for e in entries}
    assert statuses[f2] == DELETED and statuses[f3] == EXISTING
    # survivor keeps its ORIGINAL sequence number (required for correct
    # v2 delete-file applicability at read time)
    surv = next(e for e in entries if e["status"] == EXISTING)
    assert surv["sequence_number"] == s2["sequence-number"]


def test_iceberg_manifest_jvm_readback(spark, tmp_path):
    """The actual emitted Iceberg metadata (manifest + manifest list)
    parses and round-trips through Java Avro."""
    w = _writer(tmp_path)
    f1 = _tiny_parquet(tmp_path / "f1.parquet", 10)
    f2 = _tiny_parquet(tmp_path / "f2.parquet", 20, start=10)
    s = w.commit(added=[_df(f1, 10), _df(f2, 20)])

    lists, lmeta = _jvm_read(spark, s["manifest-list"])
    assert lmeta["format-version"] == "2"
    assert lmeta["snapshot-id"] == str(s["snapshot-id"])
    assert len(lists) == 1
    mf = lists[0]
    assert mf["added_files_count"] == 2 and mf["added_rows_count"] == 30
    assert mf["content"] == 0 and mf["partition_spec_id"] == 0
    assert Path(mf["manifest_path"]).stat().st_size == mf["manifest_length"]

    entries, emeta = _jvm_read(spark, mf["manifest_path"])
    assert emeta["format-version"] == "2" and emeta["content"] == "data"
    assert {e["data_file"]["file_path"] for e in entries} == {f1, f2}
    assert all(e["status"] == ADDED for e in entries)
    assert sum(e["data_file"]["record_count"] for e in entries) == 30
    # the embedded Iceberg schema + spec metadata parse as JSON
    jvm_reader = spark._jvm.org.apache.avro.file.DataFileReader(
        spark._jvm.java.io.File(mf["manifest_path"]),
        spark._jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    assert json.loads(jvm_reader.getMetaString("schema"))["type"] == "struct"
    assert json.loads(jvm_reader.getMetaString("partition-spec")) == []
    jvm_reader.close()


# --------------------------------------------- store-history mirroring


def test_mirror_store_history_matches_stand_in(spark, tmp_path_factory):
    """Replay the engine's real commit protocol into Iceberg and check
    every snapshot's live file set equals what the stand-in manifest
    referenced at that version — the drop-in claim, now exercised
    against the REAL format rather than asserted."""
    from pyspark.sql import functions as F

    from rifflux_spark.functions.xxhash64 import term_bucket
    from rifflux_spark.sources.tables import POSTINGS_SCHEMA

    index_dir = str(tmp_path_factory.mktemp("iceidx"))
    store = IndexStore(spark, index_dir, n_term_buckets=2)

    def tomb(*ords):
        return spark.createDataFrame(
            pd.DataFrame({"doc_ord": list(ords)}), TOMBSTONES_SCHEMA
        )

    def postings(terms):
        rows = [
            (t, 0, 0, 1, i, i, b"\x01", b"\x01", b"\x10", 1, 16, 1)
            for i, t in enumerate(terms)
        ]
        return spark.createDataFrame(rows, POSTINGS_SCHEMA)

    store.write_small(tomb(1, 2), "tombstones", mode="overwrite")  # v1
    store.write_small(tomb(3), "tombstones", mode="append")        # v2
    store.write_small(tomb(9), "tombstones", mode="overwrite")     # v3
    store.write_postings(postings(["alpha", "zulu"]))              # v4
    b0 = [t for t in ["alpha", "zulu"] if term_bucket(t, 2) == 0]
    store.overwrite_posting_buckets(
        postings(b0).withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(2)).cast("int")
        ),
        affected=[0],
    )                                                              # v5

    warehouse = str(tmp_path_factory.mktemp("icewh"))
    writers = mirror_store_history(index_dir, warehouse, clock=lambda: 1_755_000_000.0)
    assert set(writers) == {"tombstones", "postings"}

    # per-version parity: stand-in's referenced parquet files == the
    # Iceberg snapshot's live files, for EVERY table-change version
    from rifflux_spark.sources.iceberg import _entry_files

    hist_dir = Path(index_dir) / "_manifests"
    expected: dict[str, list[set[str]]] = {"tombstones": [], "postings": []}
    for hpath in sorted(hist_dir.glob("v*.json")):
        snap = json.loads(hpath.read_text())
        for name in expected:
            entry = snap["tables"].get(name)
            if entry is None:
                continue
            files = set(_entry_files(Path(index_dir), entry))
            if not expected[name] or files != expected[name][-1]:
                expected[name].append(files)

    for name, w in writers.items():
        snaps = w.metadata["snapshots"]
        assert len(snaps) == len(expected[name]), name
        for snap, want in zip(snaps, expected[name]):
            assert set(w.live_files(snap["snapshot-id"])) == want, (
                name,
                snap["snapshot-id"],
            )

    # the postings table mirrors the store's bucket partitioning as a
    # real identity partition spec with per-file partition values
    pw = writers["postings"]
    spec = pw.metadata["partition-specs"][0]["fields"]
    assert [f["name"] for f in spec] == ["term_bucket"]
    parts = {
        df["partition"]["term_bucket"] for df in pw.live_files().values()
    }
    assert parts <= {0, 1} and parts

    # record counts in metadata equal the parquet files' actual rows
    for w in writers.values():
        for path, df in w.live_files().items():
            assert df["record_count"] == pq.ParquetFile(path).metadata.num_rows

    # derived Iceberg schema matches the parquet schema it mirrors
    sample = next(iter(writers["tombstones"].live_files()))
    fields = iceberg_schema_from_parquet(sample)
    assert {f["name"] for f in fields} >= {"doc_ord"}

    # JVM-validate one mirrored manifest list end-to-end
    cur = writers["postings"].current_snapshot()
    lists, lmeta = _jvm_read(spark, cur["manifest-list"])
    assert lmeta["format-version"] == "2"
    assert sum(m["added_files_count"] + m["existing_files_count"] for m in lists) == len(
        writers["postings"].live_files()
    )


def test_column_stats_and_metadata_only_pruning(spark, tmp_path):
    """Per-file column stats come from parquet footers at commit time;
    plan_files then prunes a range scan from manifest metadata alone —
    and the stats-bearing manifest still round-trips through Java Avro."""
    from rifflux_spark.sources.iceberg import _data_file, deser_bound

    w = _writer(tmp_path)
    f1 = _tiny_parquet(tmp_path / "f1.parquet", 10, start=0)     # 0..9
    f2 = _tiny_parquet(tmp_path / "f2.parquet", 10, start=100)   # 100..109
    f3 = _tiny_parquet(tmp_path / "f3.parquet", 10, start=1000)  # 1000..1009
    s = w.commit(
        added=[_data_file(f, schema_fields=w.schema_fields) for f in (f1, f2, f3)]
    )

    df = w.live_files()[f2]
    assert {e["key"]: e["value"] for e in df["value_counts"]}[1] == 10
    lo = {e["key"]: e["value"] for e in df["lower_bounds"]}
    hi = {e["key"]: e["value"] for e in df["upper_bounds"]}
    assert deser_bound("long", lo[1]) == 100
    assert deser_bound("long", hi[1]) == 109

    assert w.plan_files("doc_ord", lo=100, hi=109) == [f2]
    assert set(w.plan_files("doc_ord", lo=5, hi=105)) == {f1, f2}
    assert w.plan_files("doc_ord", lo=5000) == []
    assert set(w.plan_files("doc_ord")) == {f1, f2, f3}

    # a file with NO stats must never be pruned
    f4 = _tiny_parquet(tmp_path / "f4.parquet", 3, start=50)
    w.commit(added=[_df(f4, 3)])  # stats omitted
    assert f4 in w.plan_files("doc_ord", lo=10**9)

    # Java Avro reads the stats maps (arrays of key/value records)
    _, _, manifests = read_ocf(s["manifest-list"])
    entries, _ = _jvm_read(spark, manifests[0]["manifest_path"])
    got = next(e for e in entries if e["data_file"]["file_path"] == f2)
    jlo = {e["key"]: e["value"] for e in got["data_file"]["lower_bounds"]}
    assert deser_bound("long", jlo[1]) == 100


def test_inline_mirror_through_build_and_incremental(spark, tmp_path_factory):
    """EngineConfig(iceberg_mirror=True): a real index build commits an
    Iceberg mirror of every store table inline; an incremental apply
    advances it; a store commit that 'missed' its mirror (crash window)
    heals on the next sync_iceberg. Live files always equal the
    stand-in manifest's referenced files."""
    from rifflux_spark.config import EngineConfig
    from rifflux_spark.plans.build import build_index
    from rifflux_spark.plans.incremental import apply_incremental
    from rifflux_spark.sources.pages import synthetic_pages

    cfg = EngineConfig(
        block_size=32,
        salt_range=256,
        n_term_buckets=2,
        n_build_shards=1,
        embedding_dim=16,
        iceberg_mirror=True,
    )
    index_dir = str(tmp_path_factory.mktemp("inlineidx"))
    pages = synthetic_pages(spark, 40, seed=7)
    metrics = build_index(spark, pages, index_dir, cfg)
    assert "iceberg" in metrics and "postings" in metrics["iceberg"]

    store = IndexStore(spark, index_dir, n_term_buckets=2)

    def live_parity():
        manifest = json.loads((Path(index_dir) / "_manifest.json").read_text())
        from rifflux_spark.sources.iceberg import _entry_files, _resume_writer

        for name, entry in manifest["tables"].items():
            want = set(_entry_files(Path(index_dir), entry))
            loc = Path(index_dir) / "_iceberg" / name
            if not want and not loc.exists():
                continue  # never-mirrored empty table
            w = _resume_writer(loc, clock=__import__("time").time)
            assert set(w.live_files()) == want, name

    live_parity()

    # incremental apply advances the mirror inline
    changed = pages.limit(35)  # 5 urls pruned, others unchanged/updated
    out = apply_incremental(spark, store, changed, cfg)
    assert "iceberg" in out
    live_parity()

    # crash window: a direct store commit with NO inline mirror…
    store.write_small(
        spark.createDataFrame(pd.DataFrame({"doc_ord": [12345]}), TOMBSTONES_SCHEMA),
        "tombstones",
        mode="append",
    )
    # …heals on the next sync (cursor catch-up), nothing double-commits
    s1 = store.sync_iceberg()
    s2 = store.sync_iceberg()
    assert s1 == s2
    live_parity()

    # maintenance must advance the mirror too: compact() rewrites
    # posting generations and gc() may reclaim the old dirs — a stale
    # mirror would point Iceberg readers at deleted files
    from rifflux_spark.plans.incremental import compact, vacuum

    cmetrics = compact(spark, store, cfg)
    assert "iceberg" in cmetrics
    live_parity()
    vmetrics = vacuum(spark, store, cfg)
    assert "iceberg" in vmetrics
    live_parity()


def test_read_iceberg_snapshot_pruning_and_partition_restore(spark, tmp_path):
    """read_iceberg plans the scan from Iceberg metadata: current and
    time-travel snapshots read their exact live rows, bounds pruning
    hands Spark only surviving files, and stripped partition columns
    are restored from manifest partition values."""
    from rifflux_spark.sources.iceberg import _data_file, read_iceberg

    w = _writer(tmp_path)
    f1 = _tiny_parquet(tmp_path / "f1.parquet", 10, start=0)
    f2 = _tiny_parquet(tmp_path / "f2.parquet", 10, start=100)
    s1 = w.commit(added=[_data_file(f1, schema_fields=w.schema_fields)])
    w.commit(
        added=[_data_file(f2, schema_fields=w.schema_fields)],
        deleted_paths={f1},
        operation="overwrite",
    )

    cur = read_iceberg(spark, w.location)
    assert sorted(r["doc_ord"] for r in cur.collect()) == list(range(100, 110))
    old = read_iceberg(spark, w.location, snapshot_id=s1["snapshot-id"])
    assert sorted(r["doc_ord"] for r in old.collect()) == list(range(10))

    # bounds pruning: ask for a range only f2 covers — f1 never read
    w2dir = tmp_path / "t2"
    w2 = IcebergTableWriter(
        str(w2dir),
        schema_fields=[{"id": 1, "name": "doc_ord", "required": False, "type": "long"}],
        clock=lambda: 1_755_000_000.0,
    )
    g1 = _tiny_parquet(tmp_path / "g1.parquet", 10, start=0)
    g2 = _tiny_parquet(tmp_path / "g2.parquet", 10, start=100)
    w2.commit(added=[_data_file(g, schema_fields=w2.schema_fields) for g in (g1, g2)])
    pruned = read_iceberg(
        spark, str(w2dir), prune_column="doc_ord", prune_lo=100, prune_hi=105
    )
    assert pruned.inputFiles() == [f"file://{g2}"] or pruned.inputFiles() == [g2]
    assert pruned.count() == 10  # file granularity; row filters are Spark's job

    # empty table reads as an empty frame with the Iceberg schema
    w3 = IcebergTableWriter(
        str(tmp_path / "t3"),
        schema_fields=[{"id": 1, "name": "doc_ord", "required": False, "type": "long"}],
        clock=lambda: 1_755_000_000.0,
    )
    w3.commit(added=[])
    empty = read_iceberg(spark, str(tmp_path / "t3"))
    assert empty.count() == 0 and empty.columns == ["doc_ord"]


def test_build_index_from_iceberg_input(spark, tmp_path_factory):
    """The north-rule input shape end-to-end: a (url, warc_ts, text)
    pages corpus committed as an Iceberg table, the index built FROM a
    read_iceberg snapshot, searched, and the mirrored postings table
    read back via read_iceberg with its term_bucket partition restored."""
    from rifflux_spark.config import EngineConfig
    from rifflux_spark.plans.build import build_index
    from rifflux_spark.service import SearchService
    from rifflux_spark.sources.iceberg import (
        IcebergTableWriter,
        _data_file,
        iceberg_schema_from_parquet,
        read_iceberg,
    )
    from rifflux_spark.sources.pages import synthetic_pages

    base = tmp_path_factory.mktemp("icein")
    pages = synthetic_pages(spark, 120, seed=5)
    pages_dir = str(base / "pages_data")
    pages.repartition(3).write.parquet(pages_dir)
    pfiles = sorted(str(p) for p in Path(pages_dir).glob("*.parquet"))

    table = IcebergTableWriter(
        str(base / "pages_iceberg"),
        schema_fields=iceberg_schema_from_parquet(pfiles[0]),
        clock=lambda: 1_755_000_000.0,
    )
    table.commit(added=[_data_file(p, schema_fields=table.schema_fields) for p in pfiles])

    src = read_iceberg(spark, table.location)
    assert src.count() == 120

    cfg = EngineConfig(
        block_size=32, salt_range=256, n_term_buckets=2, n_build_shards=1,
        embedding_dim=16, iceberg_mirror=True,
    )
    index_dir = str(tmp_path_factory.mktemp("iceinidx"))
    build_index(spark, src, index_dir, cfg)
    svc = SearchService(spark, index_dir, cfg)
    hits = svc.search("cache ttl", top_k=3, mode="lexical")
    assert hits and all(h["path"].startswith("https://") for h in hits)

    # read the MIRRORED postings table back through Iceberg metadata,
    # bucket-pruned, partition column restored
    post = read_iceberg(
        spark,
        str(Path(index_dir) / "_iceberg" / "postings"),
        prune_column="term_bucket",
        prune_lo=0,
        prune_hi=0,
    )
    assert "term_bucket" in post.columns
    vals = {r["term_bucket"] for r in post.select("term_bucket").distinct().collect()}
    assert vals == {0}
    assert post.count() > 0


def test_mirror_is_idempotent_catchup(spark, tmp_path_factory):
    """Running the mirror again over an unchanged history must add no
    snapshots (catch-up-job semantics), and a NEW store commit then
    mirrors as exactly one more snapshot."""
    index_dir = str(tmp_path_factory.mktemp("iceidx2"))
    store = IndexStore(spark, index_dir, n_term_buckets=2)

    def tomb(*ords):
        return spark.createDataFrame(
            pd.DataFrame({"doc_ord": list(ords)}), TOMBSTONES_SCHEMA
        )

    store.write_small(tomb(1), "tombstones", mode="overwrite")
    warehouse = str(tmp_path_factory.mktemp("icewh2"))
    w1 = mirror_store_history(index_dir, warehouse)["tombstones"]
    n1 = len(w1.metadata["snapshots"])
    assert w1.metadata["properties"]["rifflux.store-version"] == str(
        json.loads((Path(index_dir) / "_manifest.json").read_text())["version"]
    )

    # unchanged history re-mirrors as a no-op: the version cursor in
    # table properties skips everything already mirrored
    w2 = mirror_store_history(index_dir, warehouse)["tombstones"]
    assert len(w2.metadata["snapshots"]) == n1

    # one new store commit mirrors as exactly one more snapshot whose
    # live files equal the stand-in's current referenced files
    store.write_small(tomb(7), "tombstones", mode="append")
    w3 = mirror_store_history(index_dir, warehouse, tables=["tombstones"])["tombstones"]
    assert len(w3.metadata["snapshots"]) == n1 + 1
    assert w3.metadata["snapshots"][-1]["summary"]["operation"] == "append"
    current = json.loads((Path(index_dir) / "_manifest.json").read_text())
    want = {
        str(p)
        for d in current["tables"]["tombstones"]["dirs"]
        for p in (Path(index_dir) / d).glob("**/*.parquet")
    }
    assert set(w3.live_files()) == want

    # the summary-arithmetic count agrees with the manifest walk
    assert w3.live_file_count() == len(w3.live_files())


def test_noop_sync_opens_no_manifests(spark, tmp_path_factory, monkeypatch):
    """O(delta) for the SYNC WRAPPER, not just the commits: with every
    mirror cursor at the latest store version, a re-sync must open ZERO
    Avro files (no manifest lists, no manifests) — a 10M-file table's
    catch-up poll is a version-hint read, nothing more."""
    import rifflux_spark.sources.iceberg as ice

    index_dir = str(tmp_path_factory.mktemp("icenoop"))
    store = IndexStore(spark, index_dir, n_term_buckets=2)
    store.write_small(
        spark.createDataFrame(pd.DataFrame({"doc_ord": [1, 2]}), TOMBSTONES_SCHEMA),
        "tombstones",
        mode="overwrite",
    )
    warehouse = str(tmp_path_factory.mktemp("icenoopwh"))
    mirror_store_history(index_dir, warehouse)

    opened: list[str] = []
    real = ice.read_ocf

    def counting(path, *a, **kw):
        opened.append(str(path))
        return real(path, *a, **kw)

    monkeypatch.setattr(ice, "read_ocf", counting)
    again = mirror_store_history(index_dir, warehouse)
    assert opened == [], f"no-op sync opened {opened}"
    # and the summary count needs no manifest walk either
    for w in again.values():
        assert w.live_file_count() >= 0
    assert opened == []
