"""Index table IO seam.

The reference persists everything in one SQLite file (reference
src/rifflux/db/schema.sql); the rebuild persists columnar tables under an
index root directory. In the sandbox this is parquet-by-path; on a cluster
the same calls target Iceberg (``df.writeTo(table)``) — the seam isolates
that choice. Explicit StructType schemas everywhere; no inference on the
hot path (SURVEY.md §1.2).

Physical layout decisions that matter at 10^12 docs:

- ``postings`` is partitioned by ``term_bucket = pmod(xxhash64(term), NB)``
  and each partition is written sorted by ``(term, salt, block_seq)`` so a
  query-time ``term IN (...)`` prunes partitions *and* parquet row groups;
- ``chunks`` is written sorted by ``doc_ord`` so top-k rehydration
  (``doc_ord IN (...)``) prunes row groups;
- small tables (``corpus_stats``, ``term_stats`` for query terms,
  ``lineage``) are read driver-side or broadcast.
"""

from __future__ import annotations

import datetime
import json
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rifflux_spark.functions.xxhash64 import term_bucket

CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("doc_ord", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("chunk_index", T.IntegerType(), False),
        T.StructField("heading_path", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("token_count", T.IntegerType(), True),
        T.StructField("dl", T.IntegerType(), True),  # FTS5 doc length (both cols)
        # pre-tokenized stream: written once by the build's single UDF
        # pass and column-pruned away by every query-path reader; posting
        # (re)builds and stats consume it without re-running Python.
        # Space-joined string, not array<string>: one value per row through
        # Arrow/parquet, and F.split keeps the re-explode JVM-side.
        T.StructField("tokens", T.StringType(), True),
    ]
)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("salt", T.LongType(), False),
        T.StructField("block_seq", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("gaps", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
        T.StructField("block_max_tf", T.LongType(), False),
        T.StructField("block_min_dl", T.LongType(), False),
        T.StructField("block_tf_sum", T.LongType(), False),
    ]
)

# encode_postings' native output: block rows that already carry their
# term_bucket partition value, so write_postings can partitionBy straight
# from the encode shuffle without re-shuffling the encoded bytes.
POSTINGS_BUCKETED_SCHEMA = T.StructType(
    POSTINGS_SCHEMA.fields + [T.StructField("term_bucket", T.IntegerType(), False)]
)

TERM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("df_docs", T.LongType(), False),
        T.StructField("cf", T.LongType(), False),
    ]
)

CORPUS_STATS_SCHEMA = T.StructType(
    [
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("total_tokens", T.LongType(), False),
        T.StructField("avgdl", T.DoubleType(), False),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("doc_ord", T.LongType(), False),
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("model", T.StringType(), False),
        T.StructField("dim", T.IntegerType(), False),
        # packed little-endian float32 — the reference's BLOB format
        # (reference sqlite_store.py:81-94); ~3× cheaper through
        # Arrow/parquet than list<float> and decoded zero-copy by numpy
        T.StructField("vec", T.BinaryType(), False),
    ]
)

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("n_chunks", T.IntegerType(), False),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("build_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("rows", T.LongType(), True),
        T.StructField("bytes", T.LongType(), True),
        T.StructField("detail", T.StringType(), True),
        # input-corpus fingerprint of the build that wrote this row — the
        # reference's git-fingerprint analog (mcp/tools.py:61-117): lets a
        # resume detect the corpus changed under a reused build_id
        T.StructField("source_fp", T.StringType(), True),
        T.StructField("finished_at", T.TimestampType(), True),
    ]
)

TOMBSTONES_SCHEMA = T.StructType([T.StructField("doc_ord", T.LongType(), False)])

# KV metadata rows are append-only ops; reads resolve last-write-wins by
# seq (reference sqlite_store.py:99-119 set/get/delete over a meta table).
METADATA_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("seq", T.LongType(), False),
        T.StructField("deleted", T.BooleanType(), False),
    ]
)


class IndexStore:
    """Directory-backed index tables (parquet seam for Iceberg tables)."""

    def __init__(self, spark: SparkSession, root: str, n_term_buckets: int | None = None) -> None:
        self.spark = spark
        self.root = str(root)
        # Physical-layout parameters are PERSISTED at build time
        # (metadata_kv "layout.*" keys) and validated here: a caller-
        # supplied bucket count that disagrees with the on-disk index
        # would silently break postings_for_terms' bucket pruning and
        # mis-bucket appended postings. None = trust the store.
        persisted_nb = self._persisted_layout("layout.n_term_buckets")
        if n_term_buckets is None:
            self.n_term_buckets = persisted_nb if persisted_nb is not None else 32
        else:
            if persisted_nb is not None and persisted_nb != int(n_term_buckets):
                raise ValueError(
                    f"index at {self.root!r} was built with n_term_buckets="
                    f"{persisted_nb}, but {n_term_buckets} was requested — "
                    "bucket pruning and appended postings would be wrong; "
                    "pass the build-time value (or None to auto-detect)"
                )
            self.n_term_buckets = int(n_term_buckets)
        self.salt_range = self._persisted_layout("layout.salt_range")

    def _persisted_layout(self, key: str) -> int | None:
        v = self.meta_get(key) if Path(self.path("metadata_kv")).exists() else None
        return int(v) if v is not None else None

    def persist_layout(self, n_term_buckets: int, salt_range: int) -> None:
        """Record the physical-layout parameters the index was built with
        (idempotent). Incremental appliers auto-align to these; readers
        validate against them at construction."""
        if self.meta_get("layout.n_term_buckets") is None:
            self.meta_set("layout.n_term_buckets", str(int(n_term_buckets)))
        if self.meta_get("layout.salt_range") is None:
            self.meta_set("layout.salt_range", str(int(salt_range)))
        self.salt_range = int(salt_range)

    def path(self, name: str) -> str:
        return str(Path(self.root) / name)

    def exists(self, name: str) -> bool:
        p = Path(self.path(name))
        return p.exists() and (any(p.glob("*.parquet")) or any(p.glob("*/*.parquet")) or any(p.glob("_SUCCESS")))

    # --- writers ---

    def write_chunks(self, df: DataFrame, ordered: bool = False, extra_cols: tuple[str, ...] = ()) -> None:
        """``ordered=True``: the frame is already globally ordered by
        doc_ord (build plan) — write as-is, row-group stats stay tight
        without paying another range shuffle. ``extra_cols`` (e.g. carried
        catalog metadata) are written too; schema-projected readers
        (:meth:`chunks`) prune them for free."""
        out = df.select([f.name for f in CHUNKS_SCHEMA.fields] + list(extra_cols))
        if not ordered:
            out = out.repartitionByRange(
                max(1, self.n_term_buckets // 2), "doc_ord"
            ).sortWithinPartitions("doc_ord")
        out.write.mode("overwrite").parquet(self.path("chunks"))

    def write_postings(self, df: DataFrame, mode: str = "overwrite") -> None:
        """Persist encoded block rows partitioned by term bucket.

        ``encode_postings`` emits rows already clustered AND sorted by
        ``term_bucket`` (its shuffle key is a function of the bucket), so
        the normal path writes them straight through — no second shuffle
        of the encoded index bytes. Rows lacking the column (hand-built
        test frames) fall back to bucketing + clustering here.
        """
        if "term_bucket" not in df.columns:
            df = (
                df.withColumn(
                    "term_bucket",
                    F.pmod(F.xxhash64("term"), F.lit(self.n_term_buckets)).cast("int"),
                )
                .repartition(self.n_term_buckets, "term_bucket")
                .sortWithinPartitions("term_bucket", "term", "salt", "block_seq")
            )
        df.write.mode(mode).partitionBy("term_bucket").parquet(self.path("postings"))

    def write_small(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        df.coalesce(1).write.mode(mode).parquet(self.path(name))

    def write_corpus_stats(self, n_docs: int, total_tokens: int, avgdl: float) -> None:
        """One-row table: write driver-side via pyarrow — a Spark job for
        one row costs ~0.5-1s of scheduler/committer overhead per build.
        (Iceberg target: a snapshot-properties or stats-table append.)"""
        import pyarrow as pa
        import pyarrow.parquet as pq

        out = Path(self.path("corpus_stats"))
        out.mkdir(parents=True, exist_ok=True)
        table = pa.table(
            {
                "n_docs": pa.array([n_docs], pa.int64()),
                "total_tokens": pa.array([total_tokens], pa.int64()),
                "avgdl": pa.array([avgdl], pa.float64()),
            }
        )
        pq.write_table(table, out / "part-0.parquet")

    def write_term_stats(self, df: DataFrame, name: str = "term_stats") -> None:
        with_bucket = df.withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(self.n_term_buckets))
        )
        (
            with_bucket.repartition(max(1, self.n_term_buckets // 4), "term_bucket")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(self.path(name))
        )

    def write_embeddings(self, df: DataFrame, ordered: bool = False) -> None:
        out = df.select([f.name for f in EMBEDDINGS_SCHEMA.fields])
        if not ordered:
            out = out.repartitionByRange(
                max(1, self.n_term_buckets // 2), "doc_ord"
            ).sortWithinPartitions("doc_ord")
        # packed L2-normalized float32 is ~incompressible; snappy would
        # only burn encode CPU on the build's second-biggest write
        out.write.mode("overwrite").option("compression", "uncompressed").parquet(
            self.path("embeddings")
        )

    # --- driver-side metadata reads (no Spark job) ---

    def count_rows(self, name: str) -> int:
        """Row count from parquet footers only — the Iceberg analog is a
        snapshot's row-count summary."""
        import pyarrow.parquet as pq

        return sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in Path(self.path(name)).rglob("*.parquet")
        )

    def max_column(self, name: str, col: str) -> int | None:
        """Column max from parquet row-group statistics only (no data
        read, no Spark job) — the Iceberg analog is a column-stats read
        from the manifest. Returns None if the table is empty or any row
        group lacks statistics (caller falls back to an agg job)."""
        import pyarrow.parquet as pq

        best: int | None = None
        for f in Path(self.path(name)).rglob("*.parquet"):
            md = pq.ParquetFile(f).metadata
            try:
                ci = [md.schema.column(i).name for i in range(md.num_columns)].index(col)
            except ValueError:
                return None
            for rg in range(md.num_row_groups):
                stats = md.row_group(rg).column(ci).statistics
                if stats is None or not stats.has_min_max:
                    return None
                v = stats.max
                best = v if best is None else max(best, v)
        return best

    def sum_column(self, name: str, col: str) -> int:
        """Driver-side column sum for small tables (e.g. term_stats.cf).
        On Iceberg this is a stats/metadata-table read or a tiny agg job."""
        import pyarrow.parquet as pq

        total = 0
        for f in Path(self.path(name)).rglob("*.parquet"):
            t = pq.read_table(f, columns=[col])
            s = t.column(0).to_pandas().sum()
            total += int(s) if s == s else 0  # NaN-safe on empty files
        return total

    def append_lineage(self, rows: list[dict]) -> None:
        """Lineage rows are driver-side metadata (a handful of rows per
        build): write them as JSONL directly — a full Spark write job for
        one row costs seconds of fixed overhead. On Iceberg this is a
        metadata-table append; the seam keeps that swap local."""
        lineage_dir = Path(self.path("lineage"))
        lineage_dir.mkdir(parents=True, exist_ok=True)
        payload = []
        for r in rows:
            r = dict(r)
            ts = r.get("finished_at")
            if ts is not None and not isinstance(ts, str):
                r["finished_at"] = ts.isoformat()
            payload.append(json.dumps(r))
        fname = f"lineage-{uuid.uuid4().hex}.jsonl"
        tmp = lineage_dir / (fname + ".tmp")
        tmp.write_text("\n".join(payload) + "\n", encoding="utf-8")
        tmp.rename(lineage_dir / fname)

    def read_lineage_rows(self) -> list[dict]:
        lineage_dir = Path(self.path("lineage"))
        out: list[dict] = []
        if not lineage_dir.exists():
            return out
        for f in sorted(lineage_dir.glob("lineage-*.jsonl")):
            for line in f.read_text(encoding="utf-8").splitlines():
                if line.strip():
                    out.append(json.loads(line))
        return out

    # --- readers ---

    def chunks(self) -> DataFrame:
        return self.spark.read.schema(CHUNKS_SCHEMA).parquet(self.path("chunks"))

    def postings(self) -> DataFrame:
        return self.spark.read.parquet(self.path("postings"))

    def postings_for_terms(self, terms: list[str]) -> DataFrame:
        """Bucket + term filter — both push into the parquet scan."""
        if not terms:
            return self.postings().limit(0)
        buckets = sorted({term_bucket(t, self.n_term_buckets) for t in terms})
        return self.postings().filter(
            F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
        )

    def term_stats(self) -> DataFrame:
        return self.spark.read.parquet(self.path("term_stats"))

    def corpus_stats(self) -> dict:
        import pyarrow.parquet as pq

        files = sorted(Path(self.path("corpus_stats")).glob("*.parquet"))
        table = pq.read_table(files[0])
        row = table.to_pylist()[0]
        return {
            "n_docs": int(row["n_docs"]),
            "total_tokens": int(row["total_tokens"]),
            "avgdl": float(row["avgdl"]),
        }

    def embeddings(self) -> DataFrame:
        return self.spark.read.schema(EMBEDDINGS_SCHEMA).parquet(self.path("embeddings"))

    def catalog(self) -> DataFrame:
        return self.spark.read.schema(CATALOG_SCHEMA).parquet(self.path("catalog"))

    def lineage(self) -> DataFrame:
        rows = self.read_lineage_rows()
        data = [
            (
                r.get("build_id"),
                r.get("stage"),
                r.get("status"),
                r.get("rows"),
                r.get("bytes"),
                r.get("detail"),
                r.get("source_fp"),
                datetime.datetime.fromisoformat(r["finished_at"]) if r.get("finished_at") else None,
            )
            for r in rows
        ]
        return self.spark.createDataFrame(data, schema=LINEAGE_SCHEMA)

    def tombstones(self) -> DataFrame:
        """doc_ords dead but still present in *postings* (queries must
        anti-join). Cleared by compaction, which physically removes them
        from the posting blocks and moves the ords to ``purged``."""
        if not self.exists("tombstones"):
            return self.spark.createDataFrame([], schema=TOMBSTONES_SCHEMA)
        return self.spark.read.schema(TOMBSTONES_SCHEMA).parquet(self.path("tombstones"))

    def purged(self) -> DataFrame:
        """doc_ords physically removed from postings by compaction but
        whose rows still sit in the chunks/embeddings files (row-group
        filtered at read time instead of copied — the O(delta) compaction
        contract). Cleared by :func:`plans.incremental.vacuum`."""
        if not self.exists("purged"):
            return self.spark.createDataFrame([], schema=TOMBSTONES_SCHEMA)
        return self.spark.read.schema(TOMBSTONES_SCHEMA).parquet(self.path("purged"))

    def dead_ords(self) -> DataFrame:
        """tombstoned ∪ purged — everything chunk/embedding readers must
        exclude. The set is delta-sized between vacuums; broadcast it."""
        return self.tombstones().unionByName(self.purged()).distinct()

    def live_chunks(self) -> DataFrame:
        return self.chunks().join(F.broadcast(self.dead_ords()), on="doc_ord", how="left_anti")

    def live_embeddings(self) -> DataFrame:
        return self.embeddings().join(F.broadcast(self.dead_ords()), on="doc_ord", how="left_anti")

    # --- generic metadata KV (reference sqlite_store.py:99-119 A6) ---

    def _meta_next_seq(self) -> int:
        m = self.max_column("metadata_kv", "seq") if self.exists("metadata_kv") else None
        return (int(m) + 1) if m is not None else 0

    def meta_set(self, key: str, value: str) -> None:
        """Append-only upsert: one driver-side parquet row (a Spark write
        job for one row costs seconds of fixed overhead; on Iceberg this
        is a metadata-table append)."""
        self._meta_append(key, value, deleted=False)

    def meta_delete(self, key: str) -> None:
        self._meta_append(key, None, deleted=True)

    def _meta_append(self, key: str, value: str | None, deleted: bool) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        out = Path(self.path("metadata_kv"))
        out.mkdir(parents=True, exist_ok=True)
        seq = self._meta_next_seq()
        table = pa.table(
            {
                "key": pa.array([key], pa.string()),
                "value": pa.array([value], pa.string()),
                "seq": pa.array([seq], pa.int64()),
                "deleted": pa.array([deleted], pa.bool_()),
            }
        )
        pq.write_table(table, out / f"part-{seq}-{uuid.uuid4().hex}.parquet")

    def meta_get(self, key: str) -> str | None:
        rows = [r for r in self._meta_rows() if r["key"] == key]
        if not rows:
            return None
        last = max(rows, key=lambda r: r["seq"])
        return None if last["deleted"] else last["value"]

    def _meta_rows(self) -> list[dict]:
        import pyarrow.parquet as pq

        p = Path(self.path("metadata_kv"))
        if not p.exists():
            return []
        out: list[dict] = []
        for f in sorted(p.glob("*.parquet")):
            out.extend(pq.read_table(f).to_pylist())
        return out

    def metadata(self) -> DataFrame:
        """Resolved KV state as a DataFrame (last-write-wins by seq,
        deletions dropped) — see :func:`operators.kv.resolve_kv`."""
        from rifflux_spark.operators.kv import resolve_kv

        if not self.exists("metadata_kv"):
            return self.spark.createDataFrame([], schema=METADATA_SCHEMA).select("key", "value")
        ops = self.spark.read.schema(METADATA_SCHEMA).parquet(self.path("metadata_kv"))
        return resolve_kv(ops)
