"""Incremental change detection — the reference's delta scan as joins.

Reference semantics (SURVEY.md §2.B; reference
src/rifflux/indexing/indexer.py:56-97, sqlite_store.py:121-138):

- I1 bulk catalog load → one DataFrame read;
- I2 stat fast-path (mtime/size) and I3 content-hash skip → one left-outer
  join of the new snapshot against the stored catalog with two-phase
  predicates (cheap stat columns first, sha only on survivors);
- I4 prune-missing → left-anti join (catalog rows absent from snapshot);
- I5 per-file invalidation → recompute only ``changed`` rows downstream.

For the web corpus the key is ``url``; ``warc_ts``/``size_bytes`` play
mtime/size and ``sha256(text)`` the content hash. All joins are plain
equi-joins on the key — shuffle-partitioned by Catalyst, broadcast when
one side is small, AQE-skew-split otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_of(
    pages: DataFrame,
    key: str = "url",
    text_col: str = "text",
    catalog: DataFrame | None = None,
) -> DataFrame:
    """Project a pages frame to catalog shape (key, stat cols, sha256).

    With ``catalog`` given, this is the reference's two-phase stat
    fast-path (I2, indexer.py:67-76): rows whose (warc_ts, size_bytes)
    match the stored catalog entry *reuse its sha256* instead of
    re-hashing the content — the CASE guards the sha2 so the hash CPU is
    paid only for the changed-stat subset, not the whole crawl. (The
    assumption — stat-identical ⇒ content-identical — is exactly the
    reference's.) Without ``catalog`` every row is hashed (first build).
    """
    cols = [F.col(key)]
    if "warc_ts" in pages.columns:
        cols.append(F.col("warc_ts"))
    else:
        cols.append(F.lit(None).cast("timestamp").alias("warc_ts"))
    snap = pages.select(
        *cols,
        F.length(text_col).cast("long").alias("size_bytes"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_text"),
    )
    if catalog is None:
        return snap.select(
            key, "warc_ts", "size_bytes", F.sha2("_text", 256).alias("sha256")
        )
    cat = catalog.select(
        F.col(key),
        F.col("warc_ts").alias("_cat_ts"),
        F.col("size_bytes").alias("_cat_size"),
        F.col("sha256").alias("_cat_sha"),
    )
    joined = snap.join(cat, on=key, how="left")
    stat_match = (
        F.col("_cat_sha").isNotNull()
        & (F.col("size_bytes") == F.col("_cat_size"))
        & F.col("warc_ts").eqNullSafe(F.col("_cat_ts"))
    )
    return joined.select(
        key,
        "warc_ts",
        "size_bytes",
        F.when(stat_match, F.col("_cat_sha"))
        .otherwise(F.sha2("_text", 256))
        .alias("sha256"),
    )


def diff_snapshot(catalog: DataFrame, snapshot: DataFrame, key: str = "url") -> DataFrame:
    """Full-outer diff → one row per key with a ``status`` column in
    {new, deleted, changed, unchanged}.

    'changed' uses the content hash (reference I3); a stat-only change with
    identical sha is 'unchanged' for indexing purposes (metadata-refresh
    only), exactly the reference's hash-match skip (indexer.py:84-97).
    """
    cat = catalog.select(
        F.col(key), F.col("sha256").alias("cat_sha256")
    )
    snap = snapshot.select(
        F.col(key), F.col("sha256").alias("snap_sha256")
    )
    joined = cat.join(snap, on=key, how="full_outer")
    return joined.select(
        key,
        F.when(F.col("cat_sha256").isNull(), F.lit("new"))
        .when(F.col("snap_sha256").isNull(), F.lit("deleted"))
        .when(F.col("cat_sha256") != F.col("snap_sha256"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def prune_missing(catalog: DataFrame, snapshot: DataFrame, key: str = "url") -> DataFrame:
    """Left-anti join: catalog entries whose source vanished (reference
    delete_files_except, sqlite_store.py:121-138)."""
    return catalog.join(snapshot.select(key), on=key, how="left_anti")


def changed_keys(catalog: DataFrame, snapshot: DataFrame, key: str = "url") -> DataFrame:
    """Keys needing re-chunk/re-embed/re-post (new or content-changed)."""
    d = diff_snapshot(catalog, snapshot, key)
    return d.filter(F.col("status").isin(["new", "changed"])).select(key, "status")


def catalog_from_staged_files(files, has_warc_ts: bool):
    """Arrow twin of the build's catalog aggregation (build.py's
    ``groupBy(url)`` over the staged chunk riders) for metadata-sized
    corpora: column-pruned driver-side groupby, no Spark job — the same
    ~1s-fixed-cost serial fraction the stats stage sheds. The rider
    columns (warc_ts/size_bytes/page_sha256) are constant per url by
    construction, so ``min`` reproduces the Spark path's ``first``
    exactly. Returns an Arrow table shaped like CATALOG_SCHEMA
    (url, warc_ts, size_bytes, sha256, n_chunks)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    cols = ["url", "size_bytes", "page_sha256"] + (["warc_ts"] if has_warc_ts else [])
    parts = [pq.read_table(f, columns=cols) for f in files]
    staged = pa.concat_tables(parts, promote_options="permissive")
    aggs = [("size_bytes", "min"), ("page_sha256", "min"), ("url", "count")]
    if has_warc_ts:
        aggs.insert(0, ("warc_ts", "min"))
    agg = staged.group_by("url").aggregate(aggs)
    n = agg.num_rows
    if has_warc_ts:
        ts = agg.column("warc_ts_min")
        # normalize to UTC-adjusted micros so Spark reads TimestampType
        # (LTZ) — matching its own writer — regardless of whether the
        # staged file carried INT96/naive or annotated-UTC timestamps
        if ts.type.tz is None:
            ts = pc.assume_timezone(ts, "UTC")
        ts = ts.cast(pa.timestamp("us", tz="UTC"))
    else:
        ts = pa.nulls(n, pa.timestamp("us", tz="UTC"))
    return pa.table(
        {
            "url": agg.column("url"),
            "warc_ts": ts,
            "size_bytes": agg.column("size_bytes_min").cast(pa.int64()),
            "sha256": agg.column("page_sha256_min"),
            "n_chunks": agg.column("url_count").cast(pa.int32()),
        }
    )
