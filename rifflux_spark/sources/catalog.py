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
