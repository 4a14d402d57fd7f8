"""spark-submit entry point for the index build / incremental refresh.

The north-rule packaging contract: the engine ships as a
``spark-submit --py-files`` job. The package zip is built by
``rifflux_spark.session.package_zip()`` (the same artifact the library
ships programmatically via ``addPyFile``); a cluster invocation is:

    ZIP=$(python -c 'from rifflux_spark.session import package_zip; print(package_zip())')
    spark-submit --py-files "$ZIP" scripts/submit_build.py \
        --pages s3://bucket/crawl/pages/ --index-dir s3://bucket/index/ \
        --term-buckets 4096 --build-shards 64

``--pages`` may be a parquet directory or an Iceberg table location;
Iceberg builds pin a metadata-planned snapshot and record the CDC
cursor, and Iceberg ``--incremental`` runs read only the files
appended since that cursor. The whole contract — zip-only imports
from a foreign cwd, Iceberg build, CDC incremental — is exercised by
a REAL spark-submit subprocess in tests/test_spark_submit.py.

In local testing the session is created with the defaults from
``get_spark``; under spark-submit the builder inherits the submitted
master/conf. Prints ONE JSON line of build metrics (the driver-side
contract shared with bench.py).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description="Build or refresh a rifflux_spark index")
    ap.add_argument("--pages", required=True, help="parquet path of the crawl pages table")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--incremental", action="store_true", help="diff-apply against the existing index instead of building")
    ap.add_argument("--force", action="store_true", help="destructive rebuild (wipes index-dir; refuses non-index dirs)")
    ap.add_argument("--no-embeddings", action="store_true")
    ap.add_argument(
        "--gc",
        action="store_true",
        help="after the build/apply, reclaim generation dirs the current "
        "manifest snapshot no longer references (run once in-flight "
        "readers of older snapshots are done)",
    )
    ap.add_argument("--embedding-dim", type=int, default=None)
    ap.add_argument("--block-size", type=int, default=None)
    ap.add_argument("--salt-range", type=int, default=None)
    ap.add_argument("--term-buckets", type=int, default=None)
    ap.add_argument("--build-shards", type=int, default=None)
    args = ap.parse_args()

    from rifflux_spark.config import EngineConfig
    from rifflux_spark.session import get_spark

    base = EngineConfig.from_env()
    overrides = {
        k: v
        for k, v in {
            "embedding_dim": args.embedding_dim,
            "block_size": args.block_size,
            "salt_range": args.salt_range,
            "n_term_buckets": args.term_buckets,
            "n_build_shards": args.build_shards,
        }.items()
        if v is not None
    }
    if overrides:
        import dataclasses

        base = dataclasses.replace(base, **overrides)

    spark = get_spark(app_name="rifflux_spark_build")
    # --pages accepts either a parquet directory or an Iceberg table
    # location (detected by version-hint.text) — the north rule's input
    # shape. Iceberg builds read a metadata-planned snapshot; Iceberg
    # incremental runs take the CDC path (only the files appended since
    # the last applied snapshot). Detection is LOCAL-filesystem only: a
    # scheme'd Iceberg location needs a real catalog and must not fall
    # through to spark.read.parquet silently.
    from rifflux_spark.sources.iceberg import is_iceberg_table

    is_iceberg = is_iceberg_table(args.pages)

    if args.incremental:
        from rifflux_spark.sources.tables import IndexStore

        # None = auto-detect the build-time layout; an EXPLICIT
        # --term-buckets that disagrees with the on-disk index errors
        store = IndexStore(spark, args.index_dir, args.term_buckets)
        if is_iceberg:
            from rifflux_spark.plans.incremental import apply_from_iceberg

            metrics = apply_from_iceberg(
                spark, store, args.pages, base,
                with_embeddings=not args.no_embeddings,
            )
        else:
            from rifflux_spark.plans.incremental import apply_incremental

            metrics = apply_incremental(
                spark, store, spark.read.parquet(args.pages), base,
                with_embeddings=not args.no_embeddings,
            )
    else:
        from rifflux_spark.plans.build import build_index

        if is_iceberg:
            # resolve the snapshot FIRST and pin both the read and the
            # CDC cursor to it: an append committed while the build runs
            # must stay AHEAD of the cursor, not vanish behind it
            from rifflux_spark.sources.iceberg import current_snapshot_id, read_iceberg

            build_snapshot = current_snapshot_id(args.pages)
            pages = read_iceberg(spark, args.pages, snapshot_id=build_snapshot)
        else:
            pages = spark.read.parquet(args.pages)
        metrics = build_index(
            spark,
            pages,
            args.index_dir,
            base,
            with_embeddings=not args.no_embeddings,
            force=args.force,
        )
        if is_iceberg:
            from rifflux_spark.plans.incremental import record_iceberg_cursor
            from rifflux_spark.sources.tables import IndexStore

            metrics["iceberg_cursor"] = record_iceberg_cursor(
                IndexStore(spark, args.index_dir), args.pages,
                snapshot_id=build_snapshot,
            )
    if args.gc:
        from rifflux_spark.sources.tables import IndexStore

        metrics["gc"] = IndexStore(spark, args.index_dir).gc()
    print(json.dumps(metrics, default=str))


if __name__ == "__main__":
    main()
