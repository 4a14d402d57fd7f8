"""spark-submit entry point for the full index build.

Cluster usage (the north-rule packaging):

    python -c "from rifflux_spark.session import package_zip; print(package_zip())"
    spark-submit --master <cluster> --py-files /tmp/rifflux_spark_pyfiles.zip \
        scripts/build_job.py --pages <iceberg-table-or-parquet-path> \
        --index-dir <output-root> [--no-embeddings] [--build-id <id>]

Sandbox smoke (local master is the default when none is configured):

    python scripts/build_job.py --synthetic 5000 --index-dir /tmp/idx

The job is resumable: re-submitting with the same --index-dir and
--build-id skips lineage-completed stages (plans/build.py). Exit code 0
only after every stage committed; metrics (rows/bytes per stage) land in
<index-dir>/lineage/ and are printed as JSON on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from rifflux_spark.config import EngineConfig
from rifflux_spark.plans.build import build_index
from rifflux_spark.session import get_spark
from rifflux_spark.sources.pages import synthetic_pages


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="parquet path (or Iceberg table via spark.read.table) of web pages")
    src.add_argument("--synthetic", type=int, help="generate N deterministic synthetic pages instead")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--build-id", default=None)
    ap.add_argument("--no-embeddings", action="store_true")
    ap.add_argument("--master", default=None, help="override master (default: whatever spark-submit set)")
    args = ap.parse_args()

    config = EngineConfig.from_env()
    spark = get_spark(app_name="rifflux_build", master=args.master)
    if args.synthetic:
        pages = synthetic_pages(spark, args.synthetic, seed=42)
    elif args.pages.startswith("table:"):
        pages = spark.read.table(args.pages[len("table:"):])
    else:
        pages = spark.read.parquet(args.pages)

    metrics = build_index(
        spark,
        pages,
        args.index_dir,
        config,
        build_id=args.build_id,
        with_embeddings=not args.no_embeddings,
    )
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
