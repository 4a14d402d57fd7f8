"""Per-stage scaling profile: run the identical index build at two
parallelism levels and print stage_sec for each, to locate flat
(non-scaling) time. Usage: python scripts/profile_scaling.py [n_docs]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import CONFIG, fresh_session, warmup
from rifflux_spark.plans.build import build_index
from rifflux_spark.sources.pages import synthetic_pages


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 65000
    levels = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["8", "32"])]

    spark = fresh_session(32)
    corpus_dir = tempfile.mkdtemp(prefix="rifflux_prof_pages_")
    synthetic_pages(spark, n_docs, seed=42, n_partitions=32).write.mode("overwrite").parquet(corpus_dir)
    csize = sum(f.stat().st_size for f in Path(corpus_dir).rglob("*") if f.is_file())
    print(f"corpus: {n_docs} docs, {csize/1e6:.1f} MB", flush=True)

    for n in levels:
        spark = fresh_session(n)
        warmup(spark, n)
        pages = spark.read.parquet(corpus_dir)
        index_dir = tempfile.mkdtemp(prefix="rifflux_prof_idx_")
        t0 = time.perf_counter()
        m = build_index(spark, pages, index_dir, CONFIG)
        total = time.perf_counter() - t0
        isize = sum(f.stat().st_size for f in Path(index_dir).rglob("*") if f.is_file())
        print(
            json.dumps(
                {
                    "cpus": n,
                    "total_sec": round(total, 2),
                    "docs_per_sec": round(n_docs / total, 1),
                    "index_mb": round(isize / 1e6, 1),
                    "stage_sec": m["stage_sec"],
                }
            ),
            flush=True,
        )
        shutil.rmtree(index_dir, ignore_errors=True)

    shutil.rmtree(corpus_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
