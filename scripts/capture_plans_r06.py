"""Capture .explain('formatted') output for the round-6 plan artifacts
(plans/r06/<name>_{before,after}.txt). The 'after' files come from the
current tree; 'before' files were captured at the round-start commit
where a plan actually changed (for pure Python-kernel changes the plan
is identical and only the 'after' file is committed, with the identity
noted in OPTIMIZATION_r06.md).

Usage: python scripts/capture_plans_r06.py <suffix> [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from rifflux_spark.session import get_spark  # noqa: E402

NAMES = [
    "bm25_common",
    "bm25_rare",
    "minhash_lsh",
    "dedup_clusters",
    "semantic_topk",
    "gopher_quality",
    "posting_list",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)
    qs = entrymod.queries()
    for name in NAMES:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue(), encoding="utf-8")
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
