"""Per-entry wall-clock timing of every ``queries()`` registry entry
(guide §1: measure first). NOT a driver artifact — optimization-round
instrumentation whose numbers are cited in OPTIMIZATION_r06.md.

Each entry is run once to warm (index builds, Python workers, codegen)
and then ``reps`` times; the min is reported (steady state — the same
min-of-N rationale as bench.py's stress probes). Timing includes the
driver-side ``collect()`` because that is exactly what the correctness
gate pays per entry.

Usage: python scripts/time_queries.py [sf_dir] [reps] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from rifflux_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    only = set(sys.argv[3:])
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"warm:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        warm = time.perf_counter() - t0
        best = float("inf")
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"time:{name}:{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
        print(f"  {name}: {best:.4f}s (warm {warm:.2f}s)", file=sys.stderr)
    print(json.dumps(dict(sorted(out.items(), key=lambda kv: -kv[1]))))


if __name__ == "__main__":
    main()
