"""Benchmark: index-build throughput + query latency + scaling evidence.

Prints ONE JSON line:
  {"metric": "index_build_sec", "value": <sf-dir build sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": <sf>, "docs_per_sec": ...,
   "scaling": {"n_docs": ..., "cpus_lo": 8, "cpus_hi": 32,
               "build_sec_lo": .., "build_sec_hi": ..,
               "docs_per_sec_lo": .., "docs_per_sec_hi": ..,
               "efficiency": ..}}

Headline build runs on $SPARK_GRAFT_SF_DIR's documents table. Scaling
evidence (north rule: same job at N and 4N parallelism on identical
input) runs the full index build over a deterministic synthetic web-pages
corpus (SPARK_GRAFT_SCALE_DOCS, default 40000) at local[cpus/4] and
local[cpus]; each session performs a small warm-up build first so JIT /
Python-worker spawn-up is excluded from both sides equally.
efficiency = thr_hi / (thr_lo * (cpus_hi/cpus_lo)).

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
SPARK_GRAFT_SCALE_DOCS (0 disables the scaling passes).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from rifflux_spark.config import EngineConfig
from rifflux_spark.plans.build import build_index
from rifflux_spark.service import SearchService
from rifflux_spark.session import get_spark
from rifflux_spark.sources.pages import documents_as_pages, synthetic_pages

REF_QUERIES = [  # reference scripts/benchmark_awesome_copilot.py:26-32
    "custom instructions",
    "agent skills",
    "mcp server",
    "prompt files",
    "vscode settings",
]
CORPUS_QUERIES = ["dup value key", "spark query cache", "merge sort window"]

CONFIG = EngineConfig(
    block_size=128,
    salt_range=1 << 14,
    n_term_buckets=32,
    n_build_shards=2,
    embedding_dim=384,
)


def fresh_session(cpus: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(
        app_name=f"rifflux_bench_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def timed_build(spark, pages, with_embeddings: bool = True) -> tuple[float, str]:
    index_dir = tempfile.mkdtemp(prefix="rifflux_bench_idx_")
    t0 = time.perf_counter()
    build_index(spark, pages, index_dir, CONFIG, with_embeddings=with_embeddings)
    return time.perf_counter() - t0, index_dir


def warmup(spark, cpus: int) -> None:
    """Spawn the full Python-worker fleet and JIT the whole pipeline:
    build a small corpus spread over all ``cpus`` partitions (a limit()
    corpus would collapse to one partition and leave 31 workers cold)."""
    pages = synthetic_pages(spark, 40 * cpus, seed=7, n_partitions=cpus)
    _, d = timed_build(spark, pages)
    shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scale_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "65000"))
    lo_cpus = max(1, cpus // 4)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0

    scaling = None
    corpus_dir = None
    if scale_docs > 0:
        spark = fresh_session(cpus)
        corpus_dir = tempfile.mkdtemp(prefix="rifflux_bench_pages_")
        synthetic_pages(spark, scale_docs, seed=42, n_partitions=cpus).write.mode(
            "overwrite"
        ).parquet(corpus_dir)

        results = {}
        for n in (lo_cpus, cpus):
            spark = fresh_session(n)
            warmup(spark, n)
            pages = spark.read.parquet(corpus_dir)
            sec, d = timed_build(spark, pages)
            shutil.rmtree(d, ignore_errors=True)
            results[n] = sec
        thr_lo = scale_docs / results[lo_cpus]
        thr_hi = scale_docs / results[cpus]
        scaling = {
            "n_docs": scale_docs,
            "cpus_lo": lo_cpus,
            "cpus_hi": cpus,
            "build_sec_lo": round(results[lo_cpus], 3),
            "build_sec_hi": round(results[cpus], 3),
            "docs_per_sec_lo": round(thr_lo, 2),
            "docs_per_sec_hi": round(thr_hi, 2),
            "efficiency": round(thr_hi / (thr_lo * (cpus / lo_cpus)), 4),
        }
        shutil.rmtree(corpus_dir, ignore_errors=True)

    # --- headline: sf-dir corpus build + query latency at full parallelism
    spark = fresh_session(cpus)
    warmup(spark, cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = documents_as_pages(docs)
    n_docs = pages.count()
    hi_sec, index_dir = timed_build(spark, pages)

    from rifflux_spark.sources.tables import IndexStore

    n_chunks = IndexStore(spark, index_dir, CONFIG.n_term_buckets).chunks().count()

    service = SearchService(spark, index_dir, CONFIG)
    service.search("warm up query", top_k=10, mode="lexical")

    query_times: dict[str, float] = {}
    for i, q in enumerate(REF_QUERIES + CORPUS_QUERIES):
        t0 = time.perf_counter()
        service.search(q, top_k=10, mode="lexical")
        query_times[f"lexical_{i}"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    service.search("dup value key", top_k=10, mode="semantic")
    query_times["semantic"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    service.search("dup value key", top_k=10, mode="hybrid")
    query_times["hybrid"] = round(time.perf_counter() - t0, 4)

    shutil.rmtree(index_dir, ignore_errors=True)

    out = {
        "metric": "index_build_sec",
        "value": round(hi_sec, 3),
        "unit": "sec",
        "queries": query_times,
        "sf": sf,
        "n_docs": n_docs,
        "n_chunks": n_chunks,
        "docs_per_sec": round(n_docs / hi_sec, 2),
        "chunks_per_sec": round(n_chunks / hi_sec, 2),
        "scaling": scaling,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
