"""Focused optimization benchmarks (guide §1: measure first).

NOT the driver artifact — bench.py stays the frozen record. This file
isolates the same operations bench.py times (headline sf build, query
latencies, curation pass, stress probes) with per-stage breakdowns so
each optimization's before/after is attributable. Numbers from here are
cited in OPTIMIZATION_r06.md.

Usage: python bench_extra.py <headline|curation|stress> [extra args]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as bench.py).
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

import bench  # reuse the frozen harness's session/corpus/config helpers
from bench import CONFIG, CORPUS_QUERIES, REF_QUERIES, fresh_session, timed_build, warmup, work_dir
from rifflux_spark.service import SearchService
from rifflux_spark.sources.pages import documents_as_pages, synthetic_pages


def headline(reps: int = 3) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = fresh_session(cpus)
    warmup(spark, cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = documents_as_pages(docs)
    builds = []
    stage_secs = []
    index_dir = None
    for _ in range(reps):
        if index_dir:
            shutil.rmtree(index_dir, ignore_errors=True)
        sec, index_dir, stages = timed_build(spark, pages)
        builds.append(round(sec, 3))
        stage_secs.append(stages)
    print(json.dumps({"build_secs": builds, "stage_sec": stage_secs[builds.index(min(builds))], "stage_sec_all": stage_secs}))

    service = SearchService(spark, index_dir, CONFIG)
    service.search("warm up query", top_k=10, mode="hybrid")
    qt: dict[str, list[float]] = {}
    for _ in range(reps):
        for i, q in enumerate(REF_QUERIES + CORPUS_QUERIES):
            t0 = time.perf_counter()
            service.search(q, top_k=10, mode="lexical")
            qt.setdefault(f"lexical_{i}", []).append(round(time.perf_counter() - t0, 4))
        for mode, q in (
            ("semantic", "dup value key"),
            ("hybrid", "dup value key"),
            ("phrase", "dup value"),
            ("fts", "dup OR val* NOT key"),
        ):
            t0 = time.perf_counter()
            service.search(q, top_k=10, mode=mode)
            qt.setdefault(mode, []).append(round(time.perf_counter() - t0, 4))
    print(json.dumps({k: {"min": min(v), "all": v} for k, v in qt.items()}))
    shutil.rmtree(index_dir, ignore_errors=True)


def curation(reps: int = 3) -> None:
    from pyspark.sql import functions as F

    from rifflux_spark.functions.text_analysis import gopher_quality_flags

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = fresh_session(cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()  # warm the scan
    secs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        flags = gopher_quality_flags(F.col("text"))
        deduped = (
            docs.filter(flags["pass_all"])
            .groupBy(F.md5("text").alias("h"))
            .agg(F.min(F.struct("doc_id", "source", "n_chars")).alias("s"))
            .select("s.source", "s.n_chars")
        )
        kept = deduped.groupBy("source").agg(
            F.count("*").alias("n_kept"), F.sum("n_chars").alias("kept_chars")
        )
        n_kept = sum(r["n_kept"] for r in kept.collect())
        secs.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"curation_secs": secs, "n_kept": n_kept}))


def stress(n_docs: int = 50000) -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = fresh_session(cpus)
    warmup(spark, cpus)
    out = bench.run_stress(spark, n_docs, 4, cpus)
    print(json.dumps(out))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "headline"
    arg = int(sys.argv[2]) if len(sys.argv) > 2 else None
    if mode == "headline":
        headline(arg or 3)
    elif mode == "curation":
        curation(arg or 3)
    elif mode == "stress":
        stress(arg or 50000)
    else:
        raise SystemExit(f"unknown mode {mode}")
