"""Query CLI over a built index — the reference's `rifflux-query` analog
(reference src/rifflux/cli.py:34-47, query_main:65-75): positional query,
--mode lexical|semantic|hybrid, --top-k, plus the index/pages locations
the Spark engine needs. Prints one JSON document with the result rows
(chunk_id, path, heading_path, scores per mode's score_breakdown).

    python scripts/search.py "custom instructions" \
        --index-dir /path/to/index --mode hybrid --top-k 10

Runs on a local session by default; under spark-submit it inherits the
submitted master/conf like scripts/submit_build.py.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description="Search a rifflux_spark index")
    ap.add_argument("query", help="Search text")
    ap.add_argument("--mode", choices=["lexical", "semantic", "hybrid"], default="hybrid")
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--engine", choices=["auto", "local", "spark"], default="auto",
                    help="auto routes selective queries to the coordinator path")
    ap.add_argument("--pages", default=None,
                    help="crawl pages parquet; enables auto-reindex-on-search if configured")
    args = ap.parse_args()

    from rifflux_spark.config import EngineConfig
    from rifflux_spark.service import SearchService
    from rifflux_spark.session import get_spark, install_shutdown_hook

    spark = get_spark(app_name="rifflux_spark_query")
    spark.sparkContext.setLogLevel("ERROR")
    install_shutdown_hook(spark)
    cfg = EngineConfig.from_env()
    svc = SearchService(spark, args.index_dir, cfg, pages_path=args.pages)
    if args.mode == "lexical" and args.engine != "auto":
        rows = svc.lexical(args.query, args.top_k, engine=args.engine)
        rows = [{**r, "score_breakdown": {"bm25": r["bm25_score"]}} for r in rows]
    else:
        rows = svc.search(args.query, top_k=args.top_k, mode=args.mode)
    print(json.dumps({"query": args.query, "mode": args.mode, "results": rows}, default=str))


if __name__ == "__main__":
    main()
