"""Adaptive driver-side metadata aggregations (build term_stats /
catalog): below ``driver_agg_max_bytes`` the build runs these groupbys
on the driver via Arrow (no Spark job — the fixed ~1s scheduler cost is
a pure serial fraction that caps strong scaling); the Arrow path must be
value- AND schema-identical to the distributed plan, which still runs
above the threshold."""

from __future__ import annotations

import dataclasses

from rifflux_spark.config import EngineConfig
from rifflux_spark.plans.build import build_index
from rifflux_spark.sources.pages import synthetic_pages
from rifflux_spark.sources.tables import IndexStore

CONFIG = EngineConfig(
    block_size=16, salt_range=64, n_term_buckets=8, n_build_shards=2, embedding_dim=32
)


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_driver_agg_paths_match_spark(spark, tmp_path_factory) -> None:
    pages = synthetic_pages(spark, 40, seed=9)
    arrow_dir = str(tmp_path_factory.mktemp("arrow_idx"))
    spark_dir = str(tmp_path_factory.mktemp("spark_idx"))
    # default threshold: a 40-page corpus takes the Arrow path
    build_index(spark, pages, arrow_dir, CONFIG, with_embeddings=False)
    # threshold 0: force the distributed plan on the same corpus
    forced = dataclasses.replace(CONFIG, driver_agg_max_bytes=0)
    build_index(spark, pages, spark_dir, forced, with_embeddings=False)

    a = IndexStore(spark, arrow_dir, CONFIG.n_term_buckets)
    s = IndexStore(spark, spark_dir, CONFIG.n_term_buckets)

    tcols = ["term", "df_docs", "cf", "term_bucket"]
    assert a.term_stats().schema == s.term_stats().schema
    assert _rows(a.term_stats(), tcols) == _rows(s.term_stats(), tcols)

    ccols = ["url", "warc_ts", "size_bytes", "sha256", "n_chunks"]
    assert a.catalog().schema == s.catalog().schema
    assert _rows(a.catalog(), ccols) == _rows(s.catalog(), ccols)

    # corpus stats derive from term_stats.cf either way
    assert a.corpus_stats() == s.corpus_stats()


def test_column_bytes_footer_only(spark, tmp_path_factory) -> None:
    pages = synthetic_pages(spark, 10, seed=4)
    d = str(tmp_path_factory.mktemp("cb_idx"))
    build_index(spark, pages, d, CONFIG, with_embeddings=False)
    store = IndexStore(spark, d, CONFIG.n_term_buckets)
    got = store.column_bytes("chunks", ["url", "size_bytes"])
    assert got is not None and got > 0
    # pruned columns must cost less than the whole table
    full = store.column_bytes(
        "chunks", ["url", "size_bytes", "content", "tokens", "page_sha256"]
    )
    assert full is not None and got < full
    # a missing column means "can't decide" -> fall back to Spark
    assert store.column_bytes("chunks", ["url", "nope"]) is None
    assert store.column_bytes("no_such_table", ["url"]) is None
