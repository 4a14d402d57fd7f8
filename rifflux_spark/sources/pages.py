"""Deterministic synthetic Common-Crawl-style web-pages corpus.

Produces exactly the BASELINE input_hint shape:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Text is markdown-shaped (ATX headings, paragraphs, fenced code blocks) so
the chunker yields multiple chunks per page with non-empty heading
breadcrumbs (FIXTURES.md §1). Vocabulary is Zipf-distributed with
stopword-like high-frequency terms ("the", "data", ...) to exercise the
posting-skew/salting path, and content is fully determined by
``(seed, doc index)`` — no external data, stable across runs and
parallelism levels.

Generation is distributed: ``spark.range(n)`` + an Arrow-batched pandas
UDF deriving each page from its index (no driver-side materialization),
so the same generator scales to any corpus size.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_VOCAB = [
    # Zipf head: stopword-like skew drivers
    "the", "and", "data", "system", "query", "index",
    # topical mid-frequency
    "cache", "ttl", "policy", "eviction", "redis", "protocol", "server",
    "tool", "description", "custom", "instructions", "agent", "skills",
    "mcp", "prompt", "files", "vscode", "settings", "search", "ranking",
    "posting", "block", "shuffle", "partition", "broadcast", "executor",
    "spark", "parquet", "iceberg", "stream", "batch", "vector", "cosine",
    # tail
    "quorum", "lattice", "manifest", "gossip", "compaction", "tombstone",
    "lineage", "checkpoint", "varbyte", "delta", "fusion", "hybrid",
    "semantic", "lexical", "crawler", "warc", "snapshot", "fingerprint",
    "entropy", "throughput", "latency", "backpressure", "watermark",
]
_LANGS = ["en", "en", "en", "fr", "es", "de", "zh"]

# Heavy Zipf tail: real web vocab is open-ended, so document frequency
# must FALL as the corpus grows — with only the head words, every term
# converges to df≈100% at ~10^6 docs and every query degenerates to the
# worst-case stopword path. 4000 tail words under the same 1/(r+3) law
# give realistic mid/low-df terms at every corpus size.
_FULL_VOCAB = _VOCAB + [f"w{i:04d}" for i in range(4000)]
_CUM_WEIGHTS: list[float] = []
_acc = 0.0
for _r in range(len(_FULL_VOCAB)):
    _acc += 1.0 / (_r + 3)
    _CUM_WEIGHTS.append(_acc)


def _zipf_word(rng: random.Random) -> str:
    # Zipf: rank r with p ∝ 1/(r+3), O(log V) per draw via cum weights
    return rng.choices(_FULL_VOCAB, cum_weights=_CUM_WEIGHTS, k=1)[0]


def _sentence(rng: random.Random, lo: int = 6, hi: int = 14) -> str:
    return " ".join(_zipf_word(rng) for _ in range(rng.randint(lo, hi)))


def make_page_text(doc_idx: int, seed: int = 42, page_scale: int = 1) -> str:
    """Markdown body for page ``doc_idx`` — pure function of (seed, idx).

    ``page_scale`` multiplies the section count: 1 ≈ 1.5 KB toy pages for
    unit tests, 4-8 ≈ 6-12 KB — the realistic Common-Crawl text size the
    scaling bench uses so per-page UDF compute dominates per-row framing
    overhead, as it does on real pages."""
    rng = random.Random((seed << 32) ^ doc_idx)
    parts: list[str] = []
    n_sections = rng.randint(2, 4) * page_scale
    parts.append(f"# {_sentence(rng, 2, 4).title()}")
    parts.append("")
    parts.append(_sentence(rng, 25, 60) + ".")
    for s in range(n_sections):
        level = "##" if s % 2 == 0 else "###"
        parts.append("")
        parts.append(f"{level} {_sentence(rng, 2, 3).title()}")
        parts.append("")
        for _ in range(rng.randint(1, 3)):
            parts.append(_sentence(rng, 25, 60) + ".")
            parts.append("")
        if rng.random() < 0.5:
            lang = rng.choice(["python", "sql", ""])
            code = "\n".join(
                f"{_zipf_word(rng)} = {_zipf_word(rng)}({rng.randint(0, 99)})"
                for _ in range(rng.randint(2, 4))
            )
            parts.append(f"```{lang}\n{code}\n```")
            parts.append("")
    return "\n".join(parts).strip() + "\n"


_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def synthetic_pages(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    n_partitions: int | None = None,
    page_scale: int = 1,
) -> DataFrame:
    """Distributed generator: every page derived from its index."""
    base_ts = dt.datetime(2026, 1, 1)

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            rows = []
            for i in idx:
                i = int(i)
                text = make_page_text(i, seed, page_scale)
                rng = random.Random((seed << 33) ^ i)
                rows.append(
                    {
                        "url": f"https://site{i % 997:03d}.example.com/page/{i:08d}",
                        "warc_ts": base_ts + dt.timedelta(seconds=i % 86400),
                        "html": f"<html><body>{text}</body></html>".encode(),
                        "text": text,
                        "lang": rng.choice(_LANGS),
                    }
                )
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    rng_df = spark.range(0, n_docs, numPartitions=n_partitions)
    return rng_df.mapInPandas(gen, schema=_PAGE_SCHEMA)


def documents_as_pages(documents: DataFrame) -> DataFrame:
    """Adapt the driver testdata ``documents`` table (TESTDATA.md) to the
    pages shape: doc_id/source become the url, text passes through."""
    return documents.select(
        F.concat(F.lit("testdata://"), F.col("source"), F.lit("/"), F.format_string("%06d", F.col("doc_id"))).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
