"""Posting-list construction: tokenize → explode → tf → salted sorted runs
→ delta+varbyte blocks.

Replaces the FTS5 insert-trigger index build (reference
src/rifflux/db/schema.sql:44-59, C internals) with explicit DataFrame
stages (SURVEY.md §2 C3-C5):

1. tokenize ``content`` and ``heading_path`` with the FTS5-parity
   tokenizer (Arrow-batched pandas UDF); doc length ``dl`` = both columns'
   token counts summed — exactly FTS5 bm25's ``D`` with unit weights;
2. ``explode`` to ``(term, doc_ord, dl)`` and ``groupBy(term, doc_ord)``
   for tf — Catalyst plans a partial (map-side) aggregation before the
   shuffle, so the wire carries one row per distinct (term, doc) per task;
3. **skew defeat**: group by ``(term, salt)`` with
   ``salt = doc_ord // salt_range``. A stopword's postings split into
   bounded groups of ≤ salt_range docs; because salt ranges are contiguous
   and disjoint in doc space, each group encodes an independent sorted run
   and runs concatenate in doc order with **no decode-merge stage** —
   ``(salt, block_seq)`` is already the global block order;
4. each group is block-encoded (codec.py) with exact block-max scores.

Nothing here collects to the driver; every stage is a shuffle-bounded
DataFrame op sized by ``salt_range``/``block_size``, independent of corpus
row count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from rifflux_spark.config import EngineConfig
from rifflux_spark.functions.chunker import chunk_rows
from rifflux_spark.functions.tokenizer import tokenize_series
from rifflux_spark.operators.codec import encode_block
from rifflux_spark.sources.tables import POSTINGS_BUCKETED_SCHEMA

CHUNK_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("chunk_id", T.StringType()),
            T.StructField("chunk_index", T.IntegerType()),
            T.StructField("heading_path", T.StringType()),
            T.StructField("content", T.StringType()),
            T.StructField("token_count", T.IntegerType()),
        ]
    )
)


@pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    return tokenize_series(texts)


TOKENS_STRUCT = T.StructType(
    [
        T.StructField("tokens", T.StringType()),
        T.StructField("dl", T.IntegerType()),
    ]
)


@pandas_udf(TOKENS_STRUCT)
def tokenize_pair_udf(content: pd.Series, heading: pd.Series) -> pd.DataFrame:
    """content+heading → (space-joined token stream, combined FTS5 dl).

    One string per row through Arrow instead of a list<string>: tokens
    cannot contain spaces (the tokenizer splits on every non-token char),
    so the join is lossless and the downstream explode stays JVM-side via
    ``F.split`` — parquet/Arrow encode one value per row, not per token.
    """
    ct = tokenize_series(content)
    ht = tokenize_series(heading)
    toks = [c + h for c, h in zip(ct, ht)]
    return pd.DataFrame(
        {"tokens": [" ".join(t) for t in toks], "dl": [len(t) for t in toks]}
    )


def make_chunk_udf(max_chunk_chars: int, min_chunk_chars: int):
    @pandas_udf(CHUNK_STRUCT)
    def chunk_udf(urls: pd.Series, texts: pd.Series) -> pd.Series:
        return chunk_rows(
            urls,
            texts,
            max_chunk_chars=max_chunk_chars,
            min_chunk_chars=min_chunk_chars,
        )

    return chunk_udf


def chunk_pages(pages: DataFrame, config: EngineConfig, keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """pages(url, text, ...) → one row per chunk (no doc_ord yet).

    The chunker UDF is the engine's UDTF surface (SURVEY.md §2.F): pandas
    UDF returning array<struct> + explode. ``keep_cols`` are page-level
    columns carried onto every chunk row (e.g. catalog metadata computed
    in this same pass so the build never re-scans the corpus).
    """
    chunk_udf = make_chunk_udf(config.max_chunk_chars, config.min_chunk_chars)
    keeps = [F.col(c) for c in keep_cols]
    return (
        pages.select("url", *keeps, F.explode(chunk_udf("url", "text")).alias("c"))
        .select(
            "url",
            *keeps,
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.chunk_index").alias("chunk_index"),
            F.col("c.heading_path").alias("heading_path"),
            F.col("c.content").alias("content"),
            F.col("c.token_count").alias("token_count"),
        )
    )


def with_tokens(chunks: DataFrame) -> DataFrame:
    """Add the joined content+heading token stream and FTS5 doc length
    (both columns' token counts summed — exactly FTS5 bm25's ``D`` with
    unit weights)."""
    tk = tokenize_pair_udf(F.col("content"), F.coalesce(F.col("heading_path"), F.lit("")))
    return (
        chunks.withColumn("_tk", tk)
        .withColumn("tokens", F.col("_tk.tokens"))
        .withColumn("dl", F.col("_tk.dl"))
        .drop("_tk")
    )


def explode_terms(tokenized: DataFrame) -> DataFrame:
    """(doc_ord, dl, term) — JVM-side split+explode of the token stream."""
    return tokenized.select(
        "doc_ord",
        "dl",
        F.explode(F.split("tokens", " ")).alias("term"),
    ).filter(F.col("term") != "")


TF_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_ord", T.LongType(), False),
        T.StructField("dl", T.IntegerType(), True),
        T.StructField("tf", T.LongType(), False),
    ]
)


def term_frequencies(tokenized: DataFrame) -> DataFrame:
    """(term, doc_ord, dl, tf) — computed MAP-SIDE with ZERO shuffle.

    tf is a per-DOCUMENT aggregate, and every token of a document sits in
    one row of the staged chunk table — so no exchange is needed at all.
    The former ``explode + groupBy(term, doc_ord)`` implementation
    shuffled the fully-exploded token stream (~dl rows per doc; the
    partial agg only helps within a task) and was the worst-scaling
    stage of the build on a bandwidth-throttled host (2→8 cores: 1.8× of
    the 4× ideal, vs 2.6-3.5× for the map stages — BENCH.md). This
    version is one ``mapInArrow`` pass: Arrow-native split of the token
    stream (no Python string objects), ``dictionary_encode`` as the term
    factorizer (C++ hash), and one np.unique over packed
    (row, term_code) int64 keys for the per-doc counts. dl rides along
    (functionally dependent on doc_ord) so scoring stays join-free."""

    def gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for rb in batches:
            if rb.num_rows == 0:
                continue
            toks = pc.fill_null(rb.column("tokens"), "")
            split = pc.split_pattern(toks, " ")
            lens = pc.list_value_length(split).to_numpy().astype(np.int64)
            flat = pc.list_flatten(split)
            dic = pc.dictionary_encode(flat)
            codes = dic.combine_chunks().indices.to_numpy().astype(np.int64) \
                if isinstance(dic, pa.ChunkedArray) else dic.indices.to_numpy().astype(np.int64)
            vocab = dic.combine_chunks().dictionary if isinstance(dic, pa.ChunkedArray) else dic.dictionary
            n_vocab = len(vocab)
            row_idx = np.repeat(np.arange(rb.num_rows, dtype=np.int64), lens)
            # empty-string tokens (blank streams) are not terms
            empty_mask = pc.equal(vocab, "").to_numpy(zero_copy_only=False)
            empty_code = int(np.flatnonzero(empty_mask)[0]) if empty_mask.any() else -1
            if empty_code >= 0:
                keep = codes != empty_code
                codes, row_idx = codes[keep], row_idx[keep]
            key, counts = np.unique(row_idx * n_vocab + codes, return_counts=True)
            d_i = key // n_vocab
            c_i = key % n_vocab
            doc_ord = rb.column("doc_ord").to_numpy()[d_i]
            dl = rb.column("dl").to_numpy(zero_copy_only=False)[d_i]
            yield pa.RecordBatch.from_arrays(
                [
                    pc.take(vocab, pa.array(c_i)),
                    pa.array(doc_ord, pa.int64()),
                    pa.array(dl, pa.int32()),
                    pa.array(counts.astype(np.int64), pa.int64()),
                ],
                names=["term", "doc_ord", "dl", "tf"],
            )

    return tokenized.select("doc_ord", "dl", "tokens").mapInArrow(gen, schema=TF_SCHEMA)


def encode_postings(tf: DataFrame, config: EngineConfig) -> DataFrame:
    """Salted-run block encoding. Each (term, salt) group holds at most
    ``salt_range`` postings — bounded memory regardless of term skew.

    Physical shape: ONE shuffle keyed on ``(term_bucket, salt_slice)`` +
    sortWithinPartitions(term_bucket, term, salt, doc_ord), so every
    (term, salt) group arrives contiguous and doc-ordered AND the output
    block rows are already clustered+sorted by their ``term_bucket``
    partition value — ``write_postings`` streams them straight into the
    partitioned table with no second shuffle of the encoded bytes (the
    encoded blocks ARE the index payload; re-shuffling them doubled the
    stage's byte traffic). ``salt_slice = salt % n_bucket_splits`` keeps a
    hot term's groups spread over ``n_bucket_splits`` tasks (skew) while
    bounding the table at ≤ buckets × splits files regardless of cluster
    size — a per-(task, bucket) file scheme would write
    O(executors × buckets) files and serialize the commit at 1000
    executors.

    The encode itself is ONE streaming ``mapInPandas`` over the sorted
    partitions: numpy slicing per Arrow batch with a carry for the group a
    batch boundary splits. groupBy().applyInPandas would pay per-group
    pandas/Arrow machinery — with a realistic open vocabulary most groups
    are tiny and that overhead dominated the stage (measured 5-7×); the
    stream encoder pays it once per Arrow batch.
    """
    block_size = config.block_size
    cols = ["term_bucket", "term", "salt", "doc_ord", "tf", "dl"]

    def encode_body(pdf: pd.DataFrame) -> pd.DataFrame:
        terms = pdf["term"].to_numpy()
        buckets = pdf["term_bucket"].to_numpy(dtype=np.int32)
        salts = pdf["salt"].to_numpy(dtype=np.int64)
        docs = pdf["doc_ord"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        change = np.flatnonzero((terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(pdf)]))
        out = {k: [] for k in (
            "term", "salt", "block_seq", "n_docs", "first_doc", "last_doc",
            "gaps", "tfs", "dls", "block_max_tf", "block_min_dl",
            "block_tf_sum", "term_bucket",
        )}
        for s, e in zip(starts, ends):
            for seq, b0 in enumerate(range(s, e, block_size)):
                b1 = min(b0 + block_size, e)
                blk = encode_block(docs[b0:b1], tfs[b0:b1], dls[b0:b1])
                out["term"].append(terms[s])
                out["salt"].append(int(salts[s]))
                out["block_seq"].append(seq)
                out["term_bucket"].append(int(buckets[s]))
                for k in ("n_docs", "first_doc", "last_doc", "gaps", "tfs",
                          "dls", "block_max_tf", "block_min_dl", "block_tf_sum"):
                    out[k].append(blk[k])
        return pd.DataFrame(out)

    def encode_stream(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if pdf.empty:
                carry = None
                continue
            terms = pdf["term"].to_numpy()
            salts = pdf["salt"].to_numpy(dtype=np.int64)
            in_last = (terms == terms[-1]) & (salts == salts[-1])
            # groups are contiguous: the last group's first row is the
            # first True counted from the end
            cut = len(pdf) - int(np.argmin(in_last[::-1])) if not in_last.all() else 0
            carry = pdf.iloc[cut:]
            body = pdf.iloc[:cut]
            if len(body):
                yield encode_body(body)
        if carry is not None and len(carry):
            yield encode_body(carry)

    salted = tf.select(
        F.pmod(F.xxhash64("term"), F.lit(config.n_term_buckets)).cast("int").alias("term_bucket"),
        "term",
        # integer `div`, not double division: doc ordinals are sparse
        # (pid·2⁴⁰ + i) and a double mantissa loses exactness past 2⁵³
        F.expr(f"doc_ord div {int(config.salt_range)}").alias("salt"),
        "doc_ord",
        "tf",
        "dl",
    ).withColumn(
        # hash-mix the salt before slicing: with sparse ordinals
        # (pid·2⁴⁰ + i) the salts are pid·2²⁶ + j, and a plain
        # `salt % k` is ≡ 0 for every row when k divides 2²⁶ — the
        # shuffle key would collapse to the bucket alone (measured:
        # bucket-collision stragglers halved one shard's scaling)
        "salt_slice",
        F.pmod(F.xxhash64("salt"), F.lit(int(config.n_bucket_splits))),
    )
    parted = salted.repartition("term_bucket", "salt_slice").sortWithinPartitions(
        "term_bucket", "term", "salt", "doc_ord"
    )
    return parted.select(*cols).mapInPandas(encode_stream, schema=POSTINGS_BUCKETED_SCHEMA)


def term_stats(tf: DataFrame) -> DataFrame:
    """(term, df_docs, cf) — document and collection frequency per term."""
    return tf.groupBy("term").agg(
        F.count("*").alias("df_docs"), F.sum("tf").alias("cf")
    )


def term_stats_from_blocks(blocks: DataFrame) -> DataFrame:
    """(term, df_docs, cf) aggregated from encoded block METADATA
    (``n_docs``/``block_tf_sum`` per block row) instead of the tf table:
    at block_size=128 that is ~128× fewer rows, so the build's stats
    stage is a metadata aggregation rather than a third full pass over
    the corpus-sized tf frame. Identical values by construction — each
    (term, doc) pair lands in exactly one block."""
    return blocks.groupBy("term").agg(
        F.sum("n_docs").cast("long").alias("df_docs"),
        F.sum("block_tf_sum").cast("long").alias("cf"),
    )


def corpus_stats(tokenized_chunks: DataFrame) -> DataFrame:
    """Single-row (n_docs, total_tokens, avgdl) — FTS5's internal stats."""
    return tokenized_chunks.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
