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

# Map-side packed postings: ONE row per (term, salt, source-batch) with
# the postings as little-endian binary arrays (doc offsets within the
# salt range as u4, tf/dl as u2 — validated). ~8 bytes/posting through
# the encode shuffle instead of a ~64-byte UnsafeRow per posting: the
# encode exchange is the build's ONLY shuffle, and on a
# bandwidth-throttled host its byte volume IS the scaling ceiling.
PACKED_TF_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("salt", T.LongType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("tf_sum", T.LongType(), False),
        T.StructField("doc_offs", T.BinaryType(), False),  # u4 LE
        T.StructField("tfs", T.BinaryType(), False),  # u2 LE
        T.StructField("dls", T.BinaryType(), False),  # u2 LE
    ]
)

_U2_MAX = (1 << 16) - 1


def _pack_groups(codes, docs, tfs, dls, vocab, salt_range: int):
    """Vectorized packing of (term-code, doc, tf, dl) arrays into
    PACKED_TF_SCHEMA arrow arrays. Input need not be sorted."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if codes.size == 0:
        # a batch whose chunks all tokenize to nothing (e.g. an
        # incremental micro-batch of punctuation-only docs) yields zero
        # postings, not an IndexError from c_s[[0]] on an empty array
        return [
            pc.take(vocab, pa.array(np.array([], np.int64))),
            pa.array([], pa.int64()),
            pa.array([], pa.int64()),
            pa.array([], pa.int32()),
            pa.array([], pa.int64()),
            pa.array([], pa.binary()),
            pa.array([], pa.binary()),
            pa.array([], pa.binary()),
        ]
    salts = docs // salt_range
    perm = np.lexsort((docs, salts, codes))
    c_s, d_s, t_s, dl_s, salt_s = codes[perm], docs[perm], tfs[perm], dls[perm], salts[perm]
    if t_s.size and (int(t_s.max()) > _U2_MAX or int(dl_s.max()) > _U2_MAX):
        raise ValueError(
            "packed postings require tf and dl < 65536 per chunk — "
            "max_chunk_chars is far beyond any sane configuration"
        )
    change = np.flatnonzero((c_s[1:] != c_s[:-1]) | (salt_s[1:] != salt_s[:-1])) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(c_s)]))
    offs_b = (d_s - salt_s * salt_range).astype("<u4").tobytes()
    tfs_b = t_s.astype("<u2").tobytes()
    dls_b = dl_s.astype("<u2").tobytes()
    return [
        pc.take(vocab, pa.array(c_s[starts])),
        pa.array(salt_s[starts], pa.int64()),
        pa.array(d_s[starts], pa.int64()),
        pa.array((ends - starts).astype(np.int32), pa.int32()),
        pa.array(np.add.reduceat(t_s, starts) if len(c_s) else np.array([], np.int64), pa.int64()),
        pa.array([offs_b[4 * s : 4 * e] for s, e in zip(starts, ends)], pa.binary()),
        pa.array([tfs_b[2 * s : 2 * e] for s, e in zip(starts, ends)], pa.binary()),
        pa.array([dls_b[2 * s : 2 * e] for s, e in zip(starts, ends)], pa.binary()),
    ]


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
            c_i, doc_ord, dl, counts, vocab = _tf_arrays(rb)
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


def _tf_arrays(rb):
    """Per-batch tf kernel: (term_code, doc_ord, dl, tf, vocab) arrays.
    Arrow-native token split + dictionary_encode, one np.unique over
    packed (row, code) int64 keys."""
    import pyarrow as pa
    import pyarrow.compute as pc

    toks = pc.fill_null(rb.column("tokens"), "")
    split = pc.split_pattern(toks, " ")
    lens = pc.list_value_length(split).to_numpy().astype(np.int64)
    flat = pc.list_flatten(split)
    dic = pc.dictionary_encode(flat)
    if isinstance(dic, pa.ChunkedArray):
        dic = dic.combine_chunks()
    codes = dic.indices.to_numpy().astype(np.int64)
    vocab = dic.dictionary
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
    return c_i, doc_ord, dl, counts, vocab


def packed_term_frequencies(tokenized: DataFrame, config: EngineConfig) -> DataFrame:
    """Map-side tf packed into per-(term, salt, batch) binary arrays
    (PACKED_TF_SCHEMA) — same kernel as :func:`term_frequencies`, but
    the output ships ~8 bytes/posting instead of one row/posting. Packs
    from different batches/partitions cover pairwise doc-disjoint ranges
    (batches are consecutive rows of the doc_ord-sorted chunk table), so
    the encoder just orders packs by ``first_doc`` and concatenates —
    and verifies sortedness, so arbitrary inputs stay correct."""
    salt_range = int(config.salt_range)

    def gen(batches):
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            c_i, doc_ord, dl, counts, vocab = _tf_arrays(rb)
            arrays = _pack_groups(
                c_i, doc_ord.astype(np.int64), counts.astype(np.int64),
                dl.astype(np.int64), vocab, salt_range,
            )
            yield pa.RecordBatch.from_arrays(arrays, names=[f.name for f in PACKED_TF_SCHEMA.fields])

    return tokenized.select("doc_ord", "dl", "tokens").mapInArrow(gen, schema=PACKED_TF_SCHEMA)


def pack_tf(tf: DataFrame, config: EngineConfig) -> DataFrame:
    """Pack a THIN (term, doc_ord, dl, tf) frame into PACKED_TF_SCHEMA
    (batch-local groups; any row order). Lets hand-built tf frames and
    the incremental delta path share the packed encoder."""
    salt_range = int(config.salt_range)

    def gen(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for rb in batches:
            if rb.num_rows == 0:
                continue
            dic = pc.dictionary_encode(rb.column("term"))
            if isinstance(dic, pa.ChunkedArray):
                dic = dic.combine_chunks()
            arrays = _pack_groups(
                dic.indices.to_numpy().astype(np.int64),
                rb.column("doc_ord").to_numpy().astype(np.int64),
                rb.column("tf").to_numpy().astype(np.int64),
                rb.column("dl").to_numpy(zero_copy_only=False).astype(np.int64),
                dic.dictionary,
                salt_range,
            )
            yield pa.RecordBatch.from_arrays(arrays, names=[f.name for f in PACKED_TF_SCHEMA.fields])

    return tf.select("term", "doc_ord", "dl", "tf").mapInArrow(gen, schema=PACKED_TF_SCHEMA)


def encode_postings(tf: DataFrame, config: EngineConfig) -> DataFrame:
    """Salted-run block encoding over PACKED postings. Each (term, salt)
    group holds at most ``salt_range`` postings — bounded memory
    regardless of term skew. Accepts a thin (term, doc_ord, dl, tf)
    frame too (packed on the fly via :func:`pack_tf`).

    Physical shape: ONE shuffle keyed on ``(term_bucket, salt_slice)``
    carrying PACKS (~8 bytes/posting as binary arrays instead of a
    ~64-byte row/posting — the exchange is the build's only shuffle and
    its byte volume is the scaling ceiling on bandwidth-bound hosts) +
    sortWithinPartitions(term_bucket, term, salt, first_doc), so every
    (term, salt) group's packs arrive contiguous in doc-range order AND
    the output block rows are already clustered+sorted by their
    ``term_bucket`` partition value — ``write_postings`` streams them
    straight into the partitioned table with no second shuffle of the
    encoded bytes. ``salt_slice = pmod(xxhash64(salt), n_bucket_splits)``
    keeps a hot term's groups spread over ``n_bucket_splits`` tasks
    (skew) while bounding the table at ≤ buckets × splits files
    regardless of cluster size. (The hash-mix matters: with sparse
    ordinals (pid·2⁴⁰ + i) the salts are pid·2²⁶ + j and a plain
    ``salt % k`` collapses to 0 — measured straggler pathology.)

    The encode is ONE streaming ``mapInPandas`` over the sorted
    partitions: per (term, salt) group the packs' offset arrays are
    unpacked, concatenated (packs cover disjoint doc ranges; sortedness
    is verified and repaired if an arbitrary input violates it) and cut
    into ``block_size`` blocks.
    """
    if "doc_ord" in tf.columns:
        tf = pack_tf(tf, config)
    block_size = config.block_size
    salt_range = int(config.salt_range)
    cols = ["term_bucket", "term", "salt", "first_doc", "doc_offs", "tfs", "dls"]

    def encode_body(pdf: pd.DataFrame) -> pd.DataFrame:
        # ONE vectorized pass over every (term, salt) group in the body
        # (the old per-group loop paid ~15 µs of fixed numpy cost per
        # encode_varbyte call × 3 calls × every block — the dominant
        # per-task cost of the encode stage). Byte-identical output:
        # LEB128 is per-value independent, so the three global encodes
        # slice into exactly the per-block streams encode_block built.
        terms = pdf["term"].to_numpy()
        buckets = pdf["term_bucket"].to_numpy(dtype=np.int32)
        salts = pdf["salt"].to_numpy(dtype=np.int64)
        change = np.flatnonzero((terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])) + 1
        g_pack_starts = np.concatenate(([0], change))
        offs_col = pdf["doc_offs"].tolist()
        n_per_pack = np.fromiter((len(x) for x in offs_col), dtype=np.int64, count=len(offs_col)) // 4
        pack_offs = np.zeros(len(offs_col) + 1, dtype=np.int64)
        np.cumsum(n_per_pack, out=pack_offs[1:])
        total = int(pack_offs[-1])
        # posting-level group boundaries
        pg_starts = pack_offs[g_pack_starts]
        pg_ends = np.append(pg_starts[1:], total)
        offs_all = np.frombuffer(b"".join(offs_col), dtype="<u4").astype(np.int64)
        tfs_all = np.frombuffer(b"".join(pdf["tfs"].tolist()), dtype="<u2").astype(np.int64)
        dls_all = np.frombuffer(b"".join(pdf["dls"].tolist()), dtype="<u2").astype(np.int64)
        docs_all = np.repeat(salts, n_per_pack) * salt_range + offs_all
        # sortedness within groups (packs cover disjoint doc ranges in
        # first_doc order, so this holds on the build path; repair the
        # rare arbitrary-input group like the old per-group code did)
        gaps = np.empty_like(docs_all)
        if docs_all.size:
            gaps[0] = 0
            np.subtract(docs_all[1:], docs_all[:-1], out=gaps[1:])
        gaps[pg_starts] = 0
        interior = np.ones(docs_all.size, dtype=bool)
        interior[pg_starts] = False
        if docs_all.size and not np.all(gaps[interior] > 0):
            bad_pos = np.flatnonzero(interior & (gaps <= 0))
            bad_groups = np.unique(np.searchsorted(pg_starts, bad_pos, side="right") - 1)
            for gi in bad_groups:
                s, e = pg_starts[gi], pg_ends[gi]
                order = np.argsort(docs_all[s:e], kind="stable")
                docs_all[s:e] = docs_all[s:e][order]
                tfs_all[s:e] = tfs_all[s:e][order]
                dls_all[s:e] = dls_all[s:e][order]
            if docs_all.size:
                gaps[0] = 0
                np.subtract(docs_all[1:], docs_all[:-1], out=gaps[1:])
            gaps[pg_starts] = 0
        # block tiling: groups cut into block_size runs, contiguous over
        # the whole posting array
        n_group = pg_ends - pg_starts
        nblocks = (n_group + block_size - 1) // block_size
        grp_of_block = np.repeat(np.arange(len(pg_starts), dtype=np.int64), nblocks)
        blk_offs = np.zeros(len(pg_starts) + 1, dtype=np.int64)
        np.cumsum(nblocks, out=blk_offs[1:])
        n_blocks_total = int(blk_offs[-1])
        seq = np.arange(n_blocks_total, dtype=np.int64) - np.repeat(blk_offs[:-1], nblocks)
        b_starts = pg_starts[grp_of_block] + seq * block_size
        b_ends = np.minimum(b_starts + block_size, pg_ends[grp_of_block])
        gaps[b_starts] = 0
        nonstart = np.ones(docs_all.size, dtype=bool)
        nonstart[b_starts] = False
        if docs_all.size and not np.all(gaps[nonstart] > 0):
            raise ValueError("doc_ords must be strictly increasing within a block")
        from rifflux_spark.operators.codec import encode_varbyte_segments

        g_idx = g_pack_starts[grp_of_block]
        return pd.DataFrame(
            {
                "term": terms[g_idx],
                "salt": salts[g_idx],
                "block_seq": seq,
                "n_docs": b_ends - b_starts,
                "first_doc": docs_all[b_starts] if docs_all.size else docs_all,
                "last_doc": docs_all[b_ends - 1] if docs_all.size else docs_all,
                "gaps": encode_varbyte_segments(gaps, b_starts),
                "tfs": encode_varbyte_segments(tfs_all, b_starts),
                "dls": encode_varbyte_segments(dls_all, b_starts),
                "block_max_tf": np.maximum.reduceat(tfs_all, b_starts) if docs_all.size else tfs_all,
                "block_min_dl": np.minimum.reduceat(dls_all, b_starts) if docs_all.size else dls_all,
                "block_tf_sum": np.add.reduceat(tfs_all, b_starts) if docs_all.size else tfs_all,
                "term_bucket": buckets[g_idx],
            }
        )

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

    salted = tf.withColumn(
        "term_bucket",
        F.pmod(F.xxhash64("term"), F.lit(config.n_term_buckets)).cast("int"),
    ).withColumn(
        "salt_slice",
        F.pmod(F.xxhash64("salt"), F.lit(int(config.n_bucket_splits))),
    )
    parted = salted.repartition("term_bucket", "salt_slice").sortWithinPartitions(
        "term_bucket", "term", "salt", "first_doc"
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


def term_stats_from_block_files(files) -> "object":
    """Arrow twin of :func:`term_stats_from_blocks` for metadata-sized
    posting tables: column-pruned footer-to-groupby on the driver, no
    Spark job (the build uses it below ``driver_agg_max_bytes``; the
    distributed plan above is unchanged). Returns an Arrow table with
    columns (term, df_docs, cf) — identical values by construction."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = ["term", "n_docs", "block_tf_sum"]
    parts = [pq.read_table(f, columns=cols) for f in files]
    blocks = (
        pa.concat_tables(parts)
        if parts
        else pa.table(
            {"term": pa.array([], pa.string()),
             "n_docs": pa.array([], pa.int32()),
             "block_tf_sum": pa.array([], pa.int64())}
        )
    )
    agg = blocks.group_by("term").aggregate(
        [("n_docs", "sum"), ("block_tf_sum", "sum")]
    )
    return agg.rename_columns(["term", "df_docs", "cf"])


def corpus_stats(tokenized_chunks: DataFrame) -> DataFrame:
    """Single-row (n_docs, total_tokens, avgdl) — FTS5's internal stats."""
    return tokenized_chunks.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
