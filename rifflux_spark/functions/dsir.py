"""DSIR — Data Selection via Importance Resampling (hashed n-gram
importance weights).

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling", arXiv:2302.03169) select pretraining documents by the
log-importance weight ``log p_target(x) / p_raw(x)`` under two hashed
bag-of-n-grams unigram models: one fit on a small trusted target corpus
(Wikipedia/books), one on the raw crawl. The reference engine
(/root/reference — a single-node fulltext index) has no analog; a 100 TB
training-data pipeline built on this engine needs the selection pass, so
it ships as a first-class operator next to the CCNet perplexity scorer
(functions/lm.py).

Features follow the paper: word unigrams AND bigrams, hashed into a
fixed number of buckets (the hashing trick bounds the model size
independently of vocabulary), add-``alpha`` smoothed.

Scale shape (what survives 100 TB):
 * ``gram_buckets`` is a pure per-row Catalyst expression — tokenize,
   bigram, md5-bucket inside whole-stage codegen; no Python, no shuffle.
 * Both n-gram distributions come from ONE explode + ONE
   ``groupBy(bucket)`` pass with conditional partial aggregation (raw
   and target counts in the same map-side combine) — output is
   ``<= n_buckets`` rows, tiny next to the corpus.
 * The two distribution totals are a 1-row driver aggregate (same
   bounded-collect class as the LM scalars in functions/lm.py).
 * Per-bucket log-ratios are quantized to integer MICRO-units
   (``round(llr * 1e6)`` as long) so per-document scores are exact
   integer sums — order-independent under Spark partial aggregation and
   bit-identical to any other engine, with no float-summation drift.
 * Scoring is explode → **broadcast** join of the ``<= n_buckets``-row
   ratio table → ``groupBy(doc)`` integer sum: the corpus is never
   shuffled on the feature key; the only exchange carries one row per
   document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rifflux_spark.functions.text_analysis import ascii_tokens


def gram_buckets(text: Column, n_buckets: int = 1024) -> Column:
    """Hashed unigram+bigram feature buckets for one document.

    Returns ``array<long>`` of bucket ids (with repeats — these are
    counts, not a set), bucket = first 8 md5 hex digits as an integer,
    mod ``n_buckets``. md5 keeps the bucket function engine-portable
    (DuckDB: ``('0x' || substr(md5(g), 1, 8))::UBIGINT % B``).
    """
    from rifflux_spark.functions.text_analysis import _let, ngrams_from_tokens

    # bind the token array once: unbound, ascii_tokens(text) was
    # evaluated twice per row (directly and inside ngram_strings) —
    # higher-order functions get no CSE (values bit-identical)
    grams = _let(
        ascii_tokens(text), lambda t: F.concat(t, ngrams_from_tokens(t, 2))
    )
    return F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
        % n_buckets,
    )


def dsir_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR log-importance weight.

    ``target`` is a boolean Column over ``df`` marking the trusted
    target slice (e.g. ``col("source") == "wiki"``). Both hashed n-gram
    distributions are estimated in one pass; each is add-``alpha``
    smoothed over the full ``n_buckets``-way event space::

        p(b) = (count_b + alpha) / (total + alpha * n_buckets)

    Returns ``(id_col, n_grams, dsir_logweight)`` where
    ``dsir_logweight = sum_g [ln p_target(b(g)) - ln p_raw(b(g))]`` over
    the document's gram occurrences, quantized per bucket to 1e-6 before
    summing (exact integer aggregation). Documents with zero grams get
    ``n_grams = 0`` and NULL weight.
    """
    exploded = df.select(
        F.col(id_col).alias("id"),
        target.alias("is_target"),
        F.explode(gram_buckets(F.col(text_col), n_buckets)).alias("bucket"),
    )
    dist = exploded.groupBy("bucket").agg(
        F.count("*").cast("long").alias("raw_cnt"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0))
        .cast("long")
        .alias("tgt_cnt"),
    )
    tot = dist.agg(
        F.sum("raw_cnt").cast("double").alias("tr"),
        F.sum("tgt_cnt").cast("double").alias("tt"),
    ).collect()[0]
    denom_r = float(tot["tr"] or 0.0) + alpha * n_buckets
    denom_t = float(tot["tt"] or 0.0) + alpha * n_buckets
    llr = dist.select(
        "bucket",
        F.round(
            (
                F.log((F.col("tgt_cnt") + F.lit(alpha)) / F.lit(denom_t))
                - F.log((F.col("raw_cnt") + F.lit(alpha)) / F.lit(denom_r))
            )
            * 1e6
        )
        .cast("long")
        .alias("micro"),
    )
    per_doc = (
        exploded.join(F.broadcast(llr), "bucket", "inner")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("micro").cast("long").alias("micro_sum"),
        )
    )
    # id_col is assumed unique (it is the document key); the join-back
    # only re-attaches zero-gram documents, which the explode dropped.
    base = df.select(F.col(id_col).alias("id"))
    return (
        base.join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            (F.col("micro_sum") / F.lit(1e6)).alias("dsir_logweight"),
        )
    )
