"""Unigram language-model training + perplexity scoring.

The CCNet pipeline (Wenzek et al. 2020) ranks web documents by the
perplexity of a language model trained on a trusted corpus; documents
whose perplexity is far above the corpus norm are low-quality (gibberish,
boilerplate, wrong language). The reference engine has no analog — it is
a single-node fulltext index — but a 100 TB training-data pipeline built
on this engine needs the scoring pass, so it ships as a first-class
operator. In-sandbox the LM is a unigram model with add-alpha smoothing
(the KenLM 5-gram of the real pipeline is a model artifact, not an
engine feature; the engine-side shape — train a term table, broadcast
it, score map-side — is identical).

Scale shape:
 * ``train_unigram_lm``: tokenize → explode → ONE ``groupBy(term)``
   count with map-side partial aggregation (the term-stats shape), then
   a top-``vocab_size`` cut via ``row_number`` over (count desc, term) —
   deterministic tie-break, bounded output.
 * ``unigram_perplexity``: the LM table is ≤ ``vocab_size`` rows — tiny
   next to the corpus — so scoring is explode → **broadcast** hash join
   → per-doc agg with map-side combine. The corpus is never shuffled on
   the term key; the only exchange carries one row per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rifflux_spark.functions.text_analysis import ascii_tokens


def train_unigram_lm(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 65536,
    min_count: int = 1,
) -> DataFrame:
    """Term-count table of the ``vocab_size`` most frequent tokens.

    Returns ``(term, cnt)``. Ties at the vocabulary boundary break on
    the term string so every engine and every run picks the same vocab.
    """
    counts = (
        df.select(F.explode(ascii_tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    # top-V via orderBy().limit() = TakeOrderedAndProject: each partition
    # keeps its own top-V and only those merge — NOT a row_number window,
    # which would funnel the full term table through one reducer at 100 TB
    # vocabulary sizes.
    return counts.orderBy(F.desc("cnt"), F.asc("term")).limit(vocab_size)


def unigram_perplexity(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """Per-document cross-entropy under the unigram LM.

    Add-``alpha`` smoothing over a ``V+1``-way event space (the +1 is the
    shared out-of-vocabulary bucket): ``p(t) = (cnt_t + alpha) / (N +
    alpha * (V + 1))``, OOV terms get ``alpha / (N + alpha * (V + 1))``.

    Returns ``(id_col, n_tokens, n_oov, cross_entropy)`` where
    ``cross_entropy = -mean(log10 p(token))`` (the CCNet score; perplexity
    is ``10**cross_entropy``). Zero-token documents score NULL.

    The two LM scalars (total count ``N``, vocab size ``V``) are a
    bounded 1-row driver aggregate — the same class of collect as the
    256-bucket cumsum offsets; everything else is distributed.
    """
    tot = lm.agg(
        F.sum("cnt").cast("long").alias("n"), F.count("*").cast("long").alias("v")
    ).collect()[0]
    n_total, v = int(tot["n"] or 0), int(tot["v"])
    denom = float(n_total) + alpha * (v + 1)
    scored_lm = lm.select(
        "term", F.log10((F.col("cnt") + F.lit(alpha)) / F.lit(denom)).alias("logp")
    )
    oov_logp = F.log10(F.lit(alpha) / F.lit(denom))

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(ascii_tokens(F.col(text_col))).alias("term"),
    )
    per_doc = (
        toks.join(F.broadcast(scored_lm), "term", "left")
        .groupBy("id")
        .agg(
            F.count("term").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("term").isNotNull() & F.col("logp").isNull(), 1))
            .cast("long")
            .alias("n_oov_raw"),
            F.sum(F.coalesce("logp", oov_logp)).alias("sum_logp_raw"),
        )
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_tokens",
        F.coalesce("n_oov_raw", F.lit(0)).cast("long").alias("n_oov"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(-F.col("sum_logp_raw") / F.col("n_tokens"), round_to),
        ).alias("cross_entropy"),
    )
