"""Hashed-linear document quality classifier — the FineWeb-Edu /
DCLM-style "score every page with a cheap linear model" pipeline stage.

Architecture (the part that matters at 100 TB): feature hashing over
the document's tokens with a weight per hashed feature, a dot product,
and a threshold — ALL pure Catalyst array expressions, so scoring a
corpus is map-only inside whole-stage codegen: no shuffle, no UDF, no
model server. A real deployment broadcasts its trained weight vector
(a map literal or a small broadcast join on the hash bucket); this
implementation derives the weight for a token deterministically from
its md5 (uniform in [-0.5, 0.5]) so the plan, the feature hashing, and
the thresholding are real and cross-engine testable while the trained
weights remain the documented seam.

Exactness discipline: per-token weights are 1e-6-quantized integers,
the document logit is their exact integer sum (associative — safe
under any partitioning), and the exposed columns avoid libm (no
sigmoid in compared output; callers needing a probability apply it to
``logit``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rifflux_spark.functions.text_analysis import ascii_tokens


def token_weight_micro(tok: Column) -> Column:
    """Deterministic pseudo-weight for a token, as an exact integer in
    micro-units: ``round((md5_32(tok) / 2^32 - 0.5) * 1e6)``. The
    md5→uint32 math matches DuckDB bit-for-bit (same recipe as the
    engine's HLL sketch)."""
    v = F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
    return F.round((v / F.lit(4294967296.0) - 0.5) * 1e6).cast("long")


def quality_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_micro_per_token: int = 20_000,
) -> DataFrame:
    """Per-document linear quality score + keep decision.

    ``logit_micro = Σ_t w_micro(t)`` (exact integer),
    ``keep = logit_micro > threshold * n_tokens`` (a per-token average
    threshold as an integer cross-multiplication — no division, no
    float compare). Map-only; the scored corpus never shuffles.

    Returns ``(id_col, n_tokens, logit, keep)``.
    """
    toks = ascii_tokens(F.col(text_col))
    logit_micro = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + token_weight_micro(t),
    )
    n_tokens = F.size(toks).cast("long")
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        logit_micro.alias("_lm"),
    ).select(
        id_col,
        "n_tokens",
        (F.col("_lm") / F.lit(1e6)).alias("logit"),
        (
            F.col("_lm") > F.lit(threshold_micro_per_token) * F.col("n_tokens")
        ).alias("keep"),
    )


def quality_scores_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_micro_per_token: int = 20_000,
    where: str = "TRUE",
) -> str:
    """DuckDB twin of :func:`quality_scores`."""
    return f"""
WITH tk AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '[^0-9a-z]+'),
                     x -> x <> '') AS tk
  FROM {table} WHERE {where}
),
s AS (
  SELECT {id_col}, len(tk)::BIGINT AS n_tokens,
         coalesce(list_aggregate(list_transform(tk, t ->
           CAST(round((CAST(('0x' || substr(md5(t), 1, 8)) AS UBIGINT)
                       / 4294967296.0 - 0.5) * 1e6) AS BIGINT)
         ), 'sum'), 0)::BIGINT AS lm
  FROM tk
)
SELECT {id_col}, n_tokens, lm / 1e6 AS logit,
       lm > {threshold_micro_per_token} * n_tokens AS keep
FROM s ORDER BY {id_col}
""".strip()
