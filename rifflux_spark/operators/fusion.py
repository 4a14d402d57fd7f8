"""Reciprocal Rank Fusion — pure semantics + distributed rank-window join.

Pure function parity: reference src/rifflux/retrieval/rrf.py:4-9
(``score[id] += 1/(k + rank)``, rank from 1, k=60, sorted desc).

The DataFrame form re-expresses fusion as a rank-window join (SURVEY.md §2
Q9): per modality ``rank = row_number() OVER (ORDER BY score ...)``, then a
full-outer equi-join on the id and ``rrf = Σ 1/(k+rank_i)``. At query time
each modality DataFrame holds ≤ top_k*2 rows (reference search.py:34-54),
so the join is trivially broadcast-able and the window never sees more
than a few hundred rows — no scale hazard despite the global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(rankings: dict[str, list[str]], *, k: int = 60) -> dict[str, float]:
    """Driver-side reference-parity fusion (reference rrf.py:4-9)."""
    scores: dict[str, float] = {}
    for ranked_ids in rankings.values():
        for rank, item_id in enumerate(ranked_ids, start=1):
            scores[item_id] = scores.get(item_id, 0.0) + (1.0 / (k + rank))
    return dict(sorted(scores.items(), key=lambda kv: kv[1], reverse=True))


def rrf_fuse_df(
    ranked: dict[str, DataFrame],
    *,
    id_col: str = "chunk_id",
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Fuse pre-ranked modality DataFrames (each with ``id_col`` and a
    1-based ``rank_col``) into ``(id_col, rrf, <mod>_rank...)``.

    Inputs are already-truncated candidate lists (tiny), so the full-outer
    joins stay driver-light; ordering is (rrf desc, then first-modality
    rank) to mirror the reference's insertion-order stability for ties.
    """
    fused: DataFrame | None = None
    mod_names = list(ranked)
    for name, df in ranked.items():
        part = df.select(
            F.col(id_col),
            F.col(rank_col).alias(f"{name}_rank"),
        )
        fused = part if fused is None else fused.join(part, on=id_col, how="full_outer")
    assert fused is not None, "at least one modality required"
    rrf_expr = None
    for name in mod_names:
        term = F.when(
            F.col(f"{name}_rank").isNotNull(),
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"{name}_rank")),
        ).otherwise(F.lit(0.0))
        rrf_expr = term if rrf_expr is None else rrf_expr + term
    return fused.withColumn("rrf", rrf_expr)


def add_rank(df: DataFrame, order_cols: list, rank_col: str = "rank") -> DataFrame:
    """1-based dense row_number rank. Only ever applied to candidate sets
    of ≤ top_k*2 rows, so the single-partition window is fine by design."""
    w = Window.orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w))
