"""Semantic search: brute-force cosine kNN over the embeddings table.

Reference semantics (src/rifflux/retrieval/semantic.py:10-40): cosine with
zero-denominator → 0.0, ``None`` query vector → empty result, sort desc +
truncate top_k. The reference's full-table driver loop becomes a
distributed scan: the query vector travels inside the Arrow-batched UDF
closure (a broadcast of a few KB), cosine is vectorized numpy over the
``array<float>`` column, and top-k is ``orderBy().limit()`` —
TakeOrderedAndProject, i.e. per-partition heaps + driver merge of k rows,
never a global sort.

Ties: numpy/pandas sort in the reference is stable over store order
(doc_ord); we order by (cosine desc, doc_ord asc) to match.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cosine_scores(embeddings: DataFrame, query_vector, vec_col: str = "vec") -> DataFrame:
    """Append a ``cosine`` column against a fixed query vector."""
    q = np.asarray(query_vector, dtype=np.float32)
    qnorm = float(np.linalg.norm(q))

    @F.pandas_udf(T.DoubleType())
    def cos_udf(vecs: pd.Series) -> pd.Series:
        if qnorm == 0.0 or len(vecs) == 0:
            return pd.Series(np.zeros(len(vecs)))
        first = vecs.iloc[0]
        if isinstance(first, (bytes, bytearray)):
            # index storage format: packed float32 (reference BLOB parity)
            mat = np.frombuffer(b"".join(vecs), dtype=np.float32).reshape(len(vecs), -1)
        else:
            mat = np.array(vecs.tolist(), dtype=np.float32)
        if mat.size == 0:
            return pd.Series(np.zeros(len(vecs)))
        norms = np.linalg.norm(mat, axis=1) * qnorm
        dots = mat @ q
        out = np.where(norms == 0.0, 0.0, dots / np.where(norms == 0.0, 1.0, norms))
        return pd.Series(out.astype(np.float64))

    return embeddings.withColumn("cosine", cos_udf(F.col(vec_col)))


def semantic_topk(
    embeddings: DataFrame,
    query_vector,
    top_k: int,
    id_cols: list[str] | None = None,
    vec_col: str = "vec",
    order_tiebreak: str = "doc_ord",
) -> DataFrame:
    """Reference semantic_search as a DataFrame plan. ``query_vector`` of
    None → empty frame (reference semantic.py:21-22)."""
    id_cols = id_cols or ["doc_ord", "chunk_id"]
    if query_vector is None:
        return embeddings.select(*id_cols).limit(0).withColumn("cosine", F.lit(0.0))
    scored = cosine_scores(embeddings, query_vector, vec_col)
    return (
        scored.select(*id_cols, "cosine")
        .orderBy(F.desc("cosine"), F.asc(order_tiebreak))
        .limit(top_k)
    )
