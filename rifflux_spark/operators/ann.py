"""Approximate nearest-neighbor search over embedding columns.

Two paths (SURVEY-mandated training-data ops):

- **brute force** (the parity baseline, reference semantic.py:10-40):
  vectorized cosine against a broadcast query vector + top-k via
  ``orderBy().limit()`` (TakeOrderedAndProject — per-partition heaps,
  driver merges k rows);
- **LSH-bucketed** (the scale path): random-hyperplane sign bits hash
  each vector into one of 2^n_planes buckets; the query probes its own
  bucket plus the ``n_probe``-nearest (lowest-Hamming) buckets, scanning
  only that fraction of the corpus. Planes are seeded → deterministic.
  Recall/cost trades via (n_planes, n_probe).

At cluster scale the bucketed table is written partitioned by bucket id
so a probe prunes partitions at the source — same trick as the postings
term buckets.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _cosine_udf(query: np.ndarray):
    q = query.astype(np.float64)
    qnorm = float(np.linalg.norm(q))

    @F.pandas_udf(T.DoubleType())
    def cos(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0 or qnorm == 0.0:
            return pd.Series(np.zeros(len(vecs)))
        mat = np.array(vecs.tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1) * qnorm
        dots = mat @ q
        return pd.Series(np.where(norms == 0.0, 0.0, dots / np.where(norms == 0.0, 1.0, norms)))

    return cos


def brute_force_topk(
    embeddings: DataFrame,
    query_vector,
    top_k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: the reference-parity baseline."""
    q = np.asarray(query_vector, dtype=np.float64)
    cos = _cosine_udf(q)
    return (
        embeddings.select(F.col(id_col), cos(F.col(vec_col)).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(top_k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    return np.random.RandomState(seed).normal(size=(n_planes, dim)).astype(np.float64)


def lsh_bucket_udf(planes: np.ndarray):
    p = planes

    @F.pandas_udf(T.IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        mat = np.array(vecs.tolist(), dtype=np.float64)
        signs = (mat @ p.T) > 0
        out = np.zeros(len(vecs), dtype=np.int32)
        for i in range(p.shape[0]):
            out |= signs[:, i].astype(np.int32) << i
        return pd.Series(out)

    return bucket


def bucketize(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 7,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append the LSH bucket id (persist partitioned by it at scale)."""
    return embeddings.withColumn("lsh_bucket", lsh_bucket_udf(hyperplanes(dim, n_planes, seed))(F.col(vec_col)))


def probe_buckets(query_vector, n_planes: int, seed: int, n_probe: int) -> list[int]:
    """Query bucket + nearest buckets by Hamming distance (bit flips in
    ascending count order, deterministic)."""
    q = np.asarray(query_vector, dtype=np.float64)
    planes = hyperplanes(len(q), n_planes, seed)
    signs = (planes @ q) > 0
    base = 0
    for i, s in enumerate(signs):
        base |= int(s) << i
    buckets = [base]
    for flips in range(1, n_planes + 1):
        if len(buckets) >= n_probe:
            break
        for combo in itertools.combinations(range(n_planes), flips):
            mask = 0
            for c in combo:
                mask |= 1 << c
            buckets.append(base ^ mask)
            if len(buckets) >= n_probe:
                break
    return buckets[:n_probe]


def ann_topk(
    bucketed: DataFrame,
    query_vector,
    top_k: int = 10,
    n_planes: int = 8,
    seed: int = 7,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-probed approximate top-k: scans only the probed buckets
    (partition-prunable filter), exact cosine within them."""
    buckets = probe_buckets(query_vector, n_planes, seed, n_probe)
    cand = bucketed.filter(F.col("lsh_bucket").isin(buckets))
    return brute_force_topk(cand, query_vector, top_k, id_col, vec_col)
