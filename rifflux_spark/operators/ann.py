"""Approximate nearest-neighbor search over embedding columns.

Three paths (SURVEY-mandated training-data ops):

- **brute force** (the parity baseline, reference semantic.py:10-40):
  vectorized cosine against a broadcast query vector + top-k via
  ``orderBy().limit()`` (TakeOrderedAndProject — per-partition heaps,
  driver merges k rows);
- **LSH-bucketed** (scale path 1): random-hyperplane sign bits hash
  each vector into one of 2^n_planes buckets; the query probes its own
  bucket plus the ``n_probe``-nearest (lowest-Hamming) buckets, scanning
  only that fraction of the corpus. Planes are seeded → deterministic.
  Recall/cost trades via (n_planes, n_probe);
- **IVF** (scale path 2): a k-means coarse quantizer trained on a
  bounded driver-side sample partitions vectors into cells; queries
  probe the ``n_probe`` nearest cells. Data-adaptive (better recall per
  probed row than data-oblivious LSH on clustered embeddings) at the
  cost of the training pass.

At cluster scale the bucketed table is written partitioned by bucket id
so a probe prunes partitions at the source — same trick as the postings
term buckets.
"""

from __future__ import annotations

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
    """Multiprobe order: buckets ranked by the total |margin| of the
    planes whose sign they flip (Lv et al., multi-probe LSH) — a plane
    the query sits close to is the one most likely to misclassify a true
    neighbor, so flip it first. Deterministic; the exact (all-buckets)
    case enumerates everything. Probes are generated lazily best-first
    (heap over flip subsets), so the per-query driver cost is O(n_probe
    log n_probe) regardless of n_planes; only the 16 smallest-margin
    planes are flip candidates."""
    import heapq

    q = np.asarray(query_vector, dtype=np.float64)
    planes = hyperplanes(len(q), n_planes, seed)
    proj = planes @ q
    base = 0
    for i, s in enumerate(proj > 0):
        base |= int(s) << i
    flip_order = np.argsort(np.abs(proj), kind="stable")[:16]
    margins = np.abs(proj)[flip_order]
    L = len(flip_order)
    # Best-first enumeration of flip SUBSETS in ascending total-margin
    # order (the Lv et al. expand/shift scheme over margins sorted
    # ascending): each heap pop yields the next-best probe, so exactly
    # n_probe subsets are materialized — never all 2^L masks. A subset is
    # encoded as a tuple of indices into flip_order; from (..., j) the
    # successors are extend (..., j, j+1) and shift (..., j+1), which
    # generate every subset exactly once.
    out = [base]  # the empty flip set: the query's own bucket
    if n_probe <= 1 or L == 0:
        return out[:n_probe]
    heap: list[tuple[float, tuple[int, ...]]] = [(float(margins[0]), (0,))]
    while heap and len(out) < n_probe:
        score, subset = heapq.heappop(heap)
        mask = 0
        for j in subset:
            mask |= 1 << int(flip_order[j])
        out.append(base ^ mask)
        j = subset[-1]
        if j + 1 < L:
            heapq.heappush(heap, (score + float(margins[j + 1]), subset + (j + 1,)))
            heapq.heappush(
                heap, (score - float(margins[j]) + float(margins[j + 1]), subset[:-1] + (j + 1,))
            )
    return out


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


# --------------------------------------------------------------- IVF variant


def train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    sample_n: int = 4096,
    n_iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic k-means coarse quantizer trained on a bounded sample.

    The sample (≤ sample_n rows, id-ordered so it is reproducible) is the
    only thing collected to the driver — at 10^12 rows the training set
    stays a constant-size sample while assignment/search remain fully
    distributed. Init is evenly spaced sample vectors; a fixed iteration
    count of Lloyd steps in float64 keeps the result platform-stable.
    """
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_n)
        .collect()
    )
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    n = mat.shape[0]
    k = min(n_centroids, n)
    cent = mat[np.linspace(0, n - 1, k).astype(int)].copy()
    for _ in range(n_iters):
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def ivf_assign_udf(centroids: np.ndarray):
    c = centroids

    @F.pandas_udf(T.IntegerType())
    def cell(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        mat = np.array(vecs.tolist(), dtype=np.float64)
        d = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return cell


def ivf_index(
    embeddings: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append the IVF cell id (persist partitioned by it at scale —
    same partition-pruning trick as the postings term buckets)."""
    return embeddings.withColumn("ivf_cell", ivf_assign_udf(centroids)(F.col(vec_col)))


def ivf_topk(
    indexed: DataFrame,
    centroids: np.ndarray,
    query_vector,
    top_k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-probed approximate top-k: scan only the ``n_probe`` cells whose
    centroids are nearest the query, exact cosine within them. Probing
    every cell (n_probe ≥ k) degenerates to exact brute force (tested)."""
    q = np.asarray(query_vector, dtype=np.float64)
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    cells = [int(i) for i in np.argsort(d, kind="stable")[:n_probe]]
    cand = indexed.filter(F.col("ivf_cell").isin(cells))
    return brute_force_topk(cand, query_vector, top_k, id_col, vec_col)
