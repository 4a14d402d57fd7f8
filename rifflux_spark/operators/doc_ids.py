"""Scalable dense document-ordinal assignment.

The reference's doc identity is the SQLite rowid, assigned in insertion
order (files in scan order, chunks in chunk_index order) — BM25 ties break
on it (reference sqlite_store.py:163-164 ORDER BY + rowid tiebreak;
SURVEY.md §4). The rebuild reproduces that order as ``doc_ord`` =
0-based rank of ``(url, chunk_index)``.

A global ``row_number()`` window would funnel 10^12 rows through one
partition, so this uses the classic two-phase scheme instead:

1. range-partition by the ordering key and sort within partitions
   (Spark's range partitioner keeps partitions globally ordered);
2. count rows per partition, prefix-sum the counts on the driver (tiny),
   and add each partition's offset to its local 0-based index inside an
   Arrow-batched ``mapInPandas``.

Cost note: ``repartitionByRange`` runs a sampling job over its input — if
the input is an expensive UDF pipeline, partition the *cheap upstream*
(e.g. pages by ``url``, where sampling prunes to one small column) and
sort within partitions after the UDF instead; then call
:func:`dense_ordinals_prepartitioned` on the persisted result. That is
what the build plan does; :func:`assign_doc_ords` is the generic wrapper.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def offsets_from_counts(by_pid: dict[int, int]) -> dict[int, int]:
    """Prefix-sum partition counts into start offsets (driver-side)."""
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]
    return offsets


def dense_ordinals_prepartitioned(
    df: DataFrame,
    out_col: str = "doc_ord",
    offsets: dict[int, int] | None = None,
) -> DataFrame:
    """Add dense 0-based ordinals to a frame whose partitions are already
    globally ordered and internally sorted.

    ``df`` MUST be persisted (or otherwise partition-stable) — the count
    pass and the ordinal pass must observe identical partitioning. Pass
    ``offsets`` if partition counts were already gathered by another job
    (saves one action).
    """
    if offsets is None:
        counts = (
            df.select(F.spark_partition_id().alias("pid"))
            .groupBy("pid")
            .count()
            .collect()
        )
        offsets = offsets_from_counts({int(r["pid"]): int(r["count"]) for r in counts})

    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.LongType(), False)])

    def add_ord(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    return df.mapInPandas(add_ord, schema=out_schema)


PARTITION_ORD_STRIDE = 1 << 40


def sparse_ordinals(df: DataFrame, out_col: str = "doc_ord") -> DataFrame:
    """Single-pass order-preserving ordinals: ``pid * 2^40 + local_index``.

    Requires partitions globally ordered + internally sorted (range
    partition upstream). Unlike dense ordinals this needs NO counts job
    and NO partition-stable cache — it composes into the same narrow
    stage as the chunk/tokenize UDFs. Ordinals are monotone in the sort
    order (all BM25 tie-break semantics hold) but not contiguous: one
    ≤9-byte varbyte gap per partition boundary per posting list is the
    entire cost. Supports ≤2^40 rows per partition and ≤2^23 partitions.
    """
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.LongType(), False)])

    def add_ord(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = TaskContext.get().partitionId() * PARTITION_ORD_STRIDE
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    return df.mapInPandas(add_ord, schema=out_schema)


def assign_doc_ords(
    df: DataFrame,
    order_cols: list[str],
    n_partitions: int | None = None,
    out_col: str = "doc_ord",
) -> DataFrame:
    """Generic two-phase dense ordinal assignment over any frame."""
    n_partitions = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return dense_ordinals_prepartitioned(parted, out_col)
