"""Scalable dense document-ordinal assignment.

The reference's doc identity is the SQLite rowid, assigned in insertion
order (files in scan order, chunks in chunk_index order) — BM25 ties break
on it (reference sqlite_store.py:163-164 ORDER BY + rowid tiebreak;
SURVEY.md §4). The rebuild reproduces that order as ``doc_ord`` =
0-based rank of ``(url, chunk_index)``.

A global ``row_number()`` window would funnel 10^12 rows through one
partition, so this uses the classic two-phase scheme instead:

1. range-repartition by the ordering key and sort within partitions
   (Spark's range partitioner keeps partitions globally ordered);
2. count rows per partition, prefix-sum the counts on the driver (tiny),
   and add each partition's offset to its local 0-based index inside an
   Arrow-batched ``mapInPandas``.

The partitioned frame is persisted between the two passes so both observe
identical range boundaries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_doc_ords(
    df: DataFrame,
    order_cols: list[str],
    n_partitions: int | None = None,
    out_col: str = "doc_ord",
) -> DataFrame:
    """Add a dense 0-based ``out_col`` following ``order_cols`` order."""
    n_partitions = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    counts = (
        parted.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    by_pid = {int(r["pid"]): int(r["count"]) for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]

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

    return parted.mapInPandas(add_ord, schema=out_schema)
