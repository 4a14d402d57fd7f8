"""Last-write-wins resolution over an append-only KV op log.

The reference's metadata table is a mutable SQLite KV with set/get/delete
(reference src/rifflux/db/sqlite_store.py:99-119). On an append-only
columnar store the same semantics become an op log — (key, value, seq,
deleted) rows — resolved at read time by a window over key: the highest
seq wins, and a winning delete removes the key. One shuffle on key;
at scale the log is periodically rewritten to its resolved form (the
Iceberg analog is a MERGE INTO compaction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_kv(ops: DataFrame) -> DataFrame:
    """(key, value, seq, deleted) op rows → live (key, value) state."""
    w = Window.partitionBy("key").orderBy(F.desc("seq"))
    return (
        ops.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (~F.col("deleted")))
        .select("key", "value")
    )
