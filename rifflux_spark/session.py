"""SparkSession construction with engine defaults.

Single place where scale-relevant settings live: AQE on (runtime skew-join
and partition coalescing), Arrow on (all UDFs here are Arrow-batched),
shuffle partitions sized by caller (tests pass small values; cluster jobs
leave the 200/AQE default or size to cores).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "rifflux_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        # parquet writers: one sorted row group per ~16MB keeps term-range
        # min/max stats tight for posting pruning
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        "spark.ui.enabled": "false",
        "spark.driver.memory": "8g",
    }
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for key, value in conf.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
