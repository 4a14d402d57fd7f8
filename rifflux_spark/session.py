"""SparkSession construction with engine defaults.

Single place where scale-relevant settings live: AQE on (runtime skew-join
and partition coalescing), Arrow on (all UDFs here are Arrow-batched),
shuffle partitions sized by caller (tests pass small values; cluster jobs
leave the 200/AQE default or size to cores).
"""

from __future__ import annotations

import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Zip the rifflux_spark package for shipping to executors — the
    ``spark-submit --py-files`` artifact (north_rule). Built lazily into
    the session temp dir; cheap (~100KB)."""
    pkg_root = Path(__file__).resolve().parent
    if not pkg_root.is_dir():
        # already imported FROM a --py-files zip (spark-submit): the
        # archive itself is the artifact; rebuilding from a nonexistent
        # directory would clobber it with an empty zip
        import rifflux_spark

        archive = getattr(getattr(rifflux_spark, "__loader__", None), "archive", None)
        if not archive:
            raise RuntimeError(
                "rifflux_spark is not a filesystem package and its loader "
                "exposes no archive — refusing to write an empty zip"
            )
        return str(archive)
    out = Path(tempfile.gettempdir()) / "rifflux_spark_pyfiles.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg_root.rglob("*.py")):
            zf.write(py, f"rifflux_spark/{py.relative_to(pkg_root)}")
    return str(out)


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
        # snappy: write stages pipeline a JVM writer thread against a
        # Python UDF worker per slot — heavy codecs double CPU pressure
        # at full parallelism for little size gain on this data
        "spark.sql.parquet.compression.codec": "snappy",
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        "spark.ui.enabled": "false",
        "spark.driver.memory": "16g",
        "spark.driver.maxResultSize": "4g",
    }
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for key, value in conf.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    # ship the package to executor Python workers regardless of driver cwd
    # (the spark-submit --py-files equivalent, applied programmatically)
    spark.sparkContext.addPyFile(package_zip())
    return spark


def graceful_shutdown(spark: SparkSession, stream_timeout_s: float = 10.0) -> None:
    """Driver-exit hygiene (S5, reference mcp/tools.py:258-284): first
    stop every active streaming query so no new micro-batches start (the
    reference stops its file watcher first for the same reason), then stop
    the session. Idempotent — safe to call on an already-stopped session."""
    try:
        for q in list(spark.streams.active):
            try:
                q.stop()
                q.awaitTermination(stream_timeout_s)
            except Exception:
                pass
        spark.stop()
    except Exception:
        pass  # session/JVM already gone — nothing left to release


def install_shutdown_hook(spark: SparkSession) -> None:
    """Register :func:`graceful_shutdown` via ``atexit`` (the reference's
    ``atexit.register(_shutdown_server)``, mcp/tools.py:284). Long-lived
    drivers (MCP-style servers, notebooks) get clean stream+session
    teardown on normal exit or SIGTERM-driven interpreter shutdown."""
    import atexit

    atexit.register(graceful_shutdown, spark)
