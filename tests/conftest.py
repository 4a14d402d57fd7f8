from __future__ import annotations

import shutil
import tempfile

import pytest

from rifflux_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="rifflux_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.adaptive.enabled": "true"},
    )
    yield spark
    spark.stop()


@pytest.fixture()
def tmp_index_dir():
    d = tempfile.mkdtemp(prefix="rifflux_spark_idx_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
