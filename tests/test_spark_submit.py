"""The spark-submit --py-files packaging contract, end to end.

The north rule names the deployment shape explicitly: the engine runs
"via spark-submit --py-files on a multi-executor cluster". This test
proves the artifact is genuinely self-contained: the job script is
copied OUT of the repo and launched with a cwd where `rifflux_spark`
is NOT importable from disk — every import must come from the
`package_zip()` archive handed to --py-files. The job builds an index
from an ICEBERG pages table (the north rule's input), a second
invocation runs the CDC incremental path, and the resulting index is
then opened and searched by the in-process test session.
"""

from __future__ import annotations

import json
import shutil
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit")

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None, reason="spark-submit not on PATH"
)


def _submit(args: list[str], cwd: Path) -> dict:
    from rifflux_spark.session import package_zip

    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", package_zip(),
            str(cwd / "job.py"),
            *args,
        ],
        cwd=str(cwd),
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # metrics are the LAST stdout line (the driver-side JSON contract)
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


def test_submit_build_then_cdc_incremental(spark, tmp_path_factory):
    from rifflux_spark.config import EngineConfig
    from rifflux_spark.service import SearchService
    from rifflux_spark.sources.iceberg import (
        IcebergTableWriter,
        _data_file,
        iceberg_schema_from_parquet,
    )
    from rifflux_spark.sources.pages import synthetic_pages

    base = tmp_path_factory.mktemp("submit")
    jobdir = base / "jobcwd"
    jobdir.mkdir()
    # the job script runs from OUTSIDE the repo: rifflux_spark must
    # resolve from the --py-files zip, not the filesystem
    shutil.copy(REPO / "scripts" / "submit_build.py", jobdir / "job.py")

    data_dir = base / "pages_data"
    synthetic_pages(spark, 50, seed=21).coalesce(1).write.parquet(str(data_dir))
    pfiles = sorted(str(p) for p in data_dir.glob("*.parquet"))
    table = IcebergTableWriter(
        str(base / "pages_iceberg"),
        schema_fields=iceberg_schema_from_parquet(pfiles[0]),
        clock=lambda: 1_755_000_000.0,
    )
    table.commit(added=[_data_file(p, schema_fields=table.schema_fields) for p in pfiles])

    idx = str(base / "index")
    common = [
        "--pages", table.location, "--index-dir", idx,
        "--term-buckets", "2", "--build-shards", "1",
        "--embedding-dim", "16", "--block-size", "32", "--salt-range", "256",
    ]
    metrics = _submit(common, jobdir)
    assert metrics["n_chunks"] > 0  # n_docs/n_chunks count IR docs (chunks)
    assert metrics["iceberg_cursor"] == table.current_snapshot()["snapshot-id"]

    # append 12 new pages → the incremental invocation takes the CDC path
    delta_dir = base / "delta_data"
    synthetic_pages(spark, 62, seed=21).filter(
        "CAST(substring(url, -8, 8) AS INT) >= 50"
    ).coalesce(1).write.parquet(str(delta_dir))
    dfiles = sorted(str(p) for p in delta_dir.glob("*.parquet"))
    snap = table.commit(
        added=[_data_file(p, schema_fields=table.schema_fields) for p in dfiles]
    )

    inc = _submit(common + ["--incremental"], jobdir)
    assert inc["applied"] is True
    assert inc["to_snapshot"] == snap["snapshot-id"]
    assert inc["counts"].get("new") == 12

    # the index the submitted jobs produced serves queries in-process
    cfg = EngineConfig(
        block_size=32, salt_range=256, n_term_buckets=2, n_build_shards=1,
        embedding_dim=16,
    )
    svc = SearchService(spark, idx, cfg)
    assert svc.index_status()["files"] == 62
    assert svc.search("cache ttl", top_k=3, mode="lexical")
