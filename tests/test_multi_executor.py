"""End-to-end replay across real executor JVM boundaries.

local-cluster[2,2,*] runs a standalone scheduler with two separate
executor processes — the closest in-sandbox proxy for the north rule's
"spark-submit --py-files on multi-executor clusters".  Guards both the
engine's serialization surfaces and get_spark's master inheritance
(a hard-coded .master() would silently fall back to local mode)."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
import textwrap
import zipfile

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = textwrap.dedent(
    """
    import sys
    from tis_spark.session import get_spark
    from tis_spark.cdc import CdcConfig, CdcIngest
    from tis_spark.fixtures.gen import gen_page_changes

    spark = get_spark("lc-test", shuffle_partitions=4)
    assert spark.conf.get("spark.master").startswith("local-cluster"), spark.conf.get("spark.master")
    changes = gen_page_changes(spark, 1200, seed=5, epoch_size=400).cache()
    ing = CdcIngest(spark, sys.argv[1], CdcConfig(fold_parallelism=8))
    ing.replay(changes, epoch_size=400)
    n = ing.final_state().count()
    sv = ing.table.current_snapshot().schema_version
    # block-manager registrations: driver + one per executor process
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    print(f"LC_RESULT rows={n} schema_version={sv} n_exec={n_exec}")
    spark.stop()
    """
)


WIDE_DRIVER = textwrap.dedent(
    """
    import sys
    from tis_spark.session import get_spark
    from tis_spark.fixtures.star import gen_star_changes, initial_tables_spark, totalpay_spec
    from tis_spark.wide import WideRowPipeline
    from tis_spark.wide.totalpay import totalpay_wide

    spark = get_spark("lc-wide", shuffle_partitions=4)
    assert spark.conf.get("spark.master").startswith("local-cluster")
    pipe = WideRowPipeline(spark, sys.argv[1], totalpay_spec(), totalpay_wide,
                           num_buckets=4)
    pipe.full_build(initial_tables_spark(spark, 60))
    pipe.replay(gen_star_changes(spark, 200, 60, seed=3, epoch_size=100),
                epoch_size=100)
    n = pipe.final_wide().count()
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    print(f"LC_WIDE_RESULT rows={n} n_exec={n_exec}")
    spark.stop()
    """
)


def _submit(tmp_path, driver_src: str, timeout: int = 420):
    zip_path = tmp_path / "tis_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "tis_spark")):
            if "__pycache__" in root:
                continue
            for f in files:
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, REPO))
    driver_py = tmp_path / "drive.py"
    driver_py.write_text(driver_src)
    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ, PYTHONPATH=REPO, TIS_SPARK_DRIVER_MEM="2g")
    return subprocess.run(
        [
            spark_submit,
            "--master",
            "local-cluster[2,2,1024]",
            "--py-files",
            str(zip_path),
            str(driver_py),
            str(tmp_path / "table"),
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=timeout,
    )


@pytest.mark.slow
def test_wide_row_on_local_cluster(tmp_path):
    """The multi-table star engine across real executor JVM boundaries —
    guards the localCheckpoint pinning, the driver-side thread-parallel
    source merges, and FK-clustered reads under multi-JVM execution."""
    out = _submit(tmp_path, WIDE_DRIVER)
    assert "LC_WIDE_RESULT" in out.stdout, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("LC_WIDE_RESULT")][0]
    assert int(line.split("rows=")[1].split()[0]) == 60, line
    assert int(line.split("n_exec=")[1].split()[0]) >= 3, line


@pytest.mark.slow
def test_replay_on_local_cluster(tmp_path):
    zip_path = tmp_path / "tis_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "tis_spark")):
            if "__pycache__" in root:
                continue
            for f in files:
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, REPO))
    driver_py = tmp_path / "drive.py"
    driver_py.write_text(DRIVER)
    table = tmp_path / "table"
    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ, PYTHONPATH=REPO, TIS_SPARK_DRIVER_MEM="2g")
    out = subprocess.run(
        [
            spark_submit,
            "--master",
            "local-cluster[2,2,1024]",
            "--py-files",
            str(zip_path),
            str(driver_py),
            str(table),
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
    )
    assert "LC_RESULT" in out.stdout, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("LC_RESULT")][0]
    # deterministic stream -> deterministic final state across topologies
    assert "schema_version=5" in line, line
    rows = int(line.split("rows=")[1].split()[0])
    assert rows > 500, line
    # two executor processes actually registered: the driver script reports
    # block-manager count (1 driver + 2 executors) from inside the job —
    # a signal that cannot pass in plain local mode.
    n_exec = int(line.split("n_exec=")[1].split()[0])
    assert n_exec >= 3, line
