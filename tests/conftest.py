from __future__ import annotations

import shutil
import tempfile

import pytest

from tis_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tis_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="tis-wh-")},
    )
    yield s
    s.stop()


@pytest.fixture()
def tmp_table_dir():
    d = tempfile.mkdtemp(prefix="tis-table-")
    yield d
    shutil.rmtree(d, ignore_errors=True)
