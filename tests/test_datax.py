"""DataX-style batch sync jobs (SURVEY §2.1 S6, §3.3)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tis_spark.sources.datax import (
    DataxJob,
    collapse_schema,
    datax_type,
    run_datax_job,
    writer_create_ddl,
)

SF_DIR = "/root/testdata/sf0.001"


def test_type_collapse_lattice():
    # ColumnMetaData.java:125-151,207-239: every integer width -> Long,
    # fractional/decimal -> Double, date/time -> Date, binary -> Bytes.
    assert datax_type(T.ShortType()) == "Long"
    assert datax_type(T.IntegerType()) == "Long"
    assert datax_type(T.LongType()) == "Long"
    assert datax_type(T.FloatType()) == "Double"
    assert datax_type(T.DecimalType(18, 2)) == "Double"
    assert datax_type(T.DateType()) == "Date"
    assert datax_type(T.TimestampType()) == "Date"
    assert datax_type(T.BinaryType()) == "Bytes"
    assert datax_type(T.StringType()) == "String"
    assert datax_type(T.ArrayType(T.StringType())) == "String"  # visitor default


def test_collapse_schema_and_ddl(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "x")],
        T.StructType(
            [
                T.StructField("a", T.IntegerType()),
                T.StructField("b", T.FloatType()),
                T.StructField("c", T.StringType()),
            ]
        ),
    )
    out = collapse_schema(df)
    assert [f.dataType for f in out.schema.fields] == [
        T.LongType(),
        T.DoubleType(),
        T.StringType(),
    ]
    ddl = writer_create_ddl(out, "t", pk="a")
    assert ddl == (
        "CREATE TABLE t (\n  a BIGINT,\n  b DOUBLE,\n  c STRING,\n  PRIMARY KEY (a)\n)"
    )


def _job_cfg(src: str, dst: str, writer_fmt: str, mode: str, channel: int = 2) -> dict:
    return {
        "job": {
            "setting": {"speed": {"channel": channel}},
            "content": [
                {
                    "reader": {
                        "name": "hdfsreader",
                        "parameter": {"path": src, "format": "parquet"},
                    },
                    "writer": {
                        "name": "hdfswriter",
                        "parameter": {"path": dst, "format": writer_fmt, "writeMode": mode},
                    },
                }
            ],
        }
    }


def test_parquet_to_orc_sync(spark, tmp_path):
    dst = str(tmp_path / "nation_orc")
    job = DataxJob.from_config(_job_cfg(f"{SF_DIR}/nation.parquet", dst, "orc", "truncate"))
    report = run_datax_job(spark, job)
    src = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    assert report["total_write_records"] == src.count()
    assert "CREATE TABLE datax_target" in report["writer_ddl"]
    synced = spark.read.format("orc").load(dst)
    # lossless: same rows after the round trip (n_regionkey collapses
    # long->long, strings unchanged)
    assert sorted(r["n_name"] for r in synced.collect()) == sorted(
        r["n_name"] for r in src.collect()
    )
    # channel count -> output partitioning
    assert len(glob.glob(os.path.join(dst, "part-*"))) == 2


def test_write_modes(spark, tmp_path):
    dst = str(tmp_path / "region_out")
    cfg = _job_cfg(f"{SF_DIR}/region.parquet", dst, "parquet", "truncate", channel=1)
    n = run_datax_job(spark, DataxJob.from_config(cfg))["total_write_records"]
    # append doubles the rows
    cfg_append = _job_cfg(f"{SF_DIR}/region.parquet", dst, "parquet", "append", channel=1)
    n2 = run_datax_job(spark, DataxJob.from_config(cfg_append))["total_write_records"]
    assert n2 == 2 * n
    # nonConflict refuses to clobber an existing target
    cfg_nc = _job_cfg(f"{SF_DIR}/region.parquet", dst, "parquet", "nonConflict", channel=1)
    with pytest.raises(Exception):
        run_datax_job(spark, DataxJob.from_config(cfg_nc))
    # truncate replaces
    n3 = run_datax_job(spark, DataxJob.from_config(cfg))["total_write_records"]
    assert n3 == n


def test_column_subset(spark, tmp_path):
    dst = str(tmp_path / "cust_subset")
    cfg = _job_cfg(f"{SF_DIR}/customer.parquet", dst, "parquet", "truncate", channel=1)
    cfg["job"]["content"][0]["reader"]["parameter"]["column"] = ["c_custkey", "c_name"]
    run_datax_job(spark, DataxJob.from_config(cfg))
    synced = spark.read.parquet(dst)
    assert synced.columns == ["c_custkey", "c_name"]
