"""Schema-evolution lattice unit tests against the raw LakeTable API:
legal widenings (reference TypeVisitor lattice, ColumnMetaData.java:207-239
+ the DataX six-type collapse :125-151) apply and reads harmonize old
files; illegal changes are rejected before any metadata is written.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tis_spark.lake.table import LakeTable

V1 = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.LongType()),
        T.StructField("amount", T.DecimalType(10, 2)),
    ]
)
V2 = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.LongType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("n_fetch", T.IntegerType()),
    ]
)


def _write(t: LakeTable, rows, schema, commit_no: int):
    df = (
        t.spark.createDataFrame(rows, schema)
        .withColumn("_bucket", t.bucket_expr())
        .withColumn("_commit", F.lit(commit_no).cast("long"))
        .withColumn("_dead", F.lit(False))
    )
    t.commit(t.write_data_files(df, kind="delta"), summary={"epoch_id": commit_no})


def test_decimal_widens_to_double_and_reads_harmonize(spark, tmp_table_dir):
    from decimal import Decimal

    t = LakeTable.create(spark, tmp_table_dir, V1, key_cols=["url"], version_col="warc_ts")
    _write(t, [("a", 1, Decimal("12.50"))], V1, 1)
    t.evolve_schema(V2)
    _write(t, [("b", 2, 7.25, 3)], V2, 2)

    out = {r["url"]: r for r in t.read().collect()}
    assert set(out) == {"a", "b"}
    # v1 file harmonized: decimal -> double cast, added column null-filled
    assert out["a"]["amount"] == 12.5 and isinstance(out["a"]["amount"], float)
    assert out["a"]["n_fetch"] is None
    assert out["b"]["amount"] == 7.25 and out["b"]["n_fetch"] == 3
    assert dict(t.read().dtypes)["amount"] == "double"


@pytest.mark.parametrize(
    "bad",
    [
        # narrowing double -> float
        T.StructType([T.StructField("url", T.StringType(), False), T.StructField("warc_ts", T.LongType()), T.StructField("amount", T.FloatType())]),
        # type flip string -> long
        T.StructType([T.StructField("url", T.LongType(), False), T.StructField("warc_ts", T.LongType()), T.StructField("amount", T.DecimalType(10, 2))]),
    ],
)
def test_illegal_evolutions_rejected(spark, tmp_table_dir, bad):
    t = LakeTable.create(spark, tmp_table_dir, V1, key_cols=["url"], version_col="warc_ts")
    before = len(t.history())
    with pytest.raises(ValueError):
        t.evolve_schema(bad)
    assert len(t.history()) == before  # nothing published
