"""Dump-artifact format parity: TSV group files + metadata + success token.

The reference's batch dump writes each table as tab-separated text with
nulls encoded as a single space, sharded into RAND_GROUP_NUMBER=16 group
files, plus a ``cols-metadata`` JSON and an empty ``success`` token
(MultiThreadDataProvider.java:86-88,137-165,210-216,484-535;
ITableDumpConstant.java:24).  The engine's native interchange is parquet
(lake tables), but downstream consumers of the reference expect THIS
layout — so the writer/reader pair reproduces it exactly, with one
documented improvement: group assignment is ``pmod(xxhash64(shard_col))``
instead of ``Random.nextInt(16)`` so dumps are deterministic and
re-runnable (the reference's randomness exists only to spread write load,
which the hash does equally well).

Scale: one narrow pass, ``groups``-way repartition, text encode JVM-side.
Caveat inherited from the reference: raw TSV cannot carry tabs/newlines
inside values — callers dump cleaned/normalized columns (true of the
reference too, which writes OLTP scalars).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

NULL_TOKEN = " "  # reference writes null as a single space
DEFAULT_GROUPS = 16  # ITableDumpConstant.RAND_GROUP_NUMBER


def dump_tsv(
    df: DataFrame,
    path: str,
    groups: int = DEFAULT_GROUPS,
    shard_col: str | None = None,
) -> dict:
    """Write ``df`` in the reference dump layout: ``{path}/{group}/`` TSV
    files, ``{path}/cols-metadata`` (column names + Spark types), and an
    empty ``{path}/success`` token written LAST (the commit point —
    readers treat its absence as an aborted dump, reference C10)."""
    cols = df.columns
    shard = F.col(shard_col) if shard_col else F.col(cols[0])
    grouped = df.withColumn(
        "_grp", F.pmod(F.xxhash64(shard.cast("string")), F.lit(groups)).cast("int")
    )
    (
        grouped.repartition(groups, F.col("_grp"))
        .write.partitionBy("_grp")
        .mode("overwrite")
        .option("sep", "\t")
        .option("nullValue", NULL_TOKEN)
        .option("emptyValue", "")
        # raw unquoted TSV like the reference: a NUL quote char (never in
        # OLTP scalar text) disables quoting, so values are written
        # byte-for-byte; the no-tabs/newlines caveat above is what makes
        # this safe (same contract as the reference writer)
        .option("quote", "\u0000")
        .option("escapeQuotes", "false")
        .csv(path)
    )
    # rename _grp=N partition dirs to the reference's bare group numbers
    for entry in sorted(os.listdir(path)):
        if entry.startswith("_grp="):
            os.rename(os.path.join(path, entry), os.path.join(path, entry.split("=", 1)[1]))
    meta = {"columns": cols, "types": [f.dataType.json() for f in df.schema.fields]}
    with open(os.path.join(path, "cols-metadata"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(path, "success"), "w"):
        pass
    return meta


def read_tsv_dump(spark: SparkSession, path: str) -> DataFrame:
    """Read a dump back (the index-build phase's HDFS source, S7/
    HDFSReaderFactory.java:38,71): requires the success token, restores
    types from cols-metadata."""
    if not os.path.exists(os.path.join(path, "success")):
        raise FileNotFoundError(f"dump at {path} has no success token (aborted dump)")
    with open(os.path.join(path, "cols-metadata")) as f:
        meta = json.load(f)
    schema = T.StructType(
        [
            T.StructField(c, _parse_type(t))
            for c, t in zip(meta["columns"], meta["types"])
        ]
    )
    group_dirs = [
        os.path.join(path, d)
        for d in sorted(os.listdir(path))
        if d.isdigit() and os.path.isdir(os.path.join(path, d))
    ]
    return (
        spark.read.schema(schema)
        .option("sep", "\t")
        .option("nullValue", NULL_TOKEN)
        .option("emptyValue", "")
        .option("quote", "\u0000")  # match the writer: no quote handling
        .csv(group_dirs)
    )


def _parse_type(tjson: str) -> T.DataType:
    s = json.loads(tjson)
    return T._parse_datatype_json_value(s)
