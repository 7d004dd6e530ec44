"""DataX-style point-to-point batch sync jobs (SURVEY §2.1 S6, §3.3).

The reference embeds DataX for reader→writer batch syncs: a job is a
JSON ``Configuration`` with one reader plugin, one writer plugin and a
channel-count setting, executed by a child-VM ``DataxExecutor``
(DataxExecutor.java:277-308,415-446; job flow §3.3), with writer
CREATE TABLE DDL generated from reader metadata (CHANGES.txt:8) over
the collapsed six-type system {Long, Double, Date, Boolean, Bytes,
String} (ColumnMetaData.java:125-151) and the widening lattice
tinyint/smallint→int→long, float/decimal→double, time→timestamp
(ColumnMetaData.java:207-239).

Spark-first: the same JSON job shape maps onto one declarative
``spark.read.format(...)`` → optional column projection + DataX-type
cast → ``df.write.format(...)`` plan.  There is no per-record channel
loop — DataX's channel count becomes output partitioning, and the
reader/writer "plugins" are Spark's built-in sources, so every job is
one distributed, Catalyst-optimized pipeline (predicate/column pushdown
into the reader for free).  Multi-shard JDBC readers reuse
``tis_spark.sources.jdbc`` (S1/J3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------- type system

#: Spark type -> collapsed DataX type (ColumnMetaData.java:125-151).  The
#: collapse IS the widening lattice: every integer width lands on Long,
#: every fractional on Double, time-like on Date (reference semantics:
#: DataX `Date` carries date+time), binary on Bytes; default String.
_DATAX_OF_SPARK: list[tuple[type, str]] = [
    (T.BooleanType, "Boolean"),
    (T.ByteType, "Long"),
    (T.ShortType, "Long"),
    (T.IntegerType, "Long"),
    (T.LongType, "Long"),
    (T.FloatType, "Double"),
    (T.DoubleType, "Double"),
    (T.DecimalType, "Double"),
    (T.DateType, "Date"),
    (T.TimestampType, "Date"),
    (T.BinaryType, "Bytes"),
]

#: Collapsed DataX type -> the Spark type a synced column is cast to.
_SPARK_OF_DATAX: dict[str, T.DataType] = {
    "Long": T.LongType(),
    "Double": T.DoubleType(),
    "Date": T.TimestampType(),
    "Boolean": T.BooleanType(),
    "Bytes": T.BinaryType(),
    "String": T.StringType(),
}

#: DataX type -> DDL column type for generated writer CREATE TABLE.
_DDL_OF_DATAX: dict[str, str] = {
    "Long": "BIGINT",
    "Double": "DOUBLE",
    "Date": "TIMESTAMP",
    "Boolean": "BOOLEAN",
    "Bytes": "BINARY",
    "String": "STRING",
}


def datax_type(dt: T.DataType) -> str:
    """Collapse a Spark type to its DataX transport type (the visitor
    defaults of ColumnMetaData.java:207-239)."""
    for klass, name in _DATAX_OF_SPARK:
        if isinstance(dt, klass):
            return name
    return "String"


def collapse_schema(df: DataFrame) -> DataFrame:
    """Cast every column to the Spark carrier of its collapsed DataX type
    — what crossing the reader→writer channel does to values in the
    reference.  A no-op cast compiles away, so already-collapsed columns
    cost nothing."""
    return df.select(
        *[
            F.col(f.name).cast(_SPARK_OF_DATAX[datax_type(f.dataType)]).alias(f.name)
            for f in df.schema.fields
        ]
    )


def writer_create_ddl(df: DataFrame, table: str, pk: str | None = None) -> str:
    """Generate the writer-side CREATE TABLE DDL from reader metadata
    (CHANGES.txt:8 parity): collapsed types, optional primary key."""
    cols = [f"  {f.name} {_DDL_OF_DATAX[datax_type(f.dataType)]}" for f in df.schema.fields]
    if pk is not None:
        cols.append(f"  PRIMARY KEY ({pk})")
    body = ",\n".join(cols)
    return f"CREATE TABLE {table} (\n{body}\n)"


# ----------------------------------------------------------------- job spec


@dataclass
class DataxJob:
    """One DataX job: reader -> [column subset, type collapse] -> writer.

    Mirrors the DataX ``Configuration`` JSON parsed by
    DataxExecutor.entry (DataxExecutor.java:415-446)::

        {"job": {"setting": {"speed": {"channel": 4}},
                 "content": [{"reader": {"name": "hdfsreader",
                                         "parameter": {"path": ..., "format": "parquet"}},
                              "writer": {"name": "hdfswriter",
                                         "parameter": {"path": ..., "format": "orc",
                                                       "writeMode": "truncate"}}}]}}
    """

    reader_format: str  # parquet | orc | json | csv | jdbc
    reader_options: dict = field(default_factory=dict)
    reader_path: str | None = None
    columns: list[str] | None = None  # None = "*" (all reader columns)
    writer_format: str = "parquet"
    writer_path: str | None = None
    writer_options: dict = field(default_factory=dict)
    write_mode: str = "append"  # append | nonConflict | truncate (DataX modes)
    channels: int = 1  # DataX channel count -> output partitioning

    @classmethod
    def from_config(cls, cfg: dict) -> "DataxJob":
        """Parse the DataX JSON Configuration shape."""
        job = cfg["job"]
        content = job["content"][0]
        reader, writer = content["reader"], content["writer"]
        rp, wp = dict(reader.get("parameter", {})), dict(writer.get("parameter", {}))
        channels = int(job.get("setting", {}).get("speed", {}).get("channel", 1))
        return cls(
            reader_format=rp.pop("format", reader["name"].replace("reader", "")),
            reader_path=rp.pop("path", None),
            columns=rp.pop("column", None),
            reader_options=rp,
            writer_format=wp.pop("format", writer["name"].replace("writer", "")),
            writer_path=wp.pop("path", None),
            write_mode=wp.pop("writeMode", "append"),
            writer_options=wp,
            channels=channels,
        )


_SAVE_MODE = {
    # DataX writeMode -> Spark SaveMode: truncate replaces the target,
    # nonConflict refuses to clobber, append appends.
    "append": "append",
    "truncate": "overwrite",
    "nonConflict": "errorifexists",
}


def run_datax_job(spark: SparkSession, job: DataxJob) -> dict:
    """Execute one reader→writer sync as a single Spark plan.  Returns the
    executor's report counters (TOTAL_READ_RECORDS parity,
    DataxExecutor.startEngine:373-410) — records and the generated
    writer DDL — instead of streaming them over gRPC."""
    if job.reader_format == "jdbc":
        from tis_spark.sources.jdbc import read_shards

        df = read_shards(spark, **job.reader_options)
    else:
        reader = spark.read.options(**job.reader_options)
        df = reader.format(job.reader_format).load(job.reader_path)
    if job.columns:
        df = df.select(*job.columns)
    df = collapse_schema(df)
    ddl = writer_create_ddl(df, "datax_target")
    # channel count governs writer parallelism (and thus output file
    # count); DataX's per-channel record pipes have no other analog in a
    # shuffle-free plan.
    out = df.repartition(job.channels) if job.channels > 1 else df.coalesce(1)
    (
        out.write.options(**job.writer_options)
        .format(job.writer_format)
        .mode(_SAVE_MODE[job.write_mode])
        .save(job.writer_path)
    )
    n = spark.read.format(job.writer_format).load(job.writer_path).count()
    return {"total_write_records": n, "writer_ddl": ddl}
