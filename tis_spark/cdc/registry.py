"""Schema registry: DDL change events -> lake-table schema updates.

The reference versions schemas as numbered snapshots in its console DB
(SchemaAction.java:330,967-1029) and widens JDBC types along a fixed
lattice (ColumnMetaData.java:207-239).  Here a DDL event in the change
stream bumps the table's schema version via ``LakeTable.evolve_schema``;
application is idempotent so a crash between the evolve commit and the
epoch's merge commit is safe to replay.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

from tis_spark.lake.table import LakeTable

_TYPE_MAP = {
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
}

_ADD_RE = re.compile(r"^ADD\s+COLUMN\s+(\w+)\s+(\w+)$", re.I)
_ALTER_RE = re.compile(r"^ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+(\w+)$", re.I)


def parse_ddl(ddl: str) -> tuple[str, str, T.DataType]:
    m = _ADD_RE.match(ddl.strip())
    if m:
        return ("add", m.group(1), _TYPE_MAP[m.group(2).lower()])
    m = _ALTER_RE.match(ddl.strip())
    if m:
        return ("alter", m.group(1), _TYPE_MAP[m.group(2).lower()])
    raise ValueError(f"unsupported DDL: {ddl!r}")


def apply_ddl(
    table: LakeTable,
    ddl: str,
    summary: dict | None = None,
    expected_snapshot_id: int | None = None,
):
    """Apply one DDL statement idempotently.  Returns the new Snapshot if
    the schema actually changed, None if it was already applied (e.g.
    crash-replay).  ``expected_snapshot_id`` fences the evolve commit
    against concurrent writers (optimistic concurrency, C8)."""
    kind, name, dtype = parse_ddl(ddl)
    snap = table.current_snapshot()
    schema = snap.schema
    names = [f.name for f in schema.fields]
    if kind == "add":
        if name in names:
            return None
        new = T.StructType(list(schema.fields) + [T.StructField(name, dtype, True)])
    else:
        if name not in names:
            raise ValueError(f"ALTER of unknown column {name}")
        cur = schema[name].dataType
        if cur == dtype:
            return None
        new = T.StructType(
            [T.StructField(f.name, dtype if f.name == name else f.dataType, f.nullable) for f in schema.fields]
        )
    return table.evolve_schema(
        new, summary={"ddl": ddl, **(summary or {})}, expected_snapshot_id=expected_snapshot_id
    )
