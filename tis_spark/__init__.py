"""tis_spark — a PySpark-native CDC / incremental-ingest engine.

Built from scratch with the query & data-processing capabilities of the
reference platform (zyclove/tis, surveyed in SURVEY.md): binlog/WAL-shaped
change stream -> key-partitioned LWW MERGE upserts into snapshot-isolated
lake tables, with schema evolution, exactly-once epoch fencing, skew-aware
partitioning, and a scalar/aggregate function parity layer.

Nothing is ported; the architecture is DataFrame/Catalyst-native.
"""

__version__ = "0.1.0"
