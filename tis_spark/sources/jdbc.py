"""Multi-shard JDBC table source — the dump phase's read side.

Reference shape (SURVEY §2.1 S1/S2, §2.4 J3): ``DataDumpers.create(
jdbcUrls, table)`` makes one dumper per physical shard URL
(tis-plugin/src/main/java/com/qlangtech/tis/plugin/ds/DataDumpers.java:
32-42), a 60-thread pool drains them (MultiThreadDataProvider.java:60-78),
and a dump node may carry a pre-join ``extraSql`` executed source-side
(tis-sql-parser/src/test/resources/test/dataflow/totalpay/
dependency_tabs.yaml:4-6).

Spark-native: each shard is a ``spark.read.jdbc`` with per-shard range
predicates (Spark's task scheduler replaces the thread pool, S2), the
shards union into one DataFrame, and ``extra_sql`` becomes a pushed-down
derived-table subquery — the database executes the pre-join, exactly the
reference's dump-node semantics.

Plan construction (``build_shard_plans``) is separated from execution
(``read_shards``) so the partitioning and predicate generation are unit-
testable in isolation; live end-to-end reads are ALSO tested in-sandbox
against embedded Apache Derby databases (the Derby jars ship inside
Spark's own jar directory) — multi-shard union, range-partitioned reads,
extraSql pre-joins and filter pushdown all run against a real JDBC
endpoint (tests/test_jdbc_live.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class ShardPlan:
    url: str
    dbtable: str  # table name or "(extra_sql) AS <alias>" derived table
    predicates: list[str] | None  # one element per read partition, or None


def _range_predicates(
    column: str, lower: int, upper: int, num_partitions: int
) -> list[str]:
    """Half-open range predicates covering all rows (first/last unbounded),
    mirroring Spark's JDBCRelation column partitioning so the union of
    partitions is exactly the table."""
    if num_partitions <= 1 or upper <= lower:
        return None
    n = min(num_partitions, max(upper - lower, 1))
    stride = (upper - lower) // n or 1
    bounds = [lower + i * stride for i in range(1, n)]
    preds = [f"{column} < {bounds[0]} OR {column} IS NULL"]
    preds += [
        f"{column} >= {bounds[i]} AND {column} < {bounds[i + 1]}"
        for i in range(len(bounds) - 1)
    ]
    preds.append(f"{column} >= {bounds[-1]}")
    return preds


def build_shard_plans(
    jdbc_urls: list[str],
    table: str,
    extra_sql: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 4,
) -> list[ShardPlan]:
    """One plan per shard URL (DataDumpers parity).  ``extra_sql`` (J3)
    wraps as a derived table pushed to the source DB; ``partition_column``
    + bounds split each shard into ``num_partitions`` range reads."""
    assert jdbc_urls, "at least one shard url"
    dbtable = f"({extra_sql}) AS tis_dump" if extra_sql else table
    preds = None
    if partition_column is not None:
        assert lower_bound is not None and upper_bound is not None
        preds = _range_predicates(
            partition_column, lower_bound, upper_bound, num_partitions
        )
    return [ShardPlan(url=u, dbtable=dbtable, predicates=preds) for u in jdbc_urls]


def read_shards(
    spark: SparkSession,
    jdbc_urls: list[str],
    table: str,
    extra_sql: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 4,
    properties: dict | None = None,
) -> DataFrame:
    """Union of per-shard partitioned JDBC reads.  Filters/projections on
    the result push down into each shard's query (Catalyst JDBC
    pushdown — the reference pushes them by hand into extraSql)."""
    plans = build_shard_plans(
        jdbc_urls, table, extra_sql, partition_column, lower_bound, upper_bound, num_partitions
    )
    parts = []
    for p in plans:
        reader = spark.read.format("jdbc").option("url", p.url).option(
            "dbtable", p.dbtable
        )
        for k, v in (properties or {}).items():
            reader = reader.option(k, v)
        if p.predicates:
            # predicate-per-partition read (DataFrameReader.jdbc predicates)
            df = spark.read.jdbc(
                url=p.url,
                table=p.dbtable,
                predicates=p.predicates,
                properties=properties or {},
            )
        else:
            df = reader.load()
        parts.append(df)
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out
