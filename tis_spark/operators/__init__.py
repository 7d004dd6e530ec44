"""Operator registry backing the driver contract (__spark_entry__.py).

Every implemented operator from SURVEY.md §2 registers a Spark
implementation and (where ANSI-SQL-expressible) a DuckDB oracle query via
``@query``.  Import side effects populate REGISTRY/ORACLES.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REGISTRY: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        REGISTRY[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


from tis_spark.operators import analytics, datax_sync, indexing, mlops, multimodal, quality, relational, temporal, traindata, widerow  # noqa: E402,F401  (registration side effects)
