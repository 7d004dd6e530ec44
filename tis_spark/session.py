"""SparkSession construction with scale-oriented defaults.

Defaults mirror what we would set on a 1000-executor cluster: AQE on
(runtime re-planning + skew-join splitting), partition counts sized to the
parallelism level, Arrow enabled for every pandas-UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tis_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract); on a
    real cluster the caller passes ``yarn``/``k8s`` via spark-submit and this
    function simply inherits it.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # Under spark-submit the launcher already created the JVM gateway and
    # seeded spark.master from --master; setting .master() here would
    # override the submitted cluster manager (yarn/k8s/local-cluster).
    # Only default to local[] when running as a plain python process.
    submitted = "PYSPARK_GATEWAY_PORT" in os.environ
    if master is None and not submitted:
        master = f"local[{cpus}]"
    # parallelism level implied by the master string, e.g. local[8]
    if shuffle_partitions is None:
        if master and master.startswith("local[") and master != "local[*]":
            shuffle_partitions = int(master[len("local[") : -1])
        else:
            shuffle_partitions = cpus

    b = SparkSession.builder.appName(app_name)
    if master is not None:
        b = b.master(master)
    b = (
        b
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.selfDestruct.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("TIS_SPARK_DRIVER_MEM", "24g"))
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
