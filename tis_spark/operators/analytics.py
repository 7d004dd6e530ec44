"""Analytics surplus operators: grouping-set rollups and a deterministic
distinct-count sketch.

The reference's SQL surface rejects GROUPING SETS / CUBE / ROLLUP
(StreamTransformVisitor.java:113-123 — commented out, unsupported) and has
no sketches; both are free or cheap on Spark, so the engine exposes them
as surplus: rollup via the native operator, cardinality sketching as a
k-minimum-values (KMV) sketch built from md5 order statistics — fully
deterministic, hence oracle-checkable bit-for-bit (unlike HLL, whose
register layout is engine-specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tis_spark.operators import load, query

# ----------------------------------------------------------------- rollup


@query(
    "rollup_returnflag_status",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           grouping(l_returnflag) AS g_flag,
           grouping(l_linestatus) AS g_status,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with GROUPING indicators —
    subtotals + grand total in one pass (A7 surplus; the reference's
    parser rejects grouping sets).  Catalyst expands the rollup into a
    single Expand + hash aggregate: one shuffle for all grouping levels,
    partial aggregation map-side.  Quantities sum as longs (integer-valued
    in the data) so cross-engine totals are exact, not float-order-dependent."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            F.col("g_flag").cast("long").alias("g_flag"),
            F.col("g_status").cast("long").alias("g_status"),
            "n",
            "sum_qty",
        )
    )


# -------------------------------------------------------------- KMV sketch

KMV_K = 16


@query(
    "kmv_distinct_sketch",
    f"""
    WITH h AS (
      SELECT lang, md5('kmv:' || doc_id) AS h FROM documents
    ),
    r AS (
      SELECT lang, h,
             row_number() OVER (PARTITION BY lang ORDER BY h) AS rk
      FROM h
    )
    SELECT lang,
           {KMV_K} AS k,
           max(h) AS kth_hash,
           count(*) AS n_kept
    FROM r WHERE rk <= {KMV_K}
    GROUP BY lang
    """,
)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch per language: keep the 16 (KMV_K)
    smallest md5 hashes of the key; the k-th smallest hash encodes the
    cardinality estimate (E ≈ (k-1)/kth_as_fraction) while staying a pure
    order statistic — deterministic across engines, partitionings and
    cluster sizes, which HLL registers are not.

    Two-stage partial min-k (the map-side combiner the r1/r2 formulation
    only documented): an Arrow-batched narrow pass keeps the k smallest
    hashes per (lang, arrow-batch) — no exchange, vectorized pandas — so
    only O(k × batches) survivor rows ever shuffle; the global min-k is a
    window + aggregate over that tiny set.  min-k of a union = min-k of
    the per-part min-k's, so the result is exact and independent of the
    batching.  The previous single-window version shuffled EVERY row into
    one task per language — the scan was parallel but the rank was not;
    this one is a full-row-shuffle-free plan."""
    doc = load(spark, sf_dir, "documents")
    h = doc.select(
        "lang", F.md5(F.concat(F.lit("kmv:"), F.col("doc_id").cast("string"))).alias("h")
    )

    def partial_min_k(batches):
        for pdf in batches:
            yield pdf.sort_values("h").groupby("lang", sort=False).head(KMV_K)[
                ["lang", "h"]
            ]

    survivors = h.mapInPandas(partial_min_k, schema="lang string, h string")
    w = Window.partitionBy("lang").orderBy("h")
    r = survivors.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= KMV_K)
    return r.groupBy("lang").agg(
        F.lit(KMV_K).cast("long").alias("k"),
        F.max("h").alias("kth_hash"),
        F.count("*").alias("n_kept"),
    )


@query(
    "cube_returnflag_status",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           grouping(l_returnflag) AS g_flag,
           grouping(l_linestatus) AS g_status,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) — every grouping combination in
    one Expand + single-shuffle hash aggregate (A7 surplus; the
    reference's parser rejects CUBE outright,
    StreamTransformVisitor.java:113-123)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            F.col("g_flag").cast("long").alias("g_flag"),
            F.col("g_status").cast("long").alias("g_status"),
            "n",
            "sum_qty",
        )
    )


@query(
    "grouping_sets_flag_and_status",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def grouping_sets_flag_and_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — per-flag and per-status marginals in one
    pass (A7 surplus), via the native DataFrame.groupingSets operator."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )
