"""Driver-checkable wide-row operators (SURVEY §2 J6/A2/A5 + §3.1).

Two shapes are DuckDB-oracle-checked over the TPC-H-ish tables (the
driver's correctness gate): the wide-row derivation query (sorted
collect_list roll-up + flag case-when + version stamp — the totalpay
semantics projected onto orders/lineitem/customer) and 2-hop FK-chain
routing (child event -> parent -> grandparent key set).  The stateful
incremental engine itself (`wide_row_incremental`) is not SQL-expressible
— it is pinned by the sequential oracle in tests/test_wide_row.py and
registered rows-only here.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tis_spark.operators import load, query


@query(
    "wide_row_totalpay_shape",
    """
    SELECT o_orderkey, c_mktsegment,
           array_to_string(list_sort(list(concat(l_returnflag, '_', l_linestatus))), ';')
             AS kindpay,
           CASE WHEN max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) = 1
                     OR regexp_matches(c_mktsegment, '^BUILD')
                THEN 1 ELSE 0 END AS is_flagged,
           max(l_shipdate) AS version
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
                JOIN customer ON c_custkey = o_custkey
    GROUP BY o_orderkey, c_mktsegment
    """,
)
def wide_row_totalpay_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wide-row derivation shape of the reference's totalpay topology
    (S4totalpayListener.scala:436-481; golden asserts
    TestS4totalpayIncr.java:80-143) on TPC-H roles: orders = primary,
    lineitem = 1:n child, customer = dim.  kindpay = concat_ws over the
    sorted collect_list of child kind keys; flag = case-when over an
    rlike OR a child-predicate aggregate; version = max child stamp."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cust = load(spark, sf_dir, "customer")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    agg = joined.groupBy("o_orderkey", "c_mktsegment").agg(
        F.concat_ws(
            ";",
            F.array_sort(
                F.collect_list(F.concat_ws("_", "l_returnflag", "l_linestatus"))
            ),
        ).alias("kindpay"),
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("_has_r"),
        F.max("l_shipdate").alias("version"),
    )
    flag = F.when(
        (F.col("_has_r") == 1) | F.col("c_mktsegment").rlike("^BUILD"), 1
    ).otherwise(0)
    return agg.select(
        "o_orderkey", "c_mktsegment", "kindpay", flag.alias("is_flagged"), "version"
    )


@query(
    "fk_chain_routing",
    """
    SELECT c_custkey,
           count(DISTINCT o_orderkey) AS n_affected_orders,
           count(*) AS n_child_events
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
    WHERE l_shipdate BETWEEN TIMESTAMP '1998-01-01 00:00:00'
                         AND TIMESTAMP '1998-01-08 00:00:00'
    GROUP BY c_custkey
    """,
)
def fk_chain_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop FK-chain routing (J6, FlatTableRelation.isLinkable/
    getFinalLinkKey, FlatTableRelation.java:176-210): a set of child
    events (lineitems in a ship-date window) routes through the FK chain
    lineitem -> orders -> customer to the affected grandparent key set —
    as joins, never per-row lookups."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") <= "1998-01-08")
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.countDistinct("o_orderkey").alias("n_affected_orders"),
            F.count("*").alias("n_child_events"),
        )
    )


@query("wide_row_incremental")  # stateful engine: pinned by pytest oracle
def wide_row_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end F4: full-build the totalpay star, replay a deterministic
    multi-table change stream through the incremental wide-row engine
    (source LWW maintenance -> FK-chain routing -> restricted re-agg ->
    epoch-fenced merge), return the final wide table.  Equivalence with
    the sequential oracle is asserted in tests/test_wide_row.py."""
    from tis_spark.fixtures.star import (
        gen_star_changes,
        initial_tables_spark,
        totalpay_spec,
    )
    from tis_spark.wide import WideRowPipeline
    from tis_spark.wide.totalpay import totalpay_wide

    root = tempfile.mkdtemp(prefix="tis-wide-entry-")
    pipe = WideRowPipeline(spark, root, totalpay_spec(), totalpay_wide)
    pipe.full_build(initial_tables_spark(spark, 50))
    changes = gen_star_changes(spark, 200, 50, seed=42, epoch_size=100)
    pipe.replay(changes, epoch_size=100)
    return pipe.final_wide().select(
        "totalpay_id", "kindpay", "n_pay", "is_enterprise_card", "version"
    )
