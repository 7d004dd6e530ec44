"""Relational + scalar-function operator coverage (SURVEY.md §2.2-2.5,
§2.7, §2.9) over the driver's TPC-H-ish tables.

Spark side is DataFrame-API (Catalyst-native: broadcast hints on dims,
aggregates pushed partial/final automatically); the paired DuckDB SQL is
the independent oracle.  Every computed column is aliased identically on
both sides (driver hash-compares by sorted column name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from tis_spark.operators import load, query

# --------------------------------------------------------------- A1/A4: agg


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 2) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# --------------------------------------------------------------- J1: joins


@query(
    "left_join_extra_on",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_orderkey) AS n_orders,
           count(l_orderkey) AS n_matched_lines
    FROM orders LEFT JOIN lineitem
      ON o_orderkey = l_orderkey AND l_returnflag = 'R' AND l_shipdate IS NOT NULL
    GROUP BY o_orderstatus
    """,
)
def left_join_extra_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN with extra ON predicates incl IS NOT NULL — the exact join
    shape of the reference's rewritten node SQL (SURVEY §2.4 J1,
    sqlrewrite_assert.txt fixtures)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cond = (
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_returnflag == "R")
        & li.l_shipdate.isNotNull()
    )
    return (
        orders.join(li, cond, "left")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count("l_orderkey").alias("n_matched_lines"),
        )
    )


@query(
    "semi_anti_join",
    """
    SELECT c_mktsegment, count(*) AS n_customers_without_orders
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers_without_orders"))
    )


# --------------------------------------------------------------- set ops


@query(
    "union_all_agg",
    """
    SELECT src, count(*) AS n, round(sum(amount), 2) AS total
    FROM (
      SELECT 'orders' AS src, o_totalprice AS amount FROM orders
      UNION ALL
      SELECT 'customer' AS src, c_acctbal AS amount FROM customer
    ) u
    GROUP BY src
    """,
)
def union_all_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        F.lit("orders").alias("src"), F.col("o_totalprice").alias("amount")
    )
    cust = load(spark, sf_dir, "customer").select(
        F.lit("customer").alias("src"), F.col("c_acctbal").alias("amount")
    )
    return orders.unionByName(cust).groupBy("src").agg(
        F.count("*").alias("n"), F.round(F.sum("amount"), 2).alias("total")
    )


@query("distinct_pairs", "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# --------------------------------------------------------------- A3/A5: agg


@query(
    "collect_set_sorted",
    """
    SELECT c_mktsegment,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ';') AS priorities
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def collect_set_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set/collect_list parity (reference FunctionUtils.java:151-157),
    sorted + joined for a deterministic cross-engine value."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.concat_ws(";", F.array_sort(F.collect_set("o_orderpriority"))).alias("priorities"))
    )


@query(
    "two_level_reaggregation",
    """
    SELECT o_custkey,
           count(*) AS n_statuses,
           round(max(status_total), 2) AS max_status_total
    FROM (
      SELECT o_custkey, o_orderstatus, sum(o_totalprice) AS status_total
      FROM orders GROUP BY o_custkey, o_orderstatus
    ) s
    GROUP BY o_custkey
    """,
)
def two_level_reaggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage re-aggregation (reference A5: per-(k1,k2) groups re-keyed to
    the parent — S4totalpayListener.scala:436-450 / reduceData)."""
    orders = load(spark, sf_dir, "orders")
    lvl1 = orders.groupBy("o_custkey", "o_orderstatus").agg(F.sum("o_totalprice").alias("status_total"))
    return lvl1.groupBy("o_custkey").agg(
        F.count("*").alias("n_statuses"),
        F.round(F.max("status_total"), 2).alias("max_status_total"),
    )


@query(
    "count_distinct_by_segment",
    """
    SELECT c_mktsegment, count(DISTINCT c_custkey) AS n_customers,
           round(avg(c_acctbal), 2) AS avg_acctbal
    FROM customer GROUP BY c_mktsegment
    """,
)
def count_distinct_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
        )
    )


# --------------------------------------------------------------- §2.3 scalar fns


@query(
    "fn_concat_instr",
    """
    SELECT o_orderkey,
           concat(o_orderpriority, '_', o_orderstatus) AS pri_status,
           instr(o_orderpriority, '-') AS dash_pos
    FROM orders
    """,
)
def fn_concat_instr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat + instr (FunctionUtils.java:54-67)."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.concat("o_orderpriority", F.lit("_"), "o_orderstatus").alias("pri_status"),
        F.instr("o_orderpriority", "-").alias("dash_pos"),
    )


@query(
    "fn_bitwise_and",
    "SELECT (l_linenumber & 3) AS band, count(*) AS n FROM lineitem GROUP BY (l_linenumber & 3)",
)
def fn_bitwise_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """op_and bitwise AND (FunctionUtils.java:69-75)."""
    return (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_linenumber").bitwiseAND(F.lit(3)).alias("band"))
        .groupBy("band")
        .agg(F.count("*").alias("n"))
    )


@query(
    "fn_split_index",
    """
    SELECT coalesce(string_split(p_type, ' ')[1], '') AS type_head, count(*) AS n
    FROM part GROUP BY 1
    """,
)
def fn_split_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + safe array subscript with ''-default
    (FunctionUtils.split:77-100 / getArrayIndexProp:102-107)."""
    return (
        load(spark, sf_dir, "part")
        .select(F.coalesce(F.element_at(F.split("p_type", " "), 1), F.lit("")).alias("type_head"))
        .groupBy("type_head")
        .agg(F.count("*").alias("n"))
    )


@query(
    "fn_round_half_up",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2))), 1) AS DOUBLE) AS net_price
    FROM lineitem
    """,
)
def fn_round_half_up(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round HALF_UP (FunctionUtils.java:199-204).

    The arithmetic runs in DECIMAL on both engines: a double product that
    lands just below a decimal tie (e.g. 65947.5 * 0.94) rounds differently
    between Spark (BigDecimal.valueOf shortest-rep) and DuckDB otherwise.
    Decimal inputs make the tie exact, so HALF_UP agrees bit-for-bit."""
    net = F.round(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")),
        1,
    ).cast("double")
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", net.alias("net_price")
    )


@query(
    "fn_get_json_object",
    """
    SELECT event_id, json_extract_string(props, '$.k') AS k_val,
           coalesce(json_extract_string(props, '$.missing'), 'dflt') AS with_default
    FROM events
    """,
)
def fn_get_json_object(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object top-level prop + defaultVal coalesce
    (FunctionUtils.java:235-266)."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_val"),
        F.coalesce(F.get_json_object("props", "$.missing"), F.lit("dflt")).alias("with_default"),
    )


@query(
    "fn_concat_ws",
    "SELECT c_custkey, concat_ws('|', c_name, c_mktsegment) AS tag FROM customer",
)
def fn_concat_ws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat_ws (FunctionUtils.java:281-306)."""
    return load(spark, sf_dir, "customer").select(
        "c_custkey", F.concat_ws("|", "c_name", "c_mktsegment").alias("tag")
    )


@query(
    "fn_case_when",
    """
    SELECT CASE WHEN value > 100 THEN 'high' WHEN value > 10 THEN 'mid' ELSE 'low' END AS band,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY 1
    """,
)
def fn_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """caseIfFunc CASE WHEN (FunctionUtils.java:308-336)."""
    ev = load(spark, sf_dir, "events")
    band = (
        F.when(F.col("value") > 100, "high").when(F.col("value") > 10, "mid").otherwise("low").alias("band")
    )
    return ev.groupBy(band).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))


@query(
    "fn_type_cast",
    """
    SELECT CAST(l_quantity AS BIGINT) AS qty_int, count(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def fn_type_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """typeCast registry (FunctionUtils.java:346-353, TypeCast.java)."""
    return (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_quantity").cast("bigint").alias("qty_int"))
        .groupBy("qty_int")
        .agg(F.count("*").alias("n"))
    )


@query(
    "fn_rlike",
    """
    SELECT p_brand, count(*) AS n_color_parts
    FROM part WHERE regexp_matches(p_name, 'red|blue')
    GROUP BY p_brand
    """,
)
def fn_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rlike find-semantics (FunctionUtils.java:364-376; Spark rlike = find)."""
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").rlike("red|blue"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_color_parts"))
    )


@query(
    "fn_version_stamp",
    """
    SELECT event_id, strftime(ts, '%Y%m%d%H%M%S') AS ver_stamp FROM events
    """,
)
def fn_version_stamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """yyyyMMddHHmmss version stamps (P4 ProcessTimeColCreator / the
    timeVersionCol format, BasicRMListener.java:766-772)."""
    return load(spark, sf_dir, "events").select(
        "event_id", F.date_format("ts", "yyyyMMddHHmmss").alias("ver_stamp")
    )


@query("fn_md5", "SELECT doc_id, md5(text) AS fp FROM documents")
def fn_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MD5 column processor (P8, tis-index-builder columnProcessor)."""
    return load(spark, sf_dir, "documents").select("doc_id", F.md5("text").alias("fp"))


# --------------------------------------------------------------- K1: sharding


@query(
    "shard_pmod",
    "SELECT (o_orderkey % 16) AS shard, count(*) AS n FROM orders GROUP BY 1",
)
def shard_pmod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-mod column injection (K1, SqlRewriter.java:94-128)."""
    return (
        load(spark, sf_dir, "orders")
        .select(F.pmod("o_orderkey", F.lit(16)).alias("shard"))
        .groupBy("shard")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------- CDC in SQL


@query(
    "latest_per_key",
    """
    SELECT user_id, event_type AS last_type, round(value, 2) AS last_value, event_id AS last_event_id
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
)
def latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LWW keep-latest per key — the SQL-expressible core of V1/V3
    (per-PK coalescing + dirty check)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.round("value", 2).alias("last_value"),
            F.col("event_id").alias("last_event_id"),
        )
    )


@query(
    "first_op_sticky",
    """
    SELECT user_id, event_type AS first_type
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
)
def first_op_sticky(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADD-flag stickiness analog (V4): the first op per key decides the
    merge branch."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("first_type"))
    )


@query(
    "change_detection",
    """
    SELECT user_id, count(*) AS n_changes
    FROM (
      SELECT user_id, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ) t
    WHERE prev IS NOT NULL AND value <> prev
    GROUP BY user_id
    """,
)
def change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-detection predicate (P5: drop events whose focused column did
    not change — DefaultTable.columnChange:60-74)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev", F.lag("value").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("value") != F.col("prev")))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_changes"))
    )


@query(
    "topn_per_group",
    """
    SELECT o_custkey, o_orderkey, rnk
    FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    ) t WHERE rnk <= 3
    """,
)
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return ords.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 3).select(
        "o_custkey", "o_orderkey", "rnk"
    )


@query(
    "table_focus_filter",
    """
    SELECT event_type, count(*) AS n
    FROM events WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    """,
)
def table_focus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-focus filter (P6: drop events for non-focused tables)."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


@query(
    "events_tumbling_window",
    """
    SELECT date_trunc('hour', ts) AS win_start, event_type,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation — the batch shape of the
    Structured Streaming windowed agg (watermark + window) the CDC
    front-end uses; reference TimeCharacteristic.EventTime
    (tis-sql-parser/.../er/TimeCharacteristic.java:22)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "sum_value")
    )


@query(
    "fn_from_unixtime",
    """
    SELECT event_id,
           strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)), '%Y%m%d%H%M%S') AS ver
    FROM events
    """,
)
def fn_from_unixtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_unixtime(int(x), 'yyyyMMddHHmmss') — the column transfer the
    SQL rewriter injects for epoch-seconds columns
    (SqlTaskNodeMeta.java:878-895)."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.from_unixtime(F.unix_timestamp("ts"), "yyyyMMddHHmmss").alias("ver"),
    )


@query(
    "fn_coalesce_default",
    """
    SELECT event_id,
           coalesce(nullif(event_type, ''), 'NONE') AS type_d,
           round(coalesce(value, 0.0), 2) AS value_d
    FROM events
    """,
)
def fn_coalesce_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """defaultVal / defaultDoubleVal coalescing scalars
    (FunctionUtils.java:235-279)."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("")), F.lit("NONE")).alias("type_d"),
        F.round(F.coalesce(F.col("value"), F.lit(0.0)), 2).alias("value_d"),
    )


@query(
    "intersect_except_segments",
    """
    SELECT c_mktsegment, 'intersect' AS setop FROM (
      SELECT c_mktsegment FROM customer WHERE c_nationkey < 10
      INTERSECT
      SELECT c_mktsegment FROM customer WHERE c_acctbal > 5000
    )
    UNION ALL
    SELECT c_mktsegment, 'except' AS setop FROM (
      SELECT c_mktsegment FROM customer WHERE c_nationkey < 10
      EXCEPT
      SELECT c_mktsegment FROM customer WHERE c_acctbal > 5000
    )
    """,
)
def intersect_except_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operators (engine surplus: the reference's
    node types stop at UNION_SQL, NodeType.java:25 — intersect/except are
    absent from its SQL surface).  Catalyst plans both as aggregations
    over a tagged union — one shuffle each, no join."""
    cust = load(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_nationkey") < 10).select("c_mktsegment")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_mktsegment")
    return (
        a.intersect(b).withColumn("setop", F.lit("intersect"))
        .unionByName(a.subtract(b).withColumn("setop", F.lit("except")))
    )


@query(
    "fn_underline_naming",
    """
    SELECT DISTINCT c_mktsegment,
           'order' || upper(substr(lower(c_mktsegment), 1, 1))
                   || substr(lower(c_mktsegment), 2) AS camel_name,
           lower(regexp_replace(
             'order' || upper(substr(lower(c_mktsegment), 1, 1))
                     || substr(lower(c_mktsegment), 2),
             '([A-Z])', '_\\1', 'g')) AS underline_name
    FROM customer
    """,
)
def fn_underline_naming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 camel/underline naming conversion (UnderlineUtils.addUnderline /
    removeUnderline, BasicPojoConsumer.java:512-523) as actual column
    functions instead of a code convention: build a camelCase identifier,
    then the underline form via regexp.  The reverse direction
    (removeUnderline) is pinned by tests/test_round3.py round-trip."""
    cust = load(spark, sf_dir, "customer")
    low = F.lower(F.col("c_mktsegment"))
    camel = F.concat(
        F.lit("order"),
        F.upper(F.substring(low, 1, 1)),
        low.substr(F.lit(2), F.length(low)),
    )
    under = F.lower(F.regexp_replace(camel, "([A-Z])", "_$1"))
    return cust.select(
        "c_mktsegment", camel.alias("camel_name"), under.alias("underline_name")
    ).distinct()


def remove_underline(col):
    """underline_name -> camelName (UnderlineUtils.removeUnderline parity):
    split on '_', capitalize every part but the first, concatenate.  Pure
    Catalyst (transform + lambda), no UDF."""
    parts = F.split(col, "_")
    cap = F.transform(
        parts,
        lambda x, i: F.when(i == 0, x).otherwise(
            F.concat(F.upper(x.substr(F.lit(1), F.lit(1))), x.substr(F.lit(2), F.length(x)))
        ),
    )
    return F.array_join(cap, "")
