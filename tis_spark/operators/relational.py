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
#
# The reference's scalar-function registry (FunctionUtils.java) is covered by
# two consolidated suite queries in a tall (fn, k, s_val, n_val) shape — one
# gate row each instead of 14 micro-queries (VERDICT r3 "What's missing" #3).
# Every branch keeps the exact expression the original micro-query pinned.

_SUITE_COLS = ("fn", "k", "s_val", "n_val")


def _branch(fn_name, df, k, s_val=None, n_val=None):
    """Reshape one scalar-fn exercise into the tall suite schema."""
    return df.select(
        F.lit(fn_name).alias("fn"),
        k.cast("string").alias("k"),
        (s_val if s_val is not None else F.lit(None)).cast("string").alias("s_val"),
        (n_val if n_val is not None else F.lit(None)).cast("long").alias("n_val"),
    )


@query(
    "fn_string_suite",
    """
    SELECT 'concat_instr' AS fn, CAST(o_orderkey AS VARCHAR) AS k,
           concat(o_orderpriority, '_', o_orderstatus) AS s_val,
           CAST(instr(o_orderpriority, '-') AS BIGINT) AS n_val
    FROM orders
    UNION ALL
    SELECT 'split_index', coalesce(string_split(p_type, ' ')[1], ''),
           CAST(NULL AS VARCHAR), CAST(count(*) AS BIGINT)
    FROM part GROUP BY 2
    UNION ALL
    SELECT 'get_json_object', event_id,
           concat_ws('|', coalesce(json_extract_string(props, '$.k'), 'NULL'),
                     coalesce(json_extract_string(props, '$.missing'), 'dflt')),
           CAST(NULL AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'concat_ws', CAST(c_custkey AS VARCHAR),
           concat_ws('|', c_name, c_mktsegment), CAST(NULL AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'rlike', p_brand, CAST(NULL AS VARCHAR), CAST(count(*) AS BIGINT)
    FROM part WHERE regexp_matches(p_name, 'red|blue') GROUP BY 2
    UNION ALL
    SELECT 'md5', CAST(doc_id AS VARCHAR), md5(text), CAST(NULL AS BIGINT)
    FROM documents
    UNION ALL
    SELECT DISTINCT 'underline_naming', c_mktsegment,
           concat_ws('|',
             'order' || upper(substr(lower(c_mktsegment), 1, 1))
                     || substr(lower(c_mktsegment), 2),
             lower(regexp_replace(
               'order' || upper(substr(lower(c_mktsegment), 1, 1))
                       || substr(lower(c_mktsegment), 2),
               '([A-Z])', '_\\1', 'g'))),
           CAST(NULL AS BIGINT)
    FROM customer
    """,
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/JSON/regex scalar-function suite — one tall result covering
    concat+instr (FunctionUtils.java:54-67), split + safe array subscript
    with ''-default (FunctionUtils.split:77-100, getArrayIndexProp:102-107),
    get_json_object + defaultVal coalesce (FunctionUtils.java:235-266),
    concat_ws (FunctionUtils.java:281-306), rlike find-semantics
    (FunctionUtils.java:364-376), the MD5 column processor (P8,
    tis-index-builder columnProcessor) and P7 camel/underline naming
    (UnderlineUtils.addUnderline, BasicPojoConsumer.java:512-523; the
    reverse direction is pinned by tests/test_round3.py)."""
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part")
    events = load(spark, sf_dir, "events")
    customer = load(spark, sf_dir, "customer")
    documents = load(spark, sf_dir, "documents")

    low = F.lower(F.col("c_mktsegment"))
    camel = F.concat(
        F.lit("order"),
        F.upper(F.substring(low, 1, 1)),
        low.substr(F.lit(2), F.length(low)),
    )
    under = F.lower(F.regexp_replace(camel, "([A-Z])", "_$1"))

    branches = [
        _branch(
            "concat_instr",
            orders,
            F.col("o_orderkey"),
            s_val=F.concat("o_orderpriority", F.lit("_"), "o_orderstatus"),
            n_val=F.instr("o_orderpriority", "-"),
        ),
        _branch(
            "split_index",
            part.select(
                F.coalesce(F.element_at(F.split("p_type", " "), 1), F.lit("")).alias("h")
            )
            .groupBy("h")
            .agg(F.count("*").alias("n")),
            F.col("h"),
            n_val=F.col("n"),
        ),
        _branch(
            "get_json_object",
            events,
            F.col("event_id"),
            s_val=F.concat_ws(
                "|",
                F.coalesce(F.get_json_object("props", "$.k"), F.lit("NULL")),
                F.coalesce(F.get_json_object("props", "$.missing"), F.lit("dflt")),
            ),
        ),
        _branch(
            "concat_ws",
            customer,
            F.col("c_custkey"),
            s_val=F.concat_ws("|", "c_name", "c_mktsegment"),
        ),
        _branch(
            "rlike",
            part.filter(F.col("p_name").rlike("red|blue"))
            .groupBy("p_brand")
            .agg(F.count("*").alias("n")),
            F.col("p_brand"),
            n_val=F.col("n"),
        ),
        _branch("md5", documents, F.col("doc_id"), s_val=F.md5("text")),
        _branch(
            "underline_naming",
            customer.select("c_mktsegment").distinct(),
            F.col("c_mktsegment"),
            s_val=F.concat_ws("|", camel, under),
        ),
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


@query(
    "fn_numeric_temporal_suite",
    """
    SELECT 'bitwise_and' AS fn, CAST(l_linenumber & 3 AS VARCHAR) AS k,
           CAST(NULL AS VARCHAR) AS s_val, CAST(count(*) AS BIGINT) AS n_val
    FROM lineitem GROUP BY 2
    UNION ALL
    SELECT 'round_half_up', l_orderkey || '-' || l_linenumber, CAST(NULL AS VARCHAR),
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2))), 1) * 10 AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'case_when',
           CASE WHEN value > 100 THEN 'high' WHEN value > 10 THEN 'mid' ELSE 'low' END,
           CAST(NULL AS VARCHAR), CAST(count(*) AS BIGINT)
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'type_cast', CAST(CAST(l_quantity AS BIGINT) AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(count(*) AS BIGINT)
    FROM lineitem GROUP BY 2
    UNION ALL
    SELECT 'version_stamp', event_id, strftime(ts, '%Y%m%d%H%M%S'), CAST(NULL AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'from_unixtime', event_id,
           strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)), '%Y%m%d%H%M%S'),
           CAST(NULL AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'coalesce_default', event_id,
           coalesce(nullif(event_type, ''), 'NONE'),
           CAST(round(round(coalesce(value, 0.0), 2) * 100) AS BIGINT)
    FROM events
    """,
)
def fn_numeric_temporal_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric/conditional/datetime scalar-function suite — one tall result
    covering op_and bitwise AND (FunctionUtils.java:69-75), round HALF_UP in
    DECIMAL so the tie is exact on both engines (FunctionUtils.java:199-204;
    emitted floor-scaled x10 as BIGINT for hash stability), caseIfFunc CASE
    WHEN (FunctionUtils.java:308-336), the typeCast registry
    (FunctionUtils.java:346-353, TypeCast.java), yyyyMMddHHmmss version
    stamps (P4 ProcessTimeColCreator, BasicRMListener.java:766-772),
    from_unixtime(int(x)) column transfer (SqlTaskNodeMeta.java:878-895) and
    defaultVal/defaultDoubleVal coalescing (FunctionUtils.java:235-279;
    the double emitted cent-scaled x100 as BIGINT)."""
    lineitem = load(spark, sf_dir, "lineitem")
    events = load(spark, sf_dir, "events")

    net10 = (
        F.round(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")),
            1,
        )
        * 10
    ).cast("long")
    band = (
        F.when(F.col("value") > 100, "high")
        .when(F.col("value") > 10, "mid")
        .otherwise("low")
        .alias("band")
    )

    branches = [
        _branch(
            "bitwise_and",
            lineitem.select(F.col("l_linenumber").bitwiseAND(F.lit(3)).alias("band"))
            .groupBy("band")
            .agg(F.count("*").alias("n")),
            F.col("band"),
            n_val=F.col("n"),
        ),
        _branch(
            "round_half_up",
            lineitem,
            F.concat_ws("-", "l_orderkey", "l_linenumber"),
            n_val=net10,
        ),
        _branch(
            "case_when",
            events.groupBy(band).agg(F.count("*").alias("n")),
            F.col("band"),
            n_val=F.col("n"),
        ),
        _branch(
            "type_cast",
            lineitem.select(F.col("l_quantity").cast("bigint").alias("q"))
            .groupBy("q")
            .agg(F.count("*").alias("n")),
            F.col("q"),
            n_val=F.col("n"),
        ),
        _branch(
            "version_stamp",
            events,
            F.col("event_id"),
            s_val=F.date_format("ts", "yyyyMMddHHmmss"),
        ),
        _branch(
            "from_unixtime",
            events,
            F.col("event_id"),
            s_val=F.from_unixtime(F.unix_timestamp("ts"), "yyyyMMddHHmmss"),
        ),
        _branch(
            "coalesce_default",
            events,
            F.col("event_id"),
            s_val=F.coalesce(F.nullif("event_type", F.lit("")), F.lit("NONE")),
            n_val=F.round(F.round(F.coalesce(F.col("value"), F.lit(0.0)), 2) * 100).cast(
                "long"
            ),
        ),
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


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
