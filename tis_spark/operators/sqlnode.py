"""SQL-authored JOINER node as a driver-gated query.

The reference's dataflow topologies are authored as SQL node text
(``NodeType.JOINER_SQL``; ``SqlTaskNodeMeta.getRewriteSql``,
tis-sql-parser/src/main/java/com/qlangtech/tis/sql/parser/SqlTaskNodeMeta.java:247-276),
so the engine must accept a SQL string as the wide query.  This gate query
proves the surface end-to-end with one twist: the SAME SQL string is both
the Spark node (executed through :class:`tis_spark.wide.sqlnode.SqlWideNode`
over temp-viewed sources) and the DuckDB oracle — dialect-neutral by
construction, so the driver hash-checks that the adapter adds or loses
nothing.

All aggregates are exact-integer (BIGINT counts, DECIMAL revenue floored to
BIGINT) so the value hash cannot drift on float formatting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tis_spark.operators import load, query

#: user-authored node SQL over the orders star — parses identically in
#: Spark SQL and DuckDB (shared subset: CTE, LEFT JOIN, CAST, DECIMAL
#: arithmetic, floor, coalesce)
WIDE_NODE_SQL = """
WITH li_agg AS (
  SELECT l_orderkey,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))))) AS BIGINT)
           AS revenue_floor
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderkey AS order_id,
       o.o_orderstatus AS status,
       c.c_name AS customer_name,
       c.c_mktsegment AS segment,
       coalesce(li.n_lines, 0) AS n_lines,
       coalesce(li.sum_qty, 0) AS sum_qty,
       coalesce(li.revenue_floor, 0) AS revenue_floor
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN li_agg li ON o.o_orderkey = li.l_orderkey
"""


@query("wide_sql_node", WIDE_NODE_SQL)
def wide_sql_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the user-authored node SQL through the SqlWideNode adapter —
    exactly the path a ported TIS topology takes (WideRowPipeline accepts
    the same string as ``wide_fn``; full replay parity is pinned by
    tests/test_round4.py::test_sql_node_replay_matches_oracle)."""
    from tis_spark.wide.sqlnode import SqlWideNode

    node = SqlWideNode(WIDE_NODE_SQL)
    return node(
        {
            "orders": load(spark, sf_dir, "orders"),
            "customer": load(spark, sf_dir, "customer"),
            "lineitem": load(spark, sf_dir, "lineitem"),
        }
    )
