"""SQL-authored JOINER nodes — the reference's topology authoring surface.

In TIS a dataflow topology node carries user-authored SQL
(``NodeType.JOINER_SQL``; persisted/rewritten by ``SqlTaskNodeMeta`` —
tis-sql-parser/src/main/java/com/qlangtech/tis/sql/parser/SqlTaskNodeMeta.java:247-276,
``getRewriteSql``), and the build engine materializes the node by running
that SQL over the topology's source tables.  A user porting a TIS dataflow
therefore hands this engine a SQL string, not a Python callable.

``SqlWideNode`` is the thin adapter that closes this authoring gap: it is a
drop-in ``wide_fn`` for :class:`tis_spark.wide.WideRowPipeline` (and for
``full_build``) that registers whatever source slices the pipeline provides
— full tables on full build, semi-join-restricted slices on incremental
epochs — as temp views named exactly like the topology's tables, then lets
Catalyst plan the user SQL.  No SQL rewriting is needed on the Spark side:
the shard-mod/pt machinery the reference's ``SqlRewriter`` injects
(SqlRewriter.java:94-128) is subsumed by the lake layout (K1/K2/J2), and
predicate pushdown / join planning over the restricted views is Catalyst's
job, not string surgery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class SqlWideNode:
    """Adapt a user-authored node SQL string to the ``wide_fn`` contract
    (``dict[str, DataFrame] -> DataFrame``).

    The SQL may reference every table of the ER spec by name.  Views are
    registered for the duration of the call only: ``spark.sql`` resolves
    the plan eagerly, so the views are dropped before returning and the
    returned DataFrame stays valid.
    """

    def __init__(self, sql: str):
        self.sql = sql

    def __repr__(self) -> str:  # keeps pipeline logs readable
        head = " ".join(self.sql.split())[:60]
        return f"SqlWideNode({head}...)"

    def __call__(self, src: dict[str, DataFrame]) -> DataFrame:
        if not src:
            raise ValueError("SqlWideNode needs at least one source table")
        spark = next(iter(src.values())).sparkSession
        for name, df in src.items():
            df.createOrReplaceTempView(name)
        try:
            return spark.sql(self.sql)
        finally:
            for name in src:
                spark.catalog.dropTempView(name)
