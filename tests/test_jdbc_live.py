"""LIVE multi-shard JDBC read (S1/J3, upgrading the plan-layer-only tests):
Apache Derby ships in Spark's own jar directory (it backs the Hive
metastore), so an embedded Derby database is a real JDBC endpoint inside
this sandbox — no network, no extra driver jar.

Two Derby databases stand in for two physical DB shards
(DataDumpers.create(jdbcUrls, table), DataDumpers.java:32-42): each holds
a slice of EMP; ``read_shards`` must union them, split each shard into
range-predicate partitions, and push the J3 extraSql pre-join down to the
database.
"""

from __future__ import annotations

import pytest


def _derby_exec(spark, url: str, statements: list[str]):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for s in statements:
            st.execute(s)
        st.close()
    finally:
        conn.close()


@pytest.fixture(scope="module")
def derby_shards(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("derby")
    urls = []
    for shard in range(2):
        url = f"jdbc:derby:{root}/shard{shard};create=true"
        rows = [
            f"({i}, 'emp{i}', {i % 3})"
            for i in range(shard * 10, shard * 10 + 10)
        ]
        _derby_exec(
            spark,
            url,
            [
                "CREATE TABLE emp (id INT PRIMARY KEY, name VARCHAR(32), dept INT)",
                "CREATE TABLE dept (dept INT PRIMARY KEY, dname VARCHAR(32))",
                *[f"INSERT INTO emp VALUES {r}" for r in rows],
                "INSERT INTO dept VALUES (0, 'd0'), (1, 'd1'), (2, 'd2')",
            ],
        )
        urls.append(url.replace(";create=true", ""))
    return urls


def test_live_multi_shard_union(spark, derby_shards):
    from tis_spark.sources.jdbc import read_shards

    df = read_shards(spark, derby_shards, "emp")
    rows = {r["ID"] for r in df.collect()}
    assert rows == set(range(20))  # both shards, no loss, no dup


def test_live_partitioned_read_covers_table(spark, derby_shards):
    from tis_spark.sources.jdbc import read_shards

    df = read_shards(
        spark,
        derby_shards,
        "emp",
        partition_column="id",
        lower_bound=0,
        upper_bound=20,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() >= 4  # range predicates became tasks
    assert sorted(r["ID"] for r in df.collect()) == list(range(20))


def test_live_extra_sql_prejoin(spark, derby_shards):
    """J3 dump-node pre-join: the JOIN executes inside Derby (derived
    table), Spark sees only the joined projection."""
    from tis_spark.sources.jdbc import read_shards

    df = read_shards(
        spark,
        derby_shards,
        table="emp",
        extra_sql="SELECT e.id, e.name, d.dname FROM emp e "
        "JOIN dept d ON e.dept = d.dept",
    )
    got = {(r["ID"], r["DNAME"]) for r in df.collect()}
    assert len(got) == 20
    assert all(dn in ("d0", "d1", "d2") for _, dn in got)


def test_live_filter_pushdown(spark, derby_shards):
    """Catalyst pushes the filter into each shard's JDBC query (the
    reference pushes predicates by hand into extraSql)."""
    from tis_spark.sources.jdbc import read_shards

    df = read_shards(spark, derby_shards, "emp").filter("id >= 15").select("ID")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "ID" in plan
    assert sorted(r["ID"] for r in df.collect()) == list(range(15, 20))
