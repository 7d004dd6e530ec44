"""Unit tests for the multi-shard JDBC plan layer (S1/S2/J3).

No JDBC driver jar ships in this sandbox, so the connecting read cannot
execute here (documented in tis_spark/sources/jdbc.py); what IS testable
— and what the reference's DataDumpers encodes — is the shard fan-out,
the derived-table pre-join, and the partition predicate generation whose
union must cover the table exactly.
"""

from __future__ import annotations

from tis_spark.sources.jdbc import _range_predicates, build_shard_plans


def test_one_plan_per_shard_url():
    urls = [f"jdbc:mysql://db{i}:3306/order" for i in range(4)]
    plans = build_shard_plans(urls, "totalpayinfo")
    assert [p.url for p in plans] == urls
    assert all(p.dbtable == "totalpayinfo" and p.predicates is None for p in plans)


def test_extra_sql_becomes_derived_table():
    plans = build_shard_plans(
        ["jdbc:mysql://db0/x"],
        "user",
        extra_sql="select * from USER u inner join Profile p on (u.id = p.user_id)",
    )
    assert plans[0].dbtable.startswith("(select * from USER u")
    assert plans[0].dbtable.endswith(") AS tis_dump")


def test_range_predicates_cover_table_exactly():
    preds = _range_predicates("id", 0, 1000, 4)
    assert len(preds) == 4
    # first partition catches below-lower and NULLs; last is open-ended
    assert "IS NULL" in preds[0] and preds[0].startswith("id < 250")
    assert preds[-1] == "id >= 750"
    # interior partitions are half-open and contiguous
    assert preds[1] == "id >= 250 AND id < 500"
    assert preds[2] == "id >= 500 AND id < 750"


def test_range_predicates_degenerate_cases():
    assert _range_predicates("id", 0, 0, 4) is None  # empty range
    assert _range_predicates("id", 0, 100, 1) is None  # single partition
    preds = _range_predicates("id", 0, 3, 10)  # more partitions than rows
    assert preds is not None and len(preds) <= 3


def test_sharded_partitioned_plan():
    plans = build_shard_plans(
        ["jdbc:mysql://db0/x", "jdbc:mysql://db1/x"],
        "orders",
        partition_column="o_id",
        lower_bound=0,
        upper_bound=10_000,
        num_partitions=8,
    )
    assert len(plans) == 2
    for p in plans:
        assert len(p.predicates) == 8
