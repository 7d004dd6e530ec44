"""Source connectors: multi-shard JDBC dump reads (S1/S2/J3)."""

from tis_spark.sources.jdbc import ShardPlan, build_shard_plans, read_shards

__all__ = ["ShardPlan", "build_shard_plans", "read_shards"]
