"""The hybrid (Catalyst singles + pandas multis) fold must be
indistinguishable from the all-pandas fold: same final table, same
counters, same lineage.  Replays the same generated binlog through both
modes and diffs everything."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tis_spark.cdc import CdcConfig, CdcIngest
from tis_spark.fixtures.gen import gen_page_changes


@pytest.mark.parametrize("policy", ["ignore", "delete"])
def test_hybrid_matches_pandas_fold(spark, tmp_path, policy):
    changes = gen_page_changes(spark, 1500, seed=11, epoch_size=500).cache()
    finals = {}
    counters = {}
    for mode in ("hybrid", "pandas"):
        cfg = CdcConfig(fold_parallelism=8, fold_mode=mode, delete_policy=policy)
        ing = CdcIngest(spark, os.path.join(str(tmp_path), mode + policy), cfg)
        ing.replay(changes, epoch_size=500)
        df = ing.final_state().select(
            "url", F.unix_micros("warc_ts").alias("v"), "text", "lang", "fetch_status", "score"
        )
        finals[mode] = sorted(tuple(r) for r in df.collect())
        m = ing.metrics().groupBy().sum("n_events", "n_applied", "n_rectified", "n_dirty",
                                        "n_noop", "n_missing", "n_sticky_insert").first()
        counters[mode] = tuple(m)
    changes.unpersist()
    assert counters["hybrid"] == counters["pandas"]
    assert len(finals["hybrid"]) == len(finals["pandas"])
    assert finals["hybrid"] == finals["pandas"]
