"""Optimistic exec-lock (C8): a stale second writer must never
double-apply an epoch.

The reference serializes builders with a ZK exec-lock; the engine's
equivalent is optimistic concurrency — every publish passes the writer's
snapshot view as expected_snapshot_id, so a commit on top of a foreign
writer's state raises CommitConflict atomically (create-if-absent
snapshot ids as the backstop) instead of appending a duplicate epoch,
which would be visible (rectification ticks versions on re-applied
events — replay is NOT idempotent against mutated state).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tis_spark.cdc import CdcConfig, CdcIngest
from tis_spark.fixtures.gen import gen_page_changes
from tis_spark.lake.table import CommitConflict


def _key(df):
    return sorted(
        tuple(r)
        for r in df.select(
            "url", F.unix_micros("warc_ts").alias("v"), "fetch_status", "score"
        ).collect()
    )


def test_stale_second_writer_is_fenced(spark, tmp_table_dir):
    cfg = CdcConfig(fold_parallelism=4)
    changes = gen_page_changes(spark, 400, seed=5, epoch_size=400).cache()
    a = CdcIngest(spark, tmp_table_dir, cfg)
    b = CdcIngest(spark, tmp_table_dir, cfg)  # stale fence AND stale view
    a.process_epoch(changes, 0, final_flush=True)
    state = _key(a.final_state())

    with pytest.raises(CommitConflict):
        b.process_epoch(changes, 0, final_flush=True)
    # the conflicted writer changed nothing
    fresh = CdcIngest(spark, tmp_table_dir, cfg)
    assert _key(fresh.final_state()) == state

    # recovery protocol: restart -> re-read fence -> redelivered epoch skips
    assert fresh.process_epoch(changes, 0).get("skipped") is True
    assert _key(fresh.final_state()) == state


def test_stale_second_wide_writer_is_fenced(spark, tmp_table_dir):
    from tis_spark.fixtures.star import (
        gen_star_changes,
        initial_tables_spark,
        totalpay_spec,
    )
    from tis_spark.wide import WideRowPipeline
    from tis_spark.wide.totalpay import totalpay_wide

    spec = totalpay_spec()
    a = WideRowPipeline(spark, tmp_table_dir, spec, totalpay_wide)
    a.full_build(initial_tables_spark(spark, 40))
    changes = gen_star_changes(spark, 100, 40, seed=7, epoch_size=100).cache()
    b = WideRowPipeline(spark, tmp_table_dir, spec, totalpay_wide)  # snapshot view now
    a.replay(changes, epoch_size=100)  # advances every table behind b's back
    state = sorted(tuple(r) for r in a.final_wide().select("totalpay_id", "version").collect())
    with pytest.raises(CommitConflict):
        b.process_epoch(changes, 99)  # not fenced by epoch id, but stale view
    c = WideRowPipeline(spark, tmp_table_dir, spec, totalpay_wide)
    assert sorted(tuple(r) for r in c.final_wide().select("totalpay_id", "version").collect()) == state


def test_commit_expected_snapshot_guard(spark, tmp_table_dir):
    """The lake-level guard itself: commit/evolve against a stale parent id
    conflicts before publishing anything."""
    cfg = CdcConfig(fold_parallelism=4)
    ing = CdcIngest(spark, tmp_table_dir, cfg)
    ing.process_epoch(gen_page_changes(spark, 200, seed=6, epoch_size=200), 0, final_flush=True)
    t = ing.table
    n = len(t.history())
    with pytest.raises(CommitConflict):
        t.commit({}, summary={"x": 1}, expected_snapshot_id=0)
    assert len(t.history()) == n  # nothing published