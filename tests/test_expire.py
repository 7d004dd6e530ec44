"""Snapshot/data-file expiration (lake GC) preserves state, fencing and
recovery while actually reclaiming superseded generations.

A continuous ingest strands a full base generation per compaction plus a
reorder-buffer state dir per epoch; expire_snapshots() is the maintenance
call that bounds both.  The invariants under test:

* final table state is byte-identical after GC;
* the exactly-once fence survives (a re-delivered full replay is a no-op);
* recovery state (reorder buffer, watermark horizon) survives — ingest can
  continue on top of an expired table;
* time travel to retained snapshots still works, expired ids raise.
"""

from __future__ import annotations

import os

import pytest

from tis_spark.cdc import CdcConfig, CdcIngest
from tis_spark.fixtures.gen import gen_page_changes


def _n_parquet(root: str) -> int:
    return sum(
        1 for dp, _, fns in os.walk(root) for f in fns if f.endswith(".parquet")
    )


def _state_key(rows):
    return sorted((r["url"], r["warc_ts"], r["fetch_status"], r["score"]) for r in rows)


def test_inline_expiry_matches_unexpired_replay(spark, tmp_table_dir):
    """expire_every_n_epochs GC mid-replay never changes the final state
    and keeps history/storage bounded while the stream runs."""
    changes = gen_page_changes(spark, 3000, seed=33, epoch_size=300).cache()
    plain = CdcIngest(
        spark, os.path.join(tmp_table_dir, "plain"), CdcConfig(fold_parallelism=8)
    )
    plain.replay(changes, epoch_size=300)
    gc = CdcIngest(
        spark,
        os.path.join(tmp_table_dir, "gc"),
        CdcConfig(
            fold_parallelism=8,
            compact_threshold=2,
            expire_every_n_epochs=2,
            expire_keep_last=2,
        ),
    )
    gc.replay(changes, epoch_size=300)
    assert _state_key(gc.final_state().collect()) == _state_key(
        plain.final_state().collect()
    )
    assert len(gc.table.history()) < len(plain.table.history())
    # storage bounded too: GC'd table holds fewer data files despite the
    # extra compactions its config forces
    assert _n_parquet(os.path.join(tmp_table_dir, "gc", "data")) <= _n_parquet(
        os.path.join(tmp_table_dir, "plain", "data")
    ) + 16


def test_expire_snapshots_gc(spark, tmp_table_dir):
    cfg = CdcConfig(fold_parallelism=8, compact_threshold=2)  # frequent compaction
    changes = gen_page_changes(spark, 4000, seed=21, epoch_size=500).cache()
    ing = CdcIngest(spark, tmp_table_dir, cfg)
    ing.replay(changes, epoch_size=500)
    t = ing.table

    hist_before = len(t.history())
    files_before = _n_parquet(os.path.join(tmp_table_dir, "data"))
    state_before = _state_key(ing.final_state().collect())
    assert hist_before > 4  # several epochs + compactions + DDLs happened

    # dry run reports work but touches nothing
    rep = t.expire_snapshots(keep_last=2, dry_run=True)
    assert rep["deleted_files"] > 0 and rep["expired_snapshots"] > 0
    assert _n_parquet(os.path.join(tmp_table_dir, "data")) == files_before
    assert len(t.history()) == hist_before

    rep = t.expire_snapshots(keep_last=2)
    assert rep["deleted_files"] > 0
    assert rep["freed_bytes"] > 0
    assert rep["deleted_state_dirs"] > 0
    assert _n_parquet(os.path.join(tmp_table_dir, "data")) < files_before
    assert len(t.history()) == len(rep["retained_snapshots"]) <= 3

    # state identical after GC
    assert _state_key(ing.final_state().collect()) == state_before

    # dead write dirs are actually swept (incl. Hadoop .crc/_SUCCESS
    # sidecars): every remaining leaf dir still holds live parquet
    for dp, dns, fns in os.walk(os.path.join(tmp_table_dir, "data")):
        if not dns and fns:
            assert any(f.endswith(".parquet") for f in fns), (dp, fns)

    # time travel: every retained snapshot readable, expired ids raise
    for sid in rep["retained_snapshots"]:
        t.read(snapshot_id=sid).count()
    expired_id = rep["retained_snapshots"][0] - 1
    if expired_id >= 0:
        with pytest.raises(FileNotFoundError):
            t.snapshot(expired_id)

    # exactly-once fence survives GC: a re-delivered full replay is a no-op
    ing2 = CdcIngest(spark, tmp_table_dir, cfg)
    ing2.replay(changes, epoch_size=500)
    assert _state_key(ing2.final_state().collect()) == state_before

    # ingest continues on top of the expired table (recovery state intact):
    # a fresh drain epoch loads the (GC-retained) pending reorder buffer and
    # commits on top of the expired history without error or state change.
    from tis_spark.fixtures.gen import CHANGE_SCHEMA

    last = ing2.table.last_epoch_id()
    empty = spark.createDataFrame([], CHANGE_SCHEMA)
    ing2.process_epoch(empty, last + 1, final_flush=True)
    assert _state_key(ing2.final_state().collect()) == state_before
