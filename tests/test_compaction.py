"""Merge-on-read maintenance: auto-compaction must be invisible to
readers.  Replay the same stream with aggressive compaction (threshold 2,
several compactions mid-replay) and with compaction disabled, and diff
final state; also check the file layout actually shrank and tombstones
stay dead after compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tis_spark.cdc import CdcConfig, CdcIngest
from tis_spark.fixtures.gen import gen_page_changes


def _final(ing):
    df = ing.final_state().select(
        "url", F.unix_micros("warc_ts").alias("v"), "text", "lang", "fetch_status", "score"
    )
    return sorted(tuple(r) for r in df.collect())


def test_compaction_invisible_and_bounded(spark, tmp_path):
    changes = gen_page_changes(spark, 2000, seed=23, epoch_size=250).cache()
    cfgs = {
        "compacted": CdcConfig(fold_parallelism=8, compact_threshold=2),
        "uncompacted": CdcConfig(fold_parallelism=8, compact_threshold=10**9),
    }
    ings = {}
    for name, cfg in cfgs.items():
        ing = CdcIngest(spark, os.path.join(str(tmp_path), name), cfg)
        ing.replay(changes, epoch_size=250)
        ings[name] = ing
    changes.unpersist()

    assert _final(ings["compacted"]) == _final(ings["uncompacted"])

    snap_c = ings["compacted"].table.current_snapshot()
    snap_u = ings["uncompacted"].table.current_snapshot()
    # compaction actually ran and bounded the delta fan-in
    assert any("compaction" in s.summary for s in ings["compacted"].table.history())
    assert max(snap_c.delta_counts().values()) < max(snap_u.delta_counts().values())
    # base generations exist after compaction
    kinds = {e["kind"] for files in snap_c.files.values() for e in files}
    assert "base" in kinds

    # deletes stay dead: replay the same stream with delete policy into a
    # compacted table and ensure tombstoned keys don't resurrect
    cfg_d = CdcConfig(fold_parallelism=8, compact_threshold=2, delete_policy="delete")
    changes2 = gen_page_changes(spark, 2000, seed=23, epoch_size=250)
    ing_d = CdcIngest(spark, os.path.join(str(tmp_path), "deleting"), cfg_d)
    ing_d.replay(changes2, epoch_size=250)
    cfg_d2 = CdcConfig(fold_parallelism=8, compact_threshold=10**9, delete_policy="delete")
    ing_d2 = CdcIngest(spark, os.path.join(str(tmp_path), "deleting_u"), cfg_d2)
    ing_d2.replay(gen_page_changes(spark, 2000, seed=23, epoch_size=250), epoch_size=250)
    assert _final(ing_d) == _final(ing_d2)
