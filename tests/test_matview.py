"""Incremental materialized-view maintenance (lake/matview.py).

Ground truth everywhere: after each refresh the view must equal a full
groupBy recompute over the source's current state — under inserts,
value-updates, group-moving updates, deletes (group death + rebirth),
all-null sum groups, min/max retractions, compaction inside the refresh
window, mid-window DDL, and a raced concurrent writer.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tis_spark.lake.matview import MaterializedView
from tis_spark.lake.table import COMMIT_COL, DEAD_COL, CommitConflict, LakeTable

SRC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("grp", T.StringType()),
        T.StructField("val", T.LongType()),
    ]
)

AGGS = {
    "n_rows": ("count", None),
    "sum_val": ("sum", "val"),
    "min_val": ("min", "val"),
    "max_val": ("max", "val"),
}


def _mk_source(spark, path):
    return LakeTable.create(spark, path, SRC_SCHEMA, key_cols=["id"], version_col="val")


def _apply(spark, t, epoch, upserts, deletes=()):
    """One engine-shaped delta commit: upserts = [(id, grp, val)]."""
    rows = [
        {"id": i, "grp": g, "val": v, DEAD_COL: False} for i, g, v in upserts
    ] + [{"id": i, "grp": None, "val": None, DEAD_COL: True} for i in deletes]
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        T.StructType(list(SRC_SCHEMA.fields) + [T.StructField(DEAD_COL, T.BooleanType())]),
    )
    df = df.withColumn(COMMIT_COL, F.lit(epoch).cast("long")).withColumn(
        "_bucket", t.bucket_expr()
    )
    t.commit(t.write_data_files(df, kind="delta"), summary={"epoch_id": epoch})


def _recompute(src):
    return (
        src.read()
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("val").alias("sum_val"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
    )


def _assert_view_equals_recompute(mv, src):
    got = mv.read().orderBy("grp").toPandas()
    want = _recompute(src).orderBy("grp").toPandas()
    got = got.astype(object).where(pd.notna(got), None)
    want = want.astype(object).where(pd.notna(want), None)
    assert got.to_dict("records") == want.to_dict("records")


def test_matview_tracks_recompute_through_all_mutation_shapes(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [("a1", "x", 5), ("a2", "x", 9), ("b1", "y", 3)])
    mv = MaterializedView.create(spark, str(tmp_path / "mv"), src, ["grp"], AGGS)
    mv.full_build()
    _assert_view_equals_recompute(mv, src)

    # inserts + in-group value update (max retraction: 9 -> 1)
    _apply(spark, src, 1, [("a3", "x", 2), ("a2", "x", 1), ("c1", "z", 7)])
    assert mv.refresh()["groups"] == 2
    _assert_view_equals_recompute(mv, src)

    # group-moving update (x -> y) retracts x's min (a3=2 leaves)
    _apply(spark, src, 2, [("a3", "y", 2)])
    mv.refresh()
    _assert_view_equals_recompute(mv, src)

    # group death (z empties) + all-null-sum group appears
    _apply(spark, src, 3, [("n1", "w", None), ("n2", "w", None)], deletes=["c1"])
    mv.refresh()
    _assert_view_equals_recompute(mv, src)
    view = {r["grp"]: r for r in mv.read().collect()}
    assert "z" not in view
    assert view["w"]["sum_val"] is None and view["w"]["n_rows"] == 2

    # rebirth of the dead group, null gains a value
    _apply(spark, src, 4, [("c9", "z", 11), ("n1", "w", 4)])
    mv.refresh()
    _assert_view_equals_recompute(mv, src)

    # idempotent: nothing new -> no-op, state unchanged
    before = mv.table.current_snapshot().snapshot_id
    assert mv.refresh()["up_to_date"]
    assert mv.table.current_snapshot().snapshot_id == before


def test_matview_multi_epoch_window_and_compaction(spark, tmp_path):
    """One refresh spanning several source epochs AND a compaction (the
    changelog's delete fallback path) must land on the recompute."""
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [(f"k{i}", "g" + str(i % 3), i) for i in range(12)])
    mv = MaterializedView.create(spark, str(tmp_path / "mv"), src, ["grp"], AGGS)
    mv.full_build()

    _apply(spark, src, 1, [("k1", "g9", 100)], deletes=["k2", "k5"])
    src.compact(list(range(src.current_snapshot().num_buckets)))
    _apply(spark, src, 2, [("k3", "g0", -7)], deletes=["k8"])
    stats = mv.refresh()
    assert not stats["up_to_date"]
    _assert_view_equals_recompute(mv, src)


def test_matview_reload_from_disk_and_metadata_only_advance(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [("a", "x", 1), ("b", "y", 2)])
    MaterializedView.create(spark, str(tmp_path / "mv"), src, ["grp"], AGGS).full_build()

    # a fresh instance loads spec + watermark from disk
    mv = MaterializedView(spark, str(tmp_path / "mv"))
    # source snapshot advances without a logical change (compaction only)
    src.compact(list(range(src.current_snapshot().num_buckets)))
    stats = mv.refresh()
    assert stats["groups"] == 0 and not stats["up_to_date"]
    _assert_view_equals_recompute(mv, src)
    assert mv.refresh()["up_to_date"]


def test_matview_refresh_is_fenced(spark, tmp_path, monkeypatch):
    """A commit racing into the view between refresh's read and publish
    must abort the publish (CommitConflict); the retry applies exactly
    once."""
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [("a", "x", 1)])
    mv = MaterializedView.create(spark, str(tmp_path / "mv"), src, ["grp"], AGGS)
    mv.full_build()
    _apply(spark, src, 1, [("b", "x", 10), ("c", "y", 3)])

    real_commit = LakeTable.commit
    state = {"raced": False}

    def racing(self, files, replaced_buckets=None, summary=None, expected_snapshot_id=None):
        if self.path == mv.table.path and not state["raced"]:
            state["raced"] = True
            real_commit(self, {}, summary={"note": "concurrent"})
        return real_commit(
            self,
            files,
            replaced_buckets=replaced_buckets,
            summary=summary,
            expected_snapshot_id=expected_snapshot_id,
        )

    monkeypatch.setattr(LakeTable, "commit", racing)
    with pytest.raises(CommitConflict):
        mv.refresh()
    monkeypatch.undo()

    mv.refresh()
    _assert_view_equals_recompute(mv, src)
    # watermark advanced exactly once past the race
    assert mv._last_source_snapshot() == src.current_snapshot().snapshot_id


def test_matview_over_cdc_engine_with_mid_window_ddl(spark, tmp_path):
    """View over the real CDC engine table: build mid-replay (after the
    fetch_status DDLs), refresh across epochs that contain the score
    ADD/WIDEN DDLs and engine deletes; every refresh equals recompute."""
    from tis_spark.cdc import CdcConfig, CdcIngest
    from tis_spark.fixtures.gen import gen_page_changes

    ing = CdcIngest(
        spark, str(tmp_path / "pages"), CdcConfig(fold_parallelism=4, delete_policy="delete")
    )
    changes = gen_page_changes(spark, 2000, seed=7, epoch_size=400).cache()
    for i in range(3):  # DDLs 1-3 land at seqs 400/800/1200
        ing.process_epoch(
            changes.filter((F.col("seq") > i * 400) & (F.col("seq") <= (i + 1) * 400)),
            i,
            final_flush=True,
        )
    mv = MaterializedView.create(
        spark,
        str(tmp_path / "mv"),
        ing.table,
        ["lang"],
        {
            "n_pages": ("count", None),
            "sum_status": ("sum", "fetch_status"),
            "min_ts": ("min", "warc_ts"),
            "max_status": ("max", "fetch_status"),
        },
    )
    mv.full_build()
    for i in range(3, 5):  # score DDLs (seqs 1600) inside these windows
        ing.process_epoch(
            changes.filter((F.col("seq") > i * 400) & (F.col("seq") <= (i + 1) * 400)),
            i,
            final_flush=True,
        )
        mv.refresh()
        got = mv.read().orderBy("lang").toPandas()
        want = (
            ing.table.read()
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_pages"),
                F.sum("fetch_status").alias("sum_status"),
                F.min("warc_ts").alias("min_ts"),
                F.max("fetch_status").alias("max_status"),
            )
            .orderBy("lang")
            .toPandas()
        )
        got = got.astype(object).where(pd.notna(got), None)
        want = want.astype(object).where(pd.notna(want), None)
        assert got.to_dict("records") == want.to_dict("records")
    changes.unpersist()


def test_matview_long_run_with_compaction(spark, tmp_path):
    """30 refresh epochs with compact_every=10: state equals recompute at
    every step, the view's file count stays bounded (compaction folds the
    per-refresh deltas), and the compaction inside later refresh windows
    does not disturb the watermark chain."""
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [(f"k{i}", "g" + str(i % 5), i) for i in range(40)])
    mv = MaterializedView.create(spark, str(tmp_path / "mv"), src, ["grp"], AGGS)
    mv.full_build()

    def file_count():
        snap = mv.table.current_snapshot()
        return sum(len(v) for v in snap.files.values())

    counts = []
    for e in range(1, 31):
        ups = [(f"k{(e * 7 + j) % 40}", "g" + str((e + j) % 5), e * 100 + j) for j in range(4)]
        dels = [f"k{(e * 11) % 40}"] if e % 3 == 0 else []
        ups = [u for u in ups if u[0] not in dels]
        _apply(spark, src, e, ups, deletes=dels)
        mv.refresh(compact_every=10)
        counts.append(file_count())
        if e % 10 == 0:
            _assert_view_equals_recompute(mv, src)
    _assert_view_equals_recompute(mv, src)
    # compaction keeps growth bounded: after each compact the count drops
    # back to ~one base generation
    assert min(counts[10:]) < max(counts[:10]), counts
    assert counts[-1] < 3 * counts[9], counts
