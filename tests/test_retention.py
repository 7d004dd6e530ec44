"""Bulk retention purge (LakeTable.delete_where): one fenced tombstone
epoch — the GDPR/domain-erasure/TTL path — that every changelog consumer
(replica, derived index, exact-extrema materialized view) absorbs as
ordinary deletes through its normal O(changed keys) sync/refresh, with
zero purge-specific code downstream."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import tis_spark.operators.indexing  # noqa: F401 — registers transforms
from tis_spark.lake.derived import TRANSFORMS, DerivedIndex
from tis_spark.lake.matview import MaterializedView
from tis_spark.lake.replica import TableReplica
from tis_spark.lake.table import COMMIT_COL, DEAD_COL, CommitConflict, LakeTable

SRC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("domain", T.StringType()),
        T.StructField("score", T.LongType()),
    ]
)


def _mk_source(spark, path):
    return LakeTable.create(
        spark, path, SRC_SCHEMA, key_cols=["doc_id"], version_col="score"
    )


def _apply(spark, t, epoch, upserts, deletes=()):
    names = [f.name for f in SRC_SCHEMA.fields]
    rows = [
        {**dict(zip(names, vals)), DEAD_COL: False} for vals in upserts
    ] + [{**{n: None for n in names}, "doc_id": d, DEAD_COL: True} for d in deletes]
    df = spark.createDataFrame(
        pd.DataFrame(rows)[names + [DEAD_COL]],
        T.StructType(list(SRC_SCHEMA.fields) + [T.StructField(DEAD_COL, T.BooleanType())]),
    )
    df = df.withColumn(COMMIT_COL, F.lit(epoch).cast("long")).withColumn(
        "_bucket", t.bucket_expr()
    )
    t.commit(t.write_data_files(df, kind="delta"), summary={"epoch_id": epoch})


def _state(df):
    return sorted(tuple(r) for r in df.collect())


def test_purge_cascades_to_all_consumers(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    rows0 = [
        (i, f"tok{i % 7} shared fox", ["good.com", "bad.com", "meh.net"][i % 3], i)
        for i in range(30)
    ]
    _apply(spark, src, 0, rows0)

    rep = TableReplica.create(spark, str(tmp_path / "rep"), src)
    rep.bootstrap()
    idx = DerivedIndex.create(
        spark, str(tmp_path / "idx"), src, "token_postings", ["doc_id", "tok"]
    )
    idx.bootstrap()
    mv = MaterializedView.create(
        spark,
        str(tmp_path / "mv"),
        src,
        ["domain"],
        {"n_docs": ("count", None), "max_score": ("max", "score")},
        exact_extrema=True,
    )
    mv.full_build()

    # ordinary traffic first, so the purge lands mid-stream
    _apply(spark, src, 1, [(1, "updated fox", "bad.com", 100), (40, "fresh", "bad.com", 40)])
    rep.sync(), idx.sync(), mv.refresh()

    out = src.delete_where(F.col("domain") == "bad.com", summary={"reason": "erasure"})
    n_bad = sum(1 for r in rows0 if r[2] == "bad.com") + 1  # +doc 40; doc 1 moved in
    assert out["deleted_rows"] == n_bad
    assert src.read().filter(F.col("domain") == "bad.com").count() == 0

    # every consumer absorbs the purge through its normal path
    rep.sync(), idx.sync(), mv.refresh()
    assert _state(rep.read()) == _state(src.read())
    assert _state(idx.read()) == _state(TRANSFORMS["token_postings"](src.read()))
    view = {r["domain"]: r for r in mv.read().collect()}
    assert "bad.com" not in view  # group died with the purge
    want = {
        r["domain"]: r
        for r in src.read()
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("score").alias("max_score"),
        )
        .collect()
    }
    assert {g: (v["n_docs"], v["max_score"]) for g, v in view.items()} == {
        g: (v["n_docs"], v["max_score"]) for g, v in want.items()
    }

    # no-match purge is a no-op: no commit, no watermark movement
    before = src.current_snapshot().snapshot_id
    assert src.delete_where(F.col("domain") == "absent.org") == {
        "deleted_rows": 0,
        "commit": None,
    }
    assert src.current_snapshot().snapshot_id == before

    # compaction folds the purge tombstones away; the consumer absorbs
    # the metadata-only advance and stays settled
    src.compact(list(range(src.current_snapshot().num_buckets)))
    out = rep.sync()
    assert out["up_to_date"] is False  # watermark advances over the compaction
    assert _state(rep.read()) == _state(src.read())
    assert rep.sync()["up_to_date"] is True


def test_purge_is_fenced_and_audited(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [(1, "a", "x.com", 1), (2, "b", "y.com", 2)])
    stale = src.current_snapshot().snapshot_id
    _apply(spark, src, 1, [(3, "c", "x.com", 3)])
    with pytest.raises(CommitConflict):
        src.delete_where(F.col("domain") == "x.com", expected_snapshot_id=stale)
    out = src.delete_where(F.col("domain") == "x.com")
    assert out["deleted_rows"] == 2
    # audit trail: the purge commit records its row count + commit stamp,
    # but NO epoch_id — the stream fence must not move (see below)
    top = src.history()[-1].summary
    assert top["purge_rows"] == 2 and top["purge_commit"] == out["commit"]
    assert "epoch_id" not in top
    assert src.last_epoch_id() == 1  # fence still at the last stream epoch


def test_purge_on_layout_table_tombstones_land_in_current_bucket(spark, tmp_path):
    """On a layout-clustered table a purge tombstone must shadow the
    row's LIVE copy — for a relocated row that is the destination
    bucket, not the key's original one."""
    from tests.test_fk_layout import _append_delta, _bucket_of, _dest_fk, _mk_lake

    lake = _mk_lake(spark, str(tmp_path / "lake"))
    dest = _dest_fk(spark, lake)
    # relocate r003 from p3 to dest (live copy + old-bucket tombstone)
    _append_delta(spark, lake, [("r003", dest, 100, False), ("r003", "p3", None, True)])

    out = lake.delete_where(F.col("val") >= 100)  # predicate on a non-layout column
    assert out["deleted_rows"] == 1
    assert lake.read().filter(F.col("id") == "r003").count() == 0
    for b in (_bucket_of(spark, lake, "p3"), _bucket_of(spark, lake, dest)):
        assert lake.read(buckets=[b]).filter(F.col("id") == "r003").count() == 0
    # purge a whole parent group by the layout key (the domain-purge shape)
    n_p5 = lake.read().filter(F.col("fk") == "p5").count()
    assert lake.delete_where(F.col("fk") == "p5")["deleted_rows"] == n_p5
    assert lake.read().filter(F.col("fk") == "p5").count() == 0
    # compactions on every bucket keep the purge folded (no resurrections)
    lake.compact(list(range(lake.current_snapshot().num_buckets)))
    assert lake.read().filter(F.col("id") == "r003").count() == 0
    assert lake.read().filter(F.col("fk") == "p5").count() == 0


def test_purge_mid_stream_does_not_break_the_ingest_fence(spark, tmp_path):
    """The trap this design avoids: stream epoch ids are seq-derived, so
    a purge that consumed `last_epoch_id + 1` would make the exactly-once
    fence silently DROP the next stream epoch.  Purge commits therefore
    carry no epoch_id: replaying the second half after a mid-stream purge
    must fold every remaining epoch — non-purged keys finish byte-equal
    to an unpurged control replay, purged keys stay gone unless the
    second half re-writes them (alive-over-dead at the shared commit
    stamp resolves the collision in the stream's favor)."""
    from tis_spark.cdc import CdcConfig, CdcIngest
    from tis_spark.fixtures.gen import gen_page_changes

    changes = gen_page_changes(spark, 2000, seed=31, epoch_size=500).cache()
    cfg = CdcConfig(fold_parallelism=8)

    def window(i):
        return changes.filter((F.col("seq") > i * 500) & (F.col("seq") <= (i + 1) * 500))

    # explicit (lo, hi] seq windows on BOTH tables so the split and the
    # control fold identical event sets per epoch (CLAUDE.md split-replay
    # trap: a delivery split re-times disorder stragglers)
    ing = CdcIngest(spark, str(tmp_path / "pages"), cfg)
    for i in range(2):
        ing.process_epoch(window(i), i, final_flush=True)
    victim = (
        ing.final_state().groupBy("lang").count().orderBy(F.desc("count")).first()["lang"]
    )
    purged_keys = {
        r["url"] for r in ing.final_state().filter(F.col("lang") == victim).collect()
    }
    out = ing.table.delete_where(F.col("lang") == victim)
    assert out["deleted_rows"] == len(purged_keys) > 0
    # the running writer's C8 view-fence rejects resuming over the purge
    # (it IS a concurrent commit from the engine's perspective) — the
    # operational pattern is quiesce -> purge -> resume with a fresh writer
    from tis_spark.lake.table import CommitConflict

    with pytest.raises(CommitConflict):
        ing.process_epoch(window(2), 2, final_flush=True)
    ing = CdcIngest(spark, str(tmp_path / "pages"), cfg)
    for i in range(2, 4):
        ing.process_epoch(window(i), i, final_flush=True)

    ctl = CdcIngest(spark, str(tmp_path / "ctl"), cfg)
    for i in range(4):
        ctl.process_epoch(window(i), i, final_flush=True)

    final = {r["url"]: r for r in ing.final_state().collect()}
    control = {r["url"]: r for r in ctl.final_state().collect()}
    rewritten = {
        r["url"]
        for r in ctl.final_state()
        .join(
            changes.filter(F.col("seq") > 1000)
            .select(F.col("after.url").alias("url"))
            .filter(F.col("url").isNotNull())
            .distinct(),
            "url",
            "left_semi",
        )
        .collect()
    }
    # every non-purged key folded the second half exactly like the control
    for url, row in control.items():
        if url in purged_keys and url not in rewritten:
            assert url not in final, url  # purged, never rewritten -> gone
        elif url not in purged_keys:
            assert url in final and tuple(final[url]) == tuple(row), url
    # purged keys the second half re-wrote survive the commit collision
    for url in purged_keys & rewritten & set(final):
        assert final[url][ctl.final_state().columns.index("url")] == url
    assert purged_keys & rewritten & set(final), "fixture must exercise rebirth"


def test_streaming_purge_between_batches_resumes_on_same_checkpoint(spark, tmp_path):
    """StreamingCdc.purge between micro-batch runs: the purge rides the
    writer's own view (no CommitConflict, no writer re-creation), the
    stream epoch fence is untouched so the second half of the chunk
    stream folds normally on the SAME checkpoint, and the attached view
    retracts the purged rows immediately."""
    import shutil as _sh
    import tempfile as _tf

    from tis_spark.cdc import CdcConfig
    from tis_spark.fixtures.gen import gen_page_changes
    from tis_spark.lake.matview import MaterializedView
    from tis_spark.streaming import StreamingCdc, write_stream_chunks

    stage = _tf.mkdtemp(prefix="tis-spurge-stage-")
    src_dir = _tf.mkdtemp(prefix="tis-spurge-src-")
    table_dir = str(tmp_path / "pages")
    try:
        changes = gen_page_changes(spark, 1200, seed=13, epoch_size=300)
        n = write_stream_chunks(changes, stage, chunk_size=300)
        assert n >= 4
        h = n // 2
        import os as _os

        def move(rng):
            for i in rng:
                _sh.move(
                    _os.path.join(stage, f"chunk-{i:06d}.parquet"),
                    _os.path.join(src_dir, f"chunk-{i:06d}.parquet"),
                )

        move(range(h))
        s = StreamingCdc(spark, src_dir, table_dir, CdcConfig(fold_parallelism=8, delete_policy="delete"))
        mv = MaterializedView.create(
            spark,
            table_dir + "_mv",
            s.ingest.table,
            ["lang"],
            {"n_pages": ("count", None)},
        )
        mv.full_build()
        s.views.append(mv)
        assert s.run_available(max_files_per_trigger=1)
        s.drain()

        victim = (
            s.final_state().groupBy("lang").count().orderBy(F.desc("count")).first()["lang"]
        )
        n_victim = s.final_state().filter(F.col("lang") == victim).count()
        fence_before = s.ingest.table.last_epoch_id()
        out = s.purge(F.col("lang") == victim)
        assert out["deleted_rows"] == n_victim > 0
        assert s.ingest.table.last_epoch_id() == fence_before  # fence untouched
        # the attached view retracted immediately (group died)
        assert victim not in {r["lang"] for r in mv.read().collect()}

        # resume on the same checkpoint — second half folds normally
        move(range(h, n))
        assert s.run_available(max_files_per_trigger=1)
        s.drain()
        state = s.final_state()
        assert state.count() > 0
        # view still tracks the final folded state exactly
        got = {r["lang"]: r["n_pages"] for r in mv.read().collect()}
        want = {
            r["lang"]: r["cnt"]
            for r in state.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("cnt")).collect()
        }
        assert got == want
        # second-half data definitely landed (keys beyond the purge exist)
        assert state.filter(F.col("lang") == victim).count() >= 0
    finally:
        _sh.rmtree(stage, ignore_errors=True)
        _sh.rmtree(src_dir, ignore_errors=True)
