"""Incremental table->table replication (lake/replica.py): a second lake
table maintained purely from ``changes()`` of the first — the reference's
full-copy index backflow (IndexBackFlowInterceptor) made incremental.
Pins the changelog's classify=False idempotent-MERGE consumer contract
end-to-end: replica state == source state after a multi-epoch replay with
updates, deletes, insert+delete-inside-a-window, a mid-stream DDL and a
re-sharded replica; duplicate syncs are watermark no-ops."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tis_spark.lake.replica import TableReplica
from tis_spark.lake.table import COMMIT_COL, DEAD_COL, LakeTable

SRC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("domain", T.StringType()),
        T.StructField("score", T.LongType()),
    ]
)


def _mk_source(spark, path, **kw):
    return LakeTable.create(
        spark, path, SRC_SCHEMA, key_cols=["url"], version_col="score", **kw
    )


def _apply(spark, t, epoch, upserts, deletes=(), schema=None):
    schema = schema or t.current_snapshot().schema
    names = [f.name for f in schema.fields]
    rows = [
        {**dict(zip(names, vals)), DEAD_COL: False} for vals in upserts
    ] + [
        {**{n: None for n in names}, "url": u, DEAD_COL: True} for u in deletes
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows)[names + [DEAD_COL]],
        T.StructType(list(schema.fields) + [T.StructField(DEAD_COL, T.BooleanType())]),
    )
    df = df.withColumn(COMMIT_COL, F.lit(epoch).cast("long")).withColumn(
        "_bucket", t.bucket_expr()
    )
    t.commit(t.write_data_files(df, kind="delta"), summary={"epoch_id": epoch})


def _state(t_or_r):
    df = t_or_r.read() if hasattr(t_or_r, "read") else t_or_r
    return sorted(tuple(r) for r in df.collect())


def test_replica_tracks_source_through_epochs_with_deletes(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [("u1", "a", 1), ("u2", "a", 2), ("u3", "b", 3)])

    rep = TableReplica.create(spark, str(tmp_path / "rep"), src)
    rep.bootstrap()
    assert _state(rep) == _state(src)

    # epoch 1: update + insert; epoch 2: delete + insert-then-... ; sync
    # after EACH source epoch (streaming-consumer cadence)
    _apply(spark, src, 1, [("u1", "a", 10), ("u4", "c", 4)])
    out = rep.sync()
    assert not out["up_to_date"] and out["files"] > 0
    assert _state(rep) == _state(src)

    _apply(spark, src, 2, [("u5", "c", 5)], deletes=["u2"])
    rep.sync()
    assert _state(rep) == _state(src)

    # one sync covering SEVERAL source epochs, incl. a key inserted AND
    # deleted inside the window (classify=False emits an at-least-once
    # delete notice for it — must be a no-op on the replica)
    _apply(spark, src, 3, [("ghost", "z", 9), ("u1", "a", 11)])
    _apply(spark, src, 4, [("u6", "d", 6)], deletes=["ghost", "u3"])
    rep.sync()
    assert _state(rep) == _state(src)
    assert rep.read().filter(F.col("url") == "ghost").count() == 0

    # duplicate sync: watermark no-op, snapshot unchanged
    before = rep.table.current_snapshot().snapshot_id
    assert rep.sync()["up_to_date"]
    assert rep.table.current_snapshot().snapshot_id == before

    # load() round-trip finds the source again
    rep2 = TableReplica.load(spark, str(tmp_path / "rep"))
    assert _state(rep2) == _state(src)


def test_replica_rides_source_ddl_and_resharding(spark, tmp_path):
    """A replica with a DIFFERENT bucket count (re-sharding on
    replication) trails the source through an add-column DDL mid-stream."""
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [("u1", "a", 1), ("u2", "b", 2)])
    rep = TableReplica.create(spark, str(tmp_path / "rep"), src, num_buckets=4)
    rep.bootstrap()
    assert rep.table.current_snapshot().num_buckets == 4

    wider = T.StructType(
        list(SRC_SCHEMA.fields) + [T.StructField("lang", T.StringType())]
    )
    src.evolve_schema(wider, summary={"epoch_id": 1})
    _apply(
        spark, src, 1, [("u3", "c", 3, "en"), ("u1", "a", 10, "de")], schema=wider
    )
    rep.sync()
    assert rep.table.current_snapshot().schema == wider
    assert _state(rep) == _state(src)
    # pre-DDL rows align to the new schema on both sides (lang = NULL)
    got = {r["url"]: r["lang"] for r in rep.read().collect()}
    assert got == {"u1": "de", "u2": None, "u3": "en"}


def test_replica_sync_requires_bootstrap(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [("u1", "a", 1)])
    rep = TableReplica.create(spark, str(tmp_path / "rep"), src)
    with pytest.raises(RuntimeError, match="bootstrap"):
        rep.sync()
