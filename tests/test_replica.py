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


def test_replica_of_layout_clustered_source_keeps_bucket_invariant(spark, tmp_path):
    """A replica of a layout_col (domain-clustered) source must stay
    correct for BUCKET-RESTRICTED readers, not just whole-table reads:
    deletes must tombstone the dead key's layout bucket and a relocated
    key must leave an old-bucket tombstone (the lake's relocation-pair
    protocol), otherwise point lookups / per-bucket compaction / a
    layout-grouped matview over the replica see phantom rows."""
    src = _mk_source(spark, str(tmp_path / "src"), layout_col="domain")

    def apply_layout(epoch, upserts, tombstones=()):
        # engine convention: tombstones carry the OLD layout value; a
        # relocation writes (new-bucket live copy, old-bucket tombstone)
        rows = [
            {"url": u, "domain": d, "score": s, DEAD_COL: False}
            for u, d, s in upserts
        ] + [
            {"url": u, "domain": d, "score": None, DEAD_COL: True}
            for u, d in tombstones
        ]
        df = spark.createDataFrame(
            pd.DataFrame(rows)[["url", "domain", "score", DEAD_COL]],
            T.StructType(
                list(SRC_SCHEMA.fields) + [T.StructField(DEAD_COL, T.BooleanType())]
            ),
        )
        df = df.withColumn(COMMIT_COL, F.lit(epoch).cast("long")).withColumn(
            "_bucket", src.bucket_expr()
        )
        src.commit(src.write_data_files(df, kind="delta"), summary={"epoch_id": epoch})

    apply_layout(0, [("k1", "d0", 1), ("k5", "d1", 5), ("k6", "d2", 6)])
    rep = TableReplica.create(spark, str(tmp_path / "rep"), src)
    rep.bootstrap()

    # delete k5 (domain d1) + relocate k6 from d2 to d0 + touch k1 in place
    apply_layout(
        1,
        [("k6", "d0", 60), ("k1", "d0", 11)],
        tombstones=[("k5", "d1"), ("k6", "d2")],
    )
    rep.sync()
    assert _state(rep) == _state(src)

    def bucket_of(domain):
        return int(
            spark.range(1)
            .select(
                F.pmod(
                    F.xxhash64(F.lit(domain)),
                    F.lit(rep.table.current_snapshot().num_buckets),
                ).cast("int")
            )
            .first()[0]
        )

    # the dead key's bucket: k5 must be gone from a RESTRICTED read
    d1 = rep.table.read(buckets=[bucket_of("d1")])
    assert [r["url"] for r in d1.collect() if r["url"] == "k5"] == []
    # the relocated-away bucket: k6 must not linger in d2
    d2 = rep.table.read(buckets=[bucket_of("d2")])
    assert [r["url"] for r in d2.collect() if r["url"] == "k6"] == []
    # and the new bucket serves the moved row
    d0 = {r["url"]: (r["domain"], r["score"]) for r in rep.table.read(buckets=[bucket_of("d0")]).collect()}
    assert d0["k6"] == ("d0", 60) and d0["k1"] == ("d0", 11)

    # second window: relocate k6 back and delete k1 — replayed sync stays
    # idempotent and restricted reads stay clean
    apply_layout(
        2,
        [("k6", "d2", 61)],
        tombstones=[("k6", "d0"), ("k1", "d0")],
    )
    rep.sync()
    assert rep.sync()["up_to_date"]  # watermark no-op
    assert _state(rep) == _state(src)
    d0 = rep.table.read(buckets=[bucket_of("d0")])
    assert {r["url"] for r in d0.collect()} == set()
    d2 = {r["url"]: r["score"] for r in rep.table.read(buckets=[bucket_of("d2")]).collect()}
    assert d2 == {"k6": 61}


def test_matview_over_replica_of_layout_source(spark, tmp_path):
    """Composability chain: source -> incremental replica -> incremental
    matview GROUPED BY THE LAYOUT KEY over the replica.  The view's
    retraction recompute takes the bucket/zone file-pruned read against
    the REPLICA, so it only stays correct because sync() keeps the
    replica's bucket invariant (relocation tombstones) — the end-to-end
    pin for the layout-clustered replication path."""
    from tis_spark.lake.matview import MaterializedView

    src = _mk_source(spark, str(tmp_path / "src"), layout_col="domain")

    def apply_layout(epoch, upserts, tombstones=()):
        rows = [
            {"url": u, "domain": d, "score": s, DEAD_COL: False}
            for u, d, s in upserts
        ] + [
            {"url": u, "domain": d, "score": None, DEAD_COL: True}
            for u, d in tombstones
        ]
        df = spark.createDataFrame(
            pd.DataFrame(rows)[["url", "domain", "score", DEAD_COL]],
            T.StructType(
                list(SRC_SCHEMA.fields) + [T.StructField(DEAD_COL, T.BooleanType())]
            ),
        )
        df = df.withColumn(COMMIT_COL, F.lit(epoch).cast("long")).withColumn(
            "_bucket", src.bucket_expr()
        )
        src.commit(src.write_data_files(df, kind="delta"), summary={"epoch_id": epoch})

    apply_layout(
        0,
        [("k1", "d0", 1), ("k2", "d0", 2), ("k5", "d1", 5), ("k6", "d2", 6)],
    )
    rep = TableReplica.create(spark, str(tmp_path / "rep"), src)
    rep.bootstrap()
    mv = MaterializedView.create(
        spark,
        str(tmp_path / "mv"),
        rep.table,
        ["domain"],
        {
            "n_pages": ("count", None),
            "min_score": ("min", "score"),
            "max_score": ("max", "score"),
        },
    )
    mv.full_build()

    # delete (d1 dies), relocation (d2 -> d0), in-place update: the view
    # refresh sees retractions in d0/d1/d2 and recomputes them through the
    # file-pruned read over the replica
    apply_layout(
        1,
        [("k6", "d0", 60), ("k1", "d0", 11)],
        tombstones=[("k5", "d1"), ("k6", "d2")],
    )
    rep.sync()
    mv.refresh()

    got = {
        r["domain"]: (r["n_pages"], r["min_score"], r["max_score"])
        for r in mv.read().collect()
    }
    want = {
        r["domain"]: (r["n_pages"], r["min_score"], r["max_score"])
        for r in src.read()
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
        .collect()
    }
    assert got == want == {"d0": (3, 2, 60)}


def test_replica_gc_keeps_watermark_and_source_gc_fails_loudly(spark, tmp_path):
    """Replica-side GC + compaction never disturb the sync chain (the
    watermark rides the retained epoch_id carrier); a source that expires
    the replica's watermark snapshot makes the next sync fail loudly
    (FileNotFoundError) — never a silent partial apply."""
    from tis_spark.lake.replica import TableReplica

    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [("u1", "a.com", 1), ("u2", "b.com", 2)])
    rep = TableReplica.create(spark, str(tmp_path / "rep"), src)
    rep.bootstrap()
    for e in range(1, 5):
        _apply(spark, src, e, [(f"u{e + 2}", "c.com", e * 10)], deletes=["u1"] if e == 2 else ())
        rep.sync()
    gc = rep.expire_snapshots(keep_last=1)
    assert gc["expired_snapshots"] > 0
    rep.compact()
    assert _state(rep) == _state(src)
    _apply(spark, src, 5, [("u2", "b.com", 99)])
    assert not rep.sync()["up_to_date"]
    assert _state(rep) == _state(src)

    _apply(spark, src, 6, [("u9", "z.com", 7)])
    src.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        rep.sync()
    rep2 = TableReplica.create(spark, str(tmp_path / "rep2"), src)
    rep2.bootstrap()
    assert _state(rep2) == _state(src)
