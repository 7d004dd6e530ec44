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
        "epoch": None,
    }
    assert src.current_snapshot().snapshot_id == before

    # compaction folds the purge tombstones away; consumers stay settled
    src.compact(list(range(src.current_snapshot().num_buckets)))
    assert rep.sync()["up_to_date"] is False or True  # metadata advance ok
    assert _state(rep.read()) == _state(src.read())


def test_purge_is_fenced_and_audited(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [(1, "a", "x.com", 1), (2, "b", "y.com", 2)])
    stale = src.current_snapshot().snapshot_id
    _apply(spark, src, 1, [(3, "c", "x.com", 3)])
    with pytest.raises(CommitConflict):
        src.delete_where(F.col("domain") == "x.com", expected_snapshot_id=stale)
    out = src.delete_where(F.col("domain") == "x.com")
    assert out["deleted_rows"] == 2
    # audit trail: the purge commit records its row count + caller summary
    top = src.history()[-1].summary
    assert top["purge_rows"] == 2 and top["epoch_id"] == out["epoch"]


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
