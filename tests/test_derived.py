"""Incrementally-maintained derived indexes (lake/derived.py): a lake
table of transform-expanded rows (token postings, MinHash-LSH bands)
maintained purely from the source table's snapshot-diff changelog — the
reference's full-rebuild index build (tis-index-builder
IndexBuilderTask.java pipelines EVERY source row per build; backflow then
copies the whole artifact) made incremental.  Pins: maintained state ==
fresh transform of the source state through epochs with updates, deletes
and insert+delete-inside-a-window; the survivor rule (a posting whose
derived key is unchanged by the update keeps its live copy against the
same-epoch tombstone); the above-cap scan-plus-semi-join fallback; the
schema-drift loud failure; duplicate syncs as watermark no-ops."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import tis_spark.operators.indexing  # noqa: F401 — registers the transforms
from tis_spark.lake.derived import TRANSFORMS, DerivedIndex
from tis_spark.lake.table import COMMIT_COL, DEAD_COL, LakeTable

SRC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
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
    ] + [
        {**{n: None for n in names}, "doc_id": d, DEAD_COL: True} for d in deletes
    ]
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


def _expect(src, transform):
    return _state(TRANSFORMS[transform](src.read()))


def test_postings_index_tracks_source_through_epochs(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [(1, "the quick fox", 1), (2, "the lazy dog", 2), (3, "fox dog fox", 3)])

    idx = DerivedIndex.create(
        spark, str(tmp_path / "idx"), src, "token_postings", ["doc_id", "tok"]
    )
    idx.bootstrap()
    assert _state(idx.read()) == _expect(src, "token_postings")
    # tf aggregation inside the transform: doc 3 has fox twice
    assert idx.read().filter((F.col("doc_id") == 3) & (F.col("tok") == "fox")).first()["tf"] == 2

    # update doc 1 keeping a token (survivor) + insert doc 4
    _apply(spark, src, 1, [(1, "the slow fox", 10), (4, "new dog", 4)])
    out = idx.sync()
    assert not out["up_to_date"] and out["keys"] == 2 and out["files"] > 0
    assert _state(idx.read()) == _expect(src, "token_postings")
    # survivor rule: (1, 'the') and (1, 'fox') re-derived in the same epoch
    # as their tombstones — alive-over-dead at equal _commit keeps exactly
    # one live copy; the dropped token 'quick' is gone
    surv = idx.read().filter(F.col("doc_id") == 1)
    assert sorted(r["tok"] for r in surv.collect()) == ["fox", "slow", "the"]

    # delete + insert; then a multi-epoch window with a ghost doc
    # (insert AND delete inside one sync window — must be a no-op)
    _apply(spark, src, 2, [(5, "quick quick", 5)], deletes=[2])
    idx.sync()
    assert _state(idx.read()) == _expect(src, "token_postings")

    _apply(spark, src, 3, [(9, "ghost doc", 9), (1, "final fox text", 11)])
    _apply(spark, src, 4, [(6, "dog", 6)], deletes=[9, 3])
    idx.sync()
    assert _state(idx.read()) == _expect(src, "token_postings")
    assert idx.read().filter(F.col("doc_id") == 9).count() == 0

    # duplicate sync: watermark no-op, snapshot unchanged
    before = idx.table.current_snapshot().snapshot_id
    assert idx.sync()["up_to_date"]
    assert idx.table.current_snapshot().snapshot_id == before

    # load() round-trip finds source + transform again
    idx2 = DerivedIndex.load(spark, str(tmp_path / "idx"))
    assert _state(idx2.read()) == _expect(src, "token_postings")


def test_postings_sync_above_cap_falls_back_to_semi_join(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [(i, f"tok{i} common", i) for i in range(20)])
    idx = DerivedIndex.create(
        spark, str(tmp_path / "idx"), src, "token_postings", ["doc_id", "tok"]
    )
    idx.bootstrap()
    _apply(spark, src, 1, [(i, f"tok{i} changed", 100 + i) for i in range(0, 20, 2)], deletes=[1, 3])
    out = idx.sync(derived_keys_max=4)  # 12 changed keys > cap
    assert out["keys"] is None  # fallback path taken
    assert _state(idx.read()) == _expect(src, "token_postings")


def test_minhash_band_index_matches_batch_rebuild(spark, tmp_path):
    from tis_spark.operators.mlops import minhash_band_rows

    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(
        spark, src, 0,
        [(i, f"w{i % 3} w{i % 5} w{i % 7} shared tail", i) for i in range(12)],
    )
    idx = DerivedIndex.create(
        spark, str(tmp_path / "idx"), src, "minhash_bands", ["doc_id", "band_idx"]
    )
    idx.bootstrap()
    _apply(spark, src, 1, [(2, "w2 w2 w2 drifted", 20), (12, "w0 w2 w5 shared tail", 12)], deletes=[7])
    idx.sync()

    # maintained band store == batch rebuild over the final source state
    dt = src.read().select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).distinct()
    assert _state(idx.read()) == _state(minhash_band_rows(dt))

    # and the store is queryable the way the dedup pipeline uses it:
    # same-bucket candidate pairs from the MAINTAINED table equal pairs
    # from the fresh signatures
    def pairs(bands):
        a, b = bands.alias("a"), bands.alias("b")
        return _state(
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
            .agg(F.count("*").alias("nb"))
        )

    assert pairs(idx.read()) == pairs(minhash_band_rows(dt))


def test_sync_requires_bootstrap_and_key_leads_with_source_key(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [(1, "a b", 1)])
    idx = DerivedIndex.create(
        spark, str(tmp_path / "idx"), src, "token_postings", ["doc_id", "tok"]
    )
    with pytest.raises(RuntimeError, match="bootstrap"):
        idx.sync()
    with pytest.raises(AssertionError, match="lead with the source key"):
        DerivedIndex.create(
            spark, str(tmp_path / "idx2"), src, "token_postings", ["tok", "doc_id"]
        )


def test_load_requires_registered_transform(spark, tmp_path, monkeypatch):
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [(1, "a b", 1)])
    DerivedIndex.create(
        spark, str(tmp_path / "idx"), src, "token_postings", ["doc_id", "tok"]
    )
    monkeypatch.delitem(TRANSFORMS, "token_postings")
    with pytest.raises(KeyError, match="not registered"):
        DerivedIndex.load(spark, str(tmp_path / "idx"))


def test_transform_schema_drift_fails_loudly(spark, tmp_path, monkeypatch):
    """A transform whose output schema no longer matches the schema frozen
    at create() must raise, not let write_data_files cast silently."""
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [(1, "a b", 1)])
    idx = DerivedIndex.create(
        spark, str(tmp_path / "idx"), src, "token_postings", ["doc_id", "tok"]
    )
    idx.bootstrap()
    drifted = lambda df: TRANSFORMS["minhash_bands"](df).withColumnRenamed(  # noqa: E731
        "band_val", "tf"
    ).withColumnRenamed("band_idx", "tok")
    monkeypatch.setitem(TRANSFORMS, "token_postings", drifted)
    idx.transform = drifted
    _apply(spark, src, 1, [(2, "c d", 2)])
    with pytest.raises(TypeError, match="drifted"):
        idx.sync()


def test_sync_tombstone_read_is_file_pruned(spark, tmp_path):
    """The O(changed keys) IO claim: the old-derived lookup feeding the
    tombstones is the bucket/zone file-pruned point read, never a derived
    -table scan.  Pin via inputFiles(): a one-doc lookup touches a small
    fraction of the base files a full read opens."""
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [(i, f"tok{i} common words here", i) for i in range(200)])
    idx = DerivedIndex.create(
        spark, str(tmp_path / "idx"), src, "token_postings", ["doc_id", "tok"]
    )
    idx.bootstrap()
    snap = idx.table.current_snapshot()
    full_files = set(idx.table.read(snapshot_id=snap.snapshot_id).inputFiles())
    point_files = set(
        idx.table.read_layout_point_lookup(snap, "doc_id", [7]).inputFiles()
    )
    assert len(full_files) >= snap.num_buckets // 2
    assert len(point_files) * 4 <= len(full_files), (len(point_files), len(full_files))
    # and the files it does read are a subset of the full set
    assert point_files <= full_files


def test_sync_survives_source_compaction_inside_window(spark, tmp_path):
    """A source compaction committed INSIDE the sync window folds
    tombstones away, so the changelog's deletes fall back to the
    old-keys-minus-new-keys diff (lake/table.py::changes) — the derived
    index must still drop the deleted docs' postings, and a compaction of
    the INDEX itself must not disturb later syncs."""
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [(i, f"tok{i} shared", i) for i in range(10)])
    idx = DerivedIndex.create(
        spark, str(tmp_path / "idx"), src, "token_postings", ["doc_id", "tok"]
    )
    idx.bootstrap()

    # window: update, delete, then compact the source before syncing
    _apply(spark, src, 1, [(0, "tok0 altered", 100)], deletes=[3, 7])
    src.compact(list(range(src.current_snapshot().num_buckets)))
    idx.sync()
    assert _state(idx.read()) == _expect(src, "token_postings")
    assert idx.read().filter(F.col("doc_id").isin(3, 7)).count() == 0

    # compact the index, keep syncing — zone maps on the new base keep
    # the point lookup exact
    idx.table.compact(list(range(idx.table.current_snapshot().num_buckets)))
    _apply(spark, src, 2, [(11, "tok11 shared", 11)], deletes=[5])
    idx.sync()
    assert _state(idx.read()) == _expect(src, "token_postings")


def test_refresh_views_shares_one_window_across_sync_consumers(spark, tmp_path):
    """refresh_views groups sync-style consumers (derived indexes,
    replicas) per (source, watermark) and reads the classify=False window
    ONCE for the group — while matviews keep their own preimage group.
    Counts actual changes() invocations: 2 derived + 1 replica + 1 view
    on one source = exactly 2 reads, and every consumer lands on its
    recompute."""
    from tis_spark.lake.matview import MaterializedView, refresh_views
    from tis_spark.lake.replica import TableReplica

    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [(i, f"tok{i} shared words", i) for i in range(12)])

    postings = DerivedIndex.create(
        spark, str(tmp_path / "p"), src, "token_postings", ["doc_id", "tok"]
    )
    postings.bootstrap()
    bands = DerivedIndex.create(
        spark, str(tmp_path / "b"), src, "minhash_bands", ["doc_id", "band_idx"]
    )
    bands.bootstrap()
    rep = TableReplica.create(spark, str(tmp_path / "r"), src)
    rep.bootstrap()
    mv = MaterializedView.create(
        spark, str(tmp_path / "mv"), src, ["text"], {"n": ("count", None)}
    )
    mv.full_build()

    _apply(spark, src, 1, [(2, "tok2 altered words", 20), (12, "tok12 shared", 12)], deletes=[5])

    n_calls = {"n": 0}
    orig = src.changes

    def counting(*a, **kw):
        n_calls["n"] += 1
        return orig(*a, **kw)

    src.changes = counting
    # every consumer's .source is its own LakeTable instance at the same
    # path — point them at the counted instance
    for c in (postings, bands, rep, mv):
        c.source = src
    stats = refresh_views([postings, bands, rep, mv])
    assert n_calls["n"] == 2, n_calls  # one classify=False + one preimage
    assert len(stats) == 4 and all(not s.get("up_to_date") for s in stats)

    assert _state(postings.read()) == _expect(src, "token_postings")
    assert _state(bands.read()) == _expect(src, "minhash_bands")
    assert _state(rep.read()) == _state(src.read())
    got = {tuple(r)[:1] + (r["n"],) for r in mv.read().collect()}
    want = {
        (r["text"], r["n"])
        for r in src.read().groupBy("text").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want

    # second round: all up to date, no window read at all
    n_calls["n"] = 0
    stats = refresh_views([postings, bands, rep, mv])
    assert all(s.get("up_to_date") for s in stats)
    assert n_calls["n"] == 0


def test_emb_sign_bucket_index_tracks_vector_churn(spark, tmp_path):
    """The vector-modality index (emb_sign_buckets): updates that flip a
    vector's signs move it to new buckets in the affected tables only,
    deletes drop all its bucket rows, and the maintained store stays
    probe-equivalent to a fresh transform of the final source state."""
    from tis_spark.operators.indexing import probe_sign_buckets

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )

    def vec(i, flip=False):
        v = [(1.0 if ((i >> (d % 8)) & 1) else -1.0) * (1.0 + d % 5) for d in range(64)]
        if flip:
            v = [-x for x in v[:8]] + v[8:]  # moves the table-0 bucket only
        return v

    src = LakeTable.create(
        spark, str(tmp_path / "src"), schema, key_cols=["vec_id"], version_col="label"
    )

    def apply(epoch, upserts, deletes=()):
        rows = [
            {"vec_id": i, "embedding": vec(i, flip), "label": lb, DEAD_COL: False}
            for i, flip, lb in upserts
        ] + [
            {"vec_id": d, "embedding": None, "label": None, DEAD_COL: True}
            for d in deletes
        ]
        df = spark.createDataFrame(
            rows,
            T.StructType(list(schema.fields) + [T.StructField(DEAD_COL, T.BooleanType())]),
        )
        df = df.withColumn(COMMIT_COL, F.lit(epoch).cast("long")).withColumn(
            "_bucket", src.bucket_expr()
        )
        src.commit(src.write_data_files(df, kind="delta"), summary={"epoch_id": epoch})

    apply(0, [(i, False, i % 3) for i in range(20)])
    idx = DerivedIndex.create(
        spark, str(tmp_path / "idx"), src, "emb_sign_buckets", ["vec_id", "table_idx"]
    )
    idx.bootstrap()
    # churn: vec 3 flips its first 8 signs (table-0 bucket moves, tables
    # 1-3 keep their rows -> the survivor rule), vec 20 is new, 7 deleted
    apply(1, [(3, True, 9), (20, False, 2)], deletes=[7])
    out = idx.sync()
    assert not out["up_to_date"]

    fresh = TRANSFORMS["emb_sign_buckets"](src.read())
    assert _state(idx.read().select("vec_id", "table_idx", "bucket")) == _state(fresh)
    # a second sync with no source change is a watermark no-op
    assert idx.sync()["up_to_date"]

    # probe parity: candidates from the maintained store == from fresh
    is_new = F.col("vec_id") >= 18
    assert _state(
        probe_sign_buckets(idx.read().select("vec_id", "table_idx", "bucket"), is_new)
    ) == _state(probe_sign_buckets(fresh, is_new))


def test_index_gc_keeps_watermark_and_source_gc_fails_loudly(spark, tmp_path):
    """Consumer-side GC is watermark-safe (sync commits bundle epoch_id
    with the watermark, which expire_snapshots always retains), compact()
    folds sync deltas without disturbing the chain — and the complementary
    hazard is pinned: when the SOURCE expires the snapshot the index's
    watermark points at, the next sync raises FileNotFoundError instead of
    silently corrupting, and a re-bootstrap recovers."""
    src = _mk_source(spark, str(tmp_path / "src"))
    _apply(spark, src, 0, [(1, "the quick fox", 1), (2, "lazy dog", 2)])
    idx = DerivedIndex.create(
        spark, str(tmp_path / "idx"), src, "token_postings", ["doc_id", "tok"]
    )
    idx.bootstrap()
    # several sync epochs -> several index snapshots + delta files
    for e in range(1, 5):
        _apply(spark, src, e, [(10 + e, f"doc number {e} fox", e)], deletes=[10 + e - 1] if e > 1 else ())
        idx.sync()
    rep = idx.expire_snapshots(keep_last=1)
    assert rep["expired_snapshots"] > 0
    idx.compact()
    assert _state(idx.read()) == _expect(src, "token_postings")
    # chain continues on the GC'd + compacted index
    _apply(spark, src, 5, [(1, "quick brown fox", 50)])
    assert not idx.sync()["up_to_date"]
    assert _state(idx.read()) == _expect(src, "token_postings")

    # fall-behind: source GC drops the watermark snapshot -> loud failure
    _apply(spark, src, 6, [(99, "straggler row", 99)])
    src.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        idx.sync()
    # recovery: rebuild the index off the current source snapshot
    idx2 = DerivedIndex.create(
        spark, str(tmp_path / "idx2"), src, "token_postings", ["doc_id", "tok"]
    )
    idx2.bootstrap()
    assert _state(idx2.read()) == _expect(src, "token_postings")
