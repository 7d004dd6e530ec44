"""Snapshot-diff changelog (LakeTable.changes, the Delta-CDF analog).

Ground truth for every case: the state diff of two time-travel reads —
``changes(a, b)`` must reproduce exactly the inserts / updates / deletes
that ``read(snapshot_id=b)`` minus ``read(snapshot_id=a)`` implies, with
postimage values, under compaction, bootstrap, and relocation.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tis_spark.cdc import CdcConfig, CdcIngest
from tis_spark.fixtures.gen import gen_page_changes


def _state_diff(old_pdf: pd.DataFrame, new_pdf: pd.DataFrame, key: str):
    old = {r[key]: r for r in old_pdf.to_dict("records")}
    new = {r[key]: r for r in new_pdf.to_dict("records")}
    ins = sorted(set(new) - set(old))
    dels = sorted(set(old) - set(new))
    upd = sorted(k for k in set(old) & set(new) if old[k] != new[k])
    return ins, upd, dels, new


def _changes_by_type(cdf):
    rows = cdf.collect()
    out = {"insert": {}, "update": {}, "delete": {}, "upsert": {}}
    for r in rows:
        d = r.asDict()
        t = d.pop("_change_type")
        d.pop("_change_epoch")
        k = d["url"] if "url" in d else d["id"]
        assert k not in out[t], f"duplicate {t} for {k}"
        out[t][k] = d
    return out


@pytest.fixture(scope="module")
def replayed(spark, tmp_path_factory):
    """Three-epoch replay with snapshots captured after each epoch."""
    root = str(tmp_path_factory.mktemp("cdf") / "pages")
    ing = CdcIngest(spark, root, CdcConfig(fold_parallelism=8, delete_policy="delete"))
    changes = gen_page_changes(spark, 1800, seed=11, epoch_size=600).cache()
    marks = {}
    for i in range(3):
        ev = changes.filter(
            (F.col("seq") > i * 600) & (F.col("seq") <= (i + 1) * 600)
        )
        ing.process_epoch(ev, i, final_flush=True)
        marks[i] = ing.table.current_snapshot().snapshot_id
    changes.unpersist()
    return ing, marks


def _assert_matches_state_diff(ing, s_old, s_new, classify=True):
    table = ing.table
    old_pdf = table.read(snapshot_id=s_old).toPandas()
    new_pdf = table.read(snapshot_id=s_new).toPandas()
    # harmonize: a DDL inside the window adds columns that read as null on
    # old rows — that is NOT a logical change to the row
    for c in new_pdf.columns:
        if c not in old_pdf.columns:
            old_pdf[c] = None
    old_pdf = old_pdf[new_pdf.columns]
    # html is binary (unhashable in dict compare) -> hex
    for pdf in (old_pdf, new_pdf):
        pdf["html"] = pdf["html"].map(lambda b: None if b is None else bytes(b).hex())
    # NaN (pandas null for numerics) -> None so dict compares are exact
    old_pdf = old_pdf.astype(object).where(pd.notna(old_pdf), None)
    new_pdf = new_pdf.astype(object).where(pd.notna(new_pdf), None)
    ins, upd, dels, new_rows = _state_diff(old_pdf, new_pdf, "url")

    cdf = table.changes(s_old, snapshot_id=s_new, classify=classify)
    got = _changes_by_type(
        cdf.withColumn("html", F.hex(F.col("html")))
    )
    if classify:
        assert sorted(got["insert"]) == ins
        assert sorted(got["update"]) == upd
        assert not got["upsert"]
        assert sorted(got["delete"]) == dels
    else:
        assert sorted(got["upsert"]) == sorted(ins + upd)
        assert not got["insert"] and not got["update"]
        # at-least-once deletes: every real delete present; extras are
        # keys inserted AND deleted inside the window (absent both sides —
        # a no-op for an idempotent MERGE consumer)
        assert set(dels) <= set(got["delete"])
        for k in set(got["delete"]) - set(dels):
            assert k not in new_rows, k
    # postimage values match the new state exactly
    for t in ("insert", "update", "upsert"):
        for k, d in got[t].items():
            want = dict(new_rows[k])
            d = dict(d)
            for x in (want, d):
                if x.get("html") is not None:
                    x["html"] = x["html"].lower()
            assert d == want, (t, k)
    return got


def test_changes_match_state_diff_each_epoch(replayed):
    ing, marks = replayed
    _assert_matches_state_diff(ing, marks[0], marks[1])
    _assert_matches_state_diff(ing, marks[1], marks[2])
    got = _assert_matches_state_diff(ing, marks[0], marks[2])
    assert got["insert"] or got["update"] or got["delete"]


def test_changes_unclassified(replayed):
    ing, marks = replayed
    _assert_matches_state_diff(ing, marks[0], marks[2], classify=False)


def test_changes_bootstrap_counts_as_inserts(spark, tmp_table_dir):
    ing = CdcIngest(spark, tmp_table_dir, CdcConfig(fold_parallelism=4))
    s0 = ing.table.current_snapshot().snapshot_id
    boot = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "url": f"https://b.example.org/p{i}",
                    "warc_ts": pd.Timestamp(1_704_067_200_000 + i, unit="ms", tz="UTC"),
                    "html": b"<html><body>x</body></html>",
                    "lang": "en",
                }
                for i in range(15)
            ]
        )
    )
    ing.full_build(boot)
    cdf = ing.table.changes(s0)
    assert cdf.filter(F.col("_change_type") != "insert").count() == 0
    assert cdf.count() == 15


def test_changes_survive_compaction_in_window(replayed, spark):
    """Compacting inside the window folds tombstones away — the key-diff
    fallback must still report every delete, and upserts stay exact."""
    ing, marks = replayed
    table = ing.table
    snap = table.current_snapshot()
    pre = snap.snapshot_id
    table.compact(list(range(snap.num_buckets)))
    post = table.current_snapshot().snapshot_id
    # compaction alone is not a logical change
    assert table.changes(pre, snapshot_id=post).count() == 0
    # window spanning data epochs + the compaction: same diff as before
    _assert_matches_state_diff(ing, marks[0], post)
    _assert_matches_state_diff(ing, marks[1], post, classify=False)


def test_changes_relocation_is_single_update(spark, tmp_path):
    """An FK relocation writes an alive copy in the new bucket and a
    tombstone in the old — the changelog must collapse the pair into ONE
    update, never a delete."""
    from tests.test_fk_layout import _append_delta, _dest_fk, _mk_lake

    lake = _mk_lake(spark, str(tmp_path / "t"))
    s0 = lake.current_snapshot().snapshot_id
    dest = _dest_fk(spark, lake)
    _append_delta(
        spark, lake, [("r003", dest, 100, False), ("r003", "p3", None, True)]
    )
    cdf = lake.changes(s0).collect()
    assert len(cdf) == 1
    assert cdf[0]["_change_type"] == "update"
    assert cdf[0]["id"] == "r003" and cdf[0]["fk"] == dest and cdf[0]["val"] == 100


def test_changes_rejects_reversed_window(replayed):
    ing, marks = replayed
    with pytest.raises(ValueError):
        ing.table.changes(marks[2], snapshot_id=marks[0])


# ------------------------------------------------------------- preimages


def _norm_pdf(pdf, columns):
    for c in columns:
        if c not in pdf.columns:
            pdf[c] = None
    pdf = pdf[list(columns)]
    pdf["html"] = pdf["html"].map(lambda b: None if b is None else bytes(b).hex())
    return pdf.astype(object).where(pd.notna(pdf), None)


def test_changes_with_preimage_matches_time_travel(replayed):
    """update_preimage / delete rows must carry the exact OLD row state
    (ground truth: a time-travel read of the old snapshot), postimages the
    exact NEW state, across single- and multi-epoch windows."""
    ing, marks = replayed
    table = ing.table
    for a, b in [(marks[0], marks[1]), (marks[0], marks[2])]:
        new_pdf = table.read(snapshot_id=b).toPandas()
        cols = list(new_pdf.columns)
        new_pdf = _norm_pdf(new_pdf, cols)
        old_pdf = _norm_pdf(table.read(snapshot_id=a).toPandas(), cols)
        ins, upd, dels, _ = _state_diff(old_pdf, new_pdf, "url")
        old_rows = {r["url"]: r for r in old_pdf.to_dict("records")}
        new_rows = {r["url"]: r for r in new_pdf.to_dict("records")}

        cdf = table.changes(a, snapshot_id=b, with_preimage=True)
        by = {}
        for r in cdf.withColumn("html", F.hex("html")).collect():
            d = r.asDict()
            t = d.pop("_change_type")
            d.pop("_change_epoch")
            if d.get("html") is not None:
                d["html"] = d["html"].lower()
            assert d["url"] not in by.setdefault(t, {}), (t, d["url"])
            by[t][d["url"]] = d
        assert "update" not in by  # preimage mode splits updates
        assert sorted(by.get("insert", {})) == ins
        assert sorted(by.get("update_postimage", {})) == upd
        assert sorted(by.get("update_preimage", {})) == upd
        assert sorted(by.get("delete", {})) == dels
        for k in ins:
            assert by["insert"][k] == new_rows[k]
        for k in upd:
            assert by["update_preimage"][k] == old_rows[k], k
            assert by["update_postimage"][k] == new_rows[k], k
        for k in dels:
            assert by["delete"][k] == old_rows[k], k


def test_changes_preimage_survives_compaction_in_window(replayed):
    """The key-diff delete fallback must still produce full delete
    preimages when a compaction inside the window folded tombstones."""
    ing, marks = replayed
    table = ing.table
    snap = table.current_snapshot()
    table.compact(list(range(snap.num_buckets)))
    post = table.current_snapshot().snapshot_id
    a = marks[0]
    new_pdf = table.read(snapshot_id=post).toPandas()
    cols = list(new_pdf.columns)
    new_pdf = _norm_pdf(new_pdf, cols)
    old_pdf = _norm_pdf(table.read(snapshot_id=a).toPandas(), cols)
    ins, upd, dels, _ = _state_diff(old_pdf, new_pdf, "url")
    old_rows = {r["url"]: r for r in old_pdf.to_dict("records")}

    cdf = table.changes(a, snapshot_id=post, with_preimage=True)
    got = {}
    for r in cdf.filter(F.col("_change_type") == "delete").withColumn(
        "html", F.hex("html")
    ).collect():
        d = r.asDict()
        d.pop("_change_type")
        d.pop("_change_epoch")
        if d.get("html") is not None:
            d["html"] = d["html"].lower()
        got[d["url"]] = d
    assert sorted(got) == dels
    for k in dels:
        assert got[k] == old_rows[k], k


def test_changes_preimage_requires_classify(replayed):
    ing, marks = replayed
    with pytest.raises(ValueError):
        ing.table.changes(marks[0], classify=False, with_preimage=True)


def test_changes_old_reads_are_key_restricted(replayed, monkeypatch):
    """For trigger-sized windows the classify/preimage old-snapshot reads
    must go through the key-restricted path (zone-map file pruning), not a
    full scan — the O(changed keys) contract.  A compaction in the window
    must fall back to the full read (whole-table key diff)."""
    from tis_spark.lake.table import LakeTable

    ing, marks = replayed
    table = ing.table
    real = LakeTable.read
    calls = []

    def spy(self, *a, **kw):
        calls.append(kw)
        return real(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "read", spy)
    calls.clear()
    n = table.changes(marks[0], snapshot_id=marks[1], with_preimage=True).count()
    assert n > 0
    old_reads = [c for c in calls if c.get("snapshot_id") == marks[0]]
    assert old_reads and all(c.get("key_set") or c.get("pk_set") for c in old_reads), calls

    # over the bounded-collect threshold -> full scan fallback, same rows
    calls.clear()
    full = table.changes(
        marks[0], snapshot_id=marks[1], with_preimage=True, preimage_keys_max=1
    ).count()
    assert full == n
    old_reads = [c for c in calls if c.get("snapshot_id") == marks[0]]
    assert old_reads and not any(c.get("key_set") or c.get("pk_set") for c in old_reads)


def test_changes_composite_key_fast_path(spark, tmp_path, monkeypatch):
    """Composite-key tables ride the bounded-collect fast path too (r4's
    'What's missing #4'): files are pruned by the distinct leading-key
    values, exactness comes from the full-key semi-join.  Verified against
    the time-travel state diff AND by spying that the old read was
    key-restricted."""
    from pyspark.sql import types as T

    from tis_spark.lake.table import COMMIT_COL, DEAD_COL, LakeTable

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("section", T.StringType()),
            T.StructField("val", T.LongType()),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema, key_cols=["url", "section"], version_col="val"
    )

    def commit(rows, epoch, kind="delta"):
        df = (
            spark.createDataFrame(
                [(u, s, v, d) for u, s, v, d in rows],
                T.StructType(list(schema.fields) + [T.StructField(DEAD_COL, T.BooleanType())]),
            )
            .withColumn(COMMIT_COL, F.lit(epoch).cast("long"))
            .withColumn("_bucket", t.bucket_expr())
        )
        t.commit(t.write_data_files(df, kind=kind), summary={"epoch_id": epoch})

    commit(
        [(f"u{i}", sec, i, False) for i in range(20) for sec in ("a", "b")],
        0,
    )
    s0 = t.current_snapshot().snapshot_id
    # updates touch one section of a url, not the other; plus a delete and
    # an insert — the composite key must keep the sibling section intact
    commit(
        [("u3", "a", 99, False), ("u7", "b", 77, False), ("u5", "a", None, True),
         ("u20", "a", 1, False)],
        1,
    )
    s1 = t.current_snapshot().snapshot_id

    real = LakeTable.read
    calls = []

    def spy(self, *a, **kw):
        calls.append(kw)
        return real(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "read", spy)
    cdf = t.changes(s0, snapshot_id=s1, with_preimage=True)
    got = {
        (r["url"], r["section"], r["_change_type"]): r["val"] for r in cdf.collect()
    }
    old_reads = [c for c in calls if c.get("snapshot_id") == s0]
    assert old_reads and all(c.get("key_set") or c.get("pk_set") for c in old_reads), calls
    monkeypatch.undo()

    assert got[("u3", "a", "update_preimage")] == 3
    assert got[("u3", "a", "update_postimage")] == 99
    assert got[("u7", "b", "update_preimage")] == 7
    assert got[("u7", "b", "update_postimage")] == 77
    assert got[("u5", "a", "delete")] == 5  # preimage carries old values
    assert got[("u20", "a", "insert")] == 1
    assert ("u3", "b", "update_postimage") not in got  # sibling untouched
    assert len(got) == 6  # 2 updates x (pre+post) + 1 delete + 1 insert


def test_read_and_changes_are_null_key_safe(spark, tmp_path):
    """A NULL key member is a legal key value for group-keyed tables
    (materialized views and their multiset auxiliaries key on GROUP BY
    columns, and SQL groups include NULL).  The base-shadows-delta
    reconciliation and every changes() key join must therefore compare
    keys null-safely: with a plain name-join a NULL-keyed tombstone could
    never shadow its base row (the key surfaces twice / deletes are
    lost), and the classify join would misreport a NULL-keyed update as
    an insert."""
    from pyspark.sql import types as T

    from tis_spark.lake.table import COMMIT_COL, DEAD_COL, LakeTable

    schema = T.StructType(
        [
            T.StructField("k1", T.StringType()),
            T.StructField("k2", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema, key_cols=["k1", "k2"], version_col="v"
    )

    def commit(epoch, rows, kind="delta"):
        df = (
            spark.createDataFrame(
                rows, T.StructType(list(schema.fields) + [T.StructField(DEAD_COL, T.BooleanType())])
            )
            .withColumn(COMMIT_COL, F.lit(epoch).cast("long"))
            .withColumn("_bucket", t.bucket_expr())
        )
        t.commit(t.write_data_files(df, kind=kind), summary={"epoch_id": epoch})

    # BASE generation holding NULL-keyed rows (the full-build shape)
    commit(-1, [("a", None, 1, False), (None, None, 2, False), ("a", "x", 3, False)], kind="base")
    s0 = t.current_snapshot().snapshot_id

    # delta: update one NULL-keyed row, tombstone the other
    commit(1, [("a", None, 10, False), (None, None, None, True)])

    state = {(r["k1"], r["k2"]): r["v"] for r in t.read().collect()}
    assert state == {("a", None): 10, ("a", "x"): 3}  # no dup, no survivor

    ch = t.changes(s0, with_preimage=True)
    got = {(r["k1"], r["k2"], r["_change_type"]): r["v"] for r in ch.collect()}
    assert got == {
        ("a", None, "update_preimage"): 1,
        ("a", None, "update_postimage"): 10,
        (None, None, "delete"): 2,  # preimage payload carried
    }

    # compaction folds the tombstone away; the delete-fallback key diff
    # must still witness the NULL-keyed delete null-safely
    t.compact(list(range(t.current_snapshot().num_buckets)))
    commit(2, [("a", "x", 4, False)])
    ch2 = t.changes(s0, with_preimage=True)
    got2 = {(r["k1"], r["k2"], r["_change_type"]): r["v"] for r in ch2.collect()}
    assert got2[(None, None, "delete")] == 2
    assert got2[("a", "x", "update_postimage")] == 4
