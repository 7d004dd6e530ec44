"""Round-2 feature tests: malformed-event path agreement, MOR broadcast
guard, zone-map lookup pruning, full build + swap, sink retry, rate limit.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

import tis_spark.lake.table as lake_table
from tis_spark.cdc import CdcConfig, CdcIngest
from tis_spark.cdc.fold import fold_multi, fold_singles
from tis_spark.cdc.oracle import replay_oracle
from tis_spark.fixtures.gen import gen_page_changes
from tis_spark.lake.table import LakeTable, prune_entries_by_keys
from tests.test_fold_unit import T0, US, _normalize, _row


# ---------------------------------------------------------------- fold paths


def test_null_version_event_paths_agree():
    """A malformed I/U with null after.warc_ts must be counted invalid by
    every fold path — not crash one and silently pass another (ADVICE r1)."""
    cfg = CdcConfig()
    rows = [
        _row("a", 1, "I", v=None),                 # I, null version, no store
        _row("b", 2, "U", v=None, stored_v=T0),    # U, null version, stored
        _row("c", 3, "U", v=None),                 # U, null version, no store
        _row("d", 4, "I", v=T0),                   # control: valid insert
    ]
    pdf = pd.DataFrame(rows, dtype=object)
    fast = _normalize(fold_singles(pdf, cfg))
    ref = _normalize(fold_multi(pdf, cfg))
    pd.testing.assert_frame_equal(fast, ref, check_dtype=False)
    by_url = fast.set_index("url")
    for u in ("a", "b", "c"):
        assert by_url.loc[u, "n_invalid"] == 1, u
        assert by_url.loc[u, "n_applied"] == 0, u
    assert by_url.loc["b", "action"] == "N"  # stored row untouched
    assert by_url.loc["d", "n_applied"] == 1


# ---------------------------------------------------------------- MOR guard


def test_mor_read_without_broadcast_matches(spark, tmp_table_dir, monkeypatch):
    """With the broadcast guard forced off (threshold 0), the plain
    shuffle anti-join read must produce the identical reconciliation."""
    changes = gen_page_changes(spark, 600, seed=9, epoch_size=300)
    ing = CdcIngest(spark, tmp_table_dir, CdcConfig(fold_parallelism=8))
    ing.replay(changes, epoch_size=300)
    with_bc = sorted(
        (r["url"], r["warc_ts"]) for r in ing.final_state().select("url", "warc_ts").collect()
    )
    assert with_bc  # deltas exist pre-compaction, so the anti-join ran
    monkeypatch.setattr(lake_table, "BROADCAST_DELTA_MAX_BYTES", 0)
    without_bc = sorted(
        (r["url"], r["warc_ts"]) for r in ing.final_state().select("url", "warc_ts").collect()
    )
    assert with_bc == without_bc


# ---------------------------------------------------------------- zone maps


def _mini_pages(spark, n, prefix="boot"):
    rows = [
        {
            "url": f"https://{prefix}.example.org/p{i:05d}",
            "warc_ts": pd.Timestamp(1_704_067_200_000 + i * 1000, unit="ms", tz="UTC"),
            "html": f"<html><head><title>B{i}</title></head><body><p>w{i}</p></body></html>".encode(),
            "lang": "en",
        }
        for i in range(n)
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_zone_map_pruning_and_lookup(spark, tmp_table_dir):
    cfg = CdcConfig(fold_parallelism=8, compact_max_records_per_file=50, num_buckets=4)
    ing = CdcIngest(spark, tmp_table_dir, cfg)
    ing.full_build(_mini_pages(spark, 2000))
    snap = ing.table.current_snapshot()
    entries = ing.table._selected_entries(snap, None, {"base"})
    # fine-grained sorted base files with zone maps
    assert len(entries) >= 2000 // 50
    assert all("key_min" in e and "key_max" in e and "bytes" in e for e in entries)
    keys = [f"https://boot.example.org/p{i:05d}" for i in (3, 777, 1500)]
    # bucket-aware key set (the form merge_into builds)
    key_rows = (
        spark.createDataFrame([(k,) for k in keys], "url string")
        .select(ing.table.bucket_expr().alias("b"), "url")
        .collect()
    )
    by_bucket: dict[str, list] = {}
    for r in key_rows:
        by_bucket.setdefault(str(r["b"]), []).append(r["url"])
    pruned = [
        e
        for b, ents in snap.files.items()
        for e in prune_entries_by_keys(
            [x for x in ents if x.get("kind") == "base"], by_bucket.get(b, [])
        )
    ]
    assert len(pruned) <= len(keys)  # each key hits exactly one sorted file
    got = sorted(
        r["url"]
        for r in ing.table.read(key_set=by_bucket).filter(F.col("url").isin(keys)).collect()
    )
    assert got == sorted(keys)
    # unknown key: zone pruning drops everything, read returns no match
    assert ing.table.read(key_set=["https://zzz.example.org/x"]).count() == 0


# ---------------------------------------------------------------- full build


def test_full_build_then_incremental_matches_oracle(spark, tmp_table_dir):
    cfg = CdcConfig(fold_parallelism=8)
    ing = CdcIngest(spark, tmp_table_dir, cfg)
    boot = _mini_pages(spark, 300)
    ing.full_build(boot)
    assert ing.final_state().count() == 300
    # swap is atomic: exactly one new snapshot, all buckets replaced
    assert ing.table.current_snapshot().summary.get("full_build") is True

    changes = gen_page_changes(spark, 800, seed=11, epoch_size=400)
    ing.replay(changes, epoch_size=400)

    expected_changed = replay_oracle(changes.collect(), cfg)
    final = ing.final_state()
    got_changed = (
        final.filter(~F.col("url").startswith("https://boot."))
        .select("url", F.unix_micros("warc_ts").alias("warc_ts_us"), "text", "lang")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    exp = (
        expected_changed[["url", "warc_ts_us", "text", "lang"]]
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_changed, exp, check_dtype=False)
    # boot rows survive untouched (disjoint url space)
    assert final.filter(F.col("url").startswith("https://boot.")).count() == 300


def test_full_build_exact_dedup(spark, tmp_table_dir):
    """dedup-before-merge: identical-content documents collapse to the
    lowest-url representative during the bootstrap build."""
    base = _mini_pages(spark, 40)
    dupes = _mini_pages(spark, 40).select(
        F.concat(F.lit("https://mirror.example.org/"), F.col("url")).alias("url"),
        "warc_ts",
        "html",
        "lang",
    )
    ing = CdcIngest(spark, tmp_table_dir, CdcConfig(fold_parallelism=8))
    ing.full_build(base.unionByName(dupes), dedup="exact")
    final = ing.final_state()
    assert final.count() == 40
    # deterministic representative: 'https://boot...' sorts before mirror
    assert final.filter(F.col("url").startswith("https://mirror.")).count() == 0


# ---------------------------------------------------------------- sink retry


def test_commit_retry_on_transient_failure(spark, tmp_table_dir, monkeypatch):
    cfg = CdcConfig(fold_parallelism=8, commit_retry_backoff_s=0.01)
    ing = CdcIngest(spark, tmp_table_dir, cfg)
    changes = gen_page_changes(spark, 400, seed=13, epoch_size=400)

    real_publish = LakeTable._publish
    fails = {"n": 1}

    def flaky_publish(self, snap):
        if fails["n"] > 0:
            fails["n"] -= 1
            raise OSError("injected transient store failure")
        return real_publish(self, snap)

    monkeypatch.setattr(LakeTable, "_publish", flaky_publish)
    ing.replay(changes, epoch_size=400)
    monkeypatch.setattr(LakeTable, "_publish", real_publish)

    snaps = [s for s in ing.table.history() if "epoch_id" in s.summary]
    assert sum(s.summary.get("n_commit_retries", 0) for s in snaps) == 1
    # exactly-once preserved through the retry: state matches the oracle
    exp = replay_oracle(changes.collect(), cfg)
    got = (
        ing.final_state()
        .select("url", F.unix_micros("warc_ts").alias("warc_ts_us"))
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, exp[["url", "warc_ts_us"]].sort_values("url").reset_index(drop=True),
        check_dtype=False,
    )


def test_commit_retry_exhaustion_raises(spark, tmp_table_dir, monkeypatch):
    cfg = CdcConfig(fold_parallelism=8, commit_retries=1, commit_retry_backoff_s=0.01)
    ing = CdcIngest(spark, tmp_table_dir, cfg)
    changes = gen_page_changes(spark, 200, seed=17, epoch_size=200)

    def always_fail(self, snap):
        raise OSError("store down")

    monkeypatch.setattr(LakeTable, "_publish", always_fail)
    with pytest.raises(OSError):
        ing.replay(changes, epoch_size=200)


# ---------------------------------------------------------------- rate limit


def test_rate_limit_caps_admission(spark, tmp_table_dir):
    cfg = CdcConfig(fold_parallelism=8, disorder_window=0, max_events_per_epoch=200)
    ing = CdcIngest(spark, tmp_table_dir, cfg)
    changes = gen_page_changes(spark, 600, seed=19, epoch_size=600)
    s0 = ing.process_epoch(changes, 0, final_flush=False)
    assert s0["admitted_horizon"] == 200
    s1 = ing.process_epoch(changes.limit(0), 1, final_flush=False)
    assert s1["admitted_horizon"] <= 400  # pending drains under the cap
    s2 = ing.process_epoch(changes.limit(0), 2, final_flush=True)  # drain ignores cap
    exp = replay_oracle(changes.collect(), cfg)
    assert ing.final_state().count() == len(exp)
