"""FK-clustered child layout (layout_col): relocation tombstones, per-file
PK blooms, and pruned restricted recomputation in the wide-row engine.

The scale problem this layout solves: phase-3 restricted recomputation
reads child tables BY FK, but a PK-clustered child cannot range-prune an
FK predicate — every epoch scanned the child table.  Clustering children
by their routing FK makes that read O(affected parents); PK point lookups
(phase-1 LWW merge, chain climbs) then prune via per-file PK blooms.
Correctness risk covered here: a re-parented row changes buckets, so the
engine writes an old-bucket tombstone — without it, independent per-bucket
compactions would materialize the same key in two bases (duplicates).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.test_wide_row import _assert_wide_equal, _final_pdf
from tis_spark.fixtures.star import (
    gen_star_changes,
    initial_tables,
    initial_tables_spark,
    totalpay_spec,
)
from tis_spark.lake.table import (
    COMMIT_COL,
    DEAD_COL,
    LakeTable,
    bloom_position_cols,
    prune_entries_by_bloom,
)
from tis_spark.wide import WideRowPipeline
from tis_spark.wide.totalpay import expected_wide, replay_star_oracle, totalpay_wide

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("fk", T.StringType(), True),
        T.StructField("val", T.LongType(), True),
    ]
)


def _mk_lake(spark, path, n_rows=40, num_buckets=4, base_file_rows=0):
    lake = LakeTable.create(
        spark, path, SCHEMA, key_cols=["id"], version_col="val",
        num_buckets=num_buckets, layout_col="fk",
    )
    rows = [(f"r{i:03d}", f"p{i % 10}", i) for i in range(n_rows)]
    df = (
        spark.createDataFrame(rows, SCHEMA)
        .withColumn(COMMIT_COL, F.lit(0).cast("long"))
        .withColumn(DEAD_COL, F.lit(False))
        .withColumn("_bucket", lake.bucket_expr())
        .repartition(num_buckets, F.col("_bucket"))
        .sortWithinPartitions("_bucket", "fk")
    )
    files = lake.write_data_files(df, kind="base", max_records_per_file=base_file_rows)
    lake.commit(files, replaced_buckets={str(b) for b in range(num_buckets)})
    return lake


def _append_delta(spark, lake, rows):
    """rows: list of (id, fk, val, dead)"""
    df = (
        spark.createDataFrame(
            [(i, f, v, 1, d) for i, f, v, d in rows],
            T.StructType(
                list(SCHEMA.fields)
                + [
                    T.StructField(COMMIT_COL, T.LongType()),
                    T.StructField(DEAD_COL, T.BooleanType()),
                ]
            ),
        )
        .withColumn("_bucket", lake.bucket_expr())
        .repartition(1)
    )
    lake.commit(lake.write_data_files(df, kind="delta"), summary={"epoch_id": 1})


def _bucket_of(spark, lake, fk_value):
    return (
        spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit(fk_value)), F.lit(lake.current_snapshot().num_buckets))
            .cast("int")
            .alias("b")
        )
        .first()["b"]
    )


def _dest_fk(spark, lake, src="p3"):
    """An fk from the fixture domain hashing to a different bucket than
    ``src`` (bucket count is small; collisions are expected)."""
    src_b = _bucket_of(spark, lake, src)
    for c in range(10):
        if _bucket_of(spark, lake, f"p{c}") != src_b:
            return f"p{c}"
    raise AssertionError("no fk hashes apart")


def test_relocation_visible_once_everywhere(spark, tmp_table_dir):
    """Re-parent r003 p3 -> another parent in a different bucket (upsert to
    the new bucket + tombstone to the old): whole-table reads show the row
    once with the new FK; a bucket-restricted read of the old bucket does
    not show it at all."""
    lake = _mk_lake(spark, tmp_table_dir)
    dest = _dest_fk(spark, lake)
    _append_delta(
        spark, lake, [("r003", dest, 100, False), ("r003", "p3", None, True)]
    )
    full = lake.read().filter(F.col("id") == "r003").collect()
    assert len(full) == 1 and full[0]["fk"] == dest and full[0]["val"] == 100
    old_b, new_b = _bucket_of(spark, lake, "p3"), _bucket_of(spark, lake, dest)
    assert lake.read(buckets=[old_b]).filter(F.col("id") == "r003").count() == 0
    assert lake.read(buckets=[new_b]).filter(F.col("id") == "r003").count() == 1


def test_independent_compactions_no_duplicates(spark, tmp_table_dir):
    """The correctness reason tombstones exist: compact the old and new
    buckets in SEPARATE commits; the key must not end up in two bases."""
    lake = _mk_lake(spark, tmp_table_dir)
    dest = _dest_fk(spark, lake)
    _append_delta(
        spark, lake, [("r003", dest, 100, False), ("r003", "p3", None, True)]
    )
    old_b, new_b = _bucket_of(spark, lake, "p3"), _bucket_of(spark, lake, dest)
    lake.compact([old_b])
    lake.compact([new_b])
    snap = lake.current_snapshot()
    assert all(e.get("kind", "base") == "base" for b in (old_b, new_b) for e in snap.files.get(str(b), []))
    got = lake.read().filter(F.col("id") == "r003").collect()
    assert len(got) == 1 and got[0]["fk"] == dest
    # table-wide sanity: every key exactly once
    assert lake.read().groupBy("id").count().filter(F.col("count") > 1).count() == 0


def test_pk_bloom_prunes_and_stays_exact(spark, tmp_table_dir):
    """Base files of an FK-clustered table carry PK blooms; a pk_set read
    skips most files yet returns every looked-up row."""
    lake = _mk_lake(spark, tmp_table_dir, n_rows=400, base_file_rows=10)
    snap = lake.current_snapshot()
    base = [e for v in snap.files.values() for e in v if e.get("kind") == "base"]
    assert len(base) >= 40
    assert all("pk_bloom" in e for e in base)
    want = ["r007", "r123", "r399"]
    pos = (
        spark.createDataFrame([(k,) for k in want], "id string")
        .select(*bloom_position_cols("id"))
        .collect()
    )
    positions = [[r[f"_bp{j}"] for j in range(3)] for r in pos]
    kept = prune_entries_by_bloom(base, positions)
    assert 0 < len(kept) < len(base) // 2, (len(kept), len(base))
    got = (
        lake.read(pk_set=want, pk_positions=positions)
        .filter(F.col("id").isin(want))
        .toPandas()
        .sort_values("id")
    )
    assert list(got["id"]) == sorted(want)
    assert list(got["val"]) == [7, 123, 399]


@pytest.fixture(scope="module")
def fk_replayed(spark, tmp_path_factory):
    """Star replay on the FK layout with file sizes small enough that both
    pruning shapes (FK zone maps + PK blooms) engage."""
    root = str(tmp_path_factory.mktemp("wide-fk"))
    spec = totalpay_spec()
    pipe = WideRowPipeline(
        spark, root, spec, totalpay_wide,
        num_buckets=4, base_file_rows=1, fk_layout=True,
    )
    pipe.full_build(initial_tables_spark(spark, 200))
    changes = gen_star_changes(spark, 300, 200, seed=11, epoch_size=100)
    pipe.replay(changes, epoch_size=100)
    state = replay_star_oracle(spec, initial_tables(200), changes.collect())
    return pipe, state


def test_fk_layout_replay_matches_oracle(fk_replayed):
    pipe, state = fk_replayed
    _assert_wide_equal(_final_pdf(pipe), expected_wide(state))


def test_fk_layout_children_are_clustered_and_pruned(fk_replayed):
    pipe, _ = fk_replayed
    for child in ("payinfo", "orderdetail", "specialfee", "paydetail"):
        assert pipe.sources[child].current_snapshot().layout_col is not None, child
    # phase-3 FK restriction pruned at least one child table's base files
    child_paths = [pipe.sources[c].path for c in ("payinfo", "orderdetail", "specialfee")]
    pruned = [p for p in child_paths if p in pipe.prune_stats]
    assert pruned, pipe.prune_stats.keys()
    for p in pruned:
        st = pipe.prune_stats[p]
        assert 0 < st["files_hit"] < st["files_total"], (p, st)


def test_fk_layout_replay_with_compaction_matches_oracle(spark, tmp_path_factory):
    """Relocations + frequent per-bucket compaction: the layout's hardest
    interleaving still lands on the sequential oracle."""
    root = str(tmp_path_factory.mktemp("wide-fkc"))
    spec = totalpay_spec()
    pipe = WideRowPipeline(
        spark, root, spec, totalpay_wide,
        num_buckets=4, compact_threshold=2, fk_layout=True,
    )
    pipe.full_build(initial_tables_spark(spark, 80))
    changes = gen_star_changes(spark, 240, 80, seed=5, epoch_size=60)
    pipe.replay(changes, epoch_size=60)
    state = replay_star_oracle(spec, initial_tables(80), changes.collect())
    _assert_wide_equal(_final_pdf(pipe), expected_wide(state))
    # no key is ever duplicated in a source table after compactions
    for name in ("payinfo", "paydetail"):
        pk = spec.tables[name].pk
        dup = (
            pipe.sources[name].read().groupBy(pk).count().filter(F.col("count") > 1)
        )
        assert dup.count() == 0, name


def test_partial_compaction_new_bucket_first(spark, tmp_table_dir):
    """Compact ONLY the new bucket after a relocation: the live copy folds
    into a BASE file while the old bucket's tombstone is still a DELTA.
    The reconciliation must be _commit-ordered — a blanket
    "delta key shadows every base copy" rule lets that dead delta hide the
    newer live base row and the key vanishes from whole-table reads (the
    51-epoch soak caught exactly this; tests/test_soak.py)."""
    lake = _mk_lake(spark, tmp_table_dir)
    dest = _dest_fk(spark, lake)
    _append_delta(
        spark, lake, [("r003", dest, 100, False), ("r003", "p3", None, True)]
    )
    old_b, new_b = _bucket_of(spark, lake, "p3"), _bucket_of(spark, lake, dest)
    lake.compact([new_b])  # old bucket keeps its tombstone as a delta

    got = lake.read().filter(F.col("id") == "r003").collect()
    assert len(got) == 1 and got[0]["fk"] == dest and got[0]["val"] == 100
    assert lake.read(buckets=[old_b]).filter(F.col("id") == "r003").count() == 0
    assert lake.read().groupBy("id").count().filter(F.col("count") > 1).count() == 0


def test_move_back_round_trip_with_partial_compactions(spark, tmp_table_dir):
    """The soak's exact interleaving: relocate, compact only the new
    bucket, relocate BACK (same-epoch live+tombstone pair), compact only
    the other side — the key stays visible with the latest values at
    every step, and never duplicates."""
    lake = _mk_lake(spark, tmp_table_dir)
    dest = _dest_fk(spark, lake)
    old_b, new_b = _bucket_of(spark, lake, "p3"), _bucket_of(spark, lake, dest)

    def _one_row(fk, val):
        got = lake.read().filter(F.col("id") == "r003").collect()
        assert len(got) == 1 and got[0]["fk"] == fk and got[0]["val"] == val, got

    # epoch 1: p3 -> dest, fold the live copy into dest's base
    _append_delta(spark, lake, [("r003", dest, 100, False), ("r003", "p3", None, True)])
    lake.compact([new_b])
    _one_row(dest, 100)

    # epoch 2: dest -> p3 (live back in the original bucket, tombstone in
    # dest's bucket where the compacted base copy now lives)
    df = (
        spark.createDataFrame(
            [("r003", "p3", 200, 2, False), ("r003", dest, None, 2, True)],
            T.StructType(
                list(SCHEMA.fields)
                + [
                    T.StructField(COMMIT_COL, T.LongType()),
                    T.StructField(DEAD_COL, T.BooleanType()),
                ]
            ),
        )
        .withColumn("_bucket", lake.bucket_expr())
        .repartition(1)
    )
    lake.commit(lake.write_data_files(df, kind="delta"), summary={"epoch_id": 2})
    _one_row("p3", 200)

    # fold the returned live copy; dest's bucket keeps tombstone-as-delta
    lake.compact([old_b])
    _one_row("p3", 200)
    lake.compact([new_b])
    _one_row("p3", 200)
    assert lake.read().groupBy("id").count().filter(F.col("count") > 1).count() == 0
