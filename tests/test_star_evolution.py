"""Schema evolution THROUGH the star pipeline (VERDICT r2 'What's missing
#1'): DDL events on a SOURCE table of the wide-row star apply mid-replay —
add column + type widening — and the replay still matches the sequential
oracle, which evolves its own column set from the same DDL events.

Reference: the console's versioned schema snapshots drive exactly this
(SchemaAction.java:330,967-1029); the widening lattice is
ColumnMetaData.java:207-239.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tis_spark.fixtures.star import (
    MT0,
    STAR_CHANGE_SCHEMA,
    gen_star_changes,
    initial_tables,
    initial_tables_spark,
    totalpay_spec,
)
from tis_spark.wide import WideRowPipeline
from tis_spark.wide.totalpay import expected_wide, replay_star_oracle, totalpay_wide

N_PRIMARY = 60


def _mk(spark, rows):
    base = {"ddl": None, "before": None, "after": None, "epoch_hint": 0}
    return spark.createDataFrame([{**base, **r} for r in rows], schema=STAR_CHANGE_SCHEMA)


def _pay_after(pk, tp, mt, channel=None, type_=2):
    after = {
        "id": pk,
        "totalpay_id": tp,
        "kindpay_id": "kp1",
        "type": str(type_),
        "fee": "10.0",
        "modify_time": str(mt),
    }
    if channel is not None:
        after["channel"] = channel
    return after


def test_mid_stream_source_ddl_matches_oracle(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wide-evo"))
    spec = totalpay_spec()
    pipe = WideRowPipeline(spark, root, spec, totalpay_wide)
    pipe.full_build(initial_tables_spark(spark, N_PRIMARY))
    sv0 = pipe.sources["payinfo"].current_snapshot().schema_version

    # epochs 0-1: the generated stream (no DDL), seqs 1..100
    gen = gen_star_changes(spark, 100, N_PRIMARY, seed=3, epoch_size=50)
    pipe.process_epoch(gen.filter(F.col("seq") <= 50), 0)
    pipe.process_epoch(gen.filter(F.col("seq") > 50), 1)

    # epoch 2: DDL (add column + widen) then events CARRYING the new column
    hi = MT0 + 9_000_000  # above every generated version
    e2 = _mk(
        spark,
        [
            {"seq": 101, "op": "DDL", "table": "payinfo", "pk": "",
             "ddl": "ADD COLUMN channel string"},
            {"seq": 102, "op": "DDL", "table": "payinfo", "pk": "",
             "ddl": "ALTER COLUMN type TYPE bigint"},
            {"seq": 103, "op": "U", "table": "payinfo", "pk": "pay000001_0",
             "after": _pay_after("pay000001_0", "tp000001", hi + 3, channel="web")},
            {"seq": 104, "op": "I", "table": "payinfo", "pk": "paynew104",
             "after": _pay_after("paynew104", "tp000002", hi + 4, channel="app",
                                 type_=2_147_483_999)},  # needs the widened type
        ],
    )
    pipe.process_epoch(e2, 2)
    assert spec.tables["payinfo"].columns["channel"] == "string"
    assert spec.tables["payinfo"].columns["type"] == "bigint"
    assert pipe.sources["payinfo"].current_snapshot().schema_version == sv0 + 2

    # epoch 3: an OLD-SHAPE event (no channel key) wins LWW on the same pk —
    # full-row replace must null the column, exactly like the oracle
    e3 = _mk(
        spark,
        [
            {"seq": 105, "op": "U", "table": "payinfo", "pk": "pay000001_0",
             "after": _pay_after("pay000001_0", "tp000001", hi + 5)},
        ],
    )
    pipe.process_epoch(e3, 3)

    all_events = gen.collect() + e2.collect() + e3.collect()
    state = replay_star_oracle(totalpay_spec(), initial_tables(N_PRIMARY), all_events)

    # wide table unchanged in shape and equal to the oracle recompute
    got = (
        pipe.final_wide().toPandas().sort_values("totalpay_id").reset_index(drop=True)
    )
    exp = expected_wide(state)
    assert list(got["totalpay_id"]) == list(exp["totalpay_id"])
    assert list(got["kindpay"]) == list(exp["kindpay"])
    assert [int(v) for v in got["version"]] == [int(v) for v in exp["version"]]

    # evolved source state: pre-DDL rows read back NULL for the new column,
    # post-DDL events carry it, the old-shape winner nulled it again
    pay = {
        r["id"]: r.asDict() for r in pipe.sources["payinfo"].read().collect()
    }
    ostate = state["payinfo"]
    assert set(pay) == set(ostate)
    for pk, orow in ostate.items():
        assert pay[pk].get("channel") == orow.get("channel"), pk
        assert int(pay[pk]["type"]) == int(orow["type"]), pk
    assert pay["paynew104"]["channel"] == "app"
    assert pay["paynew104"]["type"] == 2_147_483_999
    assert pay["pay000001_0"]["channel"] is None  # nulled by the e3 winner


def test_reliable_checkpoint_mode(spark, tmp_path_factory):
    """checkpoint_intermediates='reliable' pins epoch intermediates to DFS
    (cluster default: survives executor loss) and replays identically."""
    import os

    root = str(tmp_path_factory.mktemp("wide-rel"))
    pipe = WideRowPipeline(
        spark, root, totalpay_spec(), totalpay_wide,
        checkpoint_intermediates="reliable",
    )
    pipe.full_build(initial_tables_spark(spark, 30))
    gen = gen_star_changes(spark, 60, 30, seed=9, epoch_size=60)
    pipe.process_epoch(gen, 0)
    state = replay_star_oracle(totalpay_spec(), initial_tables(30), gen.collect())
    got = pipe.final_wide().toPandas().sort_values("totalpay_id").reset_index(drop=True)
    exp = expected_wide(state)
    assert list(got["kindpay"]) == list(exp["kindpay"])
    assert [int(v) for v in got["version"]] == [int(v) for v in exp["version"]]
    ckpt = spark.sparkContext.getCheckpointDir()
    assert ckpt and os.listdir(ckpt.replace("file:", ""))


def test_ddl_redelivery_is_idempotent(spark, tmp_path_factory):
    """Crash-replay of an epoch whose evolve commit landed but whose wide
    commit didn't must not double-apply the DDL (apply_ddl no-ops)."""
    root = str(tmp_path_factory.mktemp("wide-evo2"))
    spec = totalpay_spec()
    pipe = WideRowPipeline(spark, root, spec, totalpay_wide)
    pipe.full_build(initial_tables_spark(spark, 20))
    e0 = _mk(
        spark,
        [
            {"seq": 1, "op": "DDL", "table": "specialfee", "pk": "",
             "ddl": "ADD COLUMN note string"},
        ],
    )
    pipe.process_epoch(e0, 0)
    sv = pipe.sources["specialfee"].current_snapshot().schema_version
    # fresh pipeline over the same root re-delivers the epoch: fenced, and
    # even a direct re-application of the DDL is a no-op
    pipe2 = WideRowPipeline(spark, root, totalpay_spec(), totalpay_wide)
    out = pipe2.process_epoch(e0, 0)
    assert out.get("skipped")
    pipe2._apply_source_ddls([("specialfee", 1, "ADD COLUMN note string")], 0)
    assert pipe2.sources["specialfee"].current_snapshot().schema_version == sv
