"""Long-run soak (the 10^10-regime stamina check): a 51-epoch star replay
with aggressive compaction, periodic lake GC, a mid-stream DDL and a
concurrent-writer conflict — the maintenance events a months-running
pipeline hits continuously, exercised TOGETHER rather than piecewise.

Invariants under test:
* the final wide table still matches the sequential oracle after 51
  epochs of interleaved compaction / expiry / DDL / fencing;
* an attached materialized view (per-entity rollup over the wide table,
  refreshed every epoch with compact_every, GC'd on the same cron)
  equals a direct recompute at the end AND stays bounded in files and
  history — the derived-artifact chain running for months (r5; the view
  groups by the wide table's layout key, so every refresh that retracts
  exercises the file-pruned min/max recompute path);
* file counts stay bounded — per-bucket delta fan-in never exceeds the
  compaction threshold by more than one epoch's worth, snapshot history
  stays at GC depth, and the physical parquet count at the end is flat
  vs the early-run level (dead generations actually reclaimed);
* epoch wall stays stable — the last-10-epoch floor is within a small
  factor of the early-run floor (min-based so the box's documented
  CPU-steal spikes don't flake the run).

Reference: the console's IndexSwapTaskflowLauncher drives exactly this
lifecycle (build → incremental → maintenance) for long-lived indexes;
the engine's equivalents are compact()/expire_snapshots()/evolve_schema
under the C8 optimistic exec-lock.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from tis_spark.fixtures.star import (
    MT0,
    STAR_CHANGE_SCHEMA,
    gen_star_changes,
    initial_tables,
    initial_tables_spark,
    totalpay_spec,
)
from tis_spark.lake.table import CommitConflict
from tis_spark.wide import WideRowPipeline
from tis_spark.wide.totalpay import expected_wide, replay_star_oracle, totalpay_wide

N_PRIMARY = 200
EPOCHS = 50
EPOCH_SIZE = 60
N_EVENTS = EPOCHS * EPOCH_SIZE
COMPACT_THRESHOLD = 4
GC_KEEP_LAST = 4
HI = MT0 + 9_000_000  # versions above every generated event


def _n_parquet(root: str) -> int:
    return sum(1 for _, _, fns in os.walk(root) for f in fns if f.endswith(".parquet"))


def _ddl_epoch(spark):
    base = {"before": None, "epoch_hint": 0}
    pay = {
        "id": "pay000001_0",
        "totalpay_id": "tp000001",
        "kindpay_id": "kp1",
        "type": "2",
        "fee": "10.0",
        "modify_time": str(HI + 3),
        "channel": "web",
    }
    paynew = {
        "id": "paynew9004",
        "totalpay_id": "tp000002",
        "kindpay_id": "kp2",
        "type": "2147483999",  # needs the widened bigint
        "fee": "5.0",
        "modify_time": str(HI + 4),
        "channel": "app",
    }
    rows = [
        {**base, "seq": 9001, "op": "DDL", "table": "payinfo", "pk": "",
         "ddl": "ADD COLUMN channel string", "after": None},
        {**base, "seq": 9002, "op": "DDL", "table": "payinfo", "pk": "",
         "ddl": "ALTER COLUMN type TYPE bigint", "after": None},
        {**base, "seq": 9003, "op": "U", "table": "payinfo",
         "pk": "pay000001_0", "ddl": None, "after": pay},
        {**base, "seq": 9004, "op": "I", "table": "payinfo",
         "pk": "paynew9004", "ddl": None, "after": paynew},
    ]
    return spark.createDataFrame(rows, schema=STAR_CHANGE_SCHEMA)


@pytest.mark.slow
def test_star_long_run_soak(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wide-soak"))
    spec = totalpay_spec()
    pipe = WideRowPipeline(
        spark, root, spec, totalpay_wide, compact_threshold=COMPACT_THRESHOLD
    )
    pipe.full_build(initial_tables_spark(spark, N_PRIMARY))

    from tis_spark.lake.matview import MaterializedView

    mv = MaterializedView.create(
        spark,
        os.path.join(root, "entity_mv"),
        pipe.wide,
        ["entity_id"],
        {
            "n_rows": ("count", None),
            "fee_sum": ("sum", "pay_fee"),
            "max_version": ("max", "version"),
        },
        # months-running shape for the multiset auxiliaries too: their
        # per-refresh delta chains must stay bounded under the same
        # compact_every/GC cadence as the view itself
        exact_extrema=True,
    )
    mv.full_build()

    gen = gen_star_changes(
        spark, N_EVENTS, N_PRIMARY, seed=11, epoch_size=EPOCH_SIZE
    ).cache()
    ddl = _ddl_epoch(spark)

    walls: list[float] = []
    gc_reports = []
    early_parquet = None
    eid = 0
    for ep in range(EPOCHS):
        if ep == 25:  # mid-stream DDL epoch (add column + widen + carriers)
            pipe.process_epoch(ddl, eid)
            mv.refresh(compact_every=5)
            eid += 1
            assert spec.tables["payinfo"].columns["channel"] == "string"
            assert spec.tables["payinfo"].columns["type"] == "bigint"

        batch = gen.filter(
            (F.col("seq") > ep * EPOCH_SIZE) & (F.col("seq") <= (ep + 1) * EPOCH_SIZE)
        )

        if ep == 40:  # concurrent stale writer mid-soak: fenced, no effect
            stale = WideRowPipeline(spark, root, spec, totalpay_wide)
            t0 = time.perf_counter()
            pipe.process_epoch(batch, eid)
            walls.append(time.perf_counter() - t0)
            mv.refresh(compact_every=5)
            with pytest.raises(CommitConflict):
                stale.process_epoch(batch, eid + 1)
            eid += 2  # the conflicted id is burned, never applied
            continue

        t0 = time.perf_counter()
        pipe.process_epoch(batch, eid)
        walls.append(time.perf_counter() - t0)
        mv.refresh(compact_every=5)
        eid += 1

        if ep % 10 == 9:  # periodic lake GC, like a maintenance cron
            gc_reports.append(pipe.expire(keep_last=GC_KEEP_LAST))
            gc_reports.append(
                {
                    f"entity_mv_{k}": v
                    for k, v in mv.expire_snapshots(keep_last=GC_KEEP_LAST).items()
                }
            )
            if early_parquet is None:
                early_parquet = _n_parquet(root)

    final_gc = pipe.expire(keep_last=GC_KEEP_LAST)
    gc_reports.append(final_gc)

    # ---- bounded metadata & storage ------------------------------------
    for name, lake in [
        *pipe.sources.items(),
        ("wide", pipe.wide),
        ("entity_mv", mv.table),
        *((f"entity_mv_aux_{c}", a) for c, a in mv.aux.items()),
    ]:
        snap = lake.current_snapshot()
        # compaction keeps per-bucket delta fan-in at threshold + the
        # epochs that landed since the last compaction check
        assert max(snap.delta_counts().values() or [0]) <= COMPACT_THRESHOLD + 1, name
        # GC keeps history at keep_last + the pinned summary carriers
        assert len(lake.history()) <= GC_KEEP_LAST + 3, name
    assert any(
        rep[name]["deleted_files"] > 0 for rep in gc_reports for name in rep
    ), "GC never reclaimed anything across 51 epochs"
    end_parquet = _n_parquet(root)
    assert early_parquet is not None
    # live storage is flat over the run: inserts add rows, but dead
    # generations must not accumulate (1.5x + slack for extra buckets)
    assert end_parquet <= 1.5 * early_parquet + 32, (early_parquet, end_parquet)

    # ---- stable epoch wall ----------------------------------------------
    early_floor = min(walls[2:12])
    late_floor = min(walls[-10:])
    assert late_floor <= 3.0 * early_floor, (early_floor, late_floor, walls)

    # ---- final state equals the sequential oracle -----------------------
    all_events = gen.collect() + ddl.collect()
    gen.unpersist()
    state = replay_star_oracle(totalpay_spec(), initial_tables(N_PRIMARY), all_events)
    got = pipe.final_wide().toPandas().sort_values("totalpay_id").reset_index(drop=True)
    exp = expected_wide(state)
    assert list(got["totalpay_id"]) == list(exp["totalpay_id"])
    assert list(got["kindpay"]) == list(exp["kindpay"])
    assert [round(v, 2) for v in got["pay_fee"]] == [round(v, 2) for v in exp["pay_fee"]]
    assert [int(v) for v in got["version"]] == [int(v) for v in exp["version"]]

    # the attached view survived 51 epochs of refresh/compaction/GC and
    # still equals a direct recompute over the final wide table
    mv.refresh()  # catch up past the final maintenance commits, if any
    got_mv = {
        r["entity_id"]: (r["n_rows"], round(r["fee_sum"], 2), r["max_version"])
        for r in mv.read().collect()
    }
    want_mv = {
        r["entity_id"]: (r["n_rows"], round(r["fee_sum"], 2), r["max_version"])
        for r in pipe.final_wide()
        .groupBy("entity_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("pay_fee").alias("fee_sum"),
            F.max("version").alias("max_version"),
        )
        .collect()
    }
    assert got_mv == want_mv

    # the DDL column survived 25 more epochs of merges, GC and compaction
    pay = {r["id"]: r.asDict() for r in pipe.sources["payinfo"].read().collect()}
    ostate = state["payinfo"]
    assert set(pay) == set(ostate)
    for pk, orow in ostate.items():
        assert pay[pk].get("channel") == orow.get("channel"), pk
    assert pay["paynew9004"]["type"] == 2_147_483_999

    print(
        f"\nSOAK: {eid} epochs, {N_EVENTS + 4} events, "
        f"wall min/median/max = {min(walls):.2f}/{sorted(walls)[len(walls)//2]:.2f}/{max(walls):.2f} s, "
        f"parquet early/end = {early_parquet}/{end_parquet}, "
        f"gc deleted files = {sum(rep[n]['deleted_files'] for rep in gc_reports for n in rep)}"
    )
