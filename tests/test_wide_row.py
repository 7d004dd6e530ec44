"""F4: multi-table incremental wide-row maintenance vs a sequential
oracle — the pytest mirror of the reference's golden-document test
TestS4totalpayIncr.java:80-143 (synthetic binlog in, asserted wide rows
out, including derived aggregates and the version stamp).
"""

from __future__ import annotations

import pandas as pd
import pytest

from tis_spark.fixtures.star import (
    gen_star_changes,
    initial_tables,
    initial_tables_spark,
    totalpay_spec,
)
from tis_spark.wide import ERSpec, WideRowPipeline
from tis_spark.wide.totalpay import expected_wide, replay_star_oracle, totalpay_wide

N_PRIMARY = 120
N_EVENTS = 600


def _final_pdf(pipe) -> pd.DataFrame:
    return (
        pipe.final_wide()
        .toPandas()
        .sort_values("totalpay_id")
        .reset_index(drop=True)
        .astype(object)
        .where(lambda d: pd.notna(d), None)
    )


def _assert_wide_equal(got: pd.DataFrame, exp: pd.DataFrame):
    assert list(got["totalpay_id"]) == list(exp["totalpay_id"])
    for col in exp.columns:
        g, e = got[col], exp[col].astype(object).where(pd.notna(exp[col]), None)
        if col in ("pay_fee", "detail_amount", "special_fee"):
            ga = pd.to_numeric(g).fillna(-1).round(2)
            ea = pd.to_numeric(e).fillna(-1).round(2)
            bad = (ga - ea).abs() > 1e-6
        else:
            bad = g.astype(object).where(pd.notna(g), None).ne(e)
        assert not bad.any(), (
            col,
            got.loc[bad.idxmax(), "totalpay_id"] if bad.any() else None,
            g[bad].head(3).tolist(),
            e[bad].head(3).tolist(),
        )


@pytest.fixture(scope="module")
def replayed(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wide"))
    spec = totalpay_spec()
    pipe = WideRowPipeline(spark, root, spec, totalpay_wide)
    pipe.full_build(initial_tables_spark(spark, N_PRIMARY))
    changes = gen_star_changes(spark, N_EVENTS, N_PRIMARY, seed=42, epoch_size=150)
    stats = pipe.replay(changes, epoch_size=150)
    state = replay_star_oracle(spec, initial_tables(N_PRIMARY), changes.collect())
    return pipe, stats, state, changes


def test_full_build_matches_oracle(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wide-fb"))
    spec = totalpay_spec()
    pipe = WideRowPipeline(spark, root, spec, totalpay_wide)
    pipe.full_build(initial_tables_spark(spark, 60))
    exp = expected_wide(replay_star_oracle(spec, initial_tables(60), []))
    _assert_wide_equal(_final_pdf(pipe), exp)


def test_incremental_replay_matches_oracle(replayed):
    pipe, stats, state, _ = replayed
    assert all(not s.get("skipped") for s in stats)
    assert sum(s.get("n_affected", 0) for s in stats) > 0
    _assert_wide_equal(_final_pdf(pipe), expected_wide(state))


def test_golden_derived_columns(replayed):
    """Field-level asserts on specific wide rows (the TestS4totalpayIncr
    pattern): derived aggregates, enterprise flag, version stamp."""
    pipe, _, state, _ = replayed
    exp = expected_wide(state).set_index("totalpay_id")
    got = _final_pdf(pipe).set_index("totalpay_id")
    # a row whose payinfo changed: kindpay string and version must track
    moved = [t for t in exp.index if exp.loc[t, "n_pay"] != 0][:5]
    for t in moved:
        assert got.loc[t, "kindpay"] == exp.loc[t, "kindpay"], t
        assert int(got.loc[t, "version"]) == int(exp.loc[t, "version"]), t
    ent = [t for t in exp.index if exp.loc[t, "is_enterprise_card"] == 1]
    assert ent, "fixture must produce enterprise rows"
    for t in ent[:5]:
        assert int(got.loc[t, "is_enterprise_card"]) == 1, t


def test_fk_move_reparents_both_sides(replayed):
    """A payinfo row re-parented mid-stream must leave the old parent's
    aggregates and join the new parent's (J6 routing through the stored
    FK)."""
    pipe, _, state, changes = replayed
    moves = [
        d
        for d in (r.asDict(recursive=True) for r in changes.collect())
        if d["table"] == "payinfo"
        and d["op"] == "U"
        and d["after"] is not None
        and not d["pk"].startswith("paynew")
        and d["after"]["totalpay_id"] != f"tp{d['pk'][3:9]}"
    ]
    assert moves, "fixture must produce FK moves"
    exp = expected_wide(state).set_index("totalpay_id")
    got = _final_pdf(pipe).set_index("totalpay_id")
    seen = 0
    for mv in moves[:10]:
        old_parent = f"tp{mv['pk'][3:9]}"
        new_parent = mv["after"]["totalpay_id"]
        for t in (old_parent, new_parent):
            assert got.loc[t, "kindpay"] == exp.loc[t, "kindpay"], (t, mv["pk"])
            assert int(got.loc[t, "n_pay"]) == int(exp.loc[t, "n_pay"]), (t, mv["pk"])
        seen += 1
    assert seen


def test_exactly_once_redelivery(replayed, spark):
    pipe, _, state, changes = replayed
    root = pipe.root
    spec = totalpay_spec()
    pipe2 = WideRowPipeline(spark, root, spec, totalpay_wide)
    stats2 = pipe2.replay(changes, epoch_size=150)
    assert all(s.get("skipped") for s in stats2)
    _assert_wide_equal(_final_pdf(pipe2), expected_wide(state))


def test_delete_policy_removes_child_aggregates(spark, tmp_path_factory):
    """delete_policy='delete': a deleted payinfo row leaves its parent's
    aggregates; a deleted primary row tombstones the wide row."""
    root = str(tmp_path_factory.mktemp("wide-del"))
    spec = totalpay_spec()
    pipe = WideRowPipeline(spark, root, spec, totalpay_wide, delete_policy="delete")
    pipe.full_build(initial_tables_spark(spark, 20))
    before = _final_pdf(pipe).set_index("totalpay_id")
    target = "tp000003"
    n_before = int(before.loc[target, "n_pay"])
    assert n_before >= 1
    ev = spark.createDataFrame(
        pd.DataFrame(
            [
                {"seq": 1, "op": "D", "table": "payinfo", "pk": "pay000003_0",
                 "ddl": None, "before": None, "after": None, "epoch_hint": 0},
                {"seq": 2, "op": "D", "table": "totalpayinfo", "pk": "tp000005",
                 "ddl": None, "before": None, "after": None, "epoch_hint": 0},
            ]
        ),
        schema=gen_star_changes(spark, 1, 1).schema,
    )
    pipe.process_epoch(ev, 0)
    after = _final_pdf(pipe).set_index("totalpay_id")
    assert int(after.loc[target, "n_pay"]) == n_before - 1
    assert "tp000005" not in after.index  # primary tombstoned
    assert len(after) == len(before) - 1


def test_er_spec_roundtrip_and_chain():
    spec = totalpay_spec()
    rt = ERSpec.from_json(spec.to_json())
    assert rt.primary == "totalpayinfo" and rt.shared_key == "entity_id"
    chain = rt.chain_to_primary("paydetail")
    assert [r.child for r in chain] == ["paydetail", "payinfo"]
    assert chain[-1].parent == "totalpayinfo"
    assert rt.chain_to_primary("totalpayinfo") == []
    assert not rt.tables["card"].monitor  # ignoreIncrTrigger dim


def test_zone_pruned_replay_matches_oracle(spark, tmp_path_factory):
    """With sorted bases split into small files (past PRUNE_MIN_FILES),
    PK-keyed stored reads engage zone pruning; the replay must still
    match the sequential oracle exactly, and prune_stats must show files
    actually skipped."""
    root = str(tmp_path_factory.mktemp("wide-zp"))
    spec = totalpay_spec()
    pipe = WideRowPipeline(
        spark, root, spec, totalpay_wide, base_file_rows=1, num_buckets=4
    )
    pipe.full_build(initial_tables_spark(spark, N_PRIMARY))
    changes = gen_star_changes(spark, 200, N_PRIMARY, seed=7, epoch_size=100)
    pipe.replay(changes, epoch_size=100)
    state = replay_star_oracle(spec, initial_tables(N_PRIMARY), changes.collect())
    _assert_wide_equal(_final_pdf(pipe), expected_wide(state))
    prim = pipe.sources[spec.primary].path
    assert prim in pipe.prune_stats, "primary read never pruned"
    ps = pipe.prune_stats[prim]
    assert 0 < ps["files_hit"] < ps["files_total"]


def test_small_table_skips_pruning(spark, tmp_path_factory):
    """Below PRUNE_MIN_FILES base files the guard keeps the plain scan —
    no key collect, no prune_stats entries."""
    root = str(tmp_path_factory.mktemp("wide-noprune"))
    spec = totalpay_spec()
    pipe = WideRowPipeline(spark, root, spec, totalpay_wide)
    pipe.full_build(initial_tables_spark(spark, 40))
    changes = gen_star_changes(spark, 100, 40, seed=7, epoch_size=100)
    pipe.replay(changes, epoch_size=100)
    assert pipe.prune_stats == {}


def test_star_expire_preserves_state(spark, tmp_path_factory):
    """Lake GC across every star table keeps the wide state and the
    exactly-once fences intact while reclaiming the base generations the
    (frequent, threshold=2) compactions strand."""
    root = str(tmp_path_factory.mktemp("wide-gc"))
    spec = totalpay_spec()
    pipe = WideRowPipeline(spark, root, spec, totalpay_wide, compact_threshold=2)
    pipe.full_build(initial_tables_spark(spark, N_PRIMARY))
    changes = gen_star_changes(spark, N_EVENTS, N_PRIMARY, seed=42, epoch_size=100)
    pipe.replay(changes, epoch_size=100)
    state = replay_star_oracle(spec, initial_tables(N_PRIMARY), changes.collect())

    reports = pipe.expire(keep_last=2)
    assert set(reports) == {*pipe.sources.keys(), "wide"}
    assert sum(r["deleted_files"] for r in reports.values()) > 0
    _assert_wide_equal(_final_pdf(pipe), expected_wide(state))
    # redelivery after GC is still fenced per table
    pipe2 = WideRowPipeline(spark, root, totalpay_spec(), totalpay_wide)
    pipe2.replay(changes, epoch_size=100)
    _assert_wide_equal(_final_pdf(pipe2), expected_wide(state))
