"""ER generality (VERDICT r2 'What's missing #2'): a NON-TREE topology —
a child table linking the primary through TWO relations (ledger transfers
with src/dst accounts) — replayed against a sequential oracle, plus
router-key (shared_key) bucketing of the wide table with relocation
tombstones when the router value changes.

Reference semantics: multi-parent children + CompositePK router keys
(tis-realtime-base/.../transfer/impl/CompositePK.java:25-48;
tis-sql-parser/.../er/PrimaryTableMeta.createCompositePK
PrimaryTableMeta.java:96-135).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tis_spark.fixtures.ledger import (
    expected_ledger,
    initial_ledger,
    ledger_spec,
    ledger_wide,
)
from tis_spark.fixtures.star import STAR_CHANGE_SCHEMA
from tis_spark.wide import WideRowPipeline
from tis_spark.wide.totalpay import replay_star_oracle


def _mk(spark, rows):
    base = {"ddl": None, "before": None, "after": None, "epoch_hint": 0}
    return spark.createDataFrame([{**base, **r} for r in rows], schema=STAR_CHANGE_SCHEMA)


def _tr_after(pk, src, dst, amount, mt):
    return {"id": pk, "src_id": src, "dst_id": dst, "amount": str(amount),
            "modify_time": str(mt)}


def _acc_after(pk, ent, owner, mt):
    return {"id": pk, "entity_id": ent, "owner": owner, "modify_time": str(mt)}


@pytest.fixture(scope="module")
def ledger(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ledger"))
    spec = ledger_spec()
    pipe = WideRowPipeline(spark, root, spec, ledger_wide, num_buckets=4)
    initial = initial_ledger()
    pipe.full_build(
        {n: spark.createDataFrame(pdf, schema=spec.tables[n].schema)
         for n, pdf in initial.items()}
    )
    events = [
        # re-point a transfer's DST: both the old and new dst accounts (and
        # the unchanged src) must re-derive
        {"seq": 1, "op": "U", "table": "transfer", "pk": "t000",
         "after": _tr_after("t000", "a000", "a010", 99, 2001)},
        # re-point a transfer's SRC
        {"seq": 2, "op": "U", "table": "transfer", "pk": "t001",
         "after": _tr_after("t001", "a015", "a010", 11, 2002)},
        # brand-new transfer
        {"seq": 3, "op": "I", "table": "transfer", "pk": "tnew3",
         "after": _tr_after("tnew3", "a002", "a003", 500, 2003)},
        # account owner change (primary update)
        {"seq": 4, "op": "U", "table": "account", "pk": "a004",
         "after": _acc_after("a004", "ent0", "own4b", 2004)},
        # ROUTER change: account a005 moves to another entity — the wide
        # row must relocate buckets (old-bucket tombstone)
        {"seq": 5, "op": "U", "table": "account", "pk": "a005",
         "after": _acc_after("a005", "ent3", "own5", 2005)},
        # dirty event (regressed version) — dropped by LWW
        {"seq": 6, "op": "U", "table": "transfer", "pk": "t002",
         "after": _tr_after("t002", "a002", "a017", 1, 500)},
    ]
    ev_df = _mk(spark, events)
    pipe.process_epoch(ev_df.filter(F.col("seq") <= 3), 0)
    pipe.process_epoch(ev_df.filter(F.col("seq") > 3), 1)
    state = replay_star_oracle(ledger_spec(), initial, ev_df.collect())
    return pipe, state


def test_chains_to_primary_enumerates_both_paths():
    spec = ledger_spec()
    chains = spec.chains_to_primary("transfer")
    assert len(chains) == 2
    assert sorted(c[0].child_key for c in chains) == ["dst_id", "src_id"]
    assert all(c[0].parent == "account" for c in chains)


def test_multi_parent_replay_matches_oracle(ledger):
    pipe, state = ledger
    exp = expected_ledger(state)
    got = (
        pipe.final_wide()
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)[exp.columns]
    )
    for col in exp.columns:
        assert list(got[col]) == list(exp[col]), col


def test_wide_router_layout_and_relocation(ledger, spark):
    pipe, state = ledger
    wsnap = pipe.wide.current_snapshot()
    assert wsnap.layout_col == "entity_id"  # shared_key bucketing (K4)
    # the router-changed row is visible exactly once with the NEW entity
    rows = pipe.final_wide().filter(F.col("id") == "a005").collect()
    assert len(rows) == 1 and rows[0]["entity_id"] == "ent3"
    # a relocation tombstone was written to the OLD bucket: reading only
    # that bucket must not surface the moved row
    old_b = pipe.wide.read().filter(F.col("id") == "a005")
    assert old_b.count() == 1
    # redelivery is fenced and state unchanged
    pipe2 = WideRowPipeline(spark, pipe.root, ledger_spec(), ledger_wide, num_buckets=4)
    ev = _mk(spark, [{"seq": 1, "op": "U", "table": "transfer", "pk": "t000",
                      "after": _tr_after("t000", "a000", "a010", 99, 2001)}])
    assert pipe2.process_epoch(ev, 0).get("skipped")


def test_crash_between_source_and_wide_commit(spark, tmp_path_factory):
    """The exactly-once crash window the pipeline docstring claims: source
    commits landed, the wide commit did NOT (sink failure).  The epoch is
    not fenced (no wide epoch_id), so a fresh pipeline re-runs it; the
    re-applied source events compare equal to the stored versions and drop
    as dirty (V3 LWW), so nothing double-applies and the final wide table
    still matches the oracle."""
    from tis_spark.fixtures.star import (
        gen_star_changes,
        initial_tables,
        initial_tables_spark,
        totalpay_spec,
    )
    from tis_spark.wide.totalpay import expected_wide, totalpay_wide

    root = str(tmp_path_factory.mktemp("crashwin"))
    pipe = WideRowPipeline(spark, root, totalpay_spec(), totalpay_wide)
    pipe.full_build(initial_tables_spark(spark, 30))
    gen = gen_star_changes(spark, 80, 30, seed=13, epoch_size=80)

    def boom(*a, **k):
        raise OSError("simulated sink failure before the wide publish")

    orig = pipe.wide.commit
    pipe.wide.commit = boom
    with pytest.raises(OSError):
        pipe.process_epoch(gen, 0)
    pipe.wide.commit = orig
    assert pipe.wide.last_epoch_id() is None  # crash window confirmed

    pipe2 = WideRowPipeline(spark, root, totalpay_spec(), totalpay_wide)
    out = pipe2.process_epoch(gen, 0)  # redelivery of the SAME epoch
    assert not out.get("skipped")
    state = replay_star_oracle(totalpay_spec(), initial_tables(30), gen.collect())
    exp = expected_wide(state)
    got = (
        pipe2.final_wide().toPandas().sort_values("totalpay_id").reset_index(drop=True)
    )
    assert list(got["totalpay_id"]) == list(exp["totalpay_id"])
    assert list(got["kindpay"]) == list(exp["kindpay"])
    assert [int(v) for v in got["n_pay"]] == [int(v) for v in exp["n_pay"]]


def test_repointed_transfer_rederives_all_three_parents(ledger):
    pipe, state = ledger
    exp = expected_ledger(state).set_index("id")
    got = pipe.final_wide().toPandas().set_index("id")
    # t000 was dst-repointed a003 -> a010 (src a000 unchanged)
    for aid in ("a000", "a003", "a010"):
        for col in ("out_amt", "n_out", "in_amt", "n_in"):
            assert int(got.loc[aid, col]) == int(exp.loc[aid, col]), (aid, col)
