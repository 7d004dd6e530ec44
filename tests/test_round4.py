"""Round-4 additions: SQL-authored JOINER nodes (the reference's topology
authoring surface, NodeType.JOINER_SQL / SqlTaskNodeMeta.getRewriteSql),
the tinyint/smallint DDL evolution gap, and checkpoint-mode validation."""

from __future__ import annotations

import pandas as pd
import pytest

from tis_spark.fixtures.star import (
    STAR_CHANGE_SCHEMA,
    gen_star_changes,
    initial_tables,
    initial_tables_spark,
    totalpay_spec,
)
from tis_spark.wide import WideRowPipeline
from tis_spark.wide.totalpay import (
    TOTALPAY_WIDE_SQL,
    expected_wide,
    replay_star_oracle,
)

N_PRIMARY = 60
N_EVENTS = 300


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
        assert not bad.any(), (col, g[bad].head(3).tolist(), e[bad].head(3).tolist())


def test_sql_node_replay_matches_oracle(spark, tmp_path):
    """The totalpay star driven by the SQL form of the JOIN node (a string,
    not a Python callable) must land on the identical wide table as the
    DataFrame form — full build AND incremental epochs both route through
    SqlWideNode over the restricted source slices."""
    spec = totalpay_spec()
    pipe = WideRowPipeline(spark, str(tmp_path / "star"), spec, TOTALPAY_WIDE_SQL)
    pipe.full_build(initial_tables_spark(spark, N_PRIMARY))
    changes = gen_star_changes(spark, N_EVENTS, N_PRIMARY, seed=43, epoch_size=100)
    stats = pipe.replay(changes, epoch_size=100)
    assert sum(s.get("n_affected", 0) for s in stats) > 0
    state = replay_star_oracle(spec, initial_tables(N_PRIMARY), changes.collect())
    _assert_wide_equal(_final_pdf(pipe), expected_wide(state))


def test_small_int_ddl_evolves(spark, tmp_path):
    """ADD COLUMN x SMALLINT / TINYINT arriving through the stream must
    evolve both the lake schema and the ER spec (ER_TYPE_NAMES byte/short
    entries) instead of wedging the epoch with a KeyError."""
    from tis_spark.fixtures.ledger import initial_ledger, ledger_spec, ledger_wide

    spec = ledger_spec()
    pipe = WideRowPipeline(spark, str(tmp_path / "star"), spec, ledger_wide, num_buckets=4)
    initial = initial_ledger()
    pipe.full_build(
        {n: spark.createDataFrame(pdf, schema=spec.tables[n].schema)
         for n, pdf in initial.items()}
    )
    base = {"ddl": None, "before": None, "after": None, "epoch_hint": 0}
    rows = [
        {**base, "seq": 1, "op": "DDL", "table": "account", "pk": "",
         "ddl": "ADD COLUMN tier SMALLINT"},
        {**base, "seq": 2, "op": "DDL", "table": "account", "pk": "",
         "ddl": "ADD COLUMN flag TINYINT"},
        {**base, "seq": 3, "op": "U", "table": "account", "pk": "a001",
         "after": {"id": "a001", "entity_id": "ent1", "owner": "own1c",
                   "tier": "3", "flag": "1", "modify_time": "5002"}},
    ]
    changes = spark.createDataFrame(rows, schema=STAR_CHANGE_SCHEMA)
    pipe.process_epoch(changes, epoch_id=1)
    assert spec.tables["account"].columns["tier"] == "smallint"
    assert spec.tables["account"].columns["flag"] == "tinyint"
    acc = {r["id"]: r.asDict() for r in pipe.sources["account"].read().collect()}
    assert acc["a001"]["tier"] == 3
    assert acc["a001"]["flag"] == 1
    assert acc["a000"].get("tier") is None


def test_checkpoint_mode_validated(spark, tmp_path):
    with pytest.raises(ValueError, match="checkpoint_intermediates"):
        WideRowPipeline(
            spark, str(tmp_path / "x"), totalpay_spec(), TOTALPAY_WIDE_SQL,
            checkpoint_intermediates="Reliable",
        )


# ---------------------------------------------------------- timeCharacteristic


def _ledger_pt_spec():
    """Ledger spec under ProcessTime: account carries NO event-time version
    column (version_col=None -> synthetic ingest stamp), transfer keeps its
    event-time modify_time — the mixed shape the reference's per-table
    hasSetTimestampVerColumn check allows under a global ProcessTime."""
    from tis_spark.fixtures.ledger import ledger_spec
    from tis_spark.wide.er import ERSpec, TableMeta

    ev = ledger_spec()
    acc = ev.tables["account"]
    return ERSpec(
        primary="account",
        shared_key="entity_id",
        tables={
            "account": TableMeta(
                "account", pk=acc.pk, version_col=None, columns=dict(acc.columns)
            ),
            "transfer": ev.tables["transfer"],
        },
        relations=ev.relations,
        time_characteristic="ProcessTime",
    )


def _pt_stream(spark):
    """Same delivery stream under both characteristics: three updates to
    account a000 whose payload modify_time DECREASES as delivery advances
    (seq 1: mt=9999; seq 2: mt=1; epoch 2's seq 3: mt=5)."""
    base = {"ddl": None, "before": None, "epoch_hint": 0}
    rows = [
        {**base, "seq": 1, "op": "U", "table": "account", "pk": "a000",
         "after": {"id": "a000", "entity_id": "ent0", "owner": "first",
                   "modify_time": "9999"}},
        {**base, "seq": 2, "op": "U", "table": "account", "pk": "a000",
         "after": {"id": "a000", "entity_id": "ent0", "owner": "second",
                   "modify_time": "1"}},
        {**base, "seq": 3, "op": "U", "table": "account", "pk": "a000",
         "after": {"id": "a000", "entity_id": "ent0", "owner": "third",
                   "modify_time": "5"}},
    ]
    return spark.createDataFrame(rows, schema=STAR_CHANGE_SCHEMA)


def test_time_characteristic_process_vs_event(spark, tmp_path):
    """ER timeCharacteristic (TimeCharacteristic.java:22, global default
    EventTime per ERRules.java:62): under ProcessTime a version-column-less
    table is LWW-versioned by ARRIVAL (the generated processTimeVer stamp,
    StreamComponentCodeGenerator.java:202-208) — the last-delivered change
    wins, across and within epochs, regardless of payload timestamps;
    under EventTime the same stream resolves by modify_time."""
    from tis_spark.fixtures.ledger import initial_ledger, ledger_spec, ledger_wide

    initial = initial_ledger(8)
    finals = {}
    for label, spec in (("event", ledger_spec()), ("process", _ledger_pt_spec())):
        pipe = WideRowPipeline(
            spark, str(tmp_path / label), spec, ledger_wide, num_buckets=4
        )
        pipe.full_build(
            {n: spark.createDataFrame(pdf) for n, pdf in initial.items()}
        )
        pipe.replay(_pt_stream(spark), epoch_size=3)  # epochs: seq 1-2 | seq 3
        finals[label] = {
            r["id"]: r.asDict() for r in pipe.final_wide().collect()
        }
    # EventTime: mt=9999 wins its batch, then mt=5 drops as dirty
    assert finals["event"]["a000"]["owner"] == "first"
    # ProcessTime: last-delivered wins the batch (seq 2 beats seq 1's
    # higher mt), then epoch 2's arrival beats the stored stamp
    assert finals["process"]["a000"]["owner"] == "third"


def test_time_characteristic_spec_roundtrip():
    from tis_spark.wide.er import ERSpec, PROCESS_TIME_COL, TableMeta

    spec = _ledger_pt_spec()
    acc = spec.tables["account"]
    assert acc.process_time and acc.version_col == PROCESS_TIME_COL
    assert acc.columns[PROCESS_TIME_COL] == "bigint"
    back = ERSpec.from_json(spec.to_json())
    assert back.time_characteristic == "ProcessTime"
    assert back.tables["account"].process_time
    assert back.tables["account"].version_col == PROCESS_TIME_COL
    # EventTime (the default) rejects a version-column-less table, the
    # reference's codegen guard (StreamComponentCodeGenerator.java:202-205)
    with pytest.raises(ValueError, match="ProcessTime"):
        ERSpec(
            primary="t",
            shared_key="k",
            tables={"t": TableMeta("t", pk="id", version_col=None,
                                   columns={"id": "string", "k": "string"})},
            relations=[],
        )


def test_epoch0_delete_beats_full_build_rows(spark, tmp_table_dir):
    """Initial-build bases stamp _commit = -1 (they predate every epoch):
    an epoch-0 DELETE tombstone (_commit 0) must still kill a bootstrapped
    row — the read path's alive-over-dead tie-break at equal _commit is
    reserved for same-epoch relocation pairs and must not resurrect
    full-build rows against the stream's very first epoch."""
    import datetime as dt

    from tis_spark.cdc import CdcConfig, CdcIngest
    from tis_spark.fixtures.gen import CHANGE_SCHEMA

    cfg = CdcConfig(fold_parallelism=4, delete_policy="delete")
    ing = CdcIngest(spark, tmp_table_dir, cfg)
    boot = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "url": f"https://boot.example.org/p{i}",
                    "warc_ts": pd.Timestamp(1_704_067_200_000 + i * 1000, unit="ms", tz="UTC"),
                    "html": f"<html><head><title>B{i}</title></head><body><p>w{i}</p></body></html>".encode(),
                    "lang": "en",
                }
                for i in range(20)
            ]
        )
    )
    ing.full_build(boot)
    assert ing.final_state().count() == 20

    gone = "https://boot.example.org/p3"
    ts = dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc)
    ev = spark.createDataFrame(
        [
            {
                "seq": 1,
                "delivery_key": 1,
                "op": "D",
                "ts_ms": ts,
                "table": "pages",
                "schema_version": 1,
                "ddl": None,
                "before": {"url": gone, "warc_ts": ts, "html": None, "lang": "en",
                           "fetch_status": None, "score": None},
                "after": None,
                "epoch_hint": 0,
            }
        ],
        schema=CHANGE_SCHEMA,
    )
    ing.process_epoch(ev, 0, final_flush=True)
    from pyspark.sql import functions as F

    assert ing.final_state().filter(F.col("url") == gone).count() == 0
    assert ing.final_state().count() == 19
