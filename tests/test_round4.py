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
