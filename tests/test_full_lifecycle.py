"""The reference's full-build lifecycle end-to-end with REAL components
(SURVEY §3.1 FullDump -> JOIN -> BUILD -> swap, FullbuildPhase.java:27-29):

  live JDBC source (embedded Derby)  --read_shards-->  Spark
  --dump_tsv-->  reference-layout dump artifacts (16 groups + success)
  --read_tsv_dump-->  typed DataFrames
  --WideRowPipeline.full_build-->  star lakes + wide table
  --process_epoch-->  incremental maintenance on top

Every stage is the production code path; the final wide table must equal
the pandas oracle computed from the same initial rows.
"""

from __future__ import annotations

import pytest

from tis_spark.fixtures.ledger import (
    expected_ledger,
    initial_ledger,
    ledger_spec,
    ledger_wide,
)
from tis_spark.fixtures.star import STAR_CHANGE_SCHEMA
from tis_spark.sources.dump import dump_tsv, read_tsv_dump
from tis_spark.sources.jdbc import read_shards
from tis_spark.wide import WideRowPipeline
from tis_spark.wide.totalpay import replay_star_oracle


def _derby_load(spark, url: str, spec, initial):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        st.execute(
            "CREATE TABLE account (id VARCHAR(16) PRIMARY KEY,"
            " entity_id VARCHAR(16), owner VARCHAR(32), modify_time BIGINT)"
        )
        st.execute(
            "CREATE TABLE transfer (id VARCHAR(16) PRIMARY KEY,"
            " src_id VARCHAR(16), dst_id VARCHAR(16), amount BIGINT,"
            " modify_time BIGINT)"
        )
        for r in initial["account"].to_dict("records"):
            st.execute(
                f"INSERT INTO account VALUES ('{r['id']}', '{r['entity_id']}',"
                f" '{r['owner']}', {r['modify_time']})"
            )
        for r in initial["transfer"].to_dict("records"):
            st.execute(
                f"INSERT INTO transfer VALUES ('{r['id']}', '{r['src_id']}',"
                f" '{r['dst_id']}', {r['amount']}, {r['modify_time']})"
            )
        st.close()
    finally:
        conn.close()


def test_jdbc_dump_build_incremental_lifecycle(spark, tmp_path):
    spec = ledger_spec()
    initial = initial_ledger()
    url = f"jdbc:derby:{tmp_path}/src;create=true"
    _derby_load(spark, url, spec, initial)
    jurl = url.replace(";create=true", "")

    # FullDump phase: live JDBC scan -> reference-layout TSV dump artifacts
    dumped = {}
    for name, meta in spec.tables.items():
        df = read_shards(spark, [jurl], name)
        df = df.select(*[df[c.upper()].alias(c) for c in meta.columns])  # Derby upcases
        dump_tsv(df, str(tmp_path / f"dump_{name}"), shard_col=meta.pk)
        dumped[name] = read_tsv_dump(spark, str(tmp_path / f"dump_{name}"))
        assert [f.name for f in dumped[name].schema.fields] == list(meta.columns)

    # JOIN + BUILD + swap: star full build from the dump artifacts
    pipe = WideRowPipeline(spark, str(tmp_path / "star"), spec, ledger_wide, num_buckets=4)
    pipe.full_build(
        {n: df.select(*[df[c].cast(t.dataType).alias(c)
                        for c, t in zip(spec.tables[n].columns, spec.tables[n].schema.fields)])
         for n, df in dumped.items()}
    )
    state0 = replay_star_oracle(ledger_spec(), initial, [])
    exp0 = expected_ledger(state0)
    got0 = pipe.final_wide().toPandas().sort_values("id").reset_index(drop=True)[exp0.columns]
    for col in exp0.columns:
        assert list(got0[col]) == list(exp0[col]), col

    # incremental epoch on top (bootstrap-then-tail)
    ev = spark.createDataFrame(
        [
            {"seq": 1, "op": "U", "table": "transfer", "pk": "t000", "ddl": None,
             "before": None, "epoch_hint": 0,
             "after": {"id": "t000", "src_id": "a000", "dst_id": "a011",
                       "amount": "77", "modify_time": "3001"}},
        ],
        schema=STAR_CHANGE_SCHEMA,
    )
    pipe.process_epoch(ev, 0)
    state1 = replay_star_oracle(ledger_spec(), initial, ev.collect())
    exp1 = expected_ledger(state1)
    got1 = pipe.final_wide().toPandas().sort_values("id").reset_index(drop=True)[exp1.columns]
    for col in exp1.columns:
        assert list(got1[col]) == list(exp1[col]), col
