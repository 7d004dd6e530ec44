"""Ledger fixture — a NON-TREE star (multi-parent child): accounts as the
primary, transfers linking two accounts (src/dst), router key entity_id.

Exercises the ER shapes the totalpay fixture cannot: a child with two
parent relations (CompositePK multi-routing, CompositePK.java:25-48) and
shared-key bucketing of the wide table.  Shared by tests/test_multi_parent
and the full-lifecycle (JDBC dump -> build -> incremental) test.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tis_spark.wide.er import ERSpec, Relation, TableMeta

N_ACC = 20


def ledger_spec() -> ERSpec:
    return ERSpec(
        primary="account",
        shared_key="entity_id",
        tables={
            "account": TableMeta(
                "account",
                pk="id",
                version_col="modify_time",
                columns={
                    "id": "string",
                    "entity_id": "string",
                    "owner": "string",
                    "modify_time": "bigint",
                },
            ),
            "transfer": TableMeta(
                "transfer",
                pk="id",
                version_col="modify_time",
                columns={
                    "id": "string",
                    "src_id": "string",
                    "dst_id": "string",
                    "amount": "bigint",
                    "modify_time": "bigint",
                },
            ),
        },
        relations=[
            Relation("account", "transfer", "id", "src_id", "1:n"),
            Relation("account", "transfer", "id", "dst_id", "1:n"),
        ],
    )


def ledger_wide(src):
    acc = src["account"]
    tr = src["transfer"]
    out_agg = tr.groupBy("src_id").agg(
        F.sum("amount").alias("out_amt"),
        F.count("*").alias("n_out"),
        F.max("modify_time").alias("_o_mt"),
    )
    in_agg = tr.groupBy("dst_id").agg(
        F.sum("amount").alias("in_amt"),
        F.count("*").alias("n_in"),
        F.max("modify_time").alias("_i_mt"),
    )
    j = acc.join(out_agg, acc.id == out_agg.src_id, "left").join(
        in_agg, acc.id == in_agg.dst_id, "left"
    )
    version = F.greatest(
        F.col("modify_time"),
        F.coalesce(F.col("_o_mt"), F.lit(0)),
        F.coalesce(F.col("_i_mt"), F.lit(0)),
    )
    return j.select(
        acc.id.alias("id"),
        "entity_id",
        "owner",
        F.coalesce(F.col("out_amt"), F.lit(0)).alias("out_amt"),
        F.coalesce(F.col("n_out"), F.lit(0)).alias("n_out"),
        F.coalesce(F.col("in_amt"), F.lit(0)).alias("in_amt"),
        F.coalesce(F.col("n_in"), F.lit(0)).alias("n_in"),
        version.alias("version"),
    )


def initial_ledger(n_acc: int = N_ACC) -> dict[str, pd.DataFrame]:
    acc = [
        {"id": f"a{i:03d}", "entity_id": f"ent{i % 4}", "owner": f"own{i}",
         "modify_time": 1000 + i}
        for i in range(n_acc)
    ]
    tr = [
        {"id": f"t{i:03d}", "src_id": f"a{i % n_acc:03d}",
         "dst_id": f"a{(i * 7 + 3) % n_acc:03d}", "amount": 10 + i,
         "modify_time": 1000 + i}
        for i in range(30)
    ]
    return {"account": pd.DataFrame(acc), "transfer": pd.DataFrame(tr)}


def expected_ledger(state) -> pd.DataFrame:
    out_by, in_by = {}, {}
    for t in state["transfer"].values():
        out_by.setdefault(t["src_id"], []).append(t)
        in_by.setdefault(t["dst_id"], []).append(t)
    rows = []
    for aid, a in state["account"].items():
        outs, ins = out_by.get(aid, []), in_by.get(aid, [])
        rows.append(
            {
                "id": aid,
                "entity_id": a["entity_id"],
                "owner": a["owner"],
                "out_amt": sum(t["amount"] for t in outs),
                "n_out": len(outs),
                "in_amt": sum(t["amount"] for t in ins),
                "n_in": len(ins),
                "version": max(
                    [a["modify_time"]]
                    + [t["modify_time"] for t in outs]
                    + [t["modify_time"] for t in ins]
                ),
            }
        )
    return pd.DataFrame(rows).sort_values("id").reset_index(drop=True)
