"""The totalpay wide-row topology — the user-authored JOIN query of the
star fixture, plus its pure-pandas oracle.

Spark side mirrors the reference's generated derivations
(S4totalpayListener.scala:436-481 / asserted in
TestS4totalpayIncr.java:80-143):

* ``kindpay``: concat_ws(';') over the sorted collect_list of
  ``kindpay_id _ type`` per totalpay (mapPayinfoData);
* ``is_enterprise_card``: case-when over ``rlike(card.code, '^E_')`` OR
  any payinfo of type 103 (the enterprise-card pay channel);
* fee roll-ups incl. a 2-hop aggregate (paydetail -> payinfo ->
  totalpay);
* ``version`` = max modify_time across all contributing tables (the doc
  ``_version_`` the reference stamps from the triggering event).

The oracle replays the change stream sequentially per table (apply iff
version > stored — V3 LWW with >= -is-dirty tie semantics) and recomputes
every wide row from final source state in pandas; the engine's
incremental maintenance must land on the identical table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def totalpay_wide(src: dict[str, DataFrame]) -> DataFrame:
    tp = src["totalpayinfo"]
    pay = src["payinfo"]
    pdt = src["paydetail"]
    od = src["orderdetail"]
    sf = src["specialfee"]
    card = src["card"]
    cust = src["customer"]

    pay_agg = pay.groupBy("totalpay_id").agg(
        F.concat_ws(
            ";",
            F.array_sort(
                F.collect_list(
                    F.concat_ws("_", F.col("kindpay_id"), F.col("type").cast("string"))
                )
            ),
        ).alias("kindpay"),
        F.round(F.sum("fee"), 2).alias("pay_fee"),
        F.count("*").alias("n_pay"),
        F.max(F.when(F.col("type") == 103, 1).otherwise(0)).alias("has_103"),
        F.max("modify_time").alias("_pay_mt"),
    )
    # 2-hop roll-up: paydetail amounts reach the totalpay via payinfo
    pdt_agg = (
        pdt.join(pay.select("id", "totalpay_id"), pdt.payinfo_id == pay.id)
        .groupBy("totalpay_id")
        .agg(
            F.round(F.sum("amount"), 2).alias("detail_amount"),
            F.max(pdt.modify_time).alias("_pdt_mt"),
        )
    )
    sf_agg = sf.groupBy("totalpay_id").agg(
        F.round(F.sum("fee"), 2).alias("special_fee"),
        F.max("modify_time").alias("_sf_mt"),
    )
    od_sel = od.select(
        F.col("totalpay_id"),
        F.col("open_time"),
        F.col("modify_time").alias("_od_mt"),
    )

    joined = (
        tp.join(pay_agg, "totalpay_id", "left")
        .join(pdt_agg, "totalpay_id", "left")
        .join(sf_agg, "totalpay_id", "left")
        .join(od_sel, "totalpay_id", "left")
        .join(
            F.broadcast(card.select(F.col("id"), F.col("customer_id"), F.col("code"))),
            tp.card_id == F.col("id"),
            "left",
        )
        .drop("id")
        .join(
            F.broadcast(cust.select(F.col("id"), F.col("name").alias("customer_name"))),
            F.col("customer_id") == F.col("id"),
            "left",
        )
        .drop("id")
    )
    is_ent = F.when(
        F.coalesce(F.col("code").rlike("^E_"), F.lit(False))
        | (F.coalesce(F.col("has_103"), F.lit(0)) == 1),
        1,
    ).otherwise(0)
    version = F.greatest(
        F.col("modify_time"),
        F.coalesce(F.col("_pay_mt"), F.lit(0)),
        F.coalesce(F.col("_pdt_mt"), F.lit(0)),
        F.coalesce(F.col("_sf_mt"), F.lit(0)),
        F.coalesce(F.col("_od_mt"), F.lit(0)),
    )
    return joined.select(
        "totalpay_id",
        "entity_id",
        "card_id",
        "recieve_amount",
        "is_valid",
        F.coalesce(F.col("kindpay"), F.lit("")).alias("kindpay"),
        F.coalesce(F.col("pay_fee"), F.lit(0.0)).alias("pay_fee"),
        F.coalesce(F.col("n_pay"), F.lit(0)).alias("n_pay"),
        F.coalesce(F.col("detail_amount"), F.lit(0.0)).alias("detail_amount"),
        F.coalesce(F.col("special_fee"), F.lit(0.0)).alias("special_fee"),
        F.col("open_time"),
        F.col("customer_id"),
        F.col("customer_name"),
        is_ent.alias("is_enterprise_card"),
        version.alias("version"),
    )


# The same topology as user-authored node SQL (NodeType.JOINER_SQL — what a
# TIS dataflow actually hands the engine; cf. the reference's rewritten node
# SQL fixture tis-sql-parser/src/test/resources/.../sqlrewrite.txt and
# SqlTaskNodeMeta.getRewriteSql, SqlTaskNodeMeta.java:247-276).  Passing this
# string as ``wide_fn`` must land on the identical wide table as
# ``totalpay_wide`` above — pinned by tests/test_round4.py.
TOTALPAY_WIDE_SQL = """
WITH pay_agg AS (
  SELECT totalpay_id,
         concat_ws(';', array_sort(collect_list(
             concat_ws('_', kindpay_id, CAST(type AS STRING))))) AS kindpay,
         round(sum(fee), 2) AS pay_fee,
         count(*) AS n_pay,
         max(CASE WHEN type = 103 THEN 1 ELSE 0 END) AS has_103,
         max(modify_time) AS _pay_mt
  FROM payinfo GROUP BY totalpay_id
),
pdt_agg AS (
  SELECT p.totalpay_id,
         round(sum(d.amount), 2) AS detail_amount,
         max(d.modify_time) AS _pdt_mt
  FROM paydetail d JOIN payinfo p ON d.payinfo_id = p.id
  GROUP BY p.totalpay_id
),
sf_agg AS (
  SELECT totalpay_id, round(sum(fee), 2) AS special_fee,
         max(modify_time) AS _sf_mt
  FROM specialfee GROUP BY totalpay_id
)
SELECT /*+ BROADCAST(card), BROADCAST(cust) */
       tp.totalpay_id, tp.entity_id, tp.card_id, tp.recieve_amount, tp.is_valid,
       coalesce(pa.kindpay, '') AS kindpay,
       coalesce(pa.pay_fee, 0.0d) AS pay_fee,
       coalesce(pa.n_pay, 0L) AS n_pay,
       coalesce(pd.detail_amount, 0.0d) AS detail_amount,
       coalesce(sf.special_fee, 0.0d) AS special_fee,
       od.open_time,
       card.customer_id,
       cust.name AS customer_name,
       CASE WHEN coalesce(card.code RLIKE '^E_', false)
              OR coalesce(pa.has_103, 0) = 1
            THEN 1 ELSE 0 END AS is_enterprise_card,
       greatest(tp.modify_time, coalesce(pa._pay_mt, 0L), coalesce(pd._pdt_mt, 0L),
                coalesce(sf._sf_mt, 0L), coalesce(od.modify_time, 0L)) AS version
FROM totalpayinfo tp
LEFT JOIN pay_agg pa ON tp.totalpay_id = pa.totalpay_id
LEFT JOIN pdt_agg pd ON tp.totalpay_id = pd.totalpay_id
LEFT JOIN sf_agg sf ON tp.totalpay_id = sf.totalpay_id
LEFT JOIN orderdetail od ON tp.totalpay_id = od.totalpay_id
LEFT JOIN card ON tp.card_id = card.id
LEFT JOIN customer cust ON card.customer_id = cust.id
"""


# ---------------------------------------------------------------- oracle

_CASTS = {
    "tinyint": int,
    "smallint": int,
    "int": int,
    "bigint": int,
    "float": float,
    "double": float,
    "string": str,
    "boolean": lambda v: v in ("1", "true", "True", True),
}


def replay_star_oracle(spec, initial: dict[str, pd.DataFrame], event_rows: list) -> dict:
    """Sequential ground truth: apply every event in seq order against
    dict-state per table (apply iff no stored row or version > stored —
    the reference's isRecordDirty with old >= new ⇒ dirty), honoring the
    default ignore-delete policy.  Returns table-name -> {pk: row}."""
    state: dict[str, dict] = {}
    for name, pdf in initial.items():
        meta = spec.tables[name]
        state[name] = {r[meta.pk]: dict(r) for r in pdf.to_dict("records")}
    for r in sorted(event_rows, key=lambda r: r["seq"]):
        d = r.asDict(recursive=True) if hasattr(r, "asDict") else dict(r)
        name = d["table"]
        if d["op"] == "DDL":
            # §1.5 registry parity: evolve the table's column set in seq
            # order; subsequent events decode with the new schema, prior
            # rows read back NULL for the added column
            from tis_spark.cdc.registry import parse_ddl
            from tis_spark.wide.er import ER_TYPE_NAMES

            _, col, dtype = parse_ddl(d["ddl"])
            spec.tables[name].columns[col] = ER_TYPE_NAMES[dtype.typeName()]
            continue
        meta = spec.tables.get(name)
        if meta is None or not meta.monitor:
            continue
        if d["op"] == "D":
            continue  # ignore policy (V8)
        after = {
            c: (_CASTS[t](d["after"][c]) if d["after"].get(c) is not None else None)
            for c, t in meta.columns.items()
        }
        cur = state[name].get(d["pk"])
        if cur is not None and after[meta.version_col] <= cur[meta.version_col]:
            continue  # dirty (V3)
        state[name][d["pk"]] = after
    return state


def expected_wide(state: dict[str, dict]) -> pd.DataFrame:
    """Recompute every wide row from final source state (pandas mirror of
    ``totalpay_wide``) — the golden final table."""
    pay_by_tp: dict[str, list] = {}
    for p in state["payinfo"].values():
        pay_by_tp.setdefault(p["totalpay_id"], []).append(p)
    pdt_by_pay: dict[str, list] = {}
    for x in state["paydetail"].values():
        pdt_by_pay.setdefault(x["payinfo_id"], []).append(x)
    sf_by_tp: dict[str, list] = {}
    for x in state["specialfee"].values():
        sf_by_tp.setdefault(x["totalpay_id"], []).append(x)
    od_by_tp = {x["totalpay_id"]: x for x in state["orderdetail"].values()}
    cards = state["card"]
    custs = state["customer"]

    out = []
    for tp_id, tp in state["totalpayinfo"].items():
        pays = pay_by_tp.get(tp_id, [])
        kindpay = ";".join(sorted(f"{p['kindpay_id']}_{p['type']}" for p in pays))
        pay_fee = round(sum(p["fee"] for p in pays), 2) if pays else 0.0
        has_103 = any(p["type"] == 103 for p in pays)
        details = [x for p in pays for x in pdt_by_pay.get(p["id"], [])]
        detail_amount = round(sum(x["amount"] for x in details), 2) if details else 0.0
        sfs = sf_by_tp.get(tp_id, [])
        special_fee = round(sum(x["fee"] for x in sfs), 2) if sfs else 0.0
        od = od_by_tp.get(tp_id)
        card = cards.get(tp["card_id"])
        cust = custs.get(card["customer_id"]) if card else None
        is_ent = 1 if ((card and card["code"].startswith("E_")) or has_103) else 0
        version = max(
            [tp["modify_time"]]
            + [p["modify_time"] for p in pays]
            + [x["modify_time"] for x in details]
            + [x["modify_time"] for x in sfs]
            + ([od["modify_time"]] if od else [])
        )
        out.append(
            {
                "totalpay_id": tp_id,
                "entity_id": tp["entity_id"],
                "card_id": tp["card_id"],
                "recieve_amount": tp["recieve_amount"],
                "is_valid": tp["is_valid"],
                "kindpay": kindpay,
                "pay_fee": pay_fee,
                "n_pay": len(pays),
                "detail_amount": detail_amount,
                "special_fee": special_fee,
                "open_time": od["open_time"] if od else None,
                "customer_id": card["customer_id"] if card else None,
                "customer_name": cust["name"] if cust else None,
                "is_enterprise_card": is_ent,
                "version": version,
            }
        )
    return (
        pd.DataFrame(out).sort_values("totalpay_id").reset_index(drop=True)
        if out
        else pd.DataFrame()
    )
