"""F4 star-schema fixture — the totalpay test family condensed
(FIXTURES.md F4; reference tests tis-realtime-base/src/test/java/com/
qlangtech/tis/realtime/test/{order,member,shop} and the generated listener
tis-dag/src/test/resources/.../S4totalpayListener.scala).

Deterministic (seed, index)-pure generation like fixtures/gen.py: initial
full-dump tables plus a binlog-shaped change stream.  Change events are
stringly-typed ``map<string,string>`` images — the reference's row model
(DefaultTable is Map<String,String>, SURVEY §1.2); the engine casts per
the ER spec's column types.

Tables (ERSpec in ``totalpay_spec``):

* totalpayinfo — primary (sharedKey=entity_id), pk totalpay_id
* payinfo      — 1:n child (fk totalpay_id), the kindpay/fee source
* paydetail    — 1:n child of payinfo (2-hop FK chain to the primary —
                 exercises general chain routing, FlatTableRelation)
* orderdetail  — 1:1 child
* specialfee   — 1:n child
* card, customer — lookup dims (ignoreIncrTrigger / monitor=False)

The stream exercises: updates on every monitored table, child inserts,
FK moves (a payinfo row re-parented to another totalpay — both old and
new parent must re-derive), dirty events (regressed modify_time, dropped
by LWW), and deletes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from tis_spark.fixtures.gen import mix64
from tis_spark.wide.er import ERSpec, Relation, TableMeta

MT0 = 20_240_101_000_000  # yyyyMMddHHmmss-shaped base version stamp

STAR_CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # I | U | D
        T.StructField("table", T.StringType(), False),
        T.StructField("pk", T.StringType(), False),
        T.StructField("ddl", T.StringType()),  # op='DDL' rows only (§1.5)
        T.StructField("before", T.MapType(T.StringType(), T.StringType())),
        T.StructField("after", T.MapType(T.StringType(), T.StringType())),
        T.StructField("epoch_hint", T.IntegerType(), False),
    ]
)


def totalpay_spec() -> ERSpec:
    return ERSpec(
        primary="totalpayinfo",
        shared_key="entity_id",
        tables={
            "totalpayinfo": TableMeta(
                "totalpayinfo",
                pk="totalpay_id",
                version_col="modify_time",
                columns={
                    "totalpay_id": "string",
                    "entity_id": "string",
                    "card_id": "string",
                    "recieve_amount": "bigint",
                    "is_valid": "int",
                    "modify_time": "bigint",
                },
            ),
            "payinfo": TableMeta(
                "payinfo",
                pk="id",
                version_col="modify_time",
                columns={
                    "id": "string",
                    "totalpay_id": "string",
                    "kindpay_id": "string",
                    "type": "int",
                    "fee": "double",
                    "modify_time": "bigint",
                },
            ),
            "paydetail": TableMeta(
                "paydetail",
                pk="id",
                version_col="modify_time",
                columns={
                    "id": "string",
                    "payinfo_id": "string",
                    "amount": "double",
                    "modify_time": "bigint",
                },
            ),
            "orderdetail": TableMeta(
                "orderdetail",
                pk="order_id",
                version_col="modify_time",
                columns={
                    "order_id": "string",
                    "totalpay_id": "string",
                    "open_time": "bigint",
                    "is_valid": "int",
                    "modify_time": "bigint",
                },
            ),
            "specialfee": TableMeta(
                "specialfee",
                pk="id",
                version_col="modify_time",
                columns={
                    "id": "string",
                    "totalpay_id": "string",
                    "kind": "int",
                    "fee": "double",
                    "modify_time": "bigint",
                },
            ),
            "card": TableMeta(
                "card",
                pk="id",
                version_col="modify_time",
                monitor=False,
                columns={
                    "id": "string",
                    "customer_id": "string",
                    "entity_id": "string",
                    "code": "string",
                    "modify_time": "bigint",
                },
            ),
            "customer": TableMeta(
                "customer",
                pk="id",
                version_col="modify_time",
                monitor=False,
                columns={
                    "id": "string",
                    "entity_id": "string",
                    "name": "string",
                    "mobile": "string",
                    "modify_time": "bigint",
                },
            ),
        },
        relations=[
            Relation("totalpayinfo", "payinfo", "totalpay_id", "totalpay_id", "1:n"),
            Relation("payinfo", "paydetail", "id", "payinfo_id", "1:n"),
            Relation("totalpayinfo", "orderdetail", "totalpay_id", "totalpay_id", "1:1"),
            Relation("totalpayinfo", "specialfee", "totalpay_id", "totalpay_id", "1:n"),
        ],
    )


# ---------------------------------------------------------------- initial dump


def _h(i: int, stream: int, seed: int) -> int:
    return int(mix64(np.uint64(i & 0xFFFFFFFFFFFFFFFF), stream + seed * 101)[()])


def _n_pay(i: int, seed: int) -> int:
    return 1 + _h(i, 1, seed) % 3


def _n_detail(i: int, k: int, seed: int) -> int:
    return _h(i * 7 + k, 2, seed) % 3


def initial_tables(n_primary: int, seed: int = 42) -> dict[str, pd.DataFrame]:
    """Closed-form initial full dump; every value derives from (seed, i)."""
    tp, pay, pd_rows, od, sf = [], [], [], [], []
    for i in range(n_primary):
        h = _h(i, 3, seed)
        tp.append(
            {
                "totalpay_id": f"tp{i:06d}",
                "entity_id": f"ent{i % 50}",
                "card_id": f"card{h % 200}",
                "recieve_amount": h % 100_000,
                "is_valid": 1,
                "modify_time": MT0 + i,
            }
        )
        for k in range(_n_pay(i, seed)):
            hk = _h(i * 31 + k, 4, seed)
            pay.append(
                {
                    "id": f"pay{i:06d}_{k}",
                    "totalpay_id": f"tp{i:06d}",
                    "kindpay_id": f"kp{hk % 5}",
                    "type": 103 if hk % 11 == 0 else 1 + hk % 4,
                    "fee": (hk % 10_000) / 100.0,
                    "modify_time": MT0 + i,
                }
            )
            for d in range(_n_detail(i, k, seed)):
                hd = _h(i * 131 + k * 17 + d, 5, seed)
                pd_rows.append(
                    {
                        "id": f"pd{i:06d}_{k}_{d}",
                        "payinfo_id": f"pay{i:06d}_{k}",
                        "amount": (hd % 5_000) / 100.0,
                        "modify_time": MT0 + i,
                    }
                )
        od.append(
            {
                "order_id": f"ord{i:06d}",
                "totalpay_id": f"tp{i:06d}",
                "open_time": 1_700_000_000 + i,
                "is_valid": 1,
                "modify_time": MT0 + i,
            }
        )
        if h % 2 == 0:
            sf.append(
                {
                    "id": f"sf{i:06d}",
                    "totalpay_id": f"tp{i:06d}",
                    "kind": h % 3,
                    "fee": (h % 2_000) / 100.0,
                    "modify_time": MT0 + i,
                }
            )
    card = [
        {
            "id": f"card{c}",
            "customer_id": f"cust{c % 100}",
            "entity_id": f"ent{c % 50}",
            "code": f"E_{c}" if c % 7 == 0 else f"N_{c}",
            "modify_time": MT0,
        }
        for c in range(200)
    ]
    cust = [
        {
            "id": f"cust{k}",
            "entity_id": f"ent{k % 50}",
            "name": f"name{k}",
            "mobile": f"13{k:09d}",
            "modify_time": MT0,
        }
        for k in range(100)
    ]
    return {
        "totalpayinfo": pd.DataFrame(tp),
        "payinfo": pd.DataFrame(pay),
        "paydetail": pd.DataFrame(pd_rows),
        "orderdetail": pd.DataFrame(od),
        "specialfee": pd.DataFrame(sf),
        "card": pd.DataFrame(card),
        "customer": pd.DataFrame(cust),
    }


def initial_tables_spark(
    spark: SparkSession, n_primary: int, seed: int = 42
) -> dict[str, DataFrame]:
    spec = totalpay_spec()
    return {
        n: spark.createDataFrame(pdf, schema=spec.tables[n].schema)
        for n, pdf in initial_tables(n_primary, seed).items()
    }


# ---------------------------------------------------------------- change stream


def _gen_star_events(seqs: np.ndarray, n_primary: int, seed: int, epoch_size: int) -> pd.DataFrame:
    rows = []
    for s in seqs:
        s = int(s)
        h = _h(s, 7, seed)
        i = h % n_primary  # target primary
        mt = MT0 + 1_000_000 + s  # versions strictly above every initial row
        dirty = (h >> 8) % 50 == 0  # ~2%: regressed version, dropped by LWW
        if dirty:
            mt = MT0 - 1 - (h % 1000)
        kind = (h >> 16) % 100
        base = {"seq": s, "ddl": None, "before": None, "epoch_hint": s // max(epoch_size, 1)}
        sm = str(mt)
        if kind < 25:  # update primary amounts/validity
            rows.append(
                {
                    **base,
                    "op": "U",
                    "table": "totalpayinfo",
                    "pk": f"tp{i:06d}",
                    "after": {
                        "totalpay_id": f"tp{i:06d}",
                        "entity_id": f"ent{i % 50}",
                        "card_id": f"card{_h(i, 3, seed) % 200}",
                        "recieve_amount": str((h >> 3) % 100_000),
                        "is_valid": "1" if (h >> 5) % 10 else "0",
                        "modify_time": sm,
                    },
                }
            )
        elif kind < 45:  # update an existing payinfo row (fee/type)
            k = (h >> 24) % _n_pay(i, seed)
            rows.append(
                {
                    **base,
                    "op": "U",
                    "table": "payinfo",
                    "pk": f"pay{i:06d}_{k}",
                    "after": {
                        "id": f"pay{i:06d}_{k}",
                        "totalpay_id": f"tp{i:06d}",
                        "kindpay_id": f"kp{(h >> 9) % 5}",
                        "type": "103" if (h >> 13) % 9 == 0 else str(1 + (h >> 13) % 4),
                        "fee": str(((h >> 7) % 10_000) / 100.0),
                        "modify_time": sm,
                    },
                }
            )
        elif kind < 52:  # FK move: re-parent payinfo row to another primary
            j = (h >> 20) % n_primary
            k = (h >> 24) % _n_pay(i, seed)
            rows.append(
                {
                    **base,
                    "op": "U",
                    "table": "payinfo",
                    "pk": f"pay{i:06d}_{k}",
                    "after": {
                        "id": f"pay{i:06d}_{k}",
                        "totalpay_id": f"tp{j:06d}",  # new parent
                        "kindpay_id": f"kp{(h >> 9) % 5}",
                        "type": str(1 + (h >> 13) % 4),
                        "fee": str(((h >> 7) % 10_000) / 100.0),
                        "modify_time": sm,
                    },
                }
            )
        elif kind < 62:  # insert a brand-new payinfo child
            rows.append(
                {
                    **base,
                    "op": "I",
                    "table": "payinfo",
                    "pk": f"paynew{s}",
                    "after": {
                        "id": f"paynew{s}",
                        "totalpay_id": f"tp{i:06d}",
                        "kindpay_id": f"kp{(h >> 9) % 5}",
                        "type": "103" if (h >> 13) % 7 == 0 else str(1 + (h >> 13) % 4),
                        "fee": str(((h >> 7) % 10_000) / 100.0),
                        "modify_time": sm,
                    },
                }
            )
        elif kind < 74:  # update/insert a paydetail (2-hop routing)
            k = (h >> 24) % _n_pay(i, seed)
            nd = _n_detail(i, k, seed)
            if nd and (h >> 30) % 2:
                d = (h >> 28) % nd
                pk = f"pd{i:06d}_{k}_{d}"
                op = "U"
            else:
                pk = f"pdnew{s}"
                op = "I"
            rows.append(
                {
                    **base,
                    "op": op,
                    "table": "paydetail",
                    "pk": pk,
                    "after": {
                        "id": pk,
                        "payinfo_id": f"pay{i:06d}_{k}",
                        "amount": str(((h >> 11) % 5_000) / 100.0),
                        "modify_time": sm,
                    },
                }
            )
        elif kind < 84:  # update orderdetail (1:1)
            rows.append(
                {
                    **base,
                    "op": "U",
                    "table": "orderdetail",
                    "pk": f"ord{i:06d}",
                    "after": {
                        "order_id": f"ord{i:06d}",
                        "totalpay_id": f"tp{i:06d}",
                        "open_time": str(1_700_000_000 + i + (h >> 6) % 1000),
                        "is_valid": "1",
                        "modify_time": sm,
                    },
                }
            )
        elif kind < 94:  # upsert specialfee
            rows.append(
                {
                    **base,
                    "op": "U",
                    "table": "specialfee",
                    "pk": f"sf{i:06d}",
                    "after": {
                        "id": f"sf{i:06d}",
                        "totalpay_id": f"tp{i:06d}",
                        "kind": str(h % 3),
                        "fee": str(((h >> 4) % 2_000) / 100.0),
                        "modify_time": sm,
                    },
                }
            )
        else:  # delete a payinfo child (policy-dependent)
            k = (h >> 24) % _n_pay(i, seed)
            rows.append(
                {
                    **base,
                    "op": "D",
                    "table": "payinfo",
                    "pk": f"pay{i:06d}_{k}",
                    "after": None,
                }
            )
    return pd.DataFrame(rows)[
        ["seq", "op", "table", "pk", "ddl", "before", "after", "epoch_hint"]
    ]


def gen_star_changes(
    spark: SparkSession,
    n_events: int,
    n_primary: int,
    seed: int = 42,
    epoch_size: int = 500,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic change stream over the star schema."""
    num_partitions = num_partitions or max(spark.sparkContext.defaultParallelism, 4)

    def gen(iterator):
        for pdf in iterator:
            seqs = pdf["id"].to_numpy() + 1
            yield _gen_star_events(seqs, n_primary, seed, epoch_size)

    rng = spark.range(0, n_events, numPartitions=num_partitions)
    return rng.mapInPandas(gen, schema=STAR_CHANGE_SCHEMA)
