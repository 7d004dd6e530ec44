"""ER / topology spec — the declarative "catalog" a user authors to define
a multi-table wide-row pipeline (reference §1.3: dataflows persisted as
node YAML + er_rules.yaml, SqlTaskNodeMeta.java:86-96,320-362;
ERRules.java:56-77; TableRelation.java:38-60; PrimaryTableMeta.java:32-60 —
all relative to /root/reference/tis-sql-parser/src/main/java/com/qlangtech/
tis/sql/parser).

The spec captures exactly what the reference's ER rules capture:

* per-table metadata: primary key, LWW version column (``timeVersionCol``),
  and whether changes on the table trigger incremental maintenance
  (``monitor=False`` == the reference's ``ignoreIncrTrigger`` lookup dims,
  AliasList.java:307);
* parent/child relations with join keys and cardinality (1:1 | 1:n);
* the primary (index) table and its shard/router key (``sharedKey``).

``chain_to_primary`` is the FK-chain resolution of
FlatTableRelation.isLinkable/getFinalLinkKey (FlatTableRelation.java:
176-210): the relation path a child event's key must traverse — via joins
against current source-table state — to reach the primary PK it affects.

Serialization is plain JSON (round-trippable dicts), the Spark-side stand-
in for the reference's YAML topology files.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import types as T

_TYPE_MAP = {
    "string": T.StringType(),
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
}

#: Spark DataType.typeName() -> ER column type string (used when a DDL
#: event evolves a source table and the spec must follow the lake schema)
ER_TYPE_NAMES = {
    # byte/short: parse_ddl (cdc/registry.py) accepts tinyint/smallint
    # DDLs — without these entries a stream-delivered ADD COLUMN x SMALLINT
    # would commit the lake evolve, then KeyError before the spec update,
    # wedging the epoch with lake schema and ERSpec out of sync
    "byte": "tinyint",
    "short": "smallint",
    "integer": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
    "binary": "binary",
    "date": "date",
    "timestamp": "timestamp",
}


#: Synthetic ingest-stamp version column materialized for tables that set
#: no event-time version column under ProcessTime — the reference's
#: generated ``("processTime").processTimeVer()`` output column
#: (StreamComponentCodeGenerator.java:202-208).
PROCESS_TIME_COL = "process_time"


@dataclass
class TableMeta:
    name: str
    pk: str
    # LWW column (reference modify_time / timeVersionCol); None is legal
    # only under ERSpec(time_characteristic="ProcessTime") and resolves to
    # the synthetic PROCESS_TIME_COL ingest stamp
    version_col: str | None
    columns: dict[str, str] = field(default_factory=dict)  # name -> type str
    monitor: bool = True  # False == ignoreIncrTrigger (lookup-only dim)
    # set by ERSpec normalization when version_col was None: the engine
    # stamps PROCESS_TIME_COL from the event's delivery sequence instead
    # of reading it from the after-image
    process_time: bool = False

    @property
    def schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(n, _TYPE_MAP[t], n != self.pk) for n, t in self.columns.items()]
        )


@dataclass
class Relation:
    parent: str
    child: str
    parent_key: str  # join column on parent
    child_key: str  # join (FK) column on child
    cardinality: str = "1:n"  # '1:1' | '1:n' (TabCardinality.java:23-25)


@dataclass
class ERSpec:
    primary: str
    shared_key: str  # router/shard key on the primary (PrimaryTableMeta)
    tables: dict[str, TableMeta]
    relations: list[Relation]
    # Global time characteristic (reference TimeCharacteristic.java:22,
    # default EventTime per ERRules.java:62).  EventTime: every table's
    # version_col is an event-time column carried in the change payload.
    # ProcessTime: tables may omit the version column (version_col=None);
    # the engine then versions rows by arrival — the ingest sequence
    # stamp, so the last-DELIVERED change wins LWW regardless of any
    # payload timestamp.
    time_characteristic: str = "EventTime"

    def __post_init__(self):
        assert self.primary in self.tables, self.primary
        assert self.time_characteristic in ("EventTime", "ProcessTime"), (
            self.time_characteristic
        )
        for t in self.tables.values():
            if t.version_col is None:
                # mirror of the reference's codegen guard: a table without
                # a timestampVer column is only legal when the global
                # characteristic is ProcessTime
                # (StreamComponentCodeGenerator.java:202-205)
                if self.time_characteristic != "ProcessTime":
                    raise ValueError(
                        f"table {t.name}: either set a version_col or set "
                        f"time_characteristic='ProcessTime'"
                    )
                t.process_time = True
                t.version_col = PROCESS_TIME_COL
            if t.process_time:
                # idempotent (from_json re-runs this): the stamp is a
                # stored column so later epochs can LWW-compare against it
                t.columns.setdefault(PROCESS_TIME_COL, "bigint")
        for r in self.relations:
            assert r.parent in self.tables and r.child in self.tables, r
            assert r.cardinality in ("1:1", "1:n"), r

    # ------------------------------------------------------------- queries

    def monitored(self) -> list[TableMeta]:
        return [t for t in self.tables.values() if t.monitor]

    def children_of(self, table: str) -> list[Relation]:
        return [r for r in self.relations if r.parent == table]

    def parent_relations(self, table: str) -> list[Relation]:
        """All relations in which ``table`` is the child.  The reference's
        ER model allows a child row to link multiple parents (a
        CompositePK routes on any of them, CompositePK.java:25-48); a
        change to such a row must re-derive EVERY linked wide row."""
        return [r for r in self.relations if r.child == table]

    def parent_relation(self, table: str) -> Relation | None:
        """First-declared parent relation — the physical-layout choice for
        multi-parent children (a row can only be clustered by one FK)."""
        rels = self.parent_relations(table)
        return rels[0] if rels else None

    def chains_to_primary(self, table: str) -> list[list[Relation]]:
        """Every relation path child -> ... -> primary (the multi-parent
        generalization of FlatTableRelation.getFinalLinkKey,
        FlatTableRelation.java:176-210 + PrimaryTableMeta.createCompositePK
        PrimaryTableMeta.java:96-135).  [] for the primary itself; each
        path is simple (cycle-checked)."""
        if table == self.primary:
            return []

        def walk(cur: str, seen: frozenset) -> list[list[Relation]]:
            assert cur not in seen, f"relation cycle at {cur}"
            out = []
            for rel in self.parent_relations(cur):
                if rel.parent == self.primary:
                    out.append([rel])
                else:
                    out.extend(
                        [rel, *tail] for tail in walk(rel.parent, seen | {cur})
                    )
            return out

        chains = walk(table, frozenset())
        assert chains, f"{table}: no path to primary {self.primary}"
        return chains

    def chain_to_primary(self, table: str) -> list[Relation]:
        """Single relation path child -> ... -> primary (empty for the
        primary itself) — valid only for tree topologies; multi-parent
        children must use chains_to_primary."""
        chains = self.chains_to_primary(table)
        if not chains:
            return []
        assert len(chains) == 1, f"{table}: multiple paths, use chains_to_primary"
        return chains[0]

    # ------------------------------------------------------------- serde

    def to_json(self) -> str:
        return json.dumps(
            {
                "primary": self.primary,
                "shared_key": self.shared_key,
                "time_characteristic": self.time_characteristic,
                "tables": {
                    n: {
                        "pk": t.pk,
                        "version_col": t.version_col,
                        "columns": t.columns,
                        "monitor": t.monitor,
                        "process_time": t.process_time,
                    }
                    for n, t in self.tables.items()
                },
                "relations": [
                    {
                        "parent": r.parent,
                        "child": r.child,
                        "parent_key": r.parent_key,
                        "child_key": r.child_key,
                        "cardinality": r.cardinality,
                    }
                    for r in self.relations
                ],
            },
            indent=2,
        )

    @staticmethod
    def from_json(s: str) -> "ERSpec":
        d = json.loads(s)
        return ERSpec(
            primary=d["primary"],
            shared_key=d["shared_key"],
            tables={
                n: TableMeta(name=n, **{k: v for k, v in t.items()})
                for n, t in d["tables"].items()
            },
            relations=[Relation(**r) for r in d["relations"]],
            time_characteristic=d.get("time_characteristic", "EventTime"),
        )
