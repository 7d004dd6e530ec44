"""CdcIngest — the epoch-driven ingest pipeline.

One ``process_epoch`` call = one micro-batch (Structured Streaming's
``foreachBatch`` delegates here; batch replay loops here).  Responsibilities:

* **Seq watermark / reorder buffer** (reference V2 time-window delay,
  BasicPojoConsumer.java:360-369): delivery order is permuted within a
  bounded window, so only events with ``seq <= max_seq_seen - W`` are
  admitted; the remainder is spilled to a per-epoch pending-state parquet
  referenced from the commit summary.  Final/drain flush (reference C7
  ``-Ddrain``) admits everything.  Net effect: events apply in exact global
  seq order, so the engine's final state equals the oracle's sequential
  replay by construction.
* **Exactly-once epoch fencing** (reference pt + success-token protocol,
  C10): an epoch id at or below the last committed one is skipped before
  any write; the merge commit atomically records (epoch_id, pending-state
  pointer, counters).
* **DDL routing** (§1.5 schema registry): DDL events in the admitted set
  bump the table schema first — legal because our evolutions (add column /
  widen) are monotonic, so applying them at batch start cannot change row
  semantics (row events carry their own schema_version).
* **Lineage + metrics** (reference C6 gRPC counters -> parquet tables).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tis_spark.cdc.merge import merge_into
from tis_spark.cdc.registry import apply_ddl
from tis_spark.cdc.semantics import COUNTER_NAMES, CdcConfig
from tis_spark.fixtures.gen import CHANGE_SCHEMA
from tis_spark.lake.table import LakeTable

PAGES_SCHEMA_V1 = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("epoch_id", T.LongType(), False),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("n_keys", T.LongType()),
        T.StructField("min_seq", T.LongType()),
        T.StructField("max_seq", T.LongType()),
        T.StructField("wall_ms", T.LongType()),
    ]
    + [T.StructField(c, T.LongType()) for c in COUNTER_NAMES]
)


class CdcIngest:
    def __init__(
        self,
        spark: SparkSession,
        table_path: str,
        cfg: CdcConfig | None = None,
        create_if_missing: bool = True,
    ):
        self.spark = spark
        self.cfg = cfg or CdcConfig()
        if LakeTable.exists(table_path):
            self.table = LakeTable.load(spark, table_path)
        elif create_if_missing:
            self.table = LakeTable.create(
                spark,
                table_path,
                PAGES_SCHEMA_V1,
                key_cols=[self.cfg.key_col],
                version_col=self.cfg.version_col,
                num_buckets=self.cfg.num_buckets,
            )
        else:
            raise FileNotFoundError(table_path)
        self.state_dir = os.path.join(table_path, "_state")
        self.metrics_dir = os.path.join(table_path, "_metrics")
        os.makedirs(self.state_dir, exist_ok=True)
        os.makedirs(self.metrics_dir, exist_ok=True)

    # ------------------------------------------------------------- state

    def _last_state_path(self) -> str | None:
        for snap in reversed(self.table.history()):
            if "state_path" in snap.summary:
                p = snap.summary["state_path"]
                return p if p else None
        return None

    def _load_pending(self) -> DataFrame:
        p = self._last_state_path()
        if p and os.path.isdir(p):
            return self.spark.read.schema(CHANGE_SCHEMA).parquet(p)
        return self.spark.createDataFrame([], CHANGE_SCHEMA)

    # ------------------------------------------------------------- epochs

    def process_epoch(self, changes: DataFrame, epoch_id: int, final_flush: bool = False) -> dict:
        t0 = time.time()
        last = self.table.last_epoch_id()
        if last is not None and epoch_id <= last:
            return {"epoch_id": epoch_id, "skipped": True}

        cols = [f.name for f in CHANGE_SCHEMA.fields]
        events = changes.select(*cols).unionByName(self._load_pending())

        max_seq = events.agg(F.max("seq")).first()[0]
        if max_seq is None:
            self.table.commit({}, set(), summary=self._summary(epoch_id, "", 0, {}))
            return {"epoch_id": epoch_id, "admitted": 0}

        horizon = max_seq if final_flush else max_seq - self.cfg.disorder_window
        admitted = events.filter(F.col("seq") <= horizon)
        pending_new = events.filter(F.col("seq") > horizon).dropDuplicates(["seq"])

        state_path = os.path.join(self.state_dir, f"ep_{epoch_id}")
        pending_new.write.mode("overwrite").parquet(state_path)

        # DDL events bump the registry before the row merge (monotonic).
        ddls = sorted(
            admitted.filter(F.col("op") == "DDL").select("seq", "ddl").distinct().collect(),
            key=lambda r: r["seq"],
        )
        for r in ddls:
            apply_ddl(self.table, r["ddl"], summary={"epoch_ddl": epoch_id, "at_seq": r["seq"]})

        files, replaced, metrics_rows = merge_into(
            self.spark, self.table, admitted.filter(F.col("op") != "DDL"), self.cfg
        )

        wall_ms = int((time.time() - t0) * 1000)
        totals = {c: int(sum(m.get(c) or 0 for m in metrics_rows)) for c in COUNTER_NAMES}
        if metrics_rows:
            rows = [
                {
                    "epoch_id": epoch_id,
                    "bucket": int(m["bucket"]),
                    "n_keys": int(m["n_keys"]),
                    "min_seq": m["min_seq"],
                    "max_seq": m["max_seq"],
                    "wall_ms": wall_ms,
                    **{c: int(m.get(c) or 0) for c in COUNTER_NAMES},
                }
                for m in metrics_rows
            ]
            self.spark.createDataFrame(rows, METRICS_SCHEMA).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(self.metrics_dir, f"ep_{epoch_id}")
            )

        self.table.commit(
            files,
            replaced_buckets=replaced,
            summary=self._summary(epoch_id, state_path, max_seq, totals),
        )
        return {"epoch_id": epoch_id, "admitted_horizon": horizon, "wall_ms": wall_ms, **totals}

    def _summary(self, epoch_id: int, state_path: str, max_seq: int, totals: dict) -> dict:
        return {
            "epoch_id": epoch_id,
            "state_path": state_path,
            "max_seq_seen": int(max_seq),
            "counters": totals,
        }

    # ------------------------------------------------------------- replay

    def replay(
        self,
        changes: DataFrame,
        epoch_size: int = 2000,
        order_col: str = "delivery_key",
    ) -> list[dict]:
        """Batch replay: slice the stream into delivery-ordered epochs and
        run each through process_epoch; the last epoch drains the buffer."""
        bounds = changes.agg(
            F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
        ).first()
        if bounds["lo"] is None:
            return []
        lo, hi = int(bounds["lo"]), int(bounds["hi"])
        stats = []
        epoch_ids = list(range(lo // epoch_size, hi // epoch_size + 1))
        for i, ep in enumerate(epoch_ids):
            batch = changes.filter(
                (F.col(order_col) >= ep * epoch_size) & (F.col(order_col) < (ep + 1) * epoch_size)
            )
            stats.append(self.process_epoch(batch, ep, final_flush=(i == len(epoch_ids) - 1)))
        return stats

    def final_state(self) -> DataFrame:
        return self.table.read()

    def metrics(self) -> DataFrame:
        return self.spark.read.schema(METRICS_SCHEMA).parquet(
            os.path.join(self.metrics_dir, "ep_*")
        )
