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
  pointer, counters, per-bucket lineage).
* **DDL routing** (§1.5 schema registry): DDL events in the admitted set
  bump the table schema first — legal because our evolutions (add column /
  widen) are monotonic, so applying them at batch start cannot change row
  semantics (row events carry their own schema_version).
* **Lineage + metrics** (reference C6 gRPC counters): per-bucket rows are
  embedded in the commit summary — they ride the atomic snapshot publish,
  so lineage can never disagree with table state and costs zero extra
  Spark jobs.
* **Compaction**: after each commit, buckets whose delta-file count
  crossed ``cfg.compact_threshold`` are folded back into a base
  generation, bounding read fan-in (merge-on-read maintenance).

Per-epoch Spark-job budget (the fixed cost that bounds micro-batch
throughput): ① one combined aggregate over the raw batch (max seq + DDL
set + touched buckets), ② the pending-state write, ③ the fold+metrics
job, ④ the delta write.  Everything else is driver-side metadata IO.
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
        os.makedirs(self.state_dir, exist_ok=True)
        # The fence is read once from durable state, then maintained
        # in-memory (single writer per table; a fresh process re-reads).
        self._last_epoch = self.table.last_epoch_id()
        self._last_state = self._scan_last_state_path()

    # ------------------------------------------------------------- state

    def _scan_last_state_path(self) -> str | None:
        for snap in reversed(self.table.history()):
            if "state_path" in snap.summary:
                p = snap.summary["state_path"]
                return p if p else None
        return None

    def _load_pending(self) -> DataFrame | None:
        p = self._last_state
        if p and os.path.isdir(p):
            return self.spark.read.schema(CHANGE_SCHEMA).parquet(p)
        return None

    # ------------------------------------------------------------- epochs

    def process_epoch(self, changes: DataFrame, epoch_id: int, final_flush: bool = False) -> dict:
        t0 = time.time()
        if self._last_epoch is not None and epoch_id <= self._last_epoch:
            return {"epoch_id": epoch_id, "skipped": True}

        cols = [f.name for f in CHANGE_SCHEMA.fields]
        events = changes.select(*cols)
        pending = self._load_pending()
        if pending is not None:
            events = events.unionByName(pending)

        snap = self.table.current_snapshot()
        url = F.coalesce(F.col("after.url"), F.col("before.url"))
        row_ev = (F.col("op") != "DDL") & F.col("table").isin(*self.cfg.table_focus)
        bucket_of = F.pmod(F.xxhash64(url), F.lit(snap.num_buckets)).cast("int")
        # ① one pass over the batch: watermark high, DDL set, touched buckets
        meta = events.agg(
            F.max("seq").alias("max_seq"),
            F.collect_set(
                F.when(F.col("op") == "DDL", F.struct(F.col("seq"), F.col("ddl")))
            ).alias("ddls"),
            F.collect_set(F.when(row_ev, bucket_of)).alias("touched"),
        ).first()
        max_seq = meta["max_seq"]
        if max_seq is None:
            self._commit(epoch_id, "", 0, [], {}, t0)
            return {"epoch_id": epoch_id, "admitted": 0}

        horizon = max_seq if final_flush else max_seq - self.cfg.disorder_window
        admitted = events.filter(F.col("seq") <= horizon)
        pending_new = events.filter(F.col("seq") > horizon).dropDuplicates(["seq"])

        # ② durable reorder buffer for crash-resume
        state_path = os.path.join(self.state_dir, f"ep_{epoch_id}")
        pending_new.write.mode("overwrite").parquet(state_path)

        # DDL events bump the registry before the row merge (monotonic).
        ddls = sorted((r for r in meta["ddls"] if r["seq"] <= horizon), key=lambda r: r["seq"])
        for r in ddls:
            apply_ddl(self.table, r["ddl"], summary={"epoch_ddl": epoch_id, "at_seq": r["seq"]})

        # ③ fold + ④ delta write (merge_into); ``touched`` is a superset of
        # the admitted rows' buckets (it includes still-pending rows), which
        # only widens the pruned stored-row scan — never wrong.
        files, metrics_rows = merge_into(
            self.spark,
            self.table,
            admitted.filter(F.col("op") != "DDL"),
            epoch_id,
            self.cfg,
            touched=sorted(meta["touched"]),
        )

        totals = {c: int(sum(m.get(c) or 0 for m in metrics_rows)) for c in COUNTER_NAMES}
        committed = self._commit(epoch_id, state_path, max_seq, metrics_rows, totals, t0, files)
        self._maybe_compact(committed, epoch_id)
        wall_ms = int((time.time() - t0) * 1000)
        return {"epoch_id": epoch_id, "admitted_horizon": horizon, "wall_ms": wall_ms, **totals}

    def _commit(self, epoch_id, state_path, max_seq, metrics_rows, totals, t0, files=None):
        wall_ms = int((time.time() - t0) * 1000)
        lineage = [
            {
                "bucket": int(m["bucket"]),
                "n_keys": int(m["n_keys"]),
                "min_seq": None if m["min_seq"] is None else int(m["min_seq"]),
                "max_seq": None if m["max_seq"] is None else int(m["max_seq"]),
                **{c: int(m.get(c) or 0) for c in COUNTER_NAMES},
            }
            for m in metrics_rows
        ]
        committed = self.table.commit(
            files or {},
            summary={
                "epoch_id": epoch_id,
                "state_path": state_path,
                "max_seq_seen": int(max_seq),
                "wall_ms": wall_ms,
                "counters": totals,
                "bucket_metrics": lineage,
            },
        )
        self._last_epoch = epoch_id
        self._last_state = state_path if state_path else None
        return committed

    def _maybe_compact(self, snap, epoch_id: int) -> None:
        due = [
            int(b)
            for b, n in snap.delta_counts().items()
            if n >= self.cfg.compact_threshold
        ]
        if due:
            self.table.compact(sorted(due), summary={"after_epoch": epoch_id})

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
        """Per-(epoch, bucket) lineage rows, reconstructed from the commit
        summaries (they are embedded in the snapshot log)."""
        rows = []
        for snap in self.table.history():
            s = snap.summary
            if "epoch_id" not in s:
                continue
            for m in s.get("bucket_metrics", []):
                rows.append(
                    {
                        "epoch_id": int(s["epoch_id"]),
                        "bucket": int(m["bucket"]),
                        "n_keys": int(m["n_keys"]),
                        "min_seq": m["min_seq"],
                        "max_seq": m["max_seq"],
                        "wall_ms": int(s.get("wall_ms", 0)),
                        **{c: int(m.get(c) or 0) for c in COUNTER_NAMES},
                    }
                )
        if not rows:
            return self.spark.createDataFrame([], METRICS_SCHEMA)
        return self.spark.createDataFrame(rows, METRICS_SCHEMA)
