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

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tis_spark.cdc.merge import merge_into
from tis_spark.cdc.registry import apply_ddl
from tis_spark.cdc.semantics import COUNTER_NAMES, CdcConfig
from tis_spark.fixtures.gen import CHANGE_SCHEMA
from tis_spark.functions.text import extract_text_udf
from tis_spark.lake.table import COMMIT_COL, DEAD_COL, CommitConflict, LakeTable, Snapshot

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
        self._last_horizon = self._scan_last_horizon()
        self._epoch_retries = 0
        # Writer's snapshot view (C8 exec-lock, optimistic form): every
        # publish this writer performs passes expected_snapshot_id so a
        # concurrent foreign writer makes the commit raise CommitConflict
        # atomically (create-if-absent snapshot ids) instead of silently
        # double-applying an epoch on top of the competitor's state.
        self._view = self.table.current_snapshot().snapshot_id

    # ------------------------------------------------------------- state

    def _scan_last_state_path(self) -> str | None:
        for snap in reversed(self.table.history()):
            if "state_path" in snap.summary:
                p = snap.summary["state_path"]
                return p if p else None
        return None

    def _scan_last_horizon(self) -> int:
        for snap in reversed(self.table.history()):
            if "horizon" in snap.summary:
                return int(snap.summary["horizon"])
        return 0

    def _load_pending(self) -> DataFrame | None:
        p = self._last_state
        if p and os.path.isdir(p):
            return self.spark.read.schema(CHANGE_SCHEMA).parquet(p)
        return None

    # ------------------------------------------------------------- epochs

    def process_epoch(self, changes: DataFrame, epoch_id: int, final_flush: bool = False) -> dict:
        t0 = time.time()
        self._epoch_retries = 0
        if self._last_epoch is not None and epoch_id <= self._last_epoch:
            return {"epoch_id": epoch_id, "skipped": True}

        cols = [f.name for f in CHANGE_SCHEMA.fields]
        events = changes.select(*cols)
        pending = self._load_pending()
        if pending is not None:
            events = events.unionByName(pending)
        # The epoch runs 3-4 actions over the batch (meta aggregate,
        # reorder-buffer write, fold, winner-payload join); without a cache
        # each one re-scans (and re-decodes) the source micro-batch —
        # measured ~4.2x numInputRows per epoch, and with a non-replayable
        # MQ source re-reading isn't even guaranteed cheap.  Persist keeps
        # lineage (safe under block loss, unlike localCheckpoint) and
        # spills batch-sized data at worst.
        events = events.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return self._run_epoch(events, epoch_id, final_flush, t0)
        finally:
            # every exit path (incl. CommitConflict / sink failure) releases
            # the cached batch — a supervisor retrying epochs must not
            # accumulate one batch-sized cached RDD per failure
            events.unpersist(blocking=False)

    def _run_epoch(self, events: DataFrame, epoch_id: int, final_flush: bool, t0: float) -> dict:
        snap = self.table.current_snapshot()
        if snap.snapshot_id != self._view:
            raise CommitConflict(
                f"table advanced to snapshot {snap.snapshot_id} behind this "
                f"writer (view {self._view}): concurrent writer detected"
            )
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
            F.approx_count_distinct(F.when(row_ev, url)).alias("n_keys_est"),
        ).first()
        max_seq = meta["max_seq"]
        if max_seq is None:
            self._commit(epoch_id, "", 0, [], {}, t0, horizon=self._last_horizon)
            return {"epoch_id": epoch_id, "admitted": 0}

        horizon = max_seq if final_flush else max_seq - self.cfg.disorder_window
        if self.cfg.max_events_per_epoch and not final_flush:
            # C1 rate limit: seq is dense, so capping the horizon advance
            # caps admitted events; the excess waits in the reorder buffer.
            horizon = min(horizon, self._last_horizon + self.cfg.max_events_per_epoch)
        admitted = events.filter(F.col("seq") <= horizon)
        pending_new = events.filter(F.col("seq") > horizon).dropDuplicates(["seq"])

        # ② durable reorder buffer for crash-resume
        state_path = os.path.join(self.state_dir, f"ep_{epoch_id}")
        pending_new.write.mode("overwrite").parquet(state_path)

        # DDL events bump the registry before the row merge (monotonic).
        ddls = sorted((r for r in meta["ddls"] if r["seq"] <= horizon), key=lambda r: r["seq"])
        for r in ddls:
            evolved = self._publish_with_retry(
                lambda r=r: apply_ddl(
                    self.table,
                    r["ddl"],
                    summary={"epoch_ddl": epoch_id, "at_seq": r["seq"]},
                    expected_snapshot_id=self._view,
                )
            )
            if evolved is not None:
                self._view = evolved.snapshot_id

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
            # ~10% over the HLL estimate so borderline batches still prune
            n_keys_est=int(meta["n_keys_est"] * 1.1) if meta["n_keys_est"] else 0,
        )

        totals = {c: int(sum(m.get(c) or 0 for m in metrics_rows)) for c in COUNTER_NAMES}
        committed = self._commit(
            epoch_id, state_path, max_seq, metrics_rows, totals, t0, files, horizon=horizon
        )
        self._maybe_compact(committed, epoch_id)
        self._maybe_expire(epoch_id)
        wall_ms = int((time.time() - t0) * 1000)
        return {"epoch_id": epoch_id, "admitted_horizon": horizon, "wall_ms": wall_ms, **totals}

    def _commit(self, epoch_id, state_path, max_seq, metrics_rows, totals, t0, files=None, horizon=0):
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
        summary = {
            "epoch_id": epoch_id,
            "state_path": state_path,
            "max_seq_seen": int(max_seq),
            "horizon": int(horizon),
            "wall_ms": wall_ms,
            "counters": totals,
            "bucket_metrics": lineage,
        }
        committed = self._publish_with_retry(
            lambda: self.table.commit(
                files or {}, summary=summary, expected_snapshot_id=self._view
            ),
            summary,
        )
        self._view = committed.snapshot_id
        self._last_epoch = epoch_id
        self._last_state = state_path if state_path else None
        self._last_horizon = int(horizon)
        return committed

    def _publish_with_retry(self, do_commit, summary: dict | None = None) -> Snapshot:
        """Sink retry with backoff (reference C5: 3 retries x 5 s,
        BasicPojoConsumer.java:190-194).  Transient store errors (OSError
        during snapshot write) retry; CommitConflict means another writer
        won the snapshot id — never retried blindly, the caller's
        exactly-once fence must re-evaluate.  The epoch's accumulated retry
        count (incl. retries of DDL-evolution publishes) rides the commit
        summary, so error accounting is atomic with table state."""
        attempts = 0
        while True:
            try:
                if summary is not None:
                    summary["n_commit_retries"] = self._epoch_retries
                return do_commit()
            except CommitConflict:
                raise
            except OSError:
                if attempts >= self.cfg.commit_retries:
                    raise
                attempts += 1
                self._epoch_retries += 1
                time.sleep(self.cfg.commit_retry_backoff_s)

    def _maybe_compact(self, snap, epoch_id: int) -> None:
        due = [
            int(b)
            for b, n in snap.delta_counts().items()
            if n >= self.cfg.compact_threshold
        ]
        if due:
            compacted = self.table.compact(
                sorted(due),
                summary={"after_epoch": epoch_id},
                max_records_per_file=self.cfg.compact_max_records_per_file,
                expected_snapshot_id=self._view,
            )
            if compacted is not None:
                self._view = compacted.snapshot_id

    def _maybe_expire(self, epoch_id: int) -> None:
        """Periodic lake GC (driver-side metadata + file unlinks only): a
        continuous stream otherwise strands a superseded base generation
        per compaction and one _state dir per epoch — at 10^10 events
        dead bytes dominate live rows without this.  Single-writer safe
        (runs on the same driver as the commits it prunes)."""
        every = self.cfg.expire_every_n_epochs
        if every and epoch_id % every == 0:
            self.table.expire_snapshots(keep_last=self.cfg.expire_keep_last)

    # ------------------------------------------------------------- full build

    def full_build(self, pages: DataFrame, dedup: str | None = None) -> Snapshot:
        """Batch full build + atomic swap-in (reference 4-phase full-build,
        SURVEY §3.1: FullDump -> JOIN -> BUILD -> swap,
        FullbuildPhase.java:27-29 / WorkflowDumpAndJoinInterceptor.java:48-96
        — collapsed to one Spark job + one commit).

        ``pages`` must carry (url, warc_ts, html, lang) with unique urls
        (the dump/join output); ``text`` is derived here if absent (BUILD
        phase).  Every bucket's base generation is rewritten and swapped in
        a single atomic commit — readers see the old table until the
        publish, then the new one (the reference's index swap).  Subsequent
        incremental epochs apply on top (bootstrap-then-tail).

        ``dedup="exact"`` wires content deduplication into the build (the
        dedup-before-merge stage of a crawl ingest): documents with the
        same normalized-text fingerprint collapse to one representative
        (lowest url for determinism).  Hash-partitioned groupBy on the
        fingerprint — embarrassingly parallel, the same plan as the
        ``dedup_exact``/``text_fingerprint`` operators; near-dup variants
        (MinHash/SimHash, operators/mlops.py) slot in as an extra stage
        the same way."""
        snap = self.table.current_snapshot()
        df = pages
        if "text" not in df.columns:
            df = df.withColumn("text", extract_text_udf(F.col("html")))
        if dedup == "exact":
            fp = F.xxhash64(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
            w = Window.partitionBy(fp).orderBy(F.col("url"))
            df = df.withColumn("_fp_rn", F.row_number().over(w)).filter(
                F.col("_fp_rn") == 1
            ).drop("_fp_rn")
        elif dedup is not None:
            raise ValueError(f"unknown dedup mode: {dedup}")
        cols = []
        for fld in snap.schema.fields:
            src = F.col(fld.name) if fld.name in df.columns else F.lit(None)
            cols.append(src.cast(fld.dataType).alias(fld.name))
        bucket = self.table.bucket_expr()
        key = snap.key_cols[0]
        bucketed = (
            df.select(*cols)
            # -1: the initial build predates every epoch (ids start at 0) —
            # the read path's alive-over-dead tie-break at equal _commit is
            # reserved for same-epoch relocation pairs and must never fire
            # against an epoch-0 tombstone (lake/table.py read())
            .withColumn(COMMIT_COL, F.lit(-1).cast("long"))
            .withColumn(DEAD_COL, F.lit(False))
            .withColumn("_bucket", bucket)
            .repartition(snap.num_buckets, F.col("_bucket"))
            .sortWithinPartitions("_bucket", key)
        )
        files = self.table.write_data_files(
            bucketed,
            kind="base",
            max_records_per_file=self.cfg.compact_max_records_per_file,
        )
        built = self.table.commit(
            files,
            replaced_buckets={str(b) for b in range(snap.num_buckets)},
            summary={"full_build": True, "n_files": sum(len(v) for v in files.values())},
            expected_snapshot_id=self._view,
        )
        self._view = built.snapshot_id
        return built

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

    def purge(self, predicate, summary: dict | None = None) -> dict:
        """Retention purge through THIS writer (quiesce -> purge ->
        resume without re-creating the ingest): runs
        :meth:`LakeTable.delete_where` fenced on the writer's own view,
        so it composes with the C8 exec-lock instead of tripping it — a
        genuinely concurrent writer still raises ``CommitConflict`` —
        then advances the view past the purge commit so the next epoch
        folds normally.  The purge consumes no stream epoch id (the
        exactly-once fence is untouched; see ``delete_where``)."""
        out = self.table.delete_where(
            predicate, summary=summary, expected_snapshot_id=self._view
        )
        if out["deleted_rows"]:
            self._view = self.table.current_snapshot().snapshot_id
        return out

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
