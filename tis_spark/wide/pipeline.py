"""WideRowPipeline — multi-table incremental wide-row maintenance.

This is the Spark-native re-expression of the reference's core product:
keep a denormalized wide table continuously consistent with a star of
OLTP source tables under a binlog change stream (reference generated
listeners, e.g. tis-dag/src/test/resources/.../S4totalpayListener.scala;
semantics verified against the golden test
tis-realtime-base/src/test/java/.../TestS4totalpayIncr.java:80-143).

Where the reference processes one event at a time (per-PK lookup RPCs +
in-JVM re-aggregation), everything here is set-oriented per micro-batch:

1. **Source maintenance** (reference row packs + isRecordDirty,
   SingleDimensionsRowPack.java:43-58): per monitored table, coalesce the
   batch to the max-(version, seq) event per PK (V1), drop events not
   newer than the stored version (V3 LWW: old >= new is dirty), and
   append the winners as merge-on-read deltas to the table's own
   LakeTable.  Idempotent under redelivery: a re-applied event compares
   equal to the stored version and drops as dirty, so crash-replay of an
   epoch whose source commits landed but whose wide commit didn't cannot
   double-apply.
2. **FK-chain routing** (J6, FlatTableRelation.isLinkable/getFinalLinkKey
   FlatTableRelation.java:176-210 + CompositePK creation): each child
   event maps to the primary PKs it affects — the after-image FK, plus
   the *stored* FK of the touched row (so re-parented or deleted children
   re-derive BOTH old and new parent; the reference does this via the
   stored-doc lookup J4).  Chains deeper than one hop climb via joins
   against post-merge source state.  All of it is joins — no per-row
   lookups.
3. **Restricted recomputation** (A2/A5 re-aggregation,
   S4totalpayListener.scala:436-481): the user's wide query (the JOIN
   node SQL of the topology) runs over sources semi-join-restricted to
   the affected PKs — per-epoch cost is O(affected keys x their
   children), never O(table).  Affected PKs whose primary row disappeared
   become tombstones.
4. **Versioned swap-in**: recomputed rows append as deltas to the wide
   LakeTable in one atomic epoch-fenced commit (exactly-once, C10);
   per-table event counts ride the commit summary (C6
   ``tableUpdateCount`` parity).

Scale notes: every stored-side read is restricted by a semi-join on the
batch's keys before any aggregation, and (past PRUNE_MIN_FILES base
files) restricted reads also skip data files: the primary prunes by its
PK zone maps; child tables are physically clustered by their routing FK
(``fk_layout``, LakeTable ``layout_col``) so the phase-3 FK restriction
bucket- and zone-prunes to the affected parents' key ranges, while their
PK point lookups (phase-1 LWW merge, chain climbs) prune via per-file PK
blooms.  A re-parented child changes buckets; the merge writes an
old-bucket tombstone so bucket-restricted reads and independent
per-bucket compactions stay exact.  Dim tables (monitor=False) join
unrestricted — they are broadcast-sized by construction; at larger dim
cardinality they would be semi-join-restricted through their referencing
keys the same way.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tis_spark.lake.table import (
    BLOOM_SEEDS,
    COMMIT_COL,
    DEAD_COL,
    LakeTable,
    bloom_position_cols,
    prune_entries_by_bloom,
    prune_entries_by_keys,
)
from tis_spark.wide.er import ER_TYPE_NAMES, PROCESS_TIME_COL, ERSpec


class WideRowPipeline:
    #: below this many base files a key-pruned read cannot beat the scan
    PRUNE_MIN_FILES = 64

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        spec: ERSpec,
        wide_fn,
        delete_policy: str = "ignore",  # V8: reference ignores deletes
        num_buckets: int = 8,
        compact_threshold: int = 8,
        checkpoint_intermediates: bool | str = True,  # True/'local'|'reliable'|False
        lookup_keys_max: int = 100_000,
        base_file_rows: int = 0,  # split sorted bases into zone-prunable files
        fk_layout: bool = True,  # cluster child tables by their routing FK
        persist_epoch_batch: bool = True,  # see process_epoch; BENCH.md §-2
    ):
        self.spark = spark
        self.root = root
        self.spec = spec
        if isinstance(wide_fn, str):
            # SQL-authored JOINER node (NodeType.JOINER_SQL,
            # SqlTaskNodeMeta.java:247-276): the user hands us the node SQL.
            from tis_spark.wide.sqlnode import SqlWideNode

            wide_fn = SqlWideNode(wide_fn)
        self.wide_fn = wide_fn
        self.delete_policy = delete_policy
        self.num_buckets = num_buckets
        self.compact_threshold = compact_threshold
        if checkpoint_intermediates not in (True, False, "local", "reliable"):
            # a typo ('Reliable', 'dfs') must not silently degrade to
            # localCheckpoint and lose the durability the caller asked for
            raise ValueError(
                f"checkpoint_intermediates must be True/False/'local'/'reliable', "
                f"got {checkpoint_intermediates!r}"
            )
        self.checkpoint_intermediates = checkpoint_intermediates
        self.lookup_keys_max = lookup_keys_max
        self.base_file_rows = base_file_rows
        self.fk_layout = fk_layout
        self.persist_epoch_batch = persist_epoch_batch
        #: per-table observability of the last pruned read:
        #: {table path: {"files_hit": int, "files_total": int}}
        self.prune_stats: dict[str, dict[str, int]] = {}
        self.sources: dict[str, LakeTable] = {}
        self.wide: LakeTable | None = None
        #: per-table snapshot view of THIS writer (optimistic exec-lock,
        #: C8): every commit passes its table's view as
        #: expected_snapshot_id so a concurrent foreign writer raises
        #: CommitConflict instead of double-applying (see cdc/pipeline.py).
        self._views: dict[str, int] = {}
        if LakeTable.exists(os.path.join(root, "wide")):
            self.wide = LakeTable.load(spark, os.path.join(root, "wide"))
            self._views["wide"] = self.wide.current_snapshot().snapshot_id
            for name in spec.tables:
                self.sources[name] = LakeTable.load(spark, self._src_path(name))
                self._views[name] = self.sources[name].current_snapshot().snapshot_id

    def _src_path(self, name: str) -> str:
        return os.path.join(self.root, "sources", name)

    def _layout_for(self, name: str) -> str | None:
        """Physical clustering column for a source table: non-primary
        tables with a parent relation cluster by their routing FK (the
        column phase-3 restricted recomputation filters on), so
        FK-restricted reads bucket- and zone-prune instead of scanning the
        table.  Their PK point lookups (phase-1 LWW merge, chain climbs)
        prune via per-file PK blooms (lake/table.py).  The primary table
        and lookup dims keep the PK layout."""
        if not self.fk_layout or name == self.spec.primary:
            return None
        rel = self.spec.parent_relation(name)
        return rel.child_key if rel is not None and rel.child_key != self.spec.tables[name].pk else None

    def _pin(self, df: DataFrame) -> DataFrame:
        """Truncate lineage on a per-epoch intermediate.  The epoch
        dataflow references each intermediate several times (stored rows
        feed upserts AND routing; restricted sources feed every join arm
        of the wide query; the recomputed wide rows feed upserts AND the
        tombstone anti-join).  Without pinning, every broadcast-exchange
        build re-executes its whole upstream subtree — measured 688 Spark
        jobs / 1,273 s task-time for one 5k-event epoch; with pinning the
        same epoch is ~30 jobs.  Every pinned frame is O(batch)-sized
        (events, their affected keys, the restricted source slices),
        never O(table), so executor/DFS storage is bounded.

        Modes (``checkpoint_intermediates``):
        * ``True`` / ``"local"`` — ``localCheckpoint`` (default): fastest,
          but blocks are unreplicated executor storage, so an executor
          loss kills the epoch (the driver retries it — exactly-once
          fencing makes the retry safe).  Right for local mode and
          fail-fast clusters.
        * ``"reliable"`` — DFS ``checkpoint()`` under ``{root}/_pins``:
          survives executor loss; **the documented default for
          long-running cluster deployments** (the pipeline root lives on
          the same DFS as the lake tables, so no extra infrastructure).
        * ``False`` — no pinning (debugging only).
        """
        mode = self.checkpoint_intermediates
        if mode == "reliable":
            sc = self.spark.sparkContext
            if sc.getCheckpointDir() is None:
                sc.setCheckpointDir(os.path.join(self.root, "_pins"))
            return df.checkpoint(eager=True)
        if mode:
            return df.localCheckpoint(eager=True)
        return df

    def _pruned_read(self, lake: LakeTable, keys: DataFrame, key_col: str) -> DataFrame:
        """Stored-side read restricted to ``keys`` (a DataFrame exposing
        ``key_col`` values that are the LAKE's primary key): when the key
        set is trigger-sized it is collected and pushed as bucket +
        zone-map file pruning, making the scan O(batch keys), not
        O(table) — the same S9 lookup shape as cdc/merge.py.  Above the
        threshold (bulk backfills) the full-bucket scan amortizes over
        the huge batch instead.  Returns a superset projection; callers
        must semi-join to exact keys.  Two pruning shapes: reads keyed on
        the lake's LAYOUT column (the PK, or the routing FK under
        fk_layout) take bucket + zone-map pruning; PK lookups on an
        FK-clustered table take per-file PK-bloom pruning (no bucket
        selection — the bucket is a function of the FK).

        Guarded by table size: below ``PRUNE_MIN_FILES`` base files the
        bounded key collect costs more than the whole scan — metadata
        (free, driver-side) decides, so small tables take the plain
        read and the pruning engages exactly when tables outgrow it."""
        snap = lake.current_snapshot()
        layout = lake.layout_key(snap)
        n_base = sum(
            1
            for entries in snap.files.values()
            for e in entries
            if e.get("kind", "base") == "base"
        )
        if not (self.lookup_keys_max and n_base >= self.PRUNE_MIN_FILES):
            return lake.read()
        if key_col == layout:
            head = (
                keys.select(
                    lake.bucket_expr(key_col).alias("_b"), F.col(key_col).alias("_k")
                )
                .distinct()
                .limit(self.lookup_keys_max + 1)
                .collect()
            )
            if len(head) <= self.lookup_keys_max:
                key_set: dict[str, list] = {}
                for r in head:
                    key_set.setdefault(str(r["_b"]), []).append(r["_k"])
                buckets = sorted(int(b) for b in key_set)
                total = hit = 0
                for b, entries in snap.files.items():
                    base = [e for e in entries if e.get("kind", "base") == "base"]
                    total += len(base)
                    hit += len(prune_entries_by_keys(base, key_set.get(b, [])))
                self.prune_stats[lake.path] = {"files_hit": hit, "files_total": total}
                return lake.read(buckets=buckets, key_set=key_set)
        elif key_col == snap.key_cols[0]:
            # PK lookup on an FK-clustered table: the bucket is a function
            # of the FK, not the PK — no bucket pruning; per-file PK blooms
            # skip base files instead.  Keys and their bloom bit positions
            # come back in ONE job so the lookup hashes exactly as the
            # write side did.
            nk = len(BLOOM_SEEDS)
            head = (
                keys.select(F.col(key_col), *bloom_position_cols(key_col))
                .distinct()
                .limit(self.lookup_keys_max + 1)
                .collect()
            )
            if len(head) <= self.lookup_keys_max:
                positions = [[r[f"_bp{j}"] for j in range(nk)] for r in head]
                base = [
                    e
                    for entries in snap.files.values()
                    for e in entries
                    if e.get("kind", "base") == "base"
                ]
                self.prune_stats[lake.path] = {
                    "files_hit": len(prune_entries_by_bloom(base, positions)),
                    "files_total": len(base),
                }
                return lake.read(
                    pk_set=[r[key_col] for r in head], pk_positions=positions
                )
        return lake.read()

    # ------------------------------------------------------------- full build

    def _write_full(self, lake: LakeTable, df: DataFrame):
        snap = lake.current_snapshot()
        key = lake.layout_key(snap)
        cols = [
            F.col(f.name).cast(f.dataType).alias(f.name) for f in snap.schema.fields
        ]
        bucketed = (
            df.select(*cols)
            # -1: predates every epoch — see cdc/pipeline.py full-build note
            .withColumn(COMMIT_COL, F.lit(-1).cast("long"))
            .withColumn(DEAD_COL, F.lit(False))
            .withColumn("_bucket", lake.bucket_expr())
            .repartition(snap.num_buckets, F.col("_bucket"))
            .sortWithinPartitions("_bucket", key)
        )
        files = lake.write_data_files(
            bucketed, kind="base", max_records_per_file=self.base_file_rows
        )
        return lake.commit(
            files,
            replaced_buckets={str(b) for b in range(snap.num_buckets)},
            summary={"full_build": True},
            expected_snapshot_id=snap.snapshot_id,
        )

    def full_build(self, source_dfs: dict[str, DataFrame]) -> None:
        """Dump + JOIN + swap (reference 4-phase full build, SURVEY §3.1):
        materialize every source table and the wide table from scratch.
        Source tables are independent lakes, so their dump+write phase
        runs thread-parallel (the reference dumps tables concurrently
        too — S2's parallel dump executor); the JOIN phase follows once
        all dumps committed."""

        def _build_one(item):
            name, meta = item
            src = source_dfs[name]
            if meta.process_time and PROCESS_TIME_COL not in src.columns:
                # full-build rows carry the build stamp 0: every
                # incremental arrival (seq >= 1) supersedes them
                src = src.withColumn(PROCESS_TIME_COL, F.lit(0).cast("long"))
            lake = LakeTable.create(
                self.spark,
                self._src_path(name),
                meta.schema,
                key_cols=[meta.pk],
                version_col=meta.version_col,
                num_buckets=self.num_buckets,
                layout_col=self._layout_for(name),
            )
            built = self._write_full(lake, src)
            return name, lake, built.snapshot_id

        with ThreadPoolExecutor(max_workers=len(self.spec.tables)) as ex:
            for name, lake, view in ex.map(_build_one, self.spec.tables.items()):
                self.sources[name] = lake
                self._views[name] = view
        wide_df = self.wide_fn({n: t.read() for n, t in self.sources.items()})
        pk = self.spec.tables[self.spec.primary].pk
        assert pk in wide_df.columns, f"wide_fn output must carry {pk}"
        # Router-key layout (reference K4 shard routing on upsert: the
        # shareId column routes each document to its serving shard,
        # BasicPojoConsumer.getShareId:439-451; CompositePK =
        # PK + router values, CompositePK.java:25-48): when the ER spec's
        # shared_key survives into the wide output, the wide table buckets
        # by it — co-locating an entity's wide rows the way the reference
        # co-locates them on one Solr shard.  PK point reads then prune
        # via per-file PK blooms, like FK-clustered children.
        router = (
            self.spec.shared_key
            if self.fk_layout
            and self.spec.shared_key in wide_df.columns
            and self.spec.shared_key != pk
            else None
        )
        self.wide = LakeTable.create(
            self.spark,
            os.path.join(self.root, "wide"),
            wide_df.schema,
            key_cols=[pk],
            version_col="version" if "version" in wide_df.columns else pk,
            num_buckets=self.num_buckets,
            layout_col=router,
        )
        self._views["wide"] = self._write_full(self.wide, wide_df).snapshot_id

    # ------------------------------------------------------------- helpers

    def _typed_after(self, ev: DataFrame, name: str) -> DataFrame:
        """Stringly-typed after-image map -> typed columns per the ER spec
        (the reference's lazy Map<String,String> typed access,
        DefaultTable.getInt/getLong/... DefaultTable.java:140-193)."""
        meta = self.spec.tables[name]
        cols = [
            # ProcessTime (§ER timeCharacteristic): the version is the
            # ingest sequence — the arrival stamp, strictly monotone in
            # delivery — not a payload field (the reference's generated
            # processTimeVer column, StreamComponentCodeGenerator.java:
            # 202-208).  Stamped from seq, not wall clock, so replays are
            # deterministic; it also covers DELETEs, whose after-image is
            # null.
            F.col("seq").cast(t.dataType).alias(c)
            if meta.process_time and c == PROCESS_TIME_COL
            else F.col("after")[c].cast(t.dataType).alias(c)
            for c, t in zip(meta.columns, meta.schema.fields)
        ]
        return ev.select("seq", "op", F.col("pk"), *cols)

    def _apply_source_ddls(self, ddls: list[tuple], epoch_id: int) -> None:
        """Apply the batch's (already collected) DDL events to their
        source tables in seq order and keep spec metadata in lockstep with
        the lake schemas.  Idempotent (apply_ddl no-ops on an already-
        applied change), so crash-replay of an epoch whose evolve commit
        landed but whose wide commit didn't is safe."""
        from tis_spark.cdc.registry import apply_ddl, parse_ddl

        for name, seq, ddl in sorted(ddls, key=lambda x: x[1]):
            assert name in self.sources, f"DDL for unknown source table {name}"
            evolved = apply_ddl(
                self.sources[name],
                ddl,
                summary={"epoch_ddl": epoch_id, "at_seq": seq},
                expected_snapshot_id=self._views[name],
            )
            if evolved is not None:
                self._views[name] = evolved.snapshot_id
            _, col, dtype = parse_ddl(ddl)
            self.spec.tables[name].columns[col] = ER_TYPE_NAMES[dtype.typeName()]

    # ------------------------------------------------------------- epoch

    def process_epoch(self, events: DataFrame, epoch_id: int) -> dict:
        assert self.wide is not None, "full_build first"
        last = self.wide.last_epoch_id()
        if last is not None and epoch_id <= last:
            return {"epoch_id": epoch_id, "skipped": True}
        from pyspark import StorageLevel

        from tis_spark.lake.table import CommitConflict

        cur = self.wide.current_snapshot().snapshot_id
        if cur != self._views["wide"]:
            raise CommitConflict(
                f"wide table advanced to snapshot {cur} behind this writer "
                f"(view {self._views['wide']}): concurrent writer detected"
            )

        # The epoch reads the batch once for the lineage/DDL aggregate and
        # then once per monitored table in _merge_source — (T+1) source
        # scans per epoch without a cache (T x IO on remote storage, and a
        # non-replayable MQ source doesn't even guarantee a re-read).
        # Persist keeps lineage (safe under block loss, unlike
        # localCheckpoint) and spills batch-sized data at worst — the
        # mirror of cdc/pipeline.py's micro-batch persist.  A caller whose
        # batch is ALREADY cached upstream can turn it off
        # (persist_epoch_batch=False): there the persist is a second copy
        # of an in-memory batch, measured ~11% of epoch wall (BENCH.md §-2).
        if not self.persist_epoch_batch:
            return self._run_epoch(events, epoch_id)
        events = events.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return self._run_epoch(events, epoch_id)
        finally:
            # every exit path (incl. CommitConflict) releases the cached
            # batch — a supervisor retrying epochs must not accumulate one
            # batch-sized cached RDD per failure
            events.unpersist(blocking=False)

    def _run_epoch(self, events: DataFrame, epoch_id: int) -> dict:
        # DDL routing (§1.5, mirror of cdc/pipeline.py's registry path):
        # schema changes on SOURCE tables apply at batch start — legal
        # because the supported evolutions (add column / widen) are
        # monotonic, so pre-DDL row events in the same batch decode with
        # the new schema to the same values (absent map keys -> NULL, old
        # narrow values cast losslessly up the reference's widening
        # lattice, ColumnMetaData.java:207-239).  The reference versions
        # these as numbered console-DB schema snapshots
        # (SchemaAction.java:330,967-1029); here each is an evolve commit
        # on the table's own lake, fenced by this writer's view (C8).
        # DDL detection shares the lineage aggregate below — ONE action
        # over the batch, not two (per-epoch fixed cost bounds micro-batch
        # throughput, the 688-jobs lesson in _pin).
        has_ddl = "ddl" in events.columns
        ddl_struct = (
            F.when(F.col("op") == "DDL", F.struct("seq", "ddl"))
            if has_ddl
            else F.lit(None).cast("struct<seq:long,ddl:string>")
        )
        meta_rows = (
            events.groupBy("table")
            .agg(
                F.count(F.when(F.col("op") != "DDL", F.lit(1))).alias("count"),
                F.collect_list(ddl_struct).alias("ddls"),
            )
            .collect()
        )
        # per-table lineage counters (C6 parity), row events only
        table_counts = {r["table"]: r["count"] for r in meta_rows if r["count"]}
        ddls = [
            (r["table"], d["seq"], d["ddl"]) for r in meta_rows for d in r["ddls"]
        ]
        if ddls:
            self._apply_source_ddls(ddls, epoch_id)
            events = events.filter(F.col("op") != "DDL")

        route_parts: list[DataFrame] = []  # DataFrames of affected chain keys
        primary_meta = self.spec.tables[self.spec.primary]
        ppk = primary_meta.pk

        # Phase 1 — per-table source maintenance.  Each monitored table is
        # its own LakeTable (independent commit), and its stored-row read
        # is pinned from the pre-epoch snapshot inside the task, so the
        # merges are order-independent: run them thread-parallel (Spark
        # schedules the concurrent jobs across the same executors).
        # Phase 2 (routing) then reads post-merge state with EVERY
        # table's commit visible — which is also what multi-hop chain
        # climbs need, without a topological order on phase 1.
        monitored = [m for m in self.spec.monitored() if table_counts.get(m.name)]

        def _merge_source(meta):
            name = meta.name
            ev = events.filter(F.col("table") == name)
            if self.delete_policy == "ignore":
                ev = ev.filter(F.col("op") != "D")  # V8: deletes are no-ops
            typed = self._typed_after(ev, name)
            # V1 per-PK coalescing: max-(version, seq) event wins the batch.
            # DELETEs carry no after-image version; under delete_policy=
            # 'delete' they rank at +inf so a delete beats same-batch
            # updates (limitation: a re-insert AFTER a delete within one
            # epoch also resolves to the delete — split epochs if that
            # ordering matters; the reference's observed listeners ignore
            # deletes entirely, the default here).
            rank_ver = (
                F.coalesce(F.col(meta.version_col), F.lit(2**62).cast("long"))
                if self.delete_policy == "delete"
                else F.col(meta.version_col)
            )
            w = Window.partitionBy("pk").orderBy(rank_ver.desc(), F.desc("seq"))
            latest = self._pin(
                typed.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            lake = self.sources[name]
            touched = latest.select(F.col("pk").alias(meta.pk)).distinct()
            # pre-merge stored rows of touched PKs: LWW reference version +
            # (for children) the old FK of EVERY parent relation — a
            # multi-parent child's change must re-derive all linked wide
            # rows, old and new (CompositePK routing, CompositePK.java:
            # 25-48).  Bound before commit, so the plan pins the pre-epoch
            # snapshot's files.
            fk_cols: list[str] = []
            for r in self.spec.parent_relations(name):
                if r.child_key not in fk_cols:
                    fk_cols.append(r.child_key)
            stored_cols = [
                F.col(meta.pk).alias("_s_pk"),
                F.col(meta.version_col).alias("_s_ver"),
            ] + [F.col(ck).alias(f"_s_fk_{ck}") for ck in fk_cols]
            stored = self._pin(
                self._pruned_read(lake, touched, meta.pk)
                .join(touched, meta.pk, "left_semi")
                .select(*stored_cols)
            )
            joined = latest.join(
                stored, latest.pk == stored._s_pk, "left"
            ).drop("_s_pk")
            newer = F.col("_s_ver").isNull() | (
                F.col(meta.version_col) > F.col("_s_ver")
            )
            # the lake's committed layout is the truth (not the pipeline
            # flag): tombstone routing must match how rows were bucketed
            layout = lake.current_snapshot().layout_col

            def _tomb_cols(src_pk: F.Column):
                """Tombstone row: PK + (on FK-clustered tables) the STORED
                FK so the tombstone lands in the row's current bucket —
                nulls everywhere else."""
                out = []
                for f in meta.schema.fields:
                    if f.name == meta.pk:
                        out.append(src_pk.alias(meta.pk))
                    elif layout is not None and f.name == layout:
                        out.append(
                            F.col(f"_s_fk_{layout}").cast(f.dataType).alias(f.name)
                        )
                    else:
                        out.append(F.lit(None).cast(f.dataType).alias(f.name))
                return out

            upserts = joined.filter((F.col("op") != "D") & newer).select(
                *[F.col(c) for c in meta.columns],
                F.lit(epoch_id).cast("long").alias(COMMIT_COL),
                F.lit(False).alias(DEAD_COL),
            )
            delta = upserts
            if layout is not None:
                # FK relocation: the applied after-image moved this row to a
                # new bucket; tombstone the copy in the old one.  read()'s
                # alive-over-dead tie-break at equal _commit keeps the moved
                # row visible in whole-table reads while bucket-restricted
                # reads of the old bucket correctly drop it.
                moved = joined.filter(
                    (F.col("op") != "D")
                    & newer
                    & F.col("_s_ver").isNotNull()  # a stored copy exists
                    & ~F.col(f"_s_fk_{layout}").eqNullSafe(F.col(layout))
                ).select(
                    *_tomb_cols(F.col("pk")),
                    F.lit(epoch_id).cast("long").alias(COMMIT_COL),
                    F.lit(True).alias(DEAD_COL),
                )
                delta = delta.unionByName(moved)
            if self.delete_policy == "delete":
                dels = joined.filter(
                    (F.col("op") == "D") & F.col("_s_ver").isNotNull()
                ).select(
                    *(
                        _tomb_cols(F.col("pk"))
                        if layout is not None
                        else [
                            F.col("pk").alias(meta.pk),
                            *[
                                F.lit(None).cast(f.dataType).alias(f.name)
                                for f in meta.schema.fields
                                if f.name != meta.pk
                            ],
                        ]
                    ),
                    F.lit(epoch_id).cast("long").alias(COMMIT_COL),
                    F.lit(True).alias(DEAD_COL),
                )
                delta = delta.unionByName(dels)
            delta = delta.withColumn("_bucket", lake.bucket_expr()).repartition(
                self.num_buckets, F.col("_bucket")
            )
            files = lake.write_data_files(delta, kind="delta")
            committed = lake.commit(
                files,
                summary={"epoch_id": epoch_id},
                expected_snapshot_id=self._views[name],
            )
            self._views[name] = committed.snapshot_id
            return meta, latest, stored, touched

        with ThreadPoolExecutor(max_workers=max(len(monitored), 1)) as ex:
            merged = list(ex.map(_merge_source, monitored))

        # Phase 2 — routing keys (J6): after-image FK + stored FK (old
        # parent) per parent relation; a multi-parent child contributes
        # the union of every chain's keys.  Multi-hop chains climb via
        # post-merge source state.
        for meta, latest, stored, touched in merged:
            if meta.name == self.spec.primary:
                route_parts.append(touched.select(F.col(ppk).alias("_k")))
                continue
            for chain in self.spec.chains_to_primary(meta.name):
                fk_new = latest.select(F.col(chain[0].child_key).alias("_k"))
                fk_old = stored.select(F.col(f"_s_fk_{chain[0].child_key}").alias("_k"))
                keys = fk_new.unionByName(fk_old).filter(F.col("_k").isNotNull())
                for hop in chain[1:]:
                    parent_meta = self.spec.tables[hop.child]  # intermediate
                    inter = self._pruned_read(
                        self.sources[hop.child],
                        keys.select(F.col("_k").alias(parent_meta.pk)),
                        parent_meta.pk,
                    ).select(
                        F.col(parent_meta.pk).alias("_pk"),
                        F.col(hop.child_key).alias("_up"),
                    )
                    keys = (
                        keys.join(inter, keys._k == inter._pk)
                        .select(F.col("_up").alias("_k"))
                        .filter(F.col("_k").isNotNull())
                    )
                route_parts.append(keys)

        if not route_parts:
            self._views["wide"] = self.wide.commit(
                {},
                summary={"epoch_id": epoch_id, "tables": table_counts},
                expected_snapshot_id=self._views["wide"],
            ).snapshot_id
            return {"epoch_id": epoch_id, "n_affected": 0, "tables": table_counts}

        affected = self._pin(
            reduce(DataFrame.unionByName, route_parts)
            .distinct()
            .select(F.col("_k").alias(ppk))
        )

        # restricted recomputation over post-merge source state.  The
        # primary read is zone-pruned by the affected keys (its own PK);
        # children are FK-clustered under fk_layout, so their restriction
        # bucket/zone-prunes on the parent keys (see _pruned_read).
        src = {n: t.read() for n, t in self.sources.items()}
        restricted: dict[str, DataFrame] = dict(src)
        restricted[self.spec.primary] = self._pin(
            self._pruned_read(self.sources[self.spec.primary], affected, ppk).join(
                affected, ppk, "left_semi"
            )
        )
        rels_by_child: dict[str, list] = {}
        for r in self.spec.relations:
            rels_by_child.setdefault(r.child, []).append(r)
        pending = dict(rels_by_child)
        done = {self.spec.primary}
        while pending:
            # one dependency round: every child whose parent slices are ALL
            # restricted already; siblings pin thread-parallel (each pin
            # is an independent Spark job)
            ready = [c for c, rl in pending.items() if all(r.parent in done for r in rl)]
            assert ready, f"unresolvable relation order: {sorted(pending)}"

            def _restrict(child):
                pk = self.spec.tables[child].pk
                slices = []
                for r in pending[child]:
                    parent_keys = restricted[r.parent].select(
                        F.col(r.parent_key).alias(r.child_key)
                    )
                    # under fk_layout the child is clustered by its FIRST
                    # relation's child_key, so that read bucket- and
                    # zone-prunes to the affected parents' key ranges
                    # instead of scanning the child table
                    sliced = self._pruned_read(
                        self.sources[child], parent_keys, r.child_key
                    ).join(parent_keys, r.child_key, "left_semi")
                    slices.append(sliced)
                # multi-parent child: a row qualifies through ANY linked
                # parent (OR of the semi-joins); downstream wide_fn joins
                # against the restricted primary drop the surplus partial
                # aggregates of unaffected parents
                df = slices[0]
                for s in slices[1:]:
                    df = df.unionByName(s)
                if len(slices) > 1:
                    df = df.dropDuplicates([pk])
                return child, self._pin(df)

            with ThreadPoolExecutor(max_workers=len(ready)) as ex:
                for child, df in ex.map(_restrict, ready):
                    restricted[child] = df
                    done.add(child)
            pending = {c: rl for c, rl in pending.items() if c not in ready}

        wide_new = self._pin(self.wide_fn(restricted))
        wsnap = self.wide.current_snapshot()
        wlayout = wsnap.layout_col  # router/shared key, when bucketed by it
        upserts = wide_new.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in wsnap.schema.fields],
            F.lit(epoch_id).cast("long").alias(COMMIT_COL),
            F.lit(False).alias(DEAD_COL),
        )

        def _wide_tomb(df, old_router=None):
            """Tombstone rows: pk + (router layout) the STORED router value
            so the tombstone lands in the row's current bucket."""
            return df.select(
                F.col(ppk),
                *[
                    (
                        old_router.cast(f.dataType)
                        if wlayout is not None and f.name == wlayout
                        else F.lit(None).cast(f.dataType)
                    ).alias(f.name)
                    for f in wsnap.schema.fields
                    if f.name != ppk
                ],
                F.lit(epoch_id).cast("long").alias(COMMIT_COL),
                F.lit(True).alias(DEAD_COL),
            )

        gone = affected.join(wide_new.select(ppk), ppk, "left_anti")
        if wlayout is None:
            delta = upserts.unionByName(_wide_tomb(gone))
        else:
            # stored router values of the affected rows (pre-epoch snapshot,
            # PK-bloom-pruned read): delete-tombstones must route to the old
            # bucket, and a row whose router value CHANGED leaves a
            # relocation tombstone there (same protocol as FK-clustered
            # children above)
            stored_wide = self._pin(
                self._pruned_read(self.wide, affected, ppk)
                .join(affected, ppk, "left_semi")
                .select(F.col(ppk), F.col(wlayout).alias("_w_old"))
            )
            tombstones = _wide_tomb(
                gone.join(stored_wide, ppk), old_router=F.col("_w_old")
            )
            moved = _wide_tomb(
                wide_new.select(F.col(ppk), F.col(wlayout).alias("_w_new"))
                .join(stored_wide, ppk)
                .filter(~F.col("_w_old").eqNullSafe(F.col("_w_new"))),
                old_router=F.col("_w_old"),
            )
            delta = upserts.unionByName(tombstones).unionByName(moved)
        delta = (
            delta
            .withColumn("_bucket", self.wide.bucket_expr())
            .repartition(self.num_buckets, F.col("_bucket"))
        )
        files = self.wide.write_data_files(delta, kind="delta")
        n_affected = affected.count()
        self._views["wide"] = self.wide.commit(
            files,
            summary={
                "epoch_id": epoch_id,
                "n_affected": n_affected,
                "tables": table_counts,
            },
            expected_snapshot_id=self._views["wide"],
        ).snapshot_id
        self._maybe_compact()
        return {"epoch_id": epoch_id, "n_affected": n_affected, "tables": table_counts}

    def _maybe_compact(self) -> None:
        for name, lake in [*self.sources.items(), ("wide", self.wide)]:
            due = [
                int(b)
                for b, n in lake.current_snapshot().delta_counts().items()
                if n >= self.compact_threshold
            ]
            if due:
                compacted = lake.compact(
                    sorted(due),
                    max_records_per_file=self.base_file_rows,
                    expected_snapshot_id=self._views[name],
                )
                if compacted is not None:
                    self._views[name] = compacted.snapshot_id

    def expire(self, keep_last: int = 10, dry_run: bool = False) -> dict[str, dict]:
        """Lake GC across the whole star (every source table + the wide
        table): each compaction strands a base generation per table, so a
        long-running star pipeline multiplies the dead-storage problem by
        the table count.  Recovery-state retention rules are enforced per
        table by LakeTable.expire_snapshots.  No-op before full_build."""
        if self.wide is None:
            return {}
        return {
            name: lake.expire_snapshots(keep_last=keep_last, dry_run=dry_run)
            for name, lake in [*self.sources.items(), ("wide", self.wide)]
        }

    # ------------------------------------------------------------- replay

    def replay(self, events: DataFrame, epoch_size: int = 500) -> list[dict]:
        bounds = events.agg(F.min("seq").alias("lo"), F.max("seq").alias("hi")).first()
        if bounds["lo"] is None:
            return []
        stats = []
        for ep in range(int(bounds["lo"]) // epoch_size, int(bounds["hi"]) // epoch_size + 1):
            batch = events.filter(
                (F.col("seq") >= ep * epoch_size) & (F.col("seq") < (ep + 1) * epoch_size)
            )
            stats.append(self.process_epoch(batch, ep))
        return stats

    def final_wide(self) -> DataFrame:
        return self.wide.read()
