"""Incremental table->table replication over the snapshot-diff changelog.

``TableReplica`` maintains a second lake table purely from ``changes()``
of a source table — the reference's index *backflow* made incremental:
tis-index-builder ships every build by copying the WHOLE index directory
between clusters (IndexBackFlowInterceptor / IndexBackflowManager.java —
full-copy per build, O(index)); here a sync ships exactly the keys that
changed since the replica's watermark, O(changed keys) at any table size.

The consumer contract pinned here is the changelog's ``classify=False``
idempotent-MERGE mode (``lake/table.py::changes``): the feed never reads
old state — one row per changed key, ``upsert`` rows carrying the new
image, ``delete`` rows carrying the key with a null payload.  Deletes are
at-least-once in this mode (a key inserted AND deleted inside the window
still emits a delete notice); a MERGE consumer is idempotent against
that by construction — the key is simply absent on both sides.  Applying
the feed is one bucket-aligned delta commit stamped with the replica's
own epoch; the lake's ordinary merge-on-read fold (latest commit wins,
alive-over-dead) makes re-application of any window a no-op.

LAYOUT-CLUSTERED sources (``layout_col`` set — FK/domain-clustered
tables) cannot use that mode: the bucket is a function of the layout
column, so a null-payload delete row has no bucket and a key whose
layout value changed leaves its old-bucket copy visible to
bucket/key-restricted readers.  For those, ``sync()`` switches to the
preimage changelog and replays the lake's relocation protocol — live
post-images plus old-layout tombstones — at the cost of the preimage
mode's key-restricted old-snapshot read.  Whole-table reads are correct
either way; the layout branch is what keeps *restricted* reads (point
lookups, per-bucket compaction, layout-grouped matviews) correct on the
replica.

Exactly-once: every sync commit carries ``replica_source_snapshot`` (the
source snapshot watermark) and is fenced on the replica snapshot it read
(``expected_snapshot_id``, the C8 writer-view rule) — a duplicate sync
is a watermark no-op, a raced one loses with ``CommitConflict``.

Schema evolution rides along: ``changes()`` aligns pre-DDL rows to the
source's NEW schema, and ``sync()`` first replays any source schema
change onto the replica (same add-column/widen validation), so a replica
can trail a source through DDLs without a rebuild.

At 100 TB this is the replication story: the source's changelog fast
path reads only the files added between the two snapshots (untouched
buckets are never opened), the replica write touches only the buckets
holding changed keys, and nothing ever scans either table in full.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tis_spark.lake.table import COMMIT_COL, DEAD_COL, LakeTable

_SPEC_FILE = "replica.json"


class TableReplica:
    """A lake table maintained from another lake table's changelog."""

    def __init__(self, spark: SparkSession, path: str, source: LakeTable):
        self.spark = spark
        self.path = path
        self.source = source
        self.table = LakeTable.load(spark, path)

    # ------------------------------------------------------------ lifecycle

    @staticmethod
    def create(
        spark: SparkSession,
        path: str,
        source: LakeTable,
        num_buckets: int | None = None,
    ) -> "TableReplica":
        """Define the replica (no data yet — call ``bootstrap``).  The
        replica inherits the source's logical schema, key and layout; its
        bucket count may differ (re-sharding on replication is free since
        apply re-buckets by the replica's own expr)."""
        snap = source.current_snapshot()
        LakeTable.create(
            spark,
            path,
            snap.schema,
            key_cols=list(snap.key_cols),
            version_col=snap.version_col,
            num_buckets=num_buckets or snap.num_buckets,
            layout_col=snap.layout_col,
        )
        with open(os.path.join(path, _SPEC_FILE), "w") as f:
            json.dump({"source_path": source.path}, f)
        return TableReplica(spark, path, source)

    @staticmethod
    def load(spark: SparkSession, path: str) -> "TableReplica":
        with open(os.path.join(path, _SPEC_FILE)) as f:
            spec = json.load(f)
        return TableReplica(spark, path, LakeTable.load(spark, spec["source_path"]))

    # ------------------------------------------------------------- internals

    def _last_source_snapshot(self) -> int:
        for s in reversed(self.table.history()):
            if "replica_source_snapshot" in s.summary:
                return int(s.summary["replica_source_snapshot"])
        return -1

    def _next_epoch(self) -> int:
        last = self.table.last_epoch_id()
        return (last if last is not None else -1) + 1

    def _evolve_to(self, src_snap, expected: int) -> int:
        """Replay a source DDL onto the replica; returns the (possibly
        advanced) replica snapshot id the following data commit fences on."""
        mine = self.table.current_snapshot()
        if mine.schema != src_snap.schema:
            return self.table.evolve_schema(
                src_snap.schema,
                summary={"replica_ddl_from": src_snap.schema_version},
                expected_snapshot_id=expected,
            ).snapshot_id
        return expected

    # ------------------------------------------------------------- bootstrap

    def bootstrap(self) -> dict:
        """Seed the replica with one full read of the source's current
        snapshot (base generation, ``_commit = -1`` per lake convention)
        and set the watermark there — the only O(table) step; every
        later ``sync()`` is O(changed keys)."""
        tsnap = self.table.current_snapshot()
        src_snap = self.source.current_snapshot()
        expected = self._evolve_to(src_snap, tsnap.snapshot_id)
        mine = self.table.current_snapshot()
        # compaction-grade base layout from the start: one task per
        # bucket, rows sorted by the clustering key and split into
        # bounded files — tight zone maps (and PK blooms on relocating
        # tables) from the first commit, not only after a compaction
        rows = (
            self.source.read(snapshot_id=src_snap.snapshot_id)
            .withColumn(COMMIT_COL, F.lit(-1).cast("long"))
            .withColumn(DEAD_COL, F.lit(False))
            .withColumn("_bucket", self.table.bucket_expr())
            .repartition(mine.num_buckets, F.col("_bucket"))
            .sortWithinPartitions("_bucket", LakeTable.layout_key(mine))
        )
        files = self.table.write_data_files(
            rows, kind="base", max_records_per_file=1_000_000
        )
        self.table.commit(
            files,
            summary={"epoch_id": 0, "replica_source_snapshot": src_snap.snapshot_id},
            expected_snapshot_id=expected,
        )
        return {"source_snapshot": src_snap.snapshot_id}

    # ------------------------------------------------------------------ sync

    def sync(self, _pinned=None) -> dict:
        """Catch the replica up to the source's current snapshot from the
        ``classify=False`` changelog.  Idempotent and fenced (see module
        docstring); returns {files, bytes, epoch, up_to_date}.

        ``_pinned`` is ``lake.matview.refresh_views``'s shared-window
        handle ``(src_snap, changelog_df, lo)`` — consumed only on the
        classify branch (a layout-clustered replica needs the preimage
        feed, so it takes its private read), and only when the replica's
        watermark agrees with the group's window."""
        tsnap = self.table.current_snapshot()
        last_src = self._last_source_snapshot()
        if last_src < 0:
            raise RuntimeError("bootstrap() the replica before sync()")
        pinned_ch = None
        if _pinned is not None and _pinned[2] == last_src:
            src_snap, pinned_ch = _pinned[0], _pinned[1]
        else:
            src_snap = self.source.current_snapshot()
        if src_snap.snapshot_id <= last_src:
            return {"keys": 0, "epoch": None, "up_to_date": True}
        expected = self._evolve_to(src_snap, tsnap.snapshot_id)
        epoch = self._next_epoch()
        layout = self.table.current_snapshot().layout_col
        cols = [f.name for f in src_snap.schema.fields]
        if layout is None:
            ch = pinned_ch if pinned_ch is not None else self.source.changes(
                last_src, src_snap.snapshot_id, classify=False
            )
            delta = ch.select(
                *cols,
                (F.col("_change_type") == F.lit("delete")).alias(DEAD_COL),
            )
        else:
            # Layout-clustered replica: the bucket is a function of the
            # LAYOUT column, so classify=False rows cannot route deletes
            # (null payload -> xxhash64(NULL), a constant wrong bucket) or
            # shadow a relocated key's old-bucket copy.  Take the preimage
            # changelog instead and replay the lake's relocation protocol:
            # post-images are the live copies (new bucket); every preimage
            # and every delete becomes a tombstone carrying the OLD layout
            # value (old bucket) with nulled payload.  A non-moving update
            # drops its tombstone in the same bucket as the live copy at
            # the same _commit — read()'s alive-over-dead tie-break keeps
            # the live row — while a moved key's old-bucket copy is
            # correctly shadowed for bucket/key-restricted readers (the
            # same pair the wide engine writes, wide/pipeline.py).
            ch = self.source.changes(
                last_src, src_snap.snapshot_id, with_preimage=True
            )
            keep = set(src_snap.key_cols) | {layout}
            gain = F.col("_change_type").isin("insert", "update_postimage")
            ups = ch.filter(gain).select(*cols).withColumn(DEAD_COL, F.lit(False))
            tmb = (
                ch.filter(~gain)
                .select(
                    *[
                        F.col(f.name)
                        if f.name in keep
                        else F.lit(None).cast(f.dataType).alias(f.name)
                        for f in src_snap.schema.fields
                    ]
                )
                .withColumn(DEAD_COL, F.lit(True))
            )
            delta = ups.unionByName(tmb)
        delta = (
            delta.withColumn(COMMIT_COL, F.lit(epoch).cast("long"))
            .withColumn("_bucket", self.table.bucket_expr())
            # one delta file per touched bucket, not per (task x bucket)
            .repartition(
                self.table.current_snapshot().num_buckets, F.col("_bucket")
            )
        )
        files = self.table.write_data_files(delta, kind="delta")
        n_files = sum(len(ents) for ents in files.values())
        n_bytes = sum(e["bytes"] for ents in files.values() for e in ents)
        self.table.commit(
            files,
            summary={"epoch_id": epoch, "replica_source_snapshot": src_snap.snapshot_id},
            expected_snapshot_id=expected,
        )
        return {
            "files": n_files,
            "bytes": int(n_bytes),
            "epoch": epoch,
            "up_to_date": False,
        }

    # ----------------------------------------------------------- maintenance

    def compact(self, max_records_per_file: int = 0) -> None:
        """Fold accumulated sync deltas into a fresh sorted base.
        Compaction commits carry no watermark, so the sync chain is
        unaffected."""
        self.table.compact_all(max_records_per_file)

    def expire_snapshots(self, keep_last: int = 10, dry_run: bool = False) -> dict:
        """Lake GC over the replica (one snapshot accrues per sync).
        Watermark-safe: sync commits bundle ``epoch_id`` with
        ``replica_source_snapshot`` and the newest ``epoch_id`` carrier
        is always retained.  The complementary hazard is on the SOURCE:
        expiring the snapshot a replica's watermark points at makes the
        next ``sync()`` raise ``FileNotFoundError`` (changelog window
        gone, re-``bootstrap`` required) — pick the source's
        ``keep_last`` with its slowest consumer in mind."""
        return self.table.expire_snapshots(keep_last, dry_run=dry_run)

    # ------------------------------------------------------------------ read

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        return self.table.read(snapshot_id=snapshot_id)
