"""Incrementally-maintained row-derived index tables (flatMap views).

``MaterializedView`` (lake/matview.py) maintains GROUP-BY aggregates and
``TableReplica`` (lake/replica.py) maintains a 1:1 copy; ``DerivedIndex``
closes the remaining derived-artifact shape: a table whose rows are a
pure per-source-row *expansion* — each source row maps to 0..N derived
rows through a registered transform (tokenize, shingle, MinHash-band,
posting-list explode).  That is exactly the artifact the reference's
index builder produces with a FULL pass per build (tis-index-builder
IndexBuilderTask.java:93-188 pipelines every source row through
LuceneDocMaker on every build; backflow then copies the whole artifact,
IndexBackFlowInterceptor.java); here the artifact maintains itself from
the source table's snapshot-diff changelog in O(changed keys) per sync,
which is what makes a search index or an LSH signature store viable over
a 100 TB corpus receiving CDC updates.

Maintenance protocol per sync window (since-watermark -> current):

* the ``classify=False`` changelog yields ONE row per changed source key
  — upserts carrying the new image, deletes carrying the key (the
  idempotent-MERGE consumer contract pinned by lake/replica.py; the
  changelog fast path reads only the files added in the window);
* every derived row belonging to a changed source key is tombstoned: the
  derived table is CLUSTERED by the source key (bucket + zone maps), so
  the old-derived lookup is the same file-pruned point read the merge
  path uses — O(changed keys) IO, never a derived-table scan (bounded
  collect, ``DERIVED_KEYS_MAX``; larger windows fall back to one
  column-pruned scan-plus-semi-join, amortized over the batch);
* the transform re-expands the upserted rows; re-derived rows land
  ALIVE in the same commit as the tombstones — for a derived row that
  survived the change (same key), the lake read's alive-over-dead
  tie-break at equal ``_commit`` keeps the live copy, so an unchanged
  posting is never lost to its own tombstone (the relocation-pair rule,
  lake/table.py::read);
* the commit is fenced on the writer's snapshot view
  (``expected_snapshot_id``, the C8 rule) and watermarked with
  ``derived_source_snapshot`` — a replayed sync is a no-op, a raced one
  loses with ``CommitConflict``, never a double-apply.

Transforms are registered by name (``@derived_transform``) so a
re-opened index finds its expansion again; a transform must be a pure
function of the source row set (no randomness, no time) — the same
determinism contract the engines' fold kernels obey.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tis_spark.lake.table import COMMIT_COL, DEAD_COL, LakeTable

_SPEC_FILE = "derived.json"

#: bounded-collect cap for the changed-source-key set (same policy as the
#: changelog's preimage_keys_max and the matview's RETRACTED_GROUPS_MAX):
#: within the cap the old-derived tombstone read is bucket + zone-map
#: file-pruned; above it, one column-pruned derived scan + semi-join.
DERIVED_KEYS_MAX = 65536

#: registry of named row-expansion transforms: name -> (source rows
#: DataFrame -> derived rows DataFrame).  The output MUST contain the
#: source key column and the derived table's full key.
TRANSFORMS: dict[str, Callable[[DataFrame], DataFrame]] = {}


def derived_transform(name: str):
    """Register a named pure row-expansion transform."""

    def deco(fn: Callable[[DataFrame], DataFrame]):
        assert name not in TRANSFORMS or TRANSFORMS[name] is fn, name
        TRANSFORMS[name] = fn
        return fn

    return deco


class DerivedIndex:
    """A lake table of transform-expanded rows maintained from a source
    table's changelog.  ``create`` + ``bootstrap`` build it; ``sync``
    catches it up to the source's current snapshot."""

    def __init__(self, spark: SparkSession, path: str, source: LakeTable | None = None):
        self.spark = spark
        self.path = path
        self.table = LakeTable.load(spark, path)
        with open(os.path.join(path, _SPEC_FILE)) as f:
            spec = json.load(f)
        self.transform_name: str = spec["transform"]
        if self.transform_name not in TRANSFORMS:
            raise KeyError(
                f"derived transform {self.transform_name!r} not registered — "
                f"import the module that defines it before load()"
            )
        self.transform = TRANSFORMS[self.transform_name]
        self.src_key: str = spec["src_key"]
        self.source = source if source is not None else LakeTable.load(spark, spec["source"])

    # ------------------------------------------------------------ lifecycle

    @staticmethod
    def create(
        spark: SparkSession,
        path: str,
        source: LakeTable,
        transform: str,
        key_cols: list[str],
        num_buckets: int = 16,
    ) -> "DerivedIndex":
        """Define the index (no data yet — call ``bootstrap``).
        ``transform`` names a registered expansion whose output schema is
        derived here by applying it to an empty source frame (schema-only,
        no job).  ``key_cols`` is the DERIVED key and must lead with the
        source's primary key column — that makes the source key the
        physical clustering column (bucket, sort, zone maps), which is
        what file-prunes the per-key tombstone lookup on sync."""
        src_snap = source.current_snapshot()
        assert len(src_snap.key_cols) == 1, (
            "DerivedIndex requires a single-column source key; composite-key "
            f"sources are not supported (got {src_snap.key_cols})"
        )
        src_key = src_snap.key_cols[0]
        assert key_cols[0] == src_key, (
            f"derived key must lead with the source key {src_key!r} "
            f"(got {key_cols}) — the clustering that prunes sync lookups"
        )
        fn = TRANSFORMS[transform]
        out_schema = fn(spark.createDataFrame([], src_snap.schema)).schema
        out_names = {f.name for f in out_schema.fields}
        missing = [c for c in key_cols if c not in out_names]
        assert not missing, f"transform {transform!r} output lacks key cols {missing}"
        LakeTable.create(
            spark,
            path,
            out_schema,
            key_cols=list(key_cols),
            version_col=src_key,
            num_buckets=num_buckets,
        )
        with open(os.path.join(path, _SPEC_FILE), "w") as f:
            json.dump({"source": source.path, "transform": transform, "src_key": src_key}, f)
        return DerivedIndex(spark, path, source)

    @staticmethod
    def load(spark: SparkSession, path: str) -> "DerivedIndex":
        return DerivedIndex(spark, path)

    # ------------------------------------------------------------- internals

    def _check_transform_schema(self, rows: DataFrame) -> None:
        """Fail loudly if the transform's output schema drifted from the
        schema frozen at ``create()`` — otherwise ``write_data_files``
        would cast silently (overflow/truncation, the matview-DDL trap)."""
        frozen = [(f.name, f.dataType) for f in self.table.current_snapshot().schema.fields]
        got = {f.name: f.dataType for f in rows.schema.fields}
        drift = [
            (n, dt, got.get(n))
            for n, dt in frozen
            if n not in got or got[n] != dt
        ]
        if drift:
            raise TypeError(
                f"transform {self.transform_name!r} output drifted from the "
                f"derived schema frozen at create(): "
                + ", ".join(f"{n}: expected {dt}, got {g}" for n, dt, g in drift)
                + " — rebuild the index (create + bootstrap) after a "
                "transform or source-schema change"
            )

    def _last_source_snapshot(self) -> int:
        for s in reversed(self.table.history()):
            if "derived_source_snapshot" in s.summary:
                return int(s.summary["derived_source_snapshot"])
        return -1

    def _next_epoch(self) -> int:
        last = self.table.last_epoch_id()
        return (last if last is not None else -1) + 1

    # ------------------------------------------------------------- bootstrap

    def bootstrap(self) -> dict:
        """Seed the index with one transform pass over the source's
        current snapshot (base generation, ``_commit = -1``) — the only
        O(table) step; every later ``sync()`` is O(changed keys)."""
        tsnap = self.table.current_snapshot()
        src_snap = self.source.current_snapshot()
        expanded = self.transform(self.source.read(snapshot_id=src_snap.snapshot_id))
        self._check_transform_schema(expanded)
        # compaction-grade base layout from the start: one task per
        # bucket, rows sorted by the clustering (source) key and split
        # into bounded files — tight per-file zone maps are what prune
        # every later sync's tombstone lookup
        rows = (
            expanded.withColumn(COMMIT_COL, F.lit(-1).cast("long"))
            .withColumn(DEAD_COL, F.lit(False))
            .withColumn("_bucket", self.table.bucket_expr())
            .repartition(tsnap.num_buckets, F.col("_bucket"))
            .sortWithinPartitions("_bucket", self.src_key)
        )
        files = self.table.write_data_files(
            rows, kind="base", max_records_per_file=1_000_000
        )
        self.table.commit(
            files,
            summary={"epoch_id": 0, "derived_source_snapshot": src_snap.snapshot_id},
            expected_snapshot_id=tsnap.snapshot_id,
        )
        return {"source_snapshot": src_snap.snapshot_id}

    # ------------------------------------------------------------------ sync

    def sync(self, derived_keys_max: int = DERIVED_KEYS_MAX, _pinned=None) -> dict:
        """Catch the index up to the source's current snapshot: tombstone
        every derived row of every changed source key, re-expand the
        upserted source rows, commit both as one fenced delta epoch (see
        module docstring for why survivors keep their live copy).

        ``_pinned`` is ``lake.matview.refresh_views``'s shared-window
        handle ``(src_snap, changelog_df, lo)``: N consumers riding the
        same stream read the identical ``classify=False`` window once.
        An index whose watermark disagrees with the group (attached
        mid-stream, partial failure last batch) silently takes the
        private-read path instead of consuming a mismatched window."""
        tsnap = self.table.current_snapshot()
        last_src = self._last_source_snapshot()
        if last_src < 0:
            raise RuntimeError("bootstrap() the index before sync()")
        ch = None
        if _pinned is not None and _pinned[2] == last_src:
            src_snap, ch = _pinned[0], _pinned[1]
        else:
            src_snap = self.source.current_snapshot()
        if src_snap.snapshot_id <= last_src:
            return {"keys": 0, "epoch": None, "up_to_date": True}
        epoch = self._next_epoch()
        dsnap = self.table.current_snapshot()
        schema = dsnap.schema
        key_cols = dsnap.key_cols

        if ch is None:
            ch = self.source.changes(last_src, src_snap.snapshot_id, classify=False)
        src_cols = [f.name for f in src_snap.schema.fields]
        upserts = ch.filter(F.col("_change_type") != "delete").select(*src_cols)

        # --- old-derived tombstones, file-pruned when the window is small.
        # The changed-key frame is tiny (one row per changed key); collect
        # it bounded and reuse the SAME list for (a) the zone-map pruned
        # point read and (b) the exactness filter — one collect, no
        # re-evaluation of the changelog plan for the key list.
        kdf = ch.select(self.src_key).distinct()
        sample = kdf.limit(derived_keys_max + 1).collect()
        changed = [r[self.src_key] for r in sample]
        if len(changed) <= derived_keys_max:
            old = self.table.read_layout_point_lookup(dsnap, self.src_key, changed)
            old = old.filter(F.col(self.src_key).isin(changed))
        else:
            # window bigger than the cap: one column-pruned derived scan
            # restricted by a broadcast-or-shuffle semi-join (AQE decides)
            old = self.table.read(snapshot_id=dsnap.snapshot_id).join(
                kdf, self.src_key, "left_semi"
            )
        tombs = old.select(
            *[
                F.col(f.name)
                if f.name in key_cols
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        ).withColumn(DEAD_COL, F.lit(True))

        fresh = self.transform(upserts)
        self._check_transform_schema(fresh)
        fresh = fresh.withColumn(DEAD_COL, F.lit(False))
        delta = (
            fresh.unionByName(tombs)
            .withColumn(COMMIT_COL, F.lit(epoch).cast("long"))
            .withColumn("_bucket", self.table.bucket_expr())
            # one delta file per touched bucket, not per (task x bucket)
            .repartition(dsnap.num_buckets, F.col("_bucket"))
        )
        files = self.table.write_data_files(delta, kind="delta")
        n_files = sum(len(ents) for ents in files.values())
        n_bytes = sum(e["bytes"] for ents in files.values() for e in ents)
        self.table.commit(
            files,
            summary={"epoch_id": epoch, "derived_source_snapshot": src_snap.snapshot_id},
            expected_snapshot_id=tsnap.snapshot_id,
        )
        return {
            "keys": len(changed) if len(changed) <= derived_keys_max else None,
            "files": n_files,
            "bytes": int(n_bytes),
            "epoch": epoch,
            "up_to_date": False,
        }

    # ----------------------------------------------------------- maintenance

    def compact(self, max_records_per_file: int = 0) -> None:
        """Fold accumulated sync deltas into a fresh sorted base (a
        long-running stream appends one delta file set per sync and read
        cost degrades with delta count).  Compaction commits carry no
        watermark, so the sync chain is unaffected."""
        self.table.compact_all(max_records_per_file)

    def expire_snapshots(self, keep_last: int = 10, dry_run: bool = False) -> dict:
        """Lake GC over the index table (one snapshot accrues per sync).
        Watermark-safe: sync commits bundle ``epoch_id`` with
        ``derived_source_snapshot`` and the newest ``epoch_id`` carrier is
        always retained by ``LakeTable.expire_snapshots``.  NOTE the
        complementary hazard is on the SOURCE: if the source expires the
        snapshot this index's watermark points at, the next ``sync()``
        raises ``FileNotFoundError`` (the changelog window is gone) and
        the index must re-``bootstrap`` — pick the source's ``keep_last``
        with its slowest consumer in mind."""
        return self.table.expire_snapshots(keep_last, dry_run=dry_run)

    # ------------------------------------------------------------------ read

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        return self.table.read(snapshot_id=snapshot_id)
