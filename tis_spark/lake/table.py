"""LakeTable — a from-scratch snapshot-isolated table format on Parquet.

The execution environment ships no Iceberg/Delta runtime, so the engine
provides its own minimal ACID layer with the properties the CDC sink needs
(modeled on the reference's pt-partition + success-token protocol,
SURVEY.md §1.6 / §2 K2,C10 — MultiThreadDataProvider.java:288-330,
SingleTableDump.java:83,106-128 — generalized to snapshot isolation):

* **Atomic commits**: a snapshot is one JSON file in ``_log/``; publishing
  is ``os.link`` (create-if-absent) — readers see either the old or the new
  snapshot, never a partial state.  Equivalent to the reference's empty
  ``success`` token, but versioned.
* **Bucketed layout**: data files are grouped by ``bucket =
  pmod(xxhash64(key), N)`` (reference: 16-way group fan-out + pmod shard
  column, ITableDumpConstant.RAND_GROUP_NUMBER / SqlRewriter.java:94-128).
* **Merge-on-read**: each bucket holds at most one *base* generation
  (unique keys) plus appended *delta* files (folded upserts/tombstones
  stamped with a monotone ``_commit``).  A MERGE appends only the batch's
  folded rows — write amplification is O(batch), not O(table).  Reads
  reconcile base∖delta-keys ∪ latest-deltas with a broadcast anti-join
  (deltas are small between compactions), and ``compact()`` folds a
  bucket's deltas back into a fresh base.  This is the write-optimized
  upsert layout of published lakehouse formats (Iceberg v2 MOR / Hudi
  MOR), re-derived for this engine.
* **Epoch fencing**: each commit records ``epoch_id`` in its summary; a
  re-delivered micro-batch is detected before any write (exactly-once,
  SURVEY §4 "Exactly-once").
* **Schema evolution**: snapshots carry a versioned schema registry
  (added columns, int->long / float->double widening per the reference's
  lattice, ColumnMetaData.java:207-239); files remember the schema version
  they were written under and reads harmonize by cast+union.
* **Time travel**: any snapshot id can be read back (reference: pt-pinned
  joins, SqlRewriter pt injection — SURVEY §2 J2/K2).

At cluster scale the log directory lives on a shared store; ``os.link``
maps to the store's create-if-absent primitive (HDFS create w/o overwrite,
S3 conditional put) — single-writer per table is assumed, matching the
reference's per-collection ExecuteLock (ExecuteLock.java:33-117).
"""

from __future__ import annotations

import base64
import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass
from functools import reduce
from urllib.parse import unquote, urlparse

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

LOG_DIR = "_log"
DATA_DIR = "data"

# Broadcast the delta key set in the merge-on-read anti-join only while the
# selected delta files stay below this on-disk size (compressed bytes incl.
# payload columns — a safe over-estimate of the key-only broadcast side).
# Above it, the hint is dropped and AQE picks the join strategy from runtime
# sizes: compact_threshold bounds delta *file count* per bucket, not rows,
# so with large epochs the delta key set can exceed Spark's broadcast /
# driver-memory limits — the read every merge depends on must not be the
# thing that OOMs.
BROADCAST_DELTA_MAX_BYTES = 64 << 20

# Gate the changelog's bounded changed-key collect on the window's on-disk
# size: candidate files beyond this almost certainly hold more than
# preimage_keys_max distinct keys, so the sample would fall back anyway —
# skip the extra evaluation of the `latest` window plan for windows that
# are clearly batch-sized, and pay it only where it can win (ADVICE r4).
CHANGES_SAMPLE_MAX_BYTES = 1 << 30

# Force-broadcast the preimage old side only while the files feeding it
# stay under this compressed size: in with_preimage mode the old side
# carries every payload column (html blobs included), so a key-count-only
# gate (preimage_keys_max) could ship GBs past autoBroadcastJoinThreshold
# to every executor (ADVICE r4).  Compressed parquet bytes of the files
# the pruned old read actually opens are the honest upper bound.
PREIMAGE_BROADCAST_MAX_BYTES = 64 << 20

# Physical bookkeeping columns present in every data file, on top of the
# logical schema: the commit stamp deciding LWW between file generations,
# and the tombstone marker (delete encoding under merge-on-read).
COMMIT_COL = "_commit"
DEAD_COL = "_dead"

# Per-base-file primary-key bloom filters, recorded only when the table's
# physical layout key differs from its logical primary key (layout_col):
# files are then bucketed/sorted/zone-mapped by the layout key, so a
# PK point lookup cannot range-prune — the bloom restores file skipping.
# Fixed geometry: BLOOM_M bits, len(BLOOM_SEEDS) hash functions (Spark
# xxhash64 seeded by a leading literal, computed identically on the write
# and lookup sides — no Python reimplementation of the hash).  At
# base_file_rows ≈ 4k this is ~10 bits/key → ~2% file-level false
# positives (an extra file read, never a wrong result).  Blooms ride the
# JSON commit entries; a production deployment at very large file counts
# would spill them to sidecar files next to the data.
BLOOM_SEEDS = (0x51, 0xA7, 0xE3)
BLOOM_M = 1 << 16
BLOOM_SATURATION = 0.5  # skip blooms that would answer "maybe" for everything


class CommitConflict(RuntimeError):
    """Another writer published this snapshot id first."""


def _norm_path(p: str) -> str:
    p = unquote(urlparse(p).path) if "://" in p else p
    return os.path.abspath(p)


def prune_entries_by_bloom(entries: list[dict], positions) -> list[dict]:
    """Keep only file entries whose PK bloom could contain one of the
    looked-up keys.  ``positions`` is an (n_keys, len(BLOOM_SEEDS)) int
    array of bit positions (xxhash64 mod BLOOM_M, computed Spark-side so
    write and lookup hash identically).  Entries without a bloom are always
    kept — pruning is best-effort, never unsound.  Vectorized per file:
    ~n_keys x k numpy ops, driver-side."""
    import numpy as np

    pos = np.asarray(positions, dtype=np.int64)
    if pos.size == 0:
        return [e for e in entries if "pk_bloom" not in e]
    out = []
    for e in entries:
        b = e.get("pk_bloom")
        if not b or int(e.get("bloom_m", 0)) != BLOOM_M:
            out.append(e)
            continue
        bits = np.frombuffer(base64.b64decode(b), dtype=np.uint8)
        if (((bits[pos >> 3] >> (pos & 7)) & 1) != 0).all(axis=1).any():
            out.append(e)
    return out


def bloom_position_cols(key_col: str) -> list:
    """The bloom bit-position expressions for a key column — shared by the
    write-side attach pass and lookup-side key collection so both sides
    hash identically (seeded Spark xxhash64, mod BLOOM_M)."""
    return [
        F.pmod(F.xxhash64(F.lit(s), F.col(key_col)), F.lit(BLOOM_M)).alias(f"_bp{j}")
        for j, s in enumerate(BLOOM_SEEDS)
    ]


def prune_entries_by_keys(entries: list[dict], key_set: list) -> list[dict]:
    """Keep only file entries whose [key_min, key_max] zone could contain a
    key from ``key_set``.  Entries without zone info are always kept
    (deltas, pre-zone-map files) — pruning is best-effort, never unsound.
    O(|entries| log |keys|) driver-side via bisect over the sorted keys."""
    import bisect

    keys = sorted(key_set)
    if not keys:
        return [e for e in entries if "key_min" not in e]
    out = []
    for e in entries:
        if "key_min" not in e or e["key_min"] is None or e["key_max"] is None:
            out.append(e)
            continue
        i = bisect.bisect_left(keys, e["key_min"])
        if i < len(keys) and keys[i] <= e["key_max"]:
            out.append(e)
    return out


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    schema_version: int
    schemas: dict[str, str]  # schema_version -> StructType.json()
    files: dict[str, list[dict]]  # bucket -> [{path, schema_version, kind}]
    num_buckets: int
    key_cols: list[str]
    version_col: str
    summary: dict
    created_ms: int
    #: physical clustering key (bucketing, in-file sort, zone maps) when it
    #: differs from key_cols[0] — e.g. a child table laid out by its FK
    #: toward the wide table's primary so FK-restricted reads range-prune;
    #: PK point lookups then prune via per-file blooms instead.
    layout_col: str | None = None

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schemas[str(self.schema_version)]))

    def schema_at(self, version: int) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schemas[str(version)]))

    def delta_counts(self) -> dict[str, int]:
        return {
            b: sum(1 for e in entries if e.get("kind") == "delta")
            for b, entries in self.files.items()
        }

    def to_json(self) -> str:
        return json.dumps(
            {
                "snapshot_id": self.snapshot_id,
                "parent_id": self.parent_id,
                "schema_version": self.schema_version,
                "schemas": self.schemas,
                "files": self.files,
                "num_buckets": self.num_buckets,
                "key_cols": self.key_cols,
                "version_col": self.version_col,
                "summary": self.summary,
                "created_ms": self.created_ms,
                "layout_col": self.layout_col,
            }
        )

    @staticmethod
    def from_json(s: str) -> "Snapshot":
        return Snapshot(**json.loads(s))


def _physical(schema: T.StructType) -> T.StructType:
    return T.StructType(
        list(schema.fields)
        + [T.StructField(COMMIT_COL, T.LongType()), T.StructField(DEAD_COL, T.BooleanType())]
    )


class LakeTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # ------------------------------------------------------------- lifecycle

    @staticmethod
    def create(
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_cols: list[str],
        version_col: str,
        num_buckets: int = 16,
        summary: dict | None = None,
        layout_col: str | None = None,
    ) -> "LakeTable":
        os.makedirs(os.path.join(path, LOG_DIR), exist_ok=True)
        os.makedirs(os.path.join(path, DATA_DIR), exist_ok=True)
        if layout_col is not None:
            assert layout_col in {f.name for f in schema.fields}, layout_col
        t = LakeTable(spark, path)
        snap = Snapshot(
            snapshot_id=0,
            parent_id=None,
            schema_version=1,
            schemas={"1": schema.json()},
            files={},
            num_buckets=num_buckets,
            key_cols=key_cols,
            version_col=version_col,
            summary=summary or {},
            created_ms=int(time.time() * 1000),
            layout_col=layout_col,
        )
        t._publish(snap)
        return t

    @staticmethod
    def load(spark: SparkSession, path: str) -> "LakeTable":
        if not os.path.isdir(os.path.join(path, LOG_DIR)):
            raise FileNotFoundError(f"not a lake table: {path}")
        return LakeTable(spark, path)

    @staticmethod
    def exists(path: str) -> bool:
        log = os.path.join(path, LOG_DIR)
        return os.path.isdir(log) and any(f.endswith(".json") for f in os.listdir(log))

    # ------------------------------------------------------------- snapshots

    def _log_path(self, snapshot_id: int) -> str:
        return os.path.join(self.path, LOG_DIR, f"{snapshot_id:010d}.json")

    def current_snapshot(self) -> Snapshot:
        log = os.path.join(self.path, LOG_DIR)
        ids = sorted(int(f[:-5]) for f in os.listdir(log) if f.endswith(".json"))
        if not ids:
            raise FileNotFoundError(f"empty log at {log}")
        return self.snapshot(ids[-1])

    def snapshot(self, snapshot_id: int) -> Snapshot:
        with open(self._log_path(snapshot_id)) as f:
            return Snapshot.from_json(f.read())

    def history(self) -> list[Snapshot]:
        log = os.path.join(self.path, LOG_DIR)
        ids = sorted(int(f[:-5]) for f in os.listdir(log) if f.endswith(".json"))
        return [self.snapshot(i) for i in ids]

    def _publish(self, snap: Snapshot) -> None:
        """Atomic create-if-absent publish (optimistic concurrency)."""
        tmp = os.path.join(self.path, LOG_DIR, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            f.write(snap.to_json())
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._log_path(snap.snapshot_id))
        except FileExistsError as e:
            raise CommitConflict(f"snapshot {snap.snapshot_id} already published") from e
        finally:
            os.unlink(tmp)

    def last_epoch_id(self) -> int | None:
        """Highest committed epoch id — the exactly-once fence."""
        for snap in reversed(self.history()):
            if "epoch_id" in snap.summary:
                return int(snap.summary["epoch_id"])
        return None

    # ------------------------------------------------------------- expressions

    @staticmethod
    def _entries_bytes(entries: list[dict]) -> int:
        """Total on-disk bytes of the entries (sizes cached in the entry at
        write time; stat fallback for entries written before that)."""
        total = 0
        for e in entries:
            sz = e.get("bytes")
            if sz is None:
                try:
                    sz = os.path.getsize(e["path"])
                except OSError:
                    sz = 0
            total += int(sz)
        return total

    @staticmethod
    def layout_key(snap: Snapshot) -> str:
        """The physical clustering column: layout_col when set, else the
        primary key.  Bucketing, base-file sort order and zone maps all
        follow it."""
        return snap.layout_col or snap.key_cols[0]

    def bucket_expr(self, key_col: str | None = None) -> F.Column:
        snap = self.current_snapshot()
        key = key_col or self.layout_key(snap)
        return F.pmod(F.xxhash64(F.col(key)), F.lit(snap.num_buckets)).cast("int")

    # ------------------------------------------------------------- read

    def _selected_entries(
        self, snap: Snapshot, buckets: list[int] | None, kinds: set[str]
    ) -> list[dict]:
        want = None if buckets is None else {str(b) for b in buckets}
        out = []
        for bucket, entries in snap.files.items():
            if want is not None and bucket not in want:
                continue
            out.extend(e for e in entries if e.get("kind", "base") in kinds)
        return out

    def _read_parts(
        self,
        snap: Snapshot,
        buckets: list[int] | None,
        kinds: set[str],
        entries: list[dict] | None = None,
    ) -> DataFrame | None:
        """Union the selected files harmonized to the snapshot's current
        logical schema + (_commit, _dead); None if no files selected."""
        cur = snap.schema
        if entries is None:
            entries = self._selected_entries(snap, buckets, kinds)
        by_ver: dict[int, list[str]] = {}
        for e in entries:
            by_ver.setdefault(int(e["schema_version"]), []).append(e["path"])
        parts: list[DataFrame] = []
        for ver, paths in sorted(by_ver.items()):
            hist = _physical(snap.schema_at(ver))
            df = self.spark.read.schema(hist).parquet(*paths)
            hist_names = {f.name: f.dataType for f in hist.fields}
            cols = []
            for fld in _physical(cur).fields:
                if fld.name not in hist_names:
                    cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
                elif hist_names[fld.name] != fld.dataType:
                    cols.append(F.col(fld.name).cast(fld.dataType).alias(fld.name))
                else:
                    cols.append(F.col(fld.name))
            parts.append(df.select(*cols))
        if not parts:
            return None
        return reduce(DataFrame.unionByName, parts)

    def read(
        self,
        snapshot_id: int | None = None,
        buckets: list[int] | None = None,
        with_internal: bool = False,
        key_set: list | None = None,
        pk_set: list | None = None,
        pk_positions=None,
    ) -> DataFrame:
        """Merge-on-read reconciliation of a snapshot.

        base rows whose key has no delta ∪ latest delta per key (alive).
        The base∖delta-keys anti-join broadcasts the delta keys only while
        the selected deltas are small (size-guarded; AQE decides above).

        ``key_set`` (point-lookup pruning by the LAYOUT key): base files
        whose [key_min, key_max] zone contains none of the given keys are
        skipped.  Pass a dict ``{bucket(str): [keys]}`` so each bucket's
        files are tested only against its own keys (a flat list works but
        over-matches ~num_buckets-fold, since every bucket holds a uniform
        key sample).  The result is a *superset projection*: it contains
        every row whose key is listed, plus incidental rows sharing a
        surviving file — callers must filter/semi-join to exact keys.
        Deltas are never pruned (bounded by compaction).

        ``pk_set`` (point-lookup pruning by the PRIMARY key on a table
        whose layout_col differs): base files are pruned via their
        per-file PK blooms; bucket selection does not apply (the bucket
        is a function of the layout key, not the PK).  ``pk_positions``
        optionally carries the precomputed (n, k) bloom bit positions
        (from ``bloom_position_cols`` collected alongside the keys); when
        absent a small Spark job computes them here.  Same superset
        contract as ``key_set``.
        """
        snap = self.current_snapshot() if snapshot_id is None else self.snapshot(snapshot_id)
        cur = snap.schema
        key = snap.key_cols
        empty = self.spark.createDataFrame([], _physical(cur) if with_internal else cur)
        if pk_set is not None:
            assert key_set is None and buckets is None
            if pk_positions is None and pk_set:
                kt = next(f.dataType for f in cur.fields if f.name == key[0])
                kdf = self.spark.createDataFrame(
                    [(k,) for k in pk_set], T.StructType([T.StructField(key[0], kt)])
                )
                pk_positions = [
                    [r[f"_bp{j}"] for j in range(len(BLOOM_SEEDS))]
                    for r in kdf.select(*bloom_position_cols(key[0])).collect()
                ]
            base_entries = prune_entries_by_bloom(
                self._selected_entries(snap, None, {"base"}), pk_positions or []
            )
        elif key_set is None:
            base_entries = self._selected_entries(snap, buckets, {"base"})
        else:
            want = None if buckets is None else {str(b) for b in buckets}
            base_entries = []
            for b, entries in snap.files.items():
                if want is not None and b not in want:
                    continue
                ents = [e for e in entries if e.get("kind", "base") == "base"]
                ks = key_set.get(b, []) if isinstance(key_set, dict) else key_set
                base_entries.extend(prune_entries_by_keys(ents, ks))
        base = self._read_parts(snap, buckets, {"base"}, entries=base_entries)
        delta_entries = self._selected_entries(snap, buckets, {"delta"})
        delta = self._read_parts(snap, buckets, {"delta"}, entries=delta_entries)
        internal = [COMMIT_COL, DEAD_COL]

        if delta is not None:
            # alive-over-dead tie-break at equal _commit: a relocation on a
            # layout_col table writes, in ONE epoch, the moved row to its
            # new bucket and a tombstone to its old bucket — the alive copy
            # must win a whole-table read, and a bucket-restricted read of
            # the old bucket alone sees only the tombstone (row correctly
            # absent there).
            w = Window.partitionBy(*key).orderBy(F.desc(COMMIT_COL), F.asc(DEAD_COL))
            delta = (
                delta.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            alive = delta.filter(~F.coalesce(F.col(DEAD_COL), F.lit(False)))
            if base is not None:
                # Base-vs-delta reconciliation must be _commit-ordered, not
                # "any delta key shadows every base copy": after an FK/router
                # relocation the live copy and its old-bucket tombstone sit
                # in DIFFERENT buckets, and per-bucket compaction can fold
                # the live copy into a *base* file while the other bucket's
                # tombstone is still a *delta*.  A blanket anti-join would
                # let that dead delta shadow the newer live base row and the
                # key would vanish from every read (caught by the 51-epoch
                # soak, tests/test_soak.py).  Keep a base row iff no delta
                # carries its key, or the latest delta is a TOMBSTONE that
                # is older than the base copy — with alive-over-dead at
                # equal _commit, the same-epoch relocation pair (base rows
                # are always alive; initial-build bases stamp _commit = -1
                # so they never tie with a real epoch).
                # key columns renamed + eqNullSafe: a NULL key member is a
                # legal key value for group-keyed tables (matview/aux), and
                # a plain name-join would never match it — the tombstone
                # could not shadow its base row and the key would surface
                # twice.  For non-null keys this is the identical equi-join.
                dkeys = delta.select(
                    *[F.col(c).alias(f"_dk_{c}") for c in key],
                    F.col(COMMIT_COL).alias("_d_commit"),
                    F.coalesce(F.col(DEAD_COL), F.lit(False)).alias("_d_dead"),
                    F.lit(True).alias("_d_present"),
                )
                if self._entries_bytes(delta_entries) <= BROADCAST_DELTA_MAX_BYTES:
                    dkeys = F.broadcast(dkeys)
                cond = reduce(
                    Column.__and__,
                    [base[c].eqNullSafe(dkeys[f"_dk_{c}"]) for c in key],
                )
                keep = F.col("_d_present").isNull() | (
                    F.col("_d_dead") & (F.col(COMMIT_COL) >= F.col("_d_commit"))
                )
                merged = (
                    base.join(dkeys, cond, "left")
                    .filter(keep)
                    .drop("_d_commit", "_d_dead", "_d_present", *[f"_dk_{c}" for c in key])
                    .unionByName(alive)
                )
            else:
                merged = alive
        elif base is not None:
            merged = base
        else:
            return empty
        return merged if with_internal else merged.drop(*internal)

    def read_layout_point_lookup(self, snap, col: str, values: list) -> DataFrame:
        """Bucket + zone-map file-pruned read of the rows whose LAYOUT
        column is in ``values`` — the point-lookup recipe shared by the
        changelog's key-restricted old reads and the matview retraction
        recompute.  ``values`` must be non-null and ``col`` must be the
        snapshot's physical clustering column (``layout_key``); the result
        is a SUPERSET projection (a file holding one wanted value yields
        all its rows) — callers make it exact with their own semi-join.
        The bucket map is computed with the same xxhash64 expression the
        writers bucket by, so the (buckets, key_set) pair lines up with
        the zone maps on disk."""
        dt = next(f.dataType for f in snap.schema.fields if f.name == col)
        kdf = self.spark.createDataFrame(
            [(v,) for v in values], T.StructType([T.StructField(col, dt)])
        )
        bexpr = F.pmod(F.xxhash64(F.col(col)), F.lit(snap.num_buckets))
        ks: dict[str, list] = {}
        for r in kdf.select(bexpr.cast("int").alias("_b"), col).collect():
            ks.setdefault(str(r["_b"]), []).append(r[col])
        return self.read(
            snapshot_id=snap.snapshot_id,
            buckets=sorted(int(b) for b in ks),
            key_set=ks,
        )

    # ------------------------------------------------------- change feed

    def changes(
        self,
        since_snapshot_id: int,
        snapshot_id: int | None = None,
        classify: bool = True,
        with_preimage: bool = False,
        preimage_keys_max: int = 65536,
    ) -> DataFrame:
        """Snapshot-diff changelog (the Delta-CDF / Iceberg-changelog
        analog): every key whose state differs between ``since_snapshot_id``
        and ``snapshot_id`` (default: current), one row per key, with
        ``_change_type`` in {insert, update, delete} (``upsert``/``delete``
        when ``classify=False``) and ``_change_epoch`` = the epoch that last
        touched the key.

        ``with_preimage=True`` (requires ``classify``) upgrades the feed to
        full CDF rows: updates split into ``update_preimage`` /
        ``update_postimage`` pairs and delete rows carry the deleted row's
        OLD values instead of a null payload — exactly what a retracting
        consumer (incremental aggregate maintenance, see
        ``lake/matview.py``) needs to subtract a key's old contribution
        before adding its new one.  Preimages come from ONE read of the old
        snapshot inner-joined to the changed-key set; because the result is
        lazy, a consumer that selects a column subset prunes the old-state
        parquet scan to those columns.  For trigger-sized windows (up to
        ``preimage_keys_max`` changed keys, bounded collect — the same
        policy as the merge path's stored lookup) the old read is
        file-pruned to the changed keys via zone maps (layout == key) or
        per-file PK blooms (relocating tables), so preimage IO is
        O(changed keys), not O(table); larger windows fall back to the
        scan-plus-join, amortized over the batch.  Rows from before a
        column-adding/widening DDL are aligned to the NEW schema (missing
        columns null, narrower types cast), mirroring what
        ``read(snapshot_id=old)`` + the DDL would show.  This is what lets downstream consumers (index
        backflow, derived aggregates, replicas) maintain themselves
        incrementally instead of re-reading 100 TB of table state — the
        reference's full-rebuild index backflow re-reads everything
        (tis-index-builder); here the delta IS the interface.

        Plan shape: the fast path reads ONLY the data files added between
        the two snapshots (log file-set diff — untouched buckets are never
        opened), filters to rows newer than the old snapshot's epoch
        horizon, and takes the per-key latest copy (alive-over-dead at
        equal epoch, the relocation tie-break).  ``classify=True`` adds one
        key-column-only scan of the OLD snapshot (column-pruned parquet) to
        split inserts from updates and confirm deletes.  If a compaction
        committed inside the window, folded-away tombstones can no longer
        witness deletes, so deletes fall back to an old-keys∖new-keys
        anti-join (two key-only scans) — detected automatically from the
        commit summaries; upserts stay on the fast path either way
        (compaction preserves per-row _commit).

        Emitted rows carry the NEW row state (postimage); delete rows carry
        the key with null payload.  Bootstrap full-build rows (epoch -1)
        count as inserts when the old snapshot predates the build.
        ``classify=False`` never reads old state, so its deletes are
        at-least-once: a key inserted AND deleted inside the window still
        emits a delete notice (the key was already absent at the old
        snapshot) — a no-op for the idempotent MERGE/DELETE consumers the
        mode is for; ``classify=True`` filters them exactly.  Raises
        ``FileNotFoundError`` if ``since_snapshot_id`` has been expired
        (its log entry is gone — same semantics as time travel)."""
        if with_preimage and not classify:
            raise ValueError("with_preimage requires classify=True")
        new_snap = (
            self.current_snapshot() if snapshot_id is None else self.snapshot(snapshot_id)
        )
        old_snap = self.snapshot(since_snapshot_id)
        if new_snap.snapshot_id < old_snap.snapshot_id:
            raise ValueError("snapshot_id precedes since_snapshot_id")
        key = new_snap.key_cols
        cur = new_snap.schema
        ctype = F.lit  # readability below

        # epoch horizon visible at the old snapshot (full-build rows stamp
        # -1; -2 when the old snapshot held no data at all, so a bootstrap
        # in the window surfaces as inserts)
        since_epoch = -1 if any(old_snap.files.values()) else -2
        for s in reversed(self.history()):
            if s.snapshot_id <= old_snap.snapshot_id and "epoch_id" in s.summary:
                since_epoch = int(s.summary["epoch_id"])
                break
        compaction_in_window = any(
            old_snap.snapshot_id < s.snapshot_id <= new_snap.snapshot_id
            and "compaction" in s.summary
            for s in self.history()
        )

        old_paths = {e["path"] for ents in old_snap.files.values() for e in ents}
        cand = [
            e
            for ents in new_snap.files.values()
            for e in ents
            if e["path"] not in old_paths
        ]
        out_fields = [f.name for f in cur.fields]
        empty = self.spark.createDataFrame(
            [],
            T.StructType(
                list(cur.fields)
                + [
                    T.StructField("_change_type", T.StringType()),
                    T.StructField("_change_epoch", T.LongType()),
                ]
            ),
        )
        raw = self._read_parts(new_snap, None, {"base", "delta"}, entries=cand)
        if raw is None and not compaction_in_window:
            return empty
        latest = None
        if raw is not None:
            w = Window.partitionBy(*key).orderBy(F.desc(COMMIT_COL), F.asc(DEAD_COL))
            latest = (
                raw.filter(F.col(COMMIT_COL) > F.lit(since_epoch))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        dead = F.coalesce(F.col(DEAD_COL), F.lit(False))
        need_old_keys = classify or compaction_in_window

        # Trigger-sized windows: ONE bounded collect of the changed keys
        # (the merge path's stored-lookup policy) lets both the classify
        # key scan and the preimage read prune old-snapshot files by zone
        # map (layout == leading key) or PK bloom (relocating tables) —
        # O(changed keys), not O(table).  Composite keys ride the same
        # path: files are pruned by the distinct leading-key values and
        # the exact restriction is the full-key semi-join below.  A
        # compaction in the window disables it: its delete fallback is a
        # whole-table key diff by definition; a window whose candidate
        # files exceed CHANGES_SAMPLE_MAX_BYTES skips the sample outright
        # (it would overflow the cap and fall back anyway).  The
        # restricted read is a superset projection, which is exact here:
        # every changed key's old row is guaranteed present, and
        # incidental extra keys never match a join against changed keys.
        changed_keys = None  # list[Row] over the full key tuple
        if (
            need_old_keys
            and not compaction_in_window
            and latest is not None
            and preimage_keys_max
            and self._entries_bytes(cand) <= CHANGES_SAMPLE_MAX_BYTES
        ):
            # latest is one row per key by construction — no distinct
            sample = latest.select(*key).limit(preimage_keys_max + 1).collect()
            if len(sample) <= preimage_keys_max:
                changed_keys = sample

        def _old_read() -> DataFrame:
            if changed_keys is None:
                return self.read(snapshot_id=old_snap.snapshot_id)
            ktypes = {f.name: f.dataType for f in old_snap.schema.fields}
            kdf = self.spark.createDataFrame(
                [tuple(r[c] for c in key) for r in changed_keys],
                T.StructType([T.StructField(c, ktypes[c]) for c in key]),
            )
            # file pruning keys off the physical clustering column: zone
            # maps when the leading key IS the layout key, per-file PK
            # blooms otherwise (relocating tables)
            k0 = key[0]
            k0_vals = list({r[k0] for r in changed_keys})
            if any(v is None for v in k0_vals):
                wide = self.read(snapshot_id=old_snap.snapshot_id)
            elif LakeTable.layout_key(old_snap) != k0:
                wide = self.read(snapshot_id=old_snap.snapshot_id, pk_set=k0_vals)
            else:
                wide = self.read_layout_point_lookup(old_snap, k0, k0_vals)
            # exact-restrict the superset projection against the BROADCAST
            # key set: downstream classification/preimage joins then see at
            # most len(changed_keys) old rows and plan as broadcast joins —
            # without this, joining changed rows against an old side too
            # big to broadcast shuffles the whole old key set (O(table)
            # shuffle for a trigger-sized window).  eqNullSafe on renamed
            # key cols: group-keyed tables may hold NULL key members.
            kdf = kdf.select(*[F.col(c).alias(f"_k_{c}") for c in key])
            cond = reduce(
                Column.__and__,
                [wide[c].eqNullSafe(kdf[f"_k_{c}"]) for c in key],
            )
            return wide.join(F.broadcast(kdf), cond, "left_semi")

        old_state = _old_read() if need_old_keys else None
        old_keys = old_state.select(*key) if need_old_keys else None

        old_aligned = None
        if old_state is not None:
            # old rows aligned to the NEW schema (missing cols null,
            # narrower types cast) so classification and preimages stay
            # schema-stable across a DDL inside the window
            old_names = {f.name for f in old_snap.schema.fields}
            old_aligned = old_state.select(
                *[
                    (F.col(f.name).cast(f.dataType) if f.name in old_names
                     else F.lit(None).cast(f.dataType)).alias(f.name)
                    for f in cur.fields
                ]
            )

        def _null_payload(epoch) -> list:
            return [
                F.col(f.name) if f.name in key
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in cur.fields
            ] + [ctype("delete").alias("_change_type"), epoch]

        parts: list[DataFrame] = []
        if latest is not None and classify:
            # ONE left join against the old state both classifies (insert
            # vs update, tombstone confirmation) AND carries the preimage
            # payload: the old side appears once in the plan, so its scan
            # is executed once and shared by every output branch — as a
            # reused broadcast when the changed-key set was bounded (at
            # most preimage_keys_max rows), as a reused shuffle exchange
            # otherwise.  Joining each branch separately would re-scan the
            # old snapshot per branch (3-4 O(table) scans per call).
            payload = [c for c in out_fields if c not in key]
            old_side = old_aligned.select(
                *[F.col(c).alias(f"_ok_{c}") for c in key],
                *[F.col(c).alias(f"_o_{c}") for c in payload],
                F.lit(True).alias("_o_present"),
            )
            if changed_keys is not None:
                if not with_preimage:
                    # Catalyst prunes the unused _o_* payload through the
                    # join, so the broadcast side is keys + one boolean —
                    # bounded by preimage_keys_max rows, always safe
                    old_side = F.broadcast(old_side)
                else:
                    # preimage rows carry the full payload (html blobs):
                    # hint the broadcast only while the files the pruned
                    # old read opens stay small on disk (size-guarded,
                    # not just key-count-guarded)
                    try:
                        est = sum(
                            os.path.getsize(_norm_path(f))
                            for f in old_state.inputFiles()
                        )
                    except OSError:
                        est = None
                    if est is not None and est <= PREIMAGE_BROADCAST_MAX_BYTES:
                        old_side = F.broadcast(old_side)
            lj = latest.join(
                old_side,
                reduce(
                    Column.__and__,
                    [latest[c].eqNullSafe(old_side[f"_ok_{c}"]) for c in key],
                ),
                "left",
            )
            present = F.coalesce(F.col("_o_present"), F.lit(False))
            epoch_col = F.col(COMMIT_COL).alias("_change_epoch")
            pre_fields = [
                F.col(c) if c in key else F.col(f"_o_{c}").alias(c)
                for c in out_fields
            ]
            ups = lj.filter(~dead)
            parts.append(
                ups.filter(~present).select(
                    *out_fields, ctype("insert").alias("_change_type"), epoch_col
                )
            )
            upd_type = "update_postimage" if with_preimage else "update"
            parts.append(
                ups.filter(present).select(
                    *out_fields, ctype(upd_type).alias("_change_type"), epoch_col
                )
            )
            if with_preimage:
                parts.append(
                    ups.filter(present).select(
                        *pre_fields,
                        ctype("update_preimage").alias("_change_type"),
                        epoch_col,
                    )
                )
            if not compaction_in_window:
                # the engine only tombstones keys it has seen, but the
                # presence check keeps the contract independent of that
                # invariant
                tomb = lj.filter(dead & present)
                if with_preimage:
                    parts.append(
                        tomb.select(
                            *pre_fields,
                            ctype("delete").alias("_change_type"),
                            epoch_col,
                        )
                    )
                else:
                    parts.append(tomb.select(*_null_payload(epoch_col)))
        elif latest is not None:
            ups = latest.filter(~dead)
            parts.append(
                ups.select(*out_fields, ctype("upsert").alias("_change_type"),
                           F.col(COMMIT_COL).alias("_change_epoch"))
            )
            if not compaction_in_window:
                tomb = latest.filter(dead)
                parts.append(
                    tomb.select(
                        *_null_payload(F.col(COMMIT_COL).alias("_change_epoch"))
                    )
                )
        if compaction_in_window:
            # folded-away tombstones can no longer witness deletes: fall
            # back to the whole-table key diff (changed_keys is None here,
            # so old_keys/old_aligned are full reads by construction)
            new_keys = self.read(snapshot_id=new_snap.snapshot_id).select(
                *[F.col(c).alias(f"_nk_{c}") for c in key]
            )
            gone = old_keys.join(
                new_keys,
                reduce(
                    Column.__and__,
                    [old_keys[c].eqNullSafe(new_keys[f"_nk_{c}"]) for c in key],
                ),
                "left_anti",
            )
            gone_r = gone.select(*[F.col(c).alias(f"_g_{c}") for c in key])
            if with_preimage:
                parts.append(
                    old_aligned.join(
                        gone_r,
                        reduce(
                            Column.__and__,
                            [old_aligned[c].eqNullSafe(gone_r[f"_g_{c}"]) for c in key],
                        ),
                        "left_semi",
                    ).select(
                        *out_fields,
                        ctype("delete").alias("_change_type"),
                        F.lit(None).cast("long").alias("_change_epoch"),
                    )
                )
            else:
                parts.append(
                    gone.select(*_null_payload(F.lit(None).cast("long").alias("_change_epoch")))
                )
        if not parts:
            return empty
        return reduce(DataFrame.unionByName, parts)

    # ------------------------------------------------------------- write

    def write_data_files(
        self,
        df: DataFrame,
        kind: str = "delta",
        bucket_col: str = "_bucket",
        max_records_per_file: int = 0,
    ) -> dict[str, list[dict]]:
        """Write df as parquet partitioned by bucket under a fresh data
        subdir; returns bucket -> file entries tagged ``kind``.

        df must carry ``bucket_col`` plus the logical columns and the
        physical bookkeeping columns (_commit long, _dead boolean).

        Base files additionally get key zone maps (key_min/key_max) in
        their entries — computed with one distributed pass over the
        just-written files (compaction-path only, never per epoch), they
        let lookups prune files by key range (see ``read``).
        ``max_records_per_file`` bounds rows per file so sorted bases
        split into fine-grained zones.
        """
        snap = self.current_snapshot()
        phys = _physical(snap.schema)
        sub = f"snap-{uuid.uuid4().hex}"
        out = os.path.join(self.path, DATA_DIR, sub)
        cols = [F.col(f.name).cast(f.dataType).alias(f.name) for f in phys.fields]
        writer = df.select(F.col(bucket_col), *cols).write.partitionBy(bucket_col).mode(
            "overwrite"
        )
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        writer.parquet(out)
        files: dict[str, list[dict]] = {}
        for entry in sorted(os.listdir(out)):
            if not entry.startswith(f"{bucket_col}="):
                continue
            b = entry.split("=", 1)[1]
            d = os.path.join(out, entry)
            for fn in sorted(os.listdir(d)):
                if fn.endswith(".parquet"):
                    p = os.path.join(d, fn)
                    files.setdefault(b, []).append(
                        {
                            "path": p,
                            "schema_version": snap.schema_version,
                            "kind": kind,
                            "bytes": os.path.getsize(p),
                        }
                    )
        if kind == "base":
            self._attach_zone_maps(self.layout_key(snap), files)
            if snap.layout_col and snap.layout_col != snap.key_cols[0]:
                self._attach_pk_blooms(snap.key_cols[0], files)
        return files

    def _attach_zone_maps(self, key: str, files: dict[str, list[dict]]) -> None:
        """One distributed min/max-per-file pass over freshly written base
        files.  Keyed by the full path, NOT the basename: one write task
        serving several bucket partition dirs (hash collision in the
        bucket repartition, or maxRecordsPerFile splits) emits files with
        identical basenames under different ``_bucket=`` dirs, and a
        basename key would cross-assign their zones — silently wrong
        pruning (rows vanish from key-pruned reads)."""
        paths = [e["path"] for v in files.values() for e in v]
        if not paths:
            return
        zones = {
            _norm_path(r["f"]): (r["kmin"], r["kmax"])
            for r in (
                self.spark.read.parquet(*paths)
                .select(F.input_file_name().alias("f"), F.col(key).alias("k"))
                .groupBy("f")
                .agg(F.min("k").alias("kmin"), F.max("k").alias("kmax"))
                .collect()
            )
        }
        for v in files.values():
            for e in v:
                z = zones.get(_norm_path(e["path"]))
                if z is not None:
                    e["key_min"], e["key_max"] = z

    def _attach_pk_blooms(self, pk: str, files: dict[str, list[dict]]) -> None:
        """One distributed pass computing a per-file PK bloom (layout_col
        tables only; compaction/full-build path, never per epoch).  Bit
        positions come from seeded Spark xxhash64 (``bloom_position_cols``)
        so lookups hash identically without a Python xxhash port.  Files
        whose distinct-position count saturates the filter carry no bloom
        (kept by every lookup — correct, just unpruned)."""
        import numpy as np

        paths = [e["path"] for v in files.values() for e in v]
        if not paths:
            return
        rows = (
            self.spark.read.parquet(*paths)
            .select(
                F.input_file_name().alias("f"),
                F.explode(F.array(*bloom_position_cols(pk))).alias("p"),
            )
            .groupBy("f")
            .agg(F.collect_set("p").alias("ps"))
            .collect()
        )
        blooms = {}
        for r in rows:
            if len(r["ps"]) > BLOOM_M * BLOOM_SATURATION:
                continue
            bits = np.zeros(BLOOM_M // 8, dtype=np.uint8)
            idx = np.asarray(r["ps"], dtype=np.int64)
            np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
            blooms[_norm_path(r["f"])] = base64.b64encode(bits.tobytes()).decode()
        for v in files.values():
            for e in v:
                b = blooms.get(_norm_path(e["path"]))
                if b is not None:
                    e["pk_bloom"] = b
                    e["bloom_m"] = BLOOM_M

    def commit(
        self,
        new_files_by_bucket: dict[str, list[dict]],
        replaced_buckets: set[str] | None = None,
        summary: dict | None = None,
        expected_snapshot_id: int | None = None,
    ) -> Snapshot:
        """Publish a new snapshot.  Buckets in ``replaced_buckets`` take
        exactly the new file lists (compaction / full rewrite); all other
        new files are *appended* to their bucket (merge-on-read delta
        commit); untouched buckets carry over from the parent."""
        parent = self.current_snapshot()
        if expected_snapshot_id is not None and parent.snapshot_id != expected_snapshot_id:
            raise CommitConflict(
                f"expected parent {expected_snapshot_id}, found {parent.snapshot_id}"
            )
        replaced = replaced_buckets or set()
        files = {b: list(v) for b, v in parent.files.items() if b not in replaced}
        for b, v in new_files_by_bucket.items():
            if b in replaced:
                files[b] = list(v)
            else:
                files.setdefault(b, []).extend(v)
        snap = Snapshot(
            snapshot_id=parent.snapshot_id + 1,
            parent_id=parent.snapshot_id,
            schema_version=parent.schema_version,
            schemas=parent.schemas,
            files=files,
            num_buckets=parent.num_buckets,
            key_cols=parent.key_cols,
            version_col=parent.version_col,
            summary=summary or {},
            created_ms=int(time.time() * 1000),
            layout_col=parent.layout_col,
        )
        self._publish(snap)
        return snap

    # ------------------------------------------------------------- compaction

    def delete_where(
        self,
        predicate,
        summary: dict | None = None,
        expected_snapshot_id: int | None = None,
    ) -> dict:
        """Bulk retention purge: ONE fenced tombstone commit for every
        live row matching ``predicate`` (a Column over the logical
        schema) — the GDPR/domain-erasure/TTL path (delete all pages of
        a domain, or everything older than a cutoff).  No rewrite of
        surviving data: tombstones append as an ordinary delta epoch,
        reconciled by merge-on-read and folded away by the next
        compaction, and the snapshot-diff changelog classifies them as
        plain deletes — every downstream consumer (replica, derived
        index, materialized views incl. exact-extrema auxiliaries) then
        retracts the purged rows through its normal O(changed keys)
        sync/refresh, with no purge-specific code anywhere downstream.

        Tombstones keep their row's key AND current layout value, so on
        a layout-clustered table each lands in the bucket holding the
        row's live copy (relocated rows shadow correctly).  At 10^10-row
        scale the cost is one column-pruned predicate scan plus
        O(matched rows) tombstone writes — the reference's only
        equivalent is a full index rebuild without the rows
        (tis-index-builder).

        Scope: for tables whose downstream consumers follow the
        CHANGELOG (replicas, derived indexes, materialized views).  The
        wide-row star engine folds from the STREAM, not the changelog —
        purging a star CHILD table out-of-band would not re-aggregate
        the wide rows it feeds; route child deletions through the change
        stream as D events instead (purging the published WIDE table
        itself is fine).

        The purge does NOT consume a stream epoch id: its commit carries
        ``purge_rows``/``purge_commit`` but no ``epoch_id`` summary, so
        the ingest fence (``last_epoch_id``) is untouched and a stream
        whose (seq-derived) epoch numbering continues past the purge is
        never skipped.  Tombstones stamp ``_commit = last_epoch + 1`` —
        strictly above every committed epoch, so they shadow all prior
        writes; if the NEXT stream epoch reuses that commit value, the
        alive-over-dead tie-break resolves exactly right: rows that
        epoch re-writes survive (they are newer than the purge), rows it
        doesn't touch stay purged.

        Returns {"deleted_rows", "commit"}; a no-match purge commits
        nothing and returns commit None.  Fenced like every publish:
        raises :class:`CommitConflict` if another writer advanced the
        table after ``expected_snapshot_id`` (defaults to the snapshot
        the predicate was evaluated against)."""
        snap = self.current_snapshot()
        if expected_snapshot_id is None:
            expected_snapshot_id = snap.snapshot_id
        layout = self.layout_key(snap)
        keep = set(snap.key_cols) | {layout}
        victims = (
            self.read(snapshot_id=snap.snapshot_id)
            .filter(predicate)
            .select(
                *[
                    F.col(f.name)
                    if f.name in keep
                    else F.lit(None).cast(f.dataType).alias(f.name)
                    for f in snap.schema.fields
                ]
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            n = victims.count()
            if n == 0:
                return {"deleted_rows": 0, "commit": None}
            commit = (self.last_epoch_id() or 0) + 1
            stamped = (
                victims.withColumn(DEAD_COL, F.lit(True))
                .withColumn(COMMIT_COL, F.lit(commit).cast("long"))
                .withColumn("_bucket", self.bucket_expr())
            )
            self.commit(
                self.write_data_files(stamped, kind="delta"),
                summary={"purge_rows": n, "purge_commit": commit, **(summary or {})},
                expected_snapshot_id=expected_snapshot_id,
            )
            return {"deleted_rows": n, "commit": commit}
        finally:
            victims.unpersist()

    def compact_all(self, max_records_per_file: int = 0) -> Snapshot | None:
        """Snapshot-fenced compaction of every bucket — the maintenance
        recipe shared by the changelog consumers (materialized views,
        replicas, derived indexes): fold all accumulated deltas into
        fresh sorted bases, fenced on the snapshot observed here."""
        snap = self.current_snapshot()
        return self.compact(
            list(range(snap.num_buckets)),
            max_records_per_file=max_records_per_file,
            expected_snapshot_id=snap.snapshot_id,
        )

    def compact(
        self,
        buckets: list[int],
        summary: dict | None = None,
        max_records_per_file: int = 0,
        expected_snapshot_id: int | None = None,
    ) -> Snapshot | None:
        """Fold a bucket's deltas into a fresh base generation (keys unique,
        tombstones dropped, per-row _commit preserved so a concurrent
        time-travel read of the *new* snapshot is value-identical).  Sorted
        by key so each base file covers a tight disjoint key range — the
        zone maps recorded per file are what make point-lookup file pruning
        (read(key_set=...)) effective."""
        if not buckets:
            return None
        merged = self.read(buckets=buckets, with_internal=True)
        snap = self.current_snapshot()
        key = self.layout_key(snap)
        # One task per bucket: each bucket's base is a run of key-sorted
        # files with disjoint key ranges (tight zone maps) and the file
        # count stays O(buckets x rows/max_records_per_file).  At extreme
        # bucket sizes the in-bucket split would be range-partitioned for
        # parallelism; bucket-aligned tasks are the right default.
        bucketed = (
            merged.withColumn("_bucket", self.bucket_expr())
            .repartition(snap.num_buckets, F.col("_bucket"))
            .sortWithinPartitions("_bucket", key)
        )
        files = self.write_data_files(
            bucketed, kind="base", max_records_per_file=max_records_per_file
        )
        replaced = {str(b) for b in buckets}
        # a bucket whose rows were all tombstoned produces no file: still
        # replace it so the stale deltas are dropped from the snapshot.
        return self.commit(
            files,
            replaced_buckets=replaced,
            summary={"compaction": sorted(int(b) for b in replaced), **(summary or {})},
            expected_snapshot_id=expected_snapshot_id,
        )

    # ------------------------------------------------------------- expiration

    def expire_snapshots(self, keep_last: int = 10, dry_run: bool = False) -> dict:
        """Garbage-collect table history: drop snapshot log entries older
        than the newest ``keep_last`` and delete every data file no
        retained snapshot references (superseded base generations,
        compacted-away deltas, files from aborted commits).

        Without this a continuous ingest grows metadata and storage
        without bound — at 10^10 events the dominant disk cost is *dead*
        generations, not live rows (each compaction strands a full base).
        Mirrors Iceberg's expire_snapshots + remove_orphan_files pair
        collapsed into one maintenance call.

        Safety invariants:
        * the newest snapshot carrying an ``epoch_id`` summary is always
          retained, so the exactly-once fence (``last_epoch_id``) survives
          arbitrarily aggressive expiry;
        * must run from the single writer (C8 exec-lock), like compact():
          a concurrent uncommitted write's files would look orphaned.

        Time travel to an expired snapshot id raises FileNotFoundError
        afterwards (Iceberg semantics).  The same applies to ANY reader
        handle older than ``keep_last`` epochs, not just explicit time
        travel: a DataFrame built from read() resolves file paths at
        plan-build, so evaluating it after an inline expiry (e.g.
        ``expire_every_n_epochs``) has dropped its snapshot fails with
        FileNotFoundError — pick ``expire_keep_last`` with the longest
        reader lifetime in mind.  Returns an action report.
        """
        hist = self.history()
        retained_ids = {s.snapshot_id for s in hist[-max(keep_last, 1):]}
        # retain the newest carrier of each durable-state summary key the
        # ingest recovers from history (fence, reorder buffer, watermark)
        for key in ("epoch_id", "state_path", "horizon"):
            for s in reversed(hist):
                if key in s.summary:
                    retained_ids.add(s.snapshot_id)
                    break
        live = {
            _norm_path(e["path"])
            for s in hist
            if s.snapshot_id in retained_ids
            for v in s.files.values()
            for e in v
        }
        expired = [s.snapshot_id for s in hist if s.snapshot_id not in retained_ids]

        deleted_files, freed_bytes = 0, 0
        data_root = os.path.join(self.path, DATA_DIR)
        for dirpath, _, fns in os.walk(data_root):
            for fn in fns:
                if not fn.endswith(".parquet"):
                    continue
                p = os.path.join(dirpath, fn)
                if _norm_path(p) in live:
                    continue
                freed_bytes += os.path.getsize(p)
                deleted_files += 1
                if not dry_run:
                    os.unlink(p)
        # durable reorder-buffer state dirs (_state/ep_N, one per epoch):
        # only the retained snapshots' state_path values are recoverable —
        # the rest are dead weight growing with epoch count.
        live_state = {
            _norm_path(s.summary["state_path"])
            for s in hist
            if s.snapshot_id in retained_ids and s.summary.get("state_path")
        }
        deleted_state_dirs = 0
        state_root = os.path.join(self.path, "_state")
        if os.path.isdir(state_root):
            for d in sorted(os.listdir(state_root)):
                p = os.path.join(state_root, d)
                if os.path.isdir(p) and _norm_path(p) not in live_state:
                    deleted_state_dirs += 1
                    if not dry_run:
                        shutil.rmtree(p)

        if not dry_run:
            for sid in expired:
                os.unlink(self._log_path(sid))
            # sweep dead write dirs (data/snap-*/_bucket=*): a dir with no
            # live parquet left still holds Hadoop sidecars (.crc files,
            # _SUCCESS tokens) — drop those too, then the dir itself.
            for dirpath, _, _ in os.walk(data_root, topdown=False):
                if dirpath == data_root:
                    continue
                entries = os.listdir(dirpath)
                if any(e.endswith(".parquet") for e in entries):
                    continue
                for e in entries:
                    p = os.path.join(dirpath, e)
                    if os.path.isfile(p) and (
                        e.endswith(".crc") or e == "_SUCCESS" or e.startswith(".")
                    ):
                        os.unlink(p)
                if not os.listdir(dirpath):
                    os.rmdir(dirpath)
        return {
            "expired_snapshots": len(expired),
            "retained_snapshots": sorted(retained_ids),
            "deleted_files": deleted_files,
            "deleted_state_dirs": deleted_state_dirs,
            "freed_bytes": freed_bytes,
            "dry_run": dry_run,
        }

    # ------------------------------------------------------------- evolution

    def evolve_schema(
        self,
        new_schema: T.StructType,
        summary: dict | None = None,
        expected_snapshot_id: int | None = None,
    ) -> Snapshot:
        """Commit a schema change (add column / widen type). Existing data
        files are untouched; reads harmonize (cast/null-fill) lazily.

        Mirrors the reference's versioned schema snapshots
        (SchemaAction.java:330,967-1029 — every edit creates a new numbered
        snapshot) mapped onto table metadata instead of a console DB.
        """
        parent = self.current_snapshot()
        if expected_snapshot_id is not None and parent.snapshot_id != expected_snapshot_id:
            raise CommitConflict(
                f"expected parent {expected_snapshot_id}, found {parent.snapshot_id}"
            )
        old = parent.schema
        _validate_evolution(old, new_schema)
        ver = parent.schema_version + 1
        schemas = dict(parent.schemas)
        schemas[str(ver)] = new_schema.json()
        snap = Snapshot(
            snapshot_id=parent.snapshot_id + 1,
            parent_id=parent.snapshot_id,
            schema_version=ver,
            schemas=schemas,
            files=parent.files,
            num_buckets=parent.num_buckets,
            key_cols=parent.key_cols,
            version_col=parent.version_col,
            summary=summary or {},
            created_ms=int(time.time() * 1000),
            layout_col=parent.layout_col,
        )
        self._publish(snap)
        return snap


# Widening lattice per the reference (ColumnMetaData.java:207-239, DataX
# collapse :125-151): tinyint/smallint -> int -> long; float -> double;
# decimal -> double; date -> timestamp.
_WIDEN_OK: set[tuple[str, str]] = {
    ("byte", "short"),
    ("byte", "integer"),
    ("byte", "long"),
    ("short", "integer"),
    ("short", "long"),
    ("integer", "long"),
    ("float", "double"),
    ("decimal", "double"),
    ("date", "timestamp"),
}


def _validate_evolution(old: T.StructType, new: T.StructType) -> None:
    old_f = {f.name: f.dataType for f in old.fields}
    for f in new.fields:
        if f.name not in old_f:
            continue  # added columns are always fine
        src, dst = old_f[f.name], f.dataType
        if src == dst:
            continue
        if (src.typeName(), dst.typeName()) not in _WIDEN_OK:
            raise ValueError(f"illegal type change for {f.name}: {src} -> {dst}")
    dropped = set(old_f) - {f.name for f in new.fields}
    if dropped:
        raise ValueError(f"dropping columns not supported: {dropped}")
