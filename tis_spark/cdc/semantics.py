"""Pinned CDC semantics, shared verbatim by the engine and the oracle.

Each rule is the Spark-first re-expression of a reference behavior
(SURVEY.md §2.6; file:line cites are relative to /root/reference):

* **LWW + rectification** (V3/V5/V6, SingleDimensionsRowPack.isRecordDirty:43-58,
  BasicPojoConsumer.rectifiedVersion:220-233): applying events per key in
  seq order with stored version ``v``:
    - new_version >  v                      -> apply, v = new_version
    - v - new_version <= RECTIFY_BOUND      -> apply, v = v + RECTIFY_TICK
      (binlog-transport-delay tolerance: the *newer binlog event* wins
      despite the regressed timestamp, stamped one tick above stored)
    - otherwise                             -> drop as dirty
* **No-op suppression** (P5, DefaultTable.columnChange:60-74): an UPDATE
  whose before-image equals its after-image on every focused (content)
  column is dropped.
* **UPDATE invariant** (DefaultTable.validateTable:78-84): UPDATE without a
  before-image is invalid and dropped (counted).
* **Missing-target UPDATE** (V7, BasicPojoConsumer.java:100-128): an UPDATE
  for an absent key reconstructs the row from the after-image (MERGE
  WHEN NOT MATCHED THEN INSERT) and counts ``n_missing``.
* **ADD stickiness** (V4, SingleDimensionsRowPack.isNotDirtyAndPut:83-96):
  insert + updates coalesced within one batch surface as a single INSERT.
* **DELETE policy** (V8, BasicRMListener.java:228-230): the reference
  ignores deletes; policy is configurable ('ignore' matches the reference
  final state, 'delete' removes the row).
* **Partial images under schema evolution**: a column absent from the
  event's schema_version keeps the stored value; present columns overwrite
  (field-level merge, TisSolrInputDocument.merge2DocumentFields:157).
"""

from __future__ import annotations

from dataclasses import dataclass, field

RECTIFY_BOUND_S = 1800  # 30 min (BasicPojoConsumer.java:220-233)
RECTIFY_TICK_S = 1

# Content columns participate in no-op detection; the version column does not.
CONTENT_FIELDS = ["html", "lang", "fetch_status", "score"]
# First schema version in which each page field exists (FIXTURES.md F3).
FIELD_SINCE = {"url": 1, "warc_ts": 1, "html": 1, "lang": 1, "fetch_status": 2, "score": 4}

COUNTER_NAMES = [
    "n_events",
    "n_applied",
    "n_noop",
    "n_invalid",
    "n_dirty",
    "n_rectified",
    "n_missing",
    "n_deleted",
    "n_del_ignored",
    "n_del_missing",
    "n_sticky_insert",
]


@dataclass
class CdcConfig:
    key_col: str = "url"
    version_col: str = "warc_ts"
    delete_policy: str = "ignore"  # 'ignore' (reference default, V8) | 'delete'
    rectify_bound_s: int = RECTIFY_BOUND_S
    rectify_tick_s: int = RECTIFY_TICK_S
    upsert_missing: bool = True  # V7 reconstruct-on-missing
    disorder_window: int = 1000  # seq-watermark lag (reference 20 s window, V2)
    table_focus: tuple[str, ...] = ("pages",)  # P6
    num_buckets: int = 16
    fold_parallelism: int = 128  # hash groups for the per-key fold
    compact_threshold: int = 8  # delta files per bucket before compaction
    # Restrict the stored-row side of the fold to the batch's keys with a
    # semi-join before the fold shuffle.  Essential once the table dwarfs
    # the micro-batch (stored side becomes O(batch), not O(table)); at
    # table ≈ batch scale it only adds a light-column shuffle.
    restrict_stored: bool = True
    # Zone-map file pruning for the stored-row lookup: when the batch's
    # estimated distinct-key count is at or below lookup_keys_max, collect
    # the keys and prune base files whose [key_min, key_max] zone contains
    # none of them.  Sorted compacted bases give files tight disjoint key
    # ranges, so once the table outgrows the batch the per-epoch scan cost
    # is O(batch_keys x file_granularity), independent of table size —
    # without it every touched bucket's base is re-read in full each epoch
    # (the O(table) scan that dominates at 10^10 rows).  0 disables.
    lookup_keys_max: int = 100_000
    # Compaction write granularity (rows per base file; 0 = one file per
    # bucket write task).  Smaller files = finer zone-map pruning at the
    # cost of more files; size it so file_rows x batch_keys ≈ the scan
    # budget per epoch.
    compact_max_records_per_file: int = 0
    fold_mode: str = "hybrid"  # 'hybrid' (Catalyst singles + pandas multis) | 'pandas'
    # Sink retry policy (reference C5 parity, BasicPojoConsumer.java:190-194:
    # 3 retries x 5 s on sink error): transient commit failures retry with
    # backoff; retry counts surface in the commit summary lineage.
    commit_retries: int = 3
    commit_retry_backoff_s: float = 5.0
    # Periodic lake GC (snapshot expiry + orphan-file delete, see
    # LakeTable.expire_snapshots): every N epochs, keep the newest
    # expire_keep_last snapshots (recovery-state carriers always survive).
    # 0 disables (default: history retained for time travel / audits).
    expire_every_n_epochs: int = 0
    expire_keep_last: int = 10
    # Rate limiting (reference C1, RateLimiter 200/600 ev/s ceiling,
    # BasicRMListener.java:171-173): cap admitted events per epoch; excess
    # stays in the durable reorder buffer for later epochs.  seq is a dense
    # global sequence, so capping the admission horizon caps the count.
    # 0 = unlimited; drain (final_flush) ignores the cap (C7 semantics).
    max_events_per_epoch: int = 0
    counters: list[str] = field(default_factory=lambda: list(COUNTER_NAMES))


def fold_key_events(
    stored: dict | None,
    events: list[dict],
    cfg: CdcConfig,
) -> tuple[dict | None, str, dict]:
    """Sequentially fold one key's events (already seq-sorted) over the
    stored row.  Returns (final_row | None, action, counters) where action
    is 'U' (upsert), 'D' (delete) or 'N' (no change).

    ``stored`` / event images are dicts of page fields; versions are
    epoch-microsecond ints (tz handled by callers).  This single function is
    the semantic core — the Spark fold and the pure-Python oracle both call
    it, so they cannot drift apart.

    The returned row carries ``_seq`` = the seq of the last event that
    modified it (None when events carry no seq, e.g. the oracle).  The
    engine uses it to re-join the winning event's payload columns (html,
    lang — present in every schema version, hence always taken from the
    last applied event) without moving payload bytes through the fold.
    """
    bound_us = cfg.rectify_bound_s * 1_000_000
    tick_us = cfg.rectify_tick_s * 1_000_000
    c = dict.fromkeys(COUNTER_NAMES, 0)
    existed = stored is not None
    exists = existed
    row = dict(stored) if stored else None
    version = row["warc_ts"] if row else None
    applied_any = False
    first_applied_was_insert = False

    for e in events:
        c["n_events"] += 1
        op = e["op"]
        if op in ("I", "U"):
            # invalid covers: U without before-image, and I/U with a null
            # version (after.warc_ts) — both dropped and counted, so the
            # sequential, vectorized, and Catalyst paths agree on bad input.
            if e.get("invalid") or e["after"]["warc_ts"] is None:
                c["n_invalid"] += 1
                continue
            if op == "U" and e.get("noop"):
                c["n_noop"] += 1
                continue
            after = e["after"]
            sv = e["schema_version"]
            v_new = after["warc_ts"]
            if not exists:
                if op == "U":
                    if not cfg.upsert_missing:
                        c["n_missing"] += 1
                        continue
                    c["n_missing"] += 1
                row = {"url": e["url"], "warc_ts": v_new}
                for f in CONTENT_FIELDS:
                    row[f] = after[f] if FIELD_SINCE[f] <= sv else None
                row["_seq"] = e.get("seq")
                version = v_new
                exists = True
                if not applied_any:
                    first_applied_was_insert = True
                applied_any = True
                c["n_applied"] += 1
            else:
                if v_new > version:
                    version = v_new
                elif version - v_new <= bound_us:
                    version = version + tick_us
                    c["n_rectified"] += 1
                else:
                    c["n_dirty"] += 1
                    continue
                for f in CONTENT_FIELDS:
                    if FIELD_SINCE[f] <= sv:
                        row[f] = after[f]
                row["warc_ts"] = version
                row["_seq"] = e.get("seq")
                applied_any = True
                c["n_applied"] += 1
        elif op == "D":
            if cfg.delete_policy == "ignore":
                c["n_del_ignored"] += 1
                continue
            if exists:
                exists = False
                row = None
                version = None
                applied_any = True
                c["n_deleted"] += 1
            else:
                c["n_del_missing"] += 1
        # DDL events never reach the fold (handled by the registry).

    if exists:
        if not applied_any:
            return row, "N", c
        if not existed and first_applied_was_insert:
            c["n_sticky_insert"] += 1
        row["warc_ts"] = version
        return row, "U", c
    if existed:
        return None, "D", c
    return None, "N", c
