"""Bucket-wise merge-on-read MERGE INTO the lake table.

Execution shape (all set-oriented — nothing per-row crosses to Python
except the Arrow-batched fold and text extraction):

1. Flatten + predicate-filter the change batch JVM-side (fold.py).
2. **Bucket pruning**: only buckets containing changed keys are scanned
   for the stored-row lookup — and the lookup reads scalars only
   (version + post-v1 fields), so parquet column pruning drops the html
   payloads from the scan.
3. **Payload-free fold**: one row per key decides the action and the
   winning event (``last_seq``); the winner's payload (html, lang) is
   then fetched with a seq-equi-join against the batch — payload bytes
   move through exactly one shuffle, once, and never through Python
   (text extraction is the one vectorized pandas UDF, per input_hint).
4. **Append, don't rewrite**: the folded upserts/tombstones are written
   as *delta* files stamped with the epoch id; untouched data is never
   copied.  Write amplification per epoch is O(batch), not O(table).
   Reads reconcile base+deltas (LakeTable.read) and compaction folds
   deltas back periodically.

This replaces the reference's per-row fetch-merge-write RPC loop
(BasicPojoConsumer.java:84-205) with one distributed merge per micro-batch;
the version predicate semantics (V3/V5/V6) live in semantics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark import StorageLevel

from tis_spark.cdc.fold import fold_changes, flatten_changes
from tis_spark.cdc.semantics import COUNTER_NAMES, CdcConfig
from tis_spark.functions.text import extract_text_udf
from tis_spark.lake.table import COMMIT_COL, DEAD_COL, LakeTable

#: below this many base files a key-pruned read cannot beat the scan
PRUNE_MIN_FILES = 64


def merge_into(
    spark: SparkSession,
    table: LakeTable,
    changes: DataFrame,
    epoch_id: int,
    cfg: CdcConfig,
    touched: list[int] | None = None,
    n_keys_est: int | None = None,
) -> tuple[dict[str, list[dict]], list[dict]]:
    """Apply a change batch as a delta commit. Returns
    (new_files_by_bucket, per-bucket lineage/metric rows). The caller
    commits.  ``n_keys_est`` (approx distinct keys in the batch, computed
    by the caller's existing batch aggregate) gates zone-map file pruning
    of the stored-row lookup."""
    snap = table.current_snapshot()
    bucket = table.bucket_expr()
    flat = flatten_changes(changes, cfg)

    if touched is None:
        touched = sorted(
            r[0] for r in flat.select(bucket.alias("_bucket")).distinct().collect()
        )
    if not touched:
        return {}, []

    # Zone-map pruning of the stored scan: for trigger-sized batches
    # (estimated keys <= lookup_keys_max) collect the key set and skip
    # every base file whose key range can't contain one.  With key-sorted
    # compacted bases this makes the per-epoch scan O(batch_keys x
    # file_rows) regardless of table size; for huge batches (keys >
    # threshold) the scan is amortized over the batch instead.  Small
    # tables (under PRUNE_MIN_FILES base files, known from snapshot
    # metadata for free) skip pruning entirely — there the bounded key
    # collect costs more than the whole scan.
    n_base = sum(
        1
        for entries in snap.files.values()
        for e in entries
        if e.get("kind", "base") == "base"
    )
    key_set = None
    if (
        cfg.restrict_stored
        and cfg.lookup_keys_max
        and n_base >= PRUNE_MIN_FILES
        and n_keys_est is not None
        and n_keys_est <= cfg.lookup_keys_max
    ):
        key_set: dict[str, list] = {}
        for r in flat.select(bucket.alias("_b"), "url").distinct().collect():
            key_set.setdefault(str(r["_b"]), []).append(r["url"])
    existing = table.read(buckets=touched, key_set=key_set)
    if cfg.restrict_stored:
        # Stored side becomes O(batch): only keys actually present in the
        # batch survive into the fold shuffle.  At 10^10-event scale the
        # table dwarfs any micro-batch — without this the fold would
        # shuffle every touched bucket in full.  (Also makes the zone-map
        # superset projection exact.)
        existing = existing.join(flat.select("url").distinct(), "url", "left_semi")
    cur_fields = {f.name for f in snap.schema.fields}
    stored = existing.select(
        "url",
        F.unix_micros(F.col("warc_ts")).alias("s_warc_ts_us"),
        (
            F.col("fetch_status").cast("long")
            if "fetch_status" in cur_fields
            else F.lit(None).cast("long")
        ).alias("s_fetch_status"),
        (
            F.col("score").cast("double") if "score" in cur_fields else F.lit(None).cast("double")
        ).alias("s_score"),
    )

    # stored/flat fan out into several plan branches; ReusedExchange
    # dedupes their shuffles, and caching them measures slower than the
    # re-execution it avoids.  Only the (tiny) fold output is cached.
    folded = fold_changes(flat, stored, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # One pass: per-bucket lineage/metrics (reference C6 counters,
        # SURVEY §2.8) including the effective-change count.
        metrics_rows = [
            r.asDict()
            for r in (
                folded.groupBy(bucket.alias("bucket"))
                .agg(
                    *[F.sum(c).alias(c) for c in COUNTER_NAMES],
                    F.min("min_seq").alias("min_seq"),
                    F.max("max_seq").alias("max_seq"),
                    F.count("*").alias("n_keys"),
                    F.sum((F.col("action") != "N").cast("long")).alias("n_effective"),
                )
                .collect()
            )
        ]
        if not any(m["n_effective"] for m in metrics_rows):
            return {}, metrics_rows

        # Winner payloads: html/lang exist in every schema version, so they
        # always come from the last applied event — a seq equi-join, the
        # only place page payloads move.  The payload side is deduplicated
        # on seq first: an at-least-once redelivery would otherwise fan out
        # the inner join and write duplicated delta rows per (url, _commit),
        # inflating delta files and leaning on arbitrary tie-breaking at
        # read time.  The dedup aggregate shares the join's hash exchange.
        payload = flat.select(
            F.col("seq").alias("last_seq"), F.col("a_html"), F.col("a_lang")
        ).dropDuplicates(["last_seq"])
        upserts = (
            folded.filter(F.col("action") == "U")
            .join(payload, "last_seq")
            .select(
                F.col("url"),
                F.timestamp_micros(F.col("warc_ts_us")).alias("warc_ts"),
                F.col("a_html").alias("html"),
                extract_text_udf(F.col("a_html")).alias("text"),
                F.col("a_lang").alias("lang"),
                *[
                    (
                        F.col(fld.name).cast(fld.dataType)
                        if fld.name in ("fetch_status", "score")
                        else F.lit(None).cast(fld.dataType)
                    ).alias(fld.name)
                    for fld in snap.schema.fields
                    if fld.name not in ("url", "warc_ts", "html", "text", "lang")
                ],
                F.lit(epoch_id).cast("long").alias(COMMIT_COL),
                F.lit(False).alias(DEAD_COL),
            )
        )
        tombstones = folded.filter(F.col("action") == "D").select(
            F.col("url"),
            *[
                F.lit(None).cast(fld.dataType).alias(fld.name)
                for fld in snap.schema.fields
                if fld.name != "url"
            ],
            F.lit(epoch_id).cast("long").alias(COMMIT_COL),
            F.lit(True).alias(DEAD_COL),
        )
        # Align write tasks with buckets so each epoch emits O(num_buckets)
        # delta files, not O(fold_parallelism × num_buckets) — small-file
        # control is what keeps the merge-on-read read fan-in bounded.
        delta = (
            upserts.unionByName(tombstones)
            .withColumn("_bucket", bucket)
            .repartition(snap.num_buckets, F.col("_bucket"))
        )
        files = table.write_data_files(delta, kind="delta")
        return files, metrics_rows
    finally:
        folded.unpersist()
