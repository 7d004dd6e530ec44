"""Driver-checkable CDC-engine replay (the flagship path, hash-verified).

``cdc_engine_fold_events`` derives a binlog-shaped change stream from the
driver's ``events`` table (pure column expressions, no randomness), replays
it through the REAL engine — ``CdcIngest``: durable seq-watermark reorder
buffer, per-key LWW fold, winner-payload join, epoch-fenced delta commits,
merge-on-read final read — and returns the final table state.  The DuckDB
oracle folds the identical derived stream with window functions, which is
exact because the construction pins every data-dependent semantic branch:

* versions (``warc_ts``) are strictly increasing in ``seq`` per key, so
  LWW reduces to last-event-wins and rectification (V6) / dirty-drop (V3)
  never fire;
* every event carries a before-image whose ``lang`` differs from the
  after-image, so the U-invariant (validateTable) and no-op suppression
  (P5, DefaultTable.columnChange) never drop an event;
* deletes map to the reference's ignore policy (V8,
  BasicRMListener.java:228-230), so 'error' events are no-ops;
* a key whose first event is an UPDATE takes the missing-target upsert
  path (V7) — same final row as an insert.

A green hash therefore proves the whole engine pipeline (reorder, fold,
payload join incl. the Arrow-batched text extraction, bucketed delta
write, MOR read) lands on exactly the sequential-LWW answer — the driver
row the stateful flagship previously lacked (it was pinned only by pytest
oracles).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tis_spark.operators import load, query

BASE_S = 1_704_067_200  # 2024-01-01T00:00:00Z, the version-clock origin


def derived_changes(
    spark: SparkSession, sf_dir: str, with_status: bool = False
) -> DataFrame:
    """events table -> CHANGE_SCHEMA stream: seq = event_id + 1 (dense),
    key = 'u'||user_id, op from event_type, version = origin + seq seconds
    (strictly monotone), html = a <title> token so the extracted text is a
    closed-form string both engines can compute.  ``with_status=True``
    additionally stamps the after image's ``fetch_status`` with the
    closed-form ``seq % 997`` (callers that aggregate a numeric column —
    the variance view — use it; the default stream keeps it null so every
    pre-existing oracle stays byte-identical)."""
    ev = load(spark, sf_dir, "events")
    seq = (F.col("event_id") + 1).cast("long")
    url = F.concat(F.lit("u"), F.col("user_id").cast("string"))
    version = F.timestamp_seconds(F.lit(BASE_S) + seq)
    token = F.concat(F.lit("pg_"), url, F.lit("_"), seq.cast("string"))
    status = (seq % 997) if with_status else F.lit(None).cast("long")
    after = F.struct(
        url.alias("url"),
        version.alias("warc_ts"),
        F.encode(F.concat(F.lit("<title>"), token, F.lit("</title>")), "UTF-8").alias("html"),
        F.col("event_type").alias("lang"),
        status.cast("long").alias("fetch_status"),
        F.lit(None).cast("double").alias("score"),
    )
    before = F.struct(
        url.alias("url"),
        version.alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.lit("_prev").alias("lang"),  # != any event_type => never a no-op
        F.lit(None).cast("long").alias("fetch_status"),
        F.lit(None).cast("double").alias("score"),
    )
    return ev.select(
        seq.alias("seq"),
        seq.alias("delivery_key"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        version.alias("ts_ms"),
        F.lit("pages").alias("table"),
        F.lit(2 if with_status else 1).cast("int").alias("schema_version"),
        F.lit(None).cast("string").alias("ddl"),
        before.alias("before"),
        after.alias("after"),
        (seq % 1_000_000).cast("int").alias("epoch_hint"),
    )


@query(
    "cdc_engine_fold_events",
    f"""
    WITH ch AS (
      SELECT event_id + 1 AS seq,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error' THEN 'D'
                  ELSE 'U' END AS op,
             'u' || CAST(user_id AS VARCHAR) AS url,
             event_type
      FROM events
    ),
    win AS (
      SELECT url, seq, event_type,
             row_number() OVER (PARTITION BY url ORDER BY seq DESC) AS rn
      FROM ch WHERE op <> 'D'
    )
    SELECT url,
           ({BASE_S} + seq) * 1000000 AS warc_ts_us,
           'pg_' || url || '_' || CAST(seq AS VARCHAR) AS text,
           event_type AS lang
    FROM win WHERE rn = 1
    """,
)
def cdc_engine_fold_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tis_spark.cdc import CdcConfig, CdcIngest

    table_dir = tempfile.mkdtemp(prefix="tis-cdcfold-")
    changes = derived_changes(spark, sf_dir)
    cfg = CdcConfig(disorder_window=64, fold_parallelism=32, num_buckets=16)
    ingest = CdcIngest(spark, table_dir, cfg)
    ingest.replay(changes, epoch_size=2500)
    return ingest.final_state().select(
        "url",
        F.unix_micros("warc_ts").alias("warc_ts_us"),
        "text",
        "lang",
    )


@query(
    "matview_group_rollup",
    f"""
    WITH ch AS (
      SELECT event_id + 1 AS seq,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error' THEN 'D'
                  ELSE 'U' END AS op,
             'u' || CAST(user_id AS VARCHAR) AS url,
             event_type
      FROM events
    ),
    win AS (
      SELECT url, seq, event_type,
             row_number() OVER (PARTITION BY url ORDER BY seq DESC) AS rn
      FROM ch WHERE op <> 'D'
    ),
    state AS (
      SELECT url, ({BASE_S} + seq) * 1000000 AS warc_ts_us, event_type AS lang
      FROM win WHERE rn = 1
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_pages,
           CAST(min(warc_ts_us) AS BIGINT) AS min_ts_us,
           CAST(max(warc_ts_us) AS BIGINT) AS max_ts_us
    FROM state GROUP BY lang
    """,
)
def matview_group_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained materialized aggregate, driver-checkable:
    replay the FIRST HALF of the derived stream through the real engine,
    full-build a per-lang materialized view (count/min/max over the page
    versions), replay the SECOND HALF, then catch the view up with ONE
    changelog refresh (lake/matview.py — preimage CDF, signed deltas,
    retraction recompute).  Because each key's lang is its LAST event_type,
    second-half updates constantly move keys between lang groups, so the
    refresh exercises retractions, not just gains.  A green hash proves the
    incremental view lands on exactly the aggregate of the final folded
    state — which is what the DuckDB oracle computes directly.

    Reference contrast: TIS rebuilds derived artifacts with full passes
    (tis-index-builder IndexSwapTaskFlowLauncher.java); here the refresh
    reads O(second-half keys) change rows, never the table.
    """
    from tis_spark.cdc import CdcConfig, CdcIngest
    from tis_spark.lake.matview import MaterializedView

    table_dir = tempfile.mkdtemp(prefix="tis-mvq-")
    changes = derived_changes(spark, sf_dir)
    max_seq = changes.agg(F.max("seq")).first()[0]
    # replay() derives epoch ids from seq // epoch_size, so the split must
    # sit ON an epoch boundary — otherwise the second replay re-delivers
    # the straddling epoch and exactly-once fencing (correctly) drops it.
    # Epoch size scales with the stream (~8 epochs end-to-end): per-epoch
    # fixed cost (planning + commit) would otherwise dominate at sf0.1.
    ep = 500 if max_seq < 5000 else 2500 * max(1, max_seq // 20000)
    half = ep * max(1, max_seq // (2 * ep))
    cfg = CdcConfig(disorder_window=64, fold_parallelism=32, num_buckets=16)
    ingest = CdcIngest(spark, table_dir, cfg)
    # replay epochs are [e*ep, (e+1)*ep): split strictly below/at-or-above
    ingest.replay(changes.filter(F.col("seq") < half), epoch_size=ep)
    mv = MaterializedView.create(
        spark,
        table_dir + "_mv",
        ingest.table,
        ["lang"],
        {"n_pages": ("count", None), "min_ts": ("min", "warc_ts"), "max_ts": ("max", "warc_ts")},
    )
    mv.full_build()
    ingest.replay(changes.filter(F.col("seq") >= half), epoch_size=ep)
    mv.refresh()
    return mv.read().select(
        "lang",
        F.col("n_pages").cast("long").alias("n_pages"),
        F.unix_micros("min_ts").alias("min_ts_us"),
        F.unix_micros("max_ts").alias("max_ts_us"),
    )


@query(
    "replica_incremental_sync",
    f"""
    WITH ch AS (
      SELECT event_id + 1 AS seq,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error' THEN 'D'
                  ELSE 'U' END AS op,
             'u' || CAST(user_id AS VARCHAR) AS url,
             event_type
      FROM events
    ),
    win AS (
      SELECT url, seq, event_type,
             row_number() OVER (PARTITION BY url ORDER BY seq DESC) AS rn
      FROM ch WHERE op <> 'D'
    )
    SELECT url,
           ({BASE_S} + seq) * 1000000 AS warc_ts_us,
           event_type AS lang
    FROM win WHERE rn = 1
    """,
)
def replica_incremental_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table->table replication over the changelog, driver-checkable
    (lake/replica.py): replay the FIRST HALF of the derived stream through
    the real engine, bootstrap a replica table from that snapshot, replay
    the SECOND HALF (updates, deletes, group-churning lang moves), then
    catch the replica up with ONE ``classify=False`` changelog sync —
    O(second-half keys), never a re-read of the source table.  A green
    hash proves the replica's merge-on-read state equals the sequential
    LWW fold of the full stream, which the DuckDB oracle computes
    directly.

    Reference contrast: the index backflow ships every build by copying
    the whole artifact (IndexBackFlowInterceptor,
    IndexBackflowManager.java); here the sync ships exactly the changed
    keys — the 100 TB replication story.
    """
    from tis_spark.cdc import CdcConfig, CdcIngest
    from tis_spark.lake.replica import TableReplica

    table_dir = tempfile.mkdtemp(prefix="tis-replq-")
    changes = derived_changes(spark, sf_dir)
    max_seq = changes.agg(F.max("seq")).first()[0]
    ep = 500 if max_seq < 5000 else 2500 * max(1, max_seq // 20000)
    half = ep * max(1, max_seq // (2 * ep))
    cfg = CdcConfig(disorder_window=64, fold_parallelism=32, num_buckets=16)
    ingest = CdcIngest(spark, table_dir, cfg)
    ingest.replay(changes.filter(F.col("seq") < half), epoch_size=ep)
    rep = TableReplica.create(spark, table_dir + "_rep", ingest.table)
    rep.bootstrap()
    ingest.replay(changes.filter(F.col("seq") >= half), epoch_size=ep)
    rep.sync()
    return rep.read().select(
        "url",
        F.unix_micros("warc_ts").alias("warc_ts_us"),
        "lang",
    )


@query(
    "retention_purge_cascade",
    f"""
    WITH ch AS (
      SELECT event_id + 1 AS seq,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error' THEN 'D'
                  ELSE 'U' END AS op,
             'u' || CAST(user_id AS VARCHAR) AS url,
             event_type
      FROM events
    ),
    win AS (
      SELECT url, seq, event_type,
             row_number() OVER (PARTITION BY url ORDER BY seq DESC) AS rn
      FROM ch WHERE op <> 'D'
    )
    SELECT url,
           ({BASE_S} + seq) * 1000000 AS warc_ts_us,
           event_type AS lang
    FROM win WHERE rn = 1 AND event_type <> 'signup'
    """,
)
def retention_purge_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk retention purge cascading through the changelog, driver-
    checkable: replay the first half of the derived stream through the
    real engine, bootstrap a replica, replay the second half and sync —
    then ``LakeTable.delete_where(lang == 'signup')`` tombstones every
    matching page in ONE fenced commit (the GDPR/domain-erasure path,
    lake/table.py), and a final ordinary ``sync()`` carries the purge to
    the replica as plain changelog deletes: no purge-specific code
    anywhere downstream, O(purged keys) work end-to-end.  A green hash
    proves the replica equals the sequential LWW fold minus the purged
    rows — which the DuckDB oracle computes directly.

    Reference contrast: removing a slice of the corpus in TIS means a
    full rebuild without those rows (tis-index-builder) plus a whole-
    artifact backflow copy; here it is one tombstone epoch plus each
    consumer's incremental catch-up.
    """
    from tis_spark.cdc import CdcConfig, CdcIngest
    from tis_spark.lake.replica import TableReplica

    table_dir = tempfile.mkdtemp(prefix="tis-purgeq-")
    changes = derived_changes(spark, sf_dir)
    max_seq = changes.agg(F.max("seq")).first()[0]
    ep = 500 if max_seq < 5000 else 2500 * max(1, max_seq // 20000)
    half = ep * max(1, max_seq // (2 * ep))
    cfg = CdcConfig(disorder_window=64, fold_parallelism=32, num_buckets=16)
    ingest = CdcIngest(spark, table_dir, cfg)
    ingest.replay(changes.filter(F.col("seq") < half), epoch_size=ep)
    rep = TableReplica.create(spark, table_dir + "_rep", ingest.table)
    rep.bootstrap()
    ingest.replay(changes.filter(F.col("seq") >= half), epoch_size=ep)
    rep.sync()
    out = ingest.table.delete_where(F.col("lang") == "signup")
    assert out["deleted_rows"] > 0, out
    rep.sync()
    return rep.read().select(
        "url",
        F.unix_micros("warc_ts").alias("warc_ts_us"),
        "lang",
    )


@query(
    "matview_approx_distinct",
    f"""
    WITH ch AS (
      SELECT event_id + 1 AS seq,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error' THEN 'D'
                  ELSE 'U' END AS op,
             'u' || CAST(user_id AS VARCHAR) AS url,
             event_type
      FROM events
    ),
    win AS (
      SELECT url, seq, event_type,
             row_number() OVER (PARTITION BY url ORDER BY seq DESC) AS rn
      FROM ch WHERE op <> 'D'
    ),
    state AS (
      SELECT url, event_type AS lang,
             'pg_' || url || '_' || CAST(seq AS VARCHAR) AS text
      FROM win WHERE rn = 1
    ),
    hashes AS (SELECT DISTINCT lang, md5('kmv:' || text) AS h FROM state),
    ranked AS (
      SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rk
      FROM hashes
    ),
    sk AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS sketch_n,
             max(CASE WHEN rk = 8 THEN h END) AS h8
      FROM ranked WHERE rk <= 8 GROUP BY lang
    ),
    cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_pages FROM state GROUP BY lang)
    SELECT c.lang, c.n_pages, s.sketch_n,
           CAST(CASE WHEN s.sketch_n < 8 THEN s.sketch_n
                ELSE 8070450532247928832 // CAST(('0x' || substr(s.h8, 1, 15)) AS BIGINT)
           END AS BIGINT) AS uniq_est
    FROM cnt c JOIN sk s USING (lang)
    """,
)
def matview_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained approx-distinct view, driver-checkable:
    replay the FIRST HALF of the derived stream through the real engine,
    full-build a per-lang view {count, approx_distinct(text)} with a
    k=8 KMV sketch (lake/matview.py — gains merge min-k exactly, a
    retraction recomputes the group's sketch through the restricted
    read), replay the SECOND HALF, catch up with ONE changelog refresh.
    The min-k sketch is an order statistic, so the maintained state is
    bit-identical to a sketch over the final folded rows — which is what
    the DuckDB oracle builds directly with a hash-rank window.  The
    estimate is derived with pure int64 arithmetic ((k-1)*16^15 DIV
    first-15-hex-digits-of-kth-hash — 7*16^15 < 2^63), so both engines
    tie exactly; groups below k report the exact distinct count.

    Reference contrast: TIS exposes cardinality only via full Solr
    faceting over the rebuilt index (tis-index-builder); here the sketch
    rides the view's O(changed keys) refresh.
    """
    from tis_spark.cdc import CdcConfig, CdcIngest
    from tis_spark.lake.matview import MaterializedView

    table_dir = tempfile.mkdtemp(prefix="tis-mvkmv-")
    changes = derived_changes(spark, sf_dir)
    max_seq = changes.agg(F.max("seq")).first()[0]
    ep = 500 if max_seq < 5000 else 2500 * max(1, max_seq // 20000)
    half = ep * max(1, max_seq // (2 * ep))
    cfg = CdcConfig(disorder_window=64, fold_parallelism=32, num_buckets=16)
    ingest = CdcIngest(spark, table_dir, cfg)
    ingest.replay(changes.filter(F.col("seq") < half), epoch_size=ep)
    mv = MaterializedView.create(
        spark,
        table_dir + "_mv",
        ingest.table,
        ["lang"],
        {"n_pages": ("count", None), "uniq_texts": ("approx_distinct", "text")},
        kmv_k=8,
    )
    mv.full_build()
    ingest.replay(changes.filter(F.col("seq") >= half), epoch_size=ep)
    mv.refresh()
    sz = F.size("uniq_texts")
    est = F.when(sz < 8, sz.cast("long")).otherwise(
        F.expr(
            "CAST(8070450532247928832 DIV CAST(conv(substring("
            "element_at(uniq_texts, 8), 1, 15), 16, 10) AS BIGINT) AS BIGINT)"
        )
    )
    return mv.read(with_internal=True).select(
        "lang",
        F.col("n_pages").cast("long").alias("n_pages"),
        sz.cast("long").alias("sketch_n"),
        est.alias("uniq_est"),
    )


@query(
    "matview_exact_extrema",
    f"""
    WITH ch AS (
      SELECT event_id + 1 AS seq,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error' THEN 'D'
                  ELSE 'U' END AS op,
             'u' || CAST(user_id AS VARCHAR) AS url,
             event_type
      FROM events
    ),
    win AS (
      SELECT url, seq, event_type,
             row_number() OVER (PARTITION BY url ORDER BY seq DESC) AS rn
      FROM ch WHERE op <> 'D'
    ),
    state AS (
      SELECT url, ({BASE_S} + seq) * 1000000 AS warc_ts_us, event_type AS lang
      FROM win WHERE rn = 1
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_pages,
           CAST(min(warc_ts_us) AS BIGINT) AS min_ts_us,
           CAST(max(warc_ts_us) AS BIGINT) AS max_ts_us,
           CAST(count(DISTINCT warc_ts_us) AS BIGINT) AS n_versions
    FROM state GROUP BY lang
    """,
)
def matview_exact_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-extrema (IVM multiset) maintained view, driver-checkable:
    same half-replay protocol as ``matview_group_rollup``, but the view is
    created with ``exact_extrema=True``, so every second-half retraction
    (each update moves its key's lang group) recomputes min/max from the
    per-(lang, warc_ts) multiset auxiliary — a group-clustered, file-pruned
    lake read — and the SOURCE is never rescanned
    (``MaterializedView._recompute_read`` is structurally unreachable,
    pinned by tests/test_matview.py).  ``n_versions`` counts the live
    multiset rows per group, proving the auxiliary's own maintained state
    against DuckDB's count(DISTINCT): timestamps are unique per key here,
    so the multiset cardinality is directly checkable.  A green hash
    therefore verifies BOTH the view outputs and the auxiliary they were
    derived from.

    Reference contrast: TIS rebuilds derived artifacts with full passes
    (tis-index-builder IndexSwapTaskFlowLauncher.java); the multiset is
    what makes min/max-under-deletion O(changed keys) at 100 TB.
    """
    from tis_spark.cdc import CdcConfig, CdcIngest
    from tis_spark.lake.matview import AUX_N_COL, MaterializedView

    table_dir = tempfile.mkdtemp(prefix="tis-mvxq-")
    changes = derived_changes(spark, sf_dir)
    max_seq = changes.agg(F.max("seq")).first()[0]
    ep = 500 if max_seq < 5000 else 2500 * max(1, max_seq // 20000)
    half = ep * max(1, max_seq // (2 * ep))
    cfg = CdcConfig(disorder_window=64, fold_parallelism=32, num_buckets=16)
    ingest = CdcIngest(spark, table_dir, cfg)
    ingest.replay(changes.filter(F.col("seq") < half), epoch_size=ep)
    mv = MaterializedView.create(
        spark,
        table_dir + "_mv",
        ingest.table,
        ["lang"],
        {"n_pages": ("count", None), "min_ts": ("min", "warc_ts"), "max_ts": ("max", "warc_ts")},
        exact_extrema=True,
    )
    mv.full_build()
    ingest.replay(changes.filter(F.col("seq") >= half), epoch_size=ep)
    mv.refresh()
    view = mv.read().select(
        "lang",
        F.col("n_pages").cast("long").alias("n_pages"),
        F.unix_micros("min_ts").alias("min_ts_us"),
        F.unix_micros("max_ts").alias("max_ts_us"),
    )
    aux_counts = (
        mv.aux["warc_ts"]
        .read()
        .filter(F.col(AUX_N_COL) > 0)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_versions"))
    )
    return view.join(aux_counts, "lang")


def status_stream(spark: SparkSession, sf_dir: str, mod: int | None = None) -> DataFrame:
    """The with-status derived stream prefixed by a seq-0 DDL event: the
    engine's table starts at PAGES_SCHEMA_V1 (no fetch_status), so the
    DDL adds it through the real evolution path (registry.apply_ddl)
    before any data row folds.  ``mod`` optionally compresses the status
    domain (fetch_status % mod) for queries that need repeating values."""
    changes = derived_changes(spark, sf_dir, with_status=True)
    if mod is not None:
        changes = changes.withColumn(
            "after",
            F.col("after").withField("fetch_status", F.col("after.fetch_status") % mod),
        )
    st = changes.schema["before"].dataType
    ddl_row = spark.range(1).select(
        F.lit(0).cast("long").alias("seq"),
        F.lit(0).cast("long").alias("delivery_key"),
        F.lit("DDL").alias("op"),
        F.timestamp_seconds(F.lit(BASE_S)).alias("ts_ms"),
        F.lit("pages").alias("table"),
        F.lit(2).cast("int").alias("schema_version"),
        F.lit("ADD COLUMN fetch_status bigint").alias("ddl"),
        F.lit(None).cast(st).alias("before"),
        F.lit(None).cast(st).alias("after"),
        F.lit(0).cast("int").alias("epoch_hint"),
    )
    return ddl_row.unionByName(changes)


@query(
    "matview_variance_profile",
    f"""
    WITH ch AS (
      SELECT event_id + 1 AS seq,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error' THEN 'D'
                  ELSE 'U' END AS op,
             'u' || CAST(user_id AS VARCHAR) AS url,
             event_type
      FROM events
    ),
    win AS (
      SELECT url, seq, event_type,
             row_number() OVER (PARTITION BY url ORDER BY seq DESC) AS rn
      FROM ch WHERE op <> 'D'
    ),
    state AS (
      SELECT url, event_type AS lang, (seq % 997) AS fs
      FROM win WHERE rn = 1
    ),
    sums AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_pages,
             CAST(count(fs) AS BIGINT) AS st_n,
             CAST(sum(fs) AS BIGINT) AS st_sum,
             CAST(sum(fs * fs) AS BIGINT) AS st_sumsq
      FROM state GROUP BY lang
    )
    SELECT lang, n_pages, st_n, st_sum, st_sumsq,
           st_n * st_sumsq - st_sum * st_sum AS nvar2
    FROM sums
    """,
)
def matview_variance_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained variance view, driver-checkable: same
    half-replay protocol as ``matview_group_rollup``, but the per-lang
    view carries ``var_pop(fetch_status)`` — maintained as the signed
    power-sum triple (sum, sum-of-squares, non-null count,
    lake/matview.py), so the second half's group-churning updates and
    deletes are pure delta arithmetic: variance needs NO retraction
    recompute path at all, and the refresh never reads the source beyond
    the changelog.  The query exposes the maintained state itself
    (st_n/st_sum/st_sumsq, exact int64 on the integral source column)
    plus the derived ``nvar2 = n*s2 - s1^2`` (= n^2 * var_pop, exact
    integer arithmetic) so both engines tie bit-for-bit with no float in
    the hash.

    Reference contrast: TIS surfaces stats only via full Solr faceting
    over a rebuilt index (tis-index-builder); here second moments ride
    the view's O(changed keys) refresh.
    """
    from tis_spark.cdc import CdcConfig, CdcIngest
    from tis_spark.lake.matview import MaterializedView, _nn, _s1

    table_dir = tempfile.mkdtemp(prefix="tis-mvvar-")
    changes = status_stream(spark, sf_dir)
    max_seq = changes.agg(F.max("seq")).first()[0]
    ep = 500 if max_seq < 5000 else 2500 * max(1, max_seq // 20000)
    half = ep * max(1, max_seq // (2 * ep))
    cfg = CdcConfig(disorder_window=64, fold_parallelism=32, num_buckets=16)
    ingest = CdcIngest(spark, table_dir, cfg)
    ingest.replay(changes.filter(F.col("seq") < half), epoch_size=ep)
    mv = MaterializedView.create(
        spark,
        table_dir + "_mv",
        ingest.table,
        ["lang"],
        {"n_pages": ("count", None), "var_fs": ("var_pop", "fetch_status")},
    )
    mv.full_build()
    ingest.replay(changes.filter(F.col("seq") >= half), epoch_size=ep)
    mv.refresh()
    s2, s1, nn = F.col("var_fs"), F.col(_s1("var_fs")), F.col(_nn("var_fs"))
    return mv.read(with_internal=True).select(
        "lang",
        F.col("n_pages").cast("long").alias("n_pages"),
        nn.cast("long").alias("st_n"),
        s1.cast("long").alias("st_sum"),
        s2.cast("long").alias("st_sumsq"),
        (nn * s2 - s1 * s1).cast("long").alias("nvar2"),
    )


@query(
    "matview_topk_values",
    """
    WITH ch AS (
      SELECT event_id + 1 AS seq,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error' THEN 'D'
                  ELSE 'U' END AS op,
             'u' || CAST(user_id AS VARCHAR) AS url,
             event_type
      FROM events
    ),
    win AS (
      SELECT url, seq, event_type,
             row_number() OVER (PARTITION BY url ORDER BY seq DESC) AS rn
      FROM ch WHERE op <> 'D'
    ),
    state AS (
      SELECT url, event_type AS lang, ((seq % 997) % 13) AS fs
      FROM win WHERE rn = 1
    ),
    freq AS (
      SELECT lang, fs, CAST(count(*) AS BIGINT) AS freq
      FROM state GROUP BY lang, fs
    ),
    rk AS (
      SELECT lang, fs, freq,
             row_number() OVER (PARTITION BY lang ORDER BY freq DESC, fs ASC) AS r
      FROM freq
    )
    SELECT lang, fs AS fetch_status, freq, CAST(r AS BIGINT) AS rank
    FROM rk WHERE r <= 3
    """,
)
def matview_topk_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group heavy hitters over maintained state, driver-
    checkable: the same half-replay protocol as ``matview_exact_extrema``
    (view over lang with ``exact_extrema=True``), then the top-3 most
    frequent ``fetch_status % 13`` values per lang come from
    ``MaterializedView.read_topk_values`` — a window over the per-(group,
    value) multiset auxiliary, which the changelog has been keeping
    current in O(changed keys) per refresh.  The modulus compresses the
    status domain so values genuinely repeat and the frequency ranking is
    exercised (ties break by value, deterministic in both engines).  A
    green hash proves the maintained multiset's multiplicities equal the
    true per-value counts of the final folded state — which the DuckDB
    oracle computes directly.

    Reference contrast: value-frequency surfacing in TIS is Solr faceting
    over a full index rebuild (tis-index-builder); here heavy hitters are
    a derived read over incrementally-maintained state.
    """
    from tis_spark.cdc import CdcConfig, CdcIngest
    from tis_spark.lake.matview import MaterializedView

    table_dir = tempfile.mkdtemp(prefix="tis-mvtopk-")
    # compress the status domain (% 13) so per-(lang, value) frequencies
    # exceed 1 and the heavy-hitter ranking is non-trivial
    changes = status_stream(spark, sf_dir, mod=13)
    max_seq = changes.agg(F.max("seq")).first()[0]
    ep = 500 if max_seq < 5000 else 2500 * max(1, max_seq // 20000)
    half = ep * max(1, max_seq // (2 * ep))
    cfg = CdcConfig(disorder_window=64, fold_parallelism=32, num_buckets=16)
    ingest = CdcIngest(spark, table_dir, cfg)
    ingest.replay(changes.filter(F.col("seq") < half), epoch_size=ep)
    mv = MaterializedView.create(
        spark,
        table_dir + "_mv",
        ingest.table,
        ["lang"],
        {"n_pages": ("count", None), "max_fs": ("max", "fetch_status")},
        exact_extrema=True,
    )
    mv.full_build()
    ingest.replay(changes.filter(F.col("seq") >= half), epoch_size=ep)
    mv.refresh()
    return mv.read_topk_values("fetch_status", 3)


@query(
    "matview_histogram_quantiles",
    """
    WITH ch AS (
      SELECT event_id + 1 AS seq,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error' THEN 'D'
                  ELSE 'U' END AS op,
             'u' || CAST(user_id AS VARCHAR) AS url,
             event_type
      FROM events
    ),
    win AS (
      SELECT url, seq, event_type,
             row_number() OVER (PARTITION BY url ORDER BY seq DESC) AS rn
      FROM ch WHERE op <> 'D'
    ),
    state AS (
      SELECT url, event_type AS lang, (seq % 997) AS fs
      FROM win WHERE rn = 1
    ),
    bins AS (
      SELECT lang, (fs * 16) // 997 AS bin, CAST(count(*) AS BIGINT) AS c
      FROM state GROUP BY 1, 2
    ),
    w AS (
      SELECT lang, bin, c,
             sum(c) OVER (PARTITION BY lang ORDER BY bin) AS cum,
             sum(c) OVER (PARTITION BY lang) AS n
      FROM bins
    )
    SELECT lang,
           CAST(max(n) AS BIGINT) AS n_vals,
           CAST(min(CASE WHEN cum * 2 >= n THEN bin END) AS BIGINT) AS p50_bin,
           CAST(min(CASE WHEN cum * 10 >= n * 9 THEN bin END) AS BIGINT) AS p90_bin,
           CAST(min(CASE WHEN cum * 100 >= n * 99 THEN bin END) AS BIGINT) AS p99_bin
    FROM w GROUP BY lang
    """,
)
def matview_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained distribution sketch, driver-checkable:
    the half-replay protocol with a per-lang ``histogram(fetch_status)``
    view (16 exact-int64 bins over [0, 997), lake/matview.py) — every
    bin is a signed count, so the second half's group-churning updates
    and deletes maintain the whole distribution with NO recompute path —
    then ``read_quantile_bins`` derives p50/p90/p99 bin indexes with
    division-free integer ranking (cum*den >= n*num).  A green hash
    proves maintained bins == a direct binning of the final folded
    state, which the DuckDB oracle computes with the identical integer
    arithmetic.

    Reference contrast: percentile surfacing in TIS means Solr stats
    facets over a fully rebuilt index (tis-index-builder); here the
    quantiles ride the view's O(changed keys) refresh.
    """
    from tis_spark.cdc import CdcConfig, CdcIngest
    from tis_spark.lake.matview import MaterializedView

    table_dir = tempfile.mkdtemp(prefix="tis-mvhist-")
    changes = status_stream(spark, sf_dir)
    max_seq = changes.agg(F.max("seq")).first()[0]
    ep = 500 if max_seq < 5000 else 2500 * max(1, max_seq // 20000)
    half = ep * max(1, max_seq // (2 * ep))
    cfg = CdcConfig(disorder_window=64, fold_parallelism=32, num_buckets=16)
    ingest = CdcIngest(spark, table_dir, cfg)
    ingest.replay(changes.filter(F.col("seq") < half), epoch_size=ep)
    mv = MaterializedView.create(
        spark,
        table_dir + "_mv",
        ingest.table,
        ["lang"],
        {"n_pages": ("count", None), "fs_hist": ("histogram", "fetch_status")},
        hist_specs={"fs_hist": (0, 997, 16)},
    )
    mv.full_build()
    ingest.replay(changes.filter(F.col("seq") >= half), epoch_size=ep)
    mv.refresh()
    return mv.read_quantile_bins(
        "fs_hist", {"p50_bin": (1, 2), "p90_bin": (9, 10), "p99_bin": (99, 100)}
    )


# ------------------------------------------------------------------ derived

from tis_spark.lake.derived import derived_transform  # noqa: E402


@derived_transform("pages_title_postings")
def _pages_title_postings(df: DataFrame) -> DataFrame:
    """pages row -> one posting per title token (split on '_'), carrying
    the row's lang as payload.  lang is functionally dependent on url, so
    grouping by it is deterministic and the derived key stays (url, tok)."""
    return (
        df.select("url", "lang", F.explode(F.split("text", "_")).alias("tok"))
        .groupBy("url", "tok", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .select("url", "tok", "tf", "lang")
    )


@query(
    "derived_index_sync",
    f"""
    WITH ch AS (
      SELECT event_id + 1 AS seq,
             CASE WHEN event_type = 'signup' THEN 'I'
                  WHEN event_type = 'error' THEN 'D'
                  ELSE 'U' END AS op,
             'u' || CAST(user_id AS VARCHAR) AS url,
             event_type
      FROM events
    ),
    win AS (
      SELECT url, seq, event_type,
             row_number() OVER (PARTITION BY url ORDER BY seq DESC) AS rn
      FROM ch WHERE op <> 'D'
    ),
    state AS (
      SELECT url, event_type AS lang,
             'pg_' || url || '_' || CAST(seq AS VARCHAR) AS text
      FROM win WHERE rn = 1
    ),
    toks AS (
      SELECT url, lang, unnest(string_split(text, '_')) AS tok FROM state
    )
    SELECT url, tok, CAST(count(*) AS BIGINT) AS tf, lang
    FROM toks GROUP BY url, tok, lang
    """,
)
def derived_index_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained inverted index, driver-checkable
    (lake/derived.py): replay the FIRST HALF of the derived stream
    through the real engine, bootstrap a title-token postings index off
    that snapshot, replay the SECOND HALF (updates, deletes,
    lang-churning moves), then catch the index up with ONE changelog
    sync — tombstones land through the bucket/zone file-pruned point
    read and re-derived survivors keep their live copy at equal commit.
    A green hash proves the maintained artifact equals a fresh transform
    of the sequential LWW fold of the full stream, which the DuckDB
    oracle computes directly.

    Reference contrast: tis-index-builder re-pipelines EVERY source row
    through LuceneDocMaker per build (IndexBuilderTask.java:93-188) and
    backflow copies the whole artifact; here a sync ships O(changed
    keys) — the 100 TB index-maintenance story.
    """
    from tis_spark.cdc import CdcConfig, CdcIngest
    from tis_spark.lake.derived import DerivedIndex

    table_dir = tempfile.mkdtemp(prefix="tis-deridx-")
    changes = derived_changes(spark, sf_dir)
    max_seq = changes.agg(F.max("seq")).first()[0]
    ep = 500 if max_seq < 5000 else 2500 * max(1, max_seq // 20000)
    half = ep * max(1, max_seq // (2 * ep))
    cfg = CdcConfig(disorder_window=64, fold_parallelism=32, num_buckets=16)
    ingest = CdcIngest(spark, table_dir, cfg)
    ingest.replay(changes.filter(F.col("seq") < half), epoch_size=ep)
    idx = DerivedIndex.create(
        spark, table_dir + "_idx", ingest.table, "pages_title_postings", ["url", "tok"]
    )
    idx.bootstrap()
    ingest.replay(changes.filter(F.col("seq") >= half), epoch_size=ep)
    idx.sync()
    return idx.read().select("url", "tok", "tf", "lang")


# ------------------------------------------------- incremental near-dup

#: doc_id % NEW_DOC_MOD == 0 picks the "newly crawled" batch (~20%) that
#: arrives AFTER the LSH index was bootstrapped over the back catalog.
NEW_DOC_MOD = 5


def _neardup_probe_sql() -> str:
    from tis_spark.operators.mlops import _MINHASH_SQL

    return _MINHASH_SQL[: _MINHASH_SQL.rindex("SELECT n_bands")] + """
SELECT n_bands, CAST(count(*) AS BIGINT) AS n_candidate_pairs,
       CAST(sum(CASE WHEN doc_a % 5 = 0 AND doc_b % 5 = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_new_new_pairs
FROM pairs
WHERE doc_a % 5 = 0 OR doc_b % 5 = 0
GROUP BY n_bands
"""


@query("neardup_probe_incremental", _neardup_probe_sql())
def neardup_probe_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup detection — the capstone of the CDC x webtext
    graft: the corpus lives in a lake table, its MinHash-LSH band store
    is an incrementally-maintained DerivedIndex (lake/derived.py), and
    when a new crawl batch lands the batch's near-dups against the WHOLE
    corpus come from probing the maintained index — never from re-running
    the full corpus-x-corpus LSH join.

    Steps (all through the real machinery): bootstrap the lake table
    with the back catalog (doc_id % 5 != 0), bootstrap the
    ``minhash_bands`` index off that snapshot, commit the new batch
    (doc_id % 5 == 0) as a CDC delta, catch the index up with ONE
    changelog sync (O(changed keys)), then probe: the new docs' band
    rows join the full index on (band_idx, band_val).  At 100 TB the
    probe side is O(batch) — broadcast — and the index side is a
    bucket-pruned signature store; nothing ever shuffles document text,
    and the corpus-x-corpus join simply never happens again after the
    initial build.

    The DuckDB oracle computes the batch-over-full-corpus candidate
    pairs directly from the documents table with the identical md5
    minhash formula, so a green hash proves maintained-index probing ==
    batch recomputation.

    Reference contrast: TIS would full-rebuild the index per build
    (tis-index-builder IndexBuilderTask.java:93-188); near-dup probing
    over a CDC-maintained signature store has no reference counterpart.
    """
    from tis_spark.lake.derived import DerivedIndex
    from tis_spark.lake.table import COMMIT_COL, DEAD_COL, LakeTable

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    is_new = (F.col("doc_id") % NEW_DOC_MOD) == 0
    table_dir = tempfile.mkdtemp(prefix="tis-neardup-")
    src = LakeTable.create(
        spark, table_dir, docs.schema, key_cols=["doc_id"], version_col="n_chars"
    )

    def _commit(batch: DataFrame, epoch: int) -> None:
        staged = (
            batch.withColumn(DEAD_COL, F.lit(False))
            .withColumn(COMMIT_COL, F.lit(epoch).cast("long"))
            .withColumn("_bucket", src.bucket_expr())
        )
        src.commit(src.write_data_files(staged, kind="delta"), summary={"epoch_id": epoch})

    _commit(docs.filter(~is_new), 0)
    idx = DerivedIndex.create(
        spark, table_dir + "_idx", src, "minhash_bands", ["doc_id", "band_idx"]
    )
    idx.bootstrap()
    _commit(docs.filter(is_new), 1)
    out = idx.sync()
    assert not out["up_to_date"], out

    from tis_spark.operators.indexing import probe_minhash_bands

    bands = idx.read().select("doc_id", "band_idx", "band_val")
    pairs = probe_minhash_bands(bands, (F.col("doc_id") % NEW_DOC_MOD) == 0)
    return pairs.groupBy("n_bands").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"),
        F.sum(
            F.when(
                ((F.col("doc_a") % NEW_DOC_MOD) == 0) & ((F.col("doc_b") % NEW_DOC_MOD) == 0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_new_new_pairs"),
    )


# --------------------------------------------------- incremental ANN probe


def _ann_probe_sql() -> str:
    from tis_spark.operators.indexing import ANN_INDEX_PLANES, ANN_INDEX_TABLES
    from tis_spark.operators.mlops import _COS_EXPR

    def bucket(t: int) -> str:
        return "concat(" + ", ".join(
            f"CASE WHEN embedding[{t * 16 + i}] >= 0 THEN '1' ELSE '0' END"
            for i in range(1, ANN_INDEX_PLANES + 1)
        ) + ")"

    tables = "\n      UNION ALL\n".join(
        f"      SELECT vec_id, {t} AS table_idx, {bucket(t)} AS bucket FROM embeddings"
        for t in range(ANN_INDEX_TABLES)
    )
    return f"""
    WITH bk AS (
{tables}
    ),
    cand AS (
      SELECT least(p.vec_id, c.vec_id) AS vec_a,
             greatest(p.vec_id, c.vec_id) AS vec_b,
             p.table_idx
      FROM bk p JOIN bk c
        ON p.table_idx = c.table_idx AND p.bucket = c.bucket
       AND p.vec_id <> c.vec_id
      WHERE p.vec_id % 5 = 0
      GROUP BY 1, 2, 3
    ),
    pt AS (
      SELECT vec_a, vec_b, CAST(count(*) AS BIGINT) AS n_tables
      FROM cand GROUP BY 1, 2
    ),
    sim AS (
      SELECT pt.n_tables, {_COS_EXPR} AS cos_sim
      FROM pt
      JOIN embeddings a ON pt.vec_a = a.vec_id
      JOIN embeddings b ON pt.vec_b = b.vec_id
    )
    SELECT n_tables,
           CAST(count(*) AS BIGINT) AS n_candidate_pairs,
           CAST(sum(CASE WHEN cos_sim >= 0.30 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_close_pairs
    FROM sim GROUP BY n_tables
    """


@query("ann_probe_incremental", _ann_probe_sql())
def ann_probe_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN over a maintained vector index — the embedding
    twin of ``neardup_probe_incremental``: the vectors live in a lake
    table, their multi-table sign-LSH bucket store is an incrementally
    maintained DerivedIndex (``emb_sign_buckets``), and when a new
    vector batch lands its near neighbors against the WHOLE corpus come
    from probing the maintained store — never from re-bucketing the
    corpus or an all-pairs join.

    Steps (all through the real machinery): bootstrap the lake table
    with the back catalog (vec_id % 5 != 0), bootstrap the bucket index
    off that snapshot, commit the new batch (vec_id % 5 == 0) as a CDC
    delta, catch the index up with ONE changelog sync (O(changed keys)),
    then probe: broadcast the batch's bucket rows against the store on
    (table_idx, bucket) for candidates, and verify candidates with
    exact cosine by joining the pair ids back to the source table's
    vectors (AQE broadcasts the tiny pair side, so the vector read is a
    column-pruned scan, never a vector shuffle).  At 100 TB the index
    stores 24-byte hash rows, not vectors; the probe shuffles O(batch).

    The DuckDB oracle recomputes the batch-over-corpus candidates and
    cosines directly from the embeddings table with the identical
    bucket and cosine formulas, so a green hash proves maintained-index
    probing == batch recomputation.

    Reference contrast: the reference full-rebuilds its (Lucene) index
    artifact per build (IndexBuilderTask.java:93-188); a CDC-maintained
    ANN index has no reference counterpart.
    """
    from tis_spark.lake.derived import DerivedIndex
    from tis_spark.lake.table import COMMIT_COL, DEAD_COL, LakeTable
    from tis_spark.operators.indexing import probe_sign_buckets
    from tis_spark.operators.mlops import _cos_col

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    is_new = (F.col("vec_id") % 5) == 0
    table_dir = tempfile.mkdtemp(prefix="tis-annprobe-")
    src = LakeTable.create(
        spark, table_dir, emb.schema, key_cols=["vec_id"], version_col="vec_id"
    )

    def _commit(batch: DataFrame, epoch: int) -> None:
        staged = (
            batch.withColumn(DEAD_COL, F.lit(False))
            .withColumn(COMMIT_COL, F.lit(epoch).cast("long"))
            .withColumn("_bucket", src.bucket_expr())
        )
        src.commit(src.write_data_files(staged, kind="delta"), summary={"epoch_id": epoch})

    _commit(emb.filter(~is_new), 0)
    idx = DerivedIndex.create(
        spark, table_dir + "_idx", src, "emb_sign_buckets", ["vec_id", "table_idx"]
    )
    idx.bootstrap()
    _commit(emb.filter(is_new), 1)
    out = idx.sync()
    assert not out["up_to_date"], out

    pairs = probe_sign_buckets(
        idx.read().select("vec_id", "table_idx", "bucket"), (F.col("vec_id") % 5) == 0
    )
    vecs = src.read().select("vec_id", "embedding")
    sim = (
        pairs.join(
            vecs.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")),
            "vec_a",
        )
        .join(
            vecs.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")),
            "vec_b",
        )
        .select("n_tables", _cos_col("ea", "eb").alias("cos_sim"))
    )
    return sim.groupBy("n_tables").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"),
        F.sum(F.when(F.col("cos_sim") >= 0.30, 1).otherwise(0))
        .cast("long")
        .alias("n_close_pairs"),
    )
