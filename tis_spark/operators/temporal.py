"""Temporal operators Spark lacks as built-ins: as-of join, bounded range
self-join, sessionization.

The reference has no temporal operators (its serving store answers
queries), but any event-log consumer of this engine needs them; each is
expressed as a composition of existing DataFrame ops in its *scalable*
form — the union-window trick for as-of (one shuffle, no per-row lookup),
bucketed equi-join for the range join (never an unbounded theta-join),
lag/cumsum for sessions — with the DuckDB oracle spelling out identical
semantics in ANSI SQL.  All timestamps go through epoch-microsecond longs
so no float or timezone arithmetic can diverge between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tis_spark.operators import load, query

# -------------------------------------------------------------- as-of join


@query(
    "asof_join_prior_view",
    """
    WITH u AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
             CASE WHEN event_type = 'view' THEN event_id END AS v_id,
             CASE WHEN event_type = 'view' THEN epoch_us(ts) END AS v_ts
      FROM events WHERE event_type IN ('purchase', 'view')
    ),
    c AS (
      SELECT *,
             last_value(v_id IGNORE NULLS) OVER w AS last_view_id,
             last_value(v_ts IGNORE NULLS) OVER w AS last_view_ts
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_id, user_id, last_view_id,
           CAST(floor((ts_us - last_view_ts) / 1000000.0) AS BIGINT) AS gap_s
    FROM c WHERE event_type = 'purchase'
    """,
)
def asof_join_prior_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event picks the latest view event of the
    same user at-or-before it ((ts, event_id)-lexicographic order makes
    'before' a total order — no float/timestamp tie ambiguity).

    Scalable formulation (the union-window trick): tag both sides, union,
    one window per user carrying the last view forward — ONE shuffle on
    user_id, no theta-join, no per-row lookup; at 10^10 events this is a
    sort within partitions, exactly how a cluster should do as-of.  A
    view-less purchase keeps null (left-join semantics)."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    is_view = F.col("event_type") == "view"
    u = ev.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
        "event_type",
        F.when(is_view, F.col("event_id")).alias("v_id"),
        F.when(is_view, F.unix_micros(F.col("ts").cast("timestamp"))).alias("v_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = u.select(
        "*",
        F.last("v_id", ignorenulls=True).over(w).alias("last_view_id"),
        F.last("v_ts", ignorenulls=True).over(w).alias("last_view_ts"),
    )
    return c.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "last_view_id",
        F.floor((F.col("ts_us") - F.col("last_view_ts")) / 1000000.0)
        .cast("long")
        .alias("gap_s"),
    )


# ------------------------------------------------------------- range join

RANGE_W_S = 21_600  # pair window: events within 6 h of each other
_W_US = RANGE_W_S * 1_000_000


@query(
    "range_join_pair_counts",
    f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
    )
    SELECT l.user_id, count(*) AS n_pairs
    FROM e l JOIN e r
      ON l.user_id = r.user_id
     AND (r.ts_us > l.ts_us OR (r.ts_us = l.ts_us AND r.event_id > l.event_id))
     AND r.ts_us - l.ts_us <= {_W_US}
    GROUP BY l.user_id
    """,
)
def range_join_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range self-join: per user, count ordered event pairs within
    21,600 s (RANGE_W_S) of each other.

    The naive form is an inequality theta-join (O(n^2) per user, and Spark
    would BNL it).  The scale path implemented here buckets ts into
    window-width buckets and equi-joins on (user, bucket) with the left
    side exploded to (b, b+1): any pair within the window lands in the
    same or adjacent bucket, so each qualifying pair is matched exactly
    once by construction, the join is a plain hash join on small keys, and
    the residual range predicate filters within buckets.  The oracle states
    the same relation as the direct inequality join (fine at oracle
    scale)."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )
    b = F.floor(F.col("ts_us") / _W_US)
    left = e.select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("l_id"),
        F.col("ts_us").alias("l_ts"),
        F.explode(F.array(b, b + 1)).alias("nb"),
    )
    right = e.select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("r_id"),
        F.col("ts_us").alias("r_ts"),
        b.alias("rb"),
    )
    pairs = left.join(
        right,
        (F.col("l_user") == F.col("r_user")) & (F.col("nb") == F.col("rb")),
    ).filter(
        (
            (F.col("r_ts") > F.col("l_ts"))
            | ((F.col("r_ts") == F.col("l_ts")) & (F.col("r_id") > F.col("l_id")))
        )
        & (F.col("r_ts") - F.col("l_ts") <= _W_US)
    )
    return pairs.groupBy(F.col("l_user").alias("user_id")).agg(
        F.count("*").alias("n_pairs")
    )


# ----------------------------------------------------------- sessionization

SESSION_GAP_S = 86_400  # new session after > 24 h idle
_GAP_US = SESSION_GAP_S * 1_000_000


@query(
    "sessionize_events",
    f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
    ),
    m AS (
      SELECT *,
             CASE WHEN lag(ts_us) OVER w IS NULL
                    OR ts_us - lag(ts_us) OVER w > {_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    s AS (
      SELECT user_id, ts_us,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      FROM m
    )
    SELECT user_id, session_idx, count(*) AS n_events,
           min(ts_us) AS t_start_us,
           CAST(floor((max(ts_us) - min(ts_us)) / 1000000.0) AS BIGINT) AS span_s
    FROM s GROUP BY user_id, session_idx
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a session breaks after 86,400 s (SESSION_GAP_S) of
    per-user inactivity; sessions are numbered by a running sum of
    session-start markers (lag + cumsum — the standard two-window batch
    form, both windows on the same (user_id, (ts, event_id)) order so the
    shuffle is reused).  This is the batch shape of Structured Streaming's
    session_window aggregation; event_id tie-breaks equal timestamps so the
    session assignment is a pure function of the data."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )
    wo = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    is_new = (
        F.when(
            F.lag("ts_us").over(wo).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(wo) > _GAP_US),
            1,
        )
        .otherwise(0)
        .alias("is_new")
    )
    m = e.select("user_id", "event_id", "ts_us", is_new)
    s = m.select(
        "user_id",
        "ts_us",
        F.sum("is_new")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_idx"),
    )
    return s.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("t_start_us"),
        F.floor((F.max("ts_us") - F.min("ts_us")) / 1000000.0)
        .cast("long")
        .alias("span_s"),
    )
