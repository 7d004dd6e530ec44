"""Per-key LWW fold as a Spark stage — payload-free by construction.

The change batch is flattened JVM-side (no-op / invalid predicates are
Catalyst expressions, not Python).  The fold itself sees only scalar
columns (seq, versions, flags, post-v1 scalar fields): html/lang exist in
every schema version, so the winning event always overwrites them and the
fold only needs to decide *which* event wins (``last_seq``); the caller
re-joins the winner's payload afterwards.  Consequences at scale:

* the stored-side scan prunes the html column out of parquet entirely;
* the fold shuffle and the Arrow boundary move O(events × 100B), not
  O(events × page size);
* hot keys cost numpy-level work per event (vectorized singles path).

Execution: tag events + stored rows, union, ONE explicit hash repartition
on the key (``fold_parallelism`` partitions — the key-partitioned merge
the north rule asks for; an explicit repartition is never skew-split by
AQE, which would scatter a key's rows), then a partition-level
Arrow-batched fold via mapInPandas:

* **Vectorized singles path**: keys with exactly one event in the batch
  (the overwhelming majority once per-key coalescing has happened) fold
  with numpy mask arithmetic — no per-row Python.  The mask algebra
  mirrors ``fold_key_events`` case-for-case (V3/V5/V6/V7/V8/P5
  semantics); tests/test_fold_unit.py pins the equivalence.
* **Sequential multi path**: keys with >1 event fold through
  ``fold_key_events`` (the single semantic core shared with the oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tis_spark.cdc.semantics import CONTENT_FIELDS, COUNTER_NAMES, FIELD_SINCE, CdcConfig, fold_key_events

# Scalar content fields the fold must merge field-level (added after
# schema v1, so an old-schema event must keep the stored value).
SMALL_FIELDS = ["fetch_status", "score"]

FOLD_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts_us", T.LongType()),
        T.StructField("fetch_status", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("last_seq", T.LongType()),
        T.StructField("action", T.StringType(), False),
        T.StructField("min_seq", T.LongType()),
        T.StructField("max_seq", T.LongType()),
    ]
    + [T.StructField(c, T.LongType(), False) for c in COUNTER_NAMES]
)

FLAT_FOLD_COLS = [
    "url", "seq", "op", "sv", "invalid", "noop",
    "a_warc_ts_us", "a_fetch_status", "a_score",
]
STORED_COLS = ["s_warc_ts_us", "s_fetch_status", "s_score"]


def flatten_changes(changes: DataFrame, cfg: CdcConfig) -> DataFrame:
    """JVM-side flattening + predicate computation (P5/P6 + U-invariant)."""
    df = changes.filter(F.col("table").isin(*cfg.table_focus)).filter(F.col("op").isin("I", "U", "D"))
    noop = F.col("op") == "U"
    for f in CONTENT_FIELDS:
        noop = noop & F.col(f"before.{f}").eqNullSafe(F.col(f"after.{f}"))
    return df.select(
        F.coalesce(F.col("after.url"), F.col("before.url")).alias("url"),
        F.col("seq"),
        F.col("op"),
        F.col("schema_version").alias("sv"),
        F.unix_micros(F.col("after.warc_ts")).alias("a_warc_ts_us"),
        F.col("after.html").alias("a_html"),
        F.col("after.lang").alias("a_lang"),
        F.col("after.fetch_status").alias("a_fetch_status"),
        F.col("after.score").alias("a_score"),
        # Invalid events (counted, never applied): UPDATE without a
        # before-image (reference validateTable), and any I/U whose
        # after-image lacks the version column — a malformed event that
        # must take the same path in all three fold implementations.
        (
            ((F.col("op") == "U") & F.col("before").isNull())
            | (F.col("op").isin("I", "U") & F.col("after.warc_ts").isNull())
        ).alias("invalid"),
        noop.alias("noop"),
    )


def _opt_int(x):
    return None if pd.isna(x) else int(x)


def _opt_float(x):
    return None if pd.isna(x) else float(x)


def _obj(col: pd.Series) -> np.ndarray:
    return col.to_numpy(dtype=object)


def _clean_obj(arr: np.ndarray) -> pd.Series:
    """object array -> Series with NaN normalized to None (Arrow-safe)."""
    s = pd.Series(arr, dtype=object)
    return s.where(pd.notna(s), None)


def _int64(arr) -> pd.Series:
    """float64-with-NaN -> Arrow-native nullable Int64, vectorized."""
    return pd.Series(arr, dtype="float64").astype("Int64")


def fold_singles(pdf: pd.DataFrame, cfg: CdcConfig) -> pd.DataFrame:
    """Vectorized fold for keys with exactly one event in the batch.

    Epoch-microsecond versions are exact in float64 (< 2^53), so the LWW /
    rectification comparisons are done in float with NaN = absent.
    """
    bound_us = float(cfg.rectify_bound_s * 1_000_000)
    tick_us = float(cfg.rectify_tick_s * 1_000_000)
    n = len(pdf)
    op = pdf["op"].to_numpy()
    sv = pdf["sv"].to_numpy(dtype=np.int64)
    invalid = pdf["invalid"].to_numpy(dtype=bool)
    noop = pdf["noop"].to_numpy(dtype=bool)
    v_new = pd.to_numeric(pdf["a_warc_ts_us"], errors="coerce").to_numpy(dtype=np.float64)
    v_old = pd.to_numeric(pdf["s_warc_ts_us"], errors="coerce").to_numpy(dtype=np.float64)
    has_stored = ~np.isnan(v_old)

    is_i, is_u, is_d = op == "I", op == "U", op == "D"
    ev_invalid = (is_i | is_u) & (invalid | np.isnan(v_new))
    u_noop = is_u & noop & ~ev_invalid
    row_ev = (is_i | is_u) & ~ev_invalid & ~u_noop
    no_store = row_ev & ~has_stored
    miss_blocked = no_store & is_u & (not cfg.upsert_missing)
    create = no_store & ~miss_blocked
    upd = row_ev & has_stored
    newer = upd & (v_new > v_old)
    rect = upd & ~newer & ((v_old - v_new) <= bound_us)
    dirty = upd & ~newer & ~rect
    applied = create | newer | rect

    if cfg.delete_policy == "ignore":
        del_hit = np.zeros(n, dtype=bool)
        del_ignored, del_missing = is_d, np.zeros(n, dtype=bool)
    else:
        del_hit = is_d & has_stored
        del_ignored = np.zeros(n, dtype=bool)
        del_missing = is_d & ~has_stored

    version = np.where(newer | create, v_new, np.where(rect, v_old + tick_us, v_old))
    action = np.where(applied, "U", np.where(del_hit, "D", "N"))

    exists_after = applied | (has_stored & ~del_hit & ~applied)
    # All-numeric construction: float64 + NaN for absent, converted to
    # Arrow-native nullable Int64 once per column — no per-row Python.
    out: dict[str, object] = {"url": pdf["url"].to_numpy(dtype=object)}
    ver_mask = exists_after & ~np.isnan(version)
    out["warc_ts_us"] = _int64(np.where(ver_mask, version, np.nan))
    for f in SMALL_FIELDS:
        af = pd.to_numeric(pdf[f"a_{f}"], errors="coerce").to_numpy(dtype=np.float64)
        sf = pd.to_numeric(pdf[f"s_{f}"], errors="coerce").to_numpy(dtype=np.float64)
        has_f = sv >= FIELD_SINCE[f]
        val = np.where(
            create,
            np.where(has_f, af, np.nan),
            np.where(applied & has_f, af, np.where(del_hit, np.nan, sf)),
        )
        out[f] = val
    out["fetch_status"] = _int64(out.pop("fetch_status"))
    out["score"] = pd.Series(out.pop("score"), dtype="float64")
    seq = pdf["seq"].to_numpy(dtype=np.int64)
    out["last_seq"] = _int64(np.where(applied, seq.astype(np.float64), np.nan))
    out["action"] = pd.Series(action, dtype=object)
    out["min_seq"] = seq
    out["max_seq"] = seq

    counters = {
        "n_events": np.ones(n, dtype=np.int64),
        "n_applied": applied,
        "n_noop": u_noop,
        "n_invalid": ev_invalid,
        "n_dirty": dirty,
        "n_rectified": rect,
        "n_missing": is_u & no_store,
        "n_deleted": del_hit,
        "n_del_ignored": del_ignored,
        "n_del_missing": del_missing,
        "n_sticky_insert": create,
    }
    for c in COUNTER_NAMES:
        out[c] = counters[c].astype(np.int64)
    return pd.DataFrame(out)


def fold_multi(pdf: pd.DataFrame, cfg: CdcConfig) -> pd.DataFrame:
    """Sequential fold for keys with >1 event (shares fold_key_events with
    the replay oracle — the paths cannot drift)."""
    out: dict[str, list] = {f.name: [] for f in FOLD_SCHEMA.fields}
    arrs = {
        c: pdf[c].to_numpy(dtype=object)
        for c in (
            "url", "seq", "op", "sv", "invalid", "noop",
            "a_warc_ts_us", "a_fetch_status", "a_score",
            "s_warc_ts_us", "s_fetch_status", "s_score",
        )
    }
    urls = arrs["url"]
    starts = [0] + [i for i in range(1, len(urls)) if urls[i] != urls[i - 1]] + [len(urls)]
    for gi in range(len(starts) - 1):
        lo, hi = starts[gi], starts[gi + 1]
        url = urls[lo]
        stored = None
        if not pd.isna(arrs["s_warc_ts_us"][lo]):
            stored = {
                "url": url,
                "warc_ts": int(arrs["s_warc_ts_us"][lo]),
                "html": None,
                "lang": None,
                "fetch_status": _opt_int(arrs["s_fetch_status"][lo]),
                "score": _opt_float(arrs["s_score"][lo]),
            }
        events = [
            {
                "op": arrs["op"][i],
                "url": url,
                "seq": int(arrs["seq"][i]),
                "schema_version": int(arrs["sv"][i]),
                "invalid": bool(arrs["invalid"][i]),
                "noop": bool(arrs["noop"][i]),
                "after": {
                    "url": url,
                    "warc_ts": _opt_int(arrs["a_warc_ts_us"][i]),
                    "html": None,
                    "lang": None,
                    "fetch_status": _opt_int(arrs["a_fetch_status"][i]),
                    "score": _opt_float(arrs["a_score"][i]),
                },
            }
            for i in range(lo, hi)
        ]
        row, action, counters = fold_key_events(stored, events, cfg)
        out["url"].append(url)
        out["warc_ts_us"].append(row["warc_ts"] if row else None)
        out["fetch_status"].append(row["fetch_status"] if row else None)
        out["score"].append(row["score"] if row else None)
        out["last_seq"].append(row.get("_seq") if row else None)
        out["action"].append(action)
        seqs = [int(arrs["seq"][i]) for i in range(lo, hi)]
        out["min_seq"].append(min(seqs))
        out["max_seq"].append(max(seqs))
        for c in COUNTER_NAMES:
            out[c].append(counters[c])
    return pd.DataFrame({k: pd.Series(v, dtype=object) for k, v in out.items()})


def make_fold_fn(cfg: CdcConfig):
    col_order = [f.name for f in FOLD_SCHEMA.fields]

    def fold_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
        # seq is globally unique; dropping duplicates makes re-delivered
        # events (crash replay overlap) idempotent inside the fold.
        pdf = pdf.sort_values(["url", "seq"], kind="stable").drop_duplicates(subset=["seq"])
        if len(pdf) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=object) for c in col_order})
        sizes = pdf.groupby("url", sort=False)["url"].transform("size").to_numpy()
        single = sizes == 1
        parts = []
        if single.any():
            parts.append(fold_singles(pdf[single], cfg))
        if (~single).any():
            parts.append(fold_multi(pdf[~single], cfg))
        res = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        # Harmonize dtypes (the multi path emits object columns) to
        # Arrow-native nullable types — vectorized, no per-row Python.
        for c in ("warc_ts_us", "fetch_status", "last_seq", "min_seq", "max_seq", *COUNTER_NAMES):
            res[c] = pd.to_numeric(res[c]).astype("Int64")
        res["score"] = pd.to_numeric(res["score"]).astype("float64")
        return res[col_order]

    return fold_pdf


def make_partition_fold(cfg: CdcConfig):
    """Partition-level fold for mapInPandas: the partition holds *all*
    events and stored rows of its keys (explicit hash repartition by url),
    so the stored-row lookup is an in-memory pandas merge — no Spark join
    stage, no second shuffle."""
    fold_pdf = make_fold_fn(cfg)

    def fn(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        ev = pdf[pdf["_side"] == 1]
        if len(ev) == 0:
            return
        st = pdf.loc[pdf["_side"] == 0, ["url"] + STORED_COLS]
        merged = ev.drop(columns=STORED_COLS + ["_side"]).merge(st, on="url", how="left")
        yield fold_pdf(merged)

    return fn


def make_merged_partition_fold(cfg: CdcConfig):
    """Partition-level fold over rows already joined with the stored
    scalars (every event row carries its key's s_* columns)."""
    fold_pdf = make_fold_fn(cfg)

    def fn(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if len(pdf):
            yield fold_pdf(pdf)

    return fn


def _b2l(cond) -> F.Column:
    """boolean Column -> non-null 0/1 long (counter column)."""
    return F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("long")


def _nn(cond) -> F.Column:
    """null-safe boolean: null -> false (matches numpy NaN-comparison)."""
    return F.coalesce(cond, F.lit(False))


def fold_singles_expr(joined: DataFrame, cfg: CdcConfig) -> DataFrame:
    """Catalyst twin of ``fold_singles``: single-event keys folded entirely
    JVM-side (whole-stage codegen, zero Python).  ``joined`` = one flat
    event row per key left-joined with the stored scalars.  The mask
    algebra mirrors fold_singles / fold_key_events case-for-case;
    tests/test_fold_unit.py + the replay-vs-oracle suite pin all three
    together."""
    bound_us = F.lit(cfg.rectify_bound_s * 1_000_000).cast("long")
    tick_us = F.lit(cfg.rectify_tick_s * 1_000_000).cast("long")
    op, v_new, v_old = F.col("op"), F.col("a_warc_ts_us"), F.col("s_warc_ts_us")
    has_stored = v_old.isNotNull()
    is_i, is_u, is_d = op == "I", op == "U", op == "D"
    ev_invalid = (is_i | is_u) & (F.col("invalid") | v_new.isNull())
    u_noop = is_u & F.col("noop") & ~ev_invalid
    row_ev = (is_i | is_u) & ~ev_invalid & ~u_noop
    no_store = row_ev & ~has_stored
    miss_blocked = no_store & is_u & F.lit(not cfg.upsert_missing)
    create = no_store & ~miss_blocked
    upd = row_ev & has_stored
    newer = upd & _nn(v_new > v_old)
    rect = upd & ~newer & _nn((v_old - v_new) <= bound_us)
    dirty = upd & ~newer & ~rect
    applied = create | newer | rect
    if cfg.delete_policy == "ignore":
        del_hit = F.lit(False)
        del_ignored, del_missing = is_d, F.lit(False)
    else:
        del_hit = is_d & has_stored
        del_ignored = F.lit(False)
        del_missing = is_d & ~has_stored
    version = (
        F.when(newer | create, v_new).when(rect, v_old + tick_us).otherwise(v_old)
    )
    exists_after = applied | (has_stored & ~del_hit & ~applied)

    def field_val(f: str):
        af, sf = F.col(f"a_{f}"), F.col(f"s_{f}")
        has_f = F.lit(FIELD_SINCE[f]) <= F.col("sv")
        return F.when(create, F.when(has_f, af)).otherwise(
            F.when(applied & has_f, af).when(del_hit, F.lit(None)).otherwise(sf)
        )

    counters = {
        "n_events": F.lit(1).cast("long"),
        "n_applied": _b2l(applied),
        "n_noop": _b2l(u_noop),
        "n_invalid": _b2l(ev_invalid),
        "n_dirty": _b2l(dirty),
        "n_rectified": _b2l(rect),
        "n_missing": _b2l(is_u & no_store),
        "n_deleted": _b2l(del_hit),
        "n_del_ignored": _b2l(del_ignored),
        "n_del_missing": _b2l(del_missing),
        "n_sticky_insert": _b2l(create),
    }
    return joined.select(
        F.col("url"),
        F.when(exists_after, version).cast("long").alias("warc_ts_us"),
        field_val("fetch_status").cast("long").alias("fetch_status"),
        field_val("score").cast("double").alias("score"),
        F.when(applied, F.col("seq")).cast("long").alias("last_seq"),
        F.when(applied, F.lit("U")).when(del_hit, F.lit("D")).otherwise(F.lit("N")).alias("action"),
        F.col("seq").alias("min_seq"),
        F.col("seq").alias("max_seq"),
        *[counters[c].alias(c) for c in COUNTER_NAMES],
    )


def fold_changes(flat: DataFrame, stored: DataFrame, cfg: CdcConfig) -> DataFrame:
    """Fold flattened changes over stored rows, one output row per key.

    ``stored`` must have columns (url, s_warc_ts_us, s_fetch_status,
    s_score) — scalars only, no payloads.  Output: FOLD_SCHEMA, one row
    per key; the winning payload is fetched by joining ``last_seq`` back
    to the batch.

    Hybrid execution (cfg.fold_mode):
    * ``hybrid`` (default): keys with exactly one event in the batch fold
      as Catalyst expressions after a shuffle join with the stored
      scalars — whole-stage codegen, no Python.  Only multi-event keys
      (rare once per-key coalescing happened) take the Arrow/pandas
      sequential path.  The window count, the singles join, and the
      multis shuffle all hash-partition on the key, so Spark reuses the
      exchanges.
    * ``pandas``: everything through the partition-level pandas fold
      (the reference path the hybrid is tested against).
    """
    light = flat.select(*FLAT_FOLD_COLS)
    if cfg.fold_mode == "pandas":
        tagged = light.withColumn("_side", F.lit(1)).unionByName(
            stored.withColumn("_side", F.lit(0)), allowMissingColumns=True
        )
        parts = tagged.repartition(cfg.fold_parallelism, "url")
        return parts.mapInPandas(make_partition_fold(cfg), schema=FOLD_SCHEMA)

    from pyspark.sql import Window

    # One join feeds both branches; the window shuffle, the join
    # exchanges, and the stored subplan are shared via ReusedExchange.
    flat2 = light.withColumn("_cnt", F.count("*").over(Window.partitionBy("url")))
    joined = flat2.join(stored, "url", "left")
    singles = fold_singles_expr(joined.filter(F.col("_cnt") == 1).drop("_cnt"), cfg)
    multi = joined.filter(F.col("_cnt") > 1).drop("_cnt")
    folded_m = multi.repartition(cfg.fold_parallelism, "url").mapInPandas(
        make_merged_partition_fold(cfg), schema=FOLD_SCHEMA
    )
    return singles.unionByName(folded_m)
