"""Per-key LWW fold as a Spark stage.

The change batch is flattened JVM-side (no-op / invalid predicates are
Catalyst expressions, not Python), joined against the stored rows of the
touched buckets, then folded per key inside an Arrow-batched
``applyInPandas``.  Groups are hash-salted (``fold_parallelism`` groups,
decoupled from the storage bucket count) so a hot domain cannot serialize
the fold — the reference's random 16-way fan-out (K3) generalized to
salted repartitioning per the north rule.

Inside the pandas fold there are two paths:

* **Vectorized singles path**: keys with exactly one event in the batch
  (the overwhelming majority once per-key coalescing has happened) are
  folded with numpy mask arithmetic — no per-row Python.  The mask
  algebra mirrors ``fold_key_events`` case-for-case (V3/V5/V6/V7/V8/P5
  semantics); ``tests/test_cdc_replay.py`` pins the equivalence against
  the sequential oracle, and test_fold_paths_agree cross-checks the two
  paths directly.
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

FOLD_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts_us", T.LongType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("lang", T.StringType()),
        T.StructField("fetch_status", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("action", T.StringType(), False),
        T.StructField("min_seq", T.LongType()),
        T.StructField("max_seq", T.LongType()),
    ]
    + [T.StructField(c, T.LongType(), False) for c in COUNTER_NAMES]
)


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
        ((F.col("op") == "U") & F.col("before").isNull()).alias("invalid"),
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
    u_invalid = is_u & invalid
    u_noop = is_u & noop & ~u_invalid
    row_ev = (is_i | is_u) & ~u_invalid & ~u_noop
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
    out: dict[str, object] = {"url": pdf["url"].to_numpy(dtype=object)}
    ver_obj = np.empty(n, dtype=object)
    ver_mask = exists_after & ~np.isnan(version)
    ver_obj[ver_mask] = version[ver_mask].astype(np.int64)
    out["warc_ts_us"] = _clean_obj(ver_obj)
    for f in CONTENT_FIELDS:
        af, sf = _obj(pdf[f"a_{f}"]), _obj(pdf[f"s_{f}"])
        has_f = sv >= FIELD_SINCE[f]
        val = np.where(
            create,
            np.where(has_f, af, None),
            np.where(applied & has_f, af, np.where(del_hit, None, sf)),
        )
        out[f] = _clean_obj(val)
    out["fetch_status"] = out.pop("fetch_status").map(_opt_int)
    out["score"] = out.pop("score").map(_opt_float)
    out["action"] = pd.Series(action, dtype=object)
    seq = pdf["seq"].to_numpy(dtype=np.int64)
    out["min_seq"] = seq
    out["max_seq"] = seq

    counters = {
        "n_events": np.ones(n, dtype=np.int64),
        "n_applied": applied,
        "n_noop": u_noop,
        "n_invalid": u_invalid,
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
    cols = {"url": out["url"], **{k: out[k] for k in out if k != "url"}}
    return pd.DataFrame(cols)


def fold_multi(pdf: pd.DataFrame, cfg: CdcConfig) -> pd.DataFrame:
    """Sequential fold for keys with >1 event (shares fold_key_events with
    the replay oracle — the paths cannot drift)."""
    out: dict[str, list] = {f.name: [] for f in FOLD_SCHEMA.fields}
    arrs = {
        c: pdf[c].to_numpy(dtype=object)
        for c in (
            "url", "seq", "op", "sv", "invalid", "noop",
            "a_warc_ts_us", "a_html", "a_lang", "a_fetch_status", "a_score",
            "s_warc_ts_us", "s_html", "s_lang", "s_fetch_status", "s_score",
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
                "html": arrs["s_html"][lo],
                "lang": arrs["s_lang"][lo],
                "fetch_status": _opt_int(arrs["s_fetch_status"][lo]),
                "score": _opt_float(arrs["s_score"][lo]),
            }
        events = [
            {
                "op": arrs["op"][i],
                "url": url,
                "schema_version": int(arrs["sv"][i]),
                "invalid": bool(arrs["invalid"][i]),
                "noop": bool(arrs["noop"][i]),
                "after": {
                    "url": url,
                    "warc_ts": _opt_int(arrs["a_warc_ts_us"][i]),
                    "html": arrs["a_html"][i],
                    "lang": arrs["a_lang"][i] if isinstance(arrs["a_lang"][i], str) else None,
                    "fetch_status": _opt_int(arrs["a_fetch_status"][i]),
                    "score": _opt_float(arrs["a_score"][i]),
                },
            }
            for i in range(lo, hi)
        ]
        row, action, counters = fold_key_events(stored, events, cfg)
        out["url"].append(url)
        out["warc_ts_us"].append(row["warc_ts"] if row else None)
        out["html"].append(row["html"] if row else None)
        out["lang"].append(row["lang"] if row else None)
        out["fetch_status"].append(row["fetch_status"] if row else None)
        out["score"].append(row["score"] if row else None)
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
        return res[col_order]

    return fold_pdf


STORED_COLS = ["s_warc_ts_us", "s_html", "s_lang", "s_fetch_status", "s_score"]


def make_partition_fold(cfg: CdcConfig):
    """Partition-level fold for mapInPandas: the partition holds *all*
    events and stored rows of its keys (explicit hash repartition by url),
    so the stored-row lookup is an in-memory pandas merge — no Spark join
    stage, no second shuffle of the widest (html-carrying) rows."""
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


def fold_changes(flat: DataFrame, stored: DataFrame, cfg: CdcConfig) -> DataFrame:
    """Fold flattened changes over stored rows, one output row per key.

    ``stored`` must have columns (url, s_warc_ts_us, s_html, s_lang,
    s_fetch_status, s_score).  Execution: tag the two sides, union, ONE
    hash repartition on the key (``fold_parallelism`` partitions — the
    key-partitioned merge the north rule asks for; an explicit
    ``repartition`` is never skew-split by AQE, which would scatter a
    key's rows), then a partition-level Arrow-batched fold.  Hot keys are
    bounded by the vectorized fold (per-event cost is numpy-level), not by
    partition splitting.
    """
    tagged = flat.withColumn("_side", F.lit(1)).unionByName(
        stored.withColumn("_side", F.lit(0)), allowMissingColumns=True
    )
    parts = tagged.repartition(cfg.fold_parallelism, "url")
    return parts.mapInPandas(make_partition_fold(cfg), schema=FOLD_SCHEMA)
