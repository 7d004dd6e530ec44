"""Per-key LWW fold as a Spark stage.

The change batch is flattened JVM-side (no-op / invalid predicates are
Catalyst expressions, not Python), joined against the stored rows of the
touched buckets, then folded per key inside an Arrow-batched
``applyInPandas``.  Groups are hash-salted (``fold_parallelism`` groups,
decoupled from the storage bucket count) so a hot domain cannot serialize
the fold — the reference's random 16-way fan-out (K3) generalized to
salted repartitioning per the north rule.

Per-key event counts within one micro-batch are small by construction
(coalescing window), so the inner Python loop is O(batch) with Arrow doing
all the heavy marshalling.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tis_spark.cdc.semantics import CONTENT_FIELDS, COUNTER_NAMES, CdcConfig, fold_key_events

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


def make_fold_fn(cfg: CdcConfig):
    counter_names = list(COUNTER_NAMES)

    def fold_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
        # seq is globally unique; dropping duplicates makes re-delivered
        # events (crash replay overlap) idempotent inside the fold.
        pdf = pdf.sort_values(["url", "seq"], kind="stable").drop_duplicates(subset=["seq"])
        out: dict[str, list] = {f.name: [] for f in FOLD_SCHEMA.fields}
        for url, g in pdf.groupby("url", sort=False):
            first = g.iloc[0]
            stored = None
            if not pd.isna(first.get("s_warc_ts_us")):
                stored = {
                    "url": url,
                    "warc_ts": int(first["s_warc_ts_us"]),
                    "html": first["s_html"],
                    "lang": first["s_lang"],
                    "fetch_status": _opt_int(first["s_fetch_status"]),
                    "score": _opt_float(first["s_score"]),
                }
            events = []
            for r in g.itertuples(index=False):
                events.append(
                    {
                        "op": r.op,
                        "url": url,
                        "schema_version": int(r.sv),
                        "invalid": bool(r.invalid),
                        "noop": bool(r.noop),
                        "after": {
                            "url": url,
                            "warc_ts": _opt_int(r.a_warc_ts_us),
                            "html": r.a_html,
                            "lang": r.a_lang if isinstance(r.a_lang, str) else None,
                            "fetch_status": _opt_int(r.a_fetch_status),
                            "score": _opt_float(r.a_score),
                        },
                    }
                )
            row, action, counters = fold_key_events(stored, events, cfg)
            out["url"].append(url)
            out["warc_ts_us"].append(row["warc_ts"] if row else None)
            out["html"].append(row["html"] if row else None)
            out["lang"].append(row["lang"] if row else None)
            out["fetch_status"].append(row["fetch_status"] if row else None)
            out["score"].append(row["score"] if row else None)
            out["action"].append(action)
            out["min_seq"].append(int(g["seq"].min()))
            out["max_seq"].append(int(g["seq"].max()))
            for c in counter_names:
                out[c].append(counters[c])
        return pd.DataFrame({k: pd.Series(v, dtype=object) for k, v in out.items()})

    return fold_pdf


def fold_changes(flat: DataFrame, stored: DataFrame, cfg: CdcConfig) -> DataFrame:
    """Join flattened changes with stored rows and fold per key.

    ``stored`` must have columns (url, s_warc_ts_us, s_html, s_lang,
    s_fetch_status, s_score).  Output: one row per key (FOLD_SCHEMA).
    """
    joined = flat.join(stored, "url", "left")
    salt = F.pmod(F.xxhash64("url"), F.lit(cfg.fold_parallelism))
    return joined.groupBy(salt.alias("_g")).applyInPandas(make_fold_fn(cfg), schema=FOLD_SCHEMA)
