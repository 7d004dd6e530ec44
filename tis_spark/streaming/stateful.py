"""Per-key CDC state as a *continuous* Structured Streaming operator.

The reference holds one in-heap entry per primary key while its listener
runs (``pojoMap``/``pojoQueue``, BasicRMListener.java:183-185,626-660) and
folds every arriving event into it (V1 per-PK coalescing + V3/V5/V6
versioning).  The engine's production path re-expresses that per micro-batch
(fold + MERGE into the lake — cdc/pipeline.py), which is the shape that
scales: state lives in the table, not in executor memory.

This module is the *other* idiomatic Spark expression of the same machine:
``groupBy(key).applyInPandasWithState`` keeps the per-key row in the Spark
state store and folds each micro-batch's events into it, emitting the
updated row downstream (outputMode=update) — a continuous changelog of
current rows, useful when the consumer is another stream rather than a
table.  Semantics are pinned to the same ``fold_key_events`` the batch
engine and the replay oracle share, so the three paths cannot drift.

Scale notes: state is O(live keys) in the state store (RocksDB-backed on a
real cluster), events cross into Python Arrow-batched per key group.  The
lake/MERGE path stays the recommended 10^10-row shape; this operator's
niche is bounded key cardinality with downstream streaming consumers.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tis_spark.cdc.fold import FLAT_FOLD_COLS, _opt_float, _opt_int, flatten_changes
from tis_spark.cdc.semantics import CdcConfig, fold_key_events

STATEFUL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts_us", T.LongType()),
        T.StructField("fetch_status", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("last_seq", T.LongType()),
        T.StructField("exists", T.BooleanType(), False),
        T.StructField("n_folds", T.LongType(), False),
    ]
)

# (warc_ts_us, fetch_status, score, last_seq, exists, n_folds)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("warc_ts_us", T.LongType()),
        T.StructField("fetch_status", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("last_seq", T.LongType()),
        T.StructField("exists", T.BooleanType()),
        T.StructField("n_folds", T.LongType()),
    ]
)


def make_stateful_fold(cfg: CdcConfig):
    """Build the applyInPandasWithState function: fold this batch's events
    for one key over the stored state row via ``fold_key_events`` (the
    single semantic core), update the state, emit the current row."""

    def fn(key: tuple, pdfs, state: GroupState):
        url = key[0]
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        # seq order within the batch (the reorder the engine's watermark
        # buffer does globally); duplicate seqs within a batch dedup here.
        # Cross-batch redelivery protection comes from the checkpointed
        # source (Structured Streaming replays whole committed batches,
        # never individual events) — an at-least-once source that re-emits
        # an old seq as NEW data would re-fold it (rectification tick),
        # exactly as the reference re-applies a replayed binlog row.
        pdf = pdf.sort_values("seq", kind="stable").drop_duplicates(subset=["seq"])

        stored = None
        last_seq = None
        n_folds = 0
        if state.exists:
            wts, fs, sc, last_seq, existed, n_folds = state.get
            if existed:
                stored = {
                    "url": url,
                    "warc_ts": wts,
                    "html": None,
                    "lang": None,
                    "fetch_status": fs,
                    "score": sc,
                }
        events = [
            {
                "op": r.op,
                "url": url,
                "seq": int(r.seq),
                "schema_version": int(r.sv),
                "invalid": bool(r.invalid),
                "noop": bool(r.noop),
                "after": {
                    "url": url,
                    "warc_ts": _opt_int(r.a_warc_ts_us),
                    "html": None,
                    "lang": None,
                    "fetch_status": _opt_int(r.a_fetch_status),
                    "score": _opt_float(r.a_score),
                },
            }
            for r in pdf.itertuples()
        ]
        row, action, counters = fold_key_events(stored, events, cfg)
        n_folds += counters["n_events"]
        if action == "U":
            ls = row.get("_seq")  # seq 0 is a valid seq — only None is absent
            last_seq = ls if ls is not None else last_seq
            new = (
                int(row["warc_ts"]),
                _opt_int(row["fetch_status"]),
                _opt_float(row["score"]),
                last_seq,
                True,
                n_folds,
            )
        elif action == "D":
            # tombstone provenance: the changelog row carries the seq of the
            # latest delete event in the batch (the fold ended deleted, so a
            # delete was the last state-changing event), not the seq of the
            # final pre-delete update
            d_seqs = [e["seq"] for e in events if e["op"] == "D"]
            if d_seqs:
                last_seq = max(d_seqs)
            new = (None, None, None, last_seq, False, n_folds)
        else:  # N: state unchanged (but fold count advances)
            if stored is None:
                new = (None, None, None, last_seq, False, n_folds)
            else:
                new = (
                    int(stored["warc_ts"]),
                    _opt_int(stored["fetch_status"]),
                    _opt_float(stored["score"]),
                    last_seq,
                    True,
                    n_folds,
                )
        state.update(new)
        yield pd.DataFrame(
            {
                "url": [url],
                "warc_ts_us": pd.Series([new[0]], dtype="Int64"),
                "fetch_status": pd.Series([new[1]], dtype="Int64"),
                "score": pd.Series([new[2]], dtype="float64"),
                "last_seq": pd.Series([new[3]], dtype="Int64"),
                "exists": [new[4]],
                "n_folds": pd.Series([new[5]], dtype="int64"),
            }
        )

    return fn


def stateful_fold_stream(changes: DataFrame, cfg: CdcConfig | None = None) -> DataFrame:
    """Streaming changes (CHANGE_SCHEMA) -> continuous per-key current-row
    changelog.  Flattening (P5/P6 predicates, payload stripped) is pure
    Catalyst; only the per-key fold crosses into Python, Arrow-batched."""
    cfg = cfg or CdcConfig()
    flat = flatten_changes(changes, cfg).select(*FLAT_FOLD_COLS)
    return flat.groupBy("url").applyInPandasWithState(
        make_stateful_fold(cfg),
        outputStructType=STATEFUL_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
