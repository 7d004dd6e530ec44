"""Multimodal binary plumbing, part 2: frame sampling and resize.

Companions to mlops.py's ``multimodal_binary_meta`` / ``multimodal_decode
_stub``: image/audio/video content rides as opaque ``binary`` columns and
every transform is an Arrow-batched Python crossing (mapInPandas), never a
row-at-a-time UDF.  No media codec ships in this container, so — same
documented contract as the decode stub — the *decode* arithmetic is a
deterministic byte-level fake while the Spark-side plumbing (binary in,
Arrow batches, typed rows out, 1->N fan-out) is real, tested, and
oracle-checked: the fakes are pure byte arithmetic, so DuckDB can verify
them from the hex representation of the same bytes.

Scale shape: both operators are narrow maps over the scan (no shuffle);
frame sampling fans out one row per *sampled* frame, so the output volume
is input_bytes/(FRAME_BYTES*FRAME_STRIDE) rows — the downsampling happens
inside the first pass, never materializing the full frame set.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tis_spark.operators import load, query

FRAME_BYTES = 64  # fake fixed-size frame
FRAME_STRIDE = 2  # keep every 2nd frame

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("offset", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("first_byte", T.LongType()),
    ]
)


def _frame_sample(iterator):
    for pdf in iterator:
        out = {k: [] for k in ("doc_id", "frame_idx", "offset", "frame_len", "first_byte")}
        for d, b in zip(pdf["doc_id"], pdf["blob"]):
            n = len(b)
            n_frames = (n + FRAME_BYTES - 1) // FRAME_BYTES
            for i in range(0, n_frames, FRAME_STRIDE):
                off = i * FRAME_BYTES
                out["doc_id"].append(d)
                out["frame_idx"].append(i)
                out["offset"].append(off)
                out["frame_len"].append(min(FRAME_BYTES, n - off))
                out["first_byte"].append(b[off])
        yield pd.DataFrame(out)


@query(
    "multimodal_frame_sample",
    f"""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      FROM documents
    ),
    f AS (
      SELECT doc_id, hx, n,
             unnest(generate_series(0,
               CAST(ceil(n / {FRAME_BYTES}.0) AS BIGINT) - 1, {FRAME_STRIDE})) AS i
      FROM b
    )
    SELECT doc_id,
           i AS frame_idx,
           i * {FRAME_BYTES} AS offset,
           CASE WHEN n - i * {FRAME_BYTES} >= {FRAME_BYTES}
                THEN {FRAME_BYTES} ELSE n - i * {FRAME_BYTES} END AS frame_len,
           (instr('0123456789ABCDEF', substr(hx, i * {FRAME_BYTES * 2} + 1, 1)) - 1) * 16
             + instr('0123456789ABCDEF', substr(hx, i * {FRAME_BYTES * 2} + 2, 1)) - 1
             AS first_byte
    FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque media bytes: treat the blob as
    fixed-64-byte (FRAME_BYTES) frames and emit every 2nd (FRAME_STRIDE) one as
    a typed row (doc, frame_idx, offset, len, probe byte) — the
    video-frame-sample / audio-chunk shape, with the 1->N mapInPandas
    fan-out happening inside the scan pass so unsampled frames are never
    materialized."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )
    return docs.mapInPandas(_frame_sample, schema=_FRAME_SCHEMA)


SIG_POINTS = 16  # resize target: 16 sample points

_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("stride", T.LongType()),
        T.StructField("sig16", T.StringType()),
    ]
)


def _resize_sig(iterator):
    for pdf in iterator:
        keep = {"doc_id": [], "stride": [], "sig16": []}
        for d, b in zip(pdf["doc_id"], pdf["blob"]):
            n = len(b)
            if n < SIG_POINTS:
                continue
            stride = n // SIG_POINTS
            sig = bytes(b[j * stride] for j in range(SIG_POINTS)).hex().upper()
            keep["doc_id"].append(d)
            keep["stride"].append(stride)
            keep["sig16"].append(sig)
        yield pd.DataFrame(keep)


@query(
    "multimodal_resize_stub",
    f"""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      FROM documents
    ),
    p AS (
      SELECT doc_id, n // {SIG_POINTS} AS stride, hx,
             unnest(generate_series(0, {SIG_POINTS - 1})) AS j
      FROM b WHERE n >= {SIG_POINTS}
    )
    SELECT doc_id, stride,
           string_agg(substr(hx, j * stride * 2 + 1, 2), '' ORDER BY j) AS sig16
    FROM p GROUP BY doc_id, stride
    """,
)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample plumbing: reduce each blob to a fixed
    16-point (SIG_POINTS) byte signature (every (n//16)-th byte, hex)
    — the thumbnail-shaped fixed-size output of a real resize, as pure
    byte arithmetic.  Arrow-batched mapInPandas; blobs shorter than
    16 bytes are skipped (filter inside the batch, mirrored by
    the oracle's WHERE)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("blob")
    )
    return docs.mapInPandas(_resize_sig, schema=_RESIZE_SCHEMA)
