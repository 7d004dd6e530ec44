"""Deterministic synthetic fixtures per FIXTURES.md.

F1 ``pages``        — Common-Crawl-style web pages (target table shape).
F2 ``page_changes`` — binlog-shaped change stream (the reference's DTO,
                      SURVEY.md §1.1: tis-manage-pojo/.../DTO.java:28-114,
                      re-expressed as a typed struct stream).
F3 schema-evolution script (DDL events embedded in F2).

Every value is a pure function of (seed, row_index) via a splitmix64-style
mixer — no wall clock, no stateful PRNG — so generation is
embarrassingly parallel (mapInPandas over spark.range) and reproducible at
any scale factor.  Hot-domain skew is Zipf(s=1.2) over 1000 domains
(load-bearing: exercises the salted-repartition path, SURVEY §2 K3/M6).
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---------------------------------------------------------------- mixing

_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xBF58476D1CE4E5B9)
_M3 = np.uint64(0x94D049BB133111EB)


def mix64(x: np.ndarray, stream: int) -> np.ndarray:
    """splitmix64 finalizer over uint64 indices; `stream` decorrelates uses."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + _M1 * np.uint64(stream * 2 + 1)
        z = (z ^ (z >> np.uint64(30))) * _M2
        z = (z ^ (z >> np.uint64(27))) * _M3
        return z ^ (z >> np.uint64(31))


def u01(x: np.ndarray, stream: int) -> np.ndarray:
    return mix64(x, stream).astype(np.float64) / 2.0**64


# ---------------------------------------------------------------- domains

N_DOMAINS = 1000
_ranks = np.arange(1, N_DOMAINS + 1, dtype=np.float64)
_w = 1.0 / _ranks**1.2  # Zipf(s=1.2)
ZIPF_CDF = np.cumsum(_w) / _w.sum()

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo "
    "consequat duis aute irure in reprehenderit voluptate velit esse cillum "
    "eu fugiat nulla pariatur excepteur sint occaecat cupidatat non proident "
    "sunt culpa qui officia deserunt mollit anim id est laborum mundi"
).split()
assert len(_WORDS) == 64


def _domain(j: np.ndarray, seed: int) -> np.ndarray:
    u = u01(j ^ np.uint64(seed * 7919), 11)
    idx = np.searchsorted(ZIPF_CDF, u)
    return idx  # domain index; formatted lazily as d{idx}.example.org


# ---------------------------------------------------------------- html/text


def _paragraph(j: int, s: int, p: int, seed: int) -> str:
    h = int(mix64(np.uint64(((j * 1_000_003 + s) * 31 + p) & 0xFFFFFFFFFFFFFFFF), 13 + seed % 97)[()])
    n_words = 6 + (h & 7)
    return " ".join(_WORDS[(h >> (5 * k + 3)) & 63] for k in range(n_words))


def make_html(j: int, s: int, seed: int) -> bytes:
    h = int(mix64(np.uint64((j * 2_654_435_761 + s) & 0xFFFFFFFFFFFFFFFF), 17 + seed % 89)[()])
    n_par = 1 + (h % 12)
    body = "".join(f"<p>{_paragraph(j, s, p, seed)}</p>" for p in range(n_par))
    return f"<html><head><title>T{j}v{s}</title></head><body>{body}</body></html>".encode()


_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.S)
_PARA_RE = re.compile(r"<p>(.*?)</p>", re.S)


def extract_text(html: bytes | None) -> str | None:
    """Deterministic HTML -> text: title + "\\n" + paragraphs joined by
    "\\n", NFC-normalized, no trailing whitespace (FIXTURES.md F1 — the
    byte-identical per-url invariant from BASELINE.json input_hint)."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    m = _TITLE_RE.search(s)
    parts = [m.group(1)] if m else []
    parts.extend(_PARA_RE.findall(s))
    return unicodedata.normalize("NFC", "\n".join(parts)).rstrip()


# ---------------------------------------------------------------- schemas

PAGE_FIELDS = [
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("lang", T.StringType()),
    # schema-evolution columns (F3): appear from schema_version >=2 / >=4.
    # The stream struct is pre-widened (long/double); the registry governs
    # the narrower physical type the table stores at each version.
    T.StructField("fetch_status", T.LongType()),
    T.StructField("score", T.DoubleType()),
]
PAGE_STRUCT = T.StructType(PAGE_FIELDS)

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("delivery_key", T.LongType(), False),
        T.StructField("op", T.StringType(), False),  # I | U | D | DDL
        T.StructField("ts_ms", T.TimestampType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("schema_version", T.IntegerType(), False),
        T.StructField("ddl", T.StringType()),
        T.StructField("before", PAGE_STRUCT),
        T.StructField("after", PAGE_STRUCT),
        T.StructField("epoch_hint", T.IntegerType(), False),
    ]
)

# F3 schema-evolution script: registry versions mirroring the reference's
# widening lattice (SURVEY §1.4, ColumnMetaData TypeVisitor).
SCHEMA_SCRIPT = [
    (2, "ADD COLUMN fetch_status int"),
    (3, "ALTER COLUMN fetch_status TYPE bigint"),
    (4, "ADD COLUMN score float"),
    (5, "ALTER COLUMN score TYPE double"),
]

EPOCH0_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z
DISORDER_WINDOW = 1000  # F2: delivery order = seq permuted within W
BLOCK = 1000
_OPS_BASE = np.array(["I"] * 600 + ["U"] * 350 + ["D"] * 50)

MISSING_URL_BASE = 10**12  # update/delete targets never inserted (V7 path)


def ddl_positions(n_events: int) -> list[int]:
    """Fixed seqs where the 4 DDL events land (20/40/60/80% of the run)."""
    if n_events < 50:
        return []
    return [max(2, int(n_events * f)) for f in (0.2, 0.4, 0.6, 0.8)]


def _block_ops(block: int, seed: int) -> np.ndarray:
    keys = mix64(np.uint64(block) * np.uint64(BLOCK) + np.arange(BLOCK, dtype=np.uint64), 23 + seed)
    return _OPS_BASE[np.argsort(keys, kind="stable")]


def _inserts_before(seqs: np.ndarray, seed: int) -> np.ndarray:
    """#INSERT events with seq' < seq — closed form per block + prefix scan.

    seq is 1-based; event seq s sits at block s0//BLOCK, offset s0%BLOCK
    with s0 = s-1.  Full blocks contribute 600 inserts each.
    """
    out = np.empty(len(seqs), dtype=np.int64)
    s0 = seqs - 1
    blocks = s0 // BLOCK
    for b in np.unique(blocks):
        m = blocks == b
        ops = _block_ops(int(b), seed)
        csum = np.cumsum(ops == "I")
        off = s0[m] % BLOCK
        prefix = np.where(off > 0, csum[np.maximum(off - 1, 0)], 0)
        out[m] = int(b) * 600 + prefix
    return out


def _page_row(j: int, s: int, sv: int, seed: int, with_html: bool = True) -> dict:
    d = int(_domain(np.array([j & 0xFFFFFFFFFFFFFFFF], dtype=np.uint64), seed)[0])
    url = f"https://d{d}.example.org/p{j}"
    h = mix64(np.uint64((j * 31 + s) & 0xFFFFFFFFFFFFFFFF), 29 + seed)
    u = float(h) / 2.0**64
    lang = "en" if u < 0.7 else ("de" if u < 0.8 else ("fr" if u < 0.9 else "zh"))
    row = {
        "url": url,
        "warc_ts": None,  # filled by caller (version column)
        "html": make_html(j, s, seed) if with_html else None,
        "lang": lang,
        "fetch_status": int(h % np.uint64(1000)) if sv >= 2 else None,
        # multiples of 0.25: exactly representable in float32 (the column's
        # physical type at schema v4) so the widened readback is lossless
        "score": int(h % np.uint64(512)) / 4.0 if sv >= 4 else None,
    }
    return row


def _gen_changes_pdf(seqs: np.ndarray, n_events: int, seed: int, epoch_size: int) -> pd.DataFrame:
    ddls = ddl_positions(n_events)
    ddl_arr = np.array(ddls, dtype=np.int64)
    rows = []
    blocks = (seqs - 1) // BLOCK
    ops_cache: dict[int, np.ndarray] = {}
    ins_before = _inserts_before(seqs, seed)
    for i, s in enumerate(seqs):
        s = int(s)
        b = int(blocks[i])
        if b not in ops_cache:
            ops_cache[b] = _block_ops(b, seed)
        sv = 1 + int(np.searchsorted(ddl_arr, s, side="right")) if len(ddl_arr) else 1
        ts_ms = EPOCH0_MS + s * 100
        h = int(mix64(np.uint64(s), 37 + seed)[()])
        delivery_key = s + (h % DISORDER_WINDOW)
        base = {
            "seq": s,
            "delivery_key": delivery_key,
            "ts_ms": pd.Timestamp(ts_ms, unit="ms", tz="UTC"),
            "table": "pages",
            "schema_version": sv,
            "ddl": None,
            "before": None,
            "after": None,
            "epoch_hint": s // max(epoch_size, 1),
        }
        if s in ddls:
            k = ddls.index(s)
            rows.append({**base, "op": "DDL", "ddl": SCHEMA_SCRIPT[k][1], "schema_version": sv})
            continue
        op = ops_cache[b][(s - 1) % BLOCK]
        nb = int(ins_before[i])
        # version column (warc_ts): mostly increasing with seq; 2% regress
        # <=30min (rectification V6), 0.5% regress >30min (dirty-drop V3).
        u_reg = (h >> 8) % 1000
        warc_ms = ts_ms
        if u_reg < 20:
            warc_ms -= 60_000 + (h >> 18) % 1_720_000  # 1..~29.7 min back
        elif u_reg < 25:
            warc_ms -= 2_000_000 + (h >> 18) % 5_000_000  # >30 min back
        warc = pd.Timestamp(warc_ms, unit="ms", tz="UTC")
        if op == "I":
            j = nb  # the nb-th insert creates url_j (0-based)
            after = _page_row(j, s, sv, seed)
            after["warc_ts"] = warc
            rows.append({**base, "op": "I", "after": after})
        else:
            u_tgt = ((h >> 24) & 0xFFFF) / 65536.0
            if nb == 0 or ((h >> 40) % 100) == 0:
                j = MISSING_URL_BASE + (h % 1000)  # never-inserted target (V7)
            else:
                j = int(nb * (u_tgt**3))  # skew toward early (hot) urls
                j = min(j, nb - 1)
            if op == "D":
                before = _page_row(j, s - 1, sv, seed, with_html=False)
                before["warc_ts"] = warc
                rows.append({**base, "op": "D", "before": before})
            else:
                noop = ((h >> 48) % 100) == 0  # ~1% change no column (P5)
                after = _page_row(j, s, sv, seed)
                after["warc_ts"] = warc
                if noop:
                    before = dict(after)
                else:
                    before = _page_row(j, max(s - 7, 0), sv, seed)
                    before["warc_ts"] = pd.Timestamp(warc_ms - 700, unit="ms", tz="UTC")
                rows.append({**base, "op": "U", "before": before, "after": after})
    return pd.DataFrame(rows)


def gen_page_changes(
    spark: SparkSession,
    n_events: int,
    seed: int = 42,
    epoch_size: int = 2000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic binlog-shaped change stream (F2).

    seq is a strictly monotonic global sequence 1..N; delivery order
    (``delivery_key``) permutes seq within DISORDER_WINDOW.
    """
    num_partitions = num_partitions or max(spark.sparkContext.defaultParallelism, 4)

    def gen(iterator):
        for pdf in iterator:
            seqs = pdf["id"].to_numpy() + 1
            yield _gen_changes_pdf(seqs, n_events, seed, epoch_size)

    rng = spark.range(0, n_events, numPartitions=num_partitions)
    return rng.mapInPandas(gen, schema=CHANGE_SCHEMA)


def gen_pages(spark: SparkSession, n_pages: int, seed: int = 42, num_partitions: int | None = None) -> DataFrame:
    """F1 pages table: one row per url_j, j in [0, n_pages)."""
    num_partitions = num_partitions or max(spark.sparkContext.defaultParallelism, 4)

    def gen(iterator):
        for pdf in iterator:
            rows = []
            for j in pdf["id"].to_numpy():
                j = int(j)
                r = _page_row(j, 0, 1, seed)
                h = int(mix64(np.uint64(j), 41 + seed)[()])
                r["warc_ts"] = pd.Timestamp(EPOCH0_MS + h % (365 * 86_400_000), unit="ms", tz="UTC")
                r["text"] = extract_text(r["html"])
                rows.append({k: r[k] for k in ("url", "warc_ts", "html", "text", "lang")})
            yield pd.DataFrame(rows)

    return spark.range(0, n_pages, numPartitions=num_partitions).mapInPandas(gen, schema=PAGE_SCHEMA)
