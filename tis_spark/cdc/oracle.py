"""Replay oracle: pure-Python sequential application of the change stream.

Replays ALL events in strict global seq order against an in-memory dict —
the ground truth the distributed engine must match exactly (row count,
schema, values, byte-identical text).  It calls the same
``fold_key_events`` the Spark fold uses (one event at a time), so the
semantics literally cannot drift; what the oracle independently verifies is
the engine's *distribution*: watermark reorder buffering, per-key folding,
bucketed copy-on-write merge, epoch fencing, and schema evolution timing.

Modeled on the reference's golden-document integration tests
(TestS4totalpayIncr.java:80-143 — synthetic binlog in, asserted final
document out).
"""

from __future__ import annotations

import pandas as pd

from tis_spark.cdc.semantics import CONTENT_FIELDS, FIELD_SINCE, CdcConfig, fold_key_events
from tis_spark.fixtures.gen import extract_text


def _image(struct_row, sv: int) -> dict | None:
    if struct_row is None:
        return None
    d = struct_row.asDict() if hasattr(struct_row, "asDict") else dict(struct_row)
    ts = d.get("warc_ts")
    if ts is not None:
        ts = pd.Timestamp(ts)
        if ts.tzinfo is None:
            ts = ts.tz_localize("UTC")
        ts = int(ts.value // 1000)  # epoch micros
    return {
        "url": d.get("url"),
        "warc_ts": ts,
        "html": bytes(d["html"]) if d.get("html") is not None else None,
        "lang": d.get("lang"),
        "fetch_status": int(d["fetch_status"]) if d.get("fetch_status") is not None else None,
        "score": float(d["score"]) if d.get("score") is not None else None,
    }


def replay_oracle(event_rows: list, cfg: CdcConfig | None = None) -> pd.DataFrame:
    """event_rows: collected Spark Rows (or dicts) of CHANGE_SCHEMA.
    Returns the expected final table as a pandas DataFrame sorted by url,
    with warc_ts in epoch micros and text derived from html."""
    cfg = cfg or CdcConfig()
    state: dict[str, dict] = {}
    rows = sorted(event_rows, key=lambda r: r["seq"])
    max_sv = 1
    for r in rows:
        d = r.asDict(recursive=False) if hasattr(r, "asDict") else dict(r)
        if d["op"] == "DDL":
            max_sv = max(max_sv, int(d["schema_version"]))
            continue
        if d["table"] not in cfg.table_focus:
            continue
        sv = int(d["schema_version"])
        before = _image(d.get("before"), sv)
        after = _image(d.get("after"), sv)
        url = (after or before or {}).get("url")
        if url is None:
            continue
        noop = False
        if d["op"] == "U" and before is not None and after is not None:
            noop = all(before.get(f) == after.get(f) for f in CONTENT_FIELDS)
        ev = {
            "op": d["op"],
            "url": url,
            "schema_version": sv,
            "invalid": (d["op"] == "U" and before is None)
            or (d["op"] in ("I", "U") and (after is None or after.get("warc_ts") is None)),
            "noop": noop,
            "after": after,
        }
        row, action, _ = fold_key_events(state.get(url), [ev], cfg)
        if action == "U":
            state[url] = row
        elif action == "D":
            state.pop(url, None)

    out = []
    for url in sorted(state):
        row = state[url]
        rec = {
            "url": url,
            "warc_ts_us": row["warc_ts"],
            "html": row["html"],
            "text": extract_text(row["html"]),
            "lang": row["lang"],
        }
        if max_sv >= 2:
            rec["fetch_status"] = row["fetch_status"]
        if max_sv >= 4:
            rec["score"] = row["score"]
        out.append(rec)
    return pd.DataFrame(out)
