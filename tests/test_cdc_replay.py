"""End-to-end CDC replay vs the sequential oracle.

Mirrors the reference's golden-document integration tests (SURVEY §5.1):
synthetic binlog in, asserted final state out — including derived columns
(extracted text) and version stamps (warc_ts after LWW + rectification).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tis_spark.cdc import CdcConfig, CdcIngest
from tis_spark.cdc.oracle import replay_oracle
from tis_spark.fixtures.gen import CHANGE_SCHEMA, gen_page_changes

UTC = dt.timezone.utc


def _ts(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1, tzinfo=UTC) + dt.timedelta(seconds=s)


def _page(url: str, ver_s: float, html: bytes | None = b"<html><head><title>t</title></head><body><p>x</p></body></html>", lang="en", fetch_status=None, score=None):
    return {
        "url": url,
        "warc_ts": _ts(ver_s),
        "html": html,
        "lang": lang,
        "fetch_status": fetch_status,
        "score": score,
    }


def _ev(seq, op, after=None, before=None, sv=1, ddl=None, ts_s=None):
    return {
        "seq": seq,
        "delivery_key": seq,
        "op": op,
        "ts_ms": _ts(ts_s if ts_s is not None else seq),
        "table": "pages",
        "schema_version": sv,
        "ddl": ddl,
        "before": before,
        "after": after,
        "epoch_hint": 0,
    }


def _final_pdf(ingest) -> pd.DataFrame:
    df = ingest.final_state().withColumn("warc_ts_us", F.unix_micros("warc_ts")).drop("warc_ts")
    pdf = df.toPandas().sort_values("url").reset_index(drop=True)
    return pdf


def _compare(engine: pd.DataFrame, oracle: pd.DataFrame):
    assert len(engine) == len(oracle), f"row count {len(engine)} != {len(oracle)}"
    oracle = oracle.sort_values("url").reset_index(drop=True)
    for col in oracle.columns:
        assert col in engine.columns, f"missing column {col}"
        e = engine[col]
        o = oracle[col]
        for i in range(len(oracle)):
            ev, ov = e.iloc[i], o.iloc[i]
            if pd.isna(ov) and (ev is None or pd.isna(ev)):
                continue
            if isinstance(ov, bytes):
                ev = bytes(ev)
            assert ev == ov, f"{col}[{i}] ({oracle['url'].iloc[i]}): engine={ev!r} oracle={ov!r}"


def test_handwritten_corners(spark, tmp_table_dir):
    """LWW, rectification, dirty drop, no-op suppression, invalid update,
    missing-target update, delete-ignore — one tiny deterministic stream."""
    events = [
        _ev(1, "I", after=_page("https://a/1", 100)),
        # newer version wins
        _ev(2, "U", after=_page("https://a/1", 200, html=b"<html><head><title>v2</title></head><body><p>b</p></body></html>"), before=_page("https://a/1", 100)),
        # regressed <=30min -> rectified to stored+1s, content applies
        _ev(3, "U", after=_page("https://a/1", 200 - 600, html=b"<html><head><title>v3</title></head><body><p>c</p></body></html>"), before=_page("https://a/1", 200)),
        # regressed >30min -> dirty drop
        _ev(4, "U", after=_page("https://a/1", 200 - 4000, html=b"<html><head><title>bad</title></head><body><p>z</p></body></html>"), before=_page("https://a/1", 200)),
        # no-op update (before == after on content) -> suppressed
        _ev(5, "U", after=_page("https://a/1", 900), before=_page("https://a/1", 900)),
        # invalid update (no before) -> dropped
        _ev(6, "U", after=_page("https://a/1", 950)),
        # missing-target update -> reconstructed insert (content differs
        # from before-image so it is not suppressed as a no-op)
        _ev(7, "U", after=_page("https://b/2", 300, html=b"<html><head><title>b2</title></head><body><p>new</p></body></html>"), before=_page("https://b/2", 299)),
        # delete ignored under reference policy
        _ev(8, "D", before=_page("https://a/1", 0)),
        _ev(9, "I", after=_page("https://c/3", 400)),
    ]
    df = spark.createDataFrame(events, CHANGE_SCHEMA)
    cfg = CdcConfig(disorder_window=2, fold_parallelism=4, num_buckets=4)
    ingest = CdcIngest(spark, tmp_table_dir, cfg)
    ingest.process_epoch(df, 0, final_flush=True)
    engine = _final_pdf(ingest)
    oracle = replay_oracle(df.collect(), cfg)
    _compare(engine, oracle)
    # rectified version: stored 200s, event 3 regressed -> 201s
    a1 = engine[engine.url == "https://a/1"].iloc[0]
    assert a1["warc_ts_us"] == int(_ts(201).timestamp() * 1_000_000)
    assert b"v3" in bytes(a1["html"])  # regressed-but-rectified content wins
    assert len(engine) == 3  # delete ignored


def test_delete_policy_delete(spark, tmp_table_dir):
    events = [
        _ev(1, "I", after=_page("https://a/1", 100)),
        _ev(2, "I", after=_page("https://b/2", 100)),
        _ev(3, "D", before=_page("https://a/1", 100)),
    ]
    df = spark.createDataFrame(events, CHANGE_SCHEMA)
    cfg = CdcConfig(disorder_window=1, delete_policy="delete", fold_parallelism=4, num_buckets=4)
    ingest = CdcIngest(spark, tmp_table_dir, cfg)
    ingest.process_epoch(df, 0, final_flush=True)
    engine = _final_pdf(ingest)
    oracle = replay_oracle(df.collect(), cfg)
    _compare(engine, oracle)
    assert list(engine.url) == ["https://b/2"]


@pytest.mark.parametrize("n_events,epoch_size", [(3000, 700)])
def test_generated_replay_matches_oracle(spark, tmp_table_dir, n_events, epoch_size):
    """Full generated stream (disorder, skewed updates, regressions, DDL
    schema evolution, missing targets, no-ops) replayed in delivery-order
    epochs must equal the oracle's strict-seq-order replay."""
    changes = gen_page_changes(spark, n_events, seed=42, epoch_size=epoch_size)
    changes.cache()
    cfg = CdcConfig(fold_parallelism=8)
    ingest = CdcIngest(spark, tmp_table_dir, cfg)
    stats = ingest.replay(changes, epoch_size=epoch_size)
    assert sum(s.get("n_applied", 0) for s in stats) > 0
    engine = _final_pdf(ingest)
    oracle = replay_oracle(changes.collect(), cfg)
    _compare(engine, oracle)
    # schema evolved through the full script (4 DDL events in 3000 events)
    assert ingest.table.current_snapshot().schema_version == 5
    assert "fetch_status" in engine.columns and "score" in engine.columns
    changes.unpersist()


def test_metrics_and_lineage(spark, tmp_table_dir):
    changes = gen_page_changes(spark, 1500, seed=7, epoch_size=500)
    cfg = CdcConfig(fold_parallelism=8)
    ingest = CdcIngest(spark, tmp_table_dir, cfg)
    ingest.replay(changes, epoch_size=500)
    m = ingest.metrics().toPandas()
    assert len(m) > 0
    assert (m.n_events >= m.n_applied).all()
    assert m.min_seq.min() == 1
    # every committed epoch carries the fencing id
    epochs = [s.summary["epoch_id"] for s in ingest.table.history() if "epoch_id" in s.summary]
    assert epochs == sorted(epochs)
