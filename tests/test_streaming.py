"""Structured Streaming replay: exactly-once across kill/restart and
checkpoint loss (SURVEY §7.4 hard part #1)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tis_spark.cdc import CdcConfig
from tis_spark.cdc.oracle import replay_oracle
from tis_spark.fixtures.gen import gen_page_changes
from tis_spark.streaming import StreamingCdc, write_stream_chunks

N_EVENTS = 1200
CHUNK = 300


@pytest.fixture(scope="module")
def stream_source(spark):
    d = tempfile.mkdtemp(prefix="tis-stream-src-")
    changes = gen_page_changes(spark, N_EVENTS, seed=11, epoch_size=CHUNK)
    n = write_stream_chunks(changes, d, chunk_size=CHUNK)
    assert n >= 4
    yield d, changes.collect()
    shutil.rmtree(d, ignore_errors=True)


def _engine_pdf(s: StreamingCdc):
    return (
        s.final_state()
        .withColumn("warc_ts_us", F.unix_micros("warc_ts"))
        .drop("warc_ts")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


def _assert_matches_oracle(s: StreamingCdc, rows, cfg):
    oracle = replay_oracle(rows, cfg).sort_values("url").reset_index(drop=True)
    engine = _engine_pdf(s)
    assert len(engine) == len(oracle)
    import pandas as pd

    for col in oracle.columns:
        for i in range(len(oracle)):
            ev, ov = engine[col].iloc[i], oracle[col].iloc[i]
            e_na = not isinstance(ev, (bytes, bytearray)) and pd.isna(ev)
            o_na = not isinstance(ov, (bytes, bytearray)) and pd.isna(ov)
            if e_na and o_na:
                continue
            if isinstance(ov, bytes):
                ev = bytes(ev)
            assert ev == ov, f"{col}[{i}]: {ev!r} != {ov!r}"


def test_streaming_end_to_end(spark, stream_source, tmp_table_dir):
    src, rows = stream_source
    cfg = CdcConfig(fold_parallelism=8)
    s = StreamingCdc(spark, src, tmp_table_dir, cfg)
    assert s.run_available(max_files_per_trigger=1)
    s.drain()
    _assert_matches_oracle(s, rows, cfg)


def test_streaming_restart_midway(spark, stream_source, tmp_table_dir):
    """Kill the query after ~2 micro-batches; restart from checkpoint; the
    final state must still equal the oracle and no epoch double-applies."""
    src, rows = stream_source
    cfg = CdcConfig(fold_parallelism=8)
    s = StreamingCdc(spark, src, tmp_table_dir, cfg)
    # short timeout forces a stop partway through (simulated crash)
    s.run_available(max_files_per_trigger=1, timeout_s=12)
    epochs_before = [
        snap.summary["epoch_id"] for snap in s.ingest.table.history() if "epoch_id" in snap.summary
    ]
    # restart: same checkpoint, same table
    s2 = StreamingCdc(spark, src, tmp_table_dir, cfg, checkpoint_dir=s.checkpoint_dir)
    assert s2.run_available(max_files_per_trigger=1)
    s2.drain()
    _assert_matches_oracle(s2, rows, cfg)
    epochs_after = [
        snap.summary["epoch_id"] for snap in s2.ingest.table.history() if "epoch_id" in snap.summary
    ]
    assert epochs_after == sorted(set(epochs_after)), "an epoch committed twice"
    assert set(epochs_before).issubset(set(epochs_after))


def test_streaming_checkpoint_loss_refeed(spark, stream_source, tmp_table_dir):
    """Worst case: checkpoint wiped after a full run -> the whole stream is
    re-delivered. Sink-side fencing must no-op every batch."""
    src, rows = stream_source
    cfg = CdcConfig(fold_parallelism=8)
    s = StreamingCdc(spark, src, tmp_table_dir, cfg)
    assert s.run_available(max_files_per_trigger=2)
    s.drain()
    before = _engine_pdf(s)
    n_snaps = len(s.ingest.table.history())
    # wipe checkpoint -> batch ids restart at 0 -> all fenced
    shutil.rmtree(s.checkpoint_dir, ignore_errors=True)
    s3 = StreamingCdc(spark, src, tmp_table_dir, cfg)
    assert s3.run_available(max_files_per_trigger=2)
    after = _engine_pdf(s3)
    assert before.equals(after)
    # fenced batches commit nothing
    assert len(s3.ingest.table.history()) == n_snaps


FIXTURE_WIRE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "kafka_wire")


def test_kafka_wire_fixture_end_to_end(spark, tmp_table_dir):
    """Recorded Debezium-envelope wire capture (tests/fixtures/kafka_wire,
    re-recordable via tests/fixtures/record_kafka_wire.py — the standard
    2000-event / seed=99 / epoch=500 verify stream incl. its 4 DDLs)
    replayed through the identical parse->ingest chain the live-broker
    branch uses.  Pins the wire format (binary base64 envelope, ISO
    timestamps, PK-keyed records, offset ordering) end-to-end without a
    broker (S5; reference MQListenerFactory.java:32-66).

    The chunk mtimes are deliberately FLATTENED first — a fresh git
    checkout does the same — so the test also pins ensure_chunk_mtime_order:
    Spark's file stream breaks mtime ties arbitrarily, and an out-of-order
    chunk replay is whole-chunk disorder a real (offset-ordered) broker
    partition can never produce."""
    for f in sorted(os.listdir(FIXTURE_WIRE)):
        os.utime(os.path.join(FIXTURE_WIRE, f), (1_700_000_000, 1_700_000_000))
    cfg = CdcConfig(fold_parallelism=8)
    s = StreamingCdc(spark, FIXTURE_WIRE, tmp_table_dir, cfg, wire_format="kafka")
    assert s.run_available(max_files_per_trigger=2)
    s.drain()
    rows = gen_page_changes(spark, 2000, seed=99, epoch_size=500).collect()
    _assert_matches_oracle(s, rows, cfg)


def test_parse_kafka_events_roundtrip(spark):
    """Kafka-wire JSON envelope (binary base64, ISO timestamps) parses
    back to the exact CHANGE_SCHEMA rows that were encoded."""
    from tis_spark.streaming.stream import parse_kafka_events

    src = gen_page_changes(spark, 200, seed=3, epoch_size=100)
    wire = src.select(
        F.to_json(F.struct(*src.columns)).cast("binary").alias("value"),
        F.lit("pages-binlog").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("seq").alias("offset"),
    )
    back = parse_kafka_events(wire)
    # from_json is all-nullable by construction; names/types must match
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in src.schema.fields
    ]
    a = src.orderBy("seq").collect()
    b = back.orderBy("seq").collect()
    assert a == b


def test_ensure_chunk_mtime_order_unit(tmp_path):
    """Flattened (tied) mtimes get restamped strictly increasing in
    filename order; an already-unambiguous capture is left untouched; a
    read-only capture reports -1 instead of raising."""
    from tis_spark.streaming.stream import ensure_chunk_mtime_order

    d = tmp_path / "wire"
    d.mkdir()
    names = [f"chunk-{i:06d}.parquet" for i in range(4)]
    for n in names:
        (d / n).write_bytes(b"x")
        os.utime(d / n, (1_700_000_000, 1_700_000_000))
    assert ensure_chunk_mtime_order(str(d)) == 4
    mt = [os.stat(d / n).st_mtime for n in names]
    assert all(a < b for a, b in zip(mt, mt[1:]))
    assert ensure_chunk_mtime_order(str(d)) == 0  # now unambiguous

    for n in names:  # flatten again; emulate immutable storage
        os.utime(d / n, (1_700_000_000, 1_700_000_000))

    def _deny(*a, **kw):
        raise PermissionError("read-only capture")

    import tis_spark.streaming.stream as stream_mod

    orig = stream_mod.os.utime
    stream_mod.os.utime = _deny
    try:
        assert ensure_chunk_mtime_order(str(d)) == -1  # report, never raise
    finally:
        stream_mod.os.utime = orig


def test_streaming_views_stay_current(spark, stream_source, tmp_table_dir):
    """MaterializedViews attached to the stream refresh inside each
    foreachBatch: after the run + drain the view equals a full recompute,
    and its watermark sits at the table's current snapshot."""
    from tis_spark.lake.matview import MaterializedView

    src, rows = stream_source
    cfg = CdcConfig(fold_parallelism=8, delete_policy="delete")
    s = StreamingCdc(spark, src, tmp_table_dir, cfg)
    mv = MaterializedView.create(
        spark,
        tmp_table_dir + "_mv",
        s.ingest.table,
        ["lang"],
        {"n_pages": ("count", None), "max_ts": ("max", "warc_ts")},
    )
    mv.full_build()  # empty bootstrap; every batch arrives via refresh
    s.views.append(mv)
    assert s.run_available(max_files_per_trigger=1)
    s.drain()

    got = mv.read().orderBy("lang").collect()
    want = (
        s.final_state()
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.max("warc_ts").alias("max_ts"),
        )
        .orderBy("lang")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert mv._last_source_snapshot() == s.ingest.table.current_snapshot().snapshot_id
    assert mv.refresh()["up_to_date"]


def test_streaming_derived_index_stays_current(spark, stream_source, tmp_table_dir):
    """A DerivedIndex attached to the stream syncs inside each
    foreachBatch through the same views hook as matviews: after the run +
    drain, the maintained postings equal a fresh transform of the final
    table state, and the watermark sits at the current snapshot."""
    import tis_spark.operators.cdcfold  # noqa: F401 — registers the transform
    from tis_spark.lake.derived import TRANSFORMS, DerivedIndex

    src, rows = stream_source
    cfg = CdcConfig(fold_parallelism=8, delete_policy="delete")
    s = StreamingCdc(spark, src, tmp_table_dir, cfg)
    idx = DerivedIndex.create(
        spark,
        tmp_table_dir + "_idx",
        s.ingest.table,
        "pages_title_postings",
        ["url", "tok"],
    )
    idx.bootstrap()  # empty bootstrap; every batch arrives via sync
    s.views.append(idx)
    assert s.run_available(max_files_per_trigger=1)
    s.drain()

    got = sorted(tuple(r) for r in idx.read().collect())
    want = sorted(
        tuple(r)
        for r in TRANSFORMS["pages_title_postings"](s.final_state()).collect()
    )
    assert got == want and len(got) > 0
    assert (
        idx._last_source_snapshot()
        == s.ingest.table.current_snapshot().snapshot_id
    )
    assert idx.sync()["up_to_date"]


def test_streaming_attached_distribution_views(spark, tmp_table_dir):
    """Variance + histogram matviews attached mid-stream: created over
    the evolved schema after the first half (fetch_status DDLs at seqs
    240/480), then kept current by the per-batch refresh hook through
    the second half — whose updates/deletes retract through the signed
    power sums and bin counts with no recompute path, and whose score
    ADD/WIDEN DDLs (720/960) must not trip the drift check (score is not
    aggregated)."""
    from tis_spark.lake.matview import MaterializedView

    stage = tempfile.mkdtemp(prefix="tis-dist-stage-")
    src = tempfile.mkdtemp(prefix="tis-dist-src-")
    try:
        changes = gen_page_changes(spark, N_EVENTS, seed=23, epoch_size=CHUNK)
        n = write_stream_chunks(changes, stage, chunk_size=CHUNK)
        assert n >= 4
        h = n // 2
        for i in range(h):
            shutil.move(
                os.path.join(stage, f"chunk-{i:06d}.parquet"),
                os.path.join(src, f"chunk-{i:06d}.parquet"),
            )
        cfg = CdcConfig(fold_parallelism=8, delete_policy="delete")
        s = StreamingCdc(spark, src, tmp_table_dir, cfg)
        assert s.run_available(max_files_per_trigger=1)
        s.drain()

        mv = MaterializedView.create(
            spark,
            tmp_table_dir + "_mvd",
            s.ingest.table,
            ["lang"],
            {
                "n_pages": ("count", None),
                "var_fs": ("var_pop", "fetch_status"),
                "fs_hist": ("histogram", "fetch_status"),
            },
            hist_specs={"fs_hist": (0, 1000, 8)},
        )
        mv.full_build()
        s.views.append(mv)
        for i in range(h, n):
            shutil.move(
                os.path.join(stage, f"chunk-{i:06d}.parquet"),
                os.path.join(src, f"chunk-{i:06d}.parquet"),
            )
        assert s.run_available(max_files_per_trigger=1)
        s.drain()

        state = s.final_state()
        got = {r["lang"]: r for r in mv.read().collect()}
        want = {
            r["lang"]: r
            for r in state.groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_pages"),
                F.var_pop("fetch_status").alias("var_fs"),
            )
            .collect()
        }
        assert set(got) == set(want)
        for g in want:
            assert got[g]["n_pages"] == want[g]["n_pages"], g
            if want[g]["var_fs"] is None:
                assert got[g]["var_fs"] is None, g
            else:
                assert abs(got[g]["var_fs"] - want[g]["var_fs"]) < 1e-6, g
        hist = {
            (r["lang"], r["bin"]): r["cnt"] for r in mv.read_histogram("fs_hist").collect()
        }
        want_hist = {
            (r["lang"], r["bin"]): r["cnt"]
            for r in state.filter(F.col("fetch_status").isNotNull())
            .select(
                "lang",
                F.least(
                    F.greatest(
                        F.expr("(CAST(fetch_status AS BIGINT) * 8) DIV 1000"), F.lit(0)
                    ),
                    F.lit(7),
                )
                .cast("long")
                .alias("bin"),
            )
            .groupBy("lang", "bin")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .collect()
        }
        assert hist == want_hist
        assert mv._last_source_snapshot() == s.ingest.table.current_snapshot().snapshot_id
        assert mv.refresh()["up_to_date"]
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(src, ignore_errors=True)
