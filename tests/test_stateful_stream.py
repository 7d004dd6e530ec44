"""applyInPandasWithState LWW changelog vs the sequential fold oracle.

The stateful operator folds each micro-batch's events per key over the
state-store row (tis_spark/streaming/stateful.py).  Arrival order is
(chunk, seq) — the file source delivers chunks in order, the operator
sorts by seq within a batch — so the oracle chains ``fold_key_events``
per key over exactly that order, with the carried row as the stored
input of the next chunk.  Both sides call the same semantic core; the
test pins the state-store plumbing (Arrow round-trip, state encoding,
batch boundaries) to it.
"""

from __future__ import annotations

import itertools

from tis_spark.cdc.fold import flatten_changes
from tis_spark.cdc.semantics import CdcConfig, fold_key_events
from tis_spark.fixtures.gen import CHANGE_SCHEMA, gen_page_changes
from tis_spark.streaming.stateful import stateful_fold_stream
from tis_spark.streaming.stream import write_stream_chunks

CHUNK = 1000
N_EVENTS = 3000


def _run_available(spark, src, ck, cfg, out_dir):
    """Drive the stateful changelog with a *recoverable* sink (foreachBatch
    appending parquet — the memory sink cannot resume from a checkpoint)."""
    stream = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful_fold_stream(stream, cfg)
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("append").parquet(out_dir)
        )
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    return spark.read.parquet(out_dir).collect()


def _event(r) -> dict:
    return {
        "op": r["op"],
        "url": r["url"],
        "seq": int(r["seq"]),
        "schema_version": int(r["sv"]),
        "invalid": bool(r["invalid"]),
        "noop": bool(r["noop"]),
        "after": {
            "url": r["url"],
            "warc_ts": r["a_warc_ts_us"],
            "html": None,
            "lang": None,
            "fetch_status": r["a_fetch_status"],
            "score": r["a_score"],
        },
    }


def test_stateful_state_survives_restart(spark, tmp_table_dir):
    """The state store persists across query restarts: feed half the
    stream, stop, add the rest, restart from the same checkpoint — the
    combined emissions equal a single uninterrupted run's final state."""
    cfg = CdcConfig()
    changes = gen_page_changes(spark, 2000, seed=17, epoch_size=500).cache()
    half = changes.filter("delivery_key < 1000")
    rest = changes.filter("delivery_key >= 1000")

    import os

    src_a = f"{tmp_table_dir}/src_split"
    ck = f"{tmp_table_dir}/ck_split"
    out = f"{tmp_table_dir}/out_split"
    write_stream_chunks(half, src_a, chunk_size=500)
    em1 = _run_available(spark, src_a, ck, cfg, out)
    # append the remaining chunks, restart from the same checkpoint
    n0 = len(os.listdir(src_a))
    tmp2 = f"{tmp_table_dir}/src_tmp2"
    write_stream_chunks(rest, tmp2, chunk_size=500)
    for i, fn in enumerate(sorted(os.listdir(tmp2))):
        os.rename(os.path.join(tmp2, fn), os.path.join(src_a, f"chunk-{n0 + i:06d}.parquet"))
    em2 = _run_available(spark, src_a, ck, cfg, out)  # cumulative emissions
    assert len(em2) > len(em1), "restarted query processed no new batches"

    final: dict[str, object] = {}
    for r in em2:
        if r["url"] not in final or r["n_folds"] > final[r["url"]]["n_folds"]:
            final[r["url"]] = r

    # uninterrupted reference run over the identical chunk sequence
    src_b = f"{tmp_table_dir}/src_whole"
    os.makedirs(src_b)
    for fn in sorted(os.listdir(src_a)):
        os.link(os.path.join(src_a, fn), os.path.join(src_b, fn))
    em_ref = _run_available(
        spark, src_b, f"{tmp_table_dir}/ck_whole", cfg, f"{tmp_table_dir}/out_whole"
    )
    ref: dict[str, object] = {}
    for r in em_ref:
        if r["url"] not in ref or r["n_folds"] > ref[r["url"]]["n_folds"]:
            ref[r["url"]] = r

    assert set(final) == set(ref)
    for url, g in final.items():
        e = ref[url]
        assert (g["exists"], g["warc_ts_us"], g["fetch_status"], g["score"], g["n_folds"]) == (
            e["exists"], e["warc_ts_us"], e["fetch_status"], e["score"], e["n_folds"]
        ), url


def test_stateful_lww_stream_matches_sequential_fold(spark, tmp_table_dir):
    cfg = CdcConfig()
    changes = gen_page_changes(spark, N_EVENTS, seed=11, epoch_size=CHUNK).cache()
    src = f"{tmp_table_dir}/src"
    n_chunks = write_stream_chunks(changes, src, chunk_size=CHUNK)
    assert n_chunks >= 3  # state must carry across several micro-batches

    stream = (
        spark.readStream.schema(CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stateful_fold_stream(stream, cfg)
        .writeStream.format("memory")
        .queryName("lww_state")
        .outputMode("update")
        .option("checkpointLocation", f"{tmp_table_dir}/ck")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    emitted = spark.sql("SELECT * FROM lww_state").collect()
    final: dict[str, object] = {}
    for r in emitted:
        if r["url"] not in final or r["n_folds"] > final[r["url"]]["n_folds"]:
            final[r["url"]] = r
    # several keys were touched in more than one micro-batch (per-key state
    # actually carried), so there are more emissions than keys
    assert len(emitted) > len(final)

    # ---- oracle: chained sequential fold in (chunk, seq) arrival order
    dk = {r["seq"]: r["delivery_key"] for r in changes.select("seq", "delivery_key").collect()}
    flat_rows = flatten_changes(changes, cfg).collect()
    by_key: dict[str, list] = {}
    for r in flat_rows:
        by_key.setdefault(r["url"], []).append(r)

    expected: dict[str, dict | None] = {}
    for url, evs in by_key.items():
        evs.sort(key=lambda r: (dk[r["seq"]] // CHUNK, r["seq"]))
        stored = None
        for _, grp in itertools.groupby(evs, key=lambda r: dk[r["seq"]] // CHUNK):
            row, action, _ = fold_key_events(stored, [_event(r) for r in grp], cfg)
            if action == "U":
                stored = {k: row[k] for k in ("url", "warc_ts", "html", "lang", "fetch_status", "score")}
            elif action == "D":
                stored = None
        expected[url] = stored

    assert set(final) == set(expected)
    n_live = 0
    for url, exp in expected.items():
        got = final[url]
        if exp is None:
            assert not got["exists"], url
            continue
        n_live += 1
        assert got["exists"], url
        assert got["warc_ts_us"] == exp["warc_ts"], url
        assert got["fetch_status"] == exp["fetch_status"], url
        assert got["score"] == exp["score"], url
    assert n_live > 100  # the stream creates a substantial live key set
