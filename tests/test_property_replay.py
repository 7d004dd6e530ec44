"""Property-based CDC replay: random within-contract event streams are
replayed through the engine (multi-epoch, bounded delivery disorder) and
must match the sequential oracle exactly.

Complements the golden/handwritten corners (test_cdc_replay.py) with
randomized *interaction* coverage — the class of bug this targets is a
divergence between the set-oriented fold and the sequential semantics on
some unanticipated op/version/null combination (e.g. the null-warc_ts
path divergence found in round 1 review).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from test_cdc_replay import _compare, _ev, _final_pdf, _page
from tis_spark.cdc import CdcConfig, CdcIngest
from tis_spark.cdc.oracle import replay_oracle
from tis_spark.fixtures.gen import CHANGE_SCHEMA

URLS = [f"https://h{i}.example.org/p" for i in range(4)]
HTMLS = [
    b"<html><head><title>a</title></head><body><p>alpha</p></body></html>",
    b"<html><head><title>b</title></head><body><p>beta</p></body></html>",
    b"<html><body>bare</body></html>",
    b"\xff\xfe not html at all \x00",
    None,
]
# Version offsets (seconds) covering: ties, in-window regressions
# (rectified), out-of-window regressions (dirty), normal progress.
VERS = [50.0, 100.0, 100.0, 200.0, 200.0 - 600, 200.0 - 4000, 900.0, 3000.0]
DISORDER = 5


@st.composite
def streams(draw):
    n = draw(st.integers(min_value=8, max_value=22))
    events = []
    for seq in range(1, n + 1):
        op = draw(st.sampled_from(["I", "U", "U", "D"]))
        url = draw(st.sampled_from(URLS))
        ver = draw(st.sampled_from(VERS))
        html = draw(st.sampled_from(HTMLS))
        lang = draw(st.sampled_from(["en", "de"]))
        null_ts = draw(st.integers(0, 9)) == 0  # malformed: after.warc_ts NULL
        after = _page(url, ver, html=html, lang=lang)
        if null_ts:
            after = dict(after, warc_ts=None)
        if op == "I":
            events.append(_ev(seq, "I", after=after))
        elif op == "D":
            events.append(_ev(seq, "D", before=_page(url, ver)))
        else:
            if draw(st.integers(0, 5)) == 0:
                before = None  # invalid UPDATE (no before-image)
            elif draw(st.booleans()):
                before = after  # no-op candidate (content-identical)
            else:
                before = _page(url, draw(st.sampled_from(VERS)))
            events.append(_ev(seq, "U", after=after, before=before))
    # Delivery order: seq order with bounded local disorder (the V2
    # contract: engine guarantees correctness for disorder <= window).
    jitter = [draw(st.integers(0, DISORDER)) for _ in events]
    delivered = [e for _, e in sorted(zip(jitter, events), key=lambda p: (p[1]["seq"] + p[0], p[1]["seq"]))]
    n_epochs = draw(st.integers(1, 3))
    cuts = sorted(draw(st.sets(st.integers(1, len(delivered) - 1), min_size=n_epochs - 1, max_size=n_epochs - 1)))
    policy = draw(st.sampled_from(["ignore", "delete"]))
    # chaos: run the most aggressive lake GC (keep_last=1) and/or a process
    # restart (fresh CdcIngest re-reading fences + reorder state from the
    # table) after arbitrary epochs — neither may perturb the final state.
    gc_after = sorted(draw(st.sets(st.integers(0, n_epochs - 1), max_size=n_epochs)))
    restart_after = sorted(
        draw(st.sets(st.integers(0, n_epochs - 2), max_size=1)) if n_epochs > 1 else set()
    )
    return delivered, cuts, policy, gc_after, restart_after


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(data=streams())
def test_random_stream_matches_oracle(spark, data):
    delivered, cuts, policy, gc_after, restart_after = data
    for i, ev in enumerate(delivered):
        ev["delivery_key"] = i
    bounds = [0, *cuts, len(delivered)]
    cfg = CdcConfig(
        disorder_window=DISORDER,
        fold_parallelism=4,
        num_buckets=4,
        delete_policy=policy,
    )
    table_dir = tempfile.mkdtemp(prefix="tis-prop-")
    try:
        ingest = CdcIngest(spark, table_dir, cfg)
        for e in range(len(bounds) - 1):
            chunk = delivered[bounds[e] : bounds[e + 1]]
            for ev in chunk:
                ev["epoch_hint"] = e
            df = spark.createDataFrame(chunk, CHANGE_SCHEMA)
            ingest.process_epoch(df, e, final_flush=(e == len(bounds) - 2))
            if e in gc_after:
                ingest.table.expire_snapshots(keep_last=1)
            if e in restart_after:
                ingest = CdcIngest(spark, table_dir, cfg)
        engine = _final_pdf(ingest)
        oracle = replay_oracle(
            spark.createDataFrame(delivered, CHANGE_SCHEMA).collect(), cfg
        )
        if len(oracle) == 0:  # all-invalid stream: empty oracle frame has
            assert len(engine) == 0  # no columns, so skip the field compare
        else:
            _compare(engine, oracle)
    finally:
        shutil.rmtree(table_dir, ignore_errors=True)
