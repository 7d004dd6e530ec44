"""Structured Streaming front-end over the wide-row engine: the
reference's deployed shape (generated listener consuming the MQ tail,
S4totalpayListener via BasicRMListener).  File source stands in for the
binlog tail; batch_id is the fencing epoch; exactly-once is sink-side.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from tis_spark.fixtures.star import (
    gen_star_changes,
    initial_tables,
    initial_tables_spark,
    totalpay_spec,
)
from tis_spark.streaming import StreamingWideRow, write_stream_chunks
from tis_spark.wide import WideRowPipeline
from tis_spark.wide.totalpay import expected_wide, replay_star_oracle, totalpay_wide

N_PRIMARY = 60
N_EVENTS = 300


def _final_pdf(pipe) -> pd.DataFrame:
    return (
        pipe.final_wide()
        .toPandas()
        .sort_values("totalpay_id")
        .reset_index(drop=True)
        .astype(object)
        .where(lambda d: pd.notna(d), None)
    )


@pytest.fixture(scope="module")
def star_stream(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wide-stream"))
    src = os.path.join(root, "source")
    changes = gen_star_changes(spark, N_EVENTS, N_PRIMARY, seed=7, epoch_size=100)
    n = write_stream_chunks(changes, src, chunk_size=100, order_col="seq")
    assert n >= 3
    state = replay_star_oracle(
        totalpay_spec(), initial_tables(N_PRIMARY, seed=42), changes.collect()
    )
    return root, src, state


def test_streaming_wide_matches_oracle(spark, star_stream):
    root, src, state = star_stream
    pipe = WideRowPipeline(spark, os.path.join(root, "t1"), totalpay_spec(), totalpay_wide)
    pipe.full_build(initial_tables_spark(spark, N_PRIMARY, seed=42))
    s = StreamingWideRow(spark, src, pipe, os.path.join(root, "ckpt1"))
    assert s.run_available(max_files_per_trigger=1)
    got = _final_pdf(pipe)
    exp = expected_wide(state)
    assert list(got["totalpay_id"]) == list(exp["totalpay_id"])
    assert list(got["n_pay"].astype(int)) == list(exp["n_pay"].astype(int))
    assert list(got["kindpay"]) == list(exp["kindpay"])

    # checkpoint loss -> full redelivery: every batch must fence as a no-op
    versions_before = pipe.wide.current_snapshot().snapshot_id
    s2 = StreamingWideRow(spark, src, pipe, os.path.join(root, "ckpt-lost"))
    assert s2.run_available(max_files_per_trigger=1)
    got2 = _final_pdf(pipe)
    pd.testing.assert_frame_equal(got, got2)
    skipped = [
        snap.summary["epoch_id"]
        for snap in pipe.wide.history()
        if "epoch_id" in snap.summary
    ]
    assert skipped == sorted(set(skipped)), "an epoch committed twice"
    assert pipe.wide.current_snapshot().snapshot_id == versions_before
