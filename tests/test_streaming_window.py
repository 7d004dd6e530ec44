"""Event-time window + watermark semantics: in-watermark late events are
counted, beyond-watermark late events are dropped, and append mode emits
each finalized window exactly once."""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import types as T

from tis_spark.streaming.windows import windowed_event_counts

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _t(hour: int, minute: int = 0):
    return datetime(2024, 1, 1, hour, minute, tzinfo=timezone.utc)


def test_watermark_drops_only_beyond_window_late_events(spark, tmp_table_dir):
    src = os.path.join(tmp_table_dir, "src")
    os.makedirs(src)

    # chunk 0: hours 0-2; watermark after the batch = 02:30 - 1h = 01:30,
    # which finalizes + evicts window [0,1) at the END of batch 1.
    c0 = [(1, _t(0, 10)), (2, _t(0, 40)), (3, _t(1, 10)), (4, _t(2, 30))]
    # chunk 1: hour-3 data + a within-watermark late event (02:00 -> counted)
    c1 = [(5, _t(3, 0)), (6, _t(2, 0))]
    # chunk 2: a very-late event (00:20) arriving AFTER its window was
    # evicted -> deterministically dropped (Spark's contract only
    # guarantees dropping once the window state is gone — a late event
    # landing in the same batch as the eviction may still count), plus
    # hour-5 data advancing the watermark past windows 2 and 3.
    c2 = [(7, _t(0, 20)), (8, _t(5, 30))]
    # chunk 3: advances the watermark past window 5 so it finalizes too
    c3 = [(9, _t(7, 0))]
    for i, rows in enumerate([c0, c1, c2, c3]):
        d = os.path.join(tmp_table_dir, f"tmp{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        os.rename(os.path.join(d, part), os.path.join(src, f"chunk-{i:03d}.parquet"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_table_dir, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    rows = spark.sql("SELECT * FROM win_counts").collect()
    got = {r["win_start"].hour: r["n"] for r in rows}
    # hour 0: events 1,2; the evicted-window late event 7 DROPPED
    # hour 2: event 4 plus within-watermark late event 6
    # hour 5: finalized by the hour-7 watermark advance
    # hour 7 never finalizes (nothing advances the watermark past it)
    assert got == {0: 2, 1: 1, 2: 2, 3: 1, 5: 1}, got
    # append mode: each window emitted exactly once
    assert len(rows) == len(got)
