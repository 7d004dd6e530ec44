"""Event-time windowed aggregation with watermark-bounded lateness.

The reference's ER rules carry a Flink-style ``timeCharacteristic ∈
{EventTime, ProcessTime}`` (tis-sql-parser/.../er/TimeCharacteristic.java:22)
but its runtime has no windowed aggregation — the serving store answers
aggregate queries.  This module exposes the Spark-native EventTime shape
the engine's consumers use for monitoring/rollups over the change stream:
tumbling event-time windows, watermark-bounded late-data acceptance,
append-mode finalization (a window emits exactly once, when the watermark
passes its end — the exactly-once-per-window contract downstream sinks
want).

Scale: one shuffle on (window, keys); state store holds only open windows
(bounded by watermark horizon x key cardinality), late events beyond the
watermark are dropped at the source side of the aggregation — no
unbounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window counts over an event-time stream: events later than
    ``watermark`` past the max seen event time are dropped; in append
    output mode each window row is emitted exactly once, after the
    watermark passes its end."""
    keys = [F.window(F.col(ts_col), window).alias("w"), *(extra_keys or [])]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("win_start"), *(extra_keys or []), "n")
    )
