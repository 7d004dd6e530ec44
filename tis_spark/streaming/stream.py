"""Structured Streaming front-end for the CDC ingest pipeline.

``readStream`` (file source standing in for the MQ/binlog tail, reference
S5 MQListenerFactory) -> ``foreachBatch`` -> ``CdcIngest.process_epoch``.
Exactly-once comes from the *sink* side (epoch fencing in the lake commit),
so a re-delivered micro-batch after checkpoint loss or restart is a no-op —
Structured Streaming's batch_id is the epoch id.

Drain mode (reference C7 ``-Ddrain=true``) maps to Trigger.AvailableNow
plus a final ``drain()`` that flushes the seq-watermark reorder buffer.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tis_spark.cdc.pipeline import CdcConfig, CdcIngest
from tis_spark.fixtures.gen import CHANGE_SCHEMA
from tis_spark.lake.matview import refresh_views


def write_stream_chunks(
    changes: DataFrame,
    source_dir: str,
    chunk_size: int = 1000,
    order_col: str = "delivery_key",
) -> int:
    """Materialize a change stream as ordered parquet chunk files (the
    delivery order a binlog tail would produce). Returns chunk count."""
    os.makedirs(source_dir, exist_ok=True)
    bounds = changes.agg(F.min(order_col).alias("lo"), F.max(order_col).alias("hi")).first()
    if bounds["lo"] is None:
        return 0
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    n = 0
    tmp = tempfile.mkdtemp(prefix="tis-chunks-")
    for ck in range(lo // chunk_size, hi // chunk_size + 1):
        part = changes.filter(
            (F.col(order_col) >= ck * chunk_size) & (F.col(order_col) < (ck + 1) * chunk_size)
        )
        d = os.path.join(tmp, f"c{ck}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        if files:
            shutil.move(os.path.join(d, files[0]), os.path.join(source_dir, f"chunk-{n:06d}.parquet"))
            n += 1
    shutil.rmtree(tmp, ignore_errors=True)
    return n


def ensure_chunk_mtime_order(source_dir: str) -> int:
    """Restore the recorded delivery order of a chunked wire capture.

    Spark's file stream admits files in modification-time order and breaks
    ties arbitrarily, so equal mtimes let a later-recorded chunk replay
    BEFORE an earlier one — whole-chunk disorder a real broker partition
    (offset-ordered by contract) can never produce, far beyond the seq
    watermark's reorder horizon, and fatal for DDL ordering.  Recorders
    name chunks in delivery order (``write_stream_chunks``), but a git
    checkout / cp -r flattens mtimes into tie groups.  Re-stamp strictly
    increasing mtimes in filename order whenever the existing mtimes are
    not already strictly increasing.  Returns the number of files
    restamped (0 = order was already unambiguous, -1 = capture is on
    read-only storage and could not be restamped — the caller proceeds;
    ambiguity only exists where mtimes actually tie)."""
    files = sorted(
        f for f in os.listdir(source_dir) if not f.startswith(("_", "."))
    )
    paths = [os.path.join(source_dir, f) for f in files]
    mtimes = [os.stat(p).st_mtime for p in paths]
    if all(a < b for a, b in zip(mtimes, mtimes[1:])):
        return 0
    base = int(max(mtimes) if mtimes else 0) + 1
    try:
        for i, p in enumerate(paths):
            os.utime(p, (base + i, base + i))
    except OSError:
        return -1
    return len(paths)


def parse_kafka_events(raw: DataFrame) -> DataFrame:
    """Kafka wire rows (binary key/value + topic/partition/offset) ->
    CHANGE_SCHEMA events.  The value is a Debezium-style JSON envelope:
    binary columns arrive base64-encoded and timestamps ISO-8601, both of
    which Spark's JSON reader decodes natively against the typed schema —
    pure Catalyst, no Python in the parse path."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), CHANGE_SCHEMA).alias("e")
    ).select("e.*")


#: The columns Spark's kafka source emits (KafkaRecordToRowConverter) —
#: a recorded wire capture in this shape replays through the exact
#: transform chain the live broker branch uses.
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def encode_kafka_wire(changes: DataFrame, topic: str = "pages-binlog") -> DataFrame:
    """CHANGE_SCHEMA events -> Kafka wire rows: Debezium-style JSON
    envelope in ``value`` (binary base64, ISO timestamps — what
    ``to_json`` emits and ``parse_kafka_events`` decodes), record key =
    the source row key (Debezium keys messages by PK so one row's
    changes stay in one partition — KeyedPkVal in the reference's
    listener, BasicRMListener.java), offset = delivery order."""
    key = F.coalesce(F.col("after.url"), F.col("before.url"), F.col("table"))
    return changes.select(
        key.cast("binary").alias("key"),
        F.to_json(F.struct(*changes.columns)).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        (F.abs(F.hash(key)) % 16).cast("int").alias("partition"),
        F.col("delivery_key").alias("offset"),
        F.col("ts_ms").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


class StreamingCdc:
    """``kafka=None`` (default) tails a file-source directory standing in
    for the MQ/binlog (no broker ships in this sandbox).  Passing
    ``kafka={"bootstrap_servers": ..., "topic": ..., "max_offsets_per_trigger": N}``
    switches the source to ``readStream.format("kafka")`` + the same
    ``parse_kafka_events`` transform (reference S5 MQListenerFactory; the
    rows-per-trigger knob is C1 rate-limit parity with
    BasicRMListener.java:171-173).  The kafka branch needs the
    spark-sql-kafka connector jar on the cluster; ``wire_format="kafka"``
    replays a *recorded* wire capture (parquet of KAFKA_WIRE_SCHEMA rows,
    e.g. tests/fixtures/kafka_wire.parquet) from ``source_dir`` through
    the identical parse->ingest chain, pinning the envelope end-to-end
    without a broker."""

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        table_path: str,
        cfg: CdcConfig | None = None,
        checkpoint_dir: str | None = None,
        kafka: dict | None = None,
        wire_format: str | None = None,
        views: list | None = None,
    ):
        if wire_format not in (None, "kafka"):
            raise ValueError(f"wire_format must be None or 'kafka', got {wire_format!r}")
        self.spark = spark
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir or os.path.join(table_path, "_checkpoint")
        self.kafka = kafka
        self.wire_format = wire_format
        self.ingest = CdcIngest(spark, table_path, cfg)
        #: MaterializedView instances over this table, refreshed after each
        #: micro-batch commit.  Safe under re-delivery and crash-between:
        #: refreshes are watermark-driven (source-snapshot summary) and
        #: fenced, so a missed refresh is caught up by the next batch and a
        #: duplicate is a no-op — the views ride the ingest's exactly-once.
        self.views = list(views or [])

    def _epoch(self, df: DataFrame, batch_id: int) -> None:
        self.ingest.process_epoch(df, batch_id)
        if self.views:
            refresh_views(self.views)

    def _make_stream(self, max_files_per_trigger: int) -> DataFrame:
        if self.kafka is None:
            # file source standing in for the broker: delivery order is the
            # recorded chunk order, which flattened mtimes would scramble
            ensure_chunk_mtime_order(self.source_dir)
        if self.wire_format == "kafka":
            raw = (
                self.spark.readStream.schema(KAFKA_WIRE_SCHEMA)
                .option("maxFilesPerTrigger", max_files_per_trigger)
                .parquet(self.source_dir)
            )
            return parse_kafka_events(raw)
        if self.kafka is not None:
            raw = (
                self.spark.readStream.format("kafka")
                .option("kafka.bootstrap.servers", self.kafka["bootstrap_servers"])
                .option("subscribe", self.kafka["topic"])
                .option("startingOffsets", self.kafka.get("starting_offsets", "earliest"))
            )
            if self.kafka.get("max_offsets_per_trigger"):
                raw = raw.option(
                    "maxOffsetsPerTrigger", int(self.kafka["max_offsets_per_trigger"])
                )
            return parse_kafka_events(raw.load())
        return (
            self.spark.readStream.schema(CHANGE_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(self.source_dir)
        )

    def purge(self, predicate, summary: dict | None = None) -> dict:
        """Retention purge between micro-batches: delegates to
        :meth:`CdcIngest.purge` (fenced on this writer's view, stream
        epoch fence untouched) and immediately refreshes the attached
        views so the retraction lands before the next batch.  Call while
        no streaming query is active; the stream then resumes on the
        same checkpoint."""
        out = self.ingest.purge(predicate, summary=summary)
        if out["deleted_rows"] and self.views:
            refresh_views(self.views)
        return out

    def run_available(self, max_files_per_trigger: int = 1, timeout_s: float | None = None) -> bool:
        """Process everything currently in the source dir (drain trigger).
        Returns True if the query terminated on its own (all data done)."""
        stream = self._make_stream(max_files_per_trigger)
        q = (
            stream.writeStream.foreachBatch(self._epoch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        done = q.awaitTermination(timeout_s) if timeout_s else (q.awaitTermination() or True)
        if not done:
            q.stop()
            q.awaitTermination(60)
        return bool(done)

    def drain(self) -> dict:
        """Flush the reorder buffer after the stream is exhausted (the end
        of a bounded replay; unbounded streams just keep the buffer)."""
        last = self.ingest.table.last_epoch_id()
        empty = self.spark.createDataFrame([], CHANGE_SCHEMA)
        out = self.ingest.process_epoch(
            empty, (last if last is not None else -1) + 1, final_flush=True
        )
        if self.views:
            refresh_views(self.views)
        return out

    def final_state(self) -> DataFrame:
        return self.ingest.final_state()


class StreamingWideRow:
    """Structured Streaming front-end for the multi-table wide-row engine
    (the reference's deployed shape: generated listener consuming the MQ
    tail, S4totalpayListener / BasicRMListener).  Same contract as
    ``StreamingCdc``: the file source stands in for the binlog tail,
    ``foreachBatch`` drives ``WideRowPipeline.process_epoch`` with
    Structured Streaming's batch_id as the fencing epoch, so exactly-once
    is sink-side — checkpoint loss or a redelivered micro-batch replays
    as a skipped epoch instead of a double-apply."""

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        pipeline,
        checkpoint_dir: str,
        views: list | None = None,
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir
        self.pipeline = pipeline
        #: MaterializedView instances over the star's lake tables (usually
        #: the wide table — the reference's derived artifacts hang off
        #: exactly that), refreshed after each micro-batch like
        #: StreamingCdc.views: watermark-driven and fenced, so a skipped
        #: epoch's refresh is a no-op and a missed one is caught up.
        self.views = list(views or [])

    def _epoch(self, df: DataFrame, batch_id: int) -> None:
        self.pipeline.process_epoch(df, batch_id)
        if self.views:
            refresh_views(self.views)

    def run_available(self, max_files_per_trigger: int = 1, timeout_s: float | None = None) -> bool:
        from tis_spark.fixtures.star import STAR_CHANGE_SCHEMA

        ensure_chunk_mtime_order(self.source_dir)
        stream = (
            self.spark.readStream.schema(STAR_CHANGE_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(self.source_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self._epoch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        done = q.awaitTermination(timeout_s) if timeout_s else (q.awaitTermination() or True)
        if not done:
            q.stop()
            q.awaitTermination(60)
        return bool(done)

    def final_wide(self) -> DataFrame:
        return self.pipeline.final_wide()
