"""Record the checked-in Kafka wire-format capture.

Deterministic: the standard 2000-event / seed=99 / epoch_size=500 change
stream (the verify-recipe stream — includes the 4 DDLs) encoded as
Debezium-envelope Kafka wire rows (KAFKA_WIRE_SCHEMA) and chunked into
ordered parquet files, exactly what a wire-tap of the broker topic would
have captured.  Re-run from the repo root to regenerate:

    python tests/fixtures/record_kafka_wire.py
"""

import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

from tis_spark.fixtures.gen import gen_page_changes  # noqa: E402
from tis_spark.session import get_spark  # noqa: E402
from tis_spark.streaming.stream import encode_kafka_wire, write_stream_chunks  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "kafka_wire")
N_EVENTS, SEED, EPOCH = 2000, 99, 500

if __name__ == "__main__":
    spark = get_spark("record-kafka-wire", master="local[4]", shuffle_partitions=4)
    changes = gen_page_changes(spark, N_EVENTS, seed=SEED, epoch_size=EPOCH)
    wire = encode_kafka_wire(changes)
    n = write_stream_chunks(wire, OUT, chunk_size=EPOCH, order_col="offset")
    print(f"recorded {n} chunks -> {OUT}")
