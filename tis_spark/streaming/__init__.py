from tis_spark.streaming.stream import (  # noqa: F401
    StreamingCdc,
    parse_kafka_events,
    StreamingWideRow,
    write_stream_chunks,
)
