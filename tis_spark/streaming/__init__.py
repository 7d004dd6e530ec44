from tis_spark.streaming.stream import (  # noqa: F401
    StreamingCdc,
    StreamingWideRow,
    write_stream_chunks,
)
