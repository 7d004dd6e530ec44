from tis_spark.streaming.stream import StreamingCdc, write_stream_chunks  # noqa: F401
