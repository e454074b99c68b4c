from scalpel_ts_spark.streaming.rounds import (  # noqa: F401
    stream_extract_spans,
)
