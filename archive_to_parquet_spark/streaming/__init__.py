from archive_to_parquet_spark.streaming.events import (
    sessionized_counts_stream,
    windowed_event_counts,
)
from archive_to_parquet_spark.streaming.stream_convert import stream_convert

__all__ = [
    "stream_convert",
    "windowed_event_counts",
    "sessionized_counts_stream",
]
