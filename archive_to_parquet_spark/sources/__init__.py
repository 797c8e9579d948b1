from archive_to_parquet_spark.sources.archive_source import read_archives
from archive_to_parquet_spark.sources.walker import Walker, walk_stream

__all__ = ["read_archives", "Walker", "walk_stream"]
