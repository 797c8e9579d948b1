from archive_to_parquet_spark.plans.convert import convert, entries_pipeline
from archive_to_parquet_spark.plans.sink import write_parquet

__all__ = ["convert", "entries_pipeline", "write_parquet"]
