from archive_to_parquet_spark.plans.convert import convert, entries_pipeline
from archive_to_parquet_spark.plans.crawl import (
    crawl_to_documents,
    documents_from_entries,
)
from archive_to_parquet_spark.plans.sink import write_parquet

__all__ = [
    "convert",
    "crawl_to_documents",
    "documents_from_entries",
    "entries_pipeline",
    "write_parquet",
]
