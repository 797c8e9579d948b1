"""Scalar-function layer.

Column-expression helpers stay JVM-side (built-in ``pyspark.sql.functions``,
whole-stage codegen); the pure-Python ports (magic sniffing, ascii strings)
run only inside the Arrow-batched ingest walker.
"""

from archive_to_parquet_spark.functions.hashing import sha256_col, sha256_hex_col
from archive_to_parquet_spark.functions.html import (
    html_links,
    html_title,
    html_to_text,
)
from archive_to_parquet_spark.functions.sniff import (
    detect_compression,
    detect_format,
    is_executable_magic,
)
from archive_to_parquet_spark.functions.strings import (
    ascii_strings_col,
    extract_ascii_strings,
)
from archive_to_parquet_spark.functions.text import (
    language_id_col,
    quality_score_cols,
    token_count_col,
)
from archive_to_parquet_spark.functions.vectors import (
    cosine_similarity_col,
    l2_norm_col,
)

__all__ = [
    "html_links",
    "html_title",
    "html_to_text",
    "sha256_col",
    "sha256_hex_col",
    "detect_compression",
    "detect_format",
    "is_executable_magic",
    "extract_ascii_strings",
    "ascii_strings_col",
    "token_count_col",
    "language_id_col",
    "quality_score_cols",
    "cosine_similarity_col",
    "l2_norm_col",
]
