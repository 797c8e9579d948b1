"""Row filters (F1/F2).

Both are pure column predicates, so Catalyst pushes them into the parquet
scan when reading an existing entries table, and they run vectorized
inside the same stage as ingest otherwise. Order preserved from the
reference: include-type filter, then size filter, then (at the sink)
dedup (reference src/batch.rs:146-153 → src/sink.rs:105-109).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from archive_to_parquet_spark.options import ConvertOptions, IncludeType


def is_utf8_col(content: Column | str) -> Column:
    """True iff the binary column is valid UTF-8 (X2).

    Spark 4's ``is_valid_utf8`` is JVM-side and codegen'd — the analog of
    the reference's SIMD ``simdutf8`` validation (reference
    src/batch.rs:157-160).
    """
    col = F.col(content) if isinstance(content, str) else content
    return F.is_valid_utf8(col)


def include_predicate(include: IncludeType, content: Column | str = "content") -> Column:
    col = F.col(content) if isinstance(content, str) else content
    if include is IncludeType.ALL:
        return F.lit(True)
    valid = F.is_valid_utf8(col)
    return valid if include is IncludeType.TEXT else ~valid


def apply_include_filter(df: DataFrame, include: IncludeType) -> DataFrame:
    """F1: keep rows whose content is (not) valid UTF-8
    (reference src/batch.rs:162-180)."""
    if include is IncludeType.ALL:
        return df
    return df.filter(include_predicate(include))


def size_predicate(min_size: int, max_size: int, size: Column | str = "size") -> Column:
    """[min, max) — max EXCLUSIVE, matching Rust ``Range::contains``
    (reference src/lib.rs:55-62, src/batch.rs:182-197)."""
    col = F.col(size) if isinstance(size, str) else size
    return (col >= min_size) & (col < max_size)


def apply_size_filter(df: DataFrame, options: ConvertOptions) -> DataFrame:
    if options.min_size is None and options.max_size is None:
        return df
    lo, hi = options.size_range()
    return df.filter(size_predicate(lo, hi))
