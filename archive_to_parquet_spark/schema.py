"""Canonical output schema of the engine.

Mirrors the reference's static Arrow schema (reference src/batch.rs:21-34):
``(source: utf8, path: utf8, size: u64, hash: fixed_size_binary(32),
content: large_binary)``, all NOT NULL — with two deliberate mappings:

- ``size`` is Spark ``LongType`` (Spark has no unsigned 64-bit type; file
  sizes are far below 2^63, documented narrowing — SURVEY.md §1.1).
- ``hash`` is ``BinaryType`` with a by-construction length-32 invariant
  (Spark has no fixed-size binary).

We additionally persist ``format`` (the reference's derived ``FormatKind``,
reference src/anyreader/format.rs:87-107) because it is cheap and strictly
more queryable; the strict 5-column reference layout is a ``select`` away.
"""

from __future__ import annotations

from pyspark.sql import types as T

HASH_SIZE = 32  # SHA-256 output length (reference src/hasher.rs:3)

# FormatKind enum (reference src/anyreader/format.rs:87-107).
FORMAT_KINDS = (
    "gzip",
    "zstd",
    "bzip2",
    "xz",
    "zip",
    "tar",
    "executable",
    "unknown",
)

# The canonical entries table (reference src/batch.rs:21-34 + format).
ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), nullable=False),
        T.StructField("path", T.StringType(), nullable=False),
        T.StructField("size", T.LongType(), nullable=False),
        T.StructField("hash", T.BinaryType(), nullable=False),
        T.StructField("content", T.BinaryType(), nullable=False),
        T.StructField("format", T.StringType(), nullable=False),
    ]
)

# The byte-compatible reference projection (no format column).
REFERENCE_COLUMNS = ("source", "path", "size", "hash", "content")

# Arrow-side schema string for mapInPandas (must match ENTRY_SCHEMA).
ENTRY_SCHEMA_DDL = (
    "source string, path string, size long, hash binary, "
    "content binary, format string"
)
