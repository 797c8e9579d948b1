"""Content hashing (X1).

The reference streams SHA-256 fused into the content copy (reference
src/hasher.rs:5-37). In Spark the equivalent single-pass form is the
built-in ``sha2`` over the already-materialized content column — JVM-side,
codegen'd, no Python roundtrip. Inside the ingest walker we instead hash
with ``hashlib`` while copying, matching the reference's fused streaming
form so multi-GB members are hashed without a second pass.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sha256_hex_col(content: Column | str) -> Column:
    """Lowercase hex SHA-256 of a binary/string column (JVM built-in)."""
    return F.sha2(F.col(content) if isinstance(content, str) else content, 256)


def sha256_col(content: Column | str) -> Column:
    """32-byte binary SHA-256, matching the reference's
    ``FixedSizeBinary(32)`` hash column (reference src/batch.rs:26-30)."""
    return F.unhex(sha256_hex_col(content))
