"""Vector math over ``array<float>`` embedding columns.

All pure column expressions via higher-order functions (``aggregate`` /
``zip_with``) — JVM-side, no Python in the hot path. At 100 TB these run
inside whole-stage codegen over the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_col(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm_col(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v,
        )
    )


def cosine_similarity_col(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs (no NaN propagation).

    NOTE for joins: this evaluates THREE array aggregates per invocation
    (dot + both norms). When scoring many pairs, precompute each side's
    norm once per row below the join and use ``cosine_from_norms`` —
    norms then cost O(rows), not O(pairs).
    """
    denom = l2_norm_col(a) * l2_norm_col(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_col(a, b) / denom)


def cosine_from_norms(
    a: Column | str, b: Column | str, norm_a: Column | str, norm_b: Column | str
) -> Column:
    """Cosine using precomputed per-row norms — one aggregate per pair."""
    na = _c(norm_a)
    nb = _c(norm_b)
    denom = na * nb
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_col(a, b) / denom)
