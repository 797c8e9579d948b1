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


def quantize_int8_cols(emb: Column | str) -> dict[str, Column]:
    """Symmetric int8 quantization of an embedding column — the 4×
    memory/IO reduction an ANN corpus wants at 100 TB (int8 + one
    float scale per vector instead of float32 per dim).

    scale = max|x| / 127; q_i = clamp(floor(x_i/scale + 0.5), ±127).
    ``floor(x + 0.5)`` is used instead of round() because round-half
    modes differ across engines while floor is universal — every q_i is
    a small EXACT integer, so checksums over q compare bit-identically
    between Spark and any oracle. Inputs are widened float32→double
    first (exact) so both engines do identical double arithmetic.
    Zero vectors quantize to all-zero with scale 0.
    """
    e = F.transform(_c(emb), lambda x: x.cast("double"))
    scale = (
        F.aggregate(e, F.lit(0.0), lambda acc, v: F.greatest(acc, F.abs(v)))
        / 127.0
    )
    safe = F.when(scale == 0.0, F.lit(1.0)).otherwise(scale)
    q = F.transform(
        e,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(x / safe + 0.5).cast("int")),
        ),
    )
    return {"scale": scale, "q": q}
