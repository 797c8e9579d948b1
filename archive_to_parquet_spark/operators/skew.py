"""Skew mitigation: salted joins and hot-key isolation.

AQE's skew-join splitting (enabled in the session defaults) handles
moderate skew at runtime; salting is the explicit tool for EXTREME keys
(one key = a double-digit percentage of rows — empty-document hashes,
null-ish sentinel keys, celebrity users). It trades a bounded
replication of the build side for an even shuffle of the probe side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left (large, skewed) side salted.

    Left rows get a deterministic salt ``xxhash64(whole row) % S`` —
    spreading even a single hot key over S shuffle partitions — and the
    right side is replicated S× with every salt value, so each
    (key, salt) bucket joins locally. Replication is bounded:
    |right| × S rows, choose S ≈ hot-key-rows / target-partition-rows.

    Semantics are exactly the plain equi-join's (verified in tests);
    only the shuffle distribution changes. Two sizing notes from
    measurement: (1) salting only matters when the join actually
    shuffles — if the right side broadcasts there is no skew to fix;
    (2) pick S well above the shuffle partition count, else hash
    collisions of (key, salt) pairs leave residual imbalance (S=8 on 8
    partitions measured ~3× over ideal; S=64 smooths it).
    """
    if num_salts < 1:
        raise ValueError("num_salts must be >= 1")
    # right/full outer would emit every unmatched right row once PER SALT
    # (the replicated copies have no matching bucket) — reject rather
    # than silently corrupt. 'cross' is rejected too: the salting rewrite
    # only preserves EQUI-join semantics (a cross join with using-columns
    # would silently degrade to an inner join on (key, salt)).
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "left_anti",
               "leftsemi", "leftanti", "semi", "anti"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join supports left-oriented joins only, got how={how!r}: "
            "unmatched right rows would duplicate once per salt"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts))
    salted_left = left.withColumn("__salt", salt)
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    joined = salted_left.join(salted_right, [on, "__salt"], how)
    return joined.drop("__salt")


def hot_keys(df: DataFrame, key: str, threshold_rows: int) -> DataFrame:
    """Keys whose row count exceeds ``threshold_rows`` — the candidates
    for salting or isolate-and-broadcast handling."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > threshold_rows)
    )


def skew_isolated_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    threshold_rows: int = 1_000_000,
) -> DataFrame:
    """Two-path join: hot keys take a broadcast path (their right-side
    rows are by definition few per key on a dimension join), cold keys
    take the normal shuffle join; union of both. The classic
    isolate-the-whales plan when salting the whole table is overkill."""
    hot = hot_keys(left, on, threshold_rows).select(on)
    left_hot = left.join(F.broadcast(hot), on, "left_semi")
    left_cold = left.join(F.broadcast(hot), on, "left_anti")
    right_hot = right.join(F.broadcast(hot), on, "left_semi")
    joined_hot = left_hot.join(F.broadcast(right_hot), on)
    joined_cold = left_cold.join(right, on)
    return joined_hot.unionByName(joined_cold)
