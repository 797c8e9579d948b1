"""Salted and skew-isolated joins must be semantically identical to the
plain join — only the shuffle distribution differs."""

from __future__ import annotations

from pyspark.sql import functions as F

from archive_to_parquet_spark.operators.skew import (
    hot_keys,
    salted_join,
    skew_isolated_join,
)


def _skewed_frames(spark):
    # key 0 holds 80% of rows (the hot key), keys 1..9 the rest
    left = spark.range(1000).select(
        F.when(F.col("id") < 800, 0).otherwise((F.col("id") % 9) + 1).alias("k"),
        F.col("id").alias("left_id"),
    )
    right = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(10)], "k long, label string"
    )
    return left, right


def test_salted_join_matches_plain_join(spark):
    left, right = _skewed_frames(spark)
    plain = {(r.left_id, r.label) for r in left.join(right, "k").collect()}
    salted = {(r.left_id, r.label) for r in salted_join(left, right, "k", 8).collect()}
    assert salted == plain
    assert len(salted) == 1000


def test_salted_join_spreads_hot_key(spark):
    left, right = _skewed_frames(spark)
    # the salt column must split the hot key's rows into multiple groups
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
    n_groups = (
        left.filter(F.col("k") == 0)
        .withColumn("__salt", salt)
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_groups == 8


def test_salted_join_rejects_right_and_full(spark):
    import pytest

    left, right = _skewed_frames(spark)
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="left-oriented"):
            salted_join(left, right, "k", 4, how=how)


def test_hot_keys_detection(spark):
    left, _ = _skewed_frames(spark)
    hot = {r.k for r in hot_keys(left, "k", threshold_rows=100).collect()}
    assert hot == {0}


def test_skew_isolated_join_matches_plain_join(spark):
    left, right = _skewed_frames(spark)
    plain = {(r.left_id, r.label) for r in left.join(right, "k").collect()}
    isolated = {
        (r.left_id, r.label)
        for r in skew_isolated_join(left, right, "k", threshold_rows=100).collect()
    }
    assert isolated == plain
