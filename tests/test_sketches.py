"""Misra-Gries frequent-items sketch (operators/sketches.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from archive_to_parquet_spark.operators.sketches import (
    _mg_compress,
    frequent_item_candidates,
    heavy_hitters,
    misra_gries_partials,
)


def test_mg_compress_bound_and_size():
    s = pd.Series({"a": 100, "b": 50, "c": 3, "d": 2, "e": 1})
    out = _mg_compress(s, 2)
    # (k+1)-th largest = 3; survivors strictly above it, reduced by it
    assert out.to_dict() == {"a": 97, "b": 47}
    # under-capacity summaries pass through untouched
    assert _mg_compress(s, 5).to_dict() == s.to_dict()


def _token_df(spark, counts: dict[str, int], partitions: int = 8):
    rows = [(t,) for t, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, ["token"]).repartition(partitions)


def test_partials_are_lower_bounds_capped_at_k(spark):
    counts = {"the": 400, "of": 200, "and": 100} | {
        f"rare{i}": 1 for i in range(500)
    }
    df = _token_df(spark, counts)
    merged = (
        misra_gries_partials(df, "token", 10)
        .groupBy("item")
        .agg(F.sum("lb").alias("lb"))
        .collect()
    )
    got = {r["item"]: r["lb"] for r in merged}
    total = sum(counts.values())
    for item, lb in got.items():
        assert 0 < lb <= counts[item], item
    # MG guarantee: every item with freq > N/(k+1) has a positive bound
    for item, n in counts.items():
        if n > total / 11:
            assert item in got and got[item] >= n - total / 11, item


def test_candidates_superset_of_true_heavies(spark):
    counts = {"x": 900, "y": 300, "z": 120} | {f"t{i}": 2 for i in range(300)}
    df = _token_df(spark, counts, partitions=16)
    cand = {
        r["item"]
        for r in frequent_item_candidates(df, "token", 50).collect()
    }
    total = sum(counts.values())
    for item, n in counts.items():
        if n > total / 51:
            assert item in cand, item


def test_heavy_hitters_equals_exact_answer(spark):
    counts = {"alpha": 500, "beta": 200, "gamma": 30} | {
        f"noise{i}": 1 for i in range(270)
    }
    total = sum(counts.values())
    df = _token_df(spark, counts, partitions=16)
    got = {
        r["item"]: r["cnt"]
        for r in heavy_hitters(df, "token", threshold_denom=10).collect()
    }
    expect = {t: n for t, n in counts.items() if n * 10 > total}
    assert got == expect


def test_snapshot_diff_statuses(spark):
    from pyspark.sql import functions as F

    from archive_to_parquet_spark.plans.maintenance import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "text"]
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], ["k", "text"]
    )
    got = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new, "k", F.md5("text")).collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_profile_table_exact_stats(spark):
    from archive_to_parquet_spark.plans.maintenance import profile_table

    df = spark.createDataFrame(
        [(1, None), (2, "x"), (2, "y"), (None, "y")],
        ["a", "b"],
    )
    rows = {r["column_name"]: r for r in profile_table(df, ["a", "b"]).collect()}
    assert rows["a"]["n_rows"] == 4
    assert rows["a"]["n_nulls"] == 1
    assert rows["a"]["n_distinct"] == 2
    assert rows["a"]["min_value"] == "1" and rows["a"]["max_value"] == "2"
    assert rows["b"]["n_nulls"] == 1
    assert rows["b"]["n_distinct"] == 2
