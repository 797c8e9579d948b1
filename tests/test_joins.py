"""as-of and range join operator semantics."""

from __future__ import annotations

from archive_to_parquet_spark.operators.joins import asof_join, range_join


def test_asof_backward(spark):
    trades = spark.createDataFrame(
        [("A", 10, 1), ("A", 25, 2), ("B", 5, 3)],
        "sym string, t long, trade_id long",
    )
    quotes = spark.createDataFrame(
        [("A", 8, 100.0), ("A", 10, 101.0), ("A", 20, 102.0), ("B", 9, 50.0)],
        "sym string, t long, px double",
    )
    out = {
        r.trade_id: r.px_right
        for r in asof_join(trades, quotes, "sym", "t", "t").collect()
    }
    assert out[1] == 101.0  # equal time matches (<= semantics)
    assert out[2] == 102.0  # latest quote before t=25
    assert out[3] is None  # B's only quote is at t=9 > 5


def test_asof_forward(spark):
    left = spark.createDataFrame([("k", 10, 1)], "g string, t long, id long")
    right = spark.createDataFrame(
        [("k", 5, 1.0), ("k", 12, 2.0), ("k", 30, 3.0)],
        "g string, t long, v double",
    )
    out = asof_join(left, right, "g", "t", "t", direction="forward").collect()
    assert out[0].v_right == 2.0  # earliest right at-or-after t=10


def test_range_join_bands(spark):
    rows = spark.createDataFrame(
        [(1, 5.0), (2, 49.999), (3, 50.0), (4, 150.0)], "id long, v double"
    )
    bands = spark.createDataFrame(
        [("a", 0.0, 50.0), ("b", 50.0, 150.0)], "band string, lo double, hi double"
    )
    out = {r.id: r.band for r in range_join(rows, bands, "v").collect()}
    assert out[1] == "a"
    assert out[2] == "a"
    assert out[3] == "b"  # lo inclusive
    assert out[4] is None  # hi exclusive, no band matches


def test_fuzzy_self_join_finds_typos_only(spark):
    from archive_to_parquet_spark.operators.joins import fuzzy_self_join

    df = spark.createDataFrame(
        [
            (1, "Evergreen Terrace 742"),
            (2, "Evergren Terrace 742"),   # 1 deletion
            (3, "evergreen terrace 742"),  # case-only: distance 0 after lower
            (4, "Mockingbird Lane 1313"),
            (5, "completely unrelated"),
        ],
        "id long, name string",
    )
    out = {(r.id_a, r.id_b): r.dist for r in fuzzy_self_join(df, "id", "name").collect()}
    assert out[(1, 2)] == 1
    assert out[(1, 3)] == 0
    assert out[(2, 3)] == 1
    assert not any({a, b} & {4, 5} for a, b in out)


def test_fuzzy_self_join_blocking_key_bounds_pairs(spark):
    from archive_to_parquet_spark.operators.joins import fuzzy_self_join

    df = spark.createDataFrame(
        [
            (1, "evergreen terrace", "us"),
            (2, "evergren terrace", "us"),
            (3, "evergreen terrace", "uk"),  # same name, other block
        ],
        "id long, name string, region string",
    )
    out = {
        (r.id_a, r.id_b)
        for r in fuzzy_self_join(df, "id", "name", block_col="region").collect()
    }
    assert out == {(1, 2)}  # cross-block pair (1,3) suppressed


def test_fuzzy_strategies_agree_and_auto_picks_by_length(spark):
    """Both candidate engines are exact, so they must return the SAME
    pair set; auto routes short corpora to deletions and long ones to
    q-gram prefixes (variants would be O(len²) per string)."""
    from pyspark.sql import functions as F

    from archive_to_parquet_spark.operators.joins import fuzzy_self_join

    part = (
        spark.read.parquet("/root/testdata/sf0.001/part.parquet")
        .select(F.col("p_partkey").alias("id"), F.col("p_name").alias("name"))
    )
    got_d = sorted(
        tuple(r)
        for r in fuzzy_self_join(
            part, "id", "name", strategy="deletions"
        ).collect()
    )
    got_q = sorted(
        tuple(r)
        for r in fuzzy_self_join(part, "id", "name", strategy="qgram").collect()
    )
    got_auto = sorted(
        tuple(r) for r in fuzzy_self_join(part, "id", "name").collect()
    )
    assert got_d == got_q
    assert got_auto == got_d  # short names -> deletion engine, same set
    assert len(got_d) > 0

    # long strings route to the q-gram engine and still verify exactly
    long_df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dogs tonight"),  # ED 1
            (3, "a completely different sentence that matches nothing."),
        ],
        "id long, name string",
    )
    out = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_self_join(long_df, "id", "name").collect()
    }
    assert out == {(1, 2): 1}

    import pytest

    with pytest.raises(ValueError):
        fuzzy_self_join(part, "id", "name", strategy="bogus")
    with pytest.raises(ValueError):
        fuzzy_self_join(part, "id", "name", max_edits=3, strategy="deletions")
