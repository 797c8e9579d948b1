"""Tests: profiling/audit operators (flesch_readability,
benford_first_digit) in their reusable DataFrame-in/out form."""

from __future__ import annotations

import pytest


def test_flesch_readability_hand_computed(spark):
    from archive_to_parquet_spark.operators.profiling import flesch_readability

    # "go on. stop!" → words=3, sentences=2, syllables=3 (o, o, o)
    df = spark.createDataFrame([(1, "go on. stop!")], ["doc_id", "text"])
    row = flesch_readability(df, keep_cols=["doc_id"]).collect()[0]
    assert (row.n_words, row.n_sentences, row.n_syllables) == (3, 2, 3)
    want = round(206.835 - 1.015 * (3 / 2) - 84.6 * (3 / 3), 4)
    assert row.flesch == pytest.approx(want, abs=1e-9)


def test_flesch_readability_empty_text_guards(spark):
    from archive_to_parquet_spark.operators.profiling import flesch_readability

    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    row = flesch_readability(df).collect()[0]
    # greatest(…, 1) guards both divisions — no null/NaN/Inf
    assert row.flesch is not None and row.n_sentences == 1


def test_flesch_keeps_all_columns_by_default(spark):
    from archive_to_parquet_spark.operators.profiling import flesch_readability

    df = spark.createDataFrame([(1, "en", "hi there")], ["doc_id", "lang", "text"])
    out = flesch_readability(df)
    assert out.columns == [
        "doc_id", "lang", "text", "n_words", "n_sentences", "n_syllables", "flesch",
    ]


def test_benford_first_digit_counts_and_rates(spark):
    from archive_to_parquet_spark.operators.profiling import benford_first_digit

    # 6 values starting with 1, 3 with 2, 1 with 9
    vals = [1.5, 10.0, 199.99, 12.0, 150.0, 1.01, 2.5, 25.0, 234.0, 900.0]
    df = spark.createDataFrame([(v,) for v in vals], ["price"])
    rows = {r.digit: r for r in benford_first_digit(df, "price").collect()}
    assert rows[1].n == 6 and rows[2].n == 3 and rows[9].n == 1
    assert set(rows) == {1, 2, 9}
    # observed_e9 = half-up(n/total × 1e9)
    assert rows[1].observed_e9 == 600000000
    assert rows[2].observed_e9 == 300000000
    # expected rate for digit 1 is log10(2) ≈ 0.301029996
    assert rows[1].expected_e9 == 301029996
    assert rows[1].gap_e9 == abs(600000000 - 301029996)


def test_benford_ignores_nonpositive_leading_digits(spark):
    from archive_to_parquet_spark.operators.profiling import benford_first_digit

    df = spark.createDataFrame(
        [(0.0,), (-5.0,), (3.0,)], ["v"]
    )  # "0…" and "-…" parse to non-1-9 first chars
    rows = benford_first_digit(df, "v").collect()
    assert [(r.digit, r.n) for r in rows] == [(3, 1)]


def test_benford_plan_broadcasts_stat_frames(spark):
    from archive_to_parquet_spark.operators.profiling import benford_first_digit

    df = spark.createDataFrame([(123.0,)], ["v"])
    plan = (
        benford_first_digit(df, "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
