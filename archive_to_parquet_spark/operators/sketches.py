"""Mergeable frequent-items sketch (Misra-Gries / space-saving family).

Complements the Datasketches HLL path (queries.sketch_mergeable_hll,
built on ``hll_sketch_agg``): Spark ships no frequent-items sketch
aggregate, so this implements the classic Misra-Gries summary as an
Arrow-batched partial + a plain ``groupBy().sum()`` merge — the same
two-level (partial → merge) shape as any distributive Spark aggregate.

Scale design (100 TB): each task emits at most ``k`` rows per Arrow
batch regardless of input size, so the shuffle into the merge is
O(tasks × k), not O(distinct items) — the entire point of the sketch at
web scale, where the exact token→count table itself is huge. The merge
is an ordinary hash aggregation on the compact partials.

Guarantee (standard MG bound): for the merged summary,
``f(x) - N/(k+1) <= lb(x) <= f(x)`` where N is the total item count.
Hence every item with true frequency > N/t for any t <= k is present
with a positive lower bound — the certificate ``heavy_hitters`` uses.

The batch kernel is pandas/numpy-vectorized: per batch an exact
``value_counts`` (C-side), a concat-groupby merge into the running
summary, and the set-MG compression (subtract the (k+1)-th largest
count, keep positive) as array ops. No per-row Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_PARTIAL_SCHEMA = StructType(
    [
        StructField("item", StringType(), False),
        StructField("lb", LongType(), False),
    ]
)


def _mg_compress(summary: pd.Series, k: int) -> pd.Series:
    """Set-form Misra-Gries compression: if more than ``k`` counters,
    subtract the (k+1)-th largest count from all and drop non-positive
    — at most ``k`` survive (fewer under ties), and each surviving
    counter remains a lower bound on its item's true count."""
    if len(summary) <= k:
        return summary
    cut = summary.nlargest(k + 1).iloc[-1]
    kept = summary[summary > cut] - cut
    return kept


def misra_gries_partials(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-task Misra-Gries summaries of ``df[col]`` as (item, lb) rows,
    at most ``k`` rows per Arrow batch. Merge with
    ``groupBy("item").sum("lb")`` — summing MG summaries is itself a
    valid MG summary of the union (counts only ever under-estimate)."""

    def mg(batches):
        summary = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            if vc.empty:
                continue
            summary = (
                vc
                if summary.empty
                else pd.concat([summary, vc]).groupby(level=0).sum()
            )
            summary = _mg_compress(summary, k)
        if not summary.empty:
            yield pd.DataFrame(
                {"item": summary.index.astype(str), "lb": summary.to_numpy()}
            )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        mg, _PARTIAL_SCHEMA
    )


def frequent_item_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Merged MG candidate set: (item, lb) with lb > 0. Superset of all
    items with true frequency > N/(k+1); lb never over-counts."""
    return (
        misra_gries_partials(df, col, k)
        .groupBy("item")
        .agg(F.sum("lb").alias("lb"))
        .filter(F.col("lb") > 0)
    )


def heavy_hitters(
    df: DataFrame, col: str, *, threshold_denom: int = 100, k: int | None = None
) -> DataFrame:
    """Exact heavy hitters (count·denom > N) certified through the MG
    sketch: the exact per-item counts are semi-joined against the
    merged candidate set, so a sketch that violated its guarantee would
    visibly DROP rows versus the exact answer — the correctness oracle
    compares against the exact side. ``k`` defaults to 3× the denom,
    comfortably inside the N/(k+1) error bound."""
    if k is None:
        k = 3 * threshold_denom
    items = df.select(F.col(col).cast("string").alias("item")).filter(
        F.col("item").isNotNull() & (F.length("item") > 0)
    )
    counts = items.groupBy("item").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    exact_heavy = counts.join(F.broadcast(total)).filter(
        F.col("cnt") * threshold_denom > F.col("total")
    )
    candidates = frequent_item_candidates(items, "item", k)
    return exact_heavy.join(candidates, "item", "left_semi").select(
        F.col("item"), F.col("cnt")
    )
