"""Bucketed-table layout for co-located, exchange-free repeated joins.

At 100 TB the same big-big join (lineitem ⨝ orders on orderkey, or
entries ⨝ entries on hash) recurs across workloads; bucketing both
tables on the join key at write time makes every subsequent join
shuffle-free — the exchange is paid once at layout time instead of per
query. Verified by asserting no Exchange operator in the joined plan
(tests/test_bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table.

    With ``path`` the table is external at that location — use when the
    session's warehouse dir may not be writable (a session we don't
    own); bucketing metadata lives in the catalog either way, so the
    exchange-free join plan is identical."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planned
    without any Exchange when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), on)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a SHUFFLE Exchange.

    BroadcastExchange doesn't count — it replicates a small side without
    repartitioning rows; bucketing exists to remove shuffle exchanges.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.replace("BroadcastExchange", "").count("Exchange") > 0
