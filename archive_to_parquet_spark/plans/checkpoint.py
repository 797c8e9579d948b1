"""Plan-audit hook for ``localCheckpoint`` lineage truncation.

``df.localCheckpoint()`` truncates lineage: everything computed BEFORE
the checkpoint disappears from the final physical plan, so a
whole-catalog plan audit that only inspects each entry's final
DataFrame is blind to checkpoint-hidden subplans (VERDICT r5: the
audited "0 cartesian products" did not see `cosine_dbscan`'s all-pairs
generator executing inside an eager checkpoint).

:func:`recording_checkpoint_plans` instruments
``DataFrame.localCheckpoint`` for the duration of a ``with`` block:
the physical plan of every DataFrame is captured at the moment its
lineage is truncated. ``tools/scale_audit.py`` and the plan-hygiene
test wrap each catalog entry's construction in it, so the audit covers
the WHOLE computation — final plan + every checkpoint-hidden subplan —
including call sites added in the future (nothing to remember at the
call site). Normal execution is untouched.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame


def _dataframe_classes() -> list[type]:
    """Every DataFrame class whose ``localCheckpoint`` must be
    instrumented. Spark 4 routes ``pyspark.sql.DataFrame`` calls to a
    runtime subclass (``pyspark.sql.classic.dataframe.DataFrame``) that
    OVERRIDES ``localCheckpoint`` — patching only the base class would
    intercept nothing."""
    classes = [DataFrame]
    try:  # Spark 4 classic runtime
        from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

        classes.append(ClassicDF)
    except ImportError:
        pass
    # only classes that define localCheckpoint in their own __dict__
    return [c for c in classes if "localCheckpoint" in vars(c)]


def checkpoint_keeping_partitioning(df: DataFrame) -> DataFrame:
    """``localCheckpoint`` that RECORDS the plan's output partitioning.

    Under AQE, ``Dataset.localCheckpoint`` captures UnknownPartitioning
    — the adaptive plan's final partitioning isn't known when the
    LogicalRDD is built — so every consumer join/agg re-shuffles rows
    that are already correctly partitioned. Disabling AQE for just the
    checkpoint's own job makes the captured partitioning the static
    plan's HashPartitioning, which AQE-on consumers then reuse
    (verified empirically on Spark 4.1: the connected-components loop
    drops from ~4 exchanges/round to the 1 its aggregation genuinely
    needs). Trade-off: the checkpointed subplan itself executes without
    AQE (no runtime coalescing / skew splits) — use for bounded
    intermediates, not giant scans."""
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return df.localCheckpoint()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def checkpoint_partitioned(df: DataFrame, *cols: str) -> DataFrame:
    """Materialize ``df`` hash-partitioned on ``cols`` with the
    partitioning preserved through the checkpoint: pay ONE explicit
    shuffle now so every downstream consumer keyed on ``cols`` — self
    joins, repeated loop joins — plans exchange-free against the
    materialized relation. The partition count is pinned to the
    session's ``spark.sql.shuffle.partitions`` so consumer-side
    aggregations/joins (which shuffle to the same count) co-partition.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return checkpoint_keeping_partitioning(
        df.repartition(n, *[F.col(c) for c in cols])
    )


@contextmanager
def recording_checkpoint_plans(sink: list[str]):
    """Within the block, every ``localCheckpoint`` call appends the
    physical plan of the DataFrame being truncated to ``sink``."""
    targets = _dataframe_classes()
    originals = {c: vars(c)["localCheckpoint"] for c in targets}

    def make_recording(orig):
        # forward the FULL signature (Spark 4 adds storageLevel): a call
        # site using a kwarg we didn't anticipate must not break only
        # while instrumented
        def recording(self, *args, **kwargs):
            sink.append(
                self._jdf.queryExecution().executedPlan().toString()
            )
            return orig(self, *args, **kwargs)

        return recording

    for c in targets:
        setattr(c, "localCheckpoint", make_recording(originals[c]))
    try:
        yield sink
    finally:
        for c in targets:
            setattr(c, "localCheckpoint", originals[c])
