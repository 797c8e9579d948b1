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
