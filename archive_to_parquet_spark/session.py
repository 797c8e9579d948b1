"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]``; the same configs are what we'd set on a
real cluster (AQE on, Arrow on, UTC, shuffle partitions sized to the
parallelism at hand rather than the 200 default).
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))


def ensure_package_shipped(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile``.

    Executors unpickle mapInPandas/pandas_udf closures by module name;
    that import only works when the driver's cwd happens to be the repo
    root. Shipping a zip makes the engine usable from any session and
    any working directory (and, on a real cluster, any executor host).
    Idempotent per session.
    """
    sc = spark.sparkContext
    flag = "_a2p_pkg_shipped"
    if getattr(sc, flag, False):
        return
    zip_path = os.path.join("/tmp", "archive_to_parquet_spark_pkg.zip")
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < max(
        os.path.getmtime(os.path.join(root, f))
        for root, _, files in os.walk(_PKG_DIR)
        for f in files
        if f.endswith(".py")
    ):
        # pid-unique staging name: concurrent drivers (bench + audit in
        # parallel) each rename their own finished zip into place
        # instead of racing on one shared .tmp
        tmp = f"{zip_path}.{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for root, _, files in os.walk(_PKG_DIR):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(_PKG_DIR))
                    zf.write(full, rel)
        os.replace(tmp, zip_path)
    sc.addPyFile(zip_path)
    setattr(sc, flag, True)


def get_spark(
    app_name: str = "archive_to_parquet_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # An already-running session is returned UNTOUCHED: getOrCreate
    # applies every builder .config() to the existing session's runtime
    # conf, so a second get_spark() call in the same process (e.g.
    # cli.main() used as a library function next to a caller-owned
    # session) would silently clobber the caller's shuffle-partition
    # count and planner settings — measured as a plan-shape drift
    # (an extra exchange) in entries whose explicit repartitions are
    # sized to co-partition with the session's shuffle count.
    existing = SparkSession.getActiveSession() or getattr(
        SparkSession, "_instantiatedSession", None
    )
    if existing is not None:
        try:  # cheap public probe: raises/None once the session stopped
            alive = existing.sparkContext.applicationId is not None
        except Exception:
            alive = False
        if alive:
            # the silent-ignore path must at least be observable
            # (ADVICE r11): a caller requesting a specific conf gets the
            # existing session's values, whatever they are
            requested = dict(extra_conf or {})
            if shuffle_partitions is not None:
                requested["spark.sql.shuffle.partitions"] = str(
                    shuffle_partitions
                )
            mismatched = {
                k: (existing.conf.get(k, None), str(v))
                for k, v in requested.items()
                if existing.conf.get(k, None) != str(v)
            }
            if master is not None and existing.sparkContext.master != master:
                mismatched["master"] = (existing.sparkContext.master, master)
            if mismatched:
                import warnings

                warnings.warn(
                    "get_spark: returning the existing live session; "
                    f"explicitly requested conf ignored: {mismatched}",
                    stacklevel=2,
                )
            ensure_package_shipped(existing)
            return existing
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    # SPARK_GRAFT_SHUFFLE_PARTITIONS exists so the oracle gate can be
    # re-run at a hostile partition count (e.g. 7) as a dynamic proof
    # of partition-order independence — results must not change.
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's parallelism-first coalescing merges post-shuffle
        # partitions up to minPartitionSize (default 1m) — right for
        # byte-bound stages, wrong for the CPU-heavy kernels this
        # engine runs on KB-scale shuffled rows (shingle-array
        # intersections, vector distances): a 6 MB shuffle coalesced to
        # 5 × ~1.2 MB partitions pins minutes of per-row compute to 5
        # cores (measured: dedup_ngram_jaccard's confirm stage, 5.5 s
        # executor time over 5 tasks). 256k floors the merge so small
        # shuffles keep the session's parallelism (64k measured better
        # on the confirm stages but cost iterative loops +1.1 s in
        # per-round task-launch overhead); production-size shuffles sit
        # far above either threshold and are untouched.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensure_package_shipped(spark)
    return spark
