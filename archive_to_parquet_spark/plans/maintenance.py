"""Dataset maintenance: small-file compaction and multi-dimensional
sort layout (Z-order) for parquet data skipping.

A long-running 100 TB pipeline accretes small files (incremental
ingest, streaming sinks, skewed writes) and loses scan selectivity
when row-group min/max stats span whole value ranges. These two
operators are the standard maintenance pair: compaction rewrites a
dataset into target-size files; Z-ordering rewrites it so that
correlated filter columns cluster within files/row-groups, making
parquet predicate pushdown prune most of the data.

Both are pure DataFrame rewrites — no custom commit protocol; writes
go to a NEW directory (atomic swap is the caller's rename, mirroring
how table formats commit a compaction as a metadata operation).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _dataset_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_dataset(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_file_mb: int = 512,
    compression: str = "snappy",
) -> int:
    """Rewrite a parquet dataset into ~``target_file_mb`` files.

    File count = ceil(current on-disk bytes / target) — on-disk size
    already reflects encoding+compression, so the estimate holds for
    the rewrite. Uses ``coalesce`` (narrow, no shuffle: tasks read
    multiple small files each) rather than ``repartition`` — a
    compaction's goal is io-layout, not redistribution; rows keep
    their relative order. Returns the target file count.
    """
    n_files = max(1, -(-_dataset_bytes(in_dir) // (target_file_mb << 20)))
    (
        spark.read.parquet(in_dir)
        .coalesce(n_files)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(out_dir)
    )
    return n_files


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of 2+ dimension columns, entirely in
    JVM bit expressions.

    Each column is rank-quantized by the CALLER (pass e.g. a percent_rank
    scaled to [0, 2^bits)) or is already a bounded non-negative int.
    Interleaving bit i of each dimension keeps multi-dimensional
    locality: rows close in every dimension get close keys, so sorting
    by the key clusters them into the same row groups and parquet
    min/max stats become selective for ALL interleaved columns, not
    just a lexicographic prefix.
    """
    dims = [F.col(c) if isinstance(c, str) else c for c in cols]
    key: Column = F.lit(0).cast("long")
    n = len(dims)
    for b in range(bits):
        for d, dim in enumerate(dims):
            bit = F.shiftright(dim.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, b * n + d).cast("long")
            )
    return key


def write_zordered(
    df: DataFrame,
    out_dir: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write ``df`` Z-ordered on ``cols``: quantize each column to its
    ``2^bits``-bucket rank (ntile over a sample-free percent_rank is a
    global sort; instead we range-partition on the z-key directly),
    interleave, range-repartition + sort by the key, write parquet.

    Quantization here uses min/max scaling (one cheap agg pass,
    broadcast back) — rank-based quantization is better for heavy skew
    at the cost of a sort; swap in ntile if the distribution demands.
    """
    spark = df.sparkSession
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    stats = df.agg(*aggs)
    scaled = df.crossJoin(F.broadcast(stats))
    qcols = []
    top = (1 << bits) - 1
    for c in cols:
        rng = F.col(f"__mx_{c}") - F.col(f"__mn_{c}")
        q = F.when(rng <= 0, F.lit(0)).otherwise(
            F.least(
                F.floor(
                    (F.col(c) - F.col(f"__mn_{c}"))
                    / rng
                    * F.lit(top + 1)
                ).cast("long"),
                F.lit(top).cast("long"),
            )
        )
        qcols.append(q.alias(f"__q_{c}"))
    keyed = scaled.select("*", *qcols).withColumn(
        "__zkey", zorder_key([f"__q_{c}" for c in cols], bits)
    )
    n = num_files or int(spark.conf.get("spark.sql.shuffle.partitions"))
    (
        keyed.repartitionByRange(n, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *[f"__q_{c}" for c in cols],
              *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def upsert_partitioned(
    spark: SparkSession,
    dataset_path: str,
    updates: DataFrame,
    key: str,
    partition_col: str,
) -> dict[str, int]:
    """MERGE (upsert-by-key) into a directory-partitioned parquet
    dataset, rewriting ONLY the partitions the updates touch.

    Semantics: rows in ``updates`` replace existing rows with the same
    ``key``; new keys are appended. ``updates`` must already carry
    ``partition_col`` (for the hash-prefix layout produced by
    plans/sink.py, derive it with the same expression), and a key must
    map to one partition — guaranteed when the partition value is a
    function of the key, asserted cheaply here via the touched-partition
    count.

    Plan (100 TB shape): the touched partition values are a tiny
    distinct agg over updates (collected — partition VALUES, not data);
    only those directories are read back (partition pruning via the
    IN filter on the partition column); old rows lose to updates via
    left_anti on key; the union overwrites JUST the touched directories
    with dynamic partition overwrite — untouched partitions are never
    read, shuffled, or rewritten. Returns counters
    {touched_partitions, updated_or_new_rows, kept_rows}.
    """
    touched = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    existing = (
        spark.read.parquet(dataset_path)
        .filter(F.col(partition_col).isin(touched))
    )
    kept = existing.join(
        updates.select(F.col(key)), on=key, how="left_anti"
    )
    # materialize BEFORE the overwrite: the merged plan reads the very
    # partition files dynamic overwrite is about to delete — without the
    # checkpoint the lazy scan would race its own commit
    merged = (
        kept.select(updates.columns).unionByName(updates).localCheckpoint()
    )
    merged_n = merged.count()
    updates_n = updates.count()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(dataset_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {
        "touched_partitions": len(touched),
        "updated_or_new_rows": updates_n,
        "kept_rows": merged_n - updates_n,
    }


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    fingerprint: Column | str,
) -> DataFrame:
    """Row-level diff between two dataset snapshots: (key, status) with
    status ∈ added | removed | changed | unchanged.

    ``fingerprint`` is a content-hash expression evaluated on BOTH
    sides (e.g. ``F.md5("text")``); rows compare by fingerprint, not by
    full payload, so the full-outer join carries key + 32-byte digest
    only — at 100 TB the shuffle moves digests, never documents. One
    shuffle per side on the key.
    """
    fp = F.col(fingerprint) if isinstance(fingerprint, str) else fingerprint
    o = old.select(F.col(key), fp.alias("fp_old"))
    n = new.select(F.col(key), fp.alias("fp_new"))
    return o.join(n, key, "full_outer").select(
        key,
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style column profile: one row per column with row count,
    null count, exact distinct count, and min/max rendered as strings.

    All columns profile in ONE pass: a single aggregation computes
    every per-column statistic map-side-combinably except distinct
    counts, which Spark rewrites into its Expand-based multi-distinct
    aggregation — still one shuffle, no per-column re-scan. The wide
    1-row result unpivots to (column, stat...) rows driver-side-free
    via stack.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args: list[str] = []
    for c in cols:
        stack_args.append(
            f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        )
    return wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
    ).select(
        "column_name", "n_rows", "n_nulls", "n_distinct",
        "min_value", "max_value",
    )
