"""Tuned Parquet sink (K1–K4).

The reference writes one Parquet file with per-column tuning (reference
src/sink.rs:23-55): PARQUET_2_0, dictionary OFF globally but ON for
``source``/``path``, bloom filters for ``source``/``path``/``hash``,
statistics for everything except ``content``, PLAIN encoding for
``hash``, 1 MiB / 2000-row pages, 1,048,576-row groups.

Spark carries these as Hadoop parquet options. The scalable default is
one file per partition (a single 100 TB file is an anti-pattern);
``single_file=True`` coalesces for byte-level layout parity with the
reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from archive_to_parquet_spark.options import ConvertOptions

# reference src/sink.rs:35-38
_PAGE_SIZE = 1024 * 1024
_PAGE_ROW_LIMIT = 2000
_ROW_GROUP_ROWS = 1_048_576  # the reference's per-group ROW cap; Spark's
# parquet.block.size is a BYTE cap — ConvertOptions.row_group_bytes
# approximates it (and tests assert the resulting group geometry).


def write_parquet(
    df: DataFrame,
    output: str,
    options: ConvertOptions | None = None,
    mode: str = "overwrite",
    partition_by_hash_prefix: bool = False,
) -> None:
    """Write the entries table.

    ``partition_by_hash_prefix`` is the 100 TB layout: directory
    partitions on the first hash byte (256 uniform buckets, since
    SHA-256 is uniform by construction) so point lookups and
    incremental dedup prune 255/256 of the files before bloom filters
    even load. Mutually exclusive with ``single_file``.
    """
    options = options or ConvertOptions()
    if partition_by_hash_prefix:
        from pyspark.sql import functions as F

        df = df.withColumn("hash_prefix", F.hex(F.substring("hash", 1, 1)))
        writer = df.write.mode(mode).partitionBy("hash_prefix")
    else:
        writer = (df.coalesce(1) if options.single_file else df).write.mode(mode)
    writer = (
        writer.option("compression", options.compression)
        # dictionary: off globally, on for the low-cardinality string cols
        # (reference src/sink.rs:30-33; interning parity src/batch.rs:82)
        .option("parquet.enable.dictionary", "false")
        .option("parquet.enable.dictionary#source", "true")
        .option("parquet.enable.dictionary#path", "true")
        # bloom filters for point lookups on source/path/hash
        # (reference src/sink.rs:41-47)
        .option("parquet.bloom.filter.enabled", "false")
        .option("parquet.bloom.filter.enabled#source", "true")
        .option("parquet.bloom.filter.enabled#path", "true")
        .option("parquet.bloom.filter.enabled#hash", "true")
        # page limits (reference src/sink.rs:35-37)
        .option("parquet.page.size", str(_PAGE_SIZE))
        .option("parquet.page.row.count.limit", str(_PAGE_ROW_LIMIT))
        # row-group cap (reference src/sink.rs:38 caps ROWS; parquet-java
        # caps bytes — see ConvertOptions.row_group_bytes)
        .option("parquet.block.size", str(options.row_group_bytes))
        .option("parquet.writer.version", "v2")
    )
    writer.parquet(output)
