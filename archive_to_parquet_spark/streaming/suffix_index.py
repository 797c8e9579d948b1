"""Continuous incremental substring-dedup index over a document
stream — the streaming leg of the bucketed suffix family
(``dedup_suffix_lcp`` → ``dedup_suffix_lcp_bucketed`` → this).

Every micro-batch:

1. computes the batch's word-start suffix prefix rows
   (``queries_ext3._suffix_rows`` — the same builder as the batch
   entries, so all three agree on the suffix universe);
2. probes the ACCUMULATED prefix index for the prefixes this batch
   INTRODUCES (left-anti join on ``pfx``; the stored side excludes
   the current ``batch_id`` so an at-least-once replay cannot match
   its own previously-appended rows and erase its delta);
3. emits the delta — one row per newly-seen 25-char prefix with the
   batch-local ``first_doc`` and occurrence count — and appends the
   batch's distinct prefixes to the index. Both writes land under a
   ``batch_id=N`` partition with mode=overwrite, so replays converge
   to exactly-once.

Determinism: a prefix is emitted exactly once, by the FIRST batch
containing it, with ``first_doc``/``n_suffixes`` computed within that
batch — a closed form over (document, arrival-batch) that the catalog
entry's DuckDB oracle states directly. This is the daily loop of a
100-TB substring-dedup index: each arriving shard is normalized and
suffix-expanded exactly once, the index is probe+append (never
re-derived), and with the index persisted bucketed on ``pfx``
(``dedup_suffix_lcp_bucketed``'s layout) the probe never re-shuffles
stored state.

No reference twin: the reference's dedup is exact-hash only
(src/lib.rs:30 `unique`); this extends its streaming ingest model to
substring-level dedup evidence.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from archive_to_parquet_spark.streaming.neardup import _index_exists


def probe_and_append_prefixes(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    delta_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_id: int = 0,
) -> None:
    """One micro-batch of the continuous substring-index loop: emit
    the prefixes this batch introduces (with batch-local first_doc and
    count), then append the batch's distinct prefixes to the index —
    both under the batch_id partition, overwrite (replay-idempotent).
    """
    from archive_to_parquet_spark.queries_ext3 import _suffix_rows

    sfx = _suffix_rows(
        batch.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        )
    )
    agg = (
        sfx.groupBy("pfx")
        .agg(
            F.min("doc_id").alias("first_doc"),
            F.count(F.lit(1)).alias("n_suffixes"),
        )
        .localCheckpoint()  # feeds the delta anti-join AND the append
    )
    delta = agg
    if _index_exists(index_dir):
        stored = (
            spark.read.parquet(index_dir)
            # a replayed batch already appended its own prefixes;
            # excluding them keeps the anti-join from erasing the
            # replay's delta (the suffix-family twin of neardup's
            # a.id != b.id guard)
            .filter(F.col("batch_id") != batch_id)
            .select("pfx")
        )
        delta = agg.join(stored, "pfx", "left_anti")
    delta.write.mode("overwrite").parquet(
        os.path.join(delta_dir, f"batch_id={batch_id}")
    )
    agg.select("pfx").write.mode("overwrite").parquet(
        os.path.join(index_dir, f"batch_id={batch_id}")
    )


def suffix_index_stream(
    spark: SparkSession,
    stream: DataFrame,
    index_dir: str,
    delta_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Wire a streaming DataFrame of documents into the prefix
    probe/append loop. Returns the started StreamingQuery; drive with
    ``processAllAvailable()`` for bounded input or leave running for
    continuous ingest."""

    def _each_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.isEmpty():
            probe_and_append_prefixes(
                spark,
                batch,
                index_dir,
                delta_dir,
                id_col,
                text_col,
                batch_id=batch_id,
            )

    return (
        stream.writeStream.foreachBatch(_each_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
