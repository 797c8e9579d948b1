"""Round-11 streaming-index compaction invariants.

The oracle sweep certifies `maintenance_stream_index_compaction`'s
values vs DuckDB; these tests pin the properties the operator CLAIMS,
driven through the REAL streaming writer (probe_and_append_prefixes):

- probe-equivalence: an anti-join probe returns identical rows against
  the raw batch-partitioned index and against (compacted base + young
  tail) — compaction is invisible to queries;
- idempotence: re-running the fold yields the same base contents;
- the folded-batch decision is a partition-directory listing
  (metadata), and it names exactly the batches at/below the watermark;
- the per-batch persist used inside the writer is RELEASED at the end
  of each batch (r10 advice: the old localCheckpoint leaked executor
  storage block-by-block under continuous ingest).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from archive_to_parquet_spark.streaming.suffix_index import (
    aged_batch_ids,
    compact_suffix_index,
    probe_and_append_prefixes,
)

# ≥25-char word-start suffixes required (the _SFX_MIN threshold);
# batches share some long substrings so anti-joins have real work
_DOCS = {
    0: [
        (1, "the quick brown fox jumps over the lazy dog in the morning"),
        (2, "completely unrelated sentence about database compaction"),
    ],
    1: [
        (3, "the quick brown fox jumps over the lazy dog in the evening"),
        (4, "streaming indexes accumulate one partition per micro batch"),
    ],
    2: [
        (5, "bucketed layouts answer probes without any shuffle exchange"),
    ],
    3: [
        (6, "the young tail partition stays out of the compacted base"),
        (7, "streaming indexes accumulate one partition per micro batch"),
    ],
}
_PROBE_DOCS = [
    (8, "the quick brown fox jumps over the lazy dog in the morning"),
    (9, "a genuinely novel sentence that no earlier batch contained"),
    (10, "bucketed layouts answer probes without any shuffle exchange"),
]


@pytest.fixture()
def index_dirs(spark):
    root = tempfile.mkdtemp(prefix="t_sfx_compact_")
    index_dir = os.path.join(root, "index")
    delta_dir = os.path.join(root, "delta")
    for b, rows in _DOCS.items():
        batch = spark.createDataFrame(rows, "doc_id: long, text: string")
        probe_and_append_prefixes(
            spark, batch, index_dir, delta_dir, batch_id=b
        )
    yield root, index_dir, delta_dir
    shutil.rmtree(root, ignore_errors=True)


def _probe_rows(spark, probe_df, stored_pfx):
    return sorted(
        (r["pfx"], r["first_doc"], r["n_suffixes"])
        for r in probe_df.join(stored_pfx, "pfx", "left_anti")
        .groupBy("pfx")
        .agg(
            F.min("doc_id").alias("first_doc"),
            F.count("*").alias("n_suffixes"),
        )
        .collect()
    )


def test_probe_identical_before_and_after_fold(spark, index_dirs):
    from archive_to_parquet_spark.queries_ext3 import _suffix_rows

    root, index_dir, _delta = index_dirs
    probe = _suffix_rows(
        spark.createDataFrame(_PROBE_DOCS, "doc_id: long, text: string")
    ).select("doc_id", "pos", "pfx")

    raw = spark.read.parquet(index_dir).select("pfx")
    before = _probe_rows(spark, probe, raw)
    assert before, "probe batch must introduce at least one new prefix"

    folded = compact_suffix_index(
        spark,
        index_dir,
        "t_sfx_base",
        os.path.join(root, "base"),
        max_batch_id=2,
    )
    assert folded == [0, 1, 2]
    tail = (
        spark.read.parquet(index_dir)
        .filter(F.col("batch_id") > 2)
        .select("pfx")
    )
    compacted = spark.table("t_sfx_base").select("pfx").unionByName(tail)
    after = _probe_rows(spark, probe, compacted)
    assert after == before


def test_fold_is_idempotent_and_base_is_exact_prefix_set(spark, index_dirs):
    root, index_dir, _delta = index_dirs
    compact_suffix_index(
        spark, index_dir, "t_sfx_base_a", os.path.join(root, "ba"),
        max_batch_id=2,
    )
    compact_suffix_index(
        spark, index_dir, "t_sfx_base_b", os.path.join(root, "bb"),
        max_batch_id=2,
    )
    a = sorted(r["pfx"] for r in spark.table("t_sfx_base_a").collect())
    b = sorted(r["pfx"] for r in spark.table("t_sfx_base_b").collect())
    want = sorted(
        r["pfx"]
        for r in spark.read.parquet(index_dir)
        .filter(F.col("batch_id") <= 2)
        .select("pfx")
        .distinct()
        .collect()
    )
    assert a == b == want
    assert len(want) == len(set(want))  # distinct-by-construction


def test_aged_batch_ids_is_a_directory_listing(index_dirs):
    _root, index_dir, _delta = index_dirs
    assert aged_batch_ids(index_dir, 2) == [0, 1, 2]
    assert aged_batch_ids(index_dir, 0) == [0]
    assert aged_batch_ids(index_dir, -1) == []
    assert aged_batch_ids(index_dir, 99) == [0, 1, 2, 3]


def test_writer_releases_batch_persist(spark, index_dirs):
    _root, index_dir, delta_dir = index_dirs
    jsc = spark.sparkContext._jsc.sc()
    # one more batch through the writer: afterwards nothing it cached
    # may remain pinned in executor storage
    before = jsc.getPersistentRDDs().size()
    batch = spark.createDataFrame(
        [(11, "one more batch flowing through the continuous ingest loop")],
        "doc_id: long, text: string",
    )
    probe_and_append_prefixes(spark, batch, index_dir, delta_dir, batch_id=4)
    assert jsc.getPersistentRDDs().size() <= before
