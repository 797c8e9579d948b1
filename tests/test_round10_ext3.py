"""Semantic invariants for the round-10 additions: the bucketed
suffix index + incremental probe, and the Observation-fused
connected-components convergence probe.

The oracle sweep (tools/check_correctness.py) certifies value equality
vs DuckDB; these tests pin the properties the entries CLAIM — the
index/batch split, the delta semantics (only prefixes absent from the
even-doc index survive), agreement with the shared suffix builder,
and that the CC loop's job-count cut changed neither labels nor
convergence behavior.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from archive_to_parquet_spark.queries_ext3 import (
    _SFX_MIN,
    _suffix_rows,
    dedup_suffix_lcp_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


def test_suffix_bucketed_delta_semantics(spark):
    from archive_to_parquet_spark.queries_ext import _t

    rows = dedup_suffix_lcp_bucketed(spark, SF_DIR).collect()
    docs = _t(spark, SF_DIR, "documents")
    sfx = _suffix_rows(docs).select("doc_id", "pfx")
    idx = {
        r["pfx"]
        for r in sfx.filter(F.col("doc_id") % 2 == 0)
        .select("pfx")
        .distinct()
        .collect()
    }
    batch = [
        (r["doc_id"], r["pfx"])
        for r in sfx.filter(F.col("doc_id") % 2 == 1).collect()
    ]
    # expected delta: batch prefixes absent from the index, grouped
    expect: dict[str, list[int]] = {}
    for doc_id, pfx in batch:
        if pfx not in idx:
            expect.setdefault(pfx, []).append(doc_id)
    assert len(rows) == len(expect) > 0
    for r in rows:
        assert len(r["pfx"]) == _SFX_MIN
        assert r["pfx"] not in idx
        assert r["first_doc"] == min(expect[r["pfx"]])
        assert r["n_suffixes"] == len(expect[r["pfx"]])
        assert r["first_doc"] % 2 == 1  # batch side only


def test_suffix_bucketed_reruns_reuse_staged_tables(spark):
    # second execution must serve the SAME staged bucket files (the
    # pay-the-shuffle-once contract) and equal results
    a = sorted(
        map(tuple, dedup_suffix_lcp_bucketed(spark, SF_DIR).collect())
    )
    b = sorted(
        map(tuple, dedup_suffix_lcp_bucketed(spark, SF_DIR).collect())
    )
    assert a == b


def test_connected_components_observation_probe(spark):
    """The fused Observation probe must preserve exact CC semantics:
    min-reachable-id labels, convergence on chains (worst case for
    min-label propagation), singletons via self-loops."""
    from archive_to_parquet_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 20)],
        "id_a long, id_b long",
    ).localCheckpoint()
    got = sorted(
        (r["id"], r["component"])
        for r in connected_components(pairs).collect()
    )
    assert got == [
        (1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (20, 20),
    ]


def test_connected_components_empty_pairs(spark):
    from archive_to_parquet_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0


def test_near_clusters_star_agrees_with_label_on_corpus(spark):
    """The two CC implementations must produce identical clusterings
    through the FULL near-dup entry (LSH candidates → exact-Jaccard
    confirm → components) on real corpus data — the claim the
    dedup_near_clusters_star oracle certifies at the driver."""
    from archive_to_parquet_spark.queries import (
        dedup_near_clusters,
        dedup_near_clusters_star,
    )

    label = sorted(
        map(tuple, dedup_near_clusters(spark, SF_DIR).collect())
    )
    star = sorted(
        map(tuple, dedup_near_clusters_star(spark, SF_DIR).collect())
    )
    assert label == star
    # sanity: at least one non-trivial cluster exists at sf0.001
    assert any(doc != comp for doc, comp, _rep in label)
