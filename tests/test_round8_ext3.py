"""Semantic invariants for the round-8 second-leg additions: hybrid
RRF retrieval, the Deequ-style constraint suite, compaction planning,
suffix-sort maximal repeats, the Welch A/B readout, the streaming
constraint monitor, label propagation, and Neyman sampling.

The oracle sweep (tools/check_correctness.py) certifies value equality
vs DuckDB; these tests pin the properties the entries CLAIM — fusion
arithmetic, report semantics, bin-packing invariants, and exact
maximal-repeat lengths on a planted corpus — so a refactor that stays
hash-equal to a changed oracle cannot silently weaken the semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from archive_to_parquet_spark.queries_ext3 import (
    _COMPACT_OVERHEAD,
    _COMPACT_TARGET,
    _HYB_DEPTH,
    _HYB_OUT,
    _NEYMAN_BUDGET,
    _RRF_K,
    _SFX_LEN,
    _SFX_MIN,
    audit_constraint_suite,
    dedup_suffix_lcp,
    eval_ab_welch_ttest,
    graph_label_propagation,
    maintenance_compaction_plan,
    sample_stratified_neyman,
    search_hybrid_rrf,
)

SF_DIR = "/root/testdata/sf0.001"


# -- hybrid RRF ----------------------------------------------------------


def test_hybrid_rrf_fusion_arithmetic_and_shape(spark):
    rows = search_hybrid_rrf(spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # query set is exactly the every-100th example docs
    assert all(qid % 100 == 50 for qid in by_q)
    lo = round(1.0 / (_RRF_K + _HYB_DEPTH), 6)  # one leg, worst rank
    hi = round(2.0 / (_RRF_K + 1), 6)  # both legs, rank 1
    for qid, hits in by_q.items():
        assert len(hits) == _HYB_OUT
        assert sorted(h["rank"] for h in hits) == list(range(1, _HYB_OUT + 1))
        # no self-hits survive either leg
        assert all(h["doc_id"] != qid for h in hits)
        # rank order follows the fused score (doc_id breaks ties)
        ordered = sorted(hits, key=lambda h: (-h["rrf_score"], h["doc_id"]))
        assert [h["rank"] for h in ordered] == list(range(1, _HYB_OUT + 1))
        for h in hits:
            assert lo <= h["rrf_score"] <= hi
            # a doc found by both systems always outranks a single-leg
            # score floor; a single-leg doc can never exceed 1/(k+1)
            if h["src"] == "both":
                assert h["rrf_score"] >= round(2.0 / (_RRF_K + _HYB_DEPTH), 6)
            else:
                assert h["rrf_score"] <= round(1.0 / (_RRF_K + 1), 6)


# -- constraint suite ----------------------------------------------------


def test_constraint_suite_report_semantics(spark):
    rows = audit_constraint_suite(spark, SF_DIR).collect()
    report = {r["constraint_name"]: r for r in rows}
    assert len(report) == 7
    for r in rows:
        assert 0.0 <= r["metric"] <= 1.0
        want = "pass" if r["metric"] >= r["threshold"] else "fail"
        assert r["status"] == want
    # clean TPC-H-ish data: key unique, categories closed, refs intact
    for name in (
        "completeness_o_custkey",
        "unique_o_orderkey",
        "set_o_orderstatus",
        "format_o_orderpriority",
        "completeness_o_orderdate",
        "ref_o_custkey_in_customer",
    ):
        assert report[name]["status"] == "pass", name
    # the bounds check is DESIGNED to fail: ~10% of prices exceed the
    # 450k cap, under the 0.95 threshold
    bounds = report["bounds_o_totalprice"]
    assert bounds["status"] == "fail"
    assert 0.80 <= bounds["metric"] < 0.95


# -- compaction planning -------------------------------------------------


def test_compaction_plan_binpack_invariants(spark):
    plan = maintenance_compaction_plan(spark, SF_DIR).collect()
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("n_chars") + _COMPACT_OVERHEAD).alias("bytes"),
        )
        .collect()
    )
    truth = {r["lang"]: (r["n"], r["bytes"]) for r in docs}
    by_lang: dict[str, list] = {}
    for r in plan:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == set(truth)
    for lang, bins in by_lang.items():
        bins.sort(key=lambda r: r["bin"])
        # conservation: every file lands in exactly one bin
        assert sum(r["n_files"] for r in bins) == truth[lang][0]
        assert sum(r["total_bytes"] for r in bins) == truth[lang][1]
        # bin ids are strictly increasing from 0 and id-ranges never
        # interleave.  (NOT dense: bin = bytes_before DIV target skips
        # ids whenever one file exceeds ~2x the target, so a density
        # assert would be data-dependent, not algorithmic.)
        ids = [r["bin"] for r in bins]
        assert ids[0] == 0
        assert all(a < b for a, b in zip(ids, ids[1:]))
        for a, b in zip(bins, bins[1:]):
            assert a["last_doc"] < b["first_doc"]
        # greedy closing: a bin only closes once the cumulative bytes
        # cross its boundary, so every non-final bin's running total
        # must reach the next bin's threshold
        cum = 0
        for r in bins[:-1]:
            cum += r["total_bytes"]
            assert cum >= (r["bin"] + 1) * _COMPACT_TARGET
        assert all(r["files_retired"] == r["n_files"] - 1 for r in bins)


# -- suffix-sort maximal repeats -----------------------------------------


def test_suffix_lcp_real_corpus_invariants(spark):
    rows = dedup_suffix_lcp(spark, SF_DIR).collect()
    assert rows, "sf0.001 corpus contains near-duplicate docs"
    for r in rows:
        assert _SFX_MIN <= r["max_lcp"] <= _SFX_LEN
        assert 0 <= r["n_cross_doc"] <= r["n_repeats"]
        assert _SFX_MIN <= len(r["sample_repeat"]) <= _SFX_LEN


def test_suffix_lcp_planted_repeat_exact_length(spark, tmp_path):
    """A phrase planted in two docs is reported at its EXACT normalized
    length — the maximal-repeat sizing a fixed-window hash cannot do."""
    phrase = "zebra quartz jigsaw plume"  # 25 normalized chars == _SFX_MIN
    assert len(phrase) == _SFX_MIN
    docs = spark.createDataFrame(
        [
            (0, f"alpha bravo charlie {phrase}", "en", "t", 1),
            (1, f"delta echo foxtrot golf {phrase}", "en", "t", 1),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf = str(tmp_path)
    docs.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    rows = dedup_suffix_lcp(spark, sf).collect()
    # exactly one adjacency clears the threshold: the planted phrase,
    # attributed to the lag-side (higher doc_id) occurrence
    assert len(rows) == 1
    r = rows[0]
    assert r["doc_id"] == 1
    assert r["n_repeats"] == 1
    assert r["n_cross_doc"] == 1
    assert r["max_lcp"] == _SFX_MIN
    assert r["sample_repeat"] == phrase


# -- Welch t-test ---------------------------------------------------------


def test_welch_ttest_matches_reference_formula(spark):
    """The entry's integer-moment pipeline must agree with a plain
    float recomputation driver-side (the textbook formula over the
    same filtered rows)."""
    import math

    r = eval_ab_welch_ttest(spark, SF_DIR).collect()[0]
    rows = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select((F.col("user_id") % 2).alias("arm"), "value")
        .collect()
    )
    arms = {0: [], 1: []}
    for x in rows:
        arms[x["arm"]].append(round(x["value"] * 1000) / 1000.0)
    a, b = arms[0], arms[1]
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    ma = sum(a) / len(a)
    mb = sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    t = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))
    q = va / len(a) + vb / len(b)
    df = q * q / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert abs(r["mean_a"] - ma) < 1e-4
    assert abs(r["mean_b"] - mb) < 1e-4
    assert abs(r["t_stat"] - t) < 1e-3
    assert abs(r["df_welch"] - df) < 0.5
    assert r["significant"] == (1 if abs(t) > 1.96 else 0)
    # Welch df is bracketed by min(n)-1 and n_a+n_b-2
    assert min(len(a), len(b)) - 1 <= r["df_welch"] <= len(a) + len(b) - 2


# -- streaming constraint monitor ----------------------------------------


def test_constraint_monitor_replay_is_idempotent(spark, tmp_path):
    """A failure-replayed micro-batch overwrites its own partial: the
    merged report must be identical after re-running a batch."""
    from archive_to_parquet_spark.streaming.quality import (
        constraint_report,
        write_batch_partial,
    )

    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "event_type", "value", "props")
    )
    state = str(tmp_path / "state")
    for bid in range(3):
        write_batch_partial(
            events.filter(F.col("event_id") % 3 == bid), bid, state
        )
    before = {
        r["constraint_name"]: r for r in constraint_report(spark, state).collect()
    }
    # replay batch 1 (same data) — the partial is overwritten, not added
    write_batch_partial(events.filter(F.col("event_id") % 3 == 1), 1, state)
    after = {
        r["constraint_name"]: r for r in constraint_report(spark, state).collect()
    }
    assert before == after
    # and the merged metrics equal the whole-table computation
    n = events.count()
    ok = events.filter(F.col("value").between(0.0, 300.0)).count()
    assert after["bounds_value_0_300"]["metric"] == round(ok / n, 6)


# -- label propagation ----------------------------------------------------


def test_lpa_partition_covers_nodes_and_labels_are_members(spark):
    comm = graph_label_propagation(spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    pairs = (
        li.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b"))
    )
    nodes = set(
        r["n"]
        for r in pairs.select(F.col("a").alias("n"))
        .union(pairs.select(F.col("b").alias("n")))
        .distinct()
        .collect()
    )
    # communities partition the node set exactly
    assert sum(r["n_members"] for r in comm) == len(nodes)
    for r in comm:
        # a community's label is a real node (it need not fall inside
        # the member id range after 2 LPA rounds, so no range assert)
        assert r["community"] in nodes
        assert r["min_node"] <= r["max_node"]


# -- Neyman stratified sampling -------------------------------------------


def test_neyman_allocation_and_draw_invariants(spark):
    rows = sample_stratified_neyman(spark, SF_DIR).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    total = sum(len(v) for v in by_lang.values())
    # rounding can drift the total a little around the budget
    assert 0.9 * _NEYMAN_BUDGET <= total <= 1.1 * _NEYMAN_BUDGET
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.stddev_samp("n_chars").alias("sd"))
        .collect()
    )
    truth = {r["lang"]: r for r in docs}
    assert set(by_lang) <= set(truth)
    shares = {
        r["lang"]: r["n"] * r["sd"]
        for r in docs
    }
    w_tot = sum(shares.values())
    for lang, drawn in by_lang.items():
        alloc = drawn[0]["alloc_h"]
        # every stratum draws exactly its allocation (capped by size)
        assert len(drawn) == min(alloc, truth[lang]["n"])
        assert sorted(r["stratum_rank"] for r in drawn) == list(
            range(1, len(drawn) + 1)
        )
        # allocation tracks the Neyman share within rounding
        want = _NEYMAN_BUDGET * shares[lang] / w_tot
        assert abs(alloc - want) <= 1.0 or alloc == 1
