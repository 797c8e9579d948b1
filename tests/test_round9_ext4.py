"""Semantic invariants for the round-9 additions: exact binned
ROC-AUC, the PSI drift monitor, vacuum planning, the l-diversity
audit, and temperature-scaled mixing weights — plus the checkpoint
partitioning-capture property the round's connected-components /
DBSCAN shuffle rework depends on.

The oracle sweep (tools/check_correctness.py) certifies value equality
vs DuckDB; these tests pin the properties the entries CLAIM — AUC
against a brute-force pair count, PSI axis completeness, retention
arithmetic, diversity thresholds, weight normalization — so a refactor
that stays hash-equal to a changed oracle cannot silently weaken the
semantics.
"""

from __future__ import annotations


from pyspark.sql import functions as F

from archive_to_parquet_spark.queries_ext4 import (
    _AUC_BIN_CAP,
    _AUC_BIN_DIV,
    _LDIV_L,
    _LDIV_SENS_DIV,
    _MIX_BUDGET,
    _PSI_BINS,
    _VACUUM_OVERHEAD,
    _VACUUM_RETAIN,
    eval_auc_quality,
    eval_psi_drift,
    maintenance_vacuum_plan,
    mix_temperature_sampling,
    privacy_l_diversity,
)

SF_DIR = "/root/testdata/sf0.001"


# -- exact binned ROC-AUC --------------------------------------------------


def test_auc_matches_brute_force_pair_count(spark):
    row = eval_auc_quality(spark, SF_DIR).collect()[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.least(
            F.expr(f"n_chars DIV {_AUC_BIN_DIV}"), F.lit(_AUC_BIN_CAP)
        ).alias("s"),
        (F.col("lang") == "en").alias("pos"),
    ).collect()
    pos = sorted(r["s"] for r in docs if r["pos"])
    neg = sorted(r["s"] for r in docs if not r["pos"])
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    # brute-force Mann-Whitney with ties counted 1/2
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    expect = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(row["auc"] - expect) < 1e-6
    assert 0.0 <= row["auc"] <= 1.0


# -- PSI drift monitor ----------------------------------------------------


def test_psi_axis_complete_and_total_consistent(spark):
    rows = eval_psi_drift(spark, SF_DIR).collect()
    # the literal axis guarantees all bins present exactly once
    assert sorted(r["bin"] for r in rows) == list(range(_PSI_BINS))
    total = rows[0]["psi_total"]
    assert all(r["psi_total"] == total for r in rows)
    assert abs(total - round(sum(r["psi_term"] for r in rows), 6)) < 1e-9
    # PSI is non-negative term-wise only in expectation; the TOTAL of
    # (p-q)ln(p/q) terms is a sum of non-negative terms since sign(p-q)
    # == sign(ln(p/q)) for each bin
    assert all(r["psi_term"] >= 0.0 for r in rows)
    # even/odd halves of the same distribution: drift must be tiny
    assert total < 0.1


def test_psi_counts_partition_the_events(spark):
    rows = eval_psi_drift(spark, SF_DIR).collect()
    n = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("value").isNotNull())
        .count()
    )
    assert sum(r["ref_n"] + r["cur_n"] for r in rows) == n


# -- vacuum planning -------------------------------------------------------


def test_vacuum_plan_retention_arithmetic(spark):
    plan = {
        (r["source"], r["lang"]): r
        for r in maintenance_vacuum_plan(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    groups: dict[tuple, list] = {}
    for d in docs:
        groups.setdefault((d["source"], d["lang"]), []).append(d)
    assert set(plan) == set(groups)
    for key, members in groups.items():
        members.sort(key=lambda d: -d["doc_id"])
        keep, drop = members[:_VACUUM_RETAIN], members[_VACUUM_RETAIN:]
        r = plan[key]
        assert r["n_files"] == len(members)
        assert r["n_deletable"] == len(drop)
        assert r["bytes_reclaimed"] == sum(
            d["n_chars"] + _VACUUM_OVERHEAD for d in drop
        )
        # the oldest retained version is the smallest doc_id kept
        assert r["oldest_retained"] == min(d["doc_id"] for d in keep)
        # retention never deletes the newest version
        assert max(d["doc_id"] for d in members) >= r["oldest_retained"]


# -- l-diversity -----------------------------------------------------------


def test_l_diversity_thresholds_and_exact_distincts(spark):
    rows = privacy_l_diversity(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    truth: dict[tuple, set] = {}
    sizes: dict[tuple, int] = {}
    for d in docs:
        key = (d["lang"], d["source"])
        truth.setdefault(key, set()).add(d["n_chars"] // _LDIV_SENS_DIV)
        sizes[key] = sizes.get(key, 0) + 1
    assert {(r["lang"], r["source"]) for r in rows} == set(truth)
    for r in rows:
        key = (r["lang"], r["source"])
        assert r["n_sensitive"] == len(truth[key])
        assert r["class_size"] == sizes[key]
        want = "release" if r["n_sensitive"] >= _LDIV_L else "suppress"
        assert r["status"] == want


# -- temperature mixing ----------------------------------------------------


def test_temperature_weights_normalize_and_upsample_small_langs(spark):
    rows = mix_temperature_sampling(spark, SF_DIR).collect()
    assert abs(sum(r["p_natural"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["q_sampling"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        # sqrt temperature: q ∝ sqrt(n) — epochs = q*budget/n.  The
        # column uses the UNROUNDED ratio while q_sampling is 6dp, so
        # the recomputation tolerance is the rounding step amplified by
        # budget/n (0.5e-6 * 100k / n ≈ 7e-4 at sf0.001 group sizes).
        assert abs(
            r["effective_epochs"] - r["q_sampling"] * _MIX_BUDGET / r["n_docs"]
        ) < 1e-6 * _MIX_BUDGET / r["n_docs"]
    # the defining property of temperature sampling: relative to the
    # natural distribution, the smallest language is upsampled and the
    # largest is downsampled (strict when the sizes differ)
    smallest = min(rows, key=lambda r: r["n_docs"])
    largest = max(rows, key=lambda r: r["n_docs"])
    if smallest["n_docs"] < largest["n_docs"]:
        assert smallest["q_sampling"] > smallest["p_natural"] - 1e-9
        assert largest["q_sampling"] < largest["p_natural"] + 1e-9
    # q ordering follows n ordering (sqrt is monotone)
    by_n = sorted(rows, key=lambda r: r["n_docs"])
    qs = [r["q_sampling"] for r in by_n]
    assert qs == sorted(qs)


# -- checkpoint partitioning capture (the dbscan/CC rework's foundation) ---


def test_checkpoint_partitioning_survives_for_bare_distinct(spark):
    """The round-9 shuffle shave rests on two measured facts: a
    partitioning-keeping checkpoint of a BARE distinct is reusable by
    id-keyed consumers with no exchange, while aliasing the key inside
    the checkpointed plan loses the captured partitioning.  Pin both,
    so a Spark upgrade that changes the capture rules fails loudly
    here instead of silently re-inflating the CC loop's shuffles."""
    from archive_to_parquet_spark.plans.checkpoint import (
        checkpoint_keeping_partitioning,
        checkpoint_partitioned,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        base = spark.range(100).select((F.col("id") % 11).alias("id"))
        other = checkpoint_partitioned(
            spark.range(50).select(F.col("id").alias("src")), "src"
        )
        good = checkpoint_keeping_partitioning(base.distinct())
        plan_good = (
            good.join(other, good.id == other.src, "left")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan_good.count("Exchange") == 0
        # the anti-pattern: key aliased inside the checkpointed plan
        bad = checkpoint_keeping_partitioning(
            base.distinct().withColumn("component", F.col("id"))
        )
        plan_bad = (
            bad.join(other, bad.id == other.src, "left")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan_bad.count("Exchange") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_dbscan_lsh_exact_twin_agreement(spark):
    """The LSH dbscan's confirmed pairs are a subset of the exact
    ε-graph, so every LSH cluster must sit inside one exact cluster
    (the banded generator can only MISS edges, never invent them)."""
    from archive_to_parquet_spark.queries import _CATALOG

    lsh = {
        r["vec_id"]: r["cluster"]
        for r in _CATALOG["cluster_dbscan_lsh"][0](spark, SF_DIR).collect()
        if r["cluster"] != -1
    }
    exact = {
        r["vec_id"]: r["cluster"]
        for r in _CATALOG["cluster_dbscan"][0](spark, SF_DIR).collect()
        if r["cluster"] != -1
    }
    # map each LSH cluster to the set of exact clusters its members
    # land in; noise-in-exact members would be a contradiction only if
    # exact says noise while LSH says clustered with MORE evidence —
    # impossible, so every clustered-LSH point is clustered-exact
    from collections import defaultdict

    spread = defaultdict(set)
    for vid, c in lsh.items():
        assert vid in exact, f"LSH clustered {vid} but exact calls it noise"
        spread[c].add(exact[vid])
    for c, targets in spread.items():
        assert len(targets) == 1, (
            f"LSH cluster {c} spans exact clusters {targets}"
        )


# -- streaming PSI monitor --------------------------------------------------


def test_stream_psi_report_equals_batch_psi(spark):
    from archive_to_parquet_spark.queries_ext4 import (
        eval_psi_drift,
        stream_psi_drift,
    )

    batch = {r["bin"]: r for r in eval_psi_drift(spark, SF_DIR).collect()}
    stream = {r["bin"]: r for r in stream_psi_drift(spark, SF_DIR).collect()}
    assert set(batch) == set(stream)
    for b in batch:
        assert batch[b].asDict() == stream[b].asDict()


def test_psi_partial_replay_is_idempotent(spark, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from archive_to_parquet_spark.streaming.quality import (
        psi_report,
        write_psi_partial,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "value")
    )
    state = str(tmp_path / "state")
    write_psi_partial(events.filter(F.col("event_id") % 2 == 0), 0, state)
    write_psi_partial(events.filter(F.col("event_id") % 2 == 1), 1, state)
    once = {r["bin"]: r.asDict() for r in psi_report(spark, state).collect()}
    # a failure-replayed micro-batch OVERWRITES its own partial
    write_psi_partial(events.filter(F.col("event_id") % 2 == 1), 1, state)
    twice = {r["bin"]: r.asDict() for r in psi_report(spark, state).collect()}
    assert once == twice
    assert len(glob.glob(f"{state}/batch=*")) == 2


# -- MRR ---------------------------------------------------------------------


def test_mrr_first_relevant_rank_brute_force(spark):
    from pyspark.sql import functions as F

    from archive_to_parquet_spark.queries import _BM25_QUERIES, search_bm25
    from archive_to_parquet_spark.queries_ext4 import eval_mrr_bm25

    rows = {r["query_id"]: r for r in eval_mrr_bm25(spark, SF_DIR).collect()}
    assert set(rows) == {qid for qid, _ in _BM25_QUERIES}
    ranked = search_bm25(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.lower("text").alias("lt")
    ).collect()
    for qid, terms in _BM25_QUERIES:
        rel = {d["doc_id"] for d in docs if all(t in d["lt"] for t in terms)}
        ranks = sorted(
            r["rank"] for r in ranked
            if r["query_id"] == qid and r["doc_id"] in rel
        )
        r = rows[qid]
        if ranks:
            assert r["first_rel_rank"] == ranks[0]
            assert abs(r["rr"] - round(1.0 / ranks[0], 6)) < 1e-9
        else:
            assert r["first_rel_rank"] == 0 and r["rr"] == 0.0
