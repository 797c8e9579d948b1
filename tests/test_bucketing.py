"""Bucketed co-located join: no Exchange in the plan, same results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from archive_to_parquet_spark.plans.bucketing import (
    bucketed_join,
    plan_has_exchange,
    write_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    import shutil

    # stale managed-table dirs (e.g. from an interrupted run) block
    # saveAsTable with LOCATION_ALREADY_EXISTS
    for tbl in ("li_b", "ord_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"spark-warehouse/{tbl}", ignore_errors=True)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    write_bucketed(li.withColumnRenamed("l_orderkey", "okey"), "li_b", "okey", 8)
    write_bucketed(orders.withColumnRenamed("o_orderkey", "okey"), "ord_b", "okey", 8)
    yield "li_b", "ord_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # force the big-big (sort-merge) path: broadcast would sidestep the
    # shuffle question entirely at this tiny scale
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "okey")
        # co-located buckets: the join plans with zero shuffle exchanges
        assert not plan_has_exchange(
            joined.select("okey", "l_quantity", "o_totalprice")
        )
        # whereas the plain (unbucketed) join must exchange
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_quantity", "o_totalprice"
        )
        assert plan_has_exchange(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_results_match_plain(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "okey")
    n_bucketed = joined.count()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert n_bucketed == n_plain > 0
    total_b = joined.agg(F.round(F.sum("l_quantity"), 2).alias("s")).collect()[0].s
    plain_j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    total_p = plain_j.agg(F.round(F.sum("l_quantity"), 2).alias("s")).collect()[0].s
    assert total_b == total_p


def test_compact_dataset_reduces_file_count(spark, tmp_path):
    import os

    from archive_to_parquet_spark.plans.maintenance import compact_dataset

    src = str(tmp_path / "small_files")
    out = str(tmp_path / "compacted")
    # 32 small files
    spark.range(0, 100_000).repartition(32).write.parquet(src)
    n = compact_dataset(spark, src, out, target_file_mb=512)
    assert n == 1
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 1
    # content identical
    assert (
        spark.read.parquet(out).agg({"id": "sum"}).first()[0]
        == spark.range(0, 100_000).agg({"id": "sum"}).first()[0]
    )


def test_zorder_layout_improves_stat_selectivity(spark, tmp_path):
    import pyarrow.parquet as pq
    import os

    from archive_to_parquet_spark.plans.maintenance import write_zordered

    # two independent uniform dims: a lexicographic sort on x leaves y
    # unsorted (y-ranges span everything); z-order bounds BOTH
    df = spark.range(0, 40_000).selectExpr(
        "id", "CAST(id % 200 AS LONG) AS x", "CAST((id * 7919) % 200 AS LONG) AS y"
    )
    out = str(tmp_path / "zorder")
    write_zordered(df, out, ["x", "y"], bits=8, num_files=16)

    # measure per-file min/max spans of BOTH dims
    spans = []
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(out, f))
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        spans.append(((max(xs) - min(xs)), (max(ys) - min(ys))))
    # every file must be selective in both dimensions: strictly narrower
    # than the full 0..199 range on average
    avg_x = sum(s[0] for s in spans) / len(spans)
    avg_y = sum(s[1] for s in spans) / len(spans)
    assert len(spans) == 16
    assert avg_x < 120 and avg_y < 120, (avg_x, avg_y)
    # row count preserved
    assert spark.read.parquet(out).count() == 40_000


def test_upsert_partitioned_rewrites_only_touched_partitions(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from archive_to_parquet_spark.plans.maintenance import upsert_partitioned

    path = str(tmp_path / "ds")
    base = spark.range(30).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("p"),
        F.lit("old").alias("v"),
    )
    base.write.partitionBy("p").parquet(path)

    untouched_files = {
        f: os.path.getmtime(os.path.join(path, "p=0", f))
        for f in os.listdir(os.path.join(path, "p=0"))
        if f.endswith(".parquet")
    }

    # updates touch only p=1 (ids 1, 4 updated; id 301 new)
    updates = spark.createDataFrame(
        [(1, "1", "new"), (4, "1", "new"), (301, "1", "new")],
        ["id", "p", "v"],
    )
    stats = upsert_partitioned(spark, path, updates, key="id", partition_col="p")
    assert stats == {
        "touched_partitions": 1,
        "updated_or_new_rows": 3,
        "kept_rows": 8,  # p=1 had ids 1,4,7,...,28 (10 rows); 2 replaced
    }

    after = spark.read.parquet(path)
    assert after.count() == 31
    got = {
        r["id"]: r["v"] for r in after.filter(F.col("p") == "1").collect()
    }
    assert got[1] == "new" and got[4] == "new" and got[301] == "new"
    assert got[7] == "old" and len(got) == 11

    # untouched partition directory was not rewritten
    now = {
        f: os.path.getmtime(os.path.join(path, "p=0", f))
        for f in os.listdir(os.path.join(path, "p=0"))
        if f.endswith(".parquet")
    }
    assert now == untouched_files


# -- idempotent staging (ensure_bucketed_table, r8) ---------------------------


def test_ensure_bucketed_table_builds_once_and_reregisters(spark, tmp_path):
    """The pay-the-shuffle-ONCE contract: the first call writes, later
    calls with the same fingerprint never rebuild — even after the
    table vanishes from the catalog (a fresh session) — and the
    re-registered external table still joins exchange-free."""
    import os

    from archive_to_parquet_spark.plans.bucketing import (
        ensure_bucketed_table,
        plan_has_exchange,
    )

    path_a = str(tmp_path / "a")
    path_b = str(tmp_path / "b")
    builds = {"n": 0}

    def build_a():
        builds["n"] += 1
        return spark.range(100).select(
            (F.col("id") % 11).alias("k"), F.col("id").alias("v")
        )

    for tbl in ("ensb_a", "ensb_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    fp = ["v1", [["input", 1, 2]]]
    ensure_bucketed_table(spark, "ensb_a", path_a, "k", 4, build_a, fp)
    assert builds["n"] == 1
    ensure_bucketed_table(spark, "ensb_a", path_a, "k", 4, build_a, fp)
    assert builds["n"] == 1, "same fingerprint must not rebuild"

    # fresh-session simulation: drop ONLY the catalog entry (files stay)
    spark.sql("DROP TABLE ensb_a")
    ensure_bucketed_table(spark, "ensb_a", path_a, "k", 4, build_a, fp)
    assert builds["n"] == 1, "re-registration must be catalog-only"
    assert spark.table("ensb_a").count() == 100

    # the re-registered table keeps the bucket spec: co-bucketed join
    # plans without any shuffle Exchange
    ensure_bucketed_table(
        spark, "ensb_b", path_b, "k", 4,
        lambda: spark.range(11).select(
            (F.col("id") % 11).alias("k"), F.lit("dim").alias("d")
        ),
        fp,
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("ensb_a").join(spark.table("ensb_b"), "k")
        assert not plan_has_exchange(j)
        assert j.count() == 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # changed fingerprint (input or recipe) rebuilds
    ensure_bucketed_table(
        spark, "ensb_a", path_a, "k", 4, build_a, ["v2", [["input", 1, 2]]]
    )
    assert builds["n"] == 2, "fingerprint change must rebuild"
    assert os.path.exists(os.path.join(path_a, "_A2PS_BUCKETED_OK"))
    for tbl in ("ensb_a", "ensb_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_ensure_bucketed_table_rebuilds_on_bucket_spec_change(spark, tmp_path):
    from archive_to_parquet_spark.plans.bucketing import ensure_bucketed_table

    path = str(tmp_path / "t")
    builds = {"n": 0}

    def build():
        builds["n"] += 1
        return spark.range(20).select(
            (F.col("id") % 3).alias("k"), F.col("id").alias("v")
        )

    spark.sql("DROP TABLE IF EXISTS ensb_spec")
    ensure_bucketed_table(spark, "ensb_spec", path, "k", 4, build, ["v1"])
    ensure_bucketed_table(spark, "ensb_spec", path, "k", 8, build, ["v1"])
    assert builds["n"] == 2, "bucket-count change must rebuild"
    assert spark.table("ensb_spec").count() == 20
    spark.sql("DROP TABLE IF EXISTS ensb_spec")


def test_ann_lsh_bucketed_matches_unbucketed_lsh(spark):
    """The bucketed ANN serving path returns EXACTLY what the plain
    lsh_top_k composition returns for the same corpus/query split and
    parameters — the layout changes the physical plan (zero-Exchange
    candidates, asserted in-query), never the answer. Also exercises
    staging idempotence: the second run reuses the staged tables."""
    from archive_to_parquet_spark.operators.similarity import (
        fixed_hyperplanes,
        lsh_top_k,
    )
    from archive_to_parquet_spark.queries_ext2 import (
        _ALSHBK_DIM,
        _ALSHBK_K,
        _ALSHBK_PLANES,
        ann_lsh_bucketed,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    planes = fixed_hyperplanes(_ALSHBK_PLANES, _ALSHBK_DIM)
    want = sorted(
        tuple(r)
        for r in lsh_top_k(
            emb.filter(F.col("vec_id") % 2 == 0),
            emb.filter(F.col("vec_id") % 50 == 25).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            ),
            k=_ALSHBK_K,
            multi_probe_bits=2,
            planes=planes,
            round_to=6,
        ).collect()
    )
    got1 = sorted(tuple(r) for r in ann_lsh_bucketed(spark, SF_DIR).collect())
    got2 = sorted(tuple(r) for r in ann_lsh_bucketed(spark, SF_DIR).collect())
    assert got1 == want
    assert got2 == want  # staged-table reuse serves identical results


def test_ensure_parquet_snapshot_builds_once(spark, tmp_path):
    from archive_to_parquet_spark.plans.bucketing import (
        ensure_parquet_snapshot,
    )

    path = str(tmp_path / "snap")
    builds = {"n": 0}

    def build():
        builds["n"] += 1
        return spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))

    ensure_parquet_snapshot(spark, path, build, ["v1", [["in", 1, 2]]])
    ensure_parquet_snapshot(spark, path, build, ["v1", [["in", 1, 2]]])
    assert builds["n"] == 1, "matching fingerprint must not rebuild"
    assert spark.read.parquet(path).count() == 10
    # changed fingerprint rebuilds in place
    ensure_parquet_snapshot(spark, path, build, ["v2", [["in", 1, 2]]])
    assert builds["n"] == 2
    assert spark.read.parquet(path).count() == 10
