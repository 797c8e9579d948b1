"""Catalog extension (round 8, second leg): hybrid retrieval fusion,
declarative data-quality constraint verification, small-file
compaction planning, and suffix-sort maximal-repeat detection.

Same contract as ``queries.py``: each entry pairs an idiomatic-Spark
query with an ANSI-SQL oracle DuckDB runs over the same parquet views,
every computed column aliased identically on both sides.

- ``search_hybrid_rrf`` — reciprocal-rank fusion (Cormack, Clarke &
  Buettcher, SIGIR 2009) of a BM25 lexical leg and an embedding-cosine
  semantic leg: the retrieval stack every modern RAG pipeline runs.
  Query-by-example: every 100th document queries the corpus through
  BOTH systems; ranks (not scores) fuse, so the two legs' incomparable
  score scales never meet.
- ``audit_constraint_suite`` — Deequ-style declarative data-quality
  verification (Schelter et al., VLDB 2018): seven constraints
  (completeness, key uniqueness, set membership, numeric bounds,
  format regex, referential integrity) evaluated in ONE pass over the
  fact table, emitted as a (constraint, metric, threshold, status)
  report. All metrics are algebraic, so the same plan merges at any
  scale.
- ``maintenance_compaction_plan`` — Iceberg/Delta OPTIMIZE-style
  bin-pack compaction planning over a file manifest: greedy
  cumulative-sum packing into target-size output files, per partition,
  without ever reading a data byte.
- ``dedup_suffix_lcp`` — suffix-sorting maximal-repeat detection (the
  ``suffix array → adjacent-LCP`` pass of Lee et al., "Deduplicating
  Training Data Makes Language Models Better", ACL 2022): every word
  suffix is sorted; adjacent suffixes sharing a long prefix ARE the
  repeated substrings, at their exact maximal length — variable-length
  repeats the fixed-window hash in ``dedup_substring_exact`` cannot
  size.
- ``eval_ab_welch_ttest`` — Welch's unequal-variance t-test between
  two experiment arms, computed from EXACT integer milli-unit moments
  so the only multi-row aggregation is integer summation; every float
  op is a fixed-tree scalar expression, bit-identical across engines.
- ``stream_constraint_monitor`` — the constraint suite under
  continuous arrival: per-micro-batch algebraic partials, batch_id-
  keyed idempotent state writes, report = merge of partials ==
  whole-table computation (Deequ §3.3 incremental metrics).
- ``graph_label_propagation`` — synchronous LPA community detection
  (Raghavan et al. 2007) with the deterministic mode/min tie rule,
  two unrolled rounds over the co-purchase graph; the oracle replays
  the exact fixpoint prefix.
- ``sample_stratified_neyman`` — Neyman-allocation stratified
  sampling (budget ∝ N_h·σ_h, σ from exact integer moments), drawn by
  md5 priority per stratum — the minimum-variance mean-estimation
  design as a one-shuffle Spark plan.
- ``dedup_suffix_lcp_bucketed`` (round 10) — the suffix family's
  bucketed incremental twin: a persisted suffix index bucketed on the
  25-char prefix (lossless for the ≥25 LCP threshold) + an anti-join
  delta probe grouped by the bucket key, pinned at ZERO shuffle
  Exchanges like the other bucketed families.
- ``stream_suffix_incremental`` (round 10) — the same family under
  continuous arrival: per-micro-batch suffix expansion, probe of the
  accumulated prefix index, batch_id-keyed idempotent delta/append;
  oracle = the first-batch-wins closed form.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from archive_to_parquet_spark.queries_ext import _t

# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 ⊕ embedding cosine via reciprocal-rank fusion
# ---------------------------------------------------------------------------

_RRF_K = 60  # the standard RRF damping constant (Cormack et al. 2009)
_HYB_DEPTH = 20  # per-system candidate depth feeding the fusion
_HYB_OUT = 10  # fused results returned per query
_HYB_QTERMS = 5  # lexical query = the example doc's top-5 TF terms


def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid query-by-example retrieval: every 100th document queries
    the corpus through BM25 (its top-5 TF terms) AND embedding cosine
    (its own vector), the two top-20 lists fuse by reciprocal rank
    (score = Σ 1/(60+rank)), fused top-10 returned. Self-hits are
    excluded from both legs. Reference contract: the query surface of
    §2.12 generalized to ranked retrieval; BM25 leg shares
    ``search_bm25``'s certified construction (k1=1.2, b=0.75, rounded
    score, doc_id tie-break), the semantic leg ``ann_cosine_topk``'s.

    Why ranks, not scores: BM25 logs and cosine live on incomparable
    scales; RRF is scale-free, needs no calibration pass, and its
    fused score is a two-term double sum with a FIXED addend order —
    exact across engines, no float-summation-order risk.

    Scale shape: term stats (tf/dl/df) are one map-side-combinable
    shuffle each; query terms and df are broadcast, so the only
    corpus-keyed join carries matched-term rows only. The semantic leg
    broadcasts the query vectors across one corpus scan. Both legs cut
    to top-20 per query BEFORE the fusion join, so the full-outer
    fusion moves ≤ 40 rows per query regardless of corpus size. At
    1000 executors each leg is embarrassingly parallel and the fusion
    is a driver-sized afterthought."""
    from archive_to_parquet_spark.operators.similarity import (
        cosine_from_norms,
        l2_norm_col,
    )

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")

    # --- lexical leg: BM25 with per-example-doc top-5 TF query terms
    tokens = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("term"),
    )
    # the inverted index feeds FOUR consumers here (query-term top-5,
    # doc lengths, document frequencies, scoring) — materialize it once
    # partitioned on doc_id (same shape as search_bm25's r9 staging)
    from archive_to_parquet_spark.plans.checkpoint import (
        checkpoint_partitioned,
    )

    tf = checkpoint_partitioned(
        tokens.groupBy("doc_id", "term").agg(F.count("*").alias("tf")),
        "doc_id",
    )
    qdocs = docs.filter(F.col("doc_id") % 100 == 50).select("doc_id")
    qw = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("term").asc()
    )
    qterms = (
        tf.join(F.broadcast(qdocs), "doc_id")
        .withColumn("rn", F.row_number().over(qw))
        .filter(F.col("rn") <= _HYB_QTERMS)
        .select(F.col("doc_id").alias("query_id"), "term")
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_counts = (
        tf.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    contrib = (
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        * F.col("tf")
        * 2.2
        / (F.col("tf") + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl")))
    )
    lex_scored = (
        tf.join(F.broadcast(qterms), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(F.broadcast(df_counts), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), 4).alias("score"))
    )
    lw = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    lex = (
        lex_scored.withColumn("rank_lex", F.row_number().over(lw))
        .filter(F.col("rank_lex") <= _HYB_DEPTH)
        .select("query_id", "doc_id", "rank_lex")
    )

    # --- semantic leg: broadcast query vectors × one corpus scan
    q = emb.filter(F.col("vec_id") % 100 == 50).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        l2_norm_col("embedding").alias("qn"),
    )
    c = emb.select(
        "vec_id",
        F.col("embedding").alias("cv"),
        l2_norm_col("embedding").alias("cn"),
    )
    sem_scored = c.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        F.round(cosine_from_norms("cv", "qv", "cn", "qn"), 6).alias("cosine"),
    )
    sw = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    sem = (
        sem_scored.withColumn("rank_sem", F.row_number().over(sw))
        .filter(F.col("rank_sem") <= _HYB_DEPTH)
        .select("query_id", F.col("vec_id").alias("doc_id"), "rank_sem")
    )

    # --- reciprocal-rank fusion over the two ≤20-deep lists
    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        F.round(
            F.coalesce(F.lit(1.0) / (_RRF_K + F.col("rank_lex")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (_RRF_K + F.col("rank_sem")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
        F.when(
            F.col("rank_lex").isNotNull() & F.col("rank_sem").isNotNull(),
            F.lit("both"),
        )
        .when(F.col("rank_lex").isNotNull(), F.lit("lex"))
        .otherwise(F.lit("sem"))
        .alias("src"),
    )
    fw = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(fw))
        .filter(F.col("rank") <= _HYB_OUT)
        .select(
            "query_id",
            "doc_id",
            "rrf_score",
            F.col("rank").cast("int").alias("rank"),
            "src",
        )
    )


SEARCH_HYBRID_RRF_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
qterms AS (
  SELECT doc_id AS query_id, term FROM (
    SELECT tf.doc_id, tf.term,
           ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                              ORDER BY tf.tf DESC, tf.term ASC) AS rn
    FROM tf JOIN (SELECT doc_id FROM documents WHERE doc_id % 100 = 50) qd
      USING (doc_id)
  ) WHERE rn <= 5
),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
df AS (
  SELECT term, COUNT(*) AS df
  FROM tf JOIN (SELECT DISTINCT term FROM qterms) qt USING (term)
  GROUP BY 1
),
lex_scored AS (
  SELECT q.query_id, tf.doc_id,
         round(SUM(ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))),
               4) AS score
  FROM tf
  JOIN qterms q USING (term)
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  WHERE tf.doc_id <> q.query_id
  GROUP BY 1, 2
),
lex AS (
  SELECT query_id, doc_id, rank_lex FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank_lex
    FROM lex_scored
  ) WHERE rank_lex <= 20
),
sem_scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[],
                                      q.embedding::DOUBLE[]), 6) AS cosine
  FROM embeddings e
  JOIN embeddings q ON q.vec_id % 100 = 50 AND e.vec_id <> q.vec_id
),
sem AS (
  SELECT query_id, doc_id, rank_sem FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, doc_id ASC) AS rank_sem
    FROM sem_scored
  ) WHERE rank_sem <= 20
),
fused AS (
  SELECT query_id, doc_id,
         round(COALESCE(1.0 / (60 + rank_lex), 0)
               + COALESCE(1.0 / (60 + rank_sem), 0), 6) AS rrf_score,
         CASE WHEN rank_lex IS NOT NULL AND rank_sem IS NOT NULL THEN 'both'
              WHEN rank_lex IS NOT NULL THEN 'lex'
              ELSE 'sem' END AS src
  FROM lex FULL OUTER JOIN sem USING (query_id, doc_id)
)
SELECT query_id, doc_id, rrf_score, CAST(rank AS INT) AS rank, src
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= 10
"""


# ---------------------------------------------------------------------------
# Declarative data-quality constraint suite (Deequ-style, one pass)
# ---------------------------------------------------------------------------

_AUDIT_PRICE_LO = 1000.0
_AUDIT_PRICE_HI = 450000.0


def audit_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative constraint verification over ``orders``
    (Schelter et al., VLDB 2018; reference contract K4's post-write
    stats — src/lib.rs counters — generalized to a constraint report):
    seven constraints evaluate in ONE pass and emit one
    (constraint, metric, threshold, status) row each — completeness,
    primary-key uniqueness, categorical set membership, numeric
    bounds, format regex, date completeness, and referential integrity
    against ``customer``. The bounds check genuinely FAILS on this
    data (≈10% of o_totalprice sits above 450000 < the 0.95
    threshold), so both report outcomes are exercised.

    Scale shape: every metric is an algebraic aggregate (conditional
    counts + one two-phase distinct on the key column), so the whole
    suite is one scan of orders + one broadcast join to the customer
    key set + a single 1-row Exchange of mergeable partials; the
    report unpivots driver-side from that one row. Asserted in-query:
    exactly 2 parquet scans (orders + customer) — a per-constraint
    framework that rescans the fact table N times is exactly what this
    entry exists to avoid at 100 TB."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey")

    def n_if(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    def suite() -> DataFrame:
        joined = orders.join(
            F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left"
        )
        agg = joined.agg(
            F.count("*").alias("n"),
            F.countDistinct("o_orderkey").alias("n_key"),
            n_if(F.col("o_custkey").isNotNull()).alias("n_cust_ok"),
            n_if(F.col("o_orderstatus").isin("O", "F", "P")).alias(
                "n_status_ok"
            ),
            n_if(
                F.col("o_totalprice").between(_AUDIT_PRICE_LO, _AUDIT_PRICE_HI)
            ).alias("n_price_ok"),
            n_if(F.col("o_orderpriority").rlike("^[1-5]-")).alias("n_prio_ok"),
            n_if(F.col("o_orderdate").isNotNull()).alias("n_date_ok"),
            n_if(F.col("c_custkey").isNotNull()).alias("n_ref_ok"),
        )
        checks = [
            ("completeness_o_custkey", "n_cust_ok", 1.0),
            ("unique_o_orderkey", "n_key", 1.0),
            ("set_o_orderstatus", "n_status_ok", 1.0),
            ("bounds_o_totalprice", "n_price_ok", 0.95),
            ("format_o_orderpriority", "n_prio_ok", 1.0),
            ("completeness_o_orderdate", "n_date_ok", 1.0),
            ("ref_o_custkey_in_customer", "n_ref_ok", 1.0),
        ]
        stack = F.expr(
            "stack({n}, {args}) AS (constraint_name, metric, threshold)".format(
                n=len(checks),
                args=", ".join(
                    f"'{name}', round({col} / CAST(n AS DOUBLE), 6), "
                    f"CAST({thr} AS DOUBLE)"
                    for name, col, thr in checks
                ),
            )
        )
        return agg.select(stack).select(
            "constraint_name",
            "metric",
            "threshold",
            F.when(F.col("metric") >= F.col("threshold"), "pass")
            .otherwise("fail")
            .alias("status"),
        )

    out = suite()
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    if n_scans != 2:  # a real error, not `assert` — survives python -O
        raise RuntimeError(
            f"constraint suite must evaluate in ONE pass (orders + customer"
            f" = 2 parquet scans), plan has {n_scans}"
        )
    return out


AUDIT_CONSTRAINT_SUITE_SQL = f"""
WITH agg AS (
  SELECT COUNT(*) AS n,
         COUNT(DISTINCT o_orderkey) AS n_key,
         SUM(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS n_cust_ok,
         SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
           AS n_status_ok,
         SUM(CASE WHEN o_totalprice BETWEEN {_AUDIT_PRICE_LO}
                   AND {_AUDIT_PRICE_HI} THEN 1 ELSE 0 END) AS n_price_ok,
         SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                  THEN 1 ELSE 0 END) AS n_prio_ok,
         SUM(CASE WHEN o_orderdate IS NOT NULL THEN 1 ELSE 0 END)
           AS n_date_ok,
         SUM(CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS n_ref_ok
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
),
report AS (
  SELECT 'completeness_o_custkey' AS constraint_name,
         round(n_cust_ok / CAST(n AS DOUBLE), 6) AS metric,
         CAST(1.0 AS DOUBLE) AS threshold FROM agg
  UNION ALL SELECT 'unique_o_orderkey',
         round(n_key / CAST(n AS DOUBLE), 6), 1.0 FROM agg
  UNION ALL SELECT 'set_o_orderstatus',
         round(n_status_ok / CAST(n AS DOUBLE), 6), 1.0 FROM agg
  UNION ALL SELECT 'bounds_o_totalprice',
         round(n_price_ok / CAST(n AS DOUBLE), 6), 0.95 FROM agg
  UNION ALL SELECT 'format_o_orderpriority',
         round(n_prio_ok / CAST(n AS DOUBLE), 6), 1.0 FROM agg
  UNION ALL SELECT 'completeness_o_orderdate',
         round(n_date_ok / CAST(n AS DOUBLE), 6), 1.0 FROM agg
  UNION ALL SELECT 'ref_o_custkey_in_customer',
         round(n_ref_ok / CAST(n AS DOUBLE), 6), 1.0 FROM agg
)
SELECT constraint_name, metric, threshold,
       CASE WHEN metric >= threshold THEN 'pass' ELSE 'fail' END AS status
FROM report
"""


# ---------------------------------------------------------------------------
# Small-file compaction planning (Iceberg/Delta OPTIMIZE bin-pack)
# ---------------------------------------------------------------------------

_COMPACT_OVERHEAD = 512  # per-file format overhead added to payload bytes
_COMPACT_TARGET = 16384  # target output file size (bytes)


def maintenance_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction PLANNING — the metadata half of
    Iceberg/Delta ``OPTIMIZE`` (BinPackStrategy) and the operational
    answer to the small-files problem every long-running ingest
    (reference contract K1's one-file-per-run sink, src/sink.rs)
    accumulates: given a file manifest (one file per document, size =
    payload + format overhead, partitioned by lang), greedily pack
    files in arrival (doc_id) order into target-size output bins via a
    per-partition cumulative sum, and emit one row per planned output
    file: file count, total bytes, id range, and how many small files
    the rewrite retires.

    Greedy cumulative packing (bin = bytes_before DIV target, exact
    BIGINT integer division — no float ever enters the bin id) is
    Iceberg's actual strategy: it preserves arrival clustering, never
    reorders data, and plans in one pass over the MANIFEST — no data
    byte is read to decide the rewrite. A bin may overshoot the target
    by at most one file (the straddler lands in the bin its first byte
    falls in), matching Iceberg's closed-bin semantics.

    Scale shape: one shuffle on the partition key (lang) feeds a
    running-sum window that streams each partition's sorted run; the
    bin agg then moves one row per OUTPUT file. A 100-TB table's
    manifest is ~10^7 rows — this whole plan is a metadata query that
    fits on a laptop, which is the point: compaction DECISIONS must
    never cost a table scan."""
    docs = _t(spark, sf_dir, "documents")
    files = docs.select(
        "doc_id",
        "lang",
        (F.col("n_chars") + _COMPACT_OVERHEAD).alias("file_bytes"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # bin id via BIGINT integer division (never float): floor(x / t) on a
    # non-negative bigint x equals x DIV t exactly, and integer division is
    # version-invariant across engines where double division + floor() is
    # hostage to each engine's float formatting/rounding stack.
    binned = files.withColumn(
        "bytes_before",
        F.coalesce(F.sum("file_bytes").over(w), F.lit(0)).cast("bigint"),
    ).withColumn(
        "bin", F.expr(f"bytes_before DIV {_COMPACT_TARGET}")
    )
    return (
        binned.groupBy("lang", "bin")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("file_bytes").cast("bigint").alias("total_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            (F.count("*") - 1).alias("files_retired"),
        )
        .select(
            "lang",
            F.col("bin").cast("bigint").alias("bin"),
            "n_files",
            "total_bytes",
            "first_doc",
            "last_doc",
            "files_retired",
        )
    )


MAINTENANCE_COMPACTION_SQL = f"""
WITH manifest AS (
  SELECT doc_id, lang, n_chars + {_COMPACT_OVERHEAD} AS file_bytes
  FROM documents
),
binned AS (
  SELECT doc_id, lang, file_bytes,
         CAST(COALESCE(SUM(file_bytes) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           // {_COMPACT_TARGET} AS bin
  FROM manifest
)
SELECT lang, bin,
       COUNT(*) AS n_files,
       CAST(SUM(file_bytes) AS BIGINT) AS total_bytes,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc,
       COUNT(*) - 1 AS files_retired
FROM binned
GROUP BY lang, bin
"""


# ---------------------------------------------------------------------------
# Suffix-sort maximal repeats (suffix array → adjacent LCP)
# ---------------------------------------------------------------------------

_SFX_LEN = 60  # suffixes truncated to this many chars before sorting
_SFX_MIN = 25  # minimal repeat length reported (= the group-key prefix)
_SFX_SCAN_CAP = 10_000  # chars of normalized text scanned per document
# (both engines cap the text identically, so the oracle can enumerate
# positions from a CONSTANT generate_series — older DuckDB builds reject
# correlated/subquery bounds — without any data-dependent divergence)

# Shared DuckDB fragments of the suffix universe — the oracle-side
# twin of ``_suffix_rows``, single-sourced so the three suffix entries
# (dedup_suffix_lcp, dedup_suffix_lcp_bucketed,
# stream_suffix_incremental) cannot silently drift apart on the
# normalization, the scan cap, or the word-start rule.
_SFX_SQL_PRELUDE = f"""norm AS (
  SELECT doc_id,
         substr(trim(lower(regexp_replace(text, '[^A-Za-z0-9]+', ' ', 'g'))),
                1, {_SFX_SCAN_CAP}) AS norm
  FROM documents
),
series AS (
  SELECT g.pos AS pos FROM generate_series(1, {_SFX_SCAN_CAP}) AS g(pos)
)"""
# word-start positions whose truncated suffix clears the threshold
_SFX_SQL_WHERE = f"""g.pos <= length(norm)
    AND substr(norm, g.pos, 1) <> ' '
    AND (g.pos = 1 OR substr(norm, g.pos - 1, 1) = ' ')
    AND length(substr(norm, g.pos, {_SFX_LEN})) >= {_SFX_MIN}"""


def _suffix_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, suffix, pfx) word-start suffix rows over the
    ASCII-normalized, scan-capped text — the shared builder of
    ``dedup_suffix_lcp`` and its bucketed incremental twin (the two
    entries must agree on the suffix universe or the index misses
    exactly the rows the batch probes)."""
    norm = F.substring(
        F.trim(F.lower(F.regexp_replace("text", "[^A-Za-z0-9]+", " "))),
        1,
        _SFX_SCAN_CAP,
    )
    starts = F.filter(
        F.sequence(F.lit(1), F.length("norm")),
        lambda p: (F.substr(F.col("norm"), p, F.lit(1)) != F.lit(" "))
        & (
            (p == F.lit(1))
            | (F.substr(F.col("norm"), p - 1, F.lit(1)) == F.lit(" "))
        ),
    )
    return (
        docs.select("doc_id", norm.alias("norm"))
        .select("doc_id", "norm", F.explode(starts).alias("pos"))
        .select(
            "doc_id",
            "pos",
            F.substr(F.col("norm"), F.col("pos"), F.lit(_SFX_LEN)).alias(
                "suffix"
            ),
        )
        .filter(F.length("suffix") >= _SFX_MIN)
        .withColumn("pfx", F.substring("suffix", 1, _SFX_MIN))
    )


def dedup_suffix_lcp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-sorting maximal-repeat detection — the distributed form
    of the suffix-array pass in Lee et al. (ACL 2022): every
    word-start suffix of the normalized corpus (truncated to 60 chars)
    is sorted; in suffix order, every repeated substring of length
    ≥ 25 appears as ADJACENT suffixes, and the adjacent pair's longest
    common prefix is the repeat's exact maximal length — variable-
    length evidence the fixed-window hashing of
    ``dedup_substring_exact`` cannot produce. Per document we report
    how many of its suffix positions sit in a ≥25-char repeat, how
    many of those repeats cross documents, the maximal repeat length,
    and the lexicographically-first repeated substring.

    Distribution note (why this scales where a textbook suffix array
    does not): suffixes sharing a 25-char prefix — the only pairs that
    can clear the threshold — are hash-partitioned by that prefix, so
    the sort and the adjacent-LCP window run per-group with NO global
    single-partition window; cross-group adjacencies have LCP < 25 by
    construction and are exactly the pairs the threshold discards.
    One shuffle on the prefix key, O(suffix_len) work per row, and the
    60-char truncation bounds row width — the Lee et al. pipeline runs
    the same bounded-context trick at corpus scale.

    LCP is computed engine-portably as |{i ≤ 60 : a[:i] = b[:i]}|,
    clamped to the shorter string's length — prefix equality is
    monotone, so the count IS the longest-common-prefix length (the
    clamp handles identical truncated suffixes, where every i agrees);
    no loop, no UDF, same expression in DuckDB.

    Version-invariance (round 9): normalization strips every byte
    outside ASCII ``[A-Za-z0-9]`` BEFORE lowercasing, so ``lower()``
    only ever sees ASCII and no engine's Unicode/ICU table revision
    can change the result; the DuckDB oracle uses no lambda syntax
    (correlated ``generate_series`` + a filtered COUNT replace the
    ``list_filter(.., p -> ..)`` forms, whose ``->`` arrow DuckDB
    deprecated after 1.2)."""
    from archive_to_parquet_spark.operators.dedup import spread_small_scan

    docs = _t(spark, sf_dir, "documents")
    # round 11 (guide §2.5/§2.6): the documents parquet arrives as ONE
    # split at bench scale, pinning the CPU-heavy normalize+explode+
    # substr chain to a single task (4.4 s of the entry's profile).
    # spread_small_scan repartitions on doc_id only when the scan is
    # narrower than the cluster — a no-op on a 100-TB wide scan.
    sfx = _suffix_rows(spread_small_scan(docs, "doc_id"))
    w = Window.partitionBy("pfx").orderBy("suffix", "doc_id", "pos")
    # prefix equality is monotone, so the count of agreeing prefix
    # lengths IS the LCP — except when the two (truncated) suffixes are
    # IDENTICAL, where every probed i agrees; clamp to the string
    # length.  Group members share the 25-char prefix by construction,
    # so the scan starts at 26 and adds the guaranteed 25.
    #
    # Round 11 (guide §4.1): the agree-count is an UNROLLED sum of the
    # same per-i prefix-equality probes the
    # ``filter(sequence(...), lambda ...)`` form evaluated interpreted
    # (higher-order lambdas get no whole-stage codegen; this window
    # stage was 4.2 s of the entry's profile). Identical probe set →
    # identical count.
    agree = " + ".join(
        f"(CASE WHEN substr(suffix, 1, {i}) = substr(prev_sfx, 1, {i}) "
        "THEN 1 ELSE 0 END)"
        for i in range(_SFX_MIN + 1, _SFX_LEN + 1)
    )
    lcp = F.least(
        F.expr(f"{_SFX_MIN} + ({agree})"),
        F.length("suffix"),
        F.length("prev_sfx"),
    )
    pairs = (
        sfx.withColumn("prev_sfx", F.lag("suffix").over(w))
        .withColumn("prev_doc", F.lag("doc_id").over(w))
        .filter(F.col("prev_sfx").isNotNull())
        .withColumn("lcp", lcp)
        .filter(F.col("lcp") >= _SFX_MIN)
    )
    return pairs.groupBy("doc_id").agg(
        F.count("*").alias("n_repeats"),
        F.sum(
            F.when(F.col("prev_doc") != F.col("doc_id"), 1).otherwise(0)
        ).cast("bigint").alias("n_cross_doc"),
        F.max("lcp").cast("int").alias("max_lcp"),
        F.min(F.substr(F.col("suffix"), F.lit(1), F.col("lcp"))).alias(
            "sample_repeat"
        ),
    )


DEDUP_SUFFIX_LCP_SQL = f"""
WITH {_SFX_SQL_PRELUDE},
sfx AS (
  SELECT doc_id, g.pos AS pos,
         substr(norm, g.pos, {_SFX_LEN}) AS suffix,
         substr(norm, g.pos, {_SFX_MIN}) AS pfx
  FROM norm, series g
  WHERE {_SFX_SQL_WHERE}
),
lagged AS (
  SELECT doc_id, pos, suffix,
         lag(suffix) OVER (PARTITION BY pfx
                           ORDER BY suffix, doc_id, pos) AS prev_sfx,
         lag(doc_id) OVER (PARTITION BY pfx
                           ORDER BY suffix, doc_id, pos) AS prev_doc
  FROM sfx
),
pairs AS (
  SELECT p.doc_id, p.pos, p.suffix, p.prev_doc,
         least({_SFX_MIN} + COUNT(*) FILTER (
                 WHERE substr(p.suffix, 1, s.i) = substr(p.prev_sfx, 1, s.i)),
               length(p.suffix), length(p.prev_sfx)) AS lcp
  FROM lagged p, generate_series({_SFX_MIN} + 1, {_SFX_LEN}) AS s(i)
  WHERE p.prev_sfx IS NOT NULL
  GROUP BY p.doc_id, p.pos, p.suffix, p.prev_sfx, p.prev_doc
)
SELECT doc_id,
       COUNT(*) AS n_repeats,
       CAST(SUM(CASE WHEN prev_doc <> doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cross_doc,
       CAST(MAX(lcp) AS INT) AS max_lcp,
       MIN(substr(suffix, 1, lcp)) AS sample_repeat
FROM pairs
WHERE lcp >= {_SFX_MIN}
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Bucketed suffix index + incremental probe (round 10 — the fourth
# zero-Exchange bucketed family, after exact dedup, minhash and LSH-ANN)
# ---------------------------------------------------------------------------


def dedup_suffix_lcp_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-dedup index MAINTENANCE with a co-bucketed layout —
    ``dedup_suffix_lcp``'s prefix groups ARE a bucketing key (r9
    verdict stretch #6): every suffix pair that can clear the ≥25-char
    repeat threshold shares its 25-char prefix, so a persisted suffix
    index bucketed on ``pfx`` answers the daily question — which
    25-char prefix groups are NEW today, i.e. which long substrings
    appear for the first time — with ZERO shuffle Exchanges, asserted
    in-query with auto-broadcast disabled (same zero-Exchange contract
    as ``dedup_minhash_bucketed`` / ``dedup_incremental_bucketed``;
    reference contract D1 generalized to substring dedup).

    Index = distinct 25-char prefixes of the even-doc_id corpus's
    word-start suffixes (``_suffix_rows``, shared with the batch
    entry so both agree on the suffix universe); batch = the odd-doc
    suffix rows. Both bucketed 8-way on ``pfx``, written once per
    sf_dir (ensure_bucketed_table): the anti-join rides the bucket
    spec and the delta aggregation groups BY the bucket key, so a
    100-TB index never re-shuffles — the probe's cost is the day's
    batch alone.

    Matching is prefix-EXACT (both engines compare the same ASCII-
    normalized 25-char strings), so the DuckDB oracle checks every
    group key exactly — no banding-quality argument needed."""
    import re

    from archive_to_parquet_spark.plans.bucketing import (
        _input_fingerprint,
        ensure_bucketed_table,
        plan_has_exchange,
    )
    from archive_to_parquet_spark.queries_ext import _stage_dir

    suffix = re.sub(r"\W", "_", sf_dir.rstrip("/").split("sf")[-1])
    ti, tb = f"sfxbk_idx_{suffix}", f"sfxbk_batch_{suffix}"
    stage = _stage_dir("sfxbucketed", sf_dir)
    docs = _t(spark, sf_dir, "documents")
    fp = ["sfxbk-v1", _input_fingerprint(f"{sf_dir}/documents.parquet")]
    ensure_bucketed_table(
        spark, ti, os.path.join(stage, "idx"), "pfx", 8,
        lambda: (
            _suffix_rows(docs.filter(F.col("doc_id") % 2 == 0))
            .select("pfx")
            .distinct()  # one row per prefix group; shuffle paid ONCE
        ),
        fp,
    )
    ensure_bucketed_table(
        spark, tb, os.path.join(stage, "new"), "pfx", 8,
        lambda: _suffix_rows(docs.filter(F.col("doc_id") % 2 == 1)).select(
            "doc_id", "pos", "pfx"
        ),
        fp,
    )

    def probe() -> DataFrame:
        return (
            spark.table(tb)
            .join(spark.table(ti), "pfx", "left_anti")
            .groupBy("pfx")
            .agg(
                F.min("doc_id").alias("first_doc"),
                F.count("*").alias("n_suffixes"),
            )
            .select("pfx", "first_doc", "n_suffixes")
        )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert not plan_has_exchange(probe()), (
            "bucketed suffix-index delta gained a shuffle"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    return probe()


DEDUP_SUFFIX_BUCKETED_SQL = f"""
WITH {_SFX_SQL_PRELUDE},
sfx AS (
  SELECT doc_id, substr(norm, g.pos, {_SFX_MIN}) AS pfx
  FROM norm, series g
  WHERE {_SFX_SQL_WHERE}
),
idx AS (SELECT DISTINCT pfx FROM sfx WHERE doc_id % 2 = 0),
batch AS (SELECT doc_id, pfx FROM sfx WHERE doc_id % 2 = 1)
SELECT b.pfx,
       CAST(MIN(b.doc_id) AS BIGINT) AS first_doc,
       CAST(COUNT(*) AS BIGINT) AS n_suffixes
FROM batch b
WHERE NOT EXISTS (SELECT 1 FROM idx i WHERE i.pfx = b.pfx)
GROUP BY 1
"""


def stream_suffix_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The suffix family under continuous arrival: the corpus arrives
    as 4 slice files (doc_id % 4), one per micro-batch; each batch
    suffix-expands its documents ONCE (``_suffix_rows`` — the same
    builder as ``dedup_suffix_lcp`` and its bucketed twin), probes the
    accumulated 25-char-prefix index for the prefixes it INTRODUCES,
    emits that delta with batch-local first_doc/count, and appends its
    prefixes to the index (streaming/suffix_index.py — probe + append,
    never re-derive).

    Deterministic closed form the oracle states: each prefix is
    emitted exactly once, by the FIRST batch (min doc_id % 4)
    containing it, with first_doc and n_suffixes computed within that
    batch. Replays are batch_id-keyed idempotent (overwrite + a
    same-batch exclusion in the probe), so the bounded stream's delta
    union equals the closed form regardless of restarts.

    Scale: this is the daily substring-index maintenance loop at
    100 TB — arriving shards are normalized and suffix-expanded
    exactly once, stored state is probe+append; persisted bucketed on
    ``pfx`` (the bucketed twin's layout) the probe never re-shuffles
    the index."""
    import glob
    import shutil
    import tempfile

    from archive_to_parquet_spark.streaming.suffix_index import (
        suffix_index_stream,
    )

    docs = _t(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="stream_sfx_")
    stage = os.path.join(root, "in")
    os.makedirs(stage)
    try:
        for k in range(4):
            tmp = os.path.join(root, f"slice{k}")
            docs.filter(F.col("doc_id") % 4 == k).coalesce(1).write.parquet(
                tmp
            )
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(stage, f"{k:02d}.parquet")
            shutil.copy(part, dst)
            t = 1_700_000_000 + k * 10  # deterministic arrival order
            os.utime(dst, (t, t))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        q = suffix_index_stream(
            spark,
            stream,
            index_dir=os.path.join(root, "index"),
            delta_dir=os.path.join(root, "delta"),
            checkpoint_dir=os.path.join(root, "ckpt"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        delta_dir = os.path.join(root, "delta")
        from archive_to_parquet_spark.streaming.neardup import _index_exists

        if not _index_exists(delta_dir):
            # a corpus where no batch yields a ≥25-char word-start
            # suffix writes no delta at all; the oracle returns 0 rows
            # — return the same empty relation instead of crashing on
            # a missing parquet path
            return spark.createDataFrame(
                [],
                "pfx string, first_doc bigint, n_suffixes bigint,"
                " first_batch bigint",
            )
        return (
            spark.read.parquet(delta_dir)
            .select(
                "pfx",
                "first_doc",
                "n_suffixes",
                F.col("batch_id").cast("bigint").alias("first_batch"),
            )
            .localCheckpoint(eager=True)  # staging dir is removed below
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


STREAM_SUFFIX_INCREMENTAL_SQL = f"""
WITH {_SFX_SQL_PRELUDE},
sfx AS (
  SELECT doc_id, CAST(doc_id % 4 AS BIGINT) AS batch,
         substr(norm, g.pos, {_SFX_MIN}) AS pfx
  FROM norm, series g
  WHERE {_SFX_SQL_WHERE}
),
fb AS (SELECT pfx, MIN(batch) AS batch FROM sfx GROUP BY pfx)
SELECT s.pfx,
       CAST(MIN(s.doc_id) AS BIGINT) AS first_doc,
       CAST(COUNT(*) AS BIGINT) AS n_suffixes,
       f.batch AS first_batch
FROM sfx s
JOIN fb f ON s.pfx = f.pfx AND s.batch = f.batch
GROUP BY s.pfx, f.batch
"""


# ---------------------------------------------------------------------------
# Streaming-index maintenance: fold aged batch partitions into the
# bucketed base (round 11 — VERDICT r10 ask #4)
# ---------------------------------------------------------------------------


def maintenance_stream_index_compaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Compaction of the STREAMING suffix index — the daily-loop piece
    the three incremental indexes were missing: the streaming writer
    (streaming/suffix_index.py) appends one ``batch_id=N`` partition
    per micro-batch forever, so probe fan-in grows with index age.
    This entry folds the aged partitions into the bucketed base layout
    (``dedup_suffix_lcp_bucketed``'s) with
    ``streaming.suffix_index.compact_suffix_index`` and probes against
    base + young tail.

    Construction: the corpus arrives as 5 slices (doc_id % 5). Slices
    0-3 are the accumulated index partitions (batch_id=k, one row per
    distinct 25-char word-start suffix prefix — exactly what the
    streaming writer appends); the fold watermark is batch_id <= 2, so
    the base absorbs slices 0-2 and slice 3 remains the uncompacted
    tail; slice 4 is today's probe batch. The probe's delta — prefixes
    slice 4 INTRODUCES, with batch-local first_doc / suffix count — is
    by probe-equivalence identical before and after the fold
    (tests/test_round11_compaction.py pins this on the real streaming
    writer's output), so the DuckDB oracle states the same closed form
    as the bucketed twin: prefixes of slice 4 absent from slices 0-3.

    Scale shape: compaction itself is one distinct + bucketed write
    paid at fold time (staged once per input fingerprint here, like
    every bucketed layout); the folded-batch decision is a partition-
    directory listing, never a data scan (the maintenance-family
    rule). The probe anti-joins the BUCKETED base exchange-free
    (asserted in-query with auto-broadcast disabled, same contract as
    the bucketed twin) and pays exchanges only for the young tail —
    probe cost tracks tail size, not index size, which is what makes
    the continuous-ingest index sustainable at 100 TB."""
    from archive_to_parquet_spark.plans.bucketing import (
        _input_fingerprint,
        ensure_bucketed_table,
        ensure_parquet_snapshot,
        plan_has_exchange,
    )
    from archive_to_parquet_spark.queries_ext import _stage_dir
    from archive_to_parquet_spark.streaming.suffix_index import (
        compact_suffix_index,
    )

    import re

    suffix = re.sub(r"\W", "_", sf_dir.rstrip("/").split("sf")[-1])
    stage = _stage_dir("sfxcompact", sf_dir)
    idx_dir = os.path.join(stage, "index")
    docs = _t(spark, sf_dir, "documents")
    fp = ["sfxcompact-v1", _input_fingerprint(f"{sf_dir}/documents.parquet")]

    # the accumulated streaming index: one batch_id=k partition per
    # arrived slice, holding that batch's distinct prefixes (the
    # streaming writer's exact row format)
    for k in range(4):
        ensure_parquet_snapshot(
            spark,
            os.path.join(idx_dir, f"batch_id={k}"),
            lambda k=k: (
                _suffix_rows(docs.filter(F.col("doc_id") % 5 == k))
                .select("pfx")
                .distinct()
            ),
            fp,
        )

    tbase = f"sfxcmp_base_{suffix}"
    compact_suffix_index(
        spark,
        idx_dir,
        tbase,
        os.path.join(stage, "base"),
        max_batch_id=2,
        num_buckets=8,
        fingerprint=fp,
    )

    tprobe = f"sfxcmp_probe_{suffix}"
    ensure_bucketed_table(
        spark, tprobe, os.path.join(stage, "probe"), "pfx", 8,
        lambda: _suffix_rows(docs.filter(F.col("doc_id") % 5 == 4)).select(
            "doc_id", "pos", "pfx"
        ),
        fp,
    )

    def probe() -> DataFrame:
        tail = (
            spark.read.parquet(idx_dir)
            .filter(F.col("batch_id") > 2)
            .select("pfx")
        )
        return (
            spark.table(tprobe)
            .join(spark.table(tbase), "pfx", "left_anti")
            .join(tail, "pfx", "left_anti")
            .groupBy("pfx")
            .agg(
                F.min("doc_id").alias("first_doc"),
                F.count("*").alias("n_suffixes"),
            )
            .select("pfx", "first_doc", "n_suffixes")
        )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        base_leg = spark.table(tprobe).join(
            spark.table(tbase), "pfx", "left_anti"
        )
        assert not plan_has_exchange(base_leg), (
            "compacted suffix-index base probe gained a shuffle"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    return probe()


MAINTENANCE_STREAM_INDEX_COMPACTION_SQL = f"""
WITH {_SFX_SQL_PRELUDE},
sfx AS (
  SELECT doc_id, substr(norm, g.pos, {_SFX_MIN}) AS pfx
  FROM norm, series g
  WHERE {_SFX_SQL_WHERE}
),
idx AS (SELECT DISTINCT pfx FROM sfx WHERE doc_id % 5 <= 3),
batch AS (SELECT doc_id, pfx FROM sfx WHERE doc_id % 5 = 4)
SELECT b.pfx,
       CAST(MIN(b.doc_id) AS BIGINT) AS first_doc,
       CAST(COUNT(*) AS BIGINT) AS n_suffixes
FROM batch b
WHERE NOT EXISTS (SELECT 1 FROM idx i WHERE i.pfx = b.pfx)
GROUP BY 1
"""


def maintenance_stream_index_compaction_fold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The FOLD leg of the streaming suffix-index compaction, timed per
    run (r11 verdict ask #5): the headline
    ``maintenance_stream_index_compaction`` entry stages the fold once
    per input fingerprint (the staged-layout family convention), so its
    bench number measures the fold *decision* + probe — the per-run
    cost of the daily maintenance loop — but never the fold work
    itself. This twin pays the actual fold on EVERY execution: read the
    aged ``batch_id <= 2`` partitions of the same staged accumulated
    index, distinct the prefixes, and rewrite the bucketed base table
    from scratch (no fingerprint staging — the output directory is
    removed first so each run performs the full distinct + bucketed
    write). Returns the folded base, whose closed form the oracle
    states directly: the distinct prefixes of slices 0-2.

    Scale shape: the fold is ONE distinct shuffle over the aged
    partitions plus one bucketed write — exactly what a production
    compaction pays, amortized over however many probe runs the base
    then serves (the headline entry measures those)."""
    import re
    import shutil

    from archive_to_parquet_spark.plans.bucketing import (
        _input_fingerprint,
        ensure_parquet_snapshot,
    )
    from archive_to_parquet_spark.queries_ext import _stage_dir
    from archive_to_parquet_spark.streaming.suffix_index import (
        compact_suffix_index,
    )

    suffix = re.sub(r"\W", "_", sf_dir.rstrip("/").split("sf")[-1])
    stage = _stage_dir("sfxcompact", sf_dir)
    idx_dir = os.path.join(stage, "index")
    docs = _t(spark, sf_dir, "documents")
    fp = ["sfxcompact-v1", _input_fingerprint(f"{sf_dir}/documents.parquet")]

    # the same staged accumulated index the headline entry probes
    # (shared stage dir + fingerprint, so neither entry re-stages it)
    for k in range(4):
        ensure_parquet_snapshot(
            spark,
            os.path.join(idx_dir, f"batch_id={k}"),
            lambda k=k: (
                _suffix_rows(docs.filter(F.col("doc_id") % 5 == k))
                .select("pfx")
                .distinct()
            ),
            fp,
        )

    out = os.path.join(stage, "fold_timed")
    shutil.rmtree(out, ignore_errors=True)
    tfold = f"sfxcmp_foldtimed_{suffix}"
    compact_suffix_index(
        spark,
        idx_dir,
        tfold,
        out,
        max_batch_id=2,
        num_buckets=8,
        # NO fingerprint: the fold re-executes on every run — this
        # entry exists to TIME it
    )
    return spark.table(tfold).select("pfx")


MAINTENANCE_STREAM_INDEX_FOLD_SQL = f"""
WITH {_SFX_SQL_PRELUDE},
sfx AS (
  SELECT doc_id, substr(norm, g.pos, {_SFX_MIN}) AS pfx
  FROM norm, series g
  WHERE {_SFX_SQL_WHERE}
)
SELECT DISTINCT pfx FROM sfx WHERE doc_id % 5 <= 2
"""


# ---------------------------------------------------------------------------
# A/B experiment readout: Welch's t-test from exact integer moments
# ---------------------------------------------------------------------------


def eval_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout — Welch's unequal-variance t-test on
    purchase value between two arms (arm = user_id % 2), the decision
    query every experimentation platform runs over its event log.

    Exactness path: per-arm moments are computed in integer
    milli-units (n, Σm as int64; Σm² accumulated as decimal(38,0) in
    Spark / HUGEINT in DuckDB, so the second moment stays exact to
    10^38 — no silent int64 wrap at any realistic arm size), so the
    shuffled aggregation is EXACT in any engine; mean, variance, t
    and the Welch–Satterthwaite df are
    then literal double expressions over those identical integers —
    bit-identical across engines because IEEE-754 ops are correctly
    rounded and the expression tree is fixed. No float ever enters a
    multi-row aggregation.

    Scale shape: one scan with the event_type filter pushed to the
    parquet scan, one map-side-combinable 2-group aggregation, then
    scalar arithmetic on a 2-row frame — at 100 TB this is a single
    reduce of six integers per arm. The integer-moment trick is the
    same one the warehouse uses for mergeable variance (Chan et al.
    parallel-variance, reduced here to raw moments)."""
    # ts is unused but its parquet layout varies (see queries._events);
    # the legacy conf makes the raw read safe under both layouts
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = _t(spark, sf_dir, "events")
    mv = F.round(F.col("value") * 1000).cast("bigint")
    per_arm = (
        events.filter(F.col("event_type") == "purchase")
        .select((F.col("user_id") % 2).alias("arm"), mv.alias("mv"))
        .groupBy("arm")
        .agg(
            F.count("*").alias("n"),
            F.sum("mv").alias("s1"),
            F.sum(
                F.col("mv").cast("decimal(19,0)") * F.col("mv")
            ).alias("s2"),
        )
    )

    def side(arm: int, col: str) -> F.Column:
        return F.sum(F.when(F.col("arm") == arm, F.col(col)))

    wide = per_arm.agg(
        side(0, "n").alias("n_a"),
        side(0, "s1").alias("s1_a"),
        side(0, "s2").alias("s2_a"),
        side(1, "n").alias("n_b"),
        side(1, "s1").alias("s1_b"),
        side(1, "s2").alias("s2_b"),
    )
    # doubles from exact ints; /1000 and /1e6 undo the milli-scaling
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    s1a, s2a = F.col("s1_a").cast("double"), F.col("s2_a").cast("double")
    s1b, s2b = F.col("s1_b").cast("double"), F.col("s2_b").cast("double")
    mean_a = s1a / na / 1000.0
    mean_b = s1b / nb / 1000.0
    var_a = (s2a - s1a * s1a / na) / (na - 1.0) / 1.0e6
    var_b = (s2b - s1b * s1b / nb) / (nb - 1.0) / 1.0e6
    sea = var_a / na
    seb = var_b / nb
    t = (mean_a - mean_b) / F.sqrt(sea + seb)
    df_w = (sea + seb) * (sea + seb) / (
        sea * sea / (na - 1.0) + seb * seb / (nb - 1.0)
    )
    return wide.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(var_a, 4).alias("var_a"),
        F.round(var_b, 4).alias("var_b"),
        F.round(t, 4).alias("t_stat"),
        F.round(df_w, 2).alias("df_welch"),
        F.when(F.abs(t) > 1.96, 1).otherwise(0).alias("significant"),
    )


EVAL_AB_WELCH_SQL = """
WITH arms AS (
  SELECT user_id % 2 AS arm,
         CAST(round(value * 1000) AS BIGINT) AS mv
  FROM events WHERE event_type = 'purchase'
),
m AS (
  SELECT arm, COUNT(*) AS n, SUM(mv) AS s1,
         SUM(CAST(mv AS HUGEINT) * mv) AS s2
  FROM arms GROUP BY arm
),
wide AS (
  SELECT SUM(CASE WHEN arm = 0 THEN n END) AS n_a,
         CAST(SUM(CASE WHEN arm = 0 THEN s1 END) AS DOUBLE) AS s1_a,
         CAST(SUM(CASE WHEN arm = 0 THEN s2 END) AS DOUBLE) AS s2_a,
         SUM(CASE WHEN arm = 1 THEN n END) AS n_b,
         CAST(SUM(CASE WHEN arm = 1 THEN s1 END) AS DOUBLE) AS s1_b,
         CAST(SUM(CASE WHEN arm = 1 THEN s2 END) AS DOUBLE) AS s2_b
  FROM m
),
calc AS (
  SELECT n_a, n_b,
         s1_a / n_a / 1000.0 AS mean_a,
         s1_b / n_b / 1000.0 AS mean_b,
         (s2_a - s1_a * s1_a / n_a) / (n_a - 1.0) / 1.0e6 AS var_a,
         (s2_b - s1_b * s1_b / n_b) / (n_b - 1.0) / 1.0e6 AS var_b
  FROM (SELECT CAST(n_a AS DOUBLE) AS n_a, s1_a, s2_a,
               CAST(n_b AS DOUBLE) AS n_b, s1_b, s2_b FROM wide)
),
stat AS (
  SELECT *,
         (mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b) AS t,
         (var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b)
           / ((var_a / n_a) * (var_a / n_a) / (n_a - 1.0)
              + (var_b / n_b) * (var_b / n_b) / (n_b - 1.0)) AS df_w
  FROM calc
)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       round(mean_a, 6) AS mean_a,
       round(mean_b, 6) AS mean_b,
       round(var_a, 4) AS var_a,
       round(var_b, 4) AS var_b,
       round(t, 4) AS t_stat,
       round(df_w, 2) AS df_welch,
       CASE WHEN abs(t) > 1.96 THEN 1 ELSE 0 END AS significant
FROM stat
"""


# ---------------------------------------------------------------------------
# Streaming constraint monitor (the audit suite under continuous arrival)
# ---------------------------------------------------------------------------


def stream_constraint_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The constraint suite under CONTINUOUS arrival — events stream in
    4 micro-batches (event_id % 4 slices, one file per trigger) and
    foreachBatch folds each batch to a one-row ALGEBRAIC partial
    (counts only) written to a batch_id-keyed state path; the report
    merges partials by summation, so it is invariant to batch
    boundaries — the oracle IS the whole-table computation, and the
    driver row certifies merge(partials) == agg(all). A replayed
    micro-batch OVERWRITES its own partial (idempotence by layout, the
    ``stream_neardup_incremental`` precedent — crash-replay has a unit
    test). Deequ's incremental-metrics design (Schelter et al., VLDB
    2018 §3.3); reference contract K4's counters under arrival.

    Scale shape: per batch, one map-side-combinable fold to ONE row;
    state grows one row per micro-batch regardless of batch size; the
    report aggregates batch-count rows. The monitor never rescans
    arrived data — the same never-rescan-the-base argument as
    ``maintenance_incremental_agg``, carried to quality metrics."""
    import glob
    import shutil
    import tempfile

    from archive_to_parquet_spark.streaming.quality import (
        constraint_monitor_stream,
        constraint_report,
    )

    # ts is unused but its parquet layout varies (see queries._events);
    # the legacy conf makes the raw read safe under both layouts
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "props"
    )
    root = tempfile.mkdtemp(prefix="stream_cmon_")
    stage = os.path.join(root, "in")
    os.makedirs(stage)
    try:
        for k in range(4):
            tmp = os.path.join(root, f"slice{k}")
            events.filter(F.col("event_id") % 4 == k).coalesce(
                1
            ).write.parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(stage, f"{k:02d}.parquet")
            shutil.copy(part, dst)
            t = 1_700_000_000 + k * 10  # deterministic arrival order
            os.utime(dst, (t, t))
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        q = constraint_monitor_stream(
            stream,
            os.path.join(root, "state"),
            os.path.join(root, "ckpt"),
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()
        n_batches = len(glob.glob(os.path.join(root, "state", "batch=*")))
        assert n_batches == 4, (
            f"expected 4 micro-batch partials, found {n_batches}"
        )
        return constraint_report(
            spark, os.path.join(root, "state")
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


STREAM_CONSTRAINT_MONITOR_SQL = """
WITH agg AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN props IS NOT NULL THEN 1 ELSE 0 END) AS n_props_ok,
         SUM(CASE WHEN event_type IN
               ('click','view','signup','purchase','error')
             THEN 1 ELSE 0 END) AS n_type_ok,
         SUM(CASE WHEN value BETWEEN 0.0 AND 300.0 THEN 1 ELSE 0 END)
           AS n_value_ok,
         COUNT(DISTINCT event_id) AS n_id
  FROM events
),
report AS (
  SELECT 'completeness_props' AS constraint_name,
         round(n_props_ok / CAST(n AS DOUBLE), 6) AS metric,
         CAST(1.0 AS DOUBLE) AS threshold FROM agg
  UNION ALL SELECT 'set_event_type',
         round(n_type_ok / CAST(n AS DOUBLE), 6), 1.0 FROM agg
  UNION ALL SELECT 'bounds_value_0_300',
         round(n_value_ok / CAST(n AS DOUBLE), 6), 0.998 FROM agg
  UNION ALL SELECT 'unique_event_id',
         round(n_id / CAST(n AS DOUBLE), 6), 1.0 FROM agg
)
SELECT constraint_name, metric, threshold,
       CASE WHEN metric >= threshold THEN 'pass' ELSE 'fail' END AS status
FROM report
"""


# ---------------------------------------------------------------------------
# Label-propagation community detection (2 synchronous rounds, mode rule)
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 2


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the part co-purchase graph (same edge set as
    ``graph_triangles``): labels start as node ids; each round every
    node adopts the MODE of its neighbors' labels (ties broken by
    smallest label — the determinism rule async LPA lacks); two fixed
    rounds, then the community size histogram. Deterministic by
    construction, so the DuckDB oracle replays the exact fixpoint
    prefix rather than checking a quality proxy.

    Scale shape: each round is one neighbor join keyed on node id +
    one (node, label) count + one per-node window top-1 — all
    shuffle-keyed on node, no broadcast of the edge set, no all-pairs.
    Rounds are a fixed unrolled pipeline (2 here; production LPA runs
    ~5 with a convergence check), so the plan depth is bounded and
    checkpoint cadence can ride the same machinery as
    ``graph_pagerank``. The co-purchase expansion is bounded by basket
    size, not catalog size."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    # Round 12 negative result: rebuilding the pairs from per-order
    # collect_set baskets (one scan + explode×explode instead of the
    # two-scan self-join) measured a WASH on rebuild (3.21 → 3.21 s)
    # and a regression on the execute side (bench 1.41 → 1.97 s, the
    # rounds' join strategy drifted) — reverted; the self-join form
    # stands.
    pairs = (
        li.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .distinct()
    )
    # materialize the symmetrized edge list once: both rounds (and the
    # seed-label derivation) reuse it, instead of re-running the
    # lineitem self-join + distinct per consumer (the
    # lsh_epsilon_pairs precedent; the checkpoint subplan stays inside
    # the audit via recording_checkpoint_plans).
    # Round 12 negative result: checkpointing the DIRECTED half below
    # the union (the pagerank single-scan fix) measured SLOWER here
    # (rebuild 3.21 → 3.42 s) — unlike pagerank's concat-keyed
    # branches, the two union branches are IDENTICAL subplans up to
    # projection, so ReuseExchange already elides the duplication, and
    # un-materializing the union just made every consumer re-union the
    # blocks. Kept as-is.
    edges = (
        pairs.select("a", "b")
        .union(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .localCheckpoint()
    )
    labels = edges.select(F.col("a").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    for _ in range(_LPA_ROUNDS):
        nbr = edges.join(
            labels, edges["b"] == labels["id"]
        ).select("a", "label")
        counts = nbr.groupBy("a", "label").agg(F.count("*").alias("cnt"))
        # Round 11 (guide §2.3/§2.4): the per-node mode was a
        # row_number window over (cnt DESC, label ASC) — an exchange on
        # ``a`` PLUS a per-group sort. max(struct(cnt, −label)) picks
        # the lexicographically identical winner (max count, ties to
        # the smallest label), is map-side combinable (partial agg
        # before the exchange), and drops the sort entirely. A fuller
        # restructure (edge list checkpointed hash-partitioned on b +
        # shuffle_hash round joins + single repartition(a)) was
        # measured SLOWER locally (8.3 s vs 5.0 s rebuild at sf0.1) —
        # the AQE-less checkpoint stages and the full-width nbr
        # repartition cost more than the removed sort-merge sorts.
        labels = (
            counts.groupBy("a")
            .agg(
                F.max(
                    F.struct(
                        F.col("cnt"), (-F.col("label")).alias("neg_label")
                    )
                ).alias("best")
            )
            .select(
                F.col("a").alias("id"),
                (-F.col("best.neg_label")).alias("label"),
            )
        )
    return (
        labels.groupBy("label")
        .agg(
            F.count("*").alias("n_members"),
            F.min("id").alias("min_node"),
            F.max("id").alias("max_node"),
        )
        .select(
            F.col("label").alias("community"),
            "n_members",
            "min_node",
            "max_node",
        )
    )


GRAPH_LPA_SQL = """
WITH pairs AS (
  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
  FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
  WHERE x.l_partkey < y.l_partkey
),
edges AS (
  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs
),
l0 AS (SELECT DISTINCT a AS id, a AS label FROM edges),
c1 AS (
  SELECT e.a, l.label, COUNT(*) AS cnt
  FROM edges e JOIN l0 l ON e.b = l.id GROUP BY 1, 2
),
l1 AS (
  SELECT a AS id, label FROM (
    SELECT a, label,
           ROW_NUMBER() OVER (PARTITION BY a
                              ORDER BY cnt DESC, label ASC) AS rn
    FROM c1
  ) WHERE rn = 1
),
c2 AS (
  SELECT e.a, l.label, COUNT(*) AS cnt
  FROM edges e JOIN l1 l ON e.b = l.id GROUP BY 1, 2
),
l2 AS (
  SELECT a AS id, label FROM (
    SELECT a, label,
           ROW_NUMBER() OVER (PARTITION BY a
                              ORDER BY cnt DESC, label ASC) AS rn
    FROM c2
  ) WHERE rn = 1
)
SELECT label AS community,
       COUNT(*) AS n_members,
       MIN(id) AS min_node,
       MAX(id) AS max_node
FROM l2 GROUP BY label
"""


# ---------------------------------------------------------------------------
# Neyman-allocation stratified sampling (exact integer moments)
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 100  # total sample size across strata


def sample_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with NEYMAN allocation (Neyman 1934): the
    sample budget (100 docs) is split across lang strata proportional
    to N_h·σ_h — high-variance strata get more samples, the
    minimum-variance design for estimating the corpus mean (here: of
    n_chars). Within each stratum the sample is the allocation-many
    docs with the smallest md5(doc_id) priority — the deterministic
    uniform draw every sampling entry in this catalog uses.

    Exactness path: per-stratum moments are exact integers (n, Σx in
    int64; Σx² accumulated as decimal(38,0) in Spark / HUGEINT in
    DuckDB, exact to 10^38 — no int64 wrap horizon at any corpus size);
    σ_h is then a fixed double expression over those integers, rounded
    to 6dp BEFORE the allocation arithmetic so the cross-stratum
    Σ N_k·σ_k (a 5-term double sum) starts from identical values in
    both engines. Allocation = round(budget · share), floored at 1 so
    no stratum is unsampled (the textbook practical adjustment).

    Scale shape: one scan → 5-row moment agg; the allocation table
    broadcasts back onto the stratum key; the per-stratum draw is a
    window top-n_h on the md5 priority — one shuffle on lang. At
    100 TB the draw is the only data-sized stage and it's a single
    partitioned top-k, no global sort."""
    docs = _t(spark, sf_dir, "documents")
    moments = docs.groupBy("lang").agg(
        F.count("*").alias("n_h"),
        F.sum("n_chars").alias("s1"),
        F.sum(
            F.col("n_chars").cast("decimal(19,0)") * F.col("n_chars")
        ).alias("s2"),
    )
    nh = F.col("n_h").cast("double")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    sigma = F.round(F.sqrt((s2 - s1 * s1 / nh) / (nh - 1.0)), 6)
    weighted = moments.select("lang", "n_h", (nh * sigma).alias("w_h"))
    total = weighted.agg(F.sum("w_h").alias("w_tot"))
    alloc = (
        weighted.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "n_h",
            F.greatest(
                F.lit(1),
                F.round(
                    F.lit(float(_NEYMAN_BUDGET))
                    * F.col("w_h")
                    / F.col("w_tot"),
                    0,
                ).cast("bigint"),
            ).alias("alloc_h"),
        )
    )
    pri_w = Window.partitionBy("lang").orderBy(
        F.col("priority").asc(), F.col("doc_id").asc()
    )
    drawn = (
        docs.select(
            "lang", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("priority")
        )
        .join(F.broadcast(alloc), "lang")
        .withColumn("rn", F.row_number().over(pri_w))
        .filter(F.col("rn") <= F.col("alloc_h"))
    )
    return drawn.select(
        "lang",
        "doc_id",
        F.col("rn").cast("int").alias("stratum_rank"),
        "alloc_h",
        "n_h",
    )


SAMPLE_NEYMAN_SQL = f"""
WITH moments AS (
  SELECT lang, COUNT(*) AS n_h, SUM(n_chars) AS s1,
         SUM(CAST(n_chars AS HUGEINT) * n_chars) AS s2
  FROM documents GROUP BY lang
),
weighted AS (
  SELECT lang, n_h,
         CAST(n_h AS DOUBLE)
           * round(sqrt((CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                           / CAST(n_h AS DOUBLE))
                        / (CAST(n_h AS DOUBLE) - 1.0)), 6) AS w_h
  FROM moments
),
alloc AS (
  SELECT lang, n_h,
         GREATEST(1, CAST(round({_NEYMAN_BUDGET}.0 * w_h
                                / (SELECT SUM(w_h) FROM weighted), 0)
                          AS BIGINT)) AS alloc_h
  FROM weighted
),
drawn AS (
  SELECT d.lang, d.doc_id, a.alloc_h, a.n_h,
         ROW_NUMBER() OVER (PARTITION BY d.lang
                            ORDER BY md5(CAST(d.doc_id AS VARCHAR)) ASC,
                                     d.doc_id ASC) AS rn
  FROM documents d JOIN alloc a USING (lang)
)
SELECT lang, doc_id, CAST(rn AS INT) AS stratum_rank, alloc_h, n_h
FROM drawn WHERE rn <= alloc_h
"""


CATALOG = {
    "search_hybrid_rrf": (search_hybrid_rrf, SEARCH_HYBRID_RRF_SQL),
    "eval_ab_welch_ttest": (eval_ab_welch_ttest, EVAL_AB_WELCH_SQL),
    "graph_label_propagation": (graph_label_propagation, GRAPH_LPA_SQL),
    "sample_stratified_neyman": (
        sample_stratified_neyman,
        SAMPLE_NEYMAN_SQL,
    ),
    "stream_constraint_monitor": (
        stream_constraint_monitor,
        STREAM_CONSTRAINT_MONITOR_SQL,
    ),
    "audit_constraint_suite": (
        audit_constraint_suite,
        AUDIT_CONSTRAINT_SUITE_SQL,
    ),
    "maintenance_compaction_plan": (
        maintenance_compaction_plan,
        MAINTENANCE_COMPACTION_SQL,
    ),
    "dedup_suffix_lcp": (dedup_suffix_lcp, DEDUP_SUFFIX_LCP_SQL),
    "dedup_suffix_lcp_bucketed": (
        dedup_suffix_lcp_bucketed,
        DEDUP_SUFFIX_BUCKETED_SQL,
    ),
    "stream_suffix_incremental": (
        stream_suffix_incremental,
        STREAM_SUFFIX_INCREMENTAL_SQL,
    ),
    "maintenance_stream_index_compaction": (
        maintenance_stream_index_compaction,
        MAINTENANCE_STREAM_INDEX_COMPACTION_SQL,
    ),
    "maintenance_stream_index_compaction_fold": (
        maintenance_stream_index_compaction_fold,
        MAINTENANCE_STREAM_INDEX_FOLD_SQL,
    ),
}
