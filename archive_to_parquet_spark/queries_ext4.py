"""Catalog extension (round 9): evaluation, drift monitoring, data
retention, release compliance, and corpus-mixing entries.

Same contract as ``queries.py``: each entry pairs an idiomatic-Spark
query with an ANSI-SQL oracle DuckDB runs over the same parquet views,
every computed column aliased identically on both sides.  Every
expression here follows the version-invariance rules learned from the
r8 driver divergence — integer arithmetic (DIV/``//``) instead of
float-division+floor, explicit BIGINT casts wherever DuckDB would
promote SUM to HUGEINT, decimal(38,0)/HUGEINT second-moment
accumulation, no DuckDB lambda syntax, and doubles only in fixed
scalar expression trees over identical integers (rounded 6dp).  The
full checklist now lives in ``ORACLE_RULES.md`` at the repo root —
review every new or edited entry against it.

- ``eval_auc_quality`` — exact ROC-AUC (Mann-Whitney U with tie
  correction) of a document-length signal as a predictor of the
  English label, computed over a BOUNDED binned-score distribution:
  the corpus collapses to at most 4096 (bin, n_pos, n_neg) rows, so
  the one ordered accumulation runs over a bin table that is O(bins)
  regardless of corpus size — the same bounded-aggregate exception the
  catalog pins for ``sketch_hdr_quantiles``.
- ``eval_psi_drift`` — Population Stability Index between a reference
  and a current event snapshot (even/odd event_id), the standard
  production drift monitor: 10 fixed value bins, Laplace-smoothed
  proportions, PSI = Σ (p−q)·ln(p/q).  The bin table is generated as
  a 10-row literal on BOTH engines so zero-count bins contribute their
  smoothed term identically.
- ``maintenance_vacuum_plan`` — Delta VACUUM / Iceberg
  expire-snapshots planning over a file manifest: per logical
  partition, keep the newest RETAIN versions, report how many files
  and bytes a vacuum reclaims — metadata-only, like
  ``maintenance_compaction_plan``; no data byte is read to decide.
- ``privacy_l_diversity`` — l-diversity audit (Machanavajjhala et al.,
  ICDE 2006) complementing ``privacy_k_anonymity``: every
  quasi-identifier class must carry ≥ l distinct sensitive values,
  else it is marked for suppression.
- ``mix_temperature_sampling`` — temperature-scaled multilingual
  sampling weights (T=2 ⇔ exponent 1/2, the multilingual-LM recipe of
  Lample & Conneau 2019): q_l ∝ sqrt(n_l).  sqrt is IEEE-754
  correctly rounded, so unlike pow(x, 0.3) the weights are
  bit-identical across engines before the 6dp rounding.
- ``stream_psi_drift`` — the PSI monitor under continuous arrival:
  per-micro-batch ≤10-row algebraic per-bin partials, batch_id-keyed
  idempotent state writes, report = merge of partials == the batch
  entry's whole-table computation (same oracle SQL verbatim).
- ``eval_mrr_bm25`` — MRR@10 of the BM25 retriever under the same
  deterministic relevance rule as ``eval_ndcg_bm25``; reciprocals
  1/k (k ≤ 10) cannot land on a 6dp rounding tie.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from archive_to_parquet_spark.queries_ext import _t

# ---------------------------------------------------------------------------
# Exact ROC-AUC over a bounded binned-score distribution
# ---------------------------------------------------------------------------

_AUC_BIN_DIV = 8  # score bin width (n_chars DIV 8)
_AUC_BIN_CAP = 4095  # bins clamp here — the bin table is O(1), not O(rows)


def eval_auc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of document length as a predictor of the English
    label — the ranking-quality readout every classifier-based quality
    filter (fastText quality scores, GPT-judge scores) is evaluated
    with before it gates a corpus.

    Exact tie-corrected Mann-Whitney form: with per-distinct-score
    positive/negative counts (np_s, nn_s) and cum_nn(s) = negatives
    strictly below s,  AUC = Σ_s np_s·(cum_nn(s) + nn_s/2) / (P·N).
    Everything is integer until the final division: the numerator is
    accumulated ×2 (``np·(2·cum_nn + nn)``) in decimal(38,0) (HUGEINT
    in DuckDB), so there is no float summation order anywhere and no
    int64 wrap at any corpus size.

    Scale shape: one map-side-combinable groupBy collapses the corpus
    to ≤ 4096 (bin, np, nn) rows; the single ordered accumulation
    (the one global window) runs over that BOUNDED table — the same
    enumerated exception the plan pins grant ``sketch_hdr_quantiles``.
    At 100 TB the bin table is still ≤ 4096 rows on one executor.
    (Plain literal docstring on purpose: ``\"\"\"...\"\"\".format()`` is
    an expression, not a docstring — gen_catalog.py reads __doc__.)
    """
    docs = _t(spark, sf_dir, "documents")
    binned = docs.select(
        F.least(
            F.expr(f"n_chars DIV {_AUC_BIN_DIV}"), F.lit(_AUC_BIN_CAP)
        ).alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    per_bin = binned.groupBy("s").agg(
        F.sum("pos").alias("np"),
        F.sum(1 - F.col("pos")).alias("nn"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    acc = per_bin.withColumn(
        "cum_nn", F.coalesce(F.sum("nn").over(w), F.lit(0))
    )
    num2 = F.sum(
        (F.col("np").cast("decimal(19,0)"))
        * (2 * F.col("cum_nn") + F.col("nn"))
    )
    return acc.agg(
        F.sum("np").cast("bigint").alias("n_pos"),
        F.sum("nn").cast("bigint").alias("n_neg"),
        F.count("*").cast("bigint").alias("n_bins"),
        F.round(
            num2.cast("double")
            / (
                2.0
                * F.sum("np").cast("double")
                * F.sum("nn").cast("double")
            ),
            6,
        ).alias("auc"),
    )


EVAL_AUC_SQL = f"""
WITH binned AS (
  SELECT least(n_chars // {_AUC_BIN_DIV}, {_AUC_BIN_CAP}) AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
per_bin AS (
  SELECT s, CAST(SUM(pos) AS BIGINT) AS np,
         CAST(SUM(1 - pos) AS BIGINT) AS nn
  FROM binned GROUP BY s
),
acc AS (
  SELECT s, np, nn,
         CAST(COALESCE(SUM(nn) OVER (
             ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING), 0) AS BIGINT) AS cum_nn
  FROM per_bin
)
SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
       CAST(SUM(nn) AS BIGINT) AS n_neg,
       COUNT(*) AS n_bins,
       round(CAST(SUM(CAST(np AS HUGEINT) * (2 * cum_nn + nn)) AS DOUBLE)
             / (2.0 * CAST(SUM(np) AS DOUBLE) * CAST(SUM(nn) AS DOUBLE)),
             6) AS auc
FROM acc
"""


# ---------------------------------------------------------------------------
# Population Stability Index drift monitor
# ---------------------------------------------------------------------------

_PSI_BINS = 10
_PSI_WIDTH = 30.0  # value bins: [0,30), [30,60), ... clamped to [0,9]


def _psi_binned(events: DataFrame) -> DataFrame:
    """(is_ref, bin) per event — the shared binning step of the batch
    and streaming PSI monitors (even/odd event_id snapshots, 10 fixed
    value bins clamped to [0, 9])."""
    return events.filter(F.col("value").isNotNull()).select(
        (F.col("event_id") % 2 == 0).alias("is_ref"),
        F.least(
            F.greatest(
                F.floor(F.col("value") / _PSI_WIDTH).cast("int"), F.lit(0)
            ),
            F.lit(_PSI_BINS - 1),
        ).alias("bin"),
    )


def psi_bin_counts(events: DataFrame) -> DataFrame:
    """≤10-row (bin, ref_n, cur_n) counts — the ALGEBRAIC partial both
    PSI monitors fold to (mergeable by summation, so micro-batch
    partials sum to exactly this)."""
    sided = _psi_binned(events)
    return sided.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("ref_n"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("cur_n"),
    )


def psi_report_from_counts(
    spark: SparkSession, counts: DataFrame
) -> DataFrame:
    """PSI report from materialized (bin, ref_n, cur_n) counts — the
    shared tail of ``eval_psi_drift`` and ``stream_psi_drift``: literal
    10-bin axis (empty bins contribute their smoothed term identically
    in every engine), Laplace smoothing, per-bin 6dp terms, total."""
    axis = spark.range(_PSI_BINS).select(F.col("id").cast("int").alias("bin"))
    totals = counts.agg(
        F.sum("ref_n").alias("ref_tot"), F.sum("cur_n").alias("cur_tot")
    )
    full = (
        axis.join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("ref_n", F.lit(0)).cast("bigint").alias("ref_n"),
            F.coalesce("cur_n", F.lit(0)).cast("bigint").alias("cur_n"),
        )
        .crossJoin(F.broadcast(totals))  # 1-row scalar fold
    )
    p = (F.col("ref_n") + 1).cast("double") / (
        F.col("ref_tot") + _PSI_BINS
    ).cast("double")
    q = (F.col("cur_n") + 1).cast("double") / (
        F.col("cur_tot") + _PSI_BINS
    ).cast("double")
    detail = full.select(
        "bin",
        "ref_n",
        "cur_n",
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    ).localCheckpoint()  # 10 rows; total fold + final output reuse it
    total = detail.agg(F.round(F.sum("psi_term"), 6).alias("psi_total"))
    return detail.crossJoin(F.broadcast(total)).select(
        "bin", "ref_n", "cur_n", "psi_term", "psi_total"
    )


def eval_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between a reference and a current
    event snapshot — THE production drift monitor for any scored
    pipeline (credit, ranking, data-quality gates): bin the metric,
    compare the two distributions, alert when PSI > 0.2.  Snapshots
    are the even/odd ``event_id`` halves (deterministic stand-in for
    yesterday/today); the metric is ``value`` in 10 fixed-width bins.

    Laplace smoothing (+1 per bin) keeps every term finite; the bin
    axis is a 10-row LITERAL on both engines, so a bin empty in both
    snapshots still contributes its (identical) smoothed term instead
    of silently vanishing from one engine's group-by.

    Scale shape: one conditional aggregation collapses the corpus to
    ≤ 2·10 (side, bin) counts; everything after is scalar arithmetic
    on a 10-row frame.  The per-bin term is rounded 6dp before the
    10-term total so the final sum starts from identical doubles.

    On ln() and cross-engine exactness: ln is ≤1-ulp accurate but not
    IEEE-correctly-rounded, so in principle a term could straddle a
    6dp rounding boundary by one ulp (~2e-19 relative) and flip on one
    engine.  This residual risk is shared with the long-driver-
    certified ln-based family (search_bm25's IDF, text_lm_perplexity,
    lm_bigram_score) and is ~12 orders of magnitude below the 5e-7
    rounding threshold — unlike pow(x, 0.3), whose larger libm spread
    the mixing entry avoids by design.
    """
    events = _t(spark, sf_dir, "events")
    # one pass over the events collapses to ≤10 (bin, ref_n, cur_n)
    # rows, materialized once: counts feeds the axis join, the totals
    # (derived from counts, NOT from a second corpus pass) and the
    # final PSI fold
    counts = psi_bin_counts(events).localCheckpoint()
    return psi_report_from_counts(spark, counts)


EVAL_PSI_SQL = f"""
WITH sided AS (
  SELECT event_id % 2 = 0 AS is_ref,
         least(greatest(CAST(floor(value / {_PSI_WIDTH}) AS INT), 0),
               {_PSI_BINS - 1}) AS bin
  FROM events WHERE value IS NOT NULL
),
counts AS (
  SELECT bin,
         CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS ref_n,
         CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cur_n
  FROM sided GROUP BY bin
),
axis AS (
  SELECT CAST(g.b AS INT) AS bin
  FROM generate_series(0, {_PSI_BINS - 1}) AS g(b)
),
totals AS (
  SELECT CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS ref_tot,
         CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cur_tot
  FROM sided
),
detail AS (
  SELECT a.bin,
         COALESCE(c.ref_n, 0) AS ref_n,
         COALESCE(c.cur_n, 0) AS cur_n,
         round((CAST(COALESCE(c.ref_n, 0) + 1 AS DOUBLE)
                  / CAST(t.ref_tot + {_PSI_BINS} AS DOUBLE)
                - CAST(COALESCE(c.cur_n, 0) + 1 AS DOUBLE)
                  / CAST(t.cur_tot + {_PSI_BINS} AS DOUBLE))
               * ln((CAST(COALESCE(c.ref_n, 0) + 1 AS DOUBLE)
                      / CAST(t.ref_tot + {_PSI_BINS} AS DOUBLE))
                    / (CAST(COALESCE(c.cur_n, 0) + 1 AS DOUBLE)
                       / CAST(t.cur_tot + {_PSI_BINS} AS DOUBLE))),
               6) AS psi_term
  FROM axis a LEFT JOIN counts c ON a.bin = c.bin CROSS JOIN totals t
)
SELECT bin, ref_n, cur_n, psi_term,
       (SELECT round(SUM(psi_term), 6) FROM detail) AS psi_total
FROM detail
"""


# ---------------------------------------------------------------------------
# Retention vacuum planning (Delta VACUUM / Iceberg expire-snapshots)
# ---------------------------------------------------------------------------

_VACUUM_RETAIN = 2  # newest versions kept per logical partition
_VACUUM_OVERHEAD = 512  # per-file format overhead (matches compaction twin)


def maintenance_vacuum_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-vacuum PLANNING — the metadata half of Delta ``VACUUM``
    / Iceberg ``expire_snapshots`` and the other shoe of
    ``maintenance_compaction_plan``: given a file manifest (one file
    per document, versions of a logical partition keyed by
    (source, lang), version order = doc_id), keep the newest
    ``RETAIN`` versions per partition and report, per partition, how
    many files and bytes a vacuum reclaims and the oldest version that
    survives.

    Scale shape: one shuffle on the partition key feeds a per-partition
    row_number ranking (no global window), then a same-key aggregation
    that moves one row per PARTITION.  Like the compaction twin, the
    decision runs on the MANIFEST only — a 100-TB table's vacuum plan
    is a metadata query; no data byte is read to decide deletion.
    """
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy(F.col("doc_id").desc())
    ranked = docs.select(
        "source",
        "lang",
        "doc_id",
        (F.col("n_chars") + _VACUUM_OVERHEAD).alias("file_bytes"),
    ).withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("source", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum(F.when(F.col("rn") > _VACUUM_RETAIN, 1).otherwise(0))
            .cast("bigint")
            .alias("n_deletable"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("rn") > _VACUUM_RETAIN, F.col("file_bytes")
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("bytes_reclaimed"),
            F.min(
                F.when(F.col("rn") <= _VACUUM_RETAIN, F.col("doc_id"))
            ).alias("oldest_retained"),
        )
    )


MAINTENANCE_VACUUM_SQL = f"""
WITH ranked AS (
  SELECT source, lang, doc_id, n_chars + {_VACUUM_OVERHEAD} AS file_bytes,
         ROW_NUMBER() OVER (PARTITION BY source, lang
                            ORDER BY doc_id DESC) AS rn
  FROM documents
)
SELECT source, lang,
       COUNT(*) AS n_files,
       CAST(SUM(CASE WHEN rn > {_VACUUM_RETAIN} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_deletable,
       CAST(COALESCE(SUM(CASE WHEN rn > {_VACUUM_RETAIN}
                              THEN file_bytes END), 0) AS BIGINT)
         AS bytes_reclaimed,
       MIN(CASE WHEN rn <= {_VACUUM_RETAIN} THEN doc_id END)
         AS oldest_retained
FROM ranked
GROUP BY source, lang
"""


# ---------------------------------------------------------------------------
# l-diversity release audit
# ---------------------------------------------------------------------------

_LDIV_L = 3  # required distinct sensitive values per QI class
_LDIV_SENS_DIV = 100  # sensitive attribute: content-size band


def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., ICDE 2006) over the
    same quasi-identifier pair as ``privacy_k_anonymity`` (lang,
    source): a class is releasable only if its SENSITIVE attribute
    (content-size band, ``n_chars DIV 100``) takes ≥ l = 3 distinct
    values — k-anonymity alone cannot stop a homogeneity attack where
    every member of a class shares the sensitive value.

    Scale shape: one groupBy on the QI tuple with an exact
    COUNT(DISTINCT) — Spark plans this as the standard two-phase
    expand/re-agg, map-side combinable; the class table is orders of
    magnitude smaller than the corpus, same as the k-anonymity twin.
    """
    docs = _t(spark, sf_dir, "documents")
    classes = docs.groupBy("lang", "source").agg(
        F.count("*").cast("bigint").alias("class_size"),
        F.countDistinct(F.expr(f"n_chars DIV {_LDIV_SENS_DIV}"))
        .cast("bigint")
        .alias("n_sensitive"),
    )
    return classes.select(
        "lang",
        "source",
        "class_size",
        "n_sensitive",
        F.when(F.col("n_sensitive") >= _LDIV_L, "release")
        .otherwise("suppress")
        .alias("status"),
    )


PRIVACY_L_DIVERSITY_SQL = f"""
SELECT lang, source,
       COUNT(*) AS class_size,
       CAST(COUNT(DISTINCT n_chars // {_LDIV_SENS_DIV}) AS BIGINT)
         AS n_sensitive,
       CASE WHEN COUNT(DISTINCT n_chars // {_LDIV_SENS_DIV}) >= {_LDIV_L}
            THEN 'release' ELSE 'suppress' END AS status
FROM documents
GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# Temperature-scaled corpus mixing weights
# ---------------------------------------------------------------------------

_MIX_BUDGET = 100_000  # sampled documents per training epoch


def mix_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multilingual sampling weights — the
    low-resource-upsampling recipe of multilingual LM training
    (Lample & Conneau 2019; mT5's α): with temperature T = 2
    (exponent 1/2), q_l ∝ n_l^(1/2), so small languages are sampled
    more than their corpus share and ``effective_epochs`` shows how
    often each language's data repeats within the budget.

    Exactness path: the exponent-1/2 weight is ``sqrt(n_l)`` —
    IEEE-754 sqrt is correctly rounded, so unlike ``pow(x, 0.3)``
    (libm-dependent) the weights are bit-identical across engines.
    Weights are rounded 6dp BEFORE the cross-language sum (the Neyman
    precedent: the 5-term double fold starts from identical values).

    Scale shape: one map-side-combinable count per language, then two
    1-row broadcast scalar folds — at 100 TB this is a single reduce
    of one integer per language.
    """
    docs = _t(spark, sf_dir, "documents")
    # one count per language, materialized once: counts feeds the
    # total fold, the weight column AND the final projection — without
    # the eager checkpoint the corpus aggregation re-executes per
    # consumer (measured 6 pinned shuffles instead of 3)
    counts = docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    ).localCheckpoint()
    tot = counts.agg(F.sum("n_docs").cast("bigint").alias("n_total"))
    weighted = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_total",
        F.round(F.sqrt(F.col("n_docs").cast("double")), 6).alias("w"),
    )
    wsum = weighted.agg(F.sum("w").alias("w_sum"))
    return weighted.crossJoin(F.broadcast(wsum)).select(
        "lang",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.col("n_total").cast("double"),
            6,
        ).alias("p_natural"),
        F.round(F.col("w") / F.col("w_sum"), 6).alias("q_sampling"),
        F.round(
            F.col("w")
            / F.col("w_sum")
            * F.lit(float(_MIX_BUDGET))
            / F.col("n_docs").cast("double"),
            6,
        ).alias("effective_epochs"),
    )


MIX_TEMPERATURE_SQL = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
),
weighted AS (
  SELECT lang, n_docs,
         (SELECT CAST(SUM(n_docs) AS BIGINT) FROM counts) AS n_total,
         round(sqrt(CAST(n_docs AS DOUBLE)), 6) AS w
  FROM counts
)
SELECT lang, n_docs,
       round(CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
         AS p_natural,
       round(w / (SELECT SUM(w) FROM weighted), 6) AS q_sampling,
       round(w / (SELECT SUM(w) FROM weighted) * {_MIX_BUDGET}.0
             / CAST(n_docs AS DOUBLE), 6) AS effective_epochs
FROM weighted
"""


# ---------------------------------------------------------------------------
# PSI drift monitor under continuous arrival
# ---------------------------------------------------------------------------


def stream_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PSI drift monitor under CONTINUOUS arrival — events stream
    in 4 micro-batches (event_id % 4 slices, one file per trigger) and
    foreachBatch folds each batch to a ≤10-row ALGEBRAIC per-bin
    partial written to a batch_id-keyed state path; the report merges
    partials by summation and computes the IDENTICAL PSI the batch
    entry emits, so the oracle is ``eval_psi_drift``'s whole-table SQL
    verbatim and the driver row certifies merge(partials) ==
    one-pass(all).  A replayed micro-batch OVERWRITES its own partial
    (idempotence by layout — the ``stream_constraint_monitor``
    precedent).  Production shape: the monitor never rescans arrived
    data; state grows ≤10 rows per micro-batch regardless of batch
    size.

    Scale shape: per batch one map-side-combinable fold to ≤10 rows;
    the report aggregates batch_count·10 rows — a drift dashboard over
    a 100-TB/day stream costs a 10-integer fold per trigger."""
    import glob
    import shutil
    import tempfile

    from archive_to_parquet_spark.streaming.quality import (
        psi_monitor_stream,
        psi_report,
    )

    # ts is unused but its parquet layout varies (see queries._events);
    # the legacy conf makes the raw read safe under both layouts
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = _t(spark, sf_dir, "events").select("event_id", "value")
    root = tempfile.mkdtemp(prefix="stream_psi_")
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
        q = psi_monitor_stream(
            stream,
            os.path.join(root, "state"),
            os.path.join(root, "ckpt"),
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()
        n_batches = len(glob.glob(os.path.join(root, "state", "batch=*")))
        if n_batches != 4:
            raise RuntimeError(
                f"expected 4 micro-batch partials, found {n_batches}"
            )
        return psi_report(
            spark, os.path.join(root, "state")
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Mean Reciprocal Rank of the BM25 retriever
# ---------------------------------------------------------------------------


def eval_mrr_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 of the BM25 retriever — the other standard retrieval
    readout next to ``eval_ndcg_bm25``: per query, the reciprocal of
    the FIRST relevant rank in the top-10 (0.0 when none), under the
    same deterministic relevance rule (a document is relevant iff it
    contains EVERY query term).  Reciprocals 1/k for k ≤ 10 never land
    on a 6dp rounding tie, so the rounded value is engine-identical.

    Scale shape: rankings come from ``search_bm25``'s staged inverted
    index (one corpus tokenize, materialized on doc_id); relevance is
    one corpus scan against the broadcast term list; the readout joins
    a 30-row ranking with the relevance set and folds to one row per
    query."""
    from archive_to_parquet_spark.queries import (
        _BM25_QUERIES,
        _bm25_relevance,
        search_bm25,
    )

    docs = _t(spark, sf_dir, "documents")
    ranked = search_bm25(spark, sf_dir)
    # one narrow projection against the literal query list (r11, guide
    # §2.3/§3.3: replaces a docs×terms BNLJ + per-pair re-aggregation)
    rel = _bm25_relevance(docs)
    first_rel = (
        ranked.join(rel, ["query_id", "doc_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.min("rank").alias("first_rel_rank"))
    )
    qids = spark.createDataFrame(
        [(qid,) for qid, _ in _BM25_QUERIES], "query_id string"
    )
    return qids.join(first_rel, "query_id", "left").select(
        "query_id",
        F.coalesce("first_rel_rank", F.lit(0))
        .cast("int")
        .alias("first_rel_rank"),
        F.when(F.col("first_rel_rank").isNull(), F.lit(0.0))
        .otherwise(F.round(1.0 / F.col("first_rel_rank"), 6))
        .alias("rr"),
    )


def _mrr_oracle_sql() -> str:
    from archive_to_parquet_spark.queries import (
        _BM25_QUERIES,
        SEARCH_BM25_SQL,
    )

    terms = ", ".join(
        "('{qid}', '{t}', {n})".format(qid=qid, t=t, n=len(ts))
        for qid, ts in _BM25_QUERIES
        for t in ts
    )
    qids = ", ".join("('{qid}')".format(qid=qid) for qid, _ in _BM25_QUERIES)
    return f"""
WITH ranked AS ({SEARCH_BM25_SQL}),
q(query_id, term, n_terms) AS (VALUES {terms}),
qids(query_id) AS (VALUES {qids}),
rel AS (
  SELECT q.query_id, d.doc_id
  FROM documents d CROSS JOIN q
  WHERE contains(lower(d.text), q.term)
  GROUP BY q.query_id, d.doc_id, q.n_terms
  HAVING COUNT(*) = q.n_terms
),
first_rel AS (
  SELECT r.query_id, MIN(r.rank) AS first_rel_rank
  FROM ranked r JOIN rel USING (query_id, doc_id)
  GROUP BY r.query_id
)
SELECT qids.query_id,
       CAST(COALESCE(f.first_rel_rank, 0) AS INT) AS first_rel_rank,
       CASE WHEN f.first_rel_rank IS NULL THEN 0.0
            ELSE round(1.0 / f.first_rel_rank, 6) END AS rr
FROM qids LEFT JOIN first_rel f USING (query_id)
"""


# eval_mrr_bm25's oracle composes SEARCH_BM25_SQL from queries.py —
# building it at module level would be a circular import when this
# module is imported first (the eval_ndcg_bm25 precedent); queries.py
# patches the oracle in after merging this CATALOG.
CATALOG = {
    "eval_auc_quality": (eval_auc_quality, EVAL_AUC_SQL),
    "eval_psi_drift": (eval_psi_drift, EVAL_PSI_SQL),
    "stream_psi_drift": (stream_psi_drift, EVAL_PSI_SQL),
    "eval_mrr_bm25": (eval_mrr_bm25, None),
    "maintenance_vacuum_plan": (
        maintenance_vacuum_plan,
        MAINTENANCE_VACUUM_SQL,
    ),
    "privacy_l_diversity": (privacy_l_diversity, PRIVACY_L_DIVERSITY_SQL),
    "mix_temperature_sampling": (
        mix_temperature_sampling,
        MIX_TEMPERATURE_SQL,
    ),
}
