"""Catalog extension (round 3): dimensionality reduction, membership
sketches, count-min frequency estimation, and lateral top-k.

Same contract as ``queries.py``: each entry pairs an idiomatic-Spark
query with an ANSI-SQL oracle DuckDB runs over the same parquet views,
every computed column aliased identically on both sides.

- ``embedding_jl_projection`` — Johnson-Lindenstrauss random projection
  of the 64-d embeddings to 8 dims with an md5-derived LITERAL matrix
  (the ``fixed_hyperplanes`` determinism pattern): the scale path for
  ANN/clustering when the native dimension makes candidate generation
  too wide. Integer micro-unit dot products — exact in any engine.
- ``dedup_bloom_probe`` — Bloom-filter membership probe: a compact bit
  set built from one corpus half answers "possibly seen?" for the
  other half without rescanning the corpus — the O(bits) incremental
  dedup front-line (the exact/minhash index is the confirmatory tier).
  Deterministic md5 hash positions → DuckDB replays the filter
  bit-for-bit, false positives included.
- ``sketch_countmin`` — count-min sketch word frequencies (d×w counter
  matrix, estimate = min over rows) with the exact count as
  certificate: mergeable, fixed-size frequency estimation for corpus
  statistics at 100 TB.
- ``rel_lateral_topk`` — correlated LATERAL subquery with ORDER BY +
  LIMIT (top-3 customers per nation): exercises Catalyst's lateral
  decorrelation, a different physical path from the window top-k in
  ``rel_window_top3_per_cust``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from archive_to_parquet_spark.queries_ext import _t

# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (literal matrix, integer math)
# ---------------------------------------------------------------------------

_JL_IN_DIM = 64
_JL_OUT_DIM = 8


def _jl_matrix_e6(out_dim: int = _JL_OUT_DIM, in_dim: int = _JL_IN_DIM,
                  seed: int = 7) -> list[list[int]]:
    """Projection weights in integer micro-units, derived from md5 so
    any engine reproduces them: w[j][d] = first 60 bits of
    md5("jl{seed}_{j}_{d}") mapped to [-1e6, 1e6)."""
    return [
        [
            int(
                int(hashlib.md5(f"jl{seed}_{j}_{d}".encode()).hexdigest()[:15], 16)
                / float(1 << 59) * 1e6
            )
            - 1_000_000
            for d in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def embedding_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project the 64-d embeddings to 8 dims with a literal
    md5-derived JL matrix. Components and weights are converted to
    integer micro-units BEFORE the dot product (floor(x·1e6 + 0.5) —
    floor is exact in every engine, unlike round on exact halves), so
    the projected values are exact integers: order-independent,
    engine-independent.

    Scale: pure per-row column math over one scan — zero shuffle, the
    matrix is a plan literal (constant-folded). This is the standard
    pre-ANN width reducer: 8-d candidates, 64-d exact re-rank.
    """
    emb = _t(spark, sf_dir, "embeddings")
    w = _jl_matrix_e6()
    v_e6 = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1e6 + F.lit(0.5)).cast("long"),
    )
    cols = []
    for j in range(_JL_OUT_DIM):
        dot = F.aggregate(
            F.zip_with(
                v_e6,
                F.array(*[F.lit(int(wjd)) for wjd in w[j]]),
                lambda x, y: x * y,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        cols.append(dot.alias(f"p{j}"))
    return emb.select("vec_id", *cols)


def _jl_oracle_sql() -> str:
    w = _jl_matrix_e6()
    projs = ",\n       ".join(
        "("
        + " + ".join(
            f"CAST(floor(CAST(embedding[{d + 1}] AS DOUBLE) * 1000000 + 0.5) "
            f"AS BIGINT) * ({w[j][d]})"
            for d in range(_JL_IN_DIM)
        )
        + f") AS p{j}"
        for j in range(_JL_OUT_DIM)
    )
    return f"SELECT vec_id,\n       {projs}\nFROM embeddings"


EMBEDDING_JL_SQL = _jl_oracle_sql()


# ---------------------------------------------------------------------------
# Bloom-filter membership probe
# ---------------------------------------------------------------------------

_BLOOM_BITS = 65536
_BLOOM_K = 3


def dedup_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter dedup front-line — thin wrapper over
    ``operators.dedup.bloom_filter_bits`` / ``bloom_probe``: even
    doc_ids form the indexed corpus (k=3 md5-derived bits in an
    m=65536 filter), odd doc_ids probe it. ``exact_dup`` (a real
    left-semi against the corpus) is emitted next to ``bloom_hit``, so
    the result certifies the filter contract — no false negatives,
    false positives visible rather than hidden. m=65536/k=3 keeps the
    fill factor ~11% at sf0.1 (FP ≈ 0.1%); at larger corpora m grows
    with the indexed count to hold that rate.

    Scale: the filter is O(m) regardless of corpus size — built with
    one map-side-combinable distinct over bit positions and BROADCAST
    to the probe side; the probe never touches the corpus. This is the
    cheap first tier in front of the exact/minhash index
    (dedup_incremental) at 100 TB.
    """
    from archive_to_parquet_spark.operators.dedup import (
        bloom_filter_bits,
        bloom_probe,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    probes = docs.filter(F.col("doc_id") % 2 == 1)

    bits = bloom_filter_bits(
        corpus, "text", num_bits=_BLOOM_BITS, num_hashes=_BLOOM_K
    )
    hits = bloom_probe(
        probes, bits, "doc_id", "text", num_bits=_BLOOM_BITS, num_hashes=_BLOOM_K
    )
    exact = probes.join(
        corpus.select(F.col("text").alias("t")).distinct(),
        probes["text"] == F.col("t"),
        "left_semi",
    ).select("doc_id", F.lit(True).alias("exact_dup"))
    return hits.join(exact, "doc_id", "left").select(
        "doc_id",
        "bloom_hit",
        F.coalesce(F.col("exact_dup"), F.lit(False)).alias("exact_dup"),
    )


DEDUP_BLOOM_SQL = f"""
WITH pos AS (
  SELECT doc_id, doc_id % 2 = 0 AS is_corpus, text,
         (('0x' || substr(md5(text), 1, 8))::BIGINT) % {_BLOOM_BITS} AS pos0,
         (('0x' || substr(md5(text), 9, 8))::BIGINT) % {_BLOOM_BITS} AS pos1,
         (('0x' || substr(md5(text), 17, 8))::BIGINT) % {_BLOOM_BITS} AS pos2
  FROM documents
), bits AS (
  SELECT DISTINCT bit FROM (
    SELECT unnest([pos0, pos1, pos2]) AS bit FROM pos WHERE is_corpus
  )
), probe_bits AS (
  SELECT doc_id, unnest([pos0, pos1, pos2]) AS bit FROM pos WHERE NOT is_corpus
), hits AS (
  SELECT doc_id, COUNT(*) AS n_set
  FROM probe_bits JOIN bits USING (bit)
  GROUP BY doc_id
)
SELECT p.doc_id,
       COALESCE(h.n_set, 0) = {_BLOOM_K} AS bloom_hit,
       EXISTS (SELECT 1 FROM pos c WHERE c.is_corpus AND c.text = p.text)
           AS exact_dup
FROM pos p LEFT JOIN hits h ON h.doc_id = p.doc_id
WHERE NOT p.is_corpus
"""


# ---------------------------------------------------------------------------
# Count-min sketch word frequencies
# ---------------------------------------------------------------------------

_CM_ROWS = 3
_CM_WIDTH = 1024
_CM_MIN_EXACT = 50  # report words whose exact count clears this


def sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over document words: a d=3 × w=1024 counter
    matrix (counter[i][md5("cm{i}"+word) % w] += 1), point estimate =
    min over rows — always ≥ the true count, with collision overshoot
    bounded by the row width. Emitted next to the exact count for every
    word with exact n ≥ 50, certifying estimate ≥ exact and exposing
    real collision error instead of hiding it.

    Scale: the sketch is a fixed d×w integer grid built by one
    map-side-combinable groupBy — mergeable across shards/streams by
    addition, the standard fixed-memory frequency store at 100 TB. The
    per-word estimate lookup joins d counter rows per word (broadcast:
    the sketch is ≤ d·w rows by construction).
    """
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("word")
    )
    # one row per (sketch_row, bucket) occurrence
    rows = [
        words.select(
            F.lit(i).alias("cm_row"),
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"cm{i}"), F.col("word"))), 1, 8),
                    16,
                    10,
                ).cast("long")
                % _CM_WIDTH
            ).alias("bucket"),
        )
        for i in range(_CM_ROWS)
    ]
    occurrences = rows[0]
    for r in rows[1:]:
        occurrences = occurrences.unionByName(r)
    sketch = occurrences.groupBy("cm_row", "bucket").agg(
        F.count("*").alias("counter")
    )

    exact = (
        words.groupBy("word")
        .agg(F.count("*").alias("exact_n"))
        .filter(F.col("exact_n") >= _CM_MIN_EXACT)
    )
    lookups = exact.select(
        "word",
        "exact_n",
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"cm{i}"), F.col("word"))), 1, 8),
                    16,
                    10,
                ).cast("long")
                % _CM_WIDTH
            ).alias(f"b{i}")
            for i in range(_CM_ROWS)
        ],
    )
    est = lookups
    for i in range(_CM_ROWS):
        row_i = sketch.filter(F.col("cm_row") == i).select(
            F.col("bucket").alias(f"b{i}"), F.col("counter").alias(f"c{i}")
        )
        est = est.join(F.broadcast(row_i), f"b{i}")
    return est.select(
        "word",
        "exact_n",
        F.least(*[F.col(f"c{i}") for i in range(_CM_ROWS)]).alias("cm_estimate"),
    )


def _countmin_oracle_sql() -> str:
    pos = {
        i: f"(('0x' || substr(md5('cm{i}' || word), 1, 8))::BIGINT) % {_CM_WIDTH}"
        for i in range(_CM_ROWS)
    }
    unions = "\n  UNION ALL\n".join(
        f"  SELECT {i} AS cm_row, {pos[i]} AS bucket FROM words"
        for i in range(_CM_ROWS)
    )
    joins = "\n".join(
        f"JOIN sketch s{i} ON s{i}.cm_row = {i} AND s{i}.bucket = {pos[i]}"
        for i in range(_CM_ROWS)
    )
    least = ", ".join(f"s{i}.counter" for i in range(_CM_ROWS))
    return f"""
WITH words AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
  FROM documents
), occurrences AS (
{unions}
), sketch AS (
  SELECT cm_row, bucket, COUNT(*) AS counter
  FROM occurrences GROUP BY cm_row, bucket
), exact AS (
  SELECT word, COUNT(*) AS exact_n FROM words
  GROUP BY word HAVING COUNT(*) >= {_CM_MIN_EXACT}
)
SELECT word, exact_n, least({least}) AS cm_estimate
FROM exact
{joins}
"""


SKETCH_COUNTMIN_SQL = _countmin_oracle_sql()


# ---------------------------------------------------------------------------
# Correlated LATERAL top-k
# ---------------------------------------------------------------------------


def rel_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by account balance per nation via a correlated
    LATERAL subquery with ORDER BY + LIMIT — Catalyst decorrelates it
    into a broadcast join + per-key limit, a different physical path
    from the window-function top-k (rel_window_top3_per_cust).
    Deterministic tiebreak on customer name."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("_lat_nation")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM _lat_nation n, LATERAL (
          SELECT c_name, c_acctbal FROM _lat_customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 3
        ) t
        """
    )


REL_LATERAL_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 3
) t
"""


# ---------------------------------------------------------------------------
# Salted hot-key join
# ---------------------------------------------------------------------------


def rel_salted_hot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-skew join through ``operators.skew.salted_join``: events
    join a per-type weight table on ``event_type`` — a 5-value key
    where every key is ~20% of the fact side, the exact shape AQE's
    split can't fully fix (one key ≥ one partition no matter how it
    splits). The left side is salted ``xxhash64(row) % 64`` and the
    weight table replicated 64×, so the shuffle spreads each hot key
    over 64 partitions; semantics stay exactly the plain equi-join's,
    which is what the oracle certifies.

    Floats stay deterministic via the integer-micro-unit convention:
    per-type weight = integer div of summed micro-units, weighted
    product summed as integers (order-independent).
    """
    from archive_to_parquet_spark.operators.skew import salted_join

    from archive_to_parquet_spark.queries import _events

    ev = _events(spark, sf_dir).select(
        "event_type",
        F.floor(F.col("value").cast("double") * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("value_e6"),
    )
    weights = ev.groupBy("event_type").agg(
        F.expr("sum(value_e6) div count(*)").alias("weight_e6")
    )
    # shuffle_hash hint: the weight table is tiny, so without it Spark
    # broadcasts and there is no shuffle for salting to spread
    joined = salted_join(ev, weights.hint("shuffle_hash"), "event_type", num_salts=64)
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.first("weight_e6").alias("weight_e6"),
        F.sum(F.col("value_e6") * F.col("weight_e6")).alias("weighted_e12"),
    )


REL_SALTED_SQL = """
WITH ev AS (
  SELECT event_type,
         CAST(floor(CAST(value AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS value_e6
  FROM events
), w AS (
  SELECT event_type, SUM(value_e6) // COUNT(*) AS weight_e6
  FROM ev GROUP BY event_type
)
SELECT ev.event_type,
       COUNT(*) AS n_events,
       ANY_VALUE(w.weight_e6) AS weight_e6,
       SUM(ev.value_e6 * w.weight_e6) AS weighted_e12
FROM ev JOIN w USING (event_type)
GROUP BY ev.event_type
"""


CATALOG = {
    "embedding_jl_projection": (embedding_jl_projection, EMBEDDING_JL_SQL),
    "dedup_bloom_probe": (dedup_bloom_probe, DEDUP_BLOOM_SQL),
    "sketch_countmin": (sketch_countmin, SKETCH_COUNTMIN_SQL),
    "rel_lateral_topk": (rel_lateral_topk, REL_LATERAL_SQL),
    "rel_salted_hot_join": (rel_salted_hot_join, REL_SALTED_SQL),
}
