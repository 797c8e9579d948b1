"""Deduplication operators (D1 + training-data near-dup family).

Exact dedup is the reference's only aggregation-class operator
(``--unique``, reference src/sink.rs:75-103): a global distinct-by-hash
where the surviving duplicate is nondeterministic (first arrival wins
across racing producers). ``dropDuplicates(["hash"])`` has exactly that
contract in Spark — deterministic *set* of hashes, nondeterministic
winner — and scales as a hash-based shuffle agg with map-side partial
dedup, not the reference's O(rows²) per-batch mask.

Near-dup operators (MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine) are the standard large-corpus family; all are shuffle-on-bucket
designs: candidate generation never compares all pairs, only rows that
collide in a band/bucket, so cost scales with collisions rather than n².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from archive_to_parquet_spark.functions.text import simhash64


def dedup_exact(df: DataFrame, key: str = "hash") -> DataFrame:
    """D1: global distinct-by-hash, nondeterministic winner
    (reference src/sink.rs:75-103)."""
    return df.dropDuplicates([key])


def dedup_exact_deterministic(
    df: DataFrame, key: str = "hash", order_cols: tuple[str, ...] = ("source", "path")
) -> DataFrame:
    """Deterministic-winner variant: smallest (order_cols) row survives.
    One shuffle on `key`; AQE handles skewed hot hashes."""
    w = Window.partitionBy(key).orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# -- shingling ----------------------------------------------------------------


def shingles_col(text_col: str, n: int = 3):
    """Word n-gram shingle array — see functions.text.word_ngrams_col for
    the per-row-evaluation rationale."""
    from archive_to_parquet_spark.functions.text import word_ngrams_col

    return word_ngrams_col(text_col, n)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash signatures via explode → groupBy(id) with ``num_hashes``
    ``min(xxhash64(shingle, i))`` aggregates.

    Why not a single array expression per row: Catalyst's CollapseProject
    inlines a shingle-array expression into every one of the N min-hash
    evaluations (and again into each LSH band hash), recomputing the
    split/slice chain N× per row. The explode+agg form computes shingles
    once, gets map-side partial mins (tiny shuffle: one row per (id,
    partial)), and each ``mh_i`` is a concrete attribute afterwards.
    Returns (id, mh_0..mh_{n-1}, n_shingles)."""
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles_col(text_col, shingle_n))).alias("g"),
    )
    aggs = [
        F.min(F.xxhash64("g", F.lit(seed + i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy("id").agg(*aggs, F.count("*").alias("n_shingles"))


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs.

    shingle → minhash signature → band (rows = num_hashes/bands) → bucket
    join on (band_idx, band_hash) → estimate Jaccard from full signatures
    → filter by threshold. Returns (id_a, id_b, est_jaccard) with
    id_a < id_b, deduplicated across bands.

    Scale: the only join is the self-equi-join on band buckets — a shuffle
    on the band hash; genuinely similar docs collide, others don't. At
    100 TB, band-hash buckets are the unit of work; skewed buckets (e.g.
    empty docs) are bounded by dropping buckets above a size cap upstream.
    """
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    rows_per_band = num_hashes // bands

    mh_cols = [f"mh_{i}" for i in range(num_hashes)]
    sig = minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_n
    ).withColumn("sig", F.array(*mh_cols))

    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.xxhash64(
                            *[
                                F.col(mh_cols[b * rows_per_band + r])
                                for r in range(rows_per_band)
                            ]
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "sig", "band.band_idx", "band.band_hash")

    left = banded.alias("a")
    right = banded.alias("b")
    pairs = (
        left.join(
            right,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        .cast("double")
        / F.lit(float(num_hashes))
    )
    return (
        pairs.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    num_tables: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit simhash, split into ``num_tables``
    16-bit chunks; by pigeonhole, any pair within ``max_hamming <
    num_tables`` bits collides on at least one chunk. Bucket-join per
    chunk, then exact Hamming check via bit_count(xor)."""
    sig = df.select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sim")
    )
    chunk_bits = 64 // num_tables
    chunked = sig.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        F.shiftrightunsigned(F.col("sim"), t * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("chunk"),
                    )
                    for t in range(num_tables)
                ]
            )
        ).alias("c"),
    ).select("id", "sim", "c.tbl", "c.chunk")

    a, b = chunked.alias("a"), chunked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard pairs ≥ threshold, with AllPairs-style prefix
    filtering for candidate generation.

    A naive inverted index (join every doc pair sharing ANY shingle)
    explodes on hot shingles. Prefix filtering is exact-preserving: rank
    each doc's shingles by global rarity (document frequency, then
    shingle — a total order); if J(a,b) ≥ t then the overlap O ≥
    t·max(|a|,|b|), so the (|x| − ⌈t·|x|⌉ + 1)-length rare-prefixes of a
    and b must intersect. Candidates therefore join only on prefix
    shingles — the rarest ones, with the fewest collisions — and the
    exact score is computed per candidate with array_intersect. Shuffle
    keys: shingle (freq + candidate joins), id (rank window, score
    joins); no all-pairs stage anywhere, so the plan scales with
    candidate count, not n².
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles_col(text_col, shingle_n)).alias("sh"),
    )
    exploded = sh.select("id", F.size("sh").alias("n_sh"), F.explode("sh").alias("g"))
    freq = exploded.groupBy("g").agg(F.count("*").alias("df_g"))
    w = Window.partitionBy("id").orderBy("df_g", "g")
    prefix = (
        exploded.join(freq, "g")
        .withColumn("rank", F.row_number().over(w))
        .filter(
            F.col("rank") <= F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
        )
        .select("id", "n_sh", "rank", "g")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    # Two exact-preserving prunes on the candidate join (ppjoin family):
    # - length filter: J ≥ t ⇒ min(|a|,|b|)/max(|a|,|b|) ≥ t;
    # - positional filter: for the FIRST common token (positions pa, pb in
    #   the shared rarity order) the remaining-suffix bound
    #   1 + min(|a|−pa, |b|−pb) ≥ O must hold when the true overlap is O,
    #   and J ≥ t ⇒ O ≥ ⌈t/(1+t)·(|a|+|b|)⌉ — prune matches below it.
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("a.n_sh") + F.col("b.n_sh"))
    )
    ubound = 1 + F.least(
        F.col("a.n_sh") - F.col("a.rank"), F.col("b.n_sh") - F.col("b.rank")
    )
    candidates = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("b.n_sh") >= F.lit(threshold) * F.col("a.n_sh"))
            & (F.col("a.n_sh") >= F.lit(threshold) * F.col("b.n_sh")),
        )
        .filter(ubound >= alpha)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    shared = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            shared.cast("double") / (F.size("sh_a") + F.size("sh_b") - shared),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over a pair/edge list → (id, component)
    where component is the minimum id reachable from the node.

    Iterative min-label propagation: each round every node adopts the
    smallest label among itself and its neighbors; converges in
    O(component diameter) rounds — near-dup clusters are shallow (stars
    around a few hubs), so a handful of rounds suffices. Each round is
    one join + one agg, both shuffling on node id; lineage is truncated
    with localCheckpoint so the plan doesn't grow per iteration. For
    galaxy-scale graphs swap in alternating large-star/small-star — the
    driver loop is the same shape.

    Raises RuntimeError if not converged within max_iterations.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (
                    F.coalesce(F.col("nbr_min"), F.col("component"))
                    < F.col("component")
                ).alias("changed"),
            )
            .localCheckpoint()
        )
        n_changed = updated.filter(F.col("changed")).count()
        labels = updated.drop("changed")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )


def near_duplicate_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.7,
    **minhash_kwargs,
) -> DataFrame:
    """End-to-end near-dup clustering: MinHash+LSH candidate pairs →
    connected components → (id, component, is_representative) where the
    representative is the min id per cluster. Singletons (no near-dup)
    are their own representative."""
    pairs = minhash_near_duplicates(
        df, id_col, text_col, jaccard_threshold=jaccard_threshold, **minhash_kwargs
    )
    comp = connected_components(pairs)
    ids = df.select(F.col(id_col).alias("id"))
    labeled = ids.join(comp, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )
    return labeled.withColumn(
        "is_representative",
        F.col("id")
        == F.min("id").over(Window.partitionBy("component")),
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via random-hyperplane LSH.

    Sign-of-dot-product against ``num_planes`` fixed pseudo-random
    hyperplanes → bucket byte → candidate pairs within a bucket → exact
    cosine filter. Deterministic planes derived from xxhash64(seed,i,dim)
    so no driver-side randomness ships to executors.
    """
    from archive_to_parquet_spark.functions.vectors import (
        cosine_from_norms,
        l2_norm_col,
    )
    from archive_to_parquet_spark.operators.similarity import hyperplane_bucket_col

    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm_col(vec_col).alias("norm"),
        hyperplane_bucket_col(vec_col, num_planes, seed).alias("bucket"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_from_norms(
                F.col("a.v"), F.col("b.v"), F.col("a.norm"), F.col("b.norm")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
