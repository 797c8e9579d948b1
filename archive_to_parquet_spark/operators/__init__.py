from archive_to_parquet_spark.operators.filters import (
    apply_include_filter,
    apply_size_filter,
)
from archive_to_parquet_spark.operators.dedup import (
    cap_hot_buckets,
    dedup_exact,
    dedup_exact_deterministic,
    embedding_near_duplicates,
    minhash_candidate_pairs,
    minhash_near_duplicates,
    minhash_near_duplicates_confirmed,
    ngram_jaccard_pairs,
    simhash_chunk_signatures,
    simhash_near_duplicates,
)
from archive_to_parquet_spark.operators.similarity import (
    brute_force_top_k,
    fixed_hyperplanes,
    hyperplane_bucket_literal,
    ivf_top_k_fixed_centroids,
    lsh_top_k,
)

__all__ = [
    "apply_include_filter",
    "apply_size_filter",
    "cap_hot_buckets",
    "dedup_exact",
    "dedup_exact_deterministic",
    "embedding_near_duplicates",
    "minhash_candidate_pairs",
    "minhash_near_duplicates",
    "minhash_near_duplicates_confirmed",
    "simhash_chunk_signatures",
    "simhash_near_duplicates",
    "ngram_jaccard_pairs",
    "brute_force_top_k",
    "fixed_hyperplanes",
    "hyperplane_bucket_literal",
    "ivf_top_k_fixed_centroids",
    "lsh_top_k",
]
