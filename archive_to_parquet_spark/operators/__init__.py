from archive_to_parquet_spark.operators.filters import (
    apply_include_filter,
    apply_size_filter,
)
from archive_to_parquet_spark.operators.dedup import (
    dedup_exact,
    dedup_exact_deterministic,
    embedding_near_duplicates,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from archive_to_parquet_spark.operators.similarity import (
    brute_force_top_k,
    lsh_top_k,
)

__all__ = [
    "apply_include_filter",
    "apply_size_filter",
    "dedup_exact",
    "dedup_exact_deterministic",
    "embedding_near_duplicates",
    "minhash_near_duplicates",
    "simhash_near_duplicates",
    "ngram_jaccard_pairs",
    "brute_force_top_k",
    "lsh_top_k",
]
