from duckdb_cluster_hash_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    dedup_representatives,
    word_ngrams,
    shingle_table,
    ngram_jaccard_pairs,
    minhash_signatures,
    lsh_candidate_pairs,
    minhash_neardup_pairs,
    simhash64,
    simhash_neardup_pairs,
)
from duckdb_cluster_hash_spark.operators.distribution import (  # noqa: F401
    analyze_distribution,
    hot_slots,
    repartition_by_slot,
    write_partitioned_by_node,
)
