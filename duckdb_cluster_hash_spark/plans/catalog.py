"""Named query catalog — registration order and the driver grading window.

The query definitions live in per-family modules (cluster, tpch,
events, docs, dedup_text, streaming, lake, emb); importing them here
registers every query into the shared QUERIES/ORACLES registries
(plans/_registry.py).  This module then rotates registration order so
the driver's 50-query grading window samples the catalog fairly.
"""

from __future__ import annotations

from duckdb_cluster_hash_spark.plans._registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    _money_sum,
    _t,
    query,
)

# importing a family module registers its queries (original wave order)
from duckdb_cluster_hash_spark.plans import cluster as _cluster  # noqa: F401,E402
from duckdb_cluster_hash_spark.plans import tpch as _tpch  # noqa: F401,E402
from duckdb_cluster_hash_spark.plans import relational as _relational  # noqa: F401,E402
from duckdb_cluster_hash_spark.plans import events as _events  # noqa: F401,E402
from duckdb_cluster_hash_spark.plans import events_ops as _events_ops  # noqa: F401,E402
from duckdb_cluster_hash_spark.plans import docs as _docs  # noqa: F401,E402
from duckdb_cluster_hash_spark.plans import dedup_text as _dedup_text  # noqa: F401,E402
from duckdb_cluster_hash_spark.plans import streaming as _streaming  # noqa: F401,E402
from duckdb_cluster_hash_spark.plans import lake as _lake  # noqa: F401,E402
from duckdb_cluster_hash_spark.plans import emb as _emb  # noqa: F401,E402

from duckdb_cluster_hash_spark.plans.events import _interleave_expr  # noqa: F401
from duckdb_cluster_hash_spark.plans.events_ops import _PII_EMAIL_RE, _PII_IP_RE  # noqa: F401
from duckdb_cluster_hash_spark.plans.docs import bpe_encode_word, bpe_merge_apply, bpe_pair_counts  # noqa: F401

# ---------------------------------------------------------------------------
# Driver grading window rotation
# ---------------------------------------------------------------------------
# The driver's CORRECTNESS gate grades only the FIRST 50 ``queries()``
# entries, while scripts/check_oracle.py verifies ALL entries locally.
# Driver rows are the durable record, so registration order is rotated
# each round: the window leads with this round's NEW queries, then the
# LONGEST-UNSTAMPED queries (oldest CORRECTNESS_r* row first — after the
# r6 rotation every query has at least one row, so freshness, not
# existence, is what rotates now).  Recompute mechanically each round:
#   stamp[q] = max round whose CORRECTNESS_r*.json contains q;
#   window = new queries + sorted(catalog, key=stamp)[:50-len(new)].
_DRIVER_WINDOW_FIRST = [
    "docs_curation_pipeline",  # never stamped
    "docs_exact_substring_rewrite",  # never stamped
    "docs_quality_perceptron",  # never stamped
    "emb_knn_label_accuracy",  # never stamped
    "docs_softdedup_reweight",  # never stamped
    "docs_quality_perceptron_filter",  # never stamped
    "parts_brand_pagerank",  # newest stamp: r6
    "parts_skyline_price_size",  # newest stamp: r6
    "orders_snapshot_diff",  # newest stamp: r6
    "lineitem_trimmed_price_stats",  # newest stamp: r6
    "orders_bucket_pruned_lookup",  # newest stamp: r6
    "orders_set_operations",  # newest stamp: r6
    "docs_lang_top_tokens",  # newest stamp: r6
    "docs_source_quota_sample",  # newest stamp: r6
    "docs_rag_chunks",  # newest stamp: r6
    "docs_pack_sequences",  # newest stamp: r6
    "docs_bm25_search",  # newest stamp: r6
    "docs_bigram_collocations",  # newest stamp: r6
    "docs_token_heavy_hitters",  # newest stamp: r6
    "docs_bpe_training_loop",  # newest stamp: r6
    "docs_hybrid_rrf_search",  # newest stamp: r6
    "docs_next_token_accuracy",  # newest stamp: r6
    "docs_string_functions_probe",  # newest stamp: r6
    "events_retention_cohorts",  # newest stamp: r6
    "events_daily_engagement",  # newest stamp: r6
    "events_cumulative_hll_curve",  # newest stamp: r6
    "events_user_erasure",  # newest stamp: r6
    "events_merkle_bucket_digests",  # newest stamp: r6
    "events_sequence_edit_distance",  # newest stamp: r6
    "events_churn_batch_scoring",  # newest stamp: r6
    "events_keyset_pagination",  # newest stamp: r6
    "docs_exact_dedup",  # newest stamp: r6
    "docs_minhash_neardup_pairs",  # newest stamp: r6
    "docs_incremental_dedup",  # newest stamp: r6
    "docs_set_similarity_join",  # newest stamp: r6
    "events_streaming_attribution",  # newest stamp: r6
    "events_streaming_dedup_replay",  # newest stamp: r6
    "events_streaming_sessions",  # newest stamp: r6
    "events_streaming_routed_sink",  # newest stamp: r6
    "formats_merge_on_read",  # newest stamp: r6
    "emb_cosine_topk",  # newest stamp: r6
    "emb_dim_stats",  # newest stamp: r6
    "emb_pq_adc_recall",  # newest stamp: r6
    "emb_matryoshka_recall",  # newest stamp: r6
    "emb_binary_hamming_recall",  # newest stamp: r6
    "cluster_user_keys_histogram",  # newest stamp: r7
    "ddl_ctas_distribution",  # newest stamp: r7
    "cluster_slot_projection",  # newest stamp: r7
    "cluster_hashtag_colocation",  # newest stamp: r7
    "cluster_hot_slots_topk",  # newest stamp: r7
]


def _rotate_driver_window() -> None:
    front = list(_DRIVER_WINDOW_FIRST)
    missing = [n for n in front if n not in QUERIES]
    if missing:  # a rename above must fail loudly, not silently shrink the window
        raise RuntimeError(f"driver-window names not registered: {missing}")
    rest = [n for n in QUERIES if n not in set(front)]
    order = front + rest
    reordered_q = {n: QUERIES[n] for n in order}
    QUERIES.clear()
    QUERIES.update(reordered_q)
    reordered_o = {n: ORACLES[n] for n in order if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(reordered_o)


_rotate_driver_window()
