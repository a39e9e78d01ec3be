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
# entries (r1 and r2 artifacts contain exactly catalog positions 0-49), while
# scripts/check_oracle.py verifies ALL entries locally.  Driver rows are the
# durable record, so registration order is rotated here: queries that have
# never had a driver CORRECTNESS row in any round (everything registered
# after position 49 in r1/r2 — the TPC-H head pack, ANN/SemDeDup/quantize,
# format round-trips, the curation pack) come first, followed by this
# round's new queries and a handful of Tier-A flagships kept in-window for
# continuity.  The long-stable r1/r2-green remainder rotates behind — still
# fully covered by the local oracle gate.
_DRIVER_WINDOW_FIRST = [
    # ===== ROUND-6 ROTATION (executes r4/r5 verdict item #1) =====
    # All 35 queries that had no driver CORRECTNESS row in any of r01-r05
    # (set = catalog names minus the union of CORRECTNESS_r01..r05 keys,
    # recomputed mechanically this round) come first.  After this round
    # every catalog query has a driver row in some CORRECTNESS_r*.json.
    "cluster_node_arity_sweep",
    "docs_lang_top_tokens",
    "docs_source_quota_sample",
    "docs_rag_chunks",
    "docs_pack_sequences",
    "docs_bm25_search",
    "docs_bigram_collocations",
    "docs_incremental_dedup",
    "events_retention_cohorts",
    "orders_reorder_intervals",
    "emb_dim_stats",
    "docs_token_heavy_hitters",
    "cluster_resharding_plan",
    "events_daily_engagement",
    "part_size_percent_rank",
    "events_streaming_attribution",
    "events_streaming_dedup_replay",
    "events_streaming_sessions",
    "events_cumulative_hll_curve",
    "docs_next_token_accuracy",
    "emb_matryoshka_recall",        # verdict item #2: quantization story
    "parts_skyline_price_size",
    "events_merkle_bucket_digests",
    "tpch_fk_orphan_audit",
    "sql_portable_text_probe",
    "orders_snapshot_diff",
    "emb_binary_hamming_recall",    # verdict item #2: quantization story
    "lineitem_trimmed_price_stats", # verdict item #2: r5 rewrite, no stamp
    "events_sequence_edit_distance",
    "events_churn_batch_scoring",
    "events_keyset_pagination",
    "orders_bucket_pruned_lookup",
    "orders_set_operations",
    "sql_null_semantics_probe",
    "docs_string_functions_probe",  # verdict item #8: codepoint-vs-byte parity
    # — kept in-window one more round (verdict item #2) so the r5
    #   de-broadcast of the verify stage re-lands a driver row —
    "docs_set_similarity_join",
    # — NEW this round (verdict item #3): the full iterated BPE
    #   training loop —
    "docs_bpe_training_loop",
    # — 13 continuity flagships, one per operator family, all previously
    #   driver-green; they keep a fresh stamp on the core surfaces while
    #   the long-stable remainder rotates behind (still covered in full
    #   by the local check_oracle gate) —
    "cluster_scalar_goldens",          # A1-A6 core hash goldens
    "ddl_readme_flow",                 # A7/B3/B4 README 2-arg flow
    "cluster_node_distribution",       # A5/C2 shard table + distribution
    "tpch_q1_pricing_summary",         # TPC-H flagship / bench headline
    "docs_exact_dedup",                # exact dedup family
    "docs_minhash_neardup_pairs",      # near-dup family
    "emb_cosine_topk",                 # exact ANN baseline
    "emb_pq_adc_recall",               # quantization family
    "docs_hybrid_rrf_search",          # retrieval family (carries BM25+RRF)
    "events_streaming_routed_sink",    # streaming family
    "parts_brand_pagerank",            # graph family
    "formats_merge_on_read",           # lake-ops family
    "events_user_erasure",             # privacy family
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
