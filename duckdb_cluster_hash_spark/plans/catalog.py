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
    "docs_pnm_decode_stats",  # never stamped
    "docs_wav_decode_stats",  # never stamped
    "docs_perplexity_filter",  # never stamped
    "emb_margin_bitext_pairs",  # never stamped
    "docs_y4m_video_stats",  # never stamped
    "parts_kcore_decomposition",  # never stamped
    "events_ab_welch_ttest",  # never stamped
    "events_ewma_anomaly",  # never stamped
    "events_cuped_adjustment",  # never stamped
    "docs_ngram_novelty",  # never stamped
    "docs_zipf_fit",  # never stamped
    "docs_dsir_importance",  # never stamped
    "docs_token_burstiness",  # never stamped
    "docs_containment_neardup",  # never stamped
    "emb_mmr_diverse_topk",  # never stamped
    "emb_kcenter_coreset",  # never stamped
    "emb_label_maxsim_retrieval",  # never stamped
    "emb_pca_power_iteration",  # never stamped
    "events_session_paths",  # never stamped
    "docs_keyword_extraction",  # never stamped
    "emb_jl_projection_quality",  # never stamped
    "emb_kmeans_lloyd_step",  # never stamped
    "cluster_rendezvous_placement",  # never stamped
    "cluster_hashring_vnodes",  # never stamped
    "docs_gopher_repetition",  # never stamped
    "parts_link_prediction",  # never stamped
    "docs_source_contamination",  # never stamped
    "emb_ivf_cell_health",  # never stamped
    "events_kmv_distinct_jaccard",  # never stamped
    "events_ams_f2_moment",  # never stamped
    "events_kendall_tau_daily",  # never stamped
    "events_bitmap_distinct_rollup",  # never stamped
    "docs_token_entropy",  # never stamped
    "docs_quality_auc",  # never stamped
    "docs_labeler_agreement_kappa",  # never stamped
    "events_weighted_reservoir_sample",  # never stamped
    "events_hourly_autocorrelation",  # never stamped
    "events_benford_digit_audit",  # never stamped
    "emb_hubness_audit",  # never stamped
    "events_markov_transition_entropy",  # never stamped
    "events_cusum_changepoint",  # never stamped
    "docs_minhash_jaccard_calibration",  # never stamped
    "docs_tokenizer_fertility",  # never stamped
    "events_histogram_quantile_sketch",  # never stamped
    "customer_revenue_gini",  # never stamped
    "docs_dedup_impact_by_source",  # never stamped
    "events_bot_rate_audit",  # never stamped
    "tpch_q22_dormant_rich_customers",  # newest stamp: r3
    "tpch_q8_market_share",  # newest stamp: r3
    "tpch_q2_min_cost_supplier",  # newest stamp: r3
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
