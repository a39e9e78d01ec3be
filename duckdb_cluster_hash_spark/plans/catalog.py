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
    "docs_unigram_lm_train",  # never stamped
    "docs_unigram_lm_encode",  # never stamped
    "docs_audio_neardup_pairs",  # never stamped
    "docs_audio_neardup_bill",  # never stamped
    "docs_streaming_neardup_ingest",  # never stamped
    "docs_video_neardup_pairs",  # never stamped
    "docs_video_neardup_bill",  # never stamped
    "docs_coverage_greedy_selection",  # never stamped
    "docs_incremental_neardup",  # never stamped
    "docs_streaming_media_dedup",  # never stamped
    "tpch_q22_dormant_rich_customers",  # newest stamp: r9
    "tpch_q8_market_share",  # newest stamp: r9
    "tpch_q2_min_cost_supplier",  # newest stamp: r9
    "parts_kcore_decomposition",  # newest stamp: r9
    "docs_pnm_decode_stats",  # newest stamp: r9
    "docs_wav_decode_stats",  # newest stamp: r9
    "docs_y4m_video_stats",  # newest stamp: r9
    "docs_perplexity_filter",  # newest stamp: r9
    "docs_ngram_novelty",  # newest stamp: r9
    "docs_zipf_fit",  # newest stamp: r9
    "docs_dsir_importance",  # newest stamp: r9
    "docs_token_burstiness",  # newest stamp: r9
    "docs_keyword_extraction",  # newest stamp: r9
    "docs_gopher_repetition",  # newest stamp: r9
    "docs_token_entropy",  # newest stamp: r9
    "docs_quality_auc",  # newest stamp: r9
    "docs_labeler_agreement_kappa",  # newest stamp: r9
    "docs_tokenizer_fertility",  # newest stamp: r9
    "docs_dedup_impact_by_source",  # newest stamp: r9
    "parts_link_prediction",  # newest stamp: r9
    "customer_revenue_gini",  # newest stamp: r9
    "events_session_paths",  # newest stamp: r9
    "events_ab_welch_ttest",  # newest stamp: r9
    "events_ewma_anomaly",  # newest stamp: r9
    "events_cuped_adjustment",  # newest stamp: r9
    "events_kmv_distinct_jaccard",  # newest stamp: r9
    "events_ams_f2_moment",  # newest stamp: r9
    "events_kendall_tau_daily",  # newest stamp: r9
    "events_bitmap_distinct_rollup",  # newest stamp: r9
    "events_weighted_reservoir_sample",  # newest stamp: r9
    "events_hourly_autocorrelation",  # newest stamp: r9
    "events_benford_digit_audit",  # newest stamp: r9
    "events_markov_transition_entropy",  # newest stamp: r9
    "events_cusum_changepoint",  # newest stamp: r9
    "events_histogram_quantile_sketch",  # newest stamp: r9
    "events_bot_rate_audit",  # newest stamp: r9
    "docs_containment_neardup",  # newest stamp: r9
    "docs_source_contamination",  # newest stamp: r9
    "docs_minhash_jaccard_calibration",  # newest stamp: r9
    "emb_margin_bitext_pairs",  # newest stamp: r9
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
