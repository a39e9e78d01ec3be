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
    "docs_quality_perceptron_sweep",  # never stamped
    "docs_image_neardup_pairs",  # never stamped
    "docs_image_neardup_bill",  # never stamped
    "cluster_skew_report",  # newest stamp: r7
    "cluster_shard_ranges",  # newest stamp: r7
    "sql_error_probe",  # newest stamp: r7
    "tpch_q6_forecast_revenue",  # newest stamp: r7
    "tpch_q14_promo_effect",  # newest stamp: r7
    "tpch_q3_shipping_priority",  # newest stamp: r7
    "tpch_q5_local_supplier_volume",  # newest stamp: r7
    "tpch_q4_order_priority",  # newest stamp: r7
    "tpch_q13_customer_order_counts",  # newest stamp: r7
    "tpch_q17_small_quantity_revenue",  # newest stamp: r7
    "tpch_q18_large_volume_customers",  # newest stamp: r7
    "lineitem_priority_channels",  # newest stamp: r7
    "orders_grouping_sets",  # newest stamp: r7
    "customer_spend_deciles",  # newest stamp: r7
    "part_price_histogram",  # newest stamp: r7
    "nation_top_customers_window",  # newest stamp: r7
    "orders_monthly_priority",  # newest stamp: r7
    "orders_without_lineitems",  # newest stamp: r7
    "active_multiline_customers",  # newest stamp: r7
    "brand_type_setops",  # newest stamp: r7
    "lineitem_quantity_quartiles",  # newest stamp: r7
    "customer_running_spend",  # newest stamp: r7
    "orders_rollup_year_priority",  # newest stamp: r7
    "docs_stats_by_lang",  # newest stamp: r7
    "docs_lang_id_counts",  # newest stamp: r7
    "docs_quality_scores",  # newest stamp: r7
    "docs_token_stats_by_source",  # newest stamp: r7
    "docs_media_metadata",  # newest stamp: r7
    "docs_ilike_filter",  # newest stamp: r7
    "docs_bpe_encode",  # newest stamp: r7
    "events_user_first_last",  # newest stamp: r7
    "events_hourly",  # newest stamp: r7
    "events_json_stats",  # newest stamp: r7
    "events_sessionization",  # newest stamp: r7
    "events_sliding_windows",  # newest stamp: r7
    "events_node_routing_counts",  # newest stamp: r7
    "events_user_profile",  # newest stamp: r7
    "events_lag_deltas",  # newest stamp: r7
    "events_daily_pivot",  # newest stamp: r7
    "docs_dedup_representatives",  # newest stamp: r7
    "docs_ngram_jaccard_pairs",  # newest stamp: r7
    "docs_simhash_signatures",  # newest stamp: r7
    "docs_simhash_neardup_pairs",  # newest stamp: r7
    "docs_fingerprints",  # newest stamp: r7
    "docs_winnow_fingerprints",  # newest stamp: r7
    "cluster_rendezvous_placement",  # newest stamp: r9
    "cluster_hashring_vnodes",  # newest stamp: r9
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
