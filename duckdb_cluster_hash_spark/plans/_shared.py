"""Helpers shared by more than one query-family module."""

from __future__ import annotations

from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from duckdb_cluster_hash_spark.functions.clusterhash import (
    cluster_node_col,
    cluster_slot_col,
    node_of_slot_col,
    node_udf_col,
    register_all,
    slot_udf_col,
)
from duckdb_cluster_hash_spark.oracle import node_of_slot_sql, node_sql, slot_sql
from duckdb_cluster_hash_spark.sources.tables import load_table
from duckdb_cluster_hash_spark import oracle_text as _ot
from duckdb_cluster_hash_spark.operators import dedup as _dd
from duckdb_cluster_hash_spark.operators import similarity as _sim
from duckdb_cluster_hash_spark.functions import text as _tx
from duckdb_cluster_hash_spark.operators import multimodal as _mm
from duckdb_cluster_hash_spark.streaming import events as _ev
from duckdb_cluster_hash_spark.oracle import node_sql as _node_sql
from duckdb_cluster_hash_spark.operators import joins as _joins
from duckdb_cluster_hash_spark.operators import skew as _sk
from duckdb_cluster_hash_spark.functions.text import (  # noqa: E402
    bigram_lift_top_sql,
    bm25_topk_sql,
)

from duckdb_cluster_hash_spark.plans._registry import ORACLES, QUERIES, _money_sum, _t, query  # noqa: F401


_USER_TAG_KEY_SQL = "'{user:' || user_id::VARCHAR || '}'"


def _os_path_basename(sf_dir: str) -> str:
    import os as _os

    return _os.path.basename(sf_dir.rstrip("/"))
