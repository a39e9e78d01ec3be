"""The DuckDB oracle fragments must themselves be correct before they can
judge the Spark queries: validate oracle.slot_sql/node_sql against the
FIXTURES.md goldens and against the pure-Python core on corpus keys."""

from __future__ import annotations

import duckdb
import pytest

from duckdb_cluster_hash_spark.core import get_node, get_slot
from duckdb_cluster_hash_spark.oracle import node_sql, slot_sql
from tests.test_core import GOLDENS


def test_oracle_goldens():
    values = ", ".join("('" + k.replace("'", "''") + "')" for k, *_ in GOLDENS)
    q = f"""
    WITH keys(key) AS (VALUES {values}, (NULL))
    SELECT key, {slot_sql('key')} AS slot,
           {node_sql('key')} AS n6, {node_sql('key', 3)} AS n3
    FROM keys
    """
    got = {r[0]: (r[1], r[2], r[3]) for r in duckdb.sql(q).fetchall()}
    for key, slot, n6, n3 in GOLDENS:
        assert got[key] == (slot, n6, n3), key
    assert got[None] == (None, None, None)


def test_oracle_matches_core_on_corpus():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS FROM read_parquet('/root/testdata/sf0.001/customer.parquet')"
    )
    rows = con.execute(
        f"SELECT c_name, {slot_sql('c_name')}, {node_sql('c_name', 6)} FROM customer"
    ).fetchall()
    assert len(rows) > 0
    for name, slot, node in rows:
        assert slot == get_slot(name)
        assert node == get_node(name, 6)
