"""The reference README flow, verbatim through spark.sql (B1-B10):
CREATE TABLE, INSERT VALUES, scalar projections, CTAS from a generated
series, the distribution GROUP BY (reference README.md:61-120)."""

from __future__ import annotations

import pytest

from duckdb_cluster_hash_spark import register_all


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_all(spark)
    yield


def test_readme_flow_create_insert_select(spark):
    spark.sql("DROP TABLE IF EXISTS test_keys")
    spark.sql("CREATE TABLE test_keys (key STRING) USING parquet")
    spark.sql(
        "INSERT INTO test_keys VALUES ('user:1000'), ('user:1001'), "
        "('product:5432'), ('session:abc123')"
    )
    rows = spark.sql(
        """SELECT key, cluster_slot(key) AS slot, cluster_node(key) AS node
           FROM test_keys ORDER BY key"""
    ).collect()
    got = {r["key"]: (r["slot"], r["node"]) for r in rows}
    assert got["user:1000"] == (1649, 1)
    assert got["product:5432"] == (13236, 5)
    assert len(got) == 4


def test_readme_flow_hashtag_colocation_sql(spark):
    rows = spark.sql(
        """SELECT cluster_slot('{user:1000}:profile') AS a,
                  cluster_slot('{user:1000}:sessions') AS b,
                  cluster_slot('user:1000') AS c"""
    ).head()
    assert rows["a"] == rows["b"] == rows["c"] == 1649


def test_readme_flow_ctas_distribution(spark):
    """README.md:108-120: CTAS over generate_series -> histogram."""
    spark.sql("DROP TABLE IF EXISTS many_keys")
    spark.sql(
        """CREATE TABLE many_keys USING parquet AS
           SELECT concat('user:', id) AS key FROM range(1, 1001)"""
    )
    hist = {
        r["node_id"]: r["key_count"]
        for r in spark.sql(
            """SELECT cluster_node(key, 3) AS node_id, COUNT(*) AS key_count
               FROM many_keys GROUP BY node_id ORDER BY node_id"""
        ).collect()
    }
    assert hist == {1: 332, 2: 337, 3: 331}  # FIXTURES.md golden


def test_readme_two_arg_cluster_node_verbatim(spark):
    """README.md:84: cluster_node(key, 3) must work under that exact name —
    the SQL-UDF DEFAULT parameter gives both arities on one function."""
    rows = spark.sql(
        """SELECT key, cluster_slot(key) AS slot, cluster_node(key, 3) AS node_id
           FROM VALUES ('user:1000'), ('product:5432'), ('{user:1000}:profile')
                AS t(key)"""
    ).collect()
    got = {r["key"]: (r["slot"], r["node_id"]) for r in rows}
    assert got["user:1000"] == (1649, 1)
    assert got["{user:1000}:profile"] == (1649, 1)
    # both arities agree with the DataFrame-side closed form
    r = spark.sql(
        "SELECT cluster_node('user:1000') AS d6, cluster_node('user:1000', 6) AS e6"
    ).head()
    assert r["d6"] == r["e6"] == 1


def test_literal_select(spark):
    r = spark.sql(
        "SELECT 'user:1000' AS key, cluster_slot('user:1000') AS slot"
    ).head()
    assert (r["key"], r["slot"]) == ("user:1000", 1649)
