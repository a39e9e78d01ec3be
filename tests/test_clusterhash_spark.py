"""Spark-surface parity: pandas-UDF and native-Column implementations must
be bit-exact against the pure-Python core and the FIXTURES.md goldens,
NULL-propagating, int32-typed, and registered in the SQL catalog
(reference: clusterhash_extension.cpp:93-124)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType
from pyspark.sql.utils import AnalysisException

from duckdb_cluster_hash_spark import register_all, get_slot, get_node
from duckdb_cluster_hash_spark.functions.clusterhash import (
    cluster_slot_col,
    cluster_node_col,
    node_of_slot_col,
)
from tests.test_core import GOLDENS


@pytest.fixture(scope="module")
def keys_df(spark):
    schema = StructType([StructField("key", StringType())])
    rows = [Row(key=k) for k, *_ in GOLDENS] + [Row(key=None)]
    return spark.createDataFrame(rows, schema)


def _collect_map(df, key_col="key", val_col="v"):
    return {r[key_col]: r[val_col] for r in df.collect()}


def test_native_column_goldens(keys_df):
    out = keys_df.select(
        "key",
        cluster_slot_col("key").alias("slot"),
        cluster_node_col("key").alias("n6"),
        cluster_node_col("key", 3).alias("n3"),
    )
    got = {r["key"]: (r["slot"], r["n6"], r["n3"]) for r in out.collect()}
    for key, slot, n6, n3 in GOLDENS:
        assert got[key] == (slot, n6, n3), key
    assert got[None] == (None, None, None)


def test_native_schema_is_int32(keys_df):
    out = keys_df.select(
        cluster_slot_col("key").alias("s"), cluster_node_col("key").alias("n")
    )
    assert isinstance(out.schema["s"].dataType, IntegerType)
    assert isinstance(out.schema["n"].dataType, IntegerType)


def test_registered_udfs_goldens(spark, keys_df):
    register_all(spark)
    keys_df.createOrReplaceTempView("golden_keys")
    out = spark.sql(
        """SELECT key, cluster_slot(key) AS slot, cluster_node(key) AS n6,
                  cluster_node_n(key, 3) AS n3
           FROM golden_keys"""
    )
    assert isinstance(out.schema["slot"].dataType, IntegerType)
    got = {r["key"]: (r["slot"], r["n6"], r["n3"]) for r in out.collect()}
    for key, slot, n6, n3 in GOLDENS:
        assert got[key] == (slot, n6, n3), key
    assert got[None] == (None, None, None)


def test_udf_vs_native_on_table(spark, sf_small):
    """Both implementations agree on every key-ish column of the corpus."""
    register_all(spark)
    cust = spark.read.parquet(f"{sf_small}/customer.parquet")
    mismatch = (
        cust.select(
            F.expr("cluster_slot(c_name)").alias("udf_slot"),
            cluster_slot_col("c_name").alias("nat_slot"),
        )
        .where("udf_slot <> nat_slot")
        .count()
    )
    assert mismatch == 0
    orders = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        F.concat(
            F.lit("{cust:"),
            F.col("o_custkey").cast("string"),
            F.lit("}:order:"),
            F.col("o_orderkey").cast("string"),
        ).alias("key")
    )
    mismatch = (
        orders.select(
            F.expr("cluster_node(key)").alias("u"),
            cluster_node_col("key").alias("n"),
        )
        .where("u <> n")
        .count()
    )
    assert mismatch == 0


def test_hashtag_colocation_on_orders(spark, sf_small):
    """{cust:X}:order:Y keys for one customer all land on one slot (C1)."""
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    keyed = orders.select(
        "o_custkey",
        cluster_slot_col(
            F.concat(
                F.lit("{cust:"),
                F.col("o_custkey").cast("string"),
                F.lit("}:order:"),
                F.col("o_orderkey").cast("string"),
            )
        ).alias("slot"),
    )
    bad = (
        keyed.groupBy("o_custkey")
        .agg(F.countDistinct("slot").alias("nslots"))
        .where("nslots > 1")
        .count()
    )
    assert bad == 0


def test_unregistered_function_raises(spark):
    """Negative catalog test (quack.test:6-9 shape)."""
    with pytest.raises(AnalysisException):
        spark.sql("SELECT definitely_not_registered_fn('x')").collect()


def test_node_of_slot_col_all_boundaries(spark):
    df = spark.createDataFrame(
        [(s,) for s in [0, 2730, 2731, 5460, 5461, 8191, 8192, 10922, 10923, 13652, 13653, 16383]],
        "slot int",
    )
    got = {
        r["slot"]: r["n"]
        for r in df.select("slot", node_of_slot_col(F.col("slot"), 6).alias("n")).collect()
    }
    from duckdb_cluster_hash_spark.core import node_of_slot

    for slot, n in got.items():
        assert n == node_of_slot(slot, 6)


def test_user_keys_histogram_spark(spark):
    """Flagship README query shape (README.md:108-120) end-to-end."""
    keys = spark.range(1, 1001).select(
        F.concat(F.lit("user:"), F.col("id").cast("string")).alias("key")
    )
    hist = {
        r["node_id"]: r["key_count"]
        for r in keys.select(cluster_node_col("key", 3).alias("node_id"))
        .groupBy("node_id")
        .agg(F.count("*").alias("key_count"))
        .collect()
    }
    assert hist == {1: 332, 2: 337, 3: 331}
