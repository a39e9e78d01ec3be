"""Salted aggregation equivalence + format round-trips."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_cluster_hash_spark.operators import skew
from duckdb_cluster_hash_spark.sources import load_table
from duckdb_cluster_hash_spark.sources.formats import read_table, write_table


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows of one hot key + 1k spread keys
    hot = spark.range(10000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    cold = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 100).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.union(cold)


def test_salted_count_equals_plain(skewed):
    plain = {r["k"]: r["count"] for r in skewed.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"] for r in skew.salted_count(skewed, ["k"]).collect()}
    assert salted == plain


def test_salted_agg_equals_plain(skewed):
    plain = {
        r["k"]: (r["s"], r["mn"], r["mx"], r["c"])
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.min("v").alias("mn"),
             F.max("v").alias("mx"), F.count("v").alias("c"))
        .collect()
    }
    got = {
        r["k"]: (r["s"], r["mn"], r["mx"], r["c"])
        for r in skew.salted_agg(
            skewed, ["k"],
            {"s": ("v", "sum"), "mn": ("v", "min"),
             "mx": ("v", "max"), "c": ("v", "count")},
        ).collect()
    }
    assert got == plain


def test_salt_actually_spreads(skewed):
    salted = skew.with_salt(skewed, 16)
    nsalts = (
        salted.where(F.col("k") == "hot")
        .select(F.countDistinct("_salt"))
        .head()[0]
    )
    assert nsalts == 16  # the hot key occupies every bucket


def test_salted_join_equals_plain(spark, skewed):
    small = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"S{i}") for i in range(100)], "k string, tag string"
    )
    plain = skewed.join(small, "k").groupBy("tag").count()
    rep = skew.replicate_for_salted_join(small, 8)
    big = skew.with_salt(skewed, 8)
    salted = big.join(rep, ["k", "_salt"]).groupBy("tag").count()
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "orc"])
def test_format_roundtrip(spark, sf_small, tmp_path, fmt):
    df = load_table(spark, sf_small, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    path = str(tmp_path / fmt)
    write_table(df, path, fmt)
    back = read_table(
        spark, path, fmt, schema="c_custkey bigint, c_name string, c_acctbal double"
    )
    assert back.count() == df.count()
    a = {tuple(r) for r in df.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_partitioned_write_layout(spark, sf_small, tmp_path):
    import os

    df = load_table(spark, sf_small, "customer")
    path = str(tmp_path / "byseg")
    write_table(df, path, "parquet", partition_by=["c_mktsegment"])
    dirs = [d for d in os.listdir(path) if d.startswith("c_mktsegment=")]
    assert len(dirs) == 5
    # partition pruning: reading one segment must not scan the others
    one = read_table(spark, path, "parquet").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(c_mktsegment" in plan


def test_text_token_count_matches_oracle_on_messy_spacing(spark):
    """formats_text_roundtrip's token count must equal the oracle's by
    CONSTRUCTION, not by corpus luck: both engines count '[^ ]+' matches,
    which (unlike split-on-space) is immune to leading/trailing/double
    spaces.  A past corpus drift (events.ts) proved drift happens."""
    import duckdb

    docs = [
        "plain single spaced text",
        " leading space",
        "trailing space ",
        "double  space  inside",
        "   ",  # all spaces -> 0 tokens
        "one",
    ]
    df = spark.createDataFrame([(d,) for d in docs], "value string")
    spark_total = df.agg(
        F.sum(F.regexp_count("value", F.lit("[^ ]+"))).cast("bigint").alias("t")
    ).head()["t"]
    con = duckdb.connect()
    oracle_total = con.execute(
        "SELECT CAST(sum(len(regexp_extract_all(t, '[^ ]+'))) AS BIGINT) "
        "FROM (SELECT unnest(?) AS t)",
        [docs],
    ).fetchone()[0]
    con.close()
    assert spark_total == oracle_total == 12


def test_text_roundtrip_survives_embedded_newlines(spark, tmp_path):
    """formats_text_roundtrip's sanitize rule: documents containing
    raw newlines must round-trip as ONE line each (flattened to spaces
    identically on both engines), not silently split the line count."""
    import duckdb

    docs = ["plain doc", "two\nlines", "crlf\r\nstyle", "tab\tsafe"]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    path = str(tmp_path / "nl_text")
    df.select(
        F.regexp_replace(F.col("text"), "[\r\n]", " ").alias("value")
    ).write.mode("overwrite").text(path)
    back = spark.read.text(path)
    assert back.count() == len(docs)
    spark_tokens = back.agg(
        F.sum(F.regexp_count("value", F.lit("[^ ]+"))).cast("bigint").alias("t")
    ).head()["t"]
    con = duckdb.connect()
    oracle_tokens = con.execute(
        "SELECT CAST(sum(len(regexp_extract_all("
        "regexp_replace(t, '[\r\n]', ' ', 'g'), '[^ ]+'))) AS BIGINT) "
        "FROM (SELECT unnest(?) AS t)",
        [docs],
    ).fetchone()[0]
    con.close()
    assert spark_tokens == oracle_tokens == 7
