"""Sampling, sharding and quantization operators — correctness + plan shape."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_cluster_hash_spark.operators.quantize import int8_quantize
from duckdb_cluster_hash_spark.operators.sampling import (
    stratified_sample,
    token_shards,
)
from duckdb_cluster_hash_spark.plans.catalog import QUERIES
from duckdb_cluster_hash_spark.sources import load_table

from tests.test_plans import plan_of


def test_stratified_sample_is_deterministic_and_shuffle_free(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    s1 = stratified_sample(docs, "lang", "doc_id", {"en": 250}, 600)
    s2 = stratified_sample(
        docs.repartition(7), "lang", "doc_id", {"en": 250}, 600
    )
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in s2.select("doc_id").collect())
    assert ids1 == ids2 and ids1  # same rows under any partitioning
    # map-side only: the sampling filter itself introduces no shuffle
    assert "Exchange" not in plan_of(s1)


def test_stratified_sample_rates_roughly_hold(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    kept = stratified_sample(docs, "lang", "doc_id", {"en": 250}, 600)
    tot = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    got = {r["lang"]: r["count"] for r in kept.groupBy("lang").count().collect()}
    for lang, n in tot.items():
        rate = 0.25 if lang == "en" else 0.6
        assert abs(got.get(lang, 0) / n - rate) < 0.2  # md5 is uniform-ish


def test_token_shards_match_single_window_reference(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    budget = 3000
    got = {
        r["id"]: r["shard"]
        for r in token_shards(docs, "doc_id", "n_tokens", budget).collect()
    }
    w = Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    ref = {
        r["doc_id"]: (r["cum"] - r["n_tokens"]) // budget
        for r in docs.withColumn("cum", F.sum("n_tokens").over(w)).collect()
    }
    assert got == ref


def test_token_shards_are_contiguous_and_budget_sized(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    budget = 3000
    per_shard = (
        token_shards(docs, "doc_id", "n_tokens", budget)
        .groupBy("shard")
        .agg(F.sum("n_tokens").alias("t"), F.max("n_tokens").alias("mx"))
        .orderBy("shard")
        .collect()
    )
    shards = [r["shard"] for r in per_shard]
    assert shards == list(range(len(shards)))  # contiguous ids from 0
    for r in per_shard[:-1]:
        # each shard crosses its budget boundary by at most one document
        assert r["t"] <= budget + r["mx"]


def test_token_shards_plan_has_no_global_sort_of_corpus(spark, sf_small):
    """The big window must run per-bucket (hash partition on b); the only
    single-partition structure allowed is the 256-row offsets table."""
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    plan = plan_of(token_shards(docs, "doc_id", "n_tokens", 5000))
    assert "hashpartitioning(b" in plan
    assert "BroadcastHashJoin" in plan  # offsets come back as a broadcast
    # no range partitioning (global sort) of the document stream
    assert "rangepartitioning" not in plan.lower()


def test_int8_quantize_codes_bounds_and_plan(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    q = int8_quantize(emb, "embedding")
    row = q.select(
        F.min(F.array_min("qvec")).alias("lo"),
        F.max(F.array_max("qvec")).alias("hi"),
    ).head()
    assert row["lo"] == 0 and row["hi"] == 255  # full code range in use
    plan = plan_of(q)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # per-row map, no shuffle


def test_q21_plans_semi_and_anti_joins(spark, sf_small):
    plan = plan_of(QUERIES["tpch_q21_waiting_supplier"](spark, sf_small))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q2_decorrelated_min_without_cartesian(spark, sf_small):
    plan = plan_of(QUERIES["tpch_q2_min_cost_supplier"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q15_max_probe_is_broadcast_not_window(spark, sf_small):
    """The revenue==max(revenue) probe must be a 1-row broadcast join, not
    a single-partition window over all suppliers."""
    plan = plan_of(QUERIES["tpch_q15_top_supplier"](spark, sf_small))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_mixture_epochs_copy_rule(spark):
    """copies = millis div 1000 + (bucket < millis mod 1000); every doc in
    a 2500-milli stratum appears 2 or 3 times, a 300-milli stratum 0 or 1,
    and copy_idx enumerates 0..copies-1."""
    from duckdb_cluster_hash_spark.operators.sampling import (
        mixture_epochs,
        sample_bucket_col,
    )

    df = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "hot").otherwise("cold").alias("src"),
    )
    out = mixture_epochs(df, "src", "doc_id", {"hot": 2500, "cold": 300}).cache()
    per_doc = (
        out.groupBy("doc_id", "src")
        .agg(F.count("*").alias("n"), F.max("copy_idx").alias("mx"))
        .collect()
    )
    buckets = {
        r["doc_id"]: r["bucket"]
        for r in df.select("doc_id", sample_bucket_col(F.col("doc_id"))).collect()
    }
    seen = set()
    for r in per_doc:
        seen.add(r["doc_id"])
        b = buckets[r["doc_id"]]
        expect = (2 + (b < 500)) if r["src"] == "hot" else (0 + (b < 300))
        assert r["n"] == expect and r["mx"] == expect - 1, r
    # cold docs with bucket >= 300 are dropped entirely (0 copies)
    dropped = {d for d, b in buckets.items() if d % 2 == 1 and b >= 300}
    assert dropped.isdisjoint(seen) and len(dropped) > 0
