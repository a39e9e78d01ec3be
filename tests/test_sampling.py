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


def test_pack_sequences_straddler_rule(spark):
    """512-token packing: a doc straddles iff its span crosses a 512
    boundary — pinned on a hand-computed layout in ONE shard (all docs
    share one doc_id-bucket shard via controlled token counts)."""
    # single shard: use the catalog's exact md5-order + div rule in
    # miniature (seq_len 10 here for hand-checkable spans)
    rows = [("a", 4), ("b", 4), ("c", 4), ("d", 10), ("e", 0)]
    df = spark.createDataFrame(rows, "k string, tokens long")
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.withColumn(
        "cum", F.coalesce(F.sum("tokens").over(w), F.lit(0))
    ).withColumn(
        "straddles",
        (F.col("tokens") > 0)
        & (F.expr("cum div 10") != F.expr("(cum + tokens - 1) div 10")),
    )
    got = {r["k"]: r["straddles"] for r in out.collect()}
    # spans: a=[0,4) b=[4,8) c=[8,12) straddles, d=[12,22) straddles,
    # e zero-width never straddles
    assert got == {"a": False, "b": False, "c": True, "d": True, "e": False}


def test_rag_chunk_count_rule(spark):
    """chunk(128, overlap 32): T<=128 -> 1; else 1 + ceil((T-128)/96),
    pinned at the boundaries."""
    rows = [(0,), (1,), (128,), (129,), (224,), (225,), (320,)]
    df = spark.createDataFrame(rows, "tokens long")
    n = F.when(F.col("tokens") <= 128, F.lit(1)).otherwise(
        F.lit(1) + F.expr("(tokens - 128 + 95) div 96")
    )
    got = {r["tokens"]: r["n"] for r in df.withColumn("n", n).collect()}
    assert got == {0: 1, 1: 1, 128: 1, 129: 2, 224: 2, 225: 3, 320: 3}


def test_source_quota_is_prefix_of_md5_order(spark, sf_small):
    """The kept quota must be exactly the first-100-by-md5 prefix per
    source (reproducible sample), cross-checked row-by-row."""
    docs = load_table(spark, sf_small, "documents")
    ranked = docs.select(
        "source",
        "doc_id",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        )
        .alias("rk"),
    )
    kept_ids = {r["doc_id"] for r in ranked.where("rk <= 100").collect()}
    res = {r["source"]: (r["n_total"], r["n_kept"]) for r in
           QUERIES["docs_source_quota_sample"](spark, sf_small).collect()}
    for src, (n_total, n_kept) in res.items():
        assert n_kept == min(n_total, 100), src
    assert len(kept_ids) == sum(k for _, k in res.values())


def test_token_weighted_sample_draw_budget_and_certainty(spark):
    """Systematic PPS invariants: the k probes are fully allocated
    (sum of draws == k) and any document heavier than one stride
    T/k is a certainty selection."""
    from duckdb_cluster_hash_spark.plans.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["docs_token_weighted_sample"](spark, sf).collect()
    assert sum(r["n_draws"] for r in out) == 500
    # certainty inclusion: stride = T/k; every doc with n_tokens >= stride
    # covers at least one probe
    from duckdb_cluster_hash_spark.functions.text import ws_token_count
    from duckdb_cluster_hash_spark.sources import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf, "documents").select(
        "doc_id", ws_token_count(F.col("text")).cast("bigint").alias("w")
    )
    total = docs.agg(F.sum("w")).head()[0]
    stride = total // 500
    heavy = {r["doc_id"] for r in docs.where(F.col("w") > stride).collect()}
    sampled = {r["doc_id"] for r in out}
    assert heavy <= sampled


def test_quota_split_proportions_exact_per_stratum(spark, sf_small):
    """The reason the quota split exists: every stratum's train/val/test
    counts must hit floor(0.8n)/floor(0.9n)-floor(0.8n)/rest EXACTLY,
    not just in expectation like the hash-bucket split."""
    rows = QUERIES["docs_stratified_quota_split"](spark, sf_small).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["split"]] = r["n_docs"]
    assert by_lang, "small corpus has several languages"
    for lang, parts in by_lang.items():
        n = sum(parts.values())
        want_train = (n * 8) // 10
        want_val = (n * 9) // 10 - want_train
        assert parts.get("train", 0) == want_train, (lang, parts, n)
        assert parts.get("val", 0) == want_val, (lang, parts, n)
        assert parts.get("test", 0) == n - want_train - want_val, (lang, parts)


def test_quota_split_membership_partitions_corpus(spark, sf_small):
    """Splits must partition each stratum: per-lang doc counts across the
    three splits sum to the stratum size and id ranges never overlap a
    doc (sum/min/max digests come straight from the query output)."""
    docs = load_table(spark, sf_small, "documents")
    want = {
        (r["lang"]): (r["n"], r["s"])
        for r in docs.groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("doc_id").alias("s"))
        .collect()
    }
    rows = QUERIES["docs_stratified_quota_split"](spark, sf_small).collect()
    got = {}
    for r in rows:
        n, s = got.get(r["lang"], (0, 0))
        got[r["lang"]] = (n + r["n_docs"], s + r["sum_doc_id"])
    assert got == want


def test_source_novelty_conservation(spark, sf_small):
    """Every distinct shingle is credited to exactly one source: the sum
    of n_first_shingles equals the corpus-wide distinct shingle count."""
    from duckdb_cluster_hash_spark.operators.dedup import word_ngrams

    docs = load_table(spark, sf_small, "documents")
    total_distinct = (
        docs.select(F.explode(word_ngrams(F.col("text"), 3)).alias("g"))
        .agg(F.countDistinct("g"))
        .head()[0]
    )
    rows = QUERIES["docs_source_novelty_attribution"](spark, sf_small).collect()
    assert sum(r["n_first_shingles"] for r in rows) == total_distinct
    for r in rows:
        assert 0 <= r["n_first_shingles"] <= r["n_distinct_shingles"]
        assert 0 <= r["novelty_permille"] <= 1000


def test_source_length_drift_bounds_and_self_consistency(spark, sf_small):
    """ks_bp is a floor-scaled sup of a CDF difference: bounded by 10000,
    and the reported peak length must be an observed length."""
    docs = load_table(spark, sf_small, "documents")
    lengths = {r["n_chars"] for r in docs.select("n_chars").distinct().collect()}
    rows = QUERIES["docs_source_length_drift"](spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 0 <= r["ks_bp"] <= 10000
        assert r["n_chars_at_max"] in lengths
