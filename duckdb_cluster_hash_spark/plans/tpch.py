"""Tier B — the TPC-H query suite proper (q1, q3, q5, q6, q14, ...):
pricing summaries, joins, subquery/decorrelation shapes.

Split out of the original plans/catalog.py; the registry, driver
window, and rotation stay in catalog.py.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from duckdb_cluster_hash_spark.plans._registry import _t, query


@query(
    "tpch_q1_pricing_summary",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4)) * CAST(1 + l_tax AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_charge, "
        "count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
    ),
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy multi-aggregate with pushed-down filter."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    one_minus_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    one_plus_tax = (F.lit(1) + F.col("l_tax")).cast("decimal(18,4)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias(
                "sum_base_price"
            ),
            F.round(
                F.sum(dec("l_extendedprice") * one_minus_disc), 2
            ).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum(dec("l_extendedprice") * one_minus_disc * one_plus_tax), 2
            ).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle=(
        "SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * "
        "CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue, "
        "CAST(count(*) AS BIGINT) AS n_items "
        "FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND l_discount BETWEEN 0.05::DOUBLE AND 0.07::DOUBLE AND l_quantity < 24"
    ),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-scan filter + global agg.  All three
    predicates push into the parquet scan (PushedFilters); the aggregate
    is a partial->final pair with no groupBy shuffle width."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * F.col(
        "l_discount"
    ).cast("decimal(18,4)")
    return li.agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "tpch_q14_promo_effect",
    oracle=(
        "WITH agg AS (SELECT "
        "CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4)) "
        "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS total "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01') "
        "SELECT round(100.0 * promo / total * 10000) / 10000 AS promo_pct, "
        "CAST(round(promo, 2) AS DOUBLE) AS promo_revenue, "
        "CAST(round(total, 2) AS DOUBLE) AS total_revenue FROM agg"
    ),
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: broadcast dim join + conditional-aggregate ratio.
    Sums are DECIMAL-exact (order-independent); the ratio divides the two
    decimal-exact sums as doubles, so both engines see identical bits."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
            .cast("double")
            .alias("promo"),
            F.sum(rev).cast("double").alias("total"),
        )
    )
    return agg.select(
        (
            F.round(F.lit(100.0) * F.col("promo") / F.col("total") * 10000)
            / 10000
        ).alias("promo_pct"),
        (F.round(F.col("promo") * 100) / 100).cast("double").alias("promo_revenue"),
        (F.round(F.col("total") * 100) / 100).cast("double").alias("total_revenue"),
    )


@query(
    "tpch_q3_shipping_priority",
    oracle=(
        "SELECT l_orderkey, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue, "
        "CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15' "
        "AND l_shipdate > TIMESTAMP '1996-03-15' "
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
        "ORDER BY sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) DESC, l_orderkey LIMIT 10"
    ),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective join + top-k (TakeOrderedAndProject)."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    rev = (F.col("l_extendedprice").cast("decimal(18,4)") *
           (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("_rev_exact"))
        .orderBy(F.desc("_rev_exact"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.round(F.col("_rev_exact"), 2).cast("double").alias("revenue"),
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle=(
        "SELECT n_name, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1998-01-01' "
        "GROUP BY n_name ORDER BY revenue DESC, n_name"
    ),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; dims broadcast, facts shuffle on keys."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice").cast("decimal(18,4)") *
           (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).alias("_rev_exact"))
        .select(
            "n_name",
            F.round(F.col("_rev_exact"), 2).cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "tpch_q4_order_priority",
    oracle=(
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count "
        "FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-01-01' "
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
        "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join.

    Scale: the semi join hashes on the equi key ``l_orderkey`` and applies
    the non-equi shipdate predicate as a residual filter inside the same
    hash join — one shuffle per side, no subquery re-execution per row
    (correlated EXISTS would be O(n) scans on a naive engine).  AQE can
    further convert to broadcast when the filtered orders side is small.
    Reference surface parity: host-engine SQL tier (SURVEY.md S2 Tier B).
    """
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q13_customer_order_counts",
    oracle=(
        "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM ("
        "  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count "
        "  FROM customer LEFT OUTER JOIN orders "
        "  ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT' "
        "  GROUP BY c_custkey) "
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
    ),
)
def tpch_q13_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with an ON-clause filter + two-level
    aggregation (count per customer, then distribution of counts).

    Scale: the ON-clause predicate must NOT be pushed as a WHERE (that
    would turn the outer join inner and drop zero-order customers) —
    expressing it in the join condition keeps semantics and still prunes
    the orders scan.  Second aggregation runs on the already-shrunk
    per-customer relation.
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle=(
        "WITH pq AS (SELECT l_partkey AS pk, "
        "sum(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty, "
        "CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY l_partkey) "
        "SELECT CAST(count(*) AS BIGINT) AS n_lines, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS small_qty_revenue "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "JOIN pq ON pk = l_partkey "
        "WHERE p_brand = 'Brand#4' "
        "AND 5 * CAST(l_quantity AS DECIMAL(18,4)) * cnt < sum_qty"
    ),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar AVG subquery, decorrelated into
    a per-part aggregate joined back to the fact.

    Numeric discipline: the correlated predicate ``l_quantity <
    0.2 * avg(l_quantity)`` is rewritten multiplication-only as
    ``5 * qty * cnt < sum_qty`` over DECIMAL — exact in both engines,
    immune to decimal-division scale differences (see module docstring).
    Scale: fact rows are pruned BEFORE the first shuffle — a broadcast
    left-semi join against the Brand#4 part keys drops the ~96% of
    lineitem whose per-part aggregates the later join would discard
    anyway (per-partkey sums are unaffected: the filter removes whole
    partkeys, never rows within one — same argument as Q2).  The part
    side broadcasts; no per-row subquery execution.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#4").select("p_partkey")
    li_brand = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi"
    )
    pq = li_brand.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    return (
        li_brand.join(pq, li_brand.l_partkey == pq.pk)
        .where(
            F.lit(5) * F.col("l_quantity").cast("decimal(18,4)") * F.col("cnt")
            < F.col("sum_qty")
        )
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("small_qty_revenue"),
        )
    )


@query(
    "tpch_q18_large_volume_customers",
    oracle=(
        "SELECT c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem "
        "GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 300) "
        "GROUP BY c_name, o_orderkey, o_orderdate "
        "ORDER BY total_qty DESC, o_orderkey LIMIT 20"
    ),
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-IN subquery as a semi join on an aggregate.

    Scale: the big-order keys are found with one partial-agg pass over
    lineitem (map-side combine shrinks before the shuffle), then used as
    a LEFT SEMI probe — at real SF the qualifying key set is tiny, so AQE
    flips the semi join to broadcast.  Top-k is ORDER BY + LIMIT →
    TakeOrderedAndProject, never a global sort.
    """
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sq"))
        .where(F.col("sq") > 300)
        .select("l_orderkey")
    )
    orders_raw = _t(spark, sf_dir, "orders")
    orders = orders_raw.join(
        big, orders_raw.o_orderkey == big.l_orderkey, "left_semi"
    )
    cust = _t(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("_sq"))
        .orderBy(F.desc("_sq"), F.asc("o_orderkey"))
        .limit(20)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("_sq").cast("double").alias("total_qty"),
        )
    )


@query(
    "tpch_q22_dormant_rich_customers",
    oracle=(
        "WITH avgbal AS (SELECT sum(CAST(c_acctbal AS DECIMAL(18,4))) AS s, "
        "CAST(count(*) AS BIGINT) AS n FROM customer WHERE c_acctbal > 0) "
        "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust, "
        "CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS totacctbal "
        "FROM customer, avgbal "
        "WHERE CAST(c_acctbal AS DECIMAL(18,4)) * n > s "
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_orderdate >= TIMESTAMP '2000-01-01') "
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"
    ),
)
def tpch_q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar aggregate subquery + NOT EXISTS
    anti join ("rich customers with no recent orders").

    Numeric discipline: ``acctbal > avg(positive acctbal)`` is rewritten
    multiplication-only as ``acctbal * n > sum`` over DECIMAL (exact both
    engines).  Scale: the 1-row aggregate is a broadcast nested-loop of a
    single row (free); the anti join hashes on ``o_custkey`` with the
    date filter pushed to the orders scan — a correlated NOT EXISTS
    would rescan orders per customer.
    """
    cust = _t(spark, sf_dir, "customer")
    avgbal = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,4)")).alias("s"),
        F.count("*").alias("n"),
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avgbal))
        .where(F.col("c_acctbal").cast("decimal(18,4)") * F.col("n") > F.col("s"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "tpch_q7_nation_volume",
    oracle=(
        "SELECT supp_nation, cust_nation, l_year, "
        "CAST(count(*) AS BIGINT) AS n_lines, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue "
        "FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "CAST(year(l_shipdate) AS INTEGER) AS l_year, l_extendedprice, l_discount "
        "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "JOIN customer ON c_custkey = o_custkey "
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
        "WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
        "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
        "AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31') "
        "GROUP BY supp_nation, cust_nation, l_year "
        "ORDER BY supp_nation, cust_nation, l_year"
    ),
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: same dimension joined twice under different roles
    (supplier nation vs customer nation) + a disjunctive cross-role filter.

    Scale: both nation copies broadcast; the OR pair filter evaluates
    post-join on broadcast columns (cheap), while the shipdate range is
    pushed into the lineitem scan.  Facts shuffle once per equi key.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    rev = (F.col("l_extendedprice").cast("decimal(18,4)") *
           (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair_ok)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    oracle=(
        "WITH allrev AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, "
        "sum(CASE WHEN n2.n_name = 'NATION_3' "
        "THEN CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4)) "
        "ELSE 0 END) AS nat, "
        "sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS tot "
        "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
        "JOIN customer ON c_custkey = o_custkey "
        "JOIN nation n1 ON c_nationkey = n1.n_nationkey "
        "JOIN region ON n1.n_regionkey = r_regionkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation n2 ON s_nationkey = n2.n_nationkey "
        "JOIN part ON p_partkey = l_partkey "
        "WHERE r_name = 'ASIA' AND p_type = 'PROMO' GROUP BY o_year) "
        "SELECT o_year, "
        "(round(CAST(nat AS DOUBLE) * 10000 / CAST(tot AS DOUBLE))) / 10000 AS mkt_share "
        "FROM allrev ORDER BY o_year"
    ),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: conditional-sum market share over a 8-way join.

    Numeric discipline: numerator/denominator are DECIMAL-exact sums; the
    share ratio is computed as one double division then integer-scaled
    rounding — both engines see bit-identical operands, so the ratio is
    reproducible (never round a raw double with round(x, k)).
    Scale: all dimensions broadcast, single fact shuffle; the CASE
    numerator avoids a second pass / self-join over the fact.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice").cast("decimal(18,4)") *
           (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_rkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
                F.lit(0).cast("decimal(18,4)"))).alias("nat"),
            F.sum(rev).alias("tot"),
        )
    )
    return agg.select(
        "o_year",
        (F.round(F.col("nat").cast("double") * 10000 / F.col("tot").cast("double"))
         / 10000).alias("mkt_share"),
    ).orderBy("o_year")


@query(
    "tpch_q10_returned_items",
    oracle=(
        "SELECT c_custkey, c_name, CAST(count(*) AS BIGINT) AS n_lines, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01' "
        "AND l_returnflag = 'R' "
        "GROUP BY c_custkey, c_name "
        "ORDER BY revenue DESC, c_custkey LIMIT 20"
    ),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-revenue top-k customers in a quarter.

    Scale: both filters push to their scans (returnflag into lineitem,
    the date range into orders); customer broadcast; top-20 is
    TakeOrderedAndProject.
    """
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    rev = (F.col("l_extendedprice").cast("decimal(18,4)") *
           (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.count("*").alias("n_lines"), F.sum(rev).alias("_rev"))
        .orderBy(F.desc("_rev"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_lines",
            F.round(F.col("_rev"), 2).cast("double").alias("revenue"),
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle=(
        "WITH rev AS (SELECT l_suppkey, "
        "sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS r "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
        "SELECT s_suppkey, s_name, "
        "CAST(round(r, 2) AS DOUBLE) AS total_revenue "
        "FROM supplier JOIN rev ON s_suppkey = l_suppkey "
        "WHERE r = (SELECT max(r) FROM rev) ORDER BY s_suppkey"
    ),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate compared against the MAX of the same
    aggregate (the view + scalar-subquery pattern).

    Numeric discipline: the equality test runs on the DECIMAL-exact sums
    (order-independent), so ties are bit-deterministic on both engines.
    Scale: per-supplier partial agg shrinks lineitem before anything
    else; the global max is a 1-row broadcast probed by every row — no
    second scan of lineitem, no single-partition window.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
        ).alias("r")
    )
    mx = rev.agg(F.max("r").alias("mx"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("r") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("r"), 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle=(
        "SELECT CAST(count(*) AS BIGINT) AS n_lines, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20) "
        "OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35) "
        "OR (p_type = 'PROMO' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 20 AND 50)"
    ),
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs mixing join-side columns.

    Scale: the disjunction references both part and lineitem columns, so
    it cannot fully push below the join — but Catalyst derives the
    common implied constraints and keeps the equi hash join; part side
    broadcast.  No fact-side cartesian fallback.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    ) | (
        (F.col("p_type") == "PROMO")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(20, 50)
    )
    rev = (F.col("l_extendedprice").cast("decimal(18,4)") *
           (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        )
    )


@query(
    "tpch_q21_waiting_supplier",
    oracle=(
        "SELECT s_name, CAST(count(*) AS BIGINT) AS numwait "
        "FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey "
        "JOIN orders ON o_orderkey = l1.l_orderkey "
        "WHERE o_orderstatus = 'F' "
        "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey "
        "AND l2.l_suppkey <> l1.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey "
        "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate > l1.l_shipdate) "
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10"
    ),
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS self-correlations on the fact
    (suppliers holding up multi-supplier finished orders — adapted to
    this corpus's columns: l_shipdate stands in for receipt/commit).

    Scale: both correlations decorrelate to hash semi/anti joins on
    ``l_orderkey`` with residual inequality predicates — the fact
    shuffles on the same key for all three joins, so Spark reuses the
    exchange; no per-row subquery, no cartesian.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    waiting = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey"))
            & (F.col("l3_shipdate") > F.col("l_shipdate")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle=(
        "WITH offers AS (SELECT l_partkey, l_suppkey, "
        "min(l_extendedprice) AS offer FROM lineitem GROUP BY l_partkey, l_suppkey), "
        "best AS (SELECT l_partkey AS b_partkey, min(offer) AS best_offer "
        "FROM offers GROUP BY l_partkey) "
        "SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, offer "
        "FROM offers JOIN best ON l_partkey = b_partkey AND offer = best_offer "
        "JOIN part ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE p_size = 15 AND r_name = 'EUROPE' "
        "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 25"
    ),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-cost supplier per part via a correlated MIN
    subquery, decorrelated to agg + join (no partsupp in this corpus, so
    the per-(part, supplier) min lineitem price stands in for ps_supplycost).

    Numeric discipline: the join equality runs on two MIN() results of the
    same parquet doubles — MIN is order-independent and bit-exact on both
    engines, so double equality is safe here (never true for SUM/AVG).
    Scale: fact rows are pruned BEFORE the first shuffle — a left-semi
    join against the broadcast p_size=15 part keys drops ~95% of lineitem
    pre-aggregation (per-partkey MINs are unaffected: the filter removes
    whole partkeys, never rows within one).  The offer rollup then
    shuffles only surviving (partkey, suppkey) groups; the per-part best
    is a second small agg; dimensions broadcast; top-25 is
    TakeOrderedAndProject, no global sort.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_size") == 15)
    li_pruned = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    offers = li_pruned.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("offer")
    )
    best = offers.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("offer").alias("best_offer")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    return (
        offers.join(
            best,
            (offers.l_partkey == best.b_partkey)
            & (F.col("offer") == F.col("best_offer")),
        )
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "offer")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(25)
    )


@query(
    "tpch_q9_product_profit",
    oracle=(
        "SELECT nation, o_year, "
        "CAST(round(sum(margin), 2) AS DOUBLE) AS sum_profit FROM ("
        "SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year, "
        "CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4)) "
        "- CAST(p_retailprice * 0.5 AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4)) AS margin "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "WHERE p_name LIKE '%bolt%') "
        "GROUP BY nation, o_year ORDER BY nation, o_year DESC"
    ),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for parts
    matching a name substring (p_retailprice*0.5 stands in for
    ps_supplycost — this corpus has no partsupp).

    Numeric discipline: margin is DECIMAL-exact per row (the *0.5 halving
    is exact in binary, so the double->DECIMAL cast sees the same value on
    both engines); the sum commutes.  Scale: the LIKE filter prunes part
    before the join, part/supplier/nation broadcast, single fact shuffle
    on o_orderkey.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    margin = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
        - (F.col("p_retailprice") * F.lit(0.5)).cast("decimal(18,4)")
        * F.col("l_quantity").cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(margin), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch_q11_important_parts",
    oracle=(
        "WITH v AS (SELECT l_partkey AS partkey, "
        "sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS val "
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'EUROPE' GROUP BY l_partkey) "
        "SELECT partkey, CAST(round(val, 2) AS DOUBLE) AS part_value "
        "FROM v WHERE CAST(val AS DECIMAL(20,8)) * (SELECT count(*) FROM v) > "
        "2 * (SELECT CAST(sum(val) AS DECIMAL(28,8)) FROM v) "
        "ORDER BY val DESC, partkey"
    ),
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value filtered against a scalar fraction
    of the global total (HAVING sum > f * SUM-over-everything).

    Numeric discipline: the threshold test is integer-scaled DECIMAL
    (val * n_parts > 2 * total, i.e. share > 2x the average — scale
    invariant, unlike TPC-H's SF-tuned constant) — no double division and
    no precision-loss multiply ((20,8) x (10,0) stays under 38 digits), so
    the boundary row set is bit-identical on both engines.  Scale: one
    partial-agg shuffle on partkey; the global total+count is a 1-row
    broadcast probed map-side; no second fact scan.
    """
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,4)")
    )
    v = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(rev).alias("val"))
    )
    total = v.agg(
        F.sum("val").cast("decimal(28,8)").alias("total"),
        F.count("*").cast("decimal(10,0)").alias("n_parts"),
    )
    return (
        v.join(F.broadcast(total))
        .where(
            F.col("val").cast("decimal(20,8)") * F.col("n_parts")
            > F.lit(2) * F.col("total")
        )
        .select("partkey", F.round(F.col("val"), 2).cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "partkey")
    )


@query(
    "tpch_q16_supplier_part_counts",
    oracle=(
        "SELECT p_brand, p_type, p_size, "
        "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
        "FROM part JOIN lineitem ON p_partkey = l_partkey "
        "WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' "
        "AND p_size IN (1, 4, 9, 16, 25, 36, 49) "
        "AND l_suppkey NOT IN "
        "(SELECT s_suppkey FROM supplier WHERE s_name LIKE '%00000007%') "
        "GROUP BY p_brand, p_type, p_size "
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 30"
    ),
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT) per part attribute triple with a
    NOT IN anti-subquery on the supplier side.

    Scale: NOT IN decorrelates to a broadcast LEFT ANTI join (the excluded
    supplier list is tiny); the distinct-count shuffles (brand, type,
    size, suppkey) once, then a cheap regroup — Spark's two-phase
    distinct-agg expansion, no row explosion.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    excluded = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_name").like("%00000007%"))
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(excluded), li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(30)
    )


@query(
    "tpch_q20_promotable_suppliers",
    oracle=(
        "SELECT s_suppkey, s_name FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE n_name = 'NATION_2' AND s_suppkey IN ("
        "SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE p_name LIKE '%gear%' "
        "AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' "
        "GROUP BY l_suppkey, l_partkey "
        "HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 45) "
        "ORDER BY s_suppkey"
    ),
)
def tpch_q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN over a grouped-HAVING subquery (suppliers that
    shipped > 45 units of any matching part in 1996; availqty semantics
    adapted — no partsupp in this corpus).

    Scale: the inner agg prunes lineitem by date + part-name before
    grouping; the qualifying supplier set is distinct-projected and the
    outer IN becomes a LEFT SEMI join on s_suppkey; nation broadcast.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    qualifying = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty"))
        .where(F.col("qty") > 45)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q12_priority_shipping",
    oracle=(
        "SELECT l_returnflag AS ship_class, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
        "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "GROUP BY ship_class ORDER BY ship_class"
    ),
)
def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (completes the head pack Q1-Q22): fact-fact join
    with conditional aggregation — lines shipped in 1996 classified by
    whether their order was high priority (this corpus has no
    l_shipmode/commitdate/receiptdate; l_returnflag stands in for the
    shipmode group and the year filter for the receipt window).

    Scale: the date filter is pushed into the lineitem scan (prunes ~85%
    of the fact pre-join); orders is a fact table too, so the join is a
    shuffle hash join on orderkey — Q12's defining cost — with only
    (orderkey, priority) on the orders side after pruning.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.select("l_orderkey", "l_returnflag")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


_FK_EDGES = [
    # (fk_name, child_table, child_key, parent_table, parent_key)
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _fk_audit_oracle_sql() -> str:
    parts = []
    for name, ct, ck, pt, pk in _FK_EDGES:
        parts.append(
            f"SELECT '{name}' AS fk_name, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM {ct}) AS n_child, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM {ct} c WHERE NOT EXISTS "
            f"(SELECT 1 FROM {pt} p WHERE p.{pk} = c.{ck})) AS n_orphans, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM {pt}) AS n_parents, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM {pt} p WHERE NOT EXISTS "
            f"(SELECT 1 FROM {ct} c WHERE c.{ck} = p.{pk})) AS n_childless"
        )
        parts.append("UNION ALL")
    return " ".join(parts[:-1]) + " ORDER BY fk_name"


@query("tpch_fk_orphan_audit", oracle=_fk_audit_oracle_sql())
def tpch_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across every foreign-key edge of the
    schema graph — the data-quality sweep a 100 TB warehouse runs after
    each load (orphaned children = broken joins downstream; childless
    parents = dead dimension rows): for each of the seven FK edges,
    child volume, orphan count (child keys with no parent — anti-join),
    parent volume, and childless-parent count (parents never referenced
    — anti-join the other way).  The clean-load invariant (0 orphans on
    TPC-H-shaped data, a known childless-order population) is pinned by
    the oracle's NOT EXISTS pairs.

    Scale: each direction is one anti-join — dimension-sized sides
    broadcast (nation/region/supplier/customer), fact-fact pairs
    (lineitem vs orders) shuffle on the key once; child counts ride the
    same scans.  Verification never materializes violating ROWS, only
    counts — the report stays 7 rows whatever the table sizes.
    """
    rows = []
    for name, ct, ck, pt, pk in _FK_EDGES:
        child = _t(spark, sf_dir, ct).select(F.col(ck).alias("k"))
        parent = _t(spark, sf_dir, pt).select(F.col(pk).alias("k"))
        small_parent = pt in ("nation", "region", "supplier", "customer", "part")
        orphans = child.join(
            F.broadcast(parent) if small_parent else parent, "k", "left_anti"
        )
        childless = parent.join(child, "k", "left_anti")
        rows.append(
            child.agg(F.count("*").cast("bigint").alias("n_child"))
            .crossJoin(orphans.agg(F.count("*").cast("bigint").alias("n_orphans")))
            .crossJoin(parent.agg(F.count("*").cast("bigint").alias("n_parents")))
            .crossJoin(
                childless.agg(F.count("*").cast("bigint").alias("n_childless"))
            )
            .select(
                F.lit(name).alias("fk_name"),
                "n_child", "n_orphans", "n_parents", "n_childless",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("fk_name")
