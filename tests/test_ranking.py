"""Distributed ranking semantics: global_row_number / ntile_exact must
reproduce the single-partition window results exactly, at any bucket
count, including ties broken by the tie-break column."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_cluster_hash_spark.operators.ranking import global_row_number, ntile_exact


@pytest.fixture(autouse=True)
def _small_buckets():
    """The adaptive bucket count would collapse these few-hundred-row
    fixtures to a single bucket (correct, but the cut/binary-search
    machinery would go untested); shrink the rows-per-bucket target so
    the callers' n_buckets parameters take effect as written."""
    from duckdb_cluster_hash_spark.operators import ranking

    saved = ranking._TARGET_ROWS_PER_BUCKET
    ranking._TARGET_ROWS_PER_BUCKET = 16
    ranking.clear_cut_memo()
    try:
        yield
    finally:
        ranking._TARGET_ROWS_PER_BUCKET = saved
        ranking.clear_cut_memo()


@pytest.fixture(scope="module")
def scored(spark):
    # duplicate scores force the tie-break; 997 rows exercises uneven tiles
    return spark.range(0, 997).select(
        F.col("id"), (F.col("id") % 37).alias("score")
    ).cache()


def test_global_row_number_matches_window(spark, scored):
    order = [F.desc("score"), F.asc("id")]
    got = {
        r["id"]: r["rn"]
        for r in global_row_number(scored, order, n_buckets=16).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in scored.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("k", [1, 3, 10, 997, 2000])
def test_ntile_exact_matches_ntile(spark, scored, k):
    order = [F.desc("score"), F.asc("id")]
    got = {
        r["id"]: r["tile"]
        for r in ntile_exact(scored, order, k, n_buckets=8).collect()
    }
    want = {
        r["id"]: r["t"]
        for r in scored.withColumn(
            "t", F.ntile(k).over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_ntile_exact_allocation_property(spark):
    """Hypothesis-style sweep: for many (n, k), ntile_exact must produce
    the SQL-standard allocation — first n mod k tiles hold ceil(n/k)
    rows, the rest floor(n/k), tiles contiguous in rank order."""
    from collections import Counter

    for n, k in [(1, 1), (2, 5), (7, 3), (50, 7), (101, 10), (256, 256), (400, 9)]:
        df = spark.range(0, n).select(F.col("id"))
        rows = ntile_exact(df, [F.asc("id")], k, n_buckets=4).collect()
        by_id = {r["id"]: r["tile"] for r in rows}
        # contiguity: tile is non-decreasing in rank order
        tiles = [by_id[i] for i in range(n)]
        assert tiles == sorted(tiles), (n, k)
        sizes = Counter(tiles)
        q, rem = divmod(n, k)
        expect = {t: q + 1 for t in range(1, rem + 1)}
        expect.update({t: q for t in range(rem + 1, k + 1) if q})
        assert dict(sizes) == expect, (n, k, dict(sizes))


def test_ordered_prefix_sum_matches_single_partition_window(spark):
    """ordered_prefix_sum must equal the naive global-window running sum
    on any data, including duplicate order keys broken by the tie."""
    from pyspark.sql import Window

    from duckdb_cluster_hash_spark.operators.ranking import ordered_prefix_sum

    rows = [(i, (i * 37) % 11, (i * 13) % 5) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long, grp long")
    got = {
        r.id: r.cum
        for r in ordered_prefix_sum(
            df, [F.desc("v"), F.asc("id")], "v", n_buckets=7
        ).collect()
    }
    w = Window.orderBy(F.desc("v"), F.asc("id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {r.id: r.cum for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert got == want


def test_grouped_row_number_matches_partitioned_window(spark, scored):
    from duckdb_cluster_hash_spark.operators.ranking import grouped_row_number

    df = scored.withColumn("grp", (F.col("id") % 5).cast("string"))
    order = [F.desc("score"), F.asc("id")]
    got = {
        (r["grp"], r["id"]): r["rn"]
        for r in grouped_row_number(df, ["grp"], order, n_buckets=16).collect()
    }
    want = {
        (r["grp"], r["id"]): r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.partitionBy("grp").orderBy(*order))
        ).collect()
    }
    assert got == want


def test_grouped_row_number_skewed_group(spark):
    """One group holding ~90% of rows must still rank exactly (the hot-
    stratum case grouped_row_number exists for)."""
    from duckdb_cluster_hash_spark.operators.ranking import grouped_row_number

    df = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") < 900, "hot").otherwise("cold").alias("grp"),
    )
    out = grouped_row_number(df, ["grp"], [F.asc("id")], n_buckets=8).collect()
    ranks = {}
    for r in out:
        ranks.setdefault(r["grp"], []).append(r["rn"])
    assert sorted(ranks["hot"]) == list(range(1, 901))
    assert sorted(ranks["cold"]) == list(range(1, 101))


def test_ranks_stable_without_exchange_reuse(spark, scored):
    """The rank construction consumes the range-partitioned frame in two
    plan branches; with exchange reuse and AQE disabled Spark would
    otherwise execute the (sampled-boundary, layout-dependent)
    repartitionByRange once PER BRANCH, and offsets could disagree with
    local row numbers.  The eager localCheckpoint pins one _pid
    assignment for both branches — this test runs the construction with
    both crutches off and must still match the single-window truth."""
    from duckdb_cluster_hash_spark.operators.ranking import (
        grouped_row_number,
        ordered_prefix_sum,
    )

    confs = {
        "spark.sql.exchange.reuse": "false",
        "spark.sql.adaptive.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        order = [F.desc("score"), F.asc("id")]
        got = {
            r["id"]: r["rn"]
            for r in global_row_number(scored, order, n_buckets=16).collect()
        }
        want = {
            r["id"]: r["rn"]
            for r in scored.withColumn(
                "rn", F.row_number().over(Window.orderBy(*order))
            ).collect()
        }
        assert got == want
        grouped = spark.range(0, 500).select(
            (F.col("id") % 3).alias("g"), F.col("id"), (F.col("id") % 11).alias("s")
        )
        gorder = [F.desc("s"), F.asc("id")]
        ggot = {
            (r["g"], r["id"]): r["rn"]
            for r in grouped_row_number(
                grouped, ["g"], gorder, n_buckets=8
            ).collect()
        }
        gwant = {
            (r["g"], r["id"]): r["rn"]
            for r in grouped.withColumn(
                "rn",
                F.row_number().over(Window.partitionBy("g").orderBy(*gorder)),
            ).collect()
        }
        assert ggot == gwant
        cgot = {
            r["id"]: r["cum"]
            for r in ordered_prefix_sum(
                scored, [F.asc("id")], "score", n_buckets=8
            ).collect()
        }
        cwant = {
            r["id"]: r["cum"]
            for r in scored.withColumn(
                "cum",
                F.sum("score").over(
                    Window.orderBy("id").rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                ),
            ).collect()
        }
        assert cgot == cwant
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ranks_survive_pin_loss_mid_plan(spark, scored):
    """Executor-loss equivalent: build the ranked frame, then UNPERSIST
    the pinned input (simulating every cached/checkpointed block being
    lost) BEFORE collecting.  The collect recomputes both plan branches
    from lineage — bucket ids are pure functions of (data, literal
    cuts), so the recomputed ranks must still be exact.  This is the
    durability property the old localCheckpoint construction did NOT
    have (sampled range boundaries + spark_partition_id are not
    replay-stable)."""
    from duckdb_cluster_hash_spark.operators import ranking

    order = [F.desc("score"), F.asc("id")]
    out = ranking.global_row_number(scored, order, n_buckets=16)
    gout = ranking.grouped_row_number(
        scored.withColumn("grp", (F.col("id") % 5).cast("string")),
        ["grp"],
        order,
        n_buckets=16,
        out_col="grn",
    )
    released = ranking.release_rank_pins()
    assert released >= 1  # the inputs really were pinned, and are now gone
    got = {r["id"]: r["rn"] for r in out.collect()}
    want = {
        r["id"]: r["rn"]
        for r in scored.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want
    ggot = {(r["grp"], r["id"]): r["grn"] for r in gout.collect()}
    gwant = {
        (r["grp"], r["id"]): r["rn"]
        for r in scored.withColumn("grp", (F.col("id") % 5).cast("string"))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("grp").orderBy(*order))
        )
        .collect()
    }
    assert ggot == gwant


def test_ranks_identical_with_and_without_pin(spark, scored):
    """PIN_INPUT is an optimization only: the unpinned lineage (every
    branch recomputed independently, no cache anywhere) must produce
    byte-identical ranks — the pure-function-of-data contract."""
    from duckdb_cluster_hash_spark.operators import ranking

    order = [F.desc("score"), F.asc("id")]
    pinned = {
        r["id"]: r["rn"]
        for r in ranking.global_row_number(scored, order, n_buckets=16).collect()
    }
    saved = ranking.PIN_INPUT
    try:
        ranking.PIN_INPUT = False
        unpinned = {
            r["id"]: r["rn"]
            for r in ranking.global_row_number(
                scored, order, n_buckets=16
            ).collect()
        }
    finally:
        ranking.PIN_INPUT = saved
        ranking.release_rank_pins()
    assert pinned == unpinned


def test_adaptive_bucket_count_and_no_count_job(spark, scored):
    """The construction must (a) collapse a tiny frame to few buckets
    under the data-scaled sizing (driver plan-build cost was the r12
    regression), (b) honor the caller's n_buckets as a CAP, and (c)
    never run an exact count() job — ranks and ntile totals must be
    exact either way."""
    from duckdb_cluster_hash_spark.operators import ranking

    ranking._TARGET_ROWS_PER_BUCKET = 8192  # undo the autouse shrink
    ranking.clear_cut_memo()
    counted = {"n": 0}
    orig = type(scored).count

    def _spy(self):
        counted["n"] += 1
        return orig(self)

    type(scored).count = _spy
    try:
        out = ntile_exact(scored, [F.asc("id")], 10, n_buckets=256)
        got = {r["id"]: r["tile"] for r in out.collect()}
    finally:
        type(scored).count = orig
    # 997 rows → 1 bucket at 8192 rows/bucket: the bucket column exists
    # but the plan carries no cut literals, and no count job ran (the
    # spark.range lineage carries an exact rowCount statistic)
    assert counted["n"] == 0
    want = {
        r["id"]: r["t"]
        for r in scored.withColumn(
            "t", F.ntile(10).over(Window.orderBy(F.asc("id")))
        ).collect()
    }
    assert got == want
    # the estimate honors the caller's cap: a 997-row frame at target 16
    # wants ceil(997/16)=63 buckets but a cap of 4 wins
    ranking._TARGET_ROWS_PER_BUCKET = 16
    ranking.clear_cut_memo()
    arr, m = ranking._cut_array(
        scored, ranking._order_specs([F.asc("id")]), 4
    )
    assert 1 <= m <= 3


def test_order_spec_rejects_exotic_sort_wrappers(spark, scored):
    """Unsupported sort forms must fail loudly at build time, never
    mis-bucket: non-default null ordering and sort-wrapped compound
    expressions have no bucket normalization."""
    import pytest as _pytest

    from duckdb_cluster_hash_spark.operators.ranking import global_row_number

    with _pytest.raises(ValueError):
        global_row_number(scored, [F.col("score").desc_nulls_first()])
    with _pytest.raises(ValueError):
        global_row_number(scored, [(F.col("score") + F.col("id")).desc()])
    # descending STRING has no order-reversing normalization
    with _pytest.raises(ValueError):
        global_row_number(
            scored.withColumn("s", F.col("id").cast("string")), [F.desc("s")]
        )
