"""Distributed global ranking — row_number / ntile without the
single-partition sort (SURVEY.md §2 scale notes).

``Window.orderBy(...)`` with no partition key forces ``Exchange
SinglePartition``: the whole input crosses one reducer — the classic
scale killer for "rank every customer / document globally" queries.
The exact, scalable alternative is the same two-level pattern as
``sampling.token_shards``:

1. ``repartitionByRange`` on the order key — Spark's range partitioner
   puts partition *i*'s rows entirely before partition *i+1*'s in the
   global order (boundaries come from sampling, which affects only
   balance, never correctness);
2. ``row_number`` windows partitioned by the physical partition id —
   N independent parallel sorts;
3. per-partition row counts (one tiny N-row table) prefix-summed into
   offsets and broadcast back: ``global_rank = offset + local_rank``.

Only the N-row counts table is ever globally ordered.  ntile is then a
pure expression over (rank, total): the SQL-standard allocation gives
the first ``n mod k`` tiles ``ceil(n/k)`` rows and the rest
``floor(n/k)`` — integer arithmetic both engines reproduce exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "global_row_number",
    "grouped_row_number",
    "ntile_exact",
    "ordered_prefix_sum",
]

# Production default: eagerly localCheckpoint the range-partitioned frame so
# BOTH consumers (local windows + counts) share one materialized _pid
# assignment — repartitionByRange samples boundaries with a per-execution
# seed and spark_partition_id is layout-dependent, so recomputation under
# AQE re-plan / stage retry / exchange-reuse-off could hand the two branches
# different partitionings and silently corrupt ranks.  Plan-shape tests
# flip this off (monkeypatch) to assert the range exchange + local sorts in
# the un-truncated lineage; the constructed plan is identical either way —
# the checkpoint only pins where it is cut.
MATERIALIZE_RANGED = True


def _pin(ranged: "DataFrame") -> "DataFrame":
    return ranged.localCheckpoint(eager=True) if MATERIALIZE_RANGED else ranged


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    n_buckets: int = 256,
    out_col: str = "rn",
) -> DataFrame:
    """Add a 1-based global row number in ``order_cols`` order without a
    single-partition sort.  The order key must be total (add a unique
    tie-break column); equal keys never split across range partitions,
    so ranks are exact for any sampled boundaries.

    Size ``n_buckets`` so a bucket's rows fit one executor's sort budget
    (rows/n_buckets per task): 256 suits up to ~10^9 input rows; beyond
    that pass a larger value — the offsets table stays n_buckets rows
    and is the only globally-ordered data either way.

    The ranged frame is localCheckpoint'ed (eager): it feeds TWO plan
    branches (local windows + counts), and both must see the SAME range
    boundaries and ``spark_partition_id`` assignment.  Range boundaries
    come from sampling with a per-execution seed and _pid is
    layout-dependent, so without materialization an AQE re-plan, stage
    retry, or ``spark.sql.exchange.reuse=false`` could hand the two
    branches different partitionings and silently corrupt ranks.
    """
    ranged = _pin(
        df.repartitionByRange(n_buckets, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    local = ranged.withColumn(
        "_lrn", F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols))
    )
    counts = ranged.groupBy("_pid").agg(F.count("*").alias("_c"))
    # the ONLY globally-ordered data: one row per range bucket
    over_pids = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = counts.select(
        "_pid", (F.sum("_c").over(over_pids) - F.col("_c")).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lrn")).cast("bigint"))
        .drop("_pid", "_lrn", "_off")
    )


def grouped_row_number(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    n_buckets: int = 256,
    out_col: str = "rn",
) -> DataFrame:
    """Per-group 1-based row number in ``order_cols`` order — the
    stratified twin of :func:`global_row_number`.

    A plain ``Window.partitionBy(group).orderBy(...)`` is keyed, but one
    hot stratum (one language holding 60% of a 100 TB corpus) becomes a
    single reducer's sort.  Same two-level fix: range-partition on
    (group, order) — for a fixed group, bucket i's rows all precede
    bucket i+1's in the order — then per-(bucket, group) local windows,
    and per-group offsets prefix-summed over the tiny
    n_buckets x |groups| counts table (the only data ordered outside
    the buckets; broadcast back).  Order key must be total within each
    group (add a unique tie-break).

    As in :func:`global_row_number`, the ranged frame is eagerly
    localCheckpoint'ed so both consumers (local windows, counts) share
    one materialized _pid assignment — sampled range boundaries are not
    replay-stable across exchange re-computation.
    """
    gcols = [F.col(c) for c in group_cols]
    ranged = _pin(
        df.repartitionByRange(n_buckets, *gcols, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    local = ranged.withColumn(
        "_lrn",
        F.row_number().over(
            Window.partitionBy("_pid", *group_cols).orderBy(*order_cols)
        ),
    )
    counts = ranged.groupBy("_pid", *group_cols).agg(F.count("*").alias("_c"))
    over_pids = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.select(
        "_pid",
        *group_cols,
        (F.sum("_c").over(over_pids) - F.col("_c")).alias("_off"),
    )
    return (
        local.join(F.broadcast(offsets), ["_pid", *group_cols])
        .withColumn(out_col, (F.col("_off") + F.col("_lrn")).cast("bigint"))
        .drop("_pid", "_lrn", "_off")
    )


def ntile_exact(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    n_buckets: int = 256,
    out_col: str = "tile",
) -> DataFrame:
    """SQL-standard ``ntile(k)`` over a total order, scalably.

    Allocation rule (what Spark's and DuckDB's ntile both implement):
    with q = n div k and rem = n mod k, the first ``rem`` tiles hold
    q+1 rows, the rest q.  For 1-based rank r:

    - r <= rem*(q+1):  tile = ceil(r / (q+1))
    - else:            tile = rem + ceil((r - rem*(q+1)) / q)

    Pure integer arithmetic over (rank, total) — ``div``-based quotients
    and ``(a + d - 1) div d`` ceilings, no double-precision division
    anywhere, so the allocation is bit-exact on both engines at ANY row
    count (not just below 2^53); ``greatest(q, 1)`` guards the
    (never-taken at k > n is false; taken when k >= n makes the else
    branch dead) division.
    """
    ranked = global_row_number(df, order_cols, n_buckets=n_buckets, out_col="_rn")
    total = ranked.groupBy().agg(F.count("*").alias("_n"))
    k_lit = int(k)
    staged = (
        ranked.join(F.broadcast(total))
        .withColumn("_q", F.expr(f"_n div {k_lit}"))
        .withColumn("_rem", F.col("_n") % F.lit(k_lit))
        .withColumn("_qs", F.greatest(F.col("_q"), F.lit(1).cast("bigint")))
        .withColumn("_head", F.col("_rem") * (F.col("_q") + F.lit(1)))
    )
    tile = (
        # ceil(r / (q+1)) == (r + q) div (q + 1); ceil(x / qs) == (x + qs - 1) div qs
        F.when(F.col("_rn") <= F.col("_head"), F.expr("(_rn + _q) div (_q + 1)"))
        .otherwise(F.col("_rem") + F.expr("(_rn - _head + _qs - 1) div _qs"))
        .cast("int")
    )
    return (
        staged.withColumn(out_col, tile)
        .drop("_rn", "_n", "_q", "_rem", "_qs", "_head")
    )


def ordered_prefix_sum(
    df: DataFrame,
    order_cols: list[Column],
    val_col: str,
    n_buckets: int = 256,
    out_col: str = "cum",
) -> DataFrame:
    """Add an INCLUSIVE running sum of ``val_col`` in ``order_cols``
    order without a single-partition sort — the cumulative-share /
    Pareto primitive, built exactly like :func:`global_row_number`:
    range partition on the order key, N parallel local running sums,
    then broadcast per-partition totals prefix-summed over the only
    globally-ordered table (n_buckets rows).

    The order key must be total (include a unique tie-break) so the
    running sum is a pure function of the data, not the layout.

    Eagerly localCheckpoint'ed for the same two-consumer _pid-stability
    reason as :func:`global_row_number`.
    """
    ranged = _pin(
        df.repartitionByRange(n_buckets, *order_cols).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    in_part = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_lcum", F.sum(val_col).over(in_part))
    totals = ranged.groupBy("_pid").agg(F.sum(val_col).alias("_t"))
    over_pids = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.select(
        "_pid", (F.sum("_t").over(over_pids) - F.col("_t")).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lcum")).cast("bigint"))
        .drop("_pid", "_lcum", "_off")
    )
