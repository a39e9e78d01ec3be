"""Custom join operators Spark's API lacks (SURVEY.md task scope:
"as-of join, range join" as compositions of existing DataFrame ops).

- **as-of join**: for each left row, the single latest right row with
  right_time <= left_time within the same key — pandas ``merge_asof`` /
  DuckDB ``ASOF JOIN`` semantics.  Implemented as union + running
  ``last(ignorenulls)`` window, NOT a join at all: one shuffle on
  (key), no range-condition fallback to broadcast-nested-loop, state
  linear in rows.  This shape scales to 100 TB because it inherits sort
  -merge machinery (partition by key, sort by time) instead of
  materializing candidate pairs.
- **range join**: pairs within a time interval, driven through the
  *equality* key so Spark plans a sort-merge join with the range as a
  post-filter, never a cartesian product.

Both compare INTEGER MICROSECONDS (``unix_micros``), which DuckDB
reproduces exactly (``epoch_us``) — raw timestamp comparison would be
ns-vs-us precision-dependent across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: latest right row with right_ts <= left_ts per key.

    Ties at equal time match (inclusive, like DuckDB ``ASOF JOIN ...
    ON l.t >= r.t``).  Left rows with no prior right row keep NULLs.
    Returns all left columns plus ``prefix + value_col`` for each value
    column and ``prefix + 'ts_us'``.
    """
    lt = left.withColumn("_us", F.unix_micros(F.col(left_ts)))
    # ASOF semantics: a right row with NULL time can never be "the latest
    # prior row" — drop it, or last(ignorenulls) would leak its value
    # columns as a phantom earliest match (NULLs sort first).
    rt = right.withColumn("_us", F.unix_micros(F.col(right_ts))).where(
        F.col("_us").isNotNull()
    )

    left_cols = [c for c in left.columns]
    tagged_left = lt.select(
        F.col(by).alias("_by"),
        "_us",
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
        *[F.lit(None).cast(rt.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast("long").alias("_r_us"),
    )
    tagged_right = rt.select(
        F.col(by).alias("_by"),
        "_us",
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(lt.schema[c].dataType).alias(f"_l_{c}") for c in left_cols],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col("_us").alias("_r_us"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    # right rows sort before left rows at equal time -> inclusive match;
    # value columns are tertiary sort keys so ties among right rows with
    # identical (key, microsecond) resolve deterministically (last() then
    # always picks the greatest value tuple) instead of per-run arbitrarily
    w = (
        Window.partitionBy("_by")
        .orderBy("_us", "_side", *[f"_r_{c}" for c in value_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols
        ],
        F.last("_r_us", ignorenulls=True).over(w).alias("_f_us"),
    )
    return filled.where(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[F.col(f"_f_{c}").alias(f"{prefix}{c}") for c in value_cols],
        F.col("_f_us").alias(f"{prefix}ts_us"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """Pairs with right_ts - left_ts in [lower_us, upper_us] micros,
    same key.  The equality on ``by`` makes Spark plan a shuffled join
    with the interval as a residual filter — never a cross product."""
    lt = left.select(
        F.col(by).alias("_by"),
        F.unix_micros(F.col(left_ts)).alias("_lus"),
        *[F.col(c).alias(f"l_{c}") for c in left_cols],
    )
    rt = right.select(
        F.col(by).alias("_by2"),
        F.unix_micros(F.col(right_ts)).alias("_rus"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
    )
    delta = F.col("_rus") - F.col("_lus")
    return (
        lt.join(
            rt,
            (F.col("_by") == F.col("_by2"))
            & (delta >= F.lit(lower_us))
            & (delta <= F.lit(upper_us)),
        )
        .select(
            F.col("_by").alias(by),
            *[f"l_{c}" for c in left_cols],
            *[f"r_{c}" for c in right_cols],
            delta.alias("delta_us"),
        )
    )
