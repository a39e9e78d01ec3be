"""Robust statistics in exact integer arithmetic (grouped median / MAD).

Medians and median-absolute-deviations are the robust alternatives to
mean/stddev for volume monitoring, but the obvious implementations are
engine-divergent: DuckDB's ``median`` averages the two middle values of
an even-count group into a double, Spark's ``percentile_approx`` is
approximate by design.  Both break the bit-exact oracle contract.

The portable form keeps everything doubled: ``med_x2`` = the SUM of the
two middle values (odd count: twice the middle value), an integer for
integer inputs, so ``median = med_x2 / 2`` exactly and every comparison
against it can be phrased in integers (``|2x - med_x2|`` is twice the
absolute deviation).  The MAD doubles the same way, and the classic
"flag when |x - med| > k * MAD" test becomes the pure-integer
``|2x - med_x2| > k * mad_x2``.

Scale: both passes are rank windows PARTITIONED BY THE GROUP over
already-aggregated series (e.g. per-type daily counts — days, not raw
events), so no single-partition exchange and no raw-data window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["grouped_median_x2", "volume_anomaly_mad"]


def grouped_median_x2(
    df: DataFrame,
    group_col: str,
    val_col: str,
    tie_cols: list[str],
    out_col: str = "med_x2",
) -> DataFrame:
    """Per-group exact doubled median of an integer column.

    Picks the lower/upper middle ranks ``lo = (n+1) div 2`` and
    ``hi = (n+2) div 2`` of the values sorted ``(val, *tie_cols)`` and
    sums them (the same row twice when n is odd).  The tie-break only
    fixes WHICH equal-valued row holds the rank — the summed values are
    a pure function of the multiset.
    """
    by_group = Window.partitionBy(group_col)
    ordered = Window.partitionBy(group_col).orderBy(
        F.col(val_col), *[F.col(c) for c in tie_cols]
    )
    t = (
        df.withColumn("_r", F.row_number().over(ordered))
        .withColumn("_cnt", F.count("*").over(by_group))
        .withColumn("_lo", F.expr("(_cnt + 1) div 2"))
        .withColumn("_hi", F.expr("(_cnt + 2) div 2"))
    )
    pick = (
        F.when(
            (F.col("_r") == F.col("_lo")) & (F.col("_r") == F.col("_hi")),
            2 * F.col(val_col),
        )
        .when(
            (F.col("_r") == F.col("_lo")) | (F.col("_r") == F.col("_hi")),
            F.col(val_col),
        )
        .otherwise(F.lit(0))
    )
    return t.groupBy(group_col).agg(
        F.sum(pick).cast("bigint").alias(out_col)
    )


def volume_anomaly_mad(
    daily: DataFrame,
    group_col: str,
    time_col: str,
    n_col: str,
    k: int = 3,
) -> DataFrame:
    """Per-group robust volume-anomaly report over a (group, time, count)
    series: doubled median, doubled MAD, and how many periods violate
    ``|2n - med_x2| > k * mad_x2`` — the median/MAD twin of z-score
    alerting, immune to the outliers it is hunting.

    A constant series has mad_x2 = 0, so ANY deviation flags — the
    correct degenerate behavior for "this never changes" volumes.
    """
    med = grouped_median_x2(daily, group_col, n_col, [time_col])
    dev = daily.join(F.broadcast(med), group_col).withColumn(
        "_d", F.abs(2 * F.col(n_col) - F.col("med_x2")).cast("bigint")
    )
    mad = grouped_median_x2(
        dev, group_col, "_d", [time_col], out_col="mad_x2"
    )
    flagged = dev.join(F.broadcast(mad), group_col)
    return (
        flagged.groupBy(group_col, "med_x2", "mad_x2")
        .agg(
            F.count("*").cast("bigint").alias("n_periods"),
            F.sum(
                (F.col("_d") > F.lit(int(k)) * F.col("mad_x2")).cast("bigint")
            )
            .cast("bigint")
            .alias("n_anomalous"),
        )
        .orderBy(group_col)
    )
