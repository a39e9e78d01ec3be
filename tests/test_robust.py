"""Exact grouped median / MAD semantics (operators/robust.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_cluster_hash_spark.operators.robust import (
    grouped_median_x2,
    volume_anomaly_mad,
)


def test_grouped_median_x2_odd_and_even(spark):
    rows = [
        # odd count: median of {1, 3, 10} = 3 -> med_x2 = 6
        ("a", 0, 1), ("a", 1, 10), ("a", 2, 3),
        # even count: middles of {2, 4, 6, 100} are 4, 6 -> med_x2 = 10
        ("b", 0, 4), ("b", 1, 100), ("b", 2, 2), ("b", 3, 6),
        # singleton: med_x2 = 2 * 7
        ("c", 0, 7),
    ]
    df = spark.createDataFrame(rows, "g string, t int, n long")
    got = {
        r.g: r.med_x2
        for r in grouped_median_x2(df, "g", "n", ["t"]).collect()
    }
    assert got == {"a": 6, "b": 10, "c": 14}


def test_volume_anomaly_flags_spike_not_constant_noise(spark):
    # group "x": 9 quiet days at 100 +/- 2 and one 10x spike; MAD ignores
    # the spike, so the spike (and only the spike) flags at k=3
    quiet = [("x", d, 100 + (d % 3) - 1) for d in range(9)]
    rows = quiet + [("x", 9, 1000)]
    # group "y": perfectly constant -> mad_x2 = 0, nothing deviates
    rows += [("y", d, 50) for d in range(10)]
    df = spark.createDataFrame(rows, "g string, t int, n long")
    got = {
        r.g: (r.med_x2, r.mad_x2, r.n_periods, r.n_anomalous)
        for r in volume_anomaly_mad(df, "g", "t", "n").collect()
    }
    med_x, mad_x, n_x, anom_x = got["x"]
    assert n_x == 10 and anom_x == 1  # only the spike
    assert med_x == 200  # median stays at the quiet level
    assert got["y"] == (100, 0, 10, 0)  # constant: zero MAD, zero flags


def test_constant_series_with_one_blip_flags_blip(spark):
    # mad_x2 = 0 degenerate: any nonzero deviation must flag
    rows = [("z", d, 10) for d in range(9)] + [("z", 9, 11)]
    df = spark.createDataFrame(rows, "g string, t int, n long")
    (r,) = volume_anomaly_mad(df, "g", "t", "n").collect()
    assert r.mad_x2 == 0 and r.n_anomalous == 1


def test_grouped_median_x2_matches_statistics_median_property(spark):
    """Hypothesis-style sweep: med_x2 == 2 * statistics.median for every
    multiset of ints (statistics.median averages the two middles, so
    2 * median is exactly the middle sum our doubled form computes)."""
    import random
    import statistics
    from fractions import Fraction

    rng = random.Random(20240814)
    cases = []
    for g in range(12):
        n = rng.randint(1, 17)
        vals = [rng.randint(-1000, 1000) for _ in range(n)]
        cases.append((f"g{g}", vals))
    rows = [
        (g, i, v) for g, vals in cases for i, v in enumerate(vals)
    ]
    from duckdb_cluster_hash_spark.operators.robust import grouped_median_x2

    df = spark.createDataFrame(rows, "g string, t int, n long")
    got = {r.g: r.med_x2 for r in grouped_median_x2(df, "g", "n", ["t"]).collect()}
    for g, vals in cases:
        want = 2 * Fraction(statistics.median(vals))
        assert want.denominator == 1
        assert got[g] == int(want), (g, sorted(vals))
