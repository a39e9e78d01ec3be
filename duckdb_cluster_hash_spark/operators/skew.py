"""Skew-mitigation operators (SURVEY.md §2 Tier C, 100 TB scale notes).

Hot keys are the failure mode of every shuffle at scale: one executor
receives a whole key's rows while the rest idle.  Two standard remedies,
expressed as reusable DataFrame transforms:

- **salted aggregation** — two-phase: aggregate on (key, salt) first
  (spreads one hot key over S partitions), then merge partials.  Exact
  for any algebraic aggregate; helpers provided for count/sum/min/max.
- **salted broadcast-side join** — replicate the small side S times so a
  skewed fact key joins against S partitions.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default here) handles *sort-merge join* skew at runtime; explicit salting
remains necessary for aggregation skew and for deterministic layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "salted_count", "salted_agg", "replicate_for_salted_join"]


def with_salt(df: DataFrame, buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Add a deterministic pseudo-random salt in [0, buckets).

    Row-content hash PLUS monotonically_increasing_id: the content hash
    alone would send fully-identical duplicate rows (the classic hot-key
    case salting exists for) to one bucket; the id term spreads them and
    stays deterministic on task retry (it is a function of partition id
    and position, both stable for a fixed input layout).
    """
    return df.withColumn(
        salt_col,
        F.pmod(
            F.xxhash64(*df.columns) + F.monotonically_increasing_id(),
            F.lit(buckets),
        ).cast("int"),
    )


def salted_count(df: DataFrame, key_cols: list[str], buckets: int = 32) -> DataFrame:
    """groupBy(key).count() that survives hot keys.

    Phase 1 aggregates (key, salt) — a hot key spreads over ``buckets``
    reducers; phase 2 merges the (at most ``buckets``) partials per key.
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(*key_cols).agg(F.sum("_c").alias("count"))


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation for algebraic functions.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, min, max, count}.  Merge phase uses sum for count and the
    function itself otherwise (all are semigroup ops).
    """
    salted = with_salt(df, buckets)
    phase1, phase2 = [], []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1.append(F.count(col).alias(out))
            phase2.append(F.sum(out).cast("bigint").alias(out))
        else:
            phase1.append(getattr(F, fn)(col).alias(out))
            phase2.append(getattr(F, fn)(out).alias(out))
    partial = salted.groupBy(*key_cols, "_salt").agg(*phase1)
    return partial.groupBy(*key_cols).agg(*phase2)


def replicate_for_salted_join(
    small: DataFrame, buckets: int, salt_col: str = "_salt"
) -> DataFrame:
    """Replicate the small side of a join once per salt bucket.

    Join condition becomes ``big._salt == small._salt AND key == key``
    where big got :func:`with_salt`; a hot fact key then meets the small
    side in ``buckets`` different reducers instead of one.
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias(salt_col)
    return small.select("*", salts)
