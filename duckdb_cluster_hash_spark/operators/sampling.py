"""Deterministic sampling and sharding for training-data curation.

Two operators a large-scale LLM-data pipeline needs between "corpus" and
"training run":

- **Stratified sampling** — rebalance a corpus (e.g. downsample the
  dominant language) with an exact, reproducible, shuffle-free rule:
  keep a document iff ``md5(doc_id) mod 1000 < rate_permille[stratum]``.
  The md5-threshold trick is the standard deterministic sampler (the
  same row set on every run, on every engine, under any partitioning) —
  unlike ``df.sample()``, whose row set depends on partition layout and
  seed plumbing.  At 100 TB this is a pure map-side filter: no shuffle,
  no state, prunes at full scan speed.

- **Token-budget sharding** — pack documents, in a deterministic global
  order, into contiguous shards of ~``budget`` tokens each (the unit of
  work a trainer streams).  A naive implementation is a running sum over
  ONE global window = a single-partition sort — the classic scale
  killer.  This one is the textbook two-level distributed prefix sum:
  hash-bucket the corpus by the leading byte of ``md5(doc_id)`` (which
  is also the leading component of the global sort key, so buckets are
  contiguous ranges of the global order), cumsum *within* each bucket
  (parallel windows), then add per-bucket offsets computed from a
  B-row bucket-totals table (B = 256 — driver-trivial, broadcast back).
  Only O(B) data is ever globally ordered; the corpus itself never
  passes through a single partition.

Hash primitive is md5 (the one hash both Spark and DuckDB share), so
every decision here is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sample_bucket_col",
    "stratified_sample",
    "mixture_epochs",
    "token_shards",
]


def sample_bucket_col(id_col: Column) -> Column:
    """Deterministic permille bucket 0..999 from md5 of the id.

    15 hex chars -> 60-bit int -> mod 1000; identical in DuckDB as
    ``('0x' || substr(md5(id::VARCHAR), 1, 15))::BIGINT % 1000``.
    """
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10)
    return (h.cast("bigint") % 1000).alias("bucket")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates_permille: dict[str, int],
    default_permille: int,
) -> DataFrame:
    """Filter to a deterministic per-stratum sample.

    Adds ``bucket`` (0..999) and keeps rows whose bucket falls under the
    stratum's permille rate.  Map-side only: the rate lookup is a CASE
    chain (not a join), so the filter rides the scan and costs zero
    shuffles at any scale.
    """
    rate = F.lit(default_permille)
    for value, permille in sorted(rates_permille.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(permille)).otherwise(rate)
    return df.withColumn("bucket", sample_bucket_col(F.col(id_col))).where(
        F.col("bucket") < rate
    )


def mixture_epochs(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    epochs_millis: dict[str, int],
    default_millis: int = 1000,
) -> DataFrame:
    """Deterministic fractional-epoch replication — the upsampling half of
    data mixing (:func:`stratified_sample` is the downsampling half).

    A stratum at ``epochs_millis`` = 2500 contributes each document 2
    times, plus a third copy for the deterministic 50% of documents whose
    md5 permille bucket falls under the fractional part:
    ``copies = millis div 1000 + (bucket < millis mod 1000)``.  Rates
    are integers (milli-epochs) so both engines compute identical copy
    counts — no float rounding at the boundary.

    Map-side only at any scale: the rate lookup is a CASE chain, the
    replication is ``explode(sequence(...))`` on the scan — no shuffle,
    no join.  Output rows carry ``copy_idx`` (0-based) so a downstream
    training-order shuffle can separate epochs; rows with 0 copies are
    dropped (a 0-rate stratum is a filter).
    """
    millis = F.lit(default_millis)
    for value, m in sorted(epochs_millis.items()):
        millis = F.when(F.col(strata_col) == value, F.lit(m)).otherwise(millis)
    with_copies = df.withColumn(
        "bucket", sample_bucket_col(F.col(id_col))
    ).withColumn(
        "n_copies",
        F.floor(millis.cast("bigint") / F.lit(1000)).cast("bigint")
        + F.when(F.col("bucket") < millis.cast("bigint") % 1000, 1).otherwise(0),
    )
    return (
        with_copies.where(F.col("n_copies") > 0)
        .withColumn(
            "copy_idx", F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1))
        )
        .drop("bucket", "n_copies")
    )


def token_shards(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Assign each row a contiguous token-budget shard id.

    Global order is ``(md5_hex, id)``; a document starting at cumulative
    token offset ``c`` (exclusive of itself) lands in shard
    ``c div budget``.  Executed as a two-level prefix sum (see module
    docstring); returns (id, n_tokens, shard).
    """
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.col(tokens_col).alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("h"),
    ).withColumn("b", F.conv(F.substring("h", 1, 2), 16, 10).cast("int"))

    # level 1: parallel per-bucket running sums (256 independent windows)
    in_bucket = Window.partitionBy("b").orderBy("h", "id")
    local = hashed.withColumn(
        "local_cum", F.sum("n_tokens").over(in_bucket) - F.col("n_tokens")
    )

    # level 2: offsets from the 256-row bucket-totals table (tiny sort)
    totals = hashed.groupBy("b").agg(F.sum("n_tokens").alias("bucket_tokens"))
    over_buckets = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.select(
        "b",
        (F.sum("bucket_tokens").over(over_buckets) - F.col("bucket_tokens")).alias(
            "offset"
        ),
    )

    return local.join(F.broadcast(offsets), "b").select(
        "id",
        "n_tokens",
        # integer div, not double division: exact at any corpus size
        F.expr(f"(offset + local_cum) div {int(budget)}").alias("shard"),
    )
