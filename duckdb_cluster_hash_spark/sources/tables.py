"""Parquet table sources for the driver's synthetic corpus.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an ``sf``
directory.  Loaders go through ``spark.read.parquet`` so Catalyst keeps
predicate pushdown / column pruning / partition coalescing; at 100 TB the
same call reads a partitioned parquet dataset unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_cluster_hash_spark.session import configure_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright; read it as a long (session invariant
    ``nanosAsLong``, see session.py) and floor-divide to microseconds —
    floor, not truncate-toward-zero, so pre-1970 nanosecond values would
    land on the same microsecond as DuckDB's conversion.
    """
    configure_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    df = spark.read.parquet(path)
    return df.withColumn(
        "ts", F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000"))
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view for the SQL surface."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
