"""Source/sink round-trips beyond parquet (SURVEY.md §2 B11 extension).

The reference reads nothing (its host engine does); an engine claiming
its capabilities on Spark should still ingest and emit the formats real
pipelines use.  Thin, declarative wrappers — every reader goes through
``spark.read`` so Catalyst keeps pushdown/pruning where the format
supports it, and every writer takes an optional partition layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_table", "read_table", "FORMATS"]

FORMATS = ("parquet", "json", "csv", "orc")


def write_table(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    **options,
) -> None:
    if format == "csv":
        options.setdefault("header", True)
    writer = df.write.format(format).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Schema-explicit by default: schema inference at 100 TB means an
    extra full scan for CSV/JSON — callers pass the DDL string instead."""
    if format == "csv":
        options.setdefault("header", True)
    reader = spark.read.format(format).options(**options)
    if schema:
        reader = reader.schema(schema)
    return reader.load(path)
