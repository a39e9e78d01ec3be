"""Engine-wide SparkSession invariants, applied in exactly one place.

The catalog's DuckDB oracles are timezone-naive and the corpus's
``events.ts`` is parquet TIMESTAMP(NANOS) (which Spark's vectorized reader
rejects unless read as a long), so any session running engine queries must
hold these two confs for the life of the session:

- ``spark.sql.session.timeZone = UTC`` — calendar functions
  (date_trunc/year/CAST AS DATE) interpret epochs in the session zone;
  pinning UTC makes them match the naive oracle.
- ``spark.sql.legacy.parquet.nanosAsLong = true`` — nanosecond timestamps
  surface as int64 and are converted to microsecond TimestampType by the
  loader.

They are deliberately NOT save/restored around individual reads: Spark
captures the session conf when an *action* runs, not when the (lazy)
DataFrame is defined, so restoring early would corrupt later executions of
already-built plans.  Treat them as session invariants; this module is the
single authority on what they are.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

SESSION_INVARIANTS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow kernels (applyInPandas/mapInPandas/cogroup) must return numpy
    # dtypes matching their declared schemas exactly; safe conversion makes
    # a lossy mismatch (e.g. an int64 column against a declared int that
    # actually overflows) raise at the kernel boundary instead of silently
    # truncating.  Kernels build their int columns as np.int32 explicitly.
    "spark.sql.execution.pandas.convertToArrowArraySafely": "true",
}


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's session invariants (idempotent, cheap)."""
    for key, value in SESSION_INVARIANTS.items():
        if spark.conf.get(key, None) != value:
            spark.conf.set(key, value)
    return spark
