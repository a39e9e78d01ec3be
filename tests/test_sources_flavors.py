"""load_table must normalize every parquet flavor of ``events.ts`` the
corpus has shipped (or could ship) to ONE schema: session-zone (UTC)
TimestampType at microsecond precision.

The drift this pins: the driver's corpus builder changed ts across rounds
— TIMESTAMP(NANOS) (read as int64 under ``nanosAsLong``), TIMESTAMP(
MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ), and TIMESTAMP(
MICROS, isAdjustedToUTC=true) (read as TimestampType).  A silent mismatch
here costs a whole round (commit e83d282); an UNRECOGNIZED flavor must
raise at load time instead of deferring failure to query time.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from duckdb_cluster_hash_spark.sources.tables import load_table

# epoch nanoseconds, including a pre-1970 value that is NOT on a whole
# microsecond: floor(-1500/1000) = -2us, truncation toward zero would give
# -1us — the exact disagreement the loader's floor-div exists to avoid
TS_NANOS = [
    -1500,
    0,
    999,
    1_000,
    1_700_000_000_123_456_789,
    -86_400_000_000_000,  # 1969-12-31
]
TS_MICROS = [n // 1000 for n in TS_NANOS]  # python // floors, like the loader


def _write(path: str, ts_array: pa.Array) -> str:
    table = pa.table(
        {
            "event_id": pa.array(range(len(TS_NANOS)), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7] * len(TS_NANOS), pa.int64()),
        }
    )
    pq.write_table(table, path)
    return path


@pytest.fixture(scope="module")
def flavor_dirs(tmp_path_factory):
    """Three sibling sf-dirs, each holding events.parquet in one flavor."""
    dirs = {}
    for flavor, arr in {
        "int64_nanos": pa.array(TS_NANOS, pa.int64()),
        "micros_ntz": pa.array(TS_MICROS, pa.timestamp("us")),
        "micros_utc": pa.array(TS_MICROS, pa.timestamp("us", tz="UTC")),
    }.items():
        d = tmp_path_factory.mktemp(flavor)
        _write(str(d / "events.parquet"), arr)
        dirs[flavor] = str(d)
    return dirs


def test_all_flavors_identical_schema_and_micros(spark, flavor_dirs):
    results = {}
    for flavor, d in flavor_dirs.items():
        df = load_table(spark, d, "events")
        assert df.schema["ts"].dataType.typeName() == "timestamp", flavor
        rows = (
            df.select("event_id", F.unix_micros("ts").alias("us"))
            .orderBy("event_id")
            .collect()
        )
        results[flavor] = [r["us"] for r in rows]
    assert results["int64_nanos"] == TS_MICROS  # floor, incl. pre-1970 rows
    assert results["micros_ntz"] == TS_MICROS
    assert results["micros_utc"] == TS_MICROS


def test_nanos_annotated_flavor_reads_as_long_and_normalizes(
    spark, tmp_path_factory
):
    """True TIMESTAMP(NANOS) annotation (what the corpus actually shipped):
    under the session's nanosAsLong invariant it surfaces as int64 and goes
    through the same floor-div normalization."""
    d = tmp_path_factory.mktemp("nanos_annot")
    _write(str(d / "events.parquet"), pa.array(TS_NANOS, pa.timestamp("ns")))
    df = load_table(spark, str(d), "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    rows = df.select("event_id", F.unix_micros("ts").alias("us")).orderBy("event_id").collect()
    assert [r["us"] for r in rows] == TS_MICROS


def test_unrecognized_ts_flavor_raises(spark, tmp_path_factory):
    """Schema drift to a flavor the loader doesn't know (e.g. a string
    column from a future corpus build) must fail loudly at load time."""
    d = tmp_path_factory.mktemp("string_ts")
    _write(
        str(d / "events.parquet"),
        pa.array([str(n) for n in TS_NANOS], pa.string()),
    )
    with pytest.raises(TypeError, match="unrecognized parquet type"):
        load_table(spark, str(d), "events")


def test_schema_evolution_null_fill_lands_on_old_generation(spark, sf_small):
    """mergeSchema must fill the missing column with NULL exactly on the
    generation that lacks it — and the merged row set must be lossless."""
    from duckdb_cluster_hash_spark.plans.catalog import QUERIES
    from duckdb_cluster_hash_spark.sources import load_table

    (row,) = QUERIES["formats_schema_evolution"](spark, sf_small).collect()
    docs = load_table(spark, sf_small, "documents")
    n = docs.count()
    n_odd = docs.where("doc_id % 2 = 1").count()
    assert row.n_rows == n
    assert row.n_with_lang == n_odd
    assert row.n_null_lang == n - n_odd
