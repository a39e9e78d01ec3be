from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import SparkSession

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
SF_MEDIUM = os.environ.get("SPARK_GRAFT_SF_MEDIUM", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    session = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("duckdb_cluster_hash_spark-tests")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="spark-wh-"))
        .getOrCreate()
    )
    yield session


@pytest.fixture(scope="module", autouse=True)
def _release_engine_caches():
    """Per-module cache hygiene for the shared 8g test JVM: the dedup
    family memo (localCheckpoint blocks) and the ranking pins
    (persist-backed) both exist to share work WITHIN a family/module;
    letting them accumulate across the whole 630-test suite pushed the
    single JVM into GC-starvation flakes (observed: late plan tests
    dying with Py4J NPEs after ~20 min of accumulated blocks).  Both
    releases are semantics-free: memos rebuild from lineage, pins
    recompute deterministically."""
    yield
    try:
        from duckdb_cluster_hash_spark.operators.dedup import clear_shared_cache
        from duckdb_cluster_hash_spark.operators.ranking import release_rank_pins

        clear_shared_cache()
        release_rank_pins()
    except Exception:
        pass


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_medium():
    return SF_MEDIUM
