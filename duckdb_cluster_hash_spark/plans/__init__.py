from duckdb_cluster_hash_spark.plans.catalog import QUERIES, ORACLES, query  # noqa: F401
