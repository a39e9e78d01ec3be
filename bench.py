#!/usr/bin/env python
"""Headline benchmark: run the query catalog at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes to completion through the noop sink (no driver-side
collect skew for wide outputs).  The session is created once; the first
(untimed) warmup query absorbs JVM/Python-worker spin-up so the timings
measure the engine, not process startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("duckdb_cluster_hash_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) if cpus.isdigit() else 32, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from duckdb_cluster_hash_spark.plans.catalog import QUERIES

    # warmup: spin up executors + python workers outside the timings
    QUERIES["cluster_node_distribution"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "catalog_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }

    # round-over-round visibility: compare against the latest driver-recorded
    # bench artifact; deltas ride along in the JSON, details go to stderr
    import glob

    prevs = sorted(glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json")))
    if prevs:
        try:
            with open(prevs[-1]) as fh:
                prev = json.load(fh)
            # driver artifacts wrap the bench line under "parsed"
            if "parsed" in prev and isinstance(prev["parsed"], dict):
                prev = prev["parsed"]
            result["prev_round"] = os.path.basename(prevs[-1])
            result["prev_total"] = prev.get("value")
            result["delta_total"] = round(result["value"] - float(prev["value"]), 3)
            moved = {
                q: round(t - prev["queries"][q], 3)
                for q, t in timings.items()
                if q in prev.get("queries", {}) and abs(t - prev["queries"][q]) >= 0.5
            }
            if moved:
                print(
                    "bench delta vs %s: %s"
                    % (result["prev_round"], json.dumps(moved, sort_keys=True)),
                    file=sys.stderr,
                )
        except (ValueError, KeyError, TypeError, OSError):
            pass
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
