#!/usr/bin/env python
"""Isolated per-query timing: run the named queries alone (no 8-way
contention) through the noop sink on a warm session and print a JSON map
{name: [run1, run2, ...]} — medians are stable to ~5% where the
contended bench walls swing 2x run-over-run, so this is the harness for
before/after evidence on individual optimizations (guide §1.1: isolate
the thing you are changing).

Usage: python scripts/isolate_bench.py q1 q2 ... [--repeats N] [--out F]
       python scripts/isolate_bench.py --all --repeats N

Session config matches bench.py exactly (same master, shuffle
partitions, AQE, FAIR) so isolated numbers are comparable to the
bench's contended walls modulo contention.  Memoized session state is
NOT cleared between repeats: run 1 of a memoizing query pays its memo
build (the bench's per-run cost for non-prestaged queries) and later
runs are the steady state (the bench's cost for prestaged queries).
Report whichever matches the claim being made.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    args = [a for a in sys.argv[1:]]
    repeats = 3
    out = None
    names: list[str] = []
    run_all = False
    i = 0
    while i < len(args):
        if args[i] == "--repeats":
            repeats = int(args[i + 1])
            i += 2
        elif args[i] == "--out":
            out = args[i + 1]
            i += 2
        elif args[i] == "--all":
            run_all = True
            i += 1
        else:
            names.append(args[i])
            i += 1

    # Same calm discipline as bench.py (this script is the round's
    # before/after evidence harness — an isolated wall measured in a
    # neighbor-storm window must never be stamped as evidence unmarked):
    # wait for ambient 1-min load <= the calm gate, and bracket the runs
    # with bench.py's serial CPU probe so a storm that STARTS mid-run is
    # visible in the payload.
    import bench as _bench

    calm_gate = float(os.environ.get("SPARK_GRAFT_BENCH_CALM_GATE", "4"))
    calm_wait = float(os.environ.get("SPARK_GRAFT_BENCH_CALM_WAIT", "600"))
    waited = 0.0
    try:
        load1 = round(os.getloadavg()[0], 1)
    except OSError:
        load1 = None
    while load1 is not None and load1 > calm_gate and waited < calm_wait:
        print(
            f"calm-gate: ambient load {load1} > {calm_gate}, waiting "
            f"({waited:.0f}/{calm_wait:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(30)
        waited += 30
        load1 = round(os.getloadavg()[0], 1)
    noisy = (load1 > calm_gate) if load1 is not None else None
    probe_ms_pre = _bench._cpu_probe_ms()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("duckdb_cluster_hash_spark-isolate")
        .config(
            "spark.sql.shuffle.partitions",
            str(max(int(cpus) if cpus.isdigit() else 32, 8)),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from duckdb_cluster_hash_spark.plans.catalog import QUERIES

    if run_all:
        names = list(QUERIES)
    QUERIES["cluster_node_distribution"](spark, sf_dir).collect()  # warmup

    results: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]
        runs = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"isolate:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        results[name] = runs
        print(f"{name}: {runs}", file=sys.stderr)

    probe_ms_post = _bench._cpu_probe_ms()
    if _bench._probe_degraded(probe_ms_pre, probe_ms_post):
        print(
            f"probe-guard: serial probe degraded {probe_ms_pre}→"
            f"{probe_ms_post}ms during the runs; stamping noisy",
            file=sys.stderr,
        )
        noisy = True
    payload = json.dumps(
        {
            "ambient_load1": load1,
            "noisy": noisy,
            "probe_ms_pre": probe_ms_pre,
            "probe_ms_post": probe_ms_post,
            "runs": results,
        }
    )
    if out:
        with open(out, "w") as fh:
            fh.write(payload)
    print(payload)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
