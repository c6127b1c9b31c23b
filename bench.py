"""Driver bench harness: time every registered query at one scale factor.

Prints exactly ONE JSON line on stdout (the last line):

    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Env:
    SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     local[N] parallelism (default all cores)
    SPARK_GRAFT_BENCH_QUERIES  comma-separated subset (default: all)

Each query is executed with a `noop` format write — full physical
execution of the plan on the executors without driver-side collect
overhead, so the number measures the engine, not py4j transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entrymod
    from mapreduce_sssp_spark.session import get_spark

    spark = get_spark(app_name="spark-graft-bench")

    queries = entrymod.queries()
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if subset:
        names = [s.strip() for s in subset.split(",") if s.strip()]
        queries = {n: queries[n] for n in names}

    # Warm the JVM before timing anything: the first job in a fresh JVM
    # pays JIT + codegen-compiler + shuffle-subsystem init (~8s measured),
    # which would otherwise be billed entirely to whichever query runs
    # first. Exercises scan/shuffle/join/agg paths once, then drops.
    warm = spark.range(0, 1_000_000, 1, 8).selectExpr("id", "id % 97 AS k")
    warm.join(warm.groupBy("k").count(), "k").write.mode("overwrite").format(
        "noop"
    ).save()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception:
            traceback.print_exc(file=sys.stderr)
            timings[name] = -1.0  # failed marker; excluded from total
        print(f"[bench] {name}: {timings[name]}s", file=sys.stderr)
        # Iterative queries return a still-persisted final state; left in
        # place these accumulate over 60+ queries and the executor-memory
        # pressure inflates later queries (wcc measured 59s polluted vs
        # 36s isolated). Per-query isolation: drop all cached data.
        spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    line = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
