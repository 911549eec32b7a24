"""Round-13 optimization profiler: per-query breakdown of
build (eager coordinator jobs at DataFrame-construction time),
planning (Catalyst analyze/optimize/physical), and execution
(noop-sink best-of-N — the bench's timed region).

Usage: SPARK_GRAFT_SF_DIR=... python tools_profile_r13.py q1 q2 ...
Prints one JSON line per query:
  {"name": ..., "build": s, "plan": s, "noop1": s, "noop_best": s}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ingestor_etl_spark.plans.layout import release_caches  # noqa: E402
from ingestor_etl_spark.queries import load_all  # noqa: E402
from ingestor_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    registry = load_all()
    spark = get_spark("ingestor-etl-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    if os.environ.get("SPARK_GRAFT_SPLIT_PROFILE"):
        # mirror bench.py's extended-section methodology: split-copy
        # input + 4 MB maxPartitionBytes so scans fan out
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))

    for name in names:
        if name not in registry:
            print(json.dumps({"name": name, "err": "unknown"}))
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = registry[name].fn(spark, sf_dir)
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t_plan = time.perf_counter() - t0

        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_noop1 = time.perf_counter() - t0

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        release_caches()
        print(
            json.dumps(
                {
                    "name": name,
                    "build": round(t_build, 3),
                    "plan": round(t_plan, 3),
                    "noop1": round(t_noop1, 3),
                    "noop_best": round(best, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
