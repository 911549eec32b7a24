"""Round-14 interleaved A/B harness: time named queries through the
bench's exact extended-section methodology (split-copy dir, 4 MB
maxPartitionBytes, warm-up + best-of-N noop, release_caches between
queries) and ALSO report the cold first run (build + first noop) —
the round-14 bench metric. One JSON line per query per rep,
alternating reps so host drift hits both labels equally when two
trees are compared (run this script from each tree in turn).

Usage: python tools_ab_r14.py [-reps N] q1 q2 ...
Env: SPARK_GRAFT_SF_DIR (default the sf0.1 split copy via bench.py).
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
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-reps":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR")
    if not sf_dir:
        from bench import _split_copy_dir

        sf_dir = _split_copy_dir("/root/testdata/sf0.1") or "/root/testdata/sf0.1"
    registry = load_all()
    spark = get_spark(
        "ingestor-etl-spark-ab",
        **{"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))

    out: dict[str, dict] = {n: {"first": [], "steady": []} for n in args}
    for rep in range(reps):
        for name in args:
            spark.sparkContext.setJobDescription(f"ab:{name}:{rep}")
            t0 = time.perf_counter()
            df = registry[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            first = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                s = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - s)
            release_caches()
            out[name]["first"].append(round(first, 3))
            out[name]["steady"].append(round(best, 3))
            out[name].setdefault("build", []).append(round(t1 - t0, 3))
    for name, d in out.items():
        print(
            json.dumps(
                {
                    "name": name,
                    "first_med": sorted(d["first"])[len(d["first"]) // 2],
                    "steady_med": sorted(d["steady"])[len(d["steady"]) // 2],
                    **d,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
