"""Dump .explain('formatted') for named queries to
plans/r14/<query>_<tag>.txt (round-14 deliverable).

Usage: python tools_plandump_r14.py <tag> q1 q2 ...
Env: SPARK_GRAFT_SF_DIR (default sf0.1 raw testdata).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ingestor_etl_spark.plans.layout import release_caches  # noqa: E402
from ingestor_etl_spark.queries import load_all  # noqa: E402
from ingestor_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    registry = load_all()
    spark = get_spark("ingestor-etl-spark-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        txt = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(f"-- {name} @ {sf_dir} ({tag})\n")
            fh.write(txt)
        release_caches()
        print(name, "done", flush=True)


if __name__ == "__main__":
    main()
