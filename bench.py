"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion with a noop sink (full compute,
no driver-side materialization cost), timed after a warm-up of the
session JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ingestor_etl_spark.queries import load_all  # noqa: E402
from ingestor_etl_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_revenue_forecast",
    "j1_request_response",
    "j2_group_enrich",
    "j6_sessionize",
    "o3_dedup_events",
    "exact_dedup",
    "text_quality",
    "ann_cosine_topk",
    "minhash_lsh_pairs",
    "simhash_clusters",
    "ann_lsh_bucketed",
    "lang_id",
    "multimodal_features",
    "pcap_diameter_correlated",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    registry = load_all()
    spark = get_spark("ingestor-etl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM + parquet footer cache with a trivial job.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    names = [n for n in HEADLINE if n in registry]
    timings: dict[str, float] = {}
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        # One untimed run amortizes whole-stage-codegen JIT; report
        # the best of two timed runs (robust to transient host
        # contention on shared VMs).
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_set_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
