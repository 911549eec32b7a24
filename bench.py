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

from ingestor_etl_spark.plans.layout import release_caches  # noqa: E402
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


# Round-2 additions benched separately so the headline total stays
# comparable round-over-round (same 17 queries as BASELINE).
EXTENDED = [
    "pii_redact",
    "url_dedup",
    "contamination_check",
    "corpus_top_ngrams",
    "text_repetition",
    "domain_mixture",
    "multimodal_frame_sample",
    "sql_passthrough",
    "j7_display_filter",
    # round-3 additions
    "segment_dedup",
    "bm25_search",
    "unigram_logprob",
    "shard_pack",
    "value_histogram",
    "csv_ingest",
    "html_strip",
    "importance_resample",
    "curriculum_bins",
    "bpe_pair_counts",
    "pagerank_dup_graph",
    "key_skew_profile",
    "eval_holdout_split",
    "dataset_card",
    # round-4 additions
    "snapshot_diff",
    "quality_classifier",
    "canonical_docs",
    "rrf_hybrid_search",
    "ann_pq_topk",
    "score_calibration",
    "lsh_dedup_eval",
    "vocab_coverage",
    "mixture_drift",
    "embedding_stats",
    "partitioned_write_roundtrip",
    "dedup_report",
    "pcap_flow_stats",
    "salted_hot_agg",
    # round-4 waves 3-5
    "events_gapfill",
    "cms_heavy_hitters",
    "source_reputation",
    "compaction_plan",
    "knn_graph",
    "gdpr_delete_audit",
    "zone_map_prune",
    "incremental_rollup",
    "lang_id_confusion",
    "winsorize_scores",
    "session_transcripts",
    "incremental_dedup",
    "embedding_quantize_int8",
    "pit_dimension_join",
    "salted_skew_join",
    "rolling_zscore_outliers",
    "containment_pairs",
    "bloom_join_filter",
    "frequent_paths",
    "quantile_normalize",
    "cube_revenue",
    "sketch_shard_merge",
    "zorder_layout",
    "window_zoo",
    "datetime_functions",
    "array_functions",
    "string_functions",
    "json_functions",
    "math_functions",
    "conditional_functions",
    "curation_pipeline",
    # wave 11: similarity joins + quality signals. Note on the two
    # join ops: the synthetic testdata is their worst case (50-word
    # vocabulary -> dense shingle df; 99%-duplicated part names ->
    # maximal block collisions); see SCALING.md §17.
    "prefix_filter_join",
    "entity_resolution",
    "gopher_rules",
    "char_entropy",
    "halflife_decay",
]


def _layout_note(sf_dir: str) -> str | None:
    """Report the input parquet layout: round-3 testdata ships ONE
    row group per table, which Spark cannot split — every scan (and
    its fused partial aggregation) is single-task no matter how many
    cores exist, unlike the multi-row-group layout BASELINE.md's
    numbers were measured on. Recorded in the bench JSON so
    round-over-round comparisons are read against the right input
    layout. (At cluster scale inputs are many files; this is a
    test-rig artifact, and the auto-compaction experiments in
    SCALING.md §layout document why we do not rewrite the read-only
    testdata.)"""
    try:
        import pyarrow.parquet as pq

        f = pq.ParquetFile(os.path.join(sf_dir, "lineitem.parquet"))
        if f.metadata.num_row_groups == 1:
            return (
                f"unsplittable input: lineitem has 1 row group "
                f"({f.metadata.num_rows} rows) -> single-task scans"
            )
    except Exception:
        pass
    return None


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
        # the best of three timed runs (robust to transient host
        # contention on shared VMs — measured ±9%/±25% run-to-run
        # swings on identical code; SCALING.md "Bench drift").
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)
        release_caches()  # query-scoped cache contract

    extended: dict[str, float] = {}
    for name in (n for n in EXTENDED if n in registry):
        df = registry[name].fn(spark, sf_dir)
        # Warm-up + best-of-two: a single timed run still recorded
        # occasional 5x cold-codegen/contention spikes (r4: a 4.3 s
        # bpe_pair_counts draw whose steady state is 0.8 s).
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        extended[name] = round(best, 3)
        release_caches()

    protocol = bench_protocol_throughput(spark)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_set_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extended_queries": extended,
                "extended_total": round(sum(extended.values()), 3),
                "protocol_throughput": protocol,
                "layout_note": _layout_note(sf_dir),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


# number of request/answer transactions per generated capture file
_TXNS_PER_FILE = 2500
_N_FILES = 8


def bench_protocol_throughput(spark) -> dict:
    """End-to-end pcap → decode → J1-correlate rate on a synthetic
    Diameter workload (the reference's actual job shape; its only
    published metric is per-file processed counts, BASELINE.md).

    8 files × 2500 txns × 2 messages = 40k messages; files are the
    parallelism unit exactly as in production."""
    import glob
    import struct as _s
    import tempfile

    from ingestor_etl_spark import capturegen as g
    from ingestor_etl_spark.protocols.diameter import correlate_diameter, decode_diameter
    from ingestor_etl_spark.protocols.net import expand_l4
    from ingestor_etl_spark.sources.pcap import read_pcap

    cap_dir = os.path.join(tempfile.gettempdir(), "ingestor_etl_spark_bench_caps_v1")
    os.makedirs(cap_dir, exist_ok=True)
    if len(glob.glob(cap_dir + "/*.pcap")) != _N_FILES:
        for fno in range(_N_FILES):
            frames = []
            for i in range(_TXNS_PER_FILE):
                hbh = fno * _TXNS_PER_FILE + i
                sess = f"sess;{fno};{i}".encode()
                ccr = g.diameter_msg(
                    272, True, hbh, hbh,
                    [g.diameter_avp(263, sess), g.subscription_id(0, f"52155{i:07d}")],
                )
                cca = g.diameter_msg(
                    272, False, hbh, hbh,
                    [g.diameter_avp(263, sess), g.diameter_avp(268, _s.pack("!I", 2001))],
                )
                frames.append((1700 + i, 0, g.eth(g.ipv4(g.sctp([(i % 4, 0, 46, ccr)], 40001, 3868), 132))))
                frames.append((1700 + i, 500, g.eth(g.ipv4(g.sctp([(i % 4, 0, 46, cca)], 3868, 40001), 132, src="10.0.0.2", dst="10.0.0.1"))))
            with open(os.path.join(cap_dir, f"bench{fno}.pcap"), "wb") as fh:
                fh.write(g.pcap(frames))

    n_messages = _N_FILES * _TXNS_PER_FILE * 2
    df = correlate_diameter(
        decode_diameter(expand_l4(read_pcap(spark, cap_dir + "/*.pcap")))
    )
    df.write.format("noop").mode("overwrite").save()  # warm-up
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - start)
    return {
        "pipeline": "pcap->decode->correlate (diameter)",
        "n_messages": n_messages,
        "sec": round(best, 3),
        "msgs_per_sec": round(n_messages / best),
    }


if __name__ == "__main__":
    main()
