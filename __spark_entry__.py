"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual query surface lives in ``ingestor_etl_spark.queries``
(one registered entry per implemented operator from SURVEY.md §2 +
the training-data-pipeline operators); this module just adapts the
registry to the driver's shape.
"""

from __future__ import annotations

import functools
import os
import sys
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

from ingestor_etl_spark.queries import load_all  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

_shipped_contexts: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Make ``ingestor_etl_spark`` importable inside Spark's Python
    workers regardless of the driver process's cwd/PYTHONPATH.

    The grading driver imports this module from its own process and
    SparkSession; its workers inherit neither our ``sys.path`` patch
    nor the repo cwd, so any pandas-UDF query would die with
    ``ModuleNotFoundError`` on deserialization. ``addPyFile`` of a
    package zip is the runtime-safe fix (works after the session
    already exists, and on a real cluster it ships to executors)."""
    sc = spark.sparkContext
    if id(sc) in _shipped_contexts:
        return
    zip_path = os.path.join(tempfile.gettempdir(), "ingestor_etl_spark_pkg.zip")
    pkg_dir = os.path.join(_REPO_DIR, "ingestor_etl_spark")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, dirs, files in os.walk(pkg_dir):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fname in files:
                if fname.endswith(".py"):
                    full = os.path.join(root, fname)
                    zf.write(full, os.path.relpath(full, _REPO_DIR))
    sc.addPyFile(zip_path)
    _shipped_contexts.add(id(sc))


def _with_shipping(fn: Callable[[SparkSession, str], DataFrame]):
    @functools.wraps(fn)
    def call(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ingestor_etl_spark.plans.layout import release_caches

        _ensure_shipped(spark)
        # cache contract is query-scoped: drop the PREVIOUS query's
        # materialized stages before building the next plan, so a
        # long sweep over queries() never accumulates dead caches.
        # (The previous query's returned DataFrame stays usable —
        # Spark recomputes from lineage if it's re-collected.)
        release_caches()
        return fn(spark, sf_dir)

    return call


# The driver samples a prefix-window (~50 names) of this dict when it
# checks correctness. The rotation closed in r6: every registered
# query has had a green driver row at least once. From r7 on the
# window head is (1) operators reworked in a PRIOR round whose new
# plan has no driver row yet, (2) queries NEW this round, (3)
# operators reworked THIS round, then everything else — so no query
# can sit unsampled and every plan change gets pinned within a round.
_DRIVER_SAMPLE_PRIORITY = [
    # --- round-7 window head ---
    # reworked in r6 (window-algebra HTTP linking, protocols/
    # http_sig.py:511) but never driver re-sampled — round-6 verdict
    # item 3 puts it first so CORRECTNESS_r07 pins the new plan
    "pcap_http_ocs_linked",
    # new in r7 (streaming parity for the last pytest-only operators,
    # the exact-substring extend stage, the provenance overlap matrix)
    "stream_cms_cells_parity", "stream_zscore_parity",
    "exact_substring_extend", "cross_source_dup_overlap",
    "multimodal_decode_audio", "pcap_tshark_fields",
    "minhash_contamination", "dedup_threshold_sweep",
    # reworked in r7 — census-gated LSH plan selection + hashed
    # exact-substring gram keys + loose what-if population: re-sample
    # every consumer of the gated band-pairs generator
    "minhash_lsh_pairs", "containment_pairs", "minhash_jaccard_estimate",
    "lsh_band_whatif", "lsh_dedup_eval", "exact_substring_dedup",
    "dedup_cc_clusters", "curation_pipeline", "mixture_token_allocation",
    # --- round-6 additions (all green in CORRECTNESS_r06) ---
    "stream_neardup_parity", "stream_interval_join_parity",
    "stream_session_window_parity", "stream_windowed_counts_parity",
    "hard_negative_mining",
    # round-6 reworked operators (green r6 driver rows)
    "knn_graph", "embedding_near_dup", "entity_resolution",
    "multimodal_decode_image", "funnel_conversion",
    # the r6 rotation-closers (first sampled r6, all green)
    "code_detect", "ann_recall_eval", "dup_graph_degree_stats",
    "bigram_novelty", "label_balance_resample", "semdedup_clusters",
    "join_cardinality_estimator", "fk_integrity_audit",
    "er_quality_eval", "schema_profile", "dup_group_size_profile",
    "fixedwidth_ingest", "collocation_lift", "vocab_coverage_curve",
    "dup_graph_triangles", "ann_dim_truncation_eval",
    "events_hourly_heatmap", "order_status_aging",
    "supplier_lead_time", "clv_by_cohort", "source_lang_purity",
    # previously sampled (all green on their latest driver row)
    "partitioned_write_roundtrip", "salted_hot_agg", "dedup_report",
    "key_skew_profile", "eval_holdout_split", "score_calibration",
    "dataset_card", "j7_display_filter", "pcap_flow_stats",
    "segment_dedup", "bm25_search", "unigram_logprob", "shard_pack",
    "value_histogram", "pagerank_dup_graph", "q10_returned_revenue",
    "q14_promo_revenue", "q18_large_orders", "rollup_returns",
    "window_running_revenue", "sql_passthrough", "q13_order_distribution",
    "q17_small_qty_revenue", "q22_idle_customers", "q16_supplier_variety",
    "q21_blocking_supplier", "q2_min_cost_supplier", "q11_important_parts",
    "q20_fresh_stock_suppliers", "set_ops_cohorts", "q7_nation_volume",
    "q12_priority_lines", "q15_top_supplier", "q19_disjunctive_revenue",
    "q8_market_share", "q9_product_profit", "ann_cosine_topk",
    "ann_lsh_bucketed", "ann_ivf", "merge_upsert",
    "scd2_history",
    "tfidf_cosine_pairs", "retention_matrix", "shingle_df_profile",
    "event_transition_matrix",
    "embedding_outliers", "active_user_stickiness",
    "multitouch_attribution", "inverted_index_shards",
    "prefix_filter_join", "gopher_rules",
    "char_entropy", "halflife_decay",
    "events_gapfill", "cms_heavy_hitters", "source_reputation",
    "compaction_plan", "gdpr_delete_audit",
    "zone_map_prune", "incremental_rollup", "lang_id_confusion",
    "winsorize_scores", "session_transcripts", "incremental_dedup",
    "embedding_quantize_int8", "pit_dimension_join", "salted_skew_join",
    "rolling_zscore_outliers", "bloom_join_filter",
    "frequent_paths", "quantile_normalize", "cube_revenue",
    "sketch_shard_merge", "zorder_layout", "window_zoo",
    "datetime_functions", "array_functions", "string_functions",
    "json_functions", "math_functions", "conditional_functions",
    "snapshot_diff", "quality_classifier", "canonical_docs",
    "rrf_hybrid_search", "ann_pq_topk",
    "vocab_coverage", "mixture_drift", "embedding_stats",
]


def _ordered(registry):
    pri = [n for n in _DRIVER_SAMPLE_PRIORITY if n in registry]
    seen = set(pri)
    return {n: registry[n] for n in [*pri, *(k for k in registry if k not in seen)]}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    registry = load_all()
    return _with_shipping(registry["q1_pricing_summary"].fn)(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _with_shipping(q.fn) for name, q in _ordered(load_all()).items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle
        for name, q in _ordered(load_all()).items()
        if q.oracle is not None
    }
