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
    # maximal block collisions); see SCALING.md §19.
    "prefix_filter_join",
    "entity_resolution",
    "gopher_rules",
    "char_entropy",
    "halflife_decay",
    # round-5 additions
    "multimodal_decode_image",
    "tfidf_cosine_pairs",
    "funnel_conversion",
    "retention_matrix",
    "shingle_df_profile",
    "minhash_jaccard_estimate",
    "code_detect",
    "ann_recall_eval",
    "dup_graph_degree_stats",
    "bigram_novelty",
    "label_balance_resample",
    "semdedup_clusters",
    "join_cardinality_estimator",
    "fk_integrity_audit",
    "er_quality_eval",
    "schema_profile",
    "dup_group_size_profile",
    "fixedwidth_ingest",
    "collocation_lift",
    "vocab_coverage_curve",
    "dup_graph_triangles",
    "ann_dim_truncation_eval",
    "events_hourly_heatmap",
    "order_status_aging",
    "supplier_lead_time",
    "clv_by_cohort",
    "source_lang_purity",
    # round-6 additions + reworked-in-r6 operators now tracked
    "exact_substring_dedup",
    "lsh_band_whatif",
    "mixture_token_allocation",
    "stream_neardup_parity",
    "stream_interval_join_parity",
    "stream_session_window_parity",
    "stream_windowed_counts_parity",
    "hard_negative_mining",
    "embedding_near_dup",
    "pcap_http_ocs_linked",
    # round-7 additions
    "stream_cms_cells_parity",
    "stream_zscore_parity",
    "exact_substring_extend",
    "cross_source_dup_overlap",
    "multimodal_decode_audio",
    "pcap_tshark_fields",
    "minhash_contamination",
    "dedup_threshold_sweep",
    # round-8 addition
    "xml_ingest",
    # round-9 addition
    "ann_ivf_pq",
    # round-10 additions
    "ann_ivf_pq_residual",
    "pq_distortion_eval",
    "ivf_nprobe_whatif",
    "ivf_balance_profile",
    # round-11 additions: the scoreboard (the heaviest plan in the
    # repo — composes every ANN variant plus the exact leg; timed so
    # its cost stays pinned round-over-round) and the binary
    # Hamming-sketch ANN
    "ann_quality_scoreboard",
    "ann_hamming_topk",
    "hamming_pool_whatif",
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


# ------------------------------------------------- splittable input copy
_SPLIT_ROW_GROUPS = 32  # target row groups per table in the split copy


def _split_copy_dir(sf_dir: str) -> str | None:
    """Materialize a SPLITTABLE multi-row-group copy of the testdata
    (≥_SPLIT_ROW_GROUPS row groups per table) under /tmp, cached by a
    (name, size, mtime) fingerprint of the source files — the same
    caching scheme orc_ingest uses. The driver's testdata ships one
    row group per table (unsplittable → single-task scans), which is
    NOT the layout BASELINE.md was measured on and not what any real
    deployment reads; benching both layouts separates plan quality
    from this test-rig artifact (SCALING.md §15). Returns None if the
    copy can't be built (bench then reports raw-layout numbers only).
    """
    import glob
    import hashlib
    import tempfile

    try:
        import pyarrow.parquet as pq

        srcs = sorted(glob.glob(os.path.join(sf_dir, "*.parquet")))
        if not srcs:
            return None
        fp = hashlib.md5(
            "|".join(
                f"{os.path.basename(p)}:{os.path.getsize(p)}:{int(os.path.getmtime(p))}"
                for p in srcs
            ).encode()
        ).hexdigest()[:12]
        out_dir = os.path.join(
            tempfile.gettempdir(),
            f"ingestor_etl_spark_bench_split_{os.path.basename(os.path.normpath(sf_dir))}_{fp}",
        )
        marker = os.path.join(out_dir, "_DONE")
        if os.path.exists(marker):
            return out_dir
        os.makedirs(out_dir, exist_ok=True)
        for p in srcs:
            t = pq.ParquetFile(p).read()
            rg = max(1024, t.num_rows // _SPLIT_ROW_GROUPS)
            # version 2.6 preserves TIMESTAMP(NANOS) (events.ts)
            pq.write_table(
                t,
                os.path.join(out_dir, os.path.basename(p)),
                row_group_size=rg,
                version="2.6",
            )
        with open(marker, "w") as fh:
            fh.write(fp)
        return out_dir
    except Exception:
        return None


# maxPartitionBytes for the split-copy runs: sized so the sf0.1
# multi-row-group tables fan out across the local cores (the setting
# is runtime-mutable per-query via SQLConf, so the raw-layout runs
# keep the production 128 MB default).
_SPLIT_MAX_PARTITION_BYTES = 4 * 1024 * 1024


def _time_query(df, n_runs: int) -> float:
    """Warm-up (amortizes whole-stage-codegen JIT) + best-of-N noop
    writes (robust to transient host contention on shared VMs —
    measured ±9%/±25% run-to-run swings on identical code;
    SCALING.md "Bench drift")."""
    df.write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(n_runs):
        start = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - start)
    return round(best, 3)


def _time_query_cold(build_thunk, n_runs: int) -> tuple[float, float]:
    """(steady_best, first_run) — round-14 (round-13 verdict item 1).

    The steady number is methodology-identical to _time_query
    (warm-up + best-of-N noop writes), so the ``queries`` dict stays
    comparable round-over-round. first_run_sec ADDITIONALLY times the
    COLD cost the warm-up used to hide: DataFrame construction (eager
    coordinator jobs — training censuses, plan-shape probes) PLUS the
    first noop execution (which populates every materialize() cache).
    Nothing is prefetched outside these two timed spans: the caches a
    query needs are filled inside first_run_sec or inside the timed
    steady runs, never off-clock."""
    t0 = time.perf_counter()
    df = build_thunk()
    build = time.perf_counter() - t0
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    first = build + (time.perf_counter() - t1)
    best = float("inf")
    for _ in range(n_runs):
        start = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - start)
    return round(best, 3), round(first, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    registry = load_all()
    # One-line-JSON stdout purity (round-13 verdict item 2): the
    # driver captures stdout and parses the single JSON line. TWO
    # polluters exist and both are disabled for the bench session:
    # (a) console progress bars; (b) the ACTUAL r12-parse-killer,
    # reproduced this round — JVM unified logging writes gc warnings
    # to STDOUT under memory pressure ("[262.5s][warning][gc,alloc]
    # ... Retried waiting for GCLocker too often"), observed
    # mid-round on a heavy --jdecomp run. -Xlog:all=warning:stderr
    # keeps the warnings but moves them off the parsed stream.
    spark = get_spark(
        "ingestor-etl-spark-bench",
        **{
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.extraJavaOptions": "-Xlog:all=warning:stderr",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM + parquet footer cache with a trivial job.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    names = [n for n in HEADLINE if n in registry]

    # Protocol throughput, measurement 1 of 2 (round-6 verdict item
    # 8): the inner loop is already best-of-3, but a contended host
    # window spanning one invocation still printed a 40% dip in the
    # r6 driver run. Measuring once HERE and once at the END of the
    # ~10-minute bench and reporting the better run means a dip needs
    # sustained whole-bench contention to show at all; both runs are
    # recorded so drift stays visible.
    protocol_first = bench_protocol_throughput(spark)

    # Raw-layout headline: the driver's own parquet (one row group
    # per table → single-task scans). Comparable round-over-round
    # with BENCH_r01-r04. Round 14 additionally records
    # first_run_sec per query (build + first execution, i.e. the
    # cold cost including every cache fill — round-13 verdict item
    # 1); the steady best-of-N methodology and the ``queries`` /
    # ``raw_layout_queries`` / ``extended_queries`` dicts are
    # unchanged and stay comparable round-over-round.
    raw_timings: dict[str, float] = {}
    raw_first: dict[str, float] = {}
    for name in names:
        raw_timings[name], raw_first[name] = _time_query_cold(
            lambda: registry[name].fn(spark, sf_dir), 3
        )
        release_caches()  # query-scoped cache contract

    # Split-layout headline: a splittable multi-row-group copy (the
    # layout BASELINE.md was measured on, and the only layout that
    # exists at cluster scale), scans fanned out via a runtime
    # maxPartitionBytes override. Reported as the PRIMARY number;
    # the raw numbers + delta quantify the test-rig layout artifact
    # permanently (round-4 verdict item 5, SCALING.md §15).
    split_dir = _split_copy_dir(sf_dir)
    split_timings: dict[str, float] = {}
    split_first: dict[str, float] = {}
    if split_dir:
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", str(_SPLIT_MAX_PARTITION_BYTES)
        )
        for name in names:
            split_timings[name], split_first[name] = _time_query_cold(
                lambda: registry[name].fn(spark, split_dir), 3
            )
            release_caches()

    extended: dict[str, float] = {}
    extended_first: dict[str, float] = {}
    ext_dir = split_dir or sf_dir
    for name in (n for n in EXTENDED if n in registry):
        extended[name], extended_first[name] = _time_query_cold(
            lambda: registry[name].fn(spark, ext_dir), 2
        )
        release_caches()
    if split_dir:
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024)
        )

    protocol_second = bench_protocol_throughput(spark)
    protocol = max(
        protocol_first, protocol_second, key=lambda p: p["msgs_per_sec"]
    )
    protocol = {
        **protocol,
        "runs_msgs_per_sec": [
            protocol_first["msgs_per_sec"],
            protocol_second["msgs_per_sec"],
        ],
    }

    raw_total = round(sum(raw_timings.values()), 3)
    split_total = round(sum(split_timings.values()), 3) if split_timings else None
    primary = split_total if split_total is not None else raw_total
    result = {
        "metric": "headline_query_set_total",
        "value": primary,
        "unit": "sec",
        "queries": split_timings or raw_timings,
        "raw_layout_queries": raw_timings,
        "raw_layout_total": raw_total,
        "layout_delta_sec": (
            round(raw_total - split_total, 3)
            if split_total is not None
            else None
        ),
        "extended_queries": extended,
        "extended_total": round(sum(extended.values()), 3),
        "extended_layout": "split" if split_dir else "raw",
        # Cold cost per query (round-13 verdict item 1): DataFrame
        # build (eager coordinator jobs) + FIRST noop execution (all
        # cache fills) — the spend the steady best-of-N deliberately
        # amortizes away. Additive keys; the steady dicts above are
        # methodology-unchanged.
        "first_run_queries": split_first or raw_first,
        "first_run_total": round(
            sum((split_first or raw_first).values()), 3
        ),
        "raw_layout_first_run": raw_first,
        "extended_first_run": extended_first,
        "extended_first_run_total": round(sum(extended_first.values()), 3),
        "protocol_throughput": protocol,
        "layout_note": _layout_note(sf_dir),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    line = json.dumps(result)
    # One-line-JSON contract hardening (round-13 verdict item 2): the
    # r12 driver capture failed to parse an apparently valid line —
    # make the line the ONLY stdout the process emits, flushed in one
    # write (console progress is off for this session, Spark logs go
    # to stderr), and drop a byte-identical copy where the env asks so
    # a mangled capture can be diagnosed against it.
    copy_path = os.environ.get("SPARK_GRAFT_BENCH_COPY")
    if copy_path:
        with open(copy_path, "w") as fh:
            fh.write(line + "\n")
    sys.stdout.write(line + "\n")
    sys.stdout.flush()


# number of request/answer transactions per generated capture file
_TXNS_PER_FILE = 2500
_N_FILES = 8


def bench_protocol_throughput(
    spark, n_files: int = _N_FILES, txns_per_file: int = _TXNS_PER_FILE
) -> dict:
    """End-to-end pcap → decode → J1-correlate rate on a synthetic
    Diameter workload (the reference's actual job shape; its only
    published metric is per-file processed counts, BASELINE.md).

    Default 8 files × 2500 txns × 2 messages = 40k messages; files
    are the parallelism unit exactly as in production. bench.py
    --sf1 runs the 10× shape (80 files / 400k messages) to pin
    decode+correlate scaling alongside the corpus queries."""
    import glob
    import struct as _s
    import tempfile

    from ingestor_etl_spark import capturegen as g
    from ingestor_etl_spark.protocols.diameter import correlate_diameter, decode_diameter
    from ingestor_etl_spark.protocols.net import expand_l4
    from ingestor_etl_spark.sources.pcap import read_pcap

    cap_dir = os.path.join(
        tempfile.gettempdir(),
        f"ingestor_etl_spark_bench_caps_v1_{n_files}x{txns_per_file}",
    )
    os.makedirs(cap_dir, exist_ok=True)
    if len(glob.glob(cap_dir + "/*.pcap")) != n_files:
        for fno in range(n_files):
            frames = []
            for i in range(txns_per_file):
                hbh = fno * txns_per_file + i
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

    n_messages = n_files * txns_per_file * 2
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


# ------------------------------------------------------ sf1 scale check
SF1_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".sf1data", "sf1")
_SF1_REPS = 10  # sf1 = 10 × sf0.1


def _gen_sf1(spark) -> None:
    _gen_scaled(spark, SF1_DIR, _SF1_REPS)


def _gen_scaled(spark, out_dir: str, n_reps: int) -> None:
    """Deterministic n_reps× scale-up of the sf0.1 tables the
    slowest queries touch (documents, embeddings, lineitem). The
    model is "an n× larger crawl with the same per-shard structure":
    replica 0 is sf0.1 verbatim; replicas 1+ are content-decorrelated
    so duplicate families, shingle universes, and vector directions
    stay replica-local — matching how independently-crawled shards
    behave, and keeping OUTPUT cardinality linear so the bench
    measures engine scaling, not contract-inherent pair blowup.

    - documents: every token suffixed with ~K (disjoint shingle
      universe per replica; per-replica dup structure identical);
    - embeddings: components rotated by 7·K positions with a
      deterministic per-(k, replica) sign pattern — norm-preserving,
      directions decorrelated across replicas;
    - lineitem: keys offset per replica, measures unchanged.
    Written once to .sf1data/ (gitignored; regenerate any time)."""
    os.makedirs(out_dir, exist_ok=True)
    src = "/root/testdata/sf0.1"
    rep = "CAST(r.id AS INT)"

    docs = spark.read.parquet(f"{src}/documents.parquet")
    reps = spark.range(n_reps).alias("r")
    d = docs.crossJoin(reps).selectExpr(
        f"doc_id + {rep} * 5000 AS doc_id",
        f"CASE WHEN r.id = 0 THEN text ELSE "
        f"regexp_replace(text, '(\\\\S+)', concat('$1~', {rep})) END AS text",
        "lang",
        "source",
        "length(CASE WHEN r.id = 0 THEN text ELSE "
        f"regexp_replace(text, '(\\\\S+)', concat('$1~', {rep})) END) AS n_chars",
    )
    d.repartition(8).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    e = emb.crossJoin(reps).selectExpr(
        f"vec_id + {rep} * 2000 AS vec_id",
        "transform(sequence(0, 63), k -> CAST("
        f"  element_at(embedding, ((k + {rep} * 7) % 64) + 1)"
        f"  * (CASE WHEN (k * 2654435761 + {rep} * 97) % 2 = 0 THEN 1.0 ELSE -1.0 END)"
        "  AS float)) AS embedding",
        "label",
    )
    e.repartition(8).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    li = spark.read.parquet(f"{src}/lineitem.parquet")
    cols = [c for c in li.columns if c != "l_orderkey"]
    li.crossJoin(reps).selectExpr(
        f"l_orderkey + {rep} * 10000000 AS l_orderkey", *cols
    ).repartition(16).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")


def _sf1_main() -> None:
    """`bench.py --sf1`: the round-5 verdict's 10× scale checkpoint —
    run the slowest sf0.1 queries at sf1 (generated on first
    use) and report per-query times at both scales plus the scaling
    exponent log10(t_sf1/t_sf0.1) (1.0 = perfectly linear). Every
    query — knn_graph included since round 9 — runs the REGISTERED
    plan verbatim with zero bench-side parameters: knn_graph and
    embedding_near_dup both derive their scale knobs (n_planes,
    bucket_cap) from in-query censuses (auto_scale). Round-7
    extends the set with the round-6/7 heavies (exact_substring_dedup,
    lsh_band_whatif, containment_pairs, tfidf_cosine_pairs,
    embedding_near_dup — round-6 verdict item 5)."""
    from ingestor_etl_spark.queries.vector_ops import KNN_PLANES, _knn_planes

    registry = load_all()
    spark = get_spark("ingestor-etl-spark-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if not os.path.exists(os.path.join(SF1_DIR, "lineitem.parquet")):
        _gen_sf1(spark)

    names = [
        "minhash_jaccard_estimate",
        "schema_profile",
        "prefix_filter_join",
        "dup_graph_degree_stats",
        "knn_graph",
        # round-6/7 heavies (round-6 verdict item 5)
        "exact_substring_dedup",
        "lsh_band_whatif",
        "containment_pairs",
        "tfidf_cosine_pairs",
        "embedding_near_dup",
        # round-8 (round-7 verdict item 3): the re-planned jaccard
        # pair consumers + the remaining round-7 additions + the
        # curation E2E
        "ngram_jaccard_pairs",
        "cross_source_dup_overlap",
        "dedup_threshold_sweep",
        "exact_substring_extend",
        "minhash_contamination",
        "curation_pipeline",
        # round-10 (round-9 verdict item 5): the IVF+PQ stack — new
        # in r9, quantizer-trained in r10 (6 extra training passes
        # over the corpus, all broadcast/argmin projections, so the
        # exponent should sit well under 1: the per-round driver
        # round-trips are scale-constant)
        "ann_ivf_pq",
        # round-10: the residual-encoding twin (IVFADC proper) —
        # same broadcast shape plus one assign+subtract corpus pass
        "ann_ivf_pq_residual",
    ]

    def run_at(sf_dir: str) -> dict[str, float]:
        out = {}
        for name in names:
            df = registry[name].fn(spark, sf_dir)
            out[name] = _time_query(df, 2)
            release_caches()
        return out

    import math

    t01 = run_at("/root/testdata/sf0.1")
    t1 = run_at(SF1_DIR)

    # 10× protocol throughput (round-7 verdict item 5): same
    # decode+correlate pipeline at 80 files / 400k messages —
    # embarrassingly parallel decode + one keyed shuffle, so the
    # exponent should sit at ≈1.
    proto01 = bench_protocol_throughput(spark)
    release_caches()
    proto1 = bench_protocol_throughput(spark, n_files=80)

    # the knn_note reports the census inputs the registered query
    # actually sees (distinct-vector counts OBSERVED in the two
    # corpora), not nominal constants that go stale if the generated
    # testdata or _SF1_REPS change (round-9 advice)
    n_distinct01 = (
        spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select("embedding").distinct().count()
    )
    n_distinct1 = (
        spark.read.parquet(f"{SF1_DIR}/embeddings.parquet")
        .select("embedding").distinct().count()
    )
    release_caches()
    protocol = {
        "sf0_1": proto01,
        "sf1": proto1,
        "ratio_sec": round(proto1["sec"] / proto01["sec"], 2),
        "scaling_exponent": round(math.log10(proto1["sec"] / proto01["sec"]), 3),
    }

    result = {
        "metric": "sf1_scale_check",
        "unit": "sec",
        "value": round(sum(t1.values()), 3),
        "sf0_1": t01,
        "sf1": t1,
        "ratio": {n: round(t1[n] / t01[n], 2) for n in names},
        "scaling_exponent": {
            n: round(math.log10(t1[n] / t01[n]), 3) for n in names
        },
        "knn_note": (
            "registered query self-scales (auto_scale census): "
            f"n_planes={_knn_planes(n_distinct01)} at sf0.1 "
            f"({n_distinct01} distinct vectors observed), "
            f"{_knn_planes(n_distinct1)} at sf1 ({n_distinct1}); "
            f"no bench-side overrides (fixed base KNN_PLANES={KNN_PLANES})"
        ),
        "protocol_throughput": protocol,
    }
    print(json.dumps(result))


# ------------------------------------------ jaccard-family decomposition
SF03_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".sf1data", "sf0.3"
)
SF3_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".sf1data", "sf3"
)


def _jdecomp_main(include_sf3: bool = False) -> None:
    """`bench.py --jdecomp` (round-8 verdict item 3): bound the
    jaccard-family superlinearity. BENCH_SF1 pins the trio's sf0.1→sf1
    exponents at 1.158/1.136/1.006; SCALING §31 attributes the excess
    to hash-aggregate group pressure on the pair relation. This mode
    adds the sf0.3 scale point and decomposes the shared core
    (jaccard_pairs over the documents shingles) into:

    - mass: Σ C(df,2), the exact join-output row count feeding the
      aggregate (from the census — plain code, no execution);
    - groups: distinct (doc_a, doc_b) group count out of the
      aggregate (the hash-agg state size);
    - t_join_count: the shared-shingle self-join under a single
      global count — pair PRODUCTION cost with no per-group state;
    - t_pairagg: the same join under the (doc_a, doc_b) count
      aggregate — production + group pressure; the difference
      isolates what the hash-agg state costs;
    - t_full: the registered trio verbatim.

    If t_join_count's exponent matches mass's, production is linear
    and any excess lives in (t_pairagg − t_join_count) — the group
    state. Exponent pairs over the two intervals (0.1→0.3, 0.3→1)
    further separate a smooth power law from a memory threshold.

    ``--jdecomp --sf3`` (round-10 verdict item 7) extends the ladder
    one more decade past sf0.3: a 30×-sf0.1 replica set (~350 MB
    parquet) adds the sf1→sf3 exponent interval, testing whether the
    per-row agg constant's growth flattens — the last inferential
    step in the 100 TB extrapolation that §33 + JDECOMP_CLUSTER
    otherwise make by argument."""
    import math

    from pyspark.sql import functions as F

    from ingestor_etl_spark.queries.dedup_ops import (
        _jaccard_census,
        _jaccard_sets,
        _shingled,
    )

    registry = load_all()
    spark = get_spark("ingestor-etl-spark-jdecomp")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if not os.path.exists(os.path.join(SF1_DIR, "documents.parquet")):
        _gen_scaled(spark, SF1_DIR, _SF1_REPS)
    if not os.path.exists(os.path.join(SF03_DIR, "documents.parquet")):
        _gen_scaled(spark, SF03_DIR, 3)
    if include_sf3 and not os.path.exists(
        os.path.join(SF3_DIR, "documents.parquet")
    ):
        _gen_scaled(spark, SF3_DIR, 30)

    trio = ("ngram_jaccard_pairs", "cross_source_dup_overlap", "dedup_threshold_sweep")
    scales = {"sf0.1": "/root/testdata/sf0.1", "sf0.3": SF03_DIR, "sf1": SF1_DIR}
    if include_sf3:
        scales["sf3"] = SF3_DIR
    out: dict[str, dict] = {}
    for label, sf_dir in scales.items():
        row: dict[str, object] = {}
        sets = _jaccard_sets(spark, _shingled(spark, sf_dir))
        max_df, mass, _ = _jaccard_census(sets)
        row["max_df"], row["mass_join_rows"] = max_df, mass
        el = sets.select("doc_id", "sz", F.explode("shingles").alias("s"))
        a, b = el.alias("a"), el.alias("b")
        joined = a.join(
            b,
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        join_count = joined.agg(F.count(F.lit(1)).alias("n"))
        pairagg = joined.groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        ).agg(F.count(F.lit(1)).alias("n_shared"))
        row["t_join_count"] = _time_query(join_count, 2)
        # the count doubles as _time_query's warm-up run, so the
        # heaviest relation in the mode executes 3× (count + 2 timed)
        # instead of 4× (round-9 advice); the timed best-of-2 noop
        # writes are unchanged, keeping numbers comparable with
        # JDECOMP.json r9
        row["groups"] = pairagg.count()
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            pairagg.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        row["t_pairagg"] = round(best, 3)
        release_caches()
        for name in trio:
            row[f"t_{name}"] = _time_query(registry[name].fn(spark, sf_dir), 2)
            release_caches()
        out[label] = row

    def expo(metric: str, lo: str, hi: str, decades: float) -> float:
        return round(
            math.log10(out[hi][metric] / max(out[lo][metric], 1e-9)) / decades, 3
        )

    metrics = [
        "mass_join_rows", "groups", "t_join_count", "t_pairagg",
        *[f"t_{n}" for n in trio],
    ]
    exponents = {
        m: {
            "sf0.1->sf0.3": expo(m, "sf0.1", "sf0.3", math.log10(3)),
            "sf0.3->sf1": expo(m, "sf0.3", "sf1", math.log10(10 / 3)),
            "sf0.1->sf1": expo(m, "sf0.1", "sf1", 1.0),
            **(
                {"sf1->sf3": expo(m, "sf1", "sf3", math.log10(3))}
                if include_sf3
                else {}
            ),
        }
        for m in metrics
    }
    print(
        json.dumps(
            {
                "metric": "jaccard_decomposition",
                "unit": "sec",
                "value": round(sum(out["sf1"][f"t_{n}"] for n in trio), 3),
                "scales": out,
                "exponents": exponents,
            }
        )
    )


# ------------------------------- headline on two executor JVMs
def _headline_cluster_main() -> None:
    """`bench.py --headline-cluster`: run the 17-query headline set
    on local-cluster[2,16,8192] — two REAL executor JVMs with
    process-isolated shuffle serialization — next to a same-day
    local[32] control, both on the split-layout copy (the primary
    headline rig). §33's round-10 addendum measured one query family
    under a split heap; this pins the WHOLE headline: every plan
    that survives here pays real inter-process exchange costs, so a
    query whose local[32] speed depended on in-process shuffle
    shortcuts would show an outsized cluster delta. Expected shape:
    a roughly uniform topology overhead on shuffle-bound queries
    (the two-process rig serializes exchanges a real fleet also
    serializes, but with only 2 JVMs to amortize) and parity on
    scan/broadcast-bound ones.

    The pandas-UDF queries (multimodal_features,
    pcap_diameter_correlated) need the package importable in the
    executors' python workers — shipped via addPyFile of a package
    zip, exactly like __spark_entry__._ensure_shipped does for the
    grading driver."""
    import tempfile
    import zipfile

    registry = load_all()
    names = [n for n in HEADLINE if n in registry]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def ship_pkg(spark) -> None:
        zip_path = os.path.join(
            tempfile.gettempdir(), "ingestor_etl_spark_pkg.zip"
        )
        pkg_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "ingestor_etl_spark"
        )
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, dirs, files in os.walk(pkg_dir):
                dirs[:] = [d for d in dirs if d != "__pycache__"]
                for fname in files:
                    if fname.endswith(".py"):
                        full = os.path.join(root, fname)
                        zf.write(
                            full,
                            os.path.relpath(
                                full, os.path.dirname(pkg_dir)
                            ),
                        )
        spark.sparkContext.addPyFile(zip_path)

    def run_headline(spark) -> dict[str, float]:
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        split_dir = _split_copy_dir(sf_dir)
        run_dir = split_dir or sf_dir
        if split_dir:
            spark.conf.set(
                "spark.sql.files.maxPartitionBytes",
                str(_SPLIT_MAX_PARTITION_BYTES),
            )
        out: dict[str, float] = {}
        for name in names:
            out[name] = _time_query(registry[name].fn(spark, run_dir), 3)
            release_caches()
        return out

    control = None
    if os.environ.get("SPARK_GRAFT_SPLIT_CONTROL", "1") != "0":
        spark = get_spark("ingestor-etl-spark-headline-control")
        control = run_headline(spark)
        spark.stop()

    os.environ["SPARK_GRAFT_ON_CLUSTER"] = "1"
    try:
        spark = get_spark(
            "ingestor-etl-spark-headline-cluster",
            **{
                "spark.master": "local-cluster[2,16,8192]",
                "spark.executor.memory": "8192m",
            },
        )
    finally:
        del os.environ["SPARK_GRAFT_ON_CLUSTER"]
    ship_pkg(spark)
    cluster = run_headline(spark)
    spark.stop()

    result = {
        "metric": "headline_split_vs_cluster",
        "unit": "sec",
        "value": round(sum(cluster.values()), 3),
        "sf": 0.1,
        "control_local32_total": (
            round(sum(control.values()), 3) if control else None
        ),
        "control_local32": control,
        "cluster_2x16_8g": cluster,
        "ratio": (
            {
                n: round(cluster[n] / control[n], 2)
                for n in names
            }
            if control
            else None
        ),
    }
    print(json.dumps(result))


# ------------------------------- split-heap agg-constant check
def _jdecomp_cluster_main() -> None:
    """`bench.py --jdecomp-cluster` (round-9 verdict item 3): turn
    §33's "distributes away at cluster scale" ARGUMENT into a
    MEASUREMENT. §33 bounds the jaccard trio's superlinearity to a
    +36%/decade per-row final-agg constant attributed to 103M-group
    hash-map pressure at a FIXED single-JVM heap; the distribution
    claim predicts that splitting the same total heap across more
    executor JVMs (each holding half the group state) moves the sf1
    per-row constant back toward the sf0.1 value.

    This mode runs the sf1 decomposition point twice in one process,
    same day, same box:
    - control: the standard bench session (local[32], one 8g JVM —
      exactly the JDECOMP.json rig);
    - split: local-cluster[2,16,4096] — the SAME 32 cores and the
      SAME 8g of total executor heap, split across two executor
      JVMs, so the only variable is how many JVMs hold the final
      aggregate's hash state.
    Reported per config: t_join_count (production only), t_pairagg
    (production + group state), groups, and the §33 constants
    t_pairagg/mass and (t_pairagg − t_join_count)/mass in ns/row."""
    from pyspark.sql import functions as F

    from ingestor_etl_spark.queries.dedup_ops import (
        _jaccard_census,
        _jaccard_sets,
        _shingled,
    )

    def sf1_point(spark) -> dict:
        sets = _jaccard_sets(spark, _shingled(spark, SF1_DIR))
        _, mass, _ = _jaccard_census(sets)
        el = sets.select("doc_id", "sz", F.explode("shingles").alias("s"))
        a, b = el.alias("a"), el.alias("b")
        joined = a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        join_count = joined.agg(F.count(F.lit(1)).alias("n"))
        pairagg = joined.groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        ).agg(F.count(F.lit(1)).alias("n_shared"))
        row: dict[str, object] = {"mass_join_rows": mass}
        row["t_join_count"] = _time_query(join_count, 2)
        row["groups"] = pairagg.count()  # doubles as the warm-up
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            pairagg.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        row["t_pairagg"] = round(best, 3)
        row["agg_ns_per_row"] = round(row["t_pairagg"] / mass * 1e9, 1)
        row["delta_ns_per_row"] = round(
            (row["t_pairagg"] - row["t_join_count"]) / mass * 1e9, 1
        )
        release_caches()
        return row

    # two split variants, selected by SPARK_GRAFT_SPLIT_MB:
    # - 4096 (default): same TOTAL heap split in two — holds
    #   groups-per-heap-GB constant, isolating the JVM-size/GC term;
    # - 8192: two standard-heap executors — groups-per-heap-GB
    #   HALVES, which is what actually happens when the fleet grows
    #   with the data (the §33 distribution claim).
    # SPARK_GRAFT_SPLIT_CONTROL=0 skips the control re-run when a
    # same-day control measurement already exists.
    mem_mb = int(os.environ.get("SPARK_GRAFT_SPLIT_MB", "4096"))
    control = None
    if os.environ.get("SPARK_GRAFT_SPLIT_CONTROL", "1") != "0":
        spark = get_spark("ingestor-etl-spark-jdecomp-control")
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        if not os.path.exists(os.path.join(SF1_DIR, "documents.parquet")):
            _gen_scaled(spark, SF1_DIR, _SF1_REPS)
        control = sf1_point(spark)
        spark.stop()

    os.environ["SPARK_GRAFT_ON_CLUSTER"] = "1"
    try:
        spark = get_spark(
            "ingestor-etl-spark-jdecomp-split",
            **{
                "spark.master": f"local-cluster[2,16,{mem_mb}]",
                "spark.executor.memory": f"{mem_mb}m",
            },
        )
    finally:
        del os.environ["SPARK_GRAFT_ON_CLUSTER"]
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    split = sf1_point(spark)
    spark.stop()

    print(
        json.dumps(
            {
                "metric": "jdecomp_split_heap",
                "unit": "sec",
                "value": split["t_pairagg"],
                "sf": 1,
                "control_local32_8g": control,
                f"split_local_cluster_2x16_{mem_mb}m": split,
                "sf01_reference_ns_per_row": 40.6,
            }
        )
    )


# ---------------------------------------------- near-dup cap haircut
def _haircut_main() -> None:
    """`bench.py --haircut` (round-8 verdict item 4): measure
    embedding_near_dup's bucket-cap recall haircut at sf1, where the
    candidate-mass census actually engages the cap (5.5e7 > 10e6 —
    it can never fire at oracle scale). Compares the registered
    auto_scale output (capped) against the uncut contract at the
    SAME census-chosen plane count (bucket_cap=None), per cos_sim
    band. capped ⊆ uncapped is pinned by test_wave24; this records
    the dropped-pair fraction next to the sf0.1 figure in
    SCALING.md."""
    from pyspark.sql import functions as F

    from ingestor_etl_spark.queries.vector_ops import (
        _as_double,
        _near_dup_from,
        _near_dup_planes,
    )

    spark = get_spark("ingestor-etl-spark-haircut")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    if not os.path.exists(os.path.join(SF1_DIR, "embeddings.parquet")):
        _gen_scaled(spark, SF1_DIR, _SF1_REPS)

    e = (
        spark.read.parquet(f"{SF1_DIR}/embeddings.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", _as_double(F.col("embedding")).alias("v"))
    )

    # round-9 verdict item 4: the organic sf1 corpus has no pairs
    # above cos 0.8, so §34's key claim ("high-confidence pairs
    # collide in several tables and survive the cap") was derived,
    # not observed. Plant 500 partners at cosine 0.85–0.95 — EXACT
    # by construction: w = c·nv + sqrt(1−c²)·û with û the fixed
    # direction r Gram-Schmidt-orthogonalized against nv, so
    # cos(v, w) = c — one partner per base (vec_id ≡ 21 mod 40),
    # partner ids offset by 10⁶, c per pair from a deterministic
    # LCG over [0.85, 0.95). The augmented corpus then reports the
    # planted pairs' survival under the census-engaged cap next to
    # the organic band table.
    from ingestor_etl_spark.queries.vector_ops import _dot as _vdot

    PLANT_OFF = 1_000_000
    r_dir = F.array(
        *[
            F.lit(((k * 1103515245 + 12345) % 2001 - 1000) / 1000.0)
            for k in range(64)
        ]
    )
    nrm = F.sqrt(_vdot(F.col("v"), F.col("v")))
    ct = 0.85 + F.pmod(F.col("vec_id") * 2654435761, F.lit(1000)).cast(
        "double"
    ) / 10000.0
    planted = (
        e.where(F.col("vec_id") % 40 == 21)
        .select(
            "vec_id",
            F.transform("v", lambda x: x / nrm).alias("nv"),
            ct.alias("ct"),
        )
        .withColumn("rd", _vdot(r_dir, F.col("nv")))
        .withColumn(
            "u",
            F.zip_with(r_dir, F.col("nv"), lambda r, n: r - F.col("rd") * n),
        )
        .withColumn("un", F.sqrt(_vdot(F.col("u"), F.col("u"))))
        .select(
            (F.col("vec_id") + PLANT_OFF).alias("vec_id"),
            F.zip_with(
                F.col("nv"),
                F.col("u"),
                lambda n, uu: F.col("ct") * n
                + F.sqrt(1 - F.col("ct") * F.col("ct")) * uu / F.col("un"),
            ).alias("v"),
        )
    )
    n_planted = planted.count()
    e = e.unionByName(planted)

    def planted_found(df) -> int:
        return df.where(
            (F.col("vec_b") == F.col("vec_a") + PLANT_OFF)
            & (F.col("vec_a") % 40 == 21)
            & (F.col("cos_sim") >= 0.8)
        ).count()

    def banded(df) -> dict[str, int]:
        rows = (
            df.groupBy(
                F.when(F.col("cos_sim") >= 0.8, "0.80-1.00")
                .when(F.col("cos_sim") >= 0.6, "0.60-0.80")
                .otherwise("0.45-0.60")
                .alias("band")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        return {r["band"]: r["n"] for r in rows}

    from ingestor_etl_spark.plans.layout import materialize

    n_planes = _near_dup_planes(e.select("v").distinct().count())
    capped_df = materialize(_near_dup_from(e, auto_scale=True))
    capped, planted_capped = banded(capped_df), planted_found(capped_df)
    release_caches()
    uncapped_df = materialize(
        _near_dup_from(e, n_planes=n_planes, bucket_cap=None)
    )
    uncapped = banded(uncapped_df)
    planted_uncapped = planted_found(uncapped_df)
    release_caches()
    bands = sorted(set(capped) | set(uncapped))
    total_c, total_u = sum(capped.values()), sum(uncapped.values())
    print(
        json.dumps(
            {
                "metric": "near_dup_cap_haircut_sf1",
                "unit": "dropped_pair_fraction",
                "value": round(1 - total_c / max(total_u, 1), 6),
                "n_planes": n_planes,
                "pairs_capped": total_c,
                "pairs_uncapped": total_u,
                "planted_pairs": {
                    "n_planted": n_planted,
                    "target_cos_band": "0.85-0.95",
                    "found_uncapped": planted_uncapped,
                    "found_capped": planted_capped,
                    "survival_fraction": round(
                        planted_capped / max(planted_uncapped, 1), 6
                    ),
                },
                "per_band": {
                    b: {
                        "capped": capped.get(b, 0),
                        "uncapped": uncapped.get(b, 0),
                        "dropped_fraction": round(
                            1 - capped.get(b, 0) / max(uncapped.get(b, 0), 1), 6
                        ),
                    }
                    for b in bands
                },
            }
        )
    )


# -------------------------------------------------- protocol variance
def _protocol_main() -> None:
    """`bench.py --protocol` (round-8 verdict item 7): the pinned
    protocol-throughput recipe. Same-session runs spanned 2×
    (44.9k–85.1k msgs/s in BENCH_LOCAL_r08) because the 0.5-0.7 s
    pipeline is small against scheduler/GC noise on a shared 32-core
    VM. Recipe (also in SCALING.md): idle box, ONE Spark session,
    warm-up job, then N ≥ 5 independent measurements of the same
    decode+correlate pipeline (each itself best-of-3 noop writes);
    report best with ALL runs recorded. Best-of is the right
    estimator for a fixed workload: contention only ever adds time."""
    n = int(os.environ.get("SPARK_GRAFT_PROTOCOL_RUNS", "5"))
    spark = get_spark("ingestor-etl-spark-protocol")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    runs = []
    for _ in range(n):
        runs.append(bench_protocol_throughput(spark))
        release_caches()
    best = max(runs, key=lambda p: p["msgs_per_sec"])
    print(
        json.dumps(
            {
                "metric": "protocol_throughput_recipe",
                "unit": "msgs_per_sec",
                "value": best["msgs_per_sec"],
                "n_runs": n,
                "best": best,
                "runs_msgs_per_sec": [r["msgs_per_sec"] for r in runs],
                "runs_sec": [r["sec"] for r in runs],
            }
        )
    )


# ----------------------------------------------------------- skew stress
def _skew_main() -> None:
    """`bench.py --skew`: stress the blowup guards on generated
    hot-key data at meaningful volume (not the toy unit fixtures) —
    one hot key carrying ~30-50% of the mass, exactly the shape that
    kills unguarded plans at 100 TB. Times the four guard surfaces
    the round-4 verdict asked for (pagerank candidate cut, the
    stop-shingle truth leg, LSH hot-bucket pair emission, salted agg
    + salted skew join) plus entity_resolution's hot-block fallback
    on a 90%-corporate-suffix catalog. Prints ONE JSON line; the
    committed copy lives in SKEWBENCH.json with the analysis in
    SCALING.md."""
    from pyspark.sql import functions as F

    from ingestor_etl_spark.plans.layout import explode_hot_keys, salted_agg
    from ingestor_etl_spark.queries.dedup_ops import (
        _band_pairs_from_sigs,
        stop_shingle_cut,
    )
    from ingestor_etl_spark.queries.rank_ops import candidate_pairs
    from ingestor_etl_spark.queries.similarity_ops import er_scored_pairs
    from ingestor_etl_spark.queries.vector_ops import (
        _knn_graph_from,
        _near_dup_from,
    )

    spark = get_spark("ingestor-etl-spark-skewbench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results: dict[str, dict] = {}

    def run(name: str, df, meta: dict) -> None:
        t = _time_query(df, 2)
        results[name] = {"sec": t, **meta}
        release_caches()

    # 1. pagerank candidate cut: 1M (doc, seg) rows, ONE segment on
    # 30% of them; uncut this is C(300k, 2) ≈ 4.5e10 pairs.
    n, hot_frac = 1_000_000, 0.3
    segs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 3, F.lit("HOTSEG"))
        .otherwise(F.concat(F.lit("seg"), (F.col("id") % 100_000).cast("string")))
        .alias("seg"),
    )
    run(
        "pagerank_candidates_hot",
        candidate_pairs(segs),
        {"rows": n, "hot_mass": hot_frac, "uncut_pairs": "C(300k,2)≈4.5e10"},
    )

    # 2. stop-shingle cut + exact-truth self-join: 1M exploded
    # (doc, shingle) rows, one shingle on 30%.
    exploded = spark.range(n).select(
        (F.col("id") % 200_000).alias("doc_id"),
        F.when(F.col("id") % 10 < 3, F.lit("the quick brown"))
        .otherwise(
            F.concat(F.lit("sh"), (F.col("id") % 150_000).cast("string"))
        )
        .alias("shingle"),
    ).dropDuplicates()
    live = stop_shingle_cut(exploded)
    la, lb = live.alias("la"), live.alias("lb")
    truth_shared = (
        la.join(
            lb,
            (F.col("la.shingle") == F.col("lb.shingle"))
            & (F.col("la.doc_id") < F.col("lb.doc_id")),
        )
        .groupBy(F.col("la.doc_id"), F.col("lb.doc_id"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    run(
        "stop_shingle_truth_hot",
        truth_shared,
        {"rows": n, "hot_mass": hot_frac, "uncut_pairs": "≈4.5e10"},
    )

    # 3. LSH hot bucket: 50k signatures, 2k docs share ONE signature
    # (true mass duplication — the pairs MUST be emitted for dedup);
    # measures bounded pair-emission throughput, ~2M pairs.
    sigs = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        *[
            F.when(F.col("id") % 25 == 0, F.lit(7))
            .otherwise(F.col("id") * 31 + i)
            .alias(s)
            for i, s in enumerate(
                ("mh0", "mh1", "mh2", "mh3", "mh4", "mh5")
            )
        ],
    )
    run(
        "lsh_bucket_hot",
        _band_pairs_from_sigs(sigs),
        {"docs": 50_000, "hot_bucket_docs": 2_000, "emitted_pairs": "≈2M×3bands"},
    )

    # 4. salted aggregation: 5M rows over 3 keys — every key hot.
    ev = spark.range(5_000_000).select(
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") % 1000).cast("decimal(12,2)").alias("v"),
    )
    run(
        "salted_agg_hot",
        salted_agg(ev, ["k"], {"n": ("v", "count"), "s": ("v", "sum")}),
        {"rows": 5_000_000, "keys": 3},
    )

    # 5. salted skew join: 5M fact rows, 50% on one key, 100k-key dim.
    fact = spark.range(5_000_000).select(
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 100_000).alias("hk"),
        F.col("id").cast("decimal(12,2)").alias("v"),
    )
    dim = spark.range(100_000).select(
        F.col("id").alias("hk"), (F.col("id") * 7 % 997).alias("dim_code")
    )
    hot_keys = spark.range(1).select(F.lit(0).alias("hk"))
    big_s, small_s = explode_hot_keys(fact, dim, ["hk"], hot_keys)
    joined = (
        big_s.join(small_s, ["hk", "__salt"])
        .groupBy("hk")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    )
    run(
        "salted_skew_join_hot",
        joined,
        {"fact_rows": 5_000_000, "hot_mass": 0.5, "dim_keys": 100_000},
    )

    # 6. entity resolution on a 90%-corporate-suffix catalog: 200k
    # clean names, 180k ending " inc" (one 3-char block). The middle
    # token starts with a discriminative 3-hex-char bucket, so the
    # hot-block fallback key splits the suffix mass into ~4096
    # sub-blocks of ~44 names (bounded comparisons); the dirty
    # perturbation drops the FIRST char (last + middle tokens intact,
    # so both block keys survive and the comparisons are real).
    n_names = 200_000
    base = spark.range(n_names).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            F.lit("name"),
            F.col("id").cast("string"),
            F.lit(" "),
            F.lpad(F.hex(F.col("id") % 4096), 3, "0"),
            F.lit("mid"),
            F.when(F.col("id") % 10 < 9, F.lit(" inc")).otherwise(
                F.concat(F.lit(" co"), (F.col("id") % 97).cast("string"))
            ),
        ).alias("p_name"),
    )
    dirty = base.select(
        F.col("p_partkey").alias("dirty_id"),
        F.expr("substr(p_name, 2)").alias("dirty_name"),
    )
    run(
        "entity_resolution_hot_suffix",
        er_scored_pairs(dirty, base),
        {"names": n_names, "suffix_mass": 0.9},
    )

    # 7. identical-signature mega-cluster (round-5 verdict weak flag):
    # 100k docs share ONE full minhash signature (an exact-duplicate
    # boilerplate cluster in raw crawl data) next to 100k distinct
    # docs. Uncollapsed, the band bucket self-join emits 3 bands ×
    # C(100k,2) ≈ 1.5e10 rows plus a distinct-shuffle over them; the
    # signature collapse (_sig_clusters) reduces the cluster to ONE
    # row per band bucket. expand=False reports intra mass as star
    # edges — output linear, connected components unchanged.
    from ingestor_etl_spark.queries.dedup_ops import SALTS

    sigs2 = spark.range(200_000).select(
        F.col("id").alias("doc_id"),
        *[
            F.when(F.col("id") % 2 == 0, F.lit(7))
            .otherwise(F.col("id") * 31 + i)
            .alias(s)
            for i, s in enumerate(SALTS)
        ],
    )
    run(
        "lsh_identical_sig_cluster",
        _band_pairs_from_sigs(sigs2, expand=False),
        {
            "docs": 200_000,
            "dup_cluster_docs": 100_000,
            "uncollapsed_join_rows": "3×C(100k,2)≈1.5e10",
        },
    )

    # 8. identical-embedding mega-cluster (same flag, vector side):
    # 100k bit-identical vectors + 2k distinct ones. Uncollapsed,
    # every one of the N_TABLES=10 bucket joins emits C(100k,2) rows;
    # collapsed (_vec_clusters) the cluster is one row per table.
    vecs = spark.range(102_000).selectExpr(
        "id AS vec_id",
        "CASE WHEN id % 51 != 0 "
        " THEN transform(sequence(0, 63), k -> 0.5D) "
        " ELSE transform(sequence(0, 63), k -> "
        "   cast((id * 2654435761 + k * 97) % 2001 - 1000 AS double) / 1000.0D) "
        "END AS v",
    )
    run(
        "vector_identical_cluster_neardup",
        _near_dup_from(vecs, expand=False),
        {
            "vecs": 102_000,
            "dup_cluster_vecs": 100_000,
            "uncollapsed_join_rows": "10×C(100k,2)≈5e13",
        },
    )
    # knn_graph measured through its REGISTERED exact semantics
    # (auto_scale census, as the registered query runs since round
    # 9): the top-(K+1) member prune keeps expansion linear (m×K
    # edges for the dup cluster), so the full kNN output itself is
    # bounded. ~2k distinct vectors → the census keeps KNN_PLANES.
    run(
        "vector_identical_cluster_knn",
        _knn_graph_from(vecs, auto_scale=True),
        {"vecs": 102_000, "dup_cluster_vecs": 100_000, "output": "≈102k×K edges"},
    )

    # 9. hot-shingle exact-Jaccard pairs (round-7 verdict item 1):
    # 200k docs × 10 shingles, ONE boilerplate shingle on 30% of the
    # corpus — the uncut shared-shingle self-join would emit
    # C(60k,2) ≈ 1.8e9 rows from that shingle alone, so the df
    # census (Σ C(df,2) > JACCARD_UNCUT_MASS_MAX) routes the plan to
    # the lossless PPJoin prefix+size filter, whose rare-first
    # prefixes exclude the hot shingle entirely; candidates come
    # only from the ~500k-token rare tail (df ≈ 4).
    from ingestor_etl_spark.queries.dedup_ops import jaccard_pairs

    hot_docs = spark.range(200_000).selectExpr(
        "id AS doc_id",
        "array_distinct(concat("
        " transform(sequence(0, 8), i -> concat('sh', pmod(hash(id, i), 500000))),"
        " CASE WHEN id % 10 < 3 THEN array('the quick brown')"
        "      ELSE array(concat('sh', pmod(hash(id, 99), 500000))) END"
        ")) AS shingles",
    )
    run(
        "jaccard_pairs_hot_shingle",
        jaccard_pairs(spark, hot_docs),
        {
            "docs": 200_000,
            "hot_shingle_docs": 60_000,
            "uncut_join_rows": "C(60k,2)≈1.8e9 from one shingle",
            "routed_plan": "ppjoin_prefix (census)",
        },
    )

    # 10. hot inverted list for the IVF+PQ stacks (round 10): 100k
    # vectors, 90% jittered around ONE direction — the shape a
    # deduplicated-but-not-exact crawl corpus produces, where a
    # single coarse cell can end up holding most of the corpus and
    # every query probing it generates O(list) ADC candidates.
    # Measured through the REGISTERED queries end-to-end (training
    # included) on a temp parquet corpus with the standard layout.
    # Coarse training does NOT rescue this shape (measured trained
    # list sizes: 90000 / 9999 / 1 — the cluster is tighter than the
    # centroid resolution); since round 11 the census-gated hot-cell
    # SUB-SPLIT does (_ivf_candidate_cells: load factor 7.2 > 4.0
    # engages per-cell local centroids, queries probe
    # IVF_SUB_NPROBE/IVF_SUB_K of the hot cell), so these rows now
    # pin the mitigation: ann_ivf_pq 10.2 s (r10, uncapped,
    # nprobe=2) → 3.0 s (capped, nprobe=4), within ~20% of the
    # uniform-corpus cost, with similarity quality preserved
    # (tests/test_wave27).
    import shutil as _sh
    import tempfile as _tf

    ivf_dir = _tf.mkdtemp(prefix="skew_ivf_")
    try:
        spark.range(100_000).selectExpr(
            "id AS vec_id",
            "transform(sequence(0, 63), d -> CASE WHEN id % 10 < 9"
            " THEN 1.0D + cast(pmod(hash(id, d), 1000) AS double) / 1000000.0D"
            " ELSE cast(pmod(hash(id, d), 2000) - 1000 AS double) / 1000.0D"
            " END) AS embedding",
        ).write.mode("overwrite").parquet(f"{ivf_dir}/embeddings.parquet")
        # round 14 (round-12 verdict item 7, carried through r13 item
        # 9): ann_ivf_hamming joins the hot-list rows — it shares the
        # coarse machinery (census-gated sub-split) but scores via the
        # Hamming sketch, so its hot-cell behavior needs its own pin.
        for q in ("ann_ivf_pq", "ann_ivf_pq_residual", "ann_ivf_hamming"):
            run(
                f"{q}_hot_list",
                load_all()[q].fn(spark, ivf_dir),
                {
                    "vecs": 100_000,
                    "hot_cluster_frac": 0.9,
                    "shape": "one dominant direction → hot coarse cell(s)",
                },
            )
    finally:
        _sh.rmtree(ivf_dir, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "skew_bench",
                "unit": "sec",
                "value": round(sum(r["sec"] for r in results.values()), 3),
                "workloads": results,
            }
        )
    )


# ------------------------------------------------ skew scale ladder
def _skew_scale_main() -> None:
    """`bench.py --skew-scale` (round-11 verdict item 6): the
    hot-inverted-list corpus (the --skew generator: 90% of vectors
    jittered around ONE direction) at TWO scales, timing the
    REGISTERED ann_ivf_pq end-to-end, so the census-gated sub-split's
    ENGAGED path gets a growth exponent instead of a single point.
    The quadratic fear is every query ADC-scanning the hot cell
    (O(corpus) candidates/query → superlinear wall time as both the
    corpus and the cell grow); the sub-split bounds probed mass at
    ~load·SUB_NPROBE/SUB_K of the hot cell, so measured time should
    grow ~linearly (exponent ≈ 1) — training and encode passes are
    one scan each. Since round 12 the geometry census also engages
    at these corpora (nlist ∝ √N, 256 PQ codes), so this doubles as
    the first timed run of the SCALED literal-codebook path."""
    import math
    import shutil as _sh
    import tempfile as _tf

    registry = load_all()
    spark = get_spark("ingestor-etl-spark-skewscale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out: dict[str, dict] = {}
    for n in (100_000, 200_000):
        d = _tf.mkdtemp(prefix="skewscale_")
        try:
            spark.range(n).selectExpr(
                "id AS vec_id",
                "transform(sequence(0, 63), dd -> CASE WHEN id % 10 < 9"
                " THEN 1.0D + cast(pmod(hash(id, dd), 1000) AS double)"
                "      / 1000000.0D"
                " ELSE cast(pmod(hash(id, dd), 2000) - 1000 AS double)"
                "      / 1000.0D END) AS embedding",
            ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
            # warm-up execution first (Arrow/UDF worker spin-up and
            # codegen otherwise land entirely on the first scale
            # point and fake a negative exponent), then best-of-2
            best = float("inf")
            for i in range(3):
                start = time.perf_counter()
                registry["ann_ivf_pq"].fn(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                sec = round(time.perf_counter() - start, 3)
                release_caches()
                if i > 0:
                    best = min(best, sec)
            out[str(n)] = {"vecs": n, "sec": best}
        finally:
            _sh.rmtree(d, ignore_errors=True)
    expo = round(
        math.log(out["200000"]["sec"] / out["100000"]["sec"]) / math.log(2), 3
    )
    print(
        json.dumps(
            {
                "metric": "ivf_hot_list_scale",
                "unit": "sec",
                "value": out["200000"]["sec"],
                "scales": out,
                "time_exponent_100k_200k": expo,
                "note": "hot-cluster corpus (90% one direction);"
                " registered ann_ivf_pq end-to-end incl. training;"
                " sub-split + scaled geometry engaged at both scales",
            }
        )
    )


if __name__ == "__main__":
    if "--skew-scale" in sys.argv:
        _skew_scale_main()
    elif "--skew" in sys.argv:
        _skew_main()
    elif "--sf1" in sys.argv:
        _sf1_main()
    elif "--jdecomp-cluster" in sys.argv:
        _jdecomp_cluster_main()
    elif "--headline-cluster" in sys.argv:
        _headline_cluster_main()
    elif "--jdecomp" in sys.argv:
        _jdecomp_main(include_sf3="--sf3" in sys.argv)
    elif "--haircut" in sys.argv:
        _haircut_main()
    elif "--protocol" in sys.argv:
        _protocol_main()
    else:
        main()
