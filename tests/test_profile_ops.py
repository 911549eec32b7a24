"""Profiling operator semantics (queries/profile_ops.py)."""

from __future__ import annotations

from collections import Counter

from ingestor_etl_spark.queries import load_all
from ingestor_etl_spark.queries.profile_ops import HOLDOUT_PER_SOURCE

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def test_skew_profile_identifies_true_head_keys(spark):
    from ingestor_etl_spark.catalog import load_table

    events = load_table(spark, SF, "events").select("user_id").collect()
    true_counts = Counter(r.user_id for r in events)
    rows = REGISTRY["key_skew_profile"].fn(spark, SF).collect()
    expected_head = sorted(
        true_counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[: len(rows)]
    assert [(r.user_id, r.n) for r in rows] == expected_head
    total = sum(true_counts.values())
    for r in rows:
        assert abs(r.share - r.n / total) < 1e-6
        assert r.total_rows == total
        assert r.n_keys == len(true_counts)


def test_holdout_exactly_k_per_source_and_stable(spark):
    fn = REGISTRY["eval_holdout_split"].fn
    rows = fn(spark, SF).collect()
    per_source = Counter(r.source for r in rows)
    from ingestor_etl_spark.catalog import load_table

    source_sizes = Counter(
        r.source for r in load_table(spark, SF, "documents").collect()
    )
    for src, size in source_sizes.items():
        assert per_source[src] == min(HOLDOUT_PER_SOURCE, size)
    # frozen split: identical on re-run
    assert sorted((r.doc_id, r.rnk) for r in rows) == sorted(
        (r.doc_id, r.rnk) for r in fn(spark, SF).collect()
    )


def test_calibration_matches_percent_rank_window_exactly(spark):
    """The histogram CDF must equal the classic percent_rank window
    (PARTITION BY source ORDER BY raw_score) bit-for-bit — the
    exact-window form is kept here as the cross-check while the
    registered plan avoids the per-source row sort."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ingestor_etl_spark.catalog import load_table

    rows = REGISTRY["score_calibration"].fn(spark, SF).collect()
    d = load_table(spark, SF, "documents")
    toks = F.split(F.trim(F.col("text")), r" +")
    w = Window.partitionBy("source").orderBy("raw_score")
    ref = (
        d.select(
            "doc_id", "source", F.size(toks).cast("long").alias("raw_score")
        )
        .withColumn("calibrated", F.round(F.percent_rank().over(w), 6))
        .collect()
    )
    assert {r.doc_id: r.calibrated for r in rows} == {
        r.doc_id: r.calibrated for r in ref
    }


def test_calibration_is_uniform_within_source(spark):
    rows = REGISTRY["score_calibration"].fn(spark, SF).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for src, rs in by_source.items():
        assert min(r.calibrated for r in rs) == 0.0
        # ties share a calibrated value
        by_score = {}
        for r in rs:
            by_score.setdefault(r.raw_score, set()).add(r.calibrated)
        assert all(len(v) == 1 for v in by_score.values())
        # monotone in raw score
        rs_sorted = sorted(rs, key=lambda r: (r.raw_score, r.doc_id))
        cal = [r.calibrated for r in rs_sorted]
        assert cal == sorted(cal)


def test_calibration_plan_windows_only_the_histogram(spark):
    """Scale guard: no Window may consume row-level data — every
    Window in the physical plan sits above the (source, raw_score)
    HashAggregate, and the CDF rejoins via broadcast."""
    import re

    df = REGISTRY["score_calibration"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "percent_rank" not in plan.lower()
    assert "BroadcastHashJoin" in plan
    window_at = [m.start() for m in re.finditer(r"\bWindow\b", plan)]
    agg_at = [m.start() for m in re.finditer(r"HashAggregate", plan)]
    assert window_at and agg_at
    assert all(any(a > w for a in agg_at) for w in window_at)


def test_holdout_window_input_is_prefiltered(spark):
    """Scale guard for the two-phase split: the row_number window's
    input must be the md5-threshold-filtered relation, i.e. a Filter
    on the 32-bit hash prefix (conv(substring(md5..)) < thr) appears
    BELOW the Window in the physical plan."""
    df = REGISTRY["eval_holdout_split"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "row_number" in plan
    w_at = plan.index("Window")
    f_at = plan.find("conv(", w_at)
    assert f_at > w_at, "prefilter must sit below the window"


def test_dataset_card_internally_consistent(spark):
    card = REGISTRY["dataset_card"].fn(spark, SF).collect()[0]
    assert card.n_docs > 0
    assert card.min_tokens <= card.max_tokens
    assert card.n_tokens >= card.n_docs * card.min_tokens
    assert card.n_exact_dups >= 0
    assert card.n_langs >= 1 and card.n_sources >= 1
