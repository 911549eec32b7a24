"""Round-4 wave-4 operator semantics: GDPR delete propagation,
zone-map data skipping, incremental rollup maintenance, lang-ID
confusion matrix, per-source winsorization."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.queries import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


# --------------------------------------------------- gdpr_delete_audit
def test_gdpr_delete_removes_exactly_the_tombstoned_users(spark):
    from ingestor_etl_spark.queries.warehouse_ops import GDPR_TOMBSTONE_MOD

    events = load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type"
    ).collect()
    rows = REGISTRY["gdpr_delete_audit"].fn(spark, SF).collect()
    by_type = {}
    for e in events:
        doomed = e.user_id % GDPR_TOMBSTONE_MOD == 0
        n_before, n_after, chk = by_type.get(e.event_type, (0, 0, 0))
        if not doomed:
            n_after += 1
            chk += int(
                hashlib.md5(str(e.event_id).encode()).hexdigest()[:8], 16
            )
        by_type[e.event_type] = (n_before + 1, n_after, chk)
    got = {
        r.event_type: (r.rows_before, r.rows_after, r.survivor_checksum)
        for r in rows
    }
    assert got == by_type
    for r in rows:
        assert r.rows_before == r.rows_deleted + r.rows_after
    assert any(r.rows_deleted > 0 for r in rows), "no deletions exercised"


# ------------------------------------------------------ zone_map_prune
def test_zone_map_pruned_buckets_have_no_matches(spark):
    from ingestor_etl_spark.queries.warehouse_ops import (
        ZONE_PRED_HI,
        ZONE_PRED_LO,
    )

    rows = REGISTRY["zone_map_prune"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        if r.pruned:
            assert r.n_match == 0, r
        assert r.min_ts_us <= r.max_ts_us
    # pruning must actually skip something AND keep something here
    assert any(r.pruned for r in rows)
    assert any(not r.pruned for r in rows)
    # total matches equal a direct count of the predicate
    e = load_table(spark, SF, "events")
    direct = e.where(
        (F.col("ts") >= F.lit(ZONE_PRED_LO).cast("timestamp"))
        & (F.col("ts") < F.lit(ZONE_PRED_HI).cast("timestamp"))
    ).count()
    assert sum(r.n_match for r in rows) == direct
    # buckets partition the table exactly
    assert sum(r.n_rows for r in rows) == e.count()


# --------------------------------------------------- incremental_rollup
def test_incremental_rollup_equals_direct_recompute(spark):
    """base ⊕ delta must be bit-identical to the one-pass rollup."""
    got = {
        (r.event_type, r.hr_us): (r.n_events, r.total_value)
        for r in REGISTRY["incremental_rollup"].fn(spark, SF).collect()
    }
    e = load_table(spark, SF, "events")
    direct = {
        (r.event_type, r.hr_us): (r.n, r.sv)
        for r in e.groupBy(
            "event_type",
            F.unix_micros(F.date_trunc("hour", "ts")).alias("hr_us"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("decimal(14,2)")
            .cast("double")
            .alias("sv"),
        )
        .collect()
    }
    assert got == direct


# --------------------------------------------------- lang_id_confusion
def test_confusion_matrix_marginals_match_lang_id(spark):
    rows = REGISTRY["lang_id_confusion"].fn(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r.n for r in rows) == n_docs
    # joint recount from the per-doc lang_id query
    per_doc = REGISTRY["lang_id"].fn(spark, SF).collect()
    joint = {}
    for r in per_doc:
        key = (r.lang_declared, r.lang_pred)
        joint[key] = joint.get(key, 0) + 1
    assert {(r.lang_declared, r.lang_pred): r.n for r in rows} == joint
    # zh has no marker list: it must never be predicted
    assert all(r.lang_pred != "zh" for r in rows)


# ----------------------------------------------------- winsorize_scores
def test_winsorize_bounds_are_exact_type1_quantiles(spark):
    from ingestor_etl_spark.queries.profile_ops import (
        WINSOR_HI_PCT,
        WINSOR_LO_PCT,
    )

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    per_src = {}
    for d in docs:
        per_src.setdefault(d.source, []).append(d.n_chars)

    def type1(vals, pct):
        vals = sorted(vals)
        need = math.ceil(pct * len(vals) / 100)
        return vals[need - 1]

    rows = REGISTRY["winsorize_scores"].fn(spark, SF).collect()
    assert len(rows) == len(docs)
    for r in rows:
        lo = type1(per_src[r.source], WINSOR_LO_PCT)
        hi = type1(per_src[r.source], WINSOR_HI_PCT)
        assert (r.lo, r.hi) == (lo, hi), r.source
        assert r.clipped == min(max(r.raw_score, lo), hi)
    # clipping must engage on at least one tail at this sf
    assert any(r.clipped != r.raw_score for r in rows)
