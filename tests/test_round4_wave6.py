"""Round-4 wave-6 operator semantics: point-in-time SCD2 join,
skew-join salting, rolling z-score outliers, containment pairs."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.queries import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


# --------------------------------------------------- pit_dimension_join
def test_pit_join_matches_python_interval_lookup(spark):
    e = (
        load_table(spark, SF, "events")
        .where(F.col("user_id") < 40)
        .select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
                "event_type", "value")
        .collect()
    )
    # dimension versions: purchases per (user, ts) — max event_id wins
    dim = {}
    for r in e:
        if r.event_type == "purchase":
            key = (r.user_id, r.ts_us)
            if key not in dim or r.event_id > dim[key][0]:
                dim[key] = (r.event_id, round(r.value, 2))
    by_user = {}
    for (u, ts), v in dim.items():
        by_user.setdefault(u, []).append((ts, v))
    for u in by_user:
        by_user[u].sort()
    rows = REGISTRY["pit_dimension_join"].fn(spark, SF).collect()
    clicks = [r for r in e if r.event_type == "click"]
    assert len(rows) == len(clicks)
    got = {r.event_id: r for r in rows}
    for c in clicks:
        r = got[c.event_id]
        versions = [v for ts, v in by_user.get(c.user_id, []) if ts <= c.ts_us]
        if versions:
            exp_id, exp_val = versions[-1]
            assert (r.dim_event_id, r.dim_value) == (exp_id, exp_val), c.event_id
        else:
            assert r.dim_event_id is None and r.dim_value is None
    # both arms must occur at this sf
    assert any(r.dim_event_id is None for r in rows)
    assert any(r.dim_event_id is not None for r in rows)


# ----------------------------------------------------- salted_skew_join
def test_salted_join_equals_plain_join(spark):
    e = load_table(spark, SF, "events").select("user_id", "value").collect()
    agg = {}
    for r in e:
        hk = 0 if r.user_id % 2 == 0 else r.user_id
        n, s = agg.get(hk, (0, 0))
        agg[hk] = (n + 1, s + round(r.value, 2))
    rows = REGISTRY["salted_skew_join"].fn(spark, SF).collect()
    assert {r.hk for r in rows} == set(agg)
    for r in rows:
        n, s = agg[r.hk]
        assert r.n_events == n
        assert abs(r.total_value - round(s, 2)) < 1e-9
        assert r.dim_code == int(
            hashlib.md5(str(r.hk).encode()).hexdigest()[:8], 16
        ) % 1000
    hot = max(rows, key=lambda r: r.n_events)
    assert hot.hk == 0 and hot.n_events > len(e) / 3, "skew fixture degenerate"


def test_salted_join_plan_has_salt_key(spark):
    plan = REGISTRY["salted_skew_join"].fn(spark, SF)._jdf.queryExecution().toString()
    assert "__salt" in plan


# ----------------------------------------------- rolling_zscore_outliers
def test_zscore_outliers_match_python_window(spark):
    from ingestor_etl_spark.queries.analytic_ops import (
        ZSCORE_MIN_N,
        ZSCORE_SIGMA,
        ZSCORE_WINDOW,
    )

    e = (
        load_table(spark, SF, "events")
        .select("event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value")
        .collect()
    )
    by_user = {}
    for r in e:
        by_user.setdefault(r.user_id, []).append(r)
    expect = {}
    for user, rs in by_user.items():
        rs.sort(key=lambda r: (r.ts_us, r.event_id))
        cents = [int(round(r.value * 100)) for r in rs]
        for i, r in enumerate(rs):
            lo = max(0, i - (ZSCORE_WINDOW - 1))
            win = cents[lo : i + 1]
            n, s, q = len(win), sum(win), sum(c * c for c in win)
            var_scaled = n * q - s * s
            dev = cents[i] * n - s
            if (
                n >= ZSCORE_MIN_N
                and var_scaled > 0
                and dev * dev > ZSCORE_SIGMA**2 * var_scaled
            ):
                expect[r.event_id] = round(dev / math.sqrt(var_scaled), 4)
    rows = REGISTRY["rolling_zscore_outliers"].fn(spark, SF).collect()
    assert {r.event_id: r.z for r in rows} == expect
    assert expect, "no outliers at this sf — fixture degenerate"


# ----------------------------------------------------- containment_pairs
def test_containment_exceeds_jaccard_and_matches_python(spark):
    from ingestor_etl_spark.queries.dedup_ops import CONTAINMENT_THRESHOLD

    docs = {
        r.doc_id: r.text for r in load_table(spark, SF, "documents").collect()
    }

    def shingles(text):
        toks = text.strip().lower().split()
        out, seen = [], set()
        for a, b in zip(toks, toks[1:]):
            s = f"{a} {b}"
            if s not in seen:
                seen.add(s)
                out.append(s)
        return set(out)

    sh = {i: shingles(t) for i, t in docs.items()}
    rows = REGISTRY["containment_pairs"].fn(spark, SF).collect()
    assert rows, "no containment pairs at this sf"
    for r in rows:
        a, b = sh[r.doc_a], sh[r.doc_b]
        ns = len(a & b)
        assert abs(r.contain_a - round(ns / len(a), 4)) < 1e-9
        assert abs(r.contain_b - round(ns / len(b), 4)) < 1e-9
        assert abs(r.jaccard - round(ns / len(a | b), 4)) < 1e-9
        assert max(r.contain_a, r.contain_b) >= CONTAINMENT_THRESHOLD
        # containment always dominates Jaccard
        assert max(r.contain_a, r.contain_b) >= r.jaccard
