"""Fixed-point PageRank semantics (queries/rank_ops.py)."""

from __future__ import annotations

from ingestor_etl_spark.queries import load_all
from ingestor_etl_spark.queries.rank_ops import (
    PR_BASE,
    PR_ONE,
    STOP_SEG_MAX_DOCS,
    candidate_pairs,
)

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def test_pagerank_against_python_reference(spark):
    """Re-run the exact fixed-point iteration in plain Python over
    the same graph (including the stop-segment cut) and demand bit
    equality."""
    from collections import defaultdict

    from ingestor_etl_spark.catalog import load_table

    docs = {
        r.doc_id: r.text.strip().split()
        for r in load_table(spark, SF, "documents").collect()
    }
    seg_owner = defaultdict(set)
    for did, toks in docs.items():
        for j in range((len(toks) + 7) // 8):
            seg_owner[" ".join(toks[j * 8 : j * 8 + 8])].add(did)
    edges = defaultdict(set)
    for owners in seg_owner.values():
        if len(owners) > STOP_SEG_MAX_DOCS:  # stop-segment cut
            continue
        for a_ in owners:
            for b_ in owners:
                if a_ != b_:
                    edges[a_].add(b_)
    deg = {n: len(vs) for n, vs in edges.items()}
    pr = {n: PR_ONE for n in deg}
    for _ in range(5):
        inflow = defaultdict(int)
        for u, vs in edges.items():
            c = pr[u] // deg[u]
            for v in vs:
                inflow[v] += c
        pr = {n: PR_BASE + (85 * inflow[n]) // 100 for n in deg}
    expected = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r.doc_id, r.rank_fp)
        for r in REGISTRY["pagerank_dup_graph"].fn(spark, SF).collect()
    ]
    assert got == expected


def test_hot_segment_candidates_bounded(spark):
    """The k² blowup guard: a boilerplate segment shared by many
    more docs than STOP_SEG_MAX_DOCS contributes ZERO candidate
    pairs, while normal segments still pair up — so total pair
    volume is bounded by T²·n_live_segs, never by the hot key."""
    n_hot = STOP_SEG_MAX_DOCS * 3
    rows = [(i, "BOILERPLATE") for i in range(n_hot)]
    rows += [(1000, "rare one"), (1001, "rare one"), (1002, "other")]
    segs = spark.createDataFrame(rows, ["doc_id", "seg"])
    pairs = candidate_pairs(segs).collect()
    # without the cut this would be C(192,2) = 18336 pairs
    assert sorted((r.src, r.dst) for r in pairs) == [(1000, 1001)]
    # the broadcast anti-join is in the plan (hot list never shuffles)
    plan = candidate_pairs(segs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_candidate_pairs_keep_sub_threshold_segments(spark):
    """Segments at exactly the threshold still pair (cut is strict >)."""
    rows = [(i, "shared") for i in range(STOP_SEG_MAX_DOCS)]
    segs = spark.createDataFrame(rows, ["doc_id", "seg"])
    n = candidate_pairs(segs).count()
    t = STOP_SEG_MAX_DOCS
    assert n == t * (t - 1) // 2


def test_pagerank_hub_outranks_leaves(spark):
    rows = REGISTRY["pagerank_dup_graph"].fn(spark, SF).collect()
    assert rows
    # every rank carries at least the damping base mass
    assert all(r.rank_fp >= PR_BASE for r in rows)
    # output is deterministically ordered
    ranks = [(-r.rank_fp, r.doc_id) for r in rows]
    assert ranks == sorted(ranks)


def test_fixed_point_update_exact_past_long_range(spark):
    """The DECIMAL(38,0) staging property test at the old 64-bit
    boundary: per-edge floor division and the damping update must
    match Python's arbitrary-precision integers for values past
    2^63 (where the previous BIGINT arithmetic wrapped), up to the
    documented 10^32 quotient headroom."""
    from pyspark.sql import functions as F

    from ingestor_etl_spark.queries.rank_ops import _floor_div_dec

    cases = [
        (2**63 + 12345, 7),            # just past signed-64
        (85 * (2**63 // 85 + 3), 100),  # the old 85*inflow boundary
        (11 * 10**19 * 85, 100),        # in-degree ≈ 1.1e11 × PR_ONE
        (10**31 + 7, 3),                # near the 10^32 headroom
        (999, 1000),                    # floor → 0
        (0, 17),
    ]
    rows = [(str(a), str(b)) for a, b in cases]
    df = spark.createDataFrame(rows, ["a", "b"]).select(
        F.col("a").cast("decimal(38,0)").alias("a"),
        F.col("b").cast("decimal(38,0)").alias("b"),
    )
    got = df.select(_floor_div_dec(F.col("a"), F.col("b")).alias("q")).collect()
    assert [int(r.q) for r in got] == [a // b for a, b in cases]

    # full damping update at the boundary: PR_BASE + (85·inflow)//100
    inflows = [2**63 // 85 + 1, 11 * 10**19, 10**29, 0]
    df2 = spark.createDataFrame([(str(x),) for x in inflows], ["inflow"]).select(
        F.col("inflow").cast("decimal(38,0)").alias("inflow")
    )
    upd = df2.select(
        (
            F.lit(PR_BASE)
            + _floor_div_dec(
                (F.col("inflow") * 85).cast("decimal(38,0)"), F.lit(100)
            )
        )
        .cast("decimal(38,0)")
        .alias("pr")
    ).collect()
    assert [int(r.pr) for r in upd] == [
        PR_BASE + (85 * x) // 100 for x in inflows
    ]
