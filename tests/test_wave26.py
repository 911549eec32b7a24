"""Wave-26 (round 9): knn_graph's in-query occupancy census (round-8
verdict item 1) and the sub-split plane-independence fix (round-8
advice). Oracle parity for the registered query runs in
test_oracle_parity; these pin the census itself — identity at oracle
scales, the documented sf1 configuration above them, and output
equality between the auto-scaled and fixed-parameter forms where the
rule is the identity."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ingestor_etl_spark.plans.layout import release_caches
from ingestor_etl_spark.queries.vector_ops import (
    KNN_PLANES,
    N_PLANES,
    N_TABLES,
    _as_double,
    _hyperplanes,
    _hyperplanes_at,
    _knn_graph_from,
    _knn_planes,
    _spark_bucket,
    _spark_bucket_at,
)

SF = "/root/testdata/sf0.01"


def test_knn_occupancy_rule_calibration():
    """Identity at every driver-oracle scale (so the fixed-plane
    DuckDB oracle is untouched), the measured sf1 configuration
    (KNN_PLANES + 3) at 10×, monotone above."""
    assert _knn_planes(500) == KNN_PLANES  # sf0.01
    assert _knn_planes(2_000) == KNN_PLANES  # sf0.1
    assert _knn_planes(2_560) == KNN_PLANES  # identity-range edge
    assert _knn_planes(2_561) == KNN_PLANES + 1
    assert _knn_planes(20_000) == KNN_PLANES + 3  # sf1
    assert _knn_planes(200_000) > _knn_planes(20_000)


@pytest.mark.slow
def test_knn_auto_equals_fixed_at_oracle_scale(spark):
    """Inside the identity range the auto census must leave the plan
    on the fixed plane count — output identical to the
    fixed-parameter form (this is what keeps the driver's sf0.01
    oracle row untouched)."""
    from ingestor_etl_spark.catalog import load_table

    e = load_table(spark, SF, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    auto = _knn_graph_from(e, auto_scale=True).collect()
    release_caches()
    fixed = _knn_graph_from(e).collect()
    release_caches()
    assert auto == fixed


def test_subsplit_planes_independent_of_main_tables():
    """Round-8 advice: the hot-bucket sub-split bits must come from
    plane-family indices DISJOINT from every main table at ANY
    auto-scaled plane count — the old fixed _spark_bucket(N_TABLES, 4)
    family (indices 40-43) collides with tables 5-6 once n_planes
    rises above 4, collapsing the 16-way sub-split exactly where the
    cap engages."""
    for n_planes in (N_PLANES, 7, 9):
        # the invariant the fix establishes is INDEX-RANGE
        # disjointness: main tables tile [0, N_TABLES*n_planes), the
        # sub-split takes [N_TABLES*n_planes, N_TABLES*n_planes+4)
        # (round-9 advice: assert the range, not just the values)
        main_hi = N_TABLES * n_planes
        assert set(range(main_hi)).isdisjoint(range(main_hi, main_hi + 4))
        # value-level check kept as a STRICTER stand-in: it also
        # guards against the LCG mapping two disjoint index ranges to
        # colliding plane vectors (would silently halve sub-split
        # entropy even with correct indexing)
        main = [
            tuple(p) for t in range(N_TABLES) for p in _hyperplanes(t, n_planes)
        ]
        xbits = [tuple(p) for p in _hyperplanes_at(main_hi, 4)]
        assert not set(main) & set(xbits), n_planes


def test_subsplit_unchanged_at_fixed_config():
    """With the fixed 4-plane config the new indexing is exactly the
    old family (indices 40-43), so every pinned capped output is
    unchanged."""
    assert _spark_bucket_at(N_TABLES * N_PLANES, 4) == _spark_bucket(N_TABLES, 4)


@pytest.mark.slow
def test_ann_ivf_pq_recall_floor(spark):
    """The IVF+PQ+refine stack's quality pin (round 9, floor raised
    round 10 and again round 11): with Lloyd-trained quantizers
    (IVF_ITERS=4, PQ_ITERS=2) and the probe/pool knobs at the whatif
    sweep's knee (NPROBE=4, pool 50 — round-10 verdict item 1),
    measured recall@3 against the exact brute-force oracle is 0.6333
    at sf0.01, against the trained coarse restrict's 0.8833 ceiling
    (history: 0.35 untrained → 0.500 trained at nprobe=2/pool=30).
    The measured value is coupled to the deterministic sf0.01
    fixture — regenerate testdata and this floor must be re-measured.
    Exactness of what IS emitted is the oracle row's job; this
    guards the quality knob."""
    from collections import defaultdict

    from ingestor_etl_spark.queries import load_all

    reg = load_all()
    exact = reg["ann_cosine_topk"].fn(spark, SF).collect()
    release_caches()
    ex = defaultdict(list)
    for r in exact:
        if r.rnk <= 3:
            ex[r.query_id].append(r.neighbor_id)
    total = sum(len(v) for v in ex.values())
    edges = {
        (r.query_id, r.neighbor_id)
        for r in reg["ann_ivf_pq"].fn(spark, SF).collect()
    }
    release_caches()
    hits = sum(1 for q, ns in ex.items() for n in ns if (q, n) in edges)
    assert hits / total >= 0.60, (hits, total)


@pytest.mark.slow
def test_pq_distortion_training_helps_every_subspace(spark):
    """The round-10 distortion scorecard behind the recall fix:
    PQ_ITERS Lloyd rounds must REDUCE mean quantization error in
    every subspace (Lloyd is monotone non-increasing in the training
    objective; the seed book is its own iteration 0), with a
    material margin at sf0.01 (measured: 20-32% per subspace).
    Exactness of the emitted numbers is the oracle row's job."""
    from ingestor_etl_spark.queries import load_all

    reg = load_all()
    rows = reg["pq_distortion_eval"].fn(spark, SF).collect()
    release_caches()
    assert len(rows) == 4
    for r in rows:
        assert r.trained_mse < r.seed_mse, r
        assert r.improvement_pct >= 10.0, r


@pytest.mark.slow
def test_ann_ivf_pq_residual_recall_floor(spark):
    """IVFADC (residual encoding) quality pin: measured recall@3 vs
    the exact oracle is 0.650 at sf0.01 with the round-11 knobs
    (NPROBE=4, pool 50) — now BEATING raw-vector trained PQ's 0.633,
    the Jégou et al. §IV prediction emerging once the candidate sets
    are large enough (at the old nprobe=2/pool=30 point the residual
    stack trailed 0.483 vs 0.500 and its win showed only in
    distortion: trained residual codebooks 0.172 MSE vs 0.184 raw at
    equal code size). Measured values are coupled to the
    deterministic sf0.01 fixture."""
    from collections import defaultdict

    from ingestor_etl_spark.queries import load_all

    reg = load_all()
    exact = reg["ann_cosine_topk"].fn(spark, SF).collect()
    release_caches()
    ex = defaultdict(list)
    for r in exact:
        if r.rnk <= 3:
            ex[r.query_id].append(r.neighbor_id)
    total = sum(len(v) for v in ex.values())
    edges = {
        (r.query_id, r.neighbor_id)
        for r in reg["ann_ivf_pq_residual"].fn(spark, SF).collect()
    }
    release_caches()
    hits = sum(1 for q, ns in ex.items() for n in ns if (q, n) in edges)
    assert hits / total >= 0.60, (hits, total)


@pytest.mark.slow
def test_ivf_nprobe_whatif_pins_the_production_ceiling(spark):
    """The planning sweep must agree with the constants the ANN
    stacks document: at the round-11 production NPROBE=4 (the
    sweep's knee — this is the row that justified moving the knob,
    round-10 verdict item 1) the coarse-restrict ceiling is exactly
    the 0.8833 that ann_ivf_pq's recall analysis cites, at ~50%
    corpus scan on this 8-list fixture geometry; the old nprobe=2
    point reads 0.650; probing all 8 lists is a full scan with
    ceiling 1.0 (the sweep's own sanity row). Exact floats are
    coupled to the deterministic sf0.01 fixture."""
    from ingestor_etl_spark.queries import load_all

    reg = load_all()
    rows = {
        r.nprobe: r
        for r in reg["ivf_nprobe_whatif"].fn(spark, SF).collect()
    }
    release_caches()
    assert rows[2].ceiling_recall == 0.65
    assert 0.2 < rows[2].scan_frac < 0.3
    assert rows[4].ceiling_recall == 0.8833
    assert 0.45 < rows[4].scan_frac < 0.55
    assert rows[8].ceiling_recall == 1.0
    assert rows[8].scan_frac == 1.0
    assert all(
        rows[p].ceiling_recall <= rows[p + 1].ceiling_recall
        for p in range(1, 8)
    )


@pytest.mark.slow
def test_ann_quality_scoreboard_ranks_trained_above_untrained(spark):
    """The scoreboard's measured ordering must reproduce the round's
    quality narrative at the round-11 knobs (NPROBE=4, pool 50):
    exact in-list search over the untrained restrict (ann_ivf,
    0.6833) tops the table because it pays full-vector scans of
    every probed list; the two trained PQ stacks trade a bounded
    quality haircut for table-lookup ADC, with the RESIDUAL stack
    (0.650) now beating raw PQ (0.6333) as IVFADC theory predicts;
    the refine-less raw ADC (ann_pq_topk) trails everything —
    re-ranking, training, and residual encoding are all visible in
    one table. Exact floats are coupled to the deterministic sf0.01
    fixture; exactness of the emitted numbers is the oracle row's
    job."""
    from ingestor_etl_spark.queries import load_all

    reg = load_all()
    rows = {
        r.variant: r
        for r in reg["ann_quality_scoreboard"].fn(spark, SF).collect()
    }
    release_caches()
    assert rows["ann_ivf"].recall_at_3 == 0.6833
    assert rows["ann_ivf_pq_residual"].recall_at_3 == 0.65
    assert rows["ann_ivf_pq"].recall_at_3 == 0.6333
    assert (
        rows["ann_ivf_pq_residual"].recall_at_3
        > rows["ann_ivf_pq"].recall_at_3
    )
    assert rows["ann_pq_topk"].recall_at_3 < 0.25
    assert all(r.n_predicted == 60 for r in rows.values())


@pytest.mark.slow
def test_ann_hamming_topk_recall_floor(spark):
    """Binary-sketch ANN quality pin (round 11): 64 hyperplane sign
    bits + HAM_POOL=50 Hamming shortlist + exact re-rank measures
    recall@3 0.30 vs the exact oracle at sf0.01 — above the
    LSH-bucketed variant's 0.25 at a comparable ~10% scan budget,
    which is the sketch's job (cheap integer prefilter, not an IVF
    replacement). Measured value is coupled to the deterministic
    sf0.01 fixture. Exactness of what IS emitted is the oracle
    row's job."""
    from collections import defaultdict

    from ingestor_etl_spark.queries import load_all

    reg = load_all()
    exact = reg["ann_cosine_topk"].fn(spark, SF).collect()
    release_caches()
    ex = defaultdict(list)
    for r in exact:
        if r.rnk <= 3:
            ex[r.query_id].append(r.neighbor_id)
    total = sum(len(v) for v in ex.values())
    rows = reg["ann_hamming_topk"].fn(spark, SF).collect()
    release_caches()
    assert len(rows) == 100  # 20 queries x top-5
    assert all(0 <= r.hamming <= 64 for r in rows)
    edges = {(r.query_id, r.neighbor_id) for r in rows if r.rnk <= 3}
    hits = sum(1 for q, ns in ex.items() for n in ns if (q, n) in edges)
    assert hits / total >= 0.25, (hits, total)


@pytest.mark.slow
def test_hamming_pool_whatif_pins_the_production_budget(spark):
    """The sketch-family planning sweep must agree with the shipped
    stack: the HAM_POOL=50 row's ceiling equals ann_hamming_topk's
    measured recall@3 exactly (the exact re-rank makes the Hamming
    prefilter the ONLY approximation, so ceiling == shipped recall),
    scan_frac is the pool over the corpus, and the ceiling is
    monotone in the budget. Exact floats are coupled to the
    deterministic sf0.01 fixture."""
    from ingestor_etl_spark.queries import load_all

    reg = load_all()
    rows = {
        int(r.pool): r
        for r in reg["hamming_pool_whatif"].fn(spark, SF).collect()
    }
    release_caches()
    assert rows[50].ceiling_recall == 0.3
    assert abs(rows[50].scan_frac - 50 / 499) < 1e-3
    pools = sorted(rows)
    assert all(
        rows[a].ceiling_recall <= rows[b].ceiling_recall
        for a, b in zip(pools, pools[1:])
    )


@pytest.mark.slow
def test_ivf_balance_profile_uniform_corpus(spark):
    """On the uniform sf0.01 corpus the trained coarse cells must be
    near-balanced (measured load factors 0.75-1.20 — no cell above
    2x uniform), every one of the 8 lists present, and the shares a
    partition of the corpus. The hot-corpus counterpart (one cell at
    load factor ~7.2) is pinned by measurement in SCALING §41."""
    from ingestor_etl_spark.queries import load_all

    reg = load_all()
    rows = reg["ivf_balance_profile"].fn(spark, SF).collect()
    release_caches()
    assert len(rows) == 8
    assert sum(r.n_vectors for r in rows) == 500
    assert all(r.load_factor < 2.0 for r in rows)
    assert abs(sum(r.share for r in rows) - 1.0) < 0.01
