"""Wave-28 (round 12): corpus-census-derived IVF geometry (round-11
verdict item 1 — the _knn_planes pattern applied to the IVF/PQ
stacks). At fixed fixture geometry (8 lists, 16 codes/subspace) the
shipped default's recall@3 fell 0.650 → 0.367 when the corpus grew
4× (sf0.01 → sf0.1); the rules here (_ivf_lists ∝ √N, _pq_codes →
power-of-two toward 8-bit, _ivf_nprobe ∝ √(nlist/N_LISTS)) are the
identity at every driver-oracle scale (N ≤ IVF_IDENTITY_MAX = 512,
covering the 500-vector sf0.001/sf0.01 fixtures) so CORRECTNESS is
untouched, and engage above — measured recall@3 at sf0.1 recovers
to 0.6167 (raw) / 0.6500 (residual), the sf0.01 level.

Also pins the round-11 advice item: the hot-cell census must be
INACTIVE on every oracle-compared fixture, so oracle parity can
never silently depend on the data-dependent sub-split gate."""

from __future__ import annotations

import pytest

from collections import defaultdict

from pyspark.sql import functions as F

from ingestor_etl_spark.plans.layout import release_caches
from ingestor_etl_spark.queries import load_all
from ingestor_etl_spark.queries import vector_ops as vo

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"


def test_ivf_geometry_rule_calibration():
    """Identity at every driver-oracle scale (500-vector sf0.001 and
    sf0.01 fixtures — the fixed-geometry DuckDB oracle must stay
    byte-exact), the measured sf0.1/sf1 configurations above,
    monotone growth, and the 8-bit-code ceiling."""
    # identity range: the exact fixture constants
    for n in (500, 512):
        assert vo._ivf_lists(n) == vo.N_LISTS
        assert vo._pq_codes(n) == vo.PQ_K
        assert vo._ivf_seed_ids(n) == vo.CENTROID_IDS
        assert vo._pq_seed_ids(n) == tuple(
            range(vo.PQ_SEED_BASE, vo.PQ_SEED_BASE + vo.PQ_K)
        )
    assert vo._ivf_nprobe(vo.N_LISTS) == vo.NPROBE
    # the identity edge is exact: 512/8 = 64 = N_LISTS², so 513
    # is the first corpus that scales
    assert vo._ivf_lists(513) == vo.N_LISTS + 1
    # measured configurations
    assert vo._ivf_lists(2_000) == 16  # sf0.1
    assert vo._pq_codes(2_000) == 64
    assert vo._ivf_nprobe(16) == 6
    assert vo._ivf_lists(20_000) == 50  # sf1
    assert vo._pq_codes(20_000) == 256
    assert vo._ivf_nprobe(50) == 10
    # monotone in N, and codes cap at the 8-bit production format
    assert vo._ivf_lists(200_000) > vo._ivf_lists(20_000)
    assert vo._pq_codes(2_000_000) == 256
    # scaled seeds: distinct in-range ids, as many as the geometry
    for n in (2_000, 20_000):
        ids = vo._ivf_seed_ids(n)
        assert len(set(ids)) == vo._ivf_lists(n)
        assert all(0 <= i < n for i in ids)
        pids = vo._pq_seed_ids(n)
        assert len(set(pids)) == vo._pq_codes(n)
        assert all(0 <= i < n for i in pids)
        assert list(pids) == sorted(pids)  # array_position labeling


def _recall_at_3(spark, sf, query_name, reg):
    exact = reg["ann_cosine_topk"].fn(spark, sf).collect()
    release_caches()
    ex = defaultdict(list)
    for r in exact:
        if r.rnk <= 3:
            ex[r.query_id].append(r.neighbor_id)
    total = sum(len(v) for v in ex.values())
    edges = {
        (r.query_id, r.neighbor_id)
        for r in reg[query_name].fn(spark, sf).collect()
    }
    release_caches()
    hits = sum(1 for q, ns in ex.items() for n in ns if (q, n) in edges)
    return hits, total


@pytest.mark.slow
def test_scaled_geometry_recall_floor_sf01(spark):
    """THE number round 11 flagged: at sf0.1 (2,000 vectors — above
    the identity range, so 16 lists / 64 codes / nprobe 6 engage)
    the shipped default recovers to the sf0.01 recall level.
    Measured: 0.6500 residual (was 0.367 at fixed geometry) and
    0.6167 raw (was 0.283). Floors at the same ≥ 0.60 bar as the
    sf0.01 pins in test_wave26. Coupled to the deterministic
    fixture — regenerate testdata and re-measure."""
    reg = load_all()
    hits, total = _recall_at_3(spark, SF01, "ann_ivf_pq_residual", reg)
    assert hits / total >= 0.60, (hits, total)
    hits, total = _recall_at_3(spark, SF01, "ann_ivf_pq", reg)
    assert hits / total >= 0.60, (hits, total)


@pytest.mark.slow
def test_ann_ivf_hamming_beats_full_scan_sketch(spark):
    """The composed sketch (round-11 verdict item 4: Hamming
    shortlist UNDER the IVF restrict) must beat the full-corpus
    sketch scan at the SAME HAM_POOL budget while touching less
    sketch mass — measured 0.40 vs 0.30 at sf0.01 (probed mass
    ~50.5% of the corpus) and 0.15 vs 0.083 at sf0.1 (scaled
    geometry probes ~37.5%). Floors coupled to the deterministic
    fixtures; exactness of the emitted rows is the oracle row's
    job (SCALING §44)."""
    reg = load_all()
    hits, total = _recall_at_3(spark, SF001, "ann_ivf_hamming", reg)
    assert hits / total >= 0.35, (hits, total)
    fhits, ftotal = _recall_at_3(spark, SF001, "ann_hamming_topk", reg)
    assert hits / total > fhits / ftotal, (hits, fhits)


@pytest.mark.slow
def test_big_book_strategy_equivalence(spark):
    """SCALING §47: the vectorized (Arrow-batched numpy) assignment
    and top-n kernels must reproduce the literal-codebook
    projections' outputs exactly on the fixture (same distance
    ordering, same lowest-cid tie-break) — the strategy switch at
    IVF_LITERAL_BOOK_MAX changes HOW the argmin runs, never what it
    returns. Verified for the bare assign, the top-n ranking, and
    the keyed (per-subspace PQ) assign."""
    from ingestor_etl_spark.catalog import load_table

    e = load_table(spark, SF001, "embeddings").select(
        "vec_id", vo._as_double(F.col("embedding")).alias("v")
    )
    norm = F.sqrt(vo._dot(F.col("v"), F.col("v")))
    et = e.withColumn("nv", F.transform("v", lambda x: x / norm))
    book = sorted(
        (r["vec_id"], list(r["nv"]))
        for r in et.where(F.col("vec_id").isin(*vo.CENTROID_IDS)).collect()
    )
    base = et.withColumn("pp", vo._dot(F.col("nv"), F.col("nv")))
    book_sql = vo._book_arr_sql(book)
    lit = {
        r["vec_id"]: r["lid"]
        for r in base.selectExpr(
            "vec_id", f"{vo._argmin_sql(book_sql)} AS lid"
        ).collect()
    }
    npv = {
        r["vec_id"]: r["lid"]
        for r in vo._np_assign_col(
            et.select("vec_id", "nv"), {(): book}, (), "nv", "lid"
        ).collect()
    }
    assert lit == npv
    litn = {
        r["vec_id"]: list(r["rc"])
        for r in base.selectExpr(
            "vec_id",
            f"transform({vo._rank_sql(book_sql, 4)}, s -> s.cid) AS rc",
        ).collect()
    }
    npn = {
        r["vec_id"]: list(r["rc"])
        for r in vo._np_topn_col(
            et.select("vec_id", "nv"), book, "nv", 4, "rc"
        ).collect()
    }
    assert litn == npn
    subs = et.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.slice(F.col("nv"), s * 16 + 1, 16) for s in range(4)])
        ).alias("sub", "sv"),
    )
    pq_books = {}
    for r in subs.where(
        (F.col("vec_id") >= vo.PQ_SEED_BASE)
        & (F.col("vec_id") <= vo.PQ_SEED_BASE + vo.PQ_K - 1)
    ).collect():
        pq_books.setdefault((r["sub"],), []).append(
            (r["vec_id"] - vo.PQ_SEED_BASE, list(r["sv"]))
        )
    for k in pq_books:
        pq_books[k].sort()
    pq_case = vo._book_case_sql(pq_books, ("sub",))
    litk = {
        (r["vec_id"], r["sub"]): r["cid"]
        for r in subs.withColumn("pp", vo._dot(F.col("sv"), F.col("sv")))
        .selectExpr(
            "vec_id", "sub", f"{vo._argmin_sql(pq_case, vec='sv')} AS cid"
        )
        .collect()
    }
    npk = {
        (r["vec_id"], r["sub"]): r["cid"]
        for r in vo._np_assign_col(
            subs, pq_books, ("sub",), "sv", "cid"
        ).collect()
    }
    release_caches()
    assert litk == npk


def test_big_book_threshold_keeps_measured_scales_literal():
    """Every scale with an exactness or floor pin must stay on the
    literal path: sf0.001/sf0.01 (8 lists, 16 codes), sf0.1 (16/64),
    and sf1's coarse book (50) are all ≤ IVF_LITERAL_BOOK_MAX; the
    numpy path engages only for ≥100k-vector corpora (112 lists at
    the skew diagnostic) and sf1's 256-code PQ encode."""
    assert vo._ivf_lists(500) <= vo.IVF_LITERAL_BOOK_MAX
    assert vo._pq_codes(500) <= vo.IVF_LITERAL_BOOK_MAX
    assert vo._ivf_lists(2_000) <= vo.IVF_LITERAL_BOOK_MAX
    assert vo._pq_codes(2_000) <= vo.IVF_LITERAL_BOOK_MAX
    assert vo._ivf_lists(20_000) <= vo.IVF_LITERAL_BOOK_MAX
    assert vo._pq_codes(20_000) > vo.IVF_LITERAL_BOOK_MAX  # sf1 PQ
    assert vo._ivf_lists(100_000) > vo.IVF_LITERAL_BOOK_MAX  # skew rig


@pytest.mark.slow
def test_census_inactive_on_every_oracle_fixture(spark):
    """Round-11 advice: oracle parity must not silently depend on
    the data-dependent hot-cell gate. On BOTH driver-oracle fixtures
    (sf0.001 and sf0.01 — uniform by construction) the trained
    coarse assignment's max load factor stays below IVF_HOT_LOAD, so
    the sub-split is provably out of the plan wherever the DuckDB
    oracle is compared."""
    from ingestor_etl_spark.catalog import load_table
    from ingestor_etl_spark.plans.layout import materialize

    for sf in ("/root/testdata/sf0.001", SF001):
        norm = F.sqrt(vo._dot(F.col("v"), F.col("v")))
        et = materialize(
            load_table(spark, sf, "embeddings")
            .select("vec_id", vo._as_double(F.col("embedding")).alias("v"))
            .withColumn("nv", F.transform("v", lambda x: x / norm))
        )
        n = et.count()
        assert n <= vo.IVF_IDENTITY_MAX  # geometry identity holds
        book = vo._lloyd_books(
            et.select("vec_id", F.col("nv").alias("pv")),
            et.where(F.col("vec_id").isin(*vo.CENTROID_IDS)).select(
                F.col("vec_id").alias("cid"), F.col("nv").alias("cv")
            ),
            vo.IVF_ITERS,
            vo.DIM,
        )[()]
        book_sql = vo._book_arr_sql(book)
        sizes = (
            et.withColumn("pp", vo._dot(F.col("nv"), F.col("nv")))
            .selectExpr(f"{vo._argmin_sql(book_sql)} AS lid")
            .groupBy("lid")
            .count()
            .collect()
        )
        release_caches()
        total = sum(r["count"] for r in sizes)
        max_load = max(r["count"] for r in sizes) * vo.N_LISTS / total
        assert max_load < vo.IVF_HOT_LOAD, (sf, max_load)
