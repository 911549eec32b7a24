"""Wave-27 (round 11): the census-gated IVF hot-cell sub-split
(round-10 verdict item 2 — the pay-when-skewed guard for hot
inverted lists, SCALING §41). Oracle parity for the registered
queries runs in test_oracle_parity (the sf0.01 fixture is uniform,
so the cap is INACTIVE there and the oracle contract is untouched);
these pin the gate itself: identity on balanced corpora, bounded
candidate mass plus preserved similarity quality on the hot corpus.

The hot fixture is a 4k-vector version of bench.py --skew's
hot-inverted-list corpus: 90% of vectors jittered around ONE
direction, so after Lloyd training one coarse cell holds ~90% of the
corpus (load factor ~7.2 > IVF_HOT_LOAD)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.plans.layout import materialize, release_caches
from ingestor_etl_spark.queries import load_all

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry():
    return load_all()


@pytest.fixture(scope="module")
def hot_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hot_ivf"))
    spark.range(4000).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 63), dd -> CASE WHEN id % 10 < 9"
        " THEN 1.0D + cast(pmod(hash(id, dd), 1000) AS double) / 1000000.0D"
        " ELSE cast(pmod(hash(id, dd), 2000) - 1000 AS double) / 1000.0D"
        " END) AS embedding",
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return d


def _coarse(spark, sf_dir):
    """et + trained coarse book, exactly as the IVF+PQ stacks build
    them."""
    import ingestor_etl_spark.queries.vector_ops as vo

    norm = F.sqrt(vo._dot(F.col("v"), F.col("v")))
    et = materialize(
        load_table(spark, sf_dir, "embeddings")
        .repartition(F.col("vec_id"))
        .select("vec_id", vo._as_double(F.col("embedding")).alias("v"))
        .withColumn("nv", F.transform("v", lambda x: x / norm))
    )
    et.count()
    book = vo._lloyd_books(
        et.select("vec_id", F.col("nv").alias("pv")),
        et.where(F.col("vec_id").isin(*vo.CENTROID_IDS)).select(
            F.col("vec_id").alias("cid"), F.col("nv").alias("cv")
        ),
        vo.IVF_ITERS,
        vo.DIM,
    )[()]
    return et, book


def _cand_set(et, book):
    import ingestor_etl_spark.queries.vector_ops as vo

    cells, pc = vo._ivf_candidate_cells(et, book)
    cand = (
        pc.join(
            cells.withColumnRenamed("vec_id", "neighbor_id"),
            ["lid", "slid"],
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    return set(map(tuple, cand.collect()))


@pytest.mark.slow
def test_subsplit_inactive_on_uniform_corpus(spark, monkeypatch):
    """On the balanced sf0.01 fixture the census must NOT engage:
    the candidate set equals the cap-disabled run's exactly
    (cap-inactive ≡ plain — what keeps every oracle-compared scale
    byte-exact), and every cell id is the slid=0 sentinel."""
    import ingestor_etl_spark.queries.vector_ops as vo

    et, book = _coarse(spark, SF)
    default = _cand_set(et, book)
    cells, _ = vo._ivf_candidate_cells(et, book)
    slids = {r.slid for r in cells.select("slid").distinct().collect()}
    monkeypatch.setattr(vo, "IVF_HOT_LOAD", 1e18)
    disabled = _cand_set(et, book)
    release_caches()
    assert slids == {0}
    assert default == disabled


@pytest.mark.slow
def test_subsplit_bounds_hot_candidate_mass(spark, hot_dir, monkeypatch):
    """On the hot corpus the census engages and the sub-split may
    only DROP candidates, never invent them (engaged ⊆ plain — the
    test_wave24 LSH-cap invariant), and must cut probed mass
    materially: with one ~90% cell, probing IVF_SUB_NPROBE of
    IVF_SUB_K sub-cells bounds the ratio near 2/8 of the plain mass
    (measured 0.26 at this fixture)."""
    import ingestor_etl_spark.queries.vector_ops as vo

    et, book = _coarse(spark, hot_dir)
    engaged = _cand_set(et, book)
    monkeypatch.setattr(vo, "IVF_HOT_LOAD", 1e18)
    plain = _cand_set(et, book)
    release_caches()
    assert engaged <= plain
    assert len(engaged) < 0.4 * len(plain), (len(engaged), len(plain))


@pytest.mark.slow
def test_subsplit_preserves_similarity_quality(spark, hot_dir,
                                               registry, monkeypatch):
    """End-to-end ann_ivf_pq on the hot corpus: the engaged run must
    emit the full top-k per query and lose (essentially) no
    SIMILARITY quality — mean returned cos_sim within 0.002 of the
    cap-disabled run's. Identity-recall vs the exact oracle is the
    WRONG metric on this fixture: the hot cluster is nearly
    degenerate (pairwise cosines tie at 4 decimals), so exact top-3
    membership is decided by neighbor_id tie-breaks and ANY candidate
    restriction loses those specific ids while returning
    equally-similar neighbors (measured: mean cos_sim 0.92872 both
    runs vs 0.93532 exact; identity-recall 0.93 plain vs 0.27
    engaged). The bounded-work trade is the point of the cap — the
    similarity floor is what must not regress."""
    import ingestor_etl_spark.queries.vector_ops as vo

    engaged = registry["ann_ivf_pq"].fn(spark, hot_dir).collect()
    release_caches()
    monkeypatch.setattr(vo, "IVF_HOT_LOAD", 1e18)
    plain = registry["ann_ivf_pq"].fn(spark, hot_dir).collect()
    release_caches()
    assert len(engaged) == len(plain) == 60
    m_eng = sum(r.cos_sim for r in engaged) / len(engaged)
    m_pl = sum(r.cos_sim for r in plain) / len(plain)
    assert m_eng >= m_pl - 0.002, (m_eng, m_pl)
