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
    (dirty, clean) pair: count raw rows of the SCORED comparison
    relation per (dirty_id, p_partkey) and demand each pair appears
    exactly once."""
    from ingestor_etl_spark.catalog import load_table
    from ingestor_etl_spark.queries.similarity_ops import er_scored_pairs

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
    clean = part.groupBy("p_name").agg(F.min("p_partkey").alias("p_partkey"))
    scored = er_scored_pairs(dirty, clean.select("p_partkey", "p_name"))
    dup = (
        scored.groupBy("dirty_id", "p_partkey")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    assert scored.count() > 0


def test_entity_resolution_hot_block_fallback_bounds_comparisons(spark):
    """The hot-block guard: a suffix-heavy catalog (every name ends
    in ' inc') would collapse the whole feed into one 3-char block —
    with the cap exceeded, records must fall back to the composite
    (blk, second-to-last-token prefix) key, so comparison volume is
    per-sub-block, not catalog². Identical names must still match
    (the fallback key agrees when the name is unperturbed), and the
    hot list must reach the join as a broadcast."""
    from ingestor_etl_spark.queries.similarity_ops import er_scored_pairs

    # 40 distinct clean names, all ending " inc", spread over 20
    # middle tokens with DISTINCT 3-char prefixes → each composite
    # sub-block holds 2 names
    names = [f"name{i:02d} {chr(ord('a') + i % 20) * 4} inc" for i in range(40)]
    clean = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], ["p_partkey", "p_name"]
    )
    dirty = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], ["dirty_id", "dirty_name"]
    )
    scored = er_scored_pairs(dirty, clean, block_cap=8)
    rows = scored.collect()
    # every identical pair found …
    exact = {(r.dirty_id, r.p_partkey) for r in rows if r.dist == 0}
    assert exact == {(i, i) for i in range(40)}
    # … and comparisons bounded by sub-block size (2 names share a
    # mid-token, each within edit distance of the other), never the
    # 40×40 single-block volume
    assert len(rows) <= 40 * 2
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_entity_resolution_cold_blocks_unaffected_by_cap(spark):
    """Below the cap the fallback key must stay inert: er_scored_pairs
    with a huge cap and a tiny cap agree on a catalog with no hot
    blocks."""
    from ingestor_etl_spark.queries.similarity_ops import er_scored_pairs

    # distinct last-token prefixes → every block holds one name, so
    # even block_cap=1 marks nothing hot (the cut is strict >)
    names = [f"alpha{i} {chr(ord('b') + i) * 6}" for i in range(10)]
    clean = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], ["p_partkey", "p_name"]
    )
    dirty = spark.createDataFrame(
        [(i, n[:-1]) for i, n in enumerate(names)], ["dirty_id", "dirty_name"]
    )
    a = {
        (r.dirty_id, r.p_partkey, r.dist)
        for r in er_scored_pairs(dirty, clean, block_cap=1000).collect()
    }
    b = {
        (r.dirty_id, r.p_partkey, r.dist)
        for r in er_scored_pairs(dirty, clean, block_cap=1).collect()
    }
    assert a and a == b
